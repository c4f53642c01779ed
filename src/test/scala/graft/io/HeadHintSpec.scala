package graft.io

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Gates for the commit-log `_head` hint: `currentVersion` must resolve
  * the head in O(1 + lag) existence probes on a long log, and the answer
  * must equal the full-listing fallback under every corruption the hint
  * can suffer — missing, stale-low, garbage, pointing at a vacuumed or
  * absent record — because the hint is an accelerator, never the truth. */
class HeadHintSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def newRoot() =
    s"/tmp/graft_headhint_spec/${java.util.UUID.randomUUID()}"

  private def hintPath(root: String) =
    new org.apache.hadoop.fs.Path(s"$root/log/_head")

  private def writeHint(root: String, txt: String): Unit = {
    val p = hintPath(root)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = f.create(p, true)
    try out.write(txt.getBytes("UTF-8")) finally out.close()
  }

  private def listedHead(root: String): Int = {
    // the full-listing ground truth, independent of the hint
    val ld = new org.apache.hadoop.fs.Path(s"$root/log")
    val f = ld.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val V = """v(\d{5})\.json""".r
    f.listStatus(ld).map(_.getPath.getName).collect {
      case V(n) => n.toInt
    }.foldLeft(0)(math.max)
  }

  test("a few hundred versions: hint present, head correct, probes O(1+lag)") {
    val root = newRoot()
    Versioned.commit(spark, root, Seq((1L, "a")).toDF("id", "s"))
    // pure-metadata commits (restore to v1) pile up a long log cheaply
    (1 to 249).foreach(_ => Versioned.restore(spark, root, 1))
    assert(Versioned.currentVersion(spark, root) == 250)
    assert(listedHead(root) == 250)
    val f = hintPath(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(f.exists(hintPath(root)), "publish must maintain the _head hint")
    val in = f.open(hintPath(root))
    val hint = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toInt
      finally in.close()
    assert(hint == 250, s"hint should track the head, got $hint")
  }

  test("stale-low hint: forward probe finds the true head") {
    val root = newRoot()
    Versioned.commit(spark, root, Seq((1L, "a")).toDF("id", "s"))
    (1 to 9).foreach(_ => Versioned.restore(spark, root, 1))
    writeHint(root, "3") // a racing writer advanced past a stale hint
    assert(Versioned.currentVersion(spark, root) == 10)
  }

  test("missing, garbage, and beyond-head hints fall back to the listing") {
    val root = newRoot()
    Versioned.commit(spark, root, Seq((1L, "a")).toDF("id", "s"))
    Versioned.restore(spark, root, 1)
    val f = hintPath(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(hintPath(root), false)
    assert(Versioned.currentVersion(spark, root) == 2, "missing hint")
    writeHint(root, "not-a-number")
    assert(Versioned.currentVersion(spark, root) == 2, "garbage hint")
    writeHint(root, "99") // points at no record: outside interference
    assert(Versioned.currentVersion(spark, root) == 2, "beyond-head hint")
  }

  test("vacuum keeps the head resolvable (reclaims from the bottom only)") {
    val root = newRoot()
    Versioned.commit(spark, root, Seq((1L, "a")).toDF("id", "s"))
    (1 to 9).foreach(_ => Versioned.restore(spark, root, 1))
    Versioned.vacuum(spark, root, keep = 3, graceMs = 0L)
    assert(Versioned.currentVersion(spark, root) == 10)
    // and a hint stranded below the retention floor still resolves
    writeHint(root, "2") // below the floor: its record is gone
    assert(Versioned.currentVersion(spark, root) == 10)
  }

  test("racing committers keep the head exact whatever hint races do") {
    val root = newRoot()
    Versioned.commit(spark, root, Seq((1L, "a")).toDF("id", "s"))
    val threads = (1 to 4).map { _ =>
      new Thread(() => (1 to 10).foreach(_ => Versioned.restore(spark, root, 1)))
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(Versioned.currentVersion(spark, root) == 41)
    assert(listedHead(root) == 41)
  }
}
