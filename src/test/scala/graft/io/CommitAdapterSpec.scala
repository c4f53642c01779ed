package graft.io

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gates for the pluggable record-publish primitive: the
  * create-exclusive adapter (rename-is-copy object stores) arbitrates
  * a version slot without any rename, racing claimants land exactly
  * one record, the whole commit surface works end-to-end through it,
  * and an unknown adapter fails loudly. */
class CommitAdapterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def newRoot() =
    s"/tmp/graft_commit_adapter/${java.util.UUID.randomUUID()}"

  private def withAdapter[T](mode: String)(body: => T): T = {
    spark.conf.set(Versioned.CommitAdapterConf, mode)
    try body finally spark.conf.unset(Versioned.CommitAdapterConf)
  }

  test("landRecord create-exclusive: racing claimants — exactly one lands") {
    val root = newRoot()
    val ld = new org.apache.hadoop.fs.Path(s"$root/log")
    val f = Versioned.logFs(spark, ld)
    f.mkdirs(ld)
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      ld.toUri, spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(ld, "v00001.json")
    val a = Versioned.landRecord(f, fc, ld, dst, """{"version":1,"who":"a"}""",
      "create-exclusive")
    val b = Versioned.landRecord(f, fc, ld, dst, """{"version":1,"who":"b"}""",
      "create-exclusive")
    assert(a && !b, "the second claim of a slot must lose, not overwrite")
    val in = f.open(dst)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    assert(txt.contains(""""who":"a""""), "the winner's bytes must survive intact")
  }

  test("create-exclusive end-to-end: the commit surface works without renames") {
    withAdapter("create-exclusive") {
      val root = newRoot()
      Versioned.commitAppendClustered(spark, root,
        (0L until 200L).map(i => (i, i % 3)).toDF("id", "m"), "id", 4)
      Versioned.commitMerge(spark, root,
        Seq((5L, 99L), (300L, 300L)).toDF("id", "m"), "id")
      Versioned.commitDeleteMOR(spark, root, col("id") === 7L)
      val head = Versioned.currentVersion(spark, root)
      assert(head == 3)
      assert(Versioned.readAt(spark, root, head).count() == 200) // +1 insert -1 delete
      assert(Versioned.countAt(spark, root, head) == 200)
      // no rename tmp files anywhere in the log
      val ld = new org.apache.hadoop.fs.Path(s"$root/log")
      val leftovers = Versioned.logFs(spark, ld).listStatus(ld)
        .map(_.getPath.getName).filter(_.startsWith(".tmp-"))
      assert(leftovers.isEmpty, s"create-exclusive must not stage tmp files: ${leftovers.toSeq}")
      // threaded contention: 6 publishers, 6 distinct versions, all readable
      val pool = java.util.concurrent.Executors.newFixedThreadPool(6)
      val futs = (1 to 6).map { i =>
        pool.submit(new java.util.concurrent.Callable[Int] {
          def call(): Int =
            Versioned.commitAppend(spark, root, Seq((1000L + i, 0L)).toDF("id", "m"))
        })
      }
      val vs = futs.map(_.get())
      pool.shutdown()
      assert(vs.sorted == (4 to 9), s"racing appends must land distinct versions: $vs")
      assert(Versioned.readAt(spark, root, 9).count() == 206)
    }
  }

  test("an unknown adapter fails loudly") {
    withAdapter("teleport") {
      val root = newRoot()
      val e = intercept[IllegalArgumentException](
        Versioned.commit(spark, root, Seq((1L, 1L)).toDF("id", "m")))
      assert(e.getMessage.contains("commitAdapter"))
    }
  }
}
