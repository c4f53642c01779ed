package graft.io

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Index MAINTENANCE across rewrites: bloom and token-bloom entries are
  * re-measured for the dirs every rewrite path produces (CoW update,
  * MERGE — including the upsert dir —, MOR merge, OPTIMIZE folds,
  * compaction), so point/token-probe pruning keeps its sharpness after
  * churn instead of decaying to conservative full scans.  Each gate
  * asserts the PRUNED DIR COUNT (via inputFiles parents), not just row
  * correctness — the round-15 code was already correct, just blunt. */
class IndexMaintenanceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def newRoot(tag: String) =
    s"/tmp/graft_idx_maint_spec/$tag-${java.util.UUID.randomUUID()}"

  /** Distinct manifest dirs a read actually touches. */
  private def dirsRead(df: DataFrame): Int =
    df.inputFiles.map(f => f.split("/").dropRight(1).mkString("/")).distinct.length

  test("value bloom stays sharp through a CoW update") {
    val root = newRoot("cow")
    val docs = (1L to 400L).map(i => (i, s"v$i")).toDF("id", "s")
    (0 until 4).foreach { r =>
      BloomIndex.commitAppendBloom(spark, root, docs.filter(col("id") % 4 === r), "id")
    }
    val v0 = Versioned.currentVersion(spark, root)
    val before = dirsRead(BloomIndex.readPoint(spark, root, v0, Seq(17L)))
    assert(before == 1, s"interleaved ingest must bloom-prune to 1 of 4 dirs, read $before")
    // rewrite the dir holding id%4==2 (id=18 lives there); ids 17 and 22
    // keep their values, so both probes must stay answerable and SHARP
    val v1 = Versioned.commitUpdate(spark, root, col("id") === 18L,
      df => df.withColumn("s", when(col("id") === 18L, lit("patched")).otherwise(col("s"))))
    val untouched = BloomIndex.readPoint(spark, root, v1, Seq(17L))
    assert(dirsRead(untouched) == before, "an untouched dir's pruning must not change")
    assert(untouched.select("s").as[String].collect().toSeq == Seq("v17"))
    val rewritten = BloomIndex.readPoint(spark, root, v1, Seq(22L))
    assert(dirsRead(rewritten) == 1,
      s"the REWRITTEN dir must carry a fresh bloom entry (read ${dirsRead(rewritten)} dirs)")
    assert(rewritten.select("s").as[String].collect().toSeq == Seq("v22"))
  }

  test("value bloom stays sharp through an OPTIMIZE fold and a MERGE") {
    val root = newRoot("fold")
    val docs = (1L to 400L).map(i => (i, s"v$i")).toDF("id", "s")
    (0 until 4).foreach { r =>
      BloomIndex.commitAppendBloom(spark, root, docs.filter(col("id") % 4 === r), "id")
    }
    // fold all four 100-row dirs into two clustered dirs: the fold dirs
    // must get fresh filter entries (and [min,max], as always)
    val vf = Versioned.optimizeSmall(spark, root, "id",
      smallRows = 200L, targetRows = 200L).get
    val probe = BloomIndex.readPoint(spark, root, vf, Seq(17L))
    assert(dirsRead(probe) == 1,
      s"post-fold point probe must read 1 of 2 fold dirs, read ${dirsRead(probe)}")
    assert(probe.select("s").as[String].collect().toSeq == Seq("v17"))
    // a CoW MERGE: the rewritten dir AND the upsert dir both get entries
    val vm = Versioned.commitMerge(spark, root,
      Seq((17L, "merged"), (9001L, "fresh")).toDF("id", "s"), "id")
    val merged = BloomIndex.readPoint(spark, root, vm, Seq(17L))
    assert(merged.select("s").as[String].collect().toSeq == Seq("merged"))
    assert(dirsRead(merged) <= 2, // rewritten fold dir + upsert dir at most
      s"post-merge probe must stay pruned, read ${dirsRead(merged)}")
    val fresh = BloomIndex.readPoint(spark, root, vm, Seq(9001L))
    assert(dirsRead(fresh) == 1, "the merge's upsert dir must carry its own entry")
    assert(fresh.select("s").as[String].collect().toSeq == Seq("fresh"))
  }

  test("token bloom stays sharp through MOR merge and its fold") {
    val root = newRoot("tok")
    val docs = (1L to 200L).map(i =>
      (i, if (i % 50 == 3) s"doc$i carries falcon here" else s"doc$i plain body"))
      .toDF("id", "text")
    (0 until 4).foreach { r =>
      TextIndex.commitAppendIndexed(spark, root, docs.filter(col("id") % 4 === r), "text")
    }
    // MOR merge: upsert dir introduces a brand-new token; probe must
    // prune to exactly that dir
    val vm = Versioned.commitMergeMOR(spark, root,
      Seq((3L, "doc3 now ospreys instead")).toDF("id", "text"), "id")
    val osprey = TextIndex.readToken(spark, root, vm, "ospreys")
    assert(dirsRead(osprey) == 1,
      s"the MOR upsert dir must carry a fresh token entry, read ${dirsRead(osprey)}")
    assert(osprey.select("id").as[Long].collect().toSeq == Seq(3L))
    // the superseded copy of doc3 is vectored out: falcon probe stays
    // correct AND pruned (stale claims are conservative, never wrong)
    val falcon = TextIndex.readToken(spark, root, vm, "falcon")
    assert(falcon.select("id").as[Long].collect().sorted.toSeq == Seq(53L, 103L, 153L))
    // fold everything; the fold dirs must carry re-measured token blooms
    val vf = Versioned.optimizeSmall(spark, root, "id",
      smallRows = 120L, targetRows = 120L).get
    val after = TextIndex.readToken(spark, root, vf, "ospreys")
    assert(after.select("id").as[Long].collect().toSeq == Seq(3L))
    assert(dirsRead(after) == 1,
      s"post-fold token probe must read 1 dir, read ${dirsRead(after)}")
    val total = Versioned.manifest(spark, root, vf).size
    assert(dirsRead(TextIndex.readToken(spark, root, vf, "plain")) == total,
      "a token in every dir still reads every dir — pruning is honest")
  }

  test("optimizeIndex backfills plain-append dirs; maintain routes it") {
    val root = newRoot("backfill")
    val docs = (1L to 400L).map(i => (i, s"v$i")).toDF("id", "s")
    BloomIndex.commitAppendBloom(spark, root, docs.filter(col("id") <= 100L), "id")
    // plain appends: no entries — the decay mode no rewrite ever heals
    (1 to 3).foreach(r => Versioned.commitAppend(spark, root,
      docs.filter(col("id") > r * 100L && col("id") <= (r + 1) * 100L)))
    val v0 = Versioned.currentVersion(spark, root)
    assert(dirsRead(BloomIndex.readPoint(spark, root, v0, Seq(250L))) == 3,
      "the 3 entry-less dirs read conservatively before the backfill " +
        "(the indexed dir's filter already excludes the key)")
    val v1 = Versioned.optimizeIndex(spark, root).get
    val probe = BloomIndex.readPoint(spark, root, v1, Seq(250L))
    assert(dirsRead(probe) == 1,
      s"backfilled probe must prune to 1 of 4 dirs, read ${dirsRead(probe)}")
    assert(probe.select("s").as[String].collect().toSeq == Seq("v250"))
    // steady state answers None — schedulable after every batch
    assert(Versioned.optimizeIndex(spark, root).isEmpty)
    // the next plain append decays again; ONE maintain() heals it (the
    // table declares no zone map, so the backfill is the routed policy)
    Versioned.commitAppend(spark, root,
      (401L to 500L).map(i => (i, s"v$i")).toDF("id", "s"))
    val v2 = Versioned.maintain(spark, root).get
    assert(dirsRead(BloomIndex.readPoint(spark, root, v2, Seq(450L))) == 1)
    assert(Versioned.maintain(spark, root).isEmpty)
  }

  test("optimizeIndex backfills token blooms and skips column-less dirs") {
    val root = newRoot("tokfill")
    val docs = (1L to 200L).map(i =>
      (i, if (i == 150) s"doc$i carries heron here" else s"doc$i plain body"))
      .toDF("id", "text")
    TextIndex.commitAppendIndexed(spark, root, docs.filter(col("id") <= 100L), "text")
    Versioned.commitAppend(spark, root, docs.filter(col("id") > 100L))
    val v1 = Versioned.optimizeIndex(spark, root).get
    val probe = TextIndex.readToken(spark, root, v1, "heron")
    assert(dirsRead(probe) == 1, s"read ${dirsRead(probe)}")
    assert(probe.select("id").as[Long].collect().toSeq == Seq(150L))
    // a dir WITHOUT the indexed column stays conservatively read and
    // never blocks the steady state
    Versioned.commitAlterAdd(spark, root, "extra", "bigint")
    assert(Versioned.optimizeIndex(spark, root).isEmpty)
  }
}
