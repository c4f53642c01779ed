package graft.io

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gates for the MULTI-COLUMN zone map: a second declared column prunes
  * dirs the first column's map must keep, entries survive every rewrite
  * path (new dirs re-measured, carried dirs verbatim), replay records
  * (restore/clone) carry the map, and the conservative contract holds —
  * an entry-less (col, dir) pair is read, never guessed. */
class ZonemapMultiSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def newRoot() =
    s"/tmp/graft_zonemap_multi/${java.util.UUID.randomUUID()}"

  private def dirsRead(df: org.apache.spark.sql.DataFrame): Int =
    df.inputFiles.map(f => f.split("/").dropRight(1).mkString("/")).distinct.length

  /** 4 id-windows x 2 m-halves = 8 dirs, each tight on BOTH columns. */
  private def eightDirs(root: String): Int = {
    for (win <- 0L until 4L; lowM <- Seq(true, false)) {
      val rows = (win * 100L until win * 100L + 100L)
        .map(id => (id, if (lowM) id % 50L else 1000L + id % 50L))
      Versioned.commitAppend(spark, root, rows.toDF("id", "m"))
    }
    Versioned.commitDeclareStatsCols(spark, root, Seq("id", "m"))
  }

  test("a second-column predicate prunes dirs the first column's map keeps") {
    val root = newRoot()
    val v = eightDirs(root)
    val both = Versioned.readRangeAll(spark, root, v,
      Seq(("id", 150L, 250L), ("m", 0L, 60L)))
    val idOnly = Versioned.readRangeOn(spark, root, v, "id", 150L, 250L)
    assert(dirsRead(idOnly) == 4) // windows 1 and 2, both halves
    assert(dirsRead(both) == 2)   // ...but only the low-m half of each
    assert(both.as[(Long, Long)].collect().sorted.toSeq ==
      (150L to 250L).map(id => (id, id % 50L)).filter(_._2 <= 60L).sorted)
    // and the m-only probe works symmetrically (no clustered statsCol at all)
    assert(dirsRead(Versioned.readRangeOn(spark, root, v, "m", 1000L, 2000L)) == 4)
  }

  test("undeclared columns refuse; declarations may only extend") {
    val root = newRoot()
    val v = eightDirs(root)
    intercept[IllegalArgumentException] {
      Versioned.readRangeOn(spark, root, v, "nope", 0L, 1L)
    }
    intercept[IllegalArgumentException] { // shrinking would orphan entries
      Versioned.commitDeclareStatsCols(spark, root, Seq("id"))
    }
    // extension: declare one column first, extend to both later — the
    // carried column keeps its entries, the new one is measured fresh
    val r2 = newRoot()
    for (win <- 0L until 4L)
      Versioned.commitAppend(spark, r2,
        (win * 100L until win * 100L + 100L).map(id => (id, id * 7L)).toDF("id", "m"))
    Versioned.commitDeclareStatsCols(spark, r2, Seq("id"))
    val v2 = Versioned.commitDeclareStatsCols(spark, r2, Seq("id", "m"))
    assert(Versioned.statsColsOf(spark, r2, v2) == Seq("id", "m"))
    assert(dirsRead(Versioned.readRangeOn(spark, r2, v2, "id", 150L, 250L)) == 2)
    assert(dirsRead(Versioned.readRangeOn(spark, r2, v2, "m", 0L, 100L)) == 1)
  }

  test("rewrite paths re-measure every declared column on their fresh dirs") {
    val root = newRoot()
    eightDirs(root)
    // CoW update rewrites the dirs holding id in [150, 180]
    Versioned.commitUpdate(spark, root, col("id").between(150L, 180L),
      d => d.withColumn("m",
        when(col("id").between(150L, 180L), col("m") + 5000L).otherwise(col("m"))))
    val v2 = Versioned.currentVersion(spark, root)
    // the rewritten rows moved to m >= 5000: the new dir must carry fresh
    // m bounds (a stale carry would prune it away — losing rows).  Each
    // id lives in BOTH halves (different m), so 2 rows per id move.
    val hot = Versioned.readRangeOn(spark, root, v2, "m", 5000L, 99999L)
    assert(hot.as[(Long, Long)].collect().map(_._1).sorted.toSeq ==
      ((150L to 180L) ++ (150L to 180L)).sorted)
    // and compaction keeps the map alive (one dir, measured on both cols)
    Versioned.commit(spark, root, Versioned.readAt(spark, root, v2))
    val v3 = Versioned.currentVersion(spark, root)
    assert(Versioned.dirMstats(spark, root, v3).keys.map(_._1).toSet == Set("id", "m"))
    val again = Versioned.readRangeOn(spark, root, v3, "m", 5000L, 99999L)
    assert(again.count() == 62)
  }

  test("statsRangeOn answers min/max from metadata, declines when unsound") {
    val root = newRoot()
    val v = eightDirs(root)
    assert(Versioned.statsRangeOn(spark, root, v, "id") == Some((0L, 399L)))
    assert(Versioned.statsRangeOn(spark, root, v, "m") == Some((0L, 1049L)))
    assert(Versioned.statsRangeOn(spark, root, v, "nope").isEmpty)
    // a statless dir might hide the extremum: decline
    Versioned.commitAppend(spark, root,
      Seq((9999L, null.asInstanceOf[java.lang.Long])).toDF("id", "m"))
    val v2 = Versioned.currentVersion(spark, root)
    assert(Versioned.statsRangeOn(spark, root, v2, "m").isEmpty)
    assert(Versioned.statsRangeOn(spark, root, v2, "id") == Some((0L, 9999L)))
    // live deletion vectors: the envelope is sound for pruning, wrong
    // as an exact extremum — decline
    Versioned.commitDeleteMOR(spark, root, col("id") === 9999L)
    val v3 = Versioned.currentVersion(spark, root)
    assert(Versioned.statsRangeOn(spark, root, v3, "id").isEmpty)
  }

  test("restore and clone carry the multi-column map verbatim") {
    val root = newRoot()
    val v = eightDirs(root)
    Versioned.commitAppend(spark, root, Seq((9999L, 9999L)).toDF("id", "m"))
    val vr = Versioned.restore(spark, root, v)
    assert(Versioned.statsColsOf(spark, root, vr) == Seq("id", "m"))
    assert(dirsRead(Versioned.readRangeAll(spark, root, vr,
      Seq(("id", 150L, 250L), ("m", 0L, 60L)))) == 2)
    val dst = newRoot()
    Versioned.cloneAt(spark, root, dst, vr)
    assert(dirsRead(Versioned.readRangeAll(spark, dst, 1,
      Seq(("id", 150L, 250L), ("m", 0L, 60L)))) == 2)
  }

  test("declared columns refuse rename/drop until retired; retire re-enables") {
    val root = newRoot()
    for (win <- 0L until 2L)
      Versioned.commitAppend(spark, root,
        (win * 100L until win * 100L + 100L).map(id => (id, id * 3L)).toDF("id", "m"))
    val v = Versioned.commitDeclareStatsCols(spark, root, Seq("id", "m"))
    // renaming or dropping a mapped column would orphan its entries
    // under the old name — refused until the column is retired
    intercept[IllegalArgumentException] {
      Versioned.commitAlterRename(spark, root, "m", "m2")
    }
    intercept[IllegalArgumentException] {
      Versioned.commitAlterDrop(spark, root, "m")
    }
    // retire must shrink strictly, to a subset
    intercept[IllegalArgumentException] {
      Versioned.commitRetireStatsCols(spark, root, Seq("id", "m"))
    }
    intercept[IllegalArgumentException] {
      Versioned.commitRetireStatsCols(spark, root, Seq("nope"))
    }
    val v2 = Versioned.commitRetireStatsCols(spark, root, Seq("id"))
    assert(Versioned.statsColsOf(spark, root, v2) == Seq("id"))
    intercept[IllegalArgumentException] { // retired: no longer probeable
      Versioned.readRangeOn(spark, root, v2, "m", 0L, 1L)
    }
    assert(dirsRead(Versioned.readRangeOn(spark, root, v2, "id", 0L, 50L)) == 1)
    // and the rename now lands
    Versioned.commitAlterRename(spark, root, "m", "m2")
    // retiring everything removes the map
    val v3 = Versioned.commitRetireStatsCols(spark, root, Seq.empty)
    assert(Versioned.statsColsOf(spark, root, v3).isEmpty)
  }

  test("readRangeAll composes with live deletion vectors") {
    val root = newRoot()
    eightDirs(root)
    Versioned.commitDeleteMOR(spark, root, col("id").between(160L, 170L))
    val v = Versioned.currentVersion(spark, root)
    val got = Versioned.readRangeAll(spark, root, v,
      Seq(("id", 150L, 250L), ("m", 0L, 60L)))
      .as[(Long, Long)].collect().sorted.toSeq
    assert(got == (150L to 250L).filterNot(id => id >= 160L && id <= 170L)
      .map(id => (id, id % 50L)).sorted)
  }

  test("keyed MERGE discovery confines via the multi-column map (CoW and MOR)") {
    val root = newRoot()
    for (win <- 0L until 4L)
      Versioned.commitAppend(spark, root,
        (win * 100L until win * 100L + 100L).map(id => (id, id * 7L)).toDF("id", "m"))
    val v = Versioned.commitDeclareStatsCols(spark, root, Seq("id", "m"))
    val pre = Versioned.manifest(spark, root, v)
    // CoW merge touching only window 1: the other three dirs must carry
    // into the new manifest VERBATIM — proof the discovery scan was
    // zone-map-confined by the mstats entries (no clustered statsCol
    // exists on this table at all)
    val vm = Versioned.commitMerge(spark, root,
      (150L to 160L).map(id => (id, -1L)).toDF("id", "m"), "id")
    val post = Versioned.manifest(spark, root, vm).toSet
    assert(Seq(0, 2, 3).forall(i => post.contains(pre(i))),
      "untouched windows must carry verbatim")
    assert(!post.contains(pre(1)), "the touched window must be rewritten")
    // MOR twin: the eviction vectors must attach ONLY to the dir whose
    // mstats entry overlaps the touched keys
    val vd = Versioned.commitMergeMOR(spark, root,
      (250L to 255L).map(id => (id, -2L)).toDF("id", "m"), "id")
    val dv = Versioned.dvOf(spark, root, vd)
    assert(dv.keySet == Set(pre(2)), s"vectors must confine to window 2: $dv")
    // content is exact through both paths
    val got = Versioned.readAt(spark, root, vd).as[(Long, Long)].collect().sorted
    val want = (0L until 400L).map { id =>
      (id, if (id >= 150L && id <= 160L) -1L
           else if (id >= 250L && id <= 255L) -2L else id * 7L)
    }.sorted
    assert(got.toSeq == want)
  }

  test("non-castable and all-null dirs are entry-less and read conservatively") {
    val root = newRoot()
    Versioned.commitAppend(spark, root, Seq((1L, "10"), (2L, "20")).toDF("id", "s"))
    Versioned.commitAppend(spark, root, Seq((3L, "xx")).toDF("id", "s")) // cast fails
    Versioned.commitAppend(spark, root,
      Seq((4L, null.asInstanceOf[String])).toDF("id", "s")) // all-null
    val v = Versioned.commitDeclareStatsCols(spark, root, Seq("id", "s"))
    val m = Versioned.dirMstats(spark, root, v)
    assert(m.keys.count(_._1 == "s") == 1) // only the castable dir has an entry
    // the probe prunes nothing it cannot prove: both entry-less dirs read
    val got = Versioned.readRangeOn(spark, root, v, "s", 15L, 25L)
    assert(got.as[(Long, String)].collect().toSeq == Seq((2L, "20")))
    assert(dirsRead(Versioned.readRangeOn(spark, root, v, "s", 100L, 200L)) == 2)
  }
}
