package graft.io

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gates for copy-on-write updates and incremental MV maintenance: the
  * refreshed MV must equal a full recompute under appends, deletes and
  * group-migrating updates (including groups vanishing and being born),
  * and commitUpdate must rewrite ONLY the dirs containing matched rows,
  * carrying every other dir into the new manifest verbatim. */
class IncrementalViewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def newRoot() =
    s"/tmp/graft_ivm_spec/${java.util.UUID.randomUUID()}"

  private val keys = Seq("k")
  private val measures = Seq("cnt" -> lit(1L), "sum_m" -> col("m"))

  private def build(df: DataFrame): DataFrame =
    df.groupBy("k").agg(count(lit(1)).as("cnt"), sum(col("m")).as("sum_m"))

  private def asMap(df: DataFrame): Map[String, (Long, Long)] =
    df.select("k", "cnt", "sum_m").as[(String, Long, Long)]
      .collect().map { case (k, c, s) => k -> (c, s) }.toMap

  test("append refresh equals the full recompute") {
    val root = newRoot()
    val base = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 5L)).toDF("id", "k", "m")
    Versioned.commit(spark, root, base)
    val mv1 = build(Versioned.readAt(spark, root, 1))
    Versioned.commitAppend(spark, root,
      Seq((4L, "b", 7L), (5L, "c", 1L)).toDF("id", "k", "m"))
    val mv2 = IncrementalView.refresh(mv1, Versioned.diff(spark, root, 1, 2), keys, measures)
    assert(asMap(mv2) == asMap(build(Versioned.readAt(spark, root, 2))))
    assert(asMap(mv2) == Map("a" -> (2L, 30L), "b" -> (2L, 12L), "c" -> (1L, 1L)))
  }

  test("group-migrating update: old group vanishes, new group is born") {
    val root = newRoot()
    Versioned.commit(spark, root,
      Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "b", 30L)).toDF("id", "k", "m"))
    val mv1 = build(Versioned.readAt(spark, root, 1))
    // relabel ALL of group a to group z: a must vanish, z must appear
    Versioned.commitUpdate(spark, root, col("k") === "a",
      d => d.withColumn("k", when(col("k") === "a", lit("z")).otherwise(col("k"))))
    val mv2 = IncrementalView.refresh(mv1, Versioned.diff(spark, root, 1, 2), keys, measures)
    assert(asMap(mv2) == Map("b" -> (2L, 50L), "z" -> (1L, 10L)))
    assert(asMap(mv2) == asMap(build(Versioned.readAt(spark, root, 2))))
  }

  test("delete refresh drops rows and vanished groups") {
    val root = newRoot()
    Versioned.commit(spark, root,
      Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 5L)).toDF("id", "k", "m"))
    val mv1 = build(Versioned.readAt(spark, root, 1))
    // delete group b entirely and one of group a's rows
    Versioned.commitUpdate(spark, root, col("k") === "b" || col("id") === 2L,
      d => d.filter(!(col("k") === "b" || col("id") === 2L)))
    val mv2 = IncrementalView.refresh(mv1, Versioned.diff(spark, root, 1, 2), keys, measures)
    assert(asMap(mv2) == Map("a" -> (1L, 10L)))
  }

  test("commitUpdate rewrites only the touched dirs") {
    val root = newRoot()
    Versioned.commitAppend(spark, root, Seq((1L, "a", 1L)).toDF("id", "k", "m"))
    Versioned.commitAppend(spark, root, Seq((2L, "b", 2L)).toDF("id", "k", "m"))
    val m2 = Versioned.manifest(spark, root, 2)
    assert(m2.size == 2)
    // pred matches rows only in the second dir
    Versioned.commitUpdate(spark, root, col("k") === "b",
      d => d.withColumn("m", when(col("k") === "b", col("m") * 10).otherwise(col("m"))))
    val m3 = Versioned.manifest(spark, root, 3)
    assert(m3.size == 2)
    assert(m3.contains(m2.head), "untouched dir must carry through verbatim")
    assert(!m3.contains(m2(1)), "touched dir must be replaced")
    assert(Versioned.readAt(spark, root, 3)
      .as[(Long, String, Long)].collect().sorted.toSeq ==
      Seq((1L, "a", 1L), (2L, "b", 20L)))
    // time travel unaffected: v2 still reads the pre-update rows
    assert(Versioned.readAt(spark, root, 2)
      .as[(Long, String, Long)].collect().sorted.toSeq ==
      Seq((1L, "a", 1L), (2L, "b", 2L)))
  }

  test("no-match update commits a version with the same dirs") {
    val root = newRoot()
    Versioned.commit(spark, root, Seq((1L, "a", 1L)).toDF("id", "k", "m"))
    Versioned.commitUpdate(spark, root, col("k") === "nope", d => d)
    assert(Versioned.manifest(spark, root, 2) == Versioned.manifest(spark, root, 1))
    assert(Versioned.diff(spark, root, 1, 2).count() == 0)
  }

  test("judged q_mv_incremental equals the direct group-by at sf0.001") {
    val sfDir = "/root/testdata/sf0.001"
    val got = graft.Queries.queries("q_mv_incremental")(spark, sfDir)
      .as[(String, String, Long, Long)].collect().sorted.toSeq
    val want = Tables.documents(spark, sfDir)
      .withColumn("lang",
        when(col("doc_id") % 10 >= 8 && col("doc_id") % 7 === 0, lit("xx"))
          .otherwise(col("lang")))
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("cnt"), sum(col("n_chars")).as("sum_chars"))
      .as[(String, String, Long, Long)].collect().sorted.toSeq
    assert(got == want)
  }
}
