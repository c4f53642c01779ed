package graft.io

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cross-feature gates: the token and vector indexes read through the
  * single readDirs choke point, so merge-on-read deletion vectors apply
  * to their probes without either index knowing; and the branch
  * fast-forward merge composes with a RACING main committer (both
  * publishers serialize, neither's rows are lost). */
class IndexCompositionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def newRoot(tag: String) =
    s"/tmp/graft_composition_spec/$tag-${java.util.UUID.randomUUID()}"

  test("token probe honors MOR deletes (the bloom is stale, the read is not)") {
    val root = newRoot("tok")
    val docs = (1L to 40L).map(i =>
      (i, if (i % 10 == 3) s"row$i with falcon inside" else s"row$i plain"))
      .toDF("id", "text")
    TextIndex.commitAppendIndexed(spark, root, docs, "text")
    // kill two of the four falcon docs positionally; the dir's token
    // bloom still claims 'falcon' (stale = conservative, never wrong)
    val v = Versioned.commitDeleteMOR(spark, root, col("id").isin(3L, 23L))
    val got = TextIndex.readToken(spark, root, v, "falcon")
      .select("id").as[Long].collect().sorted.toSeq
    assert(got == Seq(13L, 33L))
  }

  test("exact kNN honors MOR deletes (dead vectors cannot be neighbors)") {
    val root = newRoot("vec")
    val base = graft.llm.Similarity.quantized(spark, TestSpark.sf)
      .select(col("vec_id"), col("qv"), col("nrm"))
    VectorIndex.commitClustered(spark, root, base, cells = 8)
    // establish some query's true #1 neighbor, then MOR-delete it
    val before = VectorIndex.searchTopk(spark, root, 1)
      .filter(col("qid") === 0 && col("rn") === 1)
      .select("nid").as[Long].head()
    val v = Versioned.commitDeleteMOR(spark, root, col("vec_id") === before)
    val after = VectorIndex.searchTopk(spark, root, v)
    assert(after.filter(col("nid") === before).count() == 0,
      s"deleted vector $before must not surface as a neighbor")
    // and the result is still the exact brute force over the survivors
    val want = graft.llm.Similarity.bruteTopkOn(spark,
      Versioned.readAt(spark, root, v))
    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.select("qid", "nid", "rn").as[(Long, Long, Long)]
        .collect().sortBy(r => (r._1, r._3)).toSeq
    assert(key(after) == key(want))
  }

  test("fast-forward merge races a main append: both land, none lost") {
    for (round <- 1 to 3) {
      val root = newRoot(s"race$round")
      Versioned.commit(spark, root, (1L to 100L).toDF("id"))
      Branches.create(spark, root, "exp")
      Versioned.commitAppend(spark, s"$root/refs/exp",
        (1000L to 1019L).toDF("id"))
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      try {
        val merge = pool.submit(new java.util.concurrent.Callable[Int] {
          def call(): Int = Branches.merge(spark, root, "exp")
        })
        val append = pool.submit(new java.util.concurrent.Callable[Int] {
          def call(): Int = Versioned.commitAppend(spark, root,
            (2000L to 2009L).toDF("id"))
        })
        merge.get(); append.get()
      } finally pool.shutdown()
      val v = Versioned.currentVersion(spark, root)
      val ids = Versioned.readAt(spark, root, v)
        .select("id").as[Long].collect().sorted.toSeq
      assert(ids == ((1L to 100L) ++ (1000L to 1019L) ++ (2000L to 2009L)),
        s"round $round lost rows")
      assert(Versioned.countAt(spark, root, v) == 130)
    }
  }
}
