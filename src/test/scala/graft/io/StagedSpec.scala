package graft.io

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Staging-dir mode of [[Staged]]: with `spark.graft.staging.dir` set the
  * shared intermediate becomes a durable parquet artifact — built once,
  * then REUSED by consumers that share none of the in-memory cache (a
  * sibling session has its own (session, tag) cache key, so its hit can
  * only come from the artifact on disk — the cluster staging-table
  * pattern this mode exists for).
  */
class StagedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("staging dir: artifact is built once and reused, not rebuilt") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_staging").toString
    val acc = spark.sparkContext.longAccumulator("staged-builds")
    def build = (0L until 100L).toDF("id").as[Long]
      .map { x => acc.add(1); x }.toDF("id")
    val tag = "stagedspec|artifact"
    spark.conf.set("spark.graft.staging.dir", root)
    try {
      val first = Staged(spark, tag)(build)
      assert(first.count() == 100 && acc.value == 100L,
        s"first consumer must run the build exactly once (${acc.value} row-builds)")

      // sibling session: fresh session state, fresh cache key — a rebuild
      // would re-run the pipeline and move the accumulator
      val sibling = spark.newSession()
      sibling.conf.set("spark.graft.staging.dir", root)
      val again = Staged(sibling, tag)(
        sibling.range(100).toDF("id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
          .map { x => acc.add(1); x }.toDF("id"))
      assert(again.count() == 100, "artifact read must return the staged rows")
      assert(acc.value == 100L,
        s"sibling consumer rebuilt the staged artifact (${acc.value} row-builds)")

      // the committer's marker gates reuse: a torn artifact is rebuilt
      val dir = new java.io.File(root).listFiles().filter(_.isDirectory).head
      assert(new java.io.File(dir, "_SUCCESS").exists(),
        "staged artifact must carry the committer's _SUCCESS marker")
    } finally {
      spark.conf.unset("spark.graft.staging.dir")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    }
  }

  test("without the conf, staging stays in-memory (no artifact written)") {
    import spark.implicits._
    val probe = java.nio.file.Files.createTempDirectory("graft_nostaging").toString
    try {
      val df = Staged(spark, "stagedspec|mem")((0L until 5L).toDF("id"))
      assert(df.count() == 5)
      assert(new java.io.File(probe).listFiles().isEmpty)
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(probe))
  }
}
