package graft.rel

import graft.{Queries, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** The partsupp stand-in guard: the 8 TPC-H twins derive a synthetic
  * partsupp CTE shared verbatim with the DuckDB oracle.  Should a future
  * testdata refresh ship a REAL partsupp.parquet, running the stand-in
  * against it would silently diverge from TPC-H — the guard must fail
  * loudly instead, and must stay silent on today's layout. */
class Relational9GuardSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("a shipped partsupp.parquet fails the TPC-H twins loudly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ps_guard").toFile
    // mirror the real tables via symlinks; plant a partsupp file
    graft.io.Tables.names.foreach { t =>
      java.nio.file.Files.createSymbolicLink(
        new java.io.File(dir, s"$t.parquet").toPath,
        new java.io.File(s"${TestSpark.sf}/$t.parquet").toPath)
    }
    new java.io.File(dir, "partsupp.parquet").createNewFile()
    val e = intercept[IllegalStateException] {
      Queries.queries("q_sql_tpch_q2")(spark, dir.getAbsolutePath).count()
    }
    assert(e.getMessage.contains("Migrate"))
  }

  test("today's layout (no partsupp.parquet) passes the guard") {
    Relational9.assertNoRealPartsupp(spark, TestSpark.sf)
    assert(Queries.queries("q_sql_tpch_q2")(spark, TestSpark.sf).count() > 0)
  }
}
