package graft.rel

import graft.{Queries, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** q_scan_schema_widening's premise must stay true: Spark's `mergeSchema`
  * null-fills a MISSING column but REJECTS a type-conflicting one, so the
  * cast-on-read recipe the query demonstrates is necessary, not paranoia.
  * If a future Spark version starts widening int→long in mergeSchema this
  * test fails loudly and the query's scaladoc should be updated. */
class SchemaWideningSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("mergeSchema rejects the int-vs-long conflict the recipe works around") {
    // running the query builds the two-generation layout and proves the
    // cast-on-read path returns data
    assert(Queries.queries("q_scan_schema_widening")(spark, TestSpark.sf).count() > 0)
    val path = "/tmp/graft_schema_widen_" +
      TestSpark.sf.replaceAll("[^A-Za-z0-9]", "_")
    val e = intercept[Throwable] {
      spark.read.option("mergeSchema", "true")
        .parquet(s"$path/v1", s"$path/v2").schema
    }
    val full = (Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(_.toString).mkString(" | ")).toLowerCase
    assert(full.contains("merge"), s"expected a schema-merge failure, got: $full")
  }
}
