package graft.agg

import graft.TestSpark
import graft.agg.HeavyHittersQuery._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Misra-Gries guarantees under arbitrary partitioning, and the
  * determinism of the sketch-then-verify exact operator. */
class HeavyHittersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Zipf-ish corpus: key i drawn with weight ~ 1/i over 200 keys. */
  private lazy val zipf: Seq[String] = {
    val r = new scala.util.Random(13)
    val keys = (1 to 200).map(i => s"w$i")
    val cum = keys.indices.map(i => 1.0 / (i + 1)).scanLeft(0.0)(_ + _).tail
    val tot = cum.last
    (1 to 30000).map { _ =>
      val u = r.nextDouble() * tot
      keys(cum.indexWhere(u <= _))
    }
  }

  private def trueCounts: Map[String, Long] =
    zipf.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  test("sketch captures every key with freq > n/(k+1), est within [true - n/(k+1), true]") {
    val n = zipf.size.toLong
    val k = 50
    for (parts <- Seq(1, 3, 32)) {
      val df = zipf.toDF("w").repartition(parts)
      val got = df.agg(mgSketch($"w", k).as("s"))
        .select(explode($"s").as("e"))
        .select($"e.word", $"e.est")
        .as[(String, Long)].collect().toMap
      val bound = n / (k + 1)
      trueCounts.foreach { case (key, cnt) =>
        if (cnt > bound)
          assert(got.contains(key), s"heavy key $key (cnt=$cnt > $bound) missing at parts=$parts")
        got.get(key).foreach { est =>
          assert(est <= cnt, s"overestimate for $key: $est > $cnt")
          assert(est >= cnt - bound, s"est too low for $key: $est < ${cnt - bound}")
        }
      }
      assert(got.size <= k, s"summary exceeded k: ${got.size}")
    }
  }

  test("exactHeavyHitters == plain GROUP BY HAVING, independent of partitioning") {
    val plain = {
      val n = zipf.size.toLong
      trueCounts.filter { case (_, c) => c * 100L >= n }
    }
    for (parts <- Seq(1, 7, 32)) {
      val df = zipf.toDF("w").repartition(parts)
      val got = exactHeavyHitters(df, "w", k = 200, denom = 100L)
        .as[(String, Long)].collect().toMap
      assert(got == plain, s"mismatch at parts=$parts")
    }
  }

  test("judged query matches a plain-aggregation twin on the driver fixture") {
    val q = aggHeavyHitters.fn(spark, TestSpark.sf)
    val toks = spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
      .select(explode(graft.llm.TextOps.toks($"text")).as("w"))
    val n = toks.count()
    val plain = toks.groupBy("w").agg(count(lit(1)).as("cnt"))
      .filter($"cnt" * 100L >= n)
    val cols = Seq("w", "cnt").map(col(_))
    assert(q.select(cols: _*).exceptAll(plain.select(cols: _*)).count() == 0)
    assert(plain.select(cols: _*).exceptAll(q.select(cols: _*)).count() == 0)
    assert(q.count() > 0, "fixture yielded no heavy hitters — lower the threshold")
  }

  test("mg sketch requires k >= 1 and ignores nulls") {
    intercept[IllegalArgumentException] {
      Seq("a").toDF("w").agg(mgSketch($"w", 0)).collect()
    }
    val got = Seq(Some("a"), None, Some("a"), None).toDF("w")
      .agg(mgSketch($"w", 4).as("s"))
      .select(explode($"s").as("e")).select($"e.word", $"e.est")
      .as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 2L))
  }
}
