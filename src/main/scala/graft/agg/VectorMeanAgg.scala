package graft.agg

import graft.GraftQuery
import graft.io.Tables._
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Typed-Aggregator UDAF surface (B4/B11): element-wise vector mean over
  * `array<float>` embeddings.
  *
  * Numerics: each component is accumulated as a scaled integer
  * (round(x * 1e6) as long) so the result is exact, order-independent, and
  * bit-identical to the DuckDB oracle regardless of partitioning — a plain
  * float sum would drift with shuffle order.  The merge is associative, so
  * Catalyst plans partial + final aggregation (map-side combine) as usual.
  */
case class VecBuf(sums: Array[Long], n: Long)

object VectorMeanAgg extends Aggregator[Seq[Float], VecBuf, Seq[Double]] {

  /** Round half away from zero — matches Spark's `round` and DuckDB's
    * `round(x, 0)` for doubles. */
  private def rhalf(x: Double): Long =
    (if (x >= 0) math.floor(x + 0.5) else math.ceil(x - 0.5)).toLong

  override def zero: VecBuf = VecBuf(Array.emptyLongArray, 0L)

  override def reduce(b: VecBuf, v: Seq[Float]): VecBuf = {
    if (v == null) return b
    val sums = if (b.sums.length == 0) new Array[Long](v.length) else b.sums
    var i = 0
    while (i < v.length) { sums(i) += rhalf(v(i).toDouble * 1e6); i += 1 }
    VecBuf(sums, b.n + 1)
  }

  override def merge(a: VecBuf, b: VecBuf): VecBuf = {
    if (a.sums.length == 0) return b
    if (b.sums.length == 0) return a
    val out = new Array[Long](a.sums.length)
    var i = 0
    while (i < out.length) { out(i) = a.sums(i) + b.sums(i); i += 1 }
    VecBuf(out, a.n + b.n)
  }

  override def finish(r: VecBuf): Seq[Double] =
    r.sums.toSeq.map(s => s / (r.n * 1e6))

  override def bufferEncoder: Encoder[VecBuf] = Encoders.product[VecBuf]
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}

object VectorMeanQuery {
  /** Per-label centroid of the embedding space via the UDAF; the oracle
    * reproduces the scaled-integer mean with unnest + group-by-index. */
  val udafVectorMean: GraftQuery = GraftQuery("q_udaf_vector_mean",
    """WITH x AS (SELECT label, unnest(embedding) AS v,
      |                  generate_subscripts(embedding, 1) AS i
      |           FROM embeddings),
      |s AS (SELECT label, i,
      |        CAST(sum(CAST(round(CAST(v AS DOUBLE) * 1000000, 0) AS BIGINT)) AS BIGINT)
      |          / (count(*) * 1000000.0) AS comp
      |      FROM x GROUP BY label, i),
      |n AS (SELECT label, count(*) AS n FROM embeddings GROUP BY label)
      |SELECT s.label, n.n, list(s.comp ORDER BY s.i) AS mean_vec
      |FROM s JOIN n ON s.label = n.label
      |GROUP BY s.label, n.n""".stripMargin) { (spark, sfDir) =>
    val vecMean = udaf(VectorMeanAgg)
    embeddings(spark, sfDir)
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"), vecMean(col("embedding")).as("mean_vec"))
      .select("label", "n", "mean_vec")
  }

  val all: Seq[GraftQuery] = Seq(udafVectorMean)
}
