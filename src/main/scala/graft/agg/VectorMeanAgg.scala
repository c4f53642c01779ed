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
case class VecBuf(sums: Array[Long], counts: Array[Long])

object VectorMeanAgg extends Aggregator[Seq[Float], VecBuf, Seq[Double]] {

  /** Round half away from zero — matches Spark's `round` and DuckDB's
    * `round(x, 0)` for doubles. */
  private def rhalf(x: Double): Long =
    (if (x >= 0) math.floor(x + 0.5) else math.ceil(x - 0.5)).toLong

  override def zero: VecBuf = VecBuf(Array.emptyLongArray, Array.emptyLongArray)

  override def reduce(b: VecBuf, v: Seq[Float]): VecBuf = {
    if (v == null) return b
    // Ragged inputs are legal: the buffer grows to the longest vector seen,
    // and each component keeps its own count, so component i averages over
    // exactly the vectors that HAVE component i — the same semantics as the
    // oracle's unnest + GROUP BY (label, i) with per-group count(*).
    val (sums, counts) =
      if (b.sums.length >= v.length) (b.sums, b.counts)
      else (java.util.Arrays.copyOf(b.sums, v.length),
        java.util.Arrays.copyOf(b.counts, v.length))
    var i = 0
    while (i < v.length) {
      sums(i) += rhalf(v(i).toDouble * 1e6); counts(i) += 1; i += 1
    }
    VecBuf(sums, counts)
  }

  override def merge(a: VecBuf, b: VecBuf): VecBuf = {
    if (a.sums.length == 0) return b
    if (b.sums.length == 0) return a
    val (big, small) = if (a.sums.length >= b.sums.length) (a, b) else (b, a)
    val sums = java.util.Arrays.copyOf(big.sums, big.sums.length)
    val counts = java.util.Arrays.copyOf(big.counts, big.counts.length)
    var i = 0
    while (i < small.sums.length) {
      sums(i) += small.sums(i); counts(i) += small.counts(i); i += 1
    }
    VecBuf(sums, counts)
  }

  override def finish(r: VecBuf): Seq[Double] =
    r.sums.indices.map(i => r.sums(i) / (r.counts(i) * 1e6))

  override def bufferEncoder: Encoder[VecBuf] = Encoders.product[VecBuf]
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}

object VectorMeanQuery {
  /** Per-label centroid of the embedding space via the UDAF; the oracle
    * reproduces the scaled-integer mean with unnest + group-by-index.
    * The mean vector is posexploded to (label, n, i, comp) scalar rows so
    * the driver's hash comparator (which cannot hash array cells) checks
    * every component exactly; the double division sum/(n*1e6) is a single
    * IEEE op, bit-identical across engines. */
  val udafVectorMean: GraftQuery = GraftQuery("q_udaf_vector_mean",
    """WITH x AS (SELECT label, unnest(embedding) AS v,
      |                  generate_subscripts(embedding, 1) AS i
      |           FROM embeddings),
      |s AS (SELECT label, CAST(i AS BIGINT) AS i,
      |        CAST(sum(CAST(round(CAST(v AS DOUBLE) * 1000000, 0) AS BIGINT)) AS BIGINT)
      |          / (count(*) * 1000000.0) AS comp
      |      FROM x GROUP BY label, i),
      |n AS (SELECT label, count(*) AS n FROM embeddings GROUP BY label)
      |SELECT s.label, n.n, s.i, s.comp
      |FROM s JOIN n ON s.label = n.label""".stripMargin) { (spark, sfDir) =>
    val vecMean = udaf(VectorMeanAgg)
    embeddings(spark, sfDir)
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"), vecMean(col("embedding")).as("mean_vec"))
      .select(col("label"), col("n"),
        posexplode(col("mean_vec")).as(Seq("i", "comp")))
      .select(col("label"), col("n"),
        (col("i") + 1).cast(org.apache.spark.sql.types.LongType).as("i"),
        col("comp"))
  }

  val all: Seq[GraftQuery] = Seq(udafVectorMean)
}
