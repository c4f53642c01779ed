package graft.fns

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The codegen'd PQ kernels must compute EXACTLY the definitional
  * product-quantization steps: per-subspace argmin-L2 code (ties toward
  * the lower id), query LUT of exact sub-dots, and ADC sum of selected
  * entries.  A divergence would silently re-code every staged PQ artifact,
  * so all three are pinned against a from-scratch Scala reimplementation
  * on vectors that exercise ties, zeros, negatives, and large magnitudes. */
class PqExpressionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val M = 4
  private val K = 4
  private val Dsub = 3
  private val Dim = M * Dsub
  private val Bits = Integer.numberOfTrailingZeros(K)

  // deterministic codebook: centroid j of subspace sub, component i
  private val cents: Array[Double] = Array.tabulate(M * K * Dsub) { x =>
    val sub = x / (K * Dsub); val j = (x % (K * Dsub)) / Dsub; val i = x % Dsub
    ((sub * 31 + j * 7 + i * 3) % 11) - 5.0
  }

  private def refEncode(v: Array[Long]): Long = {
    var cw = 0L
    for (sub <- 0 until M) {
      var best = 0; var bestD = Double.MaxValue
      for (j <- 0 until K) {
        val d = (0 until Dsub).map { i =>
          val diff = v(sub * Dsub + i) - cents((sub * K + j) * Dsub + i)
          diff * diff
        }.sum
        if (d < bestD) { bestD = d; best = j }
      }
      cw |= best.toLong << (sub * Bits)
    }
    cw
  }
  private def refLut(v: Array[Long]): Array[Double] =
    Array.tabulate(M * K) { mj =>
      val sub = mj / K; val j = mj % K
      (0 until Dsub).map(i => v(sub * Dsub + i) * cents((sub * K + j) * Dsub + i)).sum
    }
  private def refScore(cw: Long, lut: Array[Double]): Double =
    (0 until M).map(sub => lut(sub * K + ((cw >>> (sub * Bits)) & (K - 1)).toInt)).sum

  private val vectors: Seq[Array[Long]] = {
    val r = new scala.util.Random(45)
    Seq(
      Array.fill(Dim)(0L),                 // ties on every subspace: lowest id must win
      Array.tabulate(Dim)(i => i.toLong - Dim / 2),
      Array.fill(Dim)(1000000L),
      Array.tabulate(Dim)(_ => r.nextLong() % 1000L),
      Array.tabulate(Dim)(_ => r.nextLong() % 1000000L))
  }

  test("PqEncode matches the definitional per-subspace argmin, ties to lower id") {
    val df = vectors.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toDF("id", "qv")
    val got = df.select(col("id"),
        PqExpressions.pqEncode(spark, col("qv"), cents, "spec", M, K, Dsub).as("cw"))
      .as[(Long, Long)].collect().toMap
    vectors.zipWithIndex.foreach { case (v, i) =>
      assert(got(i.toLong) == refEncode(v), s"code-word mismatch on vector $i")
    }
  }

  test("PqLuts matches the definitional sub-dots, subspace-major") {
    val df = vectors.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toDF("id", "qv")
    val got = df.select(col("id"),
        PqExpressions.pqLuts(spark, col("qv"), cents, "spec", M, K, Dsub).as("lut"))
      .as[(Long, Seq[Double])].collect().toMap
    vectors.zipWithIndex.foreach { case (v, i) =>
      assert(got(i.toLong) == refLut(v).toSeq, s"LUT mismatch on vector $i")
    }
  }

  test("PqScore sums exactly the entries the code word selects") {
    val rows = vectors.zipWithIndex.map { case (v, i) =>
      (i.toLong, refEncode(v), refLut(vectors((i + 1) % vectors.size)).toSeq)
    }
    val got = rows.toDF("id", "cw", "lut")
      .select(col("id"),
        PqExpressions.pqScore(spark, col("cw"), col("lut"), M, K).as("s"))
      .as[(Long, Double)].collect().toMap
    rows.foreach { case (id, cw, lut) =>
      assert(got(id) == refScore(cw, lut.toArray), s"score mismatch on row $id")
    }
  }

  test("dimension mismatches yield NULL, never a partial code or score") {
    val out = Seq((1L, Seq(1L, 2L), Seq(1.0, 2.0)))
      .toDF("id", "qv", "lut")
      .select(
        PqExpressions.pqEncode(spark, col("qv"), cents, "spec", M, K, Dsub).as("cw"),
        PqExpressions.pqLuts(spark, col("qv"), cents, "spec", M, K, Dsub).as("lut2"),
        PqExpressions.pqScore(spark, lit(0L), col("lut"), M, K).as("s"))
      .collect()(0)
    assert(out.isNullAt(0) && out.isNullAt(1) && out.isNullAt(2))
  }
}
