package graft.fns

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The codegen'd LSH hash kernels must compute EXACTLY the definitional
  * per-plane dots: bit p of table t's bucket set iff qv · plane(t,p) >= 0,
  * planes from the same md5-derived ±1 matrix.  A divergence here would
  * silently re-bucket every staged postings index, so the kernels are
  * pinned against a from-scratch Scala reimplementation of the
  * definition, on vectors that exercise sign boundaries (zeros,
  * negatives, large magnitudes). */
class LshExpressionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Tables = 4
  private val Planes = 8
  private val Dim = 16

  private def sign(t: Int, p: Int, i: Int): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$t|$p|$i".getBytes("UTF-8"))
    if ((hex(0) & 1) == 1) 1L else -1L
  }
  private val signs: Array[Long] = {
    val arr = new Array[Long](Tables * Planes * Dim)
    for (t <- 0 until Tables; p <- 0 until Planes; i <- 0 until Dim)
      arr(((t * Planes) + p) * Dim + i) = sign(t, p, i)
    arr
  }

  private def refDots(v: Array[Long]): Array[Long] =
    Array.tabulate(Tables * Planes) { tp =>
      (0 until Dim).map(i => v(i) * signs(tp * Dim + i)).sum
    }
  private def refBuckets(v: Array[Long]): Array[Long] =
    Array.tabulate(Tables) { t =>
      (0 until Planes).map { p =>
        if (refDots(v)(t * Planes + p) >= 0) 1L << p else 0L
      }.sum
    }

  private val vectors: Seq[Array[Long]] = {
    val r = new scala.util.Random(44)
    Seq(
      Array.fill(Dim)(0L),                                   // all-zero: every dot == 0 -> all bits set
      Array.tabulate(Dim)(i => if (i % 2 == 0) 1L else -1L), // alternating signs
      Array.fill(Dim)(1000000L),                             // large positive
      Array.tabulate(Dim)(_ => r.nextLong() % 1000000L),
      Array.tabulate(Dim)(_ => r.nextLong() % 1000000L))
  }

  test("LshBuckets matches the definitional per-plane sign hash") {
    val df = vectors.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toDF("id", "qv")
    val got = df.select(col("id"),
        LshExpressions.lshBuckets(spark, col("qv"), signs, Tables, Planes, Dim).as("b"))
      .as[(Long, Seq[Long])].collect().toMap
    vectors.zipWithIndex.foreach { case (v, i) =>
      assert(got(i.toLong) == refBuckets(v).toSeq,
        s"bucket mismatch on vector $i")
    }
  }

  test("LshPlaneDots matches the definitional dots, t-major") {
    val df = vectors.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toDF("id", "qv")
    val got = df.select(col("id"),
        LshExpressions.lshPlaneDots(spark, col("qv"), signs, Tables, Planes, Dim).as("d"))
      .as[(Long, Seq[Long])].collect().toMap
    vectors.zipWithIndex.foreach { case (v, i) =>
      assert(got(i.toLong) == refDots(v).toSeq, s"dots mismatch on vector $i")
    }
  }

  test("dimension mismatch yields NULL, never a partial hash") {
    val df = Seq((1L, Seq(1L, 2L, 3L))).toDF("id", "qv") // wrong dim
    val out = df.select(
      LshExpressions.lshBuckets(spark, col("qv"), signs, Tables, Planes, Dim).as("b"),
      LshExpressions.lshPlaneDots(spark, col("qv"), signs, Tables, Planes, Dim).as("d"))
      .collect()(0)
    assert(out.isNullAt(0) && out.isNullAt(1))
  }
}
