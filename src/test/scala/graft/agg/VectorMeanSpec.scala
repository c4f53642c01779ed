package graft.agg

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VectorMeanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("UDAF mean equals driver-side computation, invariant to partitioning") {
    import spark.implicits._
    val r = new scala.util.Random(5)
    val data = (1 to 200).map(i => (i % 3, Seq.fill(8)(r.nextFloat() * 2 - 1)))
    val expected = data.groupBy(_._1).map { case (k, rows) =>
      val n = rows.size
      val sums = rows.map(_._2).transpose.map(_.map(v =>
        math.floor(v.toDouble * 1e6 + 0.5).toLong).sum)
      k -> sums.map(_ / (n * 1e6))
    }
    val vecMean = udaf(VectorMeanAgg)
    for (parts <- Seq(1, 4, 13)) {
      val df = data.toDF("label", "embedding").repartition(parts)
      val got = df.groupBy("label").agg(vecMean($"embedding").as("m"))
        .as[(Int, Seq[Double])].collect().toMap
      expected.foreach { case (k, exp) =>
        assert(got(k) == exp, s"label $k mismatch at $parts partitions")
      }
    }
  }

  test("ragged vectors: buffer grows, per-component counts (oracle semantics)") {
    import spark.implicits._
    // lengths 2, 3, 1 — whichever arrives first must not fix the buffer
    // size; component i averages over the vectors that HAVE component i,
    // exactly like the oracle's unnest + GROUP BY (label, i)
    val data = Seq((0, Seq(1f, 2f)), (0, Seq(3f, 4f, 6f)), (0, Seq(5f)))
    val vecMean = udaf(VectorMeanAgg)
    for (parts <- Seq(1, 3)) {
      val got = data.toDF("label", "embedding").repartition(parts)
        .groupBy("label").agg(vecMean($"embedding").as("m"))
        .as[(Int, Seq[Double])].collect().head._2
      assert(got == Seq(3.0, 3.0, 6.0), s"at $parts partitions got $got")
    }
  }
}
