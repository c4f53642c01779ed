package graft.joins

import graft.TestSpark
import graft.joins.NonEquiJoins._
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck-generated cross-checks for the bucketed non-equi rewrites
  * (SURVEY §5.2(3)): random frames INCLUDING adversarial boundary values
  * (exact multiples of eps, duplicates, negatives), each sampled with a
  * fixed seed so failures reproduce.  Each sample spins real Spark jobs,
  * so the case count is small and the generators are the adversarial
  * part. */
class NonEquiJoinsPropSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  /** Values biased toward bucket boundaries: multiples of eps, off-by-one
    * around them, duplicates, negatives. */
  private def valuesGen(eps: Double): Gen[List[Double]] =
    Gen.listOfN(60, Gen.oneOf(
      Gen.chooseNum(-40, 40).map(_ * eps),              // exact boundaries
      Gen.chooseNum(-40, 40).map(_ * eps + eps / 1000), // just past
      Gen.chooseNum(-40, 40).map(_ * eps - eps / 1000), // just short
      Gen.chooseNum(-400.0, 400.0)))                    // anywhere

  test("bandJoin == naive on generated boundary-heavy frames (5 seeds)") {
    for (seed <- 1L to 5L) {
      val eps = sample(Gen.oneOf(0.5, 1.0, 10.0, 33.3), seed)
      val vals = sample(valuesGen(eps), seed)
      val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
      val a = df.select($"id".as("ida"), $"v".as("va"))
      val b = df.select($"id".as("idb"), $"v".as("vb"))
      val fast = bandJoin(a, b, "va", "vb", eps)
      val naive = a.crossJoin(b).filter(abs($"va" - $"vb") <= eps)
      val diff = fast.exceptAll(naive).count() + naive.exceptAll(fast).count()
      assert(diff == 0, s"seed=$seed eps=$eps: $diff rows differ")
    }
  }

  test("bandJoin with NULL values == naive (nulls never match, inner and outer)") {
    for (seed <- 1L to 3L) {
      val eps = 10.0
      val vals = sample(valuesGen(eps), seed)
      // every 5th value null on each side, offset so null meets non-null,
      // null meets null, and both directions
      val rows = vals.zipWithIndex.map { case (v, i) =>
        (i.toLong, if (i % 5 == 0) None else Some(v))
      }
      val df = rows.toDF("id", "v")
      val a = df.select($"id".as("ida"), $"v".as("va"))
      val b = df.select($"id".as("idb"), $"v".as("vb"))
      val fast = bandJoin(a, b, "va", "vb", eps)
      val naive = a.crossJoin(b).filter(abs($"va" - $"vb") <= eps)
      assert(fast.exceptAll(naive).count() + naive.exceptAll(fast).count() == 0)
      // outer composition: inner matches ∪ anti survivors (incl. null-valued
      // left rows) must equal the naive LEFT JOIN exactly
      val outer = fast
        .unionByName(a.join(fast.select("ida"), Seq("ida"), "left_anti")
          .withColumn("idb", lit(null).cast("long"))
          .withColumn("vb", lit(null).cast("double")))
      val naiveOuter = a.join(b, abs($"va" - $"vb") <= eps, "left")
      assert(outer.exceptAll(naiveOuter).count() + naiveOuter.exceptAll(outer).count() == 0,
        s"seed=$seed: outer band composition diverges from naive LEFT JOIN")
    }
  }

  test("intervalOverlapJoinVar == naive on generated variable-length intervals (5 seeds)") {
    for (seed <- 20L to 24L) {
      // starts cluster near bucket boundaries; lengths from sub-bucket to
      // multi-bucket, including empty (end == start) intervals
      val W = 100L
      val gen = Gen.listOfN(50, for {
        s <- Gen.oneOf(Gen.chooseNum(-10L, 10L).map(_ * W),
          Gen.chooseNum(-1000L, 1000L))
        len <- Gen.oneOf(Gen.const(0L), Gen.chooseNum(1L, 30L),
          Gen.chooseNum(1L, 350L))
      } yield (s, s + len))
      val iv = sample(gen, seed)
      val df = iv.zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) }
        .toDF("id", "s", "e")
      val a = df.select($"id".as("ida"), $"s".as("sa"), $"e".as("ea"))
      val b = df.select($"id".as("idb"), $"s".as("sb"), $"e".as("eb"))
      val fast = intervalOverlapJoinVar(a, b, "sa", "ea", "sb", "eb", bucketWidth = W)
      val naive = a.crossJoin(b).filter($"sa" < $"eb" && $"sb" < $"ea")
      val diff = fast.exceptAll(naive).count() + naive.exceptAll(fast).count()
      assert(diff == 0, s"seed=$seed: $diff rows differ")
    }
  }

  test("lessThanJoin == naive on generated frames with out-of-range clamps (5 seeds)") {
    for (seed <- 10L to 14L) {
      val vals = sample(Gen.listOfN(60, Gen.chooseNum(-500.0, 500.0)), seed)
      val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
      val a = df.select($"id".as("ida"), $"v".as("va"))
      val b = df.select($"id".as("idb"), $"v".as("vb"))
      // [lo, hi] deliberately narrower than the data: clamped rows must
      // still join correctly
      val fast = lessThanJoin(a, b, "va", "vb", lo = -100, hi = 100, buckets = 7)
      val naive = a.crossJoin(b).filter($"va" < $"vb")
      val diff = fast.exceptAll(naive).count() + naive.exceptAll(fast).count()
      assert(diff == 0, s"seed=$seed: $diff rows differ")
    }
  }
}
