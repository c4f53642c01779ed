package graft.llm

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Row-conservation gate for the two-level (hierarchical) cell assignment
  * under sample/corpus drift.
  *
  * The hazard (flagged by review of `trainedCellsHierK`): coarse centroids
  * are one Lloyd update past their members, so RE-assigning the sample can
  * leave a coarse group with zero sample members — and hence zero trained
  * fine centroids.  A corpus row whose coarse argmax lands in such a group
  * would be silently eliminated by the in-group fine join: data loss
  * inside a dedup decision.  The fix falls back to the coarse centroid
  * itself as the empty group's single fine cell (negative cell id).
  *
  * This spec ENGINEERS the drift deterministically through the public
  * path (corpus > TrainCap so trainSample halves it by xxhash parity):
  *
  *  - a giant tight cluster of tiny vectors at angle ~0° — owns the two
  *    lowest sample ids p0 (0°) and p1 (0.05°), which seed coarse cells;
  *  - one heavy vector h at 40° whose nearest seed is p1: cell p1's Lloyd
  *    mean is dragged to ~37° (h dominates, the cluster half pulls back);
  *  - a second heavy vector h2 at 40.3° seeded into its own cell via p2
  *    at 80.1°, so the post-Lloyd centroid c_p2 ≈ 40.3° STEALS h on
  *    re-assignment (0.3° < 2.7°), while the cluster — including p1's own
  *    point — re-assigns to c_p0 ≈ 0°.  Nothing in the sample remains
  *    within 30° of c_p1: coarse group p1 is EMPTY on re-assignment;
  *  - victim rows exist only in the corpus (odd xxhash parity) at 36°,
  *    strictly nearest c_p1 — exactly the rows the unfixed join dropped.
  */
class SemanticDedupDriftSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("empty coarse group: fallback fine cell conserves every corpus row") {
    val n = 270000L // > Similarity.TrainCap so trainSample keeps even-hash ids only
    // role ids resolved against the SAME hash the sampler uses
    val par = spark.range(0, 300)
      .select(col("id"), pmod(xxhash64(col("id")), lit(2)).as("h"))
      .as[(Long, Long)].collect()
    val even = par.filter(_._2 == 0L).map(_._1).sorted
    val odd = par.filter(_._2 == 1L).map(_._1).sorted
    val Array(idP0, idP1, idP2, idH, idH2) = even.take(5)
    val victims = odd.filter(_ >= 100).take(20).toSet
    assert(victims.size == 20)

    def vec(deg: Double, mag: Double): Array[Long] = {
      val r = math.toRadians(deg)
      Array(math.round(mag * math.cos(r)), math.round(mag * math.sin(r)))
    }
    val specials: Map[Long, Array[Long]] = Map(
      idP0 -> vec(0.0, 1000), idP1 -> vec(0.05, 1000), idP2 -> vec(80.1, 1000),
      idH -> vec(40.0, 6.5e8), idH2 -> vec(40.3, 6.5e8))
    val sMap = typedlit(specials.map { case (k, v) => k -> v.toSeq })
    val vVec = typedlit(vec(36.0, 1000).toSeq)
    // cluster filler: angle jittered in [-0.1°, 0.1°] by a second hash
    val jit = (pmod(xxhash64(col("id") + 1000000L), lit(2001)) - 1000)
      .cast(DoubleType) / 10000.0
    val rad = radians(jit)
    val clusterQv = array(
      round(cos(rad) * 1000).cast(LongType), round(sin(rad) * 1000).cast(LongType))
    val base = spark.range(0, n)
      .select(col("id").as("vec_id"),
        when(col("id").isInCollection(victims), vVec)
          .otherwise(coalesce(element_at(sMap, col("id")), clusterQv)).as("qv"))
      .withColumn("nrm",
        graft.fns.VecExpressions.vecDot(spark, col("qv"), col("qv")).cast(DoubleType))
      .localCheckpoint(true)

    val cells = SemanticDedup
      .trainedCellsHierK(spark, "semhier:driftspec", base, k = 6, coarse = 3)
      .as[(Long, Long)].collect()
    assert(cells.length == n, s"row conservation: ${cells.length} of $n assigned")
    assert(cells.map(_._1).distinct.length == n, "every corpus row exactly once")
    // the drift genuinely fired: the victims sit in a FALLBACK fine cell
    // (negative id = the empty coarse group's own centroid), i.e. the
    // unfixed inner join would have dropped precisely these rows
    val fallback = cells.filter(_._2 < 0)
    assert(fallback.nonEmpty, "scenario must exercise an empty coarse group")
    assert(fallback.map(_._1).toSet == victims,
      s"fallback rows ${fallback.map(_._1).toSet} != engineered victims $victims")
  }
}
