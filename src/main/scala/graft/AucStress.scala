package graft

import org.apache.spark.sql.functions._

/** Dev-only scale measurement for the exact-AUC reduce
  * ([[graft.llm.QualityModel.aucOf]]): the bounded score domain
  * (0..1000 milli) means the corpus collapses into ≤ 1001 cells in ONE
  * map-side-combined aggregate — the only corpus-sized pass — and the
  * U-statistic folds over a ≤ 1001×1001 broadcast self-join whose cost
  * is corpus-size INDEPENDENT.  Both planted constructions have
  * closed-form answers, asserted every run:
  *
  *  - perfect: y = (s ≥ 501) ⇒ auc_micro = 1 000 000 exactly;
  *  - balanced: y = id % 2 with n a multiple of 2·1001 (every (s, y)
  *    cell equal) ⇒ U₂/(2PN) = 1/2 exactly ⇒ auc_micro = 500 000.
  *
  * `sbt "runMain graft.AucStress [nRows]"` (n is rounded down to a
  * multiple of 2002 so the balanced closed form holds). */
object AucStress {
  def main(args: Array[String]): Unit = {
    val nRaw = if (args.nonEmpty) args(0).toLong else 100000000L
    val n = nRaw - nRaw % 2002L
    val spark = DevSession.local()
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    def run(tag: String, yExpr: org.apache.spark.sql.Column, want: Long): Unit = {
      val sc = spark.range(n).select(
        (col("id") % 1001L).as("s"), yExpr.cast("long").as("y"))
      val (row, t) = time(graft.llm.QualityModel.aucOf(sc).collect()(0))
      val got = row.getLong(2)
      assert(got == want, s"$tag: auc_micro $got, want $want")
      println(f"AUCSTRESS $tag n=$n auc_micro=$got wall $t%.1f s " +
        f"(p=${row.getLong(0)} n=${row.getLong(1)})")
    }
    run("perfect", col("id") % 1001L >= 501L, 1000000L)
    run("balanced", col("id") % 2L === 0L, 500000L)
    spark.stop()
  }
}
