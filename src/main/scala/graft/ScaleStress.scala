package graft

import graft.joins.NonEquiJoins
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only scale stress for the structurally risky operators: synthesizes
  * an N-row relation and self-band-joins it through the bucketed rewrite.
  * A quadratic plan (BNLJ / CartesianProduct) would be hours at N=5M; the
  * rewrite must stay near-linear (shuffle + bounded per-bucket work).
  *
  * `sbt "runMain graft.ScaleStress <nRows> [eps]"` — prints rows, output
  * pairs, wall seconds, and asserts the plan has no nested loop.
  */
object ScaleStress {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 5000000L
    val eps = if (args.length > 1) args(1).toDouble else 0.5
    val spark = DevSession.local()
    // deterministic values spread over [0, n/100): ~100 rows per unit value,
    // so eps=0.5 keeps the output linear in n (bounded pairs per bucket)
    val df = spark.range(n)
      .select(col("id"), (pmod(col("id") * 2654435761L, lit(n)) / lit(100.0)).as("v"))
      .localCheckpoint()
    val a = df.select(col("id").as("ida"), col("v").as("va"))
    val b = df.select(col("id").as("idb"), col("v").as("vb"))
    val joined = NonEquiJoins.bandJoin(a, b, "va", "vb", eps)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      "band rewrite degraded to a nested loop")
    val t0 = System.nanoTime()
    val pairs = joined.count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""{"stress":"bandJoin","rows":$n,"eps":$eps,"pairs":$pairs,"sec":$sec%.1f}""")
    spark.stop()
  }
}
