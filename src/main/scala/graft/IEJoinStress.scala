package graft

import graft.joins.NonEquiJoins
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only head-to-head of the two inequality-join physical shapes on a
  * DENSE output: N x N uniform values joined on `va < vb` (~N²/2 output
  * pairs).  Compares the bucketed-equi rewrite (lessThanJoinQuantile:
  * per-candidate predicate evaluation after the bucket join) against the
  * sort-merge operator (graft.plans.IEJoin: monotone pointer sweep, zero
  * per-pair predicate work).  Both must return identical counts.
  *
  * `sbt "runMain graft.IEJoinStress <nRows>"`.
  */
object IEJoinStress {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 20000L
    val spark = DevSession.local()
    val df = spark.range(n)
      .select(col("id"), (pmod(col("id") * 2654435761L, lit(n))).cast("double").as("v"))
      .localCheckpoint()
    val a = df.select(col("id").as("ida"), col("v").as("va"))
    val b = df.select(col("id").as("idb"), col("v").as("vb"))
    def time(tag: String)(mk: => org.apache.spark.sql.DataFrame): Long = {
      val t0 = System.nanoTime()
      val c = mk.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"stress":"ieJoin","variant":"$tag","rows":$n,"pairs":$c,"sec":$sec%.1f}""")
      c
    }
    val c1 = time("bucketed")(NonEquiJoins.lessThanJoinQuantile(a, b, "va", "vb"))
    val c2 = time("sortmerge")(graft.plans.IEJoin(a, b, "va", "vb"))
    assert(c1 == c2, s"variant mismatch: $c1 vs $c2")
    spark.stop()
  }
}
