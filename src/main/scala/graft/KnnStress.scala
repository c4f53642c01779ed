package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev stress: the blocked kNN self-join at corpus scale — does candidate
  * generation stay sum(|cell|²) and does widening the signature keep it
  * executor-sized?
  *
  * Synthetic quantized vectors (deterministic xxhash64 lanes, 16 dims is
  * enough to exercise the dot products); the sign signature comes from the
  * same lanes.  For a fixed corpus the candidate-pair count drops ~2x per
  * added signature bit, which is the scale argument for q_llm_knn_join:
  * at 100 TB you do not fight n² — you add bits until cells fit.
  *
  * `sbt "runMain graft.KnnStress <rows> [bits...]"`
  */
object KnnStress {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(1000000L)
    val bits = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(12, 14, 16)
    val spark = DevSession.local(defaultCpus = "32")
    import spark.implicits._

    val dims = 16
    // lane d = signed 20-bit int from xxhash64(id, d): dot products stay
    // far below 2^63 (16 * 2^40 per pair)
    val lanes = (0 until dims).map(d =>
      (pmod(xxhash64($"id", lit(d)), lit(1 << 20)) - lit(1 << 19)).as(s"x$d"))
    val base = spark.range(rows).select(($"id" +: lanes): _*)
      .withColumn("qv", array((0 until dims).map(d => col(s"x$d")): _*))
      .select($"id", $"qv")
      .localCheckpoint()

    def signBlk(nBits: Int) = {
      require(nBits <= dims, s"one sign bit per dimension: nBits <= $dims")
      (0 until nBits).map(d =>
        when(element_at($"qv", d + 1) >= 0, lit(1L << d)).otherwise(lit(0L)))
        .reduce(_ + _)
    }

    def run(nBits: Int): (Long, Double) = {
      val blk = signBlk(nBits)
      // candidate pairs within a cell; top-1 neighbor by integer dot
      val a = base.select($"id".as("ia"), blk.as("blk"), $"qv".as("qa"))
      val b = base.select($"id".as("ib"), blk.as("blk2"), $"qv".as("qb"))
      val dot = graft.fns.VecExpressions.vecDot(spark, $"qa", $"qb")
      val w = Window.partitionBy($"ia").orderBy(desc("dot"), asc("ib"))
      val t0 = System.nanoTime()
      val n = a.join(b, $"blk" === $"blk2" && $"ia" < $"ib")
        .select($"ia", $"ib", dot.as("dot"))
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .count()
      (n, (System.nanoTime() - t0) / 1e9)
    }

    def cells(nBits: Int): DataFrame = {
      base.groupBy(signBlk(nBits).as("blk")).agg(count(lit(1)).as("n"))
        .agg(sum(expr("n * (n - 1) div 2")).as("pairs"), max($"n").as("maxcell"))
    }

    for (nb <- bits) {
      val row = cells(nb).head()
      val (n, s) = run(nb)
      println(f"KNN bits=$nb%2d cells<=${1L << nb}%8d candPairs=${row.getLong(0)}%12d " +
        f"maxCell=${row.getLong(1)}%8d matchedRows=$n%10d $s%8.2f s")
    }
    spark.stop()
  }
}
