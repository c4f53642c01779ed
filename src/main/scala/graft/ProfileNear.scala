package graft

import graft.fns.Exact._
import graft.io.Tables._
import graft.llm.TextOps._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dev scratch: stage-wise timing of the MinHash pipeline. */
object ProfileNear {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $tag%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    val P = 2147483647L
    for (_ <- 1 to 3) {
      val t = documents(spark, sfDir).select(col("doc_id"), toks(col("text")).as("t"))
      val sh = t.filter(size(col("t")) >= 3)
        .select(col("doc_id"), explode(shingles(col("t"))).as("s"))
        .withColumn("hb", pmod(md5Long(col("s")), lit(P)))
      time("explode+md5")(sh.count())
      val sig = sh.groupBy("doc_id")
        .agg(min(pmod(col("hb") * 3L + 7L, lit(P))).as("m0"),
          (1 until 16).map(j => min(pmod(col("hb") * (j * 31 + 5).toLong + j, lit(P))).as(s"m$j")) :+
            collect_list(col("s")).as("sh"): _*)
      time("sig agg")(sig.count())
      val bandStructs = (0 until 4).map { b =>
        val bs = concat_ws(",", (b * 4 until b * 4 + 4).map(j => col(s"m$j").cast(StringType)): _*)
        struct(lit(b).as("b"), bs.as("bs"))
      }
      val bands = sig.select(col("doc_id"), col("sh"), explode(array(bandStructs: _*)).as("x"))
        .select(col("doc_id"), col("sh"), col("x.b").as("b"), col("x.bs").as("bs"))
      val cand = bands.select(col("doc_id").as("ia"), col("sh").as("sha0"), col("b"), col("bs"))
        .join(bands.select(col("doc_id").as("ib"), col("sh").as("shb0"),
          col("b").as("b2"), col("bs").as("bs2")),
          col("b") === col("b2") && col("bs") === col("bs2") && col("ia") < col("ib"))
        .groupBy("ia", "ib")
        .agg(first(col("sha0")).as("sha"), first(col("shb0")).as("shb"))
      time("band join+cand")(println("cand=" + cand.count()))
      val common = size(array_intersect(col("sha"), col("shb")))
      val jacc = common / (size(col("sha")) + size(col("shb")) - common)
      time("jaccard")(cand.filter(jacc >= 0.5).count())
    }
    spark.stop()
  }
}
