package graft

import graft.io.{Versioned, VectorIndex}
import org.apache.spark.sql.functions._

/** Dev-only scale measurement for exact k-NN over the clustered vector
  * table: how much of the corpus the angular bounds actually skip, and
  * what exactness costs vs the brute-force scan.
  *
  * Corpus: `cells` Gaussian-ish cones around distinct random directions
  * (deterministic hash jitter), the realistic shape for embedding
  * spaces with topical structure.  Queries live in a handful of cones.
  *
  * `sbt "runMain graft.VecIndexStress [vectors] [dim] [cells]"` */
object VecIndexStress {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 1000000L
    val dim = if (args.length > 1) args(1).toInt else 64
    val cells = if (args.length > 2) args(2).toInt else 64
    val spark = DevSession.local()
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    // cone c base direction: deterministic pseudo-random +/-1e6 per dim;
    // member jitter: +/-15% per component from a hash of (id, dim)
    val cone = pmod(col("id"), lit(cells.toLong))
    val qv = transform(sequence(lit(0), lit(dim - 1)), j => {
      val base = when(pmod(xxhash64(cone * lit(dim) + j), lit(2)) === 0, lit(1000000L))
        .otherwise(lit(-1000000L))
      base + pmod(xxhash64(col("id") * lit(dim) + j), lit(300000L)) - lit(150000L)
    })
    val base = spark.range(0, n)
      .select(col("id").as("vec_id"), qv.as("qv"))
      .withColumn("nrm", aggregate(col("qv"), lit(0L), (a, x) => a + x * x).cast("double"))
      .localCheckpoint(true)
    val root = s"/tmp/graft_vecindex_stress/${java.util.UUID.randomUUID()}"
    val (_, tBuild) = time(VectorIndex.commitClustered(spark, root, base, cells = cells))
    println(f"build ($n vectors, $dim dims, $cells cells): $tBuild%.1f s")
    val queries = base.filter(col("vec_id") < 10).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray, r.getDouble(2)))
    val (res, tSearch) = time {
      val df = VectorIndex.searchTopkFor(spark, root, 1, queries)
      (df.collect(), df.inputFiles.map(_.split("/data/")(1).split("/part")(0)).distinct.length)
    }
    val total = Versioned.manifest(spark, root, 1).size
    val (brute, tBrute) = time(
      graft.llm.Similarity.bruteTopkOn(spark, Versioned.readAt(spark, root, 1)).collect())
    def key(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(x => (x._1, x._3)).toSeq
    assert(key(res._1) == key(brute), "bounded search must equal brute force")
    println(f"exact search (10 queries in 10 cones): $tSearch%.1f s " +
      f"reading ${res._2}/$total dirs vs brute $tBrute%.1f s (${tBrute / tSearch}%.1fx)")
    // query locality law: co-located queries (one topic) probe one cone
    val qLocal = base.filter(pmod(col("vec_id"), lit(cells.toLong)) === 0
        && col("vec_id") < 10L * cells).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray, r.getDouble(2)))
    val (resL, tLocal) = time {
      val df = VectorIndex.searchTopkFor(spark, root, 1, qLocal)
      (df.count(), df.inputFiles.map(_.split("/data/")(1).split("/part")(0)).distinct.length)
    }
    println(f"exact search (10 queries, ONE cone): $tLocal%.1f s " +
      f"reading ${resL._2}/$total dirs (${tBrute / tLocal}%.1fx vs brute)")
    spark.stop()
  }
}
