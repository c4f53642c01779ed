package graft.io

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Model-based property test for the commit log: seeded random traces
  * of append / clustered-append / CoW-update / keyed-merge / compaction
  * / MOR-delete / MOR-merge / restore ops, each step checked against an in-memory
  * model — the whole-module law no single-op spec composes to (a
  * deletion vector surviving a compaction, a restore landing on a
  * vectored version, a CoW update over restored dirs...).  Also pins
  * history length, head-version monotonicity, metadata row counts at
  * every step, and time travel to a snapshot taken mid-trace surviving
  * to the end (and dying only at vacuum). */
class VersionedModelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def newRoot() =
    s"/tmp/graft_versioned_model/${java.util.UUID.randomUUID()}"

  private def toDf(m: Map[Long, (String, Long)]) =
    m.toSeq.map { case (id, (k, v)) => (id, k, v) }.toDF("id", "k", "m")

  private def readModel(root: String, v: Int): Map[Long, (String, Long)] =
    Versioned.readAt(spark, root, v).as[(Long, String, Long)]
      .collect().map { case (i, k, m) => i -> (k, m) }.toMap

  test("random op traces agree with the in-memory model at every step") {
    val rnd = new scala.util.Random(42)
    for (trace <- 1 to 3) {
      val root = newRoot()
      var model = Map.empty[Long, (String, Long)]
      var nextId = 0L
      def freshRows(n: Int): Map[Long, (String, Long)] = {
        val rows = (0 until n).map { _ =>
          val id = nextId; nextId += 1
          id -> (s"k${rnd.nextInt(4)}", rnd.nextInt(1000).toLong)
        }.toMap
        rows
      }
      // seed commit
      model = freshRows(40)
      Versioned.commit(spark, root, toDf(model), statsCol = Some("id"))
      // modelHist(v - 1) = the model at version v, for restore targets
      var modelHist = Vector(model)
      var checkpointVersion = 0
      var checkpointModel = Map.empty[Long, (String, Long)]
      for (step <- 1 to 14) {
        rnd.nextInt(8) match {
          case 0 => // append
            val rows = freshRows(10 + rnd.nextInt(20))
            model ++= rows
            Versioned.commitAppend(spark, root, toDf(rows))
          case 1 => // clustered append
            val rows = freshRows(10 + rnd.nextInt(20))
            model ++= rows
            Versioned.commitAppendClustered(spark, root, toDf(rows), "id",
              buckets = 1 + rnd.nextInt(4))
          case 2 => // CoW update of a random id window (bump m)
            val lo = rnd.nextLong(math.max(1, nextId))
            val hi = lo + 10
            model = model.map { case (id, (k, m)) =>
              id -> (k, if (id >= lo && id <= hi) m + 10000 else m)
            }
            Versioned.commitUpdate(spark, root,
              col("id") >= lo && col("id") <= hi,
              d => d.withColumn("m",
                when(col("id") >= lo && col("id") <= hi, col("m") + 10000)
                  .otherwise(col("m"))))
          case 3 => // keyed merge: replace some existing, insert some new
            val existing = model.keys.toSeq.sorted
              .take(5 + rnd.nextInt(5)).map(id => id -> (s"M$trace", -1L))
            val inserts = freshRows(5)
            val ups = existing.toMap ++ inserts
            model = model ++ ups
            Versioned.commitMerge(spark, root, toDf(ups), "id")
          case 4 => // clustering-preserving compaction (content no-op)
            Versioned.compactClustered(spark, root, "id",
              buckets = 1 + rnd.nextInt(4))
          case 5 => // MOR delete of a random id window (append if empty)
            val lo = rnd.nextLong(math.max(1, nextId))
            val hi = lo + 15
            if (model.keys.exists(id => id >= lo && id <= hi)) {
              model = model.filterNot { case (id, _) => id >= lo && id <= hi }
              Versioned.commitDeleteMOR(spark, root,
                col("id") >= lo && col("id") <= hi)
            } else {
              val rows = freshRows(5)
              model ++= rows
              Versioned.commitAppend(spark, root, toDf(rows))
            }
          case 6 => // restore to a random earlier version
            val target = 1 + rnd.nextInt(modelHist.size)
            model = modelHist(target - 1)
            Versioned.restore(spark, root, target)
          case 7 => // MERGE-ON-READ keyed upsert (no dir rewrites)
            val existing = model.keys.toSeq.sorted
              .take(3 + rnd.nextInt(5)).map(id => id -> (s"R$trace", -2L))
            val inserts = freshRows(3)
            val ups = existing.toMap ++ inserts
            model = model ++ ups
            Versioned.commitMergeMOR(spark, root, toDf(ups), "id")
        }
        val head = Versioned.currentVersion(spark, root)
        assert(head == 1 + step, s"trace $trace step $step: head=$head")
        assert(readModel(root, head) == model,
          s"trace $trace step $step diverged from the model")
        assert(Versioned.countAt(spark, root, head) == model.size,
          s"trace $trace step $step: metadata count diverged")
        modelHist :+= model
        if (step == 6) { checkpointVersion = head; checkpointModel = model }
      }
      // the mid-trace snapshot still reads byte-identically at the end
      assert(readModel(root, checkpointVersion) == checkpointModel,
        s"trace $trace: time travel to step-6 snapshot broken")
      // history covers every version with monotone timestamps
      val h = Versioned.history(spark, root)
        .as[(Int, Option[Long], Option[String], Int, Option[Long], Option[Long])]
        .collect().sortBy(_._1)
      assert(h.map(_._1).toSeq == (1 to 15))
      assert(h.flatMap(_._2).sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
      // a DEFAULT-GRACE vacuum is read-invisible over a live table: log
      // records below the floor go, but every young data dir — all of
      // them, the trace just wrote them — is shielded as a possible
      // in-flight stage, so nothing is reclaimed and the head reads
      // exactly (the vacuum-vs-commit race fix, traced end-to-end)
      val dataDir = new java.io.File(s"$root/data")
      val before = dataDir.listFiles().count(_.isDirectory)
      Versioned.vacuum(spark, root, keep = 1)
      assert(dataDir.listFiles().count(_.isDirectory) == before,
        s"trace $trace: default-grace vacuum reclaimed a young dir")
      assert(readModel(root, 15) == model)
      // the grace-0 sweep (single-writer stop) then reclaims for real
      Versioned.vacuum(spark, root, keep = 1, graceMs = 0)
      assert(readModel(root, 15) == model)
      intercept[Exception](Versioned.readAt(spark, root, checkpointVersion).count())
    }
  }
}
