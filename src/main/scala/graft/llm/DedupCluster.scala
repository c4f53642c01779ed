package graft.llm

import graft.GraftQuery
import graft.fns.Exact._
import graft.io.Tables._
import graft.llm.TextOps._
import org.apache.spark.sql.functions._

/** Dedup CLUSTERING (B10 follow-on): near-dup pairs only say "a ~ b"; to
  * pick one canonical doc per duplicate *group* you need the connected
  * components of the similarity graph (a ~ b ~ c must collapse to one
  * cluster even when a ̸~ c directly).
  *
  * Edges: 3-gram-shingle Jaccard >= 0.2 via the inverted-index equi join
  * (same machinery as q_llm_dedup_ngram, looser threshold for a denser
  * graph).  Components: iterative min-label propagation — each round every
  * node takes the min of its own and its neighbors' labels; fixpoint =
  * components labeled by their min doc_id.  Each round is one shuffle
  * (join + groupBy); rounds ≤ graph diameter.  100 TB posture: this
  * driver-paced loop with per-round materialization is the standard Spark
  * connected-components shape (GraphFrames does the same); for adversarial
  * long-chain graphs swap in alternating large-star/small-star, which
  * converges in O(log n) rounds with identical per-round plans.  Dup
  * clusters have tiny diameters, so plain propagation terminates fast.
  *
  * The oracle computes the same components by transitive closure
  * (recursive CTE, min reachable id).
  */
object DedupCluster {

  private val TAU = 0.2

  val dedupCluster: GraftQuery = GraftQuery("q_llm_dedup_cluster",
    s"""WITH RECURSIVE toks AS (SELECT doc_id, $toksSql AS t FROM documents),
       |sh AS (SELECT doc_id, ${md5LongSql("unnest")} AS s FROM (
       |         SELECT doc_id, unnest($shinglesSql) AS unnest
       |         FROM toks WHERE len(t) >= 3)),
       |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |p AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS common
       |      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |      GROUP BY 1, 2),
       |pairs AS (SELECT ia, ib
       |          FROM p JOIN sz x ON ia = x.doc_id JOIN sz y ON ib = y.doc_id
       |          WHERE common / (x.n + y.n - common) >= $TAU),
       |edges AS (SELECT ia AS a, ib AS b FROM pairs
       |          UNION ALL SELECT ib, ia FROM pairs),
       |nodes AS (SELECT DISTINCT a AS id FROM edges),
       |reach(a, b) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
       |comp AS (SELECT a AS doc_id, min(b) AS component FROM reach GROUP BY a)
       |SELECT c.doc_id, c.component, s.csize
       |FROM comp c JOIN (SELECT component, count(*) AS csize
       |                  FROM comp GROUP BY 1) s
       |  ON c.component = s.component""".stripMargin) { (spark, sfDir) =>
    val sh = hashedShingles(spark, sfDir) // session-staged, shared with q_llm_dedup_{ngram,near}
      .select(col("doc_id"), col("h").as("s"))
    val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val jacc = col("common") / (col("na") + col("nb") - col("common"))
    val pairs = sh.select(col("doc_id").as("ia"), col("s"))
      .join(sh.select(col("doc_id").as("ib"), col("s").as("s2")),
        col("s") === col("s2") && col("ia") < col("ib"))
      .groupBy("ia", "ib").agg(count(lit(1)).as("common"))
      .join(sz.select(col("doc_id"), col("n").as("na")), col("ia") === col("doc_id")).drop("doc_id")
      .join(sz.select(col("doc_id"), col("n").as("nb")), col("ib") === col("doc_id")).drop("doc_id")
      .filter(jacc >= TAU)
      .select("ia", "ib")
      .localCheckpoint()
    val comp = connectedComponents(pairs)
    val sizes = comp.groupBy(col("comp").as("component")).agg(count(lit(1)).as("csize"))
    comp.select(col("id").as("doc_id"), col("comp").as("component"))
      .join(sizes, "component")
      .select("doc_id", "component", "csize")
  }

  /** Edges already materialized -> above this size stay distributed. */
  private val DRIVER_CC_MAX_EDGES = 1000000L

  /** Connected components of an undirected pair list (ia, ib) -> (id, comp)
    * with comp = min doc_id of the component.
    *
    * Hybrid: the pair list is the output of candidate generation and is
    * normally orders of magnitude smaller than the corpus; when it fits the
    * driver (<= [[DRIVER_CC_MAX_EDGES]]) a local union-find collapses it in
    * one pass — no per-round Spark jobs.  Larger graphs take the
    * distributed min-label-propagation loop (<= diameter rounds, one
    * shuffle per round).  Both paths produce identical labels. */
  private[llm] def connectedComponents(
      pairs: org.apache.spark.sql.DataFrame,
      maxDriverEdges: Long = DRIVER_CC_MAX_EDGES): org.apache.spark.sql.DataFrame = {
    val spark = pairs.sparkSession
    if (pairs.count() <= maxDriverEdges) {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      pairs.collect().foreach { row =>
        val (a, b) = (row.getLong(0), row.getLong(1))
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { val lo = math.min(ra, rb); parent(math.max(ra, rb)) = lo }
      }
      import spark.implicits._
      parent.keys.toSeq.sorted.map(id => (id, find(id))).toDF("id", "comp")
    } else {
      val edges = pairs.select(col("ia").as("a"), col("ib").as("b"))
        .unionByName(pairs.select(col("ib").as("a"), col("ia").as("b")))
        .localCheckpoint() // reused every propagation round
      var comp = edges.select(col("a").as("id")).distinct()
        .select(col("id"), col("id").as("comp")).localCheckpoint()
      var changed = 1L
      while (changed > 0) {
        val nbrMin = edges
          .join(comp.select(col("id").as("nid"), col("comp").as("ncomp")),
            col("b") === col("nid"))
          .groupBy(col("a")).agg(min(col("ncomp")).as("nc"))
        val next = comp.join(nbrMin, col("id") === col("a"), "left")
          .select(col("id"), least(col("comp"), coalesce(col("nc"), col("comp"))).as("comp"))
          .localCheckpoint()
        changed = next.select(col("id").as("id2"), col("comp").as("comp2"))
          .join(comp, col("id2") === col("id"))
          .filter(col("comp2") =!= col("comp")).count()
        comp = next
      }
      comp
    }
  }

  val all: Seq[GraftQuery] = Seq(dedupCluster)
}
