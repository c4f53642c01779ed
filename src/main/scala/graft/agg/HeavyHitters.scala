package graft.agg

import graft.GraftQuery
import graft.io.Tables
import graft.llm.TextOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters summary over a string key as a
  * `TypedImperativeAggregate`: at most `k` counters per buffer, classic
  * decrement-on-overflow update, mergeable by count-sum + subtract the
  * (k+1)-th largest counter (Agarwal et al., "Mergeable Summaries",
  * PODS 2012).
  *
  * Guarantee (survives arbitrary partitioning/merge order): for every key,
  * `true_count − n/(k+1) ≤ est ≤ true_count`, so every key with frequency
  * above n/(k+1) is present in the summary.  The *estimates* and the
  * marginal tail of the key set DO depend on merge order — so the summary
  * is a candidate generator, not a judged result; see
  * [[HeavyHittersQuery.exactHeavyHitters]] for the deterministic two-pass
  * operator built on it.
  *
  * 100 TB posture: the partial buffers are fixed-size (k entries) per
  * partition regardless of key cardinality, and the shuffle carries one
  * k-entry summary per partition instead of the full key space — the
  * map-side-combine shape that makes frequency mining feasible when
  * `groupBy(key)` itself would be the bottleneck.
  */
case class MisraGriesSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[UTF8String, java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 1, s"graft_mg_sketch requires k >= 1, got $k")

  type Buf = java.util.HashMap[UTF8String, java.lang.Long]

  override def createAggregationBuffer(): Buf = new Buf()

  override def update(m: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String]
      val cur = m.get(key)
      if (cur != null) {
        // java.util.HashMap.put keeps the existing (copied) key object
        m.put(key, cur + 1L)
      } else if (m.size < k) {
        m.put(key.copy(), java.lang.Long.valueOf(1L))
      } else {
        // overflow: decrement every counter, dropping zeros
        val it = m.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val nv = e.getValue - 1L
          if (nv == 0L) it.remove() else e.setValue(nv)
        }
      }
    }
    m
  }

  override def merge(a: Buf, b: Buf): Buf = {
    b.forEach { (key, v) =>
      val cur = a.get(key)
      if (cur != null) a.put(key, cur + v)
      else a.put(key, v) // b's keys are already private copies
    }
    if (a.size > k) {
      val vals = new Array[Long](a.size)
      var i = 0
      a.forEach { (_, v) => vals(i) = v; i += 1 }
      java.util.Arrays.sort(vals)
      val d = vals(vals.length - 1 - k) // (k+1)-th largest
      val it = a.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val nv = e.getValue - d
        if (nv <= 0L) it.remove() else e.setValue(nv)
      }
    }
    a
  }

  /** array<struct<word, est>> sorted by word — deterministic given the
    * final summary contents. */
  override def eval(m: Buf): Any = {
    val entries = new Array[(UTF8String, Long)](m.size)
    var i = 0
    m.forEach { (key, v) => entries(i) = (key, v.longValue()); i += 1 }
    scala.util.Sorting.stableSort(entries, (x: (UTF8String, Long), y: (UTF8String, Long)) =>
      x._1.compareTo(y._1) < 0)
    new GenericArrayData(entries.map { case (w, c) =>
      InternalRow(w, c)
    }.toArray[Any])
  }

  override def serialize(m: Buf): Array[Byte] = {
    var bytes = 4
    m.forEach { (key, _) => bytes += 4 + key.numBytes() + 8 }
    val bb = java.nio.ByteBuffer.allocate(bytes)
    bb.putInt(m.size)
    m.forEach { (key, v) =>
      val kb = key.getBytes
      bb.putInt(kb.length).put(kb).putLong(v)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val m = new Buf(n * 2)
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](bb.getInt())
      bb.get(kb)
      m.put(UTF8String.fromBytes(kb), java.lang.Long.valueOf(bb.getLong()))
      i += 1
    }
    m
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("word", StringType, nullable = false),
    StructField("est", LongType, nullable = false))))
  override def nullable: Boolean = false
  override def prettyName: String = "graft_mg_sketch"

  override protected def withNewChildInternal(newChild: Expression): MisraGriesSketch =
    copy(child = newChild)
  override def withNewMutableAggBufferOffset(offset: Int): MisraGriesSketch =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MisraGriesSketch =
    copy(inputAggBufferOffset = offset)
}

object HeavyHittersQuery {

  /** Column handle: Misra-Gries summary (array<struct<word, est>>) of a
    * string column with k counters. */
  def mgSketch(c: Column, k: Int): Column =
    GraftSqlBridge.column(
      MisraGriesSketch(GraftSqlBridge.expression(c), k).toAggregateExpression())

  /** Deterministic exact heavy hitters via sketch-then-verify:
    * pass 1 mines ≤ k candidates with fixed memory (superset of every key
    * with frequency > n/(k+1)); pass 2 exact-counts ONLY candidate rows
    * (broadcast candidate filter — the shuffle carries candidate keys, not
    * the key space) and keeps keys with `count * denom >= n`.  Requires
    * k + 1 > denom so no true heavy hitter can be missed; the result is
    * then independent of sketch merge order — identical to plain
    * `GROUP BY key HAVING count(*) * denom >= n`, which is the oracle.
    */
  def exactHeavyHitters(keys: DataFrame, keyCol: String, k: Int, denom: Long): DataFrame = {
    require(k + 1 > denom, s"k=$k cannot guarantee capture at threshold n/$denom")
    // one pass: sketch + total count ride the same aggregation
    val first = keys
      .agg(mgSketch(col(keyCol), k).as("s"), count(lit(1)).as("n"))
      .head()
    val n = first.getLong(1)
    val cands: Seq[String] =
      first.getSeq[org.apache.spark.sql.Row](0).map(_.getString(0))
    // second pass: exact-count ONLY candidate rows (InSet filter at the
    // scan — no join); ≤ k candidates live on the driver already
    val hit =
      if (cands.isEmpty) lit(false) else col(keyCol).isin(cands: _*)
    keys.filter(hit)
      .groupBy(keyCol)
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * lit(denom) >= lit(n))
  }

  /** Vocabulary heavy hitters of the corpus: words carrying ≥ 1% of all
    * token occurrences, mined by sketch + exact verify; the oracle is the
    * plain full aggregation. */
  val aggHeavyHitters: GraftQuery = GraftQuery("q_agg_heavy_hitters",
    """WITH toks AS (
      |  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
      |  FROM documents)
      |SELECT w, CAST(count(*) AS BIGINT) AS cnt
      |FROM toks GROUP BY w
      |HAVING count(*) * 100 >= (SELECT count(*) FROM toks)""".stripMargin) {
    (spark, sfDir) =>
      // session-staged token table: tokenized once, scanned three times
      // (sketch, candidate count, total)
      exactHeavyHitters(TextOps.tokenTable(spark, sfDir).select("w"),
        "w", k = 200, denom = 100L)
  }

  val all: Seq[GraftQuery] = Seq(aggHeavyHitters)
}
