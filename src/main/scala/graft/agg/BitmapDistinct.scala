package graft.agg

import graft.GraftQuery
import graft.io.Tables._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType}

/** Exact COUNT(DISTINCT) over a dense non-negative integer key domain as a
  * `TypedImperativeAggregate[java.util.BitSet]` — the custom-aggregate
  * surface Spark offers below `Aggregator`: an arbitrary mutable buffer
  * with explicit serialize/merge, planned as partial + final aggregation
  * like any built-in.
  *
  * Buffer = one bit per key (BitSet), update = set, merge = bitwise OR,
  * eval = cardinality.  For a dense surrogate-key domain (order keys, user
  * ids) this is both exact and far smaller than a hash set of longs —
  * |domain|/8 bytes regardless of row count, merged with word-wide ORs.
  * 100 TB posture: map-side partial buffers OR into |domain|/8-byte
  * bitmaps, so the shuffle carries one bitmap per (group, partition), not
  * per row — the same shape Spark's own count-distinct rewrite reaches
  * only after a full extra shuffle.
  *
  * Keys outside the dense window [0, 2^26) — negative keys, or surrogate
  * keys that outgrow it (TPC-H l_orderkey around SF~350) — spill to a
  * hash-set side buffer instead of failing, so the aggregate is total over
  * the long domain and a single adversarial key can no longer force a
  * ~256 MB bitmap allocation (the bitmap is capped at 8 MiB; outliers cost
  * per-key hash-set entries, degrading gracefully toward Spark's own
  * count-distinct).  The two stores partition the key space, so
  * cardinality is their plain sum.
  */
case class BitmapDistinct(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BitmapDistinct.Buf] with UnaryLike[Expression] {
  import BitmapDistinct.{Buf, DenseLimit}

  override def createAggregationBuffer(): Buf =
    new Buf(new java.util.BitSet(), new java.util.HashSet[java.lang.Long]())

  override def update(buffer: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      val k = v match {
        case l: java.lang.Long    => l.longValue()
        case i: java.lang.Integer => i.longValue()
        case s: java.lang.Short   => s.longValue()
        case b: java.lang.Byte    => b.longValue()
        case other => throw new IllegalArgumentException(
          s"graft_bitmap_distinct requires an integral key, got ${other.getClass.getName}")
      }
      if (k >= 0 && k < DenseLimit) buffer.bits.set(k.toInt)
      else buffer.sparse.add(k)
    }
    buffer
  }

  override def merge(a: Buf, b: Buf): Buf = {
    a.bits.or(b.bits); a.sparse.addAll(b.sparse); a
  }

  override def eval(buffer: Buf): Any =
    buffer.bits.cardinality().toLong + buffer.sparse.size().toLong

  override def serialize(buffer: Buf): Array[Byte] = {
    val bits = buffer.bits.toByteArray
    val bb = java.nio.ByteBuffer.allocate(4 + bits.length + 8 * buffer.sparse.size())
    bb.putInt(bits.length).put(bits)
    buffer.sparse.forEach(k => bb.putLong(k))
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val bits = new Array[Byte](bb.getInt())
    bb.get(bits)
    val sparse = new java.util.HashSet[java.lang.Long]()
    while (bb.hasRemaining) sparse.add(bb.getLong())
    new Buf(java.util.BitSet.valueOf(bits), sparse)
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bitmap_distinct"

  override protected def withNewChildInternal(newChild: Expression): BitmapDistinct =
    copy(child = newChild)
  override def withNewMutableAggBufferOffset(offset: Int): BitmapDistinct =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BitmapDistinct =
    copy(inputAggBufferOffset = offset)
}

object BitmapDistinct {
  /** Dense window bound: bitmap covers [0, 2^26) (<= 8 MiB); the rest of
    * the long domain lives in the sparse set. */
  val DenseLimit: Long = 1L << 26

  /** Aggregation buffer: a bitmap over the dense window plus a hash set for
    * everything else (disjoint key ranges). */
  final class Buf(val bits: java.util.BitSet, val sparse: java.util.HashSet[java.lang.Long])
}

object BitmapDistinctQuery {

  /** Column handle: bitmap-exact distinct of a long column. */
  def bitmapDistinct(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    GraftSqlBridge.column(
      BitmapDistinct(GraftSqlBridge.expression(c)).toAggregateExpression())

  /** Distinct order/part/supplier keys per returnflag via the bitmap
    * aggregate; the oracle is plain COUNT(DISTINCT). */
  val aggBitmapDistinct: GraftQuery = GraftQuery("q_agg_bitmap_distinct",
    """SELECT l_returnflag,
      |  count(DISTINCT l_orderkey) AS nd_order,
      |  count(DISTINCT l_partkey) AS nd_part,
      |  count(DISTINCT l_suppkey) AS nd_supp
      |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (spark, sfDir) =>
    lineitem(spark, sfDir).groupBy("l_returnflag").agg(
      bitmapDistinct(col("l_orderkey")).as("nd_order"),
      bitmapDistinct(col("l_partkey")).as("nd_part"),
      bitmapDistinct(col("l_suppkey")).as("nd_supp"))
  }

  val all: Seq[GraftQuery] = Seq(aggBitmapDistinct)
}
