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
  * only after a full extra shuffle.  For sparse/unbounded domains swap the
  * BitSet for a roaring bitmap or HLL (same class skeleton).
  */
case class BitmapDistinct(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.BitSet] with UnaryLike[Expression] {

  private val MaxKey = Int.MaxValue - 8 // BitSet addressing limit

  override def createAggregationBuffer(): java.util.BitSet = new java.util.BitSet()

  override def update(buffer: java.util.BitSet, input: InternalRow): java.util.BitSet = {
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
      require(k >= 0 && k <= MaxKey,
        s"graft_bitmap_distinct key out of dense domain [0, $MaxKey]: $k")
      buffer.set(k.toInt)
    }
    buffer
  }

  override def merge(a: java.util.BitSet, b: java.util.BitSet): java.util.BitSet = {
    a.or(b); a
  }

  override def eval(buffer: java.util.BitSet): Any = buffer.cardinality().toLong

  override def serialize(buffer: java.util.BitSet): Array[Byte] = buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): java.util.BitSet =
    java.util.BitSet.valueOf(bytes)

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
