package graft.rel

import graft.GraftQuery
import graft.fns.Exact
import graft.io.Tables._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Round-4 additions: data-layout clustering (z-order) and the remaining
  * feasible TPC-H surface.
  */
object Relational7 {

  /** Bit-interleave two `bits`-wide non-negative keys into a Morton
    * (z-order) value — pure shift/mask/or arithmetic, identical in both
    * engines. */
  private def zInterleave(x: Column, y: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  private def zInterleaveSql(x: String, y: String, bits: Int): String =
    (0 until bits).map { i =>
      s"(((($x) >> $i) & 1) << ${2 * i}) | (((($y) >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " | ", ")")

  /** Z-order (Morton) layout clustering: interleave the bits of two join
    * dimensions into one sort key, then bin rows into target files by
    * z-range.  Sorting by z-value is THE multi-dimensional data-layout
    * primitive at 100 TB: each output file covers a small rectangle of the
    * (part, supp) space, so min/max footer stats prune scans filtered on
    * EITHER dimension — a linear sort (here: integer arithmetic + one
    * range partition) standing in for a quadratic clustering problem.  The
    * query emits each z-file's row count and bounding box — the stats a
    * reader would prune with; the oracle recomputes the identical
    * arithmetic. */
  val layoutZorder: GraftQuery = {
    val zSql = zInterleaveSql("l_partkey % 256", "l_suppkey % 256", 8)
    GraftQuery("q_layout_zorder",
      s"""WITH z AS (
         |  SELECT l_partkey % 256 AS x, l_suppkey % 256 AS y,
         |         $zSql AS zval
         |  FROM lineitem)
         |SELECT zval // 256 AS zfile, CAST(count(*) AS BIGINT) AS cnt,
         |       min(x) AS min_x, max(x) AS max_x,
         |       min(y) AS min_y, max(y) AS max_y
         |FROM z GROUP BY zval // 256""".stripMargin) { (spark, sfDir) =>
      val x = col("l_partkey") % 256L
      val y = col("l_suppkey") % 256L
      lineitem(spark, sfDir)
        .select(x.as("x"), y.as("y"),
          zInterleave(col("l_partkey") % 256L, col("l_suppkey") % 256L, 8).as("zval"))
        .groupBy(call_function("div", col("zval"), lit(256L)).as("zfile"))
        .agg(count(lit(1)).as("cnt"),
          min("x").as("min_x"), max("x").as("max_x"),
          min("y").as("min_y"), max("y").as("max_y"))
    }
  }

  val all: Seq[GraftQuery] = Seq(layoutZorder)
}
