package graft.fns

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Deterministic, oracle-parity arithmetic helpers.
  *
  * Why: the correctness gate hash-compares Spark output against a DuckDB
  * oracle.  Floating-point SUMs are order-dependent (different shuffle /
  * vectorization order => different low bits), so every aggregated money /
  * measure column is summed as a *scaled integer* (exact, associative,
  * order-independent) and only converted back to double at the very end.
  * Both engines then compute bit-identical results.
  *
  * Scale posture: all helpers are pure `Column` expressions built from
  * codegen'd built-ins — they stay inside WholeStageCodegen and add no
  * serialization or UDF cost at 100 TB.
  */
object Exact {

  /** Fixed-point view of a double column: round(x * 10^scale) as long.
    * Matches DuckDB `CAST(round(x * 10^scale, 0) AS BIGINT)` bit-for-bit
    * (both round half away from zero; the double multiply is IEEE-identical).
    */
  def scaled(c: Column, scale: Int): Column =
    round(c * pow10(scale)).cast(LongType)

  private def pow10(s: Int): Double = math.pow(10, s)

  /** Order-independent exact sum of a double column at fixed decimal scale,
    * returned as double. DuckDB twin:
    * `CAST(sum(CAST(round(x*10^s,0) AS BIGINT)) AS BIGINT) / 10^s.0`
    */
  def exactSum(c: Column, scale: Int): Column =
    sum(scaled(c, scale)) / lit(pow10(scale))

  /** Exact mean at fixed scale. DuckDB twin:
    * `CAST(sum(CAST(round(x*10^s,0) AS BIGINT)) AS BIGINT) / (count(*) * 10^s.0)`
    */
  def exactAvg(c: Column, scale: Int): Column =
    sum(scaled(c, scale)) / (count(lit(1)) * lit(pow10(scale)))

  /** 60-bit deterministic hash shared with the DuckDB oracle:
    * first 15 hex chars of md5, parsed as an integer.  DuckDB twin:
    * `('0x' || substr(md5(x), 1, 15))::BIGINT`.
    * Non-negative (< 2^60), safe in BIGINT on both engines.
    */
  def md5Long(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast(LongType)

  /** DuckDB SQL fragment mirroring [[md5Long]]. */
  def md5LongSql(expr: String): String =
    s"CAST('0x' || substr(md5(CAST(($expr) AS VARCHAR)), 1, 15) AS BIGINT)"

  /** SQL fragment mirroring [[exactSum]].  The outer DOUBLE cast is a no-op
    * in DuckDB (whose `/` is float division) but REQUIRED when the same
    * text is parsed by Spark SQL, where the `$p.0` literal is a DECIMAL and
    * would otherwise make the whole column decimal-typed. */
  def exactSumSql(expr: String, scale: Int): String = {
    val p = "1" + "0" * scale
    s"CAST(CAST(sum(CAST(round(($expr) * $p, 0) AS BIGINT)) AS BIGINT) / $p.0 AS DOUBLE)"
  }

  /** SQL fragment mirroring [[exactAvg]] (see [[exactSumSql]] re: cast). */
  def exactAvgSql(expr: String, scale: Int): String = {
    val p = "1" + "0" * scale
    s"CAST(CAST(sum(CAST(round(($expr) * $p, 0) AS BIGINT)) AS BIGINT) / (count(*) * $p.0) AS DOUBLE)"
  }

  /** DuckDB SQL fragment mirroring [[scaled]]. */
  def scaledSql(expr: String, scale: Int): String = {
    val p = "1" + "0" * scale
    s"CAST(round(($expr) * $p, 0) AS BIGINT)"
  }
}
