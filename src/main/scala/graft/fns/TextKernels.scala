package graft.fns

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen-friendly text kernels for the dedup family's hot path.
  *
  * The composable formulation (`split` -> `filter` -> `transform(sequence,
  * concat_ws...)` -> `array_distinct` -> `md5`) walks every document
  * through FIVE interpreted higher-order array expressions before the
  * hashes exist.  These expressions do the whole tokenize -> shingle ->
  * md5-hash derivation in one tight JVM loop that whole-stage codegen
  * calls directly — one pass over the text, no intermediate string
  * arrays in the plan.
  *
  * Hash parity: emitted values are EXACTLY `Exact.md5Long` (first 15 hex
  * chars of md5 as a 60-bit long), so the DuckDB oracle twins
  * (`list_distinct`/`list_transform` over `md5`) are unchanged.
  */
object TextKernels {

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 15 hex chars of md5(s) as a long — bit-identical to
    * [[Exact.md5Long]] / DuckDB `('0x'||substr(md5(s),1,15))::BIGINT`.
    * One MessageDigest per thread (reset per call) — a per-hash
    * getInstance would dominate this hot loop with provider lookups. */
  def md5Long60(s: String): Long = {
    val m = md5.get()
    m.reset()
    val d = m.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var acc = 0L
    var i = 0
    while (i < 7) { acc = (acc << 8) | (d(i) & 0xffL); i += 1 }
    (acc << 4) | ((d(7) & 0xf0L) >> 4)
  }

  private def tokens(text: String): Array[String] =
    text.split(" ").filter(_.nonEmpty)

  /** Distinct word-3-gram shingle hashes (first-occurrence order); empty
    * when the doc has < 3 tokens.  == md5Long over
    * `array_distinct(transform(sequence..., concat_ws(" ", t_i..t_i+2)))`. */
  def shingleHashes(text: UTF8String): ArrayData = {
    val t = tokens(text.toString)
    if (t.length < 3) return new GenericArrayData(Array.emptyLongArray)
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i + 2 < t.length) {
      seen.add(t(i) + " " + t(i + 1) + " " + t(i + 2)); i += 1
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = md5Long60(it.next()); j += 1 }
    new GenericArrayData(out)
  }

  /** Distinct hashes of every `w`-token window (stride 1, first-occurrence
    * order); empty when the doc has < w tokens.  == md5Long over
    * `array_distinct(transform(sequence(1, len-w+1), concat_ws(" ",
    * t_i..t_{i+w-1})))` — one pass, one StringBuilder, no intermediate
    * window-string array in the plan. */
  def windowHashes(text: UTF8String, w: Int): ArrayData = {
    val t = tokens(text.toString)
    if (t.length < w) return new GenericArrayData(Array.emptyLongArray)
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i + w <= t.length) {
      sb.setLength(0)
      var j = 0
      while (j < w) {
        if (j > 0) sb.append(' ')
        sb.append(t(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = md5Long60(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  /** FastSS position-keyed deletion neighborhood of a string: struct rows
    * (pos, key) — pos 0 is the string itself, pos i (1-based) the string
    * with character i deleted.  == the composable
    * `concat(array(struct(0, s)), transform(sequence(1, len), i ->
    * struct(i, concat(substr(...), substr(...)))))` but one pass, one
    * StringBuilder, inside codegen. */
  def deletionVariants(name: UTF8String): ArrayData = {
    val s = name.toString
    val n = s.length
    val out = new Array[Any](n + 1)
    out(0) = org.apache.spark.sql.catalyst.InternalRow(0, name.copy())
    val sb = new java.lang.StringBuilder(math.max(n - 1, 0))
    var i = 1
    while (i <= n) {
      sb.setLength(0)
      sb.append(s, 0, i - 1).append(s, i, n)
      out(i) = org.apache.spark.sql.catalyst.InternalRow(
        i, UTF8String.fromString(sb.toString))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Hashes of the first `cap` DISTINCT tokens (first-occurrence order) —
    * == md5Long over `slice(array_distinct(tokens), 1, cap)`. */
  def distinctTokenHashes(text: UTF8String, cap: Int): ArrayData = {
    val seen = new java.util.LinkedHashSet[String]()
    val t = tokens(text.toString)
    var i = 0
    while (i < t.length && seen.size() < cap) { seen.add(t(i)); i += 1 }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = md5Long60(it.next()); j += 1 }
    new GenericArrayData(out)
  }

  /** (token count, distinct word-3-gram shingle count) in one pass with no
    * hashing and no intermediate shingle array in the plan — the repetition
    * / budget-selection scoring kernel.  == struct(len(t),
    * len(list_distinct(3-gram shingles))); n_shingles is 0 for < 3 tokens. */
  def shingleStats(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val t = tokens(text.toString)
    if (t.length < 3)
      return org.apache.spark.sql.catalyst.InternalRow(t.length.toLong, 0L)
    val seen = new java.util.HashSet[String]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i + 2 < t.length) {
      sb.setLength(0)
      sb.append(t(i)).append(' ').append(t(i + 1)).append(' ').append(t(i + 2))
      seen.add(sb.toString)
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(t.length.toLong, seen.size().toLong)
  }
}

case class ShingleStatsExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("n_tok",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("n_shingles",
      org.apache.spark.sql.types.LongType, nullable = false)))
  override def prettyName: String = "graft_shingle_stats"
  override def nullSafeEval(s: Any): Any =
    TextKernels.shingleStats(s.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.fns.TextKernels.shingleStats($s)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class ShingleHashesExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"
  override def nullSafeEval(s: Any): Any =
    TextKernels.shingleHashes(s.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.fns.TextKernels.shingleHashes($s)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class DistinctTokenHashesExpr(child: Expression, cap: Int) extends UnaryExpression {
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_distinct_token_hashes"
  override def nullSafeEval(s: Any): Any =
    TextKernels.distinctTokenHashes(s.asInstanceOf[UTF8String], cap)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.fns.TextKernels.distinctTokenHashes($s, $cap)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class DeletionVariantsExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("pos", org.apache.spark.sql.types.IntegerType,
        nullable = false),
      org.apache.spark.sql.types.StructField("key", StringType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_deletion_variants"
  override def nullSafeEval(s: Any): Any =
    TextKernels.deletionVariants(s.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.fns.TextKernels.deletionVariants($s)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class WindowHashesExpr(child: Expression, w: Int) extends UnaryExpression {
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_window_hashes"
  override def nullSafeEval(s: Any): Any =
    TextKernels.windowHashes(s.asInstanceOf[UTF8String], w)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.fns.TextKernels.windowHashes($s, $w)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextKernelCols {
  /** Column handle for [[ShingleHashesExpr]]. */
  def shingleHashes(spark: SparkSession, text: Column): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_shingle_hashes", exprs => ShingleHashesExpr(exprs(0)), "built-in")
    call_function("graft_shingle_hashes", text)
  }

  /** Column handle for [[DeletionVariantsExpr]] (FastSS position-keyed
    * deletion neighborhood). */
  def deletionVariants(spark: SparkSession, name: Column): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_deletion_variants", exprs => DeletionVariantsExpr(exprs(0)), "built-in")
    call_function("graft_deletion_variants", name)
  }

  /** Column handle for [[WindowHashesExpr]] at w=16 (the span-dedup
    * window). */
  def windowHashes16(spark: SparkSession, text: Column): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_window_hashes16", exprs => WindowHashesExpr(exprs(0), 16), "built-in")
    call_function("graft_window_hashes16", text)
  }

  /** Column handle for [[ShingleStatsExpr]] — struct(n_tok, n_shingles)
    * without hashing or intermediate arrays. */
  def shingleStats(spark: SparkSession, text: Column): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_shingle_stats", exprs => ShingleStatsExpr(exprs(0)), "built-in")
    call_function("graft_shingle_stats", text)
  }

  /** Column handle for [[DistinctTokenHashesExpr]] at cap=127 (the SimHash
    * lane-overflow bound). */
  def distinctTokenHashes127(spark: SparkSession, text: Column): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_distinct_token_hashes127",
      exprs => DistinctTokenHashesExpr(exprs(0), 127), "built-in")
    call_function("graft_distinct_token_hashes127", text)
  }
}
