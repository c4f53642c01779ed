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

  /** Position code for a ≤2-deletion variant: `0` for the string itself,
    * `(p+1) << 12` for a single deletion at p, `((x+1) << 12) | (y+1)`
    * for a deletion pair x < y.  Within one row a variant hash determines
    * its deletion COUNT (|v| = L − #deletions), so a variant's code list
    * is kind-uniform and [[fastssCompat]] can branch on the first code. */
  @inline private def posCode(x: Int, y: Int): Int = ((x + 1) << 12) | (y + 1)

  /** The FastSS 2-deletion neighborhood of a string WITH deletion
    * positions: struct rows (v, pc) where `v` is a 64-bit hash of the
    * variant (join key; a collision only adds a candidate that the
    * levenshtein guard removes) and `pc` the sorted position codes of
    * every deletion set producing that variant — kept ALL, not
    * canonicalized, because two strings whose runs differ can realize the
    * same variant from different position pairs and dropping one loses a
    * true match.  No variant string is materialized: a prefix
    * polynomial-hash array + power table give each variant hash in O(1)
    * (the ≤3 inter-deletion segments folded with precomputed powers),
    * O(L²) total per string.  Per-row grouping by hash replaces the
    * global `.distinct()` the two-level explode formulation needed — the
    * index build is map-only. */
  def deletionVariantPos2(name: UTF8String): ArrayData = {
    val s = name.toString
    val n = s.length
    // the 12-bit position fields of posCode hold p+1 <= 4095; longer
    // strings would silently corrupt codes and DROP true matches — this
    // kernel is for key/name-length strings (document-scale dedup goes
    // through the shingle pipelines), so fail fast instead
    require(n <= 4094,
      s"deletionVariantPos2 supports strings up to 4094 chars, got $n")
    // prefix(i) = poly hash of s[0,i); pow(i) = B^i.  B odd 64-bit mix.
    val B = 0x100000001b3L // FNV-64 prime
    val prefix = new Array[Long](n + 1)
    val pow = new Array[Long](n + 1)
    pow(0) = 1L
    var i = 0
    while (i < n) {
      prefix(i + 1) = prefix(i) * B + s.charAt(i)
      pow(i + 1) = pow(i) * B
      i += 1
    }
    // hash of s[0,a) ++ s[b,c) ++ s[d,n)  (the ≤2-deletion variant shape)
    def seg(a: Int, b: Int, c: Int, d: Int): Long = {
      var h = prefix(a)
      h = h * pow(c - b) + (prefix(c) - prefix(b) * pow(c - b))
      h = h * pow(n - d) + (prefix(n) - prefix(d) * pow(n - d))
      h
    }
    // murmur3 finalizer: disperse the structured polynomial values
    def fmix(x0: Long): Long = {
      var x = x0
      x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
      x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
      x ^= x >>> 33; x
    }
    val total = 1 + n + n * (n - 1) / 2
    val hv = new Array[Long](total)
    val pc = new Array[Int](total)
    hv(0) = fmix(prefix(n)); pc(0) = 0 // 0 deletions
    var k = 1
    i = 0
    while (i < n) { // delete position i
      hv(k) = fmix(seg(i, i + 1, n, n)); pc(k) = posCode(i, -1); k += 1
      var j = i + 1
      while (j < n) { // delete positions i < j
        hv(k) = fmix(seg(i, i + 1, j, j + 1)); pc(k) = posCode(i, j); k += 1
        j += 1
      }
      i += 1
    }
    // group codes by hash: sort indices by (hash, code), emit runs
    val order = Array.range(0, total).sortBy(idx => (hv(idx), pc(idx)))
    val out = new scala.collection.mutable.ArrayBuffer[Any](total)
    var lo = 0
    while (lo < total) {
      var hi = lo + 1
      while (hi < total && hv(order(hi)) == hv(order(lo))) hi += 1
      val codes = new Array[Int](hi - lo)
      var m = 0
      var t = lo
      while (t < hi) {
        val c = pc(order(t))
        if (m == 0 || codes(m - 1) != c) { codes(m) = c; m += 1 }
        t += 1
      }
      out += org.apache.spark.sql.catalyst.InternalRow(
        hv(order(lo)), new GenericArrayData(java.util.Arrays.copyOf(codes, m)))
      lo = hi
    }
    new GenericArrayData(out.toArray)
  }

  /** FastSS position-compatibility: given the deletion-position code
    * lists of two index entries that share a variant hash, is the pair a
    * GUARANTEED ed ≤ 2 match?  Sound and complete over true variant
    * equality (hash collisions are caught by the levenshtein guard
    * downstream):
    *   - ≤1 deletion on both sides (d0/d1 × d0/d1, any positions):
    *     always — delete + insert is ≤ 2 edits.
    *   - d2 × d2: same deletion pair on both sides — the strings then
    *     differ in ≤ 2 substitutions.  (Different pairs would only bound
    *     ed ≤ 4.)
    *   - d2 (x,y) × d1 (p): p == x or p == y−1 — delete the other
    *     character of the pair from the longer string and the remainder
    *     differs from the shorter by ≤ 1 substitution at p.
    *   - d2 × d0: always — the shorter IS the longer minus two chars.
    * Kind-uniformity (|v| = L − #deletions within a row) lets the kind
    * branch read just the first code of each list. */
  def fastssCompat(a: ArrayData, b: ArrayData): Boolean = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 || nb == 0) return false
    val kindA = if (a.getInt(0) == 0) 0 else if ((a.getInt(0) & 0xfff) == 0) 1 else 2
    val kindB = if (b.getInt(0) == 0) 0 else if ((b.getInt(0) & 0xfff) == 0) 1 else 2
    if (kindA <= 1 && kindB <= 1) return true
    if (kindA == 2 && kindB == 2) { // sorted lists: merge-intersect
      var i = 0; var j = 0
      while (i < na && j < nb) {
        val ca = a.getInt(i); val cb = b.getInt(j)
        if (ca == cb) return true
        if (ca < cb) i += 1 else j += 1
      }
      return false
    }
    if (kindA == 0 || kindB == 0) return true // d2 × d0
    // d2 × d1 (either order): p == x or p == y − 1
    val (d2, d1, n2, n1) =
      if (kindA == 2) (a, b, na, nb) else (b, a, nb, na)
    var i = 0
    while (i < n2) {
      val c = d2.getInt(i)
      val x = (c >> 12) - 1
      val y = (c & 0xfff) - 1
      var j = 0
      while (j < n1) {
        val p = (d1.getInt(j) >> 12) - 1
        if (p == x || p == y - 1) return true
        j += 1
      }
      i += 1
    }
    false
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

case class DeletionVariantPos2Expr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("v", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("pc",
        ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false),
        nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_deletion_variant_pos2"
  override def nullSafeEval(s: Any): Any =
    TextKernels.deletionVariantPos2(s.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.fns.TextKernels.deletionVariantPos2($s)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class FastssCompatExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.Predicate {
  override def checkInputDataTypes() = {
    def isIntArray(t: DataType): Boolean = t match {
      case ArrayType(org.apache.spark.sql.types.IntegerType, _) => true
      case _ => false
    }
    if (isIntArray(left.dataType) && isIntArray(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<int> arguments, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")
  }
  override def prettyName: String = "graft_fastss_compat"
  override def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.fastssCompat(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.fns.TextKernels.fastssCompat($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
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

  /** Column handle for [[DeletionVariantPos2Expr]] (per-row-grouped
    * 2-deletion-neighborhood hashes + deletion-position codes — the
    * d ≤ 2 fuzzy-join index kernel). */
  def deletionVariantPos2(spark: SparkSession, name: Column): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_deletion_variant_pos2",
      exprs => DeletionVariantPos2Expr(exprs(0)), "built-in")
    call_function("graft_deletion_variant_pos2", name)
  }

  /** Column handle for [[FastssCompatExpr]] (deletion-position
    * compatibility of two entries sharing a variant hash). */
  def fastssCompat(spark: SparkSession, a: Column, b: Column): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_fastss_compat",
      exprs => FastssCompatExpr(exprs(0), exprs(1)), "built-in")
    call_function("graft_fastss_compat", a, b)
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
