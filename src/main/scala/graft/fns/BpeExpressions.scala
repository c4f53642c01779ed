package graft.fns

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd byte-pair-encoding tokenizer kernel (Sennrich et al., "Neural
  * Machine Translation of Rare Words with Subword Units", ACL 2016).
  *
  * The merge table is learned OUTSIDE the expression (see
  * [[graft.llm.Bpe]]: distributed word-frequency dictionary, driver-side
  * merge loop over the vocabulary — the classic dictionary formulation) and
  * ships into generated code precompiled as a [[BpeTable]] reference
  * object: symbols interned to ints, pair-rank lookups a primitive
  * open-addressed probe, token strings pre-converted to UTF8String — the
  * per-row hot loop allocates only the output list.  Tokenization is a
  * map-only pass over the corpus with zero shuffles.
  *
  * Encoding semantics (the standard rank-greedy scheme): each whitespace
  * word becomes its character symbols plus a terminal `</w>` symbol; while
  * any adjacent symbol pair appears in the merge table, the LOWEST-RANK
  * such pair is merged at every occurrence (left to right); concatenating
  * the resulting tokens and dropping `</w>` reproduces the word exactly —
  * the roundtrip the spec asserts.  Word splitting replicates
  * [[graft.llm.TextOps.toks]] (split on ' ', empties dropped) so token
  * streams line up with every other text operator.
  */
object BpeKernel {

  /** Run the rank-greedy merge loop over one word; returns the symbol-id
    * buffer and its live size.  Symbol ids: interned (>= 0) from the
    * table; characters unseen by the table's alphabet/merges ride as
    * -(char+2) and can never merge. */
  private def mergeWord(word: String, tbl: BpeTable): (Array[Int], Int) = {
    val m = word.length + 1
    val ids = new Array[Int](m)
    var i = 0
    while (i < word.length) {
      val c = word.charAt(i)
      val id = tbl.charId(c)
      ids(i) = if (id >= 0) id else -(c.toInt + 2)
      i += 1
    }
    ids(word.length) = tbl.endId
    var size = m
    var done = size <= 1
    while (!done) {
      var bestRank = Integer.MAX_VALUE
      var j = 0
      while (j < size - 1) {
        val v = tbl.lookup(ids(j), ids(j + 1))
        if (v >= 0L) {
          val r = (v >>> 32).toInt
          if (r < bestRank) bestRank = r
        }
        j += 1
      }
      if (bestRank == Integer.MAX_VALUE) done = true
      else {
        // merge every occurrence of the winning rank, left to right, in place
        var w = 0
        j = 0
        while (j < size) {
          var merged = false
          if (j < size - 1) {
            val v = tbl.lookup(ids(j), ids(j + 1))
            if (v >= 0L && (v >>> 32).toInt == bestRank) {
              ids(w) = v.toInt; w += 1; j += 2; merged = true
            }
          }
          if (!merged) { ids(w) = ids(j); w += 1; j += 1 }
        }
        size = w
        if (size <= 1) done = true
      }
    }
    (ids, size)
  }

  private def encodeWordInto(word: String, tbl: BpeTable, u8: Array[UTF8String],
      out: java.util.ArrayList[AnyRef]): Unit = {
    val (ids, size) = mergeWord(word, tbl)
    var k = 0
    while (k < size) {
      val id = ids(k)
      out.add(if (id >= 0) u8(id)
      else UTF8String.fromString(String.valueOf((-id - 2).toChar)))
      k += 1
    }
  }

  /** Encode a whole document into VOCABULARY IDS — the model-input form:
    * interned symbol id + 1, with id 0 reserved for `<unk>` (a character
    * outside the table's training alphabet; meaningful only when the
    * table was built WITH an alphabet).  Same merge loop, primitive int
    * output array. */
  def encodeDocIds(text: UTF8String, tbl: BpeTable): ArrayData = {
    val s = text.toString
    var buf = new Array[Int](math.max(16, s.length + 8))
    var n = 0
    var start = 0
    val len = s.length
    while (start <= len) {
      var end = s.indexOf(' ', start)
      if (end < 0) end = len
      if (end > start) {
        val (ids, size) = mergeWord(s.substring(start, end), tbl)
        if (n + size > buf.length) buf = java.util.Arrays.copyOf(buf, (n + size) * 2)
        var k = 0
        while (k < size) {
          buf(n) = if (ids(k) >= 0) ids(k) + 1 else 0
          n += 1; k += 1
        }
      }
      start = end + 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(java.util.Arrays.copyOf(buf, n))
  }

  /** Encode a whole document: toks-split words, each BPE-encoded, token
    * streams concatenated in document order. */
  def encodeDoc(text: UTF8String, tbl: BpeTable): ArrayData = {
    val s = text.toString
    val u8 = tbl.symU8
    val out = new java.util.ArrayList[AnyRef]()
    var start = 0
    val n = s.length
    while (start <= n) {
      var end = s.indexOf(' ', start)
      if (end < 0) end = n
      if (end > start) encodeWordInto(s.substring(start, end), tbl, u8, out)
      start = end + 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** BPE-tokenize a text column under a fixed precompiled merge table.  The
  * table is a codegen reference object and the row work is one static
  * call, so the expression stays inside WholeStageCodegen (no fallback
  * path). */
case class BpeEncode(child: Expression, table: BpeTable)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_bpe_encode"

  override def nullSafeEval(input: Any): Any =
    BpeKernel.encodeDoc(input.asInstanceOf[UTF8String], table)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tblRef = ctx.addReferenceObj("bpeTable", table, classOf[BpeTable].getName)
    nullSafeCodeGen(ctx, ev, text =>
      s"${ev.value} = graft.fns.BpeKernel.encodeDoc($text, $tblRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** BPE-tokenize a text column into vocabulary ids (int array, 0 = unk).
  * Same reference-object + static-call shape as [[BpeEncode]]. */
case class BpeEncodeIds(child: Expression, table: BpeTable)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.IntegerType,
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_bpe_encode_ids"

  override def nullSafeEval(input: Any): Any =
    BpeKernel.encodeDocIds(input.asInstanceOf[UTF8String], table)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tblRef = ctx.addReferenceObj("bpeTable", table, classOf[BpeTable].getName)
    nullSafeCodeGen(ctx, ev, text =>
      s"${ev.value} = graft.fns.BpeKernel.encodeDocIds($text, $tblRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeExpressions {
  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Registered per merge-table tag (same convention as
    * [[PqExpressions.pqEncode]]): two tokenizers trained on different
    * corpora in one session never serve each other's merges. */
  def bpeEncode(spark: SparkSession, text: Column,
      merges: Seq[(String, String)], tag: String): Column = {
    val table = new BpeTable(merges)
    val fn = s"graft_bpe_encode_${md5hex(tag + "|" + merges.mkString(","))}"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fn, exprs => BpeEncode(exprs.head, table), "built-in")
    call_function(fn, text)
  }

  /** Id-space tokenization under a table built WITH a training alphabet
    * (so every training-corpus char owns a vocab id and only genuinely
    * out-of-alphabet chars hit `<unk>` = 0). */
  def bpeEncodeIds(spark: SparkSession, text: Column,
      merges: Seq[(String, String)], alphabet: Seq[Char], tag: String): Column = {
    val table = new BpeTable(merges, alphabet)
    val fn = s"graft_bpe_ids_${md5hex(tag + "|" + alphabet.mkString + "|" + merges.mkString(","))}"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fn, exprs => BpeEncodeIds(exprs.head, table), "built-in")
    call_function(fn, text)
  }
}
