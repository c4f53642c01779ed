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
  * ships into generated code as one reference object, so tokenization is a
  * map-only pass over the corpus with zero shuffles and zero per-row
  * allocation beyond the token list itself.
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

  /** Encode one word (no spaces) into BPE tokens under `ranks`
    * (pair "left right" -> merge rank, lower merges first). */
  def encodeWord(word: String, ranks: java.util.HashMap[String, Integer]): Array[String] = {
    var syms = new java.util.ArrayList[String](word.length + 1)
    var i = 0
    while (i < word.length) { syms.add(String.valueOf(word.charAt(i))); i += 1 }
    syms.add("</w>")
    var done = syms.size <= 1
    while (!done) {
      // lowest-rank adjacent pair present
      var bestRank = Integer.MAX_VALUE
      var j = 0
      while (j < syms.size - 1) {
        val r = ranks.get(syms.get(j) + " " + syms.get(j + 1))
        if (r != null && r < bestRank) bestRank = r
        j += 1
      }
      if (bestRank == Integer.MAX_VALUE) done = true
      else {
        // merge every occurrence of the winning pair, left to right
        val merged = new java.util.ArrayList[String](syms.size)
        var k = 0
        while (k < syms.size) {
          if (k < syms.size - 1) {
            val r = ranks.get(syms.get(k) + " " + syms.get(k + 1))
            if (r != null && r.intValue() == bestRank) {
              merged.add(syms.get(k) + syms.get(k + 1)); k += 2
            } else { merged.add(syms.get(k)); k += 1 }
          } else { merged.add(syms.get(k)); k += 1 }
        }
        syms = merged
        if (syms.size <= 1) done = true
      }
    }
    val out = new Array[String](syms.size)
    syms.toArray(out)
    out
  }

  /** Encode a whole document: toks-split words, each BPE-encoded, token
    * streams concatenated in document order. */
  def encodeDoc(text: UTF8String, ranks: java.util.HashMap[String, Integer]): ArrayData = {
    val s = text.toString
    val out = new java.util.ArrayList[AnyRef]()
    var start = 0
    val n = s.length
    while (start <= n) {
      var end = s.indexOf(' ', start)
      if (end < 0) end = n
      if (end > start) {
        val toks = encodeWord(s.substring(start, end), ranks)
        var i = 0
        while (i < toks.length) { out.add(UTF8String.fromString(toks(i))); i += 1 }
      }
      start = end + 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** BPE-tokenize a text column under a fixed merge table.  The ranks map is
  * a codegen reference object and the row work is one static call, so the
  * expression stays inside WholeStageCodegen (no fallback path). */
case class BpeEncode(child: Expression, ranks: java.util.HashMap[String, Integer])
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
    BpeKernel.encodeDoc(input.asInstanceOf[UTF8String], ranks)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ranksRef = ctx.addReferenceObj("bpeRanks", ranks, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, text =>
      s"${ev.value} = graft.fns.BpeKernel.encodeDoc($text, $ranksRef);")
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
    val ranks = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((l, r), i) => ranks.put(l + " " + r, i) }
    val fn = s"graft_bpe_encode_${md5hex(tag + "|" + merges.mkString(","))}"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fn, exprs => BpeEncode(exprs.head, ranks), "built-in")
    call_function(fn, text)
  }
}
