package graft.fns

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd sign-LSH hashing kernels.
  *
  * The random-hyperplane LSH index (graft.llm.Similarity) needs, per
  * vector, the sign of tables×planes dot products against deterministic
  * ±1 hyperplanes.  Expressing that as tables×planes separate
  * `LongVecDot(qv, <64-element literal>)` calls chained through `when`
  * sums builds an expression tree of ~10⁵ nodes whose evaluation measured
  * ~66 ns per multiply-add on the index-build path — the entire "C₀"
  * orchestration cost the LSH/brute crossover analysis attributed to the
  * bucket machinery (BASELINE.md) was really this tree.  These two
  * expressions collapse the whole hash into ONE tight codegen'd loop over
  * a flattened sign matrix shipped as a reference object: a single pass
  * over the input vector per (table, plane), primitive long arithmetic,
  * no per-plane literals, no when-chain.
  *
  * Both yield NULL on a dimension mismatch (the [[LongVecDot]]
  * convention), so a truncated embedding can never silently hash.
  */

/** All per-table bucket ids of one vector: `array<bigint>` of length
  * `tables`; bit p of entry t is set iff qv · plane(t,p) >= 0.  The index
  * build's hot path: posexplode of this array IS the postings table. */
case class LshBuckets(child: Expression, signs: Array[Long],
    tables: Int, planes: Int, dim: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_lsh_buckets"

  override def nullSafeEval(input: Any): Any = {
    val qv = input.asInstanceOf[ArrayData]
    if (qv.numElements() != dim) return null
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var p = 0
      while (p < planes) {
        val off = (t * planes + p) * dim
        var dot = 0L
        var i = 0
        while (i < dim) { dot += qv.getLong(i) * signs(off + i); i += 1 }
        if (dot >= 0) bucket |= (1L << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val signsRef = ctx.addReferenceObj("lshSigns", signs, "long[]")
    nullSafeCodeGen(ctx, ev, qv => {
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val bucket = ctx.freshName("bucket")
      val off = ctx.freshName("off")
      s"""
         |if ($qv.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $out = new long[$tables];
         |  for (int $t = 0; $t < $tables; $t++) {
         |    long $bucket = 0L;
         |    for (int $p = 0; $p < $planes; $p++) {
         |      int $off = ($t * $planes + $p) * $dim;
         |      long $dot = 0L;
         |      for (int $i = 0; $i < $dim; $i++) {
         |        $dot += $qv.getLong($i) * $signsRef[$off + $i];
         |      }
         |      if ($dot >= 0L) $bucket |= (1L << $p);
         |    }
         |    $out[$t] = $bucket;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** All tables×planes raw plane dots of one vector, t-major
  * (`array<bigint>`, length tables*planes): the query side derives its
  * bucket (sign bits) AND the multi-probe |margin| ranking from this one
  * array instead of re-evaluating per-plane literal dots. */
case class LshPlaneDots(child: Expression, signs: Array[Long],
    tables: Int, planes: Int, dim: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_lsh_plane_dots"

  override def nullSafeEval(input: Any): Any = {
    val qv = input.asInstanceOf[ArrayData]
    if (qv.numElements() != dim) return null
    val out = new Array[Long](tables * planes)
    var tp = 0
    while (tp < tables * planes) {
      val off = tp * dim
      var dot = 0L
      var i = 0
      while (i < dim) { dot += qv.getLong(i) * signs(off + i); i += 1 }
      out(tp) = dot
      tp += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val signsRef = ctx.addReferenceObj("lshSigns", signs, "long[]")
    nullSafeCodeGen(ctx, ev, qv => {
      val out = ctx.freshName("out")
      val tp = ctx.freshName("tp")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val off = ctx.freshName("off")
      s"""
         |if ($qv.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $out = new long[${tables * planes}];
         |  for (int $tp = 0; $tp < ${tables * planes}; $tp++) {
         |    int $off = $tp * $dim;
         |    long $dot = 0L;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      $dot += $qv.getLong($i) * $signsRef[$off + $i];
         |    }
         |    $out[$tp] = $dot;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshExpressions {
  /** Register per (tables, planes, dim, signs) under a distinct function
    * name and return Column handles.  The signs array is captured in the
    * registry closure, so two configs never collide. */
  def lshBuckets(spark: SparkSession, qv: Column, signs: Array[Long],
      tables: Int, planes: Int, dim: Int): Column = {
    val fn = s"graft_lsh_buckets_${tables}_${planes}_$dim"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fn, exprs => LshBuckets(exprs.head, signs, tables, planes, dim), "built-in")
    call_function(fn, qv)
  }

  def lshPlaneDots(spark: SparkSession, qv: Column, signs: Array[Long],
      tables: Int, planes: Int, dim: Int): Column = {
    val fn = s"graft_lsh_plane_dots_${tables}_${planes}_$dim"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fn, exprs => LshPlaneDots(exprs.head, signs, tables, planes, dim), "built-in")
    call_function(fn, qv)
  }
}
