package graft.fns

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Codegen'd integer dot product over two `array<bigint>` columns.
  *
  * Why a custom Catalyst Expression: the composable alternative
  * (`aggregate(zip_with(a, b, _*_), 0L, _+_)`) uses higher-order functions,
  * which Spark evaluates interpreted (no whole-stage codegen) — measured
  * ~5× slower on the candidate-pair hot loops of the similarity/dedup
  * operators.  This expression stays inside WholeStageCodegen as a tight
  * primitive long loop.  Inputs are the scaled-integer quantized vectors
  * (see graft.fns.Exact), so the result is exact and oracle-reproducible
  * (DuckDB `list_dot_product` on BIGINT lists).
  */
case class LongVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }
  override def dataType: DataType = LongType
  // NULL on length mismatch (like zip_with), so the registered SQL function
  // can never return a silently-partial dot product to an outside caller.
  override def nullable: Boolean = true
  override def prettyName: String = "graft_vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) { acc += x.getLong(i) * y.getLong(i); i += 1 }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $a.getLong($i) * $b.getLong($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd double dot product over numeric arrays — each side may be
  * `array<bigint>` or `array<double>` (long elements are widened to double).
  * Same rationale as [[LongVecDot]]: the `aggregate(zip_with(...))`
  * formulation is interpreted; this one is a tight codegen'd loop.  Used in
  * the k-means trainer where quantized vectors (long) meet fractional
  * centroids (double).
  *
  * Like [[LongVecDot]], mismatched array lengths yield NULL (zip_with
  * semantics) — both expressions are registered session-wide, so a partial
  * dot product must never escape to an outside caller.  Elements must be
  * non-null; the similarity / k-means pipelines construct both sides from
  * fixed-dimension quantized embeddings. */
case class NumVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(LongType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint|double> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_num_vec_dot"

  private def isLong(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (xl, yl) = (isLong(left), isLong(right))
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (xl) x.getLong(i).toDouble else x.getDouble(i)
      val yv = if (yl) y.getLong(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      def get(arr: String, long: Boolean) =
        if (long) s"(double) $arr.getLong($i)" else s"$arr.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += ${get(a, isLong(left))} * ${get(b, isLong(right))};
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VecExpressions {
  private val FN = "graft_vec_dot"
  private val NFN = "graft_num_vec_dot"

  /** Register the expression in the session's function registry (idempotent)
    * and return a Column-level handle. */
  def vecDot(spark: SparkSession, a: Column, b: Column): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FN, exprs => LongVecDot(exprs(0), exprs(1)), "built-in")
    call_function(FN, a, b)
  }

  /** Column handle for [[NumVecDot]] (mixed long/double arrays -> double). */
  def numVecDot(spark: SparkSession, a: Column, b: Column): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      NFN, exprs => NumVecDot(exprs(0), exprs(1)), "built-in")
    call_function(NFN, a, b)
  }
}
