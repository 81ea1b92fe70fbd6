package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native single-pass cosine similarity over two array<float> embedding
  * columns.
  *
  * The composed version (Similarity.cosineComposed) is three
  * higher-order-function folds — `aggregate(zip_with(...))` for the dot
  * product and one per norm — and Catalyst evaluates HOF lambdas
  * INTERPRETED, allocating a zipped array and boxing every element; on
  * the ANN hot path (one cosine per candidate pair) that dominates. This
  * Expression walks both arrays once, accumulating dot and both norms in
  * three registers, and stays inside whole-stage codegen via doGenCode.
  * Same fold order and double arithmetic ⇒ bit-identical results
  * (differential-pinned in ExtensionSpec).
  *
  * Null element ⇒ that component contributes 0 (embeddings are dense;
  * zero-norm inputs yield NaN, matching 0/0 in the composed form).
  */
case class CosineSimExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"cosine_sim needs (array<float>, array<float>), got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSimExpr.eval(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    // Through MODULE$: the companion's static forwarder for `eval` is
    // suppressed by Expression.eval(row), so the bare class-qualified
    // call fails Janino compilation → silent interpreted fallback.
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.CosineSimExpr$$.MODULE$$.eval($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimExpr =
    copy(left = newLeft, right = newRight)
}

object CosineSimExpr {

  /** One pass, three accumulators; shared by interpreted + codegen. */
  def eval(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (a.isNullAt(i)) 0.0 else a.getFloat(i).toDouble
      val y = if (b.isNullAt(i)) 0.0 else b.getFloat(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Column-level entry point. */
  def cosineSim(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(
      CosineSimExpr(GraftBridge.expression(a), GraftBridge.expression(b)))
  }
}
