package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}

/** Native Jaccard similarity over two array<string> token-set columns —
  * the verify step of every near-dup pipeline (MinHash-LSH and n-gram
  * blocking both end in an exact-jaccard check on candidate pairs).
  *
  * The composed form (`size(array_intersect)/size(array_union)`) builds
  * two intermediate arrays and two hash tables per pair; on a candidate
  * join evaluating millions of pairs that allocation dominates. This
  * Expression builds ONE hash set from the smaller side and streams the
  * larger side through it, counting distinct hits and distinct misses —
  * no intermediate arrays, |A∪B| derived as |A|+|B|−|A∩B| on distinct
  * counts. Codegen-friendly via defineCodeGen, so candidate-verify
  * stays inside the whole-stage span.
  *
  * Distinct semantics match array_intersect/array_union (set, not bag);
  * null elements are ignored (array_distinct/DuckDB list semantics for
  * the pipelines here never produce null tokens). Both-empty ⇒ NaN
  * (0/0), matching the composed form's division.
  */
case class JaccardSimExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"jaccard_sim needs (array<string>, array<string>), got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    JaccardSimExpr.eval(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    // NB: must go through MODULE$ — the companion's static forwarder for
    // `eval` is suppressed because Expression already defines eval(row),
    // so the bare class-qualified call doesn't compile under Janino and
    // the expression silently falls back to interpreted mode.
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaccardSimExpr$$.MODULE$$.eval($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSimExpr =
    copy(left = newLeft, right = newRight)
}

object JaccardSimExpr {

  /** Hash-set of the smaller side, stream the larger; shared by
    * interpreted + codegen paths. */
  def eval(aIn: ArrayData, bIn: ArrayData): Double = {
    val (a, b) =
      if (aIn.numElements() <= bIn.numElements()) (aIn, bIn) else (bIn, aIn)
    val small = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]
    var i = 0
    while (i < a.numElements()) {
      if (!a.isNullAt(i)) small.add(a.getUTF8String(i))
      i += 1
    }
    val nA = small.size
    val seen = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]
    var inter = 0
    var onlyB = 0
    i = 0
    while (i < b.numElements()) {
      if (!b.isNullAt(i)) {
        val s = b.getUTF8String(i)
        if (seen.add(s)) {
          if (small.contains(s)) inter += 1 else onlyB += 1
        }
      }
      i += 1
    }
    inter.toDouble / (nA + onlyB)
  }

  /** Column-level entry point. */
  def jaccardSim(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(
      JaccardSimExpr(GraftBridge.expression(a), GraftBridge.expression(b)))
  }
}
