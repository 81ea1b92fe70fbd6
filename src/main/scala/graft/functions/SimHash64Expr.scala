package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass SimHash-64 over an array<string> of tokens.
  *
  * The composed-expression version (64 `aggregate()` folds, one per bit
  * — see Dedup.simhash64Composed) re-walks the token array 64 times;
  * this Expression walks it once, votes all 64 bit positions per token,
  * and stays inside whole-stage codegen via `doGenCode`. This is the
  * "custom Catalyst Expression beats composition" tier of the operator
  * preference order (custom work list in SURVEY §4): same algorithm,
  * one pass, primitive arithmetic.
  *
  * Token hash = XXH64(utf8 bytes, seed 42) — identical to Spark's
  * built-in xxhash64().
  */
case class SimHash64Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 needs array<string>, got $other")
    }
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    SimHash64Expr.eval(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // Through MODULE$: the companion's static forwarder for `eval` is
    // suppressed by Expression.eval(row), so the bare class-qualified
    // call fails Janino compilation → silent interpreted fallback.
    defineCodeGen(ctx, ev, arr =>
      s"graft.functions.SimHash64Expr$$.MODULE$$.eval($arr)")

  override protected def withNewChildInternal(newChild: Expression)
      : SimHash64Expr = copy(child = newChild)
}

object SimHash64Expr {

  /** One pass over the tokens; shared by interpreted + codegen paths. */
  def eval(arr: ArrayData): Long = {
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s: UTF8String = arr.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(
          s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** Column-level entry point. */
  def simhash64(tokens: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(SimHash64Expr(GraftBridge.expression(tokens)))
  }
}
