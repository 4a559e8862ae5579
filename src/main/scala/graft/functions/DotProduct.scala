package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native sequential-fold dot product of two numeric arrays, in double —
  * the codegen'd twin of
  * `aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")), 0.0, _ + _)`,
  * with EXACTLY its semantics so results stay bit-identical to the DuckDB
  * oracle's `list_reduce` fold:
  *
  *  - strict left-to-right accumulation (same rounding order);
  *  - any null element (or a length mismatch, which zip_with pads with
  *    nulls) poisons the accumulator → null result;
  *  - null input array → null.
  *
  * The HOF form materializes an intermediate products array per pair and
  * folds it interpreted; this loops once over both arrays with no
  * allocation — the hot inner loop of every similarity-join query.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  private def elemOk(t: DataType) = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> inputs, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  private def leftIsFloat = left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private def rightIsFloat = right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val r = DotProduct.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      leftIsFloat, rightIsFloat)
    if (r == null) null else r.doubleValue()
  }

  // BinaryExpression's nullSafeCodeGen can't express "non-null inputs may
  // still yield null" through defineCodeGen, so emit the wrapper by hand.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("dot")
      s"""java.lang.Double $boxed = graft.functions.DotProduct$$.MODULE$$.compute(
         |  $a, $b, $leftIsFloat, $rightIsFloat);
         |if ($boxed == null) { ${ev.isNull} = true; } else { ${ev.value} = $boxed.doubleValue(); }
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

object DotProduct {

  /** Null-poisoning sequential dot product; null on length mismatch or any
    * null element, matching zip_with+aggregate.
    */
  def compute(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  /** Column form. */
  def apply(a: Column, b: Column): Column =
    GraftSql.column(DotProduct(GraftSql.expression(a), GraftSql.expression(b)))
}
