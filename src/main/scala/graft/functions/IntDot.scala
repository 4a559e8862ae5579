package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Integer dot product of two long arrays — the ranking kernel of the
  * int8-quantized similarity path ([[graft.ext.Similarity]] `*_q8`):
  * quantized components are small ints, their dot is EXACT integer
  * arithmetic, so rankings hash-match across engines with no float
  * contract at all (the float fold's bit-identity constraints disappear
  * — any engine that can multiply integers agrees). One fused loop, no
  * allocation; null element / length mismatch poison to null, matching
  * the `aggregate(zip_with(...))` HOF it replaces.
  *
  * Overflow: callers quantize to |q| <= 127, so 64 dims bound the dot at
  * ~10^6 — int64 overflow would need |q| ~ 3x10^8 per component; the
  * expression does not checked-multiply (documented contract, not a
  * runtime cost).
  */
case class IntDot(left: Expression, right: Expression) extends BinaryExpression {

  private def ok(t: DataType) = t match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> inputs, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_int_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    IntDot.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("idot")
      s"""java.lang.Long $boxed = graft.functions.IntDot$$.MODULE$$.compute($a, $b);
         |if ($boxed == null) { ${ev.isNull} = true; } else { ${ev.value} = $boxed.longValue(); }
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): IntDot =
    copy(left = l, right = r)
}

object IntDot {

  def compute(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  def apply(a: Column, b: Column): Column =
    GraftSql.column(IntDot(GraftSql.expression(a), GraftSql.expression(b)))
}
