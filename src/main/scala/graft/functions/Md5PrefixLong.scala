package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the engine's md5-prefix hash contract:
  * the first `nibbles` hex digits of md5(utf8(child)) as an unsigned long
  * — bit-identical to the oracle's
  * `CAST('0x' || substr(md5(x), 1, nibbles) AS BIGINT)` and to the
  * previous built-in chain `conv(substring(md5(x), 1, nibbles), 16, 10)`,
  * but WITHOUT materializing the 32-char hex string per row: the value is
  * assembled straight from the digest bytes. Participates in whole-stage
  * codegen via a static helper call (the per-row md5 itself is the
  * irreducible cost; this removes the hex encode → substring → hex parse
  * round-trip on top of it).
  *
  * `nibbles` ≤ 15 keeps the value inside a signed long (60 bits) on every
  * engine.
  */
case class Md5PrefixLong(child: Expression, nibbles: Int)
    extends UnaryExpression {
  require(nibbles > 0 && nibbles <= 15, s"nibbles must be in [1,15], got $nibbles")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_md5_prefix"

  override protected def nullSafeEval(input: Any): Any =
    Md5PrefixLong.compute(input.asInstanceOf[UTF8String], nibbles)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Md5PrefixLong$$.MODULE$$.compute($c, $nibbles)")

  override protected def withNewChildInternal(newChild: Expression): Md5PrefixLong =
    copy(child = newChild)
}

object Md5PrefixLong {

  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** First `nibbles` hex digits of md5(s) as a long (big-endian nibble
    * order, matching the hex-string rendering).
    */
  def compute(s: UTF8String, nibbles: Int): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < nibbles) {
      val b = d(i >> 1)
      val nib = if ((i & 1) == 0) (b >> 4) & 0xf else b & 0xf
      v = (v << 4) | nib
      i += 1
    }
    v
  }

  /** Column form. */
  def apply(c: Column, nibbles: Int): Column =
    GraftSql.column(Md5PrefixLong(GraftSql.expression(c), nibbles))
}
