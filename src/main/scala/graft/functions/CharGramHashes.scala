package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Character-n-gram sibling of [[ShingleHashes]]: distinct 60-bit
  * md5-prefix hashes of every `n`-CHARACTER window of a string, one
  * native pass. Byte-identical to
  * `array_distinct(charNgrams(text, n))` mapped through
  * [[Md5PrefixLong]] (nibbles = 15): windows advance by CODE POINTS
  * (what `substr` counts), each window digested as its UTF-8 bytes,
  * first-occurrence order preserved. Removes the per-window substring
  * allocation and the string-keyed distinct; distinctness moves to the
  * hashes at the family's documented ~1e-13 collision odds.
  */
case class CharGramHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, s"gram width must be positive, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_chargram_hashes"

  // null text hashes to the EMPTY hash set, not SQL NULL — drop-in
  // identical to the composed `when(isNotNull, ...).otherwise(array())`
  // form (see [[ShingleHashes]] for the consumer rationale)
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) ShingleHashes.empty()
    else CharGramHashes.compute(v.asInstanceOf[UTF8String], n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code = code"""
      ${c.code}
      $javaType ${ev.value} = ${c.isNull} ?
        graft.functions.ShingleHashes$$.MODULE$$.empty() :
        graft.functions.CharGramHashes$$.MODULE$$.compute(${c.value}, $n);""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): CharGramHashes =
    copy(child = newChild)
}

object CharGramHashes {

  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  def compute(s: UTF8String, n: Int): ArrayData = {
    val chars = s.numChars()
    if (chars < n) return new GenericArrayData(Array.emptyLongArray)
    val md = digests.get()
    val seen = new java.util.HashSet[java.lang.Long](math.min(chars * 2, 1 << 16))
    val out = new Array[Long](chars - n + 1)
    var outLen = 0
    var i = 0
    while (i <= chars - n) {
      // substring by code points, digested as its UTF-8 bytes — exactly
      // what md5(text.substr(i+1, n)) hashes
      md.reset()
      md.update(s.substring(i, i + n).getBytes)
      val d = md.digest()
      var v = 0L
      var k = 0
      while (k < 15) {
        val b = d(k >> 1)
        v = (v << 4) | (if ((k & 1) == 0) (b >> 4) & 0xf else b & 0xf)
        k += 1
      }
      if (seen.add(v)) { out(outLen) = v; outLen += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, outLen))
  }

  /** Column form. */
  def apply(c: Column, n: Int): Column =
    GraftSql.column(CharGramHashes(GraftSql.expression(c), n))
}
