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

/** Fused shingle hashing: distinct 60-bit md5-prefix hashes of every
  * `n`-token window of a token array, in one native pass — semantically
  * `array_distinct(shingles(toks, n))` mapped through [[Md5PrefixLong]]
  * (nibbles = 15), and BYTE-IDENTICAL to it: each window is digested as
  * the exact UTF-8 of `concat_ws(" ", window)` (separators streamed
  * between non-null tokens, never materialized), and first-occurrence
  * order is preserved like `array_distinct`. What it removes is the
  * intermediate work the composed form pays per corpus row: building a
  * shingle STRING per window, a string-keyed array_distinct, and a
  * second array traversal for the hash map — the dedup/LSH family's
  * single hottest projection (the shingle-table materialization).
  * Distinctness moves from strings to the 60-bit hashes; a colliding
  * pair would merge, at the same ~1e-13 per-corpus odds every consumer
  * of these hash sets already accepts (Dedup's documented contract).
  */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, s"shingle width must be positive, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"

  // a null token array hashes to the EMPTY hash set, not SQL NULL — the
  // composed form this fuses (`when(isNotNull, ...).otherwise(array())`)
  // never returned null, so array consumers (size, array_intersect in the
  // jaccard paths) see 0 rather than a null that silently propagates
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) ShingleHashes.empty()
    else ShingleHashes.compute(v.asInstanceOf[ArrayData], n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code = code"""
      ${c.code}
      $javaType ${ev.value} = ${c.isNull} ?
        graft.functions.ShingleHashes$$.MODULE$$.empty() :
        graft.functions.ShingleHashes$$.MODULE$$.compute(${c.value}, $n);""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {

  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))
  private val Space = Array(' '.toByte)

  /** The null-input result (also called from generated code). */
  def empty(): ArrayData = new GenericArrayData(Array.emptyLongArray)

  def compute(arr: ArrayData, n: Int): ArrayData = {
    val sz = arr.numElements()
    if (sz < n) return new GenericArrayData(Array.emptyLongArray)
    val md = digests.get()
    val seen = new java.util.HashSet[java.lang.Long](math.min(sz * 2, 1 << 16))
    val out = new Array[Long](sz - n + 1)
    var outLen = 0
    var i = 0
    while (i <= sz - n) {
      md.reset()
      var first = true
      var j = 0
      while (j < n) {
        // concat_ws semantics: null tokens vanish WITH their separator
        if (!arr.isNullAt(i + j)) {
          if (!first) md.update(Space)
          md.update(arr.getUTF8String(i + j).getBytes)
          first = false
        }
        j += 1
      }
      val d = md.digest()
      // first 15 hex nibbles as a long — Md5PrefixLong.compute's layout
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
    GraftSql.column(ShingleHashes(GraftSql.expression(c), n))
}
