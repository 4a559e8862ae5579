package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** All M product-quantization codes of one vector as ONE codegen
  * projection: for each subspace s, the id of the codeword minimizing the
  * squared L2 distance to v's s-th subvector, ties to the LOWER id. The
  * codebooks ride the plan as primitive arrays (ids ascending per
  * subspace, coordinates flattened row-major), so PQ code assignment —
  * the projection the IVFADC/PQ lifecycle runs over every corpus row,
  * every delta row and every Lloyd training round — is a tight fused
  * loop instead of M nested `aggregate(zip_with(...))` interpreted
  * higher-order folds per row (r13 optimization, guide §1.2 per-task
  * work / §4.1 prefer codegen expressions; measured 0.4-0.7 s per
  * training-round job before, dominated by HOF boxing).
  *
  * Bit-compatibility with the HOF chain it replaces (and the DuckDB
  * oracle's `row_number() OVER (ORDER BY d ASC, code ASC) = 1`):
  *  - each distance is the SAME strict left fold: per element
  *    (cast(x as double) − c)² accumulated left-to-right — identical
  *    doubles, identical inf/NaN behavior (JVM arithmetic both ways);
  *  - codewords are visited in ascending id order with a STRICT `<`
  *    keep, so equal distances keep the earlier = lower id;
  *  - null/mismatch parity with `aggregate(zip_with(slice(v)...))`: a
  *    null vector, a null element, or a subvector running past v's
  *    length makes that subspace's every distance null, so no codeword
  *    is ever kept and the code is the fold's untouched init id −1
  *    (NOT null — the HOF's `when(null < d, ...).otherwise(acc)` keeps
  *    the accumulator).
  */
case class PqCodes(v: Expression,
    ids: Seq[Seq[Long]], cvsFlat: Seq[Seq[Double]], subDim: Int)
  extends Expression {

  require(ids.nonEmpty && ids.length == cvsFlat.length,
    "PqCodes requires one (ids, cvs) pair per subspace")
  ids.zip(cvsFlat).foreach { case (is, cs) =>
    require(is.nonEmpty && cs.length == is.length * subDim,
      "PqCodes codebook arrays are inconsistent with ksub/subDim")
    require(is.sliding(2).forall(w => w.size < 2 || w(0) < w(1)),
      "PqCodes codewords must be strictly ascending by id (tie-break contract)")
  }

  override def children: Seq[Expression] = Seq(v)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_pq_codes"

  override def checkInputDataTypes(): TypeCheckResult = v.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got ${v.dataType.catalogString}")
  }

  private def vIsFloat = v.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val idsArr: Array[Array[Long]] = ids.map(_.toArray).toArray
  @transient private lazy val cvsArr: Array[Array[Double]] = cvsFlat.map(_.toArray).toArray

  override def eval(input: InternalRow): Any = {
    val vv = v.eval(input)
    PqCodes.compute(vv.asInstanceOf[ArrayData], idsArr, cvsArr, subDim, vIsFloat)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vG = v.genCode(ctx)
    val idsRef = ctx.addReferenceObj("pqIds", idsArr, "long[][]")
    val cvsRef = ctx.addReferenceObj("pqCvs", cvsArr, "double[][]")
    ev.copy(code = code"""
      ${vG.code}
      boolean ${ev.isNull} = false;
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        graft.functions.PqCodes$$.MODULE$$.compute(
        ${vG.isNull} ? null : ${vG.value}, $idsRef, $cvsRef, $subDim, $vIsFloat);""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(v = newChildren(0))
}

object PqCodes {

  /** Ascending-id strict-less argmin of ||v_s − c||² per subspace; −1
    * for a subspace whose distances are all null (null vector / null
    * element / short vector — the HOF accumulator-keep parity).
    */
  def compute(v: ArrayData, ids: Array[Array[Long]], cvs: Array[Array[Double]],
      subDim: Int, vFloat: Boolean): ArrayData = {
    val m = ids.length
    val out = new Array[Long](m)
    var s = 0
    while (s < m) {
      out(s) = subCode(v, ids(s), cvs(s), s * subDim, subDim, vFloat)
      s += 1
    }
    new GenericArrayData(out)
  }

  private def subCode(v: ArrayData, ids: Array[Long], cvs: Array[Double],
      off: Int, subDim: Int, vFloat: Boolean): Long = {
    if (v == null || v.numElements() < off + subDim) return -1L
    var i = 0
    while (i < subDim) { // any null element poisons every distance: -1
      if (v.isNullAt(off + i)) return -1L
      i += 1
    }
    var best = Double.MaxValue
    var bestId = -1L
    var c = 0
    while (c < ids.length) {
      var acc = 0.0
      var i2 = 0
      val coff = c * subDim
      while (i2 < subDim) {
        val x = if (vFloat) v.getFloat(off + i2).toDouble else v.getDouble(off + i2)
        val d = x - cvs(coff + i2)
        acc += d * d
        i2 += 1
      }
      if (acc < best) { best = acc; bestId = ids(c) }
      c += 1
    }
    bestId
  }

  /** Column form: `books` = per-subspace (id, centroid) seqs, any order —
    * sorted ascending per subspace here to pin the tie-break.
    */
  def apply(v: Column, books: Seq[Seq[(Long, Seq[Double])]]): Column = {
    val sorted = books.map(_.sortBy(_._1))
    val subDim = sorted.head.head._2.length
    GraftSql.column(PqCodes(GraftSql.expression(v),
      sorted.map(_.map(_._1)), sorted.map(_.flatMap(_._2)), subDim))
  }
}
