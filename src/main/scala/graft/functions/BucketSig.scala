package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.types._

/** Per-bucket content signature + row count in ONE aggregate:
  * `map<int, struct<sig bigint, rows bigint>>` keyed by the bucket id,
  * where `sig` is the order-independent sum of per-row hashes modulo
  * `Long.MaxValue` — EXACTLY the value of the store's historical
  * read-back fold `pmod(sum(cast(xxhash64(...) as decimal(38,0))),
  * Long.MaxValue)` (the decimal sum is exact and `pmod` is the
  * mathematical non-negative mod, so summing per-row pmods with modular
  * reduction reproduces it bit-for-bit; BucketSigSpec pins the equality).
  *
  * Built for [[org.apache.spark.sql.Dataset.observe]]: the store's
  * staging write computes every staged bucket's commit signature DURING
  * the write action itself, instead of paying a separate read-back job
  * per write (guide §1.2: fewer passes — the read-back was one extra
  * action plus its AQE stage scheduling on EVERY store commit). The
  * buffer is a hash map of the buckets this task saw — O(buckets)
  * memory, O(1) per row at any bucket count (a per-bucket conditional
  * projection would be O(buckets) per ROW).
  */
case class BucketSig(pt: Expression, h: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BucketSig.Buf] {

  override def children: Seq[Expression] = Seq(pt, h)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bucket_sig"

  override def checkInputDataTypes(): TypeCheckResult =
    if (pt.dataType == IntegerType && h.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (int, bigint), got " +
        s"${pt.dataType.catalogString} / ${h.dataType.catalogString}")

  override def dataType: DataType =
    MapType(IntegerType, BucketSig.EntryType, valueContainsNull = false)

  override def createAggregationBuffer(): BucketSig.Buf = new BucketSig.Buf

  override def update(b: BucketSig.Buf, input: InternalRow): BucketSig.Buf = {
    val p = pt.eval(input)
    val hv = h.eval(input)
    // xxhash64 never returns null for any input row; a null bucket id
    // cannot reach staging (pt is pmod(hash(...), buckets)) — skip
    // defensively rather than NPE
    if (p != null && hv != null)
      b.add(p.asInstanceOf[Int], hv.asInstanceOf[Long], 1L)
    b
  }

  override def merge(b: BucketSig.Buf, other: BucketSig.Buf): BucketSig.Buf = {
    val it = other.m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      b.addMod(e.getKey, e.getValue()(0), e.getValue()(1))
    }
    b
  }

  override def eval(b: BucketSig.Buf): Any = {
    val n = b.m.size()
    val keys = new Array[Any](n)
    val vals = new Array[Any](n)
    val it = b.m.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      keys(i) = e.getKey.intValue()
      vals(i) = InternalRow(e.getValue()(0), e.getValue()(1))
      i += 1
    }
    ArrayBasedMapData(keys, vals)
  }

  override def serialize(b: BucketSig.Buf): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(b.m.size())
    val it = b.m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeInt(e.getKey); out.writeLong(e.getValue()(0)); out.writeLong(e.getValue()(1))
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BucketSig.Buf = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = new BucketSig.Buf
    var i = 0
    while (i < n) { b.addMod(in.readInt(), in.readLong(), in.readLong()); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BucketSig =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BucketSig =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BucketSig =
    copy(pt = newChildren(0), h = newChildren(1))
}

object BucketSig {

  val EntryType: StructType = StructType(Seq(
    StructField("sig", LongType, nullable = false),
    StructField("rows", LongType, nullable = false)))

  private val M = Long.MaxValue

  /** (raw hash) -> its non-negative residue mod Long.MaxValue. */
  @inline private[functions] def pmodM(h: Long): Long = {
    val r = h % M
    if (r < 0) r + M else r
  }

  /** Modular addition of two residues in [0, M): the raw sum is < 2M <=
    * 2^64 - 2, so one unsigned-compare reduction is exact even through
    * signed wraparound.
    */
  @inline private[functions] def addM(a: Long, b: Long): Long = {
    val s = a + b
    if (java.lang.Long.compareUnsigned(s, M) >= 0) s - M else s
  }

  /** pt -> [sig mod M, row count]. */
  final class Buf {
    val m = new java.util.HashMap[Int, Array[Long]]()
    def add(pt: Int, rawHash: Long, rows: Long): Unit = addMod(pt, pmodM(rawHash), rows)
    def addMod(pt: Int, sigMod: Long, rows: Long): Unit = {
      val cur = m.get(pt)
      if (cur == null) m.put(pt, Array(sigMod, rows))
      else { cur(0) = addM(cur(0), sigMod); cur(1) += rows }: Unit
    }
  }

  /** Column form: per-bucket (sig, rows) of `h` grouped by `pt`. */
  def apply(pt: Column, h: Column): Column =
    GraftSql.column(BucketSig(
      GraftSql.expression(pt), GraftSql.expression(h)).toAggregateExpression())
}
