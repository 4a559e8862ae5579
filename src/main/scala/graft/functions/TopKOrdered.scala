package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k aggregate under the total order (score DESC, id ASC) —
  * the one-pass scale shape for "top k rows per group" when a group can
  * be corpus-sized.
  *
  * The window form (`row_number() OVER (PARTITION BY g ORDER BY score
  * DESC, id) <= k`) shuffles EVERY row of the group to one reducer and
  * sorts there — with a handful of groups (the brute-force similarity
  * query has NQueries = 5) that is five reducers sorting the whole
  * corpus. This aggregate keeps a k-element buffer per group inside the
  * PARTIAL aggregation, so each map task emits at most k rows per group
  * into the exchange and the final merge touches k × partitions rows.
  *
  * Determinism: (score, id) is a TOTAL order (ids unique), so the top-k
  * SET and its order are independent of partition/merge order — unlike a
  * float sum, this is safely mergeable. Ties on score keep the LOWER id,
  * exactly the window's `ORDER BY score DESC, id ASC`. Null score or id
  * rows are skipped (the window form never ranks them into the top-k
  * because DESC NULLS LAST is not used here — callers guarantee non-null
  * scores; the skip makes that explicit).
  *
  * Output: `array<struct<score double, id long>>`, sorted best-first,
  * length <= k — posexplode to recover (rank-1, row) pairs.
  */
case class TopKOrdered(score: Expression, id: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKOrdered.Buf] {

  require(k > 0, s"k must be positive, got $k")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_topk_ordered"

  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType == DoubleType && id.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (double, bigint), got " +
        s"${score.dataType.catalogString} / ${id.dataType.catalogString}")

  override def dataType: DataType = ArrayType(TopKOrdered.EntryType, containsNull = false)

  override def createAggregationBuffer(): TopKOrdered.Buf = new TopKOrdered.Buf(k)

  override def update(b: TopKOrdered.Buf, input: InternalRow): TopKOrdered.Buf = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) b.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    b
  }

  override def merge(b: TopKOrdered.Buf, other: TopKOrdered.Buf): TopKOrdered.Buf = {
    var j = 0
    while (j < other.size) { b.offer(other.scores(j), other.ids(j)); j += 1 }
    b
  }

  override def eval(b: TopKOrdered.Buf): Any =
    new GenericArrayData((0 until b.size).map { j =>
      InternalRow(b.scores(j), b.ids(j))
    }.toArray[Any])

  override def serialize(b: TopKOrdered.Buf): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(b.size)
    (0 until b.size).foreach { j => out.writeDouble(b.scores(j)); out.writeLong(b.ids(j)) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKOrdered.Buf = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = new TopKOrdered.Buf(k)
    (0 until n).foreach(_ => b.offer(in.readDouble(), in.readLong()))
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKOrdered =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKOrdered =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKOrdered =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKOrdered {

  val EntryType: StructType = StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false)))

  /** Sorted bounded buffer: entries kept best-first under
    * (score DESC, id ASC); O(k) insert — k is small by contract.
    */
  final class Buf(k: Int) {
    val scores = new Array[Double](k)
    val ids = new Array[Long](k)
    var size = 0

    /** true iff (s1, i1) ranks strictly better than (s2, i2). */
    @inline private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
      s1 > s2 || (s1 == s2 && i1 < i2)

    def offer(s: Double, i: Long): Unit = {
      if (size == k && !better(s, i, scores(size - 1), ids(size - 1))) return
      // find insert position (first entry this one beats)
      var p = 0
      while (p < size && !better(s, i, scores(p), ids(p))) p += 1
      val last = math.min(size, k - 1)
      var j = last
      while (j > p) { scores(j) = scores(j - 1); ids(j) = ids(j - 1); j -= 1 }
      scores(p) = s; ids(p) = i
      if (size < k) size += 1
    }
  }

  /** Column form. */
  def apply(score: Column, id: Column, k: Int): Column =
    GraftSql.column(TopKOrdered(
      GraftSql.expression(score), GraftSql.expression(id), k).toAggregateExpression())
}
