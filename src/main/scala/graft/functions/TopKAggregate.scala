package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types._

/** Bounded top-k as a custom `TypedImperativeAggregate` — the (b)-tier
  * custom AGGREGATE the build plan anticipated (SURVEY §7.3/§7.4): the
  * scale-safe replacement for "rank window then filter rank <= k" when
  * only the top k rows per group are wanted. The window form sorts
  * EVERY row of every group; this aggregate keeps a k-bounded heap per
  * group in the partial (map-side) aggregate, so the shuffle carries at
  * most k entries per group per partition and nothing is ever globally
  * sorted. w2's exact rank window stays the oracle-gated form; this is
  * the 100 TB sibling (asserted equal in ScaleVariantSpec and gated by
  * w10's long-form oracle).
  *
  * Semantics: top `k` (score, id) pairs, ordered score DESC then id ASC
  * — the id tiebreak makes the result total-ordered and deterministic
  * under any partitioning. Null scores/ids are ignored.
  */
case class BoundedTopK(
    scoreExpr: Expression, idExpr: Expression, k: Int,
    distinctIds: Boolean = false,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BoundedTopK.Buffer] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = BoundedTopK.resultType
  override def prettyName: String = "bounded_topk"

  override def checkInputDataTypes(): TypeCheckResult =
    (scoreExpr.dataType, idExpr.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (double, bigint), got (${s.simpleString}, ${i.simpleString})")
    }

  override def createAggregationBuffer(): BoundedTopK.Buffer =
    new BoundedTopK.Buffer(k, distinctIds)

  override def update(buf: BoundedTopK.Buffer, input: InternalRow): BoundedTopK.Buffer = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null)
      buf.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: BoundedTopK.Buffer, other: BoundedTopK.Buffer): BoundedTopK.Buffer = {
    other.foreach((s, i) => buf.offer(s, i))
    buf
  }

  override def eval(buf: BoundedTopK.Buffer): Any = {
    val sorted = buf.sortedDesc
    new GenericArrayData(sorted.map { case (s, i) =>
      new GenericInternalRow(Array[Any](s, i)): Any
    })
  }

  override def serialize(buf: BoundedTopK.Buffer): Array[Byte] = {
    val entries = buf.sortedDesc
    val bb = ByteBuffer.allocate(4 + entries.length * 16)
    bb.putInt(entries.length)
    entries.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BoundedTopK.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new BoundedTopK.Buffer(k, distinctIds)
    var j = 0
    while (j < n) { buf.offer(bb.getDouble, bb.getLong); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): BoundedTopK =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BoundedTopK =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
}

object BoundedTopK {

  val resultType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  /** k-bounded keeper of the best (score, id) pairs under
    * (score DESC, id ASC). Worst entry sits at the head of a min
    * priority queue, so offer() is O(log k) and memory is O(k)
    * regardless of input size.
    *
    * `distinctIds = true` collapses repeated offers of the SAME id
    * (keeping its best score) — the banded-LSH top-k feed emits each
    * candidate pair once per colliding band, and deduping inside the
    * k-bounded heap means those duplicates never need a corpus-scale
    * pair-distinct shuffle first. O(k) membership scan per offer; k is
    * small by contract. */
  final class Buffer(k: Int, distinctIds: Boolean = false) {
    // ordering: "better" = higher score, then LOWER id; the queue
    // dequeues the WORST first
    private val worstFirst: Ordering[(Double, Long)] =
      Ordering.by[(Double, Long), (Double, Long)] { case (s, i) => (-s, i) }
    private val q = scala.collection.mutable.PriorityQueue.empty[(Double, Long)](worstFirst)

    def offer(score: Double, id: Long): Unit = {
      if (distinctIds) {
        val existing = q.find(_._2 == id)
        existing match {
          case Some((es, _)) =>
            if (score > es) {
              // rebuild without the stale entry, then insert the better
              val kept = q.toArray.filter(_._2 != id)
              q.clear(); kept.foreach(q.enqueue(_))
              offerNew(score, id)
            }
            return
          case None => ()
        }
      }
      offerNew(score, id)
    }

    private def offerNew(score: Double, id: Long): Unit = {
      if (q.size < k) q.enqueue((score, id))
      else {
        val (ws, wi) = q.head // current worst
        if (score > ws || (score == ws && id < wi)) {
          q.dequeue(); q.enqueue((score, id))
        }
      }
    }

    def foreach(f: (Double, Long) => Unit): Unit =
      q.foreach { case (s, i) => f(s, i) }

    /** Entries ordered score DESC, id ASC. */
    def sortedDesc: Array[(Double, Long)] =
      q.toArray.sortBy { case (s, i) => (-s, i) }
  }
}

object TopKAggregate {
  /** Column API: `boundedTopK(score, id, k)` → sorted
    * `array<struct<score,id>>`. */
  def boundedTopK(score: Column, id: Column, k: Int,
      distinctIds: Boolean = false): Column =
    SqlBridge.column(
      BoundedTopK(SqlBridge.expression(score), SqlBridge.expression(id), k,
        distinctIds)
        .toAggregateExpression())
}
