package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Distributed Bloom-filter build + probe — the runtime-filter primitive
  * for 100 TB semi joins.
  *
  * The scale problem: `big SEMI JOIN small` shuffles every `big` row
  * whose key *might* match — i.e. all of them — before the join can
  * discard the misses. The classic fix (what Spark's own
  * `spark.sql.optimizer.runtimeFilter.bloomFilter.enabled` automates for
  * eligible shapes, and what every warehouse engine calls a runtime
  * filter / sideways information passing) is: aggregate the small side's
  * join keys into a Bloom filter (map-side partials, OR-merge — one tiny
  * shuffle of fixed-size bitsets), hand the finished filter to the big
  * side, and drop non-matching rows AT THE SCAN, before they pay the
  * shuffle. False positives are then killed by the exact join that
  * follows; false negatives are impossible, so the composition is
  * EXACTLY the semi join (which is what the b1 oracle asserts).
  *
  * Handing the filter over: collect the single finished filter (a
  * bounded model artifact — 16 KB at 2^17 bits, never a function of
  * data size) and embed it as a LITERAL in the probe predicate. A
  * literal filter is a plain narrow `Filter` that predicate pushdown
  * drives below the downstream join to the scan; the prettier
  * 1-row-broadcast-join form is NOT equivalent — Catalyst may reorder
  * the exact semi join below it, silently un-prefiltering the shuffle
  * (PlanSpec pins the literal form's placement).
  *
  * [[BloomAgg]] is the build side: a `TypedImperativeAggregate` whose
  * buffer IS the serialized filter (8-byte header + bitset), so partial
  * aggregation, shuffle serialization, and the final binary result are
  * all the same flat `Array[Byte]` — merge is a word-wise OR. [[
  * BloomContains]] is the probe: a codegen'd scalar expression reading
  * the (broadcast) filter bytes directly.
  *
  * Keys are `bigint`; hash strings first (`xxhash64`) — matching how
  * engines pass runtime filters on hashed keys. Double hashing
  * (Kirsch–Mitzenmacher) derives the k probe positions from two
  * splitmix64 streams, so build and probe agree across JVMs with no
  * per-row allocation.
  */
object BloomRuntime {
  /** bytes 0..3: numHashes (big-endian int); bytes 4..7 reserved (0);
    * bytes 8..: bitset, bit i = byte 8+(i>>3), mask 1<<(i&7). */
  val HeaderBytes = 8

  private final val Golden = 0x9e3779b97f4a7c15L

  /** splitmix64 finalizer — deterministic, allocation-free. */
  def mix(z0: Long): Long = {
    var z = z0 + Golden
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def alloc(numBits: Int, numHashes: Int): Array[Byte] = {
    require(numBits > 0 && numBits % 8 == 0, "numBits must be a positive multiple of 8")
    require(numHashes > 0 && numHashes <= 16, "numHashes must be in [1,16]")
    val a = new Array[Byte](HeaderBytes + numBits / 8)
    a(0) = (numHashes >>> 24).toByte; a(1) = (numHashes >>> 16).toByte
    a(2) = (numHashes >>> 8).toByte; a(3) = numHashes.toByte
    a
  }

  def numHashes(bf: Array[Byte]): Int =
    ((bf(0) & 0xff) << 24) | ((bf(1) & 0xff) << 16) | ((bf(2) & 0xff) << 8) | (bf(3) & 0xff)

  def add(bf: Array[Byte], key: Long): Unit = {
    val bits = (bf.length - HeaderBytes).toLong * 8L
    val k = numHashes(bf)
    val h1 = mix(key)
    val h2 = mix(key ^ Golden) | 1L
    var i = 0
    while (i < k) {
      val pos = ((h1 + i * h2) & Long.MaxValue) % bits
      val idx = HeaderBytes + (pos >>> 3).toInt
      bf(idx) = (bf(idx) | (1 << (pos & 7L).toInt)).toByte
      i += 1
    }
  }

  /** Probe — called from both interpreted eval and generated code. */
  def contains(bf: Array[Byte], key: Long): Boolean = {
    val bits = (bf.length - HeaderBytes).toLong * 8L
    val k = numHashes(bf)
    val h1 = mix(key)
    val h2 = mix(key ^ Golden) | 1L
    var i = 0
    while (i < k) {
      val pos = ((h1 + i * h2) & Long.MaxValue) % bits
      if ((bf(HeaderBytes + (pos >>> 3).toInt) & (1 << (pos & 7L).toInt)) == 0)
        return false
      i += 1
    }
    true
  }

  def merge(into: Array[Byte], from: Array[Byte]): Array[Byte] = {
    require(into.length == from.length,
      s"bloom size mismatch: ${into.length} vs ${from.length}")
    var i = HeaderBytes
    while (i < into.length) { into(i) = (into(i) | from(i)).toByte; i += 1 }
    into
  }
}

/** `bloom_agg(key bigint, numBits, numHashes) -> binary` — build a Bloom
  * filter over a key column. Buffer = serialized form, merge = OR, so
  * the shuffle carries one fixed-size bitset per partition regardless of
  * input rows. Null keys are ignored (a null never matches a semi join).
  */
case class BloomAgg(
    keyExpr: Expression, numBits: Int, numHashes: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(keyExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bloom_agg"

  override def checkInputDataTypes(): TypeCheckResult = keyExpr.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint key (hash strings first), got ${t.simpleString}")
  }

  override def createAggregationBuffer(): Array[Byte] =
    BloomRuntime.alloc(numBits, numHashes)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val k = keyExpr.eval(input)
    if (k != null) BloomRuntime.add(buf, k.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] =
    BloomRuntime.merge(buf, other)

  override def eval(buf: Array[Byte]): Any = buf

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(o: Int): BloomAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(keyExpr = newChildren.head)
}

/** `bloom_contains(bloom binary, key bigint) -> boolean` — codegen'd
  * probe; with the filter as a literal the predicate is fully narrow
  * and map-side. */
case class BloomContains(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, bigint), got (${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "bloom_contains"

  override def nullSafeEval(bf: Any, key: Any): Any =
    BloomRuntime.contains(bf.asInstanceOf[Array[Byte]], key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (bf, key) =>
      s"${ev.value} = graft.functions.BloomRuntime.contains($bf, $key);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BloomFunctions {
  /** Column API: build — `bloomAgg(key, numBits, numHashes)`. */
  def bloomAgg(key: Column, numBits: Int, numHashes: Int): Column =
    SqlBridge.column(
      BloomAgg(SqlBridge.expression(key), numBits, numHashes)
        .toAggregateExpression())

  /** Column API: probe — `bloomContains(bloom, key)`. */
  def bloomContains(bloom: Column, key: Column): Column =
    SqlBridge.column(
      BloomContains(SqlBridge.expression(bloom), SqlBridge.expression(key)))
}
