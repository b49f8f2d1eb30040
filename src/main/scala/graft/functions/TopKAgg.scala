package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge.{toColumn, toExpression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Buffer for [[MinKPairs]]: the current k smallest (key, value) pairs,
  * ordered ascending by (key, value). Arrays, not a heap — k is small
  * (single digits for a kNN join), and an insertion shift beats heap
  * bookkeeping there.
  *
  * Storage grows LAZILY (×2 from 16, capped at k): the bucket-cap
  * callers (candidatesFromBands, shinglePairCounts) pass k = cap + 1,
  * and a user cap in the 10⁵–10⁶ range with eagerly k-sized arrays
  * would allocate ~16 bytes·k per GROUP — gigabytes per task under
  * ObjectHashAggregate's 128-buffer fallback threshold — for buckets
  * that mostly hold a handful of entries (r16 ADVICE). Groups only pay
  * for what they hold; the k bound is unchanged.
  */
final class MinKPairsBuffer(val k: Int) {
  private[this] var cap = math.min(k, 16)
  var keys = new Array[Double](cap)
  var vals = new Array[Any](cap)
  var n = 0

  /** Ensure room for `m` (≤ k) entries. */
  def ensure(m: Int): Unit = if (m > cap) {
    cap = math.min(k, math.max(m, cap * 2))
    keys = java.util.Arrays.copyOf(keys, cap)
    val nv = new Array[Any](cap)
    System.arraycopy(vals, 0, nv, 0, n)
    vals = nv
  }
}

/** Bounded top-k selection as ONE aggregation pass: per group, the k
  * smallest (key, value) pairs in the lexicographic (key asc, value
  * asc) order — the deterministic tie rule every ranked operator in
  * this engine uses. A TypedImperativeAggregate PARTIAL-AGGREGATES
  * map-side with an O(k) buffer, so the exchange carries k structs per
  * (group, map partition) — never the candidate rows.
  *
  * Why this exists (all measured on a ~14M-row candidate set, sf0.1
  * spatial kNN): `row_number()` over a window EXCHANGES every candidate
  * row before ranking (11.4 s); `min(struct(key, value))` partial-aggs
  * but Min over a struct type plans as an INTERPRETED SortAggregate
  * (~6 s per pass, and a k-rank selection needs k passes); this kernel
  * is one ObjectHashAggregate pass (~1 s). The value child is ANY
  * orderable type (interpreted ordering — only consulted on exact key
  * ties); values are defensively copied on insert (UTF8String et al.
  * are buffer-backed).
  *
  * Output: `array<struct<key: double, value: V>>`, ascending, length
  * `min(k, group size)`. Null keys/values are skipped (a null
  * coordinate has no distance; callers pre-filter).
  */
case class MinKPairs(key: Expression, value: Expression, k: Int,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MinKPairsBuffer] {

  require(k >= 1, s"min_k_pairs: k must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(key, value)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", DoubleType), StructField("value", value.dataType))))

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinKPairs =
    copy(key = newChildren(0), value = newChildren(1))

  override def withNewMutableAggBufferOffset(newOffset: Int): MinKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinKPairs =
    copy(inputAggBufferOffset = newOffset)

  override def prettyName: String = "min_k_pairs"

  @transient private lazy val valueOrdering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(value.dataType)
  @transient private lazy val valueProj: UnsafeProjection =
    UnsafeProjection.create(Array(value.dataType))

  override def createAggregationBuffer(): MinKPairsBuffer =
    new MinKPairsBuffer(k)

  /** Insert in (key, value)-ascending position; drop the worst past k.
    * `copied` marks values already owned by a buffer (merge path), so
    * only fresh input values pay the defensive copy.
    */
  private def insert(b: MinKPairsBuffer, dk: Double, v: Any,
                     copied: Boolean): Unit = {
    var pos = b.n
    while (pos > 0 && {
        val c = java.lang.Double.compare(dk, b.keys(pos - 1))
        c < 0 || (c == 0 && valueOrdering.compare(v, b.vals(pos - 1)) < 0)
      }) pos -= 1
    if (pos >= k) return
    b.ensure(math.min(b.n + 1, k))
    val last = math.min(b.n, k - 1)
    var i = last
    while (i > pos) { b.keys(i) = b.keys(i - 1); b.vals(i) = b.vals(i - 1); i -= 1 }
    b.keys(pos) = dk
    b.vals(pos) = if (copied) v else InternalRow.copyValue(v)
    if (b.n < k) b.n += 1
  }

  override def update(b: MinKPairsBuffer, input: InternalRow): MinKPairsBuffer = {
    val dk = key.eval(input)
    if (dk != null) {
      val v = value.eval(input)
      if (v != null) insert(b, dk.asInstanceOf[Double], v, copied = false)
    }
    b
  }

  override def merge(b: MinKPairsBuffer, other: MinKPairsBuffer): MinKPairsBuffer = {
    var i = 0
    while (i < other.n) { insert(b, other.keys(i), other.vals(i), copied = true); i += 1 }
    b
  }

  override def eval(b: MinKPairsBuffer): Any =
    new GenericArrayData(Array.tabulate[Any](b.n)(i =>
      InternalRow(b.keys(i), b.vals(i))))

  override def serialize(b: MinKPairsBuffer): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(b.n)
    var i = 0
    while (i < b.n) {
      out.writeDouble(b.keys(i))
      val bytes = valueProj(InternalRow(b.vals(i))).getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MinKPairsBuffer = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val b = new MinKPairsBuffer(k)
    val n = in.readInt()
    b.ensure(math.min(n, k))
    var i = 0
    while (i < n) {
      b.keys(i) = in.readDouble()
      val len = in.readInt()
      val rb = new Array[Byte](len)
      in.readFully(rb)
      val row = new UnsafeRow(1)
      row.pointTo(rb, len)
      b.vals(i) = InternalRow.copyValue(row.get(0, value.dataType))
      i += 1
    }
    b.n = n
    b
  }
}

object TopKFunctions {
  /** Per group, the k smallest (key, value) pairs ascending by
    * (key, value) — see [[MinKPairs]]. `array<struct<key, value>>`.
    */
  def min_k_pairs(key: Column, value: Column, k: Int): Column =
    toColumn(MinKPairs(toExpression(key), toExpression(value), k)
      .toAggregateExpression())

  /** [[min_k_pairs]] with an aggregate FILTER clause: only rows where
    * `cond` holds enter the buffer. Lets ONE aggregation pass compute a
    * whole family of nested selections (the tune sweeps' per-nprobe
    * shortlists: `cond = probe_rank <= p` per candidate p) instead of
    * one filtered pass per member — same semantics as
    * `df.filter(cond).agg(min_k_pairs(...))`, exercised against it in
    * FunctionsSpec.
    */
  def min_k_pairs_if(key: Column, value: Column, k: Int,
                     cond: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete}
    toColumn(AggregateExpression(
      MinKPairs(toExpression(key), toExpression(value), k),
      Complete, isDistinct = false, filter = Some(toExpression(cond))))
  }
}
