package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}

/** KMV buffer: the `k` smallest DISTINCT hash values seen, kept in a
  * TreeSet over sign-flipped longs (flip makes signed order = unsigned
  * order of the raw hash). Deterministic in partitioning and row order —
  * the k smallest elements of a set don't depend on arrival order. */
final class KmvBuffer(val k: Int) {
  val set = new java.util.TreeSet[java.lang.Long]()
  def add(hash: Long): Unit = {
    val flipped = hash ^ Long.MinValue
    if (set.size < k) set.add(flipped)
    else if (flipped < set.last()) { set.add(flipped); if (set.size > k) set.pollLast() }
  }
}

/** K-Minimum-Values distinct-count sketch — the mergeable cardinality
  * sketch (Bar-Yossef et al. 2002; the estimator family behind Theta
  * sketches): keep the k smallest distinct 64-bit hashes; with fewer than
  * k distinct values the count is EXACT, otherwise the k-th minimum's
  * position estimates density: `(k-1) · 2⁶⁴ / kth_min`, with relative
  * standard error ≈ 1/√(k−2).
  *
  * Why not `approx_count_distinct` (HLL++)? KMV buffers are trivially
  * mergeable ACROSS GROUPS by set-union-then-trim, which HLL also gives —
  * but KMV additionally supports set EXPRESSIONS (intersection/Jaccard of
  * two sketches via the combined k-th minimum), the piece a dedup pipeline
  * wants for cheap corpus-overlap estimates. This class is the aggregate;
  * partial aggregation (map-side combine) comes free from
  * [[TypedImperativeAggregate]].
  *
  * Input must already be a 64-bit hash — the registered builder
  * (`graft_kmv_distinct(col[, k])`) wraps the column in Spark's codegen'd
  * `xxhash64` so every input type works and hashing stays on the fast
  * path.
  */
case class KmvDistinct(
    child: Expression,
    k: Int = 256,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] {

  require(k >= 16, s"kmv needs k >= 16 for a usable error bound; got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_kmv_distinct"

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    val it = other.set.iterator()
    while (it.hasNext) buf.add(it.next() ^ Long.MinValue)
    buf
  }

  override def eval(buf: KmvBuffer): Any = {
    val n = buf.set.size
    if (n < k) n.toLong // saw fewer than k distinct hashes: exact
    else {
      // unsigned kth-min as double in (0, 2^64)
      val u = buf.set.last().toDouble + 9.223372036854775808e18
      math.round((k - 1).toDouble * 1.8446744073709552e19 / u)
    }
  }

  override def serialize(buf: KmvBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * (buf.set.size + 1))
    bb.putLong(buf.set.size.toLong)
    val it = buf.set.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getLong.toInt
    val buf = new KmvBuffer(k)
    var i = 0
    while (i < n) { buf.set.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvDistinct =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KmvDistinct =
    copy(child = c.head)
}
