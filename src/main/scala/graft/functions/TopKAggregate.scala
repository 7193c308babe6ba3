package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mutable bounded top-k buffer: parallel (sims, ids) arrays, never more
  * than k live entries. Plain JVM object — the aggregation buffer of
  * [[TopKAgg]], serialized as raw primitives only across shuffle
  * boundaries (no Encoder, no Row round trip).
  */
final class TopKHeapBuf(val k: Int) {
  var n: Int              = 0
  val sims: Array[Double] = new Array[Double](k)
  val ids: Array[Long]    = new Array[Long](k)
}

/** Map-side-partial bounded top-k over (sim, id) rows — the
  * TypedImperativeAggregate replacement for the round-2 typed
  * `udaf(TopKAggregator)` (round 17, guide §1.2 per-task work): the udaf
  * path deserialized every candidate row into a `(Double, Long)` tuple and
  * re-encoded the whole buffer through `Encoders.product` on every update
  * and merge — a per-candidate Encoder round trip wrapped in
  * Serialize/DeserializeToObject plan nodes. This evaluates the two child
  * expressions directly on the InternalRow and mutates a primitive-array
  * buffer in place; the buffer crosses the partial/final shuffle as one
  * little-endian byte blob.
  *
  * SEMANTICS ARE BIT-IDENTICAL to the old TopKAggregator by construction —
  * same (sim, id) descending-lexicographic ordering with id-DESC tie-break
  * (matching the oracle's `ORDER BY cos DESC, neighbor_id DESC`), same
  * replace-the-minimum update, same sort-concat-take-k merge, same
  * sorted-descending finish — pinned by every ANN/top-k oracle
  * (q18/q19/q56/q124/q137/q156/q163/q164/q170/q177/q183 at-rest twins/
  * q193/q194 and the bitext/RRF chains).
  */
case class TopKAgg(
    sim: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKHeapBuf] {

  private def gt(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 > i2)

  override def createAggregationBuffer(): TopKHeapBuf = new TopKHeapBuf(k)

  override def update(b: TopKHeapBuf, input: InternalRow): TopKHeapBuf = {
    val sv = sim.eval(input)
    val iv = id.eval(input)
    // defensive: no call site produces null (sim is a null-intolerant cosine
    // over non-null vectors); the old tuple Encoder never saw null either
    if (sv == null || iv == null) return b
    val s = sv.asInstanceOf[Double]
    val i = iv.asInstanceOf[Long]
    if (b.n < b.k) {
      b.sims(b.n) = s
      b.ids(b.n) = i
      b.n += 1
    } else {
      var mi = 0
      var j  = 1
      while (j < b.n) {
        if (gt(b.sims(mi), b.ids(mi), b.sims(j), b.ids(j))) mi = j
        j += 1
      }
      if (gt(s, i, b.sims(mi), b.ids(mi))) { b.sims(mi) = s; b.ids(mi) = i }
    }
    b
  }

  private def sortedDesc(b: TopKHeapBuf): Array[(Double, Long)] = {
    val arr = new Array[(Double, Long)](b.n)
    var i   = 0
    while (i < b.n) { arr(i) = (b.sims(i), b.ids(i)); i += 1 }
    arr.sortWith { case ((s1, i1), (s2, i2)) => gt(s1, i1, s2, i2) }
  }

  override def merge(a: TopKHeapBuf, other: TopKHeapBuf): TopKHeapBuf = {
    // same shape as the old Aggregator.merge: sort each side descending,
    // concatenate, sort, take k
    val all = (sortedDesc(a) ++ sortedDesc(other))
      .sortWith { case ((s1, i1), (s2, i2)) => gt(s1, i1, s2, i2) }
    val m   = math.min(k, all.length)
    val out = new TopKHeapBuf(k)
    out.n = m
    var i = 0
    while (i < m) { out.sims(i) = all(i)._1; out.ids(i) = all(i)._2; i += 1 }
    out
  }

  override def eval(b: TopKHeapBuf): Any = {
    val top = sortedDesc(b)
    InternalRow(
      new GenericArrayData(top.map(_._1)),
      new GenericArrayData(top.map(_._2)))
  }

  override def serialize(b: TopKHeapBuf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + b.n * 16)
    bb.putInt(b.n)
    var i = 0
    while (i < b.n) { bb.putDouble(b.sims(i)); bb.putLong(b.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKHeapBuf = {
    val bb  = ByteBuffer.wrap(bytes)
    val n   = bb.getInt()
    val out = new TopKHeapBuf(k)
    out.n = n
    var i = 0
    while (i < n) { out.sims(i) = bb.getDouble(); out.ids(i) = bb.getLong(); i += 1 }
    out
  }

  // field names/types match the old Encoders.product[TopKBuf] output schema,
  // so the downstream `col("top.sims")` / arrays_zip tail is unchanged
  override def dataType: DataType = StructType(Seq(
    StructField("sims", ArrayType(DoubleType, containsNull = false)),
    StructField("ids", ArrayType(LongType, containsNull = false))))

  override def nullable: Boolean = true

  override def children: Seq[Expression] = Seq(sim, id)

  override def prettyName: String = "graft_topk"

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(sim = newChildren(0), id = newChildren(1))
}
