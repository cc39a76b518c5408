package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import java.nio.ByteBuffer

/** Bounded top-k buffer: keeps the k smallest (ord, id) pairs under the
  * aggregate's ordering. Backed by a binary max-heap so insert is O(log k)
  * and eviction is O(log k); `sorted` emits ascending (ord, id). */
final class TopKBuffer(val k: Int) {
  // max-heap on (ord, id): root = current worst of the kept k
  val ords = new Array[Double](k)
  val ids = new Array[Long](k)
  var n = 0

  @inline private def worse(i: Int, j: Int): Boolean =
    ords(i) > ords(j) || (ords(i) == ords(j) && ids(i) > ids(j))
  private def swap(i: Int, j: Int): Unit = {
    val o = ords(i); ords(i) = ords(j); ords(j) = o
    val d = ids(i); ids(i) = ids(j); ids(j) = d
  }
  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0 && worse(i, (i - 1) / 2)) { swap(i, (i - 1) / 2); i = (i - 1) / 2 }
  }
  private def siftDown(): Unit = {
    var i = 0
    var break = false
    while (!break) {
      val l = 2 * i + 1
      val r = 2 * i + 2
      var m = i
      if (l < n && worse(l, m)) m = l
      if (r < n && worse(r, m)) m = r
      if (m == i) break = true else { swap(i, m); i = m }
    }
  }

  def insert(ord: Double, id: Long): Unit =
    if (n < k) {
      ords(n) = ord; ids(n) = id; n += 1; siftUp(n - 1)
    } else if (ord < ords(0) || (ord == ords(0) && id < ids(0))) {
      ords(0) = ord; ids(0) = id; siftDown()
    }

  def merge(o: TopKBuffer): Unit = {
    var i = 0
    while (i < o.n) { insert(o.ords(i), o.ids(i)); i += 1 }
  }

  /** ascending (ord, id) pairs. */
  def sorted: Array[(Double, Long)] =
    (0 until n).map(i => (ords(i), ids(i))).sortBy(identity).toArray
}

/** topk_agg(ord, id, k): per-group top-k as a real aggregate.
  *
  * The scale path for "top-k per group" (SURVEY §4/§6): a window
  * `row_number` shuffles and SORTS every row of every group; this aggregate
  * keeps a k-slot heap per group and combines partially map-side, so the
  * shuffle carries at most k·groups·16 bytes regardless of group size —
  * the difference between sorting 100 TB and shuffling kilobytes.
  *
  * `ord` is "smaller is better" (negate for descending); ties break on the
  * smaller id. Result: array of (ord, id) structs, best first.
  */
case class TopKAgg(
    ordExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] with ExpectsInputTypes {

  override def prettyName: String = "topk_agg"
  override def children: Seq[Expression] = Seq(ordExpr, idExpr)
  override def inputTypes = Seq(DoubleType, LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("ord", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val o = ordExpr.eval(input)
    val i = idExpr.eval(input)
    if (o != null && i != null)
      buf.insert(o.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buf.merge(other); buf
  }

  override def eval(buf: TopKBuffer): Any =
    new GenericArrayData(buf.sorted.map { case (o, i) => InternalRow(o, i) })

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + buf.n * 16)
    bb.putInt(buf.k).putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putDouble(buf.ords(i)).putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKBuffer(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) { buf.insert(bb.getDouble(), bb.getLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]) =
    copy(ordExpr = cs(0), idExpr = cs(1))
}

object TopKAgg {
  /** Column surface: `topkAgg(ord, id, k)` inside a `groupBy(...).agg(...)`. */
  def topkAgg(ord: Column, id: Column, k: Int): Column =
    Bridge.col(TopKAgg(Bridge.expr(ord), Bridge.expr(id), k)
      .toAggregateExpression())
}
