package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import java.nio.ByteBuffer

/** Bounded per-group top-k as a TypedImperativeAggregate.
  *
  * The window-function formulation (row_number over partitionBy(key) ≤ k)
  * shuffles and SORTS every row of every group; this aggregate keeps a
  * k-bounded heap per group, combines map-side (partial aggregation), and
  * ships at most k entries per group per partition through the shuffle —
  * the shape that survives 100 TB with hot keys.
  *
  * Ordering: score DESC, then id ASC (deterministic tie-break). Output:
  * array<struct<score double, id long>> sorted in rank order.
  */
case class BoundedTopK(
    k: Int,
    score: Expression,
    id: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedTopK.Buffer] {

  import BoundedTopK.Buffer

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType), StructField("id", LongType))))

  override def createAggregationBuffer(): Buffer = new Buffer(k)

  override def update(buf: Buffer, input: InternalRow): Buffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Buffer, other: Buffer): Buffer = {
    var i = 0
    while (i < other.size) { buf.insert(other.scores(i), other.ids(i)); i += 1 }
    buf
  }

  override def eval(buf: Buffer): Any = {
    val sorted = buf.sortedEntries
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(s, i)
    })
  }

  override def serialize(buf: Buffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new Buffer(k)
    var i = 0
    while (i < n) { buf.insert(bb.getDouble, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): BoundedTopK =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BoundedTopK =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(score = c(0), id = c(1))
}

object BoundedTopK {

  /** Flat bounded buffer: linear insert keeping the worst entry known.
    * k is small (top-k semantics), so O(k) insert beats heap overhead. */
  final class Buffer(k: Int) {
    val scores = new Array[Double](k)
    val ids = new Array[Long](k)
    var size = 0

    /** true if (s1,i1) ranks better than (s2,i2): score desc, id asc.
      * NaN scores rank WORST (below -Inf) so they evict first and can
      * never block a slot. */
    @inline private def better(s1: Double, i1: Long, s2: Double, i2: Long) = {
      val n1 = s1.isNaN
      val n2 = s2.isNaN
      if (n1 && n2) i1 < i2
      else if (n1) false
      else if (n2) true
      else s1 > s2 || (s1 == s2 && i1 < i2)
    }

    def insert(s: Double, i: Long): Unit = {
      if (size < k) { scores(size) = s; ids(size) = i; size += 1 }
      else {
        // replace current worst if the new entry beats it
        var worst = 0
        var j = 1
        while (j < size) {
          if (better(scores(worst), ids(worst), scores(j), ids(j))) worst = j
          j += 1
        }
        if (better(s, i, scores(worst), ids(worst))) {
          scores(worst) = s; ids(worst) = i
        }
      }
    }

    def sortedEntries: Array[(Double, Long)] =
      (0 until size).map(j => (scores(j), ids(j))).toArray
        .sortWith { case ((s1, i1), (s2, i2)) => better(s1, i1, s2, i2) }
  }

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  /** Column API: topk(k, score, id) usable in agg(). */
  def topk(k: Int, score: Column, id: Column): Column =
    ColumnBridge.column(
      BoundedTopK(k, ColumnBridge.expression(score), ColumnBridge.expression(id))
        .toAggregateExpression())
}
