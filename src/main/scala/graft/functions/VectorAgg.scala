package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Element-wise MEAN of an `array<float>` column — the group-centroid
  * aggregation (cluster representatives, per-source mean embeddings,
  * label prototypes) as a real partial-merge aggregate.
  *
  * Why a custom aggregate and not posexplode + groupBy(key, dim) + avg:
  * the explode form shuffles rows × dim records (a 64-dim corpus pays a
  * 64× shuffle amplification), while this buffer shuffles ONE
  * (dim doubles + count) partial per group per map task — the same
  * map-side-combine shape as `sum()`. Accumulation is double (floats
  * widen), merge is element-wise add, so the result is independent of
  * partitioning up to double rounding.
  *
  * Null rows are ignored (like built-in avg); an all-null / empty group
  * yields null. Ragged vector dims within a group fail loudly — a silent
  * prefix-mean would corrupt the centroid.
  */
case class VectorAvg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[VectorAvg.Buffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vector_avg requires array<float>, got $other")
    }

  override def createAggregationBuffer(): VectorAvg.Buffer =
    new VectorAvg.Buffer(null, 0L)

  override def update(b: VectorAvg.Buffer, input: InternalRow): VectorAvg.Buffer = {
    val v = child.eval(input)
    if (v == null) return b
    val arr = v.asInstanceOf[ArrayData]
    val d = arr.numElements()
    if (b.sums == null) b.sums = new Array[Double](d)
    else if (b.sums.length != d) throw new IllegalArgumentException(
      s"vector_avg: ragged vector dims in one group (${b.sums.length} vs $d)")
    var i = 0
    while (i < d) {
      // A null ELEMENT would read as 0.0 from ArrayData and silently skew
      // the centroid — same loud-failure contract as ragged dims.
      if (arr.isNullAt(i)) throw new IllegalArgumentException(
        s"vector_avg: null element at index $i — drop or impute the vector first")
      b.sums(i) += arr.getFloat(i).toDouble
      i += 1
    }
    b.count += 1
    b
  }

  override def merge(b: VectorAvg.Buffer, o: VectorAvg.Buffer): VectorAvg.Buffer = {
    if (o.sums == null) return b
    if (b.sums == null) { b.sums = o.sums.clone(); b.count = o.count; return b }
    if (b.sums.length != o.sums.length) throw new IllegalArgumentException(
      s"vector_avg: ragged vector dims across partitions (${b.sums.length} vs ${o.sums.length})")
    var i = 0
    while (i < b.sums.length) { b.sums(i) += o.sums(i); i += 1 }
    b.count += o.count
    b
  }

  override def eval(b: VectorAvg.Buffer): Any = {
    if (b.sums == null || b.count == 0L) return null
    val out = new Array[Double](b.sums.length)
    var i = 0
    while (i < out.length) { out(i) = b.sums(i) / b.count; i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(b: VectorAvg.Buffer): Array[Byte] = {
    val d = if (b.sums == null) 0 else b.sums.length
    val bb = java.nio.ByteBuffer.allocate(8 + 4 + 8 * d)
    bb.putLong(b.count).putInt(d)
    var i = 0
    while (i < d) { bb.putDouble(b.sums(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VectorAvg.Buffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val count = bb.getLong()
    val d = bb.getInt()
    if (d == 0) new VectorAvg.Buffer(null, count)
    else {
      val sums = new Array[Double](d)
      var i = 0
      while (i < d) { sums(i) = bb.getDouble(); i += 1 }
      new VectorAvg.Buffer(sums, count)
    }
  }

  override def withNewMutableAggBufferOffset(o: Int): VectorAvg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VectorAvg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

object VectorAvg {
  final class Buffer(var sums: Array[Double], var count: Long)

  import org.apache.spark.sql.graft.ColumnBridge

  /** `vector_avg(c)` as a user Column. */
  def vectorAvg(c: Column): Column =
    ColumnBridge.column(VectorAvg(ColumnBridge.expression(c))
      .toAggregateExpression())
}
