package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Count how many elements of an `array<long>` column might be members of a
  * serialized [[BloomFilter]] — the per-row probe of the Bloom-filter
  * decontamination path (`operators/Decontaminate.scala`).
  *
  * The filter bytes ride in the expression (task closures deserialize once,
  * lazily), so a contamination scan is a pure per-row map: no explode, no
  * join, no shuffle — the cheapest possible shape for "check 100 TB of
  * documents against a fixed benchmark set".
  */
case class BloomContainsCount(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bloom_contains_count requires array<long>, got $other")
    }

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bloomBytes))

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var hits = 0L
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && bloom.mightContainLong(arr.getLong(i))) hits += 1L
      i += 1
    }
    hits
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomExpr {
  import org.apache.spark.sql.graft.ColumnBridge

  /** Column wrapper: number of array elements the Bloom filter may contain. */
  def bloomContainsCount(hashes: Column, bloom: BloomFilter): Column = {
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    ColumnBridge.column(BloomContainsCount(ColumnBridge.expression(hashes), bos.toByteArray))
  }
}
