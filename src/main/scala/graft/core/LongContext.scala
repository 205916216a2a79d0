package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Long-context handling (reference lotus/long_context_strategy.py:57-261):
  * what to do when a document exceeds the model's context budget.
  *
  *  - TRUNCATE: cap each doc's serialized text at the budget (cheap, lossy
  *    tail).
  *  - CHUNK: split the largest column into budget-sized chunks, producing
  *    one row per chunk with `__chunk_id`/`__chunk_of` restoration columns
  *    so downstream ops can re-group (`restoreChunks`).
  */
sealed trait LongContextStrategy extends Serializable
object LongContextStrategy {
  case object Truncate extends LongContextStrategy
  case object Chunk extends LongContextStrategy
}

object LongContext {

  /** Truncate a string to at most `maxChars` (applied to serialized docs). */
  def truncate(doc: String, maxChars: Int): String =
    if (doc.length <= maxChars) doc else doc.substring(0, maxChars)

  /** Chunk `c` into ≤ `chunkChars` pieces; one output row per chunk with
    * `__chunk_id` (ordinal) and `__chunk_of` (total). Other columns repeat.
    */
  def chunkColumn(df: DataFrame, c: String, chunkChars: Int): DataFrame = {
    val nChunks = ceil(length(col(c)).cast("double") / chunkChars).cast("int")
    df.withColumn("__chunk_of", greatest(nChunks, lit(1)))
      .withColumn("__chunk_id", explode(sequence(lit(0), col("__chunk_of") - 1)))
      .withColumn(c, substring(col(c), col("__chunk_id") * chunkChars + 1, lit(chunkChars)))
  }

  /** Re-assemble chunked rows: concatenate `c` back in chunk order per group
    * of `keyCols` (chunk-info restoration).
    */
  def restoreChunks(df: DataFrame, c: String, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(concat_ws("",
        transform(array_sort(collect_list(struct(col("__chunk_id"), col(c)))),
          s => s.getField(c))).as(c))
}
