package graft.operators

import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.core.{Serialize, SerializationFormat}

/** Shared pieces of the semantic operators: row→doc serialization (driver
  * resolves field indices once; executors run a tight loop) and the
  * postprocessing layer, expressed as *native Catalyst expressions* so answer
  * parsing stays inside whole-stage codegen rather than a UDF
  * (reference postprocessors: lotus/sem_ops/postprocessors.py:12-221).
  */
object SemCore {

  /** Serializer closure for the projected columns of a row. */
  def serializeDoc(schema: StructType, cols: Seq[String], fmt: SerializationFormat): Row => String = {
    val idx = cols.map(schema.fieldIndex).toArray
    val colArr = cols.toIndexedSeq
    row => Serialize.row(fmt, colArr, idx.map(i => row.get(i)).toIndexedSeq)
  }

  /** Serializer with the session's long-context policy applied: docs that
    * exceed the LM's usable context are truncated (reference TRUNCATE
    * strategy; CHUNK is a pre-op via [[graft.core.LongContext.chunkColumn]]).
    */
  def serializeDocBudgeted(schema: StructType, cols: Seq[String], fmt: SerializationFormat,
      lm: graft.llm.LMClient,
      strategy: graft.core.LongContextStrategy): Row => String = {
    val base = serializeDoc(schema, cols, fmt)
    strategy match {
      case graft.core.LongContextStrategy.Truncate =>
        val budget = math.max(1000, (lm.maxCtxLen - lm.maxTokens) * 4 - 2000)
        row => graft.core.LongContext.truncate(base(row), budget)
      case _ => base
    }
  }

  /** Split referenced columns into (text, image) by the image metadata tag
    * (reference df2multimodal_info separates ImageDtype columns,
    * task_instructions.py:372-387).
    */
  def splitImageCols(schema: StructType, cols: Seq[String]): (Seq[String], Seq[String]) =
    cols.partition(c => !graft.functions.MultimodalOps.isImageCol(schema, c))

  /** Resolver closure: row → images map (capitalized name → chat image url),
    * resolved on executors — refs are fetched where the row already is.
    */
  def imageResolver(schema: StructType, imageCols: Seq[String],
      conf: org.apache.spark.util.SerializableConfiguration): Row => Map[String, String] = {
    val pairs = imageCols.map(c => (graft.core.NLExpr.cap(c), schema.fieldIndex(c)))
    row => pairs.map { case (name, i) =>
      name -> graft.functions.MultimodalOps.toImageUrl(
        Option(row.get(i)).map(_.toString).getOrElse(""),
        if (conf == null) null else conf.value)
    }.toMap
  }

  /** Extract the text after the first `Answer:` tag; whole (trimmed) output
    * when the tag is absent.
    */
  def answerExpr(raw: Column): Column = {
    val pos = locate("Answer:", raw)
    when(pos > 0, trim(raw.substr(pos + lit(7), lit(Int.MaxValue))))
      .otherwise(trim(raw))
  }

  /** Extract the CoT reasoning between `Reasoning:\n` and `Answer:`. */
  def reasoningExpr(raw: Column): Column = {
    val rIdx = locate("Reasoning:\n", raw)
    val start = when(rIdx > 0, rIdx + lit(11)).otherwise(lit(1))
    val aIdx = locate("Answer:", raw)
    when(aIdx > 0,
      regexp_replace(raw.substr(start, aIdx - start), "^\\n+|\\n+$", ""))
      .otherwise(lit(""))
  }

  /** DeepSeek-style CoT parsing (reference deepseek_cot_postprocessor,
    * postprocessors.py:46-93): reasoning lives between `<think>` tags; the
    * answer is the text after `Answer:`, falling back to the text after
    * `</think>` and then the text before `<think>` when absent/empty. No
    * think tags → whole trimmed output.
    */
  def deepseekAnswerExpr(raw: Column): Column = {
    val ts = locate("<think>", raw)
    val te = locate("</think>", raw)
    val ai = locate("Answer:", raw)
    val afterAnswer = trim(raw.substr(ai + lit(7), lit(Int.MaxValue)))
    val afterThink = trim(raw.substr(te + lit(8), lit(Int.MaxValue)))
    val beforeThink = trim(raw.substr(lit(1), ts - 1))
    when(ts > 0 && te > 0,
      when(ai > 0 && length(afterAnswer) > 0, afterAnswer)
        .when(length(afterThink) > 0, afterThink)
        .otherwise(beforeThink))
      .otherwise(trim(raw))
  }

  /** DeepSeek-style reasoning: the text between `<think>` and `</think>`. */
  def deepseekReasoningExpr(raw: Column): Column = {
    val ts = locate("<think>", raw)
    val te = locate("</think>", raw)
    when(ts > 0 && te > 0, trim(raw.substr(ts + lit(7), te - ts - 7)))
      .otherwise(lit(""))
  }

  /** Model-dispatched CoT postprocessor (reference get_cot_postprocessor,
    * postprocessors.py:96-120): DeepSeek-R1 models use the `<think>`
    * variants, everything else the `Reasoning:/Answer:` parser.
    */
  def answerExprFor(modelName: String, raw: Column): Column =
    if (modelName.startsWith("deepseek-r1")) deepseekAnswerExpr(raw) else answerExpr(raw)

  def reasoningExprFor(modelName: String, raw: Column): Column =
    if (modelName.startsWith("deepseek-r1")) deepseekReasoningExpr(raw) else reasoningExpr(raw)

  /** Boolean parse with default fallback: positive token contained → true,
    * negative token contained → false, else `default`.
    */
  def boolExpr(answer: Column, default: Boolean,
      outputTokens: (String, String) = ("True", "False")): Column = {
    val a = lower(answer)
    when(a.contains(outputTokens._1.toLowerCase), lit(true))
      .when(a.contains(outputTokens._2.toLowerCase), lit(false))
      .otherwise(lit(default))
  }

  val RawCol = "__graft_raw"
}
