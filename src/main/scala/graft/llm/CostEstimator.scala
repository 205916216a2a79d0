package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.NLExpr

/** Safe-mode cost pre-estimation (reference lotus/utils.py:123-135, used by
  * sem_filter/sem_topk): how many LLM calls and roughly how many tokens an
  * operator will spend, WITHOUT issuing any call — the estimate comes from
  * row counts and a serialized-length sample. Callers gate expensive jobs on
  * it (the reference prompts the user; a pipeline would compare against a
  * budget).
  */
object CostEstimator {

  final case class Estimate(calls: Long, promptTokens: Long, maxOutputTokens: Long) {
    def totalTokens: Long = promptTokens + maxOutputTokens
  }

  private val PromptOverheadTokens = 120L // system + tags, DEFAULT templates

  private def avgDocTokens(df: DataFrame, cols: Seq[String], sampleN: Int): Long = {
    val lenExpr = cols.map(c => length(coalesce(col(c).cast("string"), lit("None"))))
      .reduce(_ + _)
    val sampled = df.select(lenExpr.as("l")).limit(sampleN).agg(avg("l")).head()
    val avgChars = Option(sampled.get(0)).map(_.toString.toDouble).getOrElse(0.0)
    math.max(1L, (avgChars / 4).toLong)
  }

  /** Per-row op (sem_map / sem_filter / sem_extract). */
  def estimateRowOp(df: DataFrame, instr: String, lm: LMClient,
      sampleN: Int = 100): Estimate = {
    val cols = NLExpr.parse(instr).cols
    val n = df.count()
    val docTokens = avgDocTokens(df, cols, sampleN)
    Estimate(n, n * (docTokens + PromptOverheadTokens), n * lm.maxTokens)
  }

  /** Naive sem_join: |L|×|R| pair classifications. */
  def estimateJoin(left: DataFrame, right: DataFrame, instr: String, lm: LMClient,
      sampleN: Int = 100): Estimate = {
    val cols = NLExpr.parse(instr).cols
    val lCols = cols.filter(left.columns.contains)
    val rCols = cols.filter(right.columns.contains)
    val pairs = left.count() * right.count()
    val docTokens =
      (if (lCols.nonEmpty) avgDocTokens(left, lCols, sampleN) else 0L) +
        (if (rCols.nonEmpty) avgDocTokens(right, rCols, sampleN) else 0L)
    Estimate(pairs, pairs * (docTokens + PromptOverheadTokens), pairs * lm.maxTokens)
  }

  /** sem_topk quick: ~2·n·log2(n) expected comparisons (quickselect+sort). */
  def estimateTopK(df: DataFrame, instr: String, k: Int, lm: LMClient,
      sampleN: Int = 100): Estimate = {
    val cols = NLExpr.parse(instr).cols
    val n = df.count()
    val comparisons = math.max(n - 1, (2 * n * (math.log(math.max(2, n.toDouble)) / math.log(2))).toLong)
    val docTokens = avgDocTokens(df, cols, sampleN)
    Estimate(comparisons, comparisons * (2 * docTokens + PromptOverheadTokens),
      comparisons * 8L) // comparator answers are short
  }
}
