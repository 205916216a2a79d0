package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.{NLExpr, ReasoningStrategy}

/** Evaluation operators, composed from the core ops exactly as the reference
  * composes them (lotus/evals/llm_as_judge.py, pairwise_judge.py).
  */
object Evals {

  /** n-trial judging: one sem_map per trial with a judge system prompt,
    * output columns `<suffix>_i` (reference llm_as_judge.py:81-105 runs
    * trials in a thread pool; here each trial is one distributed LLM stage).
    */
  def llmAsJudge(df: DataFrame, judgeInstr: String, nTrials: Int = 1,
      suffix: String = "_judge"): DataFrame = {
    val sys = "You are a fair and impartial judge. Evaluate the provided data " +
      "according to the user's criteria and answer concisely."
    (0 until nTrials).foldLeft(df) { (d, i) =>
      SemRowOps.semMap(d, judgeInstr, suffix = s"$suffix$i", systemPrompt = Some(sys))
    }
  }

  /** A/B comparison of two columns: rename to single-token labels `A`/`B`
    * (single tokens keep logprob cascades possible, reference
    * pairwise_judge.py:13-24), run the filter core with output tokens
    * ("A","B"), map the boolean back to "A"/"B". With `permuteCols`, both
    * orders are judged and the second trial's verdict is remapped.
    */
  def pairwiseJudge(df: DataFrame, col1: String, col2: String, judgeInstr: String,
      nTrials: Int = 1, permuteCols: Boolean = false,
      suffix: String = "_judge"): DataFrame = {
    val base = df
    val trials = if (permuteCols) nTrials * 2 else nTrials
    (0 until trials).foldLeft(base) { (d, i) =>
      val flip = permuteCols && i % 2 == 1
      val (a, b) = if (flip) (col2, col1) else (col1, col2)
      val renamed = d.withColumnRenamed(a, "A").withColumnRenamed(b, "B")
      val instr = NLExpr.substitute(judgeInstr,
        Map(col1 -> (if (flip) "{B}" else "{A}"), col2 -> (if (flip) "{A}" else "{B}")))
      val judged = SemRowOps.semFilter(renamed, instr, default = true, returnAll = true,
        suffix = s"__pred$i", outputTokens = ("A", "B"))
      val verdict = if (flip)
        when(org.apache.spark.sql.functions.col(s"__pred$i"), "B").otherwise("A")
      else
        when(org.apache.spark.sql.functions.col(s"__pred$i"), "A").otherwise("B")
      judged.withColumn(s"$suffix$i", verdict).drop(s"__pred$i")
        .withColumnRenamed("A", a).withColumnRenamed("B", b)
    }
  }
}
