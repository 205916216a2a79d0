import org.apache.spark.sql.{Column, DataFrame}
import graft.core.ReasoningStrategy
import graft.llm.Prompts.Example
import graft.operators._

/** User-facing API: the reference registers pandas accessors
  * (`df.sem_filter(...)`); the Spark-native equivalent is an implicit
  * enrichment of DataFrame, keeping every operator `DataFrame → DataFrame`
  * so semantic and classical (Catalyst) operators compose freely.
  */
package object graft {

  implicit class SemDataFrame(val df: DataFrame) extends AnyVal {

    // ---- core LLM per-row ops --------------------------------------------
    def semMap(instr: String, suffix: String = "_map", examples: Seq[Example] = Nil,
        strategy: ReasoningStrategy = ReasoningStrategy.Default,
        systemPrompt: Option[String] = None, returnExplanations: Boolean = false,
        returnRawOutputs: Boolean = false): DataFrame =
      SemRowOps.semMap(df, instr, suffix, examples, strategy, systemPrompt,
        returnExplanations, returnRawOutputs)

    def semFilter(instr: String, default: Boolean = true, returnAll: Boolean = false,
        suffix: String = "_filter", examples: Seq[Example] = Nil,
        strategy: ReasoningStrategy = ReasoningStrategy.Default,
        systemPrompt: Option[String] = None,
        outputTokens: (String, String) = ("True", "False"),
        returnExplanations: Boolean = false): DataFrame =
      SemRowOps.semFilter(df, instr, default, returnAll, suffix, examples, strategy,
        systemPrompt, outputTokens, returnExplanations)

    def semExtract(inputCols: Seq[String], outputCols: Seq[(String, Option[String])],
        extractQuotes: Boolean = false,
        strategy: ReasoningStrategy = ReasoningStrategy.Default,
        returnRawOutputs: Boolean = false): DataFrame =
      SemRowOps.semExtract(df, inputCols, outputCols, extractQuotes, strategy, returnRawOutputs)

    def semJoin(other: DataFrame, instr: String, how: String = "inner",
        examples: Seq[Example] = Nil,
        strategy: ReasoningStrategy = ReasoningStrategy.Default): DataFrame =
      SemRowOps.semJoin(df, other, instr, how, examples, strategy)

    def semAgg(instr: String, allCols: Boolean = false, groupBy: Seq[String] = Nil,
        suffix: String = "_output", orderBy: Seq[Column] = Nil,
        responseFormat: Seq[String] = Nil): DataFrame =
      SemAgg.semAgg(df, instr, allCols, groupBy, suffix, orderBy, responseFormat)

    def semTopK(instr: String, k: Int, method: String = "quick",
        groupBy: Seq[String] = Nil, rankCol: String = "rank",
        cascadeThreshold: Option[Double] = None): DataFrame =
      SemTopK.semTopK(df, instr, k, method, groupBy, rankCol, cascadeThreshold)

    // ---- embedding / retrieval ops ---------------------------------------
    def semIndex(c: String): DataFrame = EmbedOps.semIndex(df, c)

    def semIndexSave(c: String, idCol: String, path: String): DataFrame =
      EmbedOps.semIndexSave(df, c, idCol, path)

    def semLoadIndex(c: String, idCol: String, path: String): DataFrame =
      EmbedOps.semLoadIndex(df, c, idCol, path)

    def semSearch(c: String, query: String, k: Int, scoreCol: String = "vec_scores",
        tieBreak: Seq[Column] = Nil): DataFrame =
      EmbedOps.semSearch(df, c, query, k, scoreCol, tieBreak)

    def semSearchVec(c: String, qv: Seq[Float], k: Int, scoreCol: String = "vec_scores",
        tieBreak: Seq[Column] = Nil): DataFrame =
      EmbedOps.semSearchVec(df, c, qv, k, scoreCol, tieBreak)

    def semSimJoin(other: DataFrame, leftOn: String, rightOn: String, k: Int,
        scoreCol: String = "_scores", broadcastRight: Boolean = true,
        tieBreak: Seq[Column] = Nil): DataFrame =
      EmbedOps.semSimJoin(df, other, leftOn, rightOn, k, scoreCol, broadcastRight, tieBreak)

    /** Near-dup pair kernel; above `lshRowThreshold` rows the auto route
      * takes the cell-partitioned path (pair-count-bound — see
      * [[EmbedOps.neardupPairs]]) so the default path never cross-joins a
      * large corpus. The threshold default MUST stay in lock-step with
      * EmbedOps' (it is the quadratic-pair-cost bound, not a broadcast
      * size).
      */
    def neardupPairs(c: String, idCol: String, threshold: Double,
        useLsh: Option[Boolean] = None, lshRowThreshold: Long = 10000L): DataFrame =
      EmbedOps.neardupPairs(df, c, idCol, threshold, useLsh, lshRowThreshold)

    def semSimJoinAuto(other: DataFrame, leftOn: String, rightOn: String, k: Int,
        broadcastBytesThreshold: Long = 64L << 20, dim: Int = 0,
        scoreCol: String = "_scores", tieBreak: Seq[Column] = Nil): DataFrame =
      EmbedOps.semSimJoinAuto(df, other, leftOn, rightOn, k, broadcastBytesThreshold,
        dim, scoreCol, tieBreak)

    /** ColBERT-style late-interaction top-k search (per-token MaxSim). */
    def semSearchLate(c: String, query: String, k: Int,
        scoreCol: String = "li_scores"): DataFrame =
      graft.embed.LateInteraction.search(df, c, query, k, scoreCol)

    // ---- streaming variants (Structured Streaming inputs) ----------------
    def semFilterStream(instr: String, default: Boolean = true): DataFrame =
      graft.streaming.StreamingOps.semFilterStream(df, instr, default)

    def semMapStream(instr: String, suffix: String = "_map"): DataFrame =
      graft.streaming.StreamingOps.semMapStream(df, instr, suffix)

    def semClusterBy(c: String, nClusters: Int, seed: Long = 42,
        clusterCol: String = "cluster_id",
        fitSampleFraction: Double = -1.0): DataFrame =
      EmbedOps.semClusterBy(df, c, nClusters, seed, clusterCol,
        fitSampleFraction)

    def semDedup(c: String, idCol: String, threshold: Double): DataFrame =
      EmbedOps.semDedup(df, c, idCol, threshold)

    def semPartitionBy(c: String, nPartitions: Int): DataFrame =
      EmbedOps.semPartitionBy(df, c, nPartitions)

    // ---- cascades --------------------------------------------------------
    /** Filter cascade: helper-model confident bands + oracle middle band,
      * with statistical recall/precision guarantees. Returns kept rows.
      */
    def semFilterCascade(instr: String, helperLm: graft.llm.LMClient,
        args: graft.cascade.CascadeArgs = graft.cascade.CascadeArgs(),
        default: Boolean = true): DataFrame =
      graft.cascade.FilterCascade.semFilterCascade(df, instr, helperLm, args, default)._1

    /** Join cascade: embedding-proxy scores route pairs; only the uncertain
      * band is LLM-verified. Falls back to the naive theta join below
      * minJoinCascadeSize.
      */
    def semJoinCascade(other: DataFrame, instr: String, leftOn: String, rightOn: String,
        args: graft.cascade.CascadeArgs = graft.cascade.CascadeArgs()): DataFrame =
      graft.cascade.JoinCascade.semJoinCascade(df, other, instr, leftOn, rightOn, args)._1

    // ---- evals -----------------------------------------------------------
    def llmAsJudge(judgeInstr: String, nTrials: Int = 1,
        suffix: String = "_judge", responseFormat: Seq[String] = Nil,
        systemPrompt: Option[String] = None): DataFrame =
      Evals.llmAsJudge(df, judgeInstr, nTrials, suffix, responseFormat, systemPrompt)

    def pairwiseJudge(col1: String, col2: String, judgeInstr: String,
        nTrials: Int = 1, permuteCols: Boolean = false,
        suffix: String = "_judge"): DataFrame =
      Evals.pairwiseJudge(df, col1, col2, judgeInstr, nTrials, permuteCols, suffix)
  }
}
