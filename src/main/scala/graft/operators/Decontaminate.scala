package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{BloomExpr, MinHashExpr}

/** Benchmark decontamination: flag training documents that share word
  * n-grams with an evaluation/benchmark set — the standard leakage guard in
  * published LLM corpus pipelines (GPT-3 §B "13-gram overlap", PaLM, Llama;
  * reference scope: the corpus-cleaning family around
  * `/root/reference/lotus/sem_ops/sem_dedup.py`, extended per the
  * training-pipeline charter).
  *
  * Grams are hashed with the same tight-loop FNV shingle kernel as the
  * minhash dedup path ([[MinHashExpr.shingleHashes]]) — O(doc length)
  * per row, no shingle strings materialized.
  *
  * Two tiers:
  *
  *   - [[flagContaminated]] (exact): distinct eval-gram hashes are a small
  *     frame (eval sets are benchmarks — thousands of docs, not billions);
  *     corpus grams explode per-row and broadcast-semi-hit against it, then
  *     one count shuffle over the HIT rows only. Exact hit counts.
  *
  *   - [[flagContaminatedBloom]] (scale): the eval grams fold into a Bloom
  *     filter whose bytes ride inside a per-row probe expression
  *     ([[BloomExpr.bloomContainsCount]]) — the corpus pass is a pure map
  *     with ZERO shuffle and zero joins. Counts are upper bounds (false
  *     positives at `fpp`, never false negatives), which is the safe
  *     direction for a leakage guard: you may re-check a clean doc, you
  *     never leak a contaminated one.
  */
object Decontaminate {

  /** Distinct hashed word n-grams of a text column (lowercased whitespace
    * tokens; docs shorter than `n` words hash as one whole-text gram,
    * matching `Dedup.shingles`).
    */
  def gramHashes(c: Column, n: Int): Column =
    array_distinct(MinHashExpr.shingleHashes(split(lower(trim(c)), "\\s+"), n))

  /** One distinct gram-hash per row of the eval set, as column `__g`. */
  private def evalGramFrame(eval: DataFrame, evalTextCol: String, n: Int): DataFrame =
    eval.select(explode(gramHashes(col(evalTextCol), n)).as("__g")).distinct()

  /** Exact contamination: every corpus row gains `contamGrams` (distinct
    * grams shared with the eval set) and `contaminated` (≥ `minHits`).
    */
  def flagContaminated(corpus: DataFrame, idCol: String, textCol: String,
      eval: DataFrame, evalTextCol: String, n: Int = 5,
      minHits: Int = 1): DataFrame = {
    val evalG = evalGramFrame(eval, evalTextCol, n)
    val hits = corpus
      .select(col(idCol), explode(gramHashes(col(textCol), n)).as("__g"))
      .join(broadcast(evalG), Seq("__g"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("__hits"))
    corpus.join(hits, Seq(idCol), "left")
      .withColumn("contam_grams", coalesce(col("__hits"), lit(0L)))
      .withColumn("contaminated", col("contam_grams") >= minHits)
      .drop("__hits")
  }

  /** Bloom-filter contamination: same columns as [[flagContaminated]], but
    * `contam_grams` is a might-contain upper bound and the corpus pass is
    * shuffle-free. `expectedEvalGrams ≤ 0` triggers one counting pass over
    * the (small) eval gram frame to size the filter.
    */
  def flagContaminatedBloom(corpus: DataFrame, idCol: String, textCol: String,
      eval: DataFrame, evalTextCol: String, n: Int = 5, minHits: Int = 1,
      fpp: Double = 1e-4, expectedEvalGrams: Long = -1L): DataFrame = {
    val evalG = evalGramFrame(eval, evalTextCol, n)
    val expected = if (expectedEvalGrams > 0) expectedEvalGrams else evalG.count()
    val bloom = evalG.stat.bloomFilter("__g", math.max(expected, 1L), fpp)
    corpus
      .withColumn("contam_grams",
        BloomExpr.bloomContainsCount(gramHashes(col(textCol), n), bloom))
      .withColumn("contaminated", col("contam_grams") >= minHits)
  }

  /** SEMANTIC decontamination: drop corpus rows whose embedding is within
    * cosine `threshold` of ANY eval embedding — the paraphrase-leakage
    * guard n-gram overlap misses (an eval question rephrased in the
    * training set shares meaning, not 13-grams; the published phi/FineWeb
    * pipelines run exactly this embedding pass beside the n-gram one).
    *
    * Scale shape: eval sets are benchmarks — thousands of vectors, not
    * billions — so the eval side BROADCASTS and the corpus pays one
    * nested-loop anti-join probe per row against the in-memory eval
    * matrix, short-circuiting at the first hit: no shuffle of the corpus,
    * no candidate blow-up, linear in |corpus|·|eval|. That product is the
    * right cost up to ~10⁴ eval vectors; past `maxBroadcastEvalRows` this
    * refuses loudly — route giant "eval" sets through the LSH/cell pair
    * machinery ([[EmbedOps.neardupPairs]]) instead of silently turning a
    * guard pass into a quadratic job.
    */
  def dropContaminatedSemantic(corpus: DataFrame, corpusVec: String,
      eval: DataFrame, evalVec: String, threshold: Double,
      maxBroadcastEvalRows: Long = 100000L): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"dropContaminatedSemantic: cosine threshold $threshold must be in (0, 1]")
    val nEval = eval.count()
    require(nEval <= maxBroadcastEvalRows,
      s"dropContaminatedSemantic: eval set has $nEval rows > " +
        s"$maxBroadcastEvalRows — a broadcast nested-loop probe at this " +
        "size is a quadratic job, not a guard pass; dedup the eval set or " +
        "use the LSH/cell pair route (EmbedOps.neardupPairs) instead")
    // One dot product per pair: norms are hoisted to per-ROW columns and
    // the cosine test becomes dot ≥ τ·‖a‖·‖b‖ — vs cosineSim in the join
    // condition, which would re-derive both norms (3 dots) per pair. The
    // ‖·‖ > 0 conjuncts keep zero vectors UNmatched (cosine with a zero
    // vector is undefined-not-contaminated, the NaN-comparison semantics).
    def dot(a: Column, b: Column) = graft.functions.VectorExprs.arrayDot(a, b)
    val ev = eval.select(col(evalVec).as("__eval_vec"))
      .withColumn("__eval_norm", sqrt(dot(col("__eval_vec"), col("__eval_vec"))))
    val cn = corpus.withColumn("__corpus_norm",
      sqrt(dot(col(corpusVec), col(corpusVec))))
    cn.join(broadcast(ev),
        dot(col(corpusVec), col("__eval_vec")) >=
          lit(threshold) * col("__corpus_norm") * col("__eval_norm") &&
          col("__corpus_norm") > 0 && col("__eval_norm") > 0,
        "left_anti")
      .drop("__corpus_norm")
  }
}
