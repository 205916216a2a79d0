package graft.cascade

/** Cascade configuration (reference lotus/types.py:163-199 defaults). */
final case class CascadeArgs(
    recallTarget: Double = 0.8,
    precisionTarget: Double = 0.8,
    samplingPercentage: Double = 0.1,
    failureProbability: Double = 0.2,
    cascadeISWeight: Double = 0.9,
    cascadeNumCalibrationQuantiles: Int = 50,
    minJoinCascadeSize: Int = 100,
    cascadeISMaxSampleRange: Int = 200,
    cascadeISRandomSeed: Option[Long] = Some(42L),
    posThreshold: Option[Double] = None,
    negThreshold: Option[Double] = None,
    /** Left-side map instruction enabling the map-search-filter join plan
      * (reference map_instruction in CascadeArgs). */
    mapInstruction: Option[String] = None,
    /** Force "search_filter" or "map_search_filter"; None = cost-choose. */
    joinCascadeStrategy: Option[String] = None,
    /** Candidates per left row from LSH retrieval; 0 = auto — reference
      * -parity full proxy scoring (K = |right|) while the estimated pair
      * count stays under [[joinCascadeAutoPairLimit]], bounded LSH top-k
      * ([[joinCascadeAutoTopK]] per left row) above it. */
    joinCascadeTopK: Int = 0,
    /** Auto-mode switch point: above this estimated |L|×|R| the candidate
      * set is never fully scored or materialized — LSH retrieval bounds it
      * to |L|×joinCascadeAutoTopK. */
    joinCascadeAutoPairLimit: Long = 4L << 20,
    /** Candidates per left row once auto mode crosses the pair limit. */
    joinCascadeAutoTopK: Int = 64) extends Serializable

/** Driver-side cascade math, a faithful port of the reference's
  * statistically-guaranteed threshold learning
  * (lotus/sem_ops/cascade_utils.py:8-149). Sample sizes are
  * `samplingPercentage × n` — small — so this runs on the driver; the
  * proxy/oracle passes around it are distributed Spark jobs.
  */
object CascadeUtils {

  /** Long multiply saturating at Long.MaxValue — pair-count estimates must
    * never wrap negative (scale guards compare against them).
    */
  def satMul(a: Long, b: Long): Long =
    try Math.multiplyExact(a, b)
    catch { case _: ArithmeticException => Long.MaxValue }

  /** Importance sampling over proxy scores: mixture of sqrt-score-proportional
    * and uniform weights; returns (sampled indices, per-item correction
    * factors for the whole population).
    */
  def importanceSampling(proxyScores: Seq[Double], args: CascadeArgs): (Seq[Int], Seq[Double]) = {
    val n = proxyScores.length
    val rng = new scala.util.Random(args.cascadeISRandomSeed.getOrElse(42L))
    val sqrtScores = proxyScores.map(math.sqrt)
    val sumSqrt = sqrtScores.sum.max(1e-12)
    val w = sqrtScores.map(s => args.cascadeISWeight * s / sumSqrt + (1 - args.cascadeISWeight) / n)

    val sampleRange = math.min(args.cascadeISMaxSampleRange, n)
    val sampleW = w.take(sampleRange)
    val sumSampleW = sampleW.sum.max(1e-12)
    val probs = sampleW.map(_ / sumSampleW)

    val sampleSize = (args.samplingPercentage * n).toInt.max(1)
    // Weighted sampling with replacement via inverse-CDF.
    val cdf = probs.scanLeft(0.0)(_ + _).tail
    val indices = Seq.fill(sampleSize) {
      val u = rng.nextDouble()
      val i = cdf.indexWhere(_ >= u)
      if (i < 0) sampleRange - 1 else i
    }
    val corrections = w.map(wi => (1.0 / n) / wi)
    (indices, corrections)
  }

  /** Quantile-digitize calibration of raw positive-token probabilities. */
  def calibrateLlmLogprobs(trueProbs: Seq[Double], args: CascadeArgs): Seq[Double] = {
    if (trueProbs.isEmpty) return trueProbs
    val q = args.cascadeNumCalibrationQuantiles
    val sorted = trueProbs.sorted
    // numpy-style linear-interpolated percentiles at 0, 100/q, ..., 100.
    val quantiles = (0 to q).map { k =>
      val pos = k.toDouble / q * (sorted.length - 1)
      val lo = pos.toInt
      val hi = math.min(lo + 1, sorted.length - 1)
      sorted(lo) + (pos - lo) * (sorted(hi) - sorted(lo))
    }
    trueProbs.map { p =>
      // numpy.digitize(right=false): count of quantile edges <= p
      val bin = quantiles.count(_ <= p)
      math.min(1.0, math.max(0.0, (bin - 1).toDouble / q))
    }
  }

  private def ub(mean: Double, std: Double, s: Int, delta: Double): Double =
    mean + (std / math.sqrt(s.toDouble)) * math.sqrt(2 * math.log(1 / delta))
  private def lb(mean: Double, std: Double, s: Int, delta: Double): Double =
    mean - (std / math.sqrt(s.toDouble)) * math.sqrt(2 * math.log(1 / delta))

  private def meanStd(xs: Seq[Double]): (Double, Double) =
    if (xs.isEmpty) (0.0, 0.0)
    else {
      val m = xs.sum / xs.length
      (m, math.sqrt(xs.map(x => (x - m) * (x - m)).sum / xs.length))
    }

  /** Learn (tauPos, tauNeg) with UB/LB statistical corrections so the routed
    * pipeline meets recall and precision targets with probability
    * ≥ 1 − failureProbability. Returns the thresholds and the number of
    * oracle calls the routing would make on the scored population.
    */
  def learnCascadeThresholds(
      proxyScores: Seq[Double],
      oracleOutputs: Seq[Boolean],
      corrections: Seq[Double],
      args: CascadeArgs): ((Double, Double), Int) = {

    val sortedPairs = proxyScores.lazyZip(oracleOutputs).lazyZip(corrections)
      .map((s, o, c) => (s, o, c)).sortBy(-_._1)
    val sampleSize = sortedPairs.length

    def recall(tp: Double, tn: Double,
        pairs: Seq[(Double, Boolean, Double)]): Double = {
      val totalCorrect = pairs.map(p => (if (p._2) 1.0 else 0.0) * p._3).sum
      if (totalCorrect <= 0) return 0.0
      val acceptedTrue = pairs.count(x => x._1 >= tp && x._2)
      val oracleMass = pairs.filter(x => x._1 < tp && x._1 > tn)
        .map(p => (if (p._2) 1.0 else 0.0) * p._3).sum
      (acceptedTrue + oracleMass) / totalCorrect
    }

    // Reference takes max() over all qualifying thresholds
    // (cascade_utils.py calculate_tau_neg). Recall is monotone decreasing in
    // tau_neg, so the qualifying set is downward-closed and the max is the
    // FIRST qualifying score in descending order.
    def tauNegFor(tp: Double, recallTarget: Double): Double =
      sortedPairs.iterator
        .filter(x => recall(tp, x._1, sortedPairs) >= recallTarget)
        .map(_._1).nextOption().getOrElse(0.0)

    var tauPos = 1.0
    var tauNeg = tauNegFor(tauPos, args.recallTarget)

    // Statistical correction of the recall target.
    val z1 = sortedPairs.filter(_._1 >= tauNeg).map(p => (if (p._2) 1.0 else 0.0) * p._3)
    val z2 = sortedPairs.filter(_._1 < tauNeg).map(p => (if (p._2) 1.0 else 0.0) * p._3)
    val (m1, s1) = meanStd(z1)
    val (m2, s2) = meanStd(z2)
    val ubZ1 = ub(m1, s1, sampleSize, args.failureProbability / 2)
    val lbZ2 = lb(m2, s2, sampleSize, args.failureProbability / 2)
    val correctedRecall =
      if (ubZ1 + lbZ2 == 0) 1.0 else math.min(1.0, ubZ1 / (ubZ1 + lbZ2))
    tauNeg = tauNegFor(tauPos, correctedRecall)

    // Precision correction: lowest tau_pos whose LB precision clears target.
    val candidates = scala.collection.mutable.ArrayBuffer(1.0)
    sortedPairs.foreach { pair =>
      val z = sortedPairs.filter(_._1 >= pair._1).map(p => if (p._2) 1.0 else 0.0)
      val (mz, sz) = meanStd(z)
      val pl = lb(mz, sz, z.length.max(1), args.failureProbability / sampleSize)
      if (pl > args.precisionTarget) candidates += pair._1
    }
    tauPos = math.max(tauNeg, candidates.min)

    val oracleCalls = proxyScores.count(s => tauPos > s && s > tauNeg)
    ((tauPos, tauNeg), oracleCalls)
  }
}
