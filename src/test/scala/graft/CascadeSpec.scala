package graft

import graft.cascade.{CascadeArgs, CascadeUtils, FilterCascade}
import graft.core.Sem
import graft.llm.{FakeBehavior, FakeLM}

class CascadeSpec extends SparkSpec {
  import spark.implicits._

  test("calibration digitizes into [0,1] quantile bins") {
    val probs = (1 to 100).map(_ / 100.0)
    val cal = CascadeUtils.calibrateLlmLogprobs(probs, CascadeArgs())
    assert(cal.forall(p => p >= 0.0 && p <= 1.0))
    assert(cal.head < cal.last)
    // monotone non-decreasing over sorted input
    assert(cal.lazyZip(cal.tail).forall(_ <= _))
  }

  test("learned thresholds separate a well-separated proxy") {
    val scores = Seq.tabulate(100)(i => if (i < 50) 0.9 + (i % 10) / 100.0 else 0.05 + (i % 10) / 100.0)
    val labels = Seq.tabulate(100)(_ < 50)
    val corrections = Seq.fill(100)(1.0)
    val ((tauPos, tauNeg), oracleCalls) =
      CascadeUtils.learnCascadeThresholds(scores, labels, corrections, CascadeArgs())
    assert(tauPos > tauNeg)
    assert(tauPos <= 0.99 && tauPos > 0.15)
    assert(oracleCalls < 100)
  }

  test("importance sampling returns sample within range and corrections") {
    val scores = Seq.tabulate(300)(i => (i % 10) / 10.0)
    val (idx, corr) = CascadeUtils.importanceSampling(scores, CascadeArgs())
    assert(idx.nonEmpty && idx.forall(i => i >= 0 && i < 200)) // capped window
    assert(corr.length == 300)
  }

  test("semFilterCascade matches the exact filter (helper bands are pure)") {
    val docs = (0 until 200).map(i =>
      (i.toLong, if (i % 3 == 0) s"item $i has a delay today" else s"item $i is fine")
    ).toDF("id", "text")
    val (result, stats) = Sem.withLM(FakeLM(FakeBehavior.KeywordFilter("delay"))) {
      FilterCascade.semFilterCascade(docs, "the {text} mentions a delay",
        helperLm = FakeLM(FakeBehavior.KeywordFilterProb("delay")))
    }
    val got = result.select("id").as[Long].collect().toSet
    val exp = (0 until 200).filter(_ % 3 == 0).map(_.toLong).toSet
    assert(got == exp)
    // The cascade must actually save oracle calls.
    assert(stats.oracleCalls < stats.total)
    assert(stats.helperAccepted > 0)
  }

  test("join cascade routes pairs and falls back below the size gate") {
    import graft.cascade.JoinCascade
    val docs = (0 until 30).map(i => (i.toLong, s"w$i spark data")).toDF("doc_id", "text")
    val kws = Seq(Tuple1("spark"), Tuple1("mesos")).toDF("word")
    val (res, stats) = Sem.withLM(FakeLM(FakeBehavior.FieldWordJoin("Text", "Word"))) {
      JoinCascade.semJoinCascade(docs, kws, "the {text} mentions the word {word}",
        "text", "word")
    }
    // 60 pairs < min_join_cascade_size (100) → exact naive join, no cascade.
    assert(stats.isEmpty)
    assert(res.count() == 30) // every doc contains "spark", none contain "mesos"
  }

  test("join cascade plan chooser evaluates map-search-filter") {
    import graft.cascade.{CascadeArgs, JoinCascade}
    // One fake serves both stages: map prompts (Instruction:) get the first
    // word of Text; pair-filter prompts (Claim:) get the word-membership
    // verdict.
    val MapOrJoin = FakeBehavior.PromptRouter(
      onInstruction = FakeBehavior.FirstWords("Text", 1),
      onClaim = FakeBehavior.FieldWordJoin("Text", "Word"))
    val docs = (0 until 60).map(i => (i.toLong, s"spark w$i data")).toDF("doc_id", "text")
    val kws = Seq(Tuple1("spark"), Tuple1("mesos"), Tuple1("yarn")).toDF("word")
    val (res, stats) = Sem.withLM(FakeLM(MapOrJoin)) {
      JoinCascade.semJoinCascade(docs, kws, "the {text} mentions the word {word}",
        "text", "word", CascadeArgs(mapInstruction = Some("the first word of {text}")))
    }
    assert(stats.nonEmpty)
    // Every doc starts with "spark": the true pairs are exactly (doc, spark).
    val pairs = res.select("doc_id", "word").as[(Long, String)].collect().toSet
    assert(pairs.forall(_._2 == "spark"))
    assert(pairs.size >= 50) // recall target 0.8 of 60 true pairs
  }

  test("join cascade with topK routes only LSH candidates (no cross product)") {
    import graft.cascade.{CascadeArgs, JoinCascade}
    val docs = (0 until 60).map(i => (i.toLong, s"w$i spark data")).toDF("doc_id", "text")
    val kws = Seq(Tuple1("spark"), Tuple1("mesos"), Tuple1("kafka")).toDF("word")
    val (res, stats) = Sem.withLM(FakeLM(FakeBehavior.FieldWordJoin("Text", "Word"))) {
      JoinCascade.semJoinCascade(docs, kws, "the {text} mentions the word {word}",
        "text", "word", CascadeArgs(posThreshold = Some(1.01), negThreshold = Some(-0.01),
          joinCascadeTopK = 2))
    }
    assert(stats.nonEmpty)
    // Candidates are bounded: ≤ topK per left row ever reached the oracle.
    assert(stats.get.total <= 60 * 2)
    // All emitted pairs are true pairs (the oracle verified every candidate).
    val pairs = res.select("doc_id", "word").as[(Long, String)].collect()
    assert(pairs.forall(_._2 == "spark"))
  }

  test("join cascade auto mode bounds candidates above the pair limit") {
    import graft.cascade.{CascadeArgs, JoinCascade}
    val docs = (0 until 40).map(i => (i.toLong, s"w$i spark data")).toDF("doc_id", "text")
    val kws = Seq(Tuple1("spark"), Tuple1("mesos"), Tuple1("kafka")).toDF("word")
    // Pair limit 0 forces the scale path with joinCascadeTopK left at auto:
    // candidates must come from LSH retrieval, bounded per left row — never
    // a materialized |L|×|R| frame.
    val args = CascadeArgs(joinCascadeAutoPairLimit = 0L, joinCascadeAutoTopK = 2)
    val (cand, _) = JoinCascade.scoredPairs(docs, kws, "text", "word", None, args,
      leftCount = 40, rightCount = 3)
    val plan = cand.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(cand.count() <= 40 * 2)
    // End-to-end through the same args: the cascade stays correct (every
    // emitted pair oracle-verified) with bounded routing.
    val (res, stats) = Sem.withLM(FakeLM(FakeBehavior.FieldWordJoin("Text", "Word"))) {
      JoinCascade.semJoinCascade(docs, kws, "the {text} mentions the word {word}",
        "text", "word", args.copy(posThreshold = Some(1.01), negThreshold = Some(-0.01)))
    }
    assert(stats.nonEmpty && stats.get.total <= 40 * 2)
    assert(res.select("word").as[String].collect().forall(_ == "spark"))
  }

  test("join cascade under the pair limit keeps reference-parity full scoring") {
    import graft.cascade.{CascadeArgs, JoinCascade}
    val docs = (0 until 40).map(i => (i.toLong, s"w$i spark data")).toDF("doc_id", "text")
    val kws = Seq(Tuple1("spark"), Tuple1("mesos")).toDF("word")
    val (cand, _) = JoinCascade.scoredPairs(docs, kws, "text", "word", None,
      CascadeArgs(), leftCount = 40, rightCount = 2)
    // Under the limit every pair is proxy-scored: K = |R|.
    assert(cand.count() == 80)
  }

  test("cascade guarantee holds in aggregate: realized recall/precision " +
      "miss rate across 30 seeded corpora stays within failureProbability") {
    // The reference validates its cascade guarantees STATISTICALLY
    // (benchmarks/biodex/test_paper_results.py:79-124): the UB/LB
    // threshold-learning math promises recall ≥ target and precision ≥
    // target each with probability ≥ 1 − failureProbability — a claim a
    // single seed can't test and exactly where a subtle port bug hides.
    // 30 corpora (distinct content → distinct deterministic proxy jitter,
    // overlapping positive/negative proxy bands so the thresholds MUST be
    // learned, not trivially separable), LEARNED thresholds each time;
    // the realized miss rates must stay within the configured failure
    // probability plus binomial sampling slack. Everything is seeded, so
    // this is a deterministic pin of an aggregate property, not a flake.
    val seeds = 30
    val args = CascadeArgs() // recall 0.8, precision 0.8, failureProb 0.2
    var recallMisses = 0
    var precisionMisses = 0
    var totalOracleCalls = 0L
    var totalRows = 0L
    for (seed <- 0 until seeds) {
      val rng = new scala.util.Random(seed)
      val docs = (0 until 240).map { i =>
        val pos = rng.nextDouble() < 0.4
        val filler = (0 until 5).map(_ => s"t${rng.nextInt(50)}").mkString(" ")
        (i.toLong,
          s"corpus$seed item $i $filler " + (if (pos) "delay today" else "fine today"),
          pos)
      }
      val df = docs.map(d => (d._1, d._2)).toDF("id", "text")
      val truePos = docs.filter(_._3).map(_._1).toSet
      val (result, stats) = Sem.withLM(FakeLM(FakeBehavior.KeywordFilter("delay"))) {
        FilterCascade.semFilterCascade(df, "the {text} mentions a delay",
          helperLm = FakeLM(FakeBehavior.KeywordFilterProb("delay",
            hi = 0.65, lo = 0.35, jitter = 0.8)),
          args = args)
      }
      val got = result.select("id").as[Long].collect().toSet
      val hit = (got & truePos).size.toDouble
      val recall = if (truePos.isEmpty) 1.0 else hit / truePos.size
      val precision = if (got.isEmpty) 1.0 else hit / got.size
      if (recall < args.recallTarget) recallMisses += 1
      if (precision < args.precisionTarget) precisionMisses += 1
      totalOracleCalls += stats.oracleCalls
      totalRows += docs.length
    }
    // failureProbability 0.2 over 30 trials: E[misses] = 6; P(X > 13) < 0.3%
    // under the promised bound — more misses means the guarantee math is
    // broken, not bad luck.
    assert(recallMisses <= 13,
      s"recall guarantee missed $recallMisses/$seeds times (bound: 0.2 + slack)")
    assert(precisionMisses <= 13,
      s"precision guarantee missed $precisionMisses/$seeds times (bound: 0.2 + slack)")
    // And the cascade must actually be a cascade: the learned thresholds
    // must route well under everything to the oracle in aggregate.
    assert(totalOracleCalls < totalRows * 0.9,
      s"learned thresholds routed $totalOracleCalls/$totalRows to the oracle")
  }

  test("join cascade guarantee holds in aggregate: realized recall/precision " +
      "miss rate across 20 seeded corpora stays within failureProbability") {
    // The join-side sibling of the filter-cascade property above: learned
    // (not pinned) thresholds over the embedding-sim proxy, exact oracle,
    // realized pair recall/precision per corpus, aggregate miss rates
    // bounded by the configured failure probability + binomial slack.
    import graft.cascade.JoinCascade
    val seeds = 20
    val args = CascadeArgs() // recall 0.8, precision 0.8, failureProb 0.2
    val words = Seq("spark", "kafka", "flink", "beam", "storm")
    var recallMisses = 0
    var precisionMisses = 0
    for (seed <- 0 until seeds) {
      val rng = new scala.util.Random(1000 + seed)
      val docs = (0 until 40).map { i =>
        val w = words(rng.nextInt(words.size))
        val extra =
          if (rng.nextDouble() < 0.3) " also " + words(rng.nextInt(words.size))
          else ""
        val noise = (0 until 4).map(_ => s"n${rng.nextInt(30)}").mkString(" ")
        (i.toLong, s"doc$seed $i $noise uses $w$extra")
      }
      val df = docs.toDF("doc_id", "text")
      val kws = words.map(Tuple1(_)).toDF("word")
      val truePairs = (for {
        (id, t) <- docs
        w <- words if t.split("\\s+").contains(w)
      } yield (id, w)).toSet
      val (res, stats) = Sem.withLM(FakeLM(FakeBehavior.FieldWordJoin("Text", "Word"))) {
        JoinCascade.semJoinCascade(df, kws,
          "the {text} mentions the word {word}", "text", "word", args)
      }
      assert(stats.nonEmpty, "200 pairs ≥ minJoinCascadeSize must cascade")
      val got = res.select("doc_id", "word").as[(Long, String)].collect().toSet
      val hit = (got & truePairs).size.toDouble
      val recall = if (truePairs.isEmpty) 1.0 else hit / truePairs.size
      val precision = if (got.isEmpty) 1.0 else hit / got.size
      if (recall < args.recallTarget) recallMisses += 1
      if (precision < args.precisionTarget) precisionMisses += 1
    }
    // failureProbability 0.2 over 20 trials: E[misses] = 4; P(X > 10) ≈ 2e-4.
    assert(recallMisses <= 10,
      s"join recall guarantee missed $recallMisses/$seeds times")
    assert(precisionMisses <= 10,
      s"join precision guarantee missed $precisionMisses/$seeds times")
  }

  test("fixed thresholds skip learning") {
    val docs = (0 until 50).map(i => (i.toLong, if (i % 2 == 0) "a delay" else "fine"))
      .toDF("id", "text")
    val (result, stats) = Sem.withLM(FakeLM(FakeBehavior.KeywordFilter("delay"))) {
      FilterCascade.semFilterCascade(docs, "the {text} mentions a delay",
        helperLm = FakeLM(FakeBehavior.KeywordFilterProb("delay")),
        args = CascadeArgs(posThreshold = Some(0.99), negThreshold = Some(0.01)))
    }
    assert(stats.tauPos == 0.99)
    assert(result.count() == 25)
  }
}
