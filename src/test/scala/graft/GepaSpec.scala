package graft

import org.apache.spark.sql.DataFrame
import graft.core.Sem
import graft.llm.{FakeBehavior, FakeLM}
import graft.plan.{GepaLite, SemFilterOp, SemPlan}

class GepaSpec extends SparkSpec {
  import spark.implicits._

  test("cost estimator scales with rows and doc size") {
    import graft.llm.CostEstimator
    val docs = (0 until 100).map(i => (i.toLong, "word " * 40)).toDF("id", "text")
    val est = CostEstimator.estimateRowOp(docs, "classify {text}", FakeLM(FakeBehavior.Echo))
    assert(est.calls == 100)
    assert(est.promptTokens > 100 * 50) // ≥ doc tokens × rows
    val joinEst = CostEstimator.estimateJoin(docs, docs.limit(10), "does {text} match {text}",
      FakeLM(FakeBehavior.Echo))
    assert(joinEst.calls == 1000)
  }

  test("GEPA-lite climbs to the instruction that maximizes eval") {
    val docs = (0 until 50).map(i =>
      (i.toLong, if (i % 2 == 0) s"row $i has a delay" else s"row $i is fine"))
      .toDF("id", "text")
    val expected = (0 until 50).filter(_ % 2 == 0).map(_.toLong).toSet

    def evalFn(out: DataFrame): Double = {
      val got = out.select("id").as[Long].collect().toSet
      val tp = (got & expected).size.toDouble
      val fp = (got -- expected).size.toDouble
      val fn = (expected -- got).size.toDouble
      if (tp == 0) 0.0 else 2 * tp / (2 * tp + fp + fn) // F1
    }

    // The filter fake keys on the quoted word in the claim; the rewriter
    // proposes a wrong and a right variant — the loop must pick the right one.
    val rewriter = FakeLM(FakeBehavior.Scripted(Seq(
      "the {text} mentions the word 'zebra'\nthe {text} mentions the word 'delay'")))
    val plan = SemPlan(Seq(SemFilterOp("the {text} mentions the word 'banana'")))

    val result = Sem.withLM(FakeLM(FakeBehavior.ClaimWordFilter)) {
      GepaLite.optimize(plan, docs, evalFn, rewriter, rounds = 1)
    }
    assert(result.score == 1.0)
    assert(result.plan.ops.head.asInstanceOf[SemFilterOp].instr.contains("'delay'"))
    assert(result.evaluations >= 3)
  }

  test("evolutionary GEPA jointly optimizes multiple instructions") {
    import graft.plan.Gepa
    // Docs where the true pipeline needs BOTH filters fixed: keep rows that
    // mention 'delay' AND 'urgent'.
    val docs = (0 until 60).map { i =>
      val words = new StringBuilder(s"row $i")
      if (i % 2 == 0) words ++= " delay"
      if (i % 3 == 0) words ++= " urgent"
      (i.toLong, words.toString)
    }.toDF("id", "text")
    val expected = (0 until 60).filter(i => i % 2 == 0 && i % 3 == 0).map(_.toLong).toSet

    def evalFn(out: DataFrame): Double = {
      val got = out.select("id").as[Long].collect().toSet
      val tp = (got & expected).size.toDouble
      val fp = (got -- expected).size.toDouble
      val fn = (expected -- got).size.toDouble
      if (tp == 0) 0.0 else 2 * tp / (2 * tp + fp + fn)
    }

    // Every reflection proposes the two useful rewrites; the evolutionary
    // loop must route them to the right parameter slots.
    val rewriter = FakeLM(FakeBehavior.Scripted(Seq(
      "the {text} mentions the word 'delay'\nthe {text} mentions the word 'urgent'")))
    val plan = SemPlan(Seq(
      SemFilterOp("the {text} mentions the word 'banana'"),
      SemFilterOp("the {text} mentions the word 'zebra'")))

    val result = Sem.withLM(FakeLM(FakeBehavior.ClaimWordFilter)) {
      Gepa.optimize(plan, docs, evalFn, rewriter,
        Gepa.Config(populationSize = 4, maxEvals = 20, mutationsPerStep = 2))
    }
    assert(result.score == 1.0, result.history.map(_._2).mkString(","))
    val instrs = result.plan.ops.collect { case SemFilterOp(i, _) => i }
    assert(instrs.exists(_.contains("'delay'")) && instrs.exists(_.contains("'urgent'")))
    assert(result.evaluations <= 20)
  }

  test("GEPA optimizes nested sub-plan parameters of a join-bearing plan") {
    import graft.plan.{Gepa, SemJoinOp}
    // The top-level join instruction AND the right side's nested filter both
    // start wrong; GEPA must address them by nested path ("0" and
    // "0.right.0") and route the rewriter's proposals to the right slot via
    // each slot's required column set.
    val docs = (0 until 20).map(i =>
      (i.toLong, if (i % 2 == 0) s"row $i urgent" else s"row $i"))
      .toDF("id", "text")
    val kws = Seq(Tuple1("delay"), Tuple1("zebra")).toDF("word")
    val expected = (0 until 20).filter(_ % 2 == 0).map(i => (i.toLong, "delay")).toSet

    def evalFn(out: DataFrame): Double = {
      val got = out.select("id", "word").as[(Long, String)].collect().toSet
      val tp = (got & expected).size.toDouble
      val fp = (got -- expected).size.toDouble
      val fn = (expected -- got).size.toDouble
      if (tp == 0) 0.0 else 2 * tp / (2 * tp + fp + fn)
    }

    // First proposal has cols {text, word} → only fits the join slot;
    // second has {word} → only fits the nested filter slot.
    val rewriter = FakeLM(FakeBehavior.Scripted(Seq(
      "both {text} and {word} relate to 'urgent'\nthe {word} mentions the word 'delay'")))
    val plan = SemPlan(Seq(SemJoinOp(
      "both {text} and {word} relate to 'banana'", "kw",
      rightPlan = SemPlan(Seq(SemFilterOp("the {word} mentions the word 'banana'"))))))
    assert(Gepa.collectTargets(plan).map(_._1) == Seq("0", "0.right.0"))

    val result = Sem.withLM(FakeLM(FakeBehavior.ClaimWordFilter)) {
      Gepa.optimize(plan, docs, evalFn, rewriter,
        Gepa.Config(populationSize = 4, maxEvals = 24, mutationsPerStep = 2),
        frames = Map("kw" -> kws))
    }
    assert(result.score == 1.0, result.history.map(h => (h._1, h._2)).mkString("\n"))
    val join = result.plan.ops.head.asInstanceOf[SemJoinOp]
    assert(join.instr.contains("'urgent'"))
    assert(join.rightPlan.ops.head.asInstanceOf[SemFilterOp].instr.contains("'delay'"))
  }

  test("join-bearing plans serialize round-trip with nested sub-plans") {
    import graft.plan.{SemJoinOp, SemMapOp}
    val plan = SemPlan(Seq(
      SemMapOp("summarize {text}", "_sum"),
      SemJoinOp("the {text} matches {word}", "kw",
        rightPlan = SemPlan(Seq(SemFilterOp("keep useful {word}", default = false))))))
    assert(SemPlan.fromJson(plan.toJson) == plan)
  }
}
