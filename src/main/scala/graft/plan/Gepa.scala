package graft.plan

import org.apache.spark.sql.DataFrame
import graft.core.NLExpr
import graft.llm.{ChatMessage, LMClient, LMRequest}

/** Evolutionary GEPA prompt optimization (reference GEPAOptimizer,
  * lotus/ast/optimizer/gepa_optimizer.py:249-368, which delegates the search
  * loop to the published GEPA algorithm — arXiv 2507.19457: population of
  * candidates, reflective LLM mutation with score feedback, crossover, and
  * held-out selection). [[GepaLite]] remains the cheap coordinate-ascent
  * variant; this is the full population-based search.
  *
  * A candidate is a joint assignment of ALL optimizable instruction
  * parameters in the plan (multi-parameter, like the reference's
  * seed_candidate dict). Every evaluation is a distributed run of the
  * candidate plan over the training frame.
  */
object Gepa {

  final case class Config(
      populationSize: Int = 4,
      maxEvals: Int = 16,
      mutationsPerStep: Int = 2,
      /** Probability of a crossover step (merge two parents' parameters)
        * instead of a mutation step; only meaningful with ≥2 targets. */
      crossoverProb: Double = 0.25,
      seed: Long = 42,
      /** Natural-language goal for the reflection LLM; auto-derived from the
        * plan when empty (reference objective/background). */
      objective: String = "",
      background: String = "")

  final case class Result(plan: SemPlan, score: Double, evaluations: Int,
      history: Seq[(Map[String, String], Double)])

  private def instructionOf(op: SemOp): Option[String] = op match {
    case SemFilterOp(i, _)           => Some(i)
    case SemMapOp(i, _)              => Some(i)
    case SemFilterCascadeOp(i, _, _) => Some(i)
    case SemJoinOp(i, _, _)          => Some(i)
    case _                           => None
  }

  private def withInstruction(op: SemOp, instr: String): SemOp = op match {
    case o: SemFilterOp        => o.copy(instr = instr)
    case o: SemMapOp           => o.copy(instr = instr)
    case o: SemFilterCascadeOp => o.copy(instr = instr)
    case o: SemJoinOp          => o.copy(instr = instr)
    case o                     => o
  }

  /** Optimizable parameters addressed by NESTED path — "2" is the third op
    * of the top-level plan, "2.right.0" the first op of that join's
    * right-side sub-plan (reference nested-node parameter paths,
    * lotus/ast/nodes.py:88-292). Returns (path, current instruction).
    */
  private[graft] def collectTargets(plan: SemPlan,
      prefix: String = ""): Seq[(String, String)] =
    plan.ops.zipWithIndex.flatMap { case (op, i) =>
      instructionOf(op).map(instr => s"$prefix$i" -> instr).toSeq ++ (op match {
        case j: SemJoinOp => collectTargets(j.rightPlan, s"$prefix$i.right.")
        case _            => Nil
      })
    }

  private[plan] def applyCandidate(plan: SemPlan, cand: Map[String, String],
      prefix: String = ""): SemPlan =
    SemPlan(plan.ops.zipWithIndex.map { case (op, i) =>
      val path = s"$prefix$i"
      val reinstructed = cand.get(path).map(withInstruction(op, _)).getOrElse(op)
      reinstructed match {
        case j: SemJoinOp =>
          j.copy(rightPlan = applyCandidate(j.rightPlan, cand, s"$path.right."))
        case o => o
      }
    })

  private def reflect(rewriter: LMClient, instr: String, n: Int, score: Double,
      bestScore: Double, objective: String, background: String): Seq[String] = {
    val sys = "You improve natural-language instructions for data-processing operators. " +
      "Keep every {column} placeholder exactly as written. Reply with ONE improved " +
      "instruction per line, nothing else."
    val user =
      s"""Objective: $objective
         |$background
         |Current instruction:
         |$instr
         |
         |This candidate scores ${f"$score%.3f"}; the best candidate so far scores ${f"$bestScore%.3f"}.
         |Reflect on why the instruction may under-perform and propose $n improved variants.""".stripMargin
    val res = rewriter.complete(Seq(LMRequest(Seq(
      ChatMessage("system", sys), ChatMessage("user", user))))).head
    res.output.split("\n").map(_.trim).filter(_.nonEmpty).take(n).toSeq
  }

  def optimize(
      plan: SemPlan,
      train: DataFrame,
      evalFn: DataFrame => Double,
      rewriter: LMClient,
      config: Config = Config(),
      valset: Option[DataFrame] = None,
      /** Named right-side frames for join-bearing plans (run(df, frames)). */
      frames: Map[String, DataFrame] = Map.empty
  ): Result = {
    val targetInstrs: Seq[(String, String)] = collectTargets(plan)
    val targets: Seq[String] = targetInstrs.map(_._1)
    if (targets.isEmpty) return Result(plan, evalFn(plan.run(train, frames)), 1, Nil)

    val requiredCols: Map[String, Set[String]] = targetInstrs.map { case (p, instr) =>
      p -> NLExpr.parse(instr).cols.toSet
    }.toMap
    val objective =
      if (config.objective.nonEmpty) config.objective
      else "Maximize the pipeline's evaluation score on the training data."
    val background =
      if (config.background.nonEmpty) config.background
      else s"The pipeline is a chain of ${plan.ops.length} dataframe operators; " +
        s"${targets.length} of them are LLM-instructed semantic operators."

    val rng = new scala.util.Random(config.seed)
    def score(cand: Map[String, String]): Double =
      scala.util.Try(evalFn(applyCandidate(plan, cand).run(train, frames)))
        .getOrElse(Double.NegativeInfinity)

    val seedCand: Map[String, String] = targetInstrs.toMap
    var evals = 0
    val history = scala.collection.mutable.ArrayBuffer.empty[(Map[String, String], Double)]
    def evaluate(c: Map[String, String]): Double = {
      val s = score(c); evals += 1; history += ((c, s)); s
    }

    var pop: Vector[(Map[String, String], Double)] = Vector((seedCand, evaluate(seedCand)))

    // Steps are bounded independently of evals: a run of filtered-out or
    // duplicate children must not spin the reflection LLM forever.
    var steps = 0
    while (evals < config.maxEvals && steps < config.maxEvals * 4) {
      steps += 1
      val best = pop.maxBy(_._2)._2
      // Rank-weighted parent selection from the surviving population.
      def pick(): (Map[String, String], Double) = {
        val sorted = pop.sortBy(-_._2)
        val idx = math.min(sorted.length - 1,
          (math.pow(rng.nextDouble(), 2) * sorted.length).toInt) // biased to top
        sorted(idx)
      }
      val children: Seq[Map[String, String]] =
        if (targets.length >= 2 && pop.length >= 2 && rng.nextDouble() < config.crossoverProb) {
          // Crossover: each parameter from a random parent of two.
          val a = pick()._1
          val b = pick()._1
          Seq(targets.map(i => i -> (if (rng.nextBoolean()) a(i) else b(i))).toMap)
        } else {
          // Reflective mutation of ONE parameter of one parent.
          val (parent, pScore) = pick()
          val t = targets(rng.nextInt(targets.length))
          reflect(rewriter, parent(t), config.mutationsPerStep, pScore, best,
            objective, background)
            .filter(c => scala.util.Try(NLExpr.parse(c).cols.toSet).toOption
              .contains(requiredCols(t)))
            .map(c => parent.updated(t, c))
        }
      children.filterNot(c => pop.exists(_._1 == c))
        .take(math.max(0, config.maxEvals - evals))
        .foreach { c => pop :+= ((c, evaluate(c))) }
      pop = pop.sortBy(-_._2).take(config.populationSize)
    }
    finish(plan, pop, valset, evalFn, evals, history.toSeq, frames)
  }

  /** Final selection: best on the held-out valset when provided (reference
    * GEPA generalization mode), else best on train.
    */
  private def finish(plan: SemPlan, pop: Vector[(Map[String, String], Double)],
      valset: Option[DataFrame], evalFn: DataFrame => Double, evals: Int,
      history: Seq[(Map[String, String], Double)],
      frames: Map[String, DataFrame]): Result = {
    val (bestCand, bestScore) = valset match {
      case Some(v) =>
        pop.map { case (c, _) =>
          c -> scala.util.Try(evalFn(applyCandidate(plan, c).run(v, frames)))
            .getOrElse(Double.NegativeInfinity)
        }.maxBy(_._2)
      case None => pop.maxBy(_._2)
    }
    Result(applyCandidate(plan, bestCand), bestScore, evals, history)
  }
}
