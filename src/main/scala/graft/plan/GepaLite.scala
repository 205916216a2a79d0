package graft.plan

import org.apache.spark.sql.DataFrame
import graft.core.NLExpr
import graft.llm.{ChatMessage, LMClient, LMRequest}

/** Prompt optimization (a pragmatic take on the reference's GEPA optimizer,
  * lotus/ast/optimizer/gepa_optimizer.py): LLM-guided coordinate ascent over
  * the plan's instruction parameters. Each round asks the rewriter model for
  * candidate rewrites of one semantic op's instruction, evaluates each
  * candidate pipeline on the training frame (`evalFn`, higher is better),
  * and keeps the best. Candidates that drop the original `{col}`
  * placeholders are rejected.
  *
  * The loop runs on the driver; every evaluation is a distributed run of the
  * candidate plan — the same shape as the reference's optimizer, where
  * eval_fn re-executes the pipeline.
  */
object GepaLite {

  final case class Result(plan: SemPlan, score: Double, evaluations: Int)

  private def instructionOf(op: SemOp): Option[String] = op match {
    case SemFilterOp(i, _)          => Some(i)
    case SemMapOp(i, _)             => Some(i)
    case SemFilterCascadeOp(i, _, _) => Some(i)
    case _                          => None
  }

  private def withInstruction(op: SemOp, instr: String): SemOp = op match {
    case o: SemFilterOp          => o.copy(instr = instr)
    case o: SemMapOp             => o.copy(instr = instr)
    case o: SemFilterCascadeOp   => o.copy(instr = instr)
    case o                       => o
  }

  private def proposeRewrites(rewriter: LMClient, instr: String, n: Int,
      feedback: String): Seq[String] = {
    val sys = "You improve natural-language instructions for data-processing operators. " +
      "Keep every {column} placeholder exactly as written. Reply with ONE improved " +
      "instruction per line, nothing else."
    val user = s"Current instruction:\n$instr\n\n$feedback\nPropose $n improved variants."
    val res = rewriter.complete(Seq(LMRequest(Seq(
      ChatMessage("system", sys), ChatMessage("user", user))))).head
    res.output.split("\n").map(_.trim).filter(_.nonEmpty).take(n).toSeq
  }

  def optimize(
      plan: SemPlan,
      train: DataFrame,
      evalFn: DataFrame => Double,
      rewriter: LMClient,
      rounds: Int = 2,
      candidatesPerRound: Int = 3
  ): Result = {
    var best = plan
    var bestScore = evalFn(best.run(train))
    var evals = 1
    for (_ <- 0 until rounds) {
      best.ops.zipWithIndex.foreach { case (op, i) =>
        instructionOf(op).foreach { current =>
          val requiredCols = NLExpr.parse(current).cols.toSet
          val feedback = f"Its pipeline currently scores $bestScore%.3f on the training data."
          val candidates = proposeRewrites(rewriter, current, candidatesPerRound, feedback)
            .filter { c =>
              scala.util.Try(NLExpr.parse(c).cols.toSet).toOption.contains(requiredCols)
            }
          candidates.foreach { cand =>
            val candPlan = SemPlan(best.ops.updated(i, withInstruction(op, cand)))
            val score = scala.util.Try(evalFn(candPlan.run(train))).getOrElse(Double.NegativeInfinity)
            evals += 1
            if (score > bestScore) { bestScore = score; best = candPlan }
          }
        }
      }
    }
    Result(best, bestScore, evals)
  }
}
