package graft.agentic

import org.apache.spark.sql.Dataset

/** Execution plan for an agentic pipeline
  * (reference lotus/agentic/planner.py:28-47).
  */
final case class AgentPlan(
    ops: Seq[String] = Seq("map", "reduce"),
    instructions: Map[String, String] = Map.empty,
    strategies: Map[String, String] = Map.empty,
    contexts: Map[String, String] = Map.empty,
    shardSize: Int = 1,
    parallelism: Int = 4)

/** Plan derivation: one LLM planning call with corpus sample + stats, with a
  * heuristic fallback (reference planner.py:146-197). The planner runs on
  * the driver; the plan is then executed distributed.
  */
object Planner {

  def heuristicInstruction(op: String, task: String): String = op match {
    case "map"    => s"For each unit, extract the information relevant to: $task"
    case "filter" => s"Keep only units relevant to: $task"
    case "reduce" => s"Combine the findings into a single answer to: $task"
    case other    => task
  }

  def heuristicPlan(task: String, ops: Seq[String],
      overrides: Map[String, String] = Map.empty, parallelismCap: Int = 8): AgentPlan = {
    Ops.validate(ops)
    AgentPlan(
      ops = ops,
      instructions = ops.map(op => op -> overrides.getOrElse(op, heuristicInstruction(op, task))).toMap,
      shardSize = 1,
      parallelism = math.min(4, parallelismCap))
  }

  /** LLM planning with heuristic fallback. The completer is asked for a JSON
    * draft; any parse failure (or missing fields) falls back per-op.
    */
  def derivePlan(task: String, corpus: Dataset[CorpusUnit], ops: Seq[String],
      completer: Option[Completer] = None,
      overrides: Map[String, String] = Map.empty,
      parallelismCap: Int = 8): AgentPlan = {
    val base = heuristicPlan(task, ops, overrides, parallelismCap)
    if (ops.forall(overrides.contains) || completer.isEmpty) return base

    val sample = corpus.limit(3).collect().map(_.content.take(500)).mkString("\n---\n")
    val n = corpus.count()
    val prompt =
      s"TASK:\n$task\n\nCORPUS STATS: {units: $n}\n\nCORPUS SAMPLE:\n$sample\n\n" +
        "Reply with a JSON object: {\"map_instruction\": str|null, \"filter_instruction\": " +
        "str|null, \"reduce_instruction\": str|null, \"shard_size\": int, \"parallelism\": int}"
    try {
      val resp = completer.get.complete(Seq(
        "system" -> "You derive concrete per-op instructions for a corpus map-reduce pipeline.",
        "user" -> prompt), toolsEnabled = false)
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val json = "\\{[\\s\\S]*\\}".r.findFirstIn(resp.content)
        .getOrElse(throw new RuntimeException("no JSON"))
      val node = mapper.readTree(json)
      val instrs = ops.map { op =>
        val derived = Option(node.path(s"${op}_instruction").asText(null)).filter(_.nonEmpty)
        op -> overrides.getOrElse(op, derived.getOrElse(heuristicInstruction(op, task)))
      }.toMap
      base.copy(
        instructions = instrs,
        shardSize = math.max(1, node.path("shard_size").asInt(1)),
        parallelism = math.max(1, math.min(node.path("parallelism").asInt(4), parallelismCap)))
    } catch { case _: Exception => base }
  }

  /** Full pipeline: plan → fold ops over the corpus → result.
    * (reference Corpus.agent, corpus/__init__.py:87-97)
    */
  def runAgentPipeline(corpus: Dataset[CorpusUnit], task: String,
      ops: Seq[String], completer: Completer, tools: Seq[AgentTool] = Nil,
      planner: Option[Completer] = None): AgentPipelineResult = {
    val plan = derivePlan(task, corpus, ops, planner.orElse(Some(completer)))
    var cur = corpus
    var reduced: Option[String] = None
    plan.ops.foreach {
      case "map" =>
        cur = Pipeline.agenticMap(cur, plan.instructions("map"), completer, tools,
          shardSize = plan.shardSize, context = plan.contexts.get("map"))
      case "filter" =>
        cur = Pipeline.agenticFilter(cur, plan.instructions("filter"), completer, tools,
          shardSize = plan.shardSize, context = plan.contexts.get("filter"))
      case "reduce" =>
        reduced = Some(Pipeline.agenticReduce(cur, plan.instructions("reduce"), completer, tools))
    }
    AgentPipelineResult(plan, cur, reduced)
  }
}

final case class AgentPipelineResult(
    plan: AgentPlan,
    corpus: Dataset[CorpusUnit],
    output: Option[String])
