package graft.agentic

import org.apache.spark.sql.Dataset

/** Agentic map/filter/reduce over a corpus
  * (reference lotus/agentic/pipeline.py:90-440, lotus/agentic/ops.py:17-69).
  *
  * Spark shape: shards are partition-local groups of `shardSize` units; one
  * agent (tool loop) runs per shard inside the executor task — the
  * reference's ThreadPoolExecutor parallelism becomes Spark task parallelism.
  * `reduce` is terminal: findings are short texts, collected to the driver
  * for a single aggregating agent (bounded state, as in the reference).
  */
object Pipeline {

  val MapSystem = "You are a careful analyst. Follow the instruction precisely."
  val FilterSystem = "You are a careful analyst deciding which units to keep."
  val ReduceSystem = "You aggregate per-shard findings into one final answer."

  private val BatchMapSuffix =
    "\n\nThe shard contains MULTIPLE units, each marked '[unit <id>]'. Use the other units " +
      "as context, but produce the requested output for EACH unit. End your reply with a " +
      "single JSON array on its own line: [{\"id\": \"<id>\", \"output\": \"<result>\"}, ...] with " +
      "exactly one entry per unit id."
  private val BatchFilterSuffix =
    "\n\nThe shard contains MULTIPLE units, each marked '[unit <id>]'. Use the other units " +
      "as context, but decide KEEP or DROP for EACH unit. End your reply with a single JSON " +
      "array on its own line: [{\"id\": \"<id>\", \"keep\": true|false}, ...] with exactly one " +
      "entry per unit id."
  private val FilterSingleSuffix =
    "\n\nEnd your reply with a line 'VERDICT: KEEP' or 'VERDICT: DROP'."

  def shardContent(shard: Seq[CorpusUnit]): String =
    shard.map(u => s"[unit ${u.id}]\n${u.content}").mkString("\n\n")

  def opUserContent(kind: String, instruction: String, shard: Seq[CorpusUnit],
      context: Option[String], batched: Boolean): String = {
    val parts = Seq(s"INSTRUCTION:\n$instruction") ++
      context.map(c => s"SHARED CONTEXT:\n$c") :+ s"SHARD:\n${shardContent(shard)}"
    val body = parts.mkString("\n\n")
    if (batched) body + (if (kind == "filter") BatchFilterSuffix else BatchMapSuffix)
    else if (kind == "filter") body + FilterSingleSuffix
    else body
  }

  /** KEEP/DROP verdict parse, defaulting to KEEP (never silently drop). */
  def parseVerdict(text: String): Boolean = {
    val m = "(?i)VERDICT:\\s*(KEEP|DROP)".r.findFirstMatchIn(Option(text).getOrElse(""))
    m match {
      case Some(g) => g.group(1).equalsIgnoreCase("KEEP")
      case None =>
        val u = Option(text).getOrElse("").toUpperCase
        if (u.contains("DROP") && !u.contains("KEEP")) false
        else true
    }
  }

  /** Parse a batched agent's per-unit JSON array → id → result text. */
  def parseBatched(text: String, kind: String): Map[String, String] = {
    val m = "\\[[\\s\\S]*\\]".r.findFirstIn(Option(text).getOrElse("")).getOrElse(return Map.empty)
    try {
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val arr = mapper.readTree(m)
      if (!arr.isArray) return Map.empty
      (0 until arr.size()).flatMap { i =>
        val e = arr.get(i)
        if (!e.isObject || !e.has("id")) None
        else {
          val id = e.get("id").asText()
          val v =
            if (kind == "filter") { if (e.path("keep").asBoolean(false)) "VERDICT: KEEP" else "VERDICT: DROP" }
            else e.path("output").asText("")
          Some(id -> v)
        }
      }.toMap
    } catch { case _: Exception => Map.empty }
  }

  private def runShard(completer: Completer, tools: Seq[AgentTool], system: String,
      kind: String, instruction: String, shard: Seq[CorpusUnit],
      context: Option[String], maxSteps: Int): Seq[(CorpusUnit, String)] = {
    val batched = shard.length > 1
    val res = AgentLoop.run(completer, tools, system,
      opUserContent(kind, instruction, shard, context, batched), maxSteps)
    if (!batched) Seq(shard.head -> res.output)
    else {
      val parsed = parseBatched(res.output, kind)
      shard.map { u =>
        u -> parsed.getOrElse(u.id,
          if (kind == "filter") "VERDICT: KEEP" else u.content)
      }
    }
  }

  /** agentic map: each unit transformed by an agent; one agent per shard. */
  def agenticMap(ds: Dataset[CorpusUnit], instruction: String, completer: Completer,
      tools: Seq[AgentTool] = Nil, shardSize: Int = 1, context: Option[String] = None,
      maxSteps: Int = 6, system: String = MapSystem): Dataset[CorpusUnit] = {
    val spark = ds.sparkSession
    import spark.implicits._
    val size = math.max(1, shardSize)
    ds.mapPartitions { iter =>
      iter.grouped(size).flatMap { shard =>
        runShard(completer, tools, system, "map", instruction, shard, context, maxSteps)
          .map { case (u, r) =>
            CorpusUnit(u.id, r, Map("op" -> "map", "source_id" -> u.id))
          }
      }
    }
  }

  /** agentic filter: map-to-verdict then keep (KEEP default on parse failure). */
  def agenticFilter(ds: Dataset[CorpusUnit], instruction: String, completer: Completer,
      tools: Seq[AgentTool] = Nil, shardSize: Int = 1, context: Option[String] = None,
      maxSteps: Int = 6): Dataset[CorpusUnit] = {
    val spark = ds.sparkSession
    import spark.implicits._
    val size = math.max(1, shardSize)
    ds.mapPartitions { iter =>
      iter.grouped(size).flatMap { shard =>
        runShard(completer, tools, FilterSystem, "filter", instruction, shard, context, maxSteps)
          .filter { case (_, r) => parseVerdict(r) }
          .map(_._1)
      }
    }
  }

  /** agentic reduce (terminal): one agent over all current units' findings.
    * Findings are short per-shard texts — bounded driver state. For corpora
    * whose findings exceed driver memory, pre-fold with semAgg first.
    * Findings are joined in unit-id order, so the reduce prompt is a pure
    * function of the unit multiset — independent of partition layout (the
    * reference's sequential shard order, reconstructed deterministically).
    */
  def agenticReduce(ds: Dataset[CorpusUnit], instruction: String, completer: Completer,
      tools: Seq[AgentTool] = Nil, maxSteps: Int = 6): String = {
    val units = ds.collect().sortBy(_.id)
    val joined = units.zipWithIndex
      .map { case (u, i) => s"[shard $i]\n${u.content}" }.mkString("\n\n")
    AgentLoop.run(completer, tools, ReduceSystem,
      s"INSTRUCTION:\n$instruction\n\nPER-SHARD FINDINGS:\n$joined", maxSteps).output
  }
}

/** Op algebra validation (reference lotus/agentic/ops.py): map/filter chain,
  * reduce terminal.
  */
object Ops {
  val Valid = Set("map", "filter", "reduce")
  def validate(ops: Seq[String]): Unit = {
    require(ops.nonEmpty, "ops must be non-empty")
    ops.foreach(o => require(Valid(o), s"unknown op: $o"))
    val reduceIdx = ops.indexOf("reduce")
    require(reduceIdx == -1 || reduceIdx == ops.length - 1, "reduce must be terminal")
  }
}
