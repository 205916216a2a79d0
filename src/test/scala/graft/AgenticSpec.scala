package graft

import graft.agentic._

/** Deterministic completers, mirroring the reference's ScriptedCompleter
  * pattern (tests/test_agentic_map_reduce.py:20-35,119-135).
  */
object FakeCompleters {

  /** Parses `[unit <id>]\n<content>` blocks from the last user message. */
  def parseUnits(user: String): Seq[(String, String)] =
    "\\[unit ([^\\]]+)\\]\\n([^\\n]*)".r.findAllMatchIn(user)
      .map(m => (m.group(1), m.group(2))).toSeq

  /** Map agent: uppercases each unit's first line; batched shards get the
    * per-unit JSON array protocol.
    */
  case object UppercaseMapper extends Completer {
    def complete(messages: Seq[(String, String)], toolsEnabled: Boolean): AgentStep = {
      val user = messages.reverse.find(_._1 == "user").map(_._2).getOrElse("")
      val units = parseUnits(user)
      if (units.length <= 1) AgentStep(units.headOption.map(_._2.toUpperCase).getOrElse(""))
      else AgentStep(units.map { case (id, c) =>
        s"""{"id": "$id", "output": "${c.toUpperCase}"}"""
      }.mkString("[", ", ", "]"))
    }
  }

  /** Filter agent: KEEP iff the unit mentions `keyword`. */
  final case class KeywordKeeper(keyword: String) extends Completer {
    def complete(messages: Seq[(String, String)], toolsEnabled: Boolean): AgentStep = {
      val user = messages.reverse.find(_._1 == "user").map(_._2).getOrElse("")
      val units = parseUnits(user)
      if (units.length <= 1) {
        val keep = units.headOption.exists(_._2.contains(keyword))
        AgentStep(if (keep) "VERDICT: KEEP" else "VERDICT: DROP")
      } else AgentStep(units.map { case (id, c) =>
        s"""{"id": "$id", "keep": ${c.contains(keyword)}}"""
      }.mkString("[", ", ", "]"))
    }
  }

  /** Reduce agent: concatenates shard findings with '|'. */
  case object ConcatReducer extends Completer {
    def complete(messages: Seq[(String, String)], toolsEnabled: Boolean): AgentStep = {
      val user = messages.reverse.find(_._1 == "user").map(_._2).getOrElse("")
      val findings = "\\[shard \\d+\\]\\n([^\\n]*)".r.findAllMatchIn(user).map(_.group(1)).toSeq
      AgentStep(findings.mkString("|"))
    }
  }

  /** Tool-using agent: first turn calls the python REPL, second turn answers
    * with the tool result it saw.
    */
  case object ReplUser extends Completer {
    def complete(messages: Seq[(String, String)], toolsEnabled: Boolean): AgentStep = {
      val sawTool = messages.exists(_._1 == "tool")
      if (!sawTool && toolsEnabled)
        AgentStep("", Seq(ToolCall("1", "python_repl", """{"code": "print(6*7)"}""")))
      else {
        val toolOut = messages.filter(_._1 == "tool").map(_._2).lastOption.getOrElse("")
        AgentStep(s"The result is ${toolOut.replaceAll("[^0-9]", "")}")
      }
    }
  }
}

class AgenticSpec extends SparkSpec {

  test("Corpus.fromText assigns sequential ids") {
    val ds = Corpus.fromText(spark, Seq("alpha", "beta"))
    assert(ds.collect().map(u => (u.id, u.content)).toSeq ==
      Seq(("0", "alpha"), ("1", "beta")))
  }

  test("Corpus.fromDataFrame renders col: value lines") {
    import spark.implicits._
    val ds = Corpus.fromDataFrame(Seq((1, "x")).toDF("a", "b"), idCol = Some("a"))
    val u = ds.collect().head
    assert(u.id == "1")
    assert(u.content == "a: 1\nb: x")
  }

  test("agenticMap per-unit transforms every unit") {
    val ds = Corpus.fromText(spark, Seq("hello", "world"))
    val out = Pipeline.agenticMap(ds, "uppercase", FakeCompleters.UppercaseMapper)
    assert(out.collect().map(_.content).toSet == Set("HELLO", "WORLD"))
  }

  test("agenticMap batched shards use the per-unit JSON protocol") {
    val ds = Corpus.fromText(spark, (0 until 6).map(i => s"text$i")).repartition(1)
    val out = Pipeline.agenticMap(ds, "uppercase", FakeCompleters.UppercaseMapper, shardSize = 3)
    assert(out.collect().map(_.content).toSet == (0 until 6).map(i => s"TEXT$i").toSet)
  }

  test("agenticFilter keeps matching units, defaults KEEP on garbage") {
    val ds = Corpus.fromText(spark, Seq("keep me: spark", "drop me", "spark again"))
    val out = Pipeline.agenticFilter(ds, "mentions spark", FakeCompleters.KeywordKeeper("spark"))
    assert(out.collect().map(_.content).toSet == Set("keep me: spark", "spark again"))
    // Garbage verdicts default to KEEP (never silently drop).
    assert(Pipeline.parseVerdict("no verdict here"))
    assert(!Pipeline.parseVerdict("VERDICT: DROP"))
  }

  test("agenticReduce aggregates all findings in one driver call") {
    val ds = Corpus.fromText(spark, Seq("a", "b", "c"))
    val out = Pipeline.agenticReduce(ds, "concat", FakeCompleters.ConcatReducer)
    assert(out == "a|b|c")
  }

  test("agent loop executes tools and feeds results back") {
    val res = AgentLoop.run(FakeCompleters.ReplUser, Seq(PythonReplTool()),
      "system", "compute 6*7")
    assert(res.output == "The result is 42")
    assert(res.trace.nonEmpty && res.trace.head._1 == "python_repl")
    assert(!res.truncated)
  }

  test("docker repl builds a sandboxed argv and runs through the agent loop") {
    // Hermetic: the runner is injected (no daemon in this env) — the spec
    // pins the sandbox argv contract and the loop integration.
    var seen: Seq[String] = Nil
    val tool = DockerReplTool()(runner = argv => {
      seen = argv
      (0, "42\n")
    })
    val cmd = tool.command("print(6*7)")
    assert(cmd.take(5) == Seq("docker", "run", "--rm", "-i", "--network=none"), cmd)
    assert(cmd.contains("--memory=512m") && cmd.contains("--cpus=1"))
    assert(cmd.exists(_.startsWith("--name=")), "container must be named for kill-on-timeout")
    assert(cmd.takeRight(3) == Seq("python3", "-c", "print(6*7)"), "code via argv, never a shell")
    val res = AgentLoop.run(FakeCompleters.ReplUser, Seq(tool), "system", "compute 6*7")
    assert(res.output == "The result is 42")
    assert(seen.nonEmpty && seen.head == "docker", "loop must execute through the runner")
  }

  test("docker repl surfaces runner failures instead of fabricating output") {
    val tool = DockerReplTool()(runner = _ => (125, ""))
    assert(tool.run("""{"code":"print(1)"}""") == "ERROR: docker exited 125")
    val errTool = DockerReplTool()(runner = _ => (1, "Cannot connect to the Docker daemon"))
    assert(errTool.run("""{"code":"print(1)"}""").contains("Cannot connect"))
  }

  test("docker repl kills the named container when the runner times out") {
    var killed: Seq[String] = Nil
    val tool = DockerReplTool()(runner = argv =>
      if (argv.take(2) == Seq("docker", "kill")) { killed = argv; (0, "") }
      else (DockerReplTool.TimeoutExit, "ERROR: timeout after 30s"))
    val out = tool.run("""{"code":"while True: pass"}""")
    assert(out.startsWith("ERROR: timeout"), out)
    assert(killed.size == 3 && killed(2).startsWith("graft-repl-"),
      s"timeout must docker-kill the named container: $killed")
  }

  test("a container exiting 124 is not mistaken for a timeout") {
    // docker run propagates the container's exit status; 124 from the
    // agent's own code must surface as an exit, not trigger a spurious kill.
    var killed = false
    val tool = DockerReplTool()(runner = argv =>
      if (argv.take(2) == Seq("docker", "kill")) { killed = true; (0, "") }
      else (124, ""))
    assert(tool.run("""{"code":"import sys; sys.exit(124)"}""") == "ERROR: docker exited 124")
    assert(!killed, "a real 124 exit must not be treated as a timeout")
  }

  test("subprocess runner times out on a child that never closes stdout") {
    // The exact sandbox-escape-by-hanging case: an infinite loop with the
    // pipe held open must return the timeout error, not block forever.
    val (exit, out) = DockerReplTool.processRunner(2)(
      Seq("python3", "-c", "import time\nwhile True: time.sleep(1)"))
    assert(exit == DockerReplTool.TimeoutExit && out.contains("timeout"), s"$exit $out")
  }

  test("agent loop forces a final answer at max steps") {
    // A completer that always wants tools: loop must truncate and force text.
    val loopy = new Completer {
      def complete(messages: Seq[(String, String)], toolsEnabled: Boolean): AgentStep =
        if (toolsEnabled) AgentStep("", Seq(ToolCall("1", "python_repl", """{"code":"print(1)"}""")))
        else AgentStep("forced final")
    }
    val res = AgentLoop.run(loopy, Seq(PythonReplTool()), "s", "u", maxSteps = 2)
    assert(res.output == "forced final")
    assert(res.truncated)
  }

  test("ops algebra: reduce must be terminal") {
    Ops.validate(Seq("map", "filter", "reduce"))
    assertThrows[IllegalArgumentException](Ops.validate(Seq("reduce", "map")))
    assertThrows[IllegalArgumentException](Ops.validate(Seq("explode")))
  }

  test("planner heuristic fallback fills instructions") {
    val ds = Corpus.fromText(spark, Seq("x"))
    val plan = Planner.derivePlan("find bugs", ds, Seq("map", "reduce"), completer = None)
    assert(plan.instructions("map").contains("find bugs"))
    assert(plan.instructions("reduce").contains("find bugs"))
  }

  test("full pipeline: map then reduce") {
    val ds = Corpus.fromText(spark, Seq("aa", "bb"))
    val res = Planner.runAgentPipeline(ds, "upper-concat", Seq("map", "reduce"),
      completer = new Completer {
        def complete(messages: Seq[(String, String)], toolsEnabled: Boolean): AgentStep = {
          val user = messages.reverse.find(_._1 == "user").map(_._2).getOrElse("")
          if (user.contains("PER-SHARD FINDINGS"))
            FakeCompleters.ConcatReducer.complete(messages, toolsEnabled)
          else FakeCompleters.UppercaseMapper.complete(messages, toolsEnabled)
        }
      })
    assert(res.output.exists(o => o.contains("AA") && o.contains("BB")))
  }
}
