package graft.agentic

import scala.collection.mutable

/** Tool abstraction (reference lotus/tools/base.py:29-107): name +
  * description + JSON-schema'd parameters, executed on the executor where
  * the agent runs.
  */
trait AgentTool extends Serializable {
  def name: String
  def description: String
  /** JSON schema of the arguments object. */
  def parametersSchema: String = """{"type":"object","properties":{}}"""
  /** Execute with the raw JSON arguments string; return the tool result. */
  def run(argumentsJson: String): String
}

/** Python REPL tool (reference lotus/tools/repl.py): runs a code snippet in a
  * python3 subprocess — the "local sandbox" variant (Docker is unavailable on
  * executors; the reference makes the same default tradeoff).
  */
final case class PythonReplTool(timeoutSec: Int = 30) extends AgentTool {
  override def name: String = "python_repl"
  override def description: String =
    "Execute a Python code snippet and return its stdout. Use print(...) to emit results."
  override def parametersSchema: String =
    """{"type":"object","properties":{"code":{"type":"string"}},"required":["code"]}"""

  override def run(argumentsJson: String): String = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val code = mapper.readTree(argumentsJson).path("code").asText("")
    if (code.isEmpty) return "ERROR: missing 'code' argument"
    // Same spawn/merge-stderr/timeout core as the Docker variant — one
    // place carries the stream-handling fix.
    DockerReplTool.processRunner(timeoutSec)(Seq("python3", "-c", code))._2.take(10000)
  }
}

/** Docker-sandboxed Python REPL — the reference's production default
  * (lotus/tools/repl.py:82-145): each call runs `python3 -c <code>` in a
  * fresh `docker run --rm` container with the network disabled and a memory
  * cap, so agent-written code can touch neither the executor's filesystem
  * nor the cluster network. The process runner is injectable ([[PythonReplTool]]
  * stays the no-daemon fallback; this environment ships a docker client but
  * no daemon, so the default runner surfaces the daemon's error text the
  * same way any docker failure would).
  */
final case class DockerReplTool(image: String = "python:3.11-slim",
    timeoutSec: Int = 30, memoryLimit: String = "512m")(
    val runner: Seq[String] => (Int, String) = DockerReplTool.processRunner(timeoutSec))
    extends AgentTool {
  override def name: String = "python_repl"
  override def description: String =
    "Execute a Python code snippet in an isolated container and return its stdout."
  override def parametersSchema: String =
    """{"type":"object","properties":{"code":{"type":"string"}},"required":["code"]}"""

  private def activeRunner: Seq[String] => (Int, String) = runner

  /** The docker argv for a snippet — visible for tests and audits: no
    * network, bounded memory/cpu, a name for kill-on-timeout cleanup,
    * ephemeral container, code via argv (never a shell).
    */
  def command(code: String, containerName: String = "graft-repl"): Seq[String] = Seq(
    "docker", "run", "--rm", "-i", "--network=none", s"--name=$containerName",
    s"--memory=$memoryLimit", "--cpus=1", image, "python3", "-c", code)

  override def run(argumentsJson: String): String = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val code = mapper.readTree(argumentsJson).path("code").asText("")
    if (code.isEmpty) return "ERROR: missing 'code' argument"
    val name = "graft-repl-" + java.util.UUID.randomUUID().toString.take(12)
    val (exit, out) = activeRunner(command(code, name))
    // destroyForcibly kills only the docker CLIENT; on timeout the container
    // itself must be killed or it keeps running (and holding its memory
    // reservation) — --rm then reaps it on exit. Best-effort. The sentinel
    // cannot collide with a real container exit status (those are >= 0;
    // a Python process exiting 124 is NOT a timeout).
    if (exit == DockerReplTool.TimeoutExit) {
      try activeRunner(Seq("docker", "kill", name)) catch { case _: Exception => () }
    }
    if (exit != 0 && out.isEmpty) s"ERROR: docker exited $exit"
    else out.take(10000)
  }
}

object DockerReplTool {
  /** Runner timeout sentinel: process exit statuses are non-negative, so a
    * negative value is unambiguous — unlike 124 (`timeout(1)`'s convention),
    * which a container's own code can legitimately exit with.
    */
  val TimeoutExit: Int = Int.MinValue

  /** Default runner: spawn the argv, merge stderr, enforce the timeout.
    * Stdout drains on a daemon thread so a child that never closes its
    * stream (`while True: pass`) still hits the waitFor timeout instead of
    * blocking the read forever. Timeout returns ([[TimeoutExit]], error).
    */
  def processRunner(timeoutSec: Int): Seq[String] => (Int, String) = argv => {
    val pb = new ProcessBuilder(argv: _*)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val buf = new java.io.ByteArrayOutputStream()
    val reader = new Thread(() => {
      try proc.getInputStream.transferTo(buf)
      catch { case _: java.io.IOException => () } // stream closes on kill
    })
    reader.setDaemon(true)
    reader.start()
    val done = proc.waitFor(timeoutSec.toLong, java.util.concurrent.TimeUnit.SECONDS)
    if (!done) {
      proc.destroyForcibly()
      (TimeoutExit, s"ERROR: timeout after ${timeoutSec}s")
    } else {
      reader.join(2000)
      (proc.exitValue(), buf.toString("UTF-8"))
    }
  }
}

final case class ToolCall(id: String, name: String, argumentsJson: String)

/** One model turn: final content, or tool calls to execute. */
final case class AgentStep(content: String, toolCalls: Seq[ToolCall] = Nil)

/** The agent's model interface. `toolsEnabled=false` forces a tool-free turn
  * (used to extract a final answer at the step budget).
  */
trait Completer extends Serializable {
  def complete(messages: Seq[(String, String)], toolsEnabled: Boolean): AgentStep
}

final case class AgentResult(output: String, steps: Int, truncated: Boolean,
    trace: Seq[(String, String)])

/** Tool-calling loop (reference lotus/agentic/loop.py:58-122): completer →
  * execute tools → feed results → final answer; forced tool-free turn when
  * max_steps is exhausted. Runs inside executor tasks.
  */
object AgentLoop {

  def run(
      completer: Completer,
      tools: Seq[AgentTool],
      systemPrompt: String,
      userContent: String,
      maxSteps: Int = 6
  ): AgentResult = {
    val toolByName = tools.map(t => t.name -> t).toMap
    val messages = mutable.ArrayBuffer[(String, String)](
      "system" -> systemPrompt, "user" -> userContent)
    val trace = mutable.ArrayBuffer[(String, String)]()

    var step = 0
    while (step < maxSteps) {
      val agentStep = completer.complete(messages.toSeq, toolsEnabled = true)
      if (agentStep.toolCalls.isEmpty)
        return AgentResult(agentStep.content, step + 1, truncated = false, trace.toSeq)
      messages += "assistant" -> agentStep.content
      agentStep.toolCalls.foreach { tc =>
        val result = toolByName.get(tc.name) match {
          case None => s"ERROR: unknown tool '${tc.name}'"
          case Some(tool) =>
            try tool.run(tc.argumentsJson)
            catch { case e: Exception => s"ERROR: ${e.getClass.getSimpleName}: ${e.getMessage}" }
        }
        trace += tc.name -> result
        messages += "tool" -> s"[${tc.name}] $result"
      }
      step += 1
    }
    // Budget exhausted: force a tool-free final answer.
    val fin = completer.complete(
      messages.toSeq :+ ("user" -> "Provide your final answer now."), toolsEnabled = false)
    AgentResult(fin.content, maxSteps, truncated = true, trace.toSeq)
  }
}
