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
    val pb = new ProcessBuilder("python3", "-c", code)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
    val done = proc.waitFor(timeoutSec.toLong, java.util.concurrent.TimeUnit.SECONDS)
    if (!done) { proc.destroyForcibly(); s"ERROR: timeout after ${timeoutSec}s" }
    else out.take(10000)
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
