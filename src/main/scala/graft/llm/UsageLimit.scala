package graft.llm

/** Usage kill-switch (reference LotusUsageLimitException semantics,
  * lotus/models/lm.py:465-473, lotus/types.py:258-278): a runaway semantic
  * job on a 100 TB input must abort once it crosses the configured budget.
  *
  * Enforcement is driver-side at stage boundaries: accumulator totals are
  * only consistent on the driver, so every operator checks before launching
  * its next LLM stage (and driver-coordinated loops check every round).
  * Bounded over-run within one in-flight stage is inherent to distributed
  * enforcement; the reference has the same property per in-flight batch.
  */
final case class UsageLimit(
    maxPromptTokens: Long = Long.MaxValue,
    maxOutputTokens: Long = Long.MaxValue,
    maxTotalTokens: Long = Long.MaxValue,
    maxRequests: Long = Long.MaxValue,
    maxCostUsd: Double = Double.MaxValue) extends Serializable

final class UsageLimitExceededException(msg: String) extends RuntimeException(msg)

object UsageLimit {

  /** Throw when the accumulated stats cross any configured limit. */
  def enforce(stats: UsageStats, limit: UsageLimit, modelName: String): Unit = {
    val promptTok = stats.promptChars.value / 4
    val outTok = stats.outputChars.value / 4
    val reqs = stats.requests.value
    val cost = Pricing.costUsd(modelName, promptTok, outTok)
    def fail(what: String, v: Any, cap: Any): Nothing =
      throw new UsageLimitExceededException(
        s"usage limit exceeded: $what=$v cap=$cap (${stats.report})")
    if (promptTok > limit.maxPromptTokens) fail("prompt_tokens", promptTok, limit.maxPromptTokens)
    if (outTok > limit.maxOutputTokens) fail("output_tokens", outTok, limit.maxOutputTokens)
    if (promptTok + outTok > limit.maxTotalTokens)
      fail("total_tokens", promptTok + outTok, limit.maxTotalTokens)
    if (reqs > limit.maxRequests) fail("requests", reqs, limit.maxRequests)
    if (cost > limit.maxCostUsd) fail("cost_usd", f"$cost%.4f", limit.maxCostUsd)
  }

  /** Driver-side gate used by every LLM stage builder. */
  def checkBeforeStage(stats: UsageStats, lm: LMClient): Unit =
    graft.core.Sem.settings.usageLimit.foreach(l => enforce(stats, l, lm.modelName))
}

/** Static per-million-token price table (reference lotus/pricing.py:10-34
  * resolves via litellm's table; zero-egress here, so a small static map with
  * a conservative default).
  */
object Pricing {
  /** (input $/1M tokens, output $/1M tokens) */
  val table: Map[String, (Double, Double)] = Map(
    "gpt-4o" -> (2.50, 10.00),
    "gpt-4o-mini" -> (0.15, 0.60),
    "gpt-4.1" -> (2.00, 8.00),
    "gpt-4.1-mini" -> (0.40, 1.60),
    "o3-mini" -> (1.10, 4.40),
    "text-embedding-3-small" -> (0.02, 0.0),
    "text-embedding-3-large" -> (0.13, 0.0)
  )
  val defaultPrice: (Double, Double) = (1.0, 3.0)

  def priceFor(model: String): (Double, Double) = {
    val m = model.toLowerCase
    table.collectFirst { case (k, v) if m.contains(k) => v }.getOrElse(defaultPrice)
  }

  def costUsd(model: String, promptTokens: Long, outputTokens: Long): Double = {
    val (in, out) = priceFor(model)
    promptTokens / 1e6 * in + outputTokens / 1e6 * out
  }
}
