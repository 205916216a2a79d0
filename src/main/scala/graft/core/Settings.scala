package graft.core

import graft.llm.{FakeLM, LMClient}
import graft.embed.{Embedder, HashingEmbedder}

/** Reasoning strategies (reference lotus/types.py:284-288). */
sealed trait ReasoningStrategy extends Serializable
object ReasoningStrategy {
  case object Default extends ReasoningStrategy
  case object Cot extends ReasoningStrategy
  case object ZsCot extends ReasoningStrategy
  case object FewShot extends ReasoningStrategy
}

/** Engine-wide settings, resolved on the driver at operator-build time and
  * captured (frozen) into executor closures — the Spark-correct analogue of
  * the reference's mutable `lotus.settings` singleton + ContextVar scoping
  * (lotus/settings.py:15-70).
  */
final case class SemSettings(
    lm: LMClient = FakeLM.echo,
    helperLm: Option[LMClient] = None,
    embedder: Embedder = HashingEmbedder(64),
    serializationFormat: SerializationFormat = SerializationFormat.Default,
    /** Below this row count, driver-coordinated algorithms (topk, agg fold)
      * may collect and run locally instead of launching per-round jobs. */
    localExecutionThreshold: Int = 200000,
    /** Oversized-document handling for per-row LLM ops (reference TRUNCATE
      * default; CHUNK via [[LongContext.chunkColumn]] as a pre-op). */
    longContextStrategy: LongContextStrategy = LongContextStrategy.Truncate
) extends Serializable

object Sem {
  private val dyn = new scala.util.DynamicVariable[SemSettings](SemSettings())

  def settings: SemSettings = dyn.value

  /** Scoped override (driver-side), like `settings.context(...)`. */
  def withSettings[T](s: SemSettings)(f: => T): T = dyn.withValue(s)(f)

  def withLM[T](lm: LMClient)(f: => T): T = dyn.withValue(dyn.value.copy(lm = lm))(f)
}
