package graft.llm

/** Deterministic fake LM for hermetic tests — the reference's own testing
  * pattern (tests/test_agentic_map_reduce.py: ScriptedCompleter). Each
  * behavior computes answers from the serialized document fields in the
  * prompt, so operator results are exactly reproducible (and, for the
  * DuckDB-oracle gate, SQL-expressible).
  */
object DocParse {
  private val Field = "\\[([^\\]\\n]+)\\]: «([^»]*)»".r

  /** All `[Col]: «val»` fields of a serialized context, in order. */
  def fieldSeq(context: String): Seq[(String, String)] =
    Field.findAllMatchIn(context).map(m => (m.group(1), m.group(2))).toVector

  /** First value per (capitalized) field name. */
  def fields(context: String): Map[String, String] = {
    val b = scala.collection.mutable.LinkedHashMap.empty[String, String]
    fieldSeq(context).foreach { case (k, v) => if (!b.contains(k)) b += k -> v }
    b.toMap
  }

  /** All «…» values, in order (used by the agg fake across fold levels). */
  def allValues(context: String): Seq[String] =
    "«([^»]*)»".r.findAllMatchIn(context).map(_.group(1)).toVector
}

/** A deterministic answer function over an [[LMRequest]]. */
sealed trait FakeBehavior extends Serializable {
  def answer(req: LMRequest): String
}

object FakeBehavior {

  /** Echo the serialized context back (smoke tests). */
  case object Echo extends FakeBehavior {
    def answer(req: LMRequest): String = req.context
  }

  /** Filter: true iff `keyword` appears in the doc (as a whole word when
    * `word=true`, else substring), case-insensitive.
    */
  final case class KeywordFilter(keyword: String, word: Boolean = true) extends FakeBehavior {
    def answer(req: LMRequest): String = {
      val ctx = req.context.toLowerCase
      val hit =
        if (word) ctx.split("[^\\p{L}\\p{N}_]+").contains(keyword.toLowerCase)
        else ctx.contains(keyword.toLowerCase)
      if (hit) "Answer: True" else "Answer: False"
    }
  }

  /** Join predicate: true iff the value of `wordField` appears as a
    * whitespace-separated token of `textField`.
    */
  final case class FieldWordJoin(textField: String, wordField: String) extends FakeBehavior {
    def answer(req: LMRequest): String = {
      val f = DocParse.fields(req.context)
      val ok = (for {
        t <- f.get(textField)
        w <- f.get(wordField)
      } yield t.split("\\s+").contains(w)).getOrElse(false)
      if (ok) "Answer: True" else "Answer: False"
    }
  }

  /** Map: echo `field` reversed, character-exact (no trimming — chunk
    * boundaries must survive). The per-chunk transform for long-context
    * CHUNK gates: a chunkwise reversal is NOT the whole-doc reversal, so
    * an implementation that quietly sent the full document in one request
    * cannot fake the restored result.
    */
  final case class ReverseField(field: String) extends FakeBehavior {
    def answer(req: LMRequest): String =
      DocParse.fields(req.context).getOrElse(field, "").reverse
  }

  /** Map: first `n` whitespace tokens of `field`. */
  final case class FirstWords(field: String, n: Int) extends FakeBehavior {
    def answer(req: LMRequest): String =
      DocParse.fields(req.context).get(field)
        .map(_.split("\\s+").take(n).mkString(" ")).getOrElse("")
  }

  /** Extract: JSON with `first_word` and `n_words` of `field` (all-string
    * values, matching the reference's str coercion).
    */
  final case class ExtractStats(field: String) extends FakeBehavior {
    def answer(req: LMRequest): String = {
      val v = DocParse.fields(req.context).getOrElse(field, "")
      val toks = v.split("\\s+").filter(_.nonEmpty)
      val first = if (toks.isEmpty) "" else toks.head
      s"""{"first_word": "${first.replace("\"", "\\\"")}", "n_words": "${toks.length}"}"""
    }
  }

  /** Aggregation summarizer: concatenates all «…» doc values with `sep`.
    * Associative, so the hierarchical fold equals a flat ordered concat —
    * which makes sem_agg exactly DuckDB-checkable via string_agg.
    */
  final case class ConcatDocs(sep: String = "\n") extends FakeBehavior {
    def answer(req: LMRequest): String = DocParse.allValues(req.context).mkString(sep)
  }

  /** Top-k comparator: prefer the document whose `lenField` is larger,
    * tie-break on smaller `idField` — a total order, so quickselect results
    * are exact and ORDER-BY-checkable.
    */
  final case class PreferLonger(lenField: String = "N_chars", idField: String = "Doc_id")
      extends FakeBehavior {
    def answer(req: LMRequest): String = {
      val docs = DocParse.fieldSeq(req.context)
      def grab(f: String): Seq[Long] =
        docs.filter(_._1 == f).map(x => scala.util.Try(x._2.trim.toDouble.toLong).getOrElse(0L))
      val lens = grab(lenField)
      val ids = grab(idField)
      if (lens.length >= 2) {
        val firstWins =
          lens(0) > lens(1) || (lens(0) == lens(1) && ids.length >= 2 && ids(0) < ids(1))
        if (firstWins) "Answer: Document 1" else "Answer: Document 2"
      } else "Answer: Document 1"
    }
  }

  /** Filter keyed on the *claim* text: the single-quoted word in the
    * instruction (e.g. "mentions the word 'delay'") must appear as a token
    * of the doc. Instruction-sensitive, so prompt-optimization loops (GEPA)
    * have a real signal to climb.
    */
  case object ClaimWordFilter extends FakeBehavior {
    def answer(req: LMRequest): String = {
      val user = req.lastUser
      val word = "'([^']+)'".r.findFirstMatchIn(user).map(_.group(1).toLowerCase)
      val hit = word.exists(w =>
        req.context.toLowerCase.split("[^\\p{L}\\p{N}_]+").contains(w))
      if (hit) "Answer: True" else "Answer: False"
    }
  }

  /** Top-k comparator over a single text field: longer text wins, ties
    * broken lexicographically (smaller string wins) — a total order over
    * distinct texts, so quick-sem results are exact and ORDER-BY-checkable
    * without a numeric id field in the prompt.
    */
  final case class PreferLongerText(field: String = "Text") extends FakeBehavior {
    def answer(req: LMRequest): String = {
      val vals = DocParse.fieldSeq(req.context).filter(_._1 == field).map(_._2)
      if (vals.length >= 2) {
        val firstWins = vals(0).length > vals(1).length ||
          (vals(0).length == vals(1).length && vals(0) <= vals(1))
        if (firstWins) "Answer: Document 1" else "Answer: Document 2"
      } else "Answer: Document 1"
    }
  }

  /** Multimodal probe: answers with the total character length of the
    * attached image urls — a deterministic function of the image payload, so
    * the image plumbing (tag → resolve → LMRequest.images) is oracle-checkable.
    */
  case object ImagePayloadLen extends FakeBehavior {
    def answer(req: LMRequest): String = req.images.values.map(_.length).sum.toString
  }

  /** Pairwise-judge comparator: answer token `a` when field `a`'s value is
    * at least as long as field `b`'s, else token `b` — a deterministic,
    * SQL-expressible A/B verdict for the pairwise_judge gate.
    */
  final case class PreferLongerField(a: String = "A", b: String = "B") extends FakeBehavior {
    def answer(req: LMRequest): String = {
      val f = DocParse.fields(req.context)
      val la = f.getOrElse(a, "").length
      val lb = f.getOrElse(b, "").length
      if (la >= lb) s"Answer: $a" else s"Answer: $b"
    }
  }

  /** Dispatch by prompt kind: map prompts carry an `Instruction:` tag,
    * filter/join prompts a `Claim:` tag — lets one fake serve multi-stage
    * pipelines (e.g. the map-search-filter join plan).
    */
  final case class PromptRouter(onInstruction: FakeBehavior, onClaim: FakeBehavior)
      extends FakeBehavior {
    def answer(req: LMRequest): String =
      if (req.lastUser.contains("Instruction:")) onInstruction.answer(req)
      else onClaim.answer(req)
  }

  /** Scripted: fixed answers cycled in GLOBAL call order (per JVM) — the
    * reference's ScriptedCompleter pattern. Test-only: the counter is a
    * JVM-local static, which is exact in local mode.
    */
  final case class Scripted(answers: Seq[String]) extends FakeBehavior {
    def answer(req: LMRequest): String =
      if (answers.isEmpty) ""
      else answers(Scripted.counter.getAndIncrement() % answers.length)
  }
  object Scripted {
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    def reset(): Unit = counter.set(0)
  }

  /** A behavior that also exposes a positive-token probability (the logprob
    * signal cascades consume).
    */
  trait ProbBehavior extends FakeBehavior {
    def positiveProb(req: LMRequest): Double
  }

  /** Comparator with confidence for top-k cascades: answers exactly like
    * [[PreferLonger]]; confidence is high when the length margin is wide,
    * ~0.5 (uncertain) when the two docs are within `margin` of each other.
    */
  final case class PreferLongerProb(lenField: String = "N_chars", idField: String = "Doc_id",
      margin: Long = 5) extends ProbBehavior {
    private val base = PreferLonger(lenField, idField)
    def answer(req: LMRequest): String = base.answer(req)
    def positiveProb(req: LMRequest): Double = {
      val lens = DocParse.fieldSeq(req.lastUser).filter(_._1 == lenField)
        .map(x => scala.util.Try(x._2.trim.toDouble.toLong).getOrElse(0L))
      val confident = lens.length >= 2 && math.abs(lens(0) - lens(1)) > margin
      val firstWins = answer(req).contains("Document 1")
      if (confident) { if (firstWins) 0.97 else 0.03 }
      else { if (firstWins) 0.55 else 0.45 }
    }
  }

  /** Imperfect helper model for cascade tests: probability is centered at
    * `hi` when the keyword matches, `lo` otherwise, with deterministic
    * content-hash jitter — so some items land in the uncertain middle band
    * and get routed to the oracle.
    */
  final case class KeywordFilterProb(keyword: String, hi: Double = 0.9, lo: Double = 0.1,
      jitter: Double = 0.5) extends ProbBehavior {
    private def matches(req: LMRequest): Boolean =
      req.context.toLowerCase.split("[^\\p{L}\\p{N}_]+").contains(keyword.toLowerCase)
    def answer(req: LMRequest): String =
      if (matches(req)) "Answer: True" else "Answer: False"
    def positiveProb(req: LMRequest): Double = {
      val h = (scala.util.hashing.MurmurHash3.stringHash(req.context) & 0x7fffffff).toDouble /
        Int.MaxValue.toDouble
      val center = if (matches(req)) hi else lo
      math.min(0.99, math.max(0.01, center + (h - 0.5) * jitter))
    }
  }
}

/** Fake LM: applies one deterministic behavior per request. */
final case class FakeLM(behavior: FakeBehavior, override val maxBatchSize: Int = 64,
    override val maxCtxLen: Int = 128000) extends LMClient {
  override def modelName: String = s"fake/${behavior.getClass.getSimpleName}"
  override def complete(batch: Seq[LMRequest]): Seq[LMResult] = behavior match {
    case p: FakeBehavior.ProbBehavior =>
      batch.map(r => LMResult(p.answer(r), Some(p.positiveProb(r))))
    case b => batch.map(r => LMResult(b.answer(r)))
  }
}

object FakeLM {
  val echo: FakeLM = FakeLM(FakeBehavior.Echo)
}
