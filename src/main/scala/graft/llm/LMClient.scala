package graft.llm

/** Chat message. Text-only content; image parts are carried separately in
  * [[LMRequest.images]] (name → base64/url ref) so text prompts stay cheap.
  */
final case class ChatMessage(role: String, content: String) extends Serializable

/** One LLM call: full message list (system + few-shot + user). */
final case class LMRequest(
    messages: Seq[ChatMessage],
    images: Map[String, String] = Map.empty
) extends Serializable {

  def lastUser: String = messages.reverse.find(_.role == "user").map(_.content).getOrElse("")

  /** The serialized document section of the last user message — text between
    * `Context:\n` and the trailing `\n\nClaim:` / `\n\nInstruction:` tag.
    */
  def context: String = {
    val u = lastUser
    val start = {
      val i = u.indexOf("Context:\n")
      if (i < 0) 0 else i + "Context:\n".length
    }
    val tail = u.substring(start)
    val endCandidates = Seq("\n\nClaim:", "\n\nInstruction:").map(tail.indexOf).filter(_ >= 0)
    if (endCandidates.isEmpty) tail else tail.substring(0, endCandidates.min)
  }
}

/** LLM response; `positiveProb` is the normalized probability of the positive
  * output token when logprobs were requested (cascade scoring).
  */
final case class LMResult(output: String, positiveProb: Option[Double] = None) extends Serializable

/** The physical LLM substrate. One instance is shipped (serialized) to
  * executors; implementations must be Serializable and thread-safe.
  *
  * Batching model follows the reference LM runtime (lotus/models/lm.py:261-436):
  * operators call `complete` with up to [[maxBatchSize]] requests; the
  * implementation issues them concurrently (HTTP) or in bulk (local).
  */
trait LMClient extends Serializable {
  def complete(batch: Seq[LMRequest]): Seq[LMResult]

  /** Concurrent request budget per call (reference default 64). */
  def maxBatchSize: Int = 64

  /** Context window (tokens); reference default 128k. */
  def maxCtxLen: Int = 128000

  /** Per-response token budget; reference default 512. */
  def maxTokens: Int = 512

  /** Token estimate used for rate limiting and cost pre-estimation. The
    * reference counts real tokenizer tokens (lm.py:613-640); with no vocab
    * files in this environment, a BPE-style regex estimate (≤4-char alnum
    * chunks + per-char punctuation) is the deterministic stand-in — far
    * closer to cl100k counts than chars/4, especially on punctuated text.
    */
  def countTokens(s: String): Int = Tokens.estimate(s)

  def modelName: String = "unknown"
}

/** Deterministic BPE-style token estimator (mirrors
  * [[graft.functions.TextFunctions.bpeTokenEstimate]] for the Scala side).
  */
object Tokens {
  private val pat = java.util.regex.Pattern.compile("[A-Za-z0-9]{1,4}|[^A-Za-z0-9\\s]")
  def estimate(s: String): Int = {
    if (s == null || s.isEmpty) return 1
    val m = pat.matcher(s)
    var n = 0
    while (m.find()) n += 1
    math.max(1, n)
  }
}

/** OpenAI-compatible chat-completions client over java.net.http.
  *
  * Config via constructor (endpoint/model/key resolved on the driver and
  * broadcast with the closure). Each executor lazily builds its own
  * HttpClient; requests in a batch are issued concurrently. Zero-egress test
  * environments use [[FakeLM]] instead — this class is the production path.
  */
final case class OpenAICompatLM(
    endpoint: String,
    model: String,
    apiKey: String = "",
    temperature: Double = 0.0,
    override val maxBatchSize: Int = 64,
    override val maxTokens: Int = 512,
    timeoutSec: Int = 120,
    maxRetries: Int = 3,
    /** Per-executor rate budget (driver computes global/numExecutors via
      * [[RateGovernor.perExecutor]]); 0 disables. */
    rpmLimit: Int = 0,
    tpmLimit: Int = 0,
    /** Request token logprobs and derive the normalized positive-token
      * probability for cascade scoring (reference lm.py:570-611). The
      * positive/negative tokens default to sem_filter's ("True","False"). */
    withLogprobs: Boolean = false,
    positiveToken: String = "True",
    negativeToken: String = "False"
) extends LMClient {

  @transient private lazy val governor = new RateGovernor(rpmLimit, tpmLimit)

  @transient private lazy val http: java.net.http.HttpClient =
    java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(30))
      .build()

  @transient private lazy val mapper = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    m
  }

  override def modelName: String = model

  private[graft] def toJson(req: LMRequest): String = {
    val root = mapper.createObjectNode()
    root.put("model", model)
    root.put("temperature", temperature)
    root.put("max_tokens", maxTokens)
    if (withLogprobs) {
      root.put("logprobs", true)
      root.put("top_logprobs", 20)
    }
    val msgs = root.putArray("messages")
    val lastUserIdx = req.messages.lastIndexWhere(_.role == "user")
    req.messages.zipWithIndex.foreach { case (m, i) =>
      val o = msgs.addObject()
      o.put("role", m.role)
      if (req.images.nonEmpty && i == lastUserIdx) {
        // Multimodal user message as OpenAI content parts, mirroring the
        // reference's user_message_formatter (task_instructions.py:69-84):
        // [text: "Context:\n<docs>"] ++ per image ["[Name]: \n", image_url]
        // ++ [text: "\n\n<instruction tag>"].
        val (ctxPart, tagPart) = splitUserContent(m.content)
        val parts = o.putArray("content")
        val t0 = parts.addObject(); t0.put("type", "text"); t0.put("text", ctxPart)
        req.images.foreach { case (name, url) =>
          val lbl = parts.addObject(); lbl.put("type", "text"); lbl.put("text", s"[$name]: \n")
          val img = parts.addObject(); img.put("type", "image_url")
          img.putObject("image_url").put("url", url)
        }
        if (tagPart.nonEmpty) {
          val t1 = parts.addObject(); t1.put("type", "text"); t1.put("text", tagPart)
        }
      } else o.put("content", m.content)
    }
    mapper.writeValueAsString(root)
  }

  /** Split a formatted user message "Context:\n<docs>\n\n<tag>" at the
    * instruction-tag boundary (the same markers [[LMRequest.context]] uses).
    */
  private def splitUserContent(content: String): (String, String) = {
    val idx = Seq("\n\nClaim:", "\n\nInstruction:", "\n\nnull")
      .map(content.indexOf).filter(_ >= 0)
    if (idx.isEmpty) (content, "")
    else {
      val i = idx.min
      (content.substring(0, i), content.substring(i))
    }
  }

  /** Normalized positive-token probability from the answer token's
    * top-logprobs: P(pos) / (P(pos) + P(neg)), scanning for the token right
    * after the `Answer:` tag (or the first content token). Returns None when
    * logprobs are absent.
    */
  private def positiveProbOf(node: com.fasterxml.jackson.databind.JsonNode): Option[Double] = {
    val contentArr = node.path("choices").path(0).path("logprobs").path("content")
    if (!contentArr.isArray || contentArr.size() == 0) return None
    // Find the token position holding the verdict: the first token whose
    // text contains the positive or negative token prefix; else token 0.
    val idx = (0 until contentArr.size()).find { i =>
      val t = contentArr.path(i).path("token").asText("")
      t.contains(positiveToken.take(2)) || t.contains(negativeToken.take(2))
    }.getOrElse(0)
    val top = contentArr.path(idx).path("top_logprobs")
    if (!top.isArray) return None
    var pPos = 0.0
    var pNeg = 0.0
    (0 until top.size()).foreach { j =>
      val tok = top.path(j).path("token").asText("").trim.toLowerCase
      val p = math.exp(top.path(j).path("logprob").asDouble(Double.NegativeInfinity))
      if (tok == positiveToken.toLowerCase) pPos = math.max(pPos, p)
      if (tok == negativeToken.toLowerCase) pNeg = math.max(pNeg, p)
    }
    if (pPos + pNeg <= 0) None else Some(pPos / (pPos + pNeg))
  }

  /** Non-retryable client error (4xx other than 429): surfaced immediately,
    * never retried with backoff.
    */
  final class NonRetryableException(msg: String) extends RuntimeException(msg)

  private def callOne(req: LMRequest): LMResult = {
    governor.acquire(req.messages.map(m => countTokens(m.content)).sum + maxTokens)
    val body = toJson(req)
    var attempt = 0
    var lastErr: Throwable = null
    while (attempt < maxRetries) {
      try {
        val b = java.net.http.HttpRequest.newBuilder()
          .uri(java.net.URI.create(endpoint))
          .timeout(java.time.Duration.ofSeconds(timeoutSec.toLong))
          .header("Content-Type", "application/json")
        val withAuth = if (apiKey.nonEmpty) b.header("Authorization", s"Bearer $apiKey") else b
        val httpReq = withAuth
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
          .build()
        val resp = http.send(httpReq, java.net.http.HttpResponse.BodyHandlers.ofString())
        if (resp.statusCode() / 100 == 2) {
          val node = mapper.readTree(resp.body())
          val content = node.path("choices").path(0).path("message").path("content").asText("")
          return LMResult(content, if (withLogprobs) positiveProbOf(node) else None)
        } else if (resp.statusCode() == 429 || resp.statusCode() / 100 == 5) {
          lastErr = new RuntimeException(
            s"LM HTTP ${resp.statusCode()}: ${resp.body().take(500)}")
          Thread.sleep(math.min(30000L, 1000L << attempt))
        } else {
          // Bad request / auth / not-found: retrying cannot help.
          throw new NonRetryableException(
            s"LM HTTP ${resp.statusCode()}: ${resp.body().take(500)}")
        }
      } catch {
        case e: InterruptedException => throw e
        case e: NonRetryableException => throw e
        case e: Throwable => lastErr = e; Thread.sleep(math.min(30000L, 1000L << attempt))
      }
      attempt += 1
    }
    throw new RuntimeException(s"LM call failed after $maxRetries attempts", lastErr)
  }

  override def complete(batch: Seq[LMRequest]): Seq[LMResult] = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = OpenAICompatLM.sharedEc
    val fut = Future.traverse(batch)(r => Future(callOne(r)))
    Await.result(fut, (timeoutSec.toLong * maxRetries + 60).seconds)
  }
}

object OpenAICompatLM {
  // Bounded pool shared across tasks in an executor JVM.
  lazy val sharedEc: scala.concurrent.ExecutionContext =
    scala.concurrent.ExecutionContext.fromExecutor(
      java.util.concurrent.Executors.newFixedThreadPool(64))
}
