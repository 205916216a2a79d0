package graft

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.llm.{ChatMessage, LMRequest, OpenAICompatLM}

/** Integration spec for the production OpenAI-compatible client against a
  * hermetic localhost HTTP server (zero egress): the unmodified
  * request/retry/backoff/parse path runs over a real socket, with
  * captured-style response payloads (real OpenAI chat-completions shapes).
  */
class OpenAICompatSpec extends SparkSpec {

  /** Run `f` with a one-route server; returns after the server is stopped.
    * The handler receives the request body and returns (status, response
    * body); requests are counted into `hits`.
    */
  private def withServer(handler: (String, Int) => (Int, String))
      (f: (String, AtomicInteger) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val hits = new AtomicInteger(0)
    server.createContext("/v1/chat/completions", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      val n = hits.incrementAndGet()
      val (status, resp) = handler(body, n)
      val bytes = resp.getBytes("UTF-8")
      ex.getResponseHeaders.add("Content-Type", "application/json")
      ex.sendResponseHeaders(status, bytes.length.toLong)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/v1/chat/completions", hits)
    finally server.stop(0)
  }

  private def completion(text: String): String =
    s"""{"id":"chatcmpl-1","object":"chat.completion","choices":[
       |{"index":0,"message":{"role":"assistant","content":"$text"},
       |"finish_reason":"stop"}],"usage":{"prompt_tokens":10,"completion_tokens":2}}""".stripMargin

  test("happy path: request body carries model/temperature/messages; content parsed") {
    var seen = ""
    withServer((body, _) => { seen = body; (200, completion("Answer: True")) }) { (url, hits) =>
      val lm = OpenAICompatLM(url, "test-model", apiKey = "sk-test", timeoutSec = 10)
      val res = lm.complete(Seq(LMRequest(Seq(
        ChatMessage("system", "You judge claims."),
        ChatMessage("user", "Context:\ndoc\n\nClaim: it works")))))
      assert(res.head.output == "Answer: True")
      assert(hits.get() == 1)
      assert(seen.contains("\"model\":\"test-model\""))
      assert(seen.contains("\"temperature\":0.0"))
      assert(seen.contains("You judge claims."))
      assert(seen.contains("Claim: it works"))
    }
  }

  test("429 then 5xx then success: backoff retries until the call lands") {
    withServer((_, n) => n match {
      case 1 => (429, """{"error":{"message":"rate limited"}}""")
      case 2 => (500, """{"error":{"message":"upstream"}}""")
      case _ => (200, completion("recovered"))
    }) { (url, hits) =>
      val lm = OpenAICompatLM(url, "m", timeoutSec = 10, maxRetries = 3)
      val res = lm.complete(Seq(LMRequest(Seq(ChatMessage("user", "hi")))))
      assert(res.head.output == "recovered")
      assert(hits.get() == 3)
    }
  }

  test("4xx is non-retryable: surfaced immediately after one request") {
    withServer((_, _) => (400, """{"error":{"message":"bad request"}}""")) { (url, hits) =>
      val lm = OpenAICompatLM(url, "m", timeoutSec = 10, maxRetries = 3)
      val e = intercept[Exception] {
        lm.complete(Seq(LMRequest(Seq(ChatMessage("user", "hi")))))
      }
      def root(t: Throwable): Throwable = if (t.getCause == null) t else root(t.getCause)
      assert(root(e).getMessage.contains("400"))
      assert(hits.get() == 1)
    }
  }

  test("exhausted retries raise with the last transport error as cause") {
    withServer((_, _) => (503, """{"error":{"message":"down"}}""")) { (url, hits) =>
      val lm = OpenAICompatLM(url, "m", timeoutSec = 10, maxRetries = 2)
      val e = intercept[Exception] {
        lm.complete(Seq(LMRequest(Seq(ChatMessage("user", "hi")))))
      }
      def root(t: Throwable): Throwable = if (t.getCause == null) t else root(t.getCause)
      assert(root(e).getMessage.contains("503"))
      assert(hits.get() == 2)
    }
  }

  test("logprob extraction: normalized positive probability from top_logprobs") {
    // Captured-style logprobs payload: the verdict token "True" with
    // top_logprobs over True/False. ln(0.9) ≈ -0.10536, ln(0.05) ≈ -2.9957
    // → P = 0.9 / (0.9 + 0.05) ≈ 0.947.
    val resp =
      """{"choices":[{"index":0,
        |"message":{"role":"assistant","content":"Answer: True"},
        |"logprobs":{"content":[
        |  {"token":"Answer","logprob":-0.01,"top_logprobs":[]},
        |  {"token":": ","logprob":-0.01,"top_logprobs":[]},
        |  {"token":"True","logprob":-0.10536,"top_logprobs":[
        |    {"token":"True","logprob":-0.10536},
        |    {"token":"False","logprob":-2.9957},
        |    {"token":"Maybe","logprob":-5.0}]}]},
        |"finish_reason":"stop"}]}""".stripMargin
    withServer((body, _) => { assert(body.contains("\"logprobs\":true")); (200, resp) }) {
      (url, _) =>
        val lm = OpenAICompatLM(url, "m", timeoutSec = 10, withLogprobs = true)
        val res = lm.complete(Seq(LMRequest(Seq(ChatMessage("user", "q")))))
        assert(res.head.output == "Answer: True")
        val p = res.head.positiveProb.getOrElse(fail("no positiveProb"))
        assert(math.abs(p - 0.9 / 0.95) < 1e-3, s"p=$p")
    }
  }

  test("multimodal request serializes image parts at the last user message") {
    var seen = ""
    withServer((body, _) => { seen = body; (200, completion("ok")) }) { (url, _) =>
      val lm = OpenAICompatLM(url, "m", timeoutSec = 10)
      lm.complete(Seq(LMRequest(
        Seq(ChatMessage("user", "Context:\n[img]\n\nInstruction: describe")),
        images = Map("img" -> "data:image/png;base64,AAAA"))))
      assert(seen.contains("\"type\":\"image_url\""))
      assert(seen.contains("data:image/png;base64,AAAA"))
      assert(seen.contains("\"type\":\"text\""))
    }
  }

  test("batched requests fan out concurrently and preserve order") {
    withServer((body, _) => {
      val m = "\"content\":\"(q\\d+)\"".r.findFirstMatchIn(body)
      (200, completion(s"echo ${m.map(_.group(1)).getOrElse("?")}"))
    }) { (url, hits) =>
      val lm = OpenAICompatLM(url, "m", timeoutSec = 10)
      val reqs = (0 until 8).map(i => LMRequest(Seq(ChatMessage("user", s"q$i"))))
      val res = lm.complete(reqs)
      assert(res.map(_.output) == (0 until 8).map(i => s"echo q$i"))
      assert(hits.get() == 8)
    }
  }
}
