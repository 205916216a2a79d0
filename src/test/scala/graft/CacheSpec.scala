package graft

import org.apache.spark.sql.functions._
import graft.core.Sem
import graft.llm._

/** Nondeterministic LM: every physical call returns a fresh counter value.
  * Any replay that actually reaches the model is detectable in the output.
  */
object CountingLM {
  val counter = new java.util.concurrent.atomic.AtomicLong(0)
}
final case class CountingLM(tag: String = "c1") extends LMClient {
  override def modelName: String = s"counting/$tag"
  override def complete(batch: Seq[LMRequest]): Seq[LMResult] =
    batch.map(_ => LMResult(s"v${CountingLM.counter.incrementAndGet()}"))
}

class CacheSpec extends SparkSpec {
  import spark.implicits._

  private def freshStats(): UsageStats = {
    UsageTracker.reset()
    UsageTracker.forSession(spark)
  }

  test("second identical run issues zero physical calls") {
    ResponseCache.clear()
    val stats = freshStats()
    val df = (0 until 20).map(i => (i.toLong, s"doc $i spark")).toDF("id", "text")
    val s = Sem.settings.copy(lm = FakeLM(FakeBehavior.KeywordFilter("spark")), enableCache = true)
    val r1 = Sem.withSettings(s) { df.semFilter("the {text} mentions spark").count() }
    val physAfter1 = stats.physicalRequests.value
    assert(physAfter1 == 20)
    val r2 = Sem.withSettings(s) { df.semFilter("the {text} mentions spark").count() }
    assert(r1 == r2)
    assert(stats.physicalRequests.value == physAfter1, "second run must be fully cached")
    assert(stats.cacheHits.value >= 20)
    assert(stats.requests.value == 40) // virtual accounting still counts both runs
  }

  test("replay of a nondeterministic model is stable under the cache") {
    ResponseCache.clear()
    CountingLM.counter.set(0)
    freshStats()
    val df = (0 until 10).map(i => (i.toLong, s"item $i")).toDF("id", "text")
    val s = Sem.settings.copy(lm = CountingLM(), enableCache = true)
    val first = Sem.withSettings(s) {
      df.semMap("describe {text}").select("id", "_map").as[(Long, String)].collect().toMap
    }
    // A re-run (what a retried/speculated task does) replays cached answers:
    // identical outputs even though the model would answer differently.
    val second = Sem.withSettings(s) {
      df.semMap("describe {text}").select("id", "_map").as[(Long, String)].collect().toMap
    }
    assert(first == second)
    assert(CountingLM.counter.get() == 10)
  }

  test("cache key distinguishes model config and prompt content") {
    ResponseCache.clear()
    val a = ResponseCache.key("m1", LMRequest(Seq(ChatMessage("user", "x"))))
    val b = ResponseCache.key("m2", LMRequest(Seq(ChatMessage("user", "x"))))
    val c = ResponseCache.key("m1", LMRequest(Seq(ChatMessage("user", "y"))))
    val d = ResponseCache.key("m1", LMRequest(Seq(ChatMessage("user", "x")),
      images = Map("i" -> "b64")))
    assert(Set(a, b, c, d).size == 4)
  }

  test("usage limit aborts before the next LLM stage") {
    freshStats()
    val df = (0 until 10).map(i => (i.toLong, s"doc $i")).toDF("id", "text")
    val s = Sem.settings.copy(lm = FakeLM(FakeBehavior.Echo),
      usageLimit = Some(UsageLimit(maxRequests = 5)))
    intercept[UsageLimitExceededException] {
      Sem.withSettings(s) {
        df.semMap("echo {text}").count() // 10 requests > 5
        df.semMap("echo {text} again").count() // stage build must abort
      }
    }
  }

  test("operator cache skips recompute across fresh plans (cache layer 2)") {
    import graft.plan.OpCache
    CountingLM.counter.set(0)
    UsageTracker.reset(); UsageTracker.forSession(spark)
    val dir = java.nio.file.Files.createTempDirectory("graftopcache").toString
    def run(): Map[Long, String] = {
      // fresh lineage each call — the response cache alone would still hit,
      // so use the nondeterministic CountingLM with caching DISABLED to
      // prove the hit comes from the operator cache.
      val df = (0 until 8).map(i => (i.toLong, s"doc $i")).toDF("id", "text")
      val key = OpCache.keyFor(df, "semMap", "describe {text}", "counting/c1")
      OpCache.cached(spark, dir, key) {
        Sem.withLM(CountingLM()) { df.semMap("describe {text}") }
      }.select("id", "_map").as[(Long, String)].collect().toMap
    }
    val first = run()
    val callsAfterFirst = CountingLM.counter.get()
    assert(callsAfterFirst == 8)
    val second = run()
    assert(second == first, "cached result must be byte-identical")
    assert(CountingLM.counter.get() == callsAfterFirst, "no model calls on a cache hit")
  }

  test("pricing table resolves model prices with a default fallback") {
    assert(math.abs(Pricing.costUsd("gpt-4o-mini", 1000000, 0) - 0.15) < 1e-9)
    val (in, out) = Pricing.priceFor("totally-unknown-model")
    assert((in, out) == Pricing.defaultPrice)
  }
}
