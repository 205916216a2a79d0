package graft

import org.apache.spark.sql.functions._
import graft.core.{LongContext, Sem}
import graft.llm.{FakeBehavior, FakeLM, UsageTracker}

class LongContextUsageSpec extends SparkSpec {
  import spark.implicits._

  test("chunkColumn splits and restoreChunks reassembles") {
    val df = Seq((1L, "abcdefghij"), (2L, "xy")).toDF("id", "text")
    val chunked = LongContext.chunkColumn(df, "text", chunkChars = 4)
    assert(chunked.filter($"id" === 1).count() == 3)
    assert(chunked.filter($"id" === 2).count() == 1)
    val restored = LongContext.restoreChunks(chunked, "text", Seq("id"))
    val m = restored.as[(Long, String)].collect().toMap
    assert(m(1L) == "abcdefghij" && m(2L) == "xy")
  }

  test("oversized docs are truncated for per-row LLM ops") {
    val long = "x" * 5000
    val df = Seq((1L, long)).toDF("id", "text")
    // ctx 600 − maxTokens 512 → floor budget 1000 chars
    val out = Sem.withLM(FakeLM(FakeBehavior.Echo, maxCtxLen = 600)) {
      df.semMap("echo {text}")
    }
    val echoed = out.select("_map").as[String].head()
    assert(echoed.length == 1000)
  }

  test("rate governor enforces a sliding RPM window") {
    val gov = new graft.llm.RateGovernor(rpm = 5, tpm = 0, windowMs = 300L)
    val t0 = System.nanoTime()
    (0 until 5).foreach(_ => gov.acquire(10))
    val afterBurst = (System.nanoTime() - t0) / 1e6
    assert(afterBurst < 200, s"burst within limit must not block ($afterBurst ms)")
    gov.acquire(10) // 6th call must wait for the window to slide
    val afterSixth = (System.nanoTime() - t0) / 1e6
    assert(afterSixth >= 250, s"6th call must wait for the sliding window ($afterSixth ms)")
  }

  test("rate governor enforces the TPM budget with 5% headroom") {
    val gov = new graft.llm.RateGovernor(rpm = 0, tpm = 1000, windowMs = 300L)
    val t0 = System.nanoTime()
    gov.acquire(900) // under 950 headroom
    gov.acquire(100) // would exceed → must wait for the first to expire
    val ms = (System.nanoTime() - t0) / 1e6
    assert(ms >= 250, s"TPM overflow must block until the window slides ($ms ms)")
  }

  test("acquire under a virtual clock matches the pure schedule") {
    // The gate-verified recurrence (RateGovernor.schedule) must be the
    // EXACT behavior acquire() enforces: run the same request sequence
    // through a governor on a virtual clock and compare grant times.
    val toks = Seq(300, 200, 150, 100, 390, 10, 250, 50, 400, 120, 380, 20)
    val (rpm, tpm, win) = (3, 422, 60000L)
    val clock = new graft.llm.VirtualClock()
    val gov = new graft.llm.RateGovernor(rpm, tpm, win, clock)
    val grants = toks.map(gov.acquire)
    assert(grants == graft.llm.RateGovernor.schedule(toks, rpm, tpm, win))
    assert(grants.last > 0L, "constraints must actually bind in this fixture")
  }

  test("schedule: disabled governor grants immediately; oversized request refused") {
    assert(graft.llm.RateGovernor.schedule(Seq(5, 5), rpm = 0, tpm = 0) == Seq(0L, 0L))
    intercept[IllegalArgumentException] {
      graft.llm.RateGovernor.schedule(Seq(401), rpm = 0, tpm = 422)
    }
  }

  test("usage accumulators track batches, requests and sizes") {
    UsageTracker.reset()
    val df = (0 until 10).map(i => (i.toLong, s"doc $i")).toDF("id", "text")
    Sem.withLM(FakeLM(FakeBehavior.KeywordFilter("doc"), maxBatchSize = 4)) {
      df.semFilter("the {text} is a doc").count()
    }
    val stats = UsageTracker.get.get
    assert(stats.requests.value == 10)
    assert(stats.calls.value >= 3) // 10 rows in batches of ≤4
    assert(stats.promptChars.value > 0 && stats.outputChars.value > 0)
  }
}
