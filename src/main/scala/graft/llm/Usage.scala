package graft.llm

import org.apache.spark.sql.SparkSession
import org.apache.spark.util.LongAccumulator

/** Cluster-wide LLM usage accounting (reference lotus/models/lm.py:497-529
  * tracks usage in-process; on Spark the counters must be accumulators so
  * executor-side calls aggregate on the driver).
  */
final class UsageStats(
    val calls: LongAccumulator,
    val requests: LongAccumulator,
    val promptChars: LongAccumulator,
    val outputChars: LongAccumulator,
    /** Requests that actually reached the model (cache misses). */
    val physicalRequests: LongAccumulator,
    /** Requests served from the response cache. */
    val cacheHits: LongAccumulator) extends Serializable {

  /** Virtual accounting: every request an operator issued, cached or not
    * (reference virtual usage, lm.py:497-529).
    */
  def record(batch: Seq[LMRequest], results: Seq[LMResult]): Unit = {
    calls.add(1L)
    requests.add(batch.length.toLong)
    batch.foreach(r => promptChars.add(r.messages.map(_.content.length.toLong).sum))
    results.foreach(r => outputChars.add(r.output.length.toLong))
  }

  def recordPhysical(n: Long): Unit = physicalRequests.add(n)
  def recordCacheHits(n: Long): Unit = cacheHits.add(n)

  /** ≈tokens at 4 chars/token, the engine-wide estimate. */
  def report: String =
    s"llm batches=${calls.value} requests=${requests.value} " +
      s"physical=${physicalRequests.value} cache_hits=${cacheHits.value} " +
      s"prompt_tokens≈${promptChars.value / 4} output_tokens≈${outputChars.value / 4}"
}

object UsageTracker {
  @volatile private var current: Option[UsageStats] = None

  /** Create (once per session) and return the active stats. */
  def forSession(spark: SparkSession): UsageStats = synchronized {
    current.getOrElse {
      val sc = spark.sparkContext
      val s = new UsageStats(
        sc.longAccumulator("graft.llm.batches"),
        sc.longAccumulator("graft.llm.requests"),
        sc.longAccumulator("graft.llm.promptChars"),
        sc.longAccumulator("graft.llm.outputChars"),
        sc.longAccumulator("graft.llm.physicalRequests"),
        sc.longAccumulator("graft.llm.cacheHits"))
      current = Some(s)
      s
    }
  }

  def get: Option[UsageStats] = current
  def reset(): Unit = synchronized { current = None }
}

/** Executor-local rate governor (reference lm.py:304-436 is single-process;
  * cluster-aware limiting divides the global budget by the number of
  * concurrently running executors — the driver computes per-executor RPM/TPM
  * when building the LMClient and each executor JVM enforces its share with
  * a token bucket).
  */
final class RateGovernor(rpm: Int, tpm: Int, windowMs: Long = 60000L) extends Serializable {
  @transient private lazy val lock = new Object
  @transient private lazy val events = scala.collection.mutable.ArrayDeque.empty[(Long, Int)]
  @transient private var tokTotal = 0L

  /** Block until a request of `tokens` estimated tokens may proceed.
    * Sliding window over the last `windowMs` (reference TPM limiter keeps a
    * sliding 60 s token window with 5% headroom, lm.py:351-436) — a fixed
    * window would admit 2× the budget across a window boundary.
    */
  def acquire(tokens: Int): Unit = {
    if (rpm <= 0 && tpm <= 0) return
    lock.synchronized {
      var done = false
      while (!done) {
        val now = System.currentTimeMillis()
        while (events.nonEmpty && now - events.head._1 >= windowMs) {
          tokTotal -= events.removeHead()._2
        }
        val rpmOk = rpm <= 0 || events.length < rpm
        val tpmOk = tpm <= 0 || tokTotal + tokens <= (tpm * 0.95).toLong
        if (rpmOk && tpmOk) {
          events.append((now, tokens)); tokTotal += tokens; done = true
        } else {
          val sleepMs = events.headOption.map(h => windowMs - (now - h._1)).getOrElse(100L)
          lock.wait(math.max(10L, math.min(sleepMs, 1000L)))
        }
      }
    }
  }
}

object RateGovernor {
  /** Per-executor share of a global budget. */
  def perExecutor(globalRpm: Int, globalTpm: Int, numExecutors: Int): RateGovernor =
    new RateGovernor(
      if (globalRpm <= 0) 0 else math.max(1, globalRpm / math.max(1, numExecutors)),
      if (globalTpm <= 0) 0 else math.max(1, globalTpm / math.max(1, numExecutors)))
}
