package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingOps

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) = new java.sql.Timestamp(1700000000000L + min * 60000L)

  test("windowed event counts aggregate with watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")
    val agg = StreamingOps.windowedEventCounts(events, window_ = "5 minutes")
    val q = agg.writeStream.outputMode("complete").format("memory")
      .queryName("win_out").start()
    input.addData((ts(0), "click", 1.0), (ts(1), "click", 2.0), (ts(6), "view", 5.0))
    q.processAllAvailable()
    val rows = spark.sql("SELECT event_type, n, total_value FROM win_out")
      .as[(String, Long, Double)].collect().toSet
    q.stop()
    assert(rows == Set(("click", 2L, 3.0), ("view", 1L, 5.0)))
  }

  test("stream-stream interval join holds state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val views = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val joined = StreamingOps.streamIntervalJoin(
      clicks.toDF().toDF("click_id", "user_id", "cts"),
      views.toDF().toDF("view_id", "v_user_id", "vts"),
      Seq("user_id"), Seq("v_user_id"), "cts", "vts",
      before = "30 minutes", after = "0 seconds", watermark = "1 hour")
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("ij_out").start()
    // Batch 1: a click with no view yet, and a view with no click yet.
    clicks.addData((100L, 1L, ts(40)))
    views.addData((200L, 2L, ts(10)))
    q.processAllAvailable()
    // Batch 2: the late counterparts — a view inside click 100's window
    // (state held across the batch boundary, both directions), a click
    // whose window covers view 200, and an out-of-window view for user 1.
    views.addData((201L, 1L, ts(20)), (202L, 1L, ts(5)))
    clicks.addData((101L, 2L, ts(15)))
    q.processAllAvailable()
    val got = spark.sql("SELECT click_id, view_id FROM ij_out")
      .as[(Long, Long)].collect().toSet
    q.stop()
    assert(got == Set((100L, 201L), (101L, 200L)),
      s"state must survive the batch boundary in both directions; got $got")
  }

  test("semantic filter and map run over a stream") {
    import graft.core.Sem
    import graft.llm.{FakeBehavior, FakeLM}
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("id", "text")
    val piped = Sem.withLM(FakeLM(FakeBehavior.KeywordFilter("spark"))) {
      val kept = StreamingOps.semFilterStream(docs, "the {text} mentions spark")
      Sem.withLM(FakeLM(FakeBehavior.FirstWords("Text", 2))) {
        StreamingOps.semMapStream(kept, "lead words of {text}", suffix = "_lead")
      }
    }
    val q = piped.writeStream.outputMode("append").format("memory")
      .queryName("sem_stream_out").start()
    input.addData((1L, "spark streaming rocks"), (2L, "flink only here"),
      (3L, "more spark data"))
    q.processAllAvailable()
    val rows = spark.sql("SELECT id, _lead FROM sem_stream_out")
      .as[(Long, String)].collect().toSet
    q.stop()
    assert(rows == Set((1L, "spark streaming"), (3L, "more spark")))
  }

  test("corpus hygiene runs on a stream: PII redaction + bloom decontamination per micro-batch") {
    // Both ops are stateless per-row expressions (regex chain, bloom probe),
    // so the same columns drop into a Structured Streaming pipeline
    // unchanged — streaming ingest can scrub and screen before landing.
    implicit val sqlCtx = spark.sqlContext
    val evalSet = Seq((0L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val evalG = evalSet.select(explode(
      graft.operators.Decontaminate.gramHashes(col("text"), 5)).as("__g")).distinct()
    val bloom = evalG.stat.bloomFilter("__g", 16L, 1e-4)
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("id", "text")
    val scrubbed = docs
      .withColumn("red", graft.functions.TextFunctions.redactPii(col("text")))
      .withColumn("contam", graft.functions.BloomExpr.bloomContainsCount(
        graft.operators.Decontaminate.gramHashes(col("text"), 5), bloom))
    val q = scrubbed.writeStream.outputMode("append").format("memory")
      .queryName("hygiene_out").start()
    input.addData(
      (1L, "mail bob@corp.io about alpha beta gamma delta epsilon zeta today"),
      (2L, "clean text with none of the eval material inside it"))
    q.processAllAvailable()
    val rows = spark.sql("SELECT id, red, contam FROM hygiene_out")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    q.stop()
    assert(rows(0)._2.startsWith("mail <EMAIL> about"))
    assert(rows(0)._3 >= 1L, s"streamed doc sharing eval 5-grams must flag: ${rows(0)}")
    assert(rows(1)._3 == 0L)
  }

  test("stream dedups against a saved corpus index: exact drops, near-dups flagged") {
    implicit val sqlCtx = spark.sqlContext
    val old = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "the quick brown fox jumps over the lazy dog today")
    ).toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("stream_incr").toString + "/idx"
    graft.operators.Dedup.saveDedupIndex(old, "text", "doc_id", path)
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("id", "text")
    val out = StreamingOps.streamDropAgainstIndex(docs, "text", path)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("incr_out").start()
    input.addData(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),   // exact dup -> dropped
      (3L, "the quick brown fox jumps over the lazy dog now"), // near dup -> flagged
      (5L, "entirely novel streaming document content here"))  // clean
    q.processAllAvailable()
    val rows = spark.sql("SELECT id, maybe_near_dup FROM incr_out")
      .as[(Long, Boolean)].collect().sortBy(_._1)
    q.stop()
    assert(rows.map(_._1).toSeq == Seq(3L, 5L), s"exact dup must drop: ${rows.toSeq}")
    assert(rows(0)._2, "near dup of an indexed doc must flag for batch verify")
    assert(!rows(1)._2, "novel doc must not flag")
  }

  test("stream dedup Bloom degrades bands under a memory budget; near-dups still flag") {
    implicit val sqlCtx = spark.sqlContext
    // Budget sized to fit ~4 of the 16 bands: the prefilter must shrink the
    // probed band set rather than build an over-budget filter. The near-dup
    // is periodic text two words longer than its indexed twin: its DISTINCT
    // shingle set is identical (J = 1 → equal minhash signature), so it
    // flags through ANY band subset — deterministic under degradation.
    val old = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "rep one rep one rep one rep one")
    ).toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("stream_incr_budget").toString + "/idx"
    graft.operators.Dedup.saveDedupIndex(old, "text", "doc_id", path)
    val budget = StreamingOps.bloomBytes(2L * 4, 1e-6)
    assert(StreamingOps.bandsWithinBudget(2L, 16, 1e-6, budget).contains(4))
    // A budget below even ONE band must refuse, not "degrade" into the
    // blow-up the guard exists to prevent.
    assert(StreamingOps.bandsWithinBudget(1000000L, 16, 1e-6, 8).isEmpty)
    intercept[IllegalArgumentException] {
      StreamingOps.streamDropAgainstIndex(
        spark.readStream.format("rate").load().selectExpr("cast(value as string) as text"),
        "text", path, maxBloomBytes = 1)
    }
    // Guard path: degradeBands=false refuses loudly instead of degrading.
    val err = intercept[IllegalArgumentException] {
      StreamingOps.streamDropAgainstIndex(
        spark.readStream.format("rate").load().selectExpr("cast(value as string) as text"),
        "text", path, maxBloomBytes = budget, degradeBands = false)
    }
    assert(err.getMessage.contains("raise"), err.getMessage)
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("id", "text")
    val out = StreamingOps.streamDropAgainstIndex(docs, "text", path,
      maxBloomBytes = budget)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("incr_budget_out").start()
    input.addData(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"), // exact dup -> dropped
      (3L, "rep one rep one rep one rep one rep one"),       // shingle-set dup -> flagged
      (5L, "entirely novel streaming document content here")) // clean
    q.processAllAvailable()
    val rows = spark.sql("SELECT id, maybe_near_dup FROM incr_budget_out")
      .as[(Long, Boolean)].collect().sortBy(_._1)
    q.stop()
    assert(rows.map(_._1).toSeq == Seq(3L, 5L), s"exact dup must drop: ${rows.toSeq}")
    assert(rows(0)._2, "near dup must flag through the degraded band subset")
    assert(!rows(1)._2, "novel doc must not flag")
  }

  test("stream of embeddings grows a saved IVF index across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import graft.embed.IvfIndex
    import graft.operators.EmbedOps
    def vec(seedAxis: Int): Seq[Float] =
      Seq.tabulate(8)(d => if (d == seedAxis) 1.0f else 0.05f)
    val base = Seq((0L, vec(0)), (1L, vec(1)), (2L, vec(2)))
      .toDF("id", EmbedOps.vecCol("emb"))
    val path = java.nio.file.Files.createTempDirectory("stream_ivf").toString + "/idx"
    val (indexed, model) = IvfIndex.build(base, "emb", nCells = 2, seed = 7)
    IvfIndex.save(indexed, model, "emb", "id", path)
    indexed.unpersist()
    val input = MemoryStream[(Long, Seq[Float])]
    val stream = input.toDF().toDF("id", EmbedOps.vecCol("emb"))
    val q = StreamingOps.streamAppendToIndex(stream, "emb", "id", path).start()
    input.addData((10L, vec(3)), (11L, vec(4)))
    q.processAllAvailable()
    input.addData((12L, vec(5)))
    q.processAllAvailable()
    q.stop()
    val (loaded, lModel) = IvfIndex.load(spark, path)
    assert(loaded.count() == 6, "both micro-batches must be appended")
    val hit = IvfIndex.search(loaded, lModel, "emb", vec(5), k = 1, nProbe = 2)
      .select("id").as[Long].head()
    assert(hit == 12L, "a vector ingested by the stream must be findable")
  }

  test("streamAppendToIndex refuses a batch id below the mark (foreign lineage)") {
    implicit val sqlCtx = spark.sqlContext
    import graft.embed.IvfIndex
    import graft.operators.EmbedOps
    def vec(a: Int): Seq[Float] = Seq.tabulate(8)(d => if (d == a) 1.0f else 0.05f)
    val base = Seq((0L, vec(0)), (1L, vec(1))).toDF("id", EmbedOps.vecCol("emb"))
    val path = java.nio.file.Files.createTempDirectory("stream_ivf_lineage").toString + "/idx"
    val (indexed, model) = IvfIndex.build(base, "emb", nCells = 2, seed = 7)
    IvfIndex.save(indexed, model, "emb", "id", path)
    indexed.unpersist()
    // An older lineage grew this index to batch 5; a FRESH checkpoint
    // restarts at batch 0 — skipping it would silently swallow data.
    java.nio.file.Files.write(java.nio.file.Paths.get(path, "stream_batch_id"),
      "5:done".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val input = MemoryStream[(Long, Seq[Float])]
    val stream = input.toDF().toDF("id", EmbedOps.vecCol("emb"))
    val q = StreamingOps.streamAppendToIndex(stream, "emb", "id", path).start()
    input.addData((20L, vec(3)))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
    }
    q.stop()
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: chain(t.getCause)
    assert(chain(e).exists(m => m != null && m.contains("different stream lineage")),
      s"expected the lineage refusal, got: ${chain(e)}")
  }

  test("streamAppendToIndex begin-mark replay recovers without duplicate vectors") {
    implicit val sqlCtx = spark.sqlContext
    import graft.embed.IvfIndex
    import graft.operators.EmbedOps
    def vec(a: Int): Seq[Float] = Seq.tabulate(8)(d => if (d == a) 1.0f else 0.05f)
    val base = Seq((0L, vec(0)), (1L, vec(1)), (2L, vec(2)))
      .toDF("id", EmbedOps.vecCol("emb"))
    val path = java.nio.file.Files.createTempDirectory("stream_ivf_replay").toString + "/idx"
    val (indexed, model) = IvfIndex.build(base, "emb", nCells = 2, seed = 7)
    IvfIndex.save(indexed, model, "emb", "id", path)
    indexed.unpersist()
    // Simulate a crash of batch 0 mid-append: a PREFIX of the batch (rows
    // 10 and 11) landed under the stream0 commit token, both the append
    // mark and the stream mark still say begin.
    IvfIndex.append(Seq((10L, vec(3)), (11L, vec(4))).toDF("id", EmbedOps.vecCol("emb")),
      "emb", "id", path, token = Some("stream0"))
    graft.core.BatchCommit.writeMark(spark, path, "stream0", done = false, Map.empty)
    java.nio.file.Files.write(java.nio.file.Paths.get(path, "stream_batch_id"),
      "0:begin".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val input = MemoryStream[(Long, Seq[Float])]
    val stream = input.toDF().toDF("id", EmbedOps.vecCol("emb"))
    val q = StreamingOps.streamAppendToIndex(stream, "emb", "id", path).start()
    // The redelivered batch: the two already-present ids plus one new one.
    input.addData((10L, vec(3)), (11L, vec(4)), (12L, vec(5)))
    q.processAllAvailable()
    q.stop()
    val (loaded, _) = IvfIndex.load(spark, path)
    assert(loaded.count() == 6,
      "the partial adoption must be cleaned up and the batch redone exactly-once")
    assert(loaded.select("id").as[Long].collect().count(_ == 10L) == 1,
      "an already-present id must appear exactly once")
    val mark = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path, "stream_batch_id")),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(mark == "0:done", s"mark must advance to done, got $mark")
  }

  test("streaming dedup drops repeated keys within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long)]
    val events = input.toDF().toDF("ts", "event_id")
    val dd = StreamingOps.streamingDedup(events, Seq("event_id"))
    val q = dd.writeStream.outputMode("append").format("memory")
      .queryName("dedup_out").start()
    input.addData((ts(0), 1L), (ts(1), 1L), (ts(2), 2L))
    q.processAllAvailable()
    val n = spark.sql("SELECT count(*) FROM dedup_out").as[Long].head()
    q.stop()
    assert(n == 2)
  }

  test("event-time sessionize: in-batch gap splits, watermark closes, open sessions hold") {
    implicit val sqlCtx = spark.sqlContext
    def t(ms: Long) = new java.sql.Timestamp(ms)
    val input = MemoryStream[(java.sql.Timestamp, Long, String, Double)]
    val events = input.toDF().toDF("ts", "user_id", "event_type", "value")
      .withWatermark("ts", "0 seconds").as[StreamingOps.Event]
    val sessions = StreamingOps.sessionizeEventTime(events, gapMs = 5000L)
    val q = sessions.writeStream.outputMode("append").format("memory")
      .queryName("sess_out").start()
    // Batch 1: user 1 has two events 1s apart then one 8s later (in-batch
    // split → first session closes WITHOUT any watermark help); user 2 one
    // event (stays open).
    input.addData(
      (t(1000), 1L, "c", 1.0), (t(2000), 1L, "c", 2.0), (t(10000), 1L, "c", 3.0),
      (t(1500), 2L, "c", 5.0))
    q.processAllAvailable()
    // Batch 2: a far-future event advances the watermark past every open
    // timeout except its own — the engine's follow-up no-data batch fires
    // the event-time timeouts.
    input.addData((t(50000), 3L, "c", 7.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.sql(
      "SELECT user_id, session_start, session_end, n_events, total_value FROM sess_out")
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    assert(got == Set(
      (1L, 1000L, 2000L, 2L, 3.0),   // split inside batch 1
      (1L, 10000L, 10000L, 1L, 3.0), // closed by the watermark
      (2L, 1500L, 1500L, 1L, 5.0)),  // closed by the watermark
      s"user 3's session must stay open: $got")
  }
}
