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
}
