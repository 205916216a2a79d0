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
