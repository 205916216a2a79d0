package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Container-format throughput at scale: WebDataset tar shards and WET
  * gzip segments, write + full read-back over a prebuilt blow-up corpus.
  * The shard/segment count is sized to the executor count (one streamed
  * file per task — the designed granularity), so the record answers the
  * 100 TB question directly: what does exporting and re-reading a corpus
  * slice cost per docs/second when every task streams one container?
  *
  * Usage:
  *   SPARK_GRAFT_SCALE_PREBUILT=/tmp/graft_scaleNNN \
  *     sbt -batch "runMain graft.tools.IoScaleBench"
  */
object IoScaleBench {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SCALE_PREBUILT",
      sys.error("set SPARK_GRAFT_SCALE_PREBUILT to a blow-up dir"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = ScaleStress.sfLabel(dir, dir, 0, 0.0)
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("key", format_string("%012d", col("doc_id")))
      .withColumn("uri", concat(lit("http://docs/"), col("doc_id")))
    val nDocs = d.count()
    val shards = cpus.toInt
    def time[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val tarDir = java.nio.file.Files.createTempDirectory("graft_io_tar").toString
    val (_, tarWriteSec) = time(graft.connectors.TarShards.writeShards(
      d, "key", Map("txt" -> col("text")), tarDir, shards))
    val (tarRows, tarReadSec) = time(
      graft.connectors.TarShards.readShards(spark, tarDir + "/*.tar").count())
    require(tarRows == nDocs, s"tar roundtrip lost rows: $tarRows vs $nDocs")
    val wetDir = java.nio.file.Files.createTempDirectory("graft_io_wet").toString
    val (_, wetWriteSec) = time(graft.connectors.WarcLite.writeWetSegments(
      d, "key", "uri", "text", wetDir, shards, date = "2026-01-01T00:00:00Z"))
    val (wetRows, wetReadSec) = time(
      graft.connectors.WarcLite.toDf(spark, wetDir + "/*.warc.gz").count())
    require(wetRows == nDocs, s"wet roundtrip lost rows: $wetRows vs $nDocs")
    val wholeDir = java.nio.file.Files.createTempDirectory("graft_io_wetw").toString
    val (_, wetWholeSec) = time(graft.connectors.WarcLite.writeWetSegments(
      d, "key", "uri", "text", wholeDir, shards,
      date = "2026-01-01T00:00:00Z", memberPerRecord = false))
    val (wetWholeRows, wetWholeReadSec) = time(
      graft.connectors.WarcLite.toDf(spark, wholeDir + "/*.warc.gz").count())
    require(wetWholeRows == nDocs,
      s"whole-member wet roundtrip lost rows: $wetWholeRows vs $nDocs")
    val rec = s"""{"metric":"io_container_scale","sf":"$sf","docs":$nDocs,""" +
      s""""shards":$shards,"tar_write_sec":$tarWriteSec,""" +
      s""""tar_read_sec":$tarReadSec,"wet_write_sec":$wetWriteSec,""" +
      s""""wet_read_sec":$wetReadSec,"wet_whole_write_sec":$wetWholeSec,""" +
      s""""wet_whole_read_sec":$wetWholeReadSec}"""
    println(rec)
    try
      java.nio.file.Files.write(
        java.nio.file.Paths.get("BENCH_HISTORY.jsonl"),
        (rec + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    catch { case _: Exception => () }
    spark.stop()
  }
}
