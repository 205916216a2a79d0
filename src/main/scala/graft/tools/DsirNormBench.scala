package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures what a caller-supplied normalizer saves
  * [[graft.operators.QualityClassifier.importanceResample]] at scale —
  * the ×1000 record behind the `normalizer` parameter's doc claim. The
  * auto path runs the dsirLogWeights fold TWICE (a max() projection,
  * then the acceptance filter); the normalized path runs it once. A
  * caller amortizes the max across epochs/batches over the same fit (or
  * supplies an analytic bound), so the fair comparison is fold+fold vs
  * fold, with the one-off max scan reported separately.
  *
  * Usage (reuses a prebuilt blow-up):
  *   SPARK_GRAFT_SCALE_PREBUILT=/tmp/graft_scaleNNN \
  *     sbt -batch "runMain graft.tools.DsirNormBench"
  */
object DsirNormBench {
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
    // The dsir_resample gate's fit, on the blow-up corpus.
    val m = graft.operators.QualityClassifier.fitDsir(
      d, d.filter(col("source").isin("src0", "src1", "src2", "src3", "src4")),
      "text")
    val w = graft.operators.QualityClassifier.dsirLogWeights(d, "text", m)
    def time[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }
    // Warm the scan cache once so neither path pays first-touch IO.
    w.select(count(lit(1))).head()
    val (mx, maxSec) = time(
      w.agg(max(col("dsir_logw"))).head().getDouble(0))
    val (nAuto, autoSec) = time(
      graft.operators.QualityClassifier.importanceResample(
        w, "doc_id", "dsir_logw", salt = "s7").count())
    val (nNorm, normSec) = time(
      graft.operators.QualityClassifier.importanceResample(
        w, "doc_id", "dsir_logw", salt = "s7",
        normalizer = Some(mx)).count())
    require(nAuto == nNorm,
      s"normalized path must keep the same rows: $nAuto vs $nNorm")
    val rec = s"""{"metric":"dsir_resample_norm","sf":"$sf",""" +
      s""""rows_kept":$nNorm,"auto_sec":$autoSec,"norm_sec":$normSec,""" +
      s""""max_scan_sec":$maxSec}"""
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
