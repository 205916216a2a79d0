package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: every SparkEntry query timed on SPARK_GRAFT_SF_DIR, one
  * JSON line on stdout. Contention defense (a recorded round-4 run was 2-3×
  * inflated by a busy machine and unusable): each query runs
  * SPARK_GRAFT_BENCH_PASSES times (default 3) and reports the PER-QUERY
  * MEDIAN, and the machine's /proc/loadavg is recorded before and after so
  * a contended run is self-evident in the output.
  *
  * The JSON is also written to `BENCH_LAST.json` in the working directory
  * (timings rounded to ms, so the line is compact) — a tail-truncated stdout
  * capture can no longer lose the record. `SPARK_GRAFT_BENCH_ONLY=a,b`
  * restricts to named queries for dev iteration.
  */
object Bench {

  private def loadAvg(): Double =
    try {
      val src = scala.io.Source.fromFile("/proc/loadavg")
      try src.mkString.split("\\s+")(0).toDouble finally src.close()
    } catch { case _: Exception => -1.0 }

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n == 0) -1.0
    else if (n % 2 == 1) s(n / 2)
    else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val passes = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/codegen paths so the first measured query isn't charged
    // for session bootstrap.
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    val loadBefore = loadAvg()
    // Passes alternate over the whole query set (A B C, A B C) rather than
    // repeating each query back-to-back, so a transient machine spike
    // inflates at most one pass of each query — which the median discards.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val timings = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    for (_ <- 1 to passes; (name, fn) <- names) {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      timings(name) = timings(name) :+ (System.nanoTime() - t0) / 1e9
    }
    val loadAfter = loadAvg()
    def ms(v: Double): Double = math.round(v * 1000).toDouble / 1000
    val results = names.map { case (name, _) => name -> ms(median(timings(name))) }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = ms(if (results.nonEmpty) results.map(_._2).sum else 0.0)
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","passes":$passes,"loadavg_before":$loadBefore,"loadavg_after":$loadAfter}"""
    println(json)
    // Self-contained record regardless of the caller's capture window.
    try java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_LAST.json"),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case _: Exception => () }
    spark.stop()
  }
}
