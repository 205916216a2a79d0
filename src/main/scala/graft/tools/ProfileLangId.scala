package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase timings for the lang-ID NB at a blow-up — which leg (gram
  * aggregate at fit time vs per-row scoring) carries the cost.
  */
object ProfileLangId {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SCALE_PREBUILT",
      sys.error("set SPARK_GRAFT_SCALE_PREBUILT"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = spark.read.parquet(s"$dir/documents.parquet")
    def time[A](tag: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[profile] $tag: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    time("count")(d.count())
    val m = time("trainLangNB")(
      graft.operators.QualityClassifier.trainLangNB(d, "text", "lang"))
    println(s"[profile] vocab=${m.logLik.size} classes=${m.classes.size}")
    time("scoreLangNB")(
      graft.operators.QualityClassifier.scoreLangNB(d, "text", m)
        .select(count(lit(1)), sum(col("lang_score"))).head())
    spark.stop()
  }
}
