package graft.plan

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Operator-result cache (reference cache layer 2, lotus/cache.py:33-100:
  * operator outputs keyed on serialized df + args; the LazyFrame content
  * cache at run.py:128-160 is the same idea one level up).
  *
  * Spark-native form: results persist as parquet under
  * `dir/<key>`, keyed on (input plan semantic hash, operator config). A hit
  * skips the entire operator — including its LLM calls — across jobs AND
  * across JVM restarts, which the executor-local response cache cannot do.
  * The write-then-read-back also makes downstream consumption
  * replay-stable (reads are from immutable files, never a recompute).
  */
object OpCache {

  /** Cache key from the input frame's semantic plan hash + config strings.
    * `semanticHash` is stable across identical logical plans, so the same
    * source + same operator config hits across runs.
    */
  def keyFor(input: DataFrame, parts: String*): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.update(input.semanticHash().toString.getBytes("UTF-8"))
    parts.foreach { p => md.update(0.toByte); md.update(p.getBytes("UTF-8")) }
    java.util.Base64.getUrlEncoder.withoutPadding.encodeToString(md.digest()).take(24)
  }

  /** Run `build` unless `dir/<key>` already holds its result. */
  def cached(spark: SparkSession, dir: String, key: String)(build: => DataFrame): DataFrame = {
    val path = s"$dir/$key"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(path, "_SUCCESS"))) {
      spark.read.parquet(path)
    } else {
      build.write.mode("overwrite").parquet(path)
      spark.read.parquet(path)
    }
  }
}
