package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: dump physical plans of representative queries to verify the
  * scale-critical properties — parquet filter/column pushdown, broadcast
  * joins for dims, TakeOrderedAndProject for top-k, no stray cartesian
  * products, wide WholeStageCodegen spans.
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q1_agg", "q2_join_agg", "q3_topn", "q6_filter", "sem_filter_kw",
        "sem_sim_join_cos", "dedup_minhash", "agg_skew_distinct",
        "sample_reservoir_key", "split_train_holdout", "corpus_diff_snapshots",
        "events_asof_nearest", "text_line_stats")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      try graft.Queries.queries(n)(spark, dir).explain("formatted")
      catch { case e: Throwable => println(s"failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
