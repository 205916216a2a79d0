package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.Sem
import graft.llm.{FakeBehavior, FakeLM}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001: a semantic pipeline — filter
    * documents mentioning spark (FakeLM), map out their lead words, then a
    * classical group-count per language. Driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    Sem.withLM(FakeLM(FakeBehavior.KeywordFilter("spark"))) {
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      val filtered = docs.semFilter("the {text} mentions a certain data engine")
      val mapped = Sem.withLM(FakeLM(FakeBehavior.FirstWords("Text", 3))) {
        filtered.semMap("give the first three words of {text}", suffix = "_lead")
      }
      mapped.groupBy("lang").agg(count(lit(1)).as("n_docs")).orderBy("lang")
    }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.oracleSql
}
