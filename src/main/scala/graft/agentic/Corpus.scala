package graft.agentic

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** The agentic layer's data model (reference lotus/corpus/__init__.py:24-84):
  * a corpus is a collection of [[CorpusUnit]]s; loaders build it from raw
  * text, files, or DataFrames. Spark-native: `Dataset[CorpusUnit]`.
  */
final case class CorpusUnit(
    id: String,
    content: String,
    metadata: Map[String, String] = Map.empty)

object Corpus {

  def fromText(spark: SparkSession, texts: Seq[String]): Dataset[CorpusUnit] = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => CorpusUnit(i.toString, t) }.toDS()
  }

  /** Chunk one long text into fixed-size units (reference default 4000 chars). */
  def fromSingleText(spark: SparkSession, text: String, chunkSize: Int = 4000): Dataset[CorpusUnit] = {
    import spark.implicits._
    text.grouped(chunkSize).zipWithIndex
      .map { case (t, i) => CorpusUnit(s"chunk-$i", t) }.toSeq.toDS()
  }

  /** Each row becomes a unit with "col: value" lines (reference from_dataframe). */
  def fromDataFrame(df: DataFrame, idCol: Option[String] = None): Dataset[CorpusUnit] = {
    val spark = df.sparkSession
    import spark.implicits._
    val cols = df.columns
    val idIdx = idCol.map(c => cols.indexOf(c))
    df.rdd.zipWithUniqueId().map { case (row, uid) =>
      val id = idIdx.map(i => String.valueOf(row.get(i))).getOrElse(uid.toString)
      val content = cols.indices
        .map(i => s"${cols(i)}: ${String.valueOf(row.get(i))}").mkString("\n")
      CorpusUnit(id, content)
    }.toDS()
  }

  /** One unit per file (id = path). Text files only; binary formats should go
    * through [[graft.connectors.DirectoryReaderLite]] first.
    */
  def fromFiles(spark: SparkSession, pathGlob: String): Dataset[CorpusUnit] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(pathGlob)
      .select("path", "content")
      .map { r =>
        CorpusUnit(r.getString(0), new String(r.getAs[Array[Byte]](1), "UTF-8"))
      }
  }
}
