package graft.connectors

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Data connectors (reference lotus/data_connectors/connectors.py:11-87):
  * SQL databases via JDBC and object-store/file loads by format. Thin,
  * typed wrappers over Spark's native readers — credentials and parallelism
  * (partitionColumn bounds for JDBC) are first-class because at scale a
  * single-threaded JDBC read is a bottleneck.
  */
object DataConnectors {

  /** `load_from_db`: JDBC query → DataFrame. `partitionOn` enables parallel
    * reads (numPartitions range-partitioned on the column).
    */
  def loadFromDb(
      spark: SparkSession,
      url: String,
      query: String,
      user: String = "",
      password: String = "",
      partitionOn: Option[(String, Long, Long, Int)] = None
  ): DataFrame = {
    var r = spark.read.format("jdbc").option("url", url)
    if (user.nonEmpty) r = r.option("user", user).option("password", password)
    partitionOn match {
      case Some((colName, lower, upper, n)) =>
        // Spark's JDBC source refuses `query` together with partitionColumn;
        // a partitioned read must go through dbtable, so wrap the query as a
        // derived table (the partition column must be in its select list).
        r = r.option("dbtable", s"($query) graft_sub")
          .option("partitionColumn", colName)
          .option("lowerBound", lower).option("upperBound", upper)
          .option("numPartitions", n)
      case None =>
        r = r.option("query", query)
    }
    r.load()
  }

  /** `load_from_s3` (and any hadoop-fs path): format-dispatched load.
    * Credentials go through hadoop configuration, not per-call options, so
    * they apply cluster-wide.
    */
  def loadPath(spark: SparkSession, path: String, format: String = "",
      options: Map[String, String] = Map.empty): DataFrame = {
    val fmt = if (format.nonEmpty) format else path.split('.').lastOption.getOrElse("parquet")
    val reader = spark.read.options(options)
    fmt match {
      case "csv"            => reader.option("header", "true").option("inferSchema", "true").csv(path)
      case "tsv"            => reader.option("header", "true").option("sep", "\t").csv(path)
      case "json" | "jsonl" => reader.json(path)
      case "parquet"        => reader.parquet(path)
      case "orc"            => reader.orc(path)
      case "txt" | "text"   => reader.text(path)
      case other            => reader.format(other).load(path)
    }
  }

  def configureS3(spark: SparkSession, accessKey: String, secretKey: String,
      endpoint: String = ""): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.s3a.access.key", accessKey)
    conf.set("fs.s3a.secret.key", secretKey)
    if (endpoint.nonEmpty) conf.set("fs.s3a.endpoint", endpoint)
  }
}

/** Directory reader (reference lotus/file_extractors/directory_reader.py):
  * files/dirs → DataFrame of extracted pages. Text-bearing formats are
  * extracted inline; binary document formats (pdf/pptx/docx) go through a
  * pluggable per-extension extractor so a deployment can drop in pdfbox/poi
  * on the executor classpath. Extraction runs distributed over
  * `binaryFile` rows — never on the driver.
  */
object DirectoryReaderLite {

  type Extractor = Array[Byte] => Seq[String] // bytes → pages

  private val textExts = Set("txt", "md", "csv", "json", "xml", "log")

  def defaultExtractors: Map[String, Extractor] = Map(
    // Built-in zero-dependency extraction: PdfLite for simple text PDFs,
    // OoxmlLite for pptx/docx/xlsx (ZIP+XML) and epub (ZIP+XHTML), tag
    // stripping for html; swap in pdfbox/poi for exotic encodings.
    "pdf" -> (bytes => {
      val pages = PdfLite.extractText(bytes)
      if (pages.nonEmpty) pages else Seq(s"[pdf ${bytes.length} bytes: no extractable text]")
    }),
    "pptx" -> (bytes => {
      val pages = OoxmlLite.extractPptx(bytes)
      if (pages.nonEmpty) pages else Seq(s"[pptx ${bytes.length} bytes: no extractable text]")
    }),
    "docx" -> (bytes => {
      val pages = OoxmlLite.extractDocx(bytes)
      if (pages.nonEmpty) pages else Seq(s"[docx ${bytes.length} bytes: no extractable text]")
    }),
    "xlsx" -> (bytes => {
      val pages = OoxmlLite.extractXlsx(bytes)
      if (pages.nonEmpty) pages else Seq(s"[xlsx ${bytes.length} bytes: no extractable text]")
    }),
    "epub" -> (bytes => {
      val pages = OoxmlLite.extractEpub(bytes)
      if (pages.nonEmpty) pages else Seq(s"[epub ${bytes.length} bytes: no extractable text]")
    }),
    "html" -> (bytes => Seq(WebSearchEngines.extractText(new String(bytes, "UTF-8")))),
    "htm" -> (bytes => Seq(WebSearchEngines.extractText(new String(bytes, "UTF-8"))))
  )

  /** Magic-byte content sniffing for extension-less/unknown files — the
    * zero-dependency analogue of the reference's `magic`-based
    * `get_extension` (directory_reader.py:43-69). ZIP containers are
    * disambiguated by their entry layout (word/ → docx, ppt/ → pptx,
    * xl/ → xlsx, mimetype application/epub+zip → epub).
    */
  def sniffExt(bytes: Array[Byte]): String = {
    def startsWith(sig: Array[Int]): Boolean =
      bytes.length >= sig.length && sig.indices.forall(i => (bytes(i) & 0xFF) == sig(i))
    if (startsWith(Array('%', 'P', 'D', 'F'))) "pdf"
    else if (startsWith(Array('P', 'K', 3, 4))) {
      val names = try OoxmlLite.zipEntryNames(bytes) catch { case _: Exception => Nil }
      if (names.exists(_.startsWith("word/"))) "docx"
      else if (names.exists(_.startsWith("ppt/"))) "pptx"
      else if (names.exists(_.startsWith("xl/"))) "xlsx"
      else if (names.contains("mimetype") &&
        (try OoxmlLite.zipEntriesWhere(bytes, _ == "mimetype")
          .exists(_._2.contains("application/epub+zip"))
        catch { case _: Exception => false })) "epub"
      else "zip"
    } else {
      val head = new String(bytes.take(512), "UTF-8").toLowerCase
      if (head.contains("<html") || head.contains("<!doctype html")) "html"
      else {
        // Text detector: count C0 control bytes other than \t\n\r. UTF-8
        // multibyte sequences live in 0x80–0xFF (negative as signed bytes),
        // so they must NOT count against textiness — binaries betray
        // themselves through NUL and low control bytes.
        val ctl = bytes.take(512).count(b =>
          b >= 0 && b < 32 && b != '\t' && b != '\n' && b != '\r')
        if (bytes.isEmpty || ctl.toDouble / math.min(512, bytes.length) < 0.02) "txt"
        else "bin"
      }
    }
  }

  /** Read a path glob into (path, page_idx, content) rows. Files whose
    * extension is unknown are content-sniffed ([[sniffExt]]) before
    * extractor dispatch, like the reference's magic-based routing.
    */
  def toDf(spark: SparkSession, pathGlob: String,
      extractors: Map[String, Extractor] = defaultExtractors): DataFrame = {
    import spark.implicits._
    val ex = extractors
    // Keep the glob IN the load path (top-level matches only — rewriting it
    // as pathGlobFilter over the parent dir would silently pull in nested
    // files and mis-split scheme-rooted globs like hdfs:///x*). FileStreamSink
    // probes the literal glob string for a streaming-metadata dir and logs a
    // spurious FileNotFoundException stack trace per query; that known-noisy
    // logger is demoted once (and only if the user left it unconfigured).
    graft.core.LogLevels.quietFileStreamSinkProbe
    spark.read.format("binaryFile").load(pathGlob)
      .select("path", "content")
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val pathExt = path.split('.').lastOption.getOrElse("").toLowerCase
        val ext =
          if (textExts(pathExt) || ex.contains(pathExt)) pathExt
          else sniffExt(bytes)
        val pages =
          if (textExts(ext)) Seq(new String(bytes, "UTF-8"))
          else ex.get(ext) match {
            case Some(extract) => extract(bytes)
            // Sniffed binary/unknown containers must NOT decode as UTF-8 —
            // mojibake rows would poison embeddings and dedup downstream.
            case None if ext == "bin" || ext == "zip" =>
              Seq(s"[$ext ${bytes.length} bytes: no extractor]")
            case None => Seq(new String(bytes, "UTF-8"))
          }
        pages.zipWithIndex.map { case (p, i) => (path, i, p) }
      }
      .toDF("path", "page", "content")
  }
}

/** Web search connector surface (reference lotus/web_search.py:603-654):
  * engine-dispatched search → DataFrame with per-engine default columns.
  * Engines are driver-side HTTP calls; this environment is zero-egress, so
  * the only built-in engine is a deterministic local one for tests — the
  * dispatch and schema contract are the reusable part.
  */
object WebSearch {

  trait SearchEngine {
    def name: String
    /** Returns (title, url, snippet) triples. */
    def search(query: String, k: Int): Seq[(String, String, String)]
  }

  /** Deterministic offline engine over a provided corpus (word-overlap rank). */
  final case class LocalCorpusEngine(corpus: Seq[(String, String)]) extends SearchEngine {
    override def name: String = "local"
    override def search(query: String, k: Int): Seq[(String, String, String)] = {
      val qw = query.toLowerCase.split("\\s+").toSet
      corpus.map { case (title, body) =>
        val overlap = body.toLowerCase.split("\\s+").count(qw.contains)
        (overlap, title, body)
      }.sortBy(t => (-t._1, t._2)).take(k)
        .map { case (_, t, b) => (t, s"local://$t", b.take(200)) }
    }
  }

  def search(spark: SparkSession, engine: SearchEngine, query: String, k: Int): DataFrame = {
    import spark.implicits._
    engine.search(query, k).toDF("title", "url", "snippet")
  }
}
