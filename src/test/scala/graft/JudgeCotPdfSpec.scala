package graft

import org.apache.spark.sql.functions._
import graft.connectors.{DirectoryReaderLite, PdfLite}
import graft.core.Sem
import graft.llm._
import graft.operators.SemCore

/** DeepSeek-style fake: answers wrapped in <think> reasoning. */
final case class ThinkLM(answerOf: String => String) extends LMClient {
  override def modelName: String = "deepseek-r1-distill-test"
  override def complete(batch: Seq[LMRequest]): Seq[LMResult] =
    batch.map { r =>
      val f = DocParse.fields(r.context)
      LMResult(s"<think>pondering the doc</think>\nAnswer: ${answerOf(f.getOrElse("Text", ""))}")
    }
}

class JudgeCotPdfSpec extends SparkSpec {
  import spark.implicits._

  test("deepseek postprocessor splits <think> reasoning from the answer") {
    val df = Seq(
      ("<think>step by step</think>\nAnswer: yes indeed", "yes indeed", "step by step"),
      ("<think>hmm</think> trailing conclusion", "trailing conclusion", "hmm"),
      ("plain output no tags", "plain output no tags", "")
    ).toDF("raw", "expAns", "expReason")
    val got = df.select(
      SemCore.deepseekAnswerExpr(col("raw")).as("a"),
      SemCore.deepseekReasoningExpr(col("raw")).as("r"),
      col("expAns"), col("expReason")).collect()
    got.foreach { r =>
      assert(r.getString(0) == r.getString(2), r.toString)
      assert(r.getString(1) == r.getString(3), r.toString)
    }
  }

  test("semMap with a deepseek-r1 model uses the <think> parser") {
    val df = Seq((1L, "alpha beta")).toDF("id", "text")
    val out = Sem.withLM(ThinkLM(t => t.toUpperCase)) {
      df.semMap("shout {text}", strategy = graft.core.ReasoningStrategy.ZsCot,
        returnExplanations = true)
    }
    val row = out.select("_map", "explanation_map").as[(String, String)].head()
    assert(row._1 == "ALPHA BETA")
    assert(row._2 == "pondering the doc")
  }

  test("llmAsJudge validates response_format and structures trials") {
    val df = (0 until 6).map(i => (i.toLong, s"doc number $i")).toDF("id", "text")
    val out = Sem.withLM(FakeLM(FakeBehavior.ExtractStats("Text"))) {
      df.llmAsJudge("grade the {text}", nTrials = 2,
        responseFormat = Seq("first_word", "n_words"))
    }
    assert(out.columns.contains("_judge0") && out.columns.contains("_judge1"))
    val v = out.filter($"id" === 3).select("_judge0.first_word", "_judge1.n_words")
      .as[(String, String)].head()
    assert(v == ("doc", "3"))
    // Invalid (non-JSON) output must raise on materialization.
    val bad = Sem.withLM(FakeLM(FakeBehavior.Echo)) {
      df.llmAsJudge("grade the {text}", responseFormat = Seq("score"))
    }
    intercept[Exception] { bad.collect() }
    // CoT + response_format is rejected up front, like the reference.
    intercept[IllegalArgumentException] {
      Sem.withLM(FakeLM(FakeBehavior.Echo)) {
        graft.operators.Evals.llmAsJudge(df, "grade {text}",
          responseFormat = Seq("score"), strategy = graft.core.ReasoningStrategy.Cot)
      }
    }
  }

  test("PdfLite extracts Tj and TJ text from a generated pdf") {
    def obj(n: Int, body: String) = s"$n 0 obj $body endobj\n"
    val content = "BT /F1 12 Tf (Hello Graft) Tj (With \\(escapes\\)) Tj [(Seg)-250(mented)] TJ ET"
    val pdf = "%PDF-1.4\n" +
      obj(1, "<< /Type /Catalog /Pages 2 0 R >>") +
      obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>") +
      obj(3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>") +
      s"4 0 obj << /Length ${content.length} >>\nstream\n$content\nendstream endobj\n%%EOF\n"
    val pages = PdfLite.extractText(pdf.getBytes("ISO-8859-1"))
    assert(pages.nonEmpty)
    val text = pages.mkString("\n")
    assert(text.contains("Hello Graft"))
    assert(text.contains("With (escapes)"))
    assert(text.contains("Segmented"))
  }

  test("writeSimplePdf round-trips multi-page text through extractText, " +
      "escapes included, and carries a well-formed xref") {
    val pages = Seq("first page plain text",
      "second with (parens) and back\\slash",
      "third")
    val bytes = PdfLite.writeSimplePdf(pages)
    assert(PdfLite.isPdf(bytes))
    val got = PdfLite.extractText(bytes)
    assert(got == pages, s"round trip drifted: $got")
    // Structural sanity: one xref entry per object plus the free head, and
    // every recorded offset points at its object header.
    val raw = new String(bytes, "ISO-8859-1")
    assert(raw.contains("xref\n0 10\n")) // 3 fixed + 2×3 page objects + free
    val offs = "(\\d{10}) 00000 n".r.findAllMatchIn(raw)
      .map(_.group(1).toInt).toList
    offs.zipWithIndex.foreach { case (o, i) =>
      assert(raw.startsWith(s"${i + 1} 0 obj", o),
        s"xref offset $o does not point at object ${i + 1}")
    }
    assert(raw.endsWith("%%EOF\n"))
  }

  test("OoxmlLite extracts slide and document text from generated pptx/docx") {
    def zip(entries: (String, String)*): Array[Byte] = {
      val buf = new java.io.ByteArrayOutputStream()
      val zos = new java.util.zip.ZipOutputStream(buf)
      entries.foreach { case (name, content) =>
        zos.putNextEntry(new java.util.zip.ZipEntry(name))
        zos.write(content.getBytes("UTF-8"))
        zos.closeEntry()
      }
      zos.close()
      buf.toByteArray
    }
    val pptx = zip(
      "ppt/slides/slide2.xml" ->
        """<p:sld><p:txBody><a:p><a:r><a:t>Second slide</a:t></a:r></a:p></p:txBody></p:sld>""",
      "ppt/slides/slide1.xml" ->
        """<p:sld><p:txBody><a:p><a:r><a:t>Title &amp; intro</a:t></a:r><a:r><a:t>body</a:t></a:r></a:p></p:txBody></p:sld>""",
      "ppt/presentation.xml" -> "<p:presentation/>")
    val slides = graft.connectors.OoxmlLite.extractPptx(pptx)
    assert(slides == Seq("Title & intro body", "Second slide"))
    val docx = zip("word/document.xml" ->
      """<w:document><w:body><w:p><w:r><w:t>Hello</w:t></w:r><w:r><w:t>doc</w:t></w:r></w:p></w:body></w:document>""")
    assert(graft.connectors.OoxmlLite.extractDocx(docx) == Seq("Hello doc"))
    // Distributed through DirectoryReaderLite: one row per slide.
    val dir = java.nio.file.Files.createTempDirectory("graftpptx")
    java.nio.file.Files.write(dir.resolve("deck.pptx"), pptx)
    val df = graft.connectors.DirectoryReaderLite.toDf(spark, dir.toString + "/*.pptx")
    assert(df.count() == 2)
  }

  private def zipBytes(entries: (String, String)*): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(buf)
    entries.foreach { case (name, content) =>
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    zos.close()
    buf.toByteArray
  }

  test("OoxmlLite extracts xlsx sheets with shared and inline strings") {
    val xlsx = zipBytes(
      "xl/sharedStrings.xml" ->
        """<sst><si><t>Name</t></si><si><r><t>Ada</t></r><r><t> Lovelace</t></r></si></sst>""",
      "xl/worksheets/sheet1.xml" ->
        """<worksheet><sheetData>
          |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1"><v>42</v></c></row>
          |<row r="2"><c r="A2" t="s"><v>1</v></c><c r="B2" t="inlineStr"><is><t>inline!</t></is></c></row>
          |</sheetData></worksheet>""".stripMargin,
      "xl/workbook.xml" -> "<workbook/>")
    val pages = graft.connectors.OoxmlLite.extractXlsx(xlsx)
    assert(pages == Seq("Name, 42\nAda Lovelace, inline!"))
  }

  test("OoxmlLite extracts epub chapters as tag-stripped pages") {
    val epub = zipBytes(
      "mimetype" -> "application/epub+zip",
      "OEBPS/ch1.xhtml" ->
        "<html><body><h1>Chapter One</h1><p>It &amp; begins.</p></body></html>",
      "OEBPS/ch2.xhtml" -> "<html><body><p>The end.</p></body></html>")
    assert(graft.connectors.OoxmlLite.extractEpub(epub) ==
      Seq("Chapter One It & begins.", "The end."))
  }

  test("DirectoryReaderLite strips html tags and sniffs extension-less files") {
    import graft.connectors.DirectoryReaderLite
    val dir = java.nio.file.Files.createTempDirectory("graftdir")
    java.nio.file.Files.write(dir.resolve("page.html"),
      "<html><script>x()</script><body><p>Web body</p></body></html>".getBytes("UTF-8"))
    // extension-less file with PDF magic must route through the pdf extractor
    val pdfContent = "BT (Sniffed pdf text) Tj ET"
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(pdfContent.getBytes("ISO-8859-1")); deflater.finish()
    val dbuf = new Array[Byte](1024)
    val dn = deflater.deflate(dbuf)
    val compressed = new String(dbuf.take(dn), "ISO-8859-1")
    java.nio.file.Files.write(dir.resolve("noext"),
      ("%PDF-1.4\n" +
        s"4 0 obj << /Length $dn /Filter /FlateDecode >>\nstream\n$compressed\nendstream endobj\n%%EOF\n")
        .getBytes("ISO-8859-1"))
    // extension-less docx container sniffed by zip layout
    java.nio.file.Files.write(dir.resolve("mystery"), zipBytes("word/document.xml" ->
      """<w:document><w:body><w:p><w:r><w:t>Zip sniffed</w:t></w:r></w:p></w:body></w:document>"""))
    val out = DirectoryReaderLite.toDf(spark, dir.toString + "/*")
      .select("content").as[String].collect().mkString("\n")
    assert(out.contains("Web body") && !out.contains("<p>") && !out.contains("x()"))
    assert(out.contains("Sniffed pdf text"))
    assert(out.contains("Zip sniffed"))
  }

  test("sniffExt classifies magic bytes and zip layouts") {
    import graft.connectors.DirectoryReaderLite.sniffExt
    assert(sniffExt("%PDF-1.7".getBytes) == "pdf")
    assert(sniffExt(zipBytes("xl/workbook.xml" -> "<w/>")) == "xlsx")
    assert(sniffExt(zipBytes("ppt/presentation.xml" -> "<p/>")) == "pptx")
    assert(sniffExt(zipBytes("mimetype" -> "application/epub+zip")) == "epub")
    assert(sniffExt("<!DOCTYPE html><html></html>".getBytes) == "html")
    assert(sniffExt("plain words here".getBytes) == "txt")
    assert(sniffExt(Array[Byte](0, 1, 2, 3, -1, -2)) == "bin")
  }

  test("PdfLite inflates FlateDecode streams; DirectoryReaderLite extracts distributed") {
    val content = "BT (Compressed page text) Tj ET"
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(content.getBytes("ISO-8859-1")); deflater.finish()
    val buf = new Array[Byte](1024)
    val m = deflater.deflate(buf)
    val compressed = new String(buf.take(m), "ISO-8859-1")
    val pdf = "%PDF-1.4\n" +
      s"4 0 obj << /Length $m /Filter /FlateDecode >>\nstream\n$compressed\nendstream endobj\n%%EOF\n"
    val dir = java.nio.file.Files.createTempDirectory("graftpdf")
    java.nio.file.Files.write(dir.resolve("doc.pdf"), pdf.getBytes("ISO-8859-1"))
    val df = DirectoryReaderLite.toDf(spark, dir.toString + "/*.pdf")
    val text = df.select("content").as[String].collect().mkString("\n")
    assert(text.contains("Compressed page text"))
  }

  test("retrievalMetrics: textbook values, and judged-but-unretrieved " +
      "queries appear as zero rows") {
    import graft.operators.Evals
    // q1: relevant docs 10 (grade 2) and 11 (grade 1); retrieved at ranks
    // 2 and 3 plus noise at rank 1 → recall 1, mrr 1/2,
    // ndcg = (2/log2(3) + 1/log2(4)) / (2/log2(2) + 1/log2(3)).
    // q2: one relevant doc, NOT retrieved → all zeros.
    // q3: judged but absent from results entirely → still an output row.
    val results = Seq(
      (1L, 99L, 1), (1L, 10L, 2), (1L, 11L, 3),
      (2L, 98L, 1), (2L, 97L, 2)
    ).toDF("qid", "doc_id", "rank")
    val qrels = Seq(
      (1L, 10L, 2), (1L, 11L, 1),
      (2L, 50L, 1),
      (3L, 60L, 1)
    ).toDF("qid", "doc_id", "grade")
    val m = Evals.retrievalMetrics(results, qrels, k = 5)
      .as[(Long, Double, Double, Double)].collect().map(r => r._1 -> r).toMap
    def r4(x: Double) = math.round(x * 10000) / 10000.0
    val log2 = (x: Double) => math.log(x) / math.log(2.0)
    assert(m(1L)._2 == 1.0 && m(1L)._3 == 0.5)
    assert(m(1L)._4 == r4((2 / log2(3) + 1 / log2(4)) / (2 / log2(2) + 1 / log2(3))))
    assert(m(2L) == ((2L, 0.0, 0.0, 0.0)))
    assert(m(3L) == ((3L, 0.0, 0.0, 0.0)), "judged-but-unretrieved query must appear")
    intercept[IllegalArgumentException] {
      Evals.retrievalMetrics(results, qrels, k = 0)
    }
  }

  test("textOverlapMetrics: SQuAD normalization, multiset F1, empty and " +
      "article edge cases") {
    import graft.operators.Evals
    val rows = Seq(
      // Identical after normalization: case, punctuation, articles.
      ("The Cat, sat!", "cat sat"),
      // Partial multiset overlap: pred [b b c], ref [b c c] → same = 2,
      // f1 = 2*2/(3+3) = 2/3.
      ("b b c", "b c c"),
      // Repeated-token multiset: [a a] vs [a] with articles DISABLED ...
      ("x x", "x"),
      // Disjoint → 0.
      ("alpha beta", "gamma delta"),
      // Pred empties out after normalization (articles + punct only).
      ("the ... a!", "answer"),
      // Both empty → em true, f1 = 1.
      ("", "  ")
    ).toDF("pred", "ref")
    val m = Evals.textOverlapMetrics(rows, "pred", "ref")
      .select("pred", "n_same", "em", "f1")
      .as[(String, Long, Boolean, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(m("The Cat, sat!") == ((2L, true, 1.0)))
    assert(m("b b c")._1 == 2L && !m("b b c")._2 &&
      math.abs(m("b b c")._3 - 2.0 / 3) < 1e-12)
    assert(m("x x") == ((1L, false, 2.0 * 1 / 3)))
    assert(m("alpha beta") == ((0L, false, 0.0)))
    assert(m("the ... a!") == ((0L, false, 0.0)))
    assert(m("") == ((0L, true, 1.0)))
    // dropArticles = false keeps "the" as a countable token.
    val keep = Evals.textOverlapMetrics(
        Seq(("the end", "the end")).toDF("pred", "ref"),
        "pred", "ref", dropArticles = false)
      .select("n_same", "em").as[(Long, Boolean)].collect().head
    assert(keep == ((2L, true)))
  }
}
