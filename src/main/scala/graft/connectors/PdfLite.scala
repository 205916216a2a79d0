package graft.connectors

/** Minimal PDF text extraction (public PDF 1.x structure; reference
  * DirectoryReader delegates to llama-index/pypdf,
  * lotus/file_extractors/directory_reader.py:141-589). Zero-dependency:
  * JDK Inflater for /FlateDecode streams and a scanner for the text-showing
  * operators (Tj, ', ", TJ) inside BT/ET blocks. Covers machine-generated
  * simple-font PDFs; CID/composite fonts, encryption, and object streams
  * need a real library and fall back to empty pages.
  */
/** Office Open XML text extraction (pptx/docx are ZIP containers of XML —
  * public ECMA-376 format; reference DirectoryReader delegates to python
  * readers, lotus/file_extractors/pptx.py). Zero-dependency: JDK
  * ZipInputStream + a text-run regex over the slide/document parts.
  */
object OoxmlLite {

  private val TextRun = "(?s)<(?:a|w):t(?:\\s[^>]*)?>(.*?)</(?:a|w):t>".r

  private def unescape(s: String): String = s
    .replace("&amp;", "&").replace("&lt;", "<").replace("&gt;", ">")
    .replace("&quot;", "\"").replace("&apos;", "'")

  private def zipEntries(bytes: Array[Byte]): Seq[(String, String)] =
    zipEntriesWhere(bytes, _.endsWith(".xml"))

  private[connectors] def zipEntriesWhere(bytes: Array[Byte],
      keep: String => Boolean): Seq[(String, String)] = {
    val zis = new java.util.zip.ZipInputStream(new java.io.ByteArrayInputStream(bytes))
    val out = Vector.newBuilder[(String, String)]
    var e = zis.getNextEntry
    while (e != null) {
      if (!e.isDirectory && keep(e.getName)) {
        out += ((e.getName, new String(zis.readAllBytes(), "UTF-8")))
      }
      e = zis.getNextEntry
    }
    zis.close()
    out.result()
  }

  /** Names of all zip entries — cheap container sniffing (no payload read). */
  private[connectors] def zipEntryNames(bytes: Array[Byte]): Seq[String] = {
    val zis = new java.util.zip.ZipInputStream(new java.io.ByteArrayInputStream(bytes))
    val out = Vector.newBuilder[String]
    var e = zis.getNextEntry
    while (e != null) { out += e.getName; e = zis.getNextEntry }
    zis.close()
    out.result()
  }

  private def runsOf(xmlBody: String): String =
    TextRun.findAllMatchIn(xmlBody).map(m => unescape(m.group(1))).mkString(" ").trim

  /** pptx → one text page per slide (ppt/slides/slideN.xml, ordered). */
  def extractPptx(bytes: Array[Byte]): Seq[String] =
    try {
      zipEntries(bytes)
        .filter(_._1.matches("ppt/slides/slide\\d+\\.xml"))
        .sortBy(e => "\\d+".r.findFirstIn(e._1).map(_.toInt).getOrElse(0))
        .map(e => runsOf(e._2))
        .filter(_.nonEmpty)
    } catch { case _: Exception => Nil }

  /** docx → one text page (word/document.xml). */
  def extractDocx(bytes: Array[Byte]): Seq[String] =
    try {
      zipEntries(bytes).filter(_._1 == "word/document.xml")
        .map(e => runsOf(e._2)).filter(_.nonEmpty)
    } catch { case _: Exception => Nil }

  private val SharedString = "(?s)<si(?:\\s[^>]*)?>(.*?)</si>".r
  private val CellT = "(?s)<t(?:\\s[^>]*)?>(.*?)</t>".r
  private val RowXml = "(?s)<row(?:\\s[^>]*)?>(.*?)</row>".r
  private val CellXml = "(?s)<c(\\s[^>]*)?(?:/>|>(.*?)</c>)".r
  private val CellV = "(?s)<v(?:\\s[^>]*)?>(.*?)</v>".r

  /** xlsx → one text page per sheet (xl/worksheets/sheetN.xml): rows joined
    * with newlines, cells with ", "; shared-string (`t="s"`) and inline
    * (`<is><t>`) cells resolved. Public ECMA-376 SpreadsheetML structure.
    */
  def extractXlsx(bytes: Array[Byte]): Seq[String] =
    try {
      val entries = zipEntries(bytes)
      val shared: IndexedSeq[String] = entries.find(_._1 == "xl/sharedStrings.xml")
        .map(e => SharedString.findAllMatchIn(e._2)
          .map(m => CellT.findAllMatchIn(m.group(1)).map(t => unescape(t.group(1))).mkString)
          .toIndexedSeq)
        .getOrElse(IndexedSeq.empty)
      entries.filter(_._1.matches("xl/worksheets/sheet\\d+\\.xml"))
        .sortBy(e => "\\d+".r.findFirstIn(e._1).map(_.toInt).getOrElse(0))
        .map { case (_, xmlBody) =>
          RowXml.findAllMatchIn(xmlBody).map { row =>
            CellXml.findAllMatchIn(row.group(1)).flatMap { c =>
              val attrs = Option(c.group(1)).getOrElse("")
              val body = Option(c.group(2)).getOrElse("")
              val isShared = attrs.contains("t=\"s\"")
              val v = CellV.findFirstMatchIn(body).map(m => unescape(m.group(1)))
              if (isShared)
                v.flatMap(idx => shared.lift(idx.trim.toInt))
              else if (attrs.contains("t=\"inlineStr\""))
                Some(CellT.findAllMatchIn(body).map(t => unescape(t.group(1))).mkString)
              else v
            }.mkString(", ")
          }.filter(_.nonEmpty).mkString("\n")
        }
        .filter(_.nonEmpty)
    } catch { case _: Exception => Nil }

  /** epub → one text page per content document (XHTML chapters in container
    * order, tags stripped). Public IDPF/EPUB OCF+XHTML structure.
    */
  def extractEpub(bytes: Array[Byte]): Seq[String] =
    try {
      zipEntriesWhere(bytes, n =>
        n.endsWith(".xhtml") || n.endsWith(".html") || n.endsWith(".htm"))
        .map(e => graft.connectors.WebSearchEngines.extractText(e._2))
        .filter(_.nonEmpty)
    } catch { case _: Exception => Nil }
}

object PdfLite {

  /** Minimal VALID PDF writer (PDF 1.4: catalog → pages → one page per
    * entry, Helvetica, one FlateDecode content stream per page, full xref
    * table + trailer — loads in any conforming viewer). One `Tj` text op
    * per page, so [[extractText]] round-trips the page text exactly (after
    * trim). Latin-1 text only (the PDF string model without a CID font).
    * Used by specs and the `source_dir_pdf` gate to materialize real
    * on-disk PDFs with zero dependencies.
    */
  def writeSimplePdf(pages: Seq[String]): Array[Byte] = {
    require(pages.nonEmpty, "writeSimplePdf: no pages")
    def esc(s: String) = s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
    def deflate(b: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater()
      d.setInput(b); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!d.finished()) { val n = d.deflate(buf); out.write(buf, 0, n) }
      d.end(); out.toByteArray
    }
    val bos = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes("ISO-8859-1"))
    val offsets = scala.collection.mutable.ArrayBuffer[Int]()
    def obj(body: String): Unit = { offsets += bos.size(); w(body) }
    w("%PDF-1.4\n")
    val n = pages.length
    val kids = (0 until n).map(i => s"${4 + 2 * i} 0 R").mkString(" ")
    obj("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    obj(s"2 0 obj\n<< /Type /Pages /Kids [$kids] /Count $n >>\nendobj\n")
    obj("3 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n")
    pages.zipWithIndex.foreach { case (p, i) =>
      val z = deflate(s"BT /F1 12 Tf 72 720 Td (${esc(p)}) Tj ET"
        .getBytes("ISO-8859-1"))
      obj(s"${4 + 2 * i} 0 obj\n<< /Type /Page /Parent 2 0 R " +
        "/MediaBox [0 0 612 792] /Resources << /Font << /F1 3 0 R >> >> " +
        s"/Contents ${5 + 2 * i} 0 R >>\nendobj\n")
      offsets += bos.size()
      w(s"${5 + 2 * i} 0 obj\n<< /Filter /FlateDecode /Length ${z.length} >>\nstream\n")
      bos.write(z)
      w("\nendstream\nendobj\n")
    }
    val xref = bos.size()
    val total = 3 + 2 * n
    w(s"xref\n0 ${total + 1}\n0000000000 65535 f \n")
    offsets.foreach(o => w(f"$o%010d 00000 n \n"))
    w(s"trailer\n<< /Size ${total + 1} /Root 1 0 R >>\nstartxref\n$xref\n%%EOF\n")
    bos.toByteArray
  }

  def isPdf(bytes: Array[Byte]): Boolean =
    bytes.length > 4 && bytes(0) == '%' && bytes(1) == 'P' && bytes(2) == 'D' && bytes(3) == 'F'

  /** Extract text, one entry per content stream that produced any text. */
  def extractText(bytes: Array[Byte]): Seq[String] = {
    if (!isPdf(bytes)) return Nil
    val raw = new String(bytes, "ISO-8859-1") // 1:1 byte↔char
    val out = Vector.newBuilder[String]
    var from = 0
    var continue = true
    while (continue) {
      val sIdx = raw.indexOf("stream", from)
      if (sIdx < 0) continue = false
      else {
        val eIdx = raw.indexOf("endstream", sIdx)
        if (eIdx < 0) continue = false
        else {
          // Skip the EOL after the `stream` keyword.
          var dataStart = sIdx + "stream".length
          if (dataStart < raw.length && raw.charAt(dataStart) == '\r') dataStart += 1
          if (dataStart < raw.length && raw.charAt(dataStart) == '\n') dataStart += 1
          val dictStart = math.max(raw.lastIndexOf("<<", sIdx), 0)
          val dict = raw.substring(dictStart, sIdx)
          val data = raw.substring(dataStart, eIdx).getBytes("ISO-8859-1")
          val content =
            if (dict.contains("/FlateDecode")) inflate(data).map(new String(_, "ISO-8859-1"))
            else Some(new String(data, "ISO-8859-1"))
          content.foreach { c =>
            val text = textOps(c)
            if (text.nonEmpty) out += text
          }
          from = eIdx + "endstream".length
        }
      }
    }
    out.result()
  }

  private def inflate(data: Array[Byte]): Option[Array[Byte]] =
    try {
      val inf = new java.util.zip.Inflater()
      inf.setInput(data)
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(chunk)
        if (n > 0) buf.write(chunk, 0, n)
        else if (n == 0 && !inf.finished()) return Some(buf.toByteArray) // stalled
      }
      inf.end()
      Some(buf.toByteArray)
    } catch { case _: Exception => None }

  /** Collect strings shown by Tj / ' / " / TJ operators. */
  private def textOps(content: String): String = {
    val sb = new StringBuilder
    val pending = new StringBuilder // strings inside a TJ array
    var i = 0
    val n = content.length
    var inArray = false
    def readString(start: Int): (String, Int) = {
      val s = new StringBuilder
      var depth = 1
      var j = start
      while (j < n && depth > 0) {
        val ch = content.charAt(j)
        if (ch == '\\' && j + 1 < n) {
          content.charAt(j + 1) match {
            case 'n' => s += '\n'; j += 2
            case 'r' => s += '\r'; j += 2
            case 't' => s += '\t'; j += 2
            case 'b' => s += '\b'; j += 2
            case 'f' => s += '\f'; j += 2
            case '(' => s += '('; j += 2
            case ')' => s += ')'; j += 2
            case '\\' => s += '\\'; j += 2
            case d if d >= '0' && d <= '7' =>
              var k = j + 1
              var oct = 0
              while (k < n && k < j + 4 && content.charAt(k) >= '0' && content.charAt(k) <= '7') {
                oct = oct * 8 + (content.charAt(k) - '0'); k += 1
              }
              s += oct.toChar; j = k
            case other => s += other; j += 2
          }
        } else if (ch == '(') { depth += 1; s += ch; j += 1 }
        else if (ch == ')') { depth -= 1; if (depth > 0) s += ch; j += 1 }
        else { s += ch; j += 1 }
      }
      (s.toString, j)
    }
    def opAt(j0: Int): String = {
      var j = j0
      while (j < n && content.charAt(j).isWhitespace) j += 1
      val st = j
      while (j < n && !content.charAt(j).isWhitespace &&
        content.charAt(j) != '(' && content.charAt(j) != '[' && content.charAt(j) != ']') j += 1
      content.substring(st, j)
    }
    while (i < n) {
      content.charAt(i) match {
        case '(' =>
          val (s, j) = readString(i + 1)
          if (inArray) pending ++= s
          else {
            val op = opAt(j)
            if (op == "Tj" || op == "'" || op == "\"") { sb ++= s; sb += '\n' }
          }
          i = j
        case '[' => inArray = true; pending.clear(); i += 1
        case ']' =>
          if (inArray) {
            val op = opAt(i + 1)
            if (op == "TJ" && pending.nonEmpty) { sb ++= pending; sb += '\n' }
          }
          inArray = false
          i += 1
        case _ => i += 1
      }
    }
    sb.toString.trim
  }
}
