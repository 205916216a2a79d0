package graft.core

/** Row → prompt-text serialization.
  *
  * Three formats, matching the reference's `df2text`
  * (lotus/templates/task_instructions.py:333-369):
  *   - DEFAULT: `[Col]: «val»\n` per column, columns in caller order
  *   - JSON: one JSON object per row
  *   - XML: `<row><col>val</col>...</row>`
  */
sealed trait SerializationFormat extends Serializable
object SerializationFormat {
  case object Default extends SerializationFormat
  case object Json extends SerializationFormat
  case object Xml extends SerializationFormat
}

object Serialize {

  /** Pandas-style scalar rendering: null → "None". */
  def fmtValue(v: Any): String = v match {
    case null                => "None"
    case s: String           => s
    case a: Array[_]         => a.map(fmtValue).mkString("[", ", ", "]")
    case s: Seq[_]           => s.map(fmtValue).mkString("[", ", ", "]")
    case other               => other.toString
  }

  /** DEFAULT format: `[Col]: «val»\n` for each column. */
  def defaultRow(cols: Seq[String], vals: Seq[Any]): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < cols.length) {
      sb.append('[').append(NLExpr.cap(cols(i))).append("]: «")
        .append(fmtValue(vals(i))).append("»\n")
      i += 1
    }
    sb.toString
  }

  private def jsonEscape(s: String): String = {
    val sb = new StringBuilder
    s.foreach {
      case '"'           => sb.append("\\\"")
      case '\\'          => sb.append("\\\\")
      case '\n'          => sb.append("\\n")
      case '\r'          => sb.append("\\r")
      case '\t'          => sb.append("\\t")
      case c if c < ' '  => sb.append(f"\\u${c.toInt}%04x")
      case c             => sb.append(c)
    }
    sb.toString
  }

  /** JSON-lines format (one object per row). */
  def jsonRow(cols: Seq[String], vals: Seq[Any]): String =
    cols.zip(vals).map { case (c, v) =>
      val value = v match {
        case null                             => "null"
        case n: Int                           => n.toString
        case n: Long                          => n.toString
        case n: Double                        => n.toString
        case n: Float                         => n.toString
        case b: Boolean                       => b.toString
        case other                            => "\"" + jsonEscape(fmtValue(other)) + "\""
      }
      "\"" + jsonEscape(c) + "\":" + value
    }.mkString("{", ",", "}")

  private def cleanColName(c: String): String = c.replaceAll("[^\\w]", "")

  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** XML format: `<row><col>v</col>...</row>`, special chars stripped from names. */
  def xmlRow(cols: Seq[String], vals: Seq[Any]): String =
    cols.zip(vals).map { case (c, v) =>
      val n = cleanColName(c)
      if (v == null) s"<$n/>" else s"<$n>${xmlEscape(fmtValue(v))}</$n>"
    }.mkString("<row>", "", "</row>")

  def row(fmt: SerializationFormat, cols: Seq[String], vals: Seq[Any]): String = fmt match {
    case SerializationFormat.Default => defaultRow(cols, vals)
    case SerializationFormat.Json    => jsonRow(cols, vals)
    case SerializationFormat.Xml     => xmlRow(cols, vals)
  }
}
