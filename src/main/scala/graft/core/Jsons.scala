package graft.core

/** Minimal JSON emission shared by the driver-contract mains (Bench,
  * Verify). Escapes backslash, quote, and ALL control chars (<0x20) — a tab
  * or CR in an error message or builder-authored SQL would otherwise make
  * the driver's json.load fail and silently zero the round's artifacts.
  */
object Jsons {
  def str(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Object from (already-ordered) string→string pairs. */
  def obj(fields: Seq[(String, String)]): String =
    fields.map { case (k, v) => s"${str(k)}: ${str(v)}" }.mkString("{", ",", "}")
}
