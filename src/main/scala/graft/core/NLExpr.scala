package graft.core

/** Natural-language expression ("langex") parsing.
  *
  * Behavior parity with the reference's placeholder syntax: `{col}` references
  * a data column inside an instruction string; doubled braces `{{` / `}}`
  * escape literal braces. (cf. reference lotus/nl_expression.py:4-21)
  */
final case class NLExpr(template: String, cols: Seq[String]) {

  /** Render the instruction with capitalized column *names* substituted for
    * the placeholders (the reference substitutes `col.capitalize()`).
    */
  def instruction: String =
    NLExpr.substitute(template, cols.map(c => c -> NLExpr.cap(c)).toMap)

  /** Columns referenced by the expression that exist in the given schema. */
  def validate(available: Seq[String]): Unit = {
    val missing = cols.filterNot(available.contains)
    require(missing.isEmpty, s"Column(s) ${missing.mkString(", ")} not found in DataFrame. Available: ${available.mkString(", ")}")
  }
}

object NLExpr {
  // `{col}` not preceded/followed by another brace (escape form `{{ }}`).
  private val Placeholder = "(?<!\\{)\\{(?!\\{)(.*?)(?<!\\})\\}(?!\\})".r

  /** Python str.capitalize(): first char upper, rest lower. */
  def cap(s: String): String =
    if (s.isEmpty) s else s.substring(0, 1).toUpperCase + s.substring(1).toLowerCase

  def parse(text: String): NLExpr = {
    val cols = Placeholder.findAllMatchIn(text).map(_.group(1)).toVector.distinct
    require(
      cols.nonEmpty,
      "Language expression contains no parameterized columns. Please specify the " +
        "name of the relevant data column(s) in brackets {} within your language expression."
    )
    NLExpr(text, cols)
  }

  /** Substitute placeholders and unescape doubled braces (like str.format). */
  def substitute(template: String, vals: Map[String, String]): String = {
    val replaced = Placeholder.replaceAllIn(
      template,
      m =>
        scala.util.matching.Regex.quoteReplacement(
          vals.getOrElse(m.group(1), "{" + m.group(1) + "}")))
    replaced.replace("{{", "{").replace("}}", "}")
  }
}
