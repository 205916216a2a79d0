package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** URL canonicalization — the first dedup key of every web-crawl corpus
  * pipeline (CommonCrawl-derived sets dedup by normalized URL before any
  * content pass; the reference lotus-data/lotus has no crawl layer — this
  * is a beyond-reference training-data op). One compiled per-row pass, no
  * UDF: the property that keeps URL keying a narrow map over a 100 TB
  * crawl ledger.
  *
  * The normal form (deterministic, engine-reproducible — a DuckDB oracle
  * replays it step for step):
  *   1. trim; drop the `#fragment`;
  *   2. no `://` → returned as-is (opaque identifier, not a hierarchical
  *      URL);
  *   3. scheme and authority lowercased (path/query case is preserved —
  *      paths are case-sensitive on most origins);
  *   4. default ports dropped (`:80` for http, `:443` for https);
  *   5. tracking parameters removed: names starting `utm_` or in
  *      {fbclid, gclid, msclkid, mc_eid, ref, igshid} (case-insensitive
  *      on the name);
  *   6. surviving `k=v` parts sorted lexicographically (binary order)
  *      and rejoined — param order never splits a dedup group;
  *   7. a bare-root `/` path drops; an emptied query drops its `?`.
  * Deliberately NOT done: %-decoding, duplicate-slash collapse,
  * index.html stripping — origin-dependent rewrites that can merge
  * genuinely distinct resources.
  */
object UrlExpr {

  private[graft] val TrackingNames =
    Set("fbclid", "gclid", "msclkid", "mc_eid", "ref", "igshid")

  /** The shared algorithm — the kernel and any driver-side caller run
    * THIS; a second copy could silently desynchronize them.
    */
  private[graft] def normalize(u: String): String = {
    val hash = u.trim
    val s = { val h = hash.indexOf('#'); if (h < 0) hash else hash.substring(0, h) }
    val i = s.indexOf("://")
    if (i < 0) return s
    val scheme = s.substring(0, i).toLowerCase(java.util.Locale.ROOT)
    val rest = s.substring(i + 3)
    val slash = rest.indexOf('/')
    val quest = rest.indexOf('?')
    val j = (slash, quest) match {
      case (-1, -1) => rest.length
      case (-1, q) => q
      case (p, -1) => p
      case (p, q) => math.min(p, q)
    }
    val auth0 = rest.substring(0, j).toLowerCase(java.util.Locale.ROOT)
    val tail = rest.substring(j)
    val auth =
      if (scheme == "http" && auth0.endsWith(":80")) auth0.dropRight(3)
      else if (scheme == "https" && auth0.endsWith(":443")) auth0.dropRight(4)
      else auth0
    val q = tail.indexOf('?')
    val path0 = if (q < 0) tail else tail.substring(0, q)
    val query = if (q < 0) "" else tail.substring(q + 1)
    val path = if (path0 == "/") "" else path0
    val params = query.split('&').iterator.filter(_.nonEmpty).filterNot { p =>
      val eq = p.indexOf('=')
      val name = (if (eq < 0) p else p.substring(0, eq)).toLowerCase(java.util.Locale.ROOT)
      name.startsWith("utm_") || TrackingNames.contains(name)
    }.toArray
    java.util.Arrays.sort(params, java.util.Comparator.naturalOrder[String]())
    scheme + "://" + auth + path +
      (if (params.isEmpty) "" else params.mkString("?", "&", ""))
  }

  case class UrlNormalize(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def checkInputDataTypes() = child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"url_normalize requires string, got $other")
    }
    override protected def nullSafeEval(input: Any): Any =
      UTF8String.fromString(normalize(input.asInstanceOf[UTF8String].toString))
    override protected def withNewChildInternal(newChild: Expression) =
      copy(child = newChild)
  }

  def urlNormalize(c: Column): Column =
    ColumnBridge.column(UrlNormalize(ColumnBridge.expression(c)))
}
