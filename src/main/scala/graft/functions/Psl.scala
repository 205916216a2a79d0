package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Public Suffix List lookup as a pure column composition — the exact
  * registrable-domain keying that domain-level corpus curation
  * (FineWeb/RefinedWeb domain caps, domain mixing stats) groups by.
  *
  * Implements the complete PSL algorithm (https://publicsuffix.org/list/):
  * among all rules whose labels are a suffix of the host, an exception
  * rule (`!`) prevails, else the rule with the most labels; a wildcard
  * (`*.`) rule matches one extra arbitrary label; no match falls back to
  * the implicit `*` rule (public-suffix length 1). The registrable
  * domain is the public suffix plus one label — a host that IS a public
  * suffix has no registrable domain and is returned whole.
  *
  * The rule set ships as a pinned resource snapshot
  * (`graft/psl_snapshot.dat` — ICANN-section subset, see its header; a
  * full upstream `public_suffix_list.dat` drops in verbatim). Membership
  * tests compile to `isin` over per-label-count literal sets, which
  * Catalyst converts to hashed `InSet` — codegen'd, no UDF, no join.
  * IDN/punycode hosts are matched verbatim (the snapshot stores ASCII
  * rules; punycode-encode upstream if needed).
  */
object Psl {

  /** Parsed rule sets, keyed by label count. `exact(k)` = k-label rules;
    * `wildBase(k)` = the k-label base of a `*.base` rule (matching k+1
    * host labels); `exc(k)` = k-label exception rules (public-suffix
    * length k−1).
    */
  final case class Rules(exact: Map[Int, Set[String]],
      wildBase: Map[Int, Set[String]], exc: Map[Int, Set[String]]) {
    def maxMatchLabels: Int =
      ((exact.keys ++ wildBase.keys.map(_ + 1) ++ exc.keys) ++ Seq(1)).max
    def isEmpty: Boolean = exact.isEmpty && wildBase.isEmpty && exc.isEmpty
  }

  /** Parse PSL-format text: `//` comments and blanks skipped, `!` marks
    * an exception, `*.` a wildcard; parsing stops at the private-domains
    * marker so a full upstream file contributes its ICANN section only.
    * Single-label exact rules are dropped — they coincide with the
    * algorithm's implicit default rule.
    */
  def parse(lines: Iterator[String]): Rules = {
    val exact = scala.collection.mutable.Map[Int, Set[String]]()
      .withDefaultValue(Set.empty)
    val wild = scala.collection.mutable.Map[Int, Set[String]]()
      .withDefaultValue(Set.empty)
    val exc = scala.collection.mutable.Map[Int, Set[String]]()
      .withDefaultValue(Set.empty)
    val it = lines.map(_.trim).takeWhile(!_.contains("===BEGIN PRIVATE DOMAINS==="))
    for (line <- it if line.nonEmpty && !line.startsWith("//")) {
      val rule = line.toLowerCase
      if (rule.startsWith("!")) {
        val r = rule.drop(1)
        val k = r.count(_ == '.') + 1
        exc(k) = exc(k) + r
      } else if (rule.startsWith("*.")) {
        val base = rule.drop(2)
        val k = base.count(_ == '.') + 1
        wild(k) = wild(k) + base
      } else {
        val k = rule.count(_ == '.') + 1
        if (k >= 2) exact(k) = exact(k) + rule
      }
    }
    Rules(exact.toMap, wild.toMap, exc.toMap)
  }

  /** The pinned snapshot, loaded once per JVM from the classpath.
    * Missing resource → empty rules (callers fall back to the
    * documented last-2-labels heuristic).
    */
  lazy val snapshot: Rules = {
    val in = getClass.getResourceAsStream("/graft/psl_snapshot.dat")
    if (in == null) Rules(Map.empty, Map.empty, Map.empty)
    else {
      val src = scala.io.Source.fromInputStream(in, "UTF-8")
      try parse(src.getLines()) finally src.close()
    }
  }

  /** Host of a URL: authority up to the first `/`, `?` or `:`,
    * lowercased; scheme-less inputs start at the authority.
    */
  def hostOf(url: Column): Column = {
    val afterScheme = when(url.contains("://"),
      regexp_replace(url, "^[^:]*://", "")).otherwise(url)
    lower(regexp_extract(afterScheme, "^([^/?:]*)", 1))
  }

  /** The PSL algorithm as ONE when-chain that yields the registrable
    * domain directly: exceptions first (longest first), then
    * exact/wildcard matches longest-first, implicit `*` default. Each
    * arm's matched rule length is a compile-time literal, so every slice
    * length is constant and the chain is evaluated EXACTLY ONCE per row
    * — the previous two-step form (a psLen chain referenced by the
    * closing `when` AND twice inside its `slice`) inlined the whole
    * InSet chain three times per row (the Catalyst re-evaluation hazard
    * documented on scoreLangNB; measured as domain_cap's r12 1.7×
    * regression).
    */
  private def domainChain(host: Column, labels: Column, n: Column,
      rules: Rules): Column = {
    def suffix(k: Int): Column = array_join(slice(labels, -k, k), ".")
    // Build the hashed InSet node DIRECTLY rather than via `isin`: the
    // full ICANN section is ~5.9k rules, and an `In` with 5.9k literal
    // children is a 5.9k-node tree that the analyzer type-coerces and
    // every optimizer rule re-walks (per chain instance) before the
    // InSet conversion finally collapses it. One InSet node carrying the
    // set skips all of that; execution (hash probe, codegen) is what the
    // converted form produced anyway.
    def inSet(c: Column, s: Set[String]): Column =
      org.apache.spark.sql.graft.ColumnBridge.column(
        org.apache.spark.sql.catalyst.expressions.InSet(
          org.apache.spark.sql.graft.ColumnBridge.expression(c),
          s.map(org.apache.spark.unsafe.types.UTF8String.fromString(_): Any)))
    val excArms = rules.exc.toSeq.sortBy(-_._1).map { case (k, set) =>
      // Exception rule: public-suffix length k−1. Matched ⇒ n ≥ k >
      // psLen, so the registrable domain is the matched suffix itself.
      ((n >= k) && inSet(suffix(k), set), suffix(k))
    }
    val maxK = rules.maxMatchLabels
    val ruleArms = (maxK to 2 by -1).flatMap { k =>
      val ex = rules.exact.getOrElse(k, Set.empty)
      val wb = rules.wildBase.getOrElse(k - 1, Set.empty)
      val hit: Option[Column] =
        if (ex.nonEmpty && wb.nonEmpty)
          Some(inSet(suffix(k), ex) || inSet(suffix(k - 1), wb))
        else if (ex.nonEmpty) Some(inSet(suffix(k), ex))
        else if (wb.nonEmpty) Some(inSet(suffix(k - 1), wb))
        else None
      // psLen = k for both forms; a host AT rule depth IS the public
      // suffix and comes back whole, else suffix + one label.
      hit.map(h => ((n >= k) && h,
        when(n === k, host).otherwise(suffix(k + 1))))
    }
    val dflt = when(n <= 1, host).otherwise(suffix(2))
    (excArms ++ ruleArms)
      .foldRight(dflt) { case ((cond, v), rest) => when(cond, v).otherwise(rest) }
  }

  /** Registrable domain of a URL under the pinned snapshot (or supplied
    * rules). A host with no more labels than its public suffix is
    * returned whole.
    *
    * Column form for expression contexts (the SQL function registration);
    * inside a DataFrame pipeline prefer [[withRegistrableDomain]], which
    * stages the host/label columns in their own projection so the regex
    * host extraction and the split are bound once per row rather than
    * re-derived inside every chain arm.
    */
  def registrableDomain(url: Column, rules: Rules = snapshot): Column = {
    require(!rules.isEmpty,
      "Psl.registrableDomain: empty rule set — snapshot resource missing; " +
        "use CorpusPrep.registrableDomainHeuristic for the no-PSL fallback")
    val host = hostOf(url)
    val labels = split(host, "\\.")
    domainChain(host, labels, size(labels), rules)
  }

  /** `df` + `outCol` = the registrable domain of `urlCol`, with the
    * host and its label array staged in their own projections first
    * (referenced many times across the chain arms, they must be bound
    * columns — CollapseProject keeps multi-referenced non-trivial
    * aliases staged, so each evaluates once per row).
    */
  def withRegistrableDomain(df: org.apache.spark.sql.DataFrame,
      urlCol: String, outCol: String,
      rules: Rules = snapshot): org.apache.spark.sql.DataFrame = {
    require(!rules.isEmpty,
      "Psl.withRegistrableDomain: empty rule set — snapshot resource " +
        "missing; use CorpusPrep.registrableDomainHeuristic instead")
    df.withColumn("__psl_host", hostOf(col(urlCol)))
      .withColumn("__psl_labels", split(col("__psl_host"), "\\."))
      .withColumn(outCol, domainChain(col("__psl_host"),
        col("__psl_labels"), size(col("__psl_labels")), rules))
      .drop("__psl_host", "__psl_labels")
  }

  /** The same PSL lookup as DuckDB SQL over a column expression — the
    * oracle side of the gate, generated from the SAME parsed snapshot so
    * Spark and DuckDB read one rule set. `hostExpr` must already be the
    * lowercased host. Emits a scalar CASE expression over
    * `string_split(host, '.')`.
    */
  def duckDbRegistrableSql(hostExpr: String, rules: Rules = snapshot): String = {
    def sqlSet(s: Set[String]): String =
      s.toSeq.sorted.map(x => s"'$x'").mkString("(", ",", ")")
    def suffix(k: Int): String =
      s"array_to_string(string_split($hostExpr, '.')[-$k:], '.')"
    val n = s"len(string_split($hostExpr, '.'))"
    // Mirrors [[domainChain]]: each arm yields the domain directly, so
    // every rule set appears ONCE in the generated SQL (the psLen-based
    // form embedded the ~6k-literal sets twice — ~2× the statement).
    val excArms = rules.exc.toSeq.sortBy(-_._1).map { case (k, set) =>
      s"WHEN $n >= $k AND ${suffix(k)} IN ${sqlSet(set)} THEN ${suffix(k)}"
    }
    val maxK = rules.maxMatchLabels
    val ruleArms = (maxK to 2 by -1).flatMap { k =>
      val ex = rules.exact.getOrElse(k, Set.empty)
      val wb = rules.wildBase.getOrElse(k - 1, Set.empty)
      val conds = Seq(
        if (ex.nonEmpty) Some(s"${suffix(k)} IN ${sqlSet(ex)}") else None,
        if (wb.nonEmpty) Some(s"${suffix(k - 1)} IN ${sqlSet(wb)}") else None
      ).flatten
      if (conds.isEmpty) None
      else Some(s"WHEN $n >= $k AND (${conds.mkString(" OR ")}) " +
        s"THEN (CASE WHEN $n = $k THEN $hostExpr ELSE ${suffix(k + 1)} END)")
    }
    (excArms ++ ruleArms).mkString("CASE ", " ",
      s" ELSE (CASE WHEN $n <= 1 THEN $hostExpr ELSE ${suffix(2)} END) END")
  }
}
