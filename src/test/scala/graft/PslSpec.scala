package graft

import graft.functions.Psl
import graft.operators.CorpusPrep
import org.apache.spark.sql.functions._

class PslSpec extends SparkSpec {

  test("parser: exact, wildcard, exception rules; comments, single-label " +
      "drop, private-section stop") {
    val rules = Psl.parse(
      """// comment
        |com
        |co.uk
        |*.sch.uk
        |!city.kobe.jp
        |*.kobe.jp
        |
        |// ===BEGIN PRIVATE DOMAINS===
        |ignored.example.com
        |""".stripMargin.linesIterator)
    assert(rules.exact == Map(2 -> Set("co.uk")))
    assert(rules.wildBase == Map(2 -> Set("sch.uk", "kobe.jp")))
    assert(rules.exc == Map(3 -> Set("city.kobe.jp")))
    assert(rules.maxMatchLabels == 3)
  }

  test("parser: a full upstream-shaped file drops in — license header, " +
      "unicode rules, punycode, private section ignored") {
    val rules = Psl.parse(
      """// This Source Code Form is subject to the terms of the MPL 2.0.
        |// ===BEGIN ICANN DOMAINS===
        |
        |// ac : https://example
        |ac
        |com.ac
        |
        |// unicode + punycode rules pass through verbatim
        |xn--p1ai
        |мон
        |com.мон
        |
        |*.bd
        |!www.bd
        |
        |// ===BEGIN PRIVATE DOMAINS===
        |s3.amazonaws.example
        |*.private.example
        |!keep.private.example
        |""".stripMargin.linesIterator)
    assert(rules.exact(2) == Set("com.ac", "com.мон"))
    assert(rules.wildBase(1) == Set("bd"))
    assert(rules.exc(2) == Set("www.bd"))
    // nothing from the private section, and 1-label rules drop
    assert(!rules.exact.getOrElse(2, Set()).contains("private.example"))
    assert(rules.maxMatchLabels == 2)
  }

  test("snapshot resource loads and covers the documented families") {
    val s = Psl.snapshot
    assert(!s.isEmpty)
    assert(s.exact(2).contains("co.uk"))
    assert(s.exact(2).contains("kyoto.jp"))
    assert(s.exact(3).contains("k12.ca.us"))
    assert(s.wildBase(2).contains("sch.uk"))
    assert(s.wildBase(1).contains("ck"))
    assert(s.exc(3).contains("city.kobe.jp"))
    assert(s.exc(2).contains("www.ck"))
    // The snapshot is now the FULL ICANN section (~5.9k multi-label
    // rules), not the r12 ~480-rule subset: unicode registries parse
    // through verbatim and the long-tail families are present.
    assert(s.exact.values.map(_.size).sum > 5000,
      s"expected the full ICANN section, got ${s.exact.values.map(_.size).sum}")
    assert(s.exact(2).contains("公司.cn"), "unicode rules must survive")
  }

  test("full ICANN snapshot vs the r12 subset: families the subset " +
      "silently keyed as last-2-labels (ac.ir, gov.it, a.bg, aland.fi) " +
      "now key at registry depth; the subset's stale *.gov.pl is gone") {
    import spark.implicits._
    val in = getClass.getResourceAsStream("/graft/psl_subset_r12.dat")
    assert(in != null, "r12 subset test resource missing")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    val subset = try Psl.parse(src.getLines()) finally src.close()
    // Families in the full ICANN section the subset never carried —
    // these fell to the implicit default rule and keyed WRONG (the
    // heuristic's exact error class, silently).
    val cases = Seq(
      // host,            r12-subset (wrong),  full-ICANN (right)
      ("www.uni.ac.ir", "ac.ir", "uni.ac.ir"),
      ("portale.comune.gov.it", "gov.it", "comune.gov.it"),
      ("shop.firma.a.bg", "a.bg", "firma.a.bg"),
      ("visit.mariehamn.aland.fi", "aland.fi", "mariehamn.aland.fi"))
    val df = cases.map(_._1).toDF("h")
      .select(col("h"),
        Psl.registrableDomain(col("h"), subset).as("old"),
        Psl.registrableDomain(col("h")).as("full"))
      .as[(String, String, String)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    cases.foreach { case (h, wrong, right) =>
      assert(df(h) == ((wrong, right)), s"$h: ${df(h)}")
    }
    // The subset also carried rules upstream has since RETIRED —
    // *.gov.pl is plain gov.pl in the full ICANN section.
    assert(subset.wildBase(2).contains("gov.pl"))
    assert(!Psl.snapshot.wildBase.getOrElse(2, Set.empty).contains("gov.pl"))
    val pl = Seq("a.x.gov.pl").toDF("h")
      .select(Psl.registrableDomain(col("h"), subset).as("old"),
        Psl.registrableDomain(col("h")).as("full"))
      .as[(String, String)].head()
    assert(pl == (("a.x.gov.pl", "x.gov.pl")), pl.toString)
  }

  test("registrableDomain: PSL algorithm on planted edge cases — " +
      "wildcards, exceptions, public-suffix hosts, deep subdomains") {
    import spark.implicits._
    val cases = Seq(
      // default rule
      "http://www.Example.COM/path" -> "example.com",
      "http://deep.a.b.site.com/x" -> "site.com",
      // exact 2-label rules
      "https://shop.site.co.uk/p" -> "site.co.uk",
      "http://blog.temple.kyoto.jp/p" -> "temple.kyoto.jp",
      "ferry.hokkaido.jp" -> "ferry.hokkaido.jp",
      // wildcard *.kobe.jp: site.kobe.jp is itself a public suffix
      "http://site.kobe.jp/" -> "site.kobe.jp",
      "http://x.site.kobe.jp/" -> "x.site.kobe.jp",
      // exception !city.kobe.jp punches through the wildcard
      "http://city.kobe.jp/" -> "city.kobe.jp",
      "http://www.city.kobe.jp/ward" -> "city.kobe.jp",
      // wildcard *.sch.uk, scheme-less: school.sch.uk is itself a public
      // suffix, so one more label makes the registrable domain
      "school.sch.uk/home" -> "school.sch.uk",
      "www.school.sch.uk" -> "www.school.sch.uk",
      // 3-label exact rule behind a port
      "https://my.school.k12.ca.us:8080/x" -> "school.k12.ca.us",
      // wildcard TLD *.ck with the !www.ck exception
      "http://anything.ck/" -> "anything.ck",
      "http://shop.anything.ck/" -> "shop.anything.ck",
      "http://www.ck/" -> "www.ck",
      "http://sub.www.ck/" -> "www.ck",
      // hosts AT or BELOW rule depth come back whole
      "http://co.uk/" -> "co.uk",
      "http://kobe.jp/" -> "kobe.jp",
      "localhost" -> "localhost")
    val got = cases.map(_._1).toDF("url")
      .select(col("url"), CorpusPrep.registrableDomain(col("url")).as("d"))
      .as[(String, String)].collect().toMap
    cases.foreach { case (u, want) =>
      assert(got(u) == want, s"$u -> ${got(u)}, want $want")
    }
  }

  test("heuristic vs PSL diff on planted URLs: the families the " +
      "approximation keys wrong are exactly why the snapshot ships") {
    import spark.implicits._
    val urls = Seq(
      // agreement: the heuristic's home turf
      "http://www.example.com/", "https://shop.site.co.uk/p",
      // disagreement: prefecture/state/wildcard registries
      "http://blog.temple.kyoto.jp/p", // heuristic: kyoto.jp (wrong group)
      "https://my.school.k12.ca.us/x", // heuristic: ca.us (wrong group)
      "http://x.site.kobe.jp/", // heuristic: kobe.jp (wrong group)
      "school.sch.uk/home") // heuristic: sch.uk (wrong group)
    val rows = urls.toDF("url").select(
        CorpusPrep.registrableDomainHeuristic(col("url")).as("h"),
        CorpusPrep.registrableDomain(col("url")).as("p"))
      .as[(String, String)].collect()
    assert(rows(0) == (("example.com", "example.com")))
    assert(rows(1) == (("site.co.uk", "site.co.uk")))
    assert(rows(2) == (("kyoto.jp", "temple.kyoto.jp")))
    assert(rows(3) == (("ca.us", "school.k12.ca.us")))
    assert(rows(4) == (("kobe.jp", "x.site.kobe.jp")))
    assert(rows(5) == (("sch.uk", "school.sch.uk")))
  }

  test("property: the column expression agrees with an independent " +
      "plain-Scala PSL evaluator on 300 randomized hosts") {
    import spark.implicits._
    val rules = Psl.snapshot
    def refPsl(host: String): String = {
      val labels = host.split("\\.")
      val n = labels.length
      def suffix(k: Int) = labels.takeRight(k).mkString(".")
      val excLen = rules.exc.toSeq.sortBy(-_._1).collectFirst {
        case (k, set) if n >= k && set(suffix(k)) => k - 1
      }
      val psLen = excLen.getOrElse {
        (rules.maxMatchLabels to 2 by -1).find { k =>
          n >= k &&
            (rules.exact.getOrElse(k, Set.empty).contains(suffix(k)) ||
              rules.wildBase.getOrElse(k - 1, Set.empty)
                .contains(suffix(k - 1)))
        }.getOrElse(1)
      }
      if (n <= psLen) host else labels.takeRight(psLen + 1).mkString(".")
    }
    val rng = new scala.util.Random(7)
    val tails = Seq("com", "co.uk", "kyoto.jp", "kobe.jp", "city.kobe.jp",
      "sch.uk", "school.sch.uk", "k12.ca.us", "ca.us", "ck", "www.ck",
      "org", "foo", "gov.pl", "x.gov.pl", "jp", "uk")
    val hosts = (0 until 300).map { _ =>
      val depth = rng.nextInt(3)
      val pre = (0 until depth).map(_ => s"l${rng.nextInt(5)}").mkString(".")
      val t = tails(rng.nextInt(tails.size))
      if (pre.isEmpty) t else s"$pre.$t"
    }.distinct
    val got = hosts.toDF("h")
      .select(col("h"), CorpusPrep.registrableDomain(col("h")).as("d"))
      .as[(String, String)].collect().toMap
    hosts.foreach { h =>
      assert(got(h) == refPsl(h), s"$h: expr=${got(h)} ref=${refPsl(h)}")
    }
  }

  test("duckDbRegistrableSql embeds the same rule families it was " +
      "generated from") {
    val sql = Psl.duckDbRegistrableSql("host")
    assert(sql.contains("'co.uk'"))
    assert(sql.contains("'kyoto.jp'"))
    assert(sql.contains("'city.kobe.jp'"))
    assert(sql.contains("'k12.ca.us'"))
    // wildcard bases appear via the k-1 suffix arm; exceptions first
    assert(sql.indexOf("'city.kobe.jp'") < sql.indexOf("'co.uk'"))
  }
}
