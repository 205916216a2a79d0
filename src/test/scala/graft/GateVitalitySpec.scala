package graft

import org.apache.spark.sql.functions._

/** Degeneracy tripwire for the correctness gates — the behavioral sibling
  * of `core/GateTables`' schema tripwire. A shrink/flag gate can pass its
  * oracle TRIVIALLY when the testdata stops containing the phenomenon it
  * exists to exercise (round 8 found `dedup_exact` green against a corpus
  * with zero exact duplicates, and `dedup_paragraphs`/`chunk_sentences`
  * degenerate against a single-sentence corpus). These asserts fail the
  * build with a named cause the day a testdata regeneration quietly
  * removes a signal, instead of leaving a hollow green gate.
  */
class GateVitalitySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def run(name: String) = Queries.queries(name)(spark, dir)

  test("dedup_clusters: the corpus still contains non-trivial near-dup " +
      "clusters") {
    assert(run("dedup_clusters").filter(col("rep_id") =!= col("doc_id"))
      .limit(1).count() == 1,
      "no doc maps to a foreign cluster rep — near-dup signal gone from testdata")
  }

  test("decontaminate_ngram: at least one document is actually flagged") {
    assert(run("decontaminate_ngram").filter(col("contaminated"))
      .limit(1).count() == 1)
  }

  test("boilerplate_strip and strip_repeated_windows: something is removed") {
    assert(run("boilerplate_strip").filter(col("n_removed") > 0)
      .limit(1).count() == 1)
    assert(run("strip_repeated_windows").filter(col("n_removed") > 0)
      .limit(1).count() == 1)
  }

  test("dedup_exact: every planted duplicate is dropped, originals survive") {
    val out = run("dedup_exact")
    assert(out.filter(col("doc_id") >= 100000L).isEmpty,
      "a planted duplicate survived exact dedup")
    assert(out.count() == spark.read.parquet(s"$dir/documents.parquet").count())
  }

  test("dedup_paragraphs: the shared header survives in exactly one doc") {
    val n = run("dedup_paragraphs")
      .filter(col("text").startsWith("Common header sentence")).count()
    assert(n == 1, s"header kept by $n docs — keep-first not exercised")
  }

  test("chunk_sentences: multi-chunk documents exist") {
    assert(run("chunk_sentences").filter(col("chunk_id") >= 1)
      .limit(1).count() == 1,
      "every doc fits one chunk — the packing path is untested by the gate")
  }

  test("image_embed_neardup: both sides of the threshold are exercised") {
    // The gate needs all 24 ids (6 per pattern → 60 within-pattern pairs)
    // AND a live margin: if a regeneration dropped ids the pair structure
    // silently shrinks; if every pair passed the threshold the gate would
    // stop distinguishing patterns.
    val out = run("image_embed_neardup")
    assert(out.count() == 60,
      "within-pattern pair count drifted — gate ids or pattern families changed")
    assert(out.agg(min(col("score"))).head().getDouble(0) >= 0.96,
      "a sub-threshold pair leaked through")
  }

  test("source_dir_office: all four container formats appear") {
    val fmts = run("source_dir_office").select("fmt").distinct()
      .collect().map(_.getString(0)).toSet
    assert(fmts == Set("docx", "xlsx", "epub", "pptx"),
      s"formats exercised: $fmts — an extractor lost its gate coverage")
  }

  test("stream_sem_filter: the filter actually rejects rows") {
    val kept = run("stream_sem_filter").count()
    val total = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(kept > 0, "keyword filter kept nothing — FakeLM wiring broken")
    assert(kept < total,
      "keyword filter kept everything — the stream gate no longer filters")
  }
}
