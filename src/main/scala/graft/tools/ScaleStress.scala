package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Load test for the flagship scale operators on a synthetic ×N blow-up of
  * the gate corpus — the empirical leg of the 100 TB claims (the per-round
  * bench runs at sf0.1 where every query is seconds; plan shapes are
  * asserted but never load-tested).
  *
  * The blow-up is DETERMINISTIC replication with id offsets: copy k of a
  * document keeps its text when k = 0 or the original doc_id is even
  * (planted exact duplicates at scale — dedup must collapse them) and gains
  * a per-copy suffix otherwise (near-miss variants — dedup must NOT merge
  * them across copies); embeddings replicate verbatim (duplicate vectors
  * stress IVF cell density); events offset both ids so the per-copy hot-key
  * skew pattern survives at N× the rows. Built entirely as one Spark job
  * per table — no driver-side loops.
  *
  * Emits the standard bench JSON line and appends it to
  * `BENCH_HISTORY.jsonl` with `"sf"` marking the blow-up (`<base>xN`), so
  * scale runs sit beside the per-round records without being confused for
  * them.
  */
object ScaleStress {

  val defaultQueries =
    "dedup_minhash,dedup_simhash,dedup_paragraphs,dedup_clusters," +
      "neardup_pairs_cells,ann_batch_search,bm25_batch_search," +
      "agg_skew_distinct,corpus_global_rank,tfidf_topterms"

  def buildBlowup(spark: SparkSession, base: String, out: String,
      factor: Int, perturb: Double = 0.0): Unit = {
    val k = spark.range(factor.toLong).toDF("__k")

    val docs = spark.read.parquet(s"$base/documents.parquet")
    val maxDoc = docs.agg(max("doc_id")).head().getLong(0) + 1
    docs.crossJoin(k)
      .withColumn("text",
        when(col("__k") === 0 || pmod(col("doc_id"), lit(2)) === 0, col("text"))
          .otherwise(concat(col("text"), lit(" variant "), col("__k"))))
      .withColumn("doc_id", col("doc_id") + col("__k") * maxDoc)
      .drop("__k")
      // Many files, like a real corpus — a compact 1-2-file write would
      // hand every downstream scan a single input split and measure
      // single-core starvation instead of the operator.
      .repartition(64)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    val emb = spark.read.parquet(s"$base/embeddings.parquet")
    val maxVec = emb.agg(max("vec_id")).head().getLong(0) + 1
    // perturb > 0 jitters every copy k > 0 with deterministic
    // per-(vector, copy, slot) noise of that amplitude: verbatim
    // replication keeps the DISTINCT vector count at the base corpus size
    // (the exact pre-collapse absorbs the whole blow-up and the cells
    // route never sees a big distinct set), while perturbed copies form
    // genuine near-dup clusters around each base vector — the real
    // SemDeDup workload, with the distinct count growing ×N.
    val replicated = emb.crossJoin(k)
    val jittered =
      if (perturb <= 0) replicated
      else replicated.withColumn("embedding",
        when(col("__k") === 0, col("embedding")).otherwise(
          transform(col("embedding"), (x, i) =>
            (x + lit(perturb) *
              (pmod(xxhash64(col("vec_id"), col("__k"), i), lit(1000L))
                .cast("double") / 500.0 - 1.0)).cast("float"))))
    jittered
      .withColumn("vec_id", col("vec_id") + col("__k") * maxVec)
      .drop("__k")
      .repartition(64)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    val ev = spark.read.parquet(s"$base/events.parquet")
    val Array(maxEv, maxUser) = ev.agg(max("event_id"), max("user_id"))
      .head().toSeq.map(_.asInstanceOf[Long] + 1).toArray
    ev.crossJoin(k)
      .withColumn("event_id", col("event_id") + col("__k") * maxEv)
      .withColumn("user_id", col("user_id") + col("__k") * maxUser)
      .drop("__k")
      .repartition(64)
      .write.mode("overwrite").parquet(s"$out/events.parquet")

    // The geometry marker: a PREBUILT reuse labels its records from what
    // the dataset actually IS, not from whatever env vars happen to be set
    // at bench time (a perturbed blow-up re-benched without the perturb
    // env would otherwise publish recall numbers under the wrong label).
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(out, "blowup.json"),
      s"""{"base":"$base","factor":$factor,"perturb":$perturb}""")
  }

  /** sf label of a blow-up dir: from its `blowup.json` marker when present
    * (authoritative — the dataset's real geometry), else from the given
    * fallback values (pre-marker dirs).
    */
  def sfLabel(out: String, base: String, factor: Int, perturb: Double): String = {
    val marker = java.nio.file.Paths.get(out, "blowup.json")
    val (b, f, p) =
      if (java.nio.file.Files.exists(marker)) {
        val txt = java.nio.file.Files.readString(marker)
        // The closing quote must be OPTIONAL: "factor":1000 is an
        // unquoted JSON number — a mandatory quote made the field
        // silently fall back to the caller's value (masked in ScaleStress
        // runs, which pass the real factor as the fallback; exposed by
        // DsirNormBench passing 0).
        def field(k: String) = (s""""$k":"?([^",}]+?)"?[,}]""".r)
          .findFirstMatchIn(txt).map(_.group(1))
        (field("base").getOrElse(base),
          field("factor").map(_.toInt).getOrElse(factor),
          field("perturb").map(_.toDouble).getOrElse(perturb))
      } else (base, factor, perturb)
    val tag = if (p > 0) s"~p$p" else ""
    s"${b}x$f$tag"
  }

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "30").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = math.max(1,
      sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "1").toInt)
    val only = sys.env.getOrElse("SPARK_GRAFT_SCALE_QUERIES", defaultQueries)
      .split(",").map(_.trim).filter(_.nonEmpty).toSet
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_SCALE_PREBUILT reuses an existing blow-up dir: the
    // measurement session then starts clean (no residue from the build
    // job), and iterating on one query doesn't pay the build each run.
    // Parsed ONCE, loudly, before any expensive work — a malformed value
    // must not kill the run after the build/bench already paid.
    val perturb = sys.env.get("SPARK_GRAFT_SCALE_PERTURB") match {
      case None | Some("") => 0.0
      case Some(v) => v.toDoubleOption.getOrElse(sys.error(
        s"SPARK_GRAFT_SCALE_PERTURB=[$v] is not a number"))
    }
    val out = sys.env.get("SPARK_GRAFT_SCALE_PREBUILT").getOrElse {
      val d = java.nio.file.Files.createTempDirectory("graft_scale").toString
      val t0 = System.nanoTime()
      buildBlowup(spark, base, d, factor, perturb)
      System.err.println(f"[scale-stress] blow-up ×$factor built in " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s at $d")
      d
    }
    val sf = sfLabel(out, base, factor, perturb)
    val names = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.contains(n) }
    require(names.map(_._1).toSet == only,
      s"unknown scale queries: ${only -- names.map(_._1)}")
    val loadBefore = graft.Bench.loadAvgNow()
    val outcome = graft.Bench.timeAll(spark, out, names, passes)
    val json = graft.Bench.renderJson(outcome, sf,
      passes, loadBefore, graft.Bench.loadAvgNow())
    println(json)
    appendHistory(json)
    // Approximate-route RECALL at the blow-up's REAL geometry — the oracle
    // gates pin provably-exhaustive configs, so this record is the only
    // artifact measuring what the approximation actually costs at scale:
    // sampled exact ground truth vs the cells route (per probe tier) and
    // vs banded minhash LSH (per band tier). SPARK_GRAFT_SCALE_RECALL=0
    // skips it when iterating on a single timing query.
    if (sys.env.getOrElse("SPARK_GRAFT_SCALE_RECALL", "1") == "1") {
      val t0 = System.nanoTime()
      val emb = spark.read.parquet(s"$out/embeddings.parquet")
        .withColumnRenamed("embedding", graft.operators.EmbedOps.vecCol("emb"))
      val cells = graft.operators.EmbedOps.neardupRecallReport(
          emb, "emb", "vec_id", threshold = 0.45,
          cellProbesTiers = Seq(1, 2, 4))
        .orderBy("cell_probes")
        .select("cell_probes", "n_sample", "exact_pairs", "matched_pairs",
          "recall").collect()
      val docs = spark.read.parquet(s"$out/documents.parquet")
      val mh = graft.operators.Dedup.minhashRecallReport(
          docs, "text", "doc_id", threshold = 0.8,
          bandTiers = Seq(8, 16, 32))
        .orderBy("bands")
        .select("bands", "n_sample", "exact_pairs", "matched_pairs",
          "recall").collect()
      def tiers(rows: Array[org.apache.spark.sql.Row], key: String): String =
        rows.map(r => s"""{"$key":${r.getInt(0)},"n_sample":${r.getLong(1)},""" +
          s""""exact_pairs":${r.getLong(2)},"matched_pairs":${r.getLong(3)},""" +
          f""""recall":${r.getDouble(4)}%.4f}""").mkString("[", ",", "]")
      // The recall-aware AUTO decision at this geometry: what probe tier
      // the default neardupPairs/semDedup route would actually pick, and
      // the sampled recall it measured — the record that shows the auto
      // route hitting (or honestly missing) its 0.95 default target.
      val (autoProbes, autoRecall) = graft.operators.EmbedOps.autoCellProbes(
        emb, "emb", "vec_id", threshold = 0.45, targetRecall = 0.95)
      // The minhash twin: what band tier the bands = 0 default would pick
      // at this geometry, from the same bounded one-pass estimator the
      // route spends.
      val (autoBands, autoBandRecall) = graft.operators.Dedup.autoBands(
        docs, "text", "doc_id", threshold = 0.8, targetRecall = 0.95)
      val rec = s"""{"metric":"approx_route_recall","sf":"$sf",""" +
        s""""cells_threshold":0.45,"cells":${tiers(cells, "cell_probes")},""" +
        s""""auto":{"target":0.95,"cell_probes":$autoProbes,""" +
        f""""recall":$autoRecall%.4f},""" +
        s""""minhash_threshold":0.8,"minhash":${tiers(mh, "bands")},""" +
        s""""minhash_auto":{"target":0.95,"bands":$autoBands,""" +
        f""""recall":$autoBandRecall%.4f},""" +
        f""""sec":${(System.nanoTime() - t0) / 1e9}%.1f}"""
      println(rec)
      appendHistory(rec)
    }
    spark.stop()
  }

  private def appendHistory(line: String): Unit =
    try
      java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_HISTORY.jsonl"),
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    catch { case _: Exception => () }
}
