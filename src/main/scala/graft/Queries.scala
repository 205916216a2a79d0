package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Sem
import graft.llm.{FakeBehavior, FakeLM}
import graft.operators.{CorpusPrep, Dedup, EmbedOps, Temporal}
import graft.functions.{MultimodalOps, TextFunctions => TF}

/** The operator inventory as driver-checkable queries.
  *
  * Every query here has a deterministic result; most have an ANSI-SQL oracle
  * in [[Queries.oracleSql]] runnable by DuckDB against the same parquet
  * tables. Semantic operators run against deterministic [[FakeLM]] behaviors
  * whose semantics are themselves SQL-expressible — so even the LLM-stage
  * plumbing (serialization → prompt → batched call → parse → columns) is
  * hash-verified end to end.
  *
  * Numeric convention: money aggregates are summed as integer cents
  * (`round(x*100)` per row, then BIGINT sum) — per-row IEEE ops are
  * bit-identical across engines and integer sums are order-independent, so
  * hashes match without float tolerance.
  */
object Queries {

  private def read(s: SparkSession, dir: String, name: String): DataFrame = {
    // events.parquet carries TIMESTAMP(NANOS); Spark only reads it via the
    // legacy long mapping — queries convert with `timestamp_micros(ts div 1000)`.
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(s"$dir/$name.parquet")
  }

  private def cents(c: org.apache.spark.sql.Column) = round(c * 100).cast("long")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---------------- classical relational surface ------------------------
    "q1_agg" -> ((s, dir) => {
      read(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(cents(col("l_quantity"))).as("sum_qty_c"),
          sum(cents(col("l_extendedprice"))).as("sum_base_c"),
          sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_c"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    "q2_join_agg" -> ((s, dir) => {
      val li = read(s, dir, "lineitem")
      val o = read(s, dir, "orders")
      val c = read(s, dir, "customer")
      val n = read(s, dir, "nation")
      val r = read(s, dir, "region")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
          sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue_c"),
          countDistinct(col("o_orderkey")).as("n_orders"))
        .orderBy("r_name", "n_name")
    }),

    "q3_topn" -> ((s, dir) => {
      val li = read(s, dir, "lineitem")
      val o = read(s, dir, "orders")
      val rev = li.groupBy("l_orderkey")
        .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue_c"))
      rev.join(o, rev("l_orderkey") === o("o_orderkey"))
        .select(col("o_orderkey"), col("o_orderpriority"), col("revenue_c"))
        .orderBy(col("revenue_c").desc, col("o_orderkey"))
        .limit(10)
    }),

    "q4_window" -> ((s, dir) => {
      val o = read(s, dir, "orders")
      val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val ws = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      o.withColumn("rk", row_number().over(w).cast("long"))
        .withColumn("run_c", sum(cents(col("o_totalprice"))).over(ws))
        .filter(col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "rk", "run_c")
        .orderBy("o_custkey", "rk")
    }),

    "q5_exists" -> ((s, dir) => {
      val o = read(s, dir, "orders")
      val li = read(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      val c = read(s, dir, "customer")
      val oWith = o.join(li.select("l_orderkey").distinct(),
        o("o_orderkey") === col("l_orderkey"), "left_semi")
      c.join(oWith.select("o_custkey").distinct(), c("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    }),

    "q6_filter" -> ((s, dir) => {
      read(s, dir, "lineitem")
        .filter(col("l_discount") >= 0.05 && col("l_discount") <= 0.07 && col("l_quantity") < 24)
        .agg(sum(cents(col("l_extendedprice") * col("l_discount"))).as("revenue_c"),
          count(lit(1)).as("n"))
    }),

    "q7_setops" -> ((s, dir) => {
      val p = read(s, dir, "part")
      val big = p.filter(col("p_size") > 40).select("p_brand").distinct()
      val pricey = p.filter(col("p_retailprice") > 1800).select("p_brand").distinct()
      val cheapSmall = p.filter(col("p_size") < 3 && col("p_retailprice") < 500)
        .select("p_brand").distinct()
      big.union(pricey).distinct().except(cheapSmall).orderBy("p_brand")
    }),

    "q8_events_window" -> ((s, dir) => {
      read(s, dir, "events")
        .withColumn("tsm", expr("timestamp_micros(ts div 1000)"))
        .groupBy(date_trunc("hour", col("tsm")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("value_c"))
        .orderBy("hour", "event_type")
    }),

    "q9_events_json" -> ((s, dir) => {
      read(s, dir, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy("event_type")
        .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"))
        .orderBy("event_type")
    }),

    // ---------------- semantic operators (deterministic FakeLM) -----------
    "sem_filter_kw" -> ((s, dir) => {
      Sem.withLM(FakeLM(FakeBehavior.KeywordFilter("spark"))) {
        read(s, dir, "documents")
          .semFilter("the {text} mentions a certain data engine")
          .orderBy("doc_id")
      }
    }),

    "sem_map_first3" -> ((s, dir) => {
      Sem.withLM(FakeLM(FakeBehavior.FirstWords("Text", 3))) {
        read(s, dir, "documents")
          .semMap("give the first three words of {text}")
          .select(col("doc_id"), col("_map"))
          .orderBy("doc_id")
      }
    }),

    "sem_extract_stats" -> ((s, dir) => {
      Sem.withLM(FakeLM(FakeBehavior.ExtractStats("Text"))) {
        read(s, dir, "documents")
          .semExtract(Seq("text"), Seq("first_word" -> None, "n_words" -> Some("number of words")))
          .select(col("doc_id"), col("first_word"), col("n_words"))
          .orderBy("doc_id")
      }
    }),

    "sem_join_kw" -> ((s, dir) => {
      Sem.withLM(FakeLM(FakeBehavior.FieldWordJoin("Text", "Word"))) {
        val docs = read(s, dir, "documents").filter(col("doc_id") < 40).select("doc_id", "text")
        val kws = s.createDataFrame(
          Seq(Tuple1("spark"), Tuple1("join"), Tuple1("filter"), Tuple1("window")))
          .toDF("word")
        docs.semJoin(kws, "the {text} mentions the word {word}")
          .orderBy("doc_id", "word")
      }
    }),

    "sem_agg_concat" -> ((s, dir) => {
      // Small fake context window forces a genuinely hierarchical fold
      // (multiple rounds); the concat summarizer is associative so the
      // result equals the flat ordered string_agg the oracle computes.
      Sem.withLM(FakeLM(FakeBehavior.ConcatDocs("\n"), maxCtxLen = 4000)) {
        read(s, dir, "documents")
          .semAgg("summarize the {text}", groupBy = Seq("lang"), orderBy = Seq(col("doc_id")))
          .orderBy("lang")
      }
    }),

    "sem_topk_quick" -> ((s, dir) => {
      Sem.withLM(FakeLM(FakeBehavior.PreferLonger())) {
        read(s, dir, "documents")
          .semTopK("which doc is more substantial given {text} with {n_chars} chars (id {doc_id})",
            k = 10, method = "quick")
          .select(col("doc_id"), col("n_chars"), col("rank").cast("long").as("rank"))
          .orderBy("rank")
      }
    }),

    "sem_topk_heap" -> ((s, dir) => {
      // Distributed selection: partition-local quickselect + driver merge.
      // PreferLonger is a strict total order (n_chars desc, doc_id asc), so
      // every partition's local top-k contains its global-top-k members and
      // the merged result equals the exact ORDER BY — oracle-checkable.
      Sem.withLM(FakeLM(FakeBehavior.PreferLonger())) {
        read(s, dir, "documents")
          .semTopK("which doc is more substantial given {text} with {n_chars} chars (id {doc_id})",
            k = 7, method = "heap")
          .select(col("doc_id"), col("n_chars"), col("rank").cast("long").as("rank"))
          .orderBy("rank")
      }
    }),

    "sem_topk_naive" -> ((s, dir) => {
      Sem.withLM(FakeLM(FakeBehavior.PreferLonger())) {
        read(s, dir, "documents").filter(col("doc_id") < 60)
          .semTopK("which doc is more substantial given {text} with {n_chars} chars (id {doc_id})",
            k = 5, method = "naive")
          .select(col("doc_id"), col("n_chars"), col("rank").cast("long").as("rank"))
          .orderBy("rank")
      }
    }),

    "llm_judge" -> ((s, dir) => {
      // n-trial judging: one sem_map per trial with the judge system prompt
      // (reference llm_as_judge.py:81-105); the fake answers from the doc, so
      // both trial columns are SQL-expressible.
      Sem.withLM(FakeLM(FakeBehavior.FirstWords("Text", 2))) {
        read(s, dir, "documents")
          .llmAsJudge("rate the quality of {text}", nTrials = 2)
          .select(col("doc_id"), col("_judge0"), col("_judge1"))
          .orderBy("doc_id")
      }
    }),

    "pairwise_judge" -> ((s, dir) => {
      // A/B compare of two columns through the filter core with ("A","B")
      // output tokens (reference pairwise_judge.py:204-224).
      Sem.withLM(FakeLM(FakeBehavior.PreferLongerField())) {
        read(s, dir, "documents").select("doc_id", "text", "source")
          .pairwiseJudge("text", "source",
            "which of {text} and {source} is more substantial")
          .select(col("doc_id"), col("_judge0"))
          .orderBy("doc_id")
      }
    }),

    "sem_topk_quicksem" -> ((s, dir) => {
      // quick-sem: embedding-presorted pivot selection (reference
      // sem_topk.py:782-788). The comparator is a total order on the text
      // column alone, so pivot choice cannot change the result — exact and
      // ORDER-BY-checkable.
      Sem.withLM(FakeLM(FakeBehavior.PreferLongerText())) {
        read(s, dir, "documents")
          .semTopK("which {text} is more substantial", k = 8, method = "quick-sem")
          .select(col("doc_id"), col("rank").cast("long").as("rank"))
          .orderBy("rank")
      }
    }),

    "sem_filter_cascade" -> ((s, dir) => {
      // Helper-model cascade. Thresholds are pinned at (0.9, 0.1): the fake
      // helper's confidence bands are separated, so the accepted band is
      // pure and the uncertain middle goes to the exact oracle — the result
      // equals the exact filter (same oracle SQL as sem_filter_kw). The
      // learned-threshold path (statistical, not exact) is covered by
      // CascadeSpec.
      Sem.withLM(FakeLM(FakeBehavior.KeywordFilter("spark"))) {
        read(s, dir, "documents")
          .semFilterCascade("the {text} mentions a certain data engine",
            helperLm = FakeLM(FakeBehavior.KeywordFilterProb("spark")),
            args = graft.cascade.CascadeArgs(
              posThreshold = Some(0.9), negThreshold = Some(0.1)))
          .orderBy("doc_id")
      }
    }),

    "sem_join_cascade" -> ((s, dir) => {
      // Embedding-proxy join cascade through the full plumbing (sim-join
      // candidate generation → threshold routing → oracle pass). Thresholds
      // are pinned so no pair is proxy-resolved: every candidate reaches the
      // exact oracle and the result equals the plain semantic join — which
      // makes the whole path DuckDB-checkable. Learned-threshold routing
      // (statistical, not exact) is covered by CascadeSpec.
      Sem.withLM(FakeLM(FakeBehavior.FieldWordJoin("Text", "Word"))) {
        val docs = read(s, dir, "documents").filter(col("doc_id") < 40).select("doc_id", "text")
        val kws = s.createDataFrame(
          Seq(Tuple1("spark"), Tuple1("join"), Tuple1("filter"), Tuple1("window")))
          .toDF("word")
        docs.semJoinCascade(kws, "the {text} mentions the word {word}", "text", "word",
            args = graft.cascade.CascadeArgs(
              posThreshold = Some(1.01), negThreshold = Some(-0.01)))
          .select("doc_id", "text", "word")
          .orderBy("doc_id", "word")
      }
    }),

    // ---------------- embedding / similarity ops --------------------------
    // These route through the REAL operator APIs (semSearchVec / semSimJoin /
    // neardupPairs / semDedup) over the stored vectors: renaming `embedding`
    // to the operator's index-column convention attaches it as a precomputed
    // index (semIndex is then a no-op), exactly like the reference's
    // load_sem_index path.
    "sem_search_cos" -> ((s, dir) => {
      val e = read(s, dir, "embeddings")
      val qv = e.filter(col("vec_id") === 0).select("embedding")
        .head().getSeq[Float](0)
      val withVec = e.withColumnRenamed("embedding", EmbedOps.vecCol("emb"))
      EmbedOps.semSearchVec(withVec, "emb", qv, 10,
          scoreCol = "raw", tieBreak = Seq(col("vec_id")))
        .select(col("vec_id"), round(col("raw"), 3).as("score"))
    }),

    "sem_sim_join_cos" -> ((s, dir) => {
      val e = read(s, dir, "embeddings")
      val l = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("lid"), col("embedding").as(EmbedOps.vecCol("lemb")))
      val r = e.select(col("vec_id").as("rid"), col("embedding").as(EmbedOps.vecCol("remb")))
      EmbedOps.semSimJoin(l, r, "lemb", "remb", k = 3,
          scoreCol = "raw", tieBreak = Seq(col("rid")))
        .orderBy(col("lid"), col("raw").desc, col("rid"))
        .select(col("lid"), col("rid"), round(col("raw"), 3).as("score"))
    }),

    "neardup_pairs_cos" -> ((s, dir) => {
      val e = read(s, dir, "embeddings")
        .withColumnRenamed("embedding", EmbedOps.vecCol("emb"))
      EmbedOps.neardupPairs(e, "emb", "vec_id", threshold = 0.45)
        .orderBy("id1", "id2")
        .select(col("id1"), col("id2"), round(col("score"), 3).as("score"))
    }),

    "sem_dedup_drop" -> ((s, dir) => {
      // Full semDedup: pair kernel → connected components → keep min-id
      // representative. Oracle = recursive-CTE reachability in DuckDB.
      val e = read(s, dir, "embeddings")
        .withColumnRenamed("embedding", EmbedOps.vecCol("emb"))
      EmbedOps.semDedup(e, "emb", "vec_id", threshold = 0.45)
        .select(col("vec_id")).orderBy("vec_id")
    }),

    "sem_index_roundtrip" -> ((s, dir) => {
      // semIndexSave → parquet (id, vector) → semLoadIndex re-attach; the
      // round-tripped first component must equal the source table's.
      // Unique per run: a fixed shared path races concurrent gate runs on
      // the same machine (overwrite-while-read).
      val path = java.nio.file.Files.createTempDirectory("graft_verify_index").toString + "/idx"
      val e = read(s, dir, "embeddings")
      val withVec = e.withColumnRenamed("embedding", EmbedOps.vecCol("emb"))
      EmbedOps.semIndexSave(withVec, "emb", "vec_id", path)
      val loaded = EmbedOps.semLoadIndex(e.select("vec_id"), "emb", "vec_id", path)
      loaded.select(col("vec_id"),
          // `+ 0.0` normalizes IEEE signed zero (-0.0 vs 0.0 across engines)
          (round(element_at(col(EmbedOps.vecCol("emb")), 1).cast("double"), 3) + lit(0.0)).as("v1"))
        .orderBy("vec_id")
    }),

    "sem_partition" -> ((s, dir) => {
      // sem_partition_by writes the _lotus_partition_id grouping column
      // (cluster assignment — seed-deterministic, not SQL-expressible →
      // rows-only check; exactness covered by EmbedSpec).
      val e = read(s, dir, "embeddings").withColumn("__txt", col("vec_id").cast("string"))
      EmbedOps.semPartitionBy(e, "__txt", nPartitions = 5)
        .select(col("vec_id"), col("_lotus_partition_id").cast("long").as("_lotus_partition_id"))
        .orderBy("vec_id")
    }),

    "sem_sim_join_lsh" -> ((s, dir) => {
      // Approximate k-NN join via random-hyperplane LSH bucketing — the
      // large×large scale path (rows-only: LSH bucketing is seeded-random,
      // deterministic in Spark but not SQL-expressible; exactness of the
      // candidate-verify kernel is covered by PlanConnectorsSpec).
      val docs = read(s, dir, "documents")
      val l = docs.filter(col("doc_id") < 50).select(col("doc_id").as("lid"), col("text").as("ltext"))
      val r = docs.select(col("doc_id").as("rid"), col("text").as("rtext"))
      EmbedOps.semSimJoinLSH(l, r, "ltext", "rtext", k = 2)
        .select(col("lid"), col("rid"), round(col("_scores"), 3).as("score"))
        .orderBy("lid", "rid")
    }),

    "sem_sim_join_lsh_exact" -> ((s, dir) => {
      // The FULL LSH plumbing (hyperplane band keys → band-bucket equi-join
      // → pair dedup → exact-cosine verify → per-left rank) under a
      // recall-1 banding config: 16 one-bit bands make a candidate of any
      // pair agreeing on ≥1 of 16 hyperplane signs — for a pair at angle θ
      // the miss probability is (θ/π)^16, and on the gate data the
      // candidate set covers the exact top-3 of every left row at
      // sf0.001/0.01/0.1 (verified exhaustively). The result therefore
      // equals the exact per-left top-k and the whole path is
      // hash-verified. Production banding (recall<1 by design) stays
      // covered by the rows-only sem_sim_join_lsh gate.
      val e = read(s, dir, "embeddings")
      val l = e.filter(col("vec_id") < 50)
        .select(col("vec_id").as("lid"), col("embedding").as(EmbedOps.vecCol("lemb")))
      val r = e.select(col("vec_id").as("rid"), col("embedding").as(EmbedOps.vecCol("remb")))
      EmbedOps.semSimJoinLSH(l, r, "lemb", "remb", k = 3, nBits = 16, bands = 16,
          scoreCol = "raw", tieBreak = Seq(col("rid")))
        .orderBy(col("lid"), col("raw").desc, col("rid"))
        .select(col("lid"), col("rid"), round(col("raw"), 3).as("score"))
    }),

    "sem_search_late" -> ((s, dir) => {
      // ColBERT-style late interaction: per-token embeddings + MaxSim
      // (rows-only: deterministic via the hashing embedder, but per-token
      // MaxSim is not reasonably SQL-expressible; kernel exactness is
      // covered by LateVsSpec).
      val docs = read(s, dir, "documents").filter(col("doc_id") < 200)
      graft.embed.LateInteraction.search(docs, "text", "spark data processing", k = 5)
        .select(col("doc_id"), round(col("li_scores"), 3).as("score"))
        .orderBy(col("score").desc, col("doc_id"))
    }),

    "ann_ivf_search" -> ((s, dir) => {
      // IVF-Flat ANN through the full index lifecycle: KMeans coarse cells →
      // cell assignment → probe-and-scan. With nProbe = nCells the probe set
      // covers the corpus, so the result equals exact cosine top-k and the
      // whole path (build, assignment, probe filter, scan, top-k) is
      // oracle-checkable; recall at nProbe < nCells is covered by IvfSpec.
      val e = read(s, dir, "embeddings")
      val qv = e.filter(col("vec_id") === 1).select("embedding")
        .head().getSeq[Float](0)
      val withVec = e.withColumnRenamed("embedding", EmbedOps.vecCol("emb"))
      val (indexed, model) = graft.embed.IvfIndex.build(withVec, "emb", nCells = 8)
      val res = graft.embed.IvfIndex.search(indexed, model, "emb", qv, k = 12, nProbe = 8,
          scoreCol = "raw", tieBreak = Seq(col("vec_id")))
        // Re-assert the order on the raw score: the hash compare is
        // order-sensitive and must not depend on search's internal sort
        // surviving the projection.
        .orderBy(col("raw").desc, col("vec_id"))
        .select(col("vec_id"), round(col("raw"), 3).as("score"))
        // Materialize the ≤12-row result, then release the built index —
        // without this the persisted frame outlives the query (every later
        // bench query pays its storage).
        .transform(graft.core.Persist.stage(_))
      indexed.unpersist()
      res
    }),

    "ann_ivf_saved" -> ((s, dir) => {
      // The durable IVF lifecycle: build (SAMPLED coarse fit — the 100 TB
      // path) → save (cell-partitioned parquet) → load → search. With
      // nProbe = nCells the result equals exact cosine top-k regardless of
      // where the sampled fit placed the centroids, so the sample-fit path
      // is oracle-checkable; that the probe filter prunes partitions on the
      // saved layout is pinned by IvfSpec.
      // Unique per run (see sem_index_roundtrip: shared paths race).
      val path = java.nio.file.Files.createTempDirectory("graft_verify_ivf").toString + "/idx"
      val e = read(s, dir, "embeddings")
      val qv = e.filter(col("vec_id") === 2).select("embedding")
        .head().getSeq[Float](0)
      val withVec = e.withColumnRenamed("embedding", EmbedOps.vecCol("emb"))
      val (indexed, model) = graft.embed.IvfIndex.build(withVec, "emb", nCells = 8,
        fitSampleFraction = 0.5)
      graft.embed.IvfIndex.save(indexed, model, "emb", "vec_id", path)
      indexed.unpersist()
      val (loaded, lModel) = graft.embed.IvfIndex.load(s, path)
      graft.embed.IvfIndex.search(loaded, lModel, "emb", qv, k = 12, nProbe = 8,
          scoreCol = "raw", tieBreak = Seq(col("vec_id")))
        .orderBy(col("raw").desc, col("vec_id"))
        .select(col("vec_id"), round(col("raw"), 3).as("score"))
    }),

    "sem_cluster" -> ((s, dir) => {
      // KMeans assignment is seed-deterministic within Spark but not
      // SQL-expressible → rows-only check (no oracle entry).
      val e = read(s, dir, "embeddings")
      EmbedOps.semClusterBy(
        e.withColumn("__txt", col("vec_id").cast("string")), "__txt", nClusters = 8)
        .select(col("vec_id"), col("cluster_id").cast("long").as("cluster_id"))
        .orderBy("vec_id")
    }),

    // ---------------- dedup suite -----------------------------------------
    "dedup_exact" -> ((s, dir) => {
      read(s, dir, "documents")
        .groupBy("text").agg(min(col("doc_id")).as("doc_id"))
        .select("doc_id", "text")
        .orderBy("doc_id")
    }),

    "dedup_minhash" -> ((s, dir) => {
      // Oracled end to end: minhashPairs verifies candidates with EXACT
      // hashed-shingle Jaccard, so its pair set equals the all-pairs
      // exact-Jaccard set whenever LSH candidate recall is 1. On the gate
      // corpus the planted near-dups all have J ≥ 0.889 and nothing else
      // exceeds 0.3 — every true pair shares a band with probability
      // ≈ 1-(1-0.889⁴)¹⁶ (miss ~1.5e-7), verified exhaustively against the
      // exact pair set at sf0.001 and sf0.01. The oracle is therefore the
      // recursive-CTE connected-components over exact string-shingle
      // Jaccard ≥ 0.5 (hashed-vs-string shingles differ only by 2⁻⁶⁴
      // collisions, same convention as dedup_ngram_jaccard).
      val d = read(s, dir, "documents")
      val pairs = Dedup.minhashPairs(d, "text", "doc_id", threshold = 0.5)
      Dedup.dropDuplicatesByPairs(d, "doc_id", pairs)
        .select("doc_id").orderBy("doc_id")
    }),

    "dedup_simhash" -> ((s, dir) => {
      // Oracled end to end: the 4×16-bit chunk bucketing has candidate
      // recall EXACTLY 1 for hamming ≤ 3 (pigeonhole), so the operator's
      // pair set equals the all-pairs hamming-≤3 set — and the simhash
      // itself (per-token FNV-1a + splitmix avalanche, ±1 majority votes)
      // is reproduced bit-exactly in the DuckDB oracle with UHUGEINT
      // mod-2⁶⁴ arithmetic. Fully hash-verified: signatures, bucketing
      // recall, verification, and connected components.
      val d = read(s, dir, "documents")
      val pairs = Dedup.simhashPairs(d, "text", "doc_id", maxDist = 3)
      Dedup.dropDuplicatesByPairs(d, "doc_id", pairs)
        .select("doc_id").orderBy("doc_id")
    }),

    "dedup_ngram_jaccard" -> ((s, dir) => {
      // Exact all-pairs n-gram Jaccard on a slice (the verification kernel
      // of the minhash path, run alone): pairs with J ≥ 0.2. The slice is
      // sized so planted near-dups land inside it (>0 result rows), and the
      // exact-Jaccard oracle hash-checks the kernel in DuckDB.
      // Hashed shingles (tight-loop expression → array<long>): intersecting
      // 8-byte hashes beats string shingles on the N² verify; Jaccard is
      // unchanged up to 2^-64 collisions, so the string-shingle oracle still
      // hash-matches.
      val d = read(s, dir, "documents").filter(col("doc_id") < 300)
      val sh = d.select(col("doc_id"),
        array_distinct(graft.functions.MinHashExpr.shingleHashes(
          split(trim(col("text")), "\\s+"), 3)).as("sh"))
      val a = sh.toDF("id1", "sh1")
      val b = sh.toDF("id2", "sh2")
      a.join(broadcast(b), col("id1") < col("id2"))
        .withColumn("j", Dedup.jaccard(col("sh1"), col("sh2")))
        .filter(col("j") >= 0.2)
        .select(col("id1"), col("id2"), round(col("j"), 3).as("jac"))
        .orderBy("id1", "id2")
    }),

    "pipeline_compose" -> ((s, dir) => {
      // Semantic + classical composition through one plan: LLM filter →
      // native text analysis → aggregate. Mirrors the reference's
      // filter-then-pandas composition tests (tests/test_filter.py:27-101).
      Sem.withLM(FakeLM(FakeBehavior.KeywordFilter("spark"))) {
        read(s, dir, "documents")
          .semFilter("the {text} mentions a certain data engine")
          .withColumn("n_tok", TF.tokenCount(col("text")))
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tok").cast("long")).as("sum_tok"))
          .orderBy("lang")
      }
    }),

    "corpus_clean_pipeline" -> ((s, dir) => {
      // The training-data cleaning pipeline as ONE plan: exact dedup (keep
      // min-id per text) → quality-score filter → per-language doc/token
      // stats. Every stage is native/codegen and the whole composition is
      // oracle-checked end to end.
      val d = read(s, dir, "documents")
      val keep = d.groupBy("text").agg(min("doc_id").as("doc_id"))
      val deduped = d.join(keep.select("doc_id"), Seq("doc_id"), "left_semi")
      deduped
        .withColumn("quality", TF.qualityScore(col("text")))
        .filter(col("quality") >= 0.5)
        .withColumn("n_tok", TF.tokenCount(col("text")))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok").cast("long")).as("sum_tok"))
        .orderBy("lang")
    }),

    // ---------------- text analysis ---------------------------------------
    "events_sessionize" -> ((s, dir) => {
      // Gap sessionization (30-min gap, ts in nanos): 0-based session ids
      // per user. One shuffle on user_id; (user_id, ts) is unique in the
      // data so the ordering is total.
      Temporal.sessionize(read(s, dir, "events"), "user_id", "ts",
          maxGap = 30L * 60 * 1000000000L)
        .select(col("event_id"), col("user_id"), col("session_id"))
        .orderBy("event_id")
    }),

    "events_asof_join" -> ((s, dir) => {
      // As-of join: each click picks up the most recent prior-or-same-ts
      // view's (event_id, value) for the same user — the union-window
      // single-shuffle form, no |L|×|R| range product.
      val e = read(s, dir, "events")
      val clicks = e.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val views = e.filter(col("event_type") === "view")
        .select("event_id", "user_id", "ts", "value")
      Temporal.asofJoin(clicks, views, Seq("user_id"), "ts",
          rightCols = Seq("event_id", "value"), suffix = "_view")
        .select(col("event_id"), col("user_id"),
          col("event_id_view"), col("value_view"))
        .orderBy("event_id")
    }),

    "corpus_sample_det" -> ((s, dir) => {
      // Deterministic content-hash sampling: membership is a pure function
      // of (salt, key) — same surviving rows on any cluster/partitioning/
      // engine. A pure filter: pushes to the scan, no shuffle.
      CorpusPrep.deterministicSample(read(s, dir, "documents"), "doc_id", 0.25, salt = "s1")
        .select(col("doc_id"), col("lang")).orderBy("doc_id")
    }),

    "corpus_quota_lang" -> ((s, dir) => {
      // Data mixing: cap each language at 50 docs (lowest doc_id first).
      // One shuffle on lang; the rank filter lowers to WindowGroupLimit so
      // only ≤ quota rows per group survive the partial stage.
      CorpusPrep.quotaPerGroup(read(s, dir, "documents"), "lang", "doc_id", 50)
        .select(col("doc_id"), col("lang")).orderBy("doc_id")
    }),

    "corpus_pack_seq" -> ((s, dir) => {
      // Training-sequence packing: within each language (doc_id order),
      // pack_id = floor(exclusive running token total / 512) — consecutive
      // docs share a pack until the token budget rolls over.
      val d = read(s, dir, "documents")
        .withColumn("n_tokens", TF.tokenCount(col("text")).cast("long"))
      CorpusPrep.packSequences(d, "lang", "doc_id", "n_tokens", maxTokens = 512)
        .select(col("doc_id"), col("lang"), col("n_tokens"), col("pack_id"))
        .orderBy("doc_id")
    }),

    "text_repetition" -> ((s, dir) => {
      // Gopher/C4-family repetition & gibberish signals: word repetition
      // ratio, top-bigram fraction, duplicate-trigram fraction, symbol-to-
      // word ratio, alphabetic-word fraction. All per-row HOF compositions —
      // work bounded by each doc's own length, no explode/shuffle (the shape
      // that keeps a corpus quality pass one narrow map at 100 TB).
      read(s, dir, "documents").select(
        col("doc_id"),
        round(TF.wordRepetitionRatio(col("text")), 4).as("rep_ratio"),
        round(TF.topNgramFraction(col("text"), 2), 4).as("top_bigram_frac"),
        round(TF.dupNgramFraction(col("text"), 3), 4).as("dup_trigram_frac"),
        round(TF.symbolWordRatio(col("text")), 4).as("symbol_ratio"),
        round(TF.alphaWordFraction(col("text")), 4).as("alpha_frac")
      ).orderBy("doc_id")
    }),

    "ann_sq8_search" -> ((s, dir) => {
      // Int8 scalar quantization through the durable IVF-SQ8 lifecycle:
      // build → save codes+scale (~4× smaller index) → load → search with
      // dequantized cosine. nProbe = nCells makes the probe exhaustive, so
      // the result is exactly the quantized cosine top-k — which the oracle
      // reproduces with the same quantization math in DuckDB list SQL.
      val path = java.nio.file.Files.createTempDirectory("graft_verify_sq8").toString + "/idx"
      val e = read(s, dir, "embeddings")
      val qv = e.filter(col("vec_id") === 3).select("embedding")
        .head().getSeq[Float](0)
      val withVec = e.withColumnRenamed("embedding", EmbedOps.vecCol("emb"))
      val (indexed, model) = graft.embed.IvfIndex.build(withVec, "emb", nCells = 8)
      graft.embed.IvfIndex.save(indexed, model, "emb", "vec_id", path, sq8 = true)
      indexed.unpersist()
      val (loaded, lModel) = graft.embed.IvfIndex.load(s, path)
      graft.embed.IvfIndex.search(loaded, lModel, "emb", qv, k = 12, nProbe = 8,
          scoreCol = "raw", tieBreak = Seq(col("vec_id")))
        .orderBy(col("raw").desc, col("vec_id"))
        .select(col("vec_id"), round(col("raw"), 3).as("score"))
    }),

    "text_stats" -> ((s, dir) => {
      read(s, dir, "documents").select(
        col("doc_id"),
        TF.tokenCount(col("text")).cast("long").as("n_tokens"),
        TF.bpeTokenEstimate(col("text")).cast("long").as("n_bpe"),
        round(TF.punctRatio(col("text")), 4).as("punct_ratio"),
        round(TF.stopwordRatio(col("text")), 4).as("stop_ratio"),
        TF.qualityScore(col("text")).as("quality"),
        TF.langId(col("text")).as("pred_lang"),
        TF.fingerprint(col("text")).as("fp")
      ).orderBy("doc_id")
    }),

    "multimodal_prompt" -> ((s, dir) => {
      // Image column → LLM prompt end-to-end: tag the column as an image,
      // sem_map resolves refs into chat image parts (LMRequest.images); the
      // fake answers with the data-URI payload length, a pure function of
      // the source text → DuckDB-checkable.
      Sem.withLM(FakeLM(FakeBehavior.ImagePayloadLen)) {
        val d = read(s, dir, "documents")
          // Spark base64() emits RFC-2045 line breaks — strip to plain b64.
          .withColumn("img", regexp_replace(
            base64(to_binary(col("text"), lit("utf-8"))), "[\\r\\n]", ""))
        MultimodalOps.tagImage(d, "img")
          .semMap("describe the {img}")
          .select(col("doc_id"), col("_map").cast("long").as("n_img_chars"))
          .orderBy("doc_id")
      }
    }),

    // ---------------- multimodal plumbing (stub decode) -------------------
    "multimodal_meta" -> ((s, dir) => {
      val d = read(s, dir, "documents")
        .select(col("doc_id"), to_binary(col("text"), lit("utf-8")).as("img"))
      MultimodalOps.decodeMeta(d, "img")
        .select(col("doc_id"), col("media_bytes").cast("long").as("n_bytes"),
          col("media_width").cast("long").as("width"),
          col("media_frames").cast("long").as("frames"))
        .orderBy("doc_id")
    })
  )

  /** DuckDB-runnable oracles. Keys must match `queries`; column aliases must
    * match the Spark result exactly (driver hashes sorted-by-name columns).
    */
  val oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
        |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_c,
        |  CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS sum_disc_c,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY 1,2 ORDER BY 1,2""".stripMargin,

    "q2_join_agg" ->
      """SELECT r_name, n_name,
        |  CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_c,
        |  count(DISTINCT o_orderkey) AS n_orders
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,

    "q3_topn" ->
      """SELECT o_orderkey, o_orderpriority, revenue_c FROM (
        |  SELECT l_orderkey, CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_c
        |  FROM lineitem GROUP BY 1) r
        |JOIN orders ON l_orderkey = o_orderkey
        |ORDER BY revenue_c DESC, o_orderkey LIMIT 10""".stripMargin,

    "q4_window" ->
      """SELECT o_custkey, o_orderkey, rk, run_c FROM (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk,
        |    CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) OVER (
        |      PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_c
        |  FROM orders) t
        |WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin,

    "q5_exists" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'))
        |ORDER BY c_custkey""".stripMargin,

    "q6_filter" ->
      """SELECT CAST(sum(CAST(round(l_extendedprice*l_discount*100) AS BIGINT)) AS BIGINT) AS revenue_c, count(*) AS n
        |FROM lineitem
        |WHERE l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin,

    "q7_setops" ->
      """SELECT p_brand FROM (
        |  SELECT p_brand FROM part WHERE p_size > 40
        |  UNION SELECT p_brand FROM part WHERE p_retailprice > 1800)
        |EXCEPT SELECT p_brand FROM part WHERE p_size < 3 AND p_retailprice < 500
        |ORDER BY p_brand""".stripMargin,

    "q8_events_window" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
        |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_c
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin,

    "q9_events_json" ->
      """SELECT event_type, CAST(sum(CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
        |  count(*) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "sem_filter_kw" ->
      """SELECT doc_id, text, lang, source, n_chars FROM documents
        |WHERE list_contains(string_split(lower(text), ' '), 'spark')
        |ORDER BY doc_id""".stripMargin,

    "sem_map_first3" ->
      """SELECT doc_id, array_to_string((string_split(text, ' '))[1:3], ' ') AS _map
        |FROM documents ORDER BY doc_id""".stripMargin,

    "sem_extract_stats" ->
      """SELECT doc_id, (string_split(text, ' '))[1] AS first_word,
        |  CAST(len(string_split(text, ' ')) AS VARCHAR) AS n_words
        |FROM documents ORDER BY doc_id""".stripMargin,

    "sem_join_kw" ->
      """SELECT d.doc_id, d.text, k.word
        |FROM (SELECT doc_id, text FROM documents WHERE doc_id < 40) d
        |CROSS JOIN (SELECT * FROM (VALUES ('spark'),('join'),('filter'),('window')) AS t(word)) k
        |WHERE list_contains(string_split(d.text, ' '), k.word)
        |ORDER BY d.doc_id, k.word""".stripMargin,

    "sem_agg_concat" ->
      """SELECT lang, string_agg(text, chr(10) ORDER BY doc_id) AS _output
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "sem_join_cascade" ->
      """SELECT d.doc_id, d.text, k.word
        |FROM (SELECT doc_id, text FROM documents WHERE doc_id < 40) d
        |CROSS JOIN (SELECT * FROM (VALUES ('spark'),('join'),('filter'),('window')) AS t(word)) k
        |WHERE list_contains(string_split(d.text, ' '), k.word)
        |ORDER BY d.doc_id, k.word""".stripMargin,

    "sem_filter_cascade" ->
      """SELECT doc_id, text, lang, source, n_chars FROM documents
        |WHERE list_contains(string_split(lower(text), ' '), 'spark')
        |ORDER BY doc_id""".stripMargin,

    "pipeline_compose" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(len(string_split(trim(text), ' '))) AS BIGINT) AS sum_tok
        |FROM documents
        |WHERE list_contains(string_split(lower(text), ' '), 'spark')
        |GROUP BY lang ORDER BY lang""".stripMargin,

    "sem_topk_quick" ->
      """SELECT doc_id, n_chars, rank FROM (
        |  SELECT doc_id, n_chars, row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rank
        |  FROM documents) t
        |WHERE rank <= 10 ORDER BY rank""".stripMargin,

    "sem_topk_heap" ->
      """SELECT doc_id, n_chars, rank FROM (
        |  SELECT doc_id, n_chars, row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rank
        |  FROM documents) t
        |WHERE rank <= 7 ORDER BY rank""".stripMargin,

    "ann_ivf_saved" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 2)
        |SELECT e.vec_id,
        |  round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])), 3) AS score
        |FROM embeddings e, q
        |ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])) DESC, e.vec_id
        |LIMIT 12""".stripMargin,

    "ann_ivf_search" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 1)
        |SELECT e.vec_id,
        |  round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])), 3) AS score
        |FROM embeddings e, q
        |ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])) DESC, e.vec_id
        |LIMIT 12""".stripMargin,

    "sem_topk_naive" ->
      """SELECT doc_id, n_chars, rank FROM (
        |  SELECT doc_id, n_chars, row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rank
        |  FROM documents WHERE doc_id < 60) t
        |WHERE rank <= 5 ORDER BY rank""".stripMargin,

    "sem_topk_quicksem" ->
      """SELECT doc_id, rank FROM (
        |  SELECT doc_id, row_number() OVER (ORDER BY length(text) DESC, text) AS rank
        |  FROM documents) t
        |WHERE rank <= 8 ORDER BY rank""".stripMargin,

    "sem_search_cos" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        |SELECT e.vec_id,
        |  round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])), 3) AS score
        |FROM embeddings e, q
        |ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])) DESC, e.vec_id
        |LIMIT 10""".stripMargin,

    "sem_sim_join_lsh_exact" ->
      """SELECT l.vec_id AS lid, r.vec_id AS rid,
        |  round(list_cosine_similarity(CAST(l.embedding AS DOUBLE[]), CAST(r.embedding AS DOUBLE[])), 3) AS score
        |FROM (SELECT * FROM embeddings WHERE vec_id < 50) l CROSS JOIN embeddings r
        |QUALIFY row_number() OVER (PARTITION BY l.vec_id
        |  ORDER BY list_cosine_similarity(CAST(l.embedding AS DOUBLE[]), CAST(r.embedding AS DOUBLE[])) DESC, r.vec_id) <= 3
        |ORDER BY lid, list_cosine_similarity(CAST(l.embedding AS DOUBLE[]), CAST(r.embedding AS DOUBLE[])) DESC, rid""".stripMargin,

    "sem_sim_join_cos" ->
      """SELECT l.vec_id AS lid, r.vec_id AS rid,
        |  round(list_cosine_similarity(CAST(l.embedding AS DOUBLE[]), CAST(r.embedding AS DOUBLE[])), 3) AS score
        |FROM (SELECT * FROM embeddings WHERE vec_id < 20) l CROSS JOIN embeddings r
        |QUALIFY row_number() OVER (PARTITION BY l.vec_id
        |  ORDER BY list_cosine_similarity(CAST(l.embedding AS DOUBLE[]), CAST(r.embedding AS DOUBLE[])) DESC, r.vec_id) <= 3
        |ORDER BY lid, list_cosine_similarity(CAST(l.embedding AS DOUBLE[]), CAST(r.embedding AS DOUBLE[])) DESC, rid""".stripMargin,

    "neardup_pairs_cos" ->
      """SELECT a.vec_id AS id1, b.vec_id AS id2,
        |  round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 3) AS score
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= 0.45
        |ORDER BY id1, id2""".stripMargin,

    "dedup_exact" ->
      """SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text ORDER BY doc_id""".stripMargin,

    // Exact-Jaccard connected components (see the dedup_minhash query
    // comment for why this equals the LSH pipeline's result on gate data).
    "dedup_minhash" ->
      """WITH RECURSIVE t AS (
        |  SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
        |s AS (
        |  SELECT doc_id,
        |    CASE WHEN len(w) <= 3 THEN [array_to_string(w, ' ')]
        |    ELSE list_transform(range(1, len(w)-1), i -> array_to_string(list_slice(w, i, i+2), ' ')) END AS sh
        |  FROM t),
        |pairs AS (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2
        |  FROM s a JOIN s b ON a.doc_id < b.doc_id
        |  WHERE len(list_distinct(list_intersect(a.sh, b.sh))) * 1.0 /
        |        len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5),
        |edges AS (SELECT id1 AS src, id2 AS dst FROM pairs UNION ALL SELECT id2, id1 FROM pairs),
        |reach(a, b) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src)
        |SELECT a AS doc_id FROM reach GROUP BY a HAVING min(b) = a ORDER BY doc_id""".stripMargin,

    // Bit-exact SimHash64 in SQL: FNV-1a + splitmix avalanche per distinct
    // token (UHUGEINT mod-2^64 arithmetic), ±1 majority votes per bit over
    // token occurrences, then all-pairs hamming <= 3 and connected
    // components — the full simhash dedup pipeline, hash-verified.
    "dedup_simhash" ->
      """WITH RECURSIVE pow2 AS (
        |  SELECT bit, CAST(power(2, bit) AS UHUGEINT) AS p FROM (SELECT unnest(range(64)) AS bit)),
        |toks AS (
        |  SELECT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS tok FROM documents),
        |vocab AS (SELECT DISTINCT tok FROM toks),
        |vh AS (SELECT tok, xor(h2, h2 // 2147483648) AS th FROM (
        |    SELECT tok, (xor(h1, h1 // 134217728) * CAST('10723151780598845931' AS UHUGEINT)) % CAST('18446744073709551616' AS UHUGEINT) AS h2 FROM (
        |      SELECT tok, (xor(h0, h0 // 1073741824) * CAST('13787848793156543929' AS UHUGEINT)) % CAST('18446744073709551616' AS UHUGEINT) AS h1 FROM (
        |        SELECT tok, list_reduce(
        |          list_prepend(CAST('14695981039346656037' AS UHUGEINT),
        |            list_transform(range(1, length(tok)+1), i -> CAST(unicode(tok[i]) AS UHUGEINT))),
        |          (h, b) -> (xor(h, b) * CAST('1099511628211' AS UHUGEINT)) % CAST('18446744073709551616' AS UHUGEINT)) AS h0
        |        FROM vocab)))),
        |tokbits AS (
        |  SELECT tok, bit, p, CASE WHEN (th // p) % 2 = 1 THEN 1 ELSE -1 END AS vote
        |  FROM vh CROSS JOIN pow2),
        |bits AS (
        |  SELECT t.doc_id, tb.bit, CASE WHEN sum(tb.vote) > 0 THEN tb.p ELSE 0 END AS contrib
        |  FROM toks t JOIN tokbits tb ON t.tok = tb.tok
        |  GROUP BY t.doc_id, tb.bit, tb.p),
        |sh AS (
        |  SELECT doc_id,
        |    CAST(CASE WHEN sum(CAST(contrib AS HUGEINT)) >= CAST('9223372036854775808' AS HUGEINT)
        |         THEN sum(CAST(contrib AS HUGEINT)) - CAST('18446744073709551616' AS HUGEINT)
        |         ELSE sum(CAST(contrib AS HUGEINT)) END AS BIGINT) AS h
        |  FROM bits GROUP BY doc_id),
        |pairs AS (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE bit_count(xor(a.h, b.h)) <= 3),
        |edges AS (SELECT id1 AS src, id2 AS dst FROM pairs UNION ALL SELECT id2, id1 FROM pairs),
        |reach(a, b) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src)
        |SELECT a AS doc_id FROM reach GROUP BY a HAVING min(b) = a ORDER BY doc_id""".stripMargin,

    "sem_dedup_drop" ->
      """WITH RECURSIVE pairs AS (
        |  SELECT a.vec_id AS id1, b.vec_id AS id2
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |  WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= 0.45),
        |edges AS (SELECT id1 AS src, id2 AS dst FROM pairs UNION ALL SELECT id2, id1 FROM pairs),
        |reach(a, b) AS (
        |  SELECT vec_id, vec_id FROM embeddings
        |  UNION
        |  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src)
        |SELECT a AS vec_id FROM reach GROUP BY a HAVING min(b) = a ORDER BY vec_id""".stripMargin,

    "sem_index_roundtrip" ->
      """SELECT vec_id, round(CAST(embedding[1] AS DOUBLE), 3) + 0.0 AS v1
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "llm_judge" ->
      """SELECT doc_id,
        |  array_to_string((string_split(text, ' '))[1:2], ' ') AS _judge0,
        |  array_to_string((string_split(text, ' '))[1:2], ' ') AS _judge1
        |FROM documents ORDER BY doc_id""".stripMargin,

    "pairwise_judge" ->
      """SELECT doc_id,
        |  CASE WHEN len(text) >= len(source) THEN 'A' ELSE 'B' END AS _judge0
        |FROM documents ORDER BY doc_id""".stripMargin,

    "dedup_ngram_jaccard" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(trim(text), ' ') AS w
        |  FROM documents WHERE doc_id < 300),
        |s AS (
        |  SELECT doc_id,
        |    CASE WHEN len(w) <= 3 THEN [array_to_string(w, ' ')]
        |    ELSE list_transform(range(1, len(w)-1), i -> array_to_string(list_slice(w, i, i+2), ' ')) END AS sh
        |  FROM t)
        |SELECT a.doc_id AS id1, b.doc_id AS id2,
        |  round(len(list_distinct(list_intersect(a.sh, b.sh))) * 1.0 /
        |        len(list_distinct(list_concat(a.sh, b.sh))), 3) AS jac
        |FROM s a JOIN s b ON a.doc_id < b.doc_id
        |WHERE len(list_distinct(list_intersect(a.sh, b.sh))) * 1.0 /
        |      len(list_distinct(list_concat(a.sh, b.sh))) >= 0.2
        |ORDER BY id1, id2""".stripMargin,

    "corpus_clean_pipeline" ->
      """WITH keep AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY text),
        |d AS (SELECT * FROM documents WHERE doc_id IN (SELECT doc_id FROM keep)),
        |q AS (
        |  SELECT lang, text,
        |    len(regexp_replace(text, '[^.,!?;:]', '', 'g')) * 1.0 / len(text) AS praw,
        |    len(list_filter(string_split(lower(trim(text)), ' '),
        |      w -> w IN ('the','a','an','and','or','of','to','in','is','it','that','for','on','with','as')))
        |      * 1.0 / len(string_split(lower(trim(text)), ' ')) AS sraw,
        |    len(string_split(trim(text), ' ')) AS ntok
        |  FROM d)
        |SELECT lang, count(*) AS n_docs, CAST(sum(ntok) AS BIGINT) AS sum_tok
        |FROM q
        |WHERE round((least(len(text)*1.0/500, 1.0) + least(sraw*5, 1.0) + greatest(0.0, 1.0 - praw*10)) / 3.0, 4) >= 0.5
        |GROUP BY lang ORDER BY lang""".stripMargin,

    "events_sessionize" ->
      """WITH g AS (
        |  SELECT event_id, user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_ns(ts) - epoch_ns(lag(ts) OVER w) > 1800000000000 THEN 1
        |         ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts))
        |SELECT event_id, user_id,
        |  CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_id
        |FROM g ORDER BY event_id""".stripMargin,

    "events_asof_join" ->
      """SELECT l.event_id, l.user_id,
        |  r.event_id AS event_id_view, r.value AS value_view
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') l
        |ASOF LEFT JOIN (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'view') r
        |  ON l.user_id = r.user_id AND l.ts >= r.ts
        |ORDER BY l.event_id""".stripMargin,

    "corpus_sample_det" ->
      """SELECT doc_id, lang FROM documents
        |WHERE substring(md5('s1' || '|' || CAST(doc_id AS VARCHAR)), 1, 4) < '4000'
        |ORDER BY doc_id""".stripMargin,

    "corpus_quota_lang" ->
      """SELECT doc_id, lang FROM documents
        |QUALIFY row_number() OVER (PARTITION BY lang ORDER BY doc_id) <= 50
        |ORDER BY doc_id""".stripMargin,

    "corpus_pack_seq" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens
        |  FROM documents)
        |SELECT doc_id, lang, n_tokens,
        |  CAST(floor((sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |    ROWS UNBOUNDED PRECEDING) - n_tokens) / 512.0) AS BIGINT) AS pack_id
        |FROM t ORDER BY doc_id""".stripMargin,

    "text_repetition" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    string_split(lower(trim(text)), ' ') AS words,
        |    CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n,
        |    CAST(len(regexp_extract_all(text, '#|\.\.\.')) AS BIGINT) AS n_sym
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, words, n, n_sym,
        |    CASE WHEN n >= 2 THEN list_transform(range(1, n), i -> words[i] || ' ' || words[i+1])
        |         ELSE [] END AS bi,
        |    CASE WHEN n >= 3 THEN list_transform(range(1, n-1), i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])
        |         ELSE [] END AS tri
        |  FROM t)
        |SELECT doc_id,
        |  round(CASE WHEN n = 0 THEN 0.0 ELSE 1.0 - len(list_distinct(words)) * 1.0 / n END, 4) AS rep_ratio,
        |  round(CASE WHEN len(bi) = 0 THEN 0.0
        |        ELSE list_max(list_transform(list_distinct(bi), b -> len(list_filter(bi, x -> x = b)))) * 1.0 / len(bi) END, 4) AS top_bigram_frac,
        |  round(CASE WHEN len(tri) = 0 THEN 0.0
        |        ELSE len(list_filter(tri, u -> len(list_filter(tri, x -> x = u)) > 1)) * 1.0 / len(tri) END, 4) AS dup_trigram_frac,
        |  round(CASE WHEN n = 0 THEN 0.0 ELSE n_sym * 1.0 / n END, 4) AS symbol_ratio,
        |  round(CASE WHEN n = 0 THEN 0.0
        |        ELSE len(list_filter(words, w -> regexp_matches(w, '[a-z]'))) * 1.0 / n END, 4) AS alpha_frac
        |FROM g ORDER BY doc_id""".stripMargin,

    "ann_sq8_search" ->
      """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 3),
        |s AS (
        |  SELECT vec_id,
        |    greatest(list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x))) / 127.0, 1e-30) AS scale,
        |    CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |d AS (
        |  SELECT vec_id, list_transform(v, x -> round(x / scale) * scale) AS dv
        |  FROM s)
        |SELECT d.vec_id, round(list_cosine_similarity(d.dv, q.qv), 3) AS score
        |FROM d, q
        |ORDER BY list_cosine_similarity(d.dv, q.qv) DESC, d.vec_id
        |LIMIT 12""".stripMargin,

    "text_stats" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |    string_split(lower(trim(text)), ' ') AS words,
        |    CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z0-9]{1,4}|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpe,
        |    len(regexp_replace(text, '[^.,!?;:]', '', 'g')) * 1.0 / len(text) AS praw
        |  FROM documents),
        |h AS (
        |  SELECT *,
        |    len(list_filter(words, w -> w IN ('the','and','of','to','in','is','you','that'))) AS en,
        |    len(list_filter(words, w -> w IN ('der','die','das','und','ist','nicht','ein','zu'))) AS de,
        |    len(list_filter(words, w -> w IN ('el','los','de','que','y','en','un','por'))) AS es,
        |    len(list_filter(words, w -> w IN ('le','les','et','est','une','des','dans','pour'))) AS fr,
        |    len(list_filter(words, w -> w IN ('the','a','an','and','or','of','to','in','is','it','that','for','on','with','as'))) * 1.0 / len(words) AS sraw
        |  FROM t)
        |SELECT doc_id, n_tokens, n_bpe,
        |  round(praw, 4) AS punct_ratio,
        |  round(sraw, 4) AS stop_ratio,
        |  round((least(len(text)*1.0/500, 1.0) + least(sraw*5, 1.0) + greatest(0.0, 1.0 - praw*10)) / 3.0, 4) AS quality,
        |  CASE WHEN fr > greatest(en, de, es) THEN 'fr'
        |       WHEN es > greatest(en, de) THEN 'es'
        |       WHEN de > en THEN 'de' ELSE 'en' END AS pred_lang,
        |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        |FROM h ORDER BY doc_id""".stripMargin,

    "multimodal_prompt" ->
      """SELECT doc_id,
        |  CAST(22 + 4 * ceil(strlen(text) / 3.0) AS BIGINT) AS n_img_chars
        |FROM documents ORDER BY doc_id""".stripMargin,

    "multimodal_meta" ->
      """SELECT doc_id, CAST(len(text) AS BIGINT) AS n_bytes,
        |  CAST(len(text) % 640 AS BIGINT) AS width,
        |  CAST(len(text) % 30 + 1 AS BIGINT) AS frames
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
