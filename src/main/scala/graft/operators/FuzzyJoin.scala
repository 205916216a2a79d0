package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy string joins that never enumerate N² pairs: exact edit-distance
  * self-join (ED-Join) and asymmetric n-gram containment join (quote /
  * near-complete-copy detection). Both follow the repo's candidate→verify
  * convention: a filtered equi-join generates candidates, a codegen'd
  * thresholded kernel verifies them exactly — the result is EXACT, only
  * the work is pruned.
  *
  * Reference scope: lotus expresses fuzzy matching through LLM sem_join /
  * sem_sim_join (embeddings); character-level and shingle-containment
  * matching are the classical non-LLM tiers a 100 TB curation pipeline
  * runs FIRST (URL/title canonicalization, OCR noise, boilerplate quotes)
  * because they are orders of magnitude cheaper per pair.
  */
object FuzzyJoin {

  /** All pairs (id1 < id2) with `levenshtein(s1, s2) <= maxDist`, without
    * the N² cross join — ED-Join (Xiao, Wang, Lin: "Ed-Join: an efficient
    * algorithm for similarity joins with edit distance constraints",
    * VLDB 2008), prefix-filter variant.
    *
    * Route: an edit operation destroys at most `q` positional q-grams, so
    * ed(a,b) ≤ d implies the positional q-gram multisets of a and b match
    * (value-equal, positions within ±d) in all but ≤ q·d grams per side.
    * Order every string's grams by a global total order (xxhash64(gram),
    * pos — deterministic, needs NO corpus statistics pass) and keep the
    * first q·d+1 as its PREFIX: any qualifying pair then shares a gram
    * HASH across the two prefixes. (Proof shape: each prefix holds ≥ 1
    * matched gram; if neither side's match lands in the other's prefix,
    * the two matches' order relations force both prefix grams onto one
    * hash class, which the hash equi-join finds anyway. ED-Join's additional
    * POSITIONAL pruning is deliberately NOT in the join condition — the
    * prefix pigeonhole does not promise the shared-hash pair is
    * position-close, so |Δpos| ≤ d there can drop true pairs; the
    * thresholded verify prunes false candidates at O(d·len) instead.)
    * Candidates are therefore one equi-join on the prefix gram hash
    * (explode factor ≤ q·d+1, shuffle keys hash-uniform) filtered by
    * length (|Δlen| ≤ d, implied by ed ≤ d), then verified with Spark's
    * THRESHOLDED `levenshtein(l, r, d)` — the banded DP, codegen'd, which
    * abandons a pair the moment the distance exceeds d. The hash choice
    * (64-bit xxhash64, one long per gram) never affects the RESULT —
    * collisions only merge gram classes, which widens the candidate set
    * the exact verify then prunes.
    *
    * Strings too short to own q·d+1 grams (len < q·(d+1)) cannot rely on
    * the pigeonhole and take a length-banded equi-join instead; a partner
    * of such a string has len < q·(d+1)+d by the length filter, so the
    * short route's frame is bounded by the short tail of the length
    * distribution, never the corpus. Pairs where BOTH sides are
    * gram-eligible are excluded from the short route, so no pair is
    * emitted twice.
    *
    * At 100 TB: one explode (≤ q·d+1 rows per string, carrying the string
    * payload for the zero-join verify), one equi-join shuffle on uniform
    * hash keys, one dropDuplicates on the candidate pair ids. Designed for
    * SHORT strings (titles, URLs, lines, names — the strings edit distance
    * is meaningful for); for documents, shingle-level containment or
    * minhash is the right tier. NULL strings are dropped (edit distance to
    * NULL is undefined; filter upstream to keep them).
    *
    * `orderByFrequency = true` replaces the hash gram order with document
    * frequency ascending (rarest-first prefixes — ED-Join §4.1's actual
    * ordering) at the cost of a df aggregate plus a per-string bounded
    * rank window. Exactness is preserved under ANY total order; taking
    * the first q·d+1 DISTINCT grams only widens the multiset prefix's
    * value set. On gram-dense corpora (short alphabets, heavy shared
    * substrings) it cuts the candidate join directly — measured 2.3× at
    * the ×30 synthetic geometry (29k phrases over a ~30-word vocab, an
    * adversarially gram-dense corpus; `fuzzy_join_scale` in
    * BENCH_HISTORY.jsonl). `q` is the other selectivity knob: larger
    * grams are rarer (fewer candidates) but cost a longer prefix
    * (q·d+1) and exclude more strings to the short route.
    */
  def editDistanceSelfJoin(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int, q: Int = 2, distCol: String = "dist",
      orderByFrequency: Boolean = false,
      maxCandidatePairs: Long = 2_000_000_000L): DataFrame = {
    require(maxDist >= 0, s"editDistanceSelfJoin: maxDist $maxDist must be >= 0")
    require(q >= 1, s"editDistanceSelfJoin: q $q must be >= 1")
    val prefLen = q * maxDist + 1
    val minGramLen = q * (maxDist + 1) // len >= this  <=>  #grams >= prefLen
    val base = df
      .filter(col(idCol).isNotNull && col(strCol).isNotNull)
      .select(col(idCol).as("__id"), col(strCol).as("__s"),
        length(col(strCol)).as("__len"))

    // Gram route: strings owning >= prefLen grams. Prefix = first
    // prefLen (xxhash64(gram), pos) structs under array_sort's struct order —
    // hash first, position tiebreak, fully deterministic with zero
    // statistics passes (frequency-ascending ordering is the classical
    // candidate-minimizing refinement; it costs a corpus aggregate and
    // changes no answers, so this implementation trades it for a
    // stat-free plan).
    val eligible = base.filter(col("__len") >= minGramLen)
    val pref =
      if (orderByFrequency) {
        // Frequency ordering over NARROW (id, gram-hash) rows only — the
        // payload attaches once per PREFIX row at the end. The previous
        // shape carried (__s, __len) through the df join and a rank window
        // over every gram row (payload shuffled twice per gram), and the
        // window sorted whole partitions — profiled as one single-task
        // 1.7 s job at sf0.1 after AQE coalesced the small shuffle. The
        // per-string prefix is a BOUNDED top-k, so a per-group sorted
        // slice over collect_list (each group ≤ the string's gram count)
        // replaces the partition-wide sort; ascending (df, hash) struct
        // order is exactly the window's orderBy, and any total order
        // keeps the join exact (see docstring).
        val stagedE = graft.core.Persist.stage(eligible)
        val gramH = stagedE.select(col("__id"),
          explode(array_distinct(transform(
            sequence(lit(1), col("__len") - (q - 1)),
            i => xxhash64(col("__s").substr(i, lit(q)))))).as("__h"))
        val dfreq = gramH.groupBy("__h").agg(count(lit(1)).as("__df"))
        gramH.join(dfreq, "__h")
          .groupBy("__id").agg(slice(array_sort(
            collect_list(struct(col("__df"), col("__h")))), 1, prefLen)
            .as("__pg"))
          .select(col("__id"), explode(col("__pg.__h")).as("__h"))
          .join(stagedE, "__id")
          .select(col("__id"), col("__s"), col("__len"), col("__h"))
      } else eligible
        .withColumn("__pg", slice(array_sort(transform(
          sequence(lit(1), col("__len") - (q - 1)),
          i => struct(xxhash64(col("__s").substr(i, lit(q))).as("h"), i.as("p")))),
          1, prefLen))
        .select(col("__id"), col("__s"), col("__len"),
          col("__pg.h").as("__hs"))
        .select(col("__id"), col("__s"), col("__len"),
          explode(array_distinct(col("__hs"))).as("__h"))
    // Candidate budget before the join (the cells-route occupancy-guard
    // convention): the prefix self-join emits Σ_h n_h·(n_h−1)/2 pairs.
    // A quasi-unique string multiset over a tiny alphabet (every pair at
    // distance ≈ d) detonates here — refuse loudly, naming the knobs.
    val stagedPref = graft.core.Persist.stage(pref)
    val candidateCount = stagedPref.groupBy("__h")
      .agg(count(lit(1)).as("__n"))
      .agg(coalesce(sum(col("__n") * (col("__n") - lit(1L))), lit(0L)))
      .head().getLong(0) / 2
    if (candidateCount > maxCandidatePairs) throw new IllegalStateException(
      s"editDistanceSelfJoin: prefix grams fan out to $candidateCount " +
        s"candidate pairs (> maxCandidatePairs = $maxCandidatePairs) — " +
        "this string set is gram-dense at maxDist = " + maxDist + "; use " +
        "orderByFrequency = true if not already, raise q, lower maxDist, " +
        "or raise maxCandidatePairs deliberately")
    val l = stagedPref.toDF("id1", "s1", "len1", "h1")
    val r = stagedPref.toDF("id2", "s2", "len2", "h2")
    val gramCand = l.join(r,
        col("h1") === col("h2") &&
          col("id1") < col("id2") &&
          abs(col("len1") - col("len2")) <= maxDist)
      .select("id1", "s1", "id2", "s2")
      .dropDuplicates("id1", "id2")

    // Short route: at least one side below the gram-eligibility bound.
    // Left joins on its exact length; right explodes the d+1 candidate
    // partner lengths <= its own, so each unordered pair matches exactly
    // one (length, direction) key — direction is shorter-left (id-ordered
    // on equal lengths), NOT id-ordered, so the emitted ids re-canonicalize
    // via least/greatest; no post-join dedup needed.
    val shortAll = base.filter(col("__len") < minGramLen + maxDist)
    val shortL = shortAll.toDF("id1", "s1", "len1")
    val shortR = shortAll
      .withColumn("__k", explode(sequence(col("__len") - maxDist, col("__len"))))
      .filter(col("__k") >= 0)
      .toDF("id2", "s2", "len2", "k")
    val shortCand = shortL.join(shortR,
        col("len1") === col("k") &&
          (col("len1") < col("len2") ||
            (col("len1") === col("len2") && col("id1") < col("id2"))) &&
          (col("len1") < minGramLen || col("len2") < minGramLen))
      .select(least(col("id1"), col("id2")).as("id1"), col("s1"),
        greatest(col("id1"), col("id2")).as("id2"), col("s2"))

    gramCand.unionAll(shortCand)
      .withColumn(distCol, levenshtein(col("s1"), col("s2"), maxDist))
      .filter(col(distCol) >= 0) // thresholded form returns -1 past maxDist
      .select(col("id1"), col("id2"), col(distCol))
  }

  /** Asymmetric shingle-containment self-join: ordered pairs (a, b),
    * a ≠ b, with C(a→b) = |grams(a) ∩ grams(b)| / |grams(a)| ≥
    * `minContainment` — "a is (mostly) contained in b". The signal Jaccard
    * structurally misses: a paragraph quoted inside a 100× longer page has
    * J ≈ |a|/|b| ≈ 0.01 but C(a→b) = 1.0. Standard alongside dedup in web
    * curation (quote/boilerplate provenance, near-complete-copy with
    * additions).
    *
    * Route (exact, PPJoin-style asymmetric prefix filter): C(a→b) ≥ c
    * needs overlap ≥ ⌈c·|A|⌉, so under any global gram order a's first
    * |A| − ⌈c·|A|⌉ + 1 grams (≈ (1−c)·|A|+1, SMALL for high c) must hit
    * b — the contained side explodes only its prefix, while the containing
    * side exposes all grams (asymmetry is irreducible: b must be findable
    * by ANY of its grams). Candidates equi-join on the 64-bit gram hash,
    * dedup to pairs, then the sorted-set arrays join back and the
    * merge-pass [[graft.functions.LongSetOps.computeOverlap]] kernel
    * verifies the exact count — same verify shape as the minhash route
    * (`Dedup.minhashDedup`), reusing its hashed-shingle representation
    * (Jaccard/containment unchanged up to 2^-64 collisions).
    *
    * At scale the containing side's full inverted index is the dominant
    * exchange — linear in corpus grams, the exact shape `ngram_novelty`
    * and the decontaminator already pay. The probe prefix's GRAM ORDER
    * decides the candidate count: the default md5 order is statistics-free
    * but samples grams uniformly, so on corpora dense in shared grams
    * (boilerplate, tiny vocabularies) a probe gram can carry a huge
    * document frequency and the candidate join goes quadratic in it.
    * `orderByFrequency = true` spends two extra linear shuffles (gram df
    * aggregate + per-doc rank) to probe with each document's RAREST
    * (1−c)·|A|+1 grams instead — the PPJoin/ED-Join canonical ordering,
    * near-minimal candidates. Both orders are total, so BOTH routes are
    * exact; only the pruning power differs. Use frequency ordering
    * whenever the corpus is large enough that the df aggregate is cheaper
    * than the extra candidates (that is: almost always past toy scale).
    */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
      shingleLen: Int = 3, minContainment: Double = 0.8,
      contCol: String = "containment",
      orderByFrequency: Boolean = false,
      maxCandidatePairs: Long = 2_000_000_000L): DataFrame = {
    require(minContainment > 0.0 && minContainment <= 1.0,
      s"containmentPairs: minContainment $minContainment must be in (0, 1]")
    val sh = df
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("__id"),
        array_sort(array_distinct(graft.functions.MinHashExpr.shingleHashes(
          split(trim(col(textCol)), "\\s+"), shingleLen))).as("__sh"))
      .filter(size(col("__sh")) > 0)
    // Probe prefix: smallest md5-ordered slice that MUST intersect any
    // containing superset — |A| − ⌈c·|A|⌉ + 1 grams. The gram hashes are
    // already 64-bit uniform; ordering by md5 of their decimal form keeps
    // the global-order convention identical to the ED-Join prefix (any
    // fixed total order is correct — only candidate counts change).
    // The ceil subtracts a 1e-9 guard first: c·|A| can float-round just
    // ABOVE the exact integer (0.07·100 = 7.000000000000001), and an
    // over-ceil would shorten the prefix by one gram — a silent recall
    // hole at knife-edge thresholds that the double-compared verify
    // stage (overlap/|A| >= c) would otherwise accept.
    val nGrams = size(col("__sh"))
    val probeLen =
      (nGrams - ceil(nGrams * minContainment - lit(1e-9)) + lit(1)).cast("int")
    val index = sh
      .select(col("__id").as("id2"), explode(col("__sh")).as("__g"))
    // Gram document frequencies: the rarest-first ordering AND the
    // candidate budget both read them (one linear aggregate, staged).
    val dfreq = graft.core.Persist.stage(
      index.groupBy("__g").agg(count(lit(1)).as("__df")))
    val probe =
      if (orderByFrequency) {
        // Rarest-first probe: rank each doc's grams by corpus document
        // frequency (ties by gram — a total order), keep the first
        // probeLen. The rank window partitions by doc id (≤ |A| rows per
        // partition — never a global window).
        val rn = row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("__id")).orderBy(col("__df"), col("__g")))
        sh.select(col("__id"), explode(col("__sh")).as("__g"),
            probeLen.as("__pl"))
          .join(dfreq, "__g")
          .withColumn("__rn", rn)
          .filter(col("__rn") <= col("__pl"))
          .select(col("__id").as("id1"), col("__g"))
      } else
        sh.select(col("__id").as("id1"),
            explode(slice(
              array_sort(transform(col("__sh"),
                g => struct(md5(g.cast("string")).as("h"), g.as("g")))),
              lit(1), probeLen)).as("__pg"))
          .select(col("id1"), col("__pg.g").as("__g"))
    // Candidate budget, EXACTLY, BEFORE the join (the cells-route
    // occupancy-guard convention): the inverted join emits Σ df(g) over
    // probe instances. On gram-dense corpora (tiny vocabularies,
    // boilerplate) exact containment approaches all-pairs density and
    // this refuses loudly instead of detonating a 100 GB shuffle —
    // route such corpora through the minhash/cells tiers, raise the
    // containment threshold (shorter probes), or raise the budget
    // deliberately.
    val candidateCount = probe.join(dfreq, "__g")
      .agg(coalesce(sum(col("__df")), lit(0L))).head().getLong(0)
    if (candidateCount > maxCandidatePairs) throw new IllegalStateException(
      s"containmentPairs: probe grams fan out to $candidateCount candidate " +
        s"pairs (> maxCandidatePairs = $maxCandidatePairs). This corpus is " +
        "gram-dense for exact containment at minContainment = " +
        s"$minContainment — use orderByFrequency = true if not already, " +
        "raise minContainment, route through minhash/semantic dedup, or " +
        "raise maxCandidatePairs deliberately")
    val cand = probe.join(index,
        probe("__g") === index("__g") && col("id1") =!= col("id2"))
      .select("id1", "id2")
      .dropDuplicates("id1", "id2")
    // Verify: join the sorted set arrays back and run the merge-pass
    // intersection kernel once per candidate pair.
    val a = sh.toDF("id1", "sh1")
    val b = sh.toDF("id2", "sh2")
    cand.join(a, "id1").join(b, "id2")
      .withColumn(contCol,
        graft.functions.VectorExprs.longSetOverlap(col("sh1"), col("sh2"))
          .cast("double") / size(col("sh1")))
      .filter(col(contCol) >= minContainment)
      .select(col("id1"), col("id2"), col(contCol))
  }

  /** The directional cleaning ACTION on top of [[containmentPairs]]:
    * drop the CONTAINED document, keep the container — the right shape
    * for quote pages, near-complete copies and excerpt chains, where
    * connected-components keep-one (the symmetric near-dup policy) would
    * collapse a quote CHAIN a⊂b⊂c to one survivor chosen blind to
    * direction. Policy: a document is dropped iff SOME container of it
    * wins under (`score` desc, id asc) — so strict chains drop every
    * contained member and keep the maximal document, and MUTUAL
    * containment (near-identical pairs, each ≥ c contained in the other)
    * resolves to exactly one survivor via the total order. A containee
    * that outscores all its containers survives alongside them (nothing
    * strictly better subsumes it). Default score = word count (keep the
    * longest; published excerpt cleaning keeps the superset document).
    *
    * Cost = [[containmentPairs]] (prefix-filtered, budget-guarded) plus
    * two narrow (id, score) joins and one anti-join — no window, no
    * connected components, no extra corpus scan.
    */
  def dropContained(df: DataFrame, idCol: String, textCol: String,
      shingleLen: Int = 3, minContainment: Double = 0.8,
      score: Option[Column] = None,
      orderByFrequency: Boolean = false,
      maxCandidatePairs: Long = 2_000_000_000L): DataFrame = {
    val sc = score.getOrElse(
      size(split(trim(col(textCol)), "\\s+")).cast("long"))
    val pairs = containmentPairs(df, idCol, textCol, shingleLen,
      minContainment, orderByFrequency = orderByFrequency,
      maxCandidatePairs = maxCandidatePairs)
    val scores = df.select(col(idCol).as("__sid"), sc.as("__score"))
    val drops = pairs
      .join(scores.toDF("__sid1", "__s1"), col("id1") === col("__sid1"))
      .join(scores.toDF("__sid2", "__s2"), col("id2") === col("__sid2"))
      .filter(col("__s2") > col("__s1") ||
        (col("__s2") === col("__s1") && col("id2") < col("id1")))
      .select(col("id1"))
    df.join(drops, col(idCol) === col("id1"), "left_anti")
  }
}
