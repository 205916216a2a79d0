package graft

import org.apache.spark.sql.functions._
import graft.operators.QualityClassifier

class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (0L, "good clean prose about science", true),
    (1L, "good thorough prose about history", true),
    (2L, "clean thorough text about science", true),
    (3L, "spam spam click here now", false),
    (4L, "click here spam free free", false),
    (5L, "now free spam click spam", false),
    (6L, "", true)
  ).toDF("id", "text", "label")

  test("NB recovers class-discriminative tokens: positive-only words get " +
      "positive llr, negative-only words negative, and scores separate") {
    val m = QualityClassifier.trainNaiveBayes(corpus, "text", "label")
    assert(m.llr("science") > 0 && m.llr("prose") > 0)
    assert(m.llr("spam") < 0 && m.llr("click") < 0)
    // lower-count evidence weighs less than the heaviest class marker
    assert(math.abs(m.llr("about")) < math.abs(m.llr("spam")))
    val scored = QualityClassifier.scoreNaiveBayes(corpus, "text", m)
      .select("id", "nb_score", "nb_pred", "label").collect()
    val (pos, neg) = scored.filter(_.getLong(0) != 6L)
      .partition(_.getBoolean(3))
    assert(pos.map(_.getDouble(1)).min > neg.map(_.getDouble(1)).max,
      "separable corpus must separate")
    assert(pos.forall(_.getBoolean(2)) && neg.forall(!_.getBoolean(2)))
  }

  test("empty document scores exactly the prior") {
    val m = QualityClassifier.trainNaiveBayes(corpus, "text", "label")
    val s = QualityClassifier.scoreNaiveBayes(corpus, "text", m)
      .filter(col("id") === 6L).select("nb_score").head().getDouble(0)
    assert(s == m.prior)
  }

  test("one-class corpus fails loudly, not with a NaN model") {
    val oneClass = corpus.filter(col("label"))
    val e = intercept[IllegalArgumentException] {
      QualityClassifier.trainNaiveBayes(oneClass, "text", "label")
    }
    assert(e.getMessage.contains("both classes"))
  }

  test("minCount prunes the vocabulary and the pruned words score as OOV") {
    val m = QualityClassifier.trainNaiveBayes(corpus, "text", "label",
      minCount = 2L)
    // singletons (science appears 2x, history 1x) drop at minCount=2
    assert(!m.llr.contains("history"))
    assert(m.llr.contains("spam"))
  }

  test("vocab bound refuses an oversized model literal") {
    val e = intercept[IllegalArgumentException] {
      QualityClassifier.trainNaiveBayes(corpus, "text", "label",
        maxVocabEntries = 3)
    }
    assert(e.getMessage.contains("maxVocabEntries"))
  }

  test("DSIR log-weights rank target-like documents above off-target ones " +
      "and weight 1-gram-identical docs identically") {
    val raw = Seq(
      (0L, "science prose science prose"),
      (1L, "prose science prose science"), // same multiset as 0
      (2L, "spam click spam click"),
      (3L, "science prose spam click")
    ).toDF("doc_id", "text")
    val target = Seq((10L, "science prose about science")).toDF("doc_id", "text")
    val m = QualityClassifier.fitDsir(raw, target, "text")
    val w = QualityClassifier.dsirLogWeights(raw, "text", m)
      .select("doc_id", "dsir_logw").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w(0L) == w(1L), "bag-of-words weights ignore order")
    assert(w(0L) > w(3L) && w(3L) > w(2L),
      "more target mass must mean higher weight")
  }

  test("importance resampling keeps every row at uniform weights, always " +
      "keeps the heaviest row, and is partitioning-invariant") {
    val even = (0L until 200L).map(i => (i, 0.0)).toDF("id", "lw")
    assert(QualityClassifier.importanceResample(even, "id", "lw").count() == 200,
      "p = 1 for every row must keep every row")
    val skew = (0L until 200L).map(i => (i, if (i == 42L) 0.0 else -3.0))
      .toDF("id", "lw")
    val kept = QualityClassifier.importanceResample(skew, "id", "lw", salt = "z")
      .select("id").as[Long].collect().toSet
    assert(kept.contains(42L), "the max-weight row accepts with p = 1")
    assert(kept.size < 40, s"exp(-3) ~ 0.05 acceptance, got ${kept.size}/200")
    val repart = QualityClassifier.importanceResample(
        skew.repartition(13), "id", "lw", salt = "z")
      .select("id").as[Long].collect().toSet
    assert(repart == kept, "membership is a pure function of (salt, id, logw)")
    assert(QualityClassifier.importanceResample(
      even.limit(0), "id", "lw").count() == 0)
  }

  test("DSIR tokens unseen in BOTH fit corpora fold the constant " +
      "smoothing-floor ratio per occurrence") {
    val raw = Seq((0L, "a b")).toDF("doc_id", "text")
    val target = Seq((1L, "a c")).toDF("doc_id", "text")
    val m = QualityClassifier.fitDsir(raw, target, "text")
    val held = Seq((7L, "zz zz"), (8L, "zz")).toDF("doc_id", "text")
    val w = QualityClassifier.dsirLogWeights(held, "text", m)
      .select("doc_id", "dsir_logw").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w(7L) == 2 * m.oovLr && w(8L) == m.oovLr)
  }

  test("importanceResample with a supplied normalizer keeps exactly the " +
      "auto path's rows; a too-low normalizer clamps heavy rows to " +
      "always-keep instead of losing them") {
    val d = spark.range(200).toDF("id")
      .withColumn("lw", -(col("id").cast("double")) / 50.0)
    val auto = QualityClassifier.importanceResample(d, "id", "lw", "s1")
      .select("id").as[Long].collect().toSet
    val mx = d.agg(max("lw")).head().getDouble(0)
    val norm = QualityClassifier.importanceResample(d, "id", "lw", "s1",
        normalizer = Some(mx))
      .select("id").as[Long].collect().toSet
    assert(norm == auto, s"supplied-max must match auto: ${norm.size} vs ${auto.size}")
    // normalizer BELOW the true max: rows with lw > m get p > 1 → cutoff
    // clamps to always-keep; the very heaviest rows can never be lost.
    val low = QualityClassifier.importanceResample(d, "id", "lw", "s1",
        normalizer = Some(mx - 2.0))
      .select("id").as[Long].collect().toSet
    assert((0L until 100L).forall(low.contains),
      "rows with lw above the low normalizer must always survive")
    assert(auto.subsetOf(low),
      "a lower normalizer only raises acceptance, never drops a kept row")
  }

  private def langCorpus = Seq(
    (0L, "the cat sat on the mat", "en"),
    (1L, "the dog and the bird went there", "en"),
    (2L, "she was there with the things", "en"),
    (3L, "der hund und die katze schlafen", "de"),
    (4L, "die kinder gehen durch den wald", "de"),
    (5L, "das haus steht auf dem huegel", "de"),
    (6L, "el gato y el perro duermen", "es"),
    (7L, "los ninos van por el bosque", "es"),
    (8L, "la casa esta sobre la colina", "es")
  ).toDF("id", "text", "lang")

  test("char-ngram NB language ID: trained on labels, predicts held-out " +
      "text of each language; CJK needs no tokenizer") {
    val m = QualityClassifier.trainLangNB(langCorpus, "text", "lang")
    assert(m.classes == Seq("de", "en", "es"))
    val held = Seq(
      (10L, "the bird sat with the dog"),
      (11L, "der wald und das haus"),
      (12L, "el perro va por la casa")
    ).toDF("id", "text")
    val preds = QualityClassifier.scoreLangNB(held, "text", m)
      .select("id", "lang_pred").as[(Long, String)].collect().toMap
    assert(preds == Map(10L -> "en", 11L -> "de", 12L -> "es"), preds.toString)
    // Char grams make scripts without whitespace tokenization work — the
    // case the stopword-lexicon langId cannot express.
    val zh = langCorpus.unionByName(Seq(
      (20L, "我们在公园里散步看花", "zh"),
      (21L, "他们喜欢在山上看日出", "zh"),
      (22L, "今天的天气很好我们去海边", "zh")).toDF("id", "text", "lang"))
    val mz = QualityClassifier.trainLangNB(zh, "text", "lang")
    val zPred = QualityClassifier.scoreLangNB(
        Seq((30L, "我们去山上看花")).toDF("id", "text"), "text", mz)
      .select("lang_pred").as[String].head()
    assert(zPred == "zh", zPred)
  }

  test("lang NB scoring is one zero-shuffle per-row fold; empty text " +
      "scores the priors and ties break to the smallest class") {
    val m = QualityClassifier.trainLangNB(langCorpus, "text", "lang")
    val scored = QualityClassifier.scoreLangNB(
      Seq((0L, "")).toDF("id", "text"), "text", m)
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    val r = scored.select("lang_pred", "lang_score").head()
    // Empty text: every class scores exactly its prior; 3 docs per class
    // → equal priors → the tie breaks to the first sorted class.
    assert(r.getString(0) == "de", r.toString)
    assert(math.abs(r.getDouble(1) - math.log(3.0 / 9.0)) < 1e-12)
  }

  test("lang NB margin: positive when confident, exactly 0 on a class " +
      "tie, and never negative") {
    val m = QualityClassifier.trainLangNB(langCorpus, "text", "lang")
    // Empty text ties every class at its (equal) prior → margin 0.
    val tied = QualityClassifier.scoreLangNB(
        Seq((0L, "")).toDF("id", "text"), "text", m)
      .select("lang_margin").as[Double].head()
    assert(tied == 0.0, s"prior tie must give margin 0, got $tied")
    val margins = QualityClassifier.scoreLangNB(langCorpus, "text", m)
      .select("lang_margin").as[Double].collect()
    assert(margins.forall(_ >= 0.0))
    // Training docs re-scored under their own model separate cleanly.
    assert(margins.max > 1.0, margins.mkString(","))
  }

  test("tight-loop gram kernels match the composable reference exactly: " +
      "counts are the same multiset, scores the same doubles") {
    import graft.functions.LookupExprs
    import graft.operators.QualityClassifier.{charNgrams, normText}
    // Tricky shapes: multi-space runs, a supplementary char (one
    // codepoint), text shorter than the longest n, empty after trim.
    val clef = new String(Character.toChars(0x1D11E))
    val texts = Seq("The  quick   brown fox", s"a${clef}b c", "xy", "  ",
      "ab ab ab")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val lens = Seq(1, 2, 3)
    val viaKernel = df.select(col("id"),
        explode(LookupExprs.charNgramCounts(normText(col("text")), lens))
          .as(Seq("g", "n")))
      .as[(Long, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => r._2 -> r._3).toMap).toMap
    val viaRef = df.select(col("id"),
        explode(charNgrams(col("text"), lens)).as("g"))
      .as[(Long, String)].collect()
      .groupBy(_._1).view.mapValues(
        _.groupBy(_._2).view.mapValues(_.length.toLong).toMap).toMap
    assert(viaKernel == viaRef, s"$viaKernel vs $viaRef")
    // Scoring: the kernel's (pred, score) equals the composable fold —
    // same grams, same left-to-right order, priors last.
    val m = QualityClassifier.trainLangNB(langCorpus, "text", "lang",
      ngramLens = Seq(1, 2))
    val kernel = QualityClassifier.scoreLangNB(
        langCorpus.select(col("id"), col("text")), "text", m)
      .select("id", "lang_pred", "lang_score")
      .as[(Long, String, Double)].collect().sortBy(_._1)
    val lut = typedLit(m.logLik)
    val oovLit = typedLit(m.oov)
    val priorLit = typedLit(m.logPrior)
    val composable = langCorpus.select(col("id"),
        aggregate(
          charNgrams(col("text"), m.ngramLens),
          typedLit(Seq.fill(m.classes.length)(0.0)).cast("array<double>"),
          (acc, g) => zip_with(acc,
            coalesce(element_at(lut, g), oovLit), (a, b) => a + b),
          acc => zip_with(acc, priorLit, (a, b) => a + b)).as("sc"))
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
    kernel.zip(composable).foreach { case ((id, pred, score), (id2, sc)) =>
      assert(id == id2)
      val mx = sc.max
      val idx = sc.indexOf(mx)
      assert(pred == m.classes(idx), s"row $id: $pred vs ${m.classes(idx)}")
      assert(score == mx, s"row $id: $score vs $mx (must be bit-identical)")
    }
  }

  test("lang NB bounds fail loudly: class cap, vocab cap, null labels") {
    val e1 = intercept[IllegalArgumentException] {
      QualityClassifier.trainLangNB(langCorpus, "text", "lang", maxClasses = 2)
    }
    assert(e1.getMessage.contains("classes"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      QualityClassifier.trainLangNB(langCorpus, "text", "lang",
        maxVocabEntries = 5)
    }
    assert(e2.getMessage.contains("vocabulary"), e2.getMessage)
    val withNull = langCorpus.unionByName(
      Seq((99L, "x", null.asInstanceOf[String])).toDF("id", "text", "lang"))
    val e3 = intercept[IllegalArgumentException] {
      QualityClassifier.trainLangNB(withNull, "text", "lang")
    }
    assert(e3.getMessage.contains("label"), e3.getMessage)
  }
  test("thresholdForPrecision: loosest cut holding the floor, exact counts, " +
      "loud when unreachable, loud on unbounded scores") {
    // hand histogram: score 3 -> 4 pos / 0 neg; 2 -> 2 pos / 2 neg;
    // 1 -> 0 pos / 4 neg. Prefix precisions: 1.0 (>=3), 0.75 (>=2), 0.5.
    val rows =
      Seq.fill(4)((3, true)) ++
      (Seq.fill(2)((2, true)) ++ Seq.fill(2)((2, false))) ++
      Seq.fill(4)((1, false))
    val df = rows.toDF("score", "label")
    def cut(t: Double) = QualityClassifier.thresholdForPrecision(
        df, "score", "label", t)
      .select("threshold", "precision", "recall", "n_kept", "n_pos_total")
      .as[(Int, Double, Double, Long, Long)].head()
    // target 0.7: the loosest qualifying cut is >=2 (precision 0.75,
    // recall 1.0) even though >=3 also qualifies — max recall wins
    assert(cut(0.7) == ((2, 0.75, 1.0, 8L, 6L)))
    // target 0.9: only the >=3 prefix qualifies
    val c9 = cut(0.9)
    assert(c9._1 == 3 && c9._2 == 1.0 && c9._4 == 4L && c9._5 == 6L)
    assert(math.abs(c9._3 - 0.666667) < 1e-6)
    // unreachable target fails loudly (no pure prefix exists here:
    // every cut keeps equal pos/neg)
    val impure = Seq((3, true), (3, false), (1, true), (1, false))
      .toDF("score", "label")
    val e = intercept[IllegalArgumentException](
      QualityClassifier.thresholdForPrecision(
        impure, "score", "label", 0.9).count())
    assert(e.getMessage.contains("NO score cut"), e.getMessage)
    // unbounded score cardinality refused before the window
    val wide = (0 until 500).map(i => (i.toDouble, i % 2 == 0)).toDF("score", "label")
    val e2 = intercept[IllegalArgumentException](
      QualityClassifier.thresholdForPrecision(wide, "score", "label", 0.5,
        maxDistinctScores = 100).count())
    assert(e2.getMessage.contains("maxDistinctScores") ||
      e2.getMessage.contains("distinct"), e2.getMessage)
  }
}
