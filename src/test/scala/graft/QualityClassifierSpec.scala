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
}
