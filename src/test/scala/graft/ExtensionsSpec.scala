package graft

import org.apache.spark.sql.functions._

class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  GraftExtensions.register(spark)

  test("SQL functions reach the same kernels as the DataFrame wrappers") {
    val df = Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("id", "text")
    df.createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql(
      """SELECT simhash64(split(trim(text), '\\s+')) AS sh,
        |  minhash_signature(split(trim(text), '\\s+'), 3, 8) AS mh,
        |  ngram_repetition(split(trim(text), '\\s+'), 2).dup_frac AS dup,
        |  deflate_ratio(text) AS dr,
        |  array_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dot
        |FROM ext_docs""".stripMargin).head()
    val viaDf = df.select(
      functions.MinHashExpr.simhash64(split(trim($"text"), "\\s+")).as("sh"),
      functions.MinHashExpr.minhashSignature(split(trim($"text"), "\\s+"), 3, 8).as("mh"),
      functions.MinHashExpr.ngramRepetition(split(trim($"text"), "\\s+"), 2)
        .getField("dup_frac").as("dup"),
      functions.CompressExpr.deflateRatio($"text").as("dr")).head()
    assert(viaSql.getLong(0) == viaDf.getLong(0))
    assert(viaSql.getSeq[Long](1) == viaDf.getSeq[Long](1))
    assert(viaSql.getDouble(2) == viaDf.getDouble(2))
    assert(viaSql.getDouble(3) == viaDf.getDouble(3))
    assert(viaSql.getDouble(4) == 11.0)
    val uni = spark.sql(
      "SELECT strip_accents(nfc_normalize('café')), nfkc_normalize('ﬁn')")
      .head()
    assert(uni.getString(0) == "cafe")
    assert(uni.getString(1) == "fin")
    // Merge-based set Jaccard: {1,2,3} vs {2,3,4} -> 2/4, unsorted input.
    val jac = spark.sql(
      "SELECT long_set_jaccard(array(3L, 1L, 2L), array(2L, 4L, 3L))").head()
    assert(jac.getDouble(0) == 0.5)
    // NULL elements: one distinct element per side, exactly matching the
    // size(array_intersect)/size(array_union) composition the kernel
    // replaces — and identical on ANY physical array representation
    // (GenericArrayData would NPE, UnsafeArrayData would silently read 0).
    val jn = spark.sql(
      """SELECT long_set_jaccard(array(1L, NULL), array(CAST(NULL AS BIGINT), 2L)) AS k,
        |  size(array_intersect(array(1L, NULL), array(CAST(NULL AS BIGINT), 2L))) /
        |  CAST(size(array_union(array(1L, NULL), array(CAST(NULL AS BIGINT), 2L))) AS DOUBLE) AS c
        |""".stripMargin).head()
    assert(jn.getDouble(0) == jn.getDouble(1), s"$jn")
    assert(jn.getDouble(0) == 1.0 / 3.0)
  }

  test("vector_avg aggregates through SQL identically to the Column API") {
    import graft.operators.EmbedOps
    Seq((0, Seq(1.0f, 3.0f)), (0, Seq(3.0f, 5.0f)), (1, Seq(2.0f, 2.0f)))
      .toDF("g", "v").createOrReplaceTempView("graft_ext_vecs")
    val viaSql = spark.sql(
      "SELECT g, vector_avg(v) AS m FROM graft_ext_vecs GROUP BY g")
      .as[(Int, Seq[Double])].collect().toMap
    assert(viaSql == Map(0 -> Seq(2.0, 4.0), 1 -> Seq(2.0, 2.0)))
    // A null ELEMENT is refused loudly — ArrayData would read it as 0.0
    // and silently skew the centroid.
    val err = intercept[Throwable] {
      spark.sql("SELECT vector_avg(v) FROM (SELECT array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)) AS v)").collect()
    }
    def messages(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + messages(t.getCause)
    assert(messages(err).contains("null element"), messages(err))
  }

  test("subword_tokenize matches the DataFrame kernel through SQL and " +
      "requires a foldable vocab") {
    val viaSql = spark.sql(
      """SELECT subword_tokenize(array('window', 'windo'),
        |  array('win', 'w', 'i', 'n', 'd', 'o', 'window')) AS p,
        |  subword_tokenize(array('xq'), array('x'), '?') AS u""".stripMargin)
      .head()
    assert(viaSql.getSeq[String](0) == Seq("window", "win", "d", "o"))
    assert(viaSql.getSeq[String](1) == Seq("x", "?"))
    val viaDf = Seq(Tuple1(Seq("window", "windo"))).toDF("ws")
      .select(functions.SubwordExpr.subwordTokenize($"ws",
        Seq("win", "w", "i", "n", "d", "o", "window")))
      .head().getSeq[String](0)
    assert(viaDf == viaSql.getSeq[String](0))
    val e = intercept[Exception] {
      spark.sql(
        "SELECT subword_tokenize(array('a'), array(c)) FROM (SELECT 'x' AS c)")
        .collect()
    }
    assert(e.getMessage.contains("foldable"), e.getMessage)
    // A non-string element type is rejected at registration (not silently
    // stringified), and a null vocab element fails loudly there too (not
    // as an NPE inside the kernel at eval time).
    val t = intercept[Exception] {
      spark.sql("SELECT subword_tokenize(array('a'), array(1, 2, 3))").collect()
    }
    assert(t.getMessage.contains("array<string>"), t.getMessage)
    val n = intercept[Exception] {
      spark.sql(
        "SELECT subword_tokenize(array('a'), array('x', CAST(NULL AS STRING)))")
        .collect()
    }
    assert(n.getMessage.contains("null element"), n.getMessage)
  }

  test("url_normalize matches the DataFrame kernel through SQL") {
    val viaSql = spark.sql(
      "SELECT url_normalize('HTTP://A.COM:80/x?utm_source=f&b=2&a=1#h') AS u")
      .head().getString(0)
    assert(viaSql == "http://a.com/x?a=1&b=2")
    val viaDf = Seq(Tuple1("HTTP://A.COM:80/x?utm_source=f&b=2&a=1#h"))
      .toDF("u").select(functions.UrlExpr.urlNormalize($"u"))
      .head().getString(0)
    assert(viaDf == viaSql)
  }

  test("registrable_domain / markdown_strip / latex_strip / " +
      "winnow_fingerprints match their DataFrame forms through SQL") {
    assert(spark.sql(
      "SELECT registrable_domain('https://shop.site.co.uk/p') AS d")
      .head().getString(0) == "site.co.uk")
    assert(spark.sql(
      "SELECT registrable_domain('http://www.city.kobe.jp/w') AS d")
      .head().getString(0) == "city.kobe.jp")
    assert(spark.sql(
      "SELECT markdown_strip('# T\n**b** [x](http://u)') AS t")
      .head().getString(0) == "T\nb x")
    assert(spark.sql(
      "SELECT latex_strip('\\\\textbf{kept} % c') AS t")
      .head().getString(0) == "kept")
    val viaSql = spark.sql(
      "SELECT winnow_fingerprints('a b c d e f g h i j', 3, 2) AS f")
      .head().getSeq[String](0)
    val viaDf = Seq(Tuple1("a b c d e f g h i j")).toDF("t")
      .select(graft.operators.Dedup.winnowFingerprints($"t", 3, 2))
      .head().getSeq[String](0)
    assert(viaSql == viaDf && viaSql.nonEmpty)
  }

  test("shape parameters must be literals; arity is checked") {
    val e = intercept[Exception] {
      spark.sql("SELECT minhash_signature(array('a'), 1 + 2, 8)").collect()
    }
    assert(e.getMessage.contains("literal"), e.getMessage)
    val a = intercept[Exception] {
      spark.sql("SELECT simhash64(array('a'), 2)").collect()
    }
    assert(a.getMessage.contains("simhash64"), a.getMessage)
  }
}
