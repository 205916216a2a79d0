package graft

import org.apache.spark.sql.functions._
import graft.core.Sem
import graft.llm.{FakeBehavior, FakeLM}

class SemAggTopKSpec extends SparkSpec {
  import spark.implicits._

  private def docs = (0 until 50).map(i =>
    (i.toLong, if (i % 2 == 0) "g0" else "g1", s"doc-$i word" * (i % 5 + 1))
  ).toDF("id", "grp", "text")

  test("semAgg global fold equals ordered concat (associativity across rounds)") {
    // Tiny ctx forces ≥2 fold rounds even for 50 docs.
    val out = Sem.withLM(FakeLM(FakeBehavior.ConcatDocs("\n"), maxCtxLen = 600)) {
      docs.semAgg("summarize {text}", orderBy = Seq(col("id")))
    }
    val expected = docs.orderBy("id").select("text").as[String].collect().mkString("\n")
    assert(out.select("_output").as[String].head() == expected)
    assert(out.count() == 1)
  }

  test("semAgg frees each fold round's checkpoint blocks") {
    // Multi-round fold (tiny ctx): every round but the one backing the
    // returned plan must release its staged blocks — O(log n) rounds must
    // not pin O(log n) frame copies. driverFoldThreshold=0 disables the
    // small-tail driver fold so every round takes the DISTRIBUTED path
    // and the in-loop per-round unstage is what's under test (with the
    // default threshold a 50-doc fold finishes on the driver and the
    // in-loop free only ever sees an empty id set).
    val before = spark.sparkContext.getPersistentRDDs.size
    spark.conf.set("graft.semAgg.driverFoldThreshold", "0")
    val out =
      try Sem.withLM(FakeLM(FakeBehavior.ConcatDocs("\n"), maxCtxLen = 600)) {
        docs.semAgg("summarize {text}", orderBy = Seq(col("id")))
      }
      finally spark.conf.unset("graft.semAgg.driverFoldThreshold")
    val expected = docs.orderBy("id").select("text").as[String].collect().mkString("\n")
    assert(out.select("_output").as[String].head() == expected)
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after <= before + 1,
      s"at most the final round may stay persisted: $before -> $after")
  }

  test("semAgg group_by folds per group") {
    val out = Sem.withLM(FakeLM(FakeBehavior.ConcatDocs("\n"), maxCtxLen = 600)) {
      docs.semAgg("summarize {text}", groupBy = Seq("grp"), orderBy = Seq(col("id")))
    }
    assert(out.count() == 2)
    val g0 = out.filter($"grp" === "g0").select("_output").as[String].head()
    val exp0 = docs.filter($"grp" === "g0").orderBy("id").select("text").as[String]
      .collect().mkString("\n")
    assert(g0 == exp0)
  }

  test("semAgg allCols serializes every non-group column") {
    val out = Sem.withLM(FakeLM(FakeBehavior.ConcatDocs("|"))) {
      Seq((1L, "a"), (2L, "b")).toDF("id", "t")
        .semAgg("summarize {t}", allCols = true, orderBy = Seq(col("id")))
    }
    // allCols → both id and t values are serialized docs
    assert(out.select("_output").as[String].head() == "1|a|2|b")
  }

  test("semAgg converges when docs exceed the pack budget (fan-in ≥ 2)") {
    // Each doc is bigger than the per-pack char budget; without the pairwise
    // fan-in bound the fold would stall with one doc per pack.
    val big = (0 until 16).map(i => (i.toLong, s"D$i-" + ("x" * 3000))).toDF("id", "text")
    val out = Sem.withLM(FakeLM(FakeBehavior.ConcatDocs("\n"), maxCtxLen = 600)) {
      big.semAgg("summarize {text}", orderBy = Seq(col("id")))
    }
    val expected = big.orderBy("id").select("text").as[String].collect().mkString("\n")
    assert(out.select("_output").as[String].head() == expected)
  }

  test("semAgg folds within _lotus_partition_id first (reference magic column)") {
    val docs = (0 until 12).map(i =>
      (i.toLong, if (i % 2 == 0) s"alpha topic doc $i" else s"beta subject doc $i"))
      .toDF("id", "text")
    val parted = docs.semPartitionBy("text", 2)
    val out = Sem.withLM(FakeLM(FakeBehavior.ConcatDocs("\n"))) {
      parted.semAgg("summarize the {text}", orderBy = Seq(col("id")))
    }
    val got = out.select("_output").as[String].head()
    // Associative concat ⇒ the fold equals the flat concat in fold order,
    // which must be (partition_id, id) — partition-local first.
    val expected = parted.select("_lotus_partition_id", "id", "text")
      .as[(Int, Long, String)].collect().sortBy(t => (t._1, t._2)).map(_._3).mkString("\n")
    assert(got == expected)
  }

  test("semTopK quick returns exact ranks for a total-order comparator") {
    val df = (0 until 40).map(i => (i.toLong, s"t$i", (i * 7 % 40).toLong))
      .toDF("doc_id", "text", "n_chars")
    val out = Sem.withLM(FakeLM(FakeBehavior.PreferLonger())) {
      df.semTopK("most substantial {text} given {n_chars} and {doc_id}", k = 5)
    }
    val got = out.orderBy("rank").select("doc_id").as[Long].collect().toSeq
    val exp = (0 until 40).map(i => (i.toLong, (i * 7 % 40).toLong))
      .sortBy { case (id, n) => (-n, id) }.take(5).map(_._1)
    assert(got == exp)
  }

  test("semTopK groupBy ranks within each group") {
    val df = (0 until 20).map(i => (i.toLong, s"g${i % 2}", s"t$i", i.toLong))
      .toDF("doc_id", "grp", "text", "n_chars")
    val out = Sem.withLM(FakeLM(FakeBehavior.PreferLonger())) {
      df.semTopK("most substantial {text} given {n_chars} and {doc_id}", k = 2,
        groupBy = Seq("grp"))
    }
    val got = out.select("grp", "doc_id", "rank").as[(String, Long, Int)].collect().toSet
    assert(got == Set(("g0", 18L, 1), ("g0", 16L, 2), ("g1", 19L, 1), ("g1", 17L, 2)))
  }

  test("semTopK heap (distributed selection) matches quick") {
    val df = (0 until 60).map(i => (i.toLong, s"t$i", (i * 13 % 60).toLong))
      .toDF("doc_id", "text", "n_chars").repartition(4)
    val (q, h) = Sem.withLM(FakeLM(FakeBehavior.PreferLonger())) {
      (df.semTopK("{text} {n_chars} {doc_id}", k = 5, method = "quick"),
       df.semTopK("{text} {n_chars} {doc_id}", k = 5, method = "heap"))
    }
    assert(h.orderBy("rank").select("doc_id").as[Long].collect().toSeq ==
      q.orderBy("rank").select("doc_id").as[Long].collect().toSeq)
  }

  test("semTopK comparison cascade matches plain quick and saves oracle calls") {
    import graft.llm.{LMClient, LMRequest, LMResult}
    class CountingLM(inner: LMClient) extends LMClient {
      val calls = new java.util.concurrent.atomic.AtomicInteger(0)
      override def complete(batch: Seq[LMRequest]): Seq[LMResult] = {
        calls.addAndGet(batch.length); inner.complete(batch)
      }
    }
    val df = (0 until 40).map(i => (i.toLong, s"t$i", (i * 17 % 200).toLong))
      .toDF("doc_id", "text", "n_chars")
    val plainOracle = new CountingLM(FakeLM(FakeBehavior.PreferLonger()))
    val plain = Sem.withSettings(Sem.settings.copy(lm = plainOracle)) {
      df.semTopK("{text} {n_chars} {doc_id}", k = 5)
    }.orderBy("rank").select("doc_id").as[Long].collect().toSeq

    val cascadeOracle = new CountingLM(FakeLM(FakeBehavior.PreferLonger()))
    val cascaded = Sem.withSettings(Sem.settings.copy(
      lm = cascadeOracle,
      helperLm = Some(FakeLM(FakeBehavior.PreferLongerProb())))) {
      df.semTopK("{text} {n_chars} {doc_id}", k = 5, cascadeThreshold = Some(0.9))
    }.orderBy("rank").select("doc_id").as[Long].collect().toSeq

    assert(cascaded == plain)
    // Helper margins are wide for most pairs → far fewer oracle comparisons.
    assert(cascadeOracle.calls.get() < plainOracle.calls.get() / 2)
  }

  test("semTopK naive matches quick on small input") {
    val df = (0 until 15).map(i => (i.toLong, s"t$i", (i * 3 % 15).toLong))
      .toDF("doc_id", "text", "n_chars")
    val (q, n) = Sem.withLM(FakeLM(FakeBehavior.PreferLonger())) {
      (df.semTopK("{text} {n_chars} {doc_id}", k = 4, method = "quick"),
       df.semTopK("{text} {n_chars} {doc_id}", k = 4, method = "naive"))
    }
    assert(q.orderBy("rank").select("doc_id").as[Long].collect().toSeq ==
      n.orderBy("rank").select("doc_id").as[Long].collect().toSeq)
  }

  test("semTopK quick-sem matches quick under a total-order comparator") {
    val df = (0 until 40).map(i => (i.toLong, "x" * (1 + (i * 7 % 40))))
      .toDF("doc_id", "text")
    val (q, qs) = Sem.withLM(FakeLM(FakeBehavior.PreferLongerText())) {
      (df.semTopK("which {text} is more substantial", k = 6, method = "quick"),
       df.semTopK("which {text} is more substantial", k = 6, method = "quick-sem"))
    }
    assert(qs.orderBy("rank").select("doc_id").as[Long].collect().toSeq ==
      q.orderBy("rank").select("doc_id").as[Long].collect().toSeq)
  }

  test("semTopK heap and naive rank within groups") {
    val df = (0 until 24).map(i => (i.toLong, s"g${i % 3}", s"t$i", (i / 3).toLong))
      .toDF("doc_id", "grp", "text", "n_chars").repartition(4)
    val exp = Sem.withLM(FakeLM(FakeBehavior.PreferLonger())) {
      df.semTopK("most substantial {text} given {n_chars} and {doc_id}", k = 2,
        groupBy = Seq("grp"))
    }.select("grp", "doc_id", "rank").as[(String, Long, Int)].collect().toSet
    val (h, n) = Sem.withLM(FakeLM(FakeBehavior.PreferLonger())) {
      (df.semTopK("most substantial {text} given {n_chars} and {doc_id}", k = 2,
         groupBy = Seq("grp"), method = "heap"),
       df.semTopK("most substantial {text} given {n_chars} and {doc_id}", k = 2,
         groupBy = Seq("grp"), method = "naive"))
    }
    assert(h.select("grp", "doc_id", "rank").as[(String, Long, Int)].collect().toSet == exp)
    assert(n.select("grp", "doc_id", "rank").as[(String, Long, Int)].collect().toSet == exp)
  }
}
