package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class TfIdfSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),
    (3L, "entirely different vocabulary about spark engines"),
    (4L, "the quick brown fox jumps over the lazy dog")  // exact dup of 1
  ).toDF("doc_id", "text")

  test("identical documents have cosine 1") {
    val pairs = TfIdf.similarPairs(docs, "text", "doc_id", threshold = 0.5).get
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(pairs.get((1L, 4L)).contains(1.0))
  }

  test("near-duplicates score high, unrelated docs do not appear") {
    val pairs = TfIdf.similarPairs(docs, "text", "doc_id", threshold = 0.5).get
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2)).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((2L, 4L)))
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("postings weight distinctive terms above ubiquitous ones") {
    val w = TfIdf.postings(docs, "text", "doc_id")
      .as[(Long, String, Double)].collect()
      .groupBy(_._2).map { case (t, rows) => t -> rows.head._3 }
    // "the" appears in 3 of 4 docs (tf=2 each); "spark" in 1 of 4 (tf=1):
    // per-occurrence weight of "spark" must exceed "the"'s
    assert(w("spark") > w("the") / 2)
  }

  test("maxDfFraction removes ubiquitous terms from the similarity space") {
    // at 0.6, every term with df 3/4 ("the quick brown fox jumps over
    // lazy") is filtered: docs 1 and 4 then both reduce to {dog} (cosine
    // exactly 1), doc 2 reduces to {cat} and shares nothing with anyone
    val pruned = TfIdf.similarPairs(docs, "text", "doc_id", threshold = 0.5,
      maxDfFraction = 0.6).get.as[(Long, Long, Double)].collect().toSet
    assert(pruned == Set((1L, 4L, 1.0)))
  }

  test("empty and whitespace-only documents are ignored, not crashed on") {
    val withEmpty = docs.union(Seq((5L, ""), (6L, "   \t ")).toDF("doc_id", "text"))
    val pairs = TfIdf.similarPairs(withEmpty, "text", "doc_id", threshold = 0.5).get
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2)).toSet
    assert(!pairs.exists { case (a, b) => a >= 5L || b >= 5L })
    assert(pairs.contains((1L, 4L)))
  }

  test("a threshold above every non-dup cosine keeps only exact dups") {
    val got = TfIdf.similarPairs(docs, "text", "doc_id", threshold = 0.999).get
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 4L, 1.0)))
  }

  test("dense and sparse strategies emit identical pairs (threshold > 0)") {
    // random small corpus from a bounded vocabulary so BOTH strategies are
    // reachable; the chooser is forced each way and the results must agree
    val rnd = new scala.util.Random(17)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta")
    val corpus = (0 until 30).map { i =>
      (i.toLong, Seq.fill(6 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    for (t <- Seq(0.3, 0.7, 0.95)) {
      val dense = TfIdf.similarPairs(corpus, "text", "doc_id", threshold = t).get
        .as[(Long, Long, Double)].collect().toSet
      val sparse = TfIdf.similarPairs(corpus, "text", "doc_id", threshold = t,
        denseMaxVocab = 0).get
        .as[(Long, Long, Double)].collect().toSet
      assert(dense == sparse, s"strategies disagree at threshold $t")
    }
  }

  test("bm25Search ranks the distinctive-term doc first and respects k") {
    val corpus = Seq(
      (0L, "zygote wavelet kraken in a short doc"),
      (1L, "common words about tables and rows and columns here"),
      (2L, "more common words about tables and columns and data"),
      (3L, "zygote appears here too but this document is much longer " +
        "with many extra words diluting the term frequency signal badly")
    ).toDF("doc_id", "text")
    val queries = Seq((100L, "zygote wavelet")).toDF("query_id", "qtext")
    val got = TfIdf.bm25Search(corpus, queries, "text", "doc_id",
      "qtext", "query_id", k = 2).get
      .orderBy("rank")
      .select("queryId", "docId", "rank").as[(Long, Long, Int)].collect()
    assert(got.length == 2)                    // only docs 0 and 3 match at all
    assert(got(0) == ((100L, 0L, 1)))          // both query terms, short doc
    assert(got(1) == ((100L, 3L, 2)))          // one term, length-penalized
  }

  test("bm25Search: scores decrease with rank and ties break by doc id") {
    val corpus = Seq(
      (0L, "alpha beta"), (1L, "alpha beta"), (2L, "alpha beta gamma"))
      .toDF("doc_id", "text")
    val queries = Seq((9L, "alpha beta")).toDF("query_id", "qtext")
    val got = TfIdf.bm25Search(corpus, queries, "text", "doc_id",
      "qtext", "query_id", k = 3).get
      .orderBy("rank")
      .select("docId", "score").as[(Long, Double)].collect()
    assert(got.map(_._1).toSeq == Seq(0L, 1L, 2L)) // twins tie → id order; longer doc last
    assert(got(0)._2 == got(1)._2 && got(1)._2 > got(2)._2)
  }

  test("bm25Search validates its parameters") {
    val df = Seq((0L, "a")).toDF("doc_id", "text")
    val q = Seq((0L, "a")).toDF("query_id", "qtext")
    assert(TfIdf.bm25Search(df, q, "text", "doc_id", "qtext", "query_id", k = 0).isFailing)
    assert(TfIdf.bm25Search(df, q, "text", "doc_id", "qtext", "query_id", b = 1.5).isFailing)
  }

  test("nDocs pass-through skips the count action (no Spark job until the caller acts)") {
    // a derived-frame caller that already knows N must not pay a full
    // pipeline re-execution for the internal df.count()
    val corpus = Seq((0L, "alpha beta"), (1L, "beta gamma"), (2L, "gamma delta"))
      .toDF("doc_id", "text")
    val queries = Seq((9L, "beta")).toDF("query_id", "qtext")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val counter = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(counter)
    try {
      val p = TfIdf.postings(corpus, "text", "doc_id", nDocs = Some(3L))
      val s = TfIdf.bm25Search(corpus, queries, "text", "doc_id",
        "qtext", "query_id", k = 2, nDocs = Some(3L)).get
      // listener delivery is async — give the bus a beat, then demand zero
      Thread.sleep(500)
      assert(jobs.get() == 0,
        s"building the frames must run NO job with nDocs given, saw ${jobs.get()}")
      // and the explicit N must produce the same results as the counted one
      val viaCount = TfIdf.postings(corpus, "text", "doc_id")
        .collect().map(_.toSeq).toSet
      assert(p.collect().map(_.toSeq).toSet == viaCount)
      val searchViaCount = TfIdf.bm25Search(corpus, queries, "text", "doc_id",
        "qtext", "query_id", k = 2).get.collect().map(_.toSeq).toSet
      assert(s.collect().map(_.toSeq).toSet == searchViaCount)
    } finally spark.sparkContext.removeSparkListener(counter)
  }

  test("rrfFuse combines rankings by sum of 1/(k+rank), ties break on doc") {
    val a = Seq(("q1", 10L, 1), ("q1", 20L, 2), ("q1", 30L, 3)).toDF("q", "doc", "rank")
    val b = Seq(("q1", 20L, 1), ("q1", 10L, 2), ("q1", 40L, 3)).toDF("q", "doc", "rank")
    val fused = TfIdf.rrfFuse(Seq(a, b), Seq("q"), "doc", "rank", k = 60, topK = 10).get
      .as[(String, Long, Double, Int)].collect()
      .map(r => r._2 -> (r._3, r._4)).toMap
    val s = (r1: Int, r2: Int) =>
      math.rint((1.0 / (60 + r1) + 1.0 / (60 + r2)) * 1e6) / 1e6
    // 10 and 20 have SYMMETRIC ranks (1,2)/(2,1): same score, doc tiebreak
    assert(fused(10L) == ((s(1, 2), 1)))
    assert(fused(20L) == ((s(1, 2), 2)))
    assert(fused(30L)._1 == math.rint(1.0 / 63 * 1e6) / 1e6)
    assert(Set(fused(30L)._2, fused(40L)._2) == Set(3, 4))
    // topK caps the fused list
    val top1 = TfIdf.rrfFuse(Seq(a, b), Seq("q"), "doc", "rank", topK = 1).get
    assert(top1.count() == 1)
    // single ranking passes through (scores are monotone in rank)
    val solo = TfIdf.rrfFuse(Seq(a), Seq("q"), "doc", "rank").get
      .as[(String, Long, Double, Int)].collect().sortBy(_._4).map(_._2).toSeq
    assert(solo == Seq(10L, 20L, 30L))
  }

  test("leakageTriage: gram hits gate candidacy, BM25 orders them, " +
      "non-leaks never appear") {
    val benchText = "the secret benchmark question about unique kraken " +
      "zygote wavelet phenomena"
    val bench = Seq((0L, benchText)).toDF("doc_id", "text")
    val train = Seq(
      // verbatim leak (all 8-grams) — must rank 1
      (10L, "prefix words then " + benchText + " and a suffix"),
      // partial leak: first 8 words only (one 8-gram hit), diluted in a
      // much longer doc — must rank below the verbatim leak
      (11L, "the secret benchmark question about unique kraken zygote " +
        "padding padding padding padding padding padding padding padding " +
        "padding padding padding padding padding padding padding padding"),
      // shares TERMS (bm25 > 0) but no 8-gram — must NOT appear
      (12L, "kraken zygote wavelet mentioned in a different order with " +
        "other words between every one of them"),
      (13L, "entirely unrelated text about spark physical plans")
    ).toDF("doc_id", "text")
    val got = TfIdf.leakageTriage(train, bench, "text", "doc_id",
        "text", "doc_id", n = 8, k = 5).get
      .orderBy("rank")
      .select("queryId", "docId", "n_hit_grams", "rank")
      .as[(Long, Long, Long, Int)].collect()
    assert(got.map(_._2).toSeq == Seq(10L, 11L),
      s"expected verbatim leak first, partial second, no term-only docs: " +
        s"${got.toSeq}")
    assert(got(0)._3 > got(1)._3, "verbatim leak must hit more grams")
    assert(TfIdf.leakageTriage(train, bench, "text", "doc_id", "text",
      "doc_id", n = 0).isFailing)
    assert(TfIdf.leakageTriage(train, bench, "text", "doc_id", "text",
      "doc_id", k = 0).isFailing)
  }
}
