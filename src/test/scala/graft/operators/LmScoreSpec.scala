package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.functional.Fail

class LmScoreSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val eps = 1e-12

  test("unigramScores matches hand-computed add-1 log-probabilities") {
    // corpus: c(a)=2, c(b)=3, N=5, V=2 -> p(a)=3/7, p(b)=4/7
    val df = Seq((1L, "a b a"), (2L, "b b")).toDF("id", "text")
    val rows = LmScore.unigramScores(df, "text", "id").get
      .orderBy("id")
      .select("id", "n_tokens", "avg_logprob", "perplexity")
      .as[(Long, Long, Double, Double)].collect()
    val lpA = math.log(3.0 / 7.0)
    val lpB = math.log(4.0 / 7.0)
    val d1 = (lpA + lpB + lpA) / 3.0
    val d2 = lpB
    assert(rows(0)._1 == 1L && rows(0)._2 == 3L)
    assert(math.abs(rows(0)._3 - d1) < eps)
    assert(math.abs(rows(0)._4 - math.exp(-d1)) < eps)
    assert(rows(1)._2 == 2L && math.abs(rows(1)._3 - d2) < eps)
  }

  test("bigramScores matches hand-computed add-1 transition probabilities") {
    // bigrams: doc1 (a,b),(b,a); doc2 (b,b); c1(a)=2, c1(b)=3, V=2
    val df = Seq((1L, "a b a"), (2L, "b b")).toDF("id", "text")
    val rows = LmScore.bigramScores(df, "text", "id").get
      .orderBy("id")
      .select("id", "n_bigrams", "avg_logprob")
      .as[(Long, Long, Double)].collect()
    val d1 = (math.log(2.0 / 4.0) + math.log(2.0 / 5.0)) / 2.0
    val d2 = math.log(2.0 / 5.0)
    assert(rows(0)._2 == 2L && math.abs(rows(0)._3 - d1) < eps)
    assert(rows(1)._2 == 1L && math.abs(rows(1)._3 - d2) < eps)
  }

  test("tokenless and single-token documents are absent, not scored as zero") {
    val df = Seq((1L, "a b"), (2L, "   "), (3L, "solo")).toDF("id", "text")
    assert(LmScore.unigramScores(df, "text", "id").get
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    assert(LmScore.bigramScores(df, "text", "id").get
      .select("id").as[Long].collect().toSeq == Seq(1L))
  }

  test("gibberish scores below corpus-typical text") {
    val typical = Seq.tabulate(20)(i => (i.toLong, "the quick brown fox jumps over the lazy dog"))
    val df = (typical :+ (99L, "zxq vvkw qqj zxq")).toDF("id", "text")
    val scores = LmScore.unigramScores(df, "text", "id").get
      .select("id", "avg_logprob").as[(Long, Double)].collect().toMap
    assert(scores(99L) < scores(0L))
  }

  test("non-positive smoothing is rejected") {
    val df = Seq((1L, "a")).toDF("id", "text")
    assert(LmScore.unigramScores(df, "text", "id", k = 0.0) match {
      case Fail(e) => e.getMessage.contains("smoothing")
      case _       => false
    })
  }

  test("buckets labels by cutoff with inclusive upper bounds") {
    val df = Seq((0L, 10.0), (1L, 30.0), (2L, 30.0001), (3L, 30.5), (4L, 99.0))
      .toDF("id", "perplexity")
    val got = LmScore.buckets(df, "perplexity", Seq(30.0, 30.5)).get
      .select("id", "bucket").as[(Long, String)].collect().toMap
    assert(got == Map(0L -> "head", 1L -> "head", 2L -> "middle",
      3L -> "middle", 4L -> "tail"))
  }

  test("buckets surfaces a NULL score as a NULL bucket, never the tail label") {
    val df = Seq((0L, Some(10.0)), (1L, None), (2L, Some(99.0)))
      .toDF("id", "perplexity")
    val got = LmScore.buckets(df, "perplexity", Seq(30.0, 30.5)).get
      .select("id", "bucket").as[(Long, Option[String])].collect().toMap
    assert(got == Map(0L -> Some("head"), 1L -> None, 2L -> Some("tail")))
  }

  test("buckets validates cutoff order and label arity") {
    val df = Seq((0L, 1.0)).toDF("id", "s")
    assert(LmScore.buckets(df, "s", Seq(2.0, 1.0)).isFailing)
    assert(LmScore.buckets(df, "s", Seq(1.0), labels = Seq("only")).isFailing)
    assert(LmScore.buckets(df, "s", Seq.empty).isFailing)
  }

  test("sampleCutoffsByKey fits per-key cutoffs (CCNet per-language recipe)") {
    // two "languages" with disjoint score ranges: a global fit would put
    // every B document in 'tail'; per-key fits split each internally
    val df = ((0 until 300).map(i => ("a", i.toLong, i.toDouble)) ++
      (0 until 300).map(i => ("b", 1000L + i, 1000.0 + i))).toDF("lang", "id", "s")
    val cuts = LmScore.sampleCutoffsByKey(df, "s", Seq("lang"), nBuckets = 3).get
    val m = cuts.select("lang", "cutoffs").as[(String, Seq[Double])].collect().toMap
    assert(m.keySet == Set("a", "b"))
    assert(m("a").size == 2 && m("a") == m("a").sorted)
    assert(m("a").last < 300.0 && m("b").head > 1000.0, m)
    val labeled = LmScore.bucketsByKey(df, "s", cuts, Seq("lang")).get
      .groupBy("lang", "bucket").count()
      .as[(String, String, Long)].collect()
    // each language gets all three labels, ~evenly
    assert(labeled.length == 6)
    labeled.foreach { case (_, _, n) => assert(math.abs(n - 100L) <= 15L, labeled.toSeq) }
  }

  test("bucketsByKey: NULL score or missing key yields a NULL bucket") {
    val df = Seq(("a", 0L, Some(1.0)), ("a", 1L, None), ("zz", 2L, Some(1.0)))
      .toDF("lang", "id", "s")
    val cuts = Seq(("a", Seq(5.0))).toDF("lang", "cutoffs")
    val got = LmScore.bucketsByKey(df, "s", cuts, Seq("lang"),
      labels = Seq("lo", "hi")).get
      .select("id", "bucket").as[(Long, Option[String])].collect().toMap
    assert(got == Map(0L -> Some("lo"), 1L -> None, 2L -> None))
  }

  test("bucketsByKey: a cutoffs/labels arity mismatch yields NULL, never a silent merge") {
    val df = Seq(("a", 0L, 99.0)).toDF("lang", "id", "s")
    // 2 cutoffs but only 2 labels (needs 3): the key's rows go NULL
    val cuts = Seq(("a", Seq(5.0, 10.0))).toDF("lang", "cutoffs")
    val got = LmScore.bucketsByKey(df, "s", cuts, Seq("lang"),
      labels = Seq("lo", "hi")).get
      .select("bucket").as[Option[String]].head()
    assert(got.isEmpty, "score above a mismatched cutoff array must not silently take the last label")
  }

  test("sampleCutoffs feed buckets into roughly even tertiles") {
    val df = (0 until 900).map(i => (i.toLong, i.toDouble)).toDF("id", "s")
    val cuts = LmScore.sampleCutoffs(df, "s", nBuckets = 3).get
    assert(cuts.size == 2 && cuts == cuts.sorted)
    val counts = LmScore.buckets(df, "s", cuts).get
      .groupBy("bucket").count()
      .as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("head", "middle", "tail"))
    // GK sketch at 1% error on 900 uniform points: tertiles within ±5%
    counts.values.foreach(n => assert(math.abs(n - 300L) <= 45L, counts))
  }

  // in-memory interpolated-KN reference for a train corpus + scored doc
  private def knRef(train: Seq[String], doc: Seq[String], d: Double,
      floor: Double): Double = {
    val bgs = train.flatMap(t => {
      val w = t.split(" ").toSeq; w.zip(w.tail)
    })
    val c2 = bgs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val ctx = bgs.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val n1f = c2.keys.toSeq.groupBy(_._1).map { case (k, v) => k -> v.size }
    val n1b = c2.keys.toSeq.groupBy(_._2).map { case (k, v) => k -> v.size }
    val b = c2.size.toDouble
    val lps = doc.zip(doc.tail).map { case (w1, w2) =>
      val pcOpt = n1b.get(w2).map(_.toDouble / b)
      val p = ctx.get(w1) match {
        case None => pcOpt.getOrElse(floor)
        case Some(cx) =>
          (math.max(c2.getOrElse((w1, w2), 0L).toDouble - d, 0.0) +
            d * n1f(w1).toDouble * pcOpt.getOrElse(0.0)) / cx.toDouble
      }
      math.log(if (p > 0) p else floor)
    }
    lps.sum / lps.length
  }

  test("knBigramScores: hand-checked interpolated KN on a self-trained " +
      "corpus; per-context probabilities normalize to exactly 1") {
    val texts = Seq("a b a b c", "a b c a", "b c b a")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val got = LmScore.knBigramScores(df, "text", "id").get
      .orderBy("id").select("id", "n_bigrams", "avg_logprob")
      .as[(Long, Long, Double)].collect()
    texts.zipWithIndex.foreach { case (t, i) =>
      val want = knRef(texts, t.split(" ").toSeq, 0.75, 1e-10)
      assert(got(i)._2 == t.split(" ").length - 1)
      assert(math.abs(got(i)._3 - want) < eps, s"doc $i")
    }
    // normalization: for each seen context w1, sum P(w2|w1) over the
    // FULL train vocab must be exactly 1 (the KN telescoping identity)
    val vocab = texts.flatMap(_.split(" ")).distinct
    for (w1 <- vocab) {
      val probs = vocab.map { w2 =>
        math.exp(knRef(texts, Seq(w1, w2), 0.75, 1e-10))
      }
      assert(math.abs(probs.sum - 1.0) < 1e-9, s"context $w1: ${probs.sum}")
    }
  }

  test("knBigramScores train/score split: unseen context backs off to " +
      "continuation, zero-everywhere floors; guards") {
    val train = Seq("a b a b", "b c")
    val trainDf = train.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    // doc bigrams: (z,b) unseen ctx -> Pcont(b); (b,z) seen ctx, unseen
    // w2 -> 0 -> floor; (q,q) unseen both -> floor
    val score = Seq((10L, "z b z q q"))
    val got = LmScore.knBigramScores(score.toDF("id", "text"), "text",
        "id", train = Some(trainDf)).get
      .select("avg_logprob").as[Double].head()
    val want = knRef(train, Seq("z", "b", "z", "q", "q"), 0.75, 1e-10)
    assert(math.abs(got - want) < eps)
    assert(LmScore.knBigramScores(trainDf, "text", "id", discount = 0.0)
      .isFailing)
    assert(LmScore.knBigramScores(trainDf, "text", "id", discount = 1.0)
      .isFailing)
    assert(LmScore.knBigramScores(trainDf, "text", "id", floorProb = 0.0)
      .isFailing)
  }
}
