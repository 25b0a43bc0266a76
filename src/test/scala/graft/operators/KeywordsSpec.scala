package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class KeywordsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("rake: hand-computed deg/freq phrase scores and ranking") {
    val df = Seq((1L, "Red apple pie, and red wine!")).toDF("id", "text")
    val got = Keywords.rake(df, "id", "text", stopwords = Seq("and")).get
      .select("phrase", "score", "rank").as[(String, Double, Int)]
      .collect().sortBy(_._3)
    // words: red(freq 2, deg 3+2=5 -> 2.5), apple(3), pie(3), wine(2)
    assert(got.length == 2)
    assert(got(0) == (("red apple pie", 8.5, 1)))
    assert(got(1) == (("red wine", 4.5, 2)))
  }

  test("rake: maxPhraseLen drops run-ons, topK bounds, multi-doc isolation") {
    val df = Seq(
      (1L, "red apple pie and red wine"),
      (2L, "green tea and green tea and milk")).toDF("id", "text")
    // phrase cap 2: doc 1 keeps only "red wine" (the 3-run dropped) —
    // and word stats recompute over surviving phrases only
    val capped = Keywords.rake(df.filter($"id" === 1), "id", "text",
        Seq("and"), maxPhraseLen = 2).get
      .select("phrase").as[String].collect().toSeq
    assert(capped == Seq("red wine"))
    // doc 2: "green tea" appears twice (both occurrences kept),
    // "milk" once; green/tea score 2 each, milk 1
    val d2 = Keywords.rake(df, "id", "text", Seq("and"), topK = 2).get
      .filter($"id" === 2)
      .select("phrase", "score", "rank").as[(String, Double, Int)]
      .collect().sortBy(_._3)
    assert(d2.toSeq == Seq(("green tea", 4.0, 1), ("green tea", 4.0, 2)))
    // stopword-only text yields nothing
    val none = Keywords.rake(Seq((3L, "and and the")).toDF("id", "text"),
      "id", "text", Seq("and", "the")).get
    assert(none.count() == 0)
  }

  test("textrank: hub token ranks first; symmetric pair ties on rank") {
    // "b" co-occurs with a, c, d — the hub of the co-occurrence graph
    val docs = Seq((1L, "a b a b c"), (2L, "b a b d"))
      .toDF("doc_id", "text")
    val r = Keywords.textrank(docs, "doc_id", "text", topK = 10).get
      .as[(String, Long, Double)].collect()
    assert(r.map(_._1).toSet == Set("a", "b", "c", "d"))
    assert(r.head._1 == "b")
    // ranks non-increasing; scores normalize rank/(n*scale)
    assert(r.sliding(2).forall(p => p(0)._2 >= p(1)._2))
    r.foreach(x => assert(math.abs(x._3 - x._2.toDouble / (4 * 1e9)) < 1e-15))
    // a perfectly symmetric 2-token graph ties exactly; token breaks it
    val sym = Seq((1L, "x y"), (2L, "y x")).toDF("doc_id", "text")
    val rs = Keywords.textrank(sym, "doc_id", "text", topK = 10).get
      .as[(String, Long, Double)].collect()
    assert(rs.map(_._1).toSeq == Seq("x", "y"))
    assert(rs(0)._2 == rs(1)._2)
    // widening the window adds distance-2 edges: c and d join via a/b
    val w3 = Keywords.textrank(docs, "doc_id", "text", window = 3,
      topK = 10).get.as[(String, Long, Double)].collect()
    assert(w3.map(_._1).toSet == Set("a", "b", "c", "d"))
  }

  test("keyness: hand-computed 2x2 G² on a tiny corpus; zero counts " +
      "contribute the 0·ln0 limit; direction signs") {
    // focus: 3×"hot" + 1×"cold"; ref: 1×"hot" + 3×"cold"
    val df = Seq(
      ("A", "hot hot hot cold"),
      ("B", "hot cold cold cold")).toDF("src", "text")
    val got = Keywords.keyness(df, "text", "src", "A", minCount = 1L).get
      .as[(String, Long, Long, Double, Int)].collect()
      .map(r => r._1 -> r).toMap
    // c = d = 4; hot: a=3 b=1 e1=e2=2 → G² = 2(3 ln1.5 + 1 ln0.5)
    val hot = 2.0 * (3.0 * math.log(3.0 / 2.0) + 1.0 * math.log(1.0 / 2.0))
    assert(got("hot")._4 == math.rint((hot + 1e-9) * 1e4) / 1e4)
    assert(got("hot")._5 == 1 && got("cold")._5 == -1)
    assert(got("cold")._4 == got("hot")._4) // symmetric 2×2
    // a focus-only token: b = 0 term vanishes, G² = 2·a·ln((c+d)/c)
    val df2 = Seq(("A", "only only"), ("B", "other other")).toDF("s", "t")
    val g2 = Keywords.keyness(df2, "t", "s", "A", minCount = 1L).get
      .filter($"token" === "only").select("g2").as[Double].head()
    assert(g2 == math.rint((2.0 * 2.0 * math.log(2.0) + 1e-9) * 1e4) / 1e4)
  }

  test("collocations: hand-computed adjacent-bigram PMI; nothing crosses " +
      "documents; minCount floor; guards") {
    // doc1: a b a b, doc2: a b c → uni a:3 b:3 c:1 (N=7);
    // bigrams (a,b):3 (b,a):1 (b,c):1 (N=5); (b,?) never pairs with doc2's 'a'
    val df = Seq((1L, "a b a b"), (2L, "a b c")).toDF("id", "text")
    def pmi(nab: Long, na: Long, nb: Long): Double = {
      val v = math.log((nab.toDouble / 5.0) /
        ((na.toDouble / 7.0) * (nb.toDouble / 7.0)))
      math.rint((v + 1e-9) * 1e6) / 1e6
    }
    val got = Keywords.collocations(df, "text", minCount = 1L).get
      .as[(String, String, Long, Double)].collect().toSet
    assert(got == Set(
      ("a", "b", 3L, pmi(3, 3, 3)),
      ("b", "a", 1L, pmi(1, 3, 3)),
      ("b", "c", 1L, pmi(1, 3, 1))))
    val floored = Keywords.collocations(df, "text", minCount = 2L).get
      .select("w1", "w2").as[(String, String)].collect().toSeq
    assert(floored == Seq(("a", "b")))
    assert(Keywords.collocations(df, "text", minCount = 0L).isFailing)
  }

  test("keyness: minCount floor filters rare tokens; guards fail loudly") {
    val df = Seq(("A", "common common rare"), ("B", "common common"))
      .toDF("s", "t")
    val toks = Keywords.keyness(df, "t", "s", "A", minCount = 2L).get
      .select("token").as[String].collect().toSet
    assert(toks == Set("common"))
    assert(Keywords.keyness(df, "t", "s", "A", minCount = 0L).isFailing)
  }
}
