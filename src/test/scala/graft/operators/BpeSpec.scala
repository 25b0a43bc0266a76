package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class BpeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // reference in-memory BPE (word-frequency formulation, greedy
  // left-to-right apply, (count desc, left, right) tie-break)
  private def refBpe(corpus: Seq[String], numMerges: Int,
      minPair: Long): (Seq[(Int, String, String, String, Long)],
      Map[String, (Long, Seq[String])]) = {
    var words: Map[String, (Long, Seq[String])] = corpus
      .flatMap(_.toLowerCase.trim.split("\\s+").filter(_.nonEmpty))
      .groupBy(identity)
      .map { case (w, o) => w -> (o.size.toLong, w.split("").toSeq) }
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, String, Long)]
    var step = 1
    var done = false
    while (step <= numMerges && !done) {
      val counts = scala.collection.mutable.Map
        .empty[(String, String), Long]
      for ((_, (f, syms)) <- words; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) =
          counts.getOrElse((syms(i), syms(i + 1)), 0L) + f
      if (counts.isEmpty) done = true
      else {
        val ((l, r), c) = counts.toSeq
          .sortBy { case ((a, b), n) => (-n, a, b) }.head
        if (c < minPair) done = true
        else {
          merges += ((step, l, r, l + r, c))
          words = words.map { case (w, (f, syms)) =>
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            syms.foreach { x =>
              if (out.nonEmpty && out.last == l && x == r) {
                out.remove(out.length - 1); out += (l + r)
              } else out += x
            }
            w -> (f, out.toSeq)
          }
          step += 1
        }
      }
    }
    (merges.toSeq, words)
  }

  test("learnMerges + segmentWords equal the in-memory reference on a " +
      "random corpus (greedy fold, tie-break, early stop)") {
    val rnd = new scala.util.Random(7L)
    val vocab = Seq("low", "lower", "lowest", "newer", "new", "wider",
      "abba", "bbb", "aaaa", "banana")
    val corpus = Seq.tabulate(120) { _ =>
      Seq.fill(1 + rnd.nextInt(6))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")
    }
    val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    for (n <- Seq(1, 5, 12)) {
      val (wantM, wantW) = refBpe(corpus, n, 2L)
      val gotM = Bpe.learnMerges(df, "text", n).get
        .as[(Int, String, String, String, Long)].collect().toSeq
        .sortBy(_._1)
      assert(gotM == wantM, s"merges at n=$n")
      val gotW = Bpe.segmentWords(df, "text", n).get
        .as[(String, Long, Int, String)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      val wantSeg = wantW.map { case (w, (f, s)) =>
        w -> ((f, s.length, s.mkString(" ")))
      }
      assert(gotW == wantSeg, s"segmentation at n=$n")
    }
  }

  test("doubled symbols merge left-to-right, never overlapping: " +
      "'bbb' under (b,b) segments as [bb, b]") {
    val df = Seq((1L, "bbb bbb bb")).toDF("id", "text")
    val m = Bpe.learnMerges(df, "text", numMerges = 1).get
      .as[(Int, String, String, String, Long)].head()
    assert(m == ((1, "b", "b", "bb", 5L))) // bbb: 2 pairs ×2 docs? no: 2+2+1
    val seg = Bpe.segmentWords(df, "text", 1).get
      .select("word", "segmentation").as[(String, String)]
      .collect().toMap
    assert(seg("bbb") == "bb b" && seg("bb") == "bb")
  }

  test("early stop below minPairCount; tokenCounts sums per-occurrence; " +
      "guards fail loudly") {
    // every adjacent pair unique → best count 1 < minPairCount=2 → no merges
    val df = Seq((1L, "abc xyz")).toDF("id", "text")
    assert(Bpe.learnMerges(df, "text", 10).get.count() == 0L)
    // "aa aa aa" learns (a,a)→aa; counts: doc1 = 3 words × 1 token
    val df2 = Seq((1L, "aa aa aa"), (2L, "aaa a"), (3L, "")).toDF("id", "text")
    val tc = Bpe.tokenCounts(df2, "text", "id", numMerges = 1).get
      .as[(Long, Long)].collect().toMap
    // aa→[aa](1), aaa→[aa,a](2), a→[a](1); doc3 has no words → absent
    assert(tc == Map(1L -> 3L, 2L -> 3L))
    assert(Bpe.learnMerges(df, "text", 0).isFailing)
    // r13: the cap sits at a full production vocabulary now — 5000 is
    // in contract (early-stops when pairs run out), 70000 is not
    assert(!Bpe.learnMerges(df, "text", 5000).isFailing)
    assert(Bpe.learnMerges(df, "text", 70000).isFailing)
    assert(Bpe.learnMerges(df, "text", 5, minPairCount = 0L).isFailing)
  }

  test("applyMerges under the frozen learned table reproduces " +
      "segmentWords on the training corpus; unseen words segment by " +
      "the fold alone") {
    val rnd = new scala.util.Random(11L)
    val vocab = Seq("low", "lower", "lowest", "banana", "band", "bbb")
    val corpus = Seq.tabulate(80) { _ =>
      Seq.fill(1 + rnd.nextInt(5))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")
    }
    val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val merges = Bpe.collectMerges(Bpe.learnMerges(df, "text", 10).get)
    val want = Bpe.segmentWords(df, "text", 10).get
      .select("word", "freq", "n_tokens", "segmentation")
      .as[(String, Long, Int, String)].collect().toSet
    val got = Bpe.applyMerges(df, "text", merges).get
      .as[(String, Long, Int, String)].collect().toSet
    assert(got == want)
    // unseen corpus: fold with the frozen merges, replayed in-memory
    val (refM, _) = refBpe(corpus, 10, 2L)
    assert(refM.map(m => (m._2, m._3)) == merges)
    val unseen = Seq((1L, "blower bandana lowly")).toDF("id", "text")
    def applyRef(w: String): Seq[String] =
      merges.foldLeft(w.split("").toSeq) { case (syms, (l, r)) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        syms.foreach { x =>
          if (out.nonEmpty && out.last == l && x == r) {
            out.remove(out.length - 1); out += (l + r)
          } else out += x
        }
        out.toSeq
      }
    val gotU = Bpe.applyMerges(unseen, "text", merges).get
      .select("word", "segmentation").as[(String, String)]
      .collect().toMap
    assert(gotU == Seq("blower", "bandana", "lowly")
      .map(w => w -> applyRef(w).mkString(" ")).toMap)
    // tokenCountsWith sums the frozen segmentation per occurrence
    val tc = Bpe.tokenCountsWith(unseen, "text", "id", merges).get
      .as[(Long, Long)].collect().toMap
    assert(tc == Map(1L ->
      Seq("blower", "bandana", "lowly").map(applyRef(_).size.toLong).sum))
    // a corrupt merge table (null component) Fails at construction —
    // MayFail semantics, not a mid-job executor throw (r13 review)
    assert(Bpe.applyMerges(df, "text", Seq(("a", null))).isFailing)
    assert(Bpe.tokenCountsDirect(df, "text", "id", Seq((null, "a")))
      .isFailing)
  }

  test("applyMerges plans as ONE codegen'd bpe_apply expression — no " +
      "fold chain, no chunk checkpoints") {
    val df = Seq((1L, "banana band")).toDF("id", "text")
    val merges = Seq.tabulate(64)(i => (s"x$i", s"y$i")) // depth probe
    val plan = Bpe.applyMerges(df, "text", merges).get
      .queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("bpe_apply"), "expression missing from plan")
    assert(!plan.contains("ExistingRDD"),
      "expression path must not materialize chunk checkpoints")
    assert(!plan.contains("aggregate(lambdafunction"),
      "the chained higher-order fold must be gone")
  }

  test("tokenCountsDirect equals the vocabulary-join path and composes " +
      "onto a streaming frame") {
    val rnd = new scala.util.Random(19L)
    val vocab = Seq("low", "lower", "lowest", "banana", "band", "bbb")
    val corpus = Seq.tabulate(60) { i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(5))(
        vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val df = corpus.toDF("id", "text")
    val merges = Bpe.collectMerges(Bpe.learnMerges(df, "text", 10).get)
    val joined = Bpe.tokenCountsWith(df, "text", "id", merges).get
      .as[(Long, Long)].collect().toMap
    val direct = Bpe.tokenCountsDirect(df, "text", "id", merges).get
      .as[(Long, Long)].collect().toMap
    assert(direct == joined, "join-free path diverged from the join path")
    // stateless ⇒ valid on an unbounded stream (complete-mode agg)
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = Bpe.tokenCountsDirect(input.toDF.toDF("id", "text"),
        "text", "id", merges).get
      .writeStream.outputMode("complete").format("memory")
      .queryName("bpe_direct_stream").start()
    input.addData(corpus.take(30))
    q.processAllAvailable()
    input.addData(corpus.drop(30))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("bpe_direct_stream")
      .as[(Long, Long)].collect().toMap
    assert(streamed == joined, "streamed counts diverged from batch")
  }

  test("fertilityReport: hand-computed compression ratios under a " +
      "frozen merge table") {
    val df = Seq((1L, "aa aa aa"), (2L, "ab")).toDF("id", "text")
    val merges = Bpe.collectMerges(Bpe.learnMerges(df, "text", 1).get)
    assert(merges == Seq(("a", "a"))) // (a,a) count 3 beats (a,b) count 1
    // words: aa ×3 → [aa] (1 tok), ab ×1 → [a, b] (2 toks)
    // n_words 4, n_chars 8, n_tokens 5
    val r = Bpe.fertilityReport(df, "text", merges).get
      .as[(Long, Long, Long, Double, Double)].head()
    def r6(v: Double) = math.rint((v + 1e-9) * 1e6) / 1e6
    assert(r == ((4L, 8L, 5L, r6(8.0 / 5.0), r6(5.0 / 4.0))))
  }

  test("merge learning is partitioning-invariant (repartition(7) yields " +
      "an identical merge table)") {
    val df = (1 to 60).map(i => (i.toLong, s"banana band ban b${i % 3}"))
      .toDF("id", "text")
    val a = Bpe.learnMerges(df, "text", 8).get
      .as[(Int, String, String, String, Long)].collect().toSeq.sortBy(_._1)
    val b = Bpe.learnMerges(df.repartition(7), "text", 8).get
      .as[(Int, String, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(a == b)
  }

  test("bounded-driver and distributed-incremental tiers learn the SAME " +
      "merge table and segmentation") {
    // a messy fixture: repeats, ties, multi-char merges, singletons —
    // the driver loop (default) and the distributed incremental loop
    // (maxDriverWords = 0 forces it) must agree row-for-row, including
    // the (cnt DESC, l, r) tie-breaks and pair counts
    val rnd = new scala.util.Random(61L)
    val voc = Seq("banana", "bandana", "band", "ban", "anna", "nab",
      "abba", "cabbage", "baggage", "zz")
    val df = Seq.tabulate(300)(i =>
      (i.toLong, Seq.fill(4)(voc(rnd.nextInt(voc.size))).mkString(" ")))
      .toDF("id", "text")
    val driver = Bpe.learnMerges(df, "text", 20, minPairCount = 2L).get
      .as[(Int, String, String, String, Long)].collect().toSeq.sortBy(_._1)
    val dist = Bpe.learnMerges(df, "text", 20, minPairCount = 2L,
        maxDriverWords = 0L).get
      .as[(Int, String, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(driver == dist,
      s"tier divergence:\n driver=$driver\n dist  =$dist")
    val segDriver = Bpe.segmentWords(df, "text", 20).get
      .as[(String, Long, Int, String)].collect().toSet
    val segDist = Bpe.segmentWords(df, "text", 20,
        maxDriverWords = 0L).get
      .as[(String, Long, Int, String)].collect().toSet
    assert(segDriver == segDist)
  }

  test("vocabSegmentWords: greedy longest-match under the corpus vocab — " +
      "hand cases, UNK on uncovered chars, counts match, and it " +
      "genuinely differs from BPE-order apply") {
    val df = Seq((1L, "banana ban bxn"), (2L, "ban banana")).toDF("id", "text")
    // hand vocabulary: 'x' is NOT covered, so "bxn" must whole-word-UNK
    val vocab = Seq("a", "b", "n", "ban", "banana", "na")
    val got = Bpe.vocabSegmentWords(df, "text", vocab).get
      .select("word", "freq", "n_pieces", "segmentation")
      .as[(String, Long, Int, String)].collect().toSet
    assert(got == Set(
      ("banana", 2L, 1, "banana"),   // longest match wins over ban+a+na
      ("ban", 2L, 1, "ban"),
      ("bxn", 1L, 1, "<unk>")))
    // per-doc piece counts sum word occurrences (doc 1: 1+1+1, doc 2: 1+1)
    val counts = Bpe.vocabTokenCounts(df, "text", "id", vocab).get
      .as[(Long, Long)].collect().toMap
    assert(counts == Map(1L -> 3L, 2L -> 2L))
    // greedy longest-match vs BPE merge-order apply: under merges
    // (a,n)->an, (b,an)->ban the BPE path segments "banana" as
    // [ban,an,a] (merge order never builds "banana"), while a vocab
    // holding the full word takes it in ONE piece — the two applies are
    // different algorithms, not two spellings of one
    val merges = Seq(("a", "n"), ("b", "an"))
    val viaBpe = Bpe.applyMerges(df, "text", merges).get
      .filter($"word" === "banana")
      .select("segmentation").as[String].head()
    assert(viaBpe == "ban an a")
    val viaVocab = Bpe.vocabSegmentWords(df, "text",
        Bpe.vocabFromCorpus(df, "text", merges) :+ "banana").get
      .filter($"word" === "banana")
      .select("segmentation").as[String].head()
    assert(viaVocab == "banana")
    // vocabFromCorpus = corpus alphabet + merged tokens, sorted
    assert(Bpe.vocabFromCorpus(df, "text", merges) ==
      Seq("a", "an", "b", "ban", "n", "x"))
    // guards
    assert(Bpe.vocabSegmentWords(df, "text", Seq.empty).isFailing)
    assert(Bpe.vocabSegmentWords(df, "text", vocab, unk = "").isFailing)
  }

  test("vocabSegmentWordsMarked: continuation marking, asymmetric " +
      "initial/continuation sets, and the detokenization round trip — " +
      "against an in-memory reference on random words") {
    // in-memory reference: greedy longest-match, position 0 over the
    // initial set, later positions over the continuation set
    def refMarked(word: String, initial: Set[String], cont: Set[String],
        marker: String, unk: String): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var p = 0
      var failed = word.isEmpty
      while (p < word.length && !failed) {
        val set = if (p == 0) initial else cont
        val hit = (math.min(word.length - p,
          if (set.isEmpty) 0 else set.map(_.length).max) to 1 by -1)
          .find(l => set.contains(word.substring(p, p + l)))
        hit match {
          case None => failed = true
          case Some(l) =>
            out += (if (p == 0) word.substring(p, p + l)
                    else marker + word.substring(p, p + l))
            p += l
        }
      }
      if (failed) Seq(unk) else out.toSeq
    }
    // hand case first: asymmetric vocab — "ana" exists ONLY as a
    // continuation, so "banana" segments but "ana" itself is UNK
    val hand = Seq((1L, "banana ana ban")).toDF("id", "text")
    val handGot = Bpe.vocabSegmentWordsMarked(hand, "text",
        Seq("ban", "##ana", "##n", "a")).get
      .select("word", "segmentation", "round_trip")
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), Option(r.get(2)).map(_ == true)))).toMap
    assert(handGot("banana") == (("ban ##ana", Some(true))))
    assert(handGot("ana") == (("<unk>", None)), "initial 'ana' unknown")
    assert(handGot("ban") == (("ban", Some(true))))
    // property law: random words under a random asymmetric vocabulary
    val rnd = new scala.util.Random(53L)
    val alphabet = "abc"
    def randTok(): String = Seq.fill(1 + rnd.nextInt(3))(
      alphabet(rnd.nextInt(alphabet.length))).mkString
    for (round <- 1 to 20) {
      val initial = (Set("a", "b", "c").filter(_ => rnd.nextBoolean()) ++
        Seq.fill(5)(randTok())).filter(_.nonEmpty) + randTok()
      val cont = (Set("a", "b", "c").filter(_ => rnd.nextBoolean()) ++
        Seq.fill(5)(randTok())).filter(_.nonEmpty)
      val vocab = (initial ++ cont.map("##" + _)).toSeq.sorted
      val wordsSeq = Seq.tabulate(30)(_ => Seq.fill(1 + rnd.nextInt(8))(
        alphabet(rnd.nextInt(alphabet.length))).mkString).distinct
      val df = Seq((1L, wordsSeq.mkString(" "))).toDF("id", "text")
      val got = Bpe.vocabSegmentWordsMarked(df, "text", vocab).get
        .select("word", "n_pieces", "segmentation", "round_trip")
        .collect().map(r => r.getString(0) ->
          ((r.getInt(1), r.getString(2), Option(r.get(3))))).toMap
      wordsSeq.foreach { w =>
        val want = refMarked(w, initial, cont, "##", "<unk>")
        val (np, seg, rt) = got(w)
        assert(seg == want.mkString(" ") && np == want.size,
          s"round $round word '$w': got '$seg', want " +
            s"'${want.mkString(" ")}' (initial=$initial cont=$cont)")
        // the q404 law: every non-UNK segmentation round-trips
        if (want != Seq("<unk>")) assert(rt == Some(true),
          s"round $round word '$w' must round-trip")
        else assert(rt.isEmpty, "UNK makes no round-trip claim")
      }
    }
  }

  test("markedVocabFromCorpus + symmetric vocab: marked segmentation is " +
      "the unmarked one with ## on non-initial pieces; detokenize " +
      "inverts it") {
    val df = Seq((1L, "banana ban bxn"), (2L, "ban banana")).toDF("id", "text")
    val merges = Seq(("a", "n"), ("b", "an"))
    val marked = Bpe.markedVocabFromCorpus(df, "text", merges)
    // both forms of every token, plain ∪ ##-prefixed
    val plain = Bpe.vocabFromCorpus(df, "text", merges)
    assert(marked == plain ++ plain.map("##" + _))
    val got = Bpe.vocabSegmentWordsMarked(df, "text", marked).get
      .select("word", "segmentation").as[(String, String)]
      .collect().toMap
    val unmarked = Bpe.vocabSegmentWords(df, "text", plain).get
      .select("word", "segmentation").as[(String, String)]
      .collect().toMap
    // symmetric vocab ⇒ same pieces, marker on non-initial ones (the
    // q404 oracle's marking-transform argument)
    unmarked.foreach { case (w, seg) =>
      val expect =
        if (seg == "<unk>") "<unk>"
        else seg.split(" ").zipWithIndex
          .map { case (p, i) => if (i == 0) p else "##" + p }.mkString(" ")
      assert(got(w) == expect, s"word $w")
    }
    // detokenize: dataframe form strips markers and concatenates
    val pieces = Seq((1L, Seq("ban", "##an", "##a")), (2L, Seq("<unk>")))
      .toDF("id", "pieces")
    val detok = Bpe.detokenize(pieces, "pieces").get
      .select("id", "word_detok").as[(Long, String)].collect().toMap
    assert(detok == Map(1L -> "banana", 2L -> "<unk>"))
    // guards: no initial entry / marker-only entry / empty marker Fail
    assert(Bpe.vocabSegmentWordsMarked(df, "text", Seq("##a")).isFailing)
    assert(Bpe.vocabSegmentWordsMarked(df, "text", Seq("a", "##")).isFailing)
    assert(Bpe.vocabSegmentWordsMarked(df, "text", Seq("a"),
      marker = "").isFailing)
    assert(Bpe.detokenize(pieces, "pieces", marker = "").isFailing)
  }

  test("applyCompareReport: hand-computed totals and agreement for the " +
      "two applies over one token inventory") {
    val df = Seq((1L, "banana ban bxn"), (2L, "ban banana")).toDF("id", "text")
    val merges = Seq(("a", "n"), ("b", "an"))
    val vocab = Bpe.vocabFromCorpus(df, "text", merges) :+ "banana"
    // BPE: banana→[ban,an,a](3), ban→[ban](1), bxn→[b,x,n](3) ⇒ 11
    // greedy: banana→[banana](1), ban→[ban](1), bxn→[b,x,n](3) ⇒ 7
    // agreement: ban (2 occ) + bxn (1 occ) = 3 of 5 occurrences
    val r = Bpe.applyCompareReport(df, "text", merges, vocab).get.head()
    assert(r.getAs[Long]("n_words") == 5L)
    assert(r.getAs[Long]("n_tokens_bpe") == 11L)
    assert(r.getAs[Long]("n_tokens_greedy") == 7L)
    assert(r.getAs[Double]("tokens_per_word_bpe") == 2.2)
    assert(r.getAs[Double]("tokens_per_word_greedy") == 1.4)
    assert(r.getAs[Double]("agreement_rate") == 0.6)
  }
}
