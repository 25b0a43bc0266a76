package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functional.MayFail

/** Keyword / keyphrase extraction — the metadata-enrichment verbs of a
  * training-data pipeline (topic routing, dedup keys, retrieval
  * filters) that need no model artifact.
  */
object Keywords {

  /** RAKE — Rapid Automatic Keyword Extraction (Rose, Engel, Cramer &
    * Cowley 2010): candidate phrases are maximal stopword-free token
    * runs; each word scores `deg/freq` (deg = Σ length of the phrases
    * it appears in, freq = its occurrence count — both per document);
    * a phrase scores the sum of its member word scores. Long, rare
    * co-occurring word runs win — the classic unsupervised keyphrase
    * baseline.
    *
    * Tokenization: non-alphanumeric → space, lowercase, whitespace
    * split — the library's portable token convention, so the oracle
    * replays it verbatim. Phrases longer than `maxPhraseLen` are
    * dropped (RAKE's own convention against run-on junk); duplicate
    * phrase TEXTS within a document keep their separate occurrences.
    *
    * Determinism: `deg/freq` is one IEEE division of exact integers;
    * the phrase sum is a float partial agg, so scores are ROUNDED
    * (house tie-shift, 6 digits) before ranking, ties break on phrase
    * text — the linkage-score device.
    *
    * Returns `(idCol, phrase, score, rank)`, `topK` rows per document.
    *
    * Plan: one posexplode of the token stream, per-document windows
    * (phrase segmentation is a running stopword count), two partial
    * aggs, one per-document rank. Nothing global; documents are the
    * parallelism.
    */
  def rake(
      df: DataFrame,
      idCol: String,
      textCol: String,
      stopwords: Seq[String],
      topK: Int = 5,
      maxPhraseLen: Int = 4
  ): MayFail[DataFrame] = MayFail {
    require(stopwords.nonEmpty, "rake needs a stopword list")
    require(topK >= 1, s"topK must be >= 1: $topK")
    require(maxPhraseLen >= 1, s"maxPhraseLen must be >= 1: $maxPhraseLen")
    val toks = filter(
      split(lower(regexp_replace(col(textCol), "[^a-zA-Z0-9]+", " ")), "\\s+"),
      t => t =!= "")
    val pos = df.select(col(idCol).as("__id"), posexplode(toks).as(Seq("pos", "w")))
    val isStop = col("w").isin(stopwords.map(x => x: Any): _*)
    val wSeg = Window.partitionBy("__id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pw = pos
      .withColumn("__pid", sum(isStop.cast("long")).over(wSeg))
      .filter(!isStop)
    val ph = pw.groupBy("__id", "__pid").agg(count(lit(1)).as("__plen"))
      .filter(col("__plen") <= maxPhraseLen)
    val wordScore = pw.join(ph, Seq("__id", "__pid"))
      .groupBy("__id", "w")
      .agg((sum(col("__plen")).cast("double") / count(lit(1))).as("__ws"))
    val phrases = pw.join(ph, Seq("__id", "__pid"))
      .join(wordScore, Seq("__id", "w"))
      .groupBy("__id", "__pid")
      .agg(
        concat_ws(" ", transform(array_sort(collect_list(
          struct(col("pos"), col("w")))), s => s.getField("w"))).as("phrase"),
        round(sum(col("__ws")) + lit(1e-9), 6).as("score"))
    val rankW = Window.partitionBy("__id")
      .orderBy(col("score").desc, col("phrase"))
    phrases.withColumn("rank", row_number().over(rankW))
      .filter(col("rank") <= topK)
      .select(col("__id").as(idCol), col("phrase"), col("score"), col("rank"))
  }

  /** TextRank keywords (Mihalcea & Tarau 2004) — corpus-level salient
    * terms as the stationary weights of a random walk over the word
    * co-occurrence graph: tokens are nodes, tokens within `window`
    * positions of each other share an (undirected, count-weighted)
    * edge, and [[Graph.pageRank]] ranks them. The graph-centrality
    * complement to [[rake]] (RAKE scores phrases per document;
    * TextRank scores vocabulary corpus-wide).
    *
    * Tokenization: lowercase + whitespace split (the q280 portable
    * convention). Self-loops (a token adjacent to itself) are
    * dropped; pairs are normalized (least, greatest) before counting
    * so direction never matters.
    *
    * Returns `topK` rows `(token, rank: bigint, score: double)` in
    * (rank DESC, token) order — `rank` is PageRank's exact-BIGINT
    * fixed-point mass (bit-deterministic; the whole ranking replays
    * in the oracle iteration-for-iteration), `score` the
    * rank/(n·scale) normalization.
    *
    * Plan: one posexplode, `window−1` equi-joins on (doc, position+k)
    * — never a per-document quadratic — one partial-agg shuffle to
    * the edge list (VOCABULARY², not corpus, sized), then the
    * [[Graph.pageRank]] iteration discipline (per-round
    * localCheckpoint, exact mass transfer). A 10¹⁰-token corpus pays
    * its vocabulary co-occurrence grid only.
    */
  def textrank(
      df: DataFrame,
      idCol: String,
      textCol: String,
      window: Int = 2,
      iterations: Int = 3,
      topK: Int = 20,
      scale: Long = 1000000000L
  ): MayFail[DataFrame] = MayFail {
    require(window >= 2, s"window must be >= 2: $window")
    require(topK >= 1, s"topK must be >= 1: $topK")
    val toks = filter(split(lower(col(textCol)), "[ \\t\\n\\r\\f]+"),
      t => length(t) > 0)
    val pos = df.filter(col(textCol).isNotNull)
      .select(col(idCol).as("__id"), toks.as("__t"))
      .select(col("__id"), posexplode(col("__t")).as(Seq("__i", "__w")))
    val left = pos.select(col("__id"), col("__i"), col("__w").as("__wa"))
    val pairs = (1 until window).map { k =>
      val right = pos.select(col("__id"), (col("__i") - k).as("__i"),
        col("__w").as("__wb"))
      left.join(right, Seq("__id", "__i"))
        .filter(col("__wa") =!= col("__wb"))
        .select(least(col("__wa"), col("__wb")).as("x"),
          greatest(col("__wa"), col("__wb")).as("y"))
    }.reduce(_ union _)
    val und = pairs.groupBy("x", "y").agg(count(lit(1)).as("w"))
    val sym = und.union(
      und.select(col("y").as("x"), col("x").as("y"), col("w")))
    val pr = Graph.pageRank(sym, "x", "y", iterations = iterations,
      scale = scale, weightCol = Some("w")).get
    pr.orderBy(col("rank").desc, col("node")).limit(topK)
      .select(col("node").as("token"), col("rank"), col("score"))
  }

  /** Dunning log-likelihood (G²) keyness (Dunning, CL 1993): which
    * tokens CHARACTERIZE a focus subcorpus against the rest — the
    * corpus-comparison verb behind source fingerprinting ("what does
    * crawl source X over-produce?"), register drift checks and
    * leakage triage. For each token with focus count `a`, reference
    * count `b` and subcorpus token totals `c`, `d`:
    * `G² = 2·(a·ln(a/e₁) + b·ln(b/e₂))`, `e₁ = c·(a+b)/(c+d)`,
    * `e₂ = d·(a+b)/(c+d)` (a zero count contributes 0 — the 0·ln 0
    * limit), with `direction` +1 when the focus over-represents the
    * token (a·d > b·c) and −1 otherwise. G² is χ²(1)-distributed
    * under independence, so the usual 3.84 / 6.63 cutoffs apply.
    *
    * Plan: one explode, one token-grid partial agg (VOCABULARY-, not
    * corpus-sized output), totals as a 1-row scalar agg crossJoined
    * back — no second corpus scan. Every product casts to double
    * BEFORE multiplying (corpus-scale `c·(a+b)` overflows BIGINT).
    * Tokenization: [[graft.functions.TextFunctions.tokens]], replayed
    * verbatim by the oracle. Returns `(token, n_focus, n_ref: bigint,
    * g2: double ROUNDED at 4, direction: int)`. */
  def keyness(
      df: DataFrame,
      textCol: String,
      classCol: String,
      focusValue: String,
      minCount: Long = 5L
  ): MayFail[DataFrame] = MayFail {
    require(minCount >= 1, s"minCount must be >= 1: $minCount")
    val toks = df
      .filter(col(textCol).isNotNull && col(classCol).isNotNull)
      .select(
        when(col(classCol) === focusValue, lit(1L)).otherwise(lit(0L))
          .as("__f"),
        explode(graft.functions.TextFunctions.tokens(col(textCol)))
          .as("token"))
    val counts = toks.groupBy("token")
      .agg(sum(col("__f")).as("n_focus"),
        sum(lit(1L) - col("__f")).as("n_ref"))
    val totals = counts
      .agg(sum(col("n_focus")).as("__c"), sum(col("n_ref")).as("__d"))
    val e1 = col("__c").cast("double") *
      (col("n_focus") + col("n_ref")).cast("double") /
      (col("__c") + col("__d")).cast("double")
    val e2 = col("__d").cast("double") *
      (col("n_focus") + col("n_ref")).cast("double") /
      (col("__c") + col("__d")).cast("double")
    val t1 = when(col("n_focus") === 0L, lit(0.0)).otherwise(
      col("n_focus").cast("double") * log(col("n_focus").cast("double") / e1))
    val t2 = when(col("n_ref") === 0L, lit(0.0)).otherwise(
      col("n_ref").cast("double") * log(col("n_ref").cast("double") / e2))
    counts
      .filter(col("n_focus") + col("n_ref") >= minCount)
      .crossJoin(broadcast(totals))
      .withColumn("g2", round(lit(2.0) * (t1 + t2) + lit(1e-9), 4))
      .withColumn("direction",
        when(col("n_focus").cast("double") * col("__d").cast("double") >
          col("n_ref").cast("double") * col("__c").cast("double"), lit(1))
          .otherwise(lit(-1)))
      .select("token", "n_focus", "n_ref", "g2", "direction")
  }

  /** Adjacent-bigram PMI collocations (Church & Hanks, CL 1990):
    * token pairs that co-occur as neighbors far more often than
    * their unigram frequencies predict — multi-word expressions
    * ("new york", "machine learning") for tokenizer seeding, phrase
    * vocabularies and stop-phrase lists.
    * `PMI = ln[ (n_ab/N_bi) / ((n_a/N_uni)·(n_b/N_uni)) ]` — that
    * exact division shape, every count cast to double FIRST, so the
    * oracle replays it IEEE-step-for-step. `minCount` floors the
    * bigram count (PMI is notoriously noisy on rare pairs).
    *
    * Plan: two corpus scans (unigram grid, bigram grid — both
    * vocabulary-sized after the partial agg), totals as 1-row scalar
    * aggs crossJoined back; no cache, no join against the corpus.
    * Bigrams are ADJACENT within a document ([[graft.functions
    * .TextFunctions.tokens]] order); nothing crosses documents.
    * Returns `(w1, w2, n_pair: bigint, pmi: double ROUNDED at 6)`. */
  def collocations(
      df: DataFrame,
      textCol: String,
      minCount: Long = 5L
  ): MayFail[DataFrame] = MayFail {
    require(minCount >= 1, s"minCount must be >= 1: $minCount")
    val base = df.filter(col(textCol).isNotNull)
    val toksOf = graft.functions.TextFunctions.tokens(col(textCol))
    val uni = base.select(explode(toksOf).as("w"))
    val uc = uni.groupBy("w").agg(count(lit(1)).as("c"))
    val nu = uni.agg(count(lit(1)).as("__nu"))
    val bg = base.select(toksOf.as("__t"))
      .filter(size(col("__t")) >= 2)
      .select(explode(transform(sequence(lit(1), size(col("__t")) - 1),
        i => struct(element_at(col("__t"), i).as("w1"),
          element_at(col("__t"), i + 1).as("w2")))).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    val nb = bg.agg(count(lit(1)).as("__nb"))
    bg.groupBy("w1", "w2").agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minCount)
      .join(uc.select(col("w").as("w1"), col("c").as("__ca")), Seq("w1"))
      .join(uc.select(col("w").as("w2"), col("c").as("__cb")), Seq("w2"))
      .crossJoin(broadcast(nu)).crossJoin(broadcast(nb))
      .withColumn("pmi", round(
        log((col("n_pair").cast("double") / col("__nb").cast("double")) /
          ((col("__ca").cast("double") / col("__nu").cast("double")) *
            (col("__cb").cast("double") / col("__nu").cast("double")))) +
          lit(1e-9), 6))
      .select("w1", "w2", "n_pair", "pmi")
  }
}
