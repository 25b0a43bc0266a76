package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functional.MayFail

/** TF-IDF document vectors and sparse cosine similarity — the
  * content-level near-match tool between exact dedup (hash) and semantic
  * dedup (embeddings): shared *distinctive* vocabulary scores high, shared
  * stopwords score low, without any model.
  *
  * Scale posture: everything is SPARSE postings `(doc, term, weight)` —
  * no dense vectors, no cross join. The similarity join shuffles postings
  * on `term`, so its cost is Σ_t df(t)² — dominated by ubiquitous terms,
  * which carry near-zero IDF weight anyway. `maxDfFraction` prunes those
  * terms BEFORE the join (the standard all-pairs-similarity optimization:
  * at 100 TB the stopword postings would otherwise be a quadratic
  * hot-key blowup, i.e. the classic skew failure).
  */
object TfIdf {

  /** THE module's tokenization contract (replayed character-for-character
    * by the DuckDB oracles): lowercased whitespace split, empties
    * removed. Single definition so postings and BM25 cannot drift. */
  private def terms(c: org.apache.spark.sql.Column) =
    filter(split(lower(c), "[ \t\n\r\f]+"), t => t =!= "")

  /** Sparse TF-IDF postings `(idCol, term, w)`: terms are lowercased
    * whitespace tokens, `w = tf · (ln((N+1)/(df+1)) + 1)` (smoothed IDF —
    * never zero, so exact duplicates still match on every term). `N` is
    * the TOTAL document count of `df` (sklearn's n_samples convention).
    * The count executes `df`'s own plan once — cheap for a plain scan,
    * a real extra pass for a derived frame — but never re-runs the far
    * costlier tokenize+aggregate pipeline the way a distinct-id count
    * over the postings would. Pipelines that already know the document
    * count (a snapshot, a previous stage's aggregate) pass it via
    * `nDocs` and skip that action entirely. `maxDfFraction` drops terms
    * appearing in more than that fraction of documents. */
  def postings(
      df: DataFrame,
      textCol: String,
      idCol: String,
      maxDfFraction: Double = 1.0,
      nDocs: Option[Long] = None
  ): DataFrame =
    postingsWithN(df, textCol, idCol, maxDfFraction, nDocs.getOrElse(df.count()))

  private def postingsWithN(
      df: DataFrame,
      textCol: String,
      idCol: String,
      maxDfFraction: Double,
      nDocsL: Long
  ): DataFrame = {
    require(maxDfFraction > 0.0 && maxDfFraction <= 1.0,
      s"maxDfFraction must be in (0,1]: $maxDfFraction")
    val nDocs = nDocsL.toDouble
    val toks = df.select(
        col(idCol).as("id"),
        explode(terms(col(textCol))).as("term"))
    val tf = toks.groupBy("id", "term").agg(count(lit(1)).cast("double").as("tf"))
    val dfreq = tf.groupBy("term")
      .agg(count(lit(1)).cast("double").as("dfn"))
      .filter(col("dfn") <= nDocs * maxDfFraction)
    tf.join(dfreq, Seq("term"))
      .select(col("id"), col("term"),
        (col("tf") * (log((lit(nDocs) + 1) / (col("dfn") + 1)) + 1)).as("w"))
  }

  /** Document pairs with TF-IDF cosine ≥ `threshold`, via the sparse
    * postings self-join (equi-join on term + group-by pair — never a
    * cross join). Returns `(idA, idB, cosine)` with cosine rounded to 6
    * digits.
    *
    * `maxDfFraction < 1` removes ubiquitous terms from the similarity
    * space itself (dots AND norms) — an explicit stopword filter with
    * well-defined semantics, not a lossy approximation of the unpruned
    * measure. At `1.0` (default) the cosine is the exact full-vocabulary
    * one. */
  def similarPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      threshold: Double = 0.8,
      maxDfFraction: Double = 1.0,
      denseMaxVocab: Int = 2048,
      denseMaxBroadcastBytes: Long = 256L << 20,
      nDocs: Option[Long] = None
  ): MayFail[DataFrame] = MayFail {
    // deliberately NOT cached on the sparse path: a cache() here would
    // pin the postings in executor storage past this call with no owner
    // to unpersist them (a storage leak across a long session). The
    // stats+dots double-use recomputes the postings subtree, exactly
    // like the SQL formulation; callers running MANY similarity passes
    // should snapshot postings() once (Optimise.snapshot) and pay the
    // materialization knowingly. The nDocs param skips the count action
    // when the caller already has it — same contract as postings()/
    // bm25Search (same name, too).
    val nDocsL = nDocs.getOrElse(df.count())
    val w = postingsWithN(df, textCol, idCol, maxDfFraction, nDocsL)
    // Unit postings: every weight divided by its document norm ONCE, so
    // a pair's cosine is a plain dot product and NEITHER strategy needs
    // norm joins after its pair aggregation (the previous formulation
    // joined norms back onto the dot results twice).
    val norms = w.groupBy("id").agg(sqrt(sum(col("w") * col("w"))).as("__nm"))
    val un = w.join(norms, Seq("id"))
      .select(col("id"), col("term"), (col("w") / col("__nm")).as("u"))
    // Stats-based strategy choice (the same move Catalyst makes between
    // broadcast and shuffle joins). The sparse postings join's cost is
    // Σ_t df(t)² join rows through per-term shuffle keys — on a SMALL
    // vocabulary every term is a quadratic hot key and the shuffle is
    // irreducibly skewed (measured: a 31-term corpus sent 4.5×10⁸ rows
    // through 31 keys, 98 s at sf0.1). The dense alternative broadcasts
    // one vector per doc and scores candidate pairs with a native cosine
    // — no term shuffle, no skew, but up to n²·vocab arithmetic. One
    // ANALYZE-style pass over the postings yields both stats; dense is
    // chosen only when the broadcast fits, the vocabulary is small, the
    // arithmetic beats the sparse shuffle's measured per-row cost (~30×
    // a fused multiply-add), and threshold > 0 (at threshold ≤ 0 dense
    // would emit zero-cosine pairs sharing no terms, which the sparse
    // join cannot).
    // stats run on the RAW postings: the norms join is row-preserving,
    // so per-term counts are identical on `un`, and this keeps the
    // by-id norms shuffle out of the ANALYZE action (it executes lazily
    // only inside the chosen strategy's own job)
    val stats = w.groupBy("term").count()
      .agg(count(lit(1)).as("nt"),
        coalesce(sum(col("count") * col("count")), lit(0L)).as("sumdf2")).head()
    val nTerms = stats.getLong(0)
    val sumDf2 = stats.getLong(1)
    val denseBytes = nDocsL * nTerms * 8L
    val denseFlops = nDocsL.toDouble * nDocsL * nTerms / 2
    // NB the flops guard still assumes the WORST-case dense candidate
    // volume (n²/2, i.e. a corpus with zero spread along every
    // dimension); the band prune usually collapses that, so this is a
    // deliberately conservative routing — it can send a spread-out
    // small-vocab corpus to the sparse path, never the reverse
    val dense = threshold > 0 && nTerms > 0 && nTerms <= denseMaxVocab &&
      denseBytes <= denseMaxBroadcastBytes && denseFlops <= 32.0 * sumDf2
    if (dense)
      // the chooser's caps guarantee the unit postings are small here,
      // so a lineage cut is bounded by construction — without it the
      // tokenize+tf+norms subtree re-executes for the vocab collect and
      // BOTH sides of the pair join (the no-cache rule above is about
      // UNBOUNDED postings pinned past the call; localCheckpoint blocks
      // are freed with the RDD)
      densePairs(un.localCheckpoint(), nDocsL, threshold)
    else sparsePairs(un, threshold)
  }

  /** Sparse strategy: unit-postings self-join on term, one pair
    * aggregation emitting the cosine directly. */
  private def sparsePairs(un: DataFrame, threshold: Double): DataFrame =
    un.select(col("term"), col("id").as("idA"), col("u").as("ua"))
      .join(un.select(col("term"), col("id").as("idB"), col("u").as("ub")), Seq("term"))
      .filter(col("idA") < col("idB"))
      .groupBy("idA", "idB")
      .agg(sum(col("ua") * col("ub")).as("cosine"))
      .filter(col("cosine") >= threshold)
      .select(col("idA"), col("idB"), round(col("cosine"), 6).as("cosine"))

  /** Dense strategy over localCheckpoint'd unit postings (≤ denseMaxVocab
    * terms, broadcast-bounded — both guaranteed by the chooser). */
  private def densePairs(un: DataFrame, nDocs: Long, threshold: Double): DataFrame = {
    val spark = un.sparkSession
    import spark.implicits._
    // One bounded collect gives the vocab index AND the per-dimension
    // variance for the band prune below: var_d = Σu²/n − (Σu/n)², zeros
    // implied (docs without the term contribute nothing to either sum).
    // Empty-postings docs are absent from `un`, so they are counted as
    // zero vectors here — that skews only pruning power, never results.
    val termStats = un.groupBy("term")
      .agg(sum(col("u")).as("s1"), sum(col("u") * col("u")).as("s2"))
      .orderBy("term")
      .collect()
    require(termStats.nonEmpty, "densePairs on an empty vocabulary — chooser must prevent this")
    val nTerms = termStats.length
    val n = math.max(nDocs, 1L).toDouble
    val pruneDim = termStats.indices.maxBy { i =>
      val s1 = termStats(i).getDouble(1)
      val s2 = termStats(i).getDouble(2)
      s2 / n - (s1 / n) * (s1 / n)
    }
    val vocab = termStats.zipWithIndex
      .map { case (r, i) => (r.getString(0), i) }.toSeq.toDF("term", "__ti")
    val vecs = un.join(broadcast(vocab), Seq("term"))
      .groupBy("id")
      .agg(map_from_entries(collect_list(struct(col("__ti"), col("u")))).as("__m"))
      .select(col("id"),
        transform(sequence(lit(0), lit(nTerms - 1)),
          i => coalesce(try_element_at(col("__m"), i), lit(0.0))).as("__u"))
    // Exact 1-D band prune (the all-pairs "necessary condition" trick):
    // for UNIT vectors, cos(a,b) ≥ t ⟹ (a_d − b_d)² ≤ ‖a−b‖² = 2(1−cos)
    // ≤ 2(1−t) for EVERY dimension d. Bucket one dimension at width
    // δ = √(2(1−t)) and join adjacent buckets: every qualifying pair is
    // generated exactly once, through a broadcast HASH join instead of
    // an n²/2 loop join — candidate volume scales with how the corpus
    // spreads along the chosen dimension, not with n². The highest-
    // variance dimension maximizes pruning power (any choice is correct;
    // a constant dimension degrades to one bucket = the old n²/2).
    // Checkpointed because both join sides read it and it is broadcast-
    // bounded by the chooser's caps.
    val delta = math.max(math.sqrt(2.0 * (1.0 - threshold)), 1e-6)
    val keyed = vecs.withColumn("__bk",
      floor(element_at(col("__u"), pruneDim + 1) / delta).cast("long"))
      .localCheckpoint()
    val aSide = keyed.select(
      col("id").as("idA"), col("__u").as("__ua"), col("__bk").as("__bka"))
    // B probes its own bucket and both neighbours; the three keys are
    // distinct, so each qualifying (A,B) combination joins exactly once,
    // and idA < idB keeps one of the two role assignments
    val bSide = keyed.select(
      col("id").as("idB"), col("__u").as("__ub"),
      explode(array(col("__bk") - 1, col("__bk"), col("__bk") + 1)).as("__bkb"))
    bSide.join(broadcast(aSide),
        col("__bkb") === col("__bka") && col("idA") < col("idB"))
      // unit vectors: cosine IS the dot product — a third of the
      // arithmetic of the full cosine kernel on the n²-ish hot path
      .withColumn("cosine",
        graft.functions.VectorFunctions.vecDotDouble(col("__ua"), col("__ub")))
      .filter(col("cosine") >= threshold)
      .select(col("idA"), col("idB"), round(col("cosine"), 6).as("cosine"))
  }

  /** Okapi BM25 ranked retrieval (Robertson & Walker 1994): top-`k`
    * corpus documents per query, scored
    * `Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))` with the
    * non-negative idf `ln(1 + (N−df+0.5)/(df+0.5))` (Lucene's form) and
    * query terms as a distinct bag. Returns
    * `(queryId, docId, score, rank)`, rank ties broken by doc id.
    *
    * Scale: the query term list BROADCASTS (query sets are small), so the
    * corpus postings are matched map-side on term and only matching
    * (query, doc) partials shuffle into the per-pair sum — the corpus
    * never re-shuffles per query. Top-k per query is a rank-limited
    * window ([[graft.physical.Order.topKPerGroup]] — WindowGroupLimit
    * caps the shuffle). `corpus.count()` runs once for N, the same
    * convention (and caveat for derived frames) as [[postings]] — and
    * the same `nDocs` escape hatch skips it when the caller already
    * knows N. */
  def bm25Search(
      corpus: DataFrame,
      queries: DataFrame,
      textCol: String,
      idCol: String,
      queryTextCol: String,
      queryIdCol: String,
      k: Int = 10,
      k1: Double = 1.2,
      b: Double = 0.75,
      nDocs: Option[Long] = None
  ): MayFail[DataFrame] = MayFail {
    require(k > 0, s"k must be positive: $k")
    val scored = bm25Scored(corpus, queries, textCol, idCol,
      queryTextCol, queryIdCol, k1, b, nDocs)
    graft.physical.Order.topKPerGroup(scored, Seq("queryId"),
      Seq(col("score").desc, col("docId")), k, rankCol = "rank").get
  }

  /** The BM25 scoring core of [[bm25Search]] — every (queryId, docId)
    * pair sharing ≥ 1 term, unranked: `(queryId, docId, score)`. */
  private def bm25Scored(
      corpus: DataFrame,
      queries: DataFrame,
      textCol: String,
      idCol: String,
      queryTextCol: String,
      queryIdCol: String,
      k1: Double,
      b: Double,
      nDocs: Option[Long]
  ): DataFrame = {
    require(k1 >= 0 && b >= 0 && b <= 1, s"bad BM25 params: k1=$k1 b=$b")
    val toks = corpus.select(col(idCol).as("docId"),
      explode(terms(col(textCol))).as("term"))
    val tf = toks.groupBy("docId", "term")
      .agg(count(lit(1)).cast("double").as("tf"))
    val dl = toks.groupBy("docId").agg(count(lit(1)).cast("double").as("dl"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).cast("double").as("dfn"))
    val avgdl = dl.agg(avg(col("dl")).as("avgdl"))
    val nDocsD = nDocs.getOrElse(corpus.count()).toDouble
    val qterms = queries.select(col(queryIdCol).as("queryId"),
      explode(array_distinct(terms(col(queryTextCol)))).as("term"))
    tf
      .join(broadcast(qterms), Seq("term"))
      .join(dfreq, Seq("term"))
      .join(dl, Seq("docId"))
      .crossJoin(broadcast(avgdl))
      .withColumn("__s",
        log(lit(1.0) + (lit(nDocsD) - col("dfn") + 0.5) / (col("dfn") + 0.5)) *
          (col("tf") * (k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy("queryId", "docId")
      .agg(sum(col("__s")).as("score"))
  }

  /** BM25-RANKED LEAKAGE TRIAGE — the review queue for the
    * decontamination family: candidate (benchmark, train-doc) pairs come
    * from the exact distinct-n-gram hit join
    * ([[graft.operators.Dedup.contaminationScreen]]'s shape, kept
    * per-pair), and each benchmark item's candidates rank by the BM25
    * relevance of the training document to the benchmark text — so a
    * reviewer (or an automated drop rule) sees the most-likely-leaked
    * documents first instead of an unordered flag list. An n-gram hit
    * shares ≥ n terms with its query, so every candidate has a BM25
    * score (inner join loses nothing).
    *
    * Returns per benchmark item the top-`k` candidates:
    * `(queryId, docId, n_hit_grams: bigint, score: double, rank)` —
    * rank by (score DESC, docId), score rounded at 6 (the q118
    * convention).
    *
    * Scale: the gram join prunes candidates exactly like
    * contaminationScreen (distinct grams both sides — a 13-gram is
    * near-unique, so the join is hit-sized, not corpus-sized); the BM25
    * side is [[bm25Search]]'s proven exploded-token + broadcast-query
    * shape; candidates join scores on the (query, doc) equi-key. */
  def leakageTriage(
      train: DataFrame,
      bench: DataFrame,
      textCol: String,
      idCol: String,
      benchTextCol: String,
      benchIdCol: String,
      n: Int = 13,
      k: Int = 10,
      k1: Double = 1.2,
      b: Double = 0.75,
      lowercase: Boolean = true,
      nDocs: Option[Long] = None
  ): MayFail[DataFrame] = MayFail {
    require(n >= 1, s"n-gram order must be >= 1: $n")
    require(k > 0, s"k must be positive: $k")
    import graft.functions.TextFunctions.wordNgrams
    val tg = train.select(col(idCol).as("docId"),
        explode(wordNgrams(col(textCol), n, lowercase)).as("__g"))
      .distinct()
    val bg = bench.select(col(benchIdCol).as("queryId"),
        explode(wordNgrams(col(benchTextCol), n, lowercase)).as("__g"))
      .distinct()
    val cand = tg.join(bg, Seq("__g"))
      .groupBy("queryId", "docId")
      .agg(count(lit(1)).as("n_hit_grams"))
    val scored = bm25Scored(train, bench, textCol, idCol,
      benchTextCol, benchIdCol, k1, b, nDocs)
    val ranked = graft.physical.Order.topKPerGroup(
      cand.join(scored, Seq("queryId", "docId")),
      Seq("queryId"), Seq(col("score").desc, col("docId")), k,
      rankCol = "rank").get
    ranked.select(col("queryId"), col("docId"), col("n_hit_grams"),
      round(col("score"), 6).as("score"), col("rank"))
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009): combine any number of
    * rankings of the same document space — BM25, dense kNN, recency —
    * into one, scoring each (query, doc) by `Σ_r 1/(k + rank_r)`. The
    * standard hybrid-retrieval merge for data-curation search: rank
    * scales are incomparable across rankers, ranks are not.
    *
    * Each input needs `queryCols ++ (docCol, rankCol)` (rank 1-based).
    * One union + ONE shuffle on (query, doc) with map-side partial sum;
    * the per-query top-k is a rank-limit window (WindowGroupLimit caps
    * map partitions before the shuffle). Ties break on docCol for a
    * deterministic, engine-replayable order. */
  def rrfFuse(
      rankings: Seq[DataFrame],
      queryCols: Seq[String],
      docCol: String,
      rankCol: String = "rank",
      k: Int = 60,
      topK: Int = 10): MayFail[DataFrame] = MayFail {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(k >= 0, s"rrf k must be >= 0, got $k")
    val keyCols = queryCols :+ docCol
    val contrib = rankings
      .map(_.select(keyCols.map(col) :+
        (lit(1.0) / (lit(k) + col(rankCol).cast("double"))).as("__c"): _*))
      .reduce(_.unionByName(_))
    val scored = contrib.groupBy(keyCols.map(col): _*)
      .agg(round(sum(col("__c")), 6).as("rrf_score"))
    graft.physical.Order.topKPerGroup(scored, queryCols,
      Seq(col("rrf_score").desc, col(docCol)), topK, rankCol = "fused_rank").get
  }
}
