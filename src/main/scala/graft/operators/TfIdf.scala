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

  /** Sparse TF-IDF postings `(idCol, term, w)`: terms are lowercased
    * whitespace tokens, `w = tf · (ln((N+1)/(df+1)) + 1)` (smoothed IDF —
    * never zero, so exact duplicates still match on every term). `N` is
    * the TOTAL document count of `df` (sklearn's n_samples convention).
    * The count executes `df`'s own plan once — cheap for a plain scan,
    * a real extra pass for a derived frame — but never re-runs the far
    * costlier tokenize+aggregate pipeline the way a distinct-id count
    * over the postings would. `maxDfFraction` drops terms appearing in
    * more than that fraction of documents. */
  def postings(
      df: DataFrame,
      textCol: String,
      idCol: String,
      maxDfFraction: Double = 1.0
  ): DataFrame =
    postingsWithN(df, textCol, idCol, maxDfFraction, df.count())

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
        explode(filter(split(lower(col(textCol)), "[ \t\n\r\f]+"), t => t =!= "")).as("term"))
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
      denseMaxBroadcastBytes: Long = 256L << 20
  ): MayFail[DataFrame] = MayFail {
    // deliberately NOT cached: a cache() here would pin the postings in
    // executor storage past this call with no owner to unpersist them
    // (a storage leak across a long session). The norms+dots double-use
    // recomputes the postings subtree, exactly like the SQL formulation;
    // callers running MANY similarity passes should snapshot postings()
    // once (Optimise.snapshot) and pay the materialization knowingly.
    val nDocs = df.count()
    val w = postingsWithN(df, textCol, idCol, maxDfFraction, nDocs)
    // Stats-based strategy choice (the same move Catalyst makes between
    // broadcast and shuffle joins). The sparse postings join's cost is
    // Σ_t df(t)² join rows through per-term shuffle keys — on a SMALL
    // vocabulary every term is a quadratic hot key and the shuffle is
    // irreducibly skewed (measured: a 31-term corpus sent 4.5×10⁸ rows
    // through 31 keys, 98 s at sf0.1). The dense alternative broadcasts
    // one vector per doc and scores n²/2 pairs with a native cosine — no
    // shuffle, no skew, but n²·vocab arithmetic. One ANALYZE-style pass
    // over the postings yields both stats; dense is chosen only when the
    // broadcast fits, the vocabulary is small, the arithmetic beats the
    // sparse shuffle's measured per-row cost (~30× a fused multiply-add),
    // and threshold > 0 (at threshold ≤ 0 dense would emit
    // zero-cosine pairs sharing no terms, which the sparse join cannot).
    val stats = w.groupBy("term").count()
      .agg(count(lit(1)).as("nt"),
        coalesce(sum(col("count") * col("count")), lit(0L)).as("sumdf2")).head()
    val nTerms = stats.getLong(0)
    val sumDf2 = stats.getLong(1)
    val denseBytes = nDocs * nTerms * 8L
    val denseFlops = nDocs.toDouble * nDocs * nTerms / 2
    val dense = threshold > 0 && nTerms > 0 && nTerms <= denseMaxVocab &&
      denseBytes <= denseMaxBroadcastBytes && denseFlops <= 32.0 * sumDf2
    if (dense)
      // the chooser's caps guarantee the postings are small here, so a
      // lineage cut is bounded by construction — without it the
      // tokenize+tf subtree re-executes for the vocab, the vectors, and
      // BOTH sides of the pair join (the no-cache rule above is about
      // UNBOUNDED postings pinned past the call; localCheckpoint blocks
      // are freed with the RDD)
      densePairs(w.localCheckpoint(), nTerms.toInt, threshold)
    else sparsePairs(w, threshold)
  }

  private def sparsePairs(w: DataFrame, threshold: Double): DataFrame = {
    val norms = w.groupBy("id").agg(sqrt(sum(col("w") * col("w"))).as("nm"))
    val dots = w.select(col("term"), col("id").as("idA"), col("w").as("wa"))
      .join(w.select(col("term"), col("id").as("idB"), col("w").as("wb")), Seq("term"))
      .filter(col("idA") < col("idB"))
      .groupBy("idA", "idB")
      .agg(sum(col("wa") * col("wb")).as("dot"))
    dots
      .join(norms.select(col("id").as("idA"), col("nm").as("na")), Seq("idA"))
      .join(norms.select(col("id").as("idB"), col("nm").as("nb")), Seq("idB"))
      .withColumn("cosine", col("dot") / (col("na") * col("nb")))
      .filter(col("cosine") >= threshold)
      .select(col("idA"), col("idB"), round(col("cosine"), 6).as("cosine"))
  }

  private def densePairs(w: DataFrame, nTerms: Int, threshold: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // vocab index: ≤ denseMaxVocab rows, so the single-partition window
    // and the broadcast are both trivially bounded (the literal partition
    // key only suppresses WindowExec's blanket no-partition warning)
    val vocab = w.select("term").distinct()
      .withColumn("__ti",
        row_number().over(Window.partitionBy(lit(0)).orderBy("term")).cast("int") - 1)
    val vecs = w.join(broadcast(vocab), Seq("term"))
      .groupBy("id")
      .agg(map_from_entries(collect_list(struct(col("__ti"), col("w")))).as("__m"))
      .select(col("id"),
        transform(sequence(lit(0), lit(nTerms - 1)),
          i => coalesce(try_element_at(col("__m"), i), lit(0.0))).as("__v"))
      // both pair-join sides read the (nDocs × vocab, broadcastable by
      // the chooser's byte cap) vector frame — build it once
      .localCheckpoint()
    val a = vecs.select(col("id").as("idA"), col("__v").as("__va"))
    val b = vecs.select(col("id").as("idB"), col("__v").as("__vb"))
    a.join(broadcast(b), col("idA") < col("idB"))
      .withColumn("cosine",
        graft.functions.VectorFunctions.vecCosineDouble(col("__va"), col("__vb")))
      .filter(col("cosine") >= threshold)
      .select(col("idA"), col("idB"), round(col("cosine"), 6).as("cosine"))
  }
}
