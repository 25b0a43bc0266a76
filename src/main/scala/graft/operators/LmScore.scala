package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functional.MayFail
import graft.functions.TextFunctions.tokens

/** Corpus-trained n-gram language-model quality scores — the CCNet-style
  * "perplexity under a reference LM" signal, self-trained on the corpus
  * itself (no external model needed): documents whose token transitions
  * are unlike the corpus norm (gibberish, boilerplate soup, wrong
  * language) score low and can be filtered on a threshold.
  *
  * Both scorers use add-k (Laplace) smoothing:
  * `p(w) = (c(w)+k) / (N+kV)` and `p(w2|w1) = (c(w1 w2)+k) / (c(w1)+kV)`.
  *
  * Scale posture: the model *is* a count table — one `groupBy(token)`
  * aggregation (map-side combined, vocab-sized result, orders of
  * magnitude smaller than the corpus), joined back to the exploded token
  * stream on the token key. Spark broadcasts the count table when it fits
  * (vocab tables almost always do) and the scalar `(N, V)` frame is
  * explicitly broadcast, so scoring adds no corpus-sized shuffle beyond
  * the per-doc average.
  */
object LmScore {

  /** Per-document mean unigram log-probability and perplexity.
    * Returns `(idCol, n_tokens, avg_logprob, perplexity)`; documents with
    * zero tokens produce no row (they have no distribution to score).
    */
  def unigramScores(
      df: DataFrame,
      textCol: String,
      idCol: String,
      k: Double = 1.0
  ): MayFail[DataFrame] = MayFail {
    require(k > 0, s"smoothing k must be > 0 (got $k): unsmoothed LMs assign log(0) to unseen tokens")
    val toks = df.select(col(idCol), explode(tokens(col(textCol))).as("tok"))
    val counts = toks.groupBy(col("tok")).agg(count(lit(1)).as("c1"))
    val stats = counts.agg(sum(col("c1")).as("N"), count(lit(1)).as("V"))
    toks.join(counts, "tok")
      .crossJoin(broadcast(stats))
      .withColumn("__lp", log((col("c1") + lit(k)) / (col("N") + lit(k) * col("V"))))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), avg(col("__lp")).as("avg_logprob"))
      .withColumn("perplexity", exp(-col("avg_logprob")))
  }

  /** Per-document mean bigram log-probability (context counts are the
    * plain unigram counts — the standard approximation that ignores the
    * missing continuation of each document's final token).
    * Returns `(idCol, n_bigrams, avg_logprob)`; documents with fewer than
    * two tokens produce no row.
    */
  def bigramScores(
      df: DataFrame,
      textCol: String,
      idCol: String,
      k: Double = 1.0
  ): MayFail[DataFrame] = MayFail {
    require(k > 0, s"smoothing k must be > 0 (got $k)")
    val t = df.select(col(idCol), tokens(col(textCol)).as("__t"))
    val uniCounts = t.select(explode(col("__t")).as("w1"))
      .groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val vocab = uniCounts.agg(count(lit(1)).as("V"))
    val pairs = t.filter(size(col("__t")) >= 2)
      .select(col(idCol),
        explode(zip_with(
          slice(col("__t"), lit(1), size(col("__t")) - 1),
          slice(col("__t"), lit(2), size(col("__t")) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("__bg"))
      .select(col(idCol), col("__bg.w1").as("w1"), col("__bg.w2").as("w2"))
    val biCounts = pairs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    pairs.join(biCounts, Seq("w1", "w2"))
      .join(uniCounts, "w1")
      .crossJoin(broadcast(vocab))
      .withColumn("__lp", log((col("c2") + lit(k)) / (col("c1") + lit(k) * col("V"))))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), avg(col("__lp")).as("avg_logprob"))
  }

  /** Interpolated Kneser–Ney bigram log-probability per document —
    * the production upgrade of [[bigramScores]]'s add-k smoothing
    * (Kneser & Ney, ICASSP 1995; Chen & Goodman 1998 eq. 4.28): the
    * discounted ML estimate interpolates with the CONTINUATION
    * distribution (how many distinct contexts a word follows), which
    * is what CCNet-style quality filters actually rely on — rare
    * words in productive contexts stop being punished as if unseen.
    *
    * `P(w2|w1) = [max(c(w1,w2)−D, 0) + D·N1+(w1,•)·Pcont(w2)] / ctx(w1)`
    * with `ctx(w1) = Σ_w c(w1,w)`, `Pcont(w2) = N1+(•,w2) / B`,
    * `B` = distinct bigrams. This normalizes EXACTLY to 1 over the
    * train vocabulary (spec-asserted), unlike the plain-unigram
    * context approximation.
    *
    * `train` enables the production split: fit the grids on a
    * reference corpus, score any other (the q344/IVF train-apply
    * discipline). Score-side cases, in order: unseen context →
    * pure continuation `Pcont(w2)`; seen context, unseen bigram →
    * the interpolation term alone; anything that lands on zero
    * probability (unseen w2 everywhere) → `floorProb`. All grids are
    * vocabulary-/bigram-vocabulary-sized; scoring is three left
    * joins plus a 1-row broadcast — nothing corpus² anywhere.
    *
    * Returns `(idCol, n_bigrams, avg_logprob, perplexity)`;
    * documents with fewer than two tokens produce no row. */
  def knBigramScores(
      df: DataFrame,
      textCol: String,
      idCol: String,
      train: Option[DataFrame] = None,
      discount: Double = 0.75,
      floorProb: Double = 1e-10
  ): MayFail[DataFrame] = MayFail {
    require(discount > 0 && discount < 1,
      s"discount must be in (0, 1): $discount")
    require(floorProb > 0 && floorProb < 1,
      s"floorProb must be in (0, 1): $floorProb")
    def bigramsOf(d: DataFrame, cols: Seq[String]) = {
      val t = d.select(cols.map(col) :+ tokens(col(textCol)).as("__t"): _*)
      t.filter(size(col("__t")) >= 2)
        .select(cols.map(col) :+
          explode(zip_with(
            slice(col("__t"), lit(1), size(col("__t")) - 1),
            slice(col("__t"), lit(2), size(col("__t")) - 1),
            (a, b) => struct(a.as("w1"), b.as("w2")))).as("__bg"): _*)
        .select(cols.map(col) :+ col("__bg.w1").as("w1") :+
          col("__bg.w2").as("w2"): _*)
    }
    // bigram grid: consumed by ctx totals, both continuation grids,
    // the distinct-bigram scalar AND the score join — checkpoint once
    val c2 = bigramsOf(train.getOrElse(df), Seq.empty)
      .groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
      .localCheckpoint()
    val ctx = c2.groupBy("w1")
      .agg(sum("c2").as("ctx"), count(lit(1)).as("n1f"))
    val n1b = c2.groupBy("w2").agg(count(lit(1)).as("n1b"))
    val bTot = c2.agg(count(lit(1)).as("B"))
    val pc = col("n1b").cast("double") / col("B").cast("double")
    val interp = (greatest(
        coalesce(col("c2"), lit(0L)).cast("double") - lit(discount),
        lit(0.0)) +
      lit(discount) * col("n1f").cast("double") *
        coalesce(pc, lit(0.0))) / col("ctx").cast("double")
    val p = when(col("ctx").isNull, coalesce(pc, lit(floorProb)))
      .otherwise(interp)
    bigramsOf(df, Seq(idCol))
      .join(c2, Seq("w1", "w2"), "left")
      .join(ctx, Seq("w1"), "left")
      .join(n1b, Seq("w2"), "left")
      .crossJoin(broadcast(bTot))
      .withColumn("__p", when(p > 0, p).otherwise(lit(floorProb)))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"),
        avg(log(col("__p"))).as("avg_logprob"))
      .withColumn("perplexity", exp(-col("avg_logprob")))
  }

  /** CCNet-style bucket assignment (Wenzek et al. 2020, arXiv:1911.00359
    * §4.3): label each row by comparing `scoreCol` against the ascending
    * `cutoffs` — `labels(i)` when the score is ≤ `cutoffs(i)`, the last
    * label above them all. Adds a `bucket` column.
    *
    * Pure map-side comparison — this is the point: CCNet derives cutoffs
    * from a quantile sketch (per language), then assigns in one pass; the
    * assignment never sorts the corpus, which an exact per-document
    * ntile would (one window task per language at 100 TB). Get cutoffs
    * from [[sampleCutoffs]], or pin literals for reproducible pipelines.
    */
  def buckets(
      scores: DataFrame,
      scoreCol: String,
      cutoffs: Seq[Double],
      labels: Seq[String] = Seq("head", "middle", "tail")
  ): MayFail[DataFrame] = MayFail {
    require(cutoffs.nonEmpty, "buckets needs at least one cutoff")
    require(cutoffs == cutoffs.sorted, s"cutoffs must ascend: $cutoffs")
    require(labels.size == cutoffs.size + 1,
      s"need ${cutoffs.size + 1} labels for ${cutoffs.size} cutoffs, got ${labels.size}")
    val label = cutoffs.zip(labels).foldRight(lit(labels.last)) {
      case ((c, l), rest) => when(col(scoreCol) <= c, lit(l)).otherwise(rest)
    }
    // a NULL score surfaces as a NULL bucket — without the guard every
    // `score <= c` is NULL, the otherwise-chain falls through, and an
    // unscored document silently lands in the last (above-all) bucket
    scores.withColumn("bucket", when(col(scoreCol).isNotNull, label))
  }

  /** Approximate quantile cutoffs for [[buckets]]: `nBuckets − 1` interior
    * quantiles of `scoreCol` via Spark's Greenwald-Khanna sketch. The
    * driver receives a handful of doubles — a sketch, never data — which
    * is CCNet's own recipe (cutoffs fitted on a sample, applied to the
    * full corpus). */
  def sampleCutoffs(
      scores: DataFrame,
      scoreCol: String,
      nBuckets: Int = 3,
      relativeError: Double = 0.01
  ): MayFail[Seq[Double]] = MayFail {
    require(nBuckets >= 2, s"nBuckets must be >= 2: $nBuckets")
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets).toArray
    scores.stat.approxQuantile(scoreCol, probs, relativeError).toSeq
  }

  /** Per-key quantile cutoffs — CCNet fits its head/middle/tail cutoffs
    * PER LANGUAGE (Wenzek et al. §4.3), not globally: a global fit would
    * let an easy language's scores push every hard-language document
    * into "tail". One grouped `percentile_approx` aggregation; returns
    * `(keys…, cutoffs array<double>)` with `nBuckets − 1` ascending
    * cutoffs per key, ready for [[bucketsByKey]]. The result is
    * keys-cardinality-sized (languages, not documents) — broadcast
    * material. */
  def sampleCutoffsByKey(
      scores: DataFrame,
      scoreCol: String,
      keys: Seq[String],
      nBuckets: Int = 3,
      accuracy: Int = 10000
  ): MayFail[DataFrame] = MayFail {
    require(keys.nonEmpty,
      "sampleCutoffsByKey needs at least one key — use sampleCutoffs for a global fit")
    require(nBuckets >= 2, s"nBuckets must be >= 2: $nBuckets")
    require(accuracy >= 1, s"accuracy must be positive: $accuracy")
    val probs = array((1 until nBuckets).map(i => lit(i.toDouble / nBuckets)): _*)
    scores.groupBy(keys.map(col): _*)
      .agg(percentile_approx(col(scoreCol), probs, lit(accuracy)).as("cutoffs"))
  }

  /** [[buckets]] with per-key cutoffs: `cutoffs` is a
    * `(keys…, cutoffs array<double>)` frame ([[sampleCutoffsByKey]]'s
    * shape, or pinned literals for reproducible pipelines), broadcast
    * and joined on `keys`; each row is labeled against ITS key's
    * ascending cutoff array (`labels(i)` when score ≤ `cutoffs(i)`,
    * the last label above them all). A NULL score, a key with no
    * cutoffs row, or a cutoffs array whose length is not
    * `labels.size − 1` yields a NULL bucket — unscored is visible,
    * never silently "tail", and an arity mismatch never silently merges
    * the top buckets. Still map-side: the cutoffs frame is
    * key-cardinality-sized and explicitly broadcast. */
  def bucketsByKey(
      scores: DataFrame,
      scoreCol: String,
      cutoffs: DataFrame,
      keys: Seq[String],
      labels: Seq[String] = Seq("head", "middle", "tail")
  ): MayFail[DataFrame] = MayFail {
    require(keys.nonEmpty, "bucketsByKey needs at least one key column")
    require(labels.size >= 2, s"need at least 2 labels: $labels")
    require(cutoffs.columns.contains("cutoffs"),
      s"cutoffs frame must carry a 'cutoffs' array column, has: ${cutoffs.columns.mkString(", ")}")
    val labelArr = array(labels.map(lit): _*)
    // index = #cutoffs strictly below the score (ties take the lower
    // bucket, matching buckets' inclusive upper bounds). Arity is
    // enforced PER KEY: a cutoffs array that does not carry exactly
    // labels−1 entries yields NULL buckets for that key — the same
    // loud-NULL contract as a missing key, never a silent merge of the
    // top buckets (buckets() rejects the mismatch at call time; here the
    // arity is data, so the check must be per row)
    val idx = size(filter(col("__cuts"), c => col(scoreCol) > c))
    val label = when(col(scoreCol).isNotNull &&
        size(col("__cuts")) === labels.size - 1,
      element_at(labelArr, idx + 1))
    scores
      .join(broadcast(cutoffs.select(keys.map(col) :+ col("cutoffs").as("__cuts"): _*)),
        keys, "left")
      .withColumn("bucket", label)
      .drop("__cuts")
  }
}
