package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functional.MayFail
import graft.functions.TextFunctions

/** DSIR-style data selection (Xie et al. 2023, arXiv:2302.03169): score
  * raw-corpus documents by how target-like their hashed n-gram profile
  * is — per-document log importance weight
  * `Σ_grams [log p_target(bucket) − log q_raw(bucket)]` — then select by
  * weight (deterministic top-k) or by Gumbel-perturbed weight (the
  * paper's importance RESAMPLING, seeded from the portable md5 hash so
  * even the sampled selection is engine-reproducible).
  *
  * Features are the paper's unigram+bigram bag, bucketed by
  * `portableHash60(gram) % nBuckets` — the md5 contract
  * ([[TextFunctions.portableHash60]]), so external SQL recomputes every
  * weight bit-for-bit. Probabilities are add-α smoothed over the DENSE
  * bucket space (absent buckets count 0), so no document can hit an
  * undefined log.
  *
  * Scale: each distribution is an `nBuckets`-row aggregate —
  * thousands of rows regardless of corpus size — broadcast to the
  * scorer; the raw corpus is scored map-side over its exploded grams
  * with ONE shuffle to re-aggregate per document. Nothing ever collects
  * to the driver.
  */
object Dsir {

  /** (id, bucket) — one row per unigram/bigram OCCURRENCE. */
  private def gramBuckets(df: DataFrame, textCol: String, idCol: String,
                          nBuckets: Int): DataFrame = {
    val grams = concat(
      TextFunctions.tokens(col(textCol)),
      TextFunctions.wordShingles(col(textCol), 2))
    df.select(col(idCol).as("id"), explode(grams).as("gram"))
      .select(col("id"),
        pmod(TextFunctions.portableHash60(col("gram")), lit(nBuckets.toLong))
          .as("bucket"))
  }

  /** Dense smoothed log-prob table `(bucket, <tag>)` for one corpus:
    * `ln((n_b + α) / (N + α·B))` over ALL `nBuckets` buckets. */
  private def logProbTable(buckets: DataFrame, nBuckets: Int, alpha: Double,
                           tag: String): DataFrame = {
    val counts = buckets.groupBy("bucket").agg(count(lit(1)).as("__cnt"))
    // one-row totals frame cross-joined in (stays a plan, no driver
    // action); derived straight from the occurrences so the analyzer
    // never sees a dense-table self-join
    val tot = buckets.agg(count(lit(1)).as("__tot"))
    buckets.sparkSession.range(nBuckets).toDF("bucket")
      .join(counts, Seq("bucket"), "left")
      .crossJoin(tot)
      .select(col("bucket"),
        log((coalesce(col("__cnt"), lit(0L)) + lit(alpha)) /
            (col("__tot") + lit(alpha) * nBuckets)).as(tag))
  }

  /** Per-document log importance weights of `raw` against `target`:
    * `(idCol, n_grams, log_weight)` — one row per raw document (gram-less
    * documents get weight 0). Positive = more target-like than the raw
    * average; feed to [[topK]] / [[resample]]. */
  def logWeights(
      raw: DataFrame,
      target: DataFrame,
      textCol: String,
      idCol: String,
      nBuckets: Int = 10000,
      alpha: Double = 0.5
  ): MayFail[DataFrame] = MayFail {
    require(nBuckets > 0, s"nBuckets must be positive: $nBuckets")
    require(alpha > 0, s"alpha must be positive (smoothing floor): $alpha")
    val rawB = gramBuckets(raw, textCol, idCol, nBuckets)
    val lp = logProbTable(gramBuckets(target, textCol, idCol, nBuckets),
      nBuckets, alpha, "logp")
    val lq = logProbTable(rawB, nBuckets, alpha, "logq")
    val scored = rawB
      .join(broadcast(lp), Seq("bucket"))
      .join(broadcast(lq), Seq("bucket"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_grams"),
        sum(col("logp") - col("logq")).as("log_weight"))
    raw.select(col(idCol).as("id"))
      .join(scored, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("log_weight"), lit(0.0)).as("log_weight"))
  }

  /** Deterministic selection: top `k` documents by `log_weight`
    * (id tiebreak) — the temperature→0 limit of [[resample]]. Plans as
    * TakeOrderedAndProject only while
    * `k ≤ spark.sql.execution.topKSortFallbackThreshold` (default 10k);
    * beyond that Spark falls back to a global sort, so for
    * million-document selections prefer a weight-threshold filter
    * (cutoff from [[LmScore.sampleCutoffs]]-style quantiles) and keep
    * rank-based top-k for the short lists it is meant for. */
  def topK(weights: DataFrame, idCol: String, k: Int): MayFail[DataFrame] =
    MayFail {
      require(k > 0, s"k must be positive: $k")
      weights.orderBy(col("log_weight").desc, col(idCol)).limit(k)
    }

  /** Threshold selection — the million-document path [[topK]]'s scaladoc
    * promises: a pure map-side `log_weight ≥ cutoff` filter, no sort, no
    * TakeOrderedAndProject fallback, pushed down to the scan when the
    * weights are materialized. Pin `cutoff` for reproducible pipelines,
    * or fit it with [[weightCutoff]]. */
  def selectByThreshold(weights: DataFrame, cutoff: Double): MayFail[DataFrame] =
    MayFail(weights.filter(col("log_weight") >= cutoff))

  /** Quantile-sketch cutoff for [[selectByThreshold]] keeping roughly
    * the top `fraction` of documents by weight — the driver receives ONE
    * double (a sketch, never data), the same CCNet-style recipe as
    * [[LmScore.sampleCutoffs]]. */
  def weightCutoff(
      weights: DataFrame,
      fraction: Double,
      relativeError: Double = 0.001): MayFail[Double] = MayFail {
    require(fraction > 0 && fraction < 1, s"fraction in (0,1): $fraction")
    weights.stat.approxQuantile("log_weight", Array(1.0 - fraction), relativeError).head
  }

  /** Gumbel-top-k importance resampling (the paper's estimator, made
    * deterministic): select `k` documents by
    * `log_weight / temperature + g(id)` where `g = −ln(−ln(u))` and
    * `u = ((portableHash60(id ∥ "§" ∥ salt) & (2^52−1)) + 0.5) / 2^52`
    * — a pure function of (id, salt), so the draw is reproducible across
    * engines and reruns, and a new `salt` is a fresh draw. (The 52-bit
    * mask keeps every numerator exactly representable as a double, so
    * `u` is strictly inside (0, 1) — an unmasked 60-bit hash near 2^60
    * rounds to u = 1.0 and `−ln(−ln(1))` is undefined.) Gumbel-top-k
    * over `logw/T + g` samples WITHOUT replacement ∝ softmax(logw/T).
    * Same top-k caveat as [[topK]]: rank-based selection is for short
    * lists. Returns the input schema unchanged. */
  def resample(weights: DataFrame, idCol: String, k: Int,
               temperature: Double = 1.0,
               salt: String = "0"): MayFail[DataFrame] = MayFail {
    require(k > 0, s"k must be positive: $k")
    require(temperature > 0, s"temperature must be positive: $temperature")
    val u = (TextFunctions.portableHash60(
      concat(col(idCol).cast("string"), lit("§" + salt)))
      .bitwiseAND(lit((1L << 52) - 1))
      .cast("double") + lit(0.5)) / lit(math.pow(2.0, 52))
    weights
      .withColumn("__gumbel",
        col("log_weight") / temperature + -log(-log(u)))
      .orderBy(col("__gumbel").desc, col(idCol))
      .limit(k)
      .drop("__gumbel")
  }
}
