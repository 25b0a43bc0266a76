package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StringType}
import org.apache.spark.util.sketch.{BloomFilter, CountMinSketch}

import graft.functional.MayFail

/** Probabilistic-sketch operators for join pruning and heavy-hitter
  * queries over corpora too large (or too high-cardinality) for their
  * exact formulations.
  *
  * Scale posture: both sketches are built in ONE distributed pass with a
  * tree-reduce merge (`DataFrameStatFunctions`), yield a few-MB summary on
  * the driver, and are then BROADCAST so the expensive decision (prune a
  * row, nominate a candidate) happens map-side, before any shuffle. The
  * exact phases that follow only touch the rows/keys that survive the
  * sketch — at 100 TB the shuffle carries the selectivity-reduced stream,
  * never the full input.
  */
object Sketch {

  /** Bloom-pruned semi join: keep rows of `big` whose `bigKey` appears in
    * `small`'s `smallKey`, pruning with a broadcast Bloom filter BEFORE
    * the exact semi join that scrubs the false positives.
    *
    * This is the runtime-filter pattern (cf. Spark's own injected
    * `bloom_filter_agg`/`might_contain` row-level runtime filters, which
    * only fire inside one query plan): the filter removes
    * `(1 - selectivity - fpp)` of the big side map-side, so the semi-join
    * shuffle moves only the surviving sliver. Result is EXACT — false
    * positives are eliminated by the final `left_semi` join; false
    * negatives cannot occur by the Bloom contract.
    *
    * `expectedItems` sizes the filter (bits ≈ -n·ln(fpp)/ln²2): 1e6 keys
    * at 1% fpp ≈ 1.2 MB — cheap to broadcast even at 1000 executors.
    */
  def bloomSemiJoin(
      big: DataFrame,
      small: DataFrame,
      bigKey: String,
      smallKey: String,
      expectedItems: Long = 1000000L,
      fpp: Double = 0.01
  ): MayFail[DataFrame] = MayFail {
    // the sketch hashes integral keys as longs and strings as bytes —
    // mixing domains (long probe against string-built filter) would prune
    // EVERY row silently, so mismatched key types are a hard error. ONE
    // classification serves both the guard and the probe construction so
    // a future type addition cannot diverge between them.
    // (A Column-level expression would need the private
    // BloomFilterMightContain; a typed UDF keeps the check map-side and
    // off the codegen hot path only for this operator.)
    def domain(dt: org.apache.spark.sql.types.DataType): String = dt match {
      case LongType | IntegerType | ShortType | ByteType => "integral"
      case StringType => "string"
      case other => throw new IllegalArgumentException(
        s"bloomSemiJoin: unsupported key type $other (integral or string)")
    }
    val bigDomain = domain(big.schema(bigKey).dataType)
    require(bigDomain == domain(small.schema(smallKey).dataType),
      s"bloomSemiJoin: key hash domains differ — " +
        s"$bigKey is ${big.schema(bigKey).dataType}, " +
        s"$smallKey is ${small.schema(smallKey).dataType}")
    // Spark's stat.bloomFilter NPEs whenever ZERO non-null values reach
    // the aggregate (null buffer) — empty input OR all-null keys; either
    // way the exact semi join is empty. Deriving emptiness from that very
    // NPE (instead of a separate isEmpty pre-pass) means the small side's
    // plan executes twice per call (build + final semi join), not three
    // times — real savings when `small` is itself a derived pipeline.
    // The catch is narrowed to NPEs raised INSIDE the bloom machinery —
    // an unrelated NPE from the derived pipeline must propagate, not
    // silently become an empty join.
    def isBloomBuildNpe(e: NullPointerException): Boolean =
      e.getStackTrace.exists { f =>
        f.getClassName.contains("BloomFilter") ||
          f.getClassName.contains("stat.StatFunctions") ||
          f.getClassName.contains("DataFrameStatFunctions")
      }
    val built: Option[BloomFilter] =
      try Some(small.stat.bloomFilter(smallKey, expectedItems, fpp))
      catch { case e: NullPointerException if isBloomBuildNpe(e) => None }
    if (built.isEmpty) big.limit(0)
    else {
      val bf: BloomFilter = built.get
      val bc = big.sparkSession.sparkContext.broadcast(bf)
      val might: Column = bigDomain match {
        case "integral" =>
          udf((v: java.lang.Long) => v != null && bc.value.mightContainLong(v))
            .apply(col(bigKey).cast(LongType))
        case "string" =>
          udf((v: String) => v != null && bc.value.mightContainString(v))
            .apply(col(bigKey))
      }
      big.filter(might)
        .join(small.select(col(smallKey).as(bigKey)).distinct(), Seq(bigKey), "left_semi")
    }
  }

  /** Mergeable per-group distinct-count sketches (Datasketches HLL):
    * `(keys..., sketch)` rows whose sketches UNION losslessly — build
    * them once per partition/day/source, then answer "distinct X over
    * any key combination" by merging sketches instead of rescanning
    * 100 TB. `lgConfigK = 12` ≈ 1.6% relative error in ~2 KB. */
  def hllSketches(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      lgConfigK: Int = 12
  ): MayFail[DataFrame] = MayFail {
    require(keys.nonEmpty, "hllSketches needs at least one group key")
    df.groupBy(keys.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgConfigK)).as("sketch"))
  }

  /** Merge previously built sketches down to coarser keys and estimate:
    * `(mergeKeys..., n_distinct_approx)`. The union itself is lossless at
    * equal lgConfigK; the resulting ESTIMATE equals the direct one
    * exactly while sketches remain in sparse mode (small cardinalities —
    * locked by SketchSpec) and stays within the configured error bound in
    * dense mode (the union path uses the composite estimator where a
    * directly built sketch can use HIP). */
  def hllMergeEstimate(
      sketches: DataFrame,
      mergeKeys: Seq[String],
      sketchCol: String = "sketch"
  ): MayFail[DataFrame] = MayFail {
    val grouped =
      if (mergeKeys.isEmpty) sketches.groupBy()
      else sketches.groupBy(mergeKeys.map(col): _*)
    grouped
      .agg(hll_sketch_estimate(hll_union_agg(col(sketchCol)))
        .as("n_distinct_approx"))
  }

  /** Exact top-`k` keys by frequency, found WITHOUT a full-row group-by:
    * a Count-Min sketch (one distributed pass over the ROWS) bounds every
    * key's count from above, the DISTINCT keys (a slim shuffle — keys,
    * not rows) are scored against the broadcast sketch, and only the keys
    * that could possibly be top-k are exactly recounted.
    *
    * Returns `(keyCol, n)` ordered by `n` desc, key asc (deterministic).
    *
    * Completeness proof for the shortlist `{key : est(key) ≥ E_k − εN}`
    * (with `E_k` = k-th largest estimate, `N` = row count): among the k
    * keys whose estimates reach `E_k`, at least one — call it `u` — has
    * true count ≤ `t_k` (the true k-th count), so `E_k ≤ est(u) ≤
    * true(u) + εN ≤ t_k + εN` (the εN over-count bound holds with
    * probability ≥ `confidence`). Every true top-k key `t` then has
    * `est(t) ≥ true(t) ≥ t_k ≥ E_k − εN` — it is shortlisted. On skewed
    * data (the case heavy-hitters exist for) the shortlist is tiny; on
    * near-uniform data it honestly degenerates toward all keys, because
    * there a top-k is unanswerable without counting — the recount is
    * still a KEY-cardinality aggregation, never more.
    */
  def countMinTopK(
      df: DataFrame,
      keyCol: String,
      k: Int,
      eps: Double = 1e-4,
      confidence: Double = 0.99,
      seed: Int = 42
  ): MayFail[DataFrame] = MayFail {
    require(k > 0, s"k must be positive: $k")
    val spark = df.sparkSession
    import spark.implicits._

    // sketch and score in STRING space so CMS hashing, candidate keys and
    // the recount filter agree regardless of the key's native type; null
    // keys carry no frequency rank and are excluded up front (the sketch
    // build skips them anyway, and estimateCount(null) throws)
    val keyed = df.select(col(keyCol).cast(StringType).as(keyCol))
      .filter(col(keyCol).isNotNull)
    val cms: CountMinSketch = keyed.stat.countMinSketch(keyCol, eps, confidence, seed)
    val bc = spark.sparkContext.broadcast(cms)
    // N for the εN bound = items the sketch actually absorbed — free from
    // the sketch itself, no extra counting pass
    val n = cms.totalCount()

    val est = keyed.distinct().as[String]
      .map(key => (key, bc.value.estimateCount(key)))
      .toDF("__key", "__est")
      // the distinct+score subtree feeds BOTH the E_k probe and the
      // shortlist — persist it for the operator's lifetime (it is slim:
      // distinct keys only) and drop it before returning
      .persist()
    try {
      // k-th largest estimate (ties by key keep it deterministic)
      val eKRow = est.orderBy(col("__est").desc, col("__key")).limit(k)
        .agg(min(col("__est"))).head()
      val emptyResult = df.groupBy(col(keyCol)).agg(count(lit(1)).as("n")).limit(0)
      if (eKRow.isNullAt(0)) emptyResult
      else {
        val eK = eKRow.getLong(0)
        val margin = math.ceil(eps * n).toLong
        val shortlist = est.filter(col("__est") >= eK - margin).select("__key")
        // semi join in string space, recount + order in the key's NATIVE
        // type (string ordering would rank "10" before "9"). The result
        // is ≤ k rows by construction — materialize it eagerly so the
        // persisted est can be released before returning.
        val top = df
          .join(shortlist, col(keyCol).cast(StringType) === col("__key"), "left_semi")
          .groupBy(col(keyCol))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col(keyCol))
          .limit(k)
        val rows = top.collect().toSeq
        spark.createDataFrame(
          spark.sparkContext.parallelize(rows, 1), top.schema)
      }
    } finally est.unpersist()
  }

  // --- DDSketch mergeable quantiles -----------------------------------

  /** The DDSketch bucket mapping (Masson, Rim & Lee, VLDB 2019): a
    * value `v > 0` lands in bucket `⌈ln v / ln γ⌉` with
    * `γ = (1+α)/(1−α)`, so every bucket spans a `(γᵇ⁻¹, γᵇ]` interval
    * and the bucket MIDPOINT `2γᵇ/(γ+1)` is within relative error `α`
    * of every value in it. Negatives get a mirrored store, zeros their
    * own — the paper's three-store layout as plain columns
    * `(store ∈ {-1,0,1}, bucket)`, totally ordered by
    * `(store, store·bucket)`.
    *
    * `ln γ` is precomputed ONCE on the driver and baked in as a double
    * literal, so engines replaying the mapping only need their `ln(v)`
    * to agree (one shared literal fewer to drift). */
  private[graft] def ddStoreBucket(v: Column, lnGamma: Double): (Column, Column) = (
    when(v > 0, 1).when(v < 0, -1).otherwise(0),
    when(v > 0, ceil(log(v) / lit(lnGamma)).cast(LongType))
      .when(v < 0, ceil(log(-v) / lit(lnGamma)).cast(LongType))
      .otherwise(lit(0L)))

  /** MERGEABLE relative-error quantile histogram — the quantile member
    * of the sketch family (Bloom / HLL / Count-Min cover membership,
    * distinct counts and heavy hitters; profiles at 100 TB also need
    * percentiles without an exact sort). Returns
    * `(keys..., store, bucket, n)` DDSketch bucket counts; per-partition
    * partial counts merge by ADDITION, so partial aggregation IS the
    * sketch merge and the result is independent of partitioning, split,
    * and merge order — build histograms per day/source/shard, then
    * answer any quantile over any union by re-grouping with
    * [[ddQuantilesFromHistogram]] (its groupBy-sum is the lossless
    * merge). Exactly associative, no randomness — replayable by any
    * engine, unlike a sampling KLL.
    *
    * `maxBuckets > 0` bounds per-group memory the paper's way: the
    * LOWEST buckets collapse into the `maxBuckets`-th-from-top bucket,
    * preserving high-quantile accuracy (the α guarantee then holds for
    * quantiles above the collapsed mass — SketchSpec locks p99 across
    * a collapse). NaNs and nulls are dropped. */
  def ddHistogram(
      df: DataFrame,
      valueCol: String,
      alpha: Double = 0.01,
      keys: Seq[String] = Nil,
      maxBuckets: Int = 0
  ): MayFail[DataFrame] = MayFail {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1): $alpha")
    require(maxBuckets >= 0, s"maxBuckets must be >= 0: $maxBuckets")
    val gamma = (1 + alpha) / (1 - alpha)
    val lnG = math.log(gamma)
    val v = col(valueCol).cast("double")
    val (store, bucket) = ddStoreBucket(v, lnG)
    val base = df
      .filter(v.isNotNull && !isnan(v))
      .groupBy(keys.map(col) :+ store.as("store") :+ bucket.as("bucket"): _*)
      .agg(count(lit(1)).as("n"))
    if (maxBuckets == 0) base
    else {
      // collapse: rank buckets from the TOP of the order; everything
      // deeper than maxBuckets re-labels to the boundary bucket and the
      // counts re-aggregate — one window + one regroup
      val wKey = org.apache.spark.sql.expressions.Window
        .partitionBy(keys.map(col): _*)
      val wOrd = wKey.orderBy(col("store").desc,
        (col("store") * col("bucket")).desc)
      base
        .withColumn("__r", row_number().over(wOrd))
        .withColumn("__bs", max(when(col("__r") === maxBuckets,
          col("store"))).over(wKey))
        .withColumn("__bb", max(when(col("__r") === maxBuckets,
          col("bucket"))).over(wKey))
        .select(
          (keys.map(col) :+
            when(col("__r") <= maxBuckets || col("__bs").isNull,
              col("store")).otherwise(col("__bs")).as("store") :+
            when(col("__r") <= maxBuckets || col("__bs").isNull,
              col("bucket")).otherwise(col("__bb")).as("bucket") :+
            col("n")): _*)
        .groupBy(keys.map(col) :+ col("store") :+ col("bucket"): _*)
        .agg(sum("n").as("n"))
    }
  }

  /** Quantile estimates from [[ddHistogram]] rows — `(keys..., q,
    * estimate)`. Histogram rows from ANY number of separate builds merge
    * first via the groupBy-sum (bucket counts add losslessly), then one
    * per-key cumulative window walks the `(store, store·bucket)` order
    * and each quantile `q` picks the first bucket whose cumulative count
    * reaches rank `⌊q·(n−1)⌋ + 1`; the estimate is the bucket midpoint
    * `±2γᵇ/(γ+1)` (0 for the zero store) — within relative error `α` of
    * the exact q-quantile VALUE by the bucket-span argument. `alpha`
    * must be the histogram's. The rank arithmetic is plain double
    * `q·(n−1)` both here and in any replaying engine — IEEE-identical.
    *
    * Scale shape: the histogram is bucket-count-sized (≤ ~35k rows per
    * key at α = 0.01 over the full double range, usually hundreds), so
    * the window runs on frames MANY orders smaller than the data; the
    * only full-data pass is the histogram build itself. */
  def ddQuantilesFromHistogram(
      hist: DataFrame,
      qs: Seq[Double],
      alpha: Double = 0.01,
      keys: Seq[String] = Nil
  ): MayFail[DataFrame] = MayFail {
    require(qs.nonEmpty && qs.forall(q => q >= 0 && q <= 1),
      s"quantiles must be in [0,1]: $qs")
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1): $alpha")
    val gamma = (1 + alpha) / (1 - alpha)
    val spark = hist.sparkSession
    import spark.implicits._
    val merged = hist
      .groupBy(keys.map(col) :+ col("store") :+ col("bucket"): _*)
      .agg(sum("n").as("n"))
    val wKey = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
    val wOrd = wKey.orderBy(col("store"), col("store") * col("bucket"))
    val cum = merged
      .withColumn("__cum", sum("n").over(
        wOrd.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .withColumn("__tot", sum("n").over(wKey))
    val qdf = qs.toDF("q")
    val wPick = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col) :+ col("q"): _*)
      .orderBy(col("store"), col("store") * col("bucket"))
    cum.crossJoin(broadcast(qdf))
      .filter(col("__cum") >=
        floor(col("q") * (col("__tot") - 1).cast("double")).cast(LongType) + 1)
      .withColumn("__rn", row_number().over(wPick))
      .filter(col("__rn") === 1)
      .select(keys.map(col) :+ col("q") :+
        (when(col("store") === 1,
            lit(2.0) * pow(lit(gamma), col("bucket")) / lit(gamma + 1))
          .when(col("store") === -1,
            lit(-2.0) * pow(lit(gamma), col("bucket")) / lit(gamma + 1))
          .otherwise(lit(0.0))).as("estimate"): _*)
  }

  /** One-shot [[ddHistogram]] + [[ddQuantilesFromHistogram]]. */
  def ddQuantiles(
      df: DataFrame,
      valueCol: String,
      qs: Seq[Double],
      alpha: Double = 0.01,
      keys: Seq[String] = Nil,
      maxBuckets: Int = 0
  ): MayFail[DataFrame] =
    ddHistogram(df, valueCol, alpha, keys, maxBuckets)
      .flatMap(h => ddQuantilesFromHistogram(h, qs, alpha, keys))

  // --- KMV / bottom-k theta sketch -------------------------------------

  /** The KMV hash: the library's portable 60-bit md5 draw over
    * `salt § value` — deterministic, engine-replayable, and uniform on
    * `[0, 2⁶⁰)`, which is what the (k−1)/u₍k₎ estimator needs. */
  private def kmvHash(valueCol: String, salt: String): Column =
    graft.functions.TextFunctions.portableHash60(
      concat(lit(s"$salt§"), col(valueCol).cast(StringType)))

  /** Bottom-k re-truncation shared by build and merge: distinct hashes,
    * rank-limit to the k smallest per group (WindowGroupLimit caps the
    * shuffle map-side), collect into one ascending-sorted array ≤ k. */
  private def kmvTruncate(
      hashed: DataFrame, keys: Seq[String], k: Int): DataFrame = {
    val bottomK = graft.physical.Order.topKPerGroup(
      hashed.distinct(), keys, Seq(col("__h").asc), k).get
    bottomK.groupBy(keys.map(col): _*)
      .agg(sort_array(collect_list(col("__h"))).as("kmv"))
  }

  /** Mergeable per-group KMV (k-minimum-values, a.k.a. bottom-k theta)
    * distinct sketches: `(keys..., kmv)` where `kmv` is the ascending
    * array of the k SMALLEST distinct portable hashes of `valueCol` in
    * the group (all of them when fewer than k exist). Bauer et al.'s
    * estimator `(k−1)/u₍k₎` gives distinct counts with relative standard
    * error ≈ 1/√(k−2) (~6% at k = 256); unlike the HLL family the raw
    * hash sample also supports SET ALGEBRA — [[kmvOverlap]] estimates
    * pairwise intersection/Jaccard between groups, the one question a
    * union-only sketch cannot answer.
    *
    * Mergeability is EXACT, not approximate: the k smallest of a union
    * equals the k smallest over the per-part bottom-k's, so
    * [[kmvMergeEstimate]] on finer-keyed sketches returns bit-identical
    * arrays (and therefore estimates) to a direct coarse build —
    * SketchSpec locks this, and the q357 gate builds per (source, lang)
    * but is oracled per source.
    *
    * Scale shape: the heavy pass is a distinct over `(keys, hash)` whose
    * shuffle is capped map-side by WindowGroupLimit (each task forwards
    * at most k hashes per group it sees); everything after runs on
    * ≤ groups × k rows. Null values carry no distinct identity and drop.
    * The hash is the portable md5 kernel, so any engine can replay both
    * the sketch and the estimate term-for-term. */
  def kmvSketches(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      k: Int = 256,
      salt: String = ""
  ): MayFail[DataFrame] = MayFail {
    require(keys.nonEmpty, "kmvSketches needs at least one group key")
    require(k >= 2, s"k must be >= 2 for the (k-1)/u_k estimator: $k")
    val hashed = df.filter(col(valueCol).isNotNull)
      .select(keys.map(col) :+ kmvHash(valueCol, salt).as("__h"): _*)
    kmvTruncate(hashed, keys, k)
  }

  /** The KMV estimate from a bottom-k array: exact count when the sketch
    * holds fewer than k hashes (then it holds EVERY hash), else
    * `(k−1)·2⁶⁰ / (h₍k₎ + 1)` — the numerator is exact in double
    * (small-int × power of two) and the division is one IEEE op, so the
    * estimate replays bit-for-bit from the integer `h₍k₎`. */
  private def kmvEstimate(kmvCol: Column, k: Int): Column = {
    val n = size(kmvCol)
    val num = (k - 1).toDouble * math.pow(2, 60)
    when(n < k, n.cast("double"))
      .otherwise(lit(num) /
        (element_at(kmvCol, n).cast("double") + lit(1.0)))
  }

  /** Merge previously built KMV sketches down to coarser keys and
    * estimate: `(mergeKeys..., n_kmv, n_distinct_approx)`. The merge is
    * the lossless bottom-k of the exploded hash union (identical to a
    * direct build at the coarse keys); `n_kmv` is the surviving sketch
    * size (= exact distinct count whenever < k). `k` must be the build
    * k — a SMALLER k is also sound (bottom-k of bottom-k'), a larger one
    * silently under-merges, hence the require. Empty `mergeKeys` = one
    * global estimate. */
  def kmvMergeEstimate(
      sketches: DataFrame,
      mergeKeys: Seq[String],
      k: Int,
      sketchCol: String = "kmv"
  ): MayFail[DataFrame] = MayFail {
    require(k >= 2, s"k must be >= 2: $k")
    val all = lit("__all__")
    val keys = if (mergeKeys.nonEmpty) mergeKeys else Seq("__g")
    val exploded = sketches
      .select((if (mergeKeys.nonEmpty) mergeKeys.map(col)
               else Seq(all.as("__g"))) :+
        explode(col(sketchCol)).as("__h"): _*)
    val merged = kmvTruncate(exploded, keys, k)
      .select((keys.map(col) :+ size(col("kmv")).as("n_kmv") :+
        round(kmvEstimate(col("kmv"), k) + lit(1e-9), 6)
          .as("n_distinct_approx")): _*)
    if (mergeKeys.nonEmpty) merged else merged.drop("__g")
  }

  /** Pairwise set-overlap estimates between groups from their KMV
    * sketches — the theta-sketch intersection: for each group pair
    * (a < b by `keyCol`), re-truncate the union of the two bottom-k
    * arrays to k (the union sketch), count its members present in BOTH
    * sketches, and scale:
    *
    *   `jaccard_approx  = matches / |U|`
    *   `union_approx    = KMV estimate of U`
    *   `intersect_approx = jaccard_approx · union_approx`
    *
    * Returns `(key_a, key_b, n_union_kmv, matches, union_approx,
    * jaccard_approx, intersect_approx)`. All arithmetic is per-pair
    * array expressions over ≤ k-element arrays on a groups²-row frame —
    * the corpus itself is never rescanned, which is the point: pairwise
    * source overlap at 100 TB from a one-pass sketch build. The exact
    * counterpart (q110's distinct-shingle Jaccard report) stays the
    * small-scale truth; this is its sketch-budget path. */
  def kmvOverlap(
      sketches: DataFrame,
      keyCol: String,
      k: Int,
      sketchCol: String = "kmv"
  ): MayFail[DataFrame] = MayFail {
    require(k >= 2, s"k must be >= 2: $k")
    val a = sketches.select(col(keyCol).as("key_a"), col(sketchCol).as("__ka"))
    val b = sketches.select(col(keyCol).as("key_b"), col(sketchCol).as("__kb"))
    val u = slice(array_sort(array_union(col("__ka"), col("__kb"))), 1, k)
    val both = array_intersect(col("__ka"), col("__kb"))
    a.join(b, col("key_a") < col("key_b"))
      .withColumn("__u", u)
      .withColumn("__m", size(array_intersect(col("__u"), both)))
      .select(
        col("key_a"), col("key_b"),
        size(col("__u")).as("n_union_kmv"),
        col("__m").cast(LongType).as("matches"),
        round(kmvEstimate(col("__u"), k) + lit(1e-9), 6).as("union_approx"),
        round(when(size(col("__u")) > 0,
            col("__m").cast("double") / size(col("__u")).cast("double"))
          + lit(1e-9), 6).as("jaccard_approx"),
        round(when(size(col("__u")) > 0,
            col("__m").cast("double") / size(col("__u")).cast("double") *
              kmvEstimate(col("__u"), k))
          + lit(1e-9), 6).as("intersect_approx"))
  }
}
