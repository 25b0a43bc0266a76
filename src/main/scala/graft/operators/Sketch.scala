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
}
