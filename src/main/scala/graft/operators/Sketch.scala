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
    val bf: BloomFilter = small.stat.bloomFilter(smallKey, expectedItems, fpp)
    val bc = big.sparkSession.sparkContext.broadcast(bf)
    val dt = big.schema(bigKey).dataType
    // sketch.BloomFilter hashes integral types via putLong and strings via
    // putBinary — mirror that dispatch (a Column-level expression would
    // need the private BloomFilterMightContain; a typed UDF keeps the
    // check map-side and off the codegen hot path only for this operator)
    val might: Column = dt match {
      case LongType | IntegerType | ShortType | ByteType =>
        udf((v: java.lang.Long) => v != null && bc.value.mightContainLong(v))
          .apply(col(bigKey).cast(LongType))
      case StringType =>
        udf((v: String) => v != null && bc.value.mightContainString(v))
          .apply(col(bigKey))
      case other =>
        throw new IllegalArgumentException(
          s"bloomSemiJoin: unsupported key type $other (integral or string)")
    }
    big.filter(might)
      .join(small.select(col(smallKey).as(bigKey)).distinct(), Seq(bigKey), "left_semi")
  }

  /** Exact top-`k` keys by frequency, found WITHOUT a full-cardinality
    * group-by: a Count-Min sketch (one distributed pass) plus per-partition
    * local top-`candidatesPerPartition` nominations bound the candidate
    * set, and only those candidates are exactly recounted.
    *
    * Returns `(keyCol, n)` ordered by `n` desc, key asc (deterministic).
    *
    * Guarantees: CMS never under-counts, so a key whose CMS estimate falls
    * below the k-th candidate's EXACT count can never belong to the true
    * top-k; the candidate margin (`candidatesPerPartition` per partition)
    * covers skewed layouts where a heavy key concentrates in few
    * partitions. At 100 TB the only shuffle is the recount of
    * `≤ partitions × candidatesPerPartition` surviving keys — the
    * billion-key group-by the naive formulation would shuffle never runs.
    */
  def countMinTopK(
      df: DataFrame,
      keyCol: String,
      k: Int,
      eps: Double = 1e-4,
      confidence: Double = 0.99,
      candidatesPerPartition: Int = 100,
      seed: Int = 42
  ): MayFail[DataFrame] = MayFail {
    require(k > 0, s"k must be positive: $k")
    val spark = df.sparkSession
    import spark.implicits._

    // sketch and nominate in STRING space so CMS hashing, candidate keys
    // and the recount filter all agree regardless of the key's type
    val keyed = df.select(col(keyCol).cast(StringType).as(keyCol))
    val cms: CountMinSketch = keyed.stat.countMinSketch(keyCol, eps, confidence, seed)

    // local exact counts → per-partition top-M nominations (no shuffle;
    // output is ≤ numPartitions × M slim keys)
    val keyStr = keyed.as[String]
    val candidates = keyStr.mapPartitions { it =>
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { v => if (v != null) counts(v) = counts.getOrElse(v, 0L) + 1L }
      counts.toSeq.sortBy { case (key, n) => (-n, key) }
        .take(candidatesPerPartition).iterator.map(_._1)
    }.distinct().collect()

    // CMS estimates rank the candidates; keep a 3k margin before the
    // exact recount so estimate noise (ε·N over-count) cannot evict a
    // true top-k member
    val shortlist = candidates
      .map(key => key -> cms.estimateCount(key))
      .sortBy { case (key, est) => (-est, key) }
      .take(math.max(3 * k, k + 8))
      .map(_._1)

    val exact = df
      .filter(col(keyCol).cast(StringType).isInCollection(shortlist))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(keyCol))
      .limit(k)
    exact
  }
}
