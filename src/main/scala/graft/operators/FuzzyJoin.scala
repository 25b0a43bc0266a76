package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functional.MayFail
import graft.functions.TextFunctions._

/** Fuzzy (approximate-key) join: match rows whose TEXT keys are
  * near-duplicates rather than equal — entity resolution across sources
  * ("Acme Corp." ⋈ "acme corp") at corpus scale.
  *
  * Same slim-LSH shape as the dedup operators: both sides band their
  * MinHash keys over shingle hashes, candidates join on (band, bucket)
  * with slim (key, band, bucket) rows, and only candidate pairs pay the
  * exact-Jaccard verification. Never an all-pairs comparison; one hash
  * shuffle per stage.
  */
object FuzzyJoin {

  /** Inner join of `left` and `right` where the Jaccard similarity of
    * the word shingles (or char n-grams when `charNGrams > 0`) of
    * `leftCol`/`rightCol` reaches `threshold`; appends `similarity`.
    *
    * `leftKey`/`rightKey` must each uniquely identify their rows — the
    * candidate pairs travel as keys only, and a synthetic id would not
    * be stable across the plan's branches. Non-key column-name clashes
    * are rejected up front.
    */
  def byText(
      left: DataFrame,
      right: DataFrame,
      leftCol: String,
      rightCol: String,
      leftKey: String,
      rightKey: String,
      threshold: Double = 0.7,
      shingleSize: Int = 2,
      charNGrams: Int = 0,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      maxBucket: Int = 1000
  ): MayFail[DataFrame] = MayFail {
    require(threshold > 0 && threshold <= 1, s"threshold in (0,1]: $threshold")
    val clash = left.columns.toSet intersect right.columns.toSet
    require(clash.isEmpty,
      s"left and right share column names $clash — rename one side")
    require(!left.columns.contains("similarity") && !right.columns.contains("similarity"),
      "an input column is named 'similarity' — it would collide with the output score")

    def shingles(c: String) =
      if (charNGrams > 0) charShingleHashes(col(c), charNGrams)
      else wordShingleHashes(col(c), shingleSize)

    // short/empty keys have empty shingle arrays → identical degenerate
    // band keys; exclude them (they cannot reach any Jaccard threshold)
    val lSh = left.select(col(leftKey), shingles(leftCol).as("__shL"))
      .filter(size(col("__shL")) > 0)
    val rSh = right.select(col(rightKey), shingles(rightCol).as("__shR"))
      .filter(size(col("__shR")) > 0)
    val lBands = lSh.select(col(leftKey),
      posexplode(minhashBandKeysFromHashes(col("__shL"), bands, rowsPerBand))
        .as(Seq("__band", "__bucket")))
    val rBands = rSh.select(col(rightKey),
      posexplode(minhashBandKeysFromHashes(col("__shR"), bands, rowsPerBand))
        .as(Seq("__band", "__bucket")))
    // cap pathological buckets on BOTH sides — a boilerplate bucket on
    // either side is enough for quadratic candidate blowup
    val wBucket = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__band"), col("__bucket"))
    def capped(df: DataFrame) = df
      .withColumn("__bs", count(lit(1)).over(wBucket))
      .filter(col("__bs") <= maxBucket)
      .drop("__bs")
    val pairs = capped(lBands).join(capped(rBands), Seq("__band", "__bucket"))
      .select(leftKey, rightKey).dropDuplicates(leftKey, rightKey)

    pairs
      .join(lSh, leftKey).join(rSh, rightKey)
      .withColumn("similarity", jaccardHashes(col("__shL"), col("__shR")))
      .filter(col("similarity") >= threshold)
      .select(col(leftKey), col(rightKey), round(col("similarity"), 6).as("similarity"))
      .join(left, leftKey)
      .join(right, rightKey)
  }
}
