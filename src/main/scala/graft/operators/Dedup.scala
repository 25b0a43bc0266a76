package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functional.MayFail
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._

/** Deduplication operators for training-data pipelines.
  *
  * Design for 100 TB: every variant is a pure DataFrame plan — candidate
  * generation via hash/LSH bucketing (shuffle on the bucket key only, never
  * an all-pairs cross join), verification only within buckets, and a
  * bucket-size cap so a degenerate key (boilerplate documents) cannot
  * produce a quadratic bucket. No driver-side collection anywhere.
  */
object Dedup {

  /** Exact dedup: keep the lowest-`idCol` row per duplicate group, where
    * the group key is the 64-bit fingerprint of the listed columns.
    *
    * Hashing first means the shuffle key is 8 bytes instead of the full
    * document text — at 100 TB that is the difference between shuffling
    * ids+hashes and shuffling the corpus. (xxhash64 collisions at ~10^10
    * docs are ~1e-3 expected pairs — acceptable for corpus dedup; use
    * [[exactStrict]] when cryptographic certainty is required.)
    */
  def exact(df: DataFrame, cols: Seq[String], idCol: String): MayFail[DataFrame] =
    MayFail {
      val key = xxhash64(cols.map(col): _*)
      val w = Window.partitionBy(key).orderBy(col(idCol))
      df.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .drop("__rn")
    }

  /** Exact dedup grouping on the full column values (no hash collisions). */
  def exactStrict(df: DataFrame, cols: Seq[String], idCol: String): MayFail[DataFrame] =
    MayFail {
      val w = Window.partitionBy(cols.map(col): _*).orderBy(col(idCol))
      df.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .drop("__rn")
    }

  /** Normalized-text exact dedup (case/whitespace-insensitive). */
  def exactNormalized(df: DataFrame, textCol: String, idCol: String): MayFail[DataFrame] =
    MayFail {
      val w = Window.partitionBy(fingerprint(col(textCol))).orderBy(col(idCol))
      df.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .drop("__rn")
    }

  /** Candidate near-duplicate pairs via MinHash + LSH banding, verified
    * with exact n-gram Jaccard within buckets.
    *
    * Pipeline (all distributed, one shuffle per stage):
    *   shingle → minhash signature (k = bands·rowsPerBand affine perms over
    *   one base hash) → per-band bucket key → explode bands → self-join on
    *   (band, bucket) with `idA < idB` → distinct pairs → exact Jaccard on
    *   distinct shingle sets → filter ≥ threshold.
    *
    * `maxBucket` drops pathological buckets (boilerplate/empty docs) before
    * the pair join — the standard guard against quadratic blowup at scale.
    *
    * Returns `(idA, idB, jaccard)`.
    */
  def minhashPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleSize: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      threshold: Double = 0.7,
      maxBucket: Int = 1000
  ): MayFail[DataFrame] = MayFail {
    val k = bands * rowsPerBand
    val sh = df.select(
      col(idCol).as("id"),
      wordShingles(col(textCol), shingleSize).as("shingles"))
    val sig = sh.withColumn("sig", minhashSignature(col("shingles"), k))
    val banded = sig
      .select(col("id"), col("shingles"),
        posexplode(lshBands(col("sig"), bands, rowsPerBand)).as(Seq("band", "bucket")))
    // Cap bucket size pre-join: count per (band,bucket) with a window is a
    // second shuffle on the same key — Spark reuses the partitioning.
    val wBucket = Window.partitionBy(col("band"), col("bucket"))
    val capped = banded
      .withColumn("__bs", count(lit(1)).over(wBucket))
      .filter(col("__bs") <= maxBucket && col("__bs") > 1)
      .drop("__bs")
    val a = capped.select(col("band"), col("bucket"),
      col("id").as("idA"), col("shingles").as("shA"))
    val b = capped.select(col("band"), col("bucket"),
      col("id").as("idB"), col("shingles").as("shB"))
    val pairs = a.join(b, Seq("band", "bucket"))
      .filter(col("idA") < col("idB"))
      .select(col("idA"), col("idB"), col("shA"), col("shB"))
      .dropDuplicates("idA", "idB")
    pairs
      .withColumn("jaccard", jaccard(col("shA"), col("shB")))
      .filter(col("jaccard") >= threshold)
      .select(col("idA"), col("idB"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** MinHash-LSH dedup: drop every document that is a near-duplicate of a
    * lower-id document (greedy representative-by-min-id, the standard
    * corpus-dedup policy). */
  def minhashDedup(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleSize: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      threshold: Double = 0.7
  ): MayFail[DataFrame] =
    minhashPairs(df, textCol, idCol, shingleSize, bands, rowsPerBand, threshold)
      .map { pairs =>
        val toDrop = pairs.select(col("idB").as(idCol)).distinct()
        df.join(toDrop, Seq(idCol), "left_anti")
      }

  /** SimHash near-dup candidate pairs: 64-bit simhash, banded into
    * `64/bandBits` chunks (pigeonhole: hamming distance ≤ bands−1 implies
    * at least one identical band), verified by exact hamming distance.
    * Returns `(idA, idB, hamming)`.
    */
  def simhashPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      maxHamming: Int = 3,
      bandBits: Int = 16,
      maxBucket: Int = 1000
  ): MayFail[DataFrame] = MayFail {
    val nBands = 64 / bandBits
    val hashed = df.select(col(idCol).as("id"), simhash(col(textCol)).as("sh"))
    val banded = hashed.select(
      col("id"), col("sh"),
      posexplode(array((0 until nBands).map { b =>
        // band value = bits [b*bandBits, (b+1)*bandBits)
        shiftrightunsigned(col("sh"), b * bandBits)
          .bitwiseAND(lit((1L << bandBits) - 1))
      }: _*)).as(Seq("band", "bucket")))
    val wBucket = Window.partitionBy(col("band"), col("bucket"))
    val capped = banded
      .withColumn("__bs", count(lit(1)).over(wBucket))
      .filter(col("__bs") <= maxBucket && col("__bs") > 1)
      .drop("__bs")
    val a = capped.select(col("band"), col("bucket"), col("id").as("idA"), col("sh").as("shA"))
    val b = capped.select(col("band"), col("bucket"), col("id").as("idB"), col("sh").as("shB"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("idA") < col("idB"))
      .select(col("idA"), col("idB"),
        bit_count(col("shA").bitwiseXOR(col("shB"))).as("hamming"))
      .dropDuplicates("idA", "idB")
      .filter(col("hamming") <= maxHamming)
  }

  /** Character-n-gram Jaccard near-dup pairs (MinHash-LSH candidates,
    * exact char-shingle Jaccard verification). Catches small edits that
    * word shingles miss. Returns `(idA, idB, jaccard)`. */
  def ngramJaccardPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 5,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      threshold: Double = 0.8,
      maxBucket: Int = 1000
  ): MayFail[DataFrame] = MayFail {
    val k = bands * rowsPerBand
    val sh = df.select(col(idCol).as("id"), charShingles(col(textCol), n).as("shingles"))
    val sig = sh.withColumn("sig", minhashSignature(col("shingles"), k))
    val banded = sig.select(col("id"), col("shingles"),
      posexplode(lshBands(col("sig"), bands, rowsPerBand)).as(Seq("band", "bucket")))
    val wBucket = Window.partitionBy(col("band"), col("bucket"))
    val capped = banded
      .withColumn("__bs", count(lit(1)).over(wBucket))
      .filter(col("__bs") <= maxBucket && col("__bs") > 1)
      .drop("__bs")
    val a = capped.select(col("band"), col("bucket"), col("id").as("idA"), col("shingles").as("shA"))
    val b = capped.select(col("band"), col("bucket"), col("id").as("idB"), col("shingles").as("shB"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("idA") < col("idB"))
      .select(col("idA"), col("idB"), col("shA"), col("shB"))
      .dropDuplicates("idA", "idB")
      .withColumn("jaccard", jaccard(col("shA"), col("shB")))
      .filter(col("jaccard") >= threshold)
      .select(col("idA"), col("idB"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Embedding-cosine near-duplicate pairs: random-hyperplane LSH buckets
    * (multiple tables to boost recall), exact cosine verification inside
    * buckets. Returns `(idA, idB, cosine)`. */
  def embeddingNearDupPairs(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      threshold: Double = 0.95,
      nBits: Int = 16,
      tables: Int = 4,
      maxBucket: Int = 2000
  ): MayFail[DataFrame] = MayFail {
    val base = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    val banded = base.select(
      col("id"), col("v"),
      posexplode(array((0 until tables).map { t =>
        hyperplaneBits(col("v"), nBits, seed = 42L + 1000L * t)
      }: _*)).as(Seq("table", "bucket")))
    val wBucket = Window.partitionBy(col("table"), col("bucket"))
    val capped = banded
      .withColumn("__bs", count(lit(1)).over(wBucket))
      .filter(col("__bs") <= maxBucket && col("__bs") > 1)
      .drop("__bs")
    val a = capped.select(col("table"), col("bucket"), col("id").as("idA"), col("v").as("vA"))
    val b = capped.select(col("table"), col("bucket"), col("id").as("idB"), col("v").as("vB"))
    a.join(b, Seq("table", "bucket"))
      .filter(col("idA") < col("idB"))
      .select(col("idA"), col("idB"), col("vA"), col("vB"))
      .dropDuplicates("idA", "idB")
      .withColumn("cosine", vecCosine(col("vA"), col("vB")))
      .filter(col("cosine") >= threshold)
      .select(col("idA"), col("idB"), round(col("cosine"), 6).as("cosine"))
  }
}
