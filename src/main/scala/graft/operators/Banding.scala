package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared bucket-occupancy cap for banded LSH candidate generation
  * (minhash / simhash / sequence-fingerprint families).
  *
  * Formulation: per-key occupancy via `groupBy(keys).count()` (partial
  * aggregation — a degenerate hot bucket collapses to one row per map
  * task, so NO single task ever materialises a whole bucket), filtered to
  * the kept occupancy range, inner-joined back to the banded rows. This
  * replaces the earlier `count(1).over(Window.partitionBy(keys))`
  * formulation, whose sort-based window put an entire hot bucket
  * (all-black frames, all-silence audio, boilerplate text) into one
  * task. The join-back is AQE-eligible: when the kept-key side is small
  * it becomes a broadcast hash join and the cap costs no extra shuffle
  * of the banded rows at all.
  *
  * Tradeoff, measured at gate scale: the banded lineage is evaluated
  * twice (once under the partial agg, once on the probe side) because
  * the two exchanges do not canonicalise equal. Callers whose banding
  * kernel is expensive and rescanned many times should snapshot the slim
  * `(id, band, bucket)` frame first — the same guidance as
  * [[graft.operators.TfIdf]] postings.
  */
private[graft] object Banding {

  /** Keep banded rows whose (composite) bucket key holds between
    * `minOccupancy` and `maxBucket` rows. Self-join candidate generation
    * passes `minOccupancy = 2` (singleton buckets yield no pairs);
    * cross-corpus generation passes 1 (one batch row + one reference row
    * in the same bucket IS a candidate, so each side keeps singletons).
    */
  def capBuckets(
      banded: DataFrame,
      keys: Seq[String],
      maxBucket: Int,
      minOccupancy: Int): DataFrame = {
    val keyCols = keys.map(col)
    val kept = banded
      .groupBy(keyCols: _*)
      .agg(count(lit(1)).as("__bs"))
      .filter(col("__bs") <= maxBucket && col("__bs") >= minOccupancy)
      .select(keyCols: _*)
    banded.join(kept, keys)
  }
}
