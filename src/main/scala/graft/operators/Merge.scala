package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functional.MayFail

/** Merge/upsert operators — the incremental-maintenance verbs a corpus
  * pipeline needs between full rebuilds (apply a day's crawl to the
  * document store, keep attribute history for reproducibility).
  *
  * Scale posture: both operators are single-shuffle on the merge key.
  * `upsert` is a full outer join (broadcast when the delta is small —
  * the common case of a small update batch against a huge base);
  * `latestByKey` and `scd2` are one window each over the key partition.
  * Nothing collects to the driver.
  */
object Merge {

  /** SCD-1 upsert: rows of `updates` replace same-key rows of `base`,
    * unmatched update rows are inserted, everything else passes through.
    * Column sets must match; the result keeps `base`'s column order.
    *
    * `broadcastUpdates` marks the delta as broadcastable — with a small
    * update batch the merge then runs map-side with NO shuffle of the
    * base (the 100 TB-base × 1 GB-delta shape).
    */
  def upsert(
      base: DataFrame,
      updates: DataFrame,
      keys: Seq[String],
      broadcastUpdates: Boolean = false
  ): MayFail[DataFrame] = MayFail {
    require(keys.nonEmpty, "upsert needs at least one key column")
    val cols = base.columns.toSeq
    require(updates.columns.toSet == cols.toSet,
      s"upsert: column sets differ (base ${cols.mkString(",")} vs " +
        s"updates ${updates.columns.mkString(",")})")
    // presence marker instead of key-null checks, so null-valued keys
    // (matched null-safely below) still take the update side
    val u0 = updates.select(cols.map(col): _*).withColumn("__upd", lit(1))
    val u = if (broadcastUpdates) broadcast(u0) else u0
    val joined = base.as("b").join(u.as("u"),
      keys.map(k => col(s"b.$k") <=> col(s"u.$k")).reduce(_ && _), "full_outer")
    joined.select(cols.map { c =>
      when(col("__upd").isNotNull, col(s"u.$c")).otherwise(col(s"b.$c")).as(c)
    }: _*)
  }

  /** Keep each key's latest row by `orderCol` (CDC compaction / "current
    * snapshot" view). Ties break on the later row winning is undefined —
    * pass a total order (e.g. a change sequence number). */
  def latestByKey(
      df: DataFrame,
      keys: Seq[String],
      orderCol: String
  ): MayFail[DataFrame] = MayFail {
    require(keys.nonEmpty, "latestByKey needs at least one key column")
    val rn = s"__rn_${java.util.UUID.randomUUID.toString.take(8)}"
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol).desc)
    df.withColumn(rn, row_number().over(w)).filter(col(rn) === 1).drop(rn)
  }

  /** SCD-2 history: from a change log `(keys, attributes, tsCol)`, build
    * one row per version with `valid_from` = its change time and
    * `valid_to` = the next change's time (null while current). One
    * window over the key partition — no self-join. */
  def scd2(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String
  ): MayFail[DataFrame] = MayFail {
    require(keys.nonEmpty, "scd2 needs at least one key column")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(tsCol))
    df.withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
