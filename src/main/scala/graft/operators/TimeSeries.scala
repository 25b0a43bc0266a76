package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functional.MayFail

/** Regularize irregular event streams onto a fixed time grid — the
  * resample/gap-fill primitive behind rate monitoring, training-data
  * freshness dashboards, and any model feature that assumes one row per
  * (entity, interval).
  */
object TimeSeries {

  /** Aggregate events into fixed `bucketSec` buckets AND emit every
    * bucket of each key's [first, last] span — empty buckets
    * materialize with `n = 0` and a `fill`-policy value:
    *
    *  - `"zero"`  — value 0.0 (rates, counts)
    *  - `"null"`  — value NULL (gauges where absence ≠ zero)
    *  - `"ffill"` — last non-empty bucket's value carries forward
    *    (step-function state; the grid analog of [[AsOfJoin]] backward)
    *
    * `how` aggregates `valueCol` within a bucket: `sum`, `avg`, `min`,
    * `max`, or `count`.
    *
    * Plan: one partial-agg shuffle to (key, bucket) cells, one tiny
    * span aggregate per key, a grid `explode(sequence(first, last))`
    * over the spans, and a left join of cells onto the grid (AQE picks
    * broadcast when the cell side is small). The grid volume is
    * span/bucketSec rows PER KEY — bound it by choosing `bucketSec`
    * against the expected span (a year of 1-second buckets is 31M rows
    * per key: pick minutes, not seconds, for long spans). The ffill
    * window is one in-partition pass per key over grid rows.
    *
    * Returns `(keyCols…, bucket_ts: timestamp, n: long, value)` —
    * deterministic: every output cell is a pure function of the data.
    */
  def gapFill(
      df: DataFrame,
      tsCol: String,
      keyCols: Seq[String],
      bucketSec: Long,
      valueCol: String,
      how: String = "sum",
      fill: String = "zero"
  ): MayFail[DataFrame] = MayFail {
    require(bucketSec > 0, s"bucketSec must be positive: $bucketSec")
    require(keyCols.nonEmpty, "keyCols must name at least one key column")
    require(Seq("sum", "avg", "min", "max", "count").contains(how),
      s"how must be sum | avg | min | max | count: $how")
    require(Seq("zero", "null", "ffill").contains(fill),
      s"fill must be zero | null | ffill: $fill")
    val keys = keyCols.map(col)
    val bucket = (floor(col(tsCol).cast("long") / bucketSec) * bucketSec)
      .cast("long").as("__bucket")
    val aggVal = how match {
      case "sum"   => sum(col(valueCol).cast("double"))
      case "avg"   => avg(col(valueCol).cast("double"))
      case "min"   => min(col(valueCol).cast("double"))
      case "max"   => max(col(valueCol).cast("double"))
      case "count" => count(col(valueCol)).cast("double")
    }
    val cells = df.filter(col(tsCol).isNotNull)
      .select((keys :+ bucket :+ col(valueCol)): _*)
      .groupBy((keys :+ col("__bucket")): _*)
      .agg(count(lit(1)).as("n"), aggVal.as("__v"))
    val spans = cells.groupBy(keys: _*)
      .agg(min(col("__bucket")).as("__lo"), max(col("__bucket")).as("__hi"))
    val grid = spans.select((keys :+
      explode(sequence(col("__lo"), col("__hi"), lit(bucketSec)))
        .as("__bucket")): _*)
    val joined = grid.join(cells, keyCols :+ "__bucket", "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
    val valued = fill match {
      case "zero" => joined.withColumn("__v", coalesce(col("__v"), lit(0.0)))
      case "null" => joined
      case "ffill" =>
        val w = Window.partitionBy(keys: _*).orderBy(col("__bucket"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        joined.withColumn("__v", last(col("__v"), ignoreNulls = true).over(w))
    }
    valued.select((keys :+
      timestamp_seconds(col("__bucket")).as("bucket_ts") :+
      col("n") :+ col("__v").as("value")): _*)
  }
}
