package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functional.MayFail

/** Range (interval) join — Spark plans a point-in-interval theta join as
  * a BroadcastNestedLoopJoin (O(|L|·|R|) comparisons) or, worse, a
  * cartesian product when neither side broadcasts. This operator
  * re-expresses it as a bucketed equi-join: intervals replicate to the
  * fixed-width bins they overlap, points map to their single bin, the
  * join runs on the bin key, and the exact predicate filters afterwards.
  *
  * Cost: |R| × (avg interval width / binSize + 1) replicated rows and ONE
  * hash shuffle — linear, where the nested-loop is quadratic. Pick
  * `binSize` near the typical interval width: too small replicates
  * intervals; too large packs unrelated rows into a bin.
  */
object RangeJoin {

  /** Inner join of `left` rows whose `pointCol` falls in `right`'s
    * `[startCol, endCol)` interval, optionally also matching `by` keys. */
  def pointInInterval(
      left: DataFrame,
      right: DataFrame,
      pointCol: String,
      startCol: String,
      endCol: String,
      binSize: Double,
      by: Seq[String] = Nil
  ): MayFail[DataFrame] = MayFail {
    require(binSize > 0, s"binSize must be positive: $binSize")
    val lBinned = left.withColumn("__bin",
      floor(col(pointCol).cast("double") / binSize).cast("long"))
    val rBinned = right.withColumn("__bin",
      explode(sequence(
        floor(col(startCol).cast("double") / binSize).cast("long"),
        floor(col(endCol).cast("double") / binSize).cast("long"))))
    lBinned.join(rBinned, by :+ "__bin")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__bin")
  }

  /** Interval-overlap join: pairs where `[lStart, lEnd)` and
    * `[rStart, rEnd)` intersect (same binning trick on both sides;
    * dropDuplicates removes multi-bin double matches, so callers need a
    * unique key column on each side). */
  def intervalOverlap(
      left: DataFrame,
      right: DataFrame,
      lStart: String,
      lEnd: String,
      rStart: String,
      rEnd: String,
      binSize: Double,
      leftKey: String,
      rightKey: String,
      by: Seq[String] = Nil
  ): MayFail[DataFrame] = MayFail {
    require(binSize > 0, s"binSize must be positive: $binSize")
    def binned(df: DataFrame, s: String, e: String) =
      df.withColumn("__bin",
        explode(sequence(
          floor(col(s).cast("double") / binSize).cast("long"),
          floor(col(e).cast("double") / binSize).cast("long"))))
    binned(left, lStart, lEnd).join(binned(right, rStart, rEnd), by :+ "__bin")
      .filter(col(lStart) < col(rEnd) && col(rStart) < col(lEnd))
      .drop("__bin")
      .dropDuplicates(leftKey, rightKey)
  }
}
