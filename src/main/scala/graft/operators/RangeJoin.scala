package graft.operators

import org.apache.spark.sql.DataFrame
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
  *
  * Guardrails: an interval spanning more than `maxBinsPerInterval` bins
  * (an open-ended sentinel like 9999-12-31 would otherwise explode to
  * billions of rows) raises a descriptive error at execution; the two
  * sides must not share non-`by` column names (Spark would otherwise
  * fail late with an ambiguous-reference error on the filter).
  */
object RangeJoin {

  private def requireDisjointColumns(
      left: DataFrame, right: DataFrame, by: Seq[String]): Unit = {
    val clash = (left.columns.toSet intersect right.columns.toSet) -- by.toSet
    require(clash.isEmpty,
      s"left and right share non-key column names $clash — rename one side " +
        "(the post-join range filter would be ambiguous)")
  }

  /** Replicated bin keys for `[startCol, endCol]`, erroring on intervals
    * wider than `maxBins` bins. */
  private def binsOf(s: org.apache.spark.sql.Column, e: org.apache.spark.sql.Column,
      binSize: Double, maxBins: Int) = {
    val lo = floor(s.cast("double") / binSize).cast("long")
    val hi = floor(e.cast("double") / binSize).cast("long")
    explode(when(hi - lo >= maxBins,
        raise_error(concat(lit(s"interval spans more than $maxBins bins of $binSize — " +
          "raise binSize/maxBinsPerInterval or cap open-ended intervals; width="),
          (hi - lo) * binSize)))
      .otherwise(sequence(lo, hi)))
  }

  /** Inner join of `left` rows whose `pointCol` falls in `right`'s
    * `[startCol, endCol)` interval, optionally also matching `by` keys. */
  def pointInInterval(
      left: DataFrame,
      right: DataFrame,
      pointCol: String,
      startCol: String,
      endCol: String,
      binSize: Double,
      by: Seq[String] = Nil,
      maxBinsPerInterval: Int = 10000
  ): MayFail[DataFrame] = MayFail {
    require(binSize > 0, s"binSize must be positive: $binSize")
    requireDisjointColumns(left, right, by)
    val lBinned = left.withColumn("__bin",
      floor(col(pointCol).cast("double") / binSize).cast("long"))
    val rBinned = right.withColumn("__bin",
      binsOf(col(startCol), col(endCol), binSize, maxBinsPerInterval))
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
      by: Seq[String] = Nil,
      maxBinsPerInterval: Int = 10000
  ): MayFail[DataFrame] = MayFail {
    require(binSize > 0, s"binSize must be positive: $binSize")
    requireDisjointColumns(left, right, by)
    def binned(df: DataFrame, s: String, e: String) =
      df.withColumn("__bin", binsOf(col(s), col(e), binSize, maxBinsPerInterval))
    binned(left, lStart, lEnd).join(binned(right, rStart, rEnd), by :+ "__bin")
      .filter(col(lStart) < col(rEnd) && col(rStart) < col(lEnd))
      .drop("__bin")
      .dropDuplicates(leftKey, rightKey)
  }
}
