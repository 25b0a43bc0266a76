package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functional.MayFail

/** As-of (temporal) join — an operator Spark lacks natively.
  *
  * For every left row, attach the payload of the most recent right row
  * with `rightTs <= leftTs` (backward direction, inclusive) within the
  * same `by` keys — the standard point-in-time lookup for feature
  * freshness ("the user's last purchase before this click").
  *
  * Implementation is the union–window trick, not a range join: tag both
  * sides, union, and take `last(payload, ignoreNulls)` over a window
  * ordered by (ts, side) with right rows sorting before left rows at
  * equal timestamps (inclusive semantics). This costs ONE shuffle on the
  * key — the same as a sort-merge join — with no time-range explosion,
  * so it scales to arbitrarily dense right sides. A Catalyst range-join
  * formulation (`l.ts between r.ts and r.ts + tol` ) explodes with
  * right-side density; this never does.
  *
  * Skew note: all rows of one key land in one task; salt hot keys
  * upstream if a single entity dominates the stream.
  *
  * Caveat: a null in a right payload column is looked *through* (the
  * window takes the last non-null); pre-coalesce right-side nulls to a
  * sentinel if null payloads must be preserved.
  */
object AsOfJoin {

  def backward(
      left: DataFrame,
      right: DataFrame,
      leftTs: String,
      rightTs: String,
      by: Seq[String],
      rightCols: Seq[String]
  ): MayFail[DataFrame] = MayFail {
    require(rightCols.nonEmpty, "rightCols must name at least one payload column")
    val clash = rightCols.toSet intersect left.columns.toSet
    require(clash.isEmpty, s"right payload columns clash with left: $clash — " +
      "rename them on the right side before joining")
    // Both sides naming their ts column identically is the common case:
    // the right ts is then used for ordering only and not emitted (give
    // it a distinct name on the right to also receive the matched ts).
    val emitRightTs = rightTs != leftTs && !left.columns.contains(rightTs)
    val payload = if (emitRightTs) (rightCols :+ rightTs).distinct else rightCols.distinct

    val lTagged = left
      .withColumn("__t", col(leftTs))
      .withColumn("__side", lit(1))
    // rightTs always rides along for ordering (__t); when its name clashes
    // with a left column the two merge in the union, which is harmless —
    // right rows are filtered out of the output and left rows keep their
    // own values (only `payload` columns get window-filled).
    val rTagged = right
      .select((by ++ (payload :+ rightTs).distinct).map(col): _*)
      .withColumn("__t", col(rightTs))
      .withColumn("__side", lit(0))
    val unioned = lTagged.unionByName(rTagged, allowMissingColumns = true)

    // right rows (side 0) sort before left rows at equal __t → inclusive
    val w = Window.partitionBy(by.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payload.foldLeft(unioned) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled
      .filter(col("__side") === 1)
      .drop("__t", "__side")
  }
}
