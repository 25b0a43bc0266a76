package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functional.MayFail

/** As-of (temporal) join — an operator Spark lacks natively.
  *
  * For every left row, attach the payload of the nearest right row within
  * the same `by` keys, where "nearest" is direction-dependent (the
  * pandas `merge_asof` surface):
  *
  *  - `backward` — most recent right row with `rightTs <= leftTs` (the
  *    standard point-in-time lookup for feature freshness: "the user's
  *    last purchase before this click")
  *  - `forward`  — earliest right row with `rightTs >= leftTs` ("the
  *    next shipment after this order")
  *  - `nearest`  — whichever of the two is closer in time (ties →
  *    backward, matching pandas)
  *
  * `tolerance` bounds the match distance: a value comparable with
  * `leftTs − rightTs` (a numeric literal for numeric timestamps,
  * `expr("INTERVAL 5 MINUTES")` for timestamp columns); matches outside
  * it revert to null payloads. `allowExactMatches = false` makes the
  * direction inequality strict.
  *
  * Implementation is the union–window trick, not a range join: tag both
  * sides, union, and fill payloads with `last/first(payload,
  * ignoreNulls)` over windows ordered by (ts, side) — side ordering at
  * equal timestamps encodes inclusive vs strict semantics. This costs
  * ONE shuffle on the key — the same as a sort-merge join — with no
  * time-range explosion, so it scales to arbitrarily dense right sides
  * (`nearest` adds a second in-partition sort over the same exchange,
  * never a second shuffle). A Catalyst range-join formulation
  * (`l.ts between r.ts and r.ts + tol`) explodes with right-side
  * density; this never does.
  *
  * Skew note: all rows of one key land in one task; salt hot keys
  * upstream if a single entity dominates the stream.
  *
  * Caveat: a null in a right payload column is looked *through* (the
  * window takes the last non-null); pre-coalesce right-side nulls to a
  * sentinel if null payloads must be preserved.
  */
object AsOfJoin {

  /** Backward as-of join (compatibility surface — `asOf` with defaults). */
  def backward(
      left: DataFrame,
      right: DataFrame,
      leftTs: String,
      rightTs: String,
      by: Seq[String],
      rightCols: Seq[String]
  ): MayFail[DataFrame] =
    asOf(left, right, leftTs, rightTs, by, rightCols)

  def asOf(
      left: DataFrame,
      right: DataFrame,
      leftTs: String,
      rightTs: String,
      by: Seq[String],
      rightCols: Seq[String],
      direction: String = "backward",
      tolerance: Option[Column] = None,
      allowExactMatches: Boolean = true
  ): MayFail[DataFrame] = MayFail {
    require(rightCols.nonEmpty, "rightCols must name at least one payload column")
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"direction must be backward | forward | nearest: $direction")
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
      // the matched-ts spine: right rows carry their own ts, left rows
      // null — filled by the same windows as the payload columns, it is
      // the tolerance test and the nearest-direction comparator
      .withColumn("__rts", when(col("__side") === 0, col("__t")))

    // Side ordering at equal __t encodes inclusivity. Backward window
    // (frame ≤ current row): inclusive ⟺ right rows sort BEFORE left.
    // Forward window (frame ≥ current row): inclusive ⟺ right rows sort
    // AFTER left. Left is always 1.
    val bSide = if (allowExactMatches) lit(0) else lit(2)
    val fSide = if (allowExactMatches) lit(2) else lit(0)
    val wB = Window.partitionBy(by.map(col): _*)
      .orderBy(col("__t"), when(col("__side") === 0, bSide).otherwise(lit(1)))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(by.map(col): _*)
      .orderBy(col("__t"), when(col("__side") === 0, fSide).otherwise(lit(1)))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    def fill(df: DataFrame, prefix: String, w: org.apache.spark.sql.expressions.WindowSpec,
             take: Column => Column): DataFrame =
      (payload :+ "__rts").foldLeft(df) { (d, c) =>
        d.withColumn(s"$prefix$c", take(col(c)).over(w))
      }
    def inTol(dist: Column): Column =
      tolerance.map(t => dist <= t).getOrElse(lit(true))

    val filled = direction match {
      case "backward" => fill(unioned, "__b_", wB, last(_, ignoreNulls = true))
      case "forward"  => fill(unioned, "__f_", wF, first(_, ignoreNulls = true))
      case "nearest" =>
        fill(fill(unioned, "__b_", wB, last(_, ignoreNulls = true)),
          "__f_", wF, first(_, ignoreNulls = true))
    }

    val validB = col("__b___rts").isNotNull && inTol(col("__t") - col("__b___rts"))
    val validF = col("__f___rts").isNotNull && inTol(col("__f___rts") - col("__t"))
    val chosen = direction match {
      case "backward" =>
        payload.foldLeft(filled) { (d, c) =>
          d.withColumn(c, when(validB, col(s"__b_$c"))) }
      case "forward" =>
        payload.foldLeft(filled) { (d, c) =>
          d.withColumn(c, when(validF, col(s"__f_$c"))) }
      case "nearest" =>
        // both in tolerance → closer wins, ties backward (pandas order)
        val useB = validB &&
          (!validF || (col("__t") - col("__b___rts")) <= (col("__f___rts") - col("__t")))
        payload.foldLeft(filled) { (d, c) =>
          d.withColumn(c,
            when(useB, col(s"__b_$c")).otherwise(when(validF, col(s"__f_$c")))) }
    }
    chosen
      .filter(col("__side") === 1)
      .drop(chosen.columns.filter(c =>
        c.startsWith("__b_") || c.startsWith("__f_")): _*)
      .drop("__t", "__side", "__rts")
  }
}
