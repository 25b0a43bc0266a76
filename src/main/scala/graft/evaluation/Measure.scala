package graft.evaluation

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functional.MayFail

/** Regression / correlation measures (reference
  * `evaluation/Measure.scala:98-159`), re-expressed as single-pass
  * `df.agg(...)` jobs — the reference's RDD zip+reduce formulations become
  * one Catalyst partial+final aggregate, no Row boxing, one stage.
  *
  * Each measure exposes the aggregate as a `Column` (composable into any
  * `groupBy`) and as a driver-side scalar via `%`. `isBetter` encodes
  * score polarity (error measures: lower is better; correlation: higher).
  */
sealed trait Measure {
  /** Aggregate expression over prediction/label columns. */
  def expr(pred: Column, label: Column): Column
  def %(df: DataFrame, pred: String, label: String): MayFail[Double] =
    MayFail(df.agg(expr(col(pred), col(label))).head.getDouble(0))
  def isBetter(a: Double, b: Double): Boolean
  def name: String
}

/** Root-mean-square error (reference Measure.scala:98-111; lower wins). */
case object RMSE extends Measure {
  def expr(pred: Column, label: Column): Column =
    sqrt(avg(pow(pred.cast("double") - label.cast("double"), 2)))
  def isBetter(a: Double, b: Double): Boolean = a < b
  val name = "rmse"
}

/** Mean absolute error (reference Measure.scala:117-129; lower wins). */
case object MAE extends Measure {
  def expr(pred: Column, label: Column): Column =
    avg(abs(pred.cast("double") - label.cast("double")))
  def isBetter(a: Double, b: Double): Boolean = a < b
  val name = "mae"
}

/** Mean percentage error |1 - pred/label| (reference Measure.scala:134-147;
  * lower wins). Label 0 rows propagate null and are excluded by `avg`,
  * matching double-division semantics in the reference. */
case object MPE extends Measure {
  def expr(pred: Column, label: Column): Column =
    // try_divide: label-0 rows become null and drop out of avg (ANSI mode
    // would otherwise raise DIVIDE_BY_ZERO)
    avg(abs(lit(1.0) - try_divide(pred.cast("double"), label.cast("double")))) * 100.0
  def isBetter(a: Double, b: Double): Boolean = a < b
  val name = "mpe"
}

/** Pearson correlation (reference Measure.scala:152-159; higher wins —
  * `corr` is a public Catalyst aggregate, no private-API shim needed). */
case object PearsonCorr extends Measure {
  def expr(pred: Column, label: Column): Column =
    corr(pred.cast("double"), label.cast("double"))
  def isBetter(a: Double, b: Double): Boolean = a > b
  val name = "pearson"
}

/** R² coefficient of determination (parity+; higher wins). */
case object R2 extends Measure {
  def expr(pred: Column, label: Column): Column = {
    val l = label.cast("double"); val p = pred.cast("double")
    // SS_tot via the computational formula so the whole measure stays one
    // aggregate pass: Σ(l-l̄)² = Σl² - (Σl)²/n
    lit(1.0) - try_divide(sum(pow(l - p, 2)),
      sum(pow(l, 2)) - pow(sum(l), 2) / count(l))
  }
  def isBetter(a: Double, b: Double): Boolean = a > b
  val name = "r2"
}
