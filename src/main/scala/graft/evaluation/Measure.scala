package graft.evaluation

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functional.MayFail

/** Measure algebra (reference `evaluation/Measure.scala`).
  *
  * Regression measures are single-pass `df.agg(...)` jobs — the
  * reference's RDD zip+reduce formulations become one Catalyst
  * partial+final aggregate. Classification measures delegate to the
  * public `mllib.evaluation.BinaryClassificationMetrics` (the reference
  * uses the same class; its private-API Pearson shim is unnecessary since
  * `corr` is a public aggregate). `isBetter` encodes score polarity.
  */
sealed trait BaseMeasure[A] {
  def isBetter(a: A, b: A): Boolean
  def className: String = getClass.getSimpleName.stripSuffix("$")
}

trait Measure extends BaseMeasure[Double] {
  /** Aggregate expression over prediction/label columns. */
  def expr(pred: Column, label: Column): Column
  def %(df: DataFrame, pred: String, label: String): MayFail[Double] =
    MayFail(df.agg(expr(col(pred), col(label))).head().getDouble(0))
  def name: String
}

trait RegressionMeasure extends Measure

/** Root-mean-square error (reference Measure.scala:98-111; lower wins). */
case object RMSE extends RegressionMeasure {
  def expr(pred: Column, label: Column): Column =
    sqrt(avg(pow(pred.cast("double") - label.cast("double"), 2)))
  def isBetter(a: Double, b: Double): Boolean = a < b
  val name = "rmse"
}

/** Mean absolute error (reference Measure.scala:117-129; lower wins). */
case object MAE extends RegressionMeasure {
  def expr(pred: Column, label: Column): Column =
    avg(abs(pred.cast("double") - label.cast("double")))
  def isBetter(a: Double, b: Double): Boolean = a < b
  val name = "mae"
}

/** Mean percentage error avg(|pred−label| / label) — absolute numerator,
  * SIGNED denominator, unscaled fraction, matching the reference exactly
  * (reference Measure.scala:134-147). Deviation: where the reference
  * raises on label=0 ("Undefined labels result in exception"), try_divide
  * nulls those rows out of the avg — ANSI mode would otherwise raise
  * DIVIDE_BY_ZERO mid-job. Lower wins. */
case object MPE extends RegressionMeasure {
  def expr(pred: Column, label: Column): Column =
    avg(try_divide(abs(pred.cast("double") - label.cast("double")),
      label.cast("double")))
  def isBetter(a: Double, b: Double): Boolean = a < b
  val name = "mpe"
}

/** Pearson correlation (reference Measure.scala:152-159; higher wins). */
case object PearsonCorr extends RegressionMeasure {
  def expr(pred: Column, label: Column): Column =
    corr(pred.cast("double"), label.cast("double"))
  def isBetter(a: Double, b: Double): Boolean = a > b
  val name = "pearson"
}

/** R² coefficient of determination (parity+; higher wins). */
case object R2 extends RegressionMeasure {
  def expr(pred: Column, label: Column): Column = {
    val l = label.cast("double"); val p = pred.cast("double")
    // SS_tot = var_pop(l)·n — Spark's variance aggregate is a numerically
    // stable one-pass algorithm, unlike Σl²−(Σl)²/n which cancels
    // catastrophically when mean(l) ≫ stddev(l); still a single aggregate
    lit(1.0) - try_divide(sum(pow(l - p, 2)), var_pop(l) * count(l))
  }
  def isBetter(a: Double, b: Double): Boolean = a > b
  val name = "r2"
}

/** Binary-classification measures: scalar area metrics via `%`, full
  * threshold→score maps via `%%` (reference Measure.scala:161-225). */
trait ClassificationMeasure extends Measure {
  import org.apache.spark.mllib.evaluation.BinaryClassificationMetrics

  protected def metrics(df: DataFrame, pred: String, label: String): BinaryClassificationMetrics =
    new BinaryClassificationMetrics(
      df.select(col(pred).cast("double"), col(label).cast("double"))
        .rdd.map(r => (r.getDouble(0), r.getDouble(1))))

  /** Threshold → score map (driver-sized: one entry per distinct score). */
  def %%(df: DataFrame, pred: String, label: String): MayFail[Map[Double, Double]]

  override def expr(pred: Column, label: Column): Column =
    throw new UnsupportedOperationException(
      s"$className has no single-aggregate form; use % or %%")
  def isBetter(a: Double, b: Double): Boolean = a > b
}

case object Precision extends ClassificationMeasure {
  override def %(df: DataFrame, pred: String, label: String): MayFail[Double] =
    graft.functional.Fail(new UnsupportedOperationException(
      "Precision only returns a map of threshold -> score; use %%"))
  override def %%(df: DataFrame, pred: String, label: String): MayFail[Map[Double, Double]] =
    MayFail(metrics(df, pred, label).precisionByThreshold().collect().toMap)
  val name = "precision"
}

case object Recall extends ClassificationMeasure {
  override def %(df: DataFrame, pred: String, label: String): MayFail[Double] =
    graft.functional.Fail(new UnsupportedOperationException(
      "Recall only returns a map of threshold -> score; use %%"))
  override def %%(df: DataFrame, pred: String, label: String): MayFail[Map[Double, Double]] =
    MayFail(metrics(df, pred, label).recallByThreshold().collect().toMap)
  val name = "recall"
}

case object FMeasure extends ClassificationMeasure {
  override def %(df: DataFrame, pred: String, label: String): MayFail[Double] =
    graft.functional.Fail(new UnsupportedOperationException(
      "F-Measure only returns a map of threshold -> score; use %%"))
  override def %%(df: DataFrame, pred: String, label: String): MayFail[Map[Double, Double]] =
    MayFail(metrics(df, pred, label).fMeasureByThreshold().collect().toMap)
  val name = "fmeasure"
}

/** Area under the ROC curve (reference Measure.scala:208-214). */
case object AUC extends ClassificationMeasure {
  override def %(df: DataFrame, pred: String, label: String): MayFail[Double] =
    MayFail(metrics(df, pred, label).areaUnderROC())
  override def %%(df: DataFrame, pred: String, label: String): MayFail[Map[Double, Double]] =
    graft.functional.Fail(new UnsupportedOperationException("AUC is scalar; use %"))
  val name = "auc"
}

/** Area under the precision-recall curve (reference Measure.scala:219-225). */
case object AUCPrecisionRecall extends ClassificationMeasure {
  override def %(df: DataFrame, pred: String, label: String): MayFail[Double] =
    MayFail(metrics(df, pred, label).areaUnderPR())
  override def %%(df: DataFrame, pred: String, label: String): MayFail[Map[Double, Double]] =
    graft.functional.Fail(new UnsupportedOperationException("AUCPR is scalar; use %"))
  val name = "aucpr"
}

trait ClusterMeasure extends BaseMeasure[Double] {
  def %(df: DataFrame, featuresCol: String, clusterCol: String): MayFail[Double]
  def isBetter(a: Double, b: Double): Boolean = a < b
}

/** Mean (over rows) of mean-squared distance to the row's cluster centroid
  * (reference Measure.scala:230-263 — RDD reduceByKey there; here a
  * DataFrame plan: per-cluster mean vectors via `Summarizer.mean`,
  * broadcast back, one pass for the distances). */
case object SSE extends ClusterMeasure {
  import org.apache.spark.ml.functions.vector_to_array
  import org.apache.spark.ml.stat.Summarizer

  override def %(df: DataFrame, featuresCol: String, clusterCol: String): MayFail[Double] =
    MayFail {
      val means = df.groupBy(col(clusterCol))
        .agg(vector_to_array(Summarizer.mean(col(featuresCol))).as("__mean"))
      df.join(broadcast(means), clusterCol)
        .select(
          aggregate(
            zip_with(vector_to_array(col(featuresCol)), col("__mean"),
              (a, b) => (a - b) * (a - b)),
            lit(0.0), (acc, x) => acc + x
          ).as("__sq"),
          size(col("__mean")).as("__dim"))
        .agg(avg(col("__sq") / col("__dim")))
        .head().getDouble(0)
    }
  val name = "sse"
}

/** Per-feature measure vectors (reference `evaluation/MeasureVector.scala`). */
trait MeasureVector extends BaseMeasure[Array[Double]] {
  def %(df: DataFrame, specimen: Specimen): MayFail[Array[Double]]
  def findBest(zippedScore: Array[(Double, String)]): (Double, String) = zippedScore.max
  override def isBetter(a: Array[Double], b: Array[Double]): Boolean = false
}

trait RegressionMeasureVector extends MeasureVector

/** Per-coefficient z-scores of a fitted linear regression
  * (reference MeasureVector.scala:36-81): zⱼ = βⱼ/(σ·√(1/Σxⱼ²)) with
  * σ² = Σ(y-ŷ)²/(N−M−1). */
case object ZScore extends RegressionMeasureVector {
  import org.apache.spark.ml.regression.LinearRegressionModel
  import graft.physical.Implicits._
  import graft.model.Pipe

  override def %(df: DataFrame, specimen: Specimen): MayFail[Array[Double]] =
    Pipe.fittedEstimator(specimen.model).map { estimator =>
      val lg = estimator.asInstanceOf[LinearRegressionModel]
      val betas = lg.coefficients.toArray
      val n = df.count().toDouble
      val m = specimen.featureCol.size.toDouble
      val sigma2 = (1.0 / (n - m - 1)) *
        df.sumOfSqrDiff(specimen.labelCol, specimen.outputCol)
      val sigma = math.sqrt(sigma2)
      val sumX2 = specimen.featureCol.asArray.map(df.sumOfSqr)
      betas.zip(sumX2).map { case (beta, sx2) =>
        beta / (sigma * math.sqrt(1 / sx2))
      }
    }

  override def findBest(zippedScore: Array[(Double, String)]): (Double, String) =
    zippedScore.min
}
