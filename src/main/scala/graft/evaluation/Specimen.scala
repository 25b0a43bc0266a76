package graft.evaluation

import org.apache.spark.ml.{Pipeline, PipelineModel, PipelineStage}
import org.apache.spark.sql.DataFrame

import graft.functional.{Fail, MayFail}

/** Draft model: trainable multiple times with different feature columns
  * (reference `evaluation/ModelDesign.scala:38-88`). */
trait ModelDesign {
  val outputCol: String
  val labelCol: String
  def toSpecimen(feature: FeatureColumn, df: DataFrame): Specimen
}

/** No training; the feature column IS the prediction.
  *
  * ⚠ Arg-order quirk preserved from the reference (ModelDesign.scala:50-52):
  * `DummySpecimen(featureCol, outputCol, labelCol)` receives
  * `(feature, design.labelCol, feature.colName)` — i.e. outputCol :=
  * design label, labelCol := feature name. Works because the symmetric
  * measures (RMSE/MAE/Pearson) don't care about the swap. */
final case class DummyModelDesign(labelCol: String) extends ModelDesign {
  override val outputCol = ""
  override def toSpecimen(feature: FeatureColumn, df: DataFrame): Specimen =
    DummySpecimen(feature, labelCol, feature.colName)
}

final case class SupervisedModelDesign(
    outputCol: String,
    labelCol: String,
    estimator: Pipeline,
    featurePipe: Option[PipelineStage] = None)
  extends ModelDesign {
  override def toSpecimen(feature: FeatureColumn, df: DataFrame): Specimen = {
    val pipe = feature % (estimator, featurePipe)
    SupervisedSpecimen(pipe.fit(df), feature, outputCol, labelCol)
  }
}

final case class UnsupervisedModelDesign(
    outputCol: String,
    estimator: Pipeline,
    featurePipe: Option[PipelineStage] = None)
  extends ModelDesign {
  override val labelCol = ""
  override def toSpecimen(feature: FeatureColumn, df: DataFrame): Specimen = {
    val pipe = feature % (estimator, featurePipe)
    UnsupervisedSpecimen(pipe.fit(df), feature, outputCol)
  }
}

/** Trained model under evaluation (reference `evaluation/Specimen.scala:
  * 45-154`). `ensure` skips re-transforming when the pipeline's outputs
  * are already present (reference Specimen.scala:54-65). */
trait Specimen {
  def model: PipelineModel
  val outputCol: String
  val labelCol: String
  val featureCol: FeatureColumn

  protected def ensure(df: DataFrame): DataFrame =
    if (df.columns.contains("features") || df.columns.contains(outputCol)) df
    else model.transform(df)

  def score(df: DataFrame, measure: Measure): MayFail[Double] =
    measure.%(ensure(df), outputCol, labelCol)

  def scoreVector(df: DataFrame, measure: MeasureVector): MayFail[Array[Double]] =
    measure.%(ensure(df), this)

  /** Threshold → score map for classification measures. */
  def scoreMap(df: DataFrame, measure: ClassificationMeasure): MayFail[Map[Double, Double]] =
    measure.%%(ensure(df), outputCol, labelCol)

  def scoreCluster(df: DataFrame, measure: ClusterMeasure): MayFail[Double] =
    measure.%(ensure(df), "features", outputCol)
}

/** Wraps already-predicted data; no pipeline (reference Specimen.scala:
  * 112-123 — `model` throws, `ensure` is identity). */
final case class DummySpecimen(
    featureCol: FeatureColumn,
    outputCol: String,
    labelCol: String)
  extends Specimen {
  override def model: PipelineModel = throw new NotImplementedError
  override protected def ensure(df: DataFrame): DataFrame = df
  override def score(df: DataFrame, measure: Measure): MayFail[Double] =
    measure match {
      // DummySpecimen scores the feature column directly against the label
      case _ => measure.%(df, outputCol, labelCol)
    }
}

final case class SupervisedSpecimen(
    model: PipelineModel,
    featureCol: FeatureColumn,
    outputCol: String,
    labelCol: String)
  extends Specimen {
  override def score(df: DataFrame, measure: Measure): MayFail[Double] =
    measure match {
      case _: RegressionMeasure | _: ClassificationMeasure =>
        super.score(ensure(df), measure)
      case other => Fail(new UnsupportedOperationException(
        s"Unsupported measure type for Supervised specimen: ${other.className}"))
    }
}

final case class UnsupervisedSpecimen(
    model: PipelineModel,
    featureCol: FeatureColumn,
    outputCol: String)
  extends Specimen {
  override val labelCol = ""
  override def score(df: DataFrame, measure: Measure): MayFail[Double] =
    Fail(new UnsupportedOperationException(
      s"Unsupervised specimen scores cluster measures via scoreCluster, not ${measure.className}"))
}
