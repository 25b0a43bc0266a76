package graft.model

import org.apache.spark.ml.{Estimator, Model, Pipeline}
import org.apache.spark.ml.feature.PCA
import org.apache.spark.ml.param.ParamMap
import org.apache.spark.ml.util.{DefaultParamsWritable, Identifiable}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.types.StructType

/** Dimensionality-reduction presets (reference
  * `model/DimensionReduction.scala:24-80`): a PCA stage projecting
  * `features` → `features_reduced`, followed by [[ReplaceFeatureColumn]]
  * which drops the original vector and renames the reduced one back to
  * `features`, so downstream estimators are oblivious to the reduction. */
sealed trait DimReduc {
  def asPipelineStages: Seq[org.apache.spark.ml.PipelineStage]
}

final case class PCAReduc(nComponents: Int) extends DimReduc {
  override def asPipelineStages: Seq[org.apache.spark.ml.PipelineStage] = Seq(
    new PCA().setInputCol("features").setOutputCol("features_reduced")
      .setK(nComponents),
    new ReplaceFeatureColumn())
}

object DimReduc {
  def pca(n: Int): Pipeline =
    new Pipeline().setStages(PCAReduc(n).asPipelineStages.toArray)
}

/** Swap stage: drop `features`, rename `features_reduced` → `features`
  * (reference DimensionReduction.scala:46-80). */
class ReplaceFeatureColumn(override val uid: String = Identifiable.randomUID("ReplaceFeatureColumn"))
  extends Estimator[ReplaceFeatureColumnModel]
  with DefaultParamsWritable {
  override def copy(extra: ParamMap): this.type = defaultCopy(extra)
  override def transformSchema(schema: StructType): StructType = schema
  override def fit(dataset: Dataset[_]): ReplaceFeatureColumnModel =
    new ReplaceFeatureColumnModel()
}

class ReplaceFeatureColumnModel(override val uid: String = Identifiable.randomUID("ReplaceFeatureColumnModel"))
  extends Model[ReplaceFeatureColumnModel] {
  override def copy(extra: ParamMap): ReplaceFeatureColumnModel =
    new ReplaceFeatureColumnModel().setParent(parent)
  override def transformSchema(schema: StructType): StructType =
    StructType(schema.fields.filterNot(_.name == "features").map {
      case f if f.name == "features_reduced" => f.copy(name = "features")
      case f => f
    })
  override def transform(dataset: Dataset[_]): DataFrame =
    dataset.drop("features").withColumnRenamed("features_reduced", "features")
}
