package graft.evaluation

import org.apache.spark.ml.{Pipeline, PipelineStage}
import org.apache.spark.ml.feature.VectorAssembler

/** Feature-column algebra (reference `evaluation/FeatureCompare.scala:
  * 37-107`): `feature % estimator` assembles the training pipeline
  * `[preStep?, VectorAssembler, postStep?, estimator]`. */
sealed trait FeatureColumn {
  def %(
      estimator: Pipeline,
      preVectorAsmStep: Option[PipelineStage] = None,
      postVectorAsmStep: Option[PipelineStage] = None): Pipeline = {
    val vecAsm = new VectorAssembler()
      .setInputCols(asArray)
      .setOutputCol(vecCol)
    new Pipeline().setStages(
      Array(preVectorAsmStep, Some(vecAsm), postVectorAsmStep, Some(estimator)).flatten)
  }
  protected def vecCol: String = "features"
  def colName: String
  def sourceColName: String
  def asArray: Array[String]
  def size: Int
}

/** A single numeric column used as the feature vector. */
final case class Feature(c: String) extends FeatureColumn {
  override def colName: String = c
  override def sourceColName: String = c
  override def asArray: Array[String] = Array(c)
  override def size: Int = 1
}

/** Multiple columns assembled into one vector column. */
final case class AssemblyFeature(cs: Seq[String], asVectorCol: String = "features")
    extends FeatureColumn {
  override protected def vecCol: String = asVectorCol
  override def colName: String = asVectorCol
  override def sourceColName: String = cs.mkString(", ")
  override def asArray: Array[String] = cs.toArray
  override def size: Int = cs.size
}

object AssemblyFeature {
  def fromIterable(arr: Iterable[FeatureColumn]): AssemblyFeature =
    AssemblyFeature(arr.flatMap(_.asArray).toSeq)
}
