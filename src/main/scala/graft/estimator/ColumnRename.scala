package graft.estimator

import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.ml.param.ParamMap
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable, Identifiable}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.types.{StructField, StructType}

/** Pipeline stage renaming a column (reference
  * `estimator/ColumnRename.scala:23-81`). The reference caches the
  * renamed frame on every transform (ColumnRename.scala:80) — dropped
  * here: an unbounded implicit cache is a leak at scale and a rename is a
  * zero-cost plan node. */
class ColumnRename(override val uid: String = Identifiable.randomUID("ColumnRename"))
  extends Estimator[ColumnRenameModel]
  with InputOutputColParams
  with DefaultParamsWritable {

  setDefault(outputCol -> "input2")

  def setInputCol(value: String): this.type = set(inputCol, value)
  def setOutputCol(value: String): this.type = set(outputCol, value)

  override def copy(extra: ParamMap): this.type = defaultCopy(extra)
  override def transformSchema(schema: StructType): StructType = schema

  override def fit(dataset: Dataset[_]): ColumnRenameModel =
    new ColumnRenameModel().setInputCol($(inputCol)).setOutputCol($(outputCol))
}

class ColumnRenameModel(override val uid: String = Identifiable.randomUID("ColumnRenameModel"))
  extends Model[ColumnRenameModel]
  with InputOutputColParams
  with DefaultParamsWritable {

  setDefault(outputCol -> "input2")

  def setInputCol(value: String): this.type = set(inputCol, value)
  def setOutputCol(value: String): this.type = set(outputCol, value)

  override def copy(extra: ParamMap): ColumnRenameModel =
    copyValues(new ColumnRenameModel()
      .setInputCol($(inputCol)).setOutputCol($(outputCol)), extra)
      .setParent(parent)

  override def transformSchema(schema: StructType): StructType = {
    require(schema.fieldNames.contains($(inputCol)),
      s"Dataset has to contain the input feature column : ${$(inputCol)}")
    val f = schema.fields.find(_.name == $(inputCol)).get
    StructType(schema.fields.filterNot(_.name == $(inputCol)) :+
      StructField($(outputCol), f.dataType, f.nullable))
  }

  override def transform(dataset: Dataset[_]): DataFrame = {
    transformSchema(dataset.schema)
    dataset.withColumnRenamed($(inputCol), $(outputCol))
  }
}

/** Debugging pass-through stage (reference `estimator/DebugStep.scala:
  * 21-43`): logs schema + row peek at transform time, changes nothing. */
class DebugStep(override val uid: String = Identifiable.randomUID("DebugStep"))
  extends Estimator[DebugStepModel]
  with DefaultParamsWritable {
  override def copy(extra: ParamMap): this.type = defaultCopy(extra)
  override def transformSchema(schema: StructType): StructType = schema
  override def fit(dataset: Dataset[_]): DebugStepModel = new DebugStepModel()
}

class DebugStepModel(override val uid: String = Identifiable.randomUID("DebugStepModel"))
  extends Model[DebugStepModel]
  with DefaultParamsWritable {
  override def copy(extra: ParamMap): DebugStepModel =
    new DebugStepModel().setParent(parent)
  override def transformSchema(schema: StructType): StructType = schema
  override def transform(dataset: Dataset[_]): DataFrame = {
    dataset.printSchema()
    dataset.show(5, truncate = true)
    dataset.toDF()
  }
}

object ColumnRename extends DefaultParamsReadable[ColumnRename]
object ColumnRenameModel extends DefaultParamsReadable[ColumnRenameModel]
object DebugStep extends DefaultParamsReadable[DebugStep]
object DebugStepModel extends DefaultParamsReadable[DebugStepModel]
