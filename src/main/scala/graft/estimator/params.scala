package graft.estimator

import org.apache.spark.ml.param.{Param, Params}

/** Own input/output column params — Spark's shared `HasInputCol`/
  * `HasOutputCol` traits are `private[ml]`, and the reference reached them
  * by injecting a file into `org.apache.spark.ml.param.shared` (reference
  * `org/apache/spark/ml/param/shared/params.scala:6-19`). Declaring our own
  * keeps the Spark namespace clean. */
trait HasInputColParam extends Params {
  final val inputCol: Param[String] =
    new Param[String](this, "inputCol", "input column name")
  final def getInputCol: String = $(inputCol)
}

trait HasOutputColParam extends Params {
  final val outputCol: Param[String] =
    new Param[String](this, "outputCol", "output column name")
  final def getOutputCol: String = $(outputCol)
}

trait InputOutputColParams extends HasInputColParam with HasOutputColParam {
  setDefault(inputCol -> "input")
  setDefault(outputCol -> "output")
}
