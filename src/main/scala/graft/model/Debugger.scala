package graft.model

import org.apache.spark.ml.{Pipeline, PipelineModel, PipelineStage}

/** Recursive pipeline introspection (reference `physical/Util.scala:64-94`). */
object Debugger {

  def modelToString(model: PipelineModel): String =
    model.stages.map {
      case nested: PipelineModel => s"(${modelToString(nested)})"
      case t                     => t.getClass.getSimpleName
    }.mkString(" -> ")

  def pipelineToString(pipe: Pipeline): String =
    pipe.getStages.map {
      case nested: Pipeline => s"(${pipelineToString(nested)})"
      case s: PipelineStage => s.getClass.getSimpleName
    }.mkString(" -> ")

  def printPipeline(pipe: Pipeline): Unit = println(pipelineToString(pipe))

  def printModel(model: PipelineModel): Unit = println(modelToString(model))
}
