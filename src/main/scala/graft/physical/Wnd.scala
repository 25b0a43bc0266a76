package graft.physical

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

import graft.functional.MayFail

/** Thin window-function wrappers (SURVEY §2.5: the reference uses raw
  * Spark windows through `Transform.apply`; these give the same style as
  * the rest of the monadic surface). Built-in `expressions.Window` covers
  * everything else. */
object Wnd {

  def spec(partitionBy: Seq[String], orderBy: Seq[String]): WindowSpec =
    Window.partitionBy(partitionBy.map(col): _*).orderBy(orderBy.map(col): _*)

  /** `lag(col, n)` over a partition/order (the shape the reference's
    * sample pipelines build by hand, `ClassificationPipeline.scala:106-108`). */
  def lag_(df: DataFrame, c: String, n: Int, partitionBy: Seq[String],
      orderBy: Seq[String], as: String = "lag"): MayFail[DataFrame] =
    MayFail(df.withColumn(as, lag(col(c), n).over(spec(partitionBy, orderBy))))

  def lead_(df: DataFrame, c: String, n: Int, partitionBy: Seq[String],
      orderBy: Seq[String], as: String = "lead"): MayFail[DataFrame] =
    MayFail(df.withColumn(as, lead(col(c), n).over(spec(partitionBy, orderBy))))

  def rowNumber(df: DataFrame, partitionBy: Seq[String], orderBy: Seq[String],
      as: String = "row_number"): MayFail[DataFrame] =
    MayFail(df.withColumn(as, row_number().over(spec(partitionBy, orderBy))))

  def rank_(df: DataFrame, partitionBy: Seq[String], orderBy: Seq[String],
      as: String = "rank"): MayFail[DataFrame] =
    MayFail(df.withColumn(as, rank().over(spec(partitionBy, orderBy))))

  /** Running aggregate from partition start to the current row. */
  def running(df: DataFrame, agg: Column, partitionBy: Seq[String],
      orderBy: Seq[String], as: String): MayFail[DataFrame] =
    MayFail(df.withColumn(as, agg.over(
      spec(partitionBy, orderBy)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))))

  /** Sliding row-frame aggregate `[start, end]` relative to current row. */
  def sliding(df: DataFrame, agg: Column, partitionBy: Seq[String],
      orderBy: Seq[String], start: Long, end: Long, as: String): MayFail[DataFrame] =
    MayFail(df.withColumn(as,
      agg.over(spec(partitionBy, orderBy).rowsBetween(start, end))))
}
