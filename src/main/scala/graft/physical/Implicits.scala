package graft.physical

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{avg, col, pow, sum}
import org.apache.spark.sql.types.DataType

import graft.functional.MayFail

/** Pipeline-sugar implicits (reference `physical/Util.scala:24-56`).
  *
  * The reference's scalar helpers (`sumOfSqrDiff`, `sumOfSqr`) drop to
  * `RDD[Double]`; here they are single `df.agg(...)` jobs — Catalyst plans
  * a partial+final aggregate, no Row boxing, no extra stage.
  */
object Implicits {

  implicit class DataFrameOps(val df: DataFrame) extends AnyVal {

    /** Monadic bind sugar: `df >> (_.filter(...)) >> ...`
      * (reference Util.scala:31). */
    def >>(f: DataFrame => DataFrame): MayFail[DataFrame] = MayFail(f(df))

    /** Schema as a name→type map (reference Util.scala:26-28). */
    def schemaMap: Map[String, DataType] =
      df.schema.fields.map(f => f.name -> f.dataType).toMap

    /** Σ(a−b)² over two columns, one aggregation job
      * (reference Util.scala:42-49 does this via RDD zip). */
    def sumOfSqrDiff(colA: String, colB: String): Double =
      df.agg(sum(pow(col(colA).cast("double") - col(colB).cast("double"), 2)))
        .head().getDouble(0)

    /** Σx² of a column (reference Util.scala:51-55). */
    def sumOfSqr(c: String): Double =
      df.agg(sum(pow(col(c).cast("double"), 2))).head().getDouble(0)

    /** Column mean as a driver scalar. */
    def meanOf(c: String): Double =
      df.agg(avg(col(c).cast("double"))).head().getDouble(0)

    /** Column as `RDD[Double]` with numeric widening (reference
      * Util.scala:33-40). Kept for API parity — prefer staying in the
      * DataFrame/Dataset API, where Catalyst plans the aggregation. */
    def getDoubleRDD(c: String): org.apache.spark.rdd.RDD[Double] =
      df.select(col(c).cast("double")).rdd.map(_.getDouble(0))
  }

  implicit class MayFailDataFrameOps(val mf: MayFail[DataFrame]) extends AnyVal {
    /** Chain another transform without leaving the monad. */
    def >>(f: DataFrame => DataFrame): MayFail[DataFrame] = mf.flatMap(df => MayFail(f(df)))
  }
}

/** Text preprocessing (reference `preprocess/Text.scala`). */
object Text {
  import org.apache.spark.sql.functions.trim

  /** Trim whitespace of a string column in place
    * (reference Text.scala:20-22). */
  def trim_(df: DataFrame, c: String): MayFail[DataFrame] =
    MayFail(df.withColumn(c, trim(col(c))))
}
