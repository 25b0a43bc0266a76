package graft.estimator

import scala.util.hashing.MurmurHash3

import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.ml.feature.{HashingTF, IDF, IDFModel}
import org.apache.spark.ml.linalg.{Vectors}
import org.apache.spark.ml.linalg.SQLDataTypes.VectorType
import org.apache.spark.ml.param.ParamMap
import org.apache.spark.ml.util.{DefaultParamsWritable, Identifiable}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** String tokenise-and-encode stage (reference
  * `estimator/StringEncoder.scala:72-223`).
  *
  * `Murmur` method: fit collects the sorted distinct Murmur3 token-hash
  * space (seed 0x8623 — `PREDEF.HASH_SEED` at reference
  * StringEncoder.scala:34-36; Spark's built-in `hash()` is Murmur3 with a
  * different seed, so output parity requires `MurmurHash3.stringHash`),
  * and transform emits a dense count vector over that space.
  *
  * `TFIDF` method: HashingTF + IDF composition, temp columns dropped.
  *
  * Fit runs as a DataFrame distinct-collect (vocabulary-sized driver
  * state, like every dictionary encoder); transform is one UDF producing
  * an ml `Vector` — vector construction has no Column-expression
  * equivalent, so a UDF is the reference-fidelity choice here.
  */
object StringEncoder {
  val HashSeed = 0x8623
  val TokenSuffix = "__token"

  def murmur(s: String): Int = MurmurHash3.stringHash(s, HashSeed)

  sealed trait Method
  case object Murmur extends Method
  final case class TFIDF(minFreq: Int = 1) extends Method

  sealed trait Tokenizer {
    def splitDF(df: DataFrame, inputCol: String, outputCol: String): DataFrame
  }
  case object WhiteSpaceToken extends Tokenizer {
    override def splitDF(df: DataFrame, inputCol: String, outputCol: String): DataFrame =
      df.withColumn(outputCol, split(col(inputCol), "\\s+"))
  }
}

class StringEncoder(
    method: StringEncoder.Method = StringEncoder.Murmur,
    tokeniser: StringEncoder.Tokenizer = StringEncoder.WhiteSpaceToken,
    override val uid: String = Identifiable.randomUID("StringEncoder"))
  extends Estimator[StringEncoderModel]
  with InputOutputColParams
  with DefaultParamsWritable {

  import StringEncoder._

  override def copy(extra: ParamMap): this.type = defaultCopy(extra)
  override def transformSchema(schema: StructType): StructType =
    schema.add($(outputCol), VectorType, nullable = true)

  def setInputCol(value: String): this.type = set(inputCol, value)
  def setOutputCol(value: String): this.type = set(outputCol, value)

  override def fit(dataset: Dataset[_]): StringEncoderModel = {
    transformSchema(dataset.schema, logging = true)
    val tokCol = $(inputCol) + TokenSuffix
    val tokenised = tokeniser.splitDF(dataset.toDF, $(inputCol), tokCol)
    method match {
      case Murmur =>
        // Distinct token-hash space, computed as a single distributed
        // distinct over exploded tokens (the reference's RDD collect at
        // StringEncoder.scala:157-166, kept in the DataFrame API).
        val murmurUdf = udf((s: String) => murmur(s))
        val space = tokenised
          .select(explode(col(tokCol)).as("t"))
          .select(murmurUdf(col("t")).as("h"))
          .distinct()
          .orderBy("h")
          .collect()
          .map(_.getInt(0))
        new StringEncoderModel(MurmurFitted(space, $(outputCol)), tokeniser)
          .setInputCol($(inputCol)).setOutputCol($(outputCol))
      case TFIDF(_) =>
        val tfCol = $(inputCol) + "___tf"
        val tf = new HashingTF().setInputCol(tokCol).setOutputCol(tfCol)
        val idf = new IDF().setInputCol(tfCol).setOutputCol($(outputCol))
          .fit(tf.transform(tokenised))
        new StringEncoderModel(TfIdfFitted(tf, idf), tokeniser, tempCols = List(tfCol))
          .setInputCol($(inputCol)).setOutputCol($(outputCol))
    }
  }
}

sealed trait FittedEncoder {
  def transform(df: DataFrame, tokenCol: String): DataFrame
}

final case class MurmurFitted(hashSpace: Array[Int], outputCol: String)
    extends FittedEncoder {
  override def transform(df: DataFrame, tokenCol: String): DataFrame = {
    val space = hashSpace // avoid closing over the case class
    val enc = udf((seq: Seq[String]) => {
      val counts = new Array[Double](space.length)
      if (seq != null) seq.foreach { s =>
        val i = java.util.Arrays.binarySearch(space, StringEncoder.murmur(s))
        if (i >= 0) counts(i) += 1.0
      }
      Vectors.dense(counts)
    })
    df.withColumn(outputCol, enc(col(tokenCol)))
  }
}

final case class TfIdfFitted(tf: HashingTF, idf: IDFModel) extends FittedEncoder {
  override def transform(df: DataFrame, tokenCol: String): DataFrame =
    idf.transform(tf.transform(df))
}

class StringEncoderModel(
    val fitted: FittedEncoder,
    tokeniser: StringEncoder.Tokenizer,
    tempCols: List[String] = Nil,
    override val uid: String = Identifiable.randomUID("StringEncoderModel"))
  extends Model[StringEncoderModel]
  with InputOutputColParams {

  import StringEncoder._

  def setInputCol(value: String): this.type = set(inputCol, value)
  def setOutputCol(value: String): this.type = set(outputCol, value)

  override def copy(extra: ParamMap): StringEncoderModel =
    copyValues(new StringEncoderModel(fitted, tokeniser, tempCols)
      .setInputCol($(inputCol)).setOutputCol($(outputCol)), extra)
      .setParent(parent)

  override def transformSchema(schema: StructType): StructType = {
    require(schema.fieldNames.contains($(inputCol)),
      s"Dataset has to contain the input column : ${$(inputCol)}")
    schema.add($(outputCol), VectorType, nullable = false)
  }

  override def transform(dataset: Dataset[_]): DataFrame = {
    transformSchema(dataset.schema)
    val tokCol = $(inputCol) + TokenSuffix
    val df = fitted.transform(
      tokeniser.splitDF(dataset.toDF, $(inputCol), tokCol), tokCol)
    (tempCols :+ tokCol).foldLeft(df)(_ drop _)
  }
}
