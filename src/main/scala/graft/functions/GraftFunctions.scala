package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL registration for the engine's native expressions: after
  * `GraftFunctions.register(spark)`, every kernel is callable from
  * `spark.sql` / `selectExpr` alongside the built-ins.
  *
  * Literal-argument extraction mirrors how Spark's own parameterized
  * functions (e.g. `approx_count_distinct`) read their config arguments:
  * they must be foldable literals.
  */
object GraftFunctions {

  private def intLit(e: org.apache.spark.sql.catalyst.expressions.Expression): Int =
    e.eval(null) match {
      case i: Int  => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(
        s"expected an integer literal, got $other")
    }

  private def longLit(e: org.apache.spark.sql.catalyst.expressions.Expression): Long =
    e.eval(null) match {
      case i: Int  => i.toLong
      case l: Long => l
      case other => throw new IllegalArgumentException(
        s"expected a long literal, got $other")
    }

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("vec_dot",
      es => FloatVecDot(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("vec_cosine",
      es => FloatVecCosine(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("vec_norm",
      es => FloatVecNorm(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("simhash64",
      es => SimHashText(es.head, if (es.length > 1) longLit(es(1)) else 42L), "scala_udf")
    reg.createOrReplaceTempFunction("word_shingle_hashes",
      es => WordShingleHashes(es.head, intLit(es(1)),
        if (es.length > 2) longLit(es(2)) else 42L), "scala_udf")
    reg.createOrReplaceTempFunction("char_shingle_hashes",
      es => CharShingleHashes(es.head, intLit(es(1)),
        if (es.length > 2) longLit(es(2)) else 42L), "scala_udf")
    reg.createOrReplaceTempFunction("minhash_signature",
      es => MinHashSignature(es.head, intLit(es(1)),
        if (es.length > 2) longLit(es(2)) else 42L), "scala_udf")
    reg.createOrReplaceTempFunction("minhash_band_keys",
      es => MinHashBandKeysFromHashes(es.head, intLit(es(1)), intLit(es(2)),
        if (es.length > 3) longLit(es(3)) else 42L), "scala_udf")
    reg.createOrReplaceTempFunction("jaccard_hashes",
      es => JaccardLongs(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("hyperplane_bits",
      es => HyperplaneBits(es.head, intLit(es(1)),
        if (es.length > 2) longLit(es(2)) else 42L), "scala_udf")
  }
}
