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

  private def arity(name: String, es: Seq[_], min: Int, max: Int): Unit =
    if (es.length < min || es.length > max)
      throw new IllegalArgumentException(
        s"$name expects $min" + (if (max != min) s"..$max" else "") +
          s" arguments, got ${es.length}")

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("vec_dot",
      es => { arity("vec_dot", es, 2, 2); FloatVecDot(es(0), es(1)) }, "scala_udf")
    reg.createOrReplaceTempFunction("vec_cosine",
      es => { arity("vec_cosine", es, 2, 2); FloatVecCosine(es(0), es(1)) }, "scala_udf")
    reg.createOrReplaceTempFunction("vec_norm",
      es => { arity("vec_norm", es, 1, 1); FloatVecNorm(es.head) }, "scala_udf")
    reg.createOrReplaceTempFunction("simhash64",
      es => { arity("simhash64", es, 1, 2)
        SimHashText(es.head, if (es.length > 1) longLit(es(1)) else 42L) }, "scala_udf")
    reg.createOrReplaceTempFunction("word_shingle_hashes",
      es => { arity("word_shingle_hashes", es, 2, 3)
        WordShingleHashes(es.head, intLit(es(1)),
          if (es.length > 2) longLit(es(2)) else 42L) }, "scala_udf")
    reg.createOrReplaceTempFunction("char_shingle_hashes",
      es => { arity("char_shingle_hashes", es, 2, 3)
        CharShingleHashes(es.head, intLit(es(1)),
          if (es.length > 2) longLit(es(2)) else 42L) }, "scala_udf")
    reg.createOrReplaceTempFunction("minhash_signature",
      es => { arity("minhash_signature", es, 2, 3)
        MinHashSignature(es.head, intLit(es(1)),
          if (es.length > 2) longLit(es(2)) else 42L) }, "scala_udf")
    reg.createOrReplaceTempFunction("minhash_band_keys",
      es => { arity("minhash_band_keys", es, 3, 4)
        MinHashBandKeysFromHashes(es.head, intLit(es(1)), intLit(es(2)),
          if (es.length > 3) longLit(es(3)) else 42L) }, "scala_udf")
    reg.createOrReplaceTempFunction("jaccard_hashes",
      es => { arity("jaccard_hashes", es, 2, 2); JaccardLongs(es(0), es(1)) }, "scala_udf")
    reg.createOrReplaceTempFunction("hyperplane_bits",
      es => { arity("hyperplane_bits", es, 2, 3)
        HyperplaneBits(es.head, intLit(es(1)),
          if (es.length > 2) longLit(es(2)) else 42L) }, "scala_udf")
    reg.createOrReplaceTempFunction("double_vec_cosine",
      es => { arity("double_vec_cosine", es, 2, 2)
        DoubleVecCosine(es(0), es(1)) }, "scala_udf")
    reg.createOrReplaceTempFunction("portable_vec_simhash",
      es => { arity("portable_vec_simhash", es, 1, 2)
        PortableVecSimhash(es.head,
          if (es.length > 1) intLit(es(1)) else 60) }, "scala_udf")
    reg.createOrReplaceTempFunction("portable_cluster",
      es => { arity("portable_cluster", es, 2, 2)
        PortableClusterAssign(es.head, intLit(es(1))) }, "scala_udf")
    reg.createOrReplaceTempFunction("band_keys_from_simhash",
      es => { arity("band_keys_from_simhash", es, 3, 3)
        BandKeysFromSimhash(es(0), intLit(es(1)), intLit(es(2))) }, "scala_udf")
    reg.createOrReplaceTempFunction("double_vec_dot",
      es => { arity("double_vec_dot", es, 2, 2)
        DoubleVecDot(es(0), es(1)) }, "scala_udf")
    reg.createOrReplaceTempFunction("keep_tokens_except",
      es => { arity("keep_tokens_except", es, 2, 2)
        KeepTokensExcept(es(0), es(1)) }, "scala_udf")
    reg.createOrReplaceTempFunction("pack_bins_next_fit",
      es => { arity("pack_bins_next_fit", es, 2, 2)
        PackBinsNextFit(es.head, longLit(es(1))) }, "scala_udf")
    reg.createOrReplaceTempFunction("word_ngrams",
      es => { arity("word_ngrams", es, 2, 2)
        WordNgrams(es.head, intLit(es(1)), lowercase = true) }, "scala_udf")
    reg.createOrReplaceTempFunction("portable_pq_codes",
      es => { arity("portable_pq_codes", es, 3, 3)
        PortablePqCodes(es.head, intLit(es(1)), intLit(es(2))) }, "scala_udf")
    reg.createOrReplaceTempFunction("portable_pq_table",
      es => { arity("portable_pq_table", es, 3, 3)
        PortablePqTable(es.head, intLit(es(1)), intLit(es(2))) }, "scala_udf")
    reg.createOrReplaceTempFunction("pq_adc_score",
      es => { arity("pq_adc_score", es, 2, 2)
        PqAdcScore(es(0), es(1)) }, "scala_udf")
    reg.createOrReplaceTempFunction("jaro_winkler",
      es => { arity("jaro_winkler", es, 2, 2)
        JaroWinklerSim(es(0), es(1)) }, "scala_udf")
    reg.createOrReplaceTempFunction("jaro",
      es => { arity("jaro", es, 2, 2)
        JaroSim(es(0), es(1)) }, "scala_udf")
    reg.createOrReplaceTempFunction("dtw",
      es => { arity("dtw", es, 2, 3)
        DtwDistance(es(0), es(1),
          if (es.length > 2) intLit(es(2)) else Int.MaxValue) }, "scala_udf")
  }
}
