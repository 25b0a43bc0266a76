package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functional.MayFail
import graft.functions.TextFunctions.tokens

/** Corpus-trained n-gram language-model quality scores — the CCNet-style
  * "perplexity under a reference LM" signal, self-trained on the corpus
  * itself (no external model needed): documents whose token transitions
  * are unlike the corpus norm (gibberish, boilerplate soup, wrong
  * language) score low and can be filtered on a threshold.
  *
  * Both scorers use add-k (Laplace) smoothing:
  * `p(w) = (c(w)+k) / (N+kV)` and `p(w2|w1) = (c(w1 w2)+k) / (c(w1)+kV)`.
  *
  * Scale posture: the model *is* a count table — one `groupBy(token)`
  * aggregation (map-side combined, vocab-sized result, orders of
  * magnitude smaller than the corpus), joined back to the exploded token
  * stream on the token key. Spark broadcasts the count table when it fits
  * (vocab tables almost always do) and the scalar `(N, V)` frame is
  * explicitly broadcast, so scoring adds no corpus-sized shuffle beyond
  * the per-doc average.
  */
object LmScore {

  /** Per-document mean unigram log-probability and perplexity.
    * Returns `(idCol, n_tokens, avg_logprob, perplexity)`; documents with
    * zero tokens produce no row (they have no distribution to score).
    */
  def unigramScores(
      df: DataFrame,
      textCol: String,
      idCol: String,
      k: Double = 1.0
  ): MayFail[DataFrame] = MayFail {
    require(k > 0, s"smoothing k must be > 0 (got $k): unsmoothed LMs assign log(0) to unseen tokens")
    val toks = df.select(col(idCol), explode(tokens(col(textCol))).as("tok"))
    val counts = toks.groupBy(col("tok")).agg(count(lit(1)).as("c1"))
    val stats = counts.agg(sum(col("c1")).as("N"), count(lit(1)).as("V"))
    toks.join(counts, "tok")
      .crossJoin(broadcast(stats))
      .withColumn("__lp", log((col("c1") + lit(k)) / (col("N") + lit(k) * col("V"))))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), avg(col("__lp")).as("avg_logprob"))
      .withColumn("perplexity", exp(-col("avg_logprob")))
  }

  /** Per-document mean bigram log-probability (context counts are the
    * plain unigram counts — the standard approximation that ignores the
    * missing continuation of each document's final token).
    * Returns `(idCol, n_bigrams, avg_logprob)`; documents with fewer than
    * two tokens produce no row.
    */
  def bigramScores(
      df: DataFrame,
      textCol: String,
      idCol: String,
      k: Double = 1.0
  ): MayFail[DataFrame] = MayFail {
    require(k > 0, s"smoothing k must be > 0 (got $k)")
    val t = df.select(col(idCol), tokens(col(textCol)).as("__t"))
    val uniCounts = t.select(explode(col("__t")).as("w1"))
      .groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val vocab = uniCounts.agg(count(lit(1)).as("V"))
    val pairs = t.filter(size(col("__t")) >= 2)
      .select(col(idCol),
        explode(zip_with(
          slice(col("__t"), lit(1), size(col("__t")) - 1),
          slice(col("__t"), lit(2), size(col("__t")) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("__bg"))
      .select(col(idCol), col("__bg.w1").as("w1"), col("__bg.w2").as("w2"))
    val biCounts = pairs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    pairs.join(biCounts, Seq("w1", "w2"))
      .join(uniCounts, "w1")
      .crossJoin(broadcast(vocab))
      .withColumn("__lp", log((col("c2") + lit(k)) / (col("c1") + lit(k) * col("V"))))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), avg(col("__lp")).as("avg_logprob"))
  }
}
