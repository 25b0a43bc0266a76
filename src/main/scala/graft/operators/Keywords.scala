package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functional.MayFail

/** Keyword / keyphrase extraction — the metadata-enrichment verbs of a
  * training-data pipeline (topic routing, dedup keys, retrieval
  * filters) that need no model artifact.
  */
object Keywords {

  /** RAKE — Rapid Automatic Keyword Extraction (Rose, Engel, Cramer &
    * Cowley 2010): candidate phrases are maximal stopword-free token
    * runs; each word scores `deg/freq` (deg = Σ length of the phrases
    * it appears in, freq = its occurrence count — both per document);
    * a phrase scores the sum of its member word scores. Long, rare
    * co-occurring word runs win — the classic unsupervised keyphrase
    * baseline.
    *
    * Tokenization: non-alphanumeric → space, lowercase, whitespace
    * split — the library's portable token convention, so the oracle
    * replays it verbatim. Phrases longer than `maxPhraseLen` are
    * dropped (RAKE's own convention against run-on junk); duplicate
    * phrase TEXTS within a document keep their separate occurrences.
    *
    * Determinism: `deg/freq` is one IEEE division of exact integers;
    * the phrase sum is a float partial agg, so scores are ROUNDED
    * (house tie-shift, 6 digits) before ranking, ties break on phrase
    * text — the linkage-score device.
    *
    * Returns `(idCol, phrase, score, rank)`, `topK` rows per document.
    *
    * Plan: one posexplode of the token stream, per-document windows
    * (phrase segmentation is a running stopword count), two partial
    * aggs, one per-document rank. Nothing global; documents are the
    * parallelism.
    */
  def rake(
      df: DataFrame,
      idCol: String,
      textCol: String,
      stopwords: Seq[String],
      topK: Int = 5,
      maxPhraseLen: Int = 4
  ): MayFail[DataFrame] = MayFail {
    require(stopwords.nonEmpty, "rake needs a stopword list")
    require(topK >= 1, s"topK must be >= 1: $topK")
    require(maxPhraseLen >= 1, s"maxPhraseLen must be >= 1: $maxPhraseLen")
    val toks = filter(
      split(lower(regexp_replace(col(textCol), "[^a-zA-Z0-9]+", " ")), "\\s+"),
      t => t =!= "")
    val pos = df.select(col(idCol).as("__id"), posexplode(toks).as(Seq("pos", "w")))
    val isStop = col("w").isin(stopwords.map(x => x: Any): _*)
    val wSeg = Window.partitionBy("__id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pw = pos
      .withColumn("__pid", sum(isStop.cast("long")).over(wSeg))
      .filter(!isStop)
    val ph = pw.groupBy("__id", "__pid").agg(count(lit(1)).as("__plen"))
      .filter(col("__plen") <= maxPhraseLen)
    val wordScore = pw.join(ph, Seq("__id", "__pid"))
      .groupBy("__id", "w")
      .agg((sum(col("__plen")).cast("double") / count(lit(1))).as("__ws"))
    val phrases = pw.join(ph, Seq("__id", "__pid"))
      .join(wordScore, Seq("__id", "w"))
      .groupBy("__id", "__pid")
      .agg(
        concat_ws(" ", transform(array_sort(collect_list(
          struct(col("pos"), col("w")))), s => s.getField("w"))).as("phrase"),
        round(sum(col("__ws")) + lit(1e-9), 6).as("score"))
    val rankW = Window.partitionBy("__id")
      .orderBy(col("score").desc, col("phrase"))
    phrases.withColumn("rank", row_number().over(rankW))
      .filter(col("rank") <= topK)
      .select(col("__id").as(idCol), col("phrase"), col("score"), col("rank"))
  }
}
