package graft.tools

/** Wall-clock rehearsal for BPE training (VERDICT r11 ask #4): time a
  * large-merge-count `learnMerges` run on the documents table. Run
  * before/after the incremental pair-count change to record the A/B.
  * Usage: sbt "runMain graft.tools.BpeTrainProbe [numMerges] [sfDir]" */
object BpeTrainProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1000)
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val spark = graft.GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    // the synthetic documents draw from a 31-word list, so plain-word
    // BPE saturates after ~89 merges — rehearse on word-TRIGRAM tokens
    // ('_'-joined) from the same table: tens of thousands of distinct
    // ~20-char "words", deep enough for a 1k-merge train
    // mode "hex" (3rd arg, with a replication multiplier 4th arg)
    // replicates the r14 rehearsal's bpe_train_32k corpus exactly:
    // ×mult documents augmented with two md5-derived hex words per doc
    val docs = if (args.lift(2).contains("hex")) {
      val mult = args.lift(3).map(_.toInt).getOrElse(10)
      val base = spark.read.parquet(s"$dir/documents.parquet")
      val repl = (0 until mult).map(i =>
        base.withColumn("doc_id", col("doc_id") + i.toLong * 100000000L))
        .reduce(_ union _)
      repl.select(concat_ws(" ", col("text"),
        md5(col("doc_id").cast("string")),
        md5(concat(col("doc_id").cast("string"), lit("§bpe32k"))))
        .as("text"))
    } else spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(
        graft.functions.TextFunctions.wordShingles(col("text"), 3)).as("g"))
      .select(regexp_replace(col("g"), " ", "_").as("text"))
    // hex mode mirrors the rehearsal's bpe_train_32k run, which trains
    // with minPairCount = 2 — a probe at 1 would keep merging count-1
    // pairs the rehearsal stops at and silently measure a different
    // run (r14 review); the trigram mode keeps its historical 1
    val minPair = if (args.lift(2).contains("hex")) 2L else 1L
    val t0 = System.nanoTime()
    val m = graft.operators.Bpe.learnMerges(docs, "text", numMerges = n,
      minPairCount = minPair).get
    val rows = m.count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[bpeprobe] merges=$rows%d requested=$n%d wall=$sec%.1f s")
    spark.stop()
  }
}
