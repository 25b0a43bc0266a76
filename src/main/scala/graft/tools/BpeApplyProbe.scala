package graft.tools

/** Wall-clock A/B for the frozen-merge APPLY path: train 1000 merges
  * once (driver tier), then time applyMerges over the trigram corpus.
  * Run before/after the single-expression rewrite. */
object BpeApplyProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1000)
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val spark = graft.GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(
        graft.functions.TextFunctions.wordShingles(col("text"), 3)).as("g"))
      .select(regexp_replace(col("g"), " ", "_").as("text"))
    val merges = graft.operators.Bpe.collectMerges(
      graft.operators.Bpe.learnMerges(docs, "text", numMerges = n,
        minPairCount = 1L).get)
    println(s"[bpeapply] merges=${merges.size}")
    val times = (0 until 3).map { _ =>
      val t0 = System.nanoTime()
      val c = graft.operators.Bpe.applyMerges(docs, "text", merges).get
        .agg(sum(col("n_tokens"))).head().getLong(0)
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[bpeapply] apply wall=$s%.2f s tokens=$c")
      s
    }
    println(f"[bpeapply] min=${times.min}%.2f s")
    spark.stop()
  }
}
