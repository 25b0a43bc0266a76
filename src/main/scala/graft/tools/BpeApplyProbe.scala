package graft.tools

/** Wall-clock A/B for the frozen-merge APPLY path, two levels:
  *
  *  1. KERNEL A/B (the r12 ask-#1 evidence): the rank-map kernel
  *     ([[graft.functions.BpeApplyImpl.apply]]) vs the retired
  *     sequential-sweep kernel ([[graft.functions.BpeApplyImpl
  *     .applySequential]]) over the corpus's distinct words, at the
  *     trained table AND at a 32k-entry table (trained merges padded
  *     with dormant prefix-closed run entries — the production-vocab
  *     regime where most of the table never fires on a given word).
  *     The sequential kernel is O(merges × len) per word, so the 32k
  *     row is where the rewrite earns its keep.
  *  2. PLAN wall: `applyMerges` end-to-end over the trigram corpus
  *     (the pre-r13 probe's number, still comparable round-over-round
  *     at the 1000-merge table).
  *
  * Usage: `runMain graft.tools.BpeApplyProbe [numMerges] [sfDir]`.
  */
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
    println(s"[bpeapply] trained merges=${merges.size}")

    // ---- kernel A/B over the distinct corpus words ----
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val words = graft.operators.Bpe.wordFreqs(docs, "text")
      .select("word").collect().map(_.getString(0))
    println(s"[bpeapply] distinct words=${words.length}")
    val inputs = words.map(w => new GenericArrayData(
      w.split("").map(UTF8String.fromString).toArray[Any]))
    // pad to 32k with dormant merges over symbols absent from the
    // corpus alphabet — BOUNDED token lengths, like a real vocabulary
    // (run-shaped `"ÿ"*i` padding would make the TABLE itself
    // quadratic, ~1 GiB of strings, and measure serialization instead
    // of the kernel)
    // max(0, …): invoked with numMerges > 32768 the pad is empty and
    // the "32k" row would silently measure the larger trained table
    // under a misleading label (r13 ADVICE) — keep the row honest by
    // labeling it with the actual entry count below
    val deep = merges ++
      Seq.tabulate(math.max(0, 32768 - merges.size))(i => ("ÿ" + i, "þ" + i))
    if (merges.size > 32768)
      println(s"[bpeapply] WARNING: trained table (${merges.size}) exceeds " +
        "32768 — the '32k' rows measure the trained table itself")
    def tokenTotal(out: Seq[org.apache.spark.sql.catalyst.util.ArrayData]) =
      out.iterator.map(_.numElements().toLong).sum
    for ((label, table) <- Seq(("trained", merges), ("32k", deep))) {
      val flat = table.iterator.flatMap(p => Iterator(p._1, p._2)).toArray
      val idx = new graft.functions.BpeRankIndex(table)
      def timeIt(f: GenericArrayData => org.apache.spark.sql.catalyst.util.ArrayData)
          : (Double, Long) = {
        val t0 = System.nanoTime()
        val outs = inputs.iterator.map(f).toSeq
        ((System.nanoTime() - t0) / 1e9, tokenTotal(outs))
      }
      timeIt(graft.functions.BpeApplyImpl.apply(_, idx)) // JIT warm
      val (rankSec, rankToks) = (0 until 3).map(_ =>
        timeIt(graft.functions.BpeApplyImpl.apply(_, idx))).minBy(_._1)
      timeIt(graft.functions.BpeApplyImpl.applySequential(_, flat))
      val (seqSec, seqToks) = (0 until 3).map(_ =>
        timeIt(graft.functions.BpeApplyImpl.applySequential(_, flat))).minBy(_._1)
      require(rankToks == seqToks,
        s"kernel divergence at $label: rank=$rankToks seq=$seqToks")
      println(f"[bpeapply] kernel table=$label%-7s entries=${table.size}%6d " +
        f"rank=$rankSec%.3f s seq=$seqSec%.3f s speedup=${seqSec / rankSec}%.1fx " +
        f"tokens=$rankToks")
    }

    // ---- plan-level wall: trained table, then the 32k table ----
    for ((label, table) <- Seq(("trained", merges), ("32k", deep))) {
      val times = (0 until 3).map { _ =>
        val t0 = System.nanoTime()
        val c = graft.operators.Bpe.applyMerges(docs, "text", table).get
          .agg(sum(col("n_tokens"))).head().getLong(0)
        val s = (System.nanoTime() - t0) / 1e9
        println(f"[bpeapply] plan table=$label apply wall=$s%.2f s tokens=$c")
        s
      }
      println(f"[bpeapply] plan table=$label min=${times.min}%.2f s")
    }
    spark.stop()
  }
}
