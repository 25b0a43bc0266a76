package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functional.MayFail
import graft.functions.TextFunctions
import graft.physical.Optimise

/** Byte-pair-encoding tokenizer TRAINING as relations (Sennrich,
  * Haddow & Birch, ACL 2016) — the step every pretraining pipeline
  * runs before it can even count tokens honestly: learn the merge
  * table from the corpus itself, then segment with it.
  *
  * The classic word-frequency formulation keeps this 100 TB-shaped:
  * the corpus is scanned ONCE into a `(word, freq)` table, and every
  * merge iteration after that touches only that VOCABULARY-sized
  * frame — pair statistics are `Σ freq` over adjacent symbol pairs
  * (a partial-aggregate shuffle of the vocab frame), the winning
  * pair is a 1-row collect (max count, then lexicographic (left,
  * right) — fully deterministic), and the merge applies as a pure
  * column expression: a greedy left-to-right fold over each word's
  * symbol array (`functions.aggregate` — codegen-friendly, no UDF).
  * The fold is the standard BPE apply: a freshly merged token is a
  * NEW string, so it never re-merges as the left partner within the
  * same pass ("bbb" under (b,b) → [bb, b], not [b, bb] or [bbb]).
  *
  * Per-iteration frames are `localCheckpoint`ed and the superseded
  * frame released immediately (the repo's iterative discipline —
  * lineage would otherwise grow by one fold per merge). `numMerges`
  * is capped at 4096: each merge is one Spark job over the vocab
  * frame, so a production 32k-vocab train is a long (but bounded and
  * restartable) job sequence; the cap makes the cost opt-in rather
  * than accidental.
  *
  * Tokenization into words: [[TextFunctions.tokens]] (lowercase,
  * whitespace split) — the library's portable convention, replayed
  * verbatim by the oracles. Initial symbols are single characters;
  * no end-of-word marker is appended (the marker only matters for
  * detokenization, not for merge learning or token counting —
  * documented deviation from Sennrich's `</w>`). Character split is
  * JVM `split("")` — UTF-16 code units — so supplementary-plane
  * text (emoji, rare CJK) should be byte- or NFC-normalized first.
  *
  * Learning stops early (with fewer than `numMerges` rows) when no
  * adjacent pair reaches `minPairCount` — merging a pair seen once
  * is pure overfit.
  */
object Bpe {

  /** Corpus word-frequency table `(word, freq)` — the single corpus
    * scan everything else rides on. */
  def wordFreqs(df: DataFrame, textCol: String): DataFrame =
    df.filter(col(textCol).isNotNull)
      .select(explode(TextFunctions.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** One greedy left-to-right merge pass of (`l`,`r`)→`l+r` over a
    * symbol-array column — `functions.aggregate` fold, no UDF. */
  private def applyMerge(syms: org.apache.spark.sql.Column,
      l: String, r: String): org.apache.spark.sql.Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0 &&
            element_at(acc, -1) === lit(l) && x === lit(r),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
          .otherwise(concat(acc, array(x))))

  /** Run the merge loop; returns (merge list, final word table
    * `(word, freq, syms)`). The word table is localCheckpoint'd —
    * callers consuming it long-term should copy or re-derive. */
  private def learnImpl(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      minPairCount: Long
  ): (Seq[(Int, String, String, String, Long)], DataFrame) = {
    require(numMerges >= 1 && numMerges <= 4096,
      s"numMerges must be in [1, 4096]: $numMerges (each merge is one " +
        "Spark job over the vocabulary frame)")
    require(minPairCount >= 1, s"minPairCount must be >= 1: $minPairCount")
    var words = wordFreqs(df, textCol)
      .withColumn("syms", split(col("word"), ""))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, String, Long)]
    var step = 1
    var done = false
    while (step <= numMerges && !done) {
      // adjacent-pair statistics: vocab-frame explode + partial agg.
      // (size >= 2 filter keeps sequence() ascending — sequence(1, 0)
      // would DESCEND in Spark and fabricate out-of-range positions)
      val top = words.filter(size(col("syms")) >= 2)
        .select(col("freq"), col("syms"),
          explode(sequence(lit(1), size(col("syms")) - 1)).as("p"))
        .select(element_at(col("syms"), col("p")).as("l"),
          element_at(col("syms"), col("p") + 1).as("r"), col("freq"))
        .groupBy("l", "r").agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty || top(0).getLong(2) < minPairCount) done = true
      else {
        val (l, r, cnt) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((step, l, r, l + r, cnt))
        val next = words
          .withColumn("syms", applyMerge(col("syms"), l, r))
          .localCheckpoint()
        Optimise.releaseCheckpoint(words)
        words = next
        step += 1
      }
    }
    (merges.toSeq, words)
  }

  /** The learned merge table `(step, left_sym, right_sym, merged,
    * pair_count)`, in merge order — the tokenizer artifact itself. */
  def learnMerges(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      minPairCount: Long = 2L
  ): MayFail[DataFrame] = MayFail {
    val (merges, words) = learnImpl(df, textCol, numMerges, minPairCount)
    Optimise.releaseCheckpoint(words)
    val spark = df.sparkSession
    import spark.implicits._
    merges.toDF("step", "left_sym", "right_sym", "merged", "pair_count")
  }

  /** Final segmentation of every corpus word under the learned
    * merges: `(word, freq, n_tokens, segmentation)` with the symbols
    * space-joined (portable across engines — no array compare). */
  def segmentWords(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      minPairCount: Long = 2L
  ): MayFail[DataFrame] = MayFail {
    val (_, words) = learnImpl(df, textCol, numMerges, minPairCount)
    words.select(col("word"), col("freq"),
      size(col("syms")).as("n_tokens"),
      array_join(col("syms"), " ").as("segmentation"))
  }

  /** Bounded driver-side collect of a [[learnMerges]] table into the
    * ordered (left, right) pair list [[applyMerges]] consumes — the
    * tokenizer's export format (mirrors the IVF codebook collects:
    * explicit `require` bound instead of silent OOM). */
  def collectMerges(merges: DataFrame): Seq[(String, String)] = {
    val n = merges.count()
    require(n <= 4096, s"merge table has $n rows (> 4096) — not a " +
      "learnMerges artifact?")
    merges.orderBy("step").select("left_sym", "right_sym")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
  }

  /** Segment a corpus under a FROZEN merge table — the production
    * split: [[learnMerges]] once on the training corpus, export the
    * (ordered) pair list, tokenize every future shard with it
    * (exactly the index/search discipline of the IVF family). Works
    * on UNSEEN words by construction: the greedy fold only consults
    * the word's own characters and the merge list.
    *
    * The folds chain LAZILY — one merge is one `functions.aggregate`
    * wrap, so `checkpointEvery` merges become a single linear
    * expression chain per job, with a localCheckpoint between chunks
    * (and the superseded chunk released) to keep expression depth
    * and lineage bounded at production merge counts.
    *
    * Returns `(word, freq, n_tokens, segmentation)` over the
    * corpus's distinct words. */
  def applyMerges(
      df: DataFrame,
      textCol: String,
      merges: Seq[(String, String)],
      checkpointEvery: Int = 24
  ): MayFail[DataFrame] = MayFail {
    require(merges.size <= 4096,
      s"merges must hold <= 4096 pairs: ${merges.size}")
    require(checkpointEvery >= 1,
      s"checkpointEvery must be >= 1: $checkpointEvery")
    val init = wordFreqs(df, textCol)
      .withColumn("syms", split(col("word"), ""))
    val chunks = merges.grouped(checkpointEvery).toSeq
    var words = init
    for ((chunk, idx) <- chunks.zipWithIndex) {
      val chained = chunk.foldLeft(words) { case (acc, (l, r)) =>
        acc.withColumn("syms", applyMerge(col("syms"), l, r))
      }
      if (idx < chunks.size - 1) {
        val cp = chained.localCheckpoint() // eager: prior frame consumed
        if (idx > 0) Optimise.releaseCheckpoint(words)
        words = cp
      } else words = chained
    }
    words.select(col("word"), col("freq"),
      size(col("syms")).as("n_tokens"),
      array_join(col("syms"), " ").as("segmentation"))
  }

  /** Per-document token counts under a FROZEN merge table — the
    * apply-side complement of [[tokenCounts]] for corpora the
    * tokenizer was NOT trained on. */
  def tokenCountsWith(
      df: DataFrame,
      textCol: String,
      idCol: String,
      merges: Seq[(String, String)]
  ): MayFail[DataFrame] = MayFail {
    val seg = applyMerges(df, textCol, merges).get
      .select(col("word"), col("n_tokens").cast("long").as("__nt"))
    df.filter(col(textCol).isNotNull)
      .select(col(idCol),
        explode(TextFunctions.tokens(col(textCol))).as("word"))
      .join(seg, Seq("word"))
      .groupBy(idCol).agg(sum(col("__nt")).as("n_tokens"))
  }

  /** Tokenizer fertility report — the evaluation one-rower every
    * tokenizer change ships with: `(n_words, n_chars, n_tokens:
    * bigint, chars_per_token, tokens_per_word: double ROUNDED at 6)`
    * over word OCCURRENCES under a frozen merge table. Lower
    * chars-per-token = worse compression; tokens-per-word near 1 =
    * saturated vocabulary. Grid-sized aggregation over the
    * segmentation frame. */
  def fertilityReport(
      df: DataFrame,
      textCol: String,
      merges: Seq[(String, String)]
  ): MayFail[DataFrame] = MayFail {
    applyMerges(df, textCol, merges).get
      .agg(
        coalesce(sum(col("freq")), lit(0L)).as("n_words"),
        coalesce(sum(col("freq") * length(col("word")).cast("long")),
          lit(0L)).as("n_chars"),
        coalesce(sum(col("freq") * col("n_tokens").cast("long")), lit(0L))
          .as("n_tokens"))
      .withColumn("chars_per_token",
        round(when(col("n_tokens") > 0,
          col("n_chars").cast("double") / col("n_tokens").cast("double"))
          + lit(1e-9), 6))
      .withColumn("tokens_per_word",
        round(when(col("n_words") > 0,
          col("n_tokens").cast("double") / col("n_words").cast("double"))
          + lit(1e-9), 6))
  }

  /** Per-document token counts under the learned tokenizer — the
    * honest replacement for heuristic budget counts
    * ([[TextFunctions.subwordCount]]) once a corpus-trained merge
    * table exists. Each document's words join the (vocabulary-sized)
    * segmentation table; the count is `Σ n_tokens(word)` over word
    * OCCURRENCES. Documents with no words are absent (join contract,
    * mirrored by the oracle). */
  def tokenCounts(
      df: DataFrame,
      textCol: String,
      idCol: String,
      numMerges: Int,
      minPairCount: Long = 2L
  ): MayFail[DataFrame] = MayFail {
    val (_, words) = learnImpl(df, textCol, numMerges, minPairCount)
    val seg = words.select(col("word"), size(col("syms")).as("__nt"))
    df.filter(col(textCol).isNotNull)
      .select(col(idCol),
        explode(TextFunctions.tokens(col(textCol))).as("word"))
      .join(seg, Seq("word"))
      .groupBy(idCol).agg(sum(col("__nt").cast("long")).as("n_tokens"))
  }
}
