package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  * the corpus is scanned ONCE into a `(word, freq)` table — after
  * that everything is VOCAB-sized, so the merge loop runs in one of
  * two tiers with identical semantics (see [[learnImpl]]): a
  * bounded-driver in-memory loop with an inverted pair index (the
  * default — vocab fits the driver at any real corpus), or a
  * distributed loop whose pair statistics `Σ freq` are built once and
  * maintained INCREMENTALLY by signed ±freq deltas over only the
  * words containing the merged adjacency. The winning pair is always
  * (max count, then lexicographic (left, right) under binary string
  * order — fully deterministic), and the distributed merge applies as
  * a pure column expression: a greedy left-to-right fold over each
  * word's symbol array (`functions.aggregate` — codegen-friendly,
  * no UDF).
  * The fold is the standard BPE apply: a freshly merged token is a
  * NEW string, so it never re-merges as the left partner within the
  * same pass ("bbb" under (b,b) → [bb, b], not [b, bb] or [bbb]).
  *
  * Per-iteration frames (words AND pair counts) are
  * `localCheckpoint`ed and the superseded ones released immediately
  * (the repo's iterative discipline — lineage would otherwise grow by
  * one fold per merge). `numMerges` is capped at 65536 (a full
  * production vocabulary): the driver tier handles any real count in
  * memory; on the distributed tier each merge is still a few Spark
  * jobs (argmax on the pair frame, touched-subset delta, state
  * checkpoints), so a 32k-vocab distributed train is a long (but
  * bounded and restartable) job sequence. The APPLY side
  * ([[applyMerges]], [[tokenCountsDirect]]) is UNCAPPED since r13:
  * the rank-map kernel ([[graft.functions.BpeApplyImpl]]) costs the
  * same per word at 12 or 64k merges.
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

  /** Signed adjacent-pair statistics of a word frame: one `(l, r, w)`
    * row per adjacent symbol position, weighted `±freq` — the unit the
    * incremental pair-count maintenance adds and subtracts. (The
    * `size >= 2` filter keeps `sequence()` ascending — sequence(1, 0)
    * would DESCEND in Spark and fabricate out-of-range positions.) */
  private def signedPairs(words: DataFrame, sign: Int): DataFrame =
    words.filter(size(col("syms")) >= 2)
      .select(col("freq"), col("syms"),
        explode(sequence(lit(1), size(col("syms")) - 1)).as("p"))
      .select(element_at(col("syms"), col("p")).as("l"),
        element_at(col("syms"), col("p") + 1).as("r"),
        (col("freq") * lit(sign.toLong)).as("w"))

  /** TRUE iff the symbol array contains (`l`,`r`) adjacent — the
    * touched-word predicate of the incremental merge step. */
  private def hasAdjacent(syms: org.apache.spark.sql.Column,
      l: String, r: String): org.apache.spark.sql.Column =
    size(syms) >= 2 && exists(sequence(lit(1), size(syms) - 1),
      p => element_at(syms, p) === lit(l) &&
        element_at(syms, p + 1) === lit(r))

  /** Driver budget for the in-memory merge loop: the vocabulary frame
    * after the one corpus scan is VOCAB-sized, not corpus-sized, so at
    * any real corpus it fits the driver comfortably (2M distinct words
    * ≈ tens of MB) — mirroring [[Dedup.duplicateClusters]]'
    * union-find strategy: bounded collect when provably small,
    * distributed loop otherwise. */
  private val defaultMaxDriverWords = 2000000L

  /** In-memory merge loop over the collected `(word, freq)` vocab —
    * bit-identical semantics to the distributed loop (exact long pair
    * counts, argmax by (cnt DESC, l ASC, r ASC) under UTF8String BINARY
    * string order — Spark's ORDER BY, which differs from Java
    * compareTo on supplementary characters — and the same greedy
    * left-to-right non-overlapping fold), with an inverted pair→words
    * index so each merge touches only the words containing the pair.
    * 1000 merges run in seconds where each distributed round costs
    * whole Spark jobs (the r12 rehearsal: 192.5 s → 7.5 s, 25×). */
  private def learnDriver(
      rows: Array[(String, Long)],
      numMerges: Int,
      minPairCount: Long
  ): (Seq[(Int, String, String, String, Long)],
      Seq[(String, Long, Seq[String])]) = {
    import org.apache.spark.unsafe.types.UTF8String
    import scala.collection.mutable
    val syms: Array[mutable.ArrayBuffer[String]] =
      rows.map(r => mutable.ArrayBuffer(r._1.split(""): _*))
    val freq = rows.map(_._2)
    val cnt = mutable.HashMap.empty[(String, String), Long]
    val occ = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    // ordered pair index: the argmax (cnt DESC, then (l, r) ASC in
    // UTF8String binary order — Spark's ORDER BY) is `first()` in
    // O(log P) instead of a full O(P) map scan per merge. The r14
    // 32k-merge rehearsal law exposed the scan as the driver tier's
    // real bottleneck (~30 min at 32k merges × ~10⁵ live pairs); with
    // the tree the same training runs in seconds. Selection rule is
    // IDENTICAL — BpeSpec's reference-equality and tier-equality laws
    // pin it.
    // allocation-free code-point compare == UTF8String binary order
    // (UTF-8 byte order IS Unicode code-point order; Java compareTo
    // differs on supplementary characters, which is why the original
    // scan went through UTF8String) — the comparator runs ~17× per
    // tree op, so per-compare encode allocations would dominate
    def cpCompare(a: String, b: String): Int = {
      var i = 0
      var j = 0
      while (i < a.length && j < b.length) {
        val ca = a.codePointAt(i)
        val cb = b.codePointAt(j)
        if (ca != cb) return Integer.compare(ca, cb)
        i += Character.charCount(ca)
        j += Character.charCount(cb)
      }
      Integer.compare(a.length - i, b.length - j)
    }
    // the case the code-point loop exists for: U+1F600 (supplementary,
    // surrogate pair 0xD83D 0xDE00) must sort AFTER U+FFFF — Java
    // String.compareTo gets this backwards, UTF8String and cpCompare
    // agree. Checked once per train as a tripwire.
    require(cpCompare("😀", "￿") > 0 &&
      UTF8String.fromString("😀")
        .compareTo(UTF8String.fromString("￿")) > 0,
      "code-point compare diverged from UTF8String binary order")
    val tree = new java.util.TreeSet[(Long, String, String)](
      new java.util.Comparator[(Long, String, String)] {
        def compare(a: (Long, String, String),
            b: (Long, String, String)): Int = {
          val c = java.lang.Long.compare(b._1, a._1) // cnt DESC
          if (c != 0) c
          else {
            val lc = cpCompare(a._2, b._2)
            if (lc != 0) lc else cpCompare(a._3, b._3)
          }
        }
      })
    def changeCount(key: (String, String), delta: Long): Unit = {
      val old = cnt.getOrElse(key, 0L)
      if (old != 0L) tree.remove((old, key._1, key._2))
      val nc = old + delta
      if (nc == 0L) cnt.remove(key)
      else { cnt.update(key, nc); tree.add((nc, key._1, key._2)) }
    }
    def addPairs(i: Int, sign: Long): Unit = {
      val s = syms(i)
      var p = 0
      while (p < s.length - 1) {
        val key = (s(p), s(p + 1))
        changeCount(key, sign * freq(i))
        if (sign > 0) occ.getOrElseUpdate(key, mutable.Set.empty) += i
        p += 1
      }
      // negative passes leave occ entries stale on purpose — the merge
      // loop re-checks adjacency (`has`) before rewriting a hit
    }
    rows.indices.foreach(addPairs(_, 1L))
    val merges = mutable.ArrayBuffer
      .empty[(Int, String, String, String, Long)]
    var step = 1
    var done = false
    while (step <= numMerges && !done) {
      val best = if (tree.isEmpty) null else tree.first()
      if (best == null || best._1 < minPairCount) done = true
      else {
        val (c, l, r) = best
        merges += ((step, l, r, l + r, c))
        val hits = occ.getOrElse((l, r), mutable.Set.empty).toArray
        occ.remove((l, r))
        hits.foreach { i =>
          val s = syms(i)
          // stale index entries (word no longer holds the adjacency)
          // contribute nothing: check before rewriting
          var has = false
          var p = 0
          while (!has && p < s.length - 1) {
            has = s(p) == l && s(p + 1) == r; p += 1
          }
          if (has) {
            addPairs(i, -1L)
            // the same greedy left-to-right fold as applyMerge: a
            // freshly merged token never re-merges as the left partner
            val out = mutable.ArrayBuffer.empty[String]
            s.foreach { x =>
              if (out.nonEmpty && out.last == l && x == r)
                out(out.length - 1) = l + r
              else out += x
            }
            syms(i) = out
            addPairs(i, 1L)
          }
        }
        step += 1
      }
    }
    val finalWords = rows.indices
      .map(i => (rows(i)._1, freq(i), syms(i).toSeq))
    (merges.toSeq, finalWords)
  }

  /** Run the merge loop; returns (merge list, final word table
    * `(word, freq, syms)`). The word table is localCheckpoint'd —
    * callers consuming it long-term should copy or re-derive.
    *
    * Two tiers, SAME semantics (r11 ask #4 — the naive loop
    * re-aggregated adjacent pairs over the whole vocab frame every
    * merge: 32k merges = 32k full explode+shuffle scans):
    *
    *  - BOUNDED-DRIVER (default): the vocab frame after the one corpus
    *    scan is vocab-sized, so when it fits `maxDriverWords` (and a
    *    byte bound), the whole merge loop runs in memory with an
    *    inverted pair index — [[learnDriver]] — in seconds. The house
    *    [[Dedup.duplicateClusters]] strategy.
    *  - DISTRIBUTED INCREMENTAL (the unbounded tier, forced by
    *    `maxDriverWords = 0`): the `(l, r, cnt)` pair frame is built
    *    once and maintained by signed ±freq deltas over ONLY the words
    *    containing the merged adjacency; the winner argmaxes the pair
    *    frame directly (no recount). Counts stay exact longs —
    *    untouched words contribute identically before and after, so
    *    the maintained frame equals a from-scratch recount at every
    *    step, and the (cnt DESC, l, r) tie-break is unchanged. Both
    *    state frames are localCheckpoint'd per step, superseded ones
    *    released. BpeSpec locks tier equality. */
  private def learnImpl(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      minPairCount: Long,
      maxDriverWords: Long = defaultMaxDriverWords
  ): (Seq[(Int, String, String, String, Long)], DataFrame) = {
    require(numMerges >= 1 && numMerges <= 65536,
      s"numMerges must be in [1, 65536]: $numMerges (on the distributed " +
        "tier each merge is one Spark job over the vocabulary frame)")
    require(minPairCount >= 1, s"minPairCount must be >= 1: $minPairCount")
    val base = wordFreqs(df, textCol).localCheckpoint()
    val st = base.agg(count(lit(1)),
      coalesce(sum(length(col("word")).cast("long")), lit(0L))).head()
    val (nWords, nChars) = (st.getLong(0), st.getLong(1))
    // byte bound against a 400 MB driver budget: syms arrays ~one boxed
    // string per char + map/index overhead per word
    // maxDriverWords = 0 must FORCE the distributed tier even on an
    // empty vocabulary (0 <= 0 would otherwise take the driver branch)
    if (maxDriverWords > 0 && nWords <= maxDriverWords &&
      nChars * 64 + nWords * 200 < (400L << 20)) {
      val rows = base.orderBy("word").collect()
        .map(r => (r.getString(0), r.getLong(1)))
      Optimise.releaseCheckpoint(base)
      val (merges, finalWords) = learnDriver(rows, numMerges, minPairCount)
      val spark = df.sparkSession
      import spark.implicits._
      val words = finalWords.toDF("word", "freq", "syms").localCheckpoint()
      return (merges, words)
    }
    var words = base.withColumn("syms", split(col("word"), ""))
      .localCheckpoint()
    Optimise.releaseCheckpoint(base)
    var pairs = signedPairs(words, 1)
      .groupBy("l", "r").agg(sum("w").as("cnt"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, String, Long)]
    var step = 1
    var done = false
    while (step <= numMerges && !done) {
      val top = pairs.orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty || top(0).getLong(2) < minPairCount) done = true
      else {
        val (l, r, cnt) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((step, l, r, l + r, cnt))
        val touched = hasAdjacent(col("syms"), l, r)
        val before = words.filter(touched)
        val after = before.withColumn("syms", applyMerge(col("syms"), l, r))
        val delta = signedPairs(after, 1)
          .unionByName(signedPairs(before, -1))
          .groupBy("l", "r").agg(sum("w").as("d"))
        val nextPairs = pairs.join(delta, Seq("l", "r"), "full_outer")
          .select(col("l"), col("r"),
            (coalesce(col("cnt"), lit(0L)) + coalesce(col("d"), lit(0L)))
              .as("cnt"))
          .filter(col("cnt") > 0)
          .localCheckpoint()
        val nextWords = words.withColumn("syms",
            when(touched, applyMerge(col("syms"), l, r))
              .otherwise(col("syms")))
          .localCheckpoint()
        Optimise.releaseCheckpoint(words)
        Optimise.releaseCheckpoint(pairs)
        words = nextWords
        pairs = nextPairs
        step += 1
      }
    }
    Optimise.releaseCheckpoint(pairs)
    (merges.toSeq, words)
  }

  /** The learned merge table `(step, left_sym, right_sym, merged,
    * pair_count)`, in merge order — the tokenizer artifact itself. */
  def learnMerges(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      minPairCount: Long = 2L,
      maxDriverWords: Long = defaultMaxDriverWords
  ): MayFail[DataFrame] = MayFail {
    val (merges, words) =
      learnImpl(df, textCol, numMerges, minPairCount, maxDriverWords)
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
      minPairCount: Long = 2L,
      maxDriverWords: Long = defaultMaxDriverWords
  ): MayFail[DataFrame] = MayFail {
    val (_, words) =
      learnImpl(df, textCol, numMerges, minPairCount, maxDriverWords)
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
    // a 64k-merge table is ~a few MB collected — the bound only rejects
    // frames that are clearly not tokenizer artifacts
    require(n <= 1000000L, s"merge table has $n rows (> 1e6) — not a " +
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
    * The whole merge table runs as ONE codegen'd Catalyst expression
    * ([[graft.functions.BpeApplyMerges]] — the rank-map kernel, the
    * table shipped as a [[graft.functions.BpeRankIndex]] plan
    * reference object): any-size tokenizer is one map-side pass with
    * NO expression-depth or lineage growth, and per-word cost is
    * INDEPENDENT of the table size (r12 verdict ask #1 — the pre-r13
    * sequential kernel swept the word once per merge, so a 32k-merge
    * table cost 32k sweeps per word; the 4096-pair cap existed only
    * to bound that). The path takes no checkpoints — the pre-r12
    * `checkpointEvery` knob is gone (it had been a silent no-op since
    * the single-expression rewrite). BpeSpec locks expression ==
    * in-memory fold reference.
    *
    * Returns `(word, freq, n_tokens, segmentation)` over the
    * corpus's distinct words. */
  def applyMerges(
      df: DataFrame,
      textCol: String,
      merges: Seq[(String, String)]
  ): MayFail[DataFrame] = MayFail {
    // construct eagerly: the expression's rank index is lazy (codegen/
    // eval time), so a corrupt table (null components) must be rejected
    // HERE for MayFail semantics. Fail-fast is a deliberate r13 change:
    // the pre-r13 fold chain silently passed null entries through.
    new graft.functions.BpeRankIndex(merges)
    wordFreqs(df, textCol)
      .withColumn("syms", graft.functions.FunctionBridge.column(
        graft.functions.BpeApplyMerges(
          graft.functions.FunctionBridge.expression(
            split(col("word"), "")),
          merges)))
      .select(col("word"), col("freq"),
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

  /** Per-document token counts under a FROZEN merge table with NO
    * vocabulary join — every word occurrence runs the one-expression
    * tokenizer ([[graft.functions.BpeApplyMerges]]) directly, so the
    * whole plan is a map-side explode + one partial-agg shuffle to
    * document counts. STATELESS, which is the point: it composes onto
    * an unbounded STREAMING frame (where [[tokenCountsWith]]'s
    * distinct-word segmentation join cannot — the vocab of an
    * unbounded stream is unbounded state). On batch corpora with
    * heavy word repetition [[tokenCountsWith]] amortizes the fold per
    * DISTINCT word and usually wins; this is the streaming/one-shot
    * path. Counts are identical by construction (same expression —
    * BpeSpec locks it, the q397 gate oracles it). */
  def tokenCountsDirect(
      df: DataFrame,
      textCol: String,
      idCol: String,
      merges: Seq[(String, String)]
  ): MayFail[DataFrame] = MayFail {
    new graft.functions.BpeRankIndex(merges) // eager table validation
    df.filter(col(textCol).isNotNull)
      .select(col(idCol),
        explode(TextFunctions.tokens(col(textCol))).as("word"))
      .select(col(idCol), size(graft.functions.FunctionBridge.column(
        graft.functions.BpeApplyMerges(
          graft.functions.FunctionBridge.expression(
            split(col("word"), "")),
          merges))).cast("long").as("__nt"))
      .groupBy(idCol).agg(sum(col("__nt")).as("n_tokens"))
  }

  /** The corpus-derived VOCABULARY of a learned merge table: every
    * distinct single character of the corpus's words plus every merged
    * token, sorted (binary order) — the finished-token artifact the
    * greedy longest-match apply ([[vocabSegmentWords]]) consumes,
    * exactly how a WordPiece/SentencePiece vocab is the closure of its
    * training. Driver-side and vocab-bounded (the [[collectMerges]]
    * discipline). */
  def vocabFromCorpus(
      df: DataFrame,
      textCol: String,
      merges: Seq[(String, String)]
  ): Seq[String] = {
    // ONE action: limit(cap+1)+collect both fetches the alphabet and
    // enforces the bound — a separate count() would re-run the whole
    // corpus scan + distinct (r13 review finding)
    val chars = wordFreqs(df, textCol)
      .select(explode(split(col("word"), "")).as("c"))
      .filter(col("c") =!= "").distinct()
      .limit(100001).collect().map(_.getString(0))
    require(chars.length <= 100000,
      s"corpus alphabet exceeds 1e5 symbols — not character data?")
    (chars ++ merges.map(p => p._1 + p._2)).distinct.sorted.toSeq
  }

  /** GREEDY LONGEST-MATCH segmentation of every corpus word under a
    * frozen VOCABULARY — the WordPiece-style apply (one codegen'd
    * expression, [[graft.functions.VocabSegment]]): at each position
    * take the longest vocabulary entry prefixing the remaining
    * characters; a word with an un-coverable position becomes ONE
    * `unk` token (WordPiece's whole-word-UNK rule; no `##`
    * continuation distinction — documented deviation, the marking only
    * matters for detokenization). Complements [[applyMerges]]: BPE
    * apply replays the TRAINING's merge order; greedy longest-match
    * consumes only the finished vocabulary — production tokenizers ship
    * both formulations, and they genuinely differ ("banana" under a
    * vocab holding both "ban" and "banana" is one piece here, but
    * follows the merge path under BPE).
    *
    * Returns `(word, freq, n_pieces, segmentation)` over the corpus's
    * distinct words. Map-side only ahead of the word-frequency
    * aggregate; vocab ships as one plan reference object, per-word
    * cost independent of vocabulary size. */
  def vocabSegmentWords(
      df: DataFrame,
      textCol: String,
      vocab: Seq[String],
      unk: String = "<unk>"
  ): MayFail[DataFrame] = MayFail {
    // construct eagerly: the expression's index is lazy (eval-time), so
    // an invalid vocab/unk must be rejected HERE for MayFail semantics
    new graft.functions.VocabIndex(vocab, unk)
    wordFreqs(df, textCol)
      .withColumn("pieces", graft.functions.FunctionBridge.column(
        graft.functions.VocabSegment(
          graft.functions.FunctionBridge.expression(col("word")),
          vocab, unk)))
      .select(col("word"), col("freq"),
        size(col("pieces")).as("n_pieces"),
        array_join(col("pieces"), " ").as("segmentation"))
  }

  /** [[vocabFromCorpus]] in BOTH WordPiece forms: every token as a
    * word-initial entry AND as a `marker`-prefixed continuation entry
    * — the symmetric vocabulary a BPE merge closure induces (BPE does
    * not distinguish positions; a curated WordPiece vocab that drops
    * rare continuations is expressed by removing entries from the
    * returned list). Consumed by [[vocabSegmentWordsMarked]]. */
  def markedVocabFromCorpus(
      df: DataFrame,
      textCol: String,
      merges: Seq[(String, String)],
      marker: String = "##"
  ): Seq[String] = {
    val plain = vocabFromCorpus(df, textCol, merges)
    // marker collision guard (r14 review): a PLAIN corpus token that
    // itself starts with the marker would be filed as a continuation
    // entry by MarkedVocabIndex (or rejected outright when it equals
    // the marker), silently losing its word-initial form and breaking
    // the symmetric-closure argument the q404 oracle rests on — the
    // marker must be chosen absent from the corpus's token space,
    // checked here instead of assumed
    val clash = plain.filter(_.startsWith(marker))
    require(clash.isEmpty,
      s"markedVocabFromCorpus: corpus tokens collide with the " +
        s"continuation marker '$marker' (${clash.take(3).mkString(", ")}" +
        s"${if (clash.size > 3) ", …" else ""}) — pick a marker absent " +
        "from the corpus")
    plain ++ plain.map(marker + _)
  }

  /** Strip the continuation marker off non-initial pieces and
    * concatenate — the inverse of [[vocabSegmentWordsMarked]]'s
    * segmentation (pure codegen'd column: transform + array_join).
    * Exact for every non-UNK segmentation because marked pieces are
    * substrings of the original word with only the marker prepended;
    * the q404 gate and BpeSpec carry the law
    * `detokenize(segment(w)) == w`. */
  def detokenizePieces(pieces: Column, marker: String = "##"): Column = {
    val m = marker.length
    concat_ws("",
      transform(pieces, (x, i) =>
        when(i > 0 && x.startsWith(marker), x.substr(lit(m + 1), length(x)))
          .otherwise(x)))
  }

  /** Dataframe form of [[detokenizePieces]]: append `outCol` — the
    * reconstructed word — to a frame holding a marked-pieces array
    * column. */
  def detokenize(
      df: DataFrame,
      piecesCol: String,
      outCol: String = "word_detok",
      marker: String = "##"
  ): MayFail[DataFrame] = MayFail {
    require(marker.nonEmpty, "marker must be non-empty")
    df.withColumn(outCol, detokenizePieces(col(piecesCol), marker))
  }

  /** Continuation-marked greedy segmentation — [[vocabSegmentWords]]'s
    * WordPiece-proper sibling (r13 verdict ask #3): position 0 matches
    * word-initial vocabulary entries, later positions match
    * `marker`-prefixed continuation entries, and emitted continuation
    * pieces keep the marker, so segmentation is INVERTIBLE
    * ([[detokenizePieces]]). Whole-word UNK as before. Returns
    * `(word, freq, n_pieces, segmentation, round_trip)` where
    * `round_trip` is the detokenization law evaluated in-plan —
    * `detokenize(pieces) == word` for segmented words, NULL for UNK
    * (no claim to invert). One codegen'd expression
    * ([[graft.functions.VocabSegmentMarked]]); same map-side plan and
    * vocab-size independence as the unmarked form. */
  def vocabSegmentWordsMarked(
      df: DataFrame,
      textCol: String,
      vocab: Seq[String],
      unk: String = "<unk>",
      marker: String = "##"
  ): MayFail[DataFrame] = MayFail {
    // eager index construction: invalid vocab/unk/marker must Fail
    // here, not at eval time (MayFail semantics)
    new graft.functions.MarkedVocabIndex(vocab, unk, marker)
    wordFreqs(df, textCol)
      .withColumn("pieces", graft.functions.FunctionBridge.column(
        graft.functions.VocabSegmentMarked(
          graft.functions.FunctionBridge.expression(col("word")),
          vocab, unk, marker)))
      .select(col("word"), col("freq"),
        size(col("pieces")).as("n_pieces"),
        array_join(col("pieces"), " ").as("segmentation"),
        when(col("pieces") === array(lit(unk)), lit(null).cast("boolean"))
          .otherwise(detokenizePieces(col("pieces"), marker) === col("word"))
          .as("round_trip"))
  }

  /** Per-document piece counts under a frozen vocabulary — the greedy
    * longest-match counterpart of [[tokenCountsDirect]], with the same
    * stateless join-free plan (map-side explode + one partial-agg
    * shuffle), so it composes onto unbounded streams identically. */
  def vocabTokenCounts(
      df: DataFrame,
      textCol: String,
      idCol: String,
      vocab: Seq[String],
      unk: String = "<unk>"
  ): MayFail[DataFrame] = MayFail {
    new graft.functions.VocabIndex(vocab, unk) // eager validation
    df.filter(col(textCol).isNotNull)
      .select(col(idCol),
        explode(TextFunctions.tokens(col(textCol))).as("word"))
      .select(col(idCol), size(graft.functions.FunctionBridge.column(
        graft.functions.VocabSegment(
          graft.functions.FunctionBridge.expression(col("word")),
          vocab, unk))).cast("long").as("__np"))
      .groupBy(idCol).agg(sum(col("__np")).as("n_pieces"))
  }

  /** Tokenizer APPLY-COMPARISON report — the one-rower for the
    * "which apply do I ship" decision between the two formulations of
    * the same token inventory: BPE merge-order apply
    * ([[applyMerges]]) vs greedy longest-match over the finished
    * vocabulary ([[vocabSegmentWords]]). Returns ONE row
    * `(n_words, n_tokens_bpe, n_tokens_greedy: bigint,
    * tokens_per_word_bpe, tokens_per_word_greedy, agreement_rate:
    * double ROUNDED at 6)` over word OCCURRENCES; `agreement_rate` is
    * the occurrence share whose two segmentations are IDENTICAL —
    * the divergence the algorithms genuinely have (BpeSpec's
    * "banana" case). Exact integer totals; one vocabulary-sized join
    * of the two segmentation frames, each a single map-side pass. */
  def applyCompareReport(
      df: DataFrame,
      textCol: String,
      merges: Seq[(String, String)],
      vocab: Seq[String],
      unk: String = "<unk>"
  ): MayFail[DataFrame] = MayFail {
    // eager index validation (MayFail semantics — both indexes are
    // lazy inside their expressions)
    new graft.functions.BpeRankIndex(merges)
    new graft.functions.VocabIndex(vocab, unk)
    // ONE vocabulary-sized frame with BOTH segmentations as expression
    // columns — both applies are pure per-word functions, so a join of
    // two separate aggregation pipelines would cost a second corpus
    // scan + shuffle for nothing (r13 review)
    val seg = wordFreqs(df, textCol)
      .withColumn("__sb", graft.functions.FunctionBridge.column(
        graft.functions.BpeApplyMerges(
          graft.functions.FunctionBridge.expression(
            split(col("word"), "")), merges)))
      .withColumn("__sg", graft.functions.FunctionBridge.column(
        graft.functions.VocabSegment(
          graft.functions.FunctionBridge.expression(col("word")),
          vocab, unk)))
    seg.agg(
        coalesce(sum(col("freq")), lit(0L)).as("n_words"),
        coalesce(sum(col("freq") * size(col("__sb")).cast("long")),
          lit(0L)).as("n_tokens_bpe"),
        coalesce(sum(col("freq") * size(col("__sg")).cast("long")),
          lit(0L)).as("n_tokens_greedy"),
        coalesce(sum(when(col("__sb") === col("__sg"), col("freq"))
          .otherwise(lit(0L))), lit(0L)).as("__agree"))
      .select(col("n_words"), col("n_tokens_bpe"), col("n_tokens_greedy"),
        round(when(col("n_words") > 0, col("n_tokens_bpe").cast("double") /
          col("n_words").cast("double")) + lit(1e-9), 6)
          .as("tokens_per_word_bpe"),
        round(when(col("n_words") > 0,
          col("n_tokens_greedy").cast("double") /
            col("n_words").cast("double")) + lit(1e-9), 6)
          .as("tokens_per_word_greedy"),
        round(when(col("n_words") > 0, col("__agree").cast("double") /
          col("n_words").cast("double")) + lit(1e-9), 6)
          .as("agreement_rate"))
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
      minPairCount: Long = 2L,
      maxDriverWords: Long = defaultMaxDriverWords
  ): MayFail[DataFrame] = MayFail {
    val (_, words) =
      learnImpl(df, textCol, numMerges, minPairCount, maxDriverWords)
    val seg = words.select(col("word"), size(col("syms")).as("__nt"))
    df.filter(col(textCol).isNotNull)
      .select(col(idCol),
        explode(TextFunctions.tokens(col(textCol))).as("word"))
      .join(seg, Seq("word"))
      .groupBy(idCol).agg(sum(col("__nt").cast("long")).as("n_tokens"))
  }
}
