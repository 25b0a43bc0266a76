package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functional.MayFail
import graft.functions.TextFunctions.normalizeText

/** Segment-granularity corpus operators: paragraph-level exact dedup and
  * cross-document boilerplate removal — the two in-document cleanup passes
  * a web-scale training corpus needs between document-level dedup and
  * quality filtering (paragraph dedup per Lee et al., "Deduplicating
  * Training Data Makes Language Models Better"; boilerplate removal per
  * the CCNet pipeline's repeated-paragraph filter).
  *
  * Scale posture: a segment row is `(id, pos, segment)`; every shuffle
  * below keys on an 8-byte segment hash, not the segment text, so the
  * corpus text itself crosses the wire at most once (inside the per-doc
  * reassembly agg, which shuffles each kept segment exactly once). No
  * driver-side collection anywhere.
  */
object Segments {

  /** Explode a text column into trimmed, non-empty segments with their
    * 0-based position: `(idCol, pos, seg)`. Documents whose text is null
    * or contains no non-empty segment produce no rows (the reassembly
    * operators below restore them with empty output via a left join).
    */
  def segments(df: DataFrame, textCol: String, idCol: String, delim: String): DataFrame =
    df.select(col(idCol), posexplode(split(col(textCol), delim)).as(Seq("pos", "seg")))
      .withColumn("seg", trim(col("seg")))
      .filter(col("seg") =!= "")

  /** Rebuild one text value per id from kept segments: positions order the
    * join, dropped segments are `null` structs that `collect_list` skips. */
  private def reassemble(keepFlag: Column, joinSep: String): Column =
    array_join(
      transform(
        array_sort(collect_list(when(keepFlag, struct(col("pos"), col("seg"))))),
        s => s.getField("seg")),
      joinSep)

  /** Paragraph-level exact dedup: keep only the globally-first occurrence
    * of each distinct segment (first = lowest `(idCol, pos)`), rebuild
    * every document from its kept segments in original order. Repeats
    * within one document count as duplicates too.
    *
    * The keep-first window partitions on `xxhash64(segment)` so the
    * shuffle key is 8 bytes regardless of paragraph length; as with
    * [[Dedup.exact]], a hash collision (~1e-3 expected pairs at 2x10^8
    * segments, ~3 at 10^10 — birthday bound C(n,2)/2^64) can merge two
    * distinct paragraphs — acceptable for corpus
    * cleanup, and the price of never shuffling the corpus on text keys.
    *
    * Returns `(idCol, textCol, n_segments, n_kept)`; input rows with no
    * segments survive with empty text and zero counts.
    */
  def segmentDedup(
      df: DataFrame,
      textCol: String,
      idCol: String,
      delim: String = "\\n{2,}",
      joinSep: String = "\n\n"
  ): MayFail[DataFrame] = MayFail {
    val segs = segments(df, textCol, idCol, delim)
    val w = Window.partitionBy(xxhash64(col("seg"))).orderBy(col(idCol), col("pos"))
    val marked = segs.withColumn("__first", row_number().over(w) === 1)
    val agg = marked.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_segments"),
      count(when(col("__first"), 1)).as("n_kept"),
      reassemble(col("__first"), joinSep).as("__txt"))
    df.select(col(idCol)).join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__txt"), lit("")).as(textCol),
        coalesce(col("n_segments"), lit(0L)).as("n_segments"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }

  /** ExactSubstr-style duplicated-span removal, adapted to token windows
    * (Lee et al., "Deduplicating Training Data Makes Language Models
    * Better" §4.1: remove every repeated occurrence of a long enough
    * substring; the canonical single-node implementation is a suffix
    * array, which does not distribute — this is the Spark-native
    * reformulation over rolling n-token gram hashes).
    *
    * Any `n`-token span whose lowercased form occurs more than once in
    * the corpus is removed from every occurrence except the globally
    * first (lowest `(idCol, pos)`). A duplicated region longer than `n`
    * yields overlapping duplicated grams whose drop positions union
    * naturally, so the whole region disappears from non-first documents.
    *
    * Scale posture: gram hashing is one native pass per document
    * ([[graft.functions.TextFunctions.wordShingleHashes]]); the duplicate
    * search shuffles slim `(id, pos, 8-byte hash)` rows — never text;
    * drop-position expansion is bounded by `n x duplicated spans`; the
    * rebuild joins per-affected-doc drop arrays back to the corpus (AQE
    * broadcasts the drops side when the affected set is small) and
    * filters tokens with a native merge walk
    * ([[graft.functions.SpanImpl.keepExcept]]), O(tokens + drops) per
    * document. A 64-bit gram-hash collision can fuse two distinct spans
    * (~1e-3 expected pairs at 2x10^8 spans, ~3 at 10^10) — same trade
    * as [[segmentDedup]].
    *
    * Returns `(idCol, textCol, n_tokens, n_dropped)`. The text is rebuilt
    * with single spaces between surviving tokens (original inter-token
    * whitespace is not preserved); null text behaves as empty.
    */
  def spanDedup(
      df: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 20,
      seed: Long = 42L
  ): MayFail[DataFrame] = MayFail {
    require(n >= 2, s"spanDedup: n must be >= 2 (got $n) — 1-token spans would drop every repeated word")
    val toks = tokensAndGrams(df, textCol, idCol, n, seed)
    val spans = toks.select(col(idCol), posexplode(col("__grams")).as(Seq("__pos", "__h")))
    val dups = spans
      .groupBy(col("__h"))
      .agg(min(struct(col(idCol), col("__pos"))).as("__keeper"), count(lit(1)).as("__c"))
      .filter(col("__c") > 1)
      .select(col("__h"), col("__keeper"))
    val removals = spans
      .join(dups, "__h")
      .filter(struct(col(idCol), col("__pos")) =!= col("__keeper"))
    val drops = dropArrays(removals, idCol, n)
    rebuildMinusDrops(toks, drops, textCol, idCol)
  }

  /** `(idCol, __toks, __grams)`: case-preserving whitespace tokens plus
    * positional lowercased gram hashes. The explicit `[ \t\n\r\f]` class
    * (NOT `\s`) keeps token POSITIONS aligned with the native gram
    * hasher's tokenizer (`TextHashImpl.tokenHashes`) — Java's `\s`
    * additionally matches `\x0B`, which would shift every later position
    * by one. Single source of truth for both span operators. */
  private def tokensAndGrams(
      df: DataFrame, textCol: String, idCol: String, n: Int, seed: Long): DataFrame = {
    val txt = coalesce(col(textCol), lit(""))
    df.select(
      col(idCol),
      filter(split(txt, "[ \\t\\n\\r\\f]+"), t => t =!= "").as("__toks"),
      graft.functions.TextFunctions.wordShingleHashes(txt, n, seed).as("__grams"))
  }

  /** Expand removed span starts `(idCol, __pos)` to sorted per-doc drop
    * position arrays (bounded by n x removed spans). */
  private def dropArrays(removals: DataFrame, idCol: String, n: Int): DataFrame =
    removals
      .select(col(idCol), explode(sequence(col("__pos"), col("__pos") + lit(n - 1))).as("__tp"))
      .groupBy(col(idCol))
      .agg(sort_array(collect_set(col("__tp"))).as("__drops"))

  /** Rebuild text per doc minus the drop positions (native merge walk);
    * unaffected docs pass through via the left join. */
  private def rebuildMinusDrops(
      toks: DataFrame, drops: DataFrame, textCol: String, idCol: String): DataFrame =
    toks.join(drops, Seq(idCol), "left")
      .select(
        col(idCol),
        concat_ws(" ",
          graft.functions.TextFunctions.keepTokensExcept(
            col("__toks"),
            coalesce(col("__drops"), lit(Array.empty[Int])))).as(textCol),
        size(col("__toks")).cast("long").as("n_tokens"),
        coalesce(size(col("__drops")), lit(0)).cast("long").as("n_dropped"))

  /** Span-level benchmark decontamination: excise every `n`-token span a
    * corpus document shares with the benchmark set, instead of dropping
    * (or merely flagging, per [[graft.operators.Dedup.contaminationFlags]])
    * the whole document — the surgical variant for docs that embed an
    * eval item inside otherwise-good text.
    *
    * Scale posture: the benchmark's distinct gram hashes BROADCAST (eval
    * sets are small), so contaminated positions are found map-side with
    * NO shuffle of the corpus; only the slim per-affected-doc drop
    * positions aggregate (keyed by id), and the rebuild is the same
    * native merge walk as [[spanDedup]]. Returns
    * `(idCol, textCol, n_tokens, n_dropped)`, text rebuilt with single
    * spaces; null text behaves as empty.
    */
  def decontaminateSpans(
      df: DataFrame,
      benchmark: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 8,
      seed: Long = 42L,
      benchTextCol: String = ""
  ): MayFail[DataFrame] = MayFail {
    require(n >= 2, s"decontaminateSpans: n must be >= 2 (got $n)")
    val bCol = if (benchTextCol.nonEmpty) benchTextCol else textCol
    val toks = tokensAndGrams(df, textCol, idCol, n, seed)
    val bench = benchmark
      .select(explode(array_distinct(
        graft.functions.TextFunctions.wordShingleHashes(
          coalesce(col(bCol), lit("")), n, seed))).as("__h"))
      .distinct()
    val removals = toks
      .select(col(idCol), posexplode(col("__grams")).as(Seq("__pos", "__h")))
      .join(broadcast(bench), Seq("__h"))
    rebuildMinusDrops(toks, dropArrays(removals, idCol, n), textCol, idCol)
  }

  /** Overlapping fixed-token chunks per document (the RAG / pretraining
    * chunker): windows of `chunkTokens` whitespace tokens starting every
    * `stride` tokens. The chunk count per doc is
    * `1 + ceil((n − chunkTokens) / stride)` (one chunk when
    * `n ≤ chunkTokens`), which covers every token with no redundant
    * all-overlap tail window. `stride ≤ chunkTokens` is required — a
    * larger stride would leave token gaps and, at the tail, empty
    * chunks. Docs with no tokens produce no rows (join back on the id
    * spine to keep them).
    *
    * Pure per-row compute: tokenize once, one `transform(sequence)` +
    * explode — no shuffle at all, the ideal 100 TB shape. Returns
    * `(idCol, chunk_id, n_tokens, text_chunk)` with `chunk_id` 0-based
    * in document order and `text_chunk` space-joined.
    */
  def chunk(
      df: DataFrame,
      textCol: String,
      idCol: String,
      chunkTokens: Int = 512,
      stride: Int = 256
  ): MayFail[DataFrame] = MayFail {
    require(chunkTokens >= 1, s"chunkTokens must be >= 1: $chunkTokens")
    require(stride >= 1 && stride <= chunkTokens,
      s"stride must be in [1, chunkTokens]: $stride (chunkTokens = $chunkTokens) — " +
        "a larger stride would skip tokens")
    val toks = filter(
      split(coalesce(col(textCol), lit("")), "[ \\t\\n\\r\\f]+"), t => t =!= "")
    val n = size(col("__toks"))
    val nChunks = when(n <= chunkTokens, lit(1))
      .otherwise(floor((n - chunkTokens + stride - 1).cast("double") / stride).cast("int") + 1)
    df.select(col(idCol), toks.as("__toks"))
      .filter(size(col("__toks")) > 0)
      .select(col(idCol),
        explode(transform(sequence(lit(0), nChunks - 1), i =>
          struct(i.as("chunk_id"),
            slice(col("__toks"), i * stride + 1, lit(chunkTokens)).as("__ct")))).as("__c"))
      .select(col(idCol),
        col("__c.chunk_id").cast("long").as("chunk_id"),
        size(col("__c.__ct")).cast("long").as("n_tokens"),
        concat_ws(" ", col("__c.__ct")).as("text_chunk"))
  }

  /** Cross-document boilerplate segments: normalized segments (lowercased,
    * whitespace-collapsed) that occur in at least `minDocs` distinct
    * documents. Returns `(segment, n_docs)`.
    *
    * Two hash-keyed aggregations, both with map-side partial combine: the
    * first dedups `(segment-hash, id)` pairs (16-byte shuffle rows, one
    * representative segment string carried via partial `min`), the second
    * counts distinct documents per hash. The standard single-pass
    * `groupBy(segment).agg(countDistinct(id))` would shuffle the full
    * segment text under an Expand; this shape never does.
    */
  def boilerplate(
      df: DataFrame,
      textCol: String,
      idCol: String,
      delim: String = "\\n",
      minDocs: Long = 10L
  ): MayFail[DataFrame] = MayFail {
    require(minDocs >= 2, s"minDocs must be >= 2 (got $minDocs): a segment in one document is content, not boilerplate")
    val norm = segments(df, textCol, idCol, delim)
      .select(normalizeText(col("seg")).as("segment"), col(idCol).as("__id"))
    val perDoc = norm
      .groupBy(xxhash64(col("segment")).as("__h"), col("__id"))
      .agg(min(col("segment")).as("segment"))
    perDoc.groupBy(col("__h"))
      .agg(count(lit(1)).as("n_docs"), min(col("segment")).as("segment"))
      .filter(col("n_docs") >= minDocs)
      .select(col("segment"), col("n_docs"))
  }

  /** Remove boilerplate segments (per [[boilerplate]], matched on the
    * normalized form) from every document, preserving the raw form and
    * order of the surviving segments.
    *
    * The boilerplate set is broadcast as 8-byte hashes: by construction it
    * holds at most `totalSegments / minDocs` entries, and each entry is
    * one long — a corpus with 10^12 segments and `minDocs = 100` caps the
    * broadcast at ~80 GB worst-case but in practice boilerplate sets are
    * thousands of entries; raise `minDocs` if the detected set is huge.
    *
    * Returns `(idCol, textCol, n_segments, n_kept, n_removed)`.
    */
  def stripBoilerplate(
      df: DataFrame,
      textCol: String,
      idCol: String,
      delim: String = "\\n",
      joinSep: String = "\n",
      minDocs: Long = 10L
  ): MayFail[DataFrame] =
    boilerplate(df, textCol, idCol, delim, minDocs).map { bp =>
      val bpKeys = broadcast(bp.select(xxhash64(col("segment")).as("__bh")).distinct())
      val flagged = segments(df, textCol, idCol, delim)
        .join(bpKeys, xxhash64(normalizeText(col("seg"))) === col("__bh"), "left")
        .withColumn("__keep", col("__bh").isNull)
      val agg = flagged.groupBy(col(idCol)).agg(
        count(lit(1)).as("n_segments"),
        count(when(col("__keep"), 1)).as("n_kept"),
        reassemble(col("__keep"), joinSep).as("__txt"))
      df.select(col(idCol)).join(agg, Seq(idCol), "left")
        .select(col(idCol),
          coalesce(col("__txt"), lit("")).as(textCol),
          coalesce(col("n_segments"), lit(0L)).as("n_segments"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          (coalesce(col("n_segments"), lit(0L)) - coalesce(col("n_kept"), lit(0L))).as("n_removed"))
    }

  /** C4 cleanup rules (Raffel et al. 2020, arXiv:1910.10683 §2.2) — the
    * line- and document-level web-text filters: a line survives when it
    * ends in a terminal punctuation mark (`.` `!` `?` `"`), has at least
    * `minLineWords` words, and does not mention "javascript"; a document
    * survives when it retains at least `minLines` lines and contains
    * neither "lorem ipsum" nor a curly brace. (The paper's remaining
    * passes — bad-word list, three-sentence-span dedup — are the
    * [[graft.operators.Quality.expect]] and [[spanDedup]] operators.)
    *
    * Returns `(idCol, clean_text, n_lines_kept, kept)` — one row per
    * input document, `clean_text` rebuilt from the surviving lines (""
    * when none survive). `kept` is the document verdict; emitting the
    * flag instead of filtering keeps rejection reasons inspectable.
    *
    * Scale: pure per-row column expressions — no shuffle, no UDF; filters
    * push down around it. */
  def c4Clean(
      df: DataFrame,
      textCol: String,
      idCol: String,
      minLineWords: Int = 5,
      minLines: Int = 3
  ): MayFail[DataFrame] = MayFail {
    require(minLineWords >= 1, s"minLineWords must be >= 1: $minLineWords")
    require(minLines >= 1, s"minLines must be >= 1: $minLines")
    val keptLines = filter(split(coalesce(col(textCol), lit("")), "\n"), l => {
      val r = rtrim(l)
      val words = filter(split(trim(l), "[ \\t\\r\\f]+"), w => w =!= "")
      (r.endsWith(".") || r.endsWith("!") || r.endsWith("?") ||
        r.endsWith("\"")) &&
        size(words) >= minLineWords &&
        !lower(l).contains("javascript")
    })
    df.select(col(idCol), keptLines.as("__kl"),
        (!lower(col(textCol)).contains("lorem ipsum") &&
          !col(textCol).contains("{")).as("__doc_ok"))
      .select(col(idCol),
        array_join(col("__kl"), "\n").as("clean_text"),
        size(col("__kl")).cast("long").as("n_lines_kept"),
        (size(col("__kl")) >= minLines && col("__doc_ok")).as("kept"))
  }
}
