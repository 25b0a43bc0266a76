package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functional.MayFail

/** Content-defined chunking — the storage-level dedup verb of crawl
  * pipelines (LBFS, Muthitacharoen et al. SOSP'01; FastCDC, Xia et
  * al. USENIX ATC'16): cut each document at positions chosen by its
  * own CONTENT, so an insertion or deletion shifts only the chunks it
  * touches and every other chunk re-hashes identically — unlike
  * fixed-size blocks, where one shifted byte changes every downstream
  * block hash. Chunk-hash dedup across crawl snapshots then stores
  * each repeated span once ([[Dedup.winnowFingerprints]] DETECTS
  * overlap; this operator produces the content-addressed chunks
  * themselves).
  *
  * The boundary rule is deterministic and engine-portable (the
  * [[Dedup.winnowFingerprints]] md5-kernel idiom): position `p` is a
  * CANDIDATE when the portable 60-bit hash of the `window`-byte span
  * ending at `p` has its low `bits` bits all zero — expected chunk
  * length 2^bits, content-defined because the test consults only a
  * sliding window. Two documented post-passes make chunking
  * well-defined without a sequential scan of the corpus:
  * (1) GREEDY-MIN — candidates closer than `minLen` to the last
  * ACCEPTED boundary are dropped, a per-document fold over the
  * (boundary-count-sized) candidate list; (2) MAX-SPLIT — any
  * accepted gap longer than `maxLen` is split at fixed `maxLen`
  * strides. (This is the LBFS min/max discipline; FastCDC's
  * normalized-gear variant folds max into the scan itself — cited
  * for lineage, not replicated bit-for-bit.)
  *
  * Scale: the ENTIRE pipeline is one per-row column expression plus
  * a posexplode — no groupBy, no window, no shuffle anywhere, so
  * chunking runs map-side at any corpus size and the same kernel
  * rides streaming frames. md5 per window position is the winnowing
  * cost model; go native Expression if it ever dominates a profile.
  * Documents shorter than `window` get no candidates and emit as a
  * single chunk (split only by `maxLen`).
  */
object Cdc {

  private def hash60(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** The whole per-document chunking as ONE column expression over
    * `(text, len)` — candidates, greedy-min fold, max-stride split —
    * so chunking is SHUFFLE-FREE (a pure projection + one
    * posexplode): no groupBy, no window, no checkpoint. That is both
    * the 100 TB plan (map-side only, whole-stage codegen) and what
    * lets the identical kernel ride a STREAMING frame
    * ([[graft.streaming.Stream.cdcNovelChunks]]). Documents are
    * bounded (corpus contract: segment multi-MB blobs first), so the
    * per-row arrays stay small. */
  private[operators] def chunkStructs(
      s: org.apache.spark.sql.Column,
      len: org.apache.spark.sql.Column,
      bits: Int, window: Int, minLen: Int, maxLen: Int) = {
    val mask = (1L << bits) - 1
    // candidates: low `bits` of the window hash all zero; p < len so
    // every boundary leaves >= 1 char. `len <= window` has no valid p
    // (and sequence(w, w-1) would DESCEND and fabricate one).
    val cands = when(len > window,
      filter(sequence(lit(window.toLong), len - 1), p =>
        hash60(s.substr((p - window + 1).cast("int"), lit(window)))
          .bitwiseAND(lit(mask)) === 0L))
      .otherwise(array().cast("array<bigint>"))
    val acc = aggregate(cands, array(lit(0L)),
      (a, x) => when(x - element_at(a, -1) >= minLen,
        concat(a, array(x))).otherwise(a))
    val bounds = concat(acc, array(len))
    flatten(transform(sequence(lit(1), size(acc)), i => {
      val lo = element_at(bounds, i)
      val hi = element_at(bounds, i + 1)
      transform(sequence(lo, hi - 1, lit(maxLen.toLong)), cs =>
        struct((cs + 1).as("start"),
          least(lit(maxLen.toLong), hi - cs).as("chunk_len")))
    }))
  }

  /** Content-defined chunks: `(idCol, chunk_idx, start, chunk_len,
    * chunk_md5)` — `start` 1-based, `chunk_md5` the md5 of the chunk
    * text (the content address used for cross-snapshot dedup). */
  def chunks(
      df: DataFrame,
      textCol: String,
      idCol: String,
      bits: Int = 5,
      window: Int = 8,
      minLen: Int = 16,
      maxLen: Int = 96
  ): MayFail[DataFrame] = MayFail {
    require(bits >= 1 && bits <= 20, s"bits must be in [1, 20]: $bits")
    require(window >= 2, s"window must be >= 2: $window")
    require(minLen >= 1, s"minLen must be >= 1: $minLen")
    require(maxLen >= minLen,
      s"maxLen ($maxLen) must be >= minLen ($minLen)")
    df.filter(col(textCol).isNotNull && length(col(textCol)) >= 1)
      .select(col(idCol).as("id"), col(textCol).as("__s"),
        length(col(textCol)).cast("long").as("__len"))
      .select(col("id"), col("__s"),
        posexplode(chunkStructs(col("__s"), col("__len"),
          bits, window, minLen, maxLen)).as(Seq("__pos", "__c")))
      .select(col("id").as(idCol),
        (col("__pos") + 1).cast("long").as("chunk_idx"),
        col("__c.start").as("start"),
        col("__c.chunk_len").as("chunk_len"),
        md5(col("__s").substr(col("__c.start").cast("int"),
          col("__c.chunk_len").cast("int"))).as("chunk_md5"))
  }

  /** Cross-corpus chunk dedup report: every chunk content (by md5)
    * appearing in `>= minDocs` distinct documents, with its document
    * count, total occurrences and per-copy byte volume — the "what
    * would content-addressed storage save" answer. */
  def dedupReport(
      df: DataFrame,
      textCol: String,
      idCol: String,
      bits: Int = 5,
      window: Int = 8,
      minLen: Int = 16,
      maxLen: Int = 96,
      minDocs: Int = 2
  ): MayFail[DataFrame] = MayFail {
    require(minDocs >= 2, s"minDocs must be >= 2: $minDocs")
    chunks(df, textCol, idCol, bits, window, minLen, maxLen).get
      .groupBy("chunk_md5")
      .agg(count_distinct(col(idCol)).as("n_docs"),
        count(lit(1)).as("n_copies"),
        max(col("chunk_len")).as("chunk_len"))
      .filter(col("n_docs") >= minDocs)
  }
}
