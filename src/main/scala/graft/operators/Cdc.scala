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
  * Scale: one explode to `len` window positions per document (md5
  * per position — the winnowing cost model; go native Expression if
  * this ever dominates a profile), one vocabulary... rather
  * boundary-sized fold per document, no shuffles beyond the final
  * group. Documents shorter than `window` get no candidates and
  * emit as a single chunk (split only by `maxLen`).
  */
object Cdc {

  private def hash60(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

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
    val mask = (1L << bits) - 1
    val base = df
      .filter(col(textCol).isNotNull && length(col(textCol)) >= 1)
      .select(col(idCol).as("id"), col(textCol).as("__s"),
        length(col(textCol)).cast("long").as("__len"))
      .localCheckpoint()
    // candidate boundaries: low `bits` of the window hash all zero.
    // A boundary after position p means "chunk ends at p" — p itself
    // must leave >= 1 char, so p < len. Docs shorter than `window`
    // produce no rows here (sequence would descend — filtered first).
    val cands = base
      .filter(col("__len") > window) // == window has no valid p, and
      // sequence(w, w-1) would DESCEND in Spark and fabricate one
      .select(col("id"),
        explode(sequence(lit(window.toLong), col("__len") - 1)).as("p"),
        col("__s"))
      .filter(hash60(col("__s").substr((col("p") - window + 1).cast("int"),
        lit(window))).bitwiseAND(lit(mask)) === 0L)
      .groupBy("id").agg(sort_array(collect_list(col("p"))).as("__cands"))
    // greedy-min fold (accepted list seeded with 0 = document start),
    // then append the document end and split oversized gaps at fixed
    // maxLen strides
    val accepted = base
      .join(cands, Seq("id"), "left")
      .withColumn("__acc", aggregate(
        coalesce(col("__cands"), array().cast("array<bigint>")),
        array(lit(0L)),
        (acc, x) => when(x - element_at(acc, -1) >= minLen,
          concat(acc, array(x))).otherwise(acc)))
      .withColumn("__bounds", concat(col("__acc"), array(col("__len"))))
    accepted
      .select(col("id"), col("__s"),
        explode(transform(sequence(lit(1), size(col("__acc"))),
          i => struct(element_at(col("__bounds"), i).as("lo"),
            element_at(col("__bounds"), i + 1).as("hi")))).as("__g"))
      .filter(col("__g.hi") > col("__g.lo")) // trailing candidate == len
      .select(col("id"), col("__s"), col("__g.hi").as("hi"),
        explode(sequence(col("__g.lo"), col("__g.hi") - 1,
          lit(maxLen.toLong))).as("cstart"))
      .withColumn("chunk_len",
        least(lit(maxLen.toLong), col("hi") - col("cstart")))
      .withColumn("start", col("cstart") + 1)
      .withColumn("chunk_md5",
        md5(col("__s").substr(col("start").cast("int"),
          col("chunk_len").cast("int"))))
      .withColumn("chunk_idx", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("id")
          .orderBy("start")).cast("long"))
      .select(col("id").as(idCol), col("chunk_idx"), col("start"),
        col("chunk_len"), col("chunk_md5"))
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
