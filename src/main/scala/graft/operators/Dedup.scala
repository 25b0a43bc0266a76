package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functional.MayFail
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._

/** Deduplication operators for training-data pipelines.
  *
  * Design for 100 TB: every variant is a pure DataFrame plan — candidate
  * generation via hash/LSH bucketing (shuffle on the bucket key only, never
  * an all-pairs cross join), verification only within buckets, and a
  * bucket-size cap so a degenerate key (boilerplate documents) cannot
  * produce a quadratic bucket. No driver-side collection anywhere.
  */
object Dedup {

  /** Exact dedup: keep the lowest-`idCol` row per duplicate group, where
    * the group key is the 64-bit fingerprint of the listed columns.
    *
    * Hashing first means the shuffle key is 8 bytes instead of the full
    * document text — at 100 TB that is the difference between shuffling
    * ids+hashes and shuffling the corpus. (xxhash64 collisions at ~10^10
    * docs are ~1e-3 expected pairs — acceptable for corpus dedup; use
    * [[exactStrict]] when cryptographic certainty is required.)
    */
  def exact(df: DataFrame, cols: Seq[String], idCol: String): MayFail[DataFrame] =
    MayFail {
      // xxhash64 skips null children (the running hash is unchanged), so
      // ("a", null) and (null, "a") would hash identically; appending a
      // null-position bitmap disambiguates.
      val nullBitmap = concat_ws("", cols.map(c => col(c).isNull.cast("int")): _*)
      val key = xxhash64(cols.map(col) :+ nullBitmap: _*)
      val rn = s"__rn_${java.util.UUID.randomUUID.toString.take(8)}"
      val w = Window.partitionBy(key).orderBy(col(idCol))
      df.withColumn(rn, row_number().over(w))
        .filter(col(rn) === 1)
        .drop(rn)
    }

  /** Exact dedup grouping on the full column values (no hash collisions). */
  def exactStrict(df: DataFrame, cols: Seq[String], idCol: String): MayFail[DataFrame] =
    MayFail {
      val rn = s"__rn_${java.util.UUID.randomUUID.toString.take(8)}"
      val w = Window.partitionBy(cols.map(col): _*).orderBy(col(idCol))
      df.withColumn(rn, row_number().over(w))
        .filter(col(rn) === 1)
        .drop(rn)
    }

  /** Exact dedup keeping the BEST row per duplicate group — highest
    * `priorityCol` (nulls last), min-`idCol` tiebreak — instead of the
    * min-id policy. Real dedup usually wants the cleanest/longest copy
    * of a duplicated page, not whichever crawl got the smaller id:
    * pass a quality score, a token count, or a recency stamp as the
    * priority. Groups on the full column values ([[exactStrict]]'s
    * no-collision semantics); same single-window plan shape. */
  def exactKeepBest(
      df: DataFrame,
      cols: Seq[String],
      idCol: String,
      priorityCol: String): MayFail[DataFrame] = MayFail {
    val rn = s"__rn_${java.util.UUID.randomUUID.toString.take(8)}"
    val w = Window.partitionBy(cols.map(col): _*)
      .orderBy(col(priorityCol).desc_nulls_last, col(idCol))
    df.withColumn(rn, row_number().over(w))
      .filter(col(rn) === 1)
      .drop(rn)
  }

  /** URL-canonical dedup — keep ONE row per canonical URL
    * ([[graft.functions.TextFunctions.canonicalizeUrl]]'s rule chain:
    * fragment/default-port/tracking-param/case variants of the same
    * page collapse), lowest `idCol` wins (rows with a NULL url are all
    * kept — no URL is not a duplicate of no URL). The crawl-ingest
    * companion to [[exact]]: dedup BY ADDRESS before any content pass.
    * Adds the `canonical_url` column.
    *
    * Plan: one codegen'd per-row canonicalization + [[exact]]'s
    * single rank window on the canonical key — one shuffle. */
  def urlDedup(
      df: DataFrame,
      urlCol: String,
      idCol: String): MayFail[DataFrame] = MayFail {
    import graft.functions.TextFunctions.canonicalizeUrl
    val withKey = df.withColumn("canonical_url", canonicalizeUrl(col(urlCol)))
    val rn = s"__rn_${java.util.UUID.randomUUID.toString.take(8)}"
    val w = Window.partitionBy(col("canonical_url")).orderBy(col(idCol))
    val dupes = withKey.filter(col("canonical_url").isNotNull)
      .withColumn(rn, row_number().over(w))
      .filter(col(rn) === 1)
      .drop(rn)
    dupes.unionByName(withKey.filter(col("canonical_url").isNull))
  }

  /** Normalized-text exact dedup (case/whitespace-insensitive).
    *
    * `unicodeForm` (e.g. `Some("NFC")`) additionally unicode-normalizes
    * before fingerprinting, so precomposed "é" and "e"+combining-acute —
    * byte-different, visually identical — share a dedup key. Off by
    * default (byte-compat with the historical key); NFC costs one
    * codegen'd scan with an allocation-free already-normalized fast
    * path, so turning it on is nearly free on mostly-ASCII corpora. */
  def exactNormalized(
      df: DataFrame,
      textCol: String,
      idCol: String,
      unicodeForm: Option[String] = None): MayFail[DataFrame] =
    MayFail {
      val rn = s"__rn_${java.util.UUID.randomUUID.toString.take(8)}"
      val keyed = unicodeForm.fold(col(textCol))(f =>
        graft.functions.TextFunctions.unicodeNormalize(col(textCol), f))
      val w = Window.partitionBy(fingerprint(keyed)).orderBy(col(idCol))
      df.withColumn(rn, row_number().over(w))
        .filter(col(rn) === 1)
        .drop(rn)
    }

  /** Candidate near-duplicate pairs via MinHash + LSH banding, verified
    * with exact n-gram Jaccard within buckets.
    *
    * Pipeline (all distributed, one shuffle per stage):
    *   shingle → minhash signature (k = bands·rowsPerBand affine perms over
    *   one base hash) → per-band bucket key → explode bands → self-join on
    *   (band, bucket) with `idA < idB` → distinct pairs → exact Jaccard on
    *   distinct shingle sets → filter ≥ threshold.
    *
    * `maxBucket` drops pathological buckets (boilerplate/empty docs) before
    * the pair join — the standard guard against quadratic blowup at scale.
    *
    * Returns `(idA, idB, jaccard)`.
    */
  def minhashPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleSize: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      threshold: Double = 0.7,
      maxBucket: Int = 1000,
      materialize: Boolean = false
  ): MayFail[DataFrame] = MayFail {
    val shRaw = minhashShingled(df, textCol, idCol, shingleSize)
    // The shingled frame feeds FOUR plan positions (banding agg + probe
    // under the bucket cap, then the two verification join-backs), so its
    // kernel re-evaluates up to 4× per run when lazy. `materialize = true`
    // pins the slim (id, shingle-hashes) frame for ONE evaluation, eagerly
    // checkpoints the (small) pair list, and releases the pin before
    // returning — same single-decode contract as the Multimodal pair ops.
    val sh =
      if (materialize)
        shRaw.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else shRaw
    // Slim banding: only (id, band, bucket) — 24-byte rows — flows through
    // the explode/shuffle/self-join; the shingle-hash arrays are joined
    // back ONLY for surviving candidate pairs. Banding the payload itself
    // would shuffle every document `bands` times.
    val banded = candidateBands(
      minhashKeyed(sh, bands, rowsPerBand), maxBucket)
    val pairs = verifiedPairs(banded, sh.withColumnRenamed("shingles", "__p"),
      "jaccard", jaccardHashes, _ >= threshold, roundDigits = Some(6))
    if (materialize) { val out = pairs.localCheckpoint(true); sh.unpersist(); out }
    else pairs
  }

  /** Shingle HASHES, not shingle strings — minhash and Jaccard only need
    * a stable hash per shingle, so the whole path is array<long>. Docs
    * below the shingle size have EMPTY hash arrays — identical
    * (all-MaxValue) minhash signatures would funnel them into one
    * degenerate bucket per band, verified and discarded at pure cost —
    * so they are dropped here. */
  private[graft] def minhashShingled(df: DataFrame, textCol: String, idCol: String,
                              shingleSize: Int): DataFrame =
    df.select(
        col(idCol).as("id"),
        wordShingleHashes(col(textCol), shingleSize).as("shingles"))
      .filter(size(col("shingles")) > 0)

  /** `(id, __keys)` banding keys from a [[minhashShingled]] frame — ONE
    * definition so the pair generators and the cap reports band
    * identically. */
  private[graft] def minhashKeyed(sh: DataFrame, bands: Int, rowsPerBand: Int): DataFrame =
    sh.select(col("id"),
      minhashBandKeysFromHashes(col("shingles"), bands, rowsPerBand).as("__keys"))

  /** Explode per-doc band keys, drop oversized/singleton buckets.
    * Input: (id, __keys: array<long>); output: (id, band, bucket).
    * The cap is the skew-robust [[Banding.capBuckets]] (partial-agg
    * count + join-back — no single task ever holds a hot bucket).
    *
    * NB: `InferFiltersFromGenerate` clones the `__keys` expression into a
    * size/null pre-filter under the explode, so an expensive key kernel
    * evaluates ~2× per row (codegen CSE merges the filter's two copies).
    * [[graft.functions.BandKeysFromSimhash]] keeps the per-band fan-out
    * from multiplying that further; pipelines that rescan a corpus many
    * times should snapshot `(id, sh)` once (Optimise.snapshot) — the same
    * recommendation as TfIdf postings. */
  private def candidateBands(keyed: DataFrame, maxBucket: Int): DataFrame = {
    val banded = keyed
      .select(col("id"), posexplode(col("__keys")).as(Seq("band", "bucket")))
    Banding.capBuckets(banded, Seq("band", "bucket"), maxBucket, minOccupancy = 2)
  }

  /** Distinct (idA < idB) pairs sharing any (band, bucket). */
  private def bandedPairs(banded: DataFrame): DataFrame =
    banded.select(col("band"), col("bucket"), col("id").as("idA"))
      .join(banded.select(col("band"), col("bucket"), col("id").as("idB")),
        Seq("band", "bucket"))
      .filter(col("idA") < col("idB"))
      .select("idA", "idB")
      .dropDuplicates("idA", "idB")

  /** Join candidate `(idA, idB)` pairs back to their payloads
    * (`keyed`: (id, __p)), score, filter, optionally round — the ONE
    * verification tail every LSH pair generator (one-shot AND
    * incremental) shares, so a change to the rounding/canonicalization
    * rule can never diverge between the paths the q399/q400
    * incremental laws compare. */
  private def scoredPairs(
      cand: DataFrame,
      keyed: DataFrame,
      scoreName: String,
      score: (Column, Column) => Column,
      keep: Column => Column,
      roundDigits: Option[Int]): DataFrame = {
    val scored = cand
      .join(keyed.select(col("id").as("idA"), col("__p").as("__pA")), "idA")
      .join(keyed.select(col("id").as("idB"), col("__p").as("__pB")), "idB")
      .withColumn(scoreName, score(col("__pA"), col("__pB")))
      .filter(keep(col(scoreName)))
    val out = roundDigits.fold(col(scoreName))(d => round(col(scoreName), d))
    scored.select(col("idA"), col("idB"), out.as(scoreName))
  }

  /** [[scoredPairs]] over the within-corpus banded candidates. */
  private def verifiedPairs(
      banded: DataFrame,
      keyed: DataFrame,
      scoreName: String,
      score: (Column, Column) => Column,
      keep: Column => Column,
      roundDigits: Option[Int]): DataFrame =
    scoredPairs(bandedPairs(banded), keyed, scoreName, score, keep,
      roundDigits)

  /** Candidate `(idA < idB)` pairs of an index∪batch union frame
    * `(id, __new, band_keys)` where at least ONE side is new — the
    * shared banding core of [[minhashPairsIncremental]] and
    * [[embeddingPairsIncremental]]: same `capBuckets` semantics as the
    * one-shot generators (minOccupancy 2), `__new` filtered AFTER the
    * bucket join so the cap sees the union exactly as a one-shot run
    * of the grown corpus would. */
  private def incrementalCandidates(
      all: DataFrame,
      maxBucket: Int): DataFrame = {
    val banded = Banding.capBuckets(
      all.select(col("id"), col("__new"),
        posexplode(col("band_keys")).as(Seq("band", "bucket"))),
      Seq("band", "bucket"), maxBucket, minOccupancy = 2)
    banded
      .select(col("band"), col("bucket"), col("id").as("idA"),
        col("__new").as("__nA"))
      .join(banded.select(col("band"), col("bucket"), col("id").as("idB"),
        col("__new").as("__nB")), Seq("band", "bucket"))
      .filter(col("idA") < col("idB"))
      .filter(col("__nA") || col("__nB"))
      .select("idA", "idB")
      .dropDuplicates("idA", "idB")
  }

  /** [[minhashPairs]] with the banding CHOSEN by [[lshPlan]] instead of
    * hand-tuned: give the target `threshold` and a signature budget
    * `nHashes`, and the S-curve planner picks `bands × rowsPerBand` —
    * the same auto-sizing move as the embedding dedup's
    * occupancy-targeted signatures. Recall-first (the implied threshold
    * sits at or below the target), so near-threshold pairs stay
    * candidates; the exact-Jaccard verification then filters precisely
    * at `threshold`. Prefer this at scale: a hand-tuned banding that was
    * right for one corpus silently loses recall when the threshold
    * moves. */
  def minhashPairsAuto(
      df: DataFrame,
      textCol: String,
      idCol: String,
      threshold: Double,
      shingleSize: Int = 3,
      nHashes: Int = 64,
      maxBucket: Int = 1000
  ): MayFail[DataFrame] = {
    val plan = lshPlan(threshold, nHashes)
    minhashPairs(df, textCol, idCol, shingleSize, plan.bands, plan.rowsPerBand,
      threshold, maxBucket)
  }

  /** [[minhashDedup]] with [[lshPlan]]-chosen banding (see
    * [[minhashPairsAuto]]). */
  def minhashDedupAuto(
      df: DataFrame,
      textCol: String,
      idCol: String,
      threshold: Double,
      shingleSize: Int = 3,
      nHashes: Int = 64
  ): MayFail[DataFrame] = {
    val plan = lshPlan(threshold, nHashes)
    minhashDedup(df, textCol, idCol, shingleSize, plan.bands, plan.rowsPerBand,
      threshold)
  }

  /** MinHash-LSH dedup: drop every document that is a near-duplicate of a
    * lower-id document (greedy representative-by-min-id, the standard
    * corpus-dedup policy). */
  def minhashDedup(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleSize: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      threshold: Double = 0.7
  ): MayFail[DataFrame] =
    minhashPairs(df, textCol, idCol, shingleSize, bands, rowsPerBand, threshold)
      .map { pairs =>
        val toDrop = pairs.select(col("idB").as(idCol)).distinct()
        df.join(toDrop, Seq(idCol), "left_anti")
      }

  /** Transitive duplicate clusters from a pair list: connected components
    * via min-label propagation (each round, every id adopts the smallest
    * label among itself and its neighbors; a chain A~B~C converges to A
    * even when the A~C pair was never generated).
    *
    * Each iteration is one join + one aggregate; lineage is cut with
    * `localCheckpoint` per round so the plan does not grow exponentially.
    * Label-propagation rounds needed = graph diameter — near-dup graphs
    * are shallow (dup clusters are cliques or short chains), so `maxIter`
    * of 10 covers them; the loop exits early on convergence.
    *
    * Input: (idA, idB) pairs. Output: (id, cluster) — every id appearing
    * in any pair, labeled by its component's minimum id.
    *
    * A component wider than `maxIter` hops cannot converge under
    * min-label propagation — by default (`starFallback = true`) the
    * SAME edge set then runs [[Graph.connectedComponentsStar]]'s
    * O(log n)-round star contraction, which converges exactly for ANY
    * diameter, so callers never see missed duplicates. With
    * `starFallback = false` non-convergence instead returns
    * `IgnorableFail` carrying the partial labels — programmatically
    * observable via `isFailing`/`getError` while still composing through
    * `flatMap` (reference forgiveness semantics; the probe path).
    * NB: when the edge set fits `maxDriverEdges` (and a byte bound, for
    * string keys) the labels come from a driver-side union-find instead —
    * one bounded pass, exact convergence regardless of `maxIter`, same
    * min-label result. Set `maxDriverEdges = 0` to force the distributed
    * loop (and with it the `maxIter`/IgnorableFail probe semantics).
    * Edges touching a null id are dropped up front on both paths (a null
    * key never joins, so it can never participate in a component).
    *
    * WARM START (`seed`): a previous snapshot's `(id, cluster)` output
    * joins the edge set as extra `(id, cluster)` edges — each prior
    * cluster is a one-hop star around its min member, so the min label
    * propagates everywhere in ~1 round instead of diameter rounds
    * (incremental crawl dedup re-runs warm). CONTRACT: the seed must
    * label a subgraph of the CURRENT pair set's connectivity (crawl
    * snapshots only grow); seed rows are treated as edges, so an
    * inconsistent seed ADDS connectivity. Ids present only in the seed
    * keep (re-minimized) labels — including SELF-LABELED rows
    * (`id === cluster`), which carry no connectivity and are unioned
    * back as singleton `(id, id)` outputs when nothing in the current
    * pair set touches them (r12 ADVICE: this operator's own output
    * never emits them, but arbitrary caller-supplied snapshots can). */
  def duplicateClusters(
      pairs: DataFrame,
      maxIter: Int = 10,
      maxDriverEdges: Long = 1000000L,
      starFallback: Boolean = true,
      seed: Option[DataFrame] = None
  ): MayFail[DataFrame] = {
    val run = MayFail {
      // checkpoint the (possibly expensive) pair pipeline ONCE — each
      // iteration reads edges twice, and without this the whole upstream
      // LSH pipeline would re-execute every round
      val seedEdges = seed.map(_
        .select(col("id").as("idA"), col("cluster").as("idB"))
        .filter(col("idA") =!= col("idB")))
      val allPairs = seedEdges
        .fold(pairs.select(col("idA"), col("idB")))(
          pairs.select(col("idA"), col("idB")).unionByName(_))
      val edges = allPairs.select(col("idA").as("src"), col("idB").as("dst"))
        .filter(col("src").isNotNull && col("dst").isNotNull)
        .union(allPairs.select(col("idB").as("src"), col("idA").as("dst"))
          .filter(col("src").isNotNull && col("dst").isNotNull))
        .distinct()
        .localCheckpoint()
      // Stats-based strategy (the countMinTopK bounded-collect pattern):
      // LSH pair lists are tiny relative to the corpus, so when the edge
      // set fits the cap, a driver-side union-find replaces maxIter
      // join+aggregate+checkpoint rounds with one pass — same min-label
      // result, exact convergence, ~rounds× faster. The label-propagation
      // loop remains the unbounded/any-type scale path.
      val nEdges = edges.count()
      val driverLabels =
        if (nEdges <= maxDriverEdges) driverUnionFind(edges, nEdges) else None
      val (labels0, converged0) =
      if (driverLabels.isDefined) (driverLabels.get, true)
      else {
      var labels = edges.select(col("src").as("id")).distinct()
        .withColumn("cluster", col("id"))
        .localCheckpoint()
      var converged = false
      var i = 0
      while (!converged && i < maxIter) {
        val incoming = edges
          .join(labels.withColumnRenamed("id", "src"), "src")
          .groupBy(col("dst").as("id"))
          .agg(min(col("cluster")).as("__in"))
        // checkpoint FIRST, then test convergence on the materialized
        // frame — counting the lazy plan would execute it a second time
        val next = labels.join(incoming, Seq("id"), "left")
          .select(col("id"),
            least(col("cluster"), coalesce(col("__in"), col("cluster"))).as("__next"),
            col("cluster").as("__prev"))
          .localCheckpoint()
        converged = next.filter(col("__next") =!= col("__prev")).limit(1).count() == 0
        labels = next.select(col("id"), col("__next").as("cluster"))
        i += 1
      }
      if (!converged && starFallback) {
        // WIDE-DIAMETER fallback (default): min-label propagation
        // advances one hop per round, so a component wider than
        // `maxIter` hops cannot converge — hand the SAME checkpointed
        // edge set to the O(log n)-round large-star/small-star
        // contraction ([[Graph.connectedComponentsStar]]), which labels
        // every component by its min id EXACTLY, instead of returning
        // IgnorableFail partials that silently miss duplicates.
        // `starFallback = false` restores the probe semantics (observe
        // non-convergence programmatically).
        labels = Graph.connectedComponentsStar(
            edges.select(col("src"), col("dst")), "src", "dst",
            maxRounds = math.max(maxIter, 30)).get
          .select(col("node").as("id"), col("component").as("cluster"))
        converged = true
      }
      (labels, converged)
      }
      // SELF-LABELED seed rows (id === cluster) contribute no edge (the
      // idA =!= idB filter above), so an id the seed knows only as its
      // own singleton cluster would vanish from the output — union it
      // back, keeping its (trivially re-minimized) label, unless the
      // current pair set connected it to something (then labels0
      // already carries it). r12 ADVICE fix.
      val labelsOut = seed match {
        case Some(s0) =>
          val singles = s0
            .filter(col("id").isNotNull && col("id") === col("cluster"))
            .select(col("id")).distinct()
          labels0.unionByName(
            singles.join(labels0, Seq("id"), "left_anti")
              .withColumn("cluster", col("id")))
        case None => labels0
      }
      (labelsOut, converged0)
    }
    run.flatMap { case (labels, converged) =>
      if (converged) graft.functional.Ok(labels)
      else {
        val err = new IllegalStateException(
          s"duplicateClusters: labels did not converge within $maxIter rounds — " +
            s"components wider than $maxIter hops keep multiple representatives " +
            "(missed duplicates); raise maxIter")
        org.slf4j.LoggerFactory.getLogger(getClass).warn(err.getMessage)
        graft.functional.IgnorableFail(err, labels)
      }
    }
  }

  /** Driver-side min-root union-find over a (src, dst) edge frame —
    * `Some((id, cluster))` labels identical to converged min-label
    * propagation, or `None` when the key type has no driver-side ordering
    * (then the distributed loop runs). The row-count cap is enforced by
    * the caller; string keys additionally get a BYTE bound here (1M
    * 200-char ids would not be "bounded" in any useful sense), and their
    * ordering goes through UTF8String so the min label matches Spark's
    * binary string ordering exactly (Java compareTo differs on
    * supplementary characters). */
  private def driverUnionFind(edges: DataFrame, nEdges: Long): Option[DataFrame] = {
    import org.apache.spark.sql.types.{IntegerType, LongType, ShortType, StringType, StructField, StructType}
    import org.apache.spark.unsafe.types.UTF8String
    val dt = edges.schema("src").dataType
    val lt: Option[(Any, Any) => Boolean] = dt match {
      case LongType    => Some((a, b) => a.asInstanceOf[Long] < b.asInstanceOf[Long])
      case IntegerType => Some((a, b) => a.asInstanceOf[Int] < b.asInstanceOf[Int])
      case ShortType   => Some((a, b) => a.asInstanceOf[Short] < b.asInstanceOf[Short])
      case StringType  =>
        val keyBytes = edges
          .agg(coalesce(sum(length(col("src")) + length(col("dst"))), lit(0L)))
          .head().getLong(0)
        // ~4 bytes/char worst case + per-entry JVM overhead, against a
        // 400 MB driver budget for the collected graph
        if (keyBytes * 4 + nEdges * 120 > (400L << 20)) None
        else Some((a, b) =>
          UTF8String.fromString(a.asInstanceOf[String])
            .compareTo(UTF8String.fromString(b.asInstanceOf[String])) < 0)
      case _           => None
    }
    lt.map { less =>
      val parent = new java.util.HashMap[Any, Any]()
      def find(x: Any): Any = {
        var r = x
        while (parent.get(r) != r) r = parent.get(r)
        var c = x
        while (parent.get(c) != r) { val n = parent.get(c); parent.put(c, r); c = n }
        r
      }
      edges.collect().foreach { row =>
        val a = row.get(0); val b = row.get(1)
        if (!parent.containsKey(a)) parent.put(a, a)
        if (!parent.containsKey(b)) parent.put(b, b)
        val ra = find(a); val rb = find(b)
        if (ra != rb) {
          // min root wins, matching the aggregate's min(cluster) label
          if (less(ra, rb)) parent.put(rb, ra) else parent.put(ra, rb)
        }
      }
      val rows = new java.util.ArrayList[org.apache.spark.sql.Row]()
      parent.keySet().forEach(k => rows.add(org.apache.spark.sql.Row(k, find(k))))
      edges.sparkSession.createDataFrame(rows,
        StructType(Seq(StructField("id", dt), StructField("cluster", dt))))
    }
  }

  /** Transitive MinHash dedup: keep exactly one representative (the
    * minimum id) per connected near-duplicate component — the
    * pairs-greedy [[minhashDedup]] can only see direct pairs. */
  def minhashDedupTransitive(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleSize: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      threshold: Double = 0.7
  ): MayFail[DataFrame] =
    for {
      pairs <- minhashPairs(df, textCol, idCol, shingleSize, bands, rowsPerBand, threshold)
      clusters <- duplicateClusters(pairs)
    } yield {
      val drop = clusters.filter(col("id") =!= col("cluster"))
        .select(col("id").as(idCol))
      df.join(drop, Seq(idCol), "left_anti")
    }

  /** [[minhashDedupTransitive]] with the [[exactKeepBest]] keep policy:
    * per near-duplicate component, the highest-`priorityCol` member
    * (min-id tiebreak) survives instead of the minimum id — "keep the
    * cleanest copy of the cluster". Singletons (never paired) survive
    * untouched. Same plan shape plus one priority window over the
    * (LSH-pair-sized, tiny vs corpus) labeled rows. */
  def minhashDedupTransitiveKeepBest(
      df: DataFrame,
      textCol: String,
      idCol: String,
      priorityCol: String,
      shingleSize: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      threshold: Double = 0.7
  ): MayFail[DataFrame] =
    for {
      pairs <- minhashPairs(df, textCol, idCol, shingleSize, bands, rowsPerBand, threshold)
      clusters <- duplicateClusters(pairs)
    } yield {
      val rn = s"__rn_${java.util.UUID.randomUUID.toString.take(8)}"
      // singletons carry a null cluster after the left join; giving each
      // its own partition key (its id) makes the keep-window a no-op for
      // them instead of ranking all singletons against each other
      val labeled = df.join(clusters.withColumnRenamed("id", idCol), Seq(idCol), "left")
      val w = Window.partitionBy(coalesce(col("cluster"), col(idCol)))
        .orderBy(col(priorityCol).desc_nulls_last, col(idCol))
      labeled.withColumn(rn, row_number().over(w))
        .filter(col(rn) === 1)
        .drop(rn, "cluster")
    }

  /** Train/val/test split that CANNOT leak near-duplicates across
    * splits: every connected near-duplicate component (MinHash-LSH pairs
    * → min-label clusters) lands entirely on one side, because the draw
    * hashes the CLUSTER representative, not the document. Splitting
    * uniformly at the document level puts ~`2·frac·(1-frac)` of each
    * duplicate cluster's mass on both sides — the classic train/test
    * contamination that inflates eval numbers.
    *
    * The draw is the library's portable salted-md5 convention (a pure
    * function of salt and representative id), so the assignment is
    * rerun-, repartition-, and engine-stable. Singletons hash their own
    * id. Adds `splitCol`; weights normalize; `names` defaults to
    * train/val/test at 3 weights, s0..sN otherwise. */
  def leakageSafeSplit(
      df: DataFrame,
      textCol: String,
      idCol: String,
      weights: Seq[Double],
      salt: String = "split",
      names: Seq[String] = Nil,
      splitCol: String = "split",
      shingleSize: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      threshold: Double = 0.7
  ): MayFail[DataFrame] =
    for {
      pairs <- minhashPairs(df, textCol, idCol, shingleSize, bands, rowsPerBand, threshold)
      clusters <- duplicateClusters(pairs)
    } yield {
      require(weights.nonEmpty && weights.forall(_ > 0),
        s"weights must be positive: $weights")
      val labels =
        if (names.nonEmpty) {
          require(names.length == weights.length,
            s"names (${names.length}) and weights (${weights.length}) lengths differ")
          names
        }
        else if (weights.length == 3) Seq("train", "val", "test")
        else weights.indices.map(i => s"s$i")
      val total = weights.sum
      val cum = weights.scanLeft(0.0)(_ + _).tail.map(_ / total)
      val labeled = df.join(clusters.withColumnRenamed("id", idCol), Seq(idCol), "left")
      val rep = coalesce(col("cluster"), col(idCol)).cast("string")
      val bucket = pmod(graft.functions.TextFunctions.portableHash60(
        concat(lit(salt), lit("§"), rep)), lit(1000000L)).cast("double") / 1000000.0
      val label = cum.zip(labels).reverse.foldLeft(lit(labels.last)) {
        case (acc, (bound, name)) => when(bucket < bound, lit(name)).otherwise(acc)
      }
      labeled.withColumn(splitCol, label).drop("cluster")
    }

  /** Full corpus-dedup pipeline: exact dedup FIRST (hash groupBy — cheap,
    * removes identical copies), then MinHash-LSH near-dup on the
    * representatives.
    *
    * Ordering matters at scale: near-dup pair generation is quadratic in
    * duplicate-cluster size (a document cloned c times yields c·(c−1)/2
    * candidate pairs in every matching bucket), so exact dedup must run
    * before LSH — measured 10× corpus replication sends pair volume from
    * thousands to millions if skipped. */
  def dedupPipeline(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleSize: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      threshold: Double = 0.7
  ): MayFail[DataFrame] =
    for {
      exactDeduped <- exactNormalized(df, textCol, idCol)
      nearDeduped <- minhashDedup(exactDeduped, textCol, idCol,
        shingleSize, bands, rowsPerBand, threshold)
    } yield nearDeduped

  /** Cross-corpus near-duplicate pairs: MinHash-LSH candidates between a
    * NEW batch and a REFERENCE corpus — the incremental-ingest variant of
    * [[minhashPairs]] ("dedup today's crawl against the historical
    * corpus") for when both sides are too large to broadcast (contrast
    * [[contaminationFlags]], which broadcasts a small benchmark side).
    *
    * Both corpora are banded with the same seeded permutations, so
    * near-duplicates share `(band, bucket)` keys; the candidate join is
    * banded-batch ⋈ banded-reference on those keys — each side capped at
    * `maxBucket` occupants per bucket (a boilerplate bucket on either
    * side would otherwise make the cross join quadratic). Unlike the
    * within-corpus banding, singleton buckets are kept: one batch doc
    * plus one reference doc in a bucket IS a candidate.
    *
    * Returns `(idNew, idRef, jaccard)` for exact shingle Jaccard >=
    * `threshold`. Ids may overlap across frames (re-ingest); a doc
    * re-ingested unchanged pairs with itself at jaccard 1.0.
    */
  def minhashPairsAgainst(
      batch: DataFrame,
      reference: DataFrame,
      textCol: String,
      idCol: String,
      shingleSize: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      threshold: Double = 0.7,
      maxBucket: Int = 1000
  ): MayFail[DataFrame] = MayFail {
    def cappedBands(sh: DataFrame): DataFrame = {
      val banded = minhashKeyed(sh, bands, rowsPerBand)
        .select(col("id"), posexplode(col("__keys")).as(Seq("band", "bucket")))
      Banding.capBuckets(banded, Seq("band", "bucket"), maxBucket, minOccupancy = 1)
    }
    val shB = minhashShingled(batch, textCol, idCol, shingleSize)
    val shR = minhashShingled(reference, textCol, idCol, shingleSize)
    val cand = cappedBands(shB)
      .select(col("band"), col("bucket"), col("id").as("idNew"))
      .join(cappedBands(shR)
        .select(col("band"), col("bucket"), col("id").as("idRef")),
        Seq("band", "bucket"))
      .select("idNew", "idRef")
      .dropDuplicates("idNew", "idRef")
    cand
      .join(shB.select(col("id").as("idNew"), col("shingles").as("__pN")), "idNew")
      .join(shR.select(col("id").as("idRef"), col("shingles").as("__pR")), "idRef")
      .withColumn("jaccard", jaccardHashes(col("__pN"), col("__pR")))
      .filter(col("jaccard") >= threshold)
      .select(col("idNew"), col("idRef"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Keep only the batch documents that do NOT near-duplicate the
    * reference corpus (anti join on [[minhashPairsAgainst]] hits) — the
    * standard incremental-ingest filter. */
  def dedupAgainst(
      batch: DataFrame,
      reference: DataFrame,
      textCol: String,
      idCol: String,
      shingleSize: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      threshold: Double = 0.7,
      maxBucket: Int = 1000
  ): MayFail[DataFrame] =
    minhashPairsAgainst(batch, reference, textCol, idCol,
      shingleSize, bands, rowsPerBand, threshold, maxBucket).map { pairs =>
      batch.join(pairs.select(col("idNew")).distinct(),
        batch(idCol) === col("idNew"), "left_anti")
    }

  /** Persistable MinHash BAND INDEX of a corpus shard (r12 verdict ask
    * #5) — ONE compact row per doc: `(id, shingles: array<long>,
    * band_keys: array<long>)`, where `band_keys(i)` is band `i`'s LSH
    * bucket and `shingles` the distinct shingle hashes the exact-
    * Jaccard verification needs. Write it to parquet after each
    * ingest; tomorrow's shard dedups against it through
    * [[minhashPairsIncremental]] WITHOUT re-shingling history — the
    * 100 TB crawl-dedup loop's stored half, exactly the
    * store-and-remerge discipline of the KMV/DDSketch/HLL round trips.
    * The banding parameters are baked into the keys, so one
    * `(shingleSize, bands, rowsPerBand)` choice must hold index-wide
    * (the IVF-codebook contract). Docs shorter than the shingle size
    * carry no signature and are absent (the [[minhashShingled]]
    * degenerate-bucket rule). */
  def minhashBandIndex(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleSize: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 4
  ): MayFail[DataFrame] = MayFail {
    minhashShingled(df, textCol, idCol, shingleSize)
      .select(col("id"), col("shingles"),
        minhashBandKeysFromHashes(col("shingles"), bands, rowsPerBand)
          .as("band_keys"),
        // self-describing banding parameters (r13 ADVICE): an index
        // banded under different (shingleSize, bands, rowsPerBand)
        // would silently produce wrong/missing pairs — the incremental
        // entry points require these to match their arguments. Three
        // constant int columns: dictionary/RLE-encoded in parquet,
        // negligible against the shingle arrays.
        lit(shingleSize).as("shingle_size"),
        lit(bands).as("bands"),
        lit(rowsPerBand).as("rows_per_band"))
  }

  /** Validate a loaded band index's self-described parameter columns
    * against the caller's arguments — throws (→ the entry point's
    * MayFail) on any mismatch or on a mixed-parameter index (careless
    * unions). Indexes written before the parameter columns existed
    * (legacy, none of `paramCols` present) pass unchecked, documented.
    * Cost: one partial-agg distinct over constant int columns — a
    * column-pruned scan that collapses to one row per partition, never
    * a payload read. */
  private def requireIndexParams(
      index: DataFrame,
      what: String,
      params: Seq[(String, Int)]): Unit = {
    val present = index.columns.toSet
    val checked = params.filter { case (c, _) => present.contains(c) }
    if (checked.isEmpty) return // legacy index: no parameter columns
    require(checked.size == params.size,
      s"$what: index carries only ${checked.map(_._1).mkString(",")} of " +
        s"the parameter columns ${params.map(_._1).mkString(",")} — " +
        "partially stripped index")
    val distinctRows = index
      .select(checked.map { case (c, _) => col(c) }: _*)
      .distinct().limit(2).collect()
    if (distinctRows.isEmpty) return // empty index: nothing to mismatch
    require(distinctRows.length == 1,
      s"$what: index holds MIXED banding parameters " +
        s"(${distinctRows.mkString("; ")}) — never union indexes built " +
        "with different parameters")
    val row = distinctRows(0)
    checked.zipWithIndex.foreach { case ((name, want), i) =>
      val got = row.getInt(i)
      require(got == want,
        s"$what: index was built with $name=$got but the call asks " +
          s"$name=$want — banding keys are a pure function of these, " +
          "so the candidate join would silently miss pairs; rebuild " +
          "the index or match the parameters")
    }
  }

  /** Incremental near-dup pairs of a NEW shard against (and within) a
    * persisted [[minhashBandIndex]]: canonical `(idA, idB, jaccard)`
    * with at least one side from `batch` — new×index candidates from
    * the banded key join, new×new candidates from the within-batch
    * banding — verified by exact shingle-hash Jaccard at `threshold`.
    *
    * THE INCREMENTAL LAW (gate q399, pair-set equality through a
    * parquet round trip): band keys are a pure function of the text,
    * so banding the index∪batch union here is IDENTICAL to banding
    * the grown corpus from scratch — every [[minhashPairs]] pair of
    * the grown corpus with a new side appears here, and the old-old
    * pairs were precisely yesterday's output. Hence
    * `priorPairs ∪ this` == one-shot `minhashPairs(grown corpus)`,
    * provided `maxBucket` binds identically across runs (the cap is
    * per-run occupancy of the CURRENT union — a bucket that outgrows
    * it between snapshots drops from the one-shot answer but its old
    * pairs persist in the carried union; keep the cap above real
    * occupancy, it exists for adversarial boilerplate). Extend the
    * index forward with
    * `index.unionByName(minhashBandIndex(batch, ...).get)`. Ids must
    * be unique across index ∪ batch (re-ingests: exact-dedup first).
    *
    * Plan: one partial-agg cap + one bucket-keyed self-join over slim
    * `(id, band, bucket, is-new)` rows, shingle arrays joined back
    * only for surviving candidates — [[minhashPairs]]' exact shape,
    * with history arriving pre-shingled from storage. */
  def minhashPairsIncremental(
      batch: DataFrame,
      textCol: String,
      idCol: String,
      index: DataFrame,
      shingleSize: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      threshold: Double = 0.7,
      maxBucket: Int = 1000
  ): MayFail[DataFrame] = MayFail {
    requireIndexParams(index, "minhashPairsIncremental",
      Seq("shingle_size" -> shingleSize, "bands" -> bands,
        "rows_per_band" -> rowsPerBand))
    val newIdx =
      minhashBandIndex(batch, textCol, idCol, shingleSize, bands,
        rowsPerBand).get
        .select(col("id"), col("shingles"), col("band_keys"))
        .withColumn("__new", lit(true))
    val all = index.select(col("id"), col("shingles"), col("band_keys"))
      .withColumn("__new", lit(false))
      .unionByName(newIdx)
    scoredPairs(incrementalCandidates(all, maxBucket),
      all.select(col("id"), col("shingles").as("__p")),
      "jaccard", jaccardHashes, _ >= threshold, roundDigits = Some(6))
  }

  /** The forwarded state of one incremental crawl-dedup epoch
    * ([[Dedup.dedupEpoch]]) — every frame is plain parquet-writable:
    *
    *  - `index`:  the [[minhashBandIndex]] of EVERY document ingested so
    *    far (id, shingles, band_keys + the self-described banding
    *    parameters) — tomorrow's shard bands against it without
    *    re-shingling history.
    *  - `pairs`:  the full verified near-dup pair ledger `(idA, idB,
    *    jaccard)` of the corpus so far — by the q399 incremental law it
    *    equals the one-shot [[minhashPairs]] of the grown corpus.
    *  - `labels`: `(id, cluster)` connected-component labels over
    *    `pairs` (cluster = min member id) — equal to a cold one-shot
    *    clustering of the grown corpus (the q391 seeded==cold law).
    *  - `kept`:   THIS epoch's batch documents that are representatives
    *    of their cluster (min id, or never paired) — the epoch's
    *    training-data emission.
    *  - `retractions`: `(id)` of PREVIOUSLY-kept documents this epoch
    *    demoted — a new document bridged two old clusters, so one old
    *    representative lost its min-of-cluster status. Consumers
    *    maintaining a cumulative corpus apply these as deletes; the
    *    invariant (∪ kept) ∖ (∪ retractions) == one-shot kept set at
    *    every snapshot is spec'd in DedupSimilaritySpec.
    *  - `ids`: EVERY id ingested so far — including sub-shingle-size
    *    documents the index cannot carry, so the unique-id contract is
    *    enforceable for exactly the docs the epoch promises are
    *    "always kept" (r14 review finding).
    */
  final case class EpochState(
      index: DataFrame,
      pairs: DataFrame,
      labels: DataFrame,
      kept: DataFrame,
      retractions: DataFrame,
      ids: DataFrame) {
    /** Persist every frame under `dir/{index,pairs,labels,kept,
      * retractions,ids}` (overwrite) — the storage half of the epoch
      * loop. NB: a FULL snapshot; the streaming loop
      * ([[graft.streaming.Stream.dedupEpochSink]]) stores per-epoch
      * DELTAS instead, so its per-epoch I/O stays proportional to the
      * batch rather than the corpus. */
    def write(dir: String): Unit = {
      index.write.mode("overwrite").parquet(s"$dir/index")
      pairs.write.mode("overwrite").parquet(s"$dir/pairs")
      labels.write.mode("overwrite").parquet(s"$dir/labels")
      kept.write.mode("overwrite").parquet(s"$dir/kept")
      retractions.write.mode("overwrite").parquet(s"$dir/retractions")
      ids.write.mode("overwrite").parquet(s"$dir/ids")
    }
  }

  object EpochState {
    /** Load a persisted [[EpochState]] — the next epoch's `prior`. */
    def load(spark: org.apache.spark.sql.SparkSession,
        dir: String): EpochState =
      EpochState(
        spark.read.parquet(s"$dir/index"),
        spark.read.parquet(s"$dir/pairs"),
        spark.read.parquet(s"$dir/labels"),
        spark.read.parquet(s"$dir/kept"),
        spark.read.parquet(s"$dir/retractions"),
        spark.read.parquet(s"$dir/ids"))
  }

  /** [[epochCore]]'s full result: the forwarded state plus this
    * epoch's DELTAS (the batch's index rows, the new pairs, the batch
    * ids) — what an append-style store persists per epoch. */
  private[graft] final case class EpochResult(
      state: EpochState,
      indexDelta: DataFrame,
      pairsDelta: DataFrame,
      idsDelta: DataFrame)

  /** ONE epoch of the incremental crawl-dedup loop (r13 verdict ask
    * #1) — the composition of the proven pieces into the product the
    * 100 TB mandate describes: load yesterday's state → band today's
    * shard against the stored index (new×old and new×new, no
    * re-shingling of history) → verify candidate pairs by exact
    * Jaccard → extend the pair ledger → WARM-START the connected-
    * component labeling from yesterday's labels → emit this epoch's
    * kept documents, the retraction list, and the forwarded state.
    *
    * THE CHAINED LAW (gate q403, through parquet in fresh sessions):
    * after any number of epochs, `labels` equals the one-shot
    * [[duplicateClusters]]∘[[minhashPairs]] of the grown corpus at
    * CLUSTER level — pair equality from the q399 incremental law
    * (band keys are a pure function of the text), label equality from
    * the q391 seeded==cold law (the seed's star edges connect exactly
    * what yesterday's pairs connected, and yesterday's pairs are a
    * subset of today's ledger).
    *
    * UNCAPPED-INDEX CONTRACT (r13 verdict ask #6): the law holds only
    * when no LSH bucket is capped, because a `maxBucket` cap binds
    * per-run occupancy and the union's occupancy grows between
    * epochs — so this operator takes NO cap and always bands
    * uncapped. A throughput-oriented capped loop must compose
    * [[minhashPairsIncremental]] directly and forfeits the exactness
    * law (DedupSimilaritySpec pins capped ⊆ uncapped, the guarantee that
    * remains).
    *
    * Ids must be unique across the whole corpus history (re-ingests:
    * exact-dedup first) — enforced per-epoch against the index.
    * `batch` documents shorter than the shingle size carry no
    * signature: never paired, always kept, absent from the index
    * (the [[minhashShingled]] contract).
    *
    * Plan shape per epoch: one banding agg + one bucket self-join over
    * slim (id, band, bucket, is-new) rows for candidates; payload
    * join-back only for survivors; the clustering runs over the pair
    * ledger (tiny relative to the corpus — driver union-find when it
    * fits, O(log n) star contraction otherwise). History is never
    * re-shingled and the batch is scanned once. */
  def dedupEpoch(
      batch: DataFrame,
      textCol: String,
      idCol: String,
      prior: Option[EpochState] = None,
      shingleSize: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      threshold: Double = 0.7,
      maxIter: Int = 10,
      maxDriverEdges: Long = 1000000L
  ): MayFail[EpochState] = MayFail {
    dedupEpochDelta(batch, textCol, idCol, prior, shingleSize, bands,
      rowsPerBand, threshold, maxIter, maxDriverEdges).state
  }

  /** [[dedupEpoch]] exposing this epoch's deltas — the append-style
    * storage API ([[graft.streaming.Stream.dedupEpochSink]]). */
  private[graft] def dedupEpochDelta(
      batch: DataFrame,
      textCol: String,
      idCol: String,
      prior: Option[EpochState],
      shingleSize: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      threshold: Double = 0.7,
      maxIter: Int = 10,
      maxDriverEdges: Long = 1000000L
  ): EpochResult = {
    prior.foreach(p => requireIndexParams(p.index, "dedupEpoch",
      Seq("shingle_size" -> shingleSize, "bands" -> bands,
        "rows_per_band" -> rowsPerBand)))
    epochCore(batch, idCol, "dedupEpoch",
      minhashBandIndex(batch, textCol, idCol,
        shingleSize, bands, rowsPerBand).get,
      // UNCAPPED by contract (scaladoc): the chained law needs every
      // bucket's pairs, and a cap would bind per-epoch occupancy.
      // The generator consumes the ALREADY-CHECKPOINTED batch index —
      // the epoch's one banding of the batch (r14 review: the old
      // composition re-shingled the batch per consumer, ~5x)
      bIdx => {
        val newPart = bIdx
          .select(col("id"), col("shingles"), col("band_keys"))
          .withColumn("__new", lit(true))
        val all = prior match {
          case Some(p) => p.index
            .select(col("id"), col("shingles"), col("band_keys"))
            .withColumn("__new", lit(false))
            .unionByName(newPart)
          // no history: every row is new, so the ≥1-new-side filter
          // passes all pairs and this IS the one-shot [[minhashPairs]]
          // of the batch (same cap, same candidate core, same shared
          // scoring tail)
          case None => newPart
        }
        scoredPairs(incrementalCandidates(all, Int.MaxValue),
          all.select(col("id"), col("shingles").as("__p")),
          "jaccard", jaccardHashes, _ >= threshold,
          roundDigits = Some(6))
      },
      prior, maxIter, maxDriverEdges)
  }

  /** The modality-independent half of an epoch ([[dedupEpoch]] /
    * [[embeddingDedupEpoch]]): unique-id check, pair-ledger union +
    * checkpoint, warm-start clustering, kept/retraction emission,
    * state forwarding and the epoch deltas. `batchIdx` is the caller's
    * modality-specific banding; it is checkpointed HERE, once, and the
    * caller's `incPairsFrom` must generate the epoch's (uncapped)
    * pairs from that checkpointed frame — the batch's payload is
    * banded exactly once per epoch (its id column is read a second
    * time for the ids ledger, a pruned-column scan). */
  private def epochCore(
      batch: DataFrame,
      idCol: String,
      what: String,
      batchIdx: DataFrame,
      incPairsFrom: DataFrame => DataFrame,
      prior: Option[EpochState],
      maxIter: Int,
      maxDriverEdges: Long
  ): EpochResult = {
    val bIdx = batchIdx.localCheckpoint()
    val batchIds = batch.select(col(idCol).as("id")).localCheckpoint()
    prior.foreach { p =>
      // the unique-id contract, checked where it breaks the law: a
      // re-ingested id would collapse the ≥1-new-side discipline.
      // Checked against the FULL ids ledger, not the index — a
      // sub-shingle doc is absent from the index but was still kept
      // by its first epoch (r14 review finding)
      val dup = batchIds
        .join(p.ids.select(col("id")), Seq("id"), "left_semi")
        .limit(1).count()
      require(dup == 0L,
        s"$what: batch re-uses ids already ingested — ids must be " +
          "unique across the corpus history (exact-dedup re-ingests " +
          "first)")
    }
    val incPairs = incPairsFrom(bIdx)
    // the ≥1-new-side discipline makes incremental pairs disjoint
    // from the carried ledger under unique ids — plain union, and
    // checkpoint ONCE: the clustering below reads the ledger every
    // round and must not re-run the LSH pipeline per round
    val pairs = prior.fold(incPairs)(_.pairs.unionByName(incPairs))
      .localCheckpoint()
    val labels = duplicateClusters(pairs, maxIter, maxDriverEdges,
      starFallback = true, seed = prior.map(_.labels)).get
      .localCheckpoint()
    val index = prior.fold(bIdx)(_.index.unionByName(bIdx))
    val ids = prior.fold(batchIds)(_.ids.unionByName(batchIds))
    // kept = batch docs that are representatives NOW: never paired,
    // or the min id of their cluster
    val lbl = labels.select(col("id").as("__lid"), col("cluster"))
    val kept = batch
      .join(lbl, batch(idCol) === col("__lid"), "left")
      .filter(col("cluster").isNull || col("cluster") === col("__lid"))
      .drop("__lid", "cluster")
    // retractions = OLD docs that were representatives yesterday but
    // are not today (a new doc bridged their cluster to a lower id)
    val retractions = prior match {
      case None => labels.select(col("id")).limit(0)
      case Some(p) =>
        val nowNonRep = labels.filter(col("cluster") =!= col("id"))
          .select(col("id"))
          .join(batchIds, Seq("id"), "left_anti") // old docs only
        val prevNonRep = p.labels
          .filter(col("cluster") =!= col("id")).select(col("id"))
        nowNonRep.join(prevNonRep, Seq("id"), "left_anti")
    }
    EpochResult(
      EpochState(index, pairs, labels, kept, retractions, ids),
      indexDelta = bIdx, pairsDelta = incPairs, idsDelta = batchIds)
  }

  /** [[dedupEpoch]] on the VECTOR side — the same composed epoch over
    * [[embeddingBandIndex]] + [[embeddingPairsIncremental]] (portable
    * md5-sign signatures, exact-cosine verification at `threshold`).
    * Same chained law (gate q406: 3 epochs through parquet in fresh
    * sessions == one-shot [[embeddingNearDupPairsPortable]] +
    * clustering of the grown corpus), same uncapped-index contract,
    * same kept/retraction emission. Embedding crawl loops dedup
    * REPRESENTATIONS (semantic re-crawls, near-identical renders)
    * where the text loop dedups surface forms — production pipelines
    * run both, which is why the state and laws are deliberately
    * identical in shape. */
  def embeddingDedupEpoch(
      batch: DataFrame,
      vecCol: String,
      idCol: String,
      prior: Option[EpochState] = None,
      threshold: Double = 0.95,
      bandBits: Int = 10,
      nBands: Int = 6,
      maxIter: Int = 10,
      maxDriverEdges: Long = 1000000L
  ): MayFail[EpochState] = MayFail {
    embeddingDedupEpochDelta(batch, vecCol, idCol, prior, threshold,
      bandBits, nBands, maxIter, maxDriverEdges).state
  }

  /** [[embeddingDedupEpoch]] exposing this epoch's deltas — see
    * [[dedupEpochDelta]]. */
  private[graft] def embeddingDedupEpochDelta(
      batch: DataFrame,
      vecCol: String,
      idCol: String,
      prior: Option[EpochState],
      threshold: Double = 0.95,
      bandBits: Int = 10,
      nBands: Int = 6,
      maxIter: Int = 10,
      maxDriverEdges: Long = 1000000L
  ): EpochResult = {
    prior.foreach(p => requireIndexParams(p.index, "embeddingDedupEpoch",
      Seq("band_bits" -> bandBits, "n_bands" -> nBands)))
    epochCore(batch, idCol, "embeddingDedupEpoch",
      embeddingBandIndex(batch, vecCol, idCol, bandBits, nBands).get,
      bIdx => {
        val newPart = bIdx.select(col("id"), col("vec"), col("band_keys"))
          .withColumn("__new", lit(true))
        val all = prior match {
          case Some(p) => p.index
            .select(col("id"), col("vec"), col("band_keys"))
            .withColumn("__new", lit(false))
            .unionByName(newPart)
          case None => newPart // all-new == one-shot portable pairs
        }
        scoredPairs(incrementalCandidates(all, Int.MaxValue),
          all.select(col("id"), col("vec").as("__p")),
          "cosine", vecCosine, _ >= threshold, roundDigits = Some(6))
      },
      prior, maxIter, maxDriverEdges)
  }

  /** One-row observability report of an epoch transition — the
    * cap-report discipline for the epoch loop (what moved, before
    * anyone trusts the emission): index/ledger/label sizes after the
    * epoch, the NEW pairs and labels this epoch contributed, kept and
    * retraction counts. All exact counts over the state frames; the
    * corpus is never rescanned. */
  def epochReport(
      state: EpochState,
      prior: Option[EpochState] = None): MayFail[DataFrame] = MayFail {
    val nIndex = state.index.count()
    val nPairs = state.pairs.count()
    val nLabels = state.labels.count()
    val priorPairs = prior.map(_.pairs.count()).getOrElse(0L)
    val priorLabels = prior.map(_.labels.count()).getOrElse(0L)
    val nKept = state.kept.count()
    val nRetract = state.retractions.count()
    val spark = state.index.sparkSession
    import spark.implicits._
    Seq((nIndex, nPairs, nPairs - priorPairs, nLabels,
      nLabels - priorLabels, nKept, nRetract))
      .toDF("n_index", "n_pairs", "n_new_pairs", "n_labels",
        "n_new_labels", "n_kept", "n_retractions")
  }

  /** SimHash near-dup candidate pairs: 64-bit simhash, banded so the
    * pigeonhole bound guarantees recall (hamming ≤ bands−1 implies at
    * least one identical band) — band width is DERIVED from `maxHamming`
    * so no qualifying pair can be silently missed. Verified by exact
    * hamming distance. Returns `(idA, idB, hamming)`.
    */
  def simhashPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      maxHamming: Int = 3,
      maxBucket: Int = 1000
  ): MayFail[DataFrame] =
    simhashPairsFrom(
      df.select(col(idCol).as("id"), simhash(col(textCol)).as("sh"))
        .filter(trim(col(textCol)) =!= "" && col(textCol).isNotNull),
      maxHamming, maxBucket)

  /** Banding + verification over a precomputed `(id, sh)` simhash frame —
    * the pigeonhole core of [[simhashPairs]], exposed so callers can plug
    * in an alternative fingerprint kernel (e.g. [[portableSimhash]], whose
    * md5 token hash an external SQL engine can recompute bit-exactly).
    *
    * `bits` is the signature's REAL width: banding a 60-bit signature
    * with 64-bit math would create a constant-zero phantom band whose
    * single bucket holds the whole corpus (silent all-pairs below the
    * bucket cap, a recall hole above it). With bandBits =
    * ⌊bits/(maxHamming+1)⌋ we get nBands ≥ maxHamming+1 covered bands, so
    * ≤ maxHamming differing bits always leave one band intact —
    * pigeonhole recall holds for any width. */
  def simhashPairsFrom(
      hashed: DataFrame,
      maxHamming: Int = 3,
      maxBucket: Int = 1000,
      bits: Int = 64
  ): MayFail[DataFrame] = MayFail {
    // simhashKeyed derives bandBits = ⌊bits/(maxHamming+1)⌋, giving
    // nBands >= maxHamming+1 covered bands — the pigeonhole guarantee
    val banded = candidateBands(simhashKeyed(hashed, maxHamming, bits), maxBucket)
    verifiedPairs(banded, hashed.withColumnRenamed("sh", "__p"),
      "hamming", (a, b) => bit_count(a.bitwiseXOR(b)), _ <= maxHamming,
      roundDigits = None)
  }

  /** The [[simhashPairsFrom]] band derivation, shared with the cap
    * report so the report counts EXACTLY the banding the pair generator
    * builds. */
  private def simhashKeyed(hashed: DataFrame, maxHamming: Int, bits: Int): DataFrame = {
    require(bits > 0 && bits <= 64, s"bits out of range: $bits")
    require(maxHamming >= 0 && maxHamming < bits,
      s"maxHamming out of range for $bits-bit signatures: $maxHamming")
    val bandBits = math.max(1, bits / (maxHamming + 1))
    val nBands = bits / bandBits
    hashed.select(col("id"),
      bandKeysFromSimhash(col("sh"), bandBits, nBands).as("__keys"))
  }

  /** Cross-corpus pairs over precomputed `(id, sh)` signature frames —
    * the incremental-ingest variant of [[simhashPairsFrom]] (batch bands
    * ⋈ reference bands; each side capped SEPARATELY at `maxBucket`, and
    * singleton buckets kept — one batch row plus one reference row in a
    * bucket IS a candidate). Hamming verified from the full signatures.
    * Returns `(idNew, idRef, hamming)`. The image dHash family routes
    * through here ([[graft.operators.Multimodal.imageDedupAgainst]]). */
  def simhashPairsAgainstFrom(
      hashedNew: DataFrame,
      hashedRef: DataFrame,
      maxHamming: Int = 3,
      maxBucket: Int = 1000,
      bits: Int = 64
  ): MayFail[DataFrame] = MayFail {
    def capped(hashed: DataFrame): DataFrame = {
      val banded = simhashKeyed(hashed, maxHamming, bits)
        .select(col("id"), posexplode(col("__keys")).as(Seq("band", "bucket")))
      Banding.capBuckets(banded, Seq("band", "bucket"), maxBucket, minOccupancy = 1)
    }
    val cand = capped(hashedNew)
      .select(col("band"), col("bucket"), col("id").as("idNew"))
      .join(capped(hashedRef)
        .select(col("band"), col("bucket"), col("id").as("idRef")),
        Seq("band", "bucket"))
      .select("idNew", "idRef")
      .dropDuplicates("idNew", "idRef")
    cand
      .join(hashedNew.select(col("id").as("idNew"), col("sh").as("__pN")), "idNew")
      .join(hashedRef.select(col("id").as("idRef"), col("sh").as("__pR")), "idRef")
      .withColumn("hamming", bit_count(col("__pN").bitwiseXOR(col("__pR"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("idNew"), col("idRef"), col("hamming"))
  }

  /** Cap report for the banding [[simhashPairsFrom]] would build over a
    * precomputed `(id, sh)` frame at these parameters (the
    * [[minhashCapReport]] contract, one family over — the round-5
    * verdict's observability gap). */
  def simhashCapReportFrom(
      hashed: DataFrame,
      maxHamming: Int = 3,
      maxBucket: Int = 1000,
      bits: Int = 64
  ): MayFail[DataFrame] = MayFail {
    capReportFromKeys(simhashKeyed(hashed, maxHamming, bits), maxBucket)
  }

  /** Cap report for [[simhashPairsAgainstFrom]]: one row per side
    * (`side` ∈ batch, reference) — the cross-corpus join caps each side
    * SEPARATELY, so both sides' occupancy matters
    * ([[incrementalCapReport]]'s contract over precomputed signatures;
    * the image dHash family routes through here via
    * [[graft.operators.Multimodal.imageIncrementalCapReport]]). */
  def simhashIncrementalCapReportFrom(
      hashedNew: DataFrame,
      hashedRef: DataFrame,
      maxHamming: Int = 3,
      maxBucket: Int = 1000,
      bits: Int = 64
  ): MayFail[DataFrame] = MayFail {
    def side(hashed: DataFrame, name: String): DataFrame =
      capReportFromKeys(simhashKeyed(hashed, maxHamming, bits), maxBucket)
        .select(lit(name).as("side"), col("*"))
    side(hashedNew, "batch").unionByName(side(hashedRef, "reference"))
  }

  /** Cap report for [[simhashPairs]] at these parameters (text surface
    * of [[simhashCapReportFrom]]). */
  def simhashCapReport(
      df: DataFrame,
      textCol: String,
      idCol: String,
      maxHamming: Int = 3,
      maxBucket: Int = 1000
  ): MayFail[DataFrame] =
    simhashCapReportFrom(
      df.select(col(idCol).as("id"), simhash(col(textCol)).as("sh"))
        .filter(trim(col(textCol)) =!= "" && col(textCol).isNotNull),
      maxHamming, maxBucket)

  /** 60-bit simhash every step of which is reproducible in portable SQL:
    * tokenise on `[ \t\n\r\f]+`, token hash = first 15 hex chars of
    * `md5(token)` (60 bits, so it stays positive in a signed int64), then
    * a per-bit majority vote over the token multiset (ties → 0).
    *
    * Slower than the native splitmix kernel behind [[simhashPairs]] — use
    * this where an external engine must recompute the identical
    * fingerprint (cross-engine validation; the driver's DuckDB oracle).
    * Returns `(id, sh)`; empty/all-whitespace docs drop out. The explode +
    * 60-way vote is one shuffle on `id` and fully codegen'd.
    *
    * Cross-engine caveat: `lower()` must agree between engines. ASCII and
    * common Unicode agree; locale-sensitive oddities (e.g. Turkish
    * dotted-İ, which Java lowercases to i + combining dot) can diverge
    * from another engine's ICU casing — pre-normalize such corpora before
    * fingerprinting if bit-parity matters. */
  def portableSimhash(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      explode(filter(split(lower(col(textCol)), "[ \t\n\r\f]+"), t => t =!= lit(""))).as("t"))
    val hashed = toks.select(col("id"), portableHash60(col("t")).as("h"))
    val bitVotes = (0 until 60).map { b =>
      sum(when(shiftrightunsigned(col("h"), b).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)).as(s"__b$b")
    }
    hashed.groupBy("id").agg(bitVotes.head, bitVotes.tail: _*)
      .select(col("id"),
        (0 until 60).map { b =>
          when(col(s"__b$b") > 0, lit(1L << b)).otherwise(lit(0L))
        }.reduce(_ + _).as("sh"))
  }

  /** Character-n-gram Jaccard near-dup pairs (MinHash-LSH candidates,
    * exact char-shingle Jaccard verification). Catches small edits that
    * word shingles miss. Returns `(idA, idB, jaccard)`. */
  def ngramJaccardPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 5,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      threshold: Double = 0.8,
      maxBucket: Int = 1000
  ): MayFail[DataFrame] = MayFail {
    val sh = df.select(col(idCol).as("id"), charShingleHashes(col(textCol), n).as("shingles"))
      .filter(size(col("shingles")) > 0)
    val banded = candidateBands(
      sh.select(col("id"),
        minhashBandKeysFromHashes(col("shingles"), bands, rowsPerBand).as("__keys")),
      maxBucket)
    verifiedPairs(banded, sh.withColumnRenamed("shingles", "__p"),
      "jaccard", jaccardHashes, _ >= threshold, roundDigits = Some(6))
  }

  /** Embedding-cosine near-duplicate pairs: random-hyperplane LSH buckets
    * (multiple tables to boost recall), exact cosine verification inside
    * buckets. Returns `(idA, idB, cosine)`.
    *
    * `nBits <= 0` auto-sizes the signature from a corpus count so the
    * EXPECTED bucket occupancy stays ~16 vectors as the corpus grows
    * (`nBits = log2(n/16)`, clamped to [4, 24]). A fixed signature width
    * is the classic LSH scale trap: bucket occupancy — and therefore the
    * quadratic in-bucket verification — grows linearly with the corpus,
    * so the parameter that was tuned at 10⁵ vectors melts down at 10⁹.
    * The ~16 target matches the measured sweet spot (at 2×10⁴ vectors,
    * 11-bit tables generate 1.8M candidate pairs vs 8M for 8-bit ones,
    * and run 3.4× faster end-to-end, on par with the portable
    * band-agreement formulation). More bits = smaller buckets = lower
    * per-table recall; raise `tables` to compensate when auto-sizing
    * lands wide. */
  def embeddingNearDupPairs(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      threshold: Double = 0.95,
      nBits: Int = 16,
      tables: Int = 4,
      maxBucket: Int = 2000
  ): MayFail[DataFrame] = MayFail {
    val base = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    // distinct bucket keys per table: (table, signature) — same slim-banding
    // shape as the text dedups (vectors join back only at verification).
    val banded = candidateBands(
      seededEmbeddingKeyed(base, seededBits(base, nBits), tables), maxBucket)
    verifiedPairs(banded, base.withColumnRenamed("v", "__p"),
      "cosine", vecCosine, _ >= threshold, roundDigits = Some(6))
  }

  /** Signature width for the seeded embedding LSH: the given `nBits`, or
    * (when `nBits <= 0`) occupancy-sized from a corpus count — see
    * [[embeddingNearDupPairs]]. */
  private def seededBits(base: DataFrame, nBits: Int): Int =
    if (nBits > 0) nBits
    else {
      val n = math.max(base.count(), 1L)
      math.min(24, math.max(4, math.ceil(math.log(n / 16.0) / math.log(2.0)).toInt))
    }

  /** `(id, __keys)` seeded-hyperplane table keys over a `(id, v)` frame —
    * ONE definition so [[embeddingNearDupPairs]] and
    * [[embeddingCapReport]] band identically. */
  private def seededEmbeddingKeyed(base: DataFrame, bits: Int, tables: Int): DataFrame =
    base.select(col("id"),
      array((0 until tables).map { t =>
        hyperplaneBits(col("v"), bits, seed = 42L + 1000L * t)
      }: _*).as("__keys"))

  /** Embedding near-dup pairs with an EXPLICIT, engine-reproducible
    * candidate contract: candidates are pairs agreeing on ALL `bandBits`
    * bits of at least one of `nBands` bands of the [[PortableLsh]]
    * signature; emitted pairs are candidates whose exact cosine clears
    * `threshold`. Unlike [[embeddingNearDupPairs]] (seeded hyperplanes,
    * engine-private), the emitted set is a pure function of the data that
    * external SQL can recompute bit-for-bit.
    *
    * Band agreement — not a hamming ball: a radius-h ball needs h+1
    * narrow bands (pigeonhole), and narrow bands mean huge buckets
    * (2-bit bands = 4 buckets/band ⇒ ~all-pairs per band; measured 8×
    * slower at 10× corpus). Wide bands keep buckets sparse, which IS the
    * LSH cost model, and the recall knob is `nBands`. `maxBucket` caps
    * degenerate buckets at scale (the one deviation an external
    * recomputation must mirror if a bucket ever exceeds it). */
  def embeddingNearDupPairsPortable(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      threshold: Double = 0.95,
      bandBits: Int = 10,
      nBands: Int = 6,
      maxBucket: Int = 2000
  ): MayFail[DataFrame] = MayFail {
    val base = df.select(col(idCol).as("id"), col(vecCol).as("__p"))
    val banded = candidateBands(
      portableEmbeddingKeyed(df, vecCol, idCol, bandBits, nBands), maxBucket)
    verifiedPairs(banded, base,
      "cosine", vecCosine, _ >= threshold, roundDigits = Some(6))
  }

  /** Persistable EMBEDDING band index (the [[minhashBandIndex]]
    * discipline on the vector side) — one row per vector: `(id, vec,
    * band_keys)` under the PORTABLE md5-sign hyperplane signature, so
    * the stored index is a pure function of the data (re-buildable,
    * auditable by external SQL). Write after each ingest; dedup
    * tomorrow's embedding shard against it with
    * [[embeddingPairsIncremental]] without re-hashing history. One
    * `(bandBits, nBands)` choice must hold index-wide. */
  def embeddingBandIndex(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      bandBits: Int = 10,
      nBands: Int = 6
  ): MayFail[DataFrame] = MayFail {
    require(bandBits > 0 && nBands > 0 && bandBits * nBands <= 60,
      s"bandBits*nBands must be in (0, 60]: ${bandBits}*${nBands}")
    df.select(col(idCol).as("id"), col(vecCol).as("vec"),
      bandKeysFromSimhash(
        PortableLsh.vecSimhashCol(col(vecCol), bandBits * nBands),
        bandBits, nBands).as("band_keys"),
      // self-describing banding parameters — see [[minhashBandIndex]]
      lit(bandBits).as("band_bits"),
      lit(nBands).as("n_bands"))
  }

  /** Incremental embedding near-dup pairs against a persisted
    * [[embeddingBandIndex]]: canonical `(idA, idB, cosine)` with at
    * least one side from `batch` — the [[minhashPairsIncremental]] law
    * on the vector side: band keys are a pure function of the vector,
    * so `priorPairs ∪ this == one-shot
    * [[embeddingNearDupPairsPortable]](grown corpus)` EXACTLY (same
    * per-run `maxBucket` caveat). Gate q400 locks it through a parquet
    * round trip against q37's brute-force oracle. */
  def embeddingPairsIncremental(
      batch: DataFrame,
      vecCol: String,
      idCol: String,
      index: DataFrame,
      threshold: Double = 0.95,
      bandBits: Int = 10,
      nBands: Int = 6,
      maxBucket: Int = 2000
  ): MayFail[DataFrame] = MayFail {
    requireIndexParams(index, "embeddingPairsIncremental",
      Seq("band_bits" -> bandBits, "n_bands" -> nBands))
    val newIdx = embeddingBandIndex(batch, vecCol, idCol, bandBits, nBands)
      .get.select(col("id"), col("vec"), col("band_keys"))
      .withColumn("__new", lit(true))
    val all = index.select(col("id"), col("vec"), col("band_keys"))
      .withColumn("__new", lit(false))
      .unionByName(newIdx)
    scoredPairs(incrementalCandidates(all, maxBucket),
      all.select(col("id"), col("vec").as("__p")),
      "cosine", vecCosine, _ >= threshold, roundDigits = Some(6))
  }

  /** `(id, __keys)` portable md5-sign band keys — ONE definition so
    * [[embeddingNearDupPairsPortable]] and [[embeddingCapReportPortable]]
    * band identically. */
  private def portableEmbeddingKeyed(df: DataFrame, vecCol: String, idCol: String,
                                     bandBits: Int, nBands: Int): DataFrame = {
    require(bandBits > 0 && nBands > 0 && bandBits * nBands <= 60,
      s"bandBits*nBands must be in (0, 60]: ${bandBits}*${nBands}")
    df.select(col(idCol).as("id"),
      bandKeysFromSimhash(
        PortableLsh.vecSimhashCol(col(vecCol), bandBits * nBands),
        bandBits, nBands).as("__keys"))
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540):
    * cluster the embeddings, then drop every vector that has a lower-id
    * vector in the SAME cluster with cosine ≥ `threshold` — the greedy
    * representative-by-min-id policy of [[minhashDedup]], applied in
    * embedding space. The codebook is the portable md5-sign hyperplane
    * set (assignment = argmax projection, [[PortableLsh.clusterCol]]), so
    * the full output is a pure function of the data that external SQL can
    * recompute — a k-means codebook (the paper's choice) is seeded and
    * engine-private; pre-compute one into a `cluster` column and use
    * [[semanticDedupAssigned]] when fidelity to the paper matters more
    * than cross-engine checkability.
    *
    * Scale: one shuffle on the cluster id; within-cluster pairing is the
    * quadratic step, so clusters larger than `maxCluster` are left
    * un-deduped (recall deviation, same policy as the LSH bucket caps)
    * rather than allowed to explode the join. Size `nClusters` so
    * corpus/nClusters stays ≲ `maxCluster`; the pairing carries only
    * (id, cluster, vector) rows, never document payloads.
    *
    * Output: (idCol, cluster, kept) — one row per input vector. */
  def semanticDedup(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      nClusters: Int = 16,
      threshold: Double = 0.95,
      maxCluster: Int = 10000
  ): MayFail[DataFrame] = MayFail {
    // unlike the packed 60-bit signature, argmax assignment has no bit
    // budget — the ceiling only bounds the cached sign matrix
    // (nClusters × dim doubles); 64k cells × 1k dims ≈ 0.5 GB is the
    // sane upper end
    require(nClusters > 0 && nClusters <= 65536,
      s"nClusters in (0, 65536]: $nClusters")
    semanticDedupAssignedImpl(
      df.select(col(idCol),
        PortableLsh.clusterCol(col(vecCol), nClusters).as("cluster"),
        col(vecCol).as("__p")),
      idCol, threshold, maxCluster)
  }

  /** [[semanticDedup]] over a caller-provided assignment (e.g. a real
    * k-means codebook): `df` must carry `clusterCol`; same keep policy,
    * same `maxCluster` quadratic guard. */
  def semanticDedupAssigned(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      clusterCol: String,
      threshold: Double = 0.95,
      maxCluster: Int = 10000
  ): MayFail[DataFrame] = MayFail {
    semanticDedupAssignedImpl(
      df.select(col(idCol), col(clusterCol).as("cluster"), col(vecCol).as("__p")),
      idCol, threshold, maxCluster)
  }

  private def semanticDedupAssignedImpl(
      assigned: DataFrame,
      idCol: String,
      threshold: Double,
      maxCluster: Int): DataFrame = {
    // Oversized clusters skip pair generation entirely (cap policy);
    // singletons have no pairs by construction, so both bounds prune.
    val wc = Window.partitionBy(col("cluster"))
    val within = assigned
      .withColumn("__cs", count(lit(1)).over(wc))
      .filter(col("__cs") <= maxCluster && col("__cs") > 1)
    val dropped = within.select(col("cluster"), col(idCol).as("idA"), col("__p").as("__pA"))
      .join(within.select(col("cluster"), col(idCol).as("idB"), col("__p").as("__pB")),
        Seq("cluster"))
      .filter(col("idA") < col("idB") &&
        vecCosine(col("__pA"), col("__pB")) >= threshold)
      .select(col("idB").as(idCol))
      .distinct()
    assigned.select(col(idCol), col("cluster"))
      .join(dropped.withColumn("__drop", lit(true)), Seq(idCol), "left")
      .select(col(idCol), col("cluster"), col("__drop").isNull.as("kept"))
  }

  /** Probability that a pair with Jaccard similarity `s` becomes an LSH
    * candidate under `bands` bands of `rowsPerBand` rows — the S-curve
    * `1 − (1 − s^r)^b` (Leskovec, Rajaraman & Ullman, "Mining of Massive
    * Datasets" §3.4). */
  def candidateProbability(s: Double, bands: Int, rowsPerBand: Int): Double = {
    require(s >= 0 && s <= 1, s"similarity in [0,1]: $s")
    require(bands >= 1 && rowsPerBand >= 1, s"bad banding: $bands x $rowsPerBand")
    1.0 - math.pow(1.0 - math.pow(s, rowsPerBand.toDouble), bands.toDouble)
  }

  /** Chosen LSH banding: `impliedThreshold = (1/bands)^(1/rowsPerBand)`
    * is where the S-curve rises steeply; `pAtThreshold` is the candidate
    * probability [[candidateProbability]] gives a pair sitting exactly at
    * the requested threshold. */
  final case class LshPlan(bands: Int, rowsPerBand: Int,
                           impliedThreshold: Double, pAtThreshold: Double)

  /** Pick `(bands, rowsPerBand)` for [[minhashPairs]]/[[minhashDedup]]
    * given a similarity `threshold` and a signature budget of `nHashes`
    * minhashes: recall-first, the plan whose implied threshold sits
    * highest AT OR BELOW the target (so the steep part of the S-curve is
    * crossed before the target and near-threshold pairs are still
    * candidates), with ties favoring fewer sub-threshold candidates. The
    * defaults of [[minhashPairs]] (16×4) are exactly
    * `lshPlan(0.5, 64)`. Pure driver-side arithmetic — use it to size the
    * banding before a 100 TB run instead of hand-tuning. */
  def lshPlan(threshold: Double, nHashes: Int = 64): LshPlan = {
    require(threshold > 0 && threshold < 1, s"threshold in (0,1): $threshold")
    require(nHashes >= 1, s"nHashes must be positive: $nHashes")
    val plans = (1 to nHashes).flatMap { r =>
      val b = nHashes / r
      if (b >= 1)
        Some(LshPlan(b, r, math.pow(1.0 / b, 1.0 / r),
          candidateProbability(threshold, b, r)))
      else None
    }
    // ties on implied threshold (e.g. 2×2 vs 4×4, both 0.707) resolve to
    // the plan with the LOWER candidate probability at the target — the
    // documented fewer-sub-threshold-candidates tie-break
    val below = plans.filter(_.impliedThreshold <= threshold)
    if (below.nonEmpty) below.maxBy(p => (p.impliedThreshold, -p.pAtThreshold))
    else plans.minBy(p => (p.impliedThreshold, p.pAtThreshold))
  }

  /** Benchmark decontamination: corpus documents sharing any word
    * `n`-gram with the `benchmark` set, with the overlap count —
    * `(idCol, n_overlaps)`, overlap counted over DISTINCT corpus-side
    * n-grams. Standard eval-leakage sweep before training.
    *
    * The benchmark's distinct shingle hashes BROADCAST (eval sets are
    * small), so the corpus is flagged map-side in one pass — no shuffle
    * of the 100 TB side; only the per-doc overlap counts aggregate. */
  def contaminationFlags(
      corpus: DataFrame,
      benchmark: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 8
  ): MayFail[DataFrame] = MayFail {
    require(n >= 2, s"n-gram order must be >= 2: $n")
    val c = corpus.select(col(idCol).as("id"),
      explode(array_distinct(wordShingleHashes(col(textCol), n))).as("__sh"))
    val b = benchmark
      .select(explode(array_distinct(wordShingleHashes(col(textCol), n))).as("__sh"))
      .distinct()
    c.join(broadcast(b), Seq("__sh"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_overlaps"))
      .select(col("id").as(idCol), col("n_overlaps"))
  }

  /** Per-benchmark contamination report: [[contaminationFlags]] across a
    * NAMED set of benchmarks in one call — `(idCol, benchmark,
    * n_overlaps)`, one row per (document, benchmark) with any shared
    * n-gram. The provenance a decontamination sweep actually needs:
    * which eval set leaked, not just that something did.
    *
    * The benchmarks' distinct shingles are tagged with their name,
    * unioned, and broadcast as ONE (shingle, benchmark) table, so the
    * corpus-side gram stream is scanned and shingled exactly once no
    * matter how many benchmarks — and still never shuffled. */
  def contaminationReport(
      corpus: DataFrame,
      benchmarks: Map[String, DataFrame],
      textCol: String,
      idCol: String,
      n: Int = 8
  ): MayFail[DataFrame] = MayFail {
    require(n >= 2, s"n-gram order must be >= 2: $n")
    require(benchmarks.nonEmpty, "contaminationReport needs at least one benchmark")
    val c = corpus.select(col(idCol).as("id"),
      explode(array_distinct(wordShingleHashes(col(textCol), n))).as("__sh"))
    val tagged = benchmarks.toSeq.sortBy(_._1).map { case (name, bench) =>
      bench
        .select(explode(array_distinct(wordShingleHashes(col(textCol), n))).as("__sh"))
        .distinct()
        .select(col("__sh"), lit(name).as("benchmark"))
    }.reduce(_ unionByName _)
    c.join(broadcast(tagged), Seq("__sh"))
      .groupBy("id", "benchmark")
      .agg(count(lit(1)).as("n_overlaps"))
      .select(col("id").as(idCol), col("benchmark"), col("n_overlaps"))
  }

  /** Pairwise content overlap between SOURCES: exact distinct-shingle
    * Jaccard per source pair — the dataset-level report that guides
    * mixing weights and flags which source pairs need cross dedup.
    * Returns `(source_a, source_b, n_a, n_b, n_common, jaccard)` for
    * pairs with at least one shared shingle (`source_a < source_b`).
    *
    * Scale shape: one `(8-byte shingle hash, source)` distinct
    * aggregation, then a self-join on the hash — a shingle present in k
    * sources contributes k² join rows, so the blowup is bounded by
    * `nSources²` per shingle, NOT corpus size; per-source distinct
    * counts broadcast onto the tiny pair frame. Text never shuffles.
    * Exact (no sketch): at 10^12 distinct shingles the (hash, source)
    * frame is a plain 16-byte-row aggregate — the same cost class as
    * [[exact]] dedup.
    *
    * A NULL source is reported as a real NULL row, ordered BEFORE every
    * non-null source (so it always appears as `source_a`) — without the
    * explicit null arm a null slice would survive the shingle
    * aggregation but vanish from the pair report, because
    * `source_a < source_b` is NULL for it. The source column keeps its
    * original type and its native `<` pair orientation. */
  def sourceOverlap(
      df: DataFrame,
      textCol: String,
      sourceCol: String,
      shingleSize: Int = 3
  ): MayFail[DataFrame] = MayFail {
    require(shingleSize >= 1, s"shingleSize must be >= 1: $shingleSize")
    val sh = df.select(col(sourceCol).as("__src"),
        explode(array_distinct(
          wordShingleHashes(coalesce(col(textCol), lit("")), shingleSize))).as("__h"))
      .distinct()
    val perSrc = sh.groupBy("__src").agg(count(lit(1)).as("__n"))
    sh.select(col("__h"), col("__src").as("source_a"))
      .join(sh.select(col("__h"), col("__src").as("source_b")), Seq("__h"))
      // NULL sorts first: the explicit null arm keeps a null-source
      // slice in the report (plain `<` is NULL against NULL)
      .filter(col("source_a") < col("source_b") ||
        (col("source_a").isNull && col("source_b").isNotNull))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_common"))
      // null-safe equality so the NULL source row finds its own count
      .join(broadcast(perSrc.select(col("__src").as("__sa"), col("__n").as("n_a"))),
        col("source_a") <=> col("__sa"))
      .join(broadcast(perSrc.select(col("__src").as("__sb"), col("__n").as("n_b"))),
        col("source_b") <=> col("__sb"))
      .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"), col("n_common"),
        round(col("n_common") / (col("n_a") + col("n_b") - col("n_common")), 6).as("jaccard"))
  }

  // ---- cap observability ----------------------------------------------
  //
  // `maxBucket` is a necessary guard (a degenerate bucket makes the
  // in-bucket verification quadratic), but a silent one: a
  // boilerplate-heavy corpus at 100 TB could lose recall with nothing in
  // the output saying so. These reports surface what the cap dropped —
  // the library's own "no silent caps" posture applied to itself. Each
  // report bands with the SAME key definition as its paired pair
  // generator (shared private helpers), so the numbers describe exactly
  // the run you'd do.

  /** One-row occupancy/cap report over a `(id, __keys)` banding:
    * `(n_buckets, n_dropped_buckets, rows_in_dropped_buckets,
    * max_occupancy)`. A "dropped" bucket is one the paired pair
    * generator skips for holding more than `maxBucket` occupants;
    * `rows_in_dropped_buckets` counts (id, band) memberships whose
    * candidate pairs are silently lost to the cap. */
  private def capReportFromKeys(keyed: DataFrame, maxBucket: Int): DataFrame =
    keyed.select(posexplode(col("__keys")).as(Seq("band", "bucket")))
      .groupBy("band", "bucket").agg(count(lit(1)).as("__n"))
      .agg(count(lit(1)).as("n_buckets"),
        count(when(col("__n") > maxBucket, lit(1))).as("n_dropped_buckets"),
        coalesce(sum(when(col("__n") > maxBucket, col("__n"))), lit(0L))
          .as("rows_in_dropped_buckets"),
        coalesce(max(col("__n")), lit(0L)).as("max_occupancy"))

  /** Cap report for the banding [[minhashPairs]]/[[minhashDedup]] would
    * use at these parameters. `n_dropped_buckets > 0` means the run
    * loses candidate pairs to the `maxBucket` guard — raise the cap,
    * exact-dedup first (boilerplate clones are the usual culprit), or
    * accept and record the recall deviation. */
  /** MEASURED recall of any candidate pair set against brute-force ground
    * truth on a deterministic sample — the audit harness for LSH banding
    * and bucket caps, whose recall at corpus scale is otherwise an
    * S-curve formula (see [[lshPlan]]) evaluated on an assumed similarity
    * distribution, not a number measured on YOUR corpus.
    *
    * Sampling is the library's portable draw (`portableHash60(salt § id)
    * mod 10⁶ < fraction·10⁶` — a pure function of the data, identical
    * across reruns and engines); ground truth is exact shingle-hash
    * Jaccard ≥ `threshold` brute-forced over all sample pairs; a pair is
    * "recalled" when `pairs` contains it in either orientation. Returns
    * ONE row `(n_sampled, true_pairs, recalled_pairs, recall)` — recall
    * is NULL when the sample holds no true pairs (raise the fraction).
    *
    * Scale: the brute-force truth is O(m²) kernel Jaccards for m =
    * fraction·n sample docs — the sample side is broadcast, so the
    * quadratic scoring distributes over executors without shuffling,
    * but `sampleFraction` must be sized for m in the 10³–10⁵ range (at
    * 10⁵ docs ≈ 5×10⁹ comparisons — an audit-job budget, not a per-batch
    * one). Everything else is slim aggregates. */
  def pairRecallEstimate(
      df: DataFrame,
      textCol: String,
      idCol: String,
      pairs: DataFrame,
      threshold: Double,
      sampleFraction: Double,
      shingleSize: Int = 3,
      salt: String = "recall"
  ): MayFail[DataFrame] = MayFail {
    require(threshold > 0.0 && threshold <= 1.0, s"threshold in (0,1]: $threshold")
    require(sampleFraction > 0.0 && sampleFraction <= 1.0,
      s"sampleFraction in (0,1]: $sampleFraction")
    val draw = pmod(
      portableHash60(concat(lit(s"$salt§"), col(idCol).cast("string"))),
      lit(1000000L))
    val sampled = df.filter(draw < math.round(sampleFraction * 1e6))
    val sh = sampled.select(col(idCol).cast("long").as("id"),
        wordShingleHashes(col(textCol), shingleSize).as("__sh"))
      .filter(size(col("__sh")) > 0)
    val truth = sh.select(col("id").as("idA"), col("__sh").as("__shA"))
      .join(broadcast(sh.select(col("id").as("idB"), col("__sh").as("__shB"))),
        col("idA") < col("idB"))
      .filter(jaccardHashes(col("__shA"), col("__shB")) >= threshold)
      .select("idA", "idB")
    val got = pairs.select(
      least(col("idA").cast("long"), col("idB").cast("long")).as("idA"),
      greatest(col("idA").cast("long"), col("idB").cast("long")).as("idB"))
    val recalled = truth.join(got, Seq("idA", "idB"), "left_semi")
    sampled.agg(count(lit(1)).as("n_sampled"))
      .crossJoin(broadcast(truth.agg(count(lit(1)).as("true_pairs"))))
      .crossJoin(broadcast(recalled.agg(count(lit(1)).as("recalled_pairs"))))
      .select(col("n_sampled"), col("true_pairs"), col("recalled_pairs"),
        when(col("true_pairs") === 0, lit(null).cast("double"))
          .otherwise(round(col("recalled_pairs").cast("double") /
            col("true_pairs"), 6)).as("recall"))
  }

  def minhashCapReport(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleSize: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      maxBucket: Int = 1000
  ): MayFail[DataFrame] = MayFail {
    capReportFromKeys(
      minhashKeyed(minhashShingled(df, textCol, idCol, shingleSize),
        bands, rowsPerBand), maxBucket)
  }

  /** Cap report for [[minhashPairsAgainst]]/[[dedupAgainst]]: one row per
    * side (`side` ∈ batch, reference) — the cross-corpus join drops a
    * bucket per SIDE, so both sides' occupancy matters. */
  def incrementalCapReport(
      batch: DataFrame,
      reference: DataFrame,
      textCol: String,
      idCol: String,
      shingleSize: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      maxBucket: Int = 1000
  ): MayFail[DataFrame] = MayFail {
    def side(df: DataFrame, name: String): DataFrame =
      capReportFromKeys(
        minhashKeyed(minhashShingled(df, textCol, idCol, shingleSize),
          bands, rowsPerBand), maxBucket)
        .select(lit(name).as("side"), col("*"))
    side(batch, "batch").unionByName(side(reference, "reference"))
  }

  /** Cap report for [[embeddingNearDupPairs]] (seeded hyperplane tables;
    * `nBits <= 0` auto-sizes exactly as the pair generator does). */
  def embeddingCapReport(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      nBits: Int = 16,
      tables: Int = 4,
      maxBucket: Int = 2000
  ): MayFail[DataFrame] = MayFail {
    val base = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    capReportFromKeys(
      seededEmbeddingKeyed(base, seededBits(base, nBits), tables), maxBucket)
  }

  /** Cap report for [[embeddingNearDupPairsPortable]] — every counter is
    * a pure function of the data (md5-sign signatures), so an external
    * SQL engine can recompute the report bit-for-bit (the gate does). */
  def embeddingCapReportPortable(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      bandBits: Int = 10,
      nBands: Int = 6,
      maxBucket: Int = 2000
  ): MayFail[DataFrame] = MayFail {
    capReportFromKeys(
      portableEmbeddingKeyed(df, vecCol, idCol, bandBits, nBands), maxBucket)
  }

  /** Benchmark-decontamination screen — the overlap check every serious
    * training pipeline runs before an eval claim (the 13-gram
    * convention is the GPT-3 appendix-C method, publicly described in
    * Brown et al. 2020): flag each training document sharing at least
    * one word `n`-gram with the benchmark corpus. Both frames must
    * carry `textCol`/`idCol` under the same names.
    *
    * Returns one row PER CONTAMINATED TRAINING DOC:
    * `(idCol, n_grams, n_hit_grams, n_bench_docs: bigint,
    * contamination: double)` — `n_grams` = the doc's distinct n-grams,
    * `n_hit_grams` how many of them appear anywhere in the benchmark,
    * `n_bench_docs` how many distinct benchmark docs share at least one
    * gram, `contamination = n_hit_grams/n_grams`. Anti-join the result
    * on `idCol` to get the decontaminated corpus; docs shorter than `n`
    * tokens have no grams and cannot be flagged.
    *
    * Plan: both gram explosions are map-side (the codegen'd
    * [[graft.functions.TextFunctions.wordNgrams]] kernel) and reduce to
    * DISTINCT (id, gram) sets before anything joins; the join key is
    * the gram string — high-order grams are near-unique, so the join
    * fans out only on genuine contamination. Benchmarks are small next
    * to a 100 TB corpus: Catalyst broadcasts the benchmark gram set
    * when it fits, and the shuffle join it falls back to is keyed on
    * grams (no skew — a gram repeated across the whole benchmark is
    * still one key side). Counts exact; the ratio is one division.
    */
  def contaminationScreen(
      train: DataFrame,
      bench: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 13,
      lowercase: Boolean = true
  ): MayFail[DataFrame] = MayFail {
    require(n >= 1, s"n-gram order must be >= 1: $n")
    def grams(df: DataFrame, out: String): DataFrame =
      df.select(col(idCol).as(out),
          explode(wordNgrams(col(textCol), n, lowercase)).as("__g"))
        .distinct()
    val tg = grams(train, "__tid")
    val bg = grams(bench, "__bid")
    val tot = tg.groupBy("__tid").agg(count(lit(1)).as("n_grams"))
    tg.join(bg, Seq("__g"))
      .groupBy("__tid")
      .agg(countDistinct(col("__g")).as("n_hit_grams"),
        countDistinct(col("__bid")).as("n_bench_docs"))
      .join(tot, Seq("__tid"))
      .select(col("__tid").as(idCol), col("n_grams"), col("n_hit_grams"),
        col("n_bench_docs"),
        (col("n_hit_grams").cast("double") / col("n_grams"))
          .as("contamination"))
  }

  /** CONTAINMENT near-dup pairs — the asymmetric companion to
    * [[minhashPairs]]' Jaccard: containment(A in B) =
    * |grams(A) ∩ grams(B)| / |grams(A)|. Jaccard misses exactly the
    * pairs that matter for quote/boilerplate/superset dedup (a page
    * fully contained in a longer page can have arbitrarily small
    * Jaccard); containment finds them.
    *
    * Candidates come from a GRAM-KEYED equi-join (the
    * [[contaminationScreen]] shape, pairwise): distinct word n-grams
    * per document, with grams whose document frequency exceeds
    * `maxGramDf` dropped BEFORE pairing — a corpus-wide stop-gram is
    * quadratic in the corpus; the cap prunes candidates, never scores,
    * and is queryable via [[containmentCapReport]]. Gram-set sizes are
    * computed over the SAME capped vocabulary, so both containments
    * are exact in-vocabulary fractions (≤ 1 by construction).
    *
    * The threshold applies to the ROUNDED max-containment (house
    * tie-shift — scores are small-denominator rationals; see the
    * Linkage scaladoc for why raw-double thresholds are one ulp from
    * flipping). Returns `(id_a, id_b, shared, n_a, n_b,
    * containment_a, containment_b)`, `id_a < id_b`.
    */
  def containmentPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 5,
      threshold: Double = 0.8,
      maxGramDf: Long = 1000L,
      lowercase: Boolean = true
  ): MayFail[DataFrame] = MayFail {
    require(n >= 1, s"n-gram order must be >= 1: $n")
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0, 1]: $threshold")
    require(maxGramDf >= 2, s"maxGramDf must be >= 2: $maxGramDf")
    val g0 = df.select(col(idCol).as("__id"),
        explode(wordNgrams(col(textCol), n, lowercase)).as("__g"))
      .distinct()
    val hot = g0.groupBy("__g").agg(count(lit(1)).as("__df"))
      .filter(col("__df") > maxGramDf)
      .select("__g")
    val g = g0.join(broadcast(hot), Seq("__g"), "left_anti")
    val sizes = g.groupBy("__id").agg(count(lit(1)).as("__gs"))
    val pairs = g.select(col("__id").as("id_a"), col("__g"))
      .join(g.select(col("__id").as("id_b"), col("__g")), Seq("__g"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("shared"))
    pairs
      .join(sizes.select(col("__id").as("id_a"), col("__gs").as("n_a")),
        Seq("id_a"))
      .join(sizes.select(col("__id").as("id_b"), col("__gs").as("n_b")),
        Seq("id_b"))
      .withColumn("containment_a",
        round(col("shared") / col("n_a") + lit(1e-9), 6))
      .withColumn("containment_b",
        round(col("shared") / col("n_b") + lit(1e-9), 6))
      .filter(greatest(col("containment_a"), col("containment_b"))
        >= threshold)
      .select("id_a", "id_b", "shared", "n_a", "n_b",
        "containment_a", "containment_b")
  }

  /** [[containmentPairs]] against a REFERENCE corpus — the
    * incremental-ingest / decontamination form: how much of each NEW
    * document's distinct n-gram set is contained in some reference
    * document (quote detection, benchmark leakage, partial-copy
    * screening across corpus versions). The df cap is computed on the
    * REFERENCE side (its stop-grams are the ones that explode the
    * candidate join).
    *
    * Returns `(id_new, id_ref, shared, n_new, n_ref: bigint,
    * containment_new, containment_ref: double)` for pairs whose
    * GREATER containment clears `threshold` — threshold and outputs on
    * the ROUNDED score (the q280 boundary convention).
    *
    * Plan: identical scale posture to [[containmentPairs]] — distinct
    * gram sets per side, reference-side hot-gram anti-join BEFORE the
    * gram-keyed candidate join, caps prune candidates never scores.
    */
  def containmentPairsAgainst(
      dfNew: DataFrame,
      dfRef: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 5,
      threshold: Double = 0.8,
      maxGramDf: Long = 1000L,
      lowercase: Boolean = true
  ): MayFail[DataFrame] = MayFail {
    require(n >= 1, s"n-gram order must be >= 1: $n")
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0, 1]: $threshold")
    require(maxGramDf >= 2, s"maxGramDf must be >= 2: $maxGramDf")
    def grams(d: DataFrame) = d.select(col(idCol).as("__id"),
        explode(wordNgrams(col(textCol), n, lowercase)).as("__g"))
      .distinct()
    val gRef0 = grams(dfRef)
    val hot = gRef0.groupBy("__g").agg(count(lit(1)).as("__df"))
      .filter(col("__df") > maxGramDf)
      .select("__g")
    val gRef = gRef0.join(broadcast(hot), Seq("__g"), "left_anti")
    val gNew = grams(dfNew).join(broadcast(hot), Seq("__g"), "left_anti")
    val sizesNew = gNew.groupBy("__id").agg(count(lit(1)).as("__gs"))
    val sizesRef = gRef.groupBy("__id").agg(count(lit(1)).as("__gs"))
    gNew.select(col("__id").as("id_new"), col("__g"))
      .join(gRef.select(col("__id").as("id_ref"), col("__g")), Seq("__g"))
      .groupBy("id_new", "id_ref")
      .agg(count(lit(1)).as("shared"))
      .join(sizesNew.select(col("__id").as("id_new"),
        col("__gs").as("n_new")), Seq("id_new"))
      .join(sizesRef.select(col("__id").as("id_ref"),
        col("__gs").as("n_ref")), Seq("id_ref"))
      .withColumn("containment_new",
        round(col("shared") / col("n_new") + lit(1e-9), 6))
      .withColumn("containment_ref",
        round(col("shared") / col("n_ref") + lit(1e-9), 6))
      .filter(greatest(col("containment_new"), col("containment_ref"))
        >= threshold)
      .select("id_new", "id_ref", "shared", "n_new", "n_ref",
        "containment_new", "containment_ref")
  }

  /** What [[containmentPairs]]' `maxGramDf` cap would drop: the grams
    * above the document-frequency cap, hottest first. Returns
    * `(gram, doc_freq)`. */
  def containmentCapReport(
      df: DataFrame,
      textCol: String,
      idCol: String,
      n: Int,
      maxGramDf: Long,
      lowercase: Boolean = true
  ): MayFail[DataFrame] = MayFail {
    require(maxGramDf >= 1, s"maxGramDf must be >= 1: $maxGramDf")
    df.select(col(idCol).as("__id"),
        explode(wordNgrams(col(textCol), n, lowercase)).as("gram"))
      .distinct()
      .groupBy("gram").agg(count(lit(1)).as("doc_freq"))
      .filter(col("doc_freq") > maxGramDf)
      .orderBy(col("doc_freq").desc, col("gram"))
  }

  /** WINNOWING document fingerprints (Schleimer, Wilkerson & Aiken,
    * SIGMOD 2003 — the MOSS algorithm): hash every CHARACTER k-gram,
    * slide a window of `w` consecutive gram hashes, select each
    * window's minimum, deduplicate the selections. The guarantee that
    * makes this the standard robust fingerprint: any substring match of
    * length ≥ w + k − 1 between two documents shares at least one
    * SELECTED fingerprint (every such match spans a full window on both
    * sides), at expected density 2/(w+1) of the grams — so a document
    * reduces to a small position-tagged fingerprint set that still
    * catches every long-enough verbatim overlap. Character-level, so it
    * sees through tokenization: the complement of the word-shingle
    * MinHash family ([[minhashPairs]]) for verbatim-run detection
    * (license boilerplate, quoted passages, template clones).
    *
    * DETERMINISM / replayability: the gram hash is the repo's portable
    * md5 device (first 11 hex digits → 44-bit long), and the selection
    * compares the SINGLE integer `c = h·2¹⁷ + pos` (lexicographic
    * (hash, pos) min as one BIGINT — ties toward the earliest position)
    * so any engine replays window minima with plain integer min. The
    * 2¹⁷ position field bounds documents at 131,071 chars — exceeding
    * it raises loudly rather than fingerprinting wrongly (segment
    * longer docs first: [[graft.operators.Segments]]).
    *
    * Scale shape: one explode to the gram frame (rows × avg chars), one
    * PER-DOCUMENT ordered window (partitions are single documents —
    * parallelism is the corpus), one distinct. No corpus-wide shuffle
    * keyed on anything global.
    *
    * Returns `(id, pos: 1-based gram position, fp: bigint)`. Documents
    * shorter than `k` chars produce no rows; documents with fewer than
    * `w` grams winnow their single short window (the MOSS convention).
    */
  def winnowFingerprints(
      df: DataFrame,
      textCol: String,
      idCol: String,
      k: Int = 8,
      w: Int = 4
  ): MayFail[DataFrame] = MayFail {
    require(k >= 2 && k <= 64, s"gram size k must be in 2..64: $k")
    require(w >= 1 && w <= 64, s"window w must be in 1..64: $w")
    val n = length(col(textCol))
    val grams = df
      .filter(col(textCol).isNotNull && n >= k)
      .select(col(idCol).as("id"), col(textCol).as("__t"),
        (n - k + 1).as("__g"),
        explode(sequence(lit(1), n - k + 1)).as("pos"))
      .withColumn("pos",
        when(col("pos") > 131071,
          raise_error(lit("winnowFingerprints: document exceeds 131071 " +
            "grams — segment it first"))).otherwise(col("pos")))
      .withColumn("__h",
        conv(substring(md5(col("__t").substr(col("pos"), lit(k))), 1, 11),
          16, 10).cast("long"))
      .withColumn("__c", col("__h") * 131072L + col("pos"))
    val win = Window.partitionBy(col("id")).orderBy(col("pos"))
      .rowsBetween(0, w - 1)
    grams
      .withColumn("__cmin", min(col("__c")).over(win))
      // only full windows select (trailing starts are suffixes of the
      // last full window); a doc with < w grams keeps its single
      // all-gram window at pos 1
      .filter(col("pos") <= greatest(col("__g") - w + 1, lit(1)))
      .select(col("id"), col("__cmin")).distinct()
      .select(col("id"),
        pmod(col("__cmin"), lit(131072L)).as("pos"),
        expr("__cmin div 131072").as("fp"))
  }

  /** EXACT-threshold token-set similarity join via PREFIX FILTERING
    * (Chaudhuri et al. ICDE 2006 / Bayardo et al. WWW 2007): every pair
    * with token-set Jaccard ≥ `threshold`, with NO misses — the lossless
    * complement of [[minhashPairs]] (LSH trades recall for speed; this
    * trades a bounded candidate blow-up for exactness, for when the
    * dedup decision must be auditable).
    *
    * The pruning and its guarantee: tokens sort by a GLOBAL
    * (document-frequency, token) order, so each document's PREFIX —
    * its first `|x| − ⌈t·|x|⌉ + 1` rarest tokens — must contribute at
    * least one member of any qualifying intersection: J(x,y) ≥ t ⟹
    * |x∩y| ≥ t·|x∪y| ≥ ⌈t·|x|⌉, and x's non-prefix suffix holds only
    * ⌈t·|x|⌉ − 1 tokens, so some shared token sits in x's prefix
    * (pigeonhole — no appeal to where it sits in y). Candidates are
    * therefore prefix(x) ⋈ alltokens(y); because the order is
    * df-ASCENDING, prefixes hold the RAREST tokens and the join fans
    * out on small buckets by construction. The |y| ∈ [t·|x|, |x|/t]
    * length bound prunes further (same lemma family). Candidates then
    * verify by exact intersection counts — output equals the brute
    * force bit-for-bit (the q335 oracle IS the brute force).
    *
    * Tokenization: [[graft.functions.TextFunctions.tokens]] (lowercased
    * whitespace split), DISTINCT per doc. Plan shape: one per-doc window
    * for (rank, size), one token equi-join for candidates, one for
    * verification — no global sort, no cross join. Returns
    * `(idA, idB, jaccard)`, idA < idB, jaccard rounded at 6. */
  def jaccardJoin(
      df: DataFrame,
      textCol: String,
      idCol: String,
      threshold: Double = 0.8
  ): MayFail[DataFrame] = MayFail {
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0,1]: $threshold")
    val toks = df
      .select(col(idCol).as("id"),
        explode(array_distinct(tokens(col(textCol)))).as("tok"))
      .localCheckpoint()
    val dfreq = toks.groupBy("tok").agg(count(lit(1)).as("__df"))
    val wDoc = Window.partitionBy(col("id"))
      .orderBy(col("__df"), col("tok"))
    val sized = toks.join(dfreq, Seq("tok"))
      .withColumn("__rn", row_number().over(wDoc))
      .withColumn("__sz", count(lit(1)).over(Window.partitionBy(col("id"))))
    val prefix = sized
      .filter(col("__rn") <=
        col("__sz") - ceil(lit(threshold) * col("__sz")).cast("long") + 1)
      .select(col("tok"), col("id"), col("__sz"))
    val szs = sized.select(col("id"), col("__sz")).distinct()
    val cand = prefix
      .select(col("tok"), col("id").as("idA"), col("__sz").as("__szA"))
      .join(sized.select(col("tok"), col("id").as("idB"),
        col("__sz").as("__szB")), Seq("tok"))
      .filter(col("idA") =!= col("idB"))
      .select(least(col("idA"), col("idB")).as("idA"),
        greatest(col("idA"), col("idB")).as("idB"),
        least(col("__szA"), col("__szB")).as("__szMin"),
        greatest(col("__szA"), col("__szB")).as("__szMax"))
      .filter(col("__szMin").cast("double") >=
        lit(threshold) * col("__szMax").cast("double"))
      .select("idA", "idB").distinct()
    val tA = toks.select(col("id").as("idA"), col("tok"))
    val tB = toks.select(col("id").as("idB"), col("tok"))
    cand.join(tA, Seq("idA")).join(tB, Seq("idB", "tok"))
      .groupBy("idA", "idB").agg(count(lit(1)).as("__i"))
      .join(szs.select(col("id").as("idA"), col("__sz").as("__szA")), Seq("idA"))
      .join(szs.select(col("id").as("idB"), col("__sz").as("__szB")), Seq("idB"))
      .withColumn("jaccard", col("__i").cast("double") /
        (col("__szA") + col("__szB") - col("__i")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("idA"), col("idB"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Winnowed near-verbatim candidate pairs: documents sharing ≥
    * `minShared` distinct winnowing fingerprints — by the winnowing
    * guarantee, a recall-complete candidate set for verbatim overlaps
    * of ≥ `w + k − 1` chars (at minShared = 1). The fingerprint join is
    * skew-capped the [[minhashPairs]] way: a fingerprint appearing in
    * more than `maxBucket` documents is boilerplate (its pairs are
    * quadratic and tell you nothing) and is dropped by
    * [[Banding.capBuckets]]; singleton fingerprints can't pair and drop
    * with the same aggregate. Returns `(idA, idB, n_shared)`,
    * idA < idB. */
  def winnowPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      k: Int = 8,
      w: Int = 4,
      minShared: Long = 2L,
      maxBucket: Int = 1000
  ): MayFail[DataFrame] =
    winnowFingerprints(df, textCol, idCol, k, w).map { fps =>
      require(minShared >= 1, s"minShared must be >= 1: $minShared")
      val docFp = fps.select(col("id"), col("fp")).distinct()
      val capped = Banding.capBuckets(docFp, Seq("fp"), maxBucket,
        minOccupancy = 2)
      capped.select(col("fp"), col("id").as("idA"))
        .join(capped.select(col("fp"), col("id").as("idB")), Seq("fp"))
        .filter(col("idA") < col("idB"))
        .groupBy("idA", "idB").agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= minShared)
    }

  /** EXACT-threshold edit-distance join via q-gram PREFIX FILTERING
    * (Ed-Join family, Xiao et al. VLDB 2008): every pair of strings with
    * Levenshtein distance ≤ `maxDist`, with NO misses — the string-edit
    * complement of [[jaccardJoin]] (token sets) and
    * [[simhashPairs]]/[[minhashPairs]] (approximate). Use it on bounded
    * "signature" strings (titles, URLs, first-letter signatures, IDs);
    * edit distance on multi-KB bodies is the wrong tool at any scale.
    *
    * The pruning and its guarantee: one edit destroys at most `q`
    * positional q-grams, so ed(x,y) ≤ d leaves at most q·d of x's
    * |x|−q+1 positional grams destroyed. x's PREFIX — its q·d+1
    * positional grams rarest in a GLOBAL (document-frequency, gram, pos)
    * order — therefore always keeps one gram intact in y, and an intact
    * positional gram is a substring of y, i.e. a member of y's distinct
    * gram set. (Positional grams on the prefix side, not distinct ones:
    * a repetitive string can have fewer than q·d+1 DISTINCT grams, all
    * destroyable, but destruction counts multiplicity, so q·d+1
    * positional grams cannot all die.) Candidates are prefix(x) ⋈
    * distinctGrams(y) on (gram, LENGTH BAND): because the order is
    * df-ascending, prefixes hold the rarest grams; and since each
    * edit shifts length by ≤ 1, |len(x)−len(y)| ≤ d confines matches
    * to adjacent len-div-(d+1) bands, so the prefix side explodes to
    * {b−1, b, b+1} and hot gram buckets split by band — lossless,
    * and the decisive cut when the gram alphabet saturates (1.87×
    * on the q337 signature workload). Survivors re-check the exact
    * length bound and verify with the codegen'd banded-DP
    * `levenshtein(_, _, maxDist)` — output equals brute force
    * bit-for-bit (the q337 oracle IS the brute force).
    *
    * Strings shorter than q·(maxDist+1) chars have fewer than q·d+1
    * grams and are EXCLUDED (documented contract, mirrored by the
    * oracle): below that length the prefix lemma cannot hold — route
    * short strings through a smaller `q` (q=1 admits length ≥
    * maxDist+1) or an exact key join. Returns `(idA, idB, dist: int)`,
    * idA < idB. */
  def editDistanceJoin(
      df: DataFrame,
      strCol: String,
      idCol: String,
      maxDist: Int = 2,
      q: Int = 2
  ): MayFail[DataFrame] = MayFail {
    require(maxDist >= 1, s"maxDist must be >= 1: $maxDist")
    require(q >= 1, s"q must be >= 1: $q")
    val minLen = q * (maxDist + 1)
    val base = df
      .filter(col(strCol).isNotNull && length(col(strCol)) >= minLen)
      .select(col(idCol).as("id"), col(strCol).as("__s"))
      .localCheckpoint()
    // length band = len div (d+1): |len(x)−len(y)| ≤ d forces bands
    // to differ by ≤ 1, so joining on (gram, band) with the prefix
    // side exploded to {b−1, b, b+1} is LOSSLESS while splitting hot
    // gram buckets by band — the decisive cut on low-entropy
    // signature alphabets, where a bare gram key saturates (a 26²
    // 2-gram space over first-letter signatures packs thousands of
    // ids per bucket; q337's cost model)
    val bandOf = expr(s"CAST(length(__s) AS BIGINT) div ${maxDist + 1}")
    val grams = base
      .select(col("id"), bandOf.as("__band"),
        explode(sequence(lit(1), length(col("__s")) - q + 1)).as("pos"),
        col("__s").as("__t"))
      .select(col("id"), col("__band"), col("pos"),
        col("__t").substr(col("pos"), lit(q)).as("gram"))
    val distinctGrams = grams.select("id", "__band", "gram").distinct()
    val dfreq = distinctGrams.select("id", "gram").distinct()
      .groupBy("gram").agg(count(lit(1)).as("__df"))
    val wDoc = Window.partitionBy(col("id"))
      .orderBy(col("__df"), col("gram"), col("pos"))
    val prefix = grams.join(dfreq, Seq("gram"))
      .withColumn("__rn", row_number().over(wDoc))
      .filter(col("__rn") <= q * maxDist + 1)
      .select(col("gram"), col("id"),
        explode(array(col("__band") - 1, col("__band"),
          col("__band") + 1)).as("__band"))
    val cand = prefix.select(col("gram"), col("__band"), col("id").as("idA"))
      .join(distinctGrams.select(col("gram"), col("__band"),
        col("id").as("idB")), Seq("gram", "__band"))
      .filter(col("idA") =!= col("idB"))
      .select(least(col("idA"), col("idB")).as("idA"),
        greatest(col("idA"), col("idB")).as("idB"))
      .distinct()
    val sA = base.select(col("id").as("idA"), col("__s").as("__sA"))
    val sB = base.select(col("id").as("idB"), col("__s").as("__sB"))
    cand.join(sA, Seq("idA")).join(sB, Seq("idB"))
      .filter(abs(length(col("__sA")) - length(col("__sB"))) <= maxDist)
      .withColumn("dist", levenshtein(col("__sA"), col("__sB"), maxDist))
      .filter(col("dist") >= 0)
      .select(col("idA"), col("idB"), col("dist"))
  }
}
