package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

import graft.functional.MayFail

/** Structured-Streaming operators.
  *
  * The reference's streams are pass-through pipes (Kafka → transform →
  * sink, append-only, no event-time semantics — SURVEY §2.9). That
  * surface lives in `physical.Read/Write/Screen`. This package adds what
  * a production stream at scale actually needs: event-time windows with
  * watermarks (bounded state), session windows, streaming dedup, and
  * custom keyed state — all standard Structured Streaming, so state is
  * checkpointed and recovers with the query.
  */
object Stream {

  /** Event-time tumbling/sliding window aggregation with a watermark
    * bounding state retention. */
  def windowedAgg(
      df: DataFrame,
      tsCol: String,
      watermarkDelay: String,
      windowDuration: String,
      aggs: Seq[Column],
      keys: Seq[String] = Nil,
      slideDuration: Option[String] = None): MayFail[DataFrame] = MayFail {
    require(aggs.nonEmpty, "windowedAgg needs at least one aggregate expression")
    val w = slideDuration match {
      case Some(slide) => window(col(tsCol), windowDuration, slide)
      case None        => window(col(tsCol), windowDuration)
    }
    df.withWatermark(tsCol, watermarkDelay)
      .groupBy(w.as("window") +: keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Session windows: events grouped while gaps stay under `gapDuration`. */
  def sessionAgg(
      df: DataFrame,
      tsCol: String,
      watermarkDelay: String,
      gapDuration: String,
      keys: Seq[String],
      aggs: Seq[Column]): MayFail[DataFrame] = MayFail {
    require(aggs.nonEmpty, "sessionAgg needs at least one aggregate expression")
    df.withWatermark(tsCol, watermarkDelay)
      .groupBy(session_window(col(tsCol), gapDuration).as("session") +: keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Streaming dedup. With a watermark the state for old keys is dropped
    * (`dropDuplicatesWithinWatermark`) — the only form that survives an
    * unbounded stream; without one, state grows forever (allowed for
    * bounded backfills only). */
  def deduplicate(
      df: DataFrame,
      keys: Seq[String],
      tsCol: Option[String] = None,
      watermarkDelay: Option[String] = None): MayFail[DataFrame] = MayFail {
    (tsCol, watermarkDelay) match {
      case (Some(ts), Some(delay)) =>
        df.withWatermark(ts, delay).dropDuplicatesWithinWatermark(keys)
      case (None, None) => df.dropDuplicates(keys)
      case _ => throw new IllegalArgumentException(
        "deduplicate needs BOTH tsCol and watermarkDelay for bounded state " +
          "(or neither, for bounded backfills only) — got exactly one")
    }
  }

  /** Stream-stream equi-join bounded by an event-time interval — the only
    * join shape whose state Structured Streaming can GARBAGE-COLLECT: the
    * watermarks plus the `right.ts ∈ [left.ts - lower, left.ts + upper]`
    * range condition let the engine drop buffered rows once the watermark
    * passes their match window, so state stays bounded on an unbounded
    * stream (an unconstrained stream-stream join buffers forever).
    *
    * `joinKeys` are (leftCol, rightCol) equality pairs; all column names
    * must be disjoint across the two sides (rename before joining — the
    * join condition references them unqualified).
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      leftTsCol: String,
      rightTsCol: String,
      joinKeys: Seq[(String, String)],
      watermarkDelay: String,
      lowerBound: String = "0 seconds",
      upperBound: String = "10 minutes",
      joinType: String = "inner"): MayFail[DataFrame] = MayFail {
    require(joinKeys.nonEmpty, "intervalJoin needs at least one key-equality pair")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"intervalJoin: column names must be disjoint, overlapping: ${overlap.mkString(", ")}")
    val l = left.withWatermark(leftTsCol, watermarkDelay)
    val r = right.withWatermark(rightTsCol, watermarkDelay)
    val keyCond = joinKeys.map { case (lk, rk) => col(lk) === col(rk) }
      .reduce(_ && _)
    val timeCond =
      col(rightTsCol) >= col(leftTsCol) - expr(s"INTERVAL '$lowerBound'") &&
        col(rightTsCol) <= col(leftTsCol) + expr(s"INTERVAL '$upperBound'")
    l.join(r, keyCond && timeCond, joinType)
  }

  /** Custom keyed running state via `mapGroupsWithState`: per-key event
    * count, value sum, and last-seen event time — the canonical stateful
    * enrichment shape. Output mode must be `update`. */
  def runningStats(
      ds: Dataset[(String, Double, java.sql.Timestamp)],
      idleTtlMs: Option[Long] = None): MayFail[Dataset[KeyStats]] =
    MayFail {
      import ds.sparkSession.implicits._
      // idleTtlMs bounds state for unbounded key cardinality: a key idle
      // past the TTL has its state dropped (its stats restart at zero if
      // it reappears). None keeps state forever — bounded key sets only.
      val timeout = idleTtlMs.fold[GroupStateTimeout](GroupStateTimeout.NoTimeout)(
        _ => GroupStateTimeout.ProcessingTimeTimeout)
      ds.groupByKey(_._1)
        .mapGroupsWithState[KeyStats, KeyStats](timeout) {
          (key: String, events: Iterator[(String, Double, java.sql.Timestamp)],
           state: GroupState[KeyStats]) =>
            if (state.hasTimedOut) {
              val last = state.get
              state.remove()
              last
            } else {
              val prev = state.getOption.getOrElse(KeyStats(key, 0L, 0.0, 0L))
              var n = prev.count
              var sum = prev.sum
              var lastTs = prev.lastSeenMs
              events.foreach { case (_, v, ts) =>
                n += 1; sum += v
                if (ts.getTime > lastTs) lastTs = ts.getTime
              }
              val next = KeyStats(key, n, sum, lastTs)
              state.update(next)
              idleTtlMs.foreach(state.setTimeoutDuration)
              next
            }
        }
    }

  /** Custom sessionization via `flatMapGroupsWithState` with event-time
    * timeouts: events accumulate per key; when the watermark passes the
    * last event + `gap`, the closed session is EMITTED and its state
    * dropped — the full stateful-stream lifecycle (accumulate → timeout →
    * emit → clean up), with state bounded by the watermark. Output mode
    * must be `append`. */
  def sessionize(
      ds: Dataset[(String, Double, java.sql.Timestamp)],
      gapMs: Long,
      watermarkDelay: String = "0 seconds",
      tsColName: String = "_3"): MayFail[Dataset[SessionSummary]] = MayFail {
    require(gapMs > 0, s"gapMs must be positive: $gapMs")
    import ds.sparkSession.implicits._
    // event-time timeouts REQUIRE a watermark on the input — apply it here
    // so the contract cannot be violated at query start
    ds.withWatermark(tsColName, watermarkDelay)
      .as[(String, Double, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionAcc, SessionSummary](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, events: Iterator[(String, Double, java.sql.Timestamp)],
         state: GroupState[SessionAcc]) =>
          if (state.hasTimedOut) {
            val acc = state.get
            state.remove()
            Iterator(SessionSummary(key, acc.n, acc.sum, acc.firstMs, acc.lastMs))
          } else {
            // events may arrive before the previous session's timeout has
            // fired — split on the gap DURING the update, emitting every
            // session that closed mid-batch
            val closed = scala.collection.mutable.ArrayBuffer.empty[SessionSummary]
            var acc = state.getOption.getOrElse(SessionAcc(0L, 0.0, Long.MaxValue, 0L))
            events.toSeq.sortBy(_._3.getTime).foreach { case (_, v, ts) =>
              val t = ts.getTime
              if (acc.n > 0 && t > acc.lastMs + gapMs) {
                closed += SessionSummary(key, acc.n, acc.sum, acc.firstMs, acc.lastMs)
                acc = SessionAcc(0L, 0.0, Long.MaxValue, 0L)
              }
              acc = SessionAcc(acc.n + 1, acc.sum + v,
                math.min(acc.firstMs, t), math.max(acc.lastMs, t))
            }
            state.update(acc)
            state.setTimeoutTimestamp(acc.lastMs + gapMs)
            closed.iterator
          }
      }
  }

  /** Streaming Page–Hinkley drift monitor — the ONLINE form of
    * [[graft.operators.TimeSeries.pageHinkley]], with BIT-IDENTICAL
    * arithmetic (same ×scale rounding, same running-mean term, same
    * left-fold m accumulation, same rounded-at-9 threshold), so a
    * stream and a batch replay of the same events produce the same
    * alarms — the state carries `(t, Σv, m, min m)` per key across
    * micro-batches.
    *
    * Input tuples: `(key, eventId, value, eventTime)`. Within a batch,
    * events process in `(eventTime, eventId)` order; ACROSS batches the
    * state simply continues, so out-of-order arrival across batch
    * boundaries degrades to run-segmented semantics — feed a
    * watermarked, source-ordered stream (or one batch via
    * availableNow) for exact batch parity.
    */
  def driftMonitor(
      ds: Dataset[(String, Long, Double, java.sql.Timestamp)],
      delta: Double,
      lambda: Double,
      scale: Long = 100L
  ): MayFail[Dataset[DriftPoint]] = MayFail {
    require(lambda > 0, s"lambda must be positive: $lambda")
    require(scale >= 1, s"scale must be >= 1: $scale")
    import ds.sparkSession.implicits._
    def round9(x: Double): Double =
      new java.math.BigDecimal(x)
        .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[DriftAcc, DriftPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, events: Iterator[(String, Long, Double, java.sql.Timestamp)],
         state: GroupState[DriftAcc]) =>
          var acc = state.getOption
            .getOrElse(DriftAcc(0L, 0L, 0.0, Double.MaxValue))
          // order by event-time MICROS (getTime alone truncates to ms
          // and would tie sub-ms events), then id
          def us(ts: java.sql.Timestamp): Long =
            ts.getTime / 1000 * 1000000L + ts.getNanos / 1000
          val out = events.toSeq.sortBy(e => (us(e._4), e._2)).map {
            case (_, id, v, _) =>
              // Spark's round(): exact-binary BigDecimal, HALF_UP
              val vi = new java.math.BigDecimal(v * scale)
                .setScale(0, java.math.RoundingMode.HALF_UP).longValue
              val t = acc.t + 1
              val s = acc.s + vi
              val term = vi.toDouble - s.toDouble / t - delta * scale
              val m = acc.m + term
              val minM = math.min(acc.minM, m)
              acc = DriftAcc(t, s, m, minM)
              val ph = (m - minM) / scale
              DriftPoint(key, id, vi.toDouble / scale, m / scale, ph,
                round9(ph + 1e-12) > lambda)
          }
          state.update(acc)
          out.iterator
      }
  }

  /** STREAMING MinHash-band near-duplicate detection against a FROZEN
    * reference corpus — the ingest-time "have we seen this before"
    * filter: each arriving document's banded minhash keys equi-join a
    * PRE-BUILT static reference index (broadcast by default), candidates
    * verify by exact shingle-hash Jaccard, and qualifying
    * `(idNew, idRef, jaccard)` hits emit. STATELESS by construction —
    * a stream-static join, no watermark, no state store: every
    * micro-batching of the same events yields row-identical output to
    * the batch operator (`Dedup.minhashPairsAgainst` with an uncapped
    * stream side), which is the q321 bit-parity gate.
    *
    * Dedup without state: a pair colliding in several bands would emit
    * once per band, so each candidate row keeps only its FIRST matching
    * band — a pure per-row predicate, no state store. The earlier-band
    * test must consult only bands that SURVIVED the bucket cap: a raw
    * `sk[j] == rk[j]` check would veto the pair on a band whose hot
    * bucket [[graft.operators.Banding.capBuckets]] dropped (that band's
    * join row never exists, so every later-band row would be filtered
    * and the pair silently lost exactly when boilerplate buckets appear
    * at ingest scale). Each index row therefore carries the ref doc's
    * surviving-band set `__sb` and the predicate is
    * `∄ j ∈ __sb, j < band: sk[j] = rk[j]` — batch parity
    * (`minhashPairsAgainst`, which dedups over surviving bands) holds
    * under ANY cap, not just when no bucket is hot (StreamSpec proves
    * the capped case).
    *
    * Scale shape: the reference index builds ONCE (banded, bucket-capped
    * with the [[graft.operators.Banding]] skew guard — `maxBucket` also
    * bounds per-event join fan-out); the stream side is a per-row
    * projection (shingle hashes + band keys) exploded `bands`-fold into
    * the equi-join. Broadcast the index when it fits (default); at
    * larger reference sizes the same plan shuffle-joins per batch. */
  def neardupAgainst(
      stream: DataFrame,
      reference: DataFrame,
      textCol: String,
      idCol: String,
      shingleSize: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      threshold: Double = 0.7,
      maxBucket: Int = 1000
  ): MayFail[DataFrame] = MayFail {
    import graft.functions.TextFunctions.jaccardHashes
    import graft.operators.Banding
    import graft.operators.Dedup
    require(stream.isStreaming, "neardupAgainst needs a streaming frame")
    require(!reference.isStreaming, "the reference corpus must be static")
    require(threshold > 0 && threshold <= 1, s"threshold in (0,1]: $threshold")
    // static side, built once: banded + capped index carrying each
    // ref doc's full key array (for the first-match predicate), and the
    // shingle table for exact verification
    val shR = Dedup.minhashShingled(reference, textCol, idCol, shingleSize)
      .localCheckpoint(true)
    val keyedR = Dedup.minhashKeyed(shR, bands, rowsPerBand)
    val idxR = Banding.capBuckets(
        keyedR.select(col("id"), col("__keys"),
          posexplode(col("__keys")).as(Seq("band", "bucket"))),
        Seq("band", "bucket"), maxBucket, minOccupancy = 1)
      // per-ref-doc surviving-band set (≤ `bands` ints/row): the
      // first-match predicate below may only veto on bands the cap kept
      .withColumn("__sb", sort_array(
        collect_set(col("band")).over(Window.partitionBy(col("id")))))
      .select(col("id").as("idRef"), col("__keys").as("__rk"),
        col("band"), col("bucket"), col("__sb"))
      .localCheckpoint(true)
    val refShingles = shR.select(col("id").as("idRef"),
      col("shingles").as("__pR"))
    // stream side: pure per-row projections, exploded by band
    val shS = stream.select(col(idCol).as("idNew"),
        graft.functions.TextFunctions
          .wordShingleHashes(col(textCol), shingleSize).as("__pN"))
      .filter(size(col("__pN")) > 0)
      .withColumn("__sk", graft.functions.TextFunctions
        .minhashBandKeysFromHashes(col("__pN"), bands, rowsPerBand))
      .select(col("idNew"), col("__pN"), col("__sk"),
        posexplode(col("__sk")).as(Seq("band", "bucket")))
    shS.join(broadcast(idxR), Seq("band", "bucket"))
      // first matching band only: no earlier SURVIVING band collides
      // (bands the cap dropped have no join row, so they must not veto)
      .filter(!exists(
        filter(col("__sb"), j => j < col("band")),
        j => element_at(col("__sk"), j + 1) === element_at(col("__rk"), j + 1)))
      .join(broadcast(refShingles), Seq("idRef"))
      .withColumn("jaccard", jaccardHashes(col("__pN"), col("__pR")))
      .filter(col("jaccard") >= threshold)
      .select(col("idNew"), col("idRef"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Stream-static enrichment join — the most common streaming verb:
    * attach dimension attributes to each event as it flows. Stateless
    * by construction (each micro-batch joins against the current dim
    * snapshot — no watermark, no state store), and the dim broadcasts
    * by default, so enrichment adds zero shuffle to the stream.
    * Spark supports inner and left-outer for the stream side of a
    * stream-static join; other types are rejected with a clear message
    * instead of Spark's analysis error. */
  def enrich(
      stream: DataFrame,
      dim: DataFrame,
      keys: Seq[String],
      joinType: String = "left",
      broadcastDim: Boolean = true): MayFail[DataFrame] = MayFail {
    require(keys.nonEmpty, "enrich needs at least one join key")
    val jt = joinType.toLowerCase
    require(Seq("inner", "left", "left_outer").contains(jt),
      s"stream-static enrichment supports inner/left joins, got: $joinType")
    val d = if (broadcastDim) broadcast(dim) else dim
    stream.join(d, keys, jt)
  }

  /** Drain a stream into an in-memory table synchronously — the offline
    * test/debug sink (pairs with `Read.fileStream`). Returns the result
    * as a batch frame after `processAllAvailable`. */
  def drainToMemory(
      df: DataFrame,
      queryName: String,
      outputMode: String = "append"): MayFail[DataFrame] =
    MayFail {
      val q = df.writeStream.outputMode(outputMode)
        .format("memory").queryName(queryName).start()
      q.processAllAvailable()
      q.stop()
      df.sparkSession.table(queryName)
    }

  /** STREAMING per-window DDSketch quantile sketches — the
    * unbounded-domain mergeable-quantile member of the windowed-sketch
    * family, mirroring [[windowedHllSketches]] (distinct counts) and
    * [[windowedBinCounts]] (fixed caller edges; THIS operator needs
    * none): each watermarked event-time window keeps a
    * [[graft.operators.Sketch.ddHistogram]] bucket map instead of its
    * raw values, so per-(window, keys) state is bucket-count-bounded
    * (≤ ~35k rows at α = 0.01 over the full double range, usually
    * hundreds) no matter how many events land in the window — the
    * stateful-agg shape Spark can run forever. Returns the streaming
    * `(window, keys..., store, bucket, n)` histogram; finish any drained
    * slice with [[graft.operators.Sketch.ddQuantilesFromHistogram]]
    * (keys = window start + keys) for the estimates, which carry the
    * sketch's relative-error α guarantee. Counts are exact integers, so
    * the drained histogram is BIT-equal to the batch
    * [[graft.operators.Sketch.ddHistogram]] of the same windowed slice
    * (the q334 parity argument), and drained sketches stay MERGEABLE
    * downstream: bucket counts add losslessly, so re-grouping drained
    * windows answers any quantile over any window union (the q387
    * merge-law gate: cross-window merge == batch over all events). */
  def windowedDdSketches(
      df: DataFrame,
      tsCol: String,
      windowDuration: String,
      watermark: String,
      valueCol: String,
      alpha: Double = 0.01,
      keys: Seq[String] = Nil): MayFail[DataFrame] = MayFail {
    require(df.isStreaming, "windowedDdSketches needs a streaming frame")
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1): $alpha")
    val lnG = math.log((1 + alpha) / (1 - alpha))
    val v = col(valueCol).cast("double")
    val (store, bucket) = graft.operators.Sketch.ddStoreBucket(v, lnG)
    df.filter(col(tsCol).isNotNull && v.isNotNull && !isnan(v))
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDuration) +: keys.map(col) :+
        store.as("store") :+ bucket.as("bucket"): _*)
      .agg(count(lit(1)).as("n"))
  }

  /** Pre-r12 name of [[windowedDdSketches]], kept for source
    * compatibility — same operator, the family naming landed with the
    * KMV/DDSketch batch members. */
  def windowedQuantileHistogram(
      df: DataFrame,
      tsCol: String,
      windowDuration: String,
      watermark: String,
      valueCol: String,
      alpha: Double = 0.01,
      keys: Seq[String] = Nil): MayFail[DataFrame] =
    windowedDdSketches(df, tsCol, windowDuration, watermark, valueCol,
      alpha, keys)

  /** STREAMING per-window BPE token counts under a FROZEN merge table
    * (r12 verdict ask #4): each watermarked event-time window sums the
    * exact token count of every word occurrence, tokenized by the ONE
    * codegen'd rank-map expression ([[graft.functions.BpeApplyMerges]]
    * — the same kernel as [[graft.operators.Bpe.tokenCountsDirect]],
    * whose join-free design exists precisely so it composes onto an
    * unbounded stream: no vocabulary join, no per-word state; the only
    * state is the windowed partial sum). The drained per-window sums
    * are EXACT integers, so they equal the batch replay of the same
    * windowed slice bit-for-bit (StreamSpec law + the q398 gate, whose
    * DuckDB oracle replays the merge table unrolled).
    *
    * The 100 TB shape: token-budget accounting over a live ingest
    * firehose — watermark bounds state, one partial-agg shuffle per
    * micro-batch, counts merge losslessly across windows downstream.
    * Tokenization is [[graft.functions.TextFunctions.tokens]]
    * (lowercase whitespace words, character-split symbols), identical
    * to the batch path. Returns `(window, keys..., n_tokens)`. */
  def windowedTokenCounts(
      df: DataFrame,
      tsCol: String,
      textCol: String,
      watermark: String,
      windowDuration: String,
      merges: Seq[(String, String)],
      keys: Seq[String] = Nil): MayFail[DataFrame] = MayFail {
    require(df.isStreaming, "windowedTokenCounts needs a streaming frame")
    import graft.functions.{BpeApplyMerges, FunctionBridge, TextFunctions}
    // eager table validation — a corrupt table must Fail here, not kill
    // the running streaming query from inside the lazy rank index
    new graft.functions.BpeRankIndex(merges)
    df.filter(col(tsCol).isNotNull && col(textCol).isNotNull)
      .withWatermark(tsCol, watermark)
      .select(col(tsCol) +: keys.map(col) :+
        explode(TextFunctions.tokens(col(textCol))).as("__word"): _*)
      .select(col(tsCol) +: keys.map(col) :+
        size(FunctionBridge.column(BpeApplyMerges(
          FunctionBridge.expression(split(col("__word"), "")), merges)))
          .cast("long").as("__nt"): _*)
      .groupBy(window(col(tsCol), windowDuration) +: keys.map(col): _*)
      .agg(sum(col("__nt")).as("n_tokens"))
  }

  /** [[windowedTokenCounts]]' greedy-vocabulary twin (r13 verdict ask
    * #7): per-window PIECE counts under a FROZEN vocabulary via the
    * one codegen'd longest-match expression
    * ([[graft.functions.VocabSegment]] — the same kernel as
    * [[graft.operators.Bpe.vocabTokenCounts]], stateless and
    * join-free by construction, so it composes onto an unbounded
    * stream with only the windowed partial sum as state). Drained
    * per-window sums are exact integers == the batch replay of the
    * same slice (StreamSpec law; gate q405's DuckDB oracle replays
    * the greedy loop unrolled per window). Returns
    * `(window, keys..., n_pieces)`. */
  def windowedVocabTokenCounts(
      df: DataFrame,
      tsCol: String,
      textCol: String,
      watermark: String,
      windowDuration: String,
      vocab: Seq[String],
      unk: String = "<unk>",
      keys: Seq[String] = Nil): MayFail[DataFrame] = MayFail {
    require(df.isStreaming, "windowedVocabTokenCounts needs a streaming frame")
    import graft.functions.{FunctionBridge, TextFunctions, VocabSegment}
    // eager index validation — an invalid vocab must Fail here, not
    // kill the running query from inside the lazy expression index
    new graft.functions.VocabIndex(vocab, unk)
    df.filter(col(tsCol).isNotNull && col(textCol).isNotNull)
      .withWatermark(tsCol, watermark)
      .select(col(tsCol) +: keys.map(col) :+
        explode(TextFunctions.tokens(col(textCol))).as("__word"): _*)
      .select(col(tsCol) +: keys.map(col) :+
        size(FunctionBridge.column(VocabSegment(
          FunctionBridge.expression(col("__word")), vocab, unk)))
          .cast("long").as("__np"): _*)
      .groupBy(window(col(tsCol), windowDuration) +: keys.map(col): _*)
      .agg(sum(col("__np")).as("n_pieces"))
  }

  /** Streaming CDC apply: each micro-batch is upserted into the parquet
    * table at `path`. With `seqCol`, LATEST WINS across batches too: a
    * late event whose sequence trails what the table already holds is
    * discarded (ties keep the base row, so checkpoint-replayed batches
    * apply idempotently); `seqCol` values must be non-null. Without
    * `seqCol` the merge is blind SCD-1 and each batch must be unique per
    * key. Single writer per table path (the streaming query itself).
    *
    * Crash safety: every table version appears only via rename (write to
    * a tmp dir → move old aside → move tmp in → drop old), and each batch
    * first RECOVERS from an interrupted swap — a dangling `__bak_*` with
    * no live table is restored, leftover tmp/bak dirs are dropped. A
    * crash at any point leaves either the old or the new table
    * addressable, never a partial one. */
  def upsertSink(
      stream: DataFrame,
      path: String,
      keys: Seq[String],
      checkpointLocation: String,
      seqCol: Option[String] = None,
      trigger: Trigger = Trigger.ProcessingTime("10 seconds")): MayFail[StreamingQuery] =
    MayFail {
      require(keys.nonEmpty, "upsertSink needs at least one key column")
      stream.writeStream
        .outputMode(OutputMode.Append)
        .option("checkpointLocation", checkpointLocation)
        .trigger(trigger)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          applyUpsertBatch(batch, path, keys, seqCol)
        }
        .start()
    }

  /** Streaming IVF index maintenance — keep a
    * [[graft.operators.Quantize.ivfEncodeWith]] stored index FRESH as
    * vectors arrive, without re-encoding the corpus: the stream is
    * encoded by the same per-row codegen kernels (cell assignment + PQ
    * codes against the caller's frozen codebooks — a pure projection, so
    * it rides the streaming frame directly), and each micro-batch lands
    * as `path/batch=<id>/cell=<c>/` parquet. Readers (`spark.read
    * .parquet(path)`) see the usual `(id, codes, batch, cell)` lists and
    * [[graft.operators.Quantize.ivfSearchEncoded]] partition-prunes on
    * `cell` exactly as over a batch-built index.
    *
    * Exactly-once WITHOUT a log: the batch id is the partition key and
    * each batch dir is written with OVERWRITE, so a checkpoint-replayed
    * micro-batch rewrites its own directory instead of appending
    * duplicates — idempotent under any crash/restart (the q330 gate and
    * StreamSpec replay bit-parity against the batch-built index).
    *
    * The codebooks are validated and collected ONCE at sink
    * construction (driver-resident by the FAISS argument, bounds named
    * in Quantize) — per batch the work is one narrow projection and one
    * cell-partitioned write. Codebook DRIFT is the caller's contract,
    * as in [[graft.operators.Quantize.ivfSearchEncoded]]: re-train ⇒
    * re-encode. */
  def ivfIndexSink(
      stream: DataFrame,
      path: String,
      vecCol: String,
      idCol: String,
      coarse: DataFrame,
      codebook: DataFrame,
      m: Int,
      cells: Int,
      checkpointLocation: String,
      metric: String = "l2",
      trigger: Trigger = Trigger.ProcessingTime("10 seconds")): MayFail[StreamingQuery] =
    graft.operators.Quantize.ivfEncodeWith(stream, vecCol, idCol, coarse,
      codebook, m, cells, metric).flatMap { enc =>
      MayFail {
        require(stream.isStreaming, "ivfIndexSink needs a streaming frame")
        enc.writeStream
          .outputMode(OutputMode.Append)
          .option("checkpointLocation", checkpointLocation)
          .trigger(trigger)
          .foreachBatch { (batch: DataFrame, batchId: Long) =>
            if (!batch.isEmpty)
              batch.write.mode("overwrite").partitionBy("cell")
                .parquet(s"$path/batch=$batchId")
          }
          .start()
      }
    }

  private[streaming] def applyUpsertBatch(
      batch: DataFrame,
      path: String,
      keys: Seq[String],
      seqCol: Option[String]): Unit = {
    val spark = batch.sparkSession
    val raw = new org.apache.hadoop.fs.Path(path)
    val fs = raw.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val src = fs.makeQualified(raw)
    // recover BEFORE the empty-batch shortcut: after a crashed swap the
    // replayed batch may well be empty (idle stream, expired retention),
    // and the table must come back regardless
    recoverInterruptedSwap(fs, src)
    if (batch.isEmpty) return
    val delta0 = seqCol match {
      case Some(sc) =>
        // a null sequence would silently LOSE data downstream (every
        // comparison in seqAwareMerge turns null->false, dropping both
        // sides) — fail the batch loudly instead. The guard rides the
        // merge pass itself (raise_error column), costing no extra
        // Spark action per micro-batch.
        val guarded = batch.withColumn(sc,
          when(col(sc).isNull,
            raise_error(lit(s"upsertSink: null $sc — seq values must be non-null")))
            .otherwise(col(sc)))
        graft.operators.Merge.latestByKey(guarded, keys, sc).get
      case None => batch.dropDuplicates(keys)
    }
    val uuid = java.util.UUID.randomUUID
    val tmp = new org.apache.hadoop.fs.Path(src.getParent, s"${src.getName}__upsert_$uuid")
    if (!fs.exists(src)) {
      // bootstrap through tmp+rename too: a crash mid-write must never
      // leave a partial directory where the table is expected
      delta0.write.parquet(tmp.toString)
      require(fs.rename(tmp, src), s"rename $tmp -> $src failed")
    } else {
      val base = spark.read.parquet(path)
      val delta = delta0.select(base.columns.toIndexedSeq.map(col): _*)
      val merged = seqCol match {
        case Some(sc) => seqAwareMerge(base, delta, keys, sc)
        case None =>
          graft.operators.Merge.upsert(base, delta, keys, broadcastUpdates = true).get
      }
      val bak = new org.apache.hadoop.fs.Path(src.getParent, s"${src.getName}__bak_$uuid")
      merged.write.parquet(tmp.toString)
      require(fs.rename(src, bak), s"rename $src -> $bak failed")
      if (!fs.rename(tmp, src)) {
        fs.rename(bak, src)
        throw new java.io.IOException(s"rename $tmp -> $src failed (rolled back)")
      }
      fs.delete(bak, true)
    }
  }

  /** Restore a table whose swap was interrupted (old table moved aside,
    * new one not yet moved in), then clear leftover swap debris. Safe
    * under the sink's single-writer contract. */
  private def recoverInterruptedSwap(
      fs: org.apache.hadoop.fs.FileSystem,
      src: org.apache.hadoop.fs.Path): Unit = {
    val parent = src.getParent
    if (parent == null || !fs.exists(parent)) return
    val name = src.getName
    def swapDirs() = fs.listStatus(parent).filter { st =>
      val nm = st.getPath.getName
      nm.startsWith(s"${name}__bak_") || nm.startsWith(s"${name}__upsert_")
    }
    if (!fs.exists(src)) {
      swapDirs().filter(_.getPath.getName.startsWith(s"${name}__bak_"))
        .sortBy(_.getModificationTime).lastOption.foreach { st =>
          require(fs.rename(st.getPath, src),
            s"recovery rename ${st.getPath} -> $src failed")
        }
    }
    // whatever remains is debris: baks fully swapped out, or tmp dirs
    // whose batch the checkpoint will replay anyway
    swapDirs().foreach(st => fs.delete(st.getPath, true))
  }

  /** The STREAMING crawl-dedup loop — [[graft.operators.Dedup
    * .dedupEpoch]] driven by the stream itself: every micro-batch is
    * one epoch (load the prior state → band the batch against the
    * stored index → verify → warm-start cluster → emit), with state
    * landing under `stateDir/epoch=<batchId>/`.
    *
    * STORAGE IS APPEND-STYLE (r14 review): each epoch dir holds this
    * epoch's DELTAS — the batch's index rows, the epoch's new pairs,
    * the batch ids — plus the FULL labels/kept/retractions (labels
    * grow with PAIRED docs only, tiny next to the corpus). Per-epoch
    * I/O is therefore proportional to the BATCH; a full-snapshot-per-
    * micro-batch loop would re-serialize the whole corpus history
    * every trigger (quadratic in stream length).
    * [[latestEpochBefore]] reconstructs the full
    * [[graft.operators.Dedup.EpochState]] by unioning the deltas —
    * one scan node per epoch dir, so a long-running loop should
    * periodically COMPACT (write the reconstructed state's
    * `EpochState.write` full snapshot into a fresh stateDir and
    * continue there).
    *
    * REPLAY IDEMPOTENCY comes from the layout: batch `N`'s prior is
    * the union of epochs `< N`, which never contains batch `N`'s own
    * ids; and a replayed batch whose `epoch=N` dir ALREADY EXISTS is
    * skipped outright — the dir is the complete result of this same
    * deterministic batch, only the checkpoint offset had not
    * committed. A committed epoch is thus never deleted or
    * republished, so a head reader can never observe a torn or
    * regressing state. Commits go through tmp+rename (atomic on
    * HDFS-like stores; object-store renames are copies — keep the
    * state dir on a rename-atomic filesystem).
    *
    * Uncapped banding per the epoch contract; ids must be unique
    * across the stream's lifetime (exact-dedup upstream — enforced
    * per batch against the ids ledger). Gate q408 locks the loop
    * against the same brute-force + recursive-CC oracle as q403. */
  def dedupEpochSink(
      stream: DataFrame,
      textCol: String,
      idCol: String,
      stateDir: String,
      checkpointLocation: String,
      shingleSize: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      threshold: Double = 0.7,
      trigger: Trigger = Trigger.ProcessingTime("10 seconds")): MayFail[StreamingQuery] =
    MayFail {
      require(stream.isStreaming, "dedupEpochSink needs a streaming frame")
      stream.writeStream
        .outputMode(OutputMode.Append)
        .option("checkpointLocation", checkpointLocation)
        .trigger(trigger)
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          val spark = batch.sparkSession
          val dst = new org.apache.hadoop.fs.Path(
            s"$stateDir/epoch=$batchId")
          val fs = dst.getFileSystem(
            spark.sparkContext.hadoopConfiguration)
          // skip-if-committed: a replayed batch's dir is already the
          // complete result of this same batch (file-source batches
          // are deterministic per id) — recomputing would only open
          // a delete/republish window for head readers
          if (!fs.exists(dst)) {
            val prior = latestEpochBefore(spark, stateDir, batchId)
            val res = graft.operators.Dedup.dedupEpochDelta(batch,
              textCol, idCol, prior, shingleSize, bands, rowsPerBand,
              threshold)
            val tmp = new org.apache.hadoop.fs.Path(
              s"$stateDir/__epoch_tmp_$batchId")
            if (fs.exists(tmp)) fs.delete(tmp, true)
            res.indexDelta.write.parquet(s"$tmp/index")
            res.pairsDelta.write.parquet(s"$tmp/pairs")
            res.state.labels.write.parquet(s"$tmp/labels")
            res.state.kept.write.parquet(s"$tmp/kept")
            res.state.retractions.write.parquet(s"$tmp/retractions")
            res.idsDelta.write.parquet(s"$tmp/ids")
            require(fs.rename(tmp, dst),
              s"dedupEpochSink: could not commit $tmp -> $dst")
          }
        }
        .start()
    }

  /** Reconstruct the epoch state with id strictly below `beforeId`
    * (`Long.MaxValue` = the stream's current head) from a
    * [[dedupEpochSink]] state dir: index/pairs/ids are the UNION of
    * every committed epoch's deltas, labels/kept/retractions come
    * from the latest epoch (labels are always full; kept/retractions
    * are per-epoch emissions). None when no epoch has committed. */
  def latestEpochBefore(
      spark: SparkSession,
      stateDir: String,
      beforeId: Long = Long.MaxValue): Option[graft.operators.Dedup.EpochState] = {
    val dir = new org.apache.hadoop.fs.Path(stateDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ids =
      if (!fs.exists(dir)) Array.empty[Long]
      else fs.listStatus(dir).map(_.getPath.getName)
        .filter(_.startsWith("epoch="))
        .flatMap(n => scala.util.Try(n.stripPrefix("epoch=").toLong).toOption)
        .filter(_ < beforeId)
    if (ids.isEmpty) None
    else {
      def unionAll(sub: String): DataFrame = ids.sorted
        .map(i => spark.read.parquet(s"$stateDir/epoch=$i/$sub"))
        .reduce(_.unionByName(_))
      val head = s"$stateDir/epoch=${ids.max}"
      Some(graft.operators.Dedup.EpochState(
        unionAll("index"), unionAll("pairs"),
        spark.read.parquet(s"$head/labels"),
        spark.read.parquet(s"$head/kept"),
        spark.read.parquet(s"$head/retractions"),
        unionAll("ids")))
    }
  }


  /** Latest-wins merge: base rows survive unless the delta carries a
    * strictly newer sequence for their key; delta rows land when their
    * key is absent or strictly newer. The base is never shuffled (delta
    * broadcast to base; the insert check joins only the base's slim
    * key+seq projection). Assumes the table is unique per key (the sink
    * maintains that inductively from its first batch). */
  private def seqAwareMerge(
      base: DataFrame,
      delta: DataFrame,
      keys: Seq[String],
      seqCol: String): DataFrame = {
    require(base.columns.contains(seqCol), s"base table lacks seq column $seqCol")
    val d = broadcast(
      delta.select((keys :+ seqCol).map(c => col(c).as(s"__u_$c")): _*)
        .withColumn("__upres", lit(1)))
    val keptCond = keys.map(k => col(k) <=> col(s"__u_$k")).reduce(_ && _)
    val baseKept = base.join(d, keptCond, "left_outer")
      .filter(col("__upres").isNull || col(seqCol) >= col(s"__u_$seqCol"))
      .select(base.columns.map(col).toSeq: _*)
    val baseSlim = base
      .select((keys :+ seqCol).map(c => col(c).as(s"__b_$c")): _*)
      .withColumn("__bpres", lit(1))
    val insCond = keys.map(k => col(k) <=> col(s"__b_$k")).reduce(_ && _)
    val deltaApplied = delta.join(baseSlim, insCond, "left_outer")
      .filter(col("__bpres").isNull || col(seqCol) > col(s"__b_$seqCol"))
      .select(delta.columns.map(col).toSeq: _*)
    baseKept.unionByName(deltaApplied)
  }

  /** Start a file sink with an explicit trigger + checkpoint (the
    * production shape of the reference's `Write.streamToFile`). */
  def startFileSink(
      df: DataFrame,
      fileType: String,
      path: String,
      checkpointLocation: String,
      trigger: Trigger = Trigger.ProcessingTime("10 seconds"),
      outputMode: OutputMode = OutputMode.Append): MayFail[StreamingQuery] =
    MayFail {
      df.writeStream
        .format(fileType)
        .outputMode(outputMode)
        .option("path", path)
        .option("checkpointLocation", checkpointLocation)
        .trigger(trigger)
        .start()
    }

  /** STREAMING content-defined novel-chunk filter — incremental crawl
    * ingestion that stores each repeated span once: arriving documents
    * are chunked by the SHUFFLE-FREE [[graft.operators.Cdc.chunks]]
    * kernel (a pure projection + posexplode, so it rides the streaming
    * frame unchanged), then chunks whose content address already
    * exists in the frozen reference corpus are dropped via a
    * stream-static LEFT ANTI join against the broadcast reference
    * hash set. Stateless per micro-batch — bounded memory at any
    * stream length — and bit-parity with the batch anti-join by
    * construction (gated: q353). Emits `(idCol, chunk_idx, start,
    * chunk_len, chunk_md5)` for novel chunks only. */
  /** STREAMING drift histogram: exact per-(event window, pinned bin)
    * counts — the build half of a streaming PSI monitor. State is
    * bounded by windows × bins regardless of event volume, and the
    * integer counts make the drained histogram BIT-equal to batch
    * binning (the q334 discipline); finish against a frozen baseline
    * with [[graft.operators.Stats.psiFromCounts]] keyed by window. */
  def windowedBinCounts(
      df: DataFrame,
      tsCol: String,
      windowDuration: String,
      watermark: String,
      valueCol: String,
      edges: Seq[Double]): MayFail[DataFrame] = MayFail {
    require(df.isStreaming, "windowedBinCounts needs a streaming frame")
    require(edges.nonEmpty && edges == edges.sorted &&
      edges.distinct == edges,
      s"edges must be non-empty, sorted, distinct: $edges")
    df.filter(col(tsCol).isNotNull && col(valueCol).isNotNull)
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDuration),
        graft.operators.Stats.binExpr(valueCol, edges).as("bin"))
      .agg(count(lit(1)).as("n"))
  }

  /** STREAMING assignment-count monitor — the build half of a
    * streaming SAMPLE-RATIO-MISMATCH check (the most common
    * experiment-invalidation bug caught in production, not in the
    * readout): exact per-(event window, arm) counts, state bounded by
    * windows × arms regardless of event volume, drained counts
    * BIT-equal to batch counting (the q334/q372 discipline). Finish
    * each drained window against the frozen design with
    * [[graft.operators.Stats.srmFromCounts]] keyed by window start. */
  def windowedArmCounts(
      df: DataFrame,
      tsCol: String,
      windowDuration: String,
      watermark: String,
      armCol: String): MayFail[DataFrame] = MayFail {
    require(df.isStreaming, "windowedArmCounts needs a streaming frame")
    df.filter(col(tsCol).isNotNull && col(armCol).isNotNull)
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDuration),
        col(armCol).cast("string").as("arm"))
      .agg(count(lit(1)).as("n_obs"))
  }

  /** STREAMING per-window HLL distinct sketches: `(window, keys...,
    * sketch)` — state is ONE ~2 KB sketch per (window, key) regardless
    * of event volume or value cardinality, and the sketches stay
    * MERGEABLE downstream ([[graft.operators.Sketch.hllMergeEstimate]]
    * answers "distinct users over any window union" without replay).
    * The bounded-state member the exact windowed counts can't be when
    * the value domain explodes. */
  def windowedHllSketches(
      df: DataFrame,
      tsCol: String,
      windowDuration: String,
      watermark: String,
      valueCol: String,
      keys: Seq[String] = Nil,
      lgConfigK: Int = 12): MayFail[DataFrame] = MayFail {
    require(df.isStreaming, "windowedHllSketches needs a streaming frame")
    df.filter(col(tsCol).isNotNull && col(valueCol).isNotNull)
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDuration) +: keys.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgConfigK)).as("sketch"))
  }

  def cdcNovelChunks(
      stream: DataFrame,
      reference: DataFrame,
      textCol: String,
      idCol: String,
      bits: Int = 5,
      window: Int = 8,
      minLen: Int = 16,
      maxLen: Int = 96
  ): MayFail[DataFrame] = MayFail {
    require(stream.isStreaming, "cdcNovelChunks needs a streaming frame")
    require(!reference.isStreaming,
      "the reference corpus must be static")
    val refHashes = graft.operators.Cdc.chunks(reference, textCol, idCol,
        bits, window, minLen, maxLen).get
      .select("chunk_md5").distinct()
      .localCheckpoint(true)
    graft.operators.Cdc.chunks(stream, textCol, idCol,
        bits, window, minLen, maxLen).get
      .join(broadcast(refHashes), Seq("chunk_md5"), "left_anti")
      .select(col(idCol), col("chunk_idx"), col("start"),
        col("chunk_len"), col("chunk_md5"))
  }
}

/** Keyed running-state record for [[Stream.runningStats]]. */
final case class KeyStats(key: String, count: Long, sum: Double, lastSeenMs: Long)

/** Accumulating session state for [[Stream.sessionize]]. */
final case class SessionAcc(n: Long, sum: Double, firstMs: Long, lastMs: Long)

/** Closed-session record emitted by [[Stream.sessionize]] on timeout. */
final case class SessionSummary(
    key: String, n: Long, sum: Double, firstMs: Long, lastMs: Long)

/** Per-key Page–Hinkley state for [[Stream.driftMonitor]]. */
final case class DriftAcc(t: Long, s: Long, m: Double, minM: Double)

/** Per-event drift readout emitted by [[Stream.driftMonitor]]. */
final case class DriftPoint(
    key: String, id: Long, value: Double, ph_m: Double, ph: Double,
    alarm: Boolean)
