package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times the headline queries on `SPARK_GRAFT_SF_DIR`
  * and prints ONE JSON line for the driver's BENCH_r{N}.json.
  *
  * Headliners cover the scale-critical plan shapes: wide agg, shuffle
  * join, broadcast join, window, MinHash-LSH dedup, brute-force + LSH
  * ANN, event-time window.
  */
object Bench {

  private[graft] val headline: Seq[String] = Seq(
    "q01_agg",
    "q12_join_inner",
    "q15_join_broadcast",
    "q20_window_running",
    "q33_dedup_exact",
    "q34_dedup_minhash",
    "q37_dedup_embedding",
    "q38_knn_brute",
    "q42_event_window",
    "q52_asof_join",
    "q54_tpch3",
    "q55_tpch5",
    // round-2 heavyweights: iterative connected components, sparse
    // TF-IDF pair join, 3-way TPC-H Q10 shape — regressions in these
    // must show up in BENCH, not only in the gate
    "q65_dedup_transitive",
    "q76_tfidf",
    "q86_tpch10",
    // round-3 additions: segment-granularity dedup (explode + window +
    // ordered reassembly) and the self-trained n-gram LM (two count
    // tables joined back to the token stream)
    "q94_paragraph_dedup",
    "q96_lm_score",
    // span dedup: corpus-wide positional gram shuffle + rebuild join —
    // the heaviest text-granularity pass
    "q102_span_dedup",
    // data-selection additions: codebook-cell quadratic pairing and the
    // two-corpus broadcast-scored gram stream
    "q113_semantic_dedup",
    "q114_dsir",
    // round-4 additions: the 9-gram-order tagged explode (heaviest new
    // corpus pass) and the per-row codec+FFT pipeline (CPU-bound
    // mapPartitions — regressions in the native-work path show here)
    "q126_gopher_repetition",
    "q124_audio_spectrum",
    // round-5 addition: corpus-wide n-gram mining — the widest explode in
    // the library (every trigram of every doc through one partial-agg
    // shuffle); top-k and partial-combine regressions surface here
    "q143_frequent_ngrams",
    // round-8 additions: the deepest TPC-H join trees — Q9's 5-way
    // fact-dimension fan-out and Q21's decorrelated EXISTS/NOT-EXISTS
    // (two countDistinct aggs + two semi joins over the same fact);
    // join-order and broadcast-threshold regressions surface here
    "q171_tpch9",
    "q173_tpch21",
    // round-8 session additions: the PQ ADC path (code scan + lookup
    // tables + exhaustive rerank — the quantized-retrieval ceiling) and
    // the MMR greedy over WindowGroupLimit-capped shortlists (the
    // flatMapGroups sequential-kernel pattern)
    "q182_pq_knn",
    "q179_mmr_select",
    // round-8 session: the iterative fixed-point PageRank (3 join+agg
    // rounds with a per-iteration driver scalar) and the bipartite
    // co-occurrence projection (the C(deg,2)-per-key self-join — its
    // threshold filter keeps no rows at sf0.1, so the timing is pure
    // pairing cost; the triangle phase itself is covered by the 10×
    // rehearsal where the threshold is data-derived) — iterative-plan
    // and self-join regressions surface here
    "q195_pagerank",
    "q196_bipartite_projection",
    // round-9 additions: Louvain local moves over the direct bipartite
    // graph (4 label-join/agg/window rounds — the deepest iterative
    // plan after PageRank; the q232 co-occurrence variant empties at
    // sf0.1) and the STL-lite decomposition (two window families + a
    // phase agg over the gapFilled grid); iterative-label and
    // window-chain regressions surface here
    "q234_louvain_bipartite",
    "q233_seasonal",
    // round-9 session-3: the 30-step simultaneous absorbing-chain solve
    // (the deepest fixed-point after PageRank/Louvain — per-iteration
    // join+agg on a composite key), the Bellman–Ford relaxation over
    // the undirected bipartite graph, and the 5-gram decontamination
    // join (two distinct-gram explosions + a gram-keyed join — the
    // heaviest new text pass); iterative-chain and gram-join
    // regressions surface here
    "q248_markov_attribution",
    "q251_sssp_weighted",
    "q252_contamination",
    // round-9 session-4: blocked Jaro-Winkler record linkage (the
    // quadratic-within-block candidate join through the codegen'd
    // kernel — at sf0.1 that is ~5e7 scored pairs, the hottest
    // expression loop in the library) and the per-key pairwise
    // Theil-Sen slopes (bounded-quadratic self-join + median ranks);
    // kernel-codegen and block-join regressions surface here
    "q261_record_linkage",
    "q268_theil_sen",
    // round-9 session-5: per-key pairwise Mann-Kendall (the q268 join
    // shape driven through a sign-sum instead of a median — pair-join
    // regressions independent of the rank path surface here) and
    // corpus TextRank (posexplode → vocabulary-grid partial agg →
    // 3-iteration weighted PageRank; the explode→iterate composition
    // is new to the bench)
    "q289_mann_kendall",
    "q293_textrank",
    // round-10: FULL Louvain over the direct bipartite graph — the
    // community-contraction + weighted-coarse-pass plan (2+2 passes,
    // exact-numerator acceptance); coarsening-pipeline regressions
    // surface here
    "q319_louvain_full_bipartite"
  )

  /** Streaming micro-batch throughput: `nEvents` synthetic events pushed
    * through the watermarked sliding-window aggregation (the q91 plan
    * shape) over `batches` micro-batches into a memory sink. Times the
    * state-store path — watermark advance, window state add/evict, sink
    * append — which the batch headliners never touch, so a state-
    * management regression shows up here and nowhere else.
    *
    * Cost model, established by tools/StreamProbe in round 8: each
    * micro-batch's wall time is DOMINATED by state-store commit
    * (commitTimeMs ≈ 12-17 s summed over the 32 partitions for only 256
    * state rows — per-partition fixed fsync/rename cost, not data
    * volume), so qS1 tracks HOST DISK LATENCY, which the cpu/spark
    * calibrations cannot see — that is what the unexplained r6/r7
    * 4× swing on unchanged code was (re-measured ~7.5-10 s in r8,
    * matching r5's 9.55 s). Normalize qS1 deltas by `disk_fsync_sec`
    * before reading them as regressions. RocksDBStateStoreProvider was
    * A/B'd and is ~1.7× WORSE here (higher per-commit checkpoint cost
    * at tiny state), so the default provider stands. */
  private[graft] def benchStreaming(spark: SparkSession, nEvents: Int, batches: Int): Double = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Int]
    // Each micro-batch ships ONE row — the batch index — and the events
    // are derived IN-STREAM by explode(sequence(...)): the old
    // driver-side Seq[(Timestamp, String, Double)] was encoded into the
    // micro-batch plan and rode into every task binary (rounds 5-7's
    // "Broadcasting large task binary with size 2.8 MiB" bench-tail
    // warning — StreamProbe pinned it to this exact closure). Derived
    // event values are IDENTICAL (timestamp_millis is instant-based like
    // java.sql.Timestamp), batch boundaries are identical, and the
    // fixture synthesis is negligible arithmetic ahead of the shuffle,
    // so the state-store path qS1 exists to measure is unchanged.
    val perBatchE = nEvents / batches
    val baseMs = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val df = input.toDF
      .select(explode(sequence(
        col("value").cast("long") * perBatchE,
        (col("value").cast("long") + 1) * perBatchE - 1)).as("e"))
      .select(
        timestamp_millis(lit(baseMs) + col("e") * 50).as("ts"),
        concat(lit("k"), col("e") % 64).as("key"),
        (col("e") % 97).cast("double").as("v"))
    val agg = graft.streaming.Stream.windowedAgg(df, "ts",
      watermarkDelay = "10 minutes", windowDuration = "10 minutes",
      aggs = Seq(count(lit(1)).as("n"), sum(col("v")).as("s")),
      keys = Seq("key"), slideDuration = Some("5 minutes")).get
    val name = s"bench_stream_$nEvents"
    val q = agg.writeStream.outputMode("append").format("memory")
      .queryName(name).start()
    try {
      // 50 ms event spacing: the event-time span crosses many windows,
      // so every batch both opens new state and finalizes old state.
      val t0 = System.nanoTime()
      (0 until batches).foreach { b =>
        input.addData(Seq(b))
        q.processAllAvailable()
      }
      // end the measurement BEFORE stop(): shutdown latency is not the
      // state-store path this number exists to isolate
      (System.nanoTime() - t0) / 1e9
    } finally q.stop() // a mid-measure failure must not leak a live query
  }

  /** Fixed-work CPU calibration: a constant-input single-thread splitmix64
    * fold (no allocation, no Spark) timed with the same min-of-N
    * discipline as the queries. The work never changes round-over-round,
    * so the recorded seconds are a pure measure of the HOST's state —
    * divide two rounds' query numbers by their calibration ratio before
    * calling a delta a regression (round 4's 1.3× "regression" was
    * exactly this: host-load drift, refuted only by a worktree A/B). */
  private[graft] def cpuCalibration(runs: Int): Double = {
    var sink = 0L
    def once(): Double = {
      val t0 = System.nanoTime()
      var acc = 0L
      var i = 0L
      while (i < 200000000L) { acc ^= graft.functions.VecOps.splitmix64(i); i += 1 }
      sink ^= acc // consume: the fold must not be dead-code-eliminated
      (System.nanoTime() - t0) / 1e9
    }
    val times = (0 until math.max(1, runs)).map(_ => once())
    if (sink == 42L) System.err.println("") // keep `sink` observably live
    times.min
  }

  /** Fixed-work disk calibration: create + write + fsync 64 4-KiB files,
    * min-of-N. The state-store commit path that dominates qS1 is
    * fsync-bound (per-partition delta-file create/force/rename), which
    * neither the CPU kernel nor the spark-range job touches — the r6/r7
    * "qS1 regressed 4× on unchanged code" mystery was exactly a host
    * disk-latency swing the other two calibrations certified as "flat".
    * Divide cross-round qS1 deltas by this ratio first. */
  private[graft] def diskCalibration(runs: Int): Double = {
    import java.nio.file.{Files, StandardOpenOption}
    val dir = Files.createTempDirectory("graft_disk_cal")
    val payload = Array.fill(4096)(7.toByte)
    def once(): Double = {
      val t0 = System.nanoTime()
      var i = 0
      while (i < 64) {
        val p = dir.resolve(s"f$i")
        val ch = java.nio.channels.FileChannel.open(p,
          StandardOpenOption.CREATE, StandardOpenOption.WRITE,
          StandardOpenOption.TRUNCATE_EXISTING)
        try { ch.write(java.nio.ByteBuffer.wrap(payload)); ch.force(true) }
        finally ch.close()
        i += 1
      }
      (System.nanoTime() - t0) / 1e9
    }
    try { once(); (0 until math.max(1, runs)).map(_ => once()).min }
    finally {
      (0 until 64).foreach(i => Files.deleteIfExists(dir.resolve(s"f$i")))
      Files.deleteIfExists(dir)
    }
  }

  /** Fixed-work Spark calibration: a constant `range → xxhash64 → sum`
    * job — captures scheduler/executor-thread contention that the
    * single-thread kernel can't see. Same min-of-N timing. */
  private[graft] def sparkCalibration(spark: SparkSession, runs: Int): Double = {
    import org.apache.spark.sql.functions._
    def once(): Double = {
      val t0 = System.nanoTime()
      // bit_xor, not sum: summing random 64-bit hashes overflows a long
      // under ANSI mode
      spark.range(0L, 100000000L, 1L, 32)
        .agg(expr("bit_xor(xxhash64(id))")).collect()
      (System.nanoTime() - t0) / 1e9
    }
    once() // warmup (codegen/JIT)
    (0 until math.max(1, runs)).map(_ => once()).min
  }

  /** Fixed-work SCHEDULER calibration: a trivial two-stage shuffle job —
    * 32 map tasks → exchange → reduce over 32k rows, microseconds of
    * actual compute — so the measured seconds ARE the scheduler,
    * stage-launch and shuffle-setup overhead. The r9 verdict showed the
    * cpu kernel over-normalizes the sub-second headliners: 25/29 shared
    * queries moved <10% raw while `cpu_kernel_sec` moved 42% — those
    * queries are SCHEDULER-bound, not kernel-bound. Normalize sub-second
    * query deltas by THIS ratio; multi-second compute-heavy plans by
    * `cpu_kernel_sec`; qS1 by `disk_fsync_sec`. */
  private[graft] def schedCalibration(spark: SparkSession, runs: Int): Double = {
    import org.apache.spark.sql.functions._
    def once(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, 32768L, 1L, 32)
        .groupBy(expr("id % 256")).count()
        .agg(count(lit(1))).collect()
      (System.nanoTime() - t0) / 1e9
    }
    once() // warmup
    (0 until math.max(1, runs)).map(_ => once()).min
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // JIT/codegen warmup on the smallest sf so headline timings measure
    // the plan, not first-call JVM compilation.
    headline.foreach { name =>
      try SparkEntry.queries(name)(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
    }

    // best-of-3 per query: single-run timings on a shared local JVM carry
    // ±25% GC/JIT noise at these sizes — the minimum of three post-warmup
    // runs is the standard way to report the plan's cost, not the noise
    val runs = math.max(1,
      scala.util.Try(sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt).getOrElse(3))
    // keep EVERY run's time, not only the min (r12 verdict ask #2).
    // Execution stays QUERY-MAJOR (each query's N runs back-to-back):
    // the r14 A/B of the r13-ADVICE sweep-major alternative measured a
    // +20-50% per-query inflation under sweep-major on an idle host
    // (q195 6.1 s vs 3.9 s query-major, q54 0.96 vs 0.74, q76 5.2 vs
    // 4.0 — PLANS.md r14) — cycling all 39 queries between a query's
    // runs accumulates localCheckpoint blocks / shuffle state that
    // degrades every later measurement, so sweep-major trades
    // measurement fidelity for a column-readable host-event signature.
    // The runs_note below describes the ACTUAL query-major chronology
    // (the ADVICE's other accepted fix).
    val perRun: Seq[(String, Seq[Double])] = headline.map { name =>
      val times = (0 until runs).map { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { SparkEntry.queries(name)(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
          }
        // failed queries report -1 so a crash can never masquerade as a
        // fast run, and don't pollute the total
        if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      }
      name -> (times: Seq[Double])
    }
    val results = perRun.map { case (name, times) =>
      name -> (if (times.contains(-1.0)) -1.0 else times.min)
    }
    // streaming throughput line, warmup then MIN-OF-2 measured runs (the
    // same discipline as the batch queries — a single-shot number was too
    // noisy to trend: 15.6 s recorded vs 8.4 s re-measured in round 4).
    // Reported under its own "streaming" key and EXCLUDED from "total":
    // total stays a min-of-N batch-query sum, comparable round-over-round
    // without a different-workload-class term mixed in.
    val streamRuns = 2
    val streamTimes: Seq[Double] = {
      try benchStreaming(spark, nEvents = 10000, batches = 2) // warmup
      catch { case _: Throwable => () }
      try (0 until streamRuns)
        .map(_ => benchStreaming(spark, nEvents = 200000, batches = 4))
      catch { case e: Throwable =>
        System.err.println(s"[bench] qS1_stream_window FAILED: ${e.getMessage}")
        Seq(-1.0)
      }
    }
    val streamSec = streamTimes.min
    // host-state calibration (fixed work, never changes round-over-round):
    // normalize cross-round query deltas by the calibration ratio before
    // reading them as plan regressions
    val calCpu = cpuCalibration(runs)
    val calSpark = sparkCalibration(spark, runs)
    val calDisk = diskCalibration(runs)
    val calSched = schedCalibration(spark, math.max(runs, 5))
    val qs = results
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    // per-run arrays in QUERY-MAJOR chronology (see the loop comment)
    val qruns = perRun
      .map { case (k, ts) =>
        "\"" + k + "\":[" + ts.map(t => f"$t%.3f").mkString(",") + "]" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    // qS1 normalized by the fsync calibration IN the artifact, so
    // cross-round readers compare the host-independent number directly
    // (the raw seconds swing 4x with host disk latency alone)
    val qS1PerFsync =
      if (streamSec >= 0 && calDisk > 0) streamSec / calDisk else -1.0
    val streamRunsJson =
      streamTimes.map(t => f"$t%.3f").mkString("[", ",", "]")
    val streamingJson =
      s""""streaming":{"qS1_stream_window":${f"$streamSec%.3f"},"qS1_per_fsync":${f"$qS1PerFsync%.1f"},"qS1_runs":$streamRunsJson,"events":200000,"runs":$streamRuns}"""
    val calibrationJson =
      s""""calibration":{"cpu_kernel_sec":${f"$calCpu%.3f"},"spark_range_sec":${f"$calSpark%.3f"},"disk_fsync_sec":${f"$calDisk%.3f"},"spark_sched_sec":${f"$calSched%.3f"},"note":"fixed work; divide cross-round query deltas by the MATCHING calibration ratio before reading them as regressions: sub-second queries are scheduler-bound (spark_sched_sec), multi-second compute plans kernel-bound (cpu_kernel_sec), qS1 fsync-bound (qS1_per_fsync is pre-normalized)"}"""
    // FULL artifact (with per-sweep arrays) goes to a FILE — in r13 the
    // single JSON line outgrew the driver's 2000-char tail capture and
    // truncated the first 9 queries + the total out of the record (r13
    // verdict ask #2). The file holds everything; stdout gets the full
    // line FIRST (for humans scrolling) and the parse-critical compact
    // line LAST, sized to always fit the capture window whole.
    val fullJson =
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","queries":$qs,"runs_detail":$qruns,"runs_note":"QUERY-MAJOR chronology: each query's runs execute back-to-back, queries in listed order — a transient host event elevates a contiguous time span, i.e. the TAIL runs of one query and the HEAD runs of the next (mixed indices), never one index across queries; all-runs-elevated with a same-speed calibration is the regression signature (sweep-major was A/B'd and rejected: +20-50% per-query inflation from cross-query state accumulation, PLANS.md r14)","""+
      s"""$streamingJson,$calibrationJson,"sf":"$sfDir","runs":$runs,"timing":"min"}"""
    val outFile = new java.io.File("bench_out.json").getAbsoluteFile
    try {
      java.nio.file.Files.writeString(outFile.toPath, fullJson + "\n")
      System.err.println(s"[bench] full artifact written to $outFile")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outFile: ${e.getMessage}")
    }
    println(fullJson)
    println(
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","queries":$qs,"runs_detail_file":"bench_out.json",$streamingJson,$calibrationJson,"sf":"$sfDir","runs":$runs,"timing":"min"}""")
    spark.stop()
  }
}
