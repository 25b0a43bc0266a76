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

  private val headline: Seq[String] = Seq(
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
    "q114_dsir"
  )

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

    // best-of-2 per query: single-run timings on a shared local JVM carry
    // ±25% GC/JIT noise at these sizes — the minimum of two post-warmup
    // runs is the standard way to report the plan's cost, not the noise
    val runs = math.max(1,
      scala.util.Try(sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt).getOrElse(2))
    val results = headline.map { name =>
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
      name -> (if (times.contains(-1.0)) -1.0 else times.min)
    }
    val qs = results
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","queries":$qs,"sf":"$sfDir","runs":$runs,"timing":"min"}""")
    spark.stop()
  }
}
