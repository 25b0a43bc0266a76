package graft.tools

import org.apache.spark.sql.functions._

/** Pass-scaling probe for louvainMove (the BenchProbe counterpart for
  * iterative label plans): times 1/1/2/4 passes over the sf-dir's
  * direct part↔supplier bipartite graph so per-pass marginal cost and
  * fixed setup separate — the r9 restructure (single links pass +
  * synthesized own-community row + dst-partitioned edge cache) took
  * 4 passes at sf0.1 from 21.4 s to 6.3 s on this probe. */
object LouvainProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val e = li.select((col("l_partkey") * 2).as("src"),
      (col("l_suppkey") * 2 + 1).as("dst"))
    e.count() // warm IO
    if (args.headOption.contains("full")) return runFull(spark, e, args)
    for (p <- Seq(1, 1, 2, 4)) {
      val t0 = System.nanoTime()
      val n = graft.operators.Graph.louvainMove(e, "src", "dst", passes = p)
        .get.count()
      println(f"[louvainprobe] passes=$p n=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }

  /** `full` mode (r12 verdict ask #3 — the q319 watch): run the EXACT
    * q319 configuration (full Louvain, passes=2, levels=2, direct
    * part↔supplier bipartite graph) `reps` times with the per-phase
    * wall-time sink, print each run's phase breakdown, then the
    * min-over-runs per phase and the min total — so a cross-round q319
    * drift names its phase (moves vs contraction vs coarse pass)
    * instead of needing a worktree A/B.
    * Usage: `runMain graft.tools.LouvainProbe full [reps]`. */
  private def runFull(spark: org.apache.spark.sql.SparkSession,
      e: org.apache.spark.sql.DataFrame, args: Array[String]): Unit = {
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    // unrecorded warmup — the first fresh-JVM run carries ~2x JIT and
    // codegen cost, which would poison a round-over-round comparison
    graft.operators.Graph.louvain(e, "src", "dst", passes = 2,
      levels = 2).get.count()
    val phaseMin = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    var totalMin = Double.MaxValue
    for (rep <- 1 to reps) {
      val phases = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
      val t0 = System.nanoTime()
      val n = graft.operators.Graph.louvain(e, "src", "dst", passes = 2,
        levels = 2, phaseSink = (p, s) => phases += ((p, s))).get.count()
      val total = (System.nanoTime() - t0) / 1e9
      totalMin = math.min(totalMin, total)
      val detail = phases.map { case (p, s) => f"$p=$s%.2f" }.mkString(" ")
      println(f"[louvainprobe] full rep=$rep n=$n total=$total%.2f s  $detail")
      phases.foreach { case (p, s) =>
        phaseMin.updateWith(p)(v => Some(math.min(v.getOrElse(Double.MaxValue), s)))
      }
    }
    val mins = phaseMin.map { case (p, s) => f"$p=$s%.2f" }.mkString(" ")
    println(f"[louvainprobe] full min-of-$reps total=$totalMin%.2f s  per-phase mins: $mins")
    spark.stop()
  }
}
