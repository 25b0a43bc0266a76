package graft.tools

import org.apache.spark.sql.SparkSession

/** Focused min-of-3 micro-bench over named gate queries (not part of the
  * API): the Bench harness with the full sweep stripped away, for A/B-ing
  * a single query change without a 5-minute run. Prints one line per
  * query plus the spark-range calibration; pair two runs (worktree old /
  * current) to attribute a delta. Usage:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.tools.BenchProbe q143_frequent_ngrams"
  */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else Seq("q01_agg")
    names.foreach { n =>
      try graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
    }
    val runs = sys.env.getOrElse("SPARK_GRAFT_PROBE_RUNS", "3").toInt
    names.foreach { n =>
      val times = (0 until runs).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[benchprobe] $n min=${times.min}%.3f runs=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    println(f"[benchprobe] spark_cal=${graft.Bench.sparkCalibration(spark, 3)}%.3f" +
      f" sched_cal=${graft.Bench.schedCalibration(spark, 5)}%.3f")
    spark.stop()
  }
}
