package graft.tools

/** Min-of-5 qS1 + fsync-calibration evidence probe (VERDICT r11 ask #7):
  * reports raw seconds AND per-fsync for each run so a "drift" can be
  * attributed to the sink path (raw moves) or the disk probe (only the
  * denominator moves). */
object QS1Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    graft.Bench.benchStreaming(spark, nEvents = 10000, batches = 2) // warmup
    val raws = (0 until 5).map { i =>
      val s = graft.Bench.benchStreaming(spark, nEvents = 200000, batches = 4)
      val d = graft.Bench.diskCalibration(3)
      println(f"[qs1probe] run=$i raw=$s%.3f disk_fsync=$d%.4f per_fsync=${s / d}%.1f")
      (s, d)
    }
    println(f"[qs1probe] min_raw=${raws.map(_._1).min}%.3f " +
      f"min_disk=${raws.map(_._2).min}%.4f " +
      f"per_fsync_at_mins=${raws.map(_._1).min / raws.map(_._2).min}%.1f")
    spark.stop()
  }
}
