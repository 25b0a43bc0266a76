package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's recommended scale configuration.
  *
  * Local mode gets core-count shuffle partitions; a cluster deployment
  * passes `shufflePartitions` sized to ~128 MB of shuffle data per task
  * at the target input scale (AQE coalesces down at runtime, so erring
  * high is safe).
  */
object GraftSession {

  def builder(
      appName: String = "graft",
      master: Option[String] = None,
      shufflePartitions: Int = Runtime.getRuntime.availableProcessors
  ): SparkSession.Builder = {
    val b = SparkSession.builder()
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "134217728") // 128 MB splits
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.compression.codec", "zstd")
    master.fold(b)(b.master)
  }

  /** Local session for tests/tools. */
  def local(cores: Int = Runtime.getRuntime.availableProcessors): SparkSession =
    builder(master = Some(s"local[$cores]"), shufflePartitions = cores)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
}
