package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc gate-query smoke runner (not part of the API): runs the named
  * `SparkEntry.queries` entries against `SPARK_GRAFT_SF_DIR` and prints
  * OK/FAIL per query — the fast way to bisect a driver-gate or bench
  * failure without a full Verify pass. No args = run every query.
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    // SPARK_GRAFT_LOG=WARN pairs scheduler warnings (e.g. "Broadcasting
    // large task binary") with the query that triggers them: a warning
    // belongs to the first "OK" line printed after it.
    spark.sparkContext.setLogLevel(sys.env.getOrElse("SPARK_GRAFT_LOG", "ERROR"))
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names = if (args.nonEmpty) args.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    var failed = 0
    names.foreach { q =>
      graft.SparkEntry.queries.get(q) match {
        case None => println(s"$q MISSING"); failed += 1
        case Some(fn) =>
          try {
            val t0 = System.nanoTime()
            val n = fn(spark, dir).count()
            println(f"$q OK rows=$n (${(System.nanoTime() - t0) / 1e9}%.2f s)")
          } catch {
            case e: Throwable =>
              failed += 1
              println(s"$q FAIL ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(300)}")
          }
      }
    }
    spark.stop()
    if (failed > 0) { println(s"FAILED: $failed"); sys.exit(1) }
  }
}
