package graft.tools

/** Throwaway-style diagnostic: counts signature-kernel evaluations in the
  * portable-LSH plans (guards against CollapseProject duplicating the
  * expensive child — see BandKeysFromSimhash). */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(4)
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- Seq("q35_dedup_simhash", "q37_dedup_embedding", "q39_knn_lsh")) {
      val plan = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
      val n = "portable_vec_simhash".r.findAllIn(plan).size
      println(s"[probe] $q portable_vec_simhash=$n")
    }
    spark.stop()
  }
}
