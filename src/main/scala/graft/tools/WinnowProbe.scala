package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc sizing probe for the winnowing gates (not part of the API). */
object WinnowProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val fp = graft.operators.Dedup.winnowFingerprints(docs, "text", "doc_id").get
    println(s"fingerprints=${fp.count()} docs=${docs.count()}")
    for ((k, w, mb, ms) <- Seq((16, 8, 25, 2L), (16, 8, 25, 3L),
        (20, 10, 25, 2L), (16, 8, 10, 2L), (12, 6, 25, 3L))) {
      val p = graft.operators.Dedup.winnowPairs(docs, "text", "doc_id",
        k = k, w = w, minShared = ms, maxBucket = mb).get
      println(s"k=$k w=$w maxBucket=$mb minShared=$ms pairs=${p.count()}")
    }
    println(fp.filter(col("doc_id") < 40).count() + " rows for doc_id<40")
    spark.stop()
  }
}
