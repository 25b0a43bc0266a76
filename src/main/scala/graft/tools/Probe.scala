package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Ad-hoc stage timing for the dedup hot path (not part of the API). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    println(s"docs=${docs.count()}")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    time("tokens")(docs.select(tokens(col("text")).as("t")).agg(sum(size(col("t")))).count())
    time("shingles")(docs.select(wordShingles(col("text"), 3).as("s")).agg(sum(size(col("s")))).count())
    time("bandkeys")(docs.select(minhashBandKeys(wordShingles(col("text"), 3), 16, 4).as("k")).agg(sum(size(col("k")))).count())
    val sh = docs.select(col("doc_id").as("id"), wordShingles(col("text"), 3).as("shingles"))
    val banded = sh.select(col("id"), posexplode(minhashBandKeys(col("shingles"), 16, 4)).as(Seq("band", "bucket")))
    time("banded-count")(banded.count())
    val pairs = banded.select(col("band"), col("bucket"), col("id").as("idA"))
      .join(banded.select(col("band"), col("bucket"), col("id").as("idB")), Seq("band", "bucket"))
      .filter(col("idA") < col("idB")).select("idA", "idB").dropDuplicates("idA", "idB")
    time("pairs")(pairs.count())
    time("verify")(pairs
      .join(sh.select(col("id").as("idA"), col("shingles").as("shA")), "idA")
      .join(sh.select(col("id").as("idB"), col("shingles").as("shB")), "idB")
      .withColumn("j", jaccard(col("shA"), col("shB")))
      .filter(col("j") >= 0.5).count())
    spark.stop()
  }
}
