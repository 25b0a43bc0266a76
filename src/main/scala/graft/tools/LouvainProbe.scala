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
    for (p <- Seq(1, 1, 2, 4)) {
      val t0 = System.nanoTime()
      val n = graft.operators.Graph.louvainMove(e, "src", "dst", passes = p)
        .get.count()
      println(f"[louvainprobe] passes=$p n=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
