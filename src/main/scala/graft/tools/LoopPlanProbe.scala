package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Dump EVERY executed plan of a gate query — including the
  * per-iteration frames that iterative operators (pageRank, Louvain,
  * SSSP, Markov) materialize via eager `localCheckpoint`, which the
  * outer `explain` cannot show (the returned frame's lineage is
  * truncated at the last checkpoint). `Dataset.checkpoint` runs through
  * `withAction`, so a QueryExecutionListener observes each round's
  * QueryExecution; this prints a compact operator summary per execution
  * (exchange / join / aggregate / window lines) plus the full formatted
  * plan when `SPARK_GRAFT_LOOPPLAN_FULL=1`.
  *
  * Usage: sbt "runMain graft.tools.LoopPlanProbe q195_pagerank [sfDir]"
  */
object LoopPlanProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: LoopPlanProbe <query> [sfDir]")
    val q = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val full = sys.env.get("SPARK_GRAFT_LOOPPLAN_FULL").contains("1")
    val sb = new StringBuilder
    var n = 0
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = synchronized {
        n += 1
        val plan = qe.executedPlan.toString
        val interesting = plan.linesIterator.map(_.trim).filter { l =>
          l.contains("Exchange") || l.contains("Join") ||
          l.contains("HashAggregate") || l.contains("Window") ||
          l.contains("Scan parquet") || l.contains("Sort ")
        }.map(_.replaceAll("#\\d+L?", "").take(200))
        sb.append(s"---- execution $n [$funcName] ${durationNs / 1000000} ms ----\n")
        interesting.foreach(l => sb.append("  " + l + "\n"))
        if (full) sb.append(qe.explainString(
          org.apache.spark.sql.execution.FormattedMode)).append("\n")
      }
      override def onFailure(funcName: String, qe: QueryExecution,
          e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    graft.SparkEntry.queries(q)(spark, dir).count()
    // listener callbacks are async: give the bus a moment to drain
    Thread.sleep(2000)
    println(s"########## $q ($dir) ##########")
    println(sb.toString)
    spark.stop()
  }
}
