package graft.tools

import org.apache.spark.sql.DataFrame

/** Canonical physical-plan skeleton of a query — the strategy-drift
  * detector behind PlanFingerprintSpec (VERDICT r11 ask #2): a silent
  * join-strategy or exchange-count flip is invisible in a noisy bench
  * until it costs seconds, but it changes THIS string immediately.
  *
  * The fingerprint counts, from the FormattedMode node list (one line
  * per node, so reuse never double-counts):
  *   - shuffle exchanges (`ex`), broadcast exchanges (`bex`), reused
  *     exchanges (`reuse`)
  *   - every join strategy (`bhj`/`smj`/`shj`/`bnl`/`cart`)
  *   - window families (`win`/`wgl`), top-k (`top`), global sorts
  *     (`sort`)
  *   - parquet scans with non-empty PushedFilters (`pushed`) and
  *     non-empty PartitionFilters (`partf`)
  *
  * Deterministic because it reads the STATIC plan (AQE's initial plan
  * before any runtime re-plan) against the fixed sf0.001 files — the
  * same code + same data always prints the same skeleton, so the spec
  * can assert string equality against the committed table. */
object PlanFingerprint {

  private val nodeHeader = """(?m)^\s*\((\d+)\)\s+([A-Za-z]+)""".r

  def of(df: DataFrame): String = {
    val plan = df.queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    // An EXECUTED AdaptiveSparkPlan explains BOTH trees — "== Final
    // Plan ==" (ids 1..k, reusing the scan ids) then "== Initial Plan
    // ==" (fresh ids) — with one detail header per id across both.
    // Counting all headers would double every node (the r12 ADVICE
    // vacuous-lock fix exposed this), so when a Final Plan section
    // exists the fingerprint restricts to ITS node ids: the executed
    // plan is the one the lock is about. Scan details (PushedFilters /
    // PartitionFilters) are shared by id between the trees, so the
    // pushdown counts need no restriction.
    val finStart = plan.indexOf("== Final Plan ==")
    val allowed: Option[Set[String]] =
      if (finStart < 0) None
      else {
        val initStart = plan.indexOf("== Initial Plan ==", finStart)
        val finEnd = if (initStart < 0) plan.length else initStart
        Some("""\((\d+)\)""".r
          .findAllMatchIn(plan.substring(finStart, finEnd))
          .map(_.group(1)).toSet)
      }
    // one detail header per node: "(7) Exchange [codegen id : 2]" — the
    // tree section draws nodes with +- / : prefixes, never at ^\(
    val nodes = nodeHeader.findAllMatchIn(plan)
      .filter(m => allowed.forall(_.contains(m.group(1))))
      .map(_.group(2)).toSeq
    def c(n: String) = nodes.count(_ == n)
    val pushed = """PushedFilters: \[[^\]]""".r.findAllIn(plan).size
    val partf = """PartitionFilters: \[[^\]]""".r.findAllIn(plan).size
    Seq(
      s"ex=${c("Exchange")}",
      s"bex=${c("BroadcastExchange")}",
      s"reuse=${c("ReusedExchange")}",
      s"bhj=${c("BroadcastHashJoin")}",
      s"smj=${c("SortMergeJoin")}",
      s"shj=${c("ShuffledHashJoin")}",
      s"bnl=${c("BroadcastNestedLoopJoin")}",
      s"cart=${c("CartesianProduct")}",
      s"win=${c("Window")}",
      s"wgl=${c("WindowGroupLimit")}",
      s"top=${c("TakeOrderedAndProject")}",
      s"sort=${c("Sort")}",
      s"pushed=$pushed",
      s"partf=$partf").mkString(" ")
  }
}

/** Prints the committed-fingerprint table source for the spec: run once
  * after an INTENDED plan change, paste the updated row(s). */
object FingerprintProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(4)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val names = if (args.nonEmpty) args.toSeq else graft.Bench.headline
    names.foreach { q =>
      val fp = PlanFingerprint.of(graft.SparkEntry.queries(q)(spark, dir))
      println(s"""    "$q" ->\n      "$fp",""")
    }
    spark.stop()
  }
}
