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
    // Plan ==" (reusing the leaf/scan ids) then "== Initial Plan =="
    // (fresh ids for everything above the reused leaves) — with one
    // detail header per id across both; subquery sections repeat the
    // same Final/Initial structure per hosted AdaptiveSparkPlan.
    // Counting all headers would double every node (the r12 ADVICE
    // vacuous-lock fix exposed this), so the fingerprint EXCLUDES the
    // ids that appear only in Initial Plan tree sections: the executed
    // plan is the one the lock is about. The banned set is built by a
    // line scan over the TREE sections (mode flips at the Final/
    // Initial markers and resets at any column-0 root/header line or
    // at the first detail header), so non-adaptive subquery trees and
    // unexecuted plans are untouched — their banned set is empty.
    // Scan details (PushedFilters / PartitionFilters) are shared by id
    // between the trees, so the pushdown counts need no restriction.
    val banned: Set[String] = {
      val idRe = """\((\d+)\)""".r
      val fin = scala.collection.mutable.Set.empty[String]
      val ini = scala.collection.mutable.Set.empty[String]
      var mode = 0 // 0 = outside, 1 = Final tree, 2 = Initial tree
      plan.linesIterator.foreach { line =>
        if (line.contains("== Final Plan ==")) mode = 1
        else if (line.contains("== Initial Plan ==")) mode = 2
        else if (line.matches("""^[A-Za-z=].*""") ||
          line.matches("""^\s*\(\d+\).*""")) mode = 0
        else if (mode == 1)
          idRe.findAllMatchIn(line).foreach(m => fin += m.group(1))
        else if (mode == 2)
          idRe.findAllMatchIn(line).foreach(m => ini += m.group(1))
      }
      (ini -- fin).toSet
    }
    // one detail header per node: "(7) Exchange [codegen id : 2]" — the
    // tree section draws nodes with +- / : prefixes, never at ^\(
    val nodes = nodeHeader.findAllMatchIn(plan)
      .filter(m => !banned.contains(m.group(1)))
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
