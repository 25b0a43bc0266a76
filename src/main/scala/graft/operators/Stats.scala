package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functional.MayFail

/** Two-sample statistical tests — the A/B-experiment readout layer
  * over event streams. Every test reduces to one or two partial-agg
  * shuffles (a handful of `sum(when(...))` aggregates); no collect, no
  * per-group materialization, so a 10¹⁰-row experiment costs one scan.
  *
  * Determinism: statistics are pure IEEE functions of group sums. With
  * integral inputs (cent-scaled values — the [[TimeSeries]] ×100
  * convention) every sum is exact, so the statistics are
  * bit-reproducible across engines and partition layouts; with
  * arbitrary doubles they carry the usual last-ulp partial-agg noise.
  */
object Stats {

  /** Welch's unequal-variance two-sample t-test of `valueCol` between
    * `groupA` and `groupB` of `groupCol`. Returns ONE row:
    * `(n_a, n_b, mean_a, mean_b, var_a, var_b, t, df)` — `t` the Welch
    * statistic, `df` the Welch–Satterthwaite degrees of freedom.
    * Sample variances come from exact sum / sum-of-squares (clamped at
    * 0), the [[TimeSeries.rollingStats]] formula. NULL t/df when
    * either group has < 2 rows or both variances are 0.
    */
  def welchTTest(
      df: DataFrame,
      valueCol: String,
      groupCol: String,
      groupA: String,
      groupB: String
  ): MayFail[DataFrame] = MayFail {
    require(groupA != groupB, s"groups must differ: $groupA")
    val v = col(valueCol).cast("double")
    def in(label: String) = col(groupCol) === lit(label)
    val base = df
      .filter(col(valueCol).isNotNull && col(groupCol).isin(groupA, groupB))
      .agg(
        count(when(in(groupA), 1)).as("n_a"),
        coalesce(sum(when(in(groupA), v)), lit(0.0)).as("__s_a"),
        coalesce(sum(when(in(groupA), v * v)), lit(0.0)).as("__s2_a"),
        count(when(in(groupB), 1)).as("n_b"),
        coalesce(sum(when(in(groupB), v)), lit(0.0)).as("__s_b"),
        coalesce(sum(when(in(groupB), v * v)), lit(0.0)).as("__s2_b"))
    def mean(t: String) = when(col(s"n_$t") >= 1, col(s"__s_$t") / col(s"n_$t"))
    def variance(t: String) = when(col(s"n_$t") >= 2,
      greatest(col(s"__s2_$t") - col(s"__s_$t") * col(s"__s_$t") / col(s"n_$t"),
        lit(0.0)) / (col(s"n_$t") - lit(1)))
    val stats = base
      .withColumn("mean_a", mean("a")).withColumn("var_a", variance("a"))
      .withColumn("mean_b", mean("b")).withColumn("var_b", variance("b"))
    val sa = col("var_a") / col("n_a")
    val sb = col("var_b") / col("n_b")
    val se2 = sa + sb
    val ok = col("n_a") >= 2 && col("n_b") >= 2 && se2 > 0
    stats
      .withColumn("t", when(ok, (col("mean_a") - col("mean_b")) / sqrt(se2)))
      .withColumn("df", when(ok, (se2 * se2) /
        (sa * sa / (col("n_a") - lit(1)) + sb * sb / (col("n_b") - lit(1)))))
      .select("n_a", "n_b", "mean_a", "mean_b", "var_a", "var_b", "t", "df")
  }

  /** Pearson χ² test of independence over the `rowCol` × `colCol`
    * contingency table. Returns ONE row `(n, n_rows, n_cols, dof,
    * chi2)` — `dof = (r−1)(c−1)`, `chi2 = Σ (o−e)²/e` with
    * `e = rowTotal·colTotal/n`. Observed and marginal counts are exact
    * BIGINTs; χ² itself sums floats over the (category²-sized, i.e.
    * tiny) cell grid and carries last-ulp noise — round it at
    * comparison boundaries. Absent row×column combinations contribute
    * their full expectation (o = 0), as in the textbook definition.
    *
    * Plan: one partial-agg shuffle to the contingency cells; marginals,
    * the full grid, and the final reduction all operate on that tiny
    * frame (broadcast cross joins).
    */
  def chiSquareIndependence(
      df: DataFrame,
      rowCol: String,
      colCol: String
  ): MayFail[DataFrame] = MayFail {
    val obs = df.filter(col(rowCol).isNotNull && col(colCol).isNotNull)
      .groupBy(col(rowCol).as("r"), col(colCol).as("c"))
      .agg(count(lit(1)).as("o"))
    val rows = obs.groupBy("r").agg(sum("o").as("rt"))
    val colsT = obs.groupBy("c").agg(sum("o").as("ct"))
    val total = obs.agg(sum("o").as("n"))
    val grid = rows.crossJoin(colsT)
      .join(obs, Seq("r", "c"), "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
      .crossJoin(broadcast(total))
    val e = col("rt") * col("ct") / col("n").cast("double")
    grid
      .withColumn("__term", pow(col("o") - e, 2) / e)
      .agg(max(col("n")).as("n"),
        countDistinct("r").as("n_rows"), countDistinct("c").as("n_cols"),
        sum("__term").as("chi2"))
      .select(col("n"), col("n_rows"), col("n_cols"),
        ((col("n_rows") - 1) * (col("n_cols") - 1)).as("dof"), col("chi2"))
  }

  /** Mann–Whitney U (rank-sum) test of `valueCol` between `groupA` and
    * `groupB`: U statistics from midrank sums with the standard tie
    * handling. Midranks are exact dyadics (k or k + 0.5), so their sums
    * — and therefore U — are EXACT in double arithmetic in any order:
    * unlike t/χ², this test is bit-deterministic even on arbitrary
    * float inputs. Returns ONE row `(n_a, n_b, u_a, u_b, r_a, r_b)`
    * with `u_a + u_b = n_a·n_b` (an invariant worth asserting in
    * monitoring).
    *
    * Plan: ranks reduce at the DISTINCT-VALUE level, not the row level
    * — one partial-agg shuffle to (value, per-group counts), then the
    * unavoidable order-statistics pass (a running-sum window) runs over
    * that slim frame: distinct-value cardinality, not row cardinality.
    * A 10¹⁰-row experiment over a discretized metric windows over its
    * value grid only.
    */
  def mannWhitneyU(
      df: DataFrame,
      valueCol: String,
      groupCol: String,
      groupA: String,
      groupB: String
  ): MayFail[DataFrame] = MayFail {
    require(groupA != groupB, s"groups must differ: $groupA")
    val v = col(valueCol).cast("double")
    val byValue = df
      .filter(col(valueCol).isNotNull && col(groupCol).isin(groupA, groupB))
      .select(col(groupCol).as("g"), v.as("v"))
      .groupBy("v")
      .agg(count(when(col("g") === groupA, 1)).as("__ca"),
        count(when(col("g") === groupB, 1)).as("__cb"))
    val before = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // a value run of length t after `before` smaller rows has midrank
    // before + (t+1)/2 — identical to rank + (ties−1)/2, exact dyadic
    val mids = byValue
      .withColumn("__cnt", col("__ca") + col("__cb"))
      .withColumn("__mid",
        coalesce(sum(col("__cnt")).over(before), lit(0L)) +
          (col("__cnt") + lit(1)) / lit(2.0))
    mids.agg(
        coalesce(sum(col("__ca")), lit(0L)).as("n_a"),
        coalesce(sum(col("__cb")), lit(0L)).as("n_b"),
        coalesce(sum(col("__ca") * col("__mid")), lit(0.0)).as("r_a"),
        coalesce(sum(col("__cb") * col("__mid")), lit(0.0)).as("r_b"))
      .withColumn("u_a",
        col("r_a") - col("n_a") * (col("n_a") + lit(1)) / lit(2.0))
      .withColumn("u_b",
        col("r_b") - col("n_b") * (col("n_b") + lit(1)) / lit(2.0))
      .select("n_a", "n_b", "u_a", "u_b", "r_a", "r_b")
  }
}
