package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
    * `(n_a, n_b, mean_a, mean_b, var_a, var_b, t, df, cohen_d)` — `t`
    * the Welch statistic, `df` the Welch–Satterthwaite degrees of
    * freedom, `cohen_d` the pooled-SD effect size (significance says
    * whether a difference exists; d says whether it MATTERS). Sample
    * variances come from exact sum / sum-of-squares (clamped at 0),
    * the [[TimeSeries.rollingStats]] formula. NULL t/df/d when either
    * group has < 2 rows or both variances are 0.
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
    val pooled = sqrt(((col("n_a") - lit(1)) * col("var_a") +
      (col("n_b") - lit(1)) * col("var_b")) /
      (col("n_a") + col("n_b") - lit(2)))
    stats
      .withColumn("t", when(ok, (col("mean_a") - col("mean_b")) / sqrt(se2)))
      .withColumn("df", when(ok, (se2 * se2) /
        (sa * sa / (col("n_a") - lit(1)) + sb * sb / (col("n_b") - lit(1)))))
      .withColumn("cohen_d",
        when(ok, (col("mean_a") - col("mean_b")) / pooled))
      .select("n_a", "n_b", "mean_a", "mean_b", "var_a", "var_b", "t", "df",
        "cohen_d")
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

  /** Paired t-test: the one-sample t of the per-row differences
    * `valueA − valueB` (before/after measurements on the SAME rows —
    * the within-subject counterpart of [[welchTTest]]). Returns ONE
    * row `(n, mean_diff, var_diff, t, df)` with `df = n − 1`; NULL
    * t when n < 2 or the differences have zero variance. One
    * `sum`/`sum-of-squares` scan; exact under integral (×100) inputs.
    */
  def pairedTTest(
      df: DataFrame,
      valueA: String,
      valueB: String
  ): MayFail[DataFrame] = MayFail {
    val d = col(valueA).cast("double") - col(valueB).cast("double")
    val base = df.filter(col(valueA).isNotNull && col(valueB).isNotNull)
      .agg(count(lit(1)).as("n"),
        coalesce(sum(d), lit(0.0)).as("__s"),
        coalesce(sum(d * d), lit(0.0)).as("__s2"))
    val mean = when(col("n") >= 1, col("__s") / col("n"))
    val variance = when(col("n") >= 2,
      greatest(col("__s2") - col("__s") * col("__s") / col("n"), lit(0.0)) /
        (col("n") - lit(1)))
    base
      .withColumn("mean_diff", mean)
      .withColumn("var_diff", variance)
      .withColumn("t",
        when(col("n") >= 2 && col("var_diff") > 0,
          col("mean_diff") / sqrt(col("var_diff") / col("n"))))
      .withColumn("df", when(col("n") >= 2, col("n") - 1))
      .select("n", "mean_diff", "var_diff", "t", "df")
  }

  /** Gini coefficient of a non-negative distribution (revenue
    * concentration, engagement inequality): 0 = perfectly even, → 1 =
    * one entity holds everything. Uses the ranked formula
    * `G = 2·Σ(i·x₍ᵢ₎)/(n·Σx) − (n+1)/n`. Σi over a run of t equal
    * values after c smaller rows is order-invariant (`t·c + t(t+1)/2`),
    * so ranks never need to be materialized per row — `idCol` is kept
    * for API stability but no longer participates (any tie order
    * yields the same G).
    *
    * Returns ONE row `(n, total, gini)`; NULL gini when the total is
    * 0. Fails on negative values (Gini is undefined there).
    *
    * Plan: like [[mannWhitneyU]], the order statistic reduces at the
    * DISTINCT-VALUE level — one partial-agg shuffle to (value, count),
    * a running-sum window over the value grid only (never the rows),
    * then a 1-row reduction. A 10¹⁰-row ledger over cent-granular
    * amounts windows over its value grid, not its rows; with integral
    * values and `n·max(x)` within 2⁵³ every term is exact.
    */
  def gini(
      df: DataFrame,
      valueCol: String,
      idCol: String
  ): MayFail[DataFrame] = MayFail {
    val v = col(valueCol).cast("double")
    val base = df.filter(col(valueCol).isNotNull)
    val neg = base.filter(v < 0).limit(1).count()
    require(neg == 0, s"gini is undefined for negative $valueCol values")
    val byValue = base.select(v.as("__v"))
      .groupBy("__v").agg(count(lit(1)).as("__t"))
    val before = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // Σi over the run = t·c + t(t+1)/2, in DOUBLE from the first
    // factor: the Long products t·c and t(t+1) reach ~n²/4 and would
    // ANSI-overflow near n ~ 6e9 rows; exactness is already bounded by
    // the documented n·max(x) ≤ 2⁵³ contract, which covers these terms
    val runs = byValue
      .withColumn("__c", coalesce(sum(col("__t")).over(before), lit(0L)))
      .withColumn("__isum",
        col("__t").cast("double") * col("__c") +
          col("__t").cast("double") * (col("__t") + lit(1)) / lit(2.0))
    runs
      .agg(coalesce(sum(col("__t")), lit(0L)).as("n"),
        coalesce(sum(col("__v") * col("__t")), lit(0.0)).as("total"),
        coalesce(sum(col("__v") * col("__isum")), lit(0.0)).as("__iv"))
      .withColumn("gini",
        when(col("total") > 0,
          lit(2.0) * col("__iv") / (col("n") * col("total")) -
            (col("n") + lit(1.0)) / col("n")))
      .select("n", "total", "gini")
  }

  /** Pairwise Pearson correlation matrix over `cols` in ONE
    * aggregation pass: every pair's (n, Σx, Σy, Σxy, Σx², Σy²) rides
    * the same scan (pairwise-complete rows — both values non-null),
    * and `r` follows from the product-moment formula. Returns one row
    * per unordered pair: `(col_a, col_b, n: bigint, r: double)`, NULL
    * `r` when n < 2 or either variance is 0.
    *
    * Determinism follows the module convention: with inputs scaled so
    * products and their sums stay within 2⁵³ (e.g. cents × small
    * integers), every moment is exact and `r` is bit-reproducible.
    */
  def correlationMatrix(
      df: DataFrame,
      cols: Seq[String]
  ): MayFail[DataFrame] = MayFail {
    require(cols.size >= 2, s"need at least two columns: $cols")
    require(cols.distinct.size == cols.size, s"duplicate columns: $cols")
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    val aggs = pairs.zipWithIndex.flatMap { case ((a, b), k) =>
      val x = col(a).cast("double"); val y = col(b).cast("double")
      val both = x.isNotNull && y.isNotNull
      Seq(count(when(both, 1)).as(s"n$k"),
        coalesce(sum(when(both, x)), lit(0.0)).as(s"sx$k"),
        coalesce(sum(when(both, y)), lit(0.0)).as(s"sy$k"),
        coalesce(sum(when(both, x * y)), lit(0.0)).as(s"sxy$k"),
        coalesce(sum(when(both, x * x)), lit(0.0)).as(s"sxx$k"),
        coalesce(sum(when(both, y * y)), lit(0.0)).as(s"syy$k"))
    }
    val base = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = pairs.zipWithIndex.map { case ((a, b), k) =>
      s"'${a.replace("'", "''")}', '${b.replace("'", "''")}', " +
        s"n$k, sx$k, sy$k, sxy$k, sxx$k, syy$k"
    }.mkString(", ")
    base
      .selectExpr(s"stack(${pairs.size}, $stackArgs) AS " +
        "(col_a, col_b, n, __sx, __sy, __sxy, __sxx, __syy)")
      .withColumn("__vx", col("n") * col("__sxx") - col("__sx") * col("__sx"))
      .withColumn("__vy", col("n") * col("__syy") - col("__sy") * col("__sy"))
      .withColumn("r",
        when(col("n") >= 2 && col("__vx") > 0 && col("__vy") > 0,
          (col("n") * col("__sxy") - col("__sx") * col("__sy")) /
            sqrt(col("__vx") * col("__vy"))))
      .select("col_a", "col_b", "n", "r")
  }

  /** Deterministic Poisson bootstrap CI for the mean of `valueCol`:
    * each of `b` resamples weights every row by a Poisson(1) draw
    * derived from the portable md5 hash of (salt § resample § id) —
    * the classic scalable bootstrap (resampling without materializing
    * samples; Chamandy et al.'s "Estimating Uncertainty for Massive
    * Data Streams" / the Poisson-bootstrap literature), made
    * REPRODUCIBLE: the draw is a pure function of the data, replayable
    * by external SQL character-for-character, like every sampling
    * decision in [[Sampling]].
    *
    * Returns ONE row `(n, b, mean, ci_lo, ci_hi)` — the percentile
    * interval from the sorted resample means (order statistics
    * `ceil(α/2·B)` and `ceil((1−α/2)·B)`, clamped, self-adjusting if a
    * degenerate resample drops out). The Poisson draw is inverse-CDF
    * truncated at 8 (tail mass < 1e-5, identically on both engines).
    *
    * Plan: a map-side `b`-way row replication (the bootstrap's
    * documented b×N scan — no shuffle until the B-row mean reduction),
    * one partial-agg shuffle to `b` rows, one tiny sort. Determinism:
    * with integral (×100) values every weighted sum is exact, so the
    * interval is bit-reproducible.
    *
    * CONTRACT on `idCols`: the hash key concatenates the id values
    * with `§` and renders NULL as the literal `<null>`, so id values
    * containing `§` (or the string `<null>`) can collide across rows,
    * correlating their Poisson draws and subtly biasing the CI. Use
    * ids free of the separator (numeric/uuid keys qualify) — the
    * SQL-replayability guarantee (the draw must be reproducible by
    * external engines character-for-character) is why the key is a
    * plain string concat rather than an escaped/length-prefixed hash.
    */
  def bootstrapCI(
      df: DataFrame,
      valueCol: String,
      idCols: Seq[String],
      b: Int = 100,
      alpha: Double = 0.05,
      salt: String = "boot"
  ): MayFail[DataFrame] = MayFail {
    require(b >= 10, s"b must be >= 10 resamples: $b")
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1): $alpha")
    require(idCols.nonEmpty, "idCols must name the row identity")
    val v = col(valueCol).cast("double")
    val base = df.filter(col(valueCol).isNotNull)
    val reps = base.sparkSession.range(b).select(col("id").as("__r"))
    val key = concat(lit(salt) +: (Seq(lit("§"), col("__r").cast("string")) ++
      idCols.flatMap(c => Seq(lit("§"),
        coalesce(col(c).cast("string"), lit("<null>"))))): _*)
    val u = (graft.functions.TextFunctions.portableHash60(key) % 1000000L)
      .cast("double") / 1000000.0
    // Poisson(1) inverse CDF, truncated at 8
    val w = when(u < 0.36787944117144233, 0L)
      .when(u < 0.7357588823428847, 1L)
      .when(u < 0.9196986029286058, 2L)
      .when(u < 0.9810118431238462, 3L)
      .when(u < 0.9963401531726563, 4L)
      .when(u < 0.9994058151824183, 5L)
      .when(u < 0.9999167588507119, 6L)
      .when(u < 0.9999897508033253, 7L)
      .otherwise(8L)
    val means = base.crossJoin(broadcast(reps))
      .select(col("__r"), v.as("__v"), w.as("__w"))
      .groupBy("__r")
      .agg(sum(col("__w") * col("__v")).as("__sv"), sum(col("__w")).as("__sw"))
      .filter(col("__sw") > 0)
      .select((col("__sv") / col("__sw")).as("__mean"))
    val ci = means.agg(sort_array(collect_list(col("__mean"))).as("__arr"))
      .select(
        element_at(col("__arr"), greatest(lit(1),
          ceil(size(col("__arr")) * lit(alpha / 2)).cast("int"))).as("ci_lo"),
        element_at(col("__arr"), least(size(col("__arr")),
          ceil(size(col("__arr")) * lit(1 - alpha / 2)).cast("int")))
          .as("ci_hi"))
    val full = base.agg(count(lit(1)).as("n"),
      (sum(v) / count(lit(1))).as("mean"))
    full.crossJoin(broadcast(ci))
      .select(col("n"), lit(b).as("b"), col("mean"), col("ci_lo"), col("ci_hi"))
  }

  /** Two-sample Kolmogorov–Smirnov statistic: the maximum absolute
    * difference between the two groups' empirical CDFs, evaluated at
    * every observed value. Returns ONE row `(n_a, n_b, d)`.
    *
    * Like [[mannWhitneyU]], the reduction runs at distinct-value
    * granularity (cumulative counts over the value grid), and every
    * per-value CDF step divides the same exact BIGINTs on any engine —
    * `d` is deterministic with no rounding.
    */
  def ksTest(
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
    val totals = byValue.agg(
      coalesce(sum("__ca"), lit(0L)).as("n_a"),
      coalesce(sum("__cb"), lit(0L)).as("n_b"))
    val cum = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byValue.crossJoin(broadcast(totals))
      .withColumn("__cumA", sum(col("__ca")).over(cum))
      .withColumn("__cumB", sum(col("__cb")).over(cum))
      .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        max(abs(col("__cumA") / col("n_a") - col("__cumB") / col("n_b")))
          .as("d"))
  }

  /** Two-proportion z-test (pooled standard error): compare the rate
    * at which `successCol` (a boolean column/expression name) holds
    * between `groupA` and `groupB`. The funnel-conversion readout.
    * Returns ONE row `(n_a, s_a, n_b, s_b, p_a, p_b, z)`; `z` is NULL
    * when a group is empty or the pooled rate is degenerate (0 or 1).
    * One `sum(when(...))` scan; all statistics are IEEE functions of
    * four exact counts.
    */
  def proportionZTest(
      df: DataFrame,
      successCol: String,
      groupCol: String,
      groupA: String,
      groupB: String
  ): MayFail[DataFrame] = MayFail {
    require(groupA != groupB, s"groups must differ: $groupA")
    val succ = col(successCol).cast("boolean")
    def in(label: String) = col(groupCol) === lit(label)
    val base = df
      .filter(succ.isNotNull && col(groupCol).isin(groupA, groupB))
      .agg(
        count(when(in(groupA), 1)).as("n_a"),
        count(when(in(groupA) && succ, 1)).as("s_a"),
        count(when(in(groupB), 1)).as("n_b"),
        count(when(in(groupB) && succ, 1)).as("s_b"))
    val pa = col("s_a") / col("n_a")
    val pb = col("s_b") / col("n_b")
    val p = (col("s_a") + col("s_b")) / (col("n_a") + col("n_b"))
    val ok = col("n_a") >= 1 && col("n_b") >= 1 && p > 0 && p < 1
    base
      .withColumn("p_a", when(col("n_a") >= 1, pa))
      .withColumn("p_b", when(col("n_b") >= 1, pb))
      .withColumn("z", when(ok,
        (pa - pb) / sqrt(p * (lit(1) - p) *
          (lit(1.0) / col("n_a") + lit(1.0) / col("n_b")))))
      .select("n_a", "s_a", "n_b", "s_b", "p_a", "p_b", "z")
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

  /** Spearman rank correlation of two numeric columns — the monotone-
    * association companion to [[correlationMatrix]]'s Pearson r (rank
    * correlation is outlier-robust and scale-free; use it when the
    * relationship is monotone but not linear). Midrank ties (the
    * standard `rho` with tie handling via Pearson-on-midranks).
    *
    * Returns ONE row `(n: bigint, rho: double)` — NULL `rho` when
    * either column is constant (zero rank variance) or n < 2.
    *
    * Plan: NO per-row ranking anywhere — per-column midranks live on
    * each column's DISTINCT-VALUE grid (the [[mannWhitneyU]] tie-run
    * device: a run of t equal values after c smaller ones has midrank
    * c + (t+1)/2), and the Pearson moments reduce over the DISTINCT
    * (a, b) CELL grid with multiplicities. A 10¹⁰-row frame over
    * bounded value domains computes rho from its grids only. One
    * shuffle per column grid + one on the pair cells. Midranks exact
    * dyadics; the moment sums are χ²-tier.
    */
  def spearman(
      df: DataFrame,
      aCol: String,
      bCol: String
  ): MayFail[DataFrame] = MayFail {
    val a = col(aCol).cast("double")
    val b = col(bCol).cast("double")
    val base = df.filter(a.isNotNull && b.isNotNull)
      .select(a.as("__a"), b.as("__b"))
    val cells = base.groupBy("__a", "__b").agg(count(lit(1)).as("__c"))
    def midranks(valueOut: String, rankOut: String, side: String) = {
      val grid = cells.groupBy(col(side).as(valueOut))
        .agg(sum(col("__c")).as("__t"))
      val before = Window.orderBy(col(valueOut))
        .rowsBetween(Window.unboundedPreceding, -1)
      grid.withColumn(rankOut,
        coalesce(sum(col("__t")).over(before), lit(0L)) +
          (col("__t") + lit(1)) / lit(2.0))
        .select(valueOut, rankOut)
    }
    val withRanks = cells
      .join(midranks("__a", "__ra", "__a"), Seq("__a"))
      .join(midranks("__b", "__rb", "__b"), Seq("__b"))
    withRanks.agg(
        coalesce(sum(col("__c")), lit(0L)).as("n"),
        coalesce(sum(col("__c") * col("__ra")), lit(0.0)).as("__sa"),
        coalesce(sum(col("__c") * col("__rb")), lit(0.0)).as("__sb"),
        coalesce(sum(col("__c") * col("__ra") * col("__ra")), lit(0.0))
          .as("__saa"),
        coalesce(sum(col("__c") * col("__rb") * col("__rb")), lit(0.0))
          .as("__sbb"),
        coalesce(sum(col("__c") * col("__ra") * col("__rb")), lit(0.0))
          .as("__sab"))
      .withColumn("__va", col("n") * col("__saa") - col("__sa") * col("__sa"))
      .withColumn("__vb", col("n") * col("__sbb") - col("__sb") * col("__sb"))
      .select(col("n"),
        when(col("n") >= 2 && col("__va") > 0 && col("__vb") > 0,
          (col("n") * col("__sab") - col("__sa") * col("__sb")) /
            sqrt(col("__va") * col("__vb"))).as("rho"))
  }

  /** One-way ANOVA F-test of `valueCol` across ALL groups of
    * `groupCol` (the k-group generalization of [[welchTTest]]'s
    * two-group question, under the classic equal-variance model):
    * between-group and within-group sums of squares from one
    * two-stage aggregation — per-group (n, Σ, Σ²) then a k-row
    * reduction — so a 10¹⁰-row experiment costs one scan.
    *
    * Returns ONE row `(n, k: bigint, ss_between, ss_within,
    * df_between, df_within: bigint, f: double)`; NULL `f` when
    * degenerate (k < 2, n ≤ k, or zero within-group variance).
    *
    * Determinism: per-group sums are exact under integral (×100)
    * inputs; the k-row reduction sums `Σ²/n` doubles (χ²-tier ulp
    * noise — round gate comparisons with the 1e-9 tie-shift).
    */
  def anova(
      df: DataFrame,
      valueCol: String,
      groupCol: String
  ): MayFail[DataFrame] = MayFail {
    val v = col(valueCol).cast("double")
    val per = df.filter(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n"), sum(v).as("__s"), sum(v * v).as("__s2"))
    per.agg(
        coalesce(sum(col("__n")), lit(0L)).as("n"),
        count(lit(1)).as("k"),
        coalesce(sum(col("__s")), lit(0.0)).as("__S"),
        coalesce(sum(col("__s2")), lit(0.0)).as("__S2"),
        coalesce(sum(col("__s") * col("__s") / col("__n")), lit(0.0))
          .as("__B"))
      .withColumn("ss_between",
        when(col("n") > 0,
          greatest(col("__B") - col("__S") * col("__S") / col("n"),
            lit(0.0))))
      .withColumn("ss_within",
        when(col("n") > 0, greatest(col("__S2") - col("__B"), lit(0.0))))
      .withColumn("df_between", col("k") - 1)
      .withColumn("df_within", col("n") - col("k"))
      .withColumn("f",
        when(col("k") >= 2 && col("df_within") >= 1 && col("ss_within") > 0,
          (col("ss_between") / col("df_between")) /
            (col("ss_within") / col("df_within"))))
      .select("n", "k", "ss_between", "ss_within",
        "df_between", "df_within", "f")
  }

  /** Cramér's V association strength for two categorical columns —
    * the effect size [[chiSquareIndependence]] lacks: χ² grows with N,
    * so at 10¹⁰ rows everything is "significant"; V = √(χ²/(N·min(r−1,
    * c−1))) rescales to [0, 1] where ~0.1/0.3/0.5 read as
    * weak/moderate/strong. The feature-redundancy screen before
    * training on correlated categoricals.
    *
    * Returns ONE row `(n, n_rows, n_cols: bigint, chi2, v: double)` —
    * NULL `v` when either dimension is constant (min = 0) or N = 0.
    *
    * Plan: identical to [[chiSquareIndependence]] — one partial-agg
    * shuffle to the (row, col) cells, tiny-grid arithmetic. χ²-tier
    * float sums.
    */
  def cramersV(
      df: DataFrame,
      rowCol: String,
      colCol: String
  ): MayFail[DataFrame] =
    chiSquareIndependence(df, rowCol, colCol).map { base =>
      val m = least(col("n_rows") - 1, col("n_cols") - 1)
      base.select(col("n"), col("n_rows"), col("n_cols"), col("chi2"),
        when(col("n") > 0 && m > 0,
          sqrt(col("chi2") / (col("n") * m))).as("v"))
    }

  /** Fisher's exact test on a 2×2 contingency table — the
    * small-count-safe alternative to [[chiSquareIndependence]] (χ²'s
    * expected-count-≥5 assumption routinely fails on rare-category
    * screens). `rowCol`/`colCol` are cast to boolean; NULL rows are
    * dropped. Two-sided p: the sum of all hypergeometric tables whose
    * PMF ≤ the observed PMF × (1+1e-7) — the standard relative-slack
    * convention (as in R's fisher.test).
    *
    * Returns ONE row `(a, b, c, d: bigint, odds_ratio, p_two_sided:
    * double)` — cells (a=TT, b=TF, c=FT, d=FF), `odds_ratio` the
    * sample ad/bc (NULL when bc = 0).
    *
    * Plan: ONE distributed aggregation for the four cells; the
    * hypergeometric tail is a bounded DRIVER-side loop of
    * `min(r1,c1) − max(0,c1−r2)` log-PMF terms (log-binomials via
    * commons-math `logGamma`, shipped with Spark). At 100 TB that loop
    * is O(smallest margin) — for huge balanced margins prefer
    * [[chiSquareIndependence]], which the large counts then justify.
    * Counts exact; the PMF comparison and tail sum are χ²-tier floats
    * (cross-engine lgamma ulps covered by the inclusion slack and the
    * gate tie-shift).
    */
  def fisherExact(
      df: DataFrame,
      rowCol: String,
      colCol: String
  ): MayFail[DataFrame] = MayFail {
    val r = col(rowCol).cast("boolean")
    val c = col(colCol).cast("boolean")
    val cells = df.filter(r.isNotNull && c.isNotNull).agg(
      count(when(r && c, 1)).as("a"),
      count(when(r && !c, 1)).as("b"),
      count(when(!r && c, 1)).as("c"),
      count(when(!r && !c, 1)).as("d")).collect()(0)
    val (a, b, cc, d) = (cells.getLong(0), cells.getLong(1),
      cells.getLong(2), cells.getLong(3))
    import org.apache.commons.math3.special.Gamma.logGamma
    def lf(x: Long): Double = logGamma(x + 1.0)
    val r1 = a + b; val r2 = cc + d; val c1 = a + cc; val n = r1 + r2
    def lpmf(k: Long): Double =
      lf(r1) + lf(r2) + lf(c1) + lf(n - c1) - lf(n) -
        lf(k) - lf(r1 - k) - lf(c1 - k) - lf(r2 - c1 + k)
    val p =
      if (n == 0L) 1.0
      else {
        val kLo = math.max(0L, c1 - r2); val kHi = math.min(r1, c1)
        val thresh = lpmf(a) + math.log1p(1e-7)
        var s = 0.0; var k = kLo
        while (k <= kHi) {
          val lp = lpmf(k); if (lp <= thresh) s += math.exp(lp); k += 1
        }
        math.min(s, 1.0)
      }
    val or: java.lang.Double =
      if (b > 0 && cc > 0) a.toDouble * d / (b.toDouble * cc) else null
    val sp = df.sparkSession
    import sp.implicits._
    Seq((a, b, cc, d, Option(or).map(_.doubleValue), p))
      .toDF("a", "b", "c", "d", "odds_ratio", "p_two_sided")
  }

  /** Brown–Forsythe/Levene test of variance homogeneity across ALL
    * groups of `groupCol` — the robust pre-check before trusting
    * [[anova]]'s or [[welchTTest]]'s pooled assumptions. Uses the
    * Brown–Forsythe form (centers = per-group TRUE medians — the
    * median-centered variant is robust to non-normality; Brown &
    * Forsythe 1974): `z = |v − median_g|`, then the one-way F on the
    * z-values.
    *
    * Returns ONE row `(n, k: bigint, ss_between, ss_within: double,
    * df_between, df_within: bigint, w: double)` — `w` is the test
    * statistic (the F of the z frame), NULL under the same degenerate
    * conditions as [[anova]].
    *
    * Plan: per-group medians at DISTINCT-VALUE granularity (the
    * [[mannWhitneyU]] discipline — a per-group value grid with
    * running-count windows partitioned BY GROUP, so the sort
    * parallelizes across groups), one join back to tag rows with their
    * group median, then the single-pass [[anova]] reduction. Under the
    * ×100 integral-input convention the medians are half-integral and
    * every z/z² sum is an exact dyadic — order-independent, the
    * strongest determinism tier.
    */
  def leveneTest(
      df: DataFrame,
      valueCol: String,
      groupCol: String
  ): MayFail[DataFrame] = MayFail {
    val v = col(valueCol).cast("double")
    val base = df.filter(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).as("__g"), v.as("__v"))
    val grid = base.groupBy("__g", "__v").agg(count(lit(1)).as("__t"))
    val upto = Window.partitionBy("__g").orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = grid.withColumn("__c", sum(col("__t")).over(upto))
      .withColumn("__n", sum(col("__t")).over(Window.partitionBy("__g")))
    val r1 = expr("(__n + 1) div 2")
    val r2 = expr("__n div 2 + 1")
    val m1 = cum.filter(col("__c") >= r1 && col("__c") - col("__t") < r1)
      .select(col("__g"), col("__v").as("__m1"))
    val m2 = cum.filter(col("__c") >= r2 && col("__c") - col("__t") < r2)
      .select(col("__g"), col("__v").as("__m2"))
    val med = m1.join(m2, Seq("__g"))
      .select(col("__g"), ((col("__m1") + col("__m2")) / 2).as("__m"))
    val z = base.join(med, Seq("__g"))
      .select(col("__g"), abs(col("__v") - col("__m")).as("__z"))
    anova(z, "__z", "__g").get.withColumnRenamed("f", "w")
  }

  /** Kruskal–Wallis H test of `valueCol` across ALL groups of
    * `groupCol` — the rank-based (distribution-free) counterpart of
    * [[anova]] and the k-group generalization of [[mannWhitneyU]],
    * with midrank ties and the standard tie correction
    * `C = 1 − Σ(t³−t)/(N³−N)`.
    *
    * Returns ONE row `(n, k, df: bigint, h, h_adj: double)` — `h_adj =
    * h / C`; NULL `h_adj` when every value ties (C = 0), NULL both
    * when k < 2.
    *
    * Plan: exactly the [[mannWhitneyU]] discipline — ranks reduce at
    * the DISTINCT-VALUE level: one partial-agg shuffle to (value,
    * group) cells, a value-grid running-sum window for midranks (the
    * grid, never the rows), one partial-agg shuffle to per-group rank
    * sums, and a k-row reduction. Midranks are exact dyadics; `h`
    * carries only the final IEEE divisions.
    */
  def kruskalWallis(
      df: DataFrame,
      valueCol: String,
      groupCol: String
  ): MayFail[DataFrame] = MayFail {
    val v = col(valueCol).cast("double")
    val cells = df.filter(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .groupBy(v.as("__v"), col(groupCol).as("__g"))
      .agg(count(lit(1)).as("__c"))
    val perV = cells.groupBy("__v").agg(sum(col("__c")).as("__t"))
    val before = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val mids = perV
      .withColumn("__mid",
        coalesce(sum(col("__t")).over(before), lit(0L)) +
          (col("__t") + lit(1)) / lit(2.0))
    val perG = cells.join(mids, Seq("__v"))
      .groupBy("__g")
      .agg(sum(col("__c")).as("__ng"),
        sum(col("__c") * col("__mid")).as("__rg"))
    // tie term in double: t³ would overflow Long for ~2³¹-row tie runs
    val ties = perV.agg(
      coalesce(sum(col("__t").cast("double") * col("__t") * col("__t") -
        col("__t")), lit(0.0)).as("__tc"))
    perG.agg(
        coalesce(sum(col("__ng")), lit(0L)).as("n"),
        count(lit(1)).as("k"),
        coalesce(sum(col("__rg") * col("__rg") / col("__ng")), lit(0.0))
          .as("__R"))
      .crossJoin(broadcast(ties))
      .withColumn("df", col("k") - 1)
      .withColumn("h",
        when(col("k") >= 2 && col("n") >= 2,
          lit(12.0) / (col("n") * (col("n") + lit(1))) * col("__R") -
            lit(3.0) * (col("n") + lit(1))))
      .withColumn("__C",
        lit(1.0) - col("__tc") /
          (col("n").cast("double") * col("n") * col("n") - col("n")))
      .withColumn("h_adj", when(col("__C") > 0, col("h") / col("__C")))
      .select("n", "k", "df", "h", "h_adj")
  }

  /** Benjamini–Hochberg FDR adjustment over a HYPOTHESIS-level frame
    * (one row per test): adds the step-up adjusted q-value
    * `q_i = min_{j ≥ i} (p_(j) · n / j)` clamped at 1, and a `reject`
    * flag at level `alpha` (reject ⇔ q ≤ alpha — equivalent to the
    * classic largest-i rule). The multiple-comparisons guard for
    * metric sweeps: thousands of [[welchTTest]] readouts can't all be
    * winners.
    *
    * Plan: the [[gini]] trick — the order statistic reduces to
    * DISTINCT-P granularity. Within a tie run of equal p, `p·n/j` is
    * minimized at the run's LAST index, so the grid needs one running
    * count and one reverse running min over distinct p values (never
    * the rows), then a broadcast-scale join back onto the tests.
    * NULL-p rows pass through with NULL q/reject.
    *
    * Adds `q_value: double, reject: boolean`.
    */
  def fdrAdjust(
      df: DataFrame,
      pCol: String,
      alpha: Double = 0.05
  ): MayFail[DataFrame] = MayFail {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1): $alpha")
    val p = col(pCol).cast("double")
    val bad = df.filter(p < 0 || p > 1).limit(1).count()
    require(bad == 0, s"$pCol must lie in [0,1]")
    val grid = df.filter(p.isNotNull)
      .groupBy(p.as("__p")).agg(count(lit(1)).as("__t"))
    val upto = Window.orderBy(col("__p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fromHere = Window.orderBy(col("__p"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val total = grid.agg(coalesce(sum(col("__t")), lit(0L)).as("__n"))
    val qs = grid
      .crossJoin(broadcast(total))
      .withColumn("__jhi", sum(col("__t")).over(upto))
      .withColumn("__raw", col("__p") * col("__n") / col("__jhi"))
      .withColumn("q_value", least(min(col("__raw")).over(fromHere), lit(1.0)))
      .select(col("__p"), col("q_value"))
    df.join(qs, p === col("__p"), "left")
      .drop("__p")
      .withColumn("reject",
        when(p.isNotNull, col("q_value") <= alpha))
  }

  /** Friedman test — repeated-measures rank ANOVA: does an ORDINAL
    * metric differ across k treatments applied to the SAME subjects?
    * Completes the paired-design family: [[mcnemar]] (binary, k = 2),
    * [[cochranQ]] (binary, k), [[wilcoxonSignedRank]] (ordinal, k = 2),
    * this (ordinal, k); [[kruskalWallis]] is the UNPAIRED counterpart.
    * Values rank WITHIN each subject (midranks for ties), `χ²_F =
    * 12/(n·k·(k+1)) · ΣR_j² − 3n(k+1)` with the standard tie
    * correction `C = 1 − Σ(t³−t)/(n·(k³−k))` (tie runs within
    * subjects).
    *
    * COMPLETE-BLOCK contract (the classic design): exactly ONE
    * observation per (subject, treatment) and every subject covers all
    * k treatments — enforced with `require`s, like [[fleissKappa]];
    * aggregate or filter first.
    *
    * Returns ONE row `(n_subjects, k: bigint, df: bigint, chi2,
    * chi2_adj: double)` — NULL chi2_adj when every subject's ranking
    * is fully tied (C = 0).
    *
    * Plan: midranks come from per-SUBJECT windows (partitions are
    * k-row blocks — bounded by the treatment count, so sorts
    * parallelize across subjects and no partition ever exceeds k
    * rows), rank sums shuffle once on the treatment key, tie cubics
    * are ≤ k³ per run. R_j reaches n·k(k+1)/2, so ΣR_j² squares in
    * DOUBLE from the first factor (exact below 2⁵³; the Long square
    * would ANSI-throw near ~2e9 subject-treatments). */
  def friedman(
      df: DataFrame,
      valueCol: String,
      subjectCol: String,
      treatmentCol: String
  ): MayFail[DataFrame] = MayFail {
    val v = col(valueCol).cast("double")
    val cells = df
      .filter(col(subjectCol).isNotNull && col(treatmentCol).isNotNull &&
        v.isNotNull)
      .select(col(subjectCol).as("__s"),
        col(treatmentCol).cast("string").as("__t"), v.as("__v"))
    val dup = cells.groupBy("__s", "__t").agg(count(lit(1)).as("__c"))
      .filter(col("__c") > 1).limit(1).count()
    require(dup == 0,
      "friedman needs exactly ONE observation per (subject, treatment) — " +
        "aggregate first")
    val k = cells.select(countDistinct(col("__t"))).first().getLong(0)
    require(k >= 2, s"friedman needs k >= 2 treatments (got $k)")
    val incomplete = cells.groupBy("__s").agg(count(lit(1)).as("__c"))
      .filter(col("__c") =!= k).limit(1).count()
    require(incomplete == 0,
      s"friedman: every subject must cover all $k treatments " +
        "(complete block design) — filter to complete subjects first")
    val wOrd = Window.partitionBy(col("__s")).orderBy(col("__v"), col("__t"))
    val wTie = Window.partitionBy(col("__s"), col("__v"))
    val ranked = cells
      .withColumn("__rn", row_number().over(wOrd))
      // midrank = mean of the tie run's consecutive integer positions —
      // an exact dyadic (sum of ≤ k ints / run length)
      .withColumn("__mid", avg(col("__rn")).over(wTie))
      .withColumn("__trun", count(lit(1)).over(wTie))
    val rj = ranked.groupBy("__t").agg(sum(col("__mid")).as("__rj"))
      .agg(count(lit(1)).as("k"),
        coalesce(sum(col("__rj") * col("__rj")), lit(0.0)).as("__sr2"))
    // each tie RUN of length t contributes t³ − t, counted once per run
    // (every member row carries __trun = t, so divide by t: t² − 1 each)
    val ties = ranked.agg(
      (count(lit(1)) / lit(k)).cast("long").as("n_subjects"),
      coalesce(sum(col("__trun").cast("double") * col("__trun") - 1),
        lit(0.0)).as("__tc"))
    ties.crossJoin(broadcast(rj))
      .withColumn("chi2",
        lit(12.0) * col("__sr2") /
          (col("n_subjects").cast("double") * col("k") * (col("k") + 1)) -
          lit(3.0) * col("n_subjects") * (col("k") + 1))
      .withColumn("__C",
        lit(1.0) - col("__tc") /
          (col("n_subjects").cast("double") *
            (col("k") * col("k") * col("k") - col("k"))))
      .select(col("n_subjects"), col("k"), (col("k") - 1).as("df"),
        col("chi2"),
        when(col("__C") > 0, col("chi2") / col("__C")).as("chi2_adj"))
  }

  /** Holm step-down FWER adjustment — [[fdrAdjust]]'s strict sibling:
    * controls the FAMILY-WISE error rate (any false positive at all)
    * instead of the false-discovery rate, the right guard when a single
    * false claim is expensive (ship/no-ship gates) rather than a rate
    * to budget. Adds `p_adj = min(1, max_{j ≤ i} (n − j + 1)·p_(j))`
    * over ascending p, and `reject ⇔ p_adj ≤ alpha` (equivalent to the
    * classic sequential rule — the running max IS the step-down).
    *
    * Plan: the [[fdrAdjust]] grid — order statistics at DISTINCT-P
    * granularity. Within a tie run of equal p, `(n − j + 1)·p` is
    * maximized at the run's FIRST index, so one before-window running
    * count and one prefix max over the p grid (never the rows) suffice;
    * broadcast-scale join back. NULL-p rows pass through with NULLs. */
  def holmAdjust(
      df: DataFrame,
      pCol: String,
      alpha: Double = 0.05
  ): MayFail[DataFrame] = MayFail {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1): $alpha")
    val p = col(pCol).cast("double")
    val bad = df.filter(p < 0 || p > 1).limit(1).count()
    require(bad == 0, s"$pCol must lie in [0,1]")
    val grid = df.filter(p.isNotNull)
      .groupBy(p.as("__p")).agg(count(lit(1)).as("__t"))
    val before = Window.orderBy(col("__p"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val upto = Window.orderBy(col("__p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val total = grid.agg(coalesce(sum(col("__t")), lit(0L)).as("__n"))
    val adj = grid
      .crossJoin(broadcast(total))
      .withColumn("__jlo",
        coalesce(sum(col("__t")).over(before), lit(0L)) + 1)
      .withColumn("__term",
        (col("__n") - col("__jlo") + 1).cast("double") * col("__p"))
      .withColumn("p_adj", least(max(col("__term")).over(upto), lit(1.0)))
      .select(col("__p"), col("p_adj"))
    df.join(adj, p === col("__p"), "left")
      .drop("__p")
      .withColumn("reject", when(p.isNotNull, col("p_adj") <= alpha))
  }

  /** Two-sample Anderson–Darling test statistic (Scholz & Stephens
    * 1987, the non-midrank k=2 form at distinct-value granularity):
    *
    *   A² = 1/(n_a·n_b) · Σ_j  l_j · (N·M_j − n_a·B_j)² / (B_j·(N−B_j))
    *
    * over distinct sorted values j with cumulative count B_j < N,
    * where l_j is the count at value j, M_j the cumulative count from
    * sample a, N = n_a + n_b. The tail-sensitive companion to
    * [[ksTest]]: KS sees only the single largest ECDF gap, A² weights
    * every gap by 1/(B(N−B)) — differences in the DISTRIBUTION TAILS
    * move A² long before they move D. Under H₀, E[A²] ≈ 1; compare to
    * the Scholz–Stephens tables (the variance normalization needs
    * their σ_N polynomial — deliberately out of scope here).
    *
    * Returns one row `(n_a, n_b: bigint, a2: double)`.
    *
    * Plan: the [[mannWhitneyU]] device — one partial-agg reduction to
    * the DISTINCT-VALUE grid, windows over the grid only (a 10¹⁰-row
    * sample windows over its value grid), one scalar agg. The bracket
    * `N·M − n_a·B` multiplies in DOUBLE from the first factor (the
    * Long products would ANSI-throw past ~3·10⁹ rows; exact while
    * below 2⁵³). Σ of float terms is χ²-tier — round when gating.
    */
  def andersonDarling(
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
    val upto = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val st = byValue
      .withColumn("__l", col("__ca") + col("__cb"))
      .withColumn("__B", sum(col("__l")).over(upto))
      .withColumn("__M", sum(col("__ca")).over(upto))
    val tot = st.agg(
      coalesce(sum(col("__ca")), lit(0L)).as("n_a"),
      coalesce(sum(col("__cb")), lit(0L)).as("n_b"))
    val n = col("n_a") + col("n_b")
    val bracket = n.cast("double") * col("__M") -
      col("n_a").cast("double") * col("__B")
    val termSum = st.crossJoin(broadcast(tot))
      .filter(col("__B") < n)
      .select((col("__l") * bracket * bracket /
        (col("__B").cast("double") * (n - col("__B")))).as("__term"))
      .agg(coalesce(sum(col("__term")), lit(0.0)).as("__s"))
    tot.crossJoin(broadcast(termSum))
      .select(col("n_a"), col("n_b"),
        when(col("n_a") > 0 && col("n_b") > 0,
          col("__s") / (col("n_a").cast("double") * col("n_b"))).as("a2"))
  }

  /** CUPED variance-reduced A/B effect (Deng, Xu, Kohavi & Walker,
    * WSDM'13): adjust each unit's metric by its PRE-experiment
    * covariate, `y' = y − θ(x − x̄)` with `θ = cov(x, y)/var(x)`, and
    * estimate the treatment effect on the adjusted metric — the
    * covariate is unaffected by treatment, so the effect is unbiased
    * while the estimator variance shrinks by the squared correlation.
    * The difference between shipping an experiment readout in one week
    * vs three at a given sensitivity.
    *
    * `df` is UNIT-level (one row per randomization unit). θ is pooled
    * across both groups (the standard single-θ form — a per-group θ
    * would re-introduce bias under heterogeneous pre-period slopes).
    * Rows outside the two named groups, or with null metric/covariate,
    * are excluded.
    *
    * Returns one row `(n_treat, n_ctrl: bigint, theta, effect_raw,
    * se_raw, effect_cuped, se_cuped, var_reduction: double)` — Welch
    * unpooled standard errors on both the raw and adjusted metric;
    * `var_reduction = 1 − var(y')/var(y)` pooled over both groups.
    * Zero-variance covariate → θ = 0 and CUPED degrades to the raw
    * estimate (no division blow-up).
    *
    * Plan: one scalar aggregate for θ/x̄ (broadcast back — 1-row
    * frame), then one conditional aggregate pass to the single output
    * row. Two scans, no shuffle wider than the partial aggs. Float
    * tier: covariance partial sums — round outputs when gating.
    */
  def cuped(
      df: DataFrame,
      groupCol: String,
      metricCol: String,
      covariateCol: String,
      treatGroup: String,
      controlGroup: String
  ): MayFail[DataFrame] = MayFail {
    require(treatGroup != controlGroup,
      "treatGroup and controlGroup must differ")
    val g = col(groupCol).cast("string")
    val y = col(metricCol).cast("double")
    val x = col(covariateCol).cast("double")
    val base = df.filter(y.isNotNull && x.isNotNull &&
        (g === treatGroup || g === controlGroup))
      .select(g.as("__g"), y.as("__y"), x.as("__x"))
    val pre = base.agg(
      covar_pop(col("__x"), col("__y")).as("__cxy"),
      var_pop(col("__x")).as("__vx"),
      avg(col("__x")).as("__mx"))
    val theta = when(col("__vx") > 0, col("__cxy") / col("__vx"))
      .otherwise(lit(0.0))
    val adj = base.crossJoin(broadcast(pre))
      .withColumn("__theta", theta)
      .withColumn("__adj",
        col("__y") - col("__theta") * (col("__x") - col("__mx")))
      .withColumn("__t", (col("__g") === treatGroup).cast("int"))
    val t = col("__t")
    adj.agg(
        count(when(t === 1, lit(1))).as("n_treat"),
        count(when(t === 0, lit(1))).as("n_ctrl"),
        first(col("__theta")).as("theta"),
        avg(when(t === 1, col("__y"))).as("__myt"),
        avg(when(t === 0, col("__y"))).as("__myc"),
        avg(when(t === 1, col("__adj"))).as("__mat"),
        avg(when(t === 0, col("__adj"))).as("__mac"),
        var_pop(when(t === 1, col("__y"))).as("__vyt"),
        var_pop(when(t === 0, col("__y"))).as("__vyc"),
        var_pop(when(t === 1, col("__adj"))).as("__vat"),
        var_pop(when(t === 0, col("__adj"))).as("__vac"),
        var_pop(col("__y")).as("__vy"),
        var_pop(col("__adj")).as("__va"))
      .select(col("n_treat"), col("n_ctrl"), col("theta"),
        (col("__myt") - col("__myc")).as("effect_raw"),
        sqrt(col("__vyt") / col("n_treat") + col("__vyc") / col("n_ctrl"))
          .as("se_raw"),
        (col("__mat") - col("__mac")).as("effect_cuped"),
        sqrt(col("__vat") / col("n_treat") + col("__vac") / col("n_ctrl"))
          .as("se_cuped"),
        when(col("__vy") > 0, lit(1.0) - col("__va") / col("__vy"))
          .as("var_reduction"))
  }

  /** Kendall's τ-b rank correlation of two numeric columns — the
    * concordance companion to [[spearman]] (τ has a direct
    * probabilistic reading: P(concordant) − P(discordant), and its
    * tie correction is symmetric in both margins). NULL rows on
    * either side are dropped.
    *
    * Returns ONE row `(n, n0, n1, n2, concordant, discordant, tied_xy:
    * bigint, tau_b: double)` — `n0 = n(n−1)/2` total pairs, `n1`/`n2`
    * the tied-pair counts of the a/b margins, `tau_b = (C − D) /
    * sqrt((n0−n1)(n0−n2))`, NULL when either margin is constant.
    *
    * Plan: observations reduce to the DISTINCT (a, b) CELL grid with
    * multiplicities (one partial-agg shuffle), then concordant /
    * discordant pairs come from a grid×grid broadcast nested-loop
    * join — quadratic in DISTINCT CELLS, never in rows, which is why
    * `maxCells` (driver-checked) guards the quadratic: a 10¹⁰-row
    * frame over a bounded/discretized domain pays k² for k cells,
    * while a continuous column must be binned first (the caller's
    * explicit decision, same contract as [[TimeSeries.theilSen]]'s
    * `maxPoints`). All pair counts are exact products of exact longs;
    * only the final τ divides.
    */
  def kendallTau(
      df: DataFrame,
      aCol: String,
      bCol: String,
      maxCells: Int = 10000
  ): MayFail[DataFrame] = MayFail {
    val a = col(aCol).cast("double")
    val b = col(bCol).cast("double")
    val cells = df.filter(a.isNotNull && b.isNotNull)
      .select(a.as("__a"), b.as("__b"))
      .groupBy("__a", "__b").agg(count(lit(1)).as("__c"))
    val k = cells.count()
    require(k <= maxCells,
      s"kendallTau: $k distinct (a,b) cells exceed maxCells=$maxCells — " +
        "bin/discretize the inputs first (the quadratic is over cells)")
    val l = cells.select(col("__a").as("__a1"), col("__b").as("__b1"),
      col("__c").as("__c1"))
    val r = broadcast(cells.select(col("__a").as("__a2"),
      col("__b").as("__b2"), col("__c").as("__c2")))
    // count each unordered pair once: strict order on a, either order on b
    val pairs = l.join(r, col("__a1") < col("__a2"))
      .agg(
        coalesce(sum(when(col("__b1") < col("__b2"),
          col("__c1") * col("__c2"))), lit(0L)).as("concordant"),
        coalesce(sum(when(col("__b1") > col("__b2"),
          col("__c1") * col("__c2"))), lit(0L)).as("discordant"))
    val margins = cells.agg(
      coalesce(sum(col("__c")), lit(0L)).as("n"),
      // Σ over same-a (and same-(a,b)) pairs: exact tie-run arithmetic
      coalesce(sum(col("__c") * (col("__c") - 1)), lit(0L)).as("__sxy2"))
    val tiesA = cells.groupBy("__a").agg(sum(col("__c")).as("__t"))
      .agg(coalesce(sum(expr("__t * (__t - 1) div 2")), lit(0L)).as("n1"))
    val tiesB = cells.groupBy("__b").agg(sum(col("__c")).as("__t"))
      .agg(coalesce(sum(expr("__t * (__t - 1) div 2")), lit(0L)).as("n2"))
    margins.crossJoin(tiesA).crossJoin(tiesB).crossJoin(pairs)
      .withColumn("n0", expr("n * (n - 1) div 2"))
      .withColumn("tied_xy", expr("__sxy2 div 2"))
      .select(col("n"), col("n0"), col("n1"), col("n2"),
        col("concordant"), col("discordant"), col("tied_xy"),
        when(col("n0") > col("n1") && col("n0") > col("n2"),
          (col("concordant") - col("discordant")).cast("double") /
            sqrt((col("n0") - col("n1")).cast("double") *
              (col("n0") - col("n2")).cast("double"))).as("tau_b"))
  }

  /** Cliff's delta — the nonparametric effect size companion to
    * [[mannWhitneyU]] (U says whether the groups differ; δ = P(a > b)
    * − P(a < b) says by HOW MUCH, scale-free in [−1, 1]).
    *
    * Returns ONE row `(n_a, n_b: bigint, gt, lt, ties, delta: double)`
    * — `gt`/`lt`/`ties` the cross-pair counts (DOUBLE: pair counts
    * reach n_a·n_b ≈ n²/4, past Long at ~6e9 rows — exact while below
    * 2⁵³, the same honesty as [[wilcoxonSignedRank]]'s rank sums),
    * `delta = (gt − lt)/(n_a·n_b)`, NULL when either group is empty.
    *
    * Plan: the [[mannWhitneyU]] distinct-value-grid device — one
    * partial-agg shuffle to the value grid, ONE running-count window
    * over the grid (never the rows). A 10¹⁰-row experiment pays its
    * distinct-value grid only.
    */
  def cliffsDelta(
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
    byValue
      .withColumn("__cumB", coalesce(sum(col("__cb")).over(before), lit(0L)))
      .agg(
        coalesce(sum(col("__ca")), lit(0L)).as("n_a"),
        coalesce(sum(col("__cb")), lit(0L)).as("n_b"),
        // pair counts in double from the first factor: ca·cumB reaches
        // n²/4, an ANSI Long overflow at ~6e9 rows
        coalesce(sum(col("__ca").cast("double") * col("__cumB")), lit(0.0))
          .as("gt"),
        coalesce(sum(col("__ca").cast("double") * col("__cb")), lit(0.0))
          .as("ties"))
      .withColumn("lt",
        col("n_a").cast("double") * col("n_b") - col("gt") - col("ties"))
      .select(col("n_a"), col("n_b"), col("gt"), col("lt"), col("ties"),
        when(col("n_a") > 0 && col("n_b") > 0,
          (col("gt") - col("lt")) /
            (col("n_a").cast("double") * col("n_b")))
          .as("delta"))
  }

  /** McNemar's test of marginal homogeneity for PAIRED binary
    * outcomes (before/after on the same subject — the paired
    * counterpart of [[proportionZTest]], which assumes independent
    * groups). `beforeCol`/`afterCol` are cast to boolean; rows with a
    * NULL on either side are dropped. χ² uses the Edwards continuity
    * correction `(|b−c|−1)²/(b+c)` when `correction` (the default);
    * `p_exact` is the two-sided exact binomial
    * `min(1, 2·Σ_{k≤min(b,c)} C(m,k)/2^m)`, m = b + c.
    *
    * Returns ONE row `(n, a, b, c, d: bigint, chi2, p_exact: double)`
    * — `b` = before-only discordant, `c` = after-only; NULL chi2 when
    * b + c = 0 (no discordant pairs).
    *
    * Plan: ONE distributed aggregation for the four cells; the exact
    * tail is a bounded DRIVER loop of `min(b,c)+1` log-binomial terms
    * (commons-math `logGamma`, the [[fisherExact]] device) — O(
    * discordant minimum), so at huge discordant counts the χ² is the
    * operative statistic and the loop stays cheap anyway.
    */
  def mcnemar(
      df: DataFrame,
      beforeCol: String,
      afterCol: String,
      correction: Boolean = true
  ): MayFail[DataFrame] = MayFail {
    val bf = col(beforeCol).cast("boolean")
    val af = col(afterCol).cast("boolean")
    val cells = df.filter(bf.isNotNull && af.isNotNull).agg(
      count(when(bf && af, 1)).as("a"),
      count(when(bf && !af, 1)).as("b"),
      count(when(!bf && af, 1)).as("c"),
      count(when(!bf && !af, 1)).as("d")).collect()(0)
    val (aa, b, c, d) = (cells.getLong(0), cells.getLong(1),
      cells.getLong(2), cells.getLong(3))
    val m = b + c
    val chi2: java.lang.Double =
      if (m == 0L) null
      else {
        val num =
          if (correction) { val x = math.abs(b - c) - 1.0; x * x }
          else { val x = (b - c).toDouble; x * x }
        num / m
      }
    import org.apache.commons.math3.special.Gamma.logGamma
    def lf(x: Long): Double = logGamma(x + 1.0)
    val pExact =
      if (m == 0L) 1.0
      else {
        val kMin = math.min(b, c)
        var s = 0.0; var k = 0L
        while (k <= kMin) {
          s += math.exp(lf(m) - lf(k) - lf(m - k) - m * math.log(2.0))
          k += 1
        }
        math.min(1.0, 2.0 * s)
      }
    val sp = df.sparkSession
    import sp.implicits._
    Seq((aa + b + c + d, aa, b, c, d,
        Option(chi2).map(_.doubleValue), pExact))
      .toDF("n", "a", "b", "c", "d", "chi2", "p_exact")
  }

  /** Hodges–Lehmann location-shift estimate between two samples — the
    * robust "how far apart are the groups" companion to
    * [[mannWhitneyU]] (the median of all n_a·n_b pairwise differences
    * a − b; the estimator whose confidence interval the rank test
    * inverts). Weighted-median convention over the pair multiset: with
    * N = n_a·n_b total pairs, the lower middle is pair (N+1) div 2 and
    * the upper N div 2 + 1 in difference order; `hl_shift` averages
    * the two (equal when N is odd).
    *
    * Returns ONE row `(n_a, n_b: bigint, n_pairs, hl_shift: double)` —
    * NULL shift when either group is empty. `n_pairs` (= n_a·n_b) is
    * DOUBLE: the pair count passes Long at ~3e9 rows per group, and
    * the weighted-median positions are exact while below 2⁵³.
    *
    * Plan: both samples reduce to their DISTINCT-VALUE grids, the
    * difference multiset is the ka×kb grid CROSS of the two (broadcast
    * nested-loop, guarded by `maxCells` on the product — the
    * [[kendallTau]] contract: quadratic in distinct values, never in
    * rows; bin continuous domains first), then one running-weight
    * window over the DISTINCT DIFFERENCES picks the two middles.
    */
  def hodgesLehmann(
      df: DataFrame,
      valueCol: String,
      groupCol: String,
      groupA: String,
      groupB: String,
      maxCells: Long = 10000000L
  ): MayFail[DataFrame] = MayFail {
    require(groupA != groupB, s"groups must differ: $groupA")
    val v = col(valueCol).cast("double")
    val base = df
      .filter(col(valueCol).isNotNull && col(groupCol).isin(groupA, groupB))
      .select(col(groupCol).as("g"), v.as("v"))
    val ga = base.filter(col("g") === groupA)
      .groupBy(col("v").as("__va")).agg(count(lit(1)).as("__ca"))
    val gb = base.filter(col("g") === groupB)
      .groupBy(col("v").as("__vb")).agg(count(lit(1)).as("__cb"))
    val (ka, kb) = (ga.count(), gb.count())
    require(ka * kb <= maxCells,
      s"hodgesLehmann: $ka x $kb distinct-value grid exceeds " +
        s"maxCells=$maxCells — bin the value column first")
    // pair weights in double from the first factor: ca·cb reaches
    // n_a·n_b, an ANSI Long overflow at ~3e9 rows per group; weights,
    // cumulative positions and the median ranks stay exact below 2⁵³
    val diffs = ga.join(broadcast(gb))
      .groupBy((col("__va") - col("__vb")).as("__d"))
      .agg(sum(col("__ca").cast("double") * col("__cb")).as("__w"))
    val upto = Window.orderBy(col("__d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = diffs.withColumn("__c", sum(col("__w")).over(upto))
      .withColumn("__n", sum(col("__w")).over(
        Window.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
    val r1 = floor((col("__n") + 1) / 2)
    val r2 = floor(col("__n") / 2) + 1
    val lower = cum.filter(col("__c") >= r1 && col("__c") - col("__w") < r1)
      .select(col("__d").as("__d1"), col("__n"))
    val upper = cum.filter(col("__c") >= r2 && col("__c") - col("__w") < r2)
      .select(col("__d").as("__d2"))
    val counts = base.agg(
      count(when(col("g") === groupA, 1)).as("n_a"),
      count(when(col("g") === groupB, 1)).as("n_b"))
    counts.join(
        lower.crossJoin(upper)
          .select(col("__n").as("n_pairs"),
            ((col("__d1") + col("__d2")) / 2).as("hl_shift")),
        lit(true), "left")
      .select(col("n_a"), col("n_b"),
        coalesce(col("n_pairs"), lit(0.0)).as("n_pairs"), col("hl_shift"))
  }

  /** Bayesian A/B readout for a binary metric — Beta–Binomial
    * posteriors per group and the EXACT posterior probability that B
    * beats A (the closed-form sum over integer posterior α's; Cook's
    * identity), the decision-ready alternative to
    * [[proportionZTest]]'s p-value. `priorAlpha`/`priorBeta` must be
    * positive INTEGERS (the exact sum needs integer α_B; Beta(1,1) =
    * uniform is the default).
    *
    * Returns ONE row `(n_a, s_a, n_b, s_b: bigint, mean_a, mean_b,
    * prob_b_beats_a, expected_lift: double)` — posterior means, P(p_B
    * > p_A), and E[p_B] − E[p_A].
    *
    * Plan: ONE distributed aggregation for the four counts; the
    * probability is a bounded DRIVER loop of α_B = priorAlpha + s_B
    * log-beta terms (commons-math `logGamma`, the [[fisherExact]]
    * device) — O(successes of B), so swap the groups to loop over the
    * smaller success count when it matters.
    */
  def bayesianAB(
      df: DataFrame,
      successCol: String,
      groupCol: String,
      groupA: String,
      groupB: String,
      priorAlpha: Long = 1L,
      priorBeta: Long = 1L
  ): MayFail[DataFrame] = MayFail {
    require(groupA != groupB, s"groups must differ: $groupA")
    require(priorAlpha >= 1 && priorBeta >= 1,
      s"integer priors >= 1 required: Beta($priorAlpha, $priorBeta)")
    val s = col(successCol).cast("boolean")
    val g = col(groupCol)
    val row = df.filter(s.isNotNull && g.isin(groupA, groupB)).agg(
      count(when(g === groupA, 1)).as("n_a"),
      count(when(g === groupA && s, 1)).as("s_a"),
      count(when(g === groupB, 1)).as("n_b"),
      count(when(g === groupB && s, 1)).as("s_b")).collect()(0)
    val (nA, sA, nB, sB) = (row.getLong(0), row.getLong(1),
      row.getLong(2), row.getLong(3))
    val (aA, bA) = (priorAlpha + sA, priorBeta + nA - sA)
    val (aB, bB) = (priorAlpha + sB, priorBeta + nB - sB)
    import org.apache.commons.math3.special.Gamma.logGamma
    def lbeta(x: Double, y: Double): Double =
      logGamma(x) + logGamma(y) - logGamma(x + y)
    val lbA = lbeta(aA.toDouble, bA.toDouble)
    var p = 0.0
    var i = 0L
    while (i < aB) {
      p += math.exp(lbeta(aA + i.toDouble, bA + bB.toDouble) -
        math.log(bB + i.toDouble) - lbeta(1.0 + i, bB.toDouble) - lbA)
      i += 1
    }
    val meanA = aA.toDouble / (aA + bA)
    val meanB = aB.toDouble / (aB + bB)
    val sp = df.sparkSession
    import sp.implicits._
    Seq((nA, sA, nB, sB, meanA, meanB, math.min(p, 1.0), meanB - meanA))
      .toDF("n_a", "s_a", "n_b", "s_b", "mean_a", "mean_b",
        "prob_b_beats_a", "expected_lift")
  }

  /** Experiment power readout — the minimum detectable effect at the
    * CURRENT sample sizes and the per-arm n required for a target
    * relative effect, for a binary metric (the "is this test even
    * worth running" screen before [[proportionZTest]]). Two-sided
    * normal approximation with equal-allocation variance `2p(1−p)`;
    * `zAlpha`/`zPower` default to the α = 0.05 / power = 0.80
    * constants (Φ⁻¹ is not portably computable in-plan, so the
    * quantiles are explicit parameters — pass your own for other
    * levels).
    *
    * Returns ONE row `(n_a, s_a, n_b: bigint, p_a, mde_abs, mde_rel:
    * double, n_required: bigint)` — `p_a` the baseline (group A)
    * rate, `mde_abs/_rel` the detectable absolute/relative lift given
    * `min(n_a, n_b)` per arm, `n_required` the per-arm size for
    * `targetRel`. NULLs when the baseline is degenerate (p_a ∈ {0,1}
    * or empty).
    *
    * Plan: one distributed aggregation, then pure column arithmetic —
    * no collect, composable at any scale.
    */
  def powerMde(
      df: DataFrame,
      successCol: String,
      groupCol: String,
      groupA: String,
      groupB: String,
      targetRel: Double = 0.1,
      zAlpha: Double = 1.9599639845400545,
      zPower: Double = 0.8416212335729143
  ): MayFail[DataFrame] = MayFail {
    require(groupA != groupB, s"groups must differ: $groupA")
    require(targetRel > 0, s"targetRel must be positive: $targetRel")
    val s = col(successCol).cast("boolean")
    val g = col(groupCol)
    val z = lit(zAlpha + zPower)
    df.filter(s.isNotNull && g.isin(groupA, groupB)).agg(
        count(when(g === groupA, 1)).as("n_a"),
        count(when(g === groupA && s, 1)).as("s_a"),
        count(when(g === groupB, 1)).as("n_b"))
      .withColumn("p_a",
        when(col("n_a") > 0, col("s_a").cast("double") / col("n_a")))
      .withColumn("__var", col("p_a") * (lit(1.0) - col("p_a")))
      .withColumn("__n", least(col("n_a"), col("n_b")))
      .select(col("n_a"), col("s_a"), col("n_b"), col("p_a"),
        when(col("__var") > 0 && col("__n") > 0,
          z * sqrt(lit(2.0) * col("__var") / col("__n"))).as("mde_abs"),
        when(col("__var") > 0 && col("__n") > 0,
          z * sqrt(lit(2.0) * col("__var") / col("__n")) / col("p_a"))
          .as("mde_rel"),
        when(col("__var") > 0,
          ceil(lit(2.0) * col("__var") *
            pow(z / (col("p_a") * lit(targetRel)), 2)).cast("long"))
          .as("n_required"))
  }

  /** Cohen's κ inter-rater agreement for two categorical columns —
    * "how much better than chance do the raters (or a model and its
    * ground truth) agree": `κ = (p_o − p_e)/(1 − p_e)` with `p_o` the
    * observed agreement share and `p_e` the marginal-product chance
    * agreement. NULL values on either side drop the row (use
    * [[Quality.confusionMatrix]] for the NULL-visible cell view).
    *
    * Returns ONE row `(n: bigint, p_observed, p_expected, kappa:
    * double)` — NULL κ when p_e = 1 (both raters constant).
    *
    * Plan: one cell aggregation over the label² grid, one marginal
    * pass; exact longs into one IEEE chain — gate unrounded.
    */
  def cohensKappa(
      df: DataFrame,
      rater1Col: String,
      rater2Col: String
  ): MayFail[DataFrame] = MayFail {
    val a = col(rater1Col).cast("string")
    val b = col(rater2Col).cast("string")
    val cells = df.filter(a.isNotNull && b.isNotNull)
      .select(a.as("__a"), b.as("__b"))
      .groupBy("__a", "__b").agg(count(lit(1)).as("__n"))
    val rows = cells.groupBy(col("__a").as("__c"))
      .agg(sum(col("__n")).as("__row"))
    val cols_ = cells.groupBy(col("__b").as("__c"))
      .agg(sum(col("__n")).as("__col"))
    val ab = rows.join(cols_, Seq("__c"), "full")
      .agg(coalesce(sum(coalesce(col("__row"), lit(0L)) *
        coalesce(col("__col"), lit(0L))), lit(0L)).as("__sab"))
    cells.agg(
        coalesce(sum(col("__n")), lit(0L)).as("n"),
        coalesce(sum(when(col("__a") === col("__b"), col("__n"))),
          lit(0L)).as("__agree"))
      .crossJoin(ab)
      .withColumn("p_observed",
        when(col("n") > 0, col("__agree").cast("double") / col("n")))
      .withColumn("p_expected",
        when(col("n") > 0, col("__sab").cast("double") /
          (col("n").cast("double") * col("n").cast("double"))))
      .select(col("n"), col("p_observed"), col("p_expected"),
        when(col("p_expected") < 1.0,
          (col("p_observed") - col("p_expected")) /
            (lit(1.0) - col("p_expected"))).as("kappa"))
  }

  /** Fleiss' κ — multi-rater agreement when EVERY subject gets the
    * same number of categorical ratings (panel labeling QA, n-way
    * model ensembles): `κ = (P̄ − P̄ₑ)/(1 − P̄ₑ)` with
    * `P̄ᵢ = (Σⱼ nᵢⱼ² − n)/(n(n−1))` per subject and `P̄ₑ = Σⱼ pⱼ²`.
    * The k-rater generalization of [[cohensKappa]]. Input is one row
    * per RATING `(subject, category)`; subjects whose rating count
    * differs from the modal count make the design invalid — the
    * operator fails loudly rather than silently reweighting.
    *
    * Returns ONE row `(n_subjects: bigint, n_per_subject: int,
    * k_categories: bigint, p_bar, p_e, kappa: double)` — NULL κ when
    * P̄ₑ = 1 (all ratings one category).
    *
    * Plan: one partial-agg shuffle to (subject, category) cells, one
    * per-subject reduction, one per-category reduction — all-integer
    * moments into one IEEE chain, gate unrounded.
    */
  /** Krippendorff's alpha, nominal data (Krippendorff, Content
    * Analysis 1980/2004) — the inter-rater agreement coefficient that
    * HANDLES MISSING RATINGS, completing the kappa family:
    * [[cohensKappa]] needs exactly two raters, [[fleissKappa]] a
    * constant rating count per subject; alpha takes any (unit, value)
    * multiset with `m_u >= 2` ratings on pairable units and ignores
    * the rest (the standard contract).
    *
    * Coincidence-matrix form without materializing the matrix:
    * `A_o = Σ_u Σ_c n_uc(n_uc−1)/(m_u−1) / N` (the only float sum —
    * χ²-tier; each term's first factor casts to double BEFORE the
    * divide), `A_e = Σ_c n_c(n_c−1) / (N(N−1))` from EXACT integer
    * marginals (`n_c` row-sums telescope to plain value totals over
    * pairable units), `alpha = (A_o − A_e)/(1 − A_e)`. Everything is
    * value-grid-sized after one partial agg; no unit×unit or
    * value×value joins.
    *
    * Returns one row `(n_units, n_ratings, k_categories: bigint,
    * a_obs, a_exp, alpha: double)` — degenerate inputs (no pairable
    * units, or `A_e = 1` i.e. a single category) yield NULL
    * coefficients, never NaN. */
  def krippendorffAlpha(
      df: DataFrame,
      unitCol: String,
      valueCol: String
  ): MayFail[DataFrame] = MayFail {
    val cells = df
      .filter(col(unitCol).isNotNull && col(valueCol).isNotNull)
      .select(col(unitCol).as("__u"), col(valueCol).cast("string").as("__v"))
      .groupBy("__u", "__v").agg(count(lit(1)).as("__n"))
      .localCheckpoint() // grid-sized; consumed by sizes, A_o and marginals
    val mu = cells.groupBy("__u").agg(sum(col("__n")).as("__m"))
      .filter(col("__m") >= 2)
    val pc = cells.join(mu, Seq("__u"))
    val ao = pc.agg(
      count_distinct(col("__u")).as("n_units"),
      coalesce(sum(col("__n")), lit(0L)).as("n_ratings"),
      coalesce(sum(col("__n").cast("double") * (col("__n") - 1) /
        (col("__m") - 1).cast("double")), lit(0.0)).as("__aon"))
    val cat = pc.groupBy("__v").agg(sum(col("__n")).as("__nc"))
      .agg(count(lit(1)).as("k_categories"),
        coalesce(sum(col("__nc").cast("double") * (col("__nc") - 1)),
          lit(0.0)).as("__se"))
    ao.crossJoin(cat)
      .withColumn("a_obs", when(col("n_ratings") > 0,
        col("__aon") / col("n_ratings").cast("double")))
      .withColumn("a_exp", when(col("n_ratings") >= 2,
        col("__se") / (col("n_ratings").cast("double") *
          (col("n_ratings") - 1).cast("double"))))
      .withColumn("alpha", when(col("a_exp") < 1.0,
        (col("a_obs") - col("a_exp")) / (lit(1.0) - col("a_exp"))))
      .select("n_units", "n_ratings", "k_categories", "a_obs", "a_exp",
        "alpha")
  }

  def fleissKappa(
      df: DataFrame,
      subjectCol: String,
      categoryCol: String
  ): MayFail[DataFrame] = MayFail {
    val cells = df
      .filter(col(subjectCol).isNotNull && col(categoryCol).isNotNull)
      .select(col(subjectCol).as("__s"),
        col(categoryCol).cast("string").as("__c"))
      .groupBy("__s", "__c").agg(count(lit(1)).as("__n"))
    val perSubject = cells.groupBy("__s")
      .agg(sum(col("__n")).as("__ni"),
        sum(col("__n") * col("__n")).as("__ni2"))
    val nDistinct = perSubject.select(countDistinct(col("__ni")))
      .first().getLong(0)
    require(nDistinct <= 1,
      "fleissKappa: subjects have unequal rating counts — the classic " +
        "Fleiss design needs a constant n per subject; filter first")
    val subj = perSubject.agg(
      count(lit(1)).as("n_subjects"),
      coalesce(max(col("__ni")), lit(0L)).as("__n"),
      coalesce(sum(col("__ni2")), lit(0L)).as("__sni2"))
    // category totals reach n_subjects·n, so their squares (and the
    // N·n products below) multiply in DOUBLE from the first factor —
    // the Long forms ANSI-throw past ~3e9 total ratings
    val cat = cells.groupBy("__c").agg(sum(col("__n")).as("__cj"))
      .agg(count(lit(1)).as("k_categories"),
        coalesce(sum(col("__cj").cast("double") * col("__cj")), lit(0.0))
          .as("__scj2"))
    subj.crossJoin(cat)
      .withColumn("p_bar",
        when(col("__n") >= 2,
          (col("__sni2") - col("n_subjects") * col("__n")).cast("double") /
            (col("n_subjects").cast("double") * col("__n") *
              (col("__n") - 1))))
      .withColumn("p_e",
        when(col("n_subjects") > 0 && col("__n") > 0,
          col("__scj2") /
            ((col("n_subjects").cast("double") * col("__n")) *
              (col("n_subjects").cast("double") * col("__n")))))
      .select(col("n_subjects"), col("__n").cast("int").as("n_per_subject"),
        col("k_categories"), col("p_bar"), col("p_e"),
        when(col("p_e") < 1.0,
          (col("p_bar") - col("p_e")) / (lit(1.0) - col("p_e")))
          .as("kappa"))
  }

  /** One-sample t-test of `valueCol` against a hypothesized mean
    * `mu0` — the "did the metric move off its target" readout (SLA
    * checks, calibration drift) that [[welchTTest]]'s two-group
    * surface can't express. Sample variance from exact sum /
    * sum-of-squares (clamped at 0).
    *
    * Returns ONE row `(n: bigint, mean, var, se, t: double, df:
    * bigint)` — NULL t/se when n < 2 or the variance is 0.
    *
    * Plan: ONE distributed aggregation; with ×100-integral inputs the
    * moments are exact and t is one IEEE chain — gate unrounded.
    */
  def oneSampleTTest(
      df: DataFrame,
      valueCol: String,
      mu0: Double
  ): MayFail[DataFrame] = MayFail {
    val v = col(valueCol).cast("double")
    df.filter(v.isNotNull)
      .agg(count(lit(1)).as("n"), coalesce(sum(v), lit(0.0)).as("__s"),
        coalesce(sum(v * v), lit(0.0)).as("__s2"))
      .withColumn("mean", when(col("n") > 0, col("__s") / col("n")))
      .withColumn("var",
        when(col("n") >= 2,
          greatest(col("__s2") - col("__s") * col("__s") / col("n"),
            lit(0.0)) / (col("n") - 1)))
      .withColumn("se",
        when(col("n") >= 2 && col("var") > 0, sqrt(col("var") / col("n"))))
      .select(col("n"), col("mean"), col("var"), col("se"),
        ((col("mean") - lit(mu0)) / col("se")).as("t"),
        (col("n") - 1).as("df"))
  }

  /** Monte-Carlo randomization test for a two-sample mean difference —
    * the assumption-free p-value when neither the t-test's normality
    * nor the rank tests' shape assumptions are wanted. Each of
    * `rounds` pseudo-permutations reassigns every row to group A with
    * probability n_a/(n_a+n_b), decided by the library's portable md5
    * hash of (salt § round § id) — no RNG state, so the p-value is
    * bit-reproducible across engines and reruns (Bernoulli
    * randomization, the standard Monte-Carlo surrogate for the exact
    * permutation distribution; group sizes vary binomially around the
    * observed ones).
    *
    * `p_value = (1 + #{b : |diff_b| ≥ |diff_obs|}) / (rounds + 1)`
    * (the add-one convention — never exactly 0), with the comparison
    * on ROUNDED (9-digit, 1e-12-shift) diffs: the boundary
    * convention. Degenerate rounds (a side drew no rows) count as
    * not-extreme.
    *
    * Returns ONE row `(n_a, n_b: bigint, rounds: int, diff_obs,
    * p_value: double)`.
    *
    * Plan: a `rounds`-way row explode (map-side; document the bound —
    * 200 rounds of a 10¹⁰-row frame is 2·10¹² flat-mapped rows: sample
    * the frame first at that scale) into ONE partial-agg shuffle of
    * `rounds` keys; the observed stats ride a broadcast 1-row frame.
    * With ×100-integral values every per-round sum is exact.
    */
  def permutationTest(
      df: DataFrame,
      valueCol: String,
      groupCol: String,
      groupA: String,
      groupB: String,
      idCols: Seq[String],
      rounds: Int = 200,
      salt: String = "perm"
  ): MayFail[DataFrame] = MayFail {
    require(groupA != groupB, s"groups must differ: $groupA")
    require(rounds >= 1, s"rounds must be >= 1: $rounds")
    require(idCols.nonEmpty, "permutationTest needs idCols — the hash of " +
      "the row identity drives the pseudo-permutations")
    val v = col(valueCol).cast("double")
    val base = df
      .filter(v.isNotNull && col(groupCol).isin(groupA, groupB))
      .select(Seq(v.as("__v"), col(groupCol).as("__g")) ++
        idCols.map(col): _*)
    val obs = base.agg(
      count(when(col("__g") === groupA, 1)).as("n_a"),
      count(when(col("__g") === groupB, 1)).as("n_b"),
      (coalesce(sum(when(col("__g") === groupA, col("__v"))), lit(0.0)) /
        count(when(col("__g") === groupA, 1)) -
        coalesce(sum(when(col("__g") === groupB, col("__v"))), lit(0.0)) /
        count(when(col("__g") === groupB, 1))).as("diff_obs"))
    val perms = base
      .select(col("__v"), explode(sequence(lit(0), lit(rounds - 1)))
        .as("__b"),
        concat(lit(salt) +: (Seq(lit("§")) ++ Seq(col("__b")
          .cast("string")) ++ idCols.flatMap(c => Seq(lit("§"),
          coalesce(col(c).cast("string"), lit("<null>"))))): _*).as("__key"))
    val h = graft.functions.TextFunctions.portableHash60(col("__key"))
    val u = (shiftright(h, 7) + lit(1L)).cast("double") /
      lit(9007199254740992.0)
    val withObs = perms.crossJoin(broadcast(obs))
      .withColumn("__toA",
        u < col("n_a").cast("double") / (col("n_a") + col("n_b")))
    val perRound = withObs.groupBy("__b")
      .agg(first(col("diff_obs")).as("diff_obs"),
        first(col("n_a")).as("n_a"), first(col("n_b")).as("n_b"),
        (sum(when(col("__toA"), col("__v"))) /
          count(when(col("__toA"), 1)) -
          sum(when(!col("__toA"), col("__v"))) /
          count(when(!col("__toA"), 1))).as("__diff"))
    perRound.agg(
        first(col("n_a")).as("n_a"), first(col("n_b")).as("n_b"),
        first(col("diff_obs")).as("__obs"),
        coalesce(sum(when(
          abs(round(col("__diff") + lit(1e-12), 9)) >=
            abs(round(col("diff_obs") + lit(1e-12), 9)), 1L)), lit(0L))
          .as("__extreme"))
      .select(col("n_a"), col("n_b"), lit(rounds).as("rounds"),
        col("__obs").as("diff_obs"),
        ((col("__extreme") + 1).cast("double") / (rounds + 1))
          .as("p_value"))
  }

  /** TOST equivalence test (two one-sided Welch t-tests) — the
    * non-inferiority readout [[welchTTest]] can't give: a
    * non-significant t does NOT mean "equivalent", it means "don't
    * know"; TOST rejects non-equivalence when BOTH one-sided tests
    * clear their margin. `marginLow ≤ 0 ≤ marginHigh` bound the
    * acceptable `mean_a − mean_b` difference in VALUE units.
    *
    * Returns ONE row `(n_a, n_b, mean_a, mean_b, diff, se, df,
    * t_lower, t_upper: double)` — `t_lower = (diff − marginLow)/se`
    * (reject diff ≤ marginLow when large positive), `t_upper =
    * (diff − marginHigh)/se` (reject diff ≥ marginHigh when large
    * negative); compare both to the t(df) quantile downstream (Φ⁻¹/t⁻¹
    * are not portably computable in-plan — the [[powerMde]]
    * convention). NULLs under [[welchTTest]]'s degeneracy rules.
    *
    * Plan: ONE distributed aggregation (the [[welchTTest]] moments)
    * plus pure column arithmetic.
    */
  def tost(
      df: DataFrame,
      valueCol: String,
      groupCol: String,
      groupA: String,
      groupB: String,
      marginLow: Double,
      marginHigh: Double
  ): MayFail[DataFrame] = MayFail {
    require(marginLow <= 0 && marginHigh >= 0,
      s"margins must straddle 0: [$marginLow, $marginHigh]")
    val w = welchTTest(df, valueCol, groupCol, groupA, groupB).get
    val se = sqrt(col("var_a") / col("n_a") + col("var_b") / col("n_b"))
    val ok = col("n_a") >= 2 && col("n_b") >= 2 && se > 0
    w.withColumn("diff", col("mean_a") - col("mean_b"))
      .withColumn("se", se)
      .select(col("n_a"), col("n_b"), col("mean_a"), col("mean_b"),
        col("diff"), col("se"), col("df"),
        when(ok, (col("diff") - lit(marginLow)) / col("se")).as("t_lower"),
        when(ok, (col("diff") - lit(marginHigh)) / col("se")).as("t_upper"))
  }

  /** Wilcoxon signed-rank test for PAIRED numeric outcomes — the
    * nonparametric companion to [[pairedTTest]] (rank-based, so one
    * huge outlier pair can't swamp the statistic) and the numeric
    * sibling of [[mcnemar]]. Zero differences are dropped (the
    * standard convention); |difference| ranks are midranks over the
    * DISTINCT-|d| grid; `Var = n(n+1)(2n+1)/24 − Σ(t³−t)/48` with the
    * tie correction; z uses no continuity correction.
    *
    * Returns ONE row `(n: bigint, w_plus, w_minus, e_w, var_w, z:
    * double)` — `w_plus` the positive-difference rank sum, NULL z when
    * Var = 0 (all |d| tie... impossible unless every pair ties) or
    * n = 0.
    *
    * Plan: the [[mannWhitneyU]] grid discipline — one partial-agg
    * shuffle to the |d| grid, one running window over the GRID.
    * Midranks are exact dyadics, so `w_plus`/`w_minus` and the moment
    * terms are IEEE chains of exact values — gate unrounded.
    */
  def wilcoxonSignedRank(
      df: DataFrame,
      beforeCol: String,
      afterCol: String
  ): MayFail[DataFrame] = MayFail {
    val b = col(beforeCol).cast("double")
    val a = col(afterCol).cast("double")
    val diffs = df.filter(b.isNotNull && a.isNotNull)
      .select((a - b).as("__d"))
      .filter(col("__d") =!= 0.0)
      .select(abs(col("__d")).as("__ad"),
        (col("__d") > 0).cast("long").as("__pos"))
    val grid = diffs.groupBy("__ad")
      .agg(count(lit(1)).as("__t"), sum(col("__pos")).as("__tp"))
    val before = Window.orderBy(col("__ad"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val mids = grid.withColumn("__mid",
      coalesce(sum(col("__t")).over(before), lit(0L)) +
        (col("__t") + lit(1)) / lit(2.0))
    mids.agg(
        coalesce(sum(col("__t")), lit(0L)).as("n"),
        coalesce(sum(col("__tp") * col("__mid")), lit(0.0)).as("w_plus"),
        coalesce(sum((col("__t") - col("__tp")) * col("__mid")), lit(0.0))
          .as("w_minus"),
        // tie cubic in double from the start (the kruskalWallis cast):
        // t³ - t overflows Long for a tie run above ~2.09e6 equal |d|
        coalesce(sum(col("__t").cast("double") * col("__t") * col("__t") -
          col("__t")), lit(0.0)).as("__tc"))
      .withColumn("e_w",
        col("n").cast("double") * (col("n") + 1) / 4)
      .withColumn("var_w",
        // factors cast to double BEFORE multiplying: the cubic would
        // overflow long near n ~ 2e6 (ANSI would throw); the oracle
        // mirrors the cast points
        col("n").cast("double") * (col("n") + 1).cast("double") *
          (col("n") * 2 + 1).cast("double") / 24
          - col("__tc") / 48)
      .select(col("n"), col("w_plus"), col("w_minus"), col("e_w"),
        col("var_w"),
        when(col("n") > 0 && col("var_w") > 0,
          (col("w_plus") - col("e_w")) / sqrt(col("var_w"))).as("z"))
  }

  /** Jonckheere–Terpstra test for an ORDERED alternative across k
    * groups — "does the metric trend UP along the group order"
    * (dose–response, bucket-ordered experiments), strictly more
    * powerful than [[kruskalWallis]] when the order is known. Groups
    * are ordered by `groupCol`'s natural sort. `J = Σ_{i<j} U_ij` with
    * the ½-tie convention; mean and tie-corrected variance are the
    * standard three-term formulas (Hollander & Wolfe), z the ±1-free
    * normal approximation.
    *
    * Returns ONE row `(n, k: bigint, j, e_j, var_j, z: double)` —
    * `j` half-integral exact, NULL z when var = 0 or k < 2.
    *
    * Plan: observations reduce to the DISTINCT (group, value) CELL
    * grid; U-counts come from a grid×grid broadcast nested-loop join —
    * the [[kendallTau]] contract (quadratic in CELLS, `maxCells`
    * driver-checked; bin continuous metrics first). Every count and
    * moment is an exact long; the three variance terms are IEEE
    * divisions of exact-long factors in a FIXED order (large products
    * cast to double before multiplying — they can exceed 2⁵³, and the
    * oracle mirrors the cast points exactly).
    */
  def jonckheereTerpstra(
      df: DataFrame,
      valueCol: String,
      groupCol: String,
      maxCells: Int = 10000
  ): MayFail[DataFrame] = MayFail {
    val v = col(valueCol).cast("double")
    val cells = df.filter(v.isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).cast("string").as("__g"), v.as("__v"))
      .groupBy("__g", "__v").agg(count(lit(1)).as("__c"))
    val kCells = cells.count()
    require(kCells <= maxCells,
      s"jonckheereTerpstra: $kCells distinct (group, value) cells exceed " +
        s"maxCells=$maxCells — bin the metric first")
    val l = cells.select(col("__g").as("__g1"), col("__v").as("__v1"),
      col("__c").as("__c1"))
    val r = broadcast(cells.select(col("__g").as("__g2"),
      col("__v").as("__v2"), col("__c").as("__c2")))
    // 2J stays integral: 2·(less pairs) + (tied pairs), groups ordered
    val pairs = l.join(r, col("__g1") < col("__g2"))
      .agg(coalesce(sum(when(col("__v1") < col("__v2"),
          col("__c1") * col("__c2") * 2)
          .when(col("__v1") === col("__v2"), col("__c1") * col("__c2"))),
        lit(0L)).as("__j2"))
    // every quadratic-or-higher moment product casts its FIRST factor
    // to double before multiplying (the kruskalWallis tie-term cast):
    // n(n-1)(2n+5) overflows Long at a ~1.66M-row group, n² at ~3e9,
    // and under ANSI those THROW at exactly the scales the plan doc
    // advertises. Terms stay exact while each product < 2⁵³.
    val groupMoments = cells.groupBy("__g").agg(sum(col("__c")).as("__n"))
      .agg(count(lit(1)).as("k"),
        coalesce(sum(col("__n")), lit(0L)).as("n"),
        coalesce(sum(col("__n").cast("double") * col("__n")), lit(0.0))
          .as("__sn2"),
        coalesce(sum(col("__n").cast("double") * (col("__n") - 1) *
          (col("__n") * 2 + 5)), lit(0.0)).as("__sn25"),
        coalesce(sum(col("__n").cast("double") * (col("__n") - 1)),
          lit(0.0)).as("__snn1"),
        coalesce(sum(col("__n").cast("double") * (col("__n") - 1) *
          (col("__n") - 2)), lit(0.0)).as("__snn12"))
    val tieMoments = cells.groupBy("__v").agg(sum(col("__c")).as("__t"))
      .agg(coalesce(sum(col("__t").cast("double") * (col("__t") - 1) *
          (col("__t") * 2 + 5)), lit(0.0)).as("__st25"),
        coalesce(sum(col("__t").cast("double") * (col("__t") - 1)),
          lit(0.0)).as("__stt1"),
        coalesce(sum(col("__t").cast("double") * (col("__t") - 1) *
          (col("__t") - 2)), lit(0.0)).as("__stt12"))
    val nn = col("n")
    groupMoments.crossJoin(tieMoments).crossJoin(pairs)
      .withColumn("j", col("__j2").cast("double") / 2)
      .withColumn("e_j",
        (nn.cast("double") * nn - col("__sn2")) / 4)
      .withColumn("__a",
        (nn.cast("double") * (nn - 1) * (nn * 2 + 5) -
          col("__sn25") - col("__st25")) / 72)
      .withColumn("__b",
        col("__snn12") * col("__stt12") /
          (lit(36.0) * (nn.cast("double") * (nn - 1) * (nn - 2))))
      .withColumn("__cc",
        col("__snn1") * col("__stt1") /
          (lit(8.0) * (nn.cast("double") * (nn - 1))))
      .withColumn("var_j", col("__a") + col("__b") + col("__cc"))
      .select(col("n"), col("k"), col("j"), col("e_j"), col("var_j"),
        when(col("k") >= 2 && col("var_j") > 0,
          (col("j") - col("e_j")) / sqrt(col("var_j"))).as("z"))
  }

  /** Cochran's Q test — does a binary outcome differ across k
    * treatments applied to the SAME subjects (the k-treatment
    * generalization of [[mcnemar]]; e.g. did conversion differ across
    * k campaign variants each user saw)? `successCol` is cast to
    * boolean. The design is completed internally: every (subject,
    * treatment) pair absent from the input counts as failure —
    * documented contract, callers with true missingness must filter
    * subjects first.
    *
    * Returns ONE row `(n_subjects, k, n: bigint, df: bigint, q:
    * double)` — `n` total successes, `q = (k−1)(k·ΣGⱼ² − N²) /
    * (k·ΣLᵢ − ΣLᵢ²)` (all-integer moments, so `q` divides two exact
    * longs), NULL when the denominator is 0 (every subject all-0 or
    * all-1) or k < 2.
    *
    * Plan: one partial-agg shuffle to (subject, treatment) successes,
    * one to per-subject row sums, one k-row treatment agg — no
    * windows, no grid completion materialized (absent pairs
    * contribute 0 to every moment, so the completion is arithmetic,
    * not a join).
    */
  def cochranQ(
      df: DataFrame,
      subjectCol: String,
      treatmentCol: String,
      successCol: String
  ): MayFail[DataFrame] = MayFail {
    val s = col(successCol).cast("boolean")
    val base = df
      .filter(col(subjectCol).isNotNull && col(treatmentCol).isNotNull)
      .select(col(subjectCol).as("__s"), col(treatmentCol).as("__t"),
        when(coalesce(s, lit(false)), lit(1L)).otherwise(lit(0L)).as("__x"))
      .groupBy("__s", "__t")
      .agg(max(col("__x")).as("__x")) // any success in the cell counts once
    val kDf = base.agg(countDistinct(col("__t")).as("k"),
      countDistinct(col("__s")).as("n_subjects"))
    // per-treatment success totals reach n_subjects, so their squares
    // (and N² below) multiply in DOUBLE from the first factor — the
    // Long forms ANSI-throw past ~3e9 subjects; per-subject counts are
    // ≤ k, so __sl2 stays comfortably integral either way
    val gj = base.groupBy("__t").agg(sum(col("__x")).as("__g"))
      .agg(coalesce(sum(col("__g")), lit(0L)).as("__n"),
        coalesce(sum(col("__g").cast("double") * col("__g")), lit(0.0))
          .as("__sg2"))
    val li = base.groupBy("__s").agg(sum(col("__x")).as("__l"))
      .agg(coalesce(sum(col("__l")), lit(0L)).as("__sl"),
        coalesce(sum(col("__l") * col("__l")), lit(0L)).as("__sl2"))
    kDf.crossJoin(gj).crossJoin(li)
      .withColumn("__den",
        (col("k") * col("__sl") - col("__sl2")).cast("double"))
      .select(col("n_subjects"), col("k"), col("__n").as("n"),
        (col("k") - 1).as("df"),
        when(col("k") >= 2 && col("__den") > 0,
          (col("k") - 1) * (col("k") * col("__sg2") -
            col("__n").cast("double") * col("__n")) / col("__den"))
          .as("q"))
  }

  /** Mixture sequential probability ratio test (mSPRT — Robbins 1970;
    * Johari, Koomen, Pekelis & Walsh, KDD 2017): ALWAYS-VALID p-values
    * for the running mean of an ordered measurement stream against
    * `theta0`, under a N(theta0, tau2) mixture over the drift. Unlike a
    * fixed-horizon t-test, the reported p-value is valid at EVERY
    * prefix simultaneously — the "peeking" readout an experiment
    * dashboard actually needs.
    *
    * Per prefix i (within each key group, ordered by `orderCols`):
    * with exact-integer prefix sums S, Q of the `scaleDecimals`-scaled
    * values (the ×100 cents convention — values are quantized at that
    * scale by documented contract), plug-in variance
    * `v = (Q·i − S²)/i²`, and `d = x̄ − θ₀`:
    *
    *   `ln Λᵢ = ½·ln(v/(v+i·τ²)) + (i²·τ²·d²) / (2v·(v+i·τ²))`
    *   `p_always(i) = min over j ≤ i of min(1, 1/Λⱼ)`
    *
    * Returns `(keys..., seq, xbar, llr, p_always)` per row — `xbar`
    * is reported in ORIGINAL units (the scaled running mean divided
    * back by 10^scaleDecimals), so it compares directly against the
    * `theta0` the caller passed; prefixes
    * with zero plug-in variance yield NULL llr (no evidence either
    * way) and are skipped by the running min. The statistic is a pure
    * IEEE function of exact integers, so any engine replays it
    * term-for-term; `sqrt`/`exp`/`ln` last-ulp noise is absorbed by
    * the round-6 outputs.
    *
    * Scale shape: one window pass over the ordered stream per key — no
    * self-join, no collect; state is three running integers. Exactness
    * bound: n·c² < 2⁶³ for the scaled values (ANSI arithmetic makes a
    * violation a hard error, never a silent wrap).
    *
    * Order contract: `orderCols` must order rows totally UP TO ties in
    * the scaled value — tied rows are interchangeable (the prefix sums,
    * and therefore every statistic, are unchanged), so appending the
    * value column itself is the standard tie-breaker when the natural
    * key is not unique. */
  def msprt(
      df: DataFrame,
      valueCol: String,
      theta0: Double,
      tau2: Double,
      orderCols: Seq[String],
      keys: Seq[String] = Nil,
      scaleDecimals: Int = 0
  ): MayFail[DataFrame] = MayFail {
    require(tau2 > 0, s"mixture variance tau2 must be positive: $tau2")
    require(orderCols.nonEmpty, "msprt needs a total order")
    require(scaleDecimals >= 0 && scaleDecimals <= 9,
      s"scaleDecimals must be in [0, 9]: $scaleDecimals")
    val sc = math.pow(10, scaleDecimals) // exact small power of ten
    val t0s = theta0 * sc                // scaled hypothesis mean
    val t2s = tau2 * sc * sc             // scaled mixture variance
    val c = round(col(valueCol).cast("double") * lit(sc)).cast("long")
    val wOrd = Window.partitionBy(keys.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding, 0)
    val iL = row_number().over(wOrd).cast("long")
    val base = df
      .filter(col(valueCol).isNotNull)
      .withColumn("__c", c)
      .withColumn("__i", iL)
      .withColumn("__s", sum(col("__c")).over(wCum))
      .withColumn("__q", sum(col("__c") * col("__c")).over(wCum))
    val id = col("__i").cast("double")
    val sd = col("__s").cast("double")
    val qd = col("__q").cast("double")
    val v = (qd * id - sd * sd) / (id * id)
    val xbar = sd / id
    val dm = xbar - lit(t0s)
    val iTau2 = id * lit(t2s)
    val num = ((id * id) * lit(t2s)) * (dm * dm)
    val den = (lit(2.0) * v) * (v + iTau2)
    val lam = sqrt(v / (v + iTau2)) * exp(num / den)
    val llr = lit(0.5) * log(v / (v + iTau2)) + num / den
    val scored = base
      .withColumn("__llr", when(v > 0, llr))
      .withColumn("__p", when(v > 0, least(lit(1.0), lit(1.0) / lam)))
      .withColumn("__pmin", min(col("__p")).over(wCum))
    // descale the reported running mean back to original units (the
    // llr/p arithmetic stays in scaled units against t0s/t2s — only
    // the READOUT descales, so xbar is comparable to theta0)
    val xbarOut = if (scaleDecimals == 0) xbar else xbar / lit(sc)
    scored.select(keys.map(col) ++ Seq(
      col("__i").as("seq"),
      round(xbarOut + lit(1e-9), 6).as("xbar"),
      round(col("__llr") + lit(1e-9), 6).as("llr"),
      round(col("__pmin") + lit(1e-9), 6).as("p_always")): _*)
  }

  /** Delete-one-GROUP jackknife for a ratio-of-sums estimator
    * `θ = Σnum / Σden` — the standard-error machinery for ratio
    * metrics (revenue per unit, CTR, tokens per document) whose rows
    * are dependent WITHIN groups (a user, a supplier, a document): the
    * group, not the row, is the resampling unit.
    *
    * With per-group exact-integer sums (values scaled by
    * `numScaleDecimals`/`denScaleDecimals` — the ×100 cents
    * convention) Y_g, X_g and totals Y, X over G groups:
    *
    *   `θ₍₋g₎ = (Y−Y_g)/(X−X_g)`,  `θ̄ = Σθ₍₋g₎/G`
    *   `SE² = (G−1)/G · Σ(θ₍₋g₎ − θ̄)²`
    *
    * Returns ONE row `(n_groups, theta, theta_jack_mean, se_jack,
    * ci_lo, ci_hi)` with the ±1.96·SE normal interval. All outputs are
    * in ORIGINAL units (num-units per den-unit): each scaled ratio is
    * multiplied back by 10^(den−num) — an exact power-of-ten literal,
    * one IEEE op — BEFORE the jackknife averages, so θ, θ̄, SE and the
    * CI are directly comparable across scale choices. NULL statistics
    * when G < 2 or any leave-one-out denominator is zero (the
    * estimator is undefined, not zero — surfaced, never fabricated).
    * Everything up to the G-term float sums is exact-integer; the
    * output rounds at 6.
    *
    * Scale shape: one groupBy over the rows, then G-row arithmetic —
    * the closed form needs no actual refits, so the "resampling" costs
    * one aggregation regardless of corpus size. */
  def jackknifeRatio(
      df: DataFrame,
      numCol: String,
      denCol: String,
      groupCol: String,
      numScaleDecimals: Int = 0,
      denScaleDecimals: Int = 0
  ): MayFail[DataFrame] = MayFail {
    require(numScaleDecimals >= 0 && numScaleDecimals <= 9 &&
      denScaleDecimals >= 0 && denScaleDecimals <= 9,
      "scale decimals must be in [0, 9]")
    val ns = math.pow(10, numScaleDecimals)
    val ds = math.pow(10, denScaleDecimals)
    // descale a scaled-num/scaled-den ratio back to original units:
    // θ_scaled = (Σnum·10^n)/(Σden·10^d) = θ · 10^(n−d), so divide by
    // 10^(n−d) (or multiply by 10^(d−n)) — an exact power-of-ten
    // double literal, one IEEE rounding, engine-replayable
    val scaleGap = math.pow(10, (numScaleDecimals - denScaleDecimals).abs)
    def descale(e: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      if (numScaleDecimals == denScaleDecimals) e
      else if (numScaleDecimals > denScaleDecimals) e / lit(scaleGap)
      else e * lit(scaleGap)
    val g = df
      .filter(col(groupCol).isNotNull)
      .groupBy(col(groupCol).as("__g"))
      .agg(
        sum(round(col(numCol).cast("double") * lit(ns)).cast("long"))
          .as("__y"),
        sum(round(col(denCol).cast("double") * lit(ds)).cast("long"))
          .as("__x"))
    val tot = g.agg(sum(col("__y")).as("__ty"), sum(col("__x")).as("__tx"),
      count(lit(1)).as("__gn"))
    val loo = g.crossJoin(tot)
      .withColumn("__th",
        when(col("__tx") - col("__x") =!= 0L,
          descale((col("__ty") - col("__y")).cast("double") /
            (col("__tx") - col("__x")).cast("double"))))
    val agg = loo.agg(
      max(col("__gn")).as("n_groups"),
      max(col("__ty")).as("__ty"),
      max(col("__tx")).as("__tx"),
      avg(col("__th")).as("__thbar"),
      count(lit(1)).as("__cnt"),
      count(col("__th")).as("__ok"))
    // second pass for the centered squares (needs θ̄); the loo frame is
    // G rows, so the extra pass is grid-sized
    val ssq = loo.crossJoin(agg.select(col("__thbar").as("__tb")))
      .agg(sum((col("__th") - col("__tb")) * (col("__th") - col("__tb")))
        .as("__ssq"))
    val gd = col("n_groups").cast("double")
    val ok = col("n_groups") >= 2 && col("__ok") === col("__cnt") &&
      col("__tx") =!= 0L
    val theta =
      descale(col("__ty").cast("double") / col("__tx").cast("double"))
    val se = sqrt(((gd - 1) / gd) * col("__ssq"))
    agg.crossJoin(ssq).select(
      col("n_groups"),
      round(when(ok, theta) + lit(1e-9), 6).as("theta"),
      round(when(ok, col("__thbar")) + lit(1e-9), 6).as("theta_jack_mean"),
      round(when(ok, se) + lit(1e-9), 6).as("se_jack"),
      round(when(ok, theta - lit(1.96) * se) + lit(1e-9), 6).as("ci_lo"),
      round(when(ok, theta + lit(1.96) * se) + lit(1e-9), 6).as("ci_hi"))
  }

  /** Split-conformal prediction intervals (Vovk et al.; Lei et al.,
    * JASA 2018): q̂ = the calibration |y − ŷ| value at ascending rank
    * `⌈(n_cal + 1)(1 − α)⌉` gives `[ŷ − q̂, ŷ + q̂]` with marginal
    * coverage ≥ 1 − α for exchangeable data, MODEL-FREE — the
    * distribution-free uncertainty wrapper around any scorer the
    * library (or an external model) produces. Appends `conformal_lo`
    * / `conformal_hi` to `test`.
    *
    * Rank convention: the house exact-grid percentile — group
    * residuals by value, cumulative-count window over the sorted grid,
    * first value whose count reaches the rank (q355's discipline).
    * Residuals are raw IEEE subtractions, engine-exact. Fails loudly
    * when α is too small for the calibration size (the rank exceeds
    * n_cal — a +∞ interval is surfaced, never fabricated) or the
    * calibration set is empty.
    *
    * Scale shape: the grid window runs on calibration-set-sized frames
    * — split conformal HOLDS OUT a small calibration set by design, so
    * this is grid arithmetic, not a corpus sort; q̂ collects as one
    * scalar and rides `test` as a literal (no join at all). */
  def splitConformal(
      cal: DataFrame,
      test: DataFrame,
      yCol: String,
      yhatCol: String,
      alpha: Double = 0.1
  ): MayFail[DataFrame] = MayFail {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0, 1): $alpha")
    val resid = abs(col(yCol).cast("double") - col(yhatCol).cast("double"))
    val grid = cal
      .filter(col(yCol).isNotNull && col(yhatCol).isNotNull)
      .select(resid.as("__r"))
      .groupBy("__r").agg(count(lit(1)).as("__t"))
    val wOrd = Window.orderBy(col("__r"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val rank = ceil((col("__n") + 1).cast("double") * lit(1.0 - alpha))
      .cast("long")
    val qrow = grid
      .withColumn("__c", sum(col("__t")).over(wOrd))
      .withColumn("__n", sum(col("__t")).over(wAll))
      .filter(col("__c") >= rank && col("__c") - col("__t") < rank)
      .select(col("__r")).collect()
    if (qrow.isEmpty)
      sys.error("splitConformal: calibration rank " +
        s"ceil((n+1)*${1.0 - alpha}) exceeds the calibration size (or " +
        "the calibration set is empty) — q-hat is +inf, alpha too " +
        "small for this split")
    val qhat = qrow.head.getDouble(0)
    test
      .withColumn("conformal_lo",
        col(yhatCol).cast("double") - lit(qhat))
      .withColumn("conformal_hi",
        col(yhatCol).cast("double") + lit(qhat))
  }

  /** The Poisson(1) CDF ladder for the bootstrap draw, cumulative to
    * k = 8 (P(k > 8) < 1.2e-6; the tail clamps to 9). Computed ONCE
    * here and baked into any replaying SQL via Double.toString. */
  private[graft] val poissonCdf1: Seq[Double] = {
    val p0 = math.exp(-1.0)
    val pmf = Iterator.iterate((p0, 0)) { case (p, k) =>
      (p / (k + 1), k + 1)
    }.map(_._1).take(9).toSeq
    pmf.scanLeft(0.0)(_ + _).tail
  }

  /** Poisson-bootstrap confidence interval for the mean (Hanley &
    * MacGibbon 2006; Chamandy, Muralidharan, Najmi & Naidu 2012): replicate `b`
    * reweights every row by a Poisson(1) count — at corpus scale
    * indistinguishable from the multinomial bootstrap, and computed in
    * ONE distributed pass with `nBoot` counters per task instead of
    * `nBoot` resampled datasets (THE bootstrap that works at 100 TB).
    *
    * Determinism: the draw is the inverse-CDF of the salted 52-bit
    * dyadic of (idCols..., replicate) — the q272/DSIR idiom — against
    * the shared [[poissonCdf1]] ladder, so every weight, every exact
    * scaled sum (the ×10^s contract) and every replicate mean replays
    * engine-identically. Rows with equal idCols share draws — idCols
    * must identify rows for independent reweighting (the caller's
    * contract, same as [[graft.operators.Sampling]] hash orders).
    *
    * Returns ONE row `(n, theta, n_boot, ci_lo, ci_hi)`: `theta` the
    * full-sample mean, the CI the percentile interval of the replicate
    * means at the house exact-grid rank convention (`max(⌈p·B⌉, 1)`).
    * Replicates with zero total weight (vanishing probability beyond
    * toy inputs) drop and `n_boot` reports the survivors. ANSI bound:
    * 9·Σ|c| < 2⁶³ for the scaled values. */
  def poissonBootstrap(
      df: DataFrame,
      valueCol: String,
      idCols: Seq[String],
      nBoot: Int = 40,
      alpha: Double = 0.1,
      scaleDecimals: Int = 0,
      salt: String = "0"
  ): MayFail[DataFrame] =
    bootstrapImpl(df, valueCol, idCols, Nil, nBoot, alpha, scaleDecimals,
      salt)

  /** [[poissonBootstrap]] per key group — one pass still: the replicate
    * counters simply key by `(keys..., b)`, so segment-level CIs (per
    * source, per language, per cohort) cost the same single scan as
    * the global one. Returns one row per key
    * `(keys..., n, theta, n_boot, ci_lo, ci_hi)`. Draws depend only on
    * (idCols, salt, replicate) — NOT on the keys — so a row keeps its
    * weights across regroupings (the segment CIs are consistent slices
    * of one resampling universe, Chamandy et al.'s streaming-bucket
    * property). */
  def poissonBootstrapBy(
      df: DataFrame,
      valueCol: String,
      idCols: Seq[String],
      keys: Seq[String],
      nBoot: Int = 40,
      alpha: Double = 0.1,
      scaleDecimals: Int = 0,
      salt: String = "0"
  ): MayFail[DataFrame] =
    if (keys.isEmpty)
      graft.functional.Fail(new IllegalArgumentException(
        "poissonBootstrapBy needs keys — use poissonBootstrap for the " +
          "global CI"))
    else bootstrapImpl(df, valueCol, idCols, keys, nBoot, alpha,
      scaleDecimals, salt)

  /** The shared deterministic Poisson(1) draw: inverse-CDF of the
    * salted 52-bit dyadic of ('§'-interleaved idCols..., salt,
    * replicate `__b`) against the [[poissonCdf1]] ladder — the
    * '§'-interleave (the Sampling.shuffleKey idiom) keeps distinct id
    * tuples like (1, 23) and (12, 3) from sharing a hash input, which
    * would give them correlated draws across every replicate. Expects
    * the replicate index in column `__b`.
    *
    * COMPAT (r12 ADVICE): the '§' interleave landed in r12 as the fix
    * for the adjacent-id-tuple collision. It changes the hash input —
    * and therefore every poissonBootstrap/poissonBootstrapBy draw —
    * under an unchanged salt versus pre-r12 releases, so bootstrap
    * CIs persisted by earlier releases are NOT bit-reproducible
    * against current code: re-baseline them once. The draw is stable
    * from r12 on (the gate oracles replay it character-for-
    * character). */
  private def poissonWeight(idCols: Seq[String], salt: String): Column = {
    val u = (graft.functions.TextFunctions.portableHash60(
        concat(idCols.flatMap(c =>
            Seq(col(c).cast("string"), lit("§"))) ++
          Seq(lit(salt + "§"), col("__b").cast("string")): _*))
      .bitwiseAND(lit((1L << 52) - 1))
      .cast("double") + lit(0.5)) / lit(math.pow(2.0, 52))
    poissonCdf1.zipWithIndex
      .foldLeft(org.apache.spark.sql.functions.when(lit(false), lit(0L))) {
        case (acc, (cdf, k)) => acc.when(u < lit(cdf), lit(k.toLong))
      }.otherwise(lit(9L))
  }

  private def bootstrapImpl(
      df: DataFrame,
      valueCol: String,
      idCols: Seq[String],
      keys: Seq[String],
      nBoot: Int,
      alpha: Double,
      scaleDecimals: Int,
      salt: String
  ): MayFail[DataFrame] = MayFail {
    require(idCols.nonEmpty, "poissonBootstrap needs idCols — the hash " +
      "of the row identity IS the deterministic draw")
    require(nBoot >= 4 && nBoot <= 1000,
      s"nBoot must be in [4, 1000]: $nBoot")
    require(alpha > 0 && alpha < 1, s"alpha must be in (0, 1): $alpha")
    require(scaleDecimals >= 0 && scaleDecimals <= 9,
      s"scaleDecimals must be in [0, 9]: $scaleDecimals")
    val sc = math.pow(10, scaleDecimals)
    val base = df.filter(col(valueCol).isNotNull &&
        keys.map(col(_).isNotNull).foldLeft(lit(true))(_ && _))
      .select((keys.map(col) ++ idCols.map(col) :+
        round(col(valueCol).cast("double") * lit(sc)).cast("long")
          .as("__c")): _*)
    val withB = base.withColumn("__b",
      explode(array((0 until nBoot).map(i => lit(i)): _*)))
    val w = poissonWeight(idCols, salt)
    val reps = withB
      .groupBy((keys.map(col) :+ col("__b")): _*)
      .agg(sum(w * col("__c")).as("__sy"), sum(w).as("__sw"))
      .filter(col("__sw") > 0)
      .select(keys.map(col) :+
        ((col("__sy").cast("double") / col("__sw").cast("double"))
          / lit(sc)).as("__est"): _*)
    // grid percentile picks over the per-key B (tiny) replicate means
    val grid = reps.groupBy((keys.map(col) :+ col("__est")): _*)
      .agg(count(lit(1)).as("__t"))
    val wKey = Window.partitionBy(keys.map(col): _*)
    val wOrd = wKey.orderBy(col("__est"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = wKey.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = grid
      .withColumn("__cc", sum(col("__t")).over(wOrd))
      .withColumn("__nb", sum(col("__t")).over(wAll))
    def pick(p: Double, out: String) = {
      val r = greatest(lit(1L),
        ceil(lit(p) * col("__nb").cast("double")).cast("long"))
      cum.filter(col("__cc") >= r && col("__cc") - col("__t") < r)
        .select(keys.map(col) :+ col("__est").as(out) :+ col("__nb"): _*)
    }
    val stats = (if (keys.isEmpty) base.groupBy()
      else base.groupBy(keys.map(col): _*))
      .agg(count(lit(1)).as("n"),
        ((sum(col("__c")).cast("double") / count(lit(1)).cast("double"))
          / lit(sc)).as("__theta"))
    val joinLo =
      if (keys.isEmpty) stats.join(pick(alpha / 2, "__lo"), lit(true), "left")
      else stats.join(pick(alpha / 2, "__lo"), keys, "left")
    val joinHi =
      if (keys.isEmpty)
        joinLo.join(pick(1.0 - alpha / 2, "__hi").drop("__nb"),
          lit(true), "left")
      else joinLo.join(pick(1.0 - alpha / 2, "__hi").drop("__nb"),
        keys, "left")
    joinHi.select(keys.map(col) ++ Seq(col("n"),
      round(col("__theta") + lit(1e-9), 6).as("theta"),
      coalesce(col("__nb"), lit(0L)).as("n_boot"),
      round(col("__lo") + lit(1e-9), 6).as("ci_lo"),
      round(col("__hi") + lit(1e-9), 6).as("ci_hi")): _*)
  }

  /** Cochran–Mantel–Haenszel test (1959) of exposure×outcome
    * association ACROSS strata — the confounder-adjusted member of the
    * contingency family: K 2×2 tables share one alternative, so
    * Simpson-style reversals that fool a pooled χ² are controlled.
    * `exposureCol`/`outcomeCol` must be boolean; null rows drop;
    * strata with N ≤ 1 carry no variance and drop (documented).
    *
    * ONE row `(k_strata, n, cmh_chi2, or_mh)`: the CMH statistic
    * (df = 1, no continuity correction) and the Mantel–Haenszel common
    * odds ratio `Σ(a·d/N) / Σ(b·c/N)` (NULL when the denominator is
    * 0). Per-stratum cells are exact integers; the quadratic+ moments
    * multiply in DOUBLE from the first factor (the ANSI-overflow
    * convention — per-stratum N⁴ would wrap long past ~55k rows).
    * Plan: one partial-agg shuffle to (stratum, cells), then K-row
    * arithmetic. */
  def cmhTest(
      df: DataFrame,
      exposureCol: String,
      outcomeCol: String,
      strataCol: String
  ): MayFail[DataFrame] = MayFail {
    val x = col(exposureCol)
    val y = col(outcomeCol)
    val cells = df
      .filter(x.isNotNull && y.isNotNull && col(strataCol).isNotNull)
      .groupBy(col(strataCol).as("__s"))
      .agg(
        sum(when(x && y, 1L).otherwise(0L)).as("__a"),
        sum(when(x && !y, 1L).otherwise(0L)).as("__b"),
        sum(when(!x && y, 1L).otherwise(0L)).as("__c"),
        sum(when(!x && !y, 1L).otherwise(0L)).as("__d"))
      .withColumn("__N", col("__a") + col("__b") + col("__c") + col("__d"))
      .filter(col("__N") >= 2)
    val nD = col("__N").cast("double")
    val e = (col("__a") + col("__b")).cast("double") *
      (col("__a") + col("__c")).cast("double") / nD
    val v = (((col("__a") + col("__b")).cast("double") *
      (col("__c") + col("__d")).cast("double")) *
      (col("__a") + col("__c")).cast("double") *
      (col("__b") + col("__d")).cast("double")) /
      ((nD * nD) * (nD - lit(1.0)))
    val orNum = (col("__a").cast("double") * col("__d").cast("double")) / nD
    val orDen = (col("__b").cast("double") * col("__c").cast("double")) / nD
    cells.agg(
      count(lit(1)).as("k_strata"),
      sum(col("__N")).as("n"),
      sum(col("__a").cast("double")).as("__sa"),
      sum(e).as("__se"),
      sum(v).as("__sv"),
      sum(orNum).as("__son"),
      sum(orDen).as("__sod"))
      .select(col("k_strata"), col("n"),
        round(when(col("__sv") > 0,
          ((col("__sa") - col("__se")) * (col("__sa") - col("__se"))) /
            col("__sv")) + lit(1e-9), 6).as("cmh_chi2"),
        round(when(col("__sod") > 0, col("__son") / col("__sod"))
          + lit(1e-9), 6).as("or_mh"))
  }

  /** Population stability index between a reference and a current
    * corpus over CALLER-PINNED bin edges (the CCNet pinned-cutoff
    * discipline — edges must come from a frozen baseline, never
    * refitted per run): `PSI = Σ (p_cur − p_ref)·ln(p_cur/p_ref)`,
    * the standard drift alarm (< 0.1 stable / 0.1–0.25 moderate /
    * > 0.25 shifted). Returns one row per bin `(bin, n_ref, n_cur,
    * p_ref, p_cur, contrib, psi_total)` — a bin empty on either side
    * yields NULL contribution AND NULL total (surfaced, not fudged
    * with an epsilon; repin the edges). Bin id = #edges ≤ v; counts
    * are exact; one aggregation per side, grid-sized joins after. */
  def psi(
      ref: DataFrame,
      cur: DataFrame,
      valueCol: String,
      edges: Seq[Double]
  ): MayFail[DataFrame] = MayFail {
    require(edges.nonEmpty, "psi needs pinned bin edges")
    require(edges == edges.sorted && edges.distinct == edges,
      s"edges must be sorted and distinct: $edges")
    psiFromCounts(
      binCounts(ref, valueCol, edges, "n_ref").get,
      binCounts(cur, valueCol, edges, "n_cur").get,
      nBins = edges.size + 1, keys = Nil).get
  }

  /** The pinned-edge bin id: #edges ≤ v (0..#edges). */
  private[graft] def binExpr(valueCol: String, edges: Seq[Double]) =
    edges.map(e => when(col(valueCol).cast("double") >= lit(e), 1)
      .otherwise(0)).reduce(_ + _)

  /** Exact per-bin counts over pinned edges — the build half of [[psi]],
    * public so streams ([[graft.streaming.Stream.windowedBinCounts]])
    * and stored baselines share the identical binning. */
  def binCounts(
      df: DataFrame,
      valueCol: String,
      edges: Seq[Double],
      outCol: String = "n"
  ): MayFail[DataFrame] = MayFail {
    require(edges.nonEmpty, "binCounts needs pinned bin edges")
    require(edges == edges.sorted && edges.distinct == edges,
      s"edges must be sorted and distinct: $edges")
    df.filter(col(valueCol).isNotNull)
      .groupBy(binExpr(valueCol, edges).as("bin"))
      .agg(count(lit(1)).as(outCol))
  }

  /** The finish half of [[psi]], over PRE-AGGREGATED counts: `ref` is
    * `(bin, n_ref)` (the frozen baseline histogram), `cur` is
    * `(keys..., bin, n_cur)` — e.g. one histogram per streaming window
    * — and every `keys` group gets its own per-bin contributions and
    * `psi_total` against the shared reference. Missing bins count 0;
    * the NULL-on-empty contract is per group. Grid-sized frames only. */
  def psiFromCounts(
      ref: DataFrame,
      cur: DataFrame,
      nBins: Int,
      keys: Seq[String],
      curCountCol: String = "n_cur"
  ): MayFail[DataFrame] = MayFail {
    require(nBins >= 2, s"nBins must be >= 2: $nBins")
    val spark = ref.sparkSession
    import spark.implicits._
    val bins = (0 until nBins).toDF("bin")
    val grid =
      if (keys.isEmpty) bins
      else cur.select(keys.map(col): _*).distinct().crossJoin(bins)
    val joined = grid
      .join(ref.select(col("bin"), col("n_ref")), Seq("bin"), "left")
      .join(cur.withColumnRenamed(curCountCol, "n_cur"),
        keys :+ "bin", "left")
      .na.fill(0L, Seq("n_ref", "n_cur"))
    val wAll = Window.partitionBy(keys.map(col): _*).rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val pr = col("n_ref").cast("double") / sum(col("n_ref")).over(wAll)
      .cast("double")
    val pc = col("n_cur").cast("double") / sum(col("n_cur")).over(wAll)
      .cast("double")
    val contrib = when(col("n_ref") > 0 && col("n_cur") > 0,
      (pc - pr) * log(pc / pr))
    joined
      .withColumn("p_ref", round(pr + lit(1e-9), 6))
      .withColumn("p_cur", round(pc + lit(1e-9), 6))
      .withColumn("__contrib", contrib)
      .withColumn("contrib", round(contrib + lit(1e-9), 6))
      .withColumn("psi_total",
        round(when(count(col("__contrib")).over(wAll) ===
            count(lit(1)).over(wAll),
          sum(col("__contrib")).over(wAll)) + lit(1e-9), 6))
      .select(keys.map(col) ++ Seq(col("bin"), col("n_ref"), col("n_cur"),
        col("p_ref"), col("p_cur"), col("contrib"), col("psi_total")): _*)
  }

  /** Calibration report + expected calibration error (Naeini et al.
    * AAAI 2015; Guo et al. ICML 2017): equal-width bins over a [0, 1]
    * score, per-bin accuracy vs mean confidence, `ECE =
    * Σ (n_b/N)·|acc_b − conf_b|`. Returns one row per non-empty bin
    * `(bin, n, n_pos, acc, conf, gap, ece_total)`. Confidence sums use
    * the ×10^s exact-integer contract (`scoreScaleDecimals`); rows with
    * score outside [0, 1] or null label drop by documented contract. */
  def calibrationReport(
      df: DataFrame,
      scoreCol: String,
      labelCol: String,
      bins: Int = 10,
      scoreScaleDecimals: Int = 6
  ): MayFail[DataFrame] = MayFail {
    require(bins >= 2 && bins <= 1000, s"bins must be in [2, 1000]: $bins")
    require(scoreScaleDecimals >= 0 && scoreScaleDecimals <= 9,
      s"scoreScaleDecimals must be in [0, 9]: $scoreScaleDecimals")
    val sc = math.pow(10, scoreScaleDecimals)
    val s = col(scoreCol).cast("double")
    val base = df
      .filter(s.isNotNull && col(labelCol).isNotNull &&
        s >= 0.0 && s <= 1.0)
      .select(
        least(floor(s * lit(bins.toDouble)).cast("long"),
          lit((bins - 1).toLong)).as("bin"),
        round(s * lit(sc)).cast("long").as("__c"),
        when(col(labelCol), 1L).otherwise(0L).as("__y"))
    val g = base.groupBy("bin").agg(
      count(lit(1)).as("n"),
      sum(col("__y")).as("n_pos"),
      sum(col("__c")).as("__sc"))
    val acc = col("n_pos").cast("double") / col("n").cast("double")
    val conf = (col("__sc").cast("double") / col("n").cast("double")) /
      lit(sc)
    val gap = abs(acc - conf)
    val wAll = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    g.withColumn("__N", sum(col("n")).over(wAll))
      .withColumn("__w",
        (col("n").cast("double") / col("__N").cast("double")) * gap)
      .withColumn("acc", round(acc + lit(1e-9), 6))
      .withColumn("conf", round(conf + lit(1e-9), 6))
      .withColumn("gap", round(gap + lit(1e-9), 6))
      .withColumn("ece_total",
        round(sum(col("__w")).over(wAll) + lit(1e-9), 6))
      .select("bin", "n", "n_pos", "acc", "conf", "gap", "ece_total")
  }

  /** Brier score + Murphy-style binned decomposition (Murphy 1973;
    * the [[calibrationReport]] companion): ONE row `(n, brier,
    * reliability, resolution, uncertainty)` where `brier` is the mean
    * squared error of the [0, 1] score against the binary label —
    * per-row terms `(c − y·10^s)²` are exact scaled integers; their
    * grand sum accumulates in double (χ²-tier last-ulp noise past
    * ~10⁴ rows at scale 6, never an ANSI throw) — `reliability =
    * Σ (n_b/N)(conf_b − acc_b)²`, `resolution = Σ (n_b/N)(acc_b − ȳ)²`
    * and `uncertainty = ȳ(1 − ȳ)`. The three terms satisfy the Murphy
    * identity only when scores are constant within bins (the grid
    * case); with continuous scores the within-bin forecast variance
    * (reported as `brier − reliability + resolution − uncertainty`'s
    * residual) separates them — documented, not hidden. Same bin /
    * scale / drop contract as [[calibrationReport]]. */
  def brierDecomposition(
      df: DataFrame,
      scoreCol: String,
      labelCol: String,
      bins: Int = 10,
      scoreScaleDecimals: Int = 6
  ): MayFail[DataFrame] = MayFail {
    require(bins >= 2 && bins <= 1000, s"bins must be in [2, 1000]: $bins")
    require(scoreScaleDecimals >= 0 && scoreScaleDecimals <= 9,
      s"scoreScaleDecimals must be in [0, 9]: $scoreScaleDecimals")
    val sc = math.pow(10, scoreScaleDecimals)
    val s = col(scoreCol).cast("double")
    val base = df
      .filter(s.isNotNull && col(labelCol).isNotNull &&
        s >= 0.0 && s <= 1.0)
      .select(
        least(floor(s * lit(bins.toDouble)).cast("long"),
          lit((bins - 1).toLong)).as("bin"),
        round(s * lit(sc)).cast("long").as("__c"),
        when(col(labelCol), 1L).otherwise(0L).as("__y"))
    val g = base.groupBy("bin").agg(
      count(lit(1)).as("__n"),
      sum(col("__y")).as("__np"),
      sum(col("__c")).as("__sc"),
      // (c − y·10^s)²: double from the first factor (c ≤ 10^9 squares
      // past long range at scale 9 only with huge n — stay safe)
      sum((col("__c") - col("__y") * lit(sc.toLong)).cast("double") *
        (col("__c") - col("__y") * lit(sc.toLong)).cast("double"))
        .as("__se2"))
    val wAll = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    // distinct names, not just distinct case: Spark resolution is
    // case-insensitive, so "__N" would silently shadow "__n"
    val t = g
      .withColumn("__tn", sum(col("__n")).over(wAll))
      .withColumn("__tp", sum(col("__np")).over(wAll))
      .withColumn("__tse", sum(col("__se2")).over(wAll))
    val nD = col("__n").cast("double")
    val acc = col("__np").cast("double") / nD
    val conf = (col("__sc").cast("double") / nD) / lit(sc)
    val ybar = col("__tp").cast("double") / col("__tn").cast("double")
    val share = nD / col("__tn").cast("double")
    val agg = t.agg(
      max(col("__tn")).as("n"),
      max((col("__tse") / col("__tn").cast("double")) / lit(sc * sc))
        .as("__brier"),
      sum(share * ((conf - acc) * (conf - acc))).as("__rel"),
      sum(share * ((acc - ybar) * (acc - ybar))).as("__res"),
      max(ybar * (lit(1.0) - ybar)).as("__unc"))
    agg.select(col("n"),
      round(col("__brier") + lit(1e-9), 6).as("brier"),
      round(col("__rel") + lit(1e-9), 6).as("reliability"),
      round(col("__res") + lit(1e-9), 6).as("resolution"),
      round(col("__unc") + lit(1e-9), 6).as("uncertainty"))
  }

  /** Distribution-free confidence interval for the MEDIAN from binomial
    * order statistics (the classic sign-test inversion, normal-
    * approximation ranks): `l = max(1, ⌊(n − z·√n)/2⌋)`,
    * `u = n + 1 − l`, interval = the l-th and u-th order statistics —
    * no distributional assumption, exact grid-rank picks (the q355
    * convention), `z` baked for 95%. Returns ONE row
    * `(n, median, ci_lo, ci_hi)` — ALWAYS one row, `(0, NULL, NULL,
    * NULL)` on an empty input (the sibling one-row contract of
    * trimmedMean/jackknifeRatio); NULL interval when n < 2 or the
    * ranks degenerate. Plan: one partial agg to the value grid, then
    * grid-sized windows. */
  def medianCI(
      df: DataFrame,
      valueCol: String
  ): MayFail[DataFrame] = MayFail {
    val z = 1.959963984540054 // qnorm(0.975), shared literal
    val grid = df.filter(col(valueCol).isNotNull)
      .groupBy(col(valueCol).cast("double").as("__v"))
      .agg(count(lit(1)).as("__t"))
    val wOrd = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = grid
      .withColumn("__c", sum(col("__t")).over(wOrd))
      .withColumn("__n", sum(col("__t")).over(wAll))
    val nD = col("__n").cast("double")
    val lRank = greatest(lit(1L),
      floor((nD - lit(z) * sqrt(nD)) / lit(2.0)).cast("long"))
    val uRank = col("__n") + 1 - lRank
    val mRank = greatest(lit(1L),
      ceil(lit(0.5) * nD).cast("long"))
    def pick(rank: org.apache.spark.sql.Column, out: String) =
      cum.filter(col("__c") >= rank && col("__c") - col("__t") < rank)
        .select(col("__v").as(out), col("__n"))
    // anchor on a one-row global aggregate (grid-sized, no extra
    // corpus pass) so an EMPTY input still yields the documented ONE
    // row — (0, NULL, NULL, NULL) — instead of vanishing; the rank
    // picks left-join onto it
    val anchor = grid.agg(coalesce(sum(col("__t")), lit(0L)).as("n"))
    anchor
      .join(pick(mRank, "median").select(col("median")), lit(true), "left")
      .join(pick(lRank, "__lo").select(col("__lo")), lit(true), "left")
      .join(pick(uRank, "__hi").select(col("__hi")), lit(true), "left")
      .select(col("n"),
        round(col("median") + lit(1e-9), 6).as("median"),
        round(when(col("n") >= 2, col("__lo")) + lit(1e-9), 6)
          .as("ci_lo"),
        round(when(col("n") >= 2, col("__hi")) + lit(1e-9), 6)
          .as("ci_hi"))
  }

  /** Mondrian (group-conditional) split conformal (Vovk 2012): a
    * separate calibration quantile per `keys` group, giving coverage
    * ≥ 1 − α WITHIN every group — the fix when residual scales differ
    * across segments and the marginal interval over- and under-covers
    * by segment. Same rank convention as [[splitConformal]]; groups
    * whose calibration is too small for the rank (or unseen in
    * calibration) get NULL intervals — surfaced per group, never a
    * global Fail (the grouped contract differs deliberately: one thin
    * segment must not sink the release). The per-group q̂ grid is
    * groups-sized and broadcasts onto `test`. */
  def splitConformalBy(
      cal: DataFrame,
      test: DataFrame,
      yCol: String,
      yhatCol: String,
      keys: Seq[String],
      alpha: Double = 0.1
  ): MayFail[DataFrame] =
    if (keys.isEmpty)
      graft.functional.Fail(new IllegalArgumentException(
        "splitConformalBy needs keys — use splitConformal for the " +
          "marginal interval"))
    else MayFail {
      require(alpha > 0 && alpha < 1, s"alpha must be in (0, 1): $alpha")
      val resid = abs(col(yCol).cast("double") -
        col(yhatCol).cast("double"))
      val grid = cal
        .filter(col(yCol).isNotNull && col(yhatCol).isNotNull &&
          keys.map(col(_).isNotNull).reduce(_ && _))
        .groupBy(keys.map(col) :+ resid.as("__r"): _*)
        .agg(count(lit(1)).as("__t"))
      val wKey = Window.partitionBy(keys.map(col): _*)
      val wOrd = wKey.orderBy(col("__r"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val wAll = wKey.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      val rank = ceil((col("__n") + 1).cast("double") * lit(1.0 - alpha))
        .cast("long")
      val qg = grid
        .withColumn("__c", sum(col("__t")).over(wOrd))
        .withColumn("__n", sum(col("__t")).over(wAll))
        .filter(col("__c") >= rank && col("__c") - col("__t") < rank)
        .select(keys.map(col) :+ col("__r").as("__qhat"): _*)
      test.join(broadcast(qg), keys, "left")
        .withColumn("conformal_lo",
          col(yhatCol).cast("double") - col("__qhat"))
        .withColumn("conformal_hi",
          col(yhatCol).cast("double") + col("__qhat"))
        .drop("__qhat")
    }

  /** Symmetrically trimmed mean — the estimator companion of
    * [[graft.operators.Quality.winsorize]]: drop the lowest and
    * highest `⌊trim·n⌋` observations by rank and average the rest.
    * Exact under the ×10^s contract: the value grid carries counts,
    * each grid row contributes `max(0, min(c, n−g) − max(c−g₀, g))`
    * kept rows (pure integer overlap of its cumulative range with the
    * kept band), and the kept-weighted sum is integer. ONE row
    * `(n, n_kept, trimmed_mean)`; NULL mean when the band is empty.
    * One partial agg to the grid + grid-sized windows. */
  def trimmedMean(
      df: DataFrame,
      valueCol: String,
      trim: Double,
      scaleDecimals: Int = 0
  ): MayFail[DataFrame] = MayFail {
    require(trim >= 0 && trim < 0.5, s"trim must be in [0, 0.5): $trim")
    require(scaleDecimals >= 0 && scaleDecimals <= 9,
      s"scaleDecimals must be in [0, 9]: $scaleDecimals")
    val sc = math.pow(10, scaleDecimals)
    val grid = df.filter(col(valueCol).isNotNull)
      .groupBy(round(col(valueCol).cast("double") * lit(sc)).cast("long")
        .as("__v"))
      .agg(count(lit(1)).as("__t"))
    val wOrd = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = grid
      .withColumn("__c", sum(col("__t")).over(wOrd))
      .withColumn("__n", sum(col("__t")).over(wAll))
    val g = floor(lit(trim) * col("__n").cast("double")).cast("long")
    val kept = greatest(lit(0L),
      least(col("__c"), col("__n") - g) -
        greatest(col("__c") - col("__t"), g))
    cum.withColumn("__k", kept)
      .agg(max(col("__n")).as("n"),
        sum(col("__k")).as("n_kept"),
        sum(col("__k") * col("__v")).as("__s"))
      .select(col("n"), col("n_kept"),
        round(when(col("n_kept") > 0,
          (col("__s").cast("double") / col("n_kept").cast("double"))
            / lit(sc)) + lit(1e-9), 6).as("trimmed_mean"))
  }

  /** Linear-time MMD two-sample test for EMBEDDINGS (Gretton et al.,
    * JMLR 2012 §6 — the streaming estimator): pair the two samples
    * deterministically (salted-hash buckets, rank-aligned inside each
    * bucket — any fixed pairing is unbiased), then average
    * `h(z₁,z₂) = k(x₁,x₂) + k(y₁,y₂) − k(x₁,y₂) − k(x₂,y₁)` over
    * consecutive pair-of-pairs with the RBF kernel
    * `k(u,v) = exp(−γ‖u−v‖²)`. Representation-space drift detection —
    * "did the embedding DISTRIBUTION move", the question per-dimension
    * PSI can't ask. Returns ONE row `(n_pairs, mmd2, se, z)`: the
    * estimator, its normal-approximation standard error and z-score
    * (NULL when variance degenerates). Distances are the engine-exact
    * left fold; `exp` and the cross-pair sums are χ²-tier (round-6
    * outputs).
    *
    * Scale shape: no quadratic kernel matrix — one hash bucketing per
    * side, rank windows WITHIN buckets (never a global single
    * partition), one join on (bucket, rank), one aggregation. */
  def mmdLinear(
      a: DataFrame,
      b: DataFrame,
      vecCol: String,
      idCol: String,
      gamma: Double,
      nBuckets: Int = 64,
      salt: String = "0"
  ): MayFail[DataFrame] = MayFail {
    require(gamma > 0, s"gamma must be positive: $gamma")
    require(nBuckets >= 1 && nBuckets <= 65536,
      s"nBuckets must be in [1, 65536]: $nBuckets")
    def side(df: DataFrame, vOut: String): DataFrame = {
      val h = graft.functions.TextFunctions.portableHash60(
        concat(lit(s"$salt§"), col(idCol).cast("string")))
      val w = Window.partitionBy(col("__bk")).orderBy(col("__h"), col(idCol))
      df.filter(col(idCol).isNotNull && col(vecCol).isNotNull)
        .select(col(idCol),
          transform(col(vecCol), x => x.cast("double")).as(vOut),
          h.as("__h"))
        .withColumn("__bk", pmod(col("__h"), lit(nBuckets.toLong)))
        .withColumn("__r", row_number().over(w).cast("long"))
        .select(col("__bk"), col("__r"), col(vOut))
    }
    val joined = side(a, "__x").join(side(b, "__y"), Seq("__bk", "__r"))
      .withColumn("__p", ((col("__r") + 1) / lit(2L)).cast("long"))
    import org.apache.spark.sql.Column
    def sq(u: Column, v: Column): Column =
      aggregate(zip_with(u, v, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, t) => acc + t)
    def k(u: Column, v: Column): Column =
      exp(lit(-gamma) * sq(u, v))
    val z1 = joined.filter(pmod(col("__r"), lit(2L)) === 1)
      .select(col("__bk"), col("__p"),
        col("__x").as("__x1"), col("__y").as("__y1"))
    val z2 = joined.filter(pmod(col("__r"), lit(2L)) === 0)
      .select(col("__bk"), col("__p"),
        col("__x").as("__x2"), col("__y").as("__y2"))
    val hTerm = (k(col("__x1"), col("__x2")) + k(col("__y1"), col("__y2"))
      - k(col("__x1"), col("__y2"))) - k(col("__x2"), col("__y1"))
    val pairs = z1.join(z2, Seq("__bk", "__p"))
      .select(hTerm.as("__hv"))
    pairs.agg(count(lit(1)).as("n_pairs"),
        sum(col("__hv")).as("__sh"),
        sum(col("__hv") * col("__hv")).as("__sh2"))
      .select(col("n_pairs"),
        round(when(col("n_pairs") > 0,
          col("__sh") / col("n_pairs").cast("double")) + lit(1e-9), 6)
          .as("mmd2"),
        round(when(col("n_pairs") >= 2,
          sqrt(((col("__sh2") - (col("__sh") * col("__sh")) /
            col("n_pairs").cast("double")) /
            (col("n_pairs").cast("double") - lit(1.0))) /
            col("n_pairs").cast("double"))) + lit(1e-9), 6).as("se"),
        round(when(col("n_pairs") >= 2 &&
            (col("__sh2") - (col("__sh") * col("__sh")) /
              col("n_pairs").cast("double")) > 0,
          (col("__sh") / col("n_pairs").cast("double")) /
            sqrt(((col("__sh2") - (col("__sh") * col("__sh")) /
              col("n_pairs").cast("double")) /
              (col("n_pairs").cast("double") - lit(1.0))) /
              col("n_pairs").cast("double"))) + lit(1e-9), 6).as("z"))
  }

  /** Per-group Wilson score intervals for a boolean rate (Wilson 1927
    * — the interval that behaves at small n and extreme p where the
    * Wald ±z√(p(1−p)/n) collapses): one row per key
    * `(keys..., n, n_pos, p, wilson_lo, wilson_hi)` at 95% (shared z
    * literal). Pure IEEE closed form of two exact counts — one
    * aggregation, engine-replayable op-for-op. Groups with n = 0
    * cannot occur (they have no rows); p is exact-count division. */
  def proportionCIBy(
      df: DataFrame,
      successCol: String,
      keys: Seq[String]
  ): MayFail[DataFrame] = MayFail {
    require(keys.nonEmpty, "proportionCIBy needs group keys")
    val z = 1.959963984540054 // qnorm(0.975), shared literal
    val succ = col(successCol).cast("boolean")
    val g = df.filter(succ.isNotNull &&
        keys.map(col(_).isNotNull).reduce(_ && _))
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(when(succ, 1L).otherwise(0L)).as("n_pos"))
    val nD = col("n").cast("double")
    val ph = col("n_pos").cast("double") / nD
    val z2 = z * z // exact driver-side product, shared with the oracle
    val den = lit(1.0) + lit(z2) / nD
    val center = (ph + lit(z2) / (lit(2.0) * nD)) / den
    val half = (lit(z) * sqrt(ph * (lit(1.0) - ph) / nD +
      lit(z2) / ((lit(4.0) * nD) * nD))) / den
    g.select(keys.map(col) ++ Seq(col("n"), col("n_pos"),
      round(ph + lit(1e-9), 6).as("p"),
      round((center - half) + lit(1e-9), 6).as("wilson_lo"),
      round((center + half) + lit(1e-9), 6).as("wilson_hi")): _*)
  }

  /** Cochran–Armitage trend test (1954/1955): is a binary rate
    * MONOTONE in an ordered exposure score — the dose-response member
    * of the contingency family (χ² sees association, this sees
    * direction). Scores must be integral-valued (`scaleDecimals`
    * rescales decimals the ×10^s way); per-score cells are exact
    * integers, `T = Σsᵢrᵢ − p̄·Σsᵢnᵢ` and
    * `Var = p̄(1−p̄)(Σsᵢ²nᵢ − (Σsᵢnᵢ)²/N)` follow the
    * double-from-first-factor convention for the quadratic moment.
    * ONE row `(k_levels, n, n_pos, t, z)`; NULL z when the variance
    * degenerates (constant score or constant outcome). One partial-agg
    * shuffle to the score grid. */
  def cochranArmitage(
      df: DataFrame,
      successCol: String,
      scoreCol: String,
      scaleDecimals: Int = 0
  ): MayFail[DataFrame] = MayFail {
    require(scaleDecimals >= 0 && scaleDecimals <= 9,
      s"scaleDecimals must be in [0, 9]: $scaleDecimals")
    val sc = math.pow(10, scaleDecimals)
    val succ = col(successCol).cast("boolean")
    val s = round(col(scoreCol).cast("double") * lit(sc)).cast("long")
    val g = df.filter(succ.isNotNull && col(scoreCol).isNotNull)
      .groupBy(s.as("__s"))
      .agg(count(lit(1)).as("__n"),
        sum(when(succ, 1L).otherwise(0L)).as("__r"))
    val agg = g.agg(
      count(lit(1)).as("k_levels"),
      sum(col("__n")).as("n"),
      sum(col("__r")).as("n_pos"),
      sum(col("__s") * col("__r")).as("__a"),
      sum(col("__s") * col("__n")).as("__b"),
      // s²·n in double from the first factor (ANSI-safe past 2³¹ scores)
      sum(col("__s").cast("double") * col("__s") * col("__n")).as("__c"))
    val nD = col("n").cast("double")
    val pbar = col("n_pos").cast("double") / nD
    val t = col("__a").cast("double") - pbar * col("__b").cast("double")
    val v = (pbar * (lit(1.0) - pbar)) *
      (col("__c") - (col("__b").cast("double") *
        col("__b").cast("double")) / nD)
    agg.select(col("k_levels"), col("n"), col("n_pos"),
      round(t / lit(sc) + lit(1e-9), 6).as("t"),
      round(when(v > 0, t / sqrt(v)) + lit(1e-9), 6).as("z"))
  }

  /** Wald–Wolfowitz runs test of sequence randomness: are the TRUE/
    * FALSE values of `flagCol`, in `orderCols` order, free of serial
    * clustering? `R = 1 + Σ[xᵢ ≠ xᵢ₋₁]` against the exact-count normal
    * approximation `μ = 1 + 2n₁n₀/n`,
    * `σ² = 2n₁n₀(2n₁n₀−n)/(n²(n−1))` (quadratics double-from-first).
    * ONE row `(n, n_true, n_runs, z)`; NULL z below n = 2 per class.
    * Order contract: `orderCols` must be a TOTAL order — unlike
    * [[msprt]], runs are NOT invariant under tied-row swaps, so append
    * enough columns to break every tie. One window pass (lag) + one
    * aggregation. */
  def runsTest(
      df: DataFrame,
      flagCol: String,
      orderCols: Seq[String],
      keys: Seq[String] = Nil
  ): MayFail[DataFrame] = MayFail {
    require(orderCols.nonEmpty, "runsTest needs a total order")
    val x = col(flagCol).cast("boolean")
    val wOrd = Window.partitionBy(keys.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val marked = df.filter(x.isNotNull)
      .withColumn("__x", x)
      .withColumn("__chg",
        when(lag(col("__x"), 1).over(wOrd).isNull, 1L)
          .when(lag(col("__x"), 1).over(wOrd) =!= col("__x"), 1L)
          .otherwise(0L))
    val agg = (if (keys.isEmpty) marked.groupBy()
      else marked.groupBy(keys.map(col): _*))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__x"), 1L).otherwise(0L)).as("n_true"),
        sum(col("__chg")).as("n_runs"))
    val nD = col("n").cast("double")
    val n1 = col("n_true").cast("double")
    val n0 = nD - n1
    val two = lit(2.0) * n1 * n0
    val mu = lit(1.0) + two / nD
    val v = (two * (two - nD)) / ((nD * nD) * (nD - lit(1.0)))
    val ok = col("n_true") >= 2 && (col("n") - col("n_true")) >= 2 && v > 0
    agg.select(keys.map(col) ++ Seq(col("n"), col("n_true"),
      col("n_runs"),
      round(when(ok,
        (col("n_runs").cast("double") - mu) / sqrt(v)) + lit(1e-9), 6)
        .as("z")): _*)
  }

  /** Difference-in-differences estimator (Card & Krueger 1994's
    * canonical 2×2): with unit-level observations in four cells —
    * (treat, control) × (pre, post) —
    *
    *   `DiD = (ȳ_treat,post − ȳ_treat,pre) − (ȳ_ctrl,post − ȳ_ctrl,pre)`
    *
    * the causal readout when randomization is impossible but a
    * parallel-trends control exists (a rollout by region, a policy by
    * cohort). Rows outside the four NAMED cells, or with a null value,
    * drop — the [[cuped]] convention.
    *
    * Returns ONE row `(n, n_tpre, n_tpost, n_cpre, n_cpost: bigint,
    * mean_tpre, mean_tpost, mean_cpre, mean_cpost, did, se_did, ci_lo,
    * ci_hi: double ROUNDED at 6)`: unequal-variance SE
    * `√(Σ_cells s²/n)` over the four cell sample variances, ±1.96
    * normal CI; NULL SE/CI when any cell has n < 2 (surfaced, never
    * fabricated).
    *
    * Exactness: cell sums S, Q run on `scaleDecimals`-scaled exact
    * longs (the ×100 cents convention), means and sample variances
    * `(Q·n − S²)/(n·(n−1))` are IEEE functions of exact integers
    * descaled at the readout — any engine replays them term-for-term.
    * Plan: ONE conditional scalar aggregate — no shuffle wider than
    * the partial aggs, no join. */
  def didEstimator(
      df: DataFrame,
      groupCol: String,
      treatValue: String,
      controlValue: String,
      periodCol: String,
      postValue: String,
      preValue: String,
      valueCol: String,
      scaleDecimals: Int = 0
  ): MayFail[DataFrame] = MayFail {
    require(treatValue != controlValue,
      "treatValue and controlValue must differ")
    require(postValue != preValue, "postValue and preValue must differ")
    require(scaleDecimals >= 0 && scaleDecimals <= 9,
      s"scaleDecimals must be in [0, 9]: $scaleDecimals")
    val sc = math.pow(10, scaleDecimals)
    val g = col(groupCol).cast("string")
    val p = col(periodCol).cast("string")
    val v = col(valueCol).cast("double")
    val base = df.filter(v.isNotNull &&
        (g === treatValue || g === controlValue) &&
        (p === postValue || p === preValue))
      .select((g === treatValue).as("__t"), (p === postValue).as("__post"),
        round(v * lit(sc)).cast("long").as("__c"))
    def cell(t: Boolean, post: Boolean) =
      col("__t") === t && col("__post") === post
    def aggsFor(t: Boolean, post: Boolean, tag: String) = Seq(
      count(when(cell(t, post), lit(1))).as(s"__n_$tag"),
      sum(when(cell(t, post), col("__c"))).as(s"__s_$tag"),
      sum(when(cell(t, post), col("__c") * col("__c"))).as(s"__q_$tag"))
    val cells = Seq(("tpre", true, false), ("tpost", true, true),
      ("cpre", false, false), ("cpost", false, true))
    val agg = base.agg(count(lit(1)).as("n"),
      cells.flatMap { case (tag, t, post) => aggsFor(t, post, tag) }: _*)
    def nD(tag: String) = col(s"__n_$tag").cast("double")
    def mean(tag: String) =
      (col(s"__s_$tag").cast("double") / nD(tag)) / lit(sc)
    // sample variance of the SCALED values, descaled by sc²
    def svar(tag: String) =
      ((col(s"__q_$tag").cast("double") * nD(tag) -
        col(s"__s_$tag").cast("double") * col(s"__s_$tag").cast("double")) /
        (nD(tag) * (nD(tag) - lit(1.0)))) / lit(sc * sc)
    val did = (mean("tpost") - mean("tpre")) -
      (mean("cpost") - mean("cpre"))
    val se = sqrt(cells.map { case (tag, _, _) => svar(tag) / nD(tag) }
      .reduce(_ + _))
    val ok = cells.map { case (tag, _, _) => col(s"__n_$tag") >= 2 }
      .reduce(_ && _)
    agg.select(col("n"),
      col("__n_tpre").as("n_tpre"), col("__n_tpost").as("n_tpost"),
      col("__n_cpre").as("n_cpre"), col("__n_cpost").as("n_cpost"),
      round(mean("tpre") + lit(1e-9), 6).as("mean_tpre"),
      round(mean("tpost") + lit(1e-9), 6).as("mean_tpost"),
      round(mean("cpre") + lit(1e-9), 6).as("mean_cpre"),
      round(mean("cpost") + lit(1e-9), 6).as("mean_cpost"),
      round(did + lit(1e-9), 6).as("did"),
      round(when(ok, se) + lit(1e-9), 6).as("se_did"),
      round(when(ok, did - lit(1.96) * se) + lit(1e-9), 6).as("ci_lo"),
      round(when(ok, did + lit(1.96) * se) + lit(1e-9), 6).as("ci_hi"))
  }

  /** Sample-ratio-mismatch check (Fabijan et al., ICSE-SEIP 2019: the
    * single most common experiment-invalidation bug) — a χ²
    * goodness-of-fit of observed assignment counts against the DESIGN
    * ratios: a 50/50 split landing 50.5/49.5 at scale means broken
    * randomization, bot filtering, or logging loss, and every readout
    * downstream is suspect. Run it BEFORE believing any effect.
    *
    * `expected` maps arm → design weight (normalized internally, so
    * 1:1 or 50:50 both work); arms observed but not in the design, or
    * designed but absent, surface as rows (absent arms with
    * `n_obs = 0`), both contributing their full χ² term. Null arms
    * drop.
    *
    * Returns one row PER ARM `(arm, n_obs: bigint, ratio_expected,
    * n_expected, chi2_term, chi2_total: double ROUNDED at 6, df:
    * bigint)` — `chi2_total` and `df = k_design − 1` (DESIGN cells
    * only; rogue arms flag, they don't add degrees of freedom)
    * repeated on each row for one-frame consumption. `chi2_total` is
    * capped at Double.MaxValue so multiple rogue-arm sentinels can
    * never overflow it to +Infinity. Counts are exact longs; the χ² terms are
    * IEEE functions of them against driver-baked weight literals.
    * Plan: one partial-agg shuffle to arm counts (k rows), then
    * arm-grid arithmetic with a broadcast 1-row total. */
  def srmCheck(
      df: DataFrame,
      armCol: String,
      expected: Map[String, Double]
  ): MayFail[DataFrame] =
    MayFail {
      df.filter(col(armCol).isNotNull)
        .groupBy(col(armCol).cast("string").as("arm"))
        .agg(count(lit(1)).as("n_obs"))
    }.flatMap(srmFromCounts(_, expected))

  /** [[srmCheck]]'s finisher over PRE-AGGREGATED `(keys..., arm,
    * n_obs)` counts — the χ² runs independently WITHIN each `keys`
    * group (a day window, an experiment id), which is how the
    * streaming monitor consumes it: build exact per-window arm counts
    * with [[graft.streaming.Stream.windowedArmCounts]] (bounded
    * state), drain, finish per window against the frozen design —
    * the [[psiFromCounts]] discipline. Designed arms absent from a
    * group surface with `n_obs = 0`; observed undesigned arms carry
    * the capped rogue sentinel. Duplicate `(keys, arm)` input rows
    * (a union of drained snapshots, update-mode micro-batches) are
    * summed before the design join — counts add, they never
    * double-match the grid. Same row shape as [[srmCheck]] plus
    * the leading `keys`. */
  def srmFromCounts(
      counts: DataFrame,
      expected: Map[String, Double],
      keys: Seq[String] = Nil,
      armCol: String = "arm",
      countCol: String = "n_obs"
  ): MayFail[DataFrame] = MayFail {
    require(expected.nonEmpty, "srmFromCounts needs the design ratios")
    require(expected.values.forall(_ > 0),
      s"design weights must be positive: $expected")
    val wSum = expected.values.sum
    val spark = counts.sparkSession
    import spark.implicits._
    val design = expected.toSeq.sortBy(_._1)
      .map { case (a, w) => (a, w / wSum) }
      .toDF("arm", "ratio_expected")
    val kDesign = expected.size
    // re-aggregate defensively: a union of drained snapshots (or
    // update-mode micro-batch output) may carry duplicate (keys, arm)
    // rows — without this the full_outer join would duplicate grid
    // matches and inflate every expectation in the window
    val obs = counts.select(keys.map(col) :+
        col(armCol).cast("string").as("arm") :+
        col(countCol).cast("long").as("n_obs"): _*)
      .groupBy(keys.map(col) :+ col("arm"): _*)
      .agg(sum(col("n_obs")).as("n_obs"))
    // every design arm must appear in every observed key group (an
    // absent arm is a full-term violation): key-grid × design, then
    // left-join the observations back
    val grid =
      if (keys.isEmpty) design
      else obs.select(keys.map(col): _*).distinct()
        .crossJoin(broadcast(design))
    val joined = grid.join(obs, keys :+ "arm", "full_outer")
      .select(keys.map(col) :+ col("arm") :+
        coalesce(col("n_obs"), lit(0L)).as("n_obs") :+
        coalesce(col("ratio_expected"), lit(0.0)).as("ratio_expected"): _*)
    val wKey = Window.partitionBy(keys.map(col): _*)
    // df counts DESIGN cells only (k_design − 1): an observed-but-
    // undesigned arm is a violation FLAG, not an extra cell of the
    // reference distribution
    val nTot = sum(col("n_obs")).over(wKey)
    val exp = col("ratio_expected") * nTot.cast("double")
    // an observed-but-undesigned arm has expectation 0: any presence
    // is an infinite-χ² violation — surface a huge finite sentinel
    // (MaxValue >> 16) instead of NaN, and CAP the total at MaxValue so
    // several rogue arms can never overflow it to +Infinity
    val rogue = Double.MaxValue / 65536
    val term = when(exp > 0,
        (col("n_obs").cast("double") - exp) * (col("n_obs").cast("double") - exp) / exp)
      .otherwise(when(col("n_obs") > 0, lit(rogue))
        .otherwise(lit(0.0)))
    joined
      .withColumn("__e", exp)
      .withColumn("__term", term)
      .select(keys.map(col) ++ Seq(col("arm"), col("n_obs"),
        round(col("ratio_expected") + lit(1e-9), 6).as("ratio_expected"),
        round(col("__e") + lit(1e-9), 6).as("n_expected"),
        round(col("__term") + lit(1e-9), 6).as("chi2_term"),
        round(least(sum(col("__term")).over(wKey), lit(Double.MaxValue))
          + lit(1e-9), 6).as("chi2_total"),
        lit(kDesign - 1).cast("long").as("df")): _*)
  }

  /** Post-stratified mean: re-weight per-stratum sample means to TARGET
    * population weights — the estimator that fixes a sampled eval set
    * whose strata (language, source, length bucket) drifted from the
    * population they must represent:
    *
    *   `ȳ_post = Σ_h W_h · ȳ_h`,  `SE² = Σ_h W_h² · s²_h / n_h`
    *
    * `weights` maps stratum → target weight (normalized internally).
    * Rows with null value/stratum, or in strata OUTSIDE the target
    * design, drop (they have zero target weight by definition);
    * designed strata ABSENT from the sample make the estimator
    * undefined — surfaced as NULL estimate with the missing count.
    *
    * Returns ONE row `(n, n_strata_design, n_strata_observed: bigint,
    * mean_raw, mean_post, se_post: double ROUNDED at 6)`. Exactness:
    * per-stratum S, Q on `scaleDecimals`-scaled exact longs, weight
    * literals driver-baked, one strata-grid reduction after a single
    * partial-agg shuffle. */
  def postStratifiedMean(
      df: DataFrame,
      valueCol: String,
      strataCol: String,
      weights: Map[String, Double],
      scaleDecimals: Int = 0
  ): MayFail[DataFrame] = MayFail {
    require(weights.nonEmpty, "postStratifiedMean needs target weights")
    require(weights.values.forall(_ > 0),
      s"target weights must be positive: $weights")
    require(scaleDecimals >= 0 && scaleDecimals <= 9,
      s"scaleDecimals must be in [0, 9]: $scaleDecimals")
    val sc = math.pow(10, scaleDecimals)
    val wSum = weights.values.sum
    val spark = df.sparkSession
    import spark.implicits._
    val design = weights.toSeq.sortBy(_._1)
      .map { case (h, w) => (h, w / wSum) }
      .toDF("__h", "__w")
    val v = col(valueCol).cast("double")
    val g = df.filter(v.isNotNull && col(strataCol).isNotNull)
      .select(col(strataCol).cast("string").as("__h"),
        round(v * lit(sc)).cast("long").as("__c"))
      .groupBy("__h")
      .agg(count(lit(1)).as("__n"), sum(col("__c")).as("__s"),
        sum(col("__c") * col("__c")).as("__q"))
    val grid = design.join(g, Seq("__h"), "left")
    val nD = col("__n").cast("double")
    val meanH = (col("__s").cast("double") / nD) / lit(sc)
    val svarH = ((col("__q").cast("double") * nD -
      col("__s").cast("double") * col("__s").cast("double")) /
      (nD * (nD - lit(1.0)))) / lit(sc * sc)
    grid.agg(
        coalesce(sum(col("__n")), lit(0L)).as("n"),
        count(lit(1)).as("n_strata_design"),
        count(col("__n")).as("n_strata_observed"),
        (sum(col("__s")).cast("double") /
          sum(col("__n")).cast("double") / lit(sc)).as("__mraw"),
        sum(col("__w") * meanH).as("__mpost"),
        sum((col("__w") * col("__w")) * (svarH / nD)).as("__vpost"),
        min(col("__n")).as("__minN"))
      .select(col("n"), col("n_strata_design"), col("n_strata_observed"),
        round(col("__mraw") + lit(1e-9), 6).as("mean_raw"),
        round(when(col("n_strata_observed") === col("n_strata_design"),
          col("__mpost")) + lit(1e-9), 6).as("mean_post"),
        round(when(col("n_strata_observed") === col("n_strata_design") &&
            col("__minN") >= 2,
          sqrt(col("__vpost"))) + lit(1e-9), 6).as("se_post"))
  }

  /** Quantile treatment effect — the DISTRIBUTIONAL readout the mean
    * effect hides (a p90-latency regression, a median-tokens shift
    * under an unchanged mean): the difference of the two groups'
    * exact `p`-quantiles, with a deterministic Poisson-bootstrap CI
    * over the SAME per-row draws as [[poissonBootstrap]] (Chamandy et
    * al. 2012 — one distributed pass, `nBoot` weight counters per row,
    * never `nBoot` resampled datasets).
    *
    * Point estimate: the house exact grid-rank quantile per group
    * (rank `max(1, ⌈p·n⌉)` over the `scaleDecimals`-scaled integer
    * value grid — the q355 convention), differenced and descaled.
    * CI: per replicate b, each group's WEIGHTED grid quantile (Poisson
    * weights as exact-integer cumulative counts; replicates where a
    * group draws total weight 0 are dropped — both picks must exist),
    * then grid-rank percentiles of the `qte_b` multiset at
    * `α/2`/`1−α/2`. Every pick is an exact-integer rank decision, so
    * any engine replays the whole chain bit-for-bit.
    *
    * Returns ONE row `(n_treat, n_ctrl: bigint, q: double, qte,
    * ci_lo, ci_hi: double ROUNDED at 6, n_boot: bigint)`; NULL
    * qte/CI when a group is empty (left-join surfacing).
    *
    * Scale shape: the corpus passes are ONE raw grid aggregation and
    * ONE nBoot-exploded grid aggregation (the poissonBootstrap cost);
    * all windows run on (group × replicate)-partitioned VALUE GRIDS —
    * distinct-value-sized, so a near-continuous metric should pick a
    * coarse `scaleDecimals` (the grid IS the state, the documented
    * [[TimeSeries.theilSen]]-style contract). */
  def quantileEffect(
      df: DataFrame,
      groupCol: String,
      treatGroup: String,
      controlGroup: String,
      valueCol: String,
      idCols: Seq[String],
      p: Double = 0.5,
      nBoot: Int = 40,
      alpha: Double = 0.1,
      scaleDecimals: Int = 0,
      salt: String = "0"
  ): MayFail[DataFrame] = MayFail {
    require(treatGroup != controlGroup,
      "treatGroup and controlGroup must differ")
    require(idCols.nonEmpty, "quantileEffect needs idCols — the hash " +
      "of the row identity IS the deterministic draw")
    require(p > 0 && p < 1, s"p must be in (0, 1): $p")
    require(nBoot >= 4 && nBoot <= 1000,
      s"nBoot must be in [4, 1000]: $nBoot")
    require(alpha > 0 && alpha < 1, s"alpha must be in (0, 1): $alpha")
    require(scaleDecimals >= 0 && scaleDecimals <= 9,
      s"scaleDecimals must be in [0, 9]: $scaleDecimals")
    val sc = math.pow(10, scaleDecimals)
    val g = col(groupCol).cast("string")
    val base = df.filter(col(valueCol).isNotNull &&
        (g === treatGroup || g === controlGroup))
      .select(idCols.map(col) :+ (g === treatGroup).as("__t") :+
        round(col(valueCol).cast("double") * lit(sc)).cast("long")
          .as("__c"): _*)
    // grid-rank quantile pick: first value whose cumulative weight
    // reaches max(1, ceil(p * W)) — zero-weight grid rows can never
    // satisfy cum >= r && cum - w < r, so they need no special casing
    def pickQ(grid: DataFrame, part: Seq[String], wcol: String,
        out: String): DataFrame = {
      val wKey = Window.partitionBy(part.map(col): _*)
      val wOrd = wKey.orderBy(col("__c"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val r = greatest(lit(1L),
        ceil(lit(p) * col("__W").cast("double")).cast("long"))
      grid.withColumn("__cum", sum(col(wcol)).over(wOrd))
        .withColumn("__W", sum(col(wcol)).over(wKey))
        .filter(col("__cum") >= r && col("__cum") - col(wcol) < r)
        .select(part.map(col) :+ col("__c").as(out): _*)
    }
    val grid0 = base.groupBy(col("__t"), col("__c"))
      .agg(count(lit(1)).as("__n"))
    val pt = pickQ(grid0, Seq("__t"), "__n", "__q")
    val nRow = base.agg(
      sum(when(col("__t"), 1L).otherwise(0L)).as("n_treat"),
      sum(when(!col("__t"), 1L).otherwise(0L)).as("n_ctrl"))
    val withB = base.withColumn("__b",
      explode(array((0 until nBoot).map(i => lit(i)): _*)))
    val gridB = withB
      .groupBy(col("__t"), col("__b"), col("__c"))
      .agg(sum(poissonWeight(idCols, salt)).as("__wt"))
    val qB = pickQ(gridB, Seq("__t", "__b"), "__wt", "__q")
    val diffs = qB.filter(col("__t"))
      .select(col("__b"), col("__q").as("__qa"))
      .join(qB.filter(!col("__t"))
        .select(col("__b"), col("__q").as("__qo")), Seq("__b"))
      .select((col("__qa") - col("__qo")).as("__d"))
    val dg = diffs.groupBy(col("__d")).agg(count(lit(1)).as("__tt"))
    val wOrd = Window.orderBy(col("__d"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = dg
      .withColumn("__cc", sum(col("__tt")).over(wOrd))
      .withColumn("__nb", sum(col("__tt")).over(wAll))
    def pickD(pp: Double, out: String) = {
      val r = greatest(lit(1L),
        ceil(lit(pp) * col("__nb").cast("double")).cast("long"))
      cum.filter(col("__cc") >= r && col("__cc") - col("__tt") < r)
        .select(col("__d").as(out), col("__nb"))
    }
    nRow
      .join(pt.filter(col("__t")).select(col("__q").as("__qt")),
        lit(true), "left")
      .join(pt.filter(!col("__t")).select(col("__q").as("__qc")),
        lit(true), "left")
      .join(pickD(alpha / 2, "__lo"), lit(true), "left")
      .join(pickD(1.0 - alpha / 2, "__hi").drop("__nb"), lit(true), "left")
      .select(col("n_treat"), col("n_ctrl"), lit(p).as("q"),
        round((col("__qt") - col("__qc")).cast("double") / lit(sc)
          + lit(1e-9), 6).as("qte"),
        coalesce(col("__nb"), lit(0L)).as("n_boot"),
        round(col("__lo").cast("double") / lit(sc) + lit(1e-9), 6)
          .as("ci_lo"),
        round(col("__hi").cast("double") / lit(sc) + lit(1e-9), 6)
          .as("ci_hi"))
  }
}
