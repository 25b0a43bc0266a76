package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.functional.MayFail

/** Regularize irregular event streams onto a fixed time grid — the
  * resample/gap-fill primitive behind rate monitoring, training-data
  * freshness dashboards, and any model feature that assumes one row per
  * (entity, interval).
  */
object TimeSeries {

  /** Aggregate events into fixed `bucketSec` buckets AND emit every
    * bucket of each key's [first, last] span — empty buckets
    * materialize with `n = 0` and a `fill`-policy value:
    *
    *  - `"zero"`  — value 0.0 (rates, counts)
    *  - `"null"`  — value NULL (gauges where absence ≠ zero)
    *  - `"ffill"` — last non-empty bucket's value carries forward
    *    (step-function state; the grid analog of [[AsOfJoin]] backward)
    *  - `"linear"` — gaps interpolate linearly between the surrounding
    *    non-empty buckets (gauges sampled irregularly). Every gap has
    *    both neighbors because the grid spans [first, last] cell.
    *
    * `how` aggregates `valueCol` within a bucket: `sum`, `avg`, `min`,
    * `max`, or `count`.
    *
    * Plan: one partial-agg shuffle to (key, bucket) cells, one tiny
    * span aggregate per key, a grid `explode(sequence(first, last))`
    * over the spans, and a left join of cells onto the grid (AQE picks
    * broadcast when the cell side is small). The grid volume is
    * span/bucketSec rows PER KEY — bound it by choosing `bucketSec`
    * against the expected span (a year of 1-second buckets is 31M rows
    * per key: pick minutes, not seconds, for long spans). The ffill
    * window is one in-partition pass per key over grid rows.
    *
    * Returns `(keyCols…, bucket_ts: timestamp, n: long, value)` —
    * deterministic: every output cell is a pure function of the data.
    */
  def gapFill(
      df: DataFrame,
      tsCol: String,
      keyCols: Seq[String],
      bucketSec: Long,
      valueCol: String,
      how: String = "sum",
      fill: String = "zero"
  ): MayFail[DataFrame] = MayFail {
    require(bucketSec > 0, s"bucketSec must be positive: $bucketSec")
    require(keyCols.nonEmpty, "keyCols must name at least one key column")
    require(Seq("sum", "avg", "min", "max", "count").contains(how),
      s"how must be sum | avg | min | max | count: $how")
    require(Seq("zero", "null", "ffill", "linear").contains(fill),
      s"fill must be zero | null | ffill | linear: $fill")
    val keys = keyCols.map(col)
    val bucket = (floor(col(tsCol).cast("long") / bucketSec) * bucketSec)
      .cast("long").as("__bucket")
    val aggVal = how match {
      case "sum"   => sum(col(valueCol).cast("double"))
      case "avg"   => avg(col(valueCol).cast("double"))
      case "min"   => min(col(valueCol).cast("double"))
      case "max"   => max(col(valueCol).cast("double"))
      case "count" => count(col(valueCol)).cast("double")
    }
    val cells = df.filter(col(tsCol).isNotNull)
      .select((keys :+ bucket :+ col(valueCol)): _*)
      .groupBy((keys :+ col("__bucket")): _*)
      .agg(count(lit(1)).as("n"), aggVal.as("__v"))
    val spans = cells.groupBy(keys: _*)
      .agg(min(col("__bucket")).as("__lo"), max(col("__bucket")).as("__hi"))
    val grid = spans.select((keys :+
      explode(sequence(col("__lo"), col("__hi"), lit(bucketSec)))
        .as("__bucket")): _*)
    val joined = grid.join(cells, keyCols :+ "__bucket", "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
    val valued = fill match {
      case "zero" => joined.withColumn("__v", coalesce(col("__v"), lit(0.0)))
      case "null" => joined
      case "ffill" =>
        val w = Window.partitionBy(keys: _*).orderBy(col("__bucket"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        joined.withColumn("__v", last(col("__v"), ignoreNulls = true).over(w))
      case "linear" =>
        // Both fills run over the SAME (key, bucket) sort — one shuffle,
        // two in-partition window passes, no second exchange.
        val wb = Window.partitionBy(keys: _*).orderBy(col("__bucket"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wf = Window.partitionBy(keys: _*).orderBy(col("__bucket"))
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        val cellB = when(col("__v").isNotNull, col("__bucket"))
        val prevV = last(col("__v"), ignoreNulls = true).over(wb)
        val prevB = last(cellB, ignoreNulls = true).over(wb)
        val nextV = first(col("__v"), ignoreNulls = true).over(wf)
        val nextB = first(cellB, ignoreNulls = true).over(wf)
        joined.withColumn("__v",
          when(col("__v").isNotNull, col("__v")).otherwise(
            prevV + (nextV - prevV) *
              ((col("__bucket") - prevB).cast("double") /
               (nextB - prevB).cast("double"))))
    }
    valued.select((keys :+
      timestamp_seconds(col("__bucket")).as("bucket_ts") :+
      col("n") :+ col("__v").as("value")): _*)
  }

  /** Trailing-window anomaly stats per key: for each row, the mean /
    * sample-stddev / count of the PRECEDING `window` rows (current row
    * excluded — leak-free, so the score is usable as a model feature or
    * an online alert threshold) and the z-score of the current value
    * against them. `z` is NULL until the trailing window holds ≥ 2
    * values or when it has zero variance.
    *
    * Adds `roll_mean, roll_std, roll_n, z`. One shuffle on the keys,
    * one in-partition sorted pass; the frame is `window` rows regardless
    * of data volume, so memory per task is O(window). Compose after
    * [[gapFill]] so "no data" buckets score as anomalies rather than
    * silently collapsing the window span.
    *
    * The stddev comes from exact sum / sum-of-squares frames (clamped at
    * 0) rather than `stddev_samp`: with integral inputs (e.g. cent- or
    * ×100-scaled values) every partial sum is exact, making the score
    * bit-deterministic across engines and partition layouts — the
    * two-pass-formula cancellation caveat applies only to values with
    * mean ≫ spread at full float precision.
    */
  def rollingStats(
      df: DataFrame,
      orderCol: String,
      keyCols: Seq[String],
      valueCol: String,
      window: Int
  ): MayFail[DataFrame] = MayFail {
    require(window >= 2, s"window must be >= 2 rows: $window")
    require(keyCols.nonEmpty, "keyCols must name at least one key column")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(orderCol))
      .rowsBetween(-window, -1)
    val v = col(valueCol).cast("double")
    val n = col("roll_n")
    val m2 = greatest(col("__s2") - col("__s") * col("__s") / n, lit(0.0))
    df.withColumn("__s", sum(v).over(w))
      .withColumn("__s2", sum(v * v).over(w))
      .withColumn("roll_n", count(v).over(w))
      .withColumn("roll_mean", when(n >= 1, col("__s") / n))
      .withColumn("roll_std", when(n >= 2, sqrt(m2 / (n - lit(1)))))
      .withColumn("z",
        when(n >= 2 && col("roll_std") > 0,
          (v - col("roll_mean")) / col("roll_std")))
      .drop("__s", "__s2")
  }

  /** STL-lite ADDITIVE seasonal decomposition per key over a REGULAR
    * series (feed [[gapFill]] output — one row per bucket, constant
    * spacing; phases are positional):
    *
    *  - `trend` — centered moving average over `period` rows (NULL
    *    where the window is incomplete: the first/last rows of each
    *    key, or any window containing a NULL value). Even periods
    *    center asymmetrically (⌊(p−1)/2⌋ before, the rest after).
    *  - `seasonal` — the classical period-average method (the
    *    decomposition statsmodels `seasonal_decompose` implements):
    *    per-phase mean of the detrended values, re-centered so the
    *    period's seasonal components sum to zero.
    *  - `residual` — `value − trend − seasonal` (NULL where trend is).
    *
    * Determinism: with integral inputs (×100 convention) the window
    * sums and the per-phase numerators (`v·period − window_sum`) are
    * exact integers, so `trend` and the raw phase means are
    * bit-identical across engines; only the re-centering term sums
    * ≤`period` doubles (χ²-tier ulp noise — round gate comparisons
    * with the 1e-9 tie-shift).
    *
    * Plan: ONE exchange on the keys drives the row-number and
    * moving-average windows (in-partition passes over the same sort),
    * then a partial-agg shuffle to the tiny (key, phase) frame, a
    * key-level re-center reduction, and a broadcast-scale join back.
    * Grid volume is rows-per-key — the [[gapFill]] scale posture.
    *
    * Adds `phase: int, trend, seasonal, residual: double`.
    */
  def seasonalDecompose(
      df: DataFrame,
      orderCol: String,
      keyCols: Seq[String],
      valueCol: String,
      period: Int
  ): MayFail[DataFrame] = MayFail {
    require(period >= 2, s"period must be >= 2: $period")
    require(keyCols.nonEmpty, "keyCols must name at least one key column")
    val keys = keyCols.map(col)
    val before = (period - 1) / 2
    val after = period - 1 - before
    val wOrd = Window.partitionBy(keys: _*).orderBy(col(orderCol))
    val wTrend = wOrd.rowsBetween(-before, after)
    val base = df
      .withColumn("__v", col(valueCol).cast("double"))
      .withColumn("phase",
        pmod(row_number().over(wOrd) - 1, lit(period)).cast("int"))
      .withColumn("__wn", count(col("__v")).over(wTrend))
      .withColumn("__ws", sum(col("__v")).over(wTrend))
      .withColumn("trend",
        when(col("__wn") === period, col("__ws") / period))
      // detrended ×period: integral inputs keep this an exact integer
      .withColumn("__dnum",
        when(col("trend").isNotNull,
          col("__v") * period - col("__ws")))
    val phaseAvg = base.filter(col("__dnum").isNotNull)
      .groupBy((keys :+ col("phase")): _*)
      .agg(sum(col("__dnum")).as("__snum"), count(lit(1)).as("__sn"))
      .withColumn("__sraw",
        col("__snum") / (col("__sn") * lit(period.toDouble)))
    val centers = phaseAvg.groupBy(keys: _*)
      .agg((sum(col("__sraw")) / count(lit(1))).as("__center"))
    val seasonal = phaseAvg.join(centers, keyCols)
      .select((keys :+ col("phase") :+
        (col("__sraw") - col("__center")).as("seasonal")): _*)
    base.join(seasonal, keyCols :+ "phase", "left")
      .withColumn("residual", col("__v") - col("trend") - col("seasonal"))
      .drop("__v", "__wn", "__ws", "__dnum")
  }

  /** Two-sided CUSUM change-point scores per key:
    * `hi_t = max(0, hi_(t-1) + v_t − target − slack)` and
    * `lo_t = min(0, lo_(t-1) + v_t − target + slack)` — the classic
    * drift detector: `cusum_hi` grows under a sustained upward shift
    * beyond `slack`, `cusum_lo` falls under a downward one, and both
    * reset toward 0 under in-control data. Alert on |score| crossing a
    * threshold h of your choice.
    *
    * Like [[ewma]], the recursion needs the previous OUTPUT, so this is
    * a sequential in-partition scan: repartition on keys, sort, one
    * pass carrying two doubles per key — O(1) memory, any key length.
    * NULL values leave the state unchanged and emit the current scores.
    * With integral inputs (×100 convention) every max/min/add step is
    * exact, so scores are bit-deterministic.
    *
    * Adds `cusum_hi, cusum_lo: double`.
    */
  def cusum(
      df: DataFrame,
      orderCol: String,
      keyCols: Seq[String],
      valueCol: String,
      target: Double,
      slack: Double
  ): MayFail[DataFrame] = MayFail {
    require(slack >= 0.0, s"slack must be >= 0: $slack")
    require(keyCols.nonEmpty, "keyCols must name at least one key column")
    val schema = df.schema
    val out = schema.add("cusum_hi", DoubleType, nullable = true)
      .add("cusum_lo", DoubleType, nullable = true)
    val kIdx = keyCols.map(schema.fieldIndex)
    val vIdx = schema.fieldIndex(valueCol)
    val keys = keyCols.map(col)
    val sorted = df.repartition(keys: _*)
      .sortWithinPartitions((keys :+ col(orderCol)): _*)
    sorted.mapPartitions { it =>
      var curKey: Seq[Any] = null
      var hi = 0.0
      var lo = 0.0
      it.map { r =>
        val k = kIdx.map(r.get)
        if (k != curKey) { curKey = k; hi = 0.0; lo = 0.0 }
        r.get(vIdx) match {
          case null => ()
          case n: Number =>
            val v = n.doubleValue()
            hi = math.max(0.0, hi + v - target - slack)
            lo = math.min(0.0, lo + v - target + slack)
        }
        Row.fromSeq(r.toSeq :+ hi :+ lo)
      }
    }(Encoders.row(out))
  }

  /** Lagged cross-correlation between two keys' bucketed series:
    * Pearson r of (A at bucket t, B at bucket t + lag·bucketSec) for
    * every lag in −maxLag…maxLag — "does A lead B, and by how much"
    * (the peak-|r| lag). Buckets are co-observed inner alignments of
    * each side's aggregated cells; zero-fill upstream with [[gapFill]]
    * when absence should count as 0.
    *
    * Returns `(lag: int, n: bigint, r: double)`, one row per lag, NULL
    * `r` on degenerate overlaps. `keyA == keyB` gives the
    * AUTOCORRELATION function (lag 0 ≡ 1) — seasonality shows up as
    * peaks at the period's lag.
    *
    * Plan: one partial-agg shuffle to each side's (bucket, sum) cells,
    * a lag-exploded join (2·maxLag+1 slim copies of the A side — the
    * documented fan-out), and per-lag moment sums. With integral (×100)
    * values every moment is exact → bit-deterministic r.
    */
  def crossCorrelation(
      df: DataFrame,
      tsCol: String,
      keyCol: String,
      valueCol: String,
      keyA: String,
      keyB: String,
      bucketSec: Long,
      maxLag: Int
  ): MayFail[DataFrame] = MayFail {
    require(bucketSec > 0, s"bucketSec must be positive: $bucketSec")
    require(maxLag >= 0, s"maxLag must be >= 0: $maxLag")
    val bucket = (floor(col(tsCol).cast("long") / bucketSec) * bucketSec)
      .cast("long").as("__b")
    def cells(key: String, out: String) = df
      .filter(col(tsCol).isNotNull && col(valueCol).isNotNull &&
        col(keyCol) === lit(key))
      .select(bucket, col(valueCol).cast("double").as(out))
      .groupBy("__b").agg(sum(col(out)).as(out))
    val ca = cells(keyA, "__va")
    val cb = cells(keyB, "__vb")
    val lags = df.sparkSession.range(-maxLag.toLong, maxLag + 1L)
      .select(col("id").cast("int").as("lag"))
    val aligned = ca.crossJoin(broadcast(lags))
      .withColumn("__tb", col("__b") + col("lag") * bucketSec)
      .join(cb.withColumnRenamed("__b", "__tb"), Seq("__tb"))
    val m = aligned.groupBy("lag").agg(
      count(lit(1)).as("n"),
      sum(col("__va")).as("__sx"), sum(col("__vb")).as("__sy"),
      sum(col("__va") * col("__vb")).as("__sxy"),
      sum(col("__va") * col("__va")).as("__sxx"),
      sum(col("__vb") * col("__vb")).as("__syy"))
    val vx = col("n") * col("__sxx") - col("__sx") * col("__sx")
    val vy = col("n") * col("__syy") - col("__sy") * col("__sy")
    m.withColumn("r",
        when(col("n") >= 2 && vx > 0 && vy > 0,
          (col("n") * col("__sxy") - col("__sx") * col("__sy")) /
            sqrt(vx * vy)))
      .select("lag", "n", "r")
  }

  /** Per-key least-squares linear trend: slope (value units per
    * second) and intercept (fitted value at the key's FIRST
    * observation) from the product-moment sums. "Is this metric
    * drifting, and how fast" — the long-horizon companion of the
    * [[cusum]] step detector.
    *
    * Returns `(keyCols…, n: bigint, slope, intercept)` — NULL when
    * n < 2 or the time values are all equal.
    *
    * Plan: one exchange on the keys; the per-key time origin shift
    * (`t − min(t)`, a window over that same exchange) keeps `Σt²`
    * within double-exact range for spans up to years, so with integral
    * values (×100 convention) every moment is exact and the fit is
    * bit-deterministic. One partial-agg shuffle for the five sums.
    */
  def trend(
      df: DataFrame,
      tsCol: String,
      keyCols: Seq[String],
      valueCol: String
  ): MayFail[DataFrame] = MayFail {
    require(keyCols.nonEmpty, "keyCols must name at least one key column")
    val keys = keyCols.map(col)
    val w = Window.partitionBy(keys: _*)
    val base = df.filter(col(tsCol).isNotNull && col(valueCol).isNotNull)
      .withColumn("__sec", col(tsCol).cast("long"))
      .withColumn("__t", (col("__sec") - min(col("__sec")).over(w)).cast("double"))
      .withColumn("__v", col(valueCol).cast("double"))
    val agg = base.groupBy(keys: _*).agg(
      count(lit(1)).as("n"),
      sum(col("__t")).as("__st"),
      sum(col("__v")).as("__sv"),
      sum(col("__t") * col("__v")).as("__stv"),
      sum(col("__t") * col("__t")).as("__stt"))
    val den = col("n") * col("__stt") - col("__st") * col("__st")
    agg
      .withColumn("slope", when(col("n") >= 2 && den > 0,
        (col("n") * col("__stv") - col("__st") * col("__sv")) / den))
      .withColumn("intercept", when(col("slope").isNotNull,
        (col("__sv") - col("slope") * col("__st")) / col("n")))
      .select((keys :+ col("n") :+ col("slope") :+ col("intercept")): _*)
  }

  /** Exponentially-weighted moving average per key, the recursive
    * (non-adjusted, pandas `ewm(adjust=false)`) form:
    * `s_0 = v_0; s_t = alpha * v_t + (1 - alpha) * s_(t-1)`.
    *
    * Recursion doesn't window-express (each row needs the previous
    * OUTPUT), so this is the one genuinely sequential scan in the
    * library: repartition on the keys, sort within partitions by
    * (keys, order), and a single mapPartitions pass carrying (key,
    * state). Linear, streaming, no per-key materialization — a key's
    * rows are consumed one at a time, so a 10⁹-row key costs memory
    * O(1). NULL values don't update state: they emit the current
    * smoothed value (or NULL before the first observation).
    *
    * Adds `ewma: double`.
    */
  def ewma(
      df: DataFrame,
      orderCol: String,
      keyCols: Seq[String],
      valueCol: String,
      alpha: Double
  ): MayFail[DataFrame] = MayFail {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1]: $alpha")
    require(keyCols.nonEmpty, "keyCols must name at least one key column")
    val schema = df.schema
    val out = schema.add("ewma", DoubleType, nullable = true)
    val kIdx = keyCols.map(schema.fieldIndex)
    val vIdx = schema.fieldIndex(valueCol)
    val keys = keyCols.map(col)
    val sorted = df.repartition(keys: _*)
      .sortWithinPartitions((keys :+ col(orderCol)): _*)
    val beta = 1.0 - alpha
    sorted.mapPartitions { it =>
      var curKey: Seq[Any] = null
      var s = 0.0
      var seeded = false
      it.map { r =>
        val k = kIdx.map(r.get)
        if (k != curKey) { curKey = k; seeded = false }
        val vAny = r.get(vIdx)
        val sm: Any =
          if (vAny == null) { if (seeded) s else null }
          else {
            val v = vAny match {
              case d: Double => d
              case n: Number => n.doubleValue()
            }
            s = if (seeded) alpha * v + beta * s else v
            seeded = true
            s
          }
        Row.fromSeq(r.toSeq :+ sm)
      }
    }(Encoders.row(out))
  }

  /** Brown's DOUBLE exponential smoothing per key (level + trend — the
    * [[ewma]] that follows a drifting series without lag bias): two
    * cascaded EWMAs `s1_t = α·v_t + (1−α)·s1_(t−1)` and
    * `s2_t = α·s1_t + (1−α)·s2_(t−1)` (both seeded at `v_1`), from
    * which `level = 2·s1 − s2`, `trend = α/(1−α)·(s1 − s2)`, and the
    * one-step-ahead `forecast = level + trend` — compare the forecast
    * against the next observation for a drift-aware anomaly score.
    *
    * The cascade form (Brown 1956) is chosen over Holt's coupled
    * (level, trend) recursion deliberately: each stage is a SCALAR
    * fold, so external SQL replays it exactly with the same
    * `list_reduce` device as [[ewma]]'s oracle — a coupled struct
    * accumulator is NOT faithfully replayable (DuckDB's struct-state
    * list_reduce evaluates fields against a mutated buffer on
    * non-first fold steps).
    *
    * The same sequential in-partition scan as [[ewma]]: repartition on
    * keys, in-partition sort, one pass carrying (s1, s2) per key —
    * O(1) memory, a 10⁹-row key streams. NULL values hold state and
    * emit the current outputs (NULL before the first observation).
    * Both engines execute the identical IEEE op sequence, so outputs
    * are bit-reproducible.
    *
    * Adds `holt_level, holt_trend, holt_forecast: double`.
    */
  def holt(
      df: DataFrame,
      orderCol: String,
      keyCols: Seq[String],
      valueCol: String,
      alpha: Double = 0.5
  ): MayFail[DataFrame] = MayFail {
    require(alpha > 0.0 && alpha < 1.0, s"alpha must be in (0, 1): $alpha")
    require(keyCols.nonEmpty, "keyCols must name at least one key column")
    val schema = df.schema
    val out = schema.add("holt_level", DoubleType, nullable = true)
      .add("holt_trend", DoubleType, nullable = true)
      .add("holt_forecast", DoubleType, nullable = true)
    val kIdx = keyCols.map(schema.fieldIndex)
    val vIdx = schema.fieldIndex(valueCol)
    val keys = keyCols.map(col)
    val sorted = df.repartition(keys: _*)
      .sortWithinPartitions((keys :+ col(orderCol)): _*)
    val a1 = 1.0 - alpha
    val c = alpha / (1.0 - alpha)
    sorted.mapPartitions { it =>
      var curKey: Seq[Any] = null
      var s1 = 0.0
      var s2 = 0.0
      var seeded = false
      it.map { r =>
        val k = kIdx.map(r.get)
        if (k != curKey) { curKey = k; seeded = false }
        val vAny = r.get(vIdx)
        val tail: Seq[Any] =
          if (vAny == null) {
            if (seeded)
              Seq(2.0 * s1 - s2, c * (s1 - s2),
                (2.0 * s1 - s2) + c * (s1 - s2))
            else Seq(null, null, null)
          } else {
            val v = vAny match {
              case d: Double => d
              case n: Number => n.doubleValue()
            }
            if (seeded) {
              s1 = alpha * v + a1 * s1
              s2 = alpha * s1 + a1 * s2
            } else { s1 = v; s2 = v; seeded = true }
            val level = 2.0 * s1 - s2
            val trend = c * (s1 - s2)
            Seq(level, trend, level + trend)
          }
        Row.fromSeq(r.toSeq ++ tail)
      }
    }(Encoders.row(out))
  }

  /** Forecast backtest against the two standard BASELINES — naive
    * (last training value) and seasonal-naive (same phase, last
    * training cycle): hold out each key's final `horizon` points,
    * forecast them from the training prefix, and score sMAPE and MASE
    * (Hyndman & Koehler 2006). Any model worth deploying must beat
    * these numbers; MASE < 1 means "better than the naive forecast
    * that MASE scales by" — the honest cross-series comparison.
    *
    *   sMAPE = mean 2|y−ŷ| / (|y|+|ŷ|)   (0-denominator terms → 0)
    *   MASE  = mean|y−ŷ| / scale, scale = train mean |y_t − y_{t−g}|
    *           (g = 1 for naive, `period` for seasonal-naive)
    *
    * Determinism: ×`scale`-integral values make every |error| an exact
    * integer, so each MASE is a chain of IEEE divisions of exact
    * integers — gated UNROUNDED; sMAPE sums per-row float ratios —
    * χ²-tier, round when gating. NULL MASE when the train scale is 0
    * (constant train series); keys with fewer than
    * `horizon + period + 1` points emit nothing.
    *
    * Returns one row per key: `(keyCols…, n_train, horizon,
    * smape_naive, mase_naive, smape_snaive, mase_snaive)`.
    *
    * Plan: per-key windows for the split + one index equi-join for the
    * seasonal lookup; keys are the parallelism.
    */
  def forecastBacktest(
      df: DataFrame,
      keyCols: Seq[String],
      orderCol: String,
      valueCol: String,
      period: Int,
      horizon: Int,
      scale: Long = 100L
  ): MayFail[DataFrame] = MayFail {
    require(keyCols.nonEmpty, "keyCols must name at least one key column")
    require(period >= 1, s"period must be >= 1: $period")
    require(horizon >= 1, s"horizon must be >= 1: $horizon")
    require(scale >= 1, s"scale must be >= 1: $scale")
    val keys = keyCols.map(col)
    val wOrd = Window.partitionBy(keys: _*).orderBy(col("__o"))
    val wKey = Window.partitionBy(keys: _*)
    val base = df
      .filter(col(orderCol).isNotNull && col(valueCol).isNotNull)
      .select(keys :+ col(orderCol).as("__o")
        :+ round(col(valueCol) * scale).cast("long").as("__v"): _*)
      .withColumn("__i", row_number().over(wOrd).cast("long"))
      .withColumn("__n", count(lit(1)).over(wKey))
      .filter(col("__n") >= horizon + period + 1)
      .withColumn("__t", col("__n") - horizon)
    // training scales: mean |lag-g| differences within the train prefix
    val train = base.filter(col("__i") <= col("__t"))
    def trainScale(g: Int, out: String): DataFrame = train
      .withColumn("__lag", lag(col("__v"), g).over(wOrd))
      .filter(col("__lag").isNotNull)
      .groupBy(keys: _*)
      .agg((sum(abs(col("__v") - col("__lag"))).cast("double")
        / count(lit(1))).as(out))
    // forecasts: naive = train-final value; seasonal-naive = the value
    // at i − period·⌈(i−T)/period⌉ (last observed same-phase point)
    val lastTrain = train.filter(col("__i") === col("__t"))
      .select(keys :+ col("__v").as("__fnaive"): _*)
    val test = base.filter(col("__i") > col("__t"))
    val sIdx = col("__i") - lit(period.toLong) *
      ceil((col("__i") - col("__t")).cast("double") / period).cast("long")
    val sLookup = base.select(keys :+ col("__i").as("__si")
      :+ col("__v").as("__fsnaive"): _*)
    val joined = test
      .withColumn("__si", sIdx)
      .join(lastTrain, keyCols)
      .join(sLookup, keyCols :+ "__si")
    def smapeTerm(f: Column): Column = {
      val num = abs(col("__v") - f).cast("double") * 2.0
      val den = (abs(col("__v")) + abs(f)).cast("double")
      when(den === 0.0, lit(0.0)).otherwise(num / den)
    }
    val perKey = joined.groupBy(keys: _*)
      .agg(
        max(col("__t")).as("n_train"),
        count(lit(1)).as("horizon"),
        (sum(smapeTerm(col("__fnaive"))) / count(lit(1)))
          .as("smape_naive"),
        (sum(abs(col("__v") - col("__fnaive"))).cast("double")
          / count(lit(1))).as("__mae_n"),
        (sum(smapeTerm(col("__fsnaive"))) / count(lit(1)))
          .as("smape_snaive"),
        (sum(abs(col("__v") - col("__fsnaive"))).cast("double")
          / count(lit(1))).as("__mae_s"))
    perKey
      .join(trainScale(1, "__sc1"), keyCols)
      .join(trainScale(period, "__scp"), keyCols)
      .select(keys ++ Seq(col("n_train"), col("horizon"),
        col("smape_naive"),
        when(col("__sc1") > 0.0, col("__mae_n") / col("__sc1"))
          .as("mase_naive"),
        col("smape_snaive"),
        when(col("__scp") > 0.0, col("__mae_s") / col("__scp"))
          .as("mase_snaive")): _*)
  }

  /** Holt–Winters-style additive SEASONAL smoothing — the composition
    * this library's devices were built for: the [[seasonalDecompose]]
    * period-mean seasonal indices remove the cycle, [[holt]]'s Brown
    * cascade smooths the deseasonalized series into level + trend, and
    * the index adds back for the fitted/one-step value. Use over
    * [[holt]] whenever the series has a known cycle (hour-of-day,
    * day-of-week) — un-deseasonalized smoothing chases the cycle as if
    * it were trend.
    *
    * Deviation from textbook triple exponential smoothing, by design:
    * the seasonal indices are FIXED period means, not recursively
    * updated with a third γ smoothing constant — the coupled (level,
    * trend, season) recursion is not SQL-replayable (see [[holt]]'s
    * scaladoc on the DuckDB struct-fold defect), while this cascade
    * replays exactly with the proven q233 + q241 oracle devices. For
    * slowly-drifting seasonality, re-fit on a rolling window.
    *
    * Adds `phase: int, seasonal, hw_level, hw_trend, hw_fitted:
    * double` — `hw_fitted = level + trend + seasonal(phase)` is the
    * in-sample one-step value. Rows whose phase lacks a seasonal index
    * (series shorter than ~2 periods) carry NULLs through.
    *
    * Plan: the decompose windows + one key exchange for the sequential
    * cascade — nothing global. Determinism: the seasonal index is
    * χ²-tier (one ≤period-element float mean); the cascade decays that
    * noise geometrically — round under the tie-shift when gating.
    */
  def holtWinters(
      df: DataFrame,
      orderCol: String,
      keyCols: Seq[String],
      valueCol: String,
      period: Int,
      alpha: Double = 0.5
  ): MayFail[DataFrame] =
    for {
      sd <- seasonalDecompose(df, orderCol, keyCols, valueCol, period)
      des = sd
        .withColumn("__des", col(valueCol).cast("double") - col("seasonal"))
        .drop("trend", "residual")
      sm <- holt(des, orderCol, keyCols, "__des", alpha)
    } yield sm
      .withColumn("hw_fitted", col("holt_forecast") + col("seasonal"))
      .withColumnRenamed("holt_level", "hw_level")
      .withColumnRenamed("holt_trend", "hw_trend")
      .drop("__des", "holt_forecast")

  /** Single most-likely MEAN-SHIFT changepoint per key — the binary-
    * segmentation base step (Scott & Knott's split; also PELT's unit
    * move): the split `t` that maximizes the between-segment SSE
    * reduction `S_t²/t + (S−S_t)²/(n−t) − S²/n` over the ts-ordered
    * series. Run it once for "did the metric jump, and when"; recurse
    * on the halves (driver-side, depth-bounded) for multiple breaks.
    *
    * Determinism (the CUSUM/q214 discipline): values enter as exact
    * ×`scale` integers, so every prefix sum is an exact BIGINT and each
    * candidate's gain is a fixed sequence of IEEE divisions of exact
    * integers — bit-identical across engines, argmax-safe with the
    * `(gain desc, t asc)` tie-break, gated UNROUNDED. Squares of
    * per-key scaled sums must stay under 2^63 (|Σv·scale| < 3.0e9 per
    * key) — both engines raise on overflow (ANSI), never silently
    * wrap.
    *
    * `minSegment` bounds both segment lengths; keys with fewer than
    * `2·minSegment` points emit nothing.
    *
    * Returns one row per key: `(keyCols…, n, t_index, split_ts,
    * mean_left, mean_right, gain)` — `t_index` = last point of the
    * left segment (1-based), `gain` in squared value units.
    *
    * Plan: per-key ordered windows (prefix sums) + one per-key rank —
    * one hash exchange on the key, no joins, no driver state. Frames
    * are series-sized per key.
    */
  def changepoint(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      valueCol: String,
      scale: Long = 100L,
      minSegment: Int = 2
  ): MayFail[DataFrame] = MayFail {
    require(keyCols.nonEmpty, "keyCols must name at least one key column")
    require(scale >= 1, s"scale must be >= 1: $scale")
    require(minSegment >= 1, s"minSegment must be >= 1: $minSegment")
    val keys = keyCols.map(col)
    val vInt = round(col(valueCol) * scale).cast("long")
    val base = df
      .filter(col(tsCol).isNotNull && col(valueCol).isNotNull)
      .select(keys :+ col(tsCol).as("__ts") :+ vInt.as("__v"): _*)
    val wOrd = Window.partitionBy(keys: _*).orderBy(col("__ts"), col("__v"))
    val wKey = Window.partitionBy(keys: _*)
    val staged = base
      .withColumn("__i", row_number().over(wOrd).cast("long"))
      .withColumn("__s", sum(col("__v")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__n", count(lit(1)).over(wKey))
      .withColumn("__tot", sum(col("__v")).over(wKey))
    val cand = staged
      .filter(col("__i") >= minSegment && col("__i") <= col("__n") - minSegment)
      .withColumn("__gain",
        // squares in DOUBLE from the first factor: the Long prefix sums
        // reach n*max*scale, and their squares ANSI-throw past ~3e9
        // (300k rows/key at value~100, scale=100); exact below 2^53
        col("__s").cast("double") * col("__s") / col("__i")
          + ((col("__tot") - col("__s")).cast("double") *
              (col("__tot") - col("__s"))) / (col("__n") - col("__i"))
          - col("__tot").cast("double") * col("__tot") / col("__n"))
    val pick = Window.partitionBy(keys: _*)
      .orderBy(col("__gain").desc, col("__i"))
    val sc = lit(scale.toDouble)
    cand.withColumn("__r", row_number().over(pick))
      .filter(col("__r") === 1)
      .select(keys ++ Seq(
        col("__n").as("n"), col("__i").as("t_index"),
        col("__ts").as("split_ts"),
        (col("__s").cast("double") / (col("__i") * sc)).as("mean_left"),
        ((col("__tot") - col("__s")).cast("double")
          / ((col("__n") - col("__i")) * sc)).as("mean_right"),
        (col("__gain") / (sc * sc)).as("gain")): _*)
  }

  /** Theil–Sen robust slope per key: the MEDIAN of all pairwise slopes
    * `(v_j − v_i)/(t_j − t_i)` — the standard robust alternative to
    * [[trend]]'s OLS when outliers or heavy tails would drag the
    * least-squares fit (breakdown point 29%, vs 0 for OLS).
    *
    * Pairing is O(k²) PER KEY — bounded by `maxPoints` (each key keeps
    * its latest `maxPoints` rows by ts before pairing; dropped history
    * biases toward the recent regime, which is usually the one being
    * asked about). Keys parallelize; a 10⁶-key table with 1000-point
    * series is 5·10⁸ pair rows through one equi-join on the key — fine;
    * one key with 10⁶ points is not — cap it.
    *
    * Determinism: values ×`scale` and epoch-microsecond timestamps are
    * exact integers, each slope is one IEEE division of exact doubles
    * (slopes in value-units per SECOND: `scale` must divide 10⁶), and
    * the median picks by rank over the slope order — bit-identical
    * across engines, gated unrounded. Pairs with equal timestamps are
    * excluded (undefined slope).
    *
    * Returns one row per key: `(keyCols…, n_points, n_pairs, slope)`;
    * keys with fewer than 2 distinct-ts points emit nothing.
    */
  def theilSen(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      valueCol: String,
      scale: Long = 100L,
      maxPoints: Int = 1000
  ): MayFail[DataFrame] = MayFail {
    require(keyCols.nonEmpty, "keyCols must name at least one key column")
    require(scale >= 1 && 1000000L % scale == 0,
      s"scale must divide 1e6 for exact per-second slopes: $scale")
    require(maxPoints >= 2, s"maxPoints must be >= 2: $maxPoints")
    val keys = keyCols.map(col)
    val base = df
      .filter(col(tsCol).isNotNull && col(valueCol).isNotNull)
      .select(keys :+ unix_micros(col(tsCol)).as("__t")
        :+ round(col(valueCol) * scale).cast("long").as("__v"): _*)
    val recent = Window.partitionBy(keys: _*)
      .orderBy(col("__t").desc, col("__v").desc)
    val pts = base.withColumn("__r", row_number().over(recent))
      .filter(col("__r") <= maxPoints)
    val a = pts.select(keys :+ col("__t").as("__ta") :+ col("__v").as("__va")
      :+ col("__r").as("__ra"): _*)
    val b = pts.select(keys :+ col("__t").as("__tb") :+ col("__v").as("__vb")
      :+ col("__r").as("__rb"): _*)
    val perSec = lit(1000000.0 / scale)
    val slopes = a.join(b, keyCols)
      .filter(col("__ra") < col("__rb") && col("__ta") =!= col("__tb"))
      .select(keys :+
        (((col("__vb") - col("__va")).cast("double") * perSec)
          / (col("__tb") - col("__ta"))).as("__slope"): _*)
    val wKey = Window.partitionBy(keys: _*)
    val ordered = slopes
      .withColumn("__m", count(lit(1)).over(wKey))
      .withColumn("__i", row_number().over(
        Window.partitionBy(keys: _*).orderBy(col("__slope"))))
    val nPts = pts.groupBy(keys: _*).agg(count(lit(1)).as("n_points"))
    ordered
      .filter(col("__i") === floor((col("__m") + 1) / 2).cast("long")
        || col("__i") === floor((col("__m") + 2) / 2).cast("long"))
      .groupBy(keys: _*)
      .agg(max(col("__m")).as("n_pairs"), avg(col("__slope")).as("slope"))
      .join(nPts, keyCols)
      .select(keys ++ Seq(col("n_points"), col("n_pairs"), col("slope")): _*)
  }

  /** Mann–Kendall trend test per key — the significance companion to
    * [[theilSen]] (Sen gives the slope, MK says whether a monotone
    * trend exists at all; the standard pairing for environmental /
    * metric time series). S = Σ_{tᵢ<tⱼ} sign(vⱼ − vᵢ); pairs with
    * EQUAL timestamps are excluded (ordering undefined — the
    * [[theilSen]] convention). Variance uses the standard tie
    * correction `Var = [n(n−1)(2n+5) − Σ t(t−1)(2t+5)]/18` over the
    * value-tie runs, and z the ±1 continuity correction.
    *
    * Returns one row per key: `(keys…, n_points, s: bigint, var_s, z:
    * double)` — NULL z when Var = 0 (all values tie) or n < 2.
    *
    * Same scale posture as [[theilSen]]: values ×`scale` to exact
    * longs so S and the variance moments are exact integers (S is an
    * integer, Var an exact-int ratio, z one IEEE sqrt/divide — the
    * strongest determinism tier); the per-key quadratic is capped at
    * `maxPoints` most-recent points (driver-checked contract, the
    * caller downsamples longer series).
    */
  def mannKendall(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      valueCol: String,
      scale: Long = 100L,
      maxPoints: Int = 1000
  ): MayFail[DataFrame] = MayFail {
    require(keyCols.nonEmpty, "keyCols must name at least one key column")
    require(maxPoints >= 2, s"maxPoints must be >= 2: $maxPoints")
    val keys = keyCols.map(col)
    val base = df
      .filter(col(tsCol).isNotNull && col(valueCol).isNotNull)
      .select(keys :+ unix_micros(col(tsCol)).as("__t")
        :+ round(col(valueCol) * scale).cast("long").as("__v"): _*)
    val recent = Window.partitionBy(keys: _*)
      .orderBy(col("__t").desc, col("__v").desc)
    val pts = base.withColumn("__r", row_number().over(recent))
      .filter(col("__r") <= maxPoints)
    val a = pts.select(keys :+ col("__t").as("__ta") :+ col("__v").as("__va")
      :+ col("__r").as("__ra"): _*)
    val b = pts.select(keys :+ col("__t").as("__tb") :+ col("__v").as("__vb")
      :+ col("__r").as("__rb"): _*)
    // each unordered pair once (rank order), signed in TIME order
    val sPerKey = a.join(b, keyCols)
      .filter(col("__ra") < col("__rb") && col("__ta") =!= col("__tb"))
      .select(keys :+
        (signum(col("__vb") - col("__va")) *
          when(col("__tb") > col("__ta"), 1).otherwise(-1))
          .cast("long").as("__sgn"): _*)
      .groupBy(keys: _*)
      .agg(sum(col("__sgn")).as("s"))
    val tieMoments = pts.groupBy(keys :+ col("__v"): _*)
      .agg(count(lit(1)).as("__t"))
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("__kvals"),
        sum(col("__t") * (col("__t") - 1) * (col("__t") * 2 + 5)).as("__tc"),
        sum(col("__t")).as("n_points"))
    tieMoments.join(sPerKey, keyCols, "left")
      .withColumn("s", coalesce(col("s"), lit(0L)))
      .withColumn("var_s",
        (col("n_points") * (col("n_points") - 1) *
          (col("n_points") * 2 + 5) - col("__tc")).cast("double") /
          lit(18.0))
      .select(keys ++ Seq(col("n_points"), col("s"), col("var_s"),
        when(col("var_s") > 0,
          when(col("s") > 0, (col("s") - 1).cast("double"))
            .when(col("s") < 0, (col("s") + 1).cast("double"))
            .otherwise(lit(0.0)) / sqrt(col("var_s"))).as("z")): _*)
  }

  /** Seasonality / trend strength per key (Hyndman & Athanasopoulos,
    * FPP3 §4.4) — the "is this series worth a seasonal model" readout
    * on top of [[seasonalDecompose]]:
    * `F_s = max(0, 1 − Var(R)/Var(S+R))` and
    * `F_t = max(0, 1 − Var(R)/Var(T+R))`, both in [0, 1], computed
    * over the rows where the decomposition is complete (trend
    * window full).
    *
    * Returns one row per key `(keyCols…, n_complete: bigint,
    * seasonal_strength, trend_strength: double)` — NULL strengths
    * when the corresponding denominator variance is 0 (constant
    * component).
    *
    * Plan: the [[seasonalDecompose]] plan plus ONE per-key
    * aggregation. Variances are float partial aggs (χ²-tier) — round
    * under the tie-shift when gating.
    */
  def seasonalStrength(
      df: DataFrame,
      orderCol: String,
      keyCols: Seq[String],
      valueCol: String,
      period: Int
  ): MayFail[DataFrame] = MayFail {
    val dec = seasonalDecompose(df, orderCol, keyCols, valueCol, period).get
    val keys = keyCols.map(col)
    dec.filter(col("residual").isNotNull)
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("n_complete"),
        var_pop(col("residual")).as("__vr"),
        var_pop(col("seasonal") + col("residual")).as("__vsr"),
        var_pop(col("trend") + col("residual")).as("__vtr"))
      .select(keys :+ col("n_complete") :+
        when(col("__vsr") > 0,
          greatest(lit(0.0), lit(1.0) - col("__vr") / col("__vsr")))
          .as("seasonal_strength") :+
        when(col("__vtr") > 0,
          greatest(lit(0.0), lit(1.0) - col("__vr") / col("__vtr")))
          .as("trend_strength"): _*)
  }

  /** Seasonal-aware anomaly flags — [[rollingStats]] z-scores fire on
    * every daily peak of a seasonal series; this one decomposes first
    * ([[seasonalDecompose]]) and scores the RESIDUAL against its
    * per-key median/MAD (the [[Quality.madOutliers]] robust z), so
    * only deviations from the expected seasonal shape flag.
    *
    * Adds `(trend, seasonal, residual, z, anomaly)` to `(keyCols…,
    * orderCol, value)` rows — `z` the Iglewicz–Hoaglin modified
    * z-score of the residual, ROUNDED at 9 (1e-12 shift) before the
    * threshold comparison (the boundary convention); rows with an
    * incomplete trend window (series edges) carry NULL z and
    * `anomaly = false`.
    *
    * Plan: the decomposition plan + two per-key DISTINCT-VALUE-grid
    * median passes (windows partitioned BY KEY) + one join back — no
    * global sorts.
    */
  def stlAnomaly(
      df: DataFrame,
      orderCol: String,
      keyCols: Seq[String],
      valueCol: String,
      period: Int,
      threshold: Double = 3.5
  ): MayFail[DataFrame] = MayFail {
    require(threshold > 0, s"threshold must be > 0: $threshold")
    val dec = seasonalDecompose(df, orderCol, keyCols, valueCol, period).get
    val keys = keyCols.map(col)
    def gridMedian(frame: DataFrame, vc: String, out: String): DataFrame = {
      val grid = frame.groupBy(keys :+ col(vc): _*)
        .agg(count(lit(1)).as("__t"))
      val upto = Window.partitionBy(keys: _*).orderBy(col(vc))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = grid.withColumn("__c", sum(col("__t")).over(upto))
        .withColumn("__n", sum(col("__t")).over(
          Window.partitionBy(keys: _*)))
      val r1 = expr("(__n + 1) div 2")
      val r2 = expr("__n div 2 + 1")
      val m1 = cum.filter(col("__c") >= r1 && col("__c") - col("__t") < r1)
        .select(keys :+ col(vc).as("__m1"): _*)
      val m2 = cum.filter(col("__c") >= r2 && col("__c") - col("__t") < r2)
        .select(keys :+ col(vc).as("__m2"): _*)
      m1.join(m2, keyCols)
        .select(keys :+ ((col("__m1") + col("__m2")) / 2).as(out): _*)
    }
    val comp = dec.filter(col("residual").isNotNull)
    val med = gridMedian(comp, "residual", "__med")
    val mad = gridMedian(
      comp.join(med, keyCols)
        .withColumn("__dev", abs(col("residual") - col("__med"))),
      "__dev", "__mad")
    dec.join(med, keyCols, "left").join(mad, keyCols, "left")
      .withColumn("z",
        when(col("residual").isNotNull && col("__mad") > 0,
          round(lit(0.6745) * (col("residual") - col("__med")) /
            col("__mad") + lit(1e-12), 9)))
      .withColumn("anomaly",
        coalesce(abs(col("z")) > threshold, lit(false)))
      .drop("__med", "__mad")
  }

  /** Page–Hinkley drift test per key — the sequential mean-shift
    * detector (Page 1954; the standard concept-drift monitor): with
    * running mean x̄_t, accumulate `m_t = Σ_{i≤t} (x_i − x̄_i − δ)` and
    * alarm when `m_t − min_{s≤t} m_s > λ`. The online companion to the
    * retrospective [[changepoint]] (changepoint finds WHERE a finished
    * series broke; Page–Hinkley flags WHEN a live one is drifting up).
    *
    * Adds `(ph_m, ph, alarm)` to `(keyCols…, orderCol, value)` rows —
    * `ph = m_t − min m`, `alarm` compares the ROUNDED (9-digit,
    * 1e-12-shift) ph against λ (the q260 boundary convention). δ and
    * λ are in VALUE units.
    *
    * Determinism: prefix sums of the ×`scale` values are exact longs;
    * each mean/term is one IEEE expression of them; the m-fold is a
    * sequential in-order float accumulation — the [[ewma]] tier,
    * replayable as a left fold. One exchange per key, three in-order
    * window passes, no joins.
    */
  def pageHinkley(
      df: DataFrame,
      keyCols: Seq[String],
      orderCol: String,
      valueCol: String,
      delta: Double = 0.0,
      lambda: Double = 50.0,
      scale: Long = 100L
  ): MayFail[DataFrame] = MayFail {
    require(keyCols.nonEmpty, "keyCols must name at least one key column")
    require(lambda > 0, s"lambda must be positive: $lambda")
    require(scale >= 1, s"scale must be >= 1: $scale")
    val keys = keyCols.map(col)
    val wOrd = Window.partitionBy(keys: _*).orderBy(col(orderCol))
    val run = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.filter(col(orderCol).isNotNull && col(valueCol).isNotNull)
      .select(keys :+ col(orderCol) :+
        round(col(valueCol) * scale).cast("long").as("__v"): _*)
      .withColumn("__t", row_number().over(wOrd))
      .withColumn("__s", sum(col("__v")).over(run))
      .withColumn("__term",
        col("__v").cast("double") - col("__s").cast("double") / col("__t")
          - lit(delta * scale))
      .withColumn("__m", sum(col("__term")).over(run))
      .withColumn("__min", min(col("__m")).over(run))
      .withColumn("ph_m", col("__m") / scale)
      .withColumn("ph", (col("__m") - col("__min")) / scale)
      .withColumn("alarm",
        round(col("ph") + lit(1e-12), 9) > lambda)
      .select(keys :+ col(orderCol) :+
        (col("__v").cast("double") / scale).as("value") :+
        col("ph_m") :+ col("ph") :+ col("alarm"): _*)
  }

  /** Collapse a (key, order, value) frame to one ARRAY row per key,
    * values in `orderCol` order — the series representation
    * [[dtwPairs]] and any whole-series kernel consume. `orderCol`
    * must be unique per key (duplicate order keys would make the
    * array order engine-dependent — enforced).
    *
    * Plan: one partial-agg shuffle; the sort happens INSIDE each
    * key's collected array (`array_sort` on (order, value) structs),
    * never as a global exchange. Arrays live in executor rows — keep
    * series lengths bounded (resample with [[gapFill]] first).
    */
  def toSeries(
      df: DataFrame,
      keyCols: Seq[String],
      orderCol: String,
      valueCol: String
  ): MayFail[DataFrame] = MayFail {
    require(keyCols.nonEmpty, "keyCols must name at least one key column")
    val keys = keyCols.map(col)
    val packed = df
      .filter(col(orderCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("n_points"),
        countDistinct(col(orderCol)).as("__no"),
        array_sort(collect_list(struct(col(orderCol).as("o"),
          col(valueCol).cast("double").as("v")))).as("__s"))
    packed
      .withColumn("series",
        when(col("n_points") === col("__no"),
          transform(col("__s"), x => x.getField("v")))
          .otherwise(raise_error(concat(lit("toSeries: duplicate "),
            lit(orderCol), lit(" within a key")))))
      .select(keys :+ col("n_points") :+ col("series"): _*)
  }

  /** All-pairs dynamic-time-warping distances between per-key series —
    * the alignment-tolerant similarity behind "which metrics move
    * together but shifted" and shapelet-style series dedup (Euclidean
    * distance punishes phase shifts; DTW warps time). Input is one
    * ARRAY row per key ([[toSeries]] output). `band` is the
    * Sakoe–Chiba half-width (window `max(band, |n−m|)`) — the classic
    * O(n·w) accuracy/cost dial.
    *
    * Returns `(key_a, key_b, n_a, n_b: bigint, dtw: double)` for every
    * unordered key pair (key_a < key_b).
    *
    * Plan: the DP runs INSIDE whole-stage codegen (a native
    * [[graft.functions.DtwDistance]] expression — no UDF
    * serialization), one broadcast nested-loop self-join over the
    * SERIES frame: quadratic in KEYS, never in observations — the
    * [[kendallTau]] contract, `maxKeys`-guarded; block first (by
    * category, tenant, metric family) when the key domain is large.
    * With ×100-integral series every distance is an exact
    * integer-valued double.
    */
  def dtwPairs(
      df: DataFrame,
      keyCol: String,
      seriesCol: String,
      band: Int = Int.MaxValue,
      maxKeys: Long = 10000L
  ): MayFail[DataFrame] = MayFail {
    require(band >= 0, s"band must be >= 0: $band")
    val k = df.count()
    require(k <= maxKeys,
      s"dtwPairs: $k series exceed maxKeys=$maxKeys — block the key " +
        "domain first (the pair join is quadratic in keys)")
    val l = df.select(col(keyCol).as("key_a"), col(seriesCol).as("__sa"))
    val r = broadcast(
      df.select(col(keyCol).as("key_b"), col(seriesCol).as("__sb")))
    import org.apache.spark.sql.graftbridge.Bridge
    l.join(r, col("key_a") < col("key_b"))
      .select(col("key_a"), col("key_b"),
        size(col("__sa")).cast("long").as("n_a"),
        size(col("__sb")).cast("long").as("n_b"),
        Bridge.column(graft.functions.DtwDistance(
          Bridge.expression(col("__sa")),
          Bridge.expression(col("__sb")), band)).as("dtw"))
  }
}
