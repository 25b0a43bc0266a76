package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functional.MayFail

/** Sampling operators for training-data curation — the quota tools a
  * corpus pipeline needs (Spark's built-ins cover only whole-frame
  * `sample` and fraction-stratified `sampleBy`).
  *
  * All variants are seed-deterministic and fully distributed: the only
  * shuffle is on the group key, and per-group state is a window, never a
  * collection.
  */
object Sampling {

  /** Exactly `min(n, |group|)` uniformly-chosen rows per group (fixed
    * quota per source/language/domain — `sampleBy` can only do
    * fractions). One shuffle on the keys. */
  def fixedPerGroup(
      df: DataFrame,
      keys: Seq[String],
      n: Int,
      seed: Long = 42L): MayFail[DataFrame] = MayFail {
    require(n > 0, s"n must be positive: $n")
    val rn = s"__rn_${java.util.UUID.randomUUID.toString.take(8)}"
    val w = Window.partitionBy(keys.map(col): _*).orderBy(rand(seed))
    df.withColumn(rn, row_number().over(w))
      .filter(col(rn) <= n)
      .drop(rn)
  }

  /** [[fixedPerGroup]] with the portable-hash order instead of
    * `rand(seed)` (the [[byTokenBudget]] idiom): exactly `min(n,
    * |group|)` rows per group, chosen as a pure function of the data —
    * identical across reruns, repartitions, and engines, and replayable
    * by external SQL as a `row_number` over the salted md5 key. Use
    * this when the sample must be auditable or rebuild-stable; plain
    * [[fixedPerGroup]] remains for fresh-draw-per-seed semantics. */
  def fixedPerGroupByHash(
      df: DataFrame,
      keys: Seq[String],
      n: Int,
      idCols: Seq[String],
      salt: String = "0"): MayFail[DataFrame] = MayFail {
    require(n > 0, s"n must be positive: $n")
    require(idCols.nonEmpty, "fixedPerGroupByHash needs idCols — the hash of " +
      "the row identity IS the deterministic sampling order")
    val rn = s"__rn_${java.util.UUID.randomUUID.toString.take(8)}"
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(hashOrder(salt, idCols): _*)
    df.withColumn(rn, row_number().over(w))
      .filter(col(rn) <= n)
      .drop(rn)
  }

  /** THE deterministic sampling order: the salted portable md5 hash of
    * the id columns, id-tiebroken. ONE definition — the DuckDB oracles
    * replay this expression character-for-character
    * (`md5(salt § id § …)`), so [[byTokenBudget]] and
    * [[fixedPerGroupByHash]] must never drift apart. */
  private def hashOrder(salt: String, idCols: Seq[String]): Seq[Column] =
    graft.functions.TextFunctions.portableHash60(
      concat(lit(salt) +: idCols.flatMap(k => Seq(lit("§"), keyStr(col(k)))): _*)) +:
      idCols.map(col)

  /** Per-group sampling fractions (thin wrapper over `sampleBy`, which is
    * map-side only — no shuffle). */
  def byFractions(
      df: DataFrame,
      keyCol: String,
      fractions: Map[String, Double],
      seed: Long = 42L): MayFail[DataFrame] =
    MayFail(df.stat.sampleBy(keyCol, fractions, seed))

  /** [[byFractions]] with the portable-hash draw: a row is kept iff
    * `portableHash60(salt § id…) mod 10⁶ < fraction·10⁶` for its key's
    * fraction — a pure function of the data, so the stratified sample
    * is identical across reruns, repartitions, and engines (Spark's
    * `sampleBy` draws per partition, so a corpus rebuild silently
    * changes which rows are kept — the same trap `rand(seed)` windows
    * have). Keys absent from `fractions` keep `defaultFraction`
    * (0 = drop). Still map-side only: no shuffle, filters push down
    * around it. */
  def byFractionsByHash(
      df: DataFrame,
      keyCol: String,
      fractions: Map[String, Double],
      idCols: Seq[String],
      salt: String = "0",
      defaultFraction: Double = 0.0): MayFail[DataFrame] =
    byFractionsByHash(df, Seq(keyCol),
      fractions.map { case (k, f) => Seq(k) -> f },
      idCols, salt, defaultFraction)

  /** [[byFractionsByHash]] with COMPOSITE strata: corpus mixing is
    * usually keyed on (source, lang), not one column — the stratum key
    * is the ordered tuple of `keyCols` values, and `fractions` maps
    * value tuples (null-safe positional match; non-string key columns
    * compare against the given strings under Spark's usual coercion) to
    * keep-fractions. Same portable-hash draw on `idCols`, so the sample
    * stays a pure function of the data; still map-side only. */
  def byFractionsByHash(
      df: DataFrame,
      keyCols: Seq[String],
      fractions: Map[Seq[String], Double],
      idCols: Seq[String],
      salt: String,
      defaultFraction: Double): MayFail[DataFrame] = MayFail {
    require(keyCols.nonEmpty, "byFractionsByHash needs at least one key column")
    require(idCols.nonEmpty, "byFractionsByHash needs idCols — the hash of " +
      "the row identity IS the deterministic draw")
    require((fractions.values ++ Seq(defaultFraction)).forall(f => f >= 0 && f <= 1),
      s"fractions must be in [0,1]: $fractions default=$defaultFraction")
    fractions.keys.foreach(ks => require(ks.length == keyCols.length,
      s"stratum ${ks.mkString("(", ",", ")")} arity != keyCols ${keyCols.length}"))
    val frac = fractions.foldLeft(lit(defaultFraction)) { case (acc, (ks, f)) =>
      // <=> (null-safe): strata are exact tuples, so chain order is
      // irrelevant; a null key component simply never matches a stratum
      val cond = keyCols.zip(ks).map { case (c, v) => col(c) <=> lit(v) }
        .reduce(_ && _)
      when(cond, lit(f)).otherwise(acc)
    }
    val u = pmod(graft.functions.TextFunctions.portableHash60(
      concat(lit(salt) +: idCols.flatMap(k => Seq(lit("§"), keyStr(col(k)))): _*)),
      lit(1000000L)).cast("double")
    df.filter(u < frac * 1000000.0)
  }

  /** Greedy token-budget sample: rows are taken in pseudo-random order
    * per group until the group's running token count passes `budget` (the
    * row that crosses the line is included, so every non-empty group
    * yields at least one row). The LLM-corpus shape: "at most N tokens
    * per source".
    *
    * The order is the portable md5 hash of the `idCols` values (salted) —
    * a pure function of the DATA, so the selected subset is identical
    * across reruns, repartitions, and engines. (`rand(seed)` would seed
    * per PARTITION: rebuilding the corpus upstream silently changes which
    * rows are kept.) A new `salt` is a fresh independent draw; `idCols`
    * tiebreak hash collisions, so they must uniquely identify a row
    * within its group. */
  def byTokenBudget(
      df: DataFrame,
      keys: Seq[String],
      tokenCountCol: String,
      budget: Long,
      idCols: Seq[String],
      salt: String = "0"): MayFail[DataFrame] = MayFail {
    require(budget > 0, s"budget must be positive: $budget")
    require(idCols.nonEmpty, "byTokenBudget needs idCols — the hash of the " +
      "row identity IS the deterministic sampling order")
    val run = s"__run_${java.util.UUID.randomUUID.toString.take(8)}"
    // null token counts consume no budget (coalesce→0) instead of
    // null-poisoning the filter; negative counts are clamped to 0 so a
    // bad row cannot re-open a spent budget
    val tokens = greatest(coalesce(col(tokenCountCol), lit(0L)), lit(0L))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(hashOrder(salt, idCols): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(run, sum(tokens).over(w))
      .filter(col(run) - tokens < budget)
      .drop(run)
  }

  /** Shard a corpus into ~`budget`-token shards: rows ordered by
    * `orderCol` (within optional `keys` groups) get `shard_id =
    * floor(exclusive-running-token-sum / budget)` — deterministic,
    * reproducible corpus sharding for training (every shard holds a
    * contiguous run of the ordered corpus; each shard's size is within
    * one document of the budget).
    *
    * Reproducibility requires a TOTAL order: `orderCol` (plus
    * `tieBreakers`) must be unique within each group — tied rows under a
    * ROWS-frame running sum take arbitrary shard ids otherwise.
    *
    * One window over the group partition — at scale, shard WITHIN
    * sensible groups (source, language): a single global ordering would
    * serialize into one task, the same trap the z-order reviewer flagged.
    */
  def shardByTokenBudget(
      df: DataFrame,
      orderCol: String,
      tokenCountCol: String,
      budget: Long,
      keys: Seq[String] = Nil,
      tieBreakers: Seq[String] = Nil): MayFail[DataFrame] = MayFail {
    require(budget > 0, s"budget must be positive: $budget")
    val run = s"__run_${java.util.UUID.randomUUID.toString.take(8)}"
    val tokens = greatest(coalesce(col(tokenCountCol), lit(0L)), lit(0L))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((orderCol +: tieBreakers).map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(run, sum(tokens).over(w))
      .withColumn("shard_id", floor((col(run) - tokens) / budget))
      .drop(run)
  }

  /** Content-stable train/val/test split: the split label is a pure
    * function of the KEY columns (xxhash64 + seed), so a row keeps its
    * split across reruns, repartitions, and data growth — the property
    * `randomSplit` lacks (its assignment depends on partition layout)
    * and the one that prevents eval-set leakage when a corpus is
    * rebuilt. Map-side only, no shuffle.
    *
    * `weights` need not sum to 1 (they are normalized); labels index
    * into `names` (default "train"/"val"/"test" for 3 weights, `s0..`
    * otherwise). */
  def splitByHash(
      df: DataFrame,
      keyCols: Seq[String],
      weights: Seq[Double],
      seed: Long = 42L,
      splitCol: String = "split",
      names: Seq[String] = Nil): MayFail[DataFrame] = MayFail {
    require(keyCols.nonEmpty, "splitByHash needs at least one key column")
    require(weights.nonEmpty && weights.forall(_ > 0),
      s"weights must be positive: $weights")
    val labels =
      if (names.nonEmpty) {
        require(names.length == weights.length,
          s"names (${names.length}) and weights (${weights.length}) lengths differ")
        names
      }
      else if (weights.length == 3) Seq("train", "val", "test")
      else weights.indices.map(i => s"s$i")
    val total = weights.sum
    val cum = weights.scanLeft(0.0)(_ + _).tail.map(_ / total)
    // bucket in [0,1) from the key hash; pmod guards the Long.MinValue
    // edge and ANSI mode (no negative modulo surprises)
    val bucket = pmod(xxhash64(keyCols.map(col) :+ lit(seed): _*), lit(1000000L))
      .cast("double") / 1000000.0
    val label = cum.zip(labels).reverse.foldLeft(lit(labels.last)) {
      case (acc, (bound, name)) => when(bucket < bound, lit(name)).otherwise(acc)
    }
    df.withColumn(splitCol, label)
  }

  /** Null-safe string form of a key column for portable hashing: null
    * hashes as the literal token `<null>` (distinct from every value
    * except that exact string) instead of null-poisoning the concat —
    * `xxhash64`-based siblings like [[splitByHash]] tolerate nulls
    * natively, and the md5 path must too. */
  private def keyStr(c: Column): Column = coalesce(c.cast("string"), lit("<null>"))

  /** Epoch-weighted source mixing — the dataset-mixture step of LLM
    * training pipelines ("web at 0.5 epochs, wiki at 2.5"): each row is
    * replicated `floor(w)` times and kept a fractional extra epoch with
    * probability `w - floor(w)`, decided by a pure portable hash of
    * `(id, epoch)` — deterministic across reruns, partitionings, and
    * engines (no RNG). Adds an `epoch` column (0-based replica index).
    *
    * Map-side only: the explode factor is `ceil(w)` (capped at 100 —
    * heavier oversampling belongs in multiple passes), so no shuffle and
    * no skew regardless of the mixture.
    */
  def mixBySource(
      df: DataFrame,
      sourceCol: String,
      idCol: String,
      weights: Map[String, Double],
      defaultWeight: Double = 1.0,
      epochCol: String = "epoch"
  ): MayFail[DataFrame] = MayFail {
    require((weights.values ++ Seq(defaultWeight)).forall(w => w >= 0 && w <= 100),
      s"weights must be in [0, 100]: $weights default=$defaultWeight")
    val w = weights.foldLeft(lit(defaultWeight)) { case (acc, (src, wt)) =>
      when(col(sourceCol) === lit(src), lit(wt)).otherwise(acc)
    }
    // sequence(0, -1) would count DOWN, so guard the w == 0 case
    val epochs = when(w > 0.0,
      sequence(lit(0), ceil(w).cast("int") - 1)).otherwise(array().cast("array<int>"))
    val frac = w - floor(w)
    val keepFrac = pmod(
      graft.functions.TextFunctions.portableHash60(
        concat(keyStr(col(idCol)), lit("_"), col(epochCol).cast("string"))),
      lit(1000000L)).cast("double") < frac * 1000000.0
    df.withColumn(epochCol, explode(epochs))
      .filter(col(epochCol) < floor(w) || keepFrac)
  }

  /** Per-stratum temperature weights — the `p_s ∝ n_s^alpha` mixture rule
    * of multilingual/multi-source LLM pipelines (Conneau & Lample 2019
    * §3.1; Raffel et al. 2020 §3.4.3 examples-proportional mixing): one row per stratum with its exact count, its share of the
    * mixture, and the keep-fraction that lands the stratum at
    * `share · targetRows` rows (capped at 1 — a stratum smaller than its
    * target contributes everything it has).
    *
    * `alpha < 1` upweights small strata (the anti-English-dominance
    * setting), `alpha = 1` is proportional (a plain `targetRows / N`
    * downsample), `alpha = 0` aims for equal rows per stratum. Fractions
    * round to 6 digits so an engine replaying the arithmetic cannot flip
    * a boundary row on a last-ulp `pow` divergence.
    *
    * Scale shape: one aggregate over the keys (the result is
    * stratum-cardinality-sized), a broadcast of the one-row weight
    * total — the corpus itself never shuffles. */
  def temperatureWeights(
      df: DataFrame,
      keyCols: Seq[String],
      alpha: Double,
      targetRows: Long): MayFail[DataFrame] = MayFail {
    require(keyCols.nonEmpty, "temperatureWeights needs at least one key column")
    require(alpha >= 0, s"alpha must be non-negative: $alpha")
    require(targetRows > 0, s"targetRows must be positive: $targetRows")
    val counts = df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("n"))
      .withColumn("__w", pow(col("n").cast("double"), lit(alpha)))
    val tot = counts.agg(sum(col("__w")).as("__tot"))
    counts.crossJoin(broadcast(tot))
      .select(keyCols.map(col) ++ Seq(
        col("n"),
        round(col("__w") / col("__tot"), 6).as("share"),
        round(least(lit(1.0),
          (col("__w") / col("__tot")) * targetRows / col("n")), 6)
          .as("keep_fraction")): _*)
  }

  /** Temperature mixture sample: keep each row iff the salted
    * portable-hash draw clears its stratum's [[temperatureWeights]]
    * keep-fraction. The realized size is `~targetRows` within Bernoulli
    * noise (capped strata contribute all their rows); the selection is a
    * pure function of the data — identical across reruns, repartitions,
    * and engines. Weight lookup is a broadcast join on the (tiny)
    * stratum frame; the filter itself is map-side. */
  def byTemperature(
      df: DataFrame,
      keyCols: Seq[String],
      alpha: Double,
      targetRows: Long,
      idCols: Seq[String],
      salt: String = "0"): MayFail[DataFrame] =
    temperatureWeights(df, keyCols, alpha, targetRows).map { weights =>
      require(idCols.nonEmpty, "byTemperature needs idCols — the hash of " +
        "the row identity IS the deterministic draw")
      val fracs = weights.select(
        keyCols.map(k => col(k).as(s"__k_$k")) :+ col("keep_fraction").as("__frac"): _*)
      // null-safe key match: a null stratum is a real stratum here (it
      // was counted), unlike the fraction-map samplers where null can
      // never match a configured stratum
      val cond = keyCols.map(k => col(k) <=> col(s"__k_$k")).reduce(_ && _)
      val u = pmod(graft.functions.TextFunctions.portableHash60(
        concat(lit(salt) +: idCols.flatMap(k => Seq(lit("§"), keyStr(col(k)))): _*)),
        lit(1000000L)).cast("double")
      df.join(broadcast(fracs), cond)
        .filter(u < col("__frac") * 1000000.0)
        .drop(fracs.columns: _*)
    }

  /** Deterministic pseudo-random corpus order: a portable md5 shuffle key
    * per row. At scale, write with `repartitionByRange(shuffleCol)` +
    * local sort — a distributed shuffle of the corpus into a stable
    * pseudo-random order with NO global window (a global `row_number`
    * would funnel everything through one partition). Changing `seed`
    * yields an independent order per training run.
    */
  def shuffleKey(
      df: DataFrame,
      keyCols: Seq[String],
      seed: String = "graft",
      shuffleCol: String = "shuffle_key"
  ): MayFail[DataFrame] = MayFail {
    require(keyCols.nonEmpty, "shuffleKey needs at least one key column")
    val parts = lit(seed) +: keyCols.flatMap(k => Seq(lit("_"), keyStr(col(k))))
    df.withColumn(shuffleCol, graft.functions.TextFunctions.portableHash60(concat(parts: _*)))
  }

  /** Weighted sampling WITHOUT replacement — Efraimidis–Spirakis A-ES:
    * each row draws an exponential key `−ln(u)/w` from its portable
    * md5 uniform `u` and the `k` SMALLEST keys win, which is exactly
    * sampling without replacement with probability proportional to
    * weight at each draw. The quality-weighted corpus subsetting
    * primitive ([[byTemperature]] reweights SOURCES; this picks
    * DOCUMENTS by per-row weight — dedup priority, quality score,
    * inverse-cluster-size).
    *
    * Deterministic and engine-portable: `u = (md5_60(seed § id…) >> 7
    * + 1) / 2⁵³` is an exact dyadic in (0, 1]; keys are rounded at 9
    * digits under a 1e-12 tie-shift (ln's cross-engine ulp is ~1e-19
    * of the key) and tie-break on `idCols` — same device as the
    * linkage scores. Rows with NULL or non-positive weight are
    * excluded.
    *
    * Plan: global draw (`strataCols` empty) is orderBy+limit —
    * TakeOrderedAndProject, never a single-task global window; the
    * final rank then runs on the k-row frame. Stratified draw is one
    * partitioned window, k rows per stratum.
    *
    * Returns the input columns + `(sample_key, sample_rank)`.
    */
  def weightedByHash(
      df: DataFrame,
      idCols: Seq[String],
      weightCol: String,
      k: Int,
      seed: String = "graft",
      strataCols: Seq[String] = Nil
  ): MayFail[DataFrame] = MayFail {
    require(idCols.nonEmpty, "weightedByHash needs at least one id column")
    require(k >= 1, s"k must be >= 1: $k")
    val h = graft.functions.TextFunctions.portableHash60(
      concat(lit(seed) +: idCols.flatMap(c => Seq(lit("§"), keyStr(col(c)))): _*))
    val u = (shiftright(h, 7) + lit(1L)).cast("double") /
      lit(9007199254740992.0)
    val w = col(weightCol).cast("double")
    val base = df.filter(w.isNotNull && w > 0)
      .withColumn("sample_key", round(-log(u) / w + lit(1e-12), 9))
    val ord = col("sample_key") +: idCols.map(col)
    if (strataCols.isEmpty) {
      base.orderBy(ord: _*).limit(k)
        .withColumn("sample_rank", row_number().over(Window.orderBy(ord: _*)))
    } else {
      val wS = Window.partitionBy(strataCols.map(col): _*).orderBy(ord: _*)
      base.withColumn("sample_rank", row_number().over(wS))
        .filter(col("sample_rank") <= k)
    }
  }

  /** Ratio-coupled negative sampling — keep every positive and a
    * deterministic hash-ordered sample of `ratio × n_positives`
    * negatives (the class-imbalance verb of contrastive / CTR-style
    * training sets: the negative budget follows the positive count, so
    * the class ratio survives refreshes without retuning). `labelCol`
    * casts to boolean; NULL labels count as negative.
    *
    * Sampling is the library's portable-hash draw (md5 over salt§id —
    * no RNG state): the SAME negatives are chosen across reruns,
    * partitionings, and engines, and growing the corpus only appends
    * to the selection frontier.
    *
    * Plan: one count action over the positives, then a global
    * (orderBy + limit) draw over the negatives — TakeOrdered, never a
    * single-partition window (the [[weightedByHash]] posture). Returns
    * the input columns.
    */
  def negativeSample(
      df: DataFrame,
      labelCol: String,
      ratio: Double,
      idCols: Seq[String],
      salt: String = "0"
  ): MayFail[DataFrame] = MayFail {
    require(ratio > 0, s"ratio must be positive: $ratio")
    require(idCols.nonEmpty, "negativeSample needs idCols — the hash of " +
      "the row identity IS the deterministic sampling order")
    val isPos = coalesce(col(labelCol).cast("boolean"), lit(false))
    val pos = df.filter(isPos)
    val nPos = pos.count()
    val k = math.ceil(ratio * nPos)
    require(k <= Int.MaxValue,
      s"negative budget $k exceeds a single take — lower ratio or split")
    val neg = df.filter(!isPos)
      .orderBy(hashOrder(salt, idCols): _*)
      .limit(k.toInt)
    pos.union(neg)
  }

  /** Deterministic k-fold assignment — adds a `fold ∈ [0, k)` column
    * from the portable md5 hash of the row identity (or of
    * `groupCols` when given: every row of a group lands in ONE fold —
    * the leakage-safe grouped-CV form, so near-duplicate families
    * split by [[Dedup.leakageSafeSplit]]-style group keys never
    * straddle folds). No RNG state: folds are stable across reruns,
    * partitionings, engines, and corpus growth.
    *
    * Plan: a pure projection — zero shuffle.
    */
  def kfoldByHash(
      df: DataFrame,
      k: Int,
      idCols: Seq[String],
      groupCols: Seq[String] = Nil,
      salt: String = "cv"
  ): MayFail[DataFrame] = MayFail {
    require(k >= 2, s"k must be >= 2: $k")
    require(idCols.nonEmpty || groupCols.nonEmpty,
      "kfoldByHash needs idCols (or groupCols) — the hash of the row " +
        "identity IS the fold assignment")
    val keys = if (groupCols.nonEmpty) groupCols else idCols
    val h = graft.functions.TextFunctions.portableHash60(
      concat(lit(salt) +: keys.flatMap(c => Seq(lit("§"),
        keyStr(col(c)))): _*))
    df.withColumn("fold", (h % k).cast("int"))
  }

  /** Sequence packing: assign documents to fixed token-capacity training
    * bins, next-fit in `orderCol` order within each `groupCols` cell —
    * the step that turns a cleaned corpus into training contexts with
    * bounded padding waste. Unlike [[shardByTokenBudget]] (cumulative
    * boundaries that conceptually split a document across shards), a
    * document is never split: one whose count exceeds `capacity` gets a
    * bin of its own, and a bin break happens exactly when the running
    * total would overflow.
    *
    * Next-fit is sequential by definition, so the groups ARE the
    * parallelism: one shuffle on `groupCols`, one ordered array per
    * group, one native O(n) packing pass ([[graft.functions.PackImpl]])
    * — never a driver loop, never an iterative join. Size groups like
    * shards (a language × source × date cell, not a whole corpus): each
    * group's `(orderKey, count)` pairs are collected into one in-memory
    * array, the same bound as the reassembly aggregations elsewhere.
    * Bins never span groups. `orderCol` must be unique within a group
    * (it is the packing order AND the join-back identity); null counts
    * pack as 0.
    *
    * Returns `(groupCols…, orderCol, n_tokens, bin_id)` with `bin_id`
    * numbered from 0 per group.
    */
  def packByTokenBudget(
      df: DataFrame,
      orderCol: String,
      tokenCountCol: String,
      capacity: Long,
      groupCols: Seq[String]
  ): MayFail[DataFrame] = MayFail {
    require(capacity > 0, s"capacity must be positive: $capacity")
    require(groupCols.nonEmpty,
      "packByTokenBudget needs at least one group column — a single global " +
        "group would serialize the whole corpus through one packing pass")
    val toks = greatest(coalesce(col(tokenCountCol).cast("long"), lit(0L)), lit(0L))
    val grouped = df
      .select(groupCols.map(col) :+ col(orderCol).as("__o") :+ toks.as("__t"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(array_sort(collect_list(struct(col("__o"), col("__t")))).as("__docs"))
      .withColumn("__bins",
        graft.functions.FunctionBridge.column(
          graft.functions.PackBinsNextFit(
            graft.functions.FunctionBridge.expression(
              transform(col("__docs"), d => d.getField("__t"))),
            capacity)))
    grouped
      .select(groupCols.map(col) :+
        explode(arrays_zip(col("__docs"), col("__bins"))).as("__z"): _*)
      .select(groupCols.map(col) :+
        col("__z.__docs.__o").as(orderCol) :+
        col("__z.__docs.__t").as("n_tokens") :+
        col("__z.__bins").cast("long").as("bin_id"): _*)
  }

  /** Importance-weight diagnostics — the health check run before
    * trusting any weighted sample (DSIR weights, temperature mixes,
    * inverse-propensity corrections): effective sample size
    * `ESS = (Σw)²/Σw²` (Kish 1965), its fraction of n, the largest
    * single-row weight share, and the weight coefficient of
    * variation. ESS/n near 1 = weights are doing nothing; near 0 = a
    * handful of rows dominate and the weighted estimate is noise.
    * One aggregation pass; rows with NULL or non-positive weights are
    * excluded (documented contract). Returns one row `(n: bigint,
    * ess, ess_frac, max_w_share, cv_w: double ROUNDED at 6)`;
    * empty input yields n=0 with NULL ratios. */
  def weightDiagnostics(
      df: DataFrame,
      weightCol: String
  ): MayFail[DataFrame] = MayFail {
    val w = col(weightCol).cast("double")
    df.filter(w.isNotNull && w > 0)
      .agg(count(lit(1)).as("n"), sum(w).as("__sw"),
        sum(w * w).as("__sw2"), max(w).as("__mx"))
      .select(col("n"),
        round(when(col("__sw2") > 0,
          col("__sw") * col("__sw") / col("__sw2")) + lit(1e-9), 6)
          .as("ess"),
        round(when(col("__sw2") > 0 && col("n") > 0,
          col("__sw") * col("__sw") / col("__sw2") /
            col("n").cast("double")) + lit(1e-9), 6).as("ess_frac"),
        round(when(col("__sw") > 0, col("__mx") / col("__sw"))
          + lit(1e-9), 6).as("max_w_share"),
        round(when(col("__sw") > 0,
          sqrt(greatest(col("n").cast("double") * col("__sw2") /
            (col("__sw") * col("__sw")) - lit(1.0), lit(0.0))))
          + lit(1e-9), 6).as("cv_w"))
  }

  /** Water-filling budget allocation — the crawl-frontier fairness
    * verb: given per-key row counts `n_k` and a global `budget`, find
    * the level `λ` such that `Σ min(n_k, λ)` exhausts the budget, so
    * no key is starved while heavy keys (hot domains, boilerplate
    * sources) are capped at the common level. Exact integers
    * throughout: the largest feasible level index `i*` satisfies
    * `S_i + (m−i)·n_i ≤ B`, tested WITHOUT the overflow-prone product
    * as `n_i ≤ (B−S_i) div (m−i)`; then `λ = (B−S*) div (m−i*)` and
    * the remainder `+1`s go to the `r` uncapped keys with the LARGEST
    * (n, key) — fully deterministic, so `Σ cap == min(budget, Σ n)`
    * EXACTLY (spec law). Returns `(key, n, cap)`.
    *
    * The level search sorts the KEY GRID in one global window — the
    * exact-grid discipline of `Quality.gridMedian`: grid-sized, one
    * task, never the corpus. (Beyond ~10⁸ keys, binary-search λ with
    * repeated `Σ min(n, λ)` aggregate probes instead.) */
  def waterfillCaps(
      df: DataFrame,
      keyCol: String,
      budget: Long
  ): MayFail[DataFrame] = MayFail {
    require(budget >= 0, s"budget must be >= 0: $budget")
    val grid = df.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol).as("key")).agg(count(lit(1)).as("n"))
    val wAsc = Window.orderBy(col("n"), col("key"))
    val g = grid
      .withColumn("__i", row_number().over(wAsc).cast("long"))
      .withColumn("__s", sum(col("n")).over(
        wAsc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .localCheckpoint() // grid-sized; consumed by the scalar agg + output
    val withM = g.crossJoin(broadcast(g.agg(count(lit(1)).as("__m"))))
      .withColumn("__r", lit(budget) - col("__s"))
      // CASE guards the div (Spark AND does not short-circuit per row;
      // an unguarded `div` would raise /0 under ANSI on the last row)
      .withColumn("__feas", col("__r") >= 0 &&
        coalesce(col("n") <=
          expr("CASE WHEN __m > __i THEN __r div (__m - __i) END"),
          lit(true)))
    val sc = withM.agg(
      coalesce(max(when(col("__feas"), col("__i"))), lit(0L)).as("__istar"),
      coalesce(max(when(col("__feas"), col("__s"))), lit(0L)).as("__sstar"),
      max(col("__m")).as("__m"))
    // λ and remainder only exist when uncapped keys remain (__d > 0);
    // integral `div` keeps everything exact (never `/` on longs)
    g.crossJoin(broadcast(sc))
      .withColumn("__d", col("__m") - col("__istar"))
      .withColumn("__lam",
        expr(s"CASE WHEN __d > 0 THEN (${budget}L - __sstar) div __d END"))
      .withColumn("__rem", when(col("__d") > 0,
        lit(budget) - col("__sstar") - col("__lam") * col("__d")))
      .withColumn("cap",
        when(col("__i") <= col("__istar"), col("n"))
          .otherwise(col("__lam") +
            when(col("__i") > col("__m") - col("__rem"), lit(1L))
              .otherwise(lit(0L))))
      .select("key", "n", "cap")
  }

  /** Apply [[waterfillCaps]] deterministically: within each key, keep
    * the first `cap` rows in the salted portable-hash order (the
    * [[fixedPerGroupByHash]] idiom, variable quota) — rebuild-stable,
    * engine-replayable, and `Σ kept == min(budget, |df|)` exactly. */
  def waterfillSample(
      df: DataFrame,
      keyCol: String,
      budget: Long,
      idCols: Seq[String],
      salt: String = "0"
  ): MayFail[DataFrame] = MayFail {
    require(idCols.nonEmpty, "waterfillSample needs idCols — the hash " +
      "of the row identity IS the deterministic sampling order")
    val caps = waterfillCaps(df, keyCol, budget).get
      .select(col("key").as("__wfk"), col("cap").as("__cap"))
    val rn = s"__rn_${java.util.UUID.randomUUID.toString.take(8)}"
    val w = Window.partitionBy(col(keyCol))
      .orderBy(hashOrder(salt, idCols): _*)
    df.filter(col(keyCol).isNotNull)
      .join(caps, col(keyCol) === col("__wfk"))
      .withColumn(rn, row_number().over(w))
      .filter(col(rn) <= col("__cap"))
      .drop(rn, "__wfk", "__cap")
  }

  /** Temperature-based source-mixing allocation (the multilingual /
    * domain-mixing sampling rule — mBERT/XLM-R exponent smoothing,
    * UniMax-style budgeting): per-key target counts proportional to
    * n^α with α ∈ (0, 1] flattening head domains and up-weighting the
    * tail. Allocations may EXCEED n (epochs > 1 — up-sampling
    * low-resource domains is the point); compose with
    * [[waterfillCaps]] when repeats are not allowed.
    *
    * Exactness: weights are the integers `round(n^α · 1000)` — at
    * α = 0.5 the power is IEEE `sqrt` (correctly rounded, engine-
    * exact); other α go through libm `pow` with the usual last-ulp
    * caveat at round boundaries. Everything downstream is integer
    * largest-remainder arithmetic: `base = (B·w) div W`, the
    * `B − Σbase` leftover goes one-each to the largest
    * `(B·w mod W, n, key)` — `Σ alloc == budget` EXACTLY and every
    * comparison is integral. ANSI bound: `B·max(w) < 2⁶³` (hard error
    * past it, never a silent wrap).
    *
    * Returns `(key, n, weight, alloc, epochs)`. Grid-sized global
    * windows only — the [[waterfillCaps]] discipline (one corpus scan,
    * then key-grid arithmetic). */
  def temperatureAllocate(
      df: DataFrame,
      keyCol: String,
      budget: Long,
      alpha: Double = 0.5
  ): MayFail[DataFrame] = MayFail {
    require(budget >= 0, s"budget must be >= 0: $budget")
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1]: $alpha")
    val grid = df.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol).as("key")).agg(count(lit(1)).as("n"))
    val nD = col("n").cast("double")
    val wexp =
      if (alpha == 0.5) sqrt(nD)
      else if (alpha == 1.0) nD
      else pow(nD, lit(alpha))
    val wAll = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val g = grid
      .withColumn("weight", round(wexp * lit(1000.0)).cast("long"))
      .withColumn("__W", sum(col("weight")).over(wAll))
      .withColumn("__bw", lit(budget) * col("weight"))
      .withColumn("__base", expr("__bw div __W"))
      .withColumn("__rem", col("__bw") % col("__W"))
    val wRank = Window.orderBy(col("__rem").desc, col("n").desc, col("key"))
    g.withColumn("__sb", sum(col("__base")).over(wAll))
      .withColumn("__rk", row_number().over(wRank).cast("long"))
      .withColumn("alloc", col("__base") +
        when(col("__rk") <= lit(budget) - col("__sb"), lit(1L))
          .otherwise(lit(0L)))
      .select(col("key"), col("n"), col("weight"), col("alloc"),
        round(col("alloc").cast("double") / col("n").cast("double")
          + lit(1e-9), 6).as("epochs"))
  }
}
