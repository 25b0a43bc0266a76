package graft.physical

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.functions.{broadcast => broadcastHint, col, not}

import graft.functional.{MayFail, Ok}

/** Relational operators. Each lowers directly to the DataFrame API so
  * Catalyst owns planning (pushdown, join selection, AQE); the library adds
  * only composition (`MayFail`) and semantics documented per-op. */
object Join {

  /** Join condition: USING-style equi-join on shared column names (key
    * columns deduplicated in the output) or an arbitrary theta condition
    * (reference `physical/Op.scala:22-26`). */
  sealed trait Strategy
  final case class On(cols: Seq[String]) extends Strategy
  final case class With(cond: Column) extends Strategy

  private def join(df1: DataFrame, df2: DataFrame, on: Strategy, how: String): MayFail[DataFrame] =
    MayFail {
      on match {
        case On(cols)   => df1.join(df2, cols, how)
        case With(cond) => df1.join(df2, cond, how)
      }
    }

  def inner(df1: DataFrame, df2: DataFrame, on: Strategy): MayFail[DataFrame] =
    join(df1, df2, on, "inner")

  def left(df1: DataFrame, df2: DataFrame, on: Strategy): MayFail[DataFrame] =
    join(df1, df2, on, "left")

  def outer(df1: DataFrame, df2: DataFrame, on: Strategy): MayFail[DataFrame] =
    join(df1, df2, on, "outer")

  /** EXISTS — rows of `df1` with a match in `df2` (keeps only df1 cols). */
  def semi(df1: DataFrame, df2: DataFrame, on: Strategy): MayFail[DataFrame] =
    join(df1, df2, on, "left_semi")

  /** NOT EXISTS — rows of `df1` without a match in `df2`. */
  def anti(df1: DataFrame, df2: DataFrame, on: Strategy): MayFail[DataFrame] =
    join(df1, df2, on, "left_anti")

  /** Broadcast hash join of a big frame against a small one.
    *
    * The reference hand-rolls this with a driver `collectAsMap` +
    * `sc.broadcast` + `mapPartitions` probe (reference Op.scala:42-97);
    * Catalyst's broadcast-hash-join is the same physical algorithm with
    * codegen, so we emit `df.join(broadcast(small), on, "inner")`.
    *
    * ⚠ Semantics preserved from the reference: despite its doc-comment
    * saying "left join", unmatched left rows are dropped (Op.scala:86-92
    * `getOrElse(Nil)` under `flatMap`) — i.e. INNER join, one-to-many
    * matches preserved. `rightColumns`, when given, projects the small
    * side to `on ∪ rightColumns` before broadcasting (Op.scala:76-82).
    *
    * Scale note: the small side must fit in each executor; Catalyst
    * enforces `spark.sql.maxBroadcastTableBytes` instead of OOMing the
    * driver like a manual collectAsMap would.
    */
  def broadcast(
      big: DataFrame,
      small: DataFrame,
      on: Seq[String],
      rightColumns: Seq[String] = Nil
  ): MayFail[DataFrame] = MayFail {
    val projected =
      if (rightColumns.isEmpty) small
      else small.select((on ++ rightColumns).distinct.map(col): _*)
    big.join(broadcastHint(projected), on, "inner")
  }
}

object Group {

  /** Aggregation strategy (reference Op.scala:101-121):
    *  - [[Map]]: column→function-name map; Spark auto-names outputs
    *    `"fn(col)"` (e.g. `min(v1)`), a naming quirk tests rely on.
    *  - [[Agg]]: arbitrary aggregate Column expressions.
    */
  sealed trait Strategy
  final case class Map(aggs: scala.collection.immutable.Map[String, String]) extends Strategy
  final case class Agg(exprs: Seq[Column]) extends Strategy

  /** `groupBy(by).agg(...)`. Catalyst already plans partial (map-side) +
    * final aggregation, so this is shuffle-minimal by construction. */
  def agg(df: DataFrame, by: Seq[String], strategy: Strategy): MayFail[DataFrame] =
    MayFail {
      val grouped = df.groupBy(by.map(col): _*)
      strategy match {
        case Map(aggs)   => grouped.agg(aggs)
        case Agg(exprs)  => grouped.agg(exprs.head, exprs.tail: _*)
      }
    }

  /** Pivot: rows of `pivotCol` become columns, one per (explicitly
    * listed) value — listing values keeps the plan single-pass; omitting
    * them costs an extra distinct-collect job at scale. */
  def pivot(
      df: DataFrame,
      by: Seq[String],
      pivotCol: String,
      pivotValues: Seq[Any],
      agg: Column): MayFail[DataFrame] = MayFail {
    require(pivotValues.nonEmpty,
      "list pivot values explicitly — discovering them is a separate job")
    df.groupBy(by.map(col): _*).pivot(pivotCol, pivotValues).agg(agg)
  }

  /** Grouping-sets extensions — free surface beyond the reference
    * (SURVEY §2.4 notes these as parity+). */
  def rollup(df: DataFrame, by: Seq[String], exprs: Seq[Column]): MayFail[DataFrame] =
    MayFail(df.rollup(by.map(col): _*).agg(exprs.head, exprs.tail: _*))

  def cube(df: DataFrame, by: Seq[String], exprs: Seq[Column]): MayFail[DataFrame] =
    MayFail(df.cube(by.map(col): _*).agg(exprs.head, exprs.tail: _*))
}

/** Whole-column / per-key folds (reference Op.scala:159-172).
  *
  * The reference drops to RDD `reduce`/`reduceByKey` calling them
  * "shuffle-less"; typed `Dataset.reduce` / `groupByKey.reduceGroups`
  * give identical partial-aggregation behavior while staying in the
  * Dataset API (Encoders, no Row boxing in codegen paths).
  */
object Agg {

  /** Commutative whole-column fold to a driver-side scalar. */
  def on[T: Encoder](df: DataFrame, column: String, f: (T, T) => T): MayFail[T] =
    MayFail(df.select(col(column)).as[T].reduce(f))

  /** Per-key fold returning `RDD[(K, T)]` (reference Op.scala:168-172,
    * "shuffle-less" — really map-side partial agg + shuffle). Kept for
    * surface parity; [[byKey]] is the Dataset-API form. */
  def byKeyAsRDD[K, T](df: DataFrame, keyCol: String, valueCol: String, f: (T, T) => T)(
      implicit kt: scala.reflect.ClassTag[K], tt: scala.reflect.ClassTag[T]
  ): MayFail[org.apache.spark.rdd.RDD[(K, T)]] = MayFail {
    df.select(col(keyCol), col(valueCol)).rdd
      .map(r => (r.getAs[K](0), r.getAs[T](1)))
      .reduceByKey(f)
  }

  /** Per-key fold; returns a two-column frame `(key, value)`.
    * Map-side partial reduce happens before the shuffle (same physical
    * shape as the reference's `reduceByKey`, Op.scala:168-172). */
  def byKey[K, T](df: DataFrame, keyCol: String, valueCol: String, f: (T, T) => T)(implicit
      ke: Encoder[K],
      te: Encoder[T],
      kte: Encoder[(K, T)]
  ): MayFail[DataFrame] = MayFail {
    df.select(col(keyCol), col(valueCol))
      .as[(K, T)]
      .groupByKey(_._1)
      .reduceGroups((a: (K, T), b: (K, T)) => (a._1, f(a._2, b._2)))
      .map { case (k, kv) => (k, kv._2) }
      .toDF(keyCol, valueCol)
  }
}

object Filter {

  def where(df: DataFrame, cond: Column): MayFail[DataFrame] =
    MayFail(df.filter(cond))

  /** Drop rows where ANY of the listed columns is null
    * (reference Op.scala:131-134). */
  def na(df: DataFrame, cols: Seq[String]): MayFail[DataFrame] =
    MayFail(df.na.drop("any", cols))

  /** Inclusive range filter `lb <= col <= ub` (reference Op.scala:139-142). */
  def byRange[T](df: DataFrame, column: String, bound: (T, T)): MayFail[DataFrame] =
    MayFail(df.where(col(column) >= bound._1 && col(column) <= bound._2))
}

object Order {

  /** Ascending sort by named columns (reference Op.scala:145-149), with a
    * descending option the reference lacks. */
  def by(df: DataFrame, cols: Seq[String], descending: Boolean = false): MayFail[DataFrame] =
    MayFail {
      val sortCols = if (descending) cols.map(c => col(c).desc) else cols.map(col)
      df.orderBy(sortCols: _*)
    }

  /** Distributed top-k: `orderBy(...).limit(k)` plans as TakeOrderedAndProject
    * — per-partition heaps then a k-row merge, no global sort. */
  def topK(df: DataFrame, cols: Seq[Column], k: Int): MayFail[DataFrame] =
    MayFail(df.orderBy(cols: _*).limit(k))

  /** Deterministic top-k PER GROUP (k best documents per language, k
    * latest events per user, ...): rank window over the group partition,
    * keep ranks ≤ k. Spark 4's rank-limit pushdown
    * (`InferWindowGroupLimit`) plants a partial WindowGroupLimit below
    * the exchange, so at most k rows per group per input partition cross
    * the wire — never the full group. `sortCols` must yield a total
    * order within each group for a deterministic result (add a tiebreak
    * id column if the primary sort has duplicates); `rankCol` optionally
    * exposes the 1-based rank. */
  def topKPerGroup(
      df: DataFrame,
      keys: Seq[String],
      sortCols: Seq[Column],
      k: Int,
      rankCol: String = ""
  ): MayFail[DataFrame] = MayFail {
    require(k > 0, s"k must be positive: $k")
    require(keys.nonEmpty,
      "topKPerGroup needs group keys — for a global top-k use Order.topK " +
        "(TakeOrderedAndProject), not a single-partition window")
    val rn = if (rankCol.nonEmpty) rankCol
      else s"__rn_${java.util.UUID.randomUUID.toString.take(8)}"
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*).orderBy(sortCols: _*)
    val ranked = df.withColumn(rn,
      org.apache.spark.sql.functions.row_number().over(w)).filter(col(rn) <= k)
    if (rankCol.nonEmpty) ranked else ranked.drop(rn)
  }
}

object F {

  /** `withColumn` in the monad (reference Op.scala:152-154). */
  def addCol(df: DataFrame, name: String, c: Column): MayFail[DataFrame] =
    MayFail(df.withColumn(name, c))

  /** Lift a DataFrame into the monad (reference Op.scala:156). */
  def lift(df: DataFrame): MayFail[DataFrame] = Ok(df)
}

object Transform {

  /** Escape hatch: run any `DataFrame => DataFrame` inside the monad
    * (reference IO.scala:343-345). */
  def apply(df: DataFrame)(f: DataFrame => DataFrame): MayFail[DataFrame] =
    MayFail(f(df))

  def select(df: DataFrame, cols: Seq[String]): MayFail[DataFrame] =
    MayFail(df.select(cols.head, cols.tail: _*))

  /** Bulk rename via map (reference IO.scala:351-355). Single plan node in
    * Spark 3.4+ (`withColumnsRenamed`) instead of a fold of renames. */
  def rename(df: DataFrame, mapping: Map[String, String]): MayFail[DataFrame] =
    MayFail(df.withColumnsRenamed(mapping))

  def limit(df: DataFrame, n: Int): MayFail[DataFrame] = MayFail(df.limit(n))

  def drop(df: DataFrame, cols: Seq[String]): MayFail[DataFrame] =
    MayFail(df.drop(cols: _*))

  def distinct(df: DataFrame): MayFail[DataFrame] = MayFail(df.distinct())

  /** Unpivot (melt): selected value columns become (variable, value) rows. */
  def unpivot(
      df: DataFrame,
      ids: Seq[String],
      values: Seq[String],
      variableColumnName: String = "variable",
      valueColumnName: String = "value"): MayFail[DataFrame] = MayFail {
    df.unpivot(ids.map(col).toArray, values.map(col).toArray,
      variableColumnName, valueColumnName)
  }

}

/** Set operations (SURVEY §2.7 — thin wrappers for surface completeness). */
object SetOp {
  /** Bag union (UNION ALL semantics, like `Dataset.union`). */
  def union(df1: DataFrame, df2: DataFrame): MayFail[DataFrame] =
    MayFail(df1.union(df2))

  def unionByName(df1: DataFrame, df2: DataFrame): MayFail[DataFrame] =
    MayFail(df1.unionByName(df2))

  /** Set intersection (deduplicating, like SQL INTERSECT). */
  def intersect(df1: DataFrame, df2: DataFrame): MayFail[DataFrame] =
    MayFail(df1.intersect(df2))

  /** Set difference (deduplicating, like SQL EXCEPT). */
  def except(df1: DataFrame, df2: DataFrame): MayFail[DataFrame] =
    MayFail(df1.except(df2))
}

/** Manual physical control (reference Op.scala:175-203). */
object Optimise {

  /** Truncate lineage by round-tripping through parquet
    * (reference Op.scala:180-187). Equivalent to a reliable checkpoint but
    * survives driver restarts; use before iterative re-use of an expensive
    * subplan. */
  def snapshot(df: DataFrame, tempDir: String)(implicit spark: SparkSession): MayFail[DataFrame] =
    MayFail {
      val path = s"$tempDir/${java.util.UUID.randomUUID}"
      df.write.parquet(path)
      spark.read.parquet(path)
    }

  /** Cache + force materialisation (reference Op.scala:189-193). */
  def materialise(df: DataFrame): MayFail[DataFrame] = MayFail {
    df.persist()
    df.count()
    df
  }

  /** Repartition: n ≤ 1 coalesces (narrow, no shuffle); otherwise a full
    * shuffle to `n` partitions (reference Op.scala:195-202). */
  def repar(df: DataFrame, n: Int): MayFail[DataFrame] =
    MayFail(if (n <= 1) df.coalesce(1) else df.repartition(n))

  /** Repartition by columns — co-locates rows sharing key values so a
    * downstream join/agg on those keys avoids its own shuffle. */
  def reparBy(df: DataFrame, cols: Seq[String]): MayFail[DataFrame] =
    MayFail(df.repartition(cols.map(col): _*))

  def unpersist(df: DataFrame): MayFail[DataFrame] = MayFail { df.unpersist(); df }

  /** Release the pinned storage behind a `localCheckpoint`ed frame.
    * `Dataset.unpersist` does not reach a checkpoint's backing RDD (the
    * checkpoint wraps an already-persisted internal RDD in a
    * `LogicalRDD` leaf), so iterative operators that checkpoint per
    * round would otherwise pin superseded blocks for the life of the
    * session. Safe on any frame: a no-op unless the plan is a
    * checkpoint leaf. Call only once every downstream consumer of the
    * SUPERSEDED frame has been materialized.
    */
  def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectFirst {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }.foreach(_.unpersist(blocking = false))

  /** Static scale audit of a query plan — the anti-pattern counters a
    * pipeline CI can assert on BEFORE running anything (the same
    * signals a human reads off `.explain("formatted")`): shuffle and
    * broadcast exchange counts, nested-loop / cartesian joins, sorts,
    * whole-stage-codegen span count, parquet scans and how many of
    * them reached the reader with pushed filters. A plan whose
    * `cartesian_products` or `bnl_joins` is nonzero, or whose
    * `scans_with_pushdown` < `parquet_scans` on a filtered read, will
    * not survive a 100× scale-up — fail the build, not the cluster.
    *
    * Returns `(metric: string, value: bigint)` — driver-side plan
    * inspection only; the query is NOT executed.
    */
  def planAudit(df: DataFrame): MayFail[DataFrame] = MayFail {
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    def n(pattern: String): Long =
      pattern.r.findAllIn(plan).length.toLong
    val metrics = Seq(
      // formatted mode separates node names from arguments: exchanges
      // are "(n) Exchange" nodes with an "Arguments: <partitioning>"
      // detail (codegen markers only exist post-execution under AQE,
      // so they are deliberately NOT a metric here)
      "shuffle_exchanges" -> n("\\(\\d+\\) Exchange"),
      "hash_exchanges" -> n("Arguments: hashpartitioning"),
      "broadcast_exchanges" -> n("BroadcastExchange"),
      "bnl_joins" -> n("BroadcastNestedLoopJoin"),
      "cartesian_products" -> n("CartesianProduct"),
      "sort_merge_joins" -> n("SortMergeJoin"),
      "broadcast_hash_joins" -> n("BroadcastHashJoin"),
      "sorts" -> n("\\(\\d+\\) Sort\\b"),
      "parquet_scans" -> n("Scan parquet"),
      "scans_with_pushdown" -> n("PushedFilters: \\[(?!\\])"))
    val sp = df.sparkSession
    import sp.implicits._
    metrics.toDF("metric", "value")
  }

  /** Skew-resistant equi-join: salt the skewed (big) side's key with a
    * random shard in [0, saltFactor) and replicate every small-side row
    * across all shards, so a hot key's rows spread over `saltFactor`
    * tasks instead of one straggler.
    *
    * AQE's skew-join handles most cases at runtime; explicit salting is
    * for the pathological keys AQE can't split (a single key bigger than
    * any split threshold). Inner/left joins only — salting does not
    * preserve full-outer semantics.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      on: Seq[String],
      saltFactor: Int = 8,
      how: String = "inner"
  ): MayFail[DataFrame] = MayFail {
    require(how == "inner" || how == "left",
      s"saltedJoin supports inner/left, not $how")
    import org.apache.spark.sql.functions.{col => c, explode, floor, lit, rand, sequence}
    val saltedBig = big.withColumn("__salt", floor(rand(42) * saltFactor).cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedBig.join(saltedSmall, on :+ "__salt", how).drop("__salt")
  }
  /** Compact a parquet directory toward `targetFileBytes` per output file
    * — the small-files remedy for streaming sinks and over-partitioned
    * writes (thousands of tiny files destroy scan scheduling at scale).
    * Rewrites into a temp sibling, renames the source aside, swaps the
    * rewrite in, then deletes the old copy — at every crash point a
    * complete copy of the data exists at the original path or a
    * deterministically-named `__bak`/`__compact` sibling. File ops go
    * through Hadoop `FileSystem`, so HDFS/S3A paths work, not just
    * local disk. */
  def compact(
      path: String,
      targetFileBytes: Long = 128L * 1024 * 1024
  )(implicit spark: SparkSession): MayFail[DataFrame] = MayFail {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    import org.apache.hadoop.fs.Path
    val raw = new Path(path)
    val fs = raw.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(raw), s"no such directory: $path")
    val src = fs.makeQualified(raw)
    val totalBytes = fs.getContentSummary(src).getLength
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    val uuid = java.util.UUID.randomUUID
    val tmp = new Path(src.getParent, s"${src.getName}__compact_$uuid")
    val bak = new Path(src.getParent, s"${src.getName}__bak_$uuid")
    spark.read.parquet(path).repartition(nFiles).write.parquet(tmp.toString)
    // swap: move the source ASIDE first (never delete-then-rename) so a
    // crash between the two renames still leaves the data at `bak`
    require(fs.rename(src, bak), s"rename $src -> $bak failed")
    if (!fs.rename(tmp, src)) {
      fs.rename(bak, src) // roll back so the original path stays live
      throw new java.io.IOException(s"rename $tmp -> $src failed (rolled back)")
    }
    fs.delete(bak, true)
    spark.read.parquet(path)
  }

  /** Z-order (Morton) layout: quantize two numeric columns to equi-depth
    * cells, interleave the bits (native expression), then range-partition
    * + sort by the code. Files written from this layout carry row-group
    * min/max stats that prune scans filtered on EITHER column — the
    * standard multi-dimensional clustering for 100 TB fact tables
    * (single-column sort only prunes its own column).
    *
    * Cell boundaries come from one distributed `approxQuantile` pass
    * (Greenwald-Khanna sketch, both columns in a single job) and rows map
    * through a broadcast binary-search `Bucketizer` — no global window,
    * so no single-task bottleneck at any input size. Nulls/NaNs land in a
    * dedicated top cell (they carry no locality to preserve). */
  def zorderBy(df: DataFrame, colA: String, colB: String,
      partitions: Int = 0, cells: Int = 1024): MayFail[DataFrame] = MayFail {
    // strictly below 65536: the invalid-value bucket sits at index
    // `cells`, and it too must survive the 16-bit interleave mask
    require(cells > 1 && cells < 65536,
      s"cells must be in (1, 65536) (16-bit interleave incl. null cell), got $cells")
    import org.apache.spark.sql.functions.{coalesce, lit, unix_date, unix_micros}
    import graft.functions.FunctionBridge
    // approxQuantile sketches doubles only — map date/timestamp cluster
    // columns to epoch numerics (order-preserving, which is all z-order
    // needs); anything else non-numeric is a clear error, not a crash
    // inside the sketch.
    def toNumeric(name: String): Column = {
      val c = col(name)
      df.schema(name).dataType match {
        case _: org.apache.spark.sql.types.NumericType => c.cast("double")
        case org.apache.spark.sql.types.BooleanType => c.cast("int").cast("double")
        case org.apache.spark.sql.types.DateType => unix_date(c).cast("double")
        case org.apache.spark.sql.types.TimestampType => unix_micros(c).cast("double")
        case org.apache.spark.sql.types.TimestampNTZType =>
          unix_micros(c.cast("timestamp")).cast("double")
        case other => throw new IllegalArgumentException(
          s"zorderBy: cluster column $name has type $other — z-ordering " +
            "needs an order-preserving numeric mapping (numeric, boolean, " +
            "date or timestamp columns)")
      }
    }
    // probe 0.0 returns the exact column minimum; boundaries at/below it
    // are dropped so cell ids stay 0-based (an empty bucket 0 would shift
    // every cell up by one and break z-curve quadrant alignment)
    val probes = (0 until cells).map(_.toDouble / cells).toArray
    val Array(qa, qb) = df
      .select(toNumeric(colA).as("__zqa"), toNumeric(colB).as("__zqb"))
      .stat.approxQuantile(Array("__zqa", "__zqb"), probes, 0.25 / cells)
    def splits(q: Array[Double]): Array[Double] = {
      // an all-null/NaN column gives approxQuantile NOTHING to sketch
      // (empty quantile array); constant or min-dominated columns give no
      // interior split. Bucketizer needs >= 3 boundaries either way, so
      // keep one unreachable split and let every real value land in cell
      // 0 (such a column has no locality to encode).
      val interior =
        if (q.isEmpty) Array.empty[Double]
        else q.tail.distinct.sorted.filter(_ > q.head)
      if (interior.isEmpty)
        Array(Double.NegativeInfinity, Double.MaxValue, Double.PositiveInfinity)
      else
        Double.NegativeInfinity +: interior :+ Double.PositiveInfinity
    }
    val bucketizer = new org.apache.spark.ml.feature.Bucketizer()
      .setInputCols(Array("__za_in", "__zb_in"))
      .setOutputCols(Array("__za", "__zb"))
      .setSplitsArray(Array(splits(qa), splits(qb)))
      .setHandleInvalid("keep") // NaN (incl. mapped nulls) → extra top cell
    val withIn = df
      .withColumn("__za_in", coalesce(toNumeric(colA), lit(Double.NaN)))
      .withColumn("__zb_in", coalesce(toNumeric(colB), lit(Double.NaN)))
    val z = FunctionBridge.column(graft.functions.InterleaveBits(
      FunctionBridge.expression(col("__za").cast("long")),
      FunctionBridge.expression(col("__zb").cast("long"))))
    val n = if (partitions > 0) partitions else df.sparkSession
      .conf.get("spark.sql.shuffle.partitions").toInt
    bucketizer.transform(withIn)
      .withColumn("__z", z)
      .repartitionByRange(n, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z", "__za", "__zb", "__za_in", "__zb_in")
  }
}
