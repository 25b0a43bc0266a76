package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functional.MayFail

/** Merge/upsert operators — the incremental-maintenance verbs a corpus
  * pipeline needs between full rebuilds (apply a day's crawl to the
  * document store, keep attribute history for reproducibility).
  *
  * Scale posture: both operators are single-shuffle on the merge key.
  * `upsert` is a full outer join (broadcast when the delta is small —
  * the common case of a small update batch against a huge base);
  * `latestByKey` and `scd2` are one window each over the key partition.
  * Nothing collects to the driver.
  */
object Merge {

  /** SCD-1 upsert: rows of `updates` replace same-key rows of `base`,
    * unmatched update rows are inserted, everything else passes through.
    * Column sets must match; the result keeps `base`'s column order.
    *
    * Formulated as `updates ∪ (base ANTI-JOIN update-keys)` rather than a
    * full outer join: a full outer equi-join can never broadcast in Spark
    * (only shuffled implementations support it), but a LEFT ANTI join
    * builds on the delta side — with `broadcastUpdates` the merge of a
    * 100 TB base against a small delta runs map-side with NO shuffle of
    * the base. `updates` must have at most one row per key (enforce
    * upstream with [[latestByKey]]).
    */
  def upsert(
      base: DataFrame,
      updates: DataFrame,
      keys: Seq[String],
      broadcastUpdates: Boolean = false
  ): MayFail[DataFrame] = MayFail {
    require(keys.nonEmpty, "upsert needs at least one key column")
    val cols = base.columns.toSeq
    require(updates.columns.toSet == cols.toSet,
      s"upsert: column sets differ (base ${cols.mkString(",")} vs " +
        s"updates ${updates.columns.mkString(",")})")
    val u0 = updates.select(cols.map(col): _*)
    val ukeys = u0.select(keys.map(k => col(k).as(s"__u_$k")): _*).distinct()
    val uk = if (broadcastUpdates) broadcast(ukeys) else ukeys
    // null-safe match so null-valued keys also take the update side
    val cond = keys.map(k => col(k) <=> col(s"__u_$k")).reduce(_ && _)
    base.join(uk, cond, "left_anti").unionByName(u0)
  }

  /** Keep each key's latest row by `orderCol` (CDC compaction / "current
    * snapshot" view). Ties break on the later row winning is undefined —
    * pass a total order (e.g. a change sequence number). */
  def latestByKey(
      df: DataFrame,
      keys: Seq[String],
      orderCol: String
  ): MayFail[DataFrame] = MayFail {
    require(keys.nonEmpty, "latestByKey needs at least one key column")
    val rn = s"__rn_${java.util.UUID.randomUUID.toString.take(8)}"
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol).desc)
    df.withColumn(rn, row_number().over(w)).filter(col(rn) === 1).drop(rn)
  }

  /** SCD-2 history: from a change log `(keys, attributes, tsCol)`, build
    * one row per version with `valid_from` = its change time and
    * `valid_to` = the next change's time (null while current). One
    * window over the key partition — no self-join. */
  def scd2(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String
  ): MayFail[DataFrame] = MayFail {
    require(keys.nonEmpty, "scd2 needs at least one key column")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(tsCol))
    df.withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** POINT-IN-TIME dimension join — [[scd2]]'s consumer: each fact row
    * picks the dimension VERSION valid at its own timestamp
    * (`valid_from ≤ ts < valid_to`, open-ended current version matches
    * everything from its start). By SCD-2 construction versions
    * partition each key's timeline, so at most one version matches —
    * the join is 1:≤1 and fact row counts are preserved (left join;
    * facts before a key's first version, or with no dim key, carry NULL
    * attributes).
    *
    * Scale shape: an EQUI join on the dimension keys with the validity
    * range as the join residual — broadcast by default (dimension
    * histories are small next to facts; `broadcastDim = false` falls
    * back to a shuffled hash/sort-merge join on the same keys for
    * jumbo dims). Never a BroadcastNestedLoop: the range rides the
    * hash-join residual, not the join key. The dimension side is
    * internally prefixed before joining, so fact/dim lineage overlap
    * (self-derived dimensions) can't trip Spark's ambiguous-attribute
    * self-join trap; colliding NON-key output columns are rejected
    * loudly instead of silently suffixed. */
  def pointInTimeJoin(
      fact: DataFrame,
      dim: DataFrame,
      keys: Seq[String],
      factTs: String,
      fromCol: String = "valid_from",
      toCol: String = "valid_to",
      broadcastDim: Boolean = true
  ): MayFail[DataFrame] = MayFail {
    require(keys.nonEmpty, "pointInTimeJoin needs at least one key column")
    require(dim.columns.contains(fromCol) && dim.columns.contains(toCol),
      s"dim must carry $fromCol/$toCol (scd2's output contract)")
    val attrs = dim.columns.filterNot(c =>
      keys.contains(c) || c == fromCol || c == toCol)
    val clash = attrs.toSet.intersect(fact.columns.toSet)
    require(clash.isEmpty,
      s"dim attribute columns collide with fact columns: $clash — rename first")
    val pre = "__pit_"
    val dimR = dim.columns.foldLeft(dim)((d, c) => d.withColumnRenamed(c, pre + c))
    val dj = if (broadcastDim) broadcast(dimR) else dimR
    val cond = keys.map(k => col(k) === col(pre + k)).reduce(_ && _) &&
      col(factTs) >= col(pre + fromCol) &&
      (col(pre + toCol).isNull || col(factTs) < col(pre + toCol))
    val joined = fact.join(dj, cond, "left")
    val dropped = (keys :+ fromCol :+ toCol)
      .foldLeft(joined)((j, c) => j.drop(col(pre + c)))
    attrs.foldLeft(dropped)((j, c) => j.withColumnRenamed(pre + c, c))
  }

  /** Corpus version diff: per id, `added` (only in `b`), `removed`
    * (only in `a`), `changed` (both sides, normalized content differs),
    * `unchanged` — the audit that answers "what did the new crawl
    * actually change" before a rebuilt corpus reaches training.
    * Content comparison is by [[graft.functions.TextFunctions
    * .fingerprint]] of the NORMALIZED text (case/whitespace-insensitive;
    * null text compares as empty), computed per side BEFORE the join so
    * only `(id, 8-byte hash)` rows shuffle — the documents themselves
    * never move. One full-outer shuffle join on id; ids must be unique
    * per side (it is the version key). Returns `(idCol, status)`.
    *
    * An external engine replays this without knowing the hash function:
    * within one engine, hash equality ⟺ normalized-text equality (modulo
    * 64-bit collisions), so the oracle compares the normalized text
    * directly and must agree row-for-row. */
  def corpusDiff(
      a: DataFrame,
      b: DataFrame,
      textCol: String,
      idCol: String
  ): MayFail[DataFrame] = MayFail {
    def fp(df: DataFrame, tag: String): DataFrame =
      df.select(col(idCol).as("id"),
        graft.functions.TextFunctions.fingerprint(
          coalesce(col(textCol), lit(""))).as(tag))
    fp(a, "__fa").join(fp(b, "__fb"), Seq("id"), "full_outer")
      .select(col("id").as(idCol),
        when(col("__fa").isNull, "added")
          .when(col("__fb").isNull, "removed")
          .when(col("__fa") === col("__fb"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** Apply a CDC change log to produce the current snapshot — the
    * insert/update/delete companion to [[upsert]] (which has no
    * delete) and [[latestByKey]] (which has no ops): per key, the
    * HIGHEST-`seqCol` operation wins; a winning delete removes the
    * key, a winning insert/update keeps its payload row. `(keyCols,
    * seqCol)` must be unique (a key with two ops at the same sequence
    * number has no defined winner — enforce upstream; typical seq =
    * a change LSN or event-time + log offset).
    *
    * `deleteOps` names the `opCol` values meaning delete; every other
    * op is an upsert. Returns the log's columns minus nothing —
    * downstream drops `opCol`/`seqCol` if unwanted.
    *
    * Plan: one exchange on the keys, one in-partition `row_number`
    * pass, one filter — the [[latestByKey]] shape, trivially
    * 100 TB-safe (no join against the base snapshot; compose with
    * [[upsert]] to fold into an existing table).
    */
  def applyChanges(
      log: DataFrame,
      keyCols: Seq[String],
      seqCol: String,
      opCol: String,
      deleteOps: Seq[String] = Seq("D", "delete")
  ): MayFail[DataFrame] = MayFail {
    require(keyCols.nonEmpty, "applyChanges needs at least one key column")
    require(deleteOps.nonEmpty, "deleteOps must name at least one op value")
    val rn = s"__rn_${java.util.UUID.randomUUID.toString.take(8)}"
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(seqCol).desc)
    log.withColumn(rn, row_number().over(w))
      .filter(col(rn) === 1)
      .filter(!col(opCol).isin(deleteOps.map(x => x: Any): _*))
      .drop(rn)
  }
}
