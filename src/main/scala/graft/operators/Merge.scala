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
