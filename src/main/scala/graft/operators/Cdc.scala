package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Change-data-capture merge: apply a keyed changelog (upserts +
  * deletes, each versioned by a timestamp and a tiebreaking sequence)
  * to a base snapshot — the standard "materialize the current state"
  * step of any incremental 100 TB ingest (the MERGE INTO shape of
  * Delta/Iceberg, expressed as plain DataFrame ops).
  *
  * Scale shape: latest-wins is a COMBINABLE aggregation, not a window
  * — `groupBy(key).agg(max(struct(ts, seq, payload...)))`. A keyed
  * window (`row_number over (ts, seq) desc`) has no map-side partials,
  * so one hot entity — a row updated millions of times, the normal
  * CDC hub — serializes its whole changelog into a single task's
  * sort. The max-struct form partially aggregates on the map side:
  * the hub key's changelog collapses to one row per input partition
  * before the shuffle, so the reduce task sees O(partitions) rows per
  * key, not O(changes). `applyChanges` adds one anti-join of the base
  * against the (already reduced, one-row-per-key) latest changes; at
  * scale the reduced changelog of an incremental batch is small
  * relative to the base, so Spark broadcasts it into the anti-join
  * and the base is never shuffled.
  *
  * Determinism: the (ts, seq) version order must be total per key —
  * `seq` exists precisely so replays and equal-timestamp changes
  * resolve identically on any engine.
  */
object Cdc {

  /** THE version-ordering contract, in one place: the winning change
    * per key is the (ts, seq)-greatest row. Both public entry points
    * derive from this so they cannot drift.
    *
    * Implementation: `max(struct(ts, seq, payload...))` — struct
    * ordering compares fields left to right, so the winner is the
    * (ts, seq)-max row exactly as the window formulation picked it
    * ((ts, seq) is a total order per key by contract, so the trailing
    * payload fields never decide). Unlike a window, max() partially
    * aggregates map-side, so a hub key never concentrates its
    * changelog into one task. */
  private def latestVersions(changelog: DataFrame, key: String, ts: String,
                             seq: String): DataFrame = {
    val cols = changelog.columns.toSeq
    val payload = cols.filterNot(c => c == key || c == ts || c == seq)
    val packed = struct((Seq(ts, seq) ++ payload).map(col): _*)
    changelog.groupBy(col(key))
      .agg(max(packed).as("__w"))
      .select(cols.map(c =>
        if (c == key) col(key) else col("__w").getField(c).as(c)): _*)
  }

  /** Reduce a changelog to its latest state: one row per key — the
    * highest (ts, seq) version — with keys whose latest operation is
    * `deleteOp` dropped. Output: key column + the changelog's payload
    * columns of that winning row. */
  def latestState(changelog: DataFrame, key: String, ts: String,
                  seq: String, op: String, deleteOp: String = "D"): DataFrame =
    latestVersions(changelog, key, ts, seq).filter(col(op) =!= deleteOp)

  /** Merge a changelog into a base snapshot: upserted keys take their
    * latest changelog values, deleted keys disappear, untouched base
    * rows pass through. `setCols` maps each base column to the value
    * it takes for upserted rows (referencing changelog columns); base
    * rows keep their own values. Deleted-then-reinserted keys resolve
    * by the latest version like any other. */
  def applyChanges(base: DataFrame, changelog: DataFrame, key: String,
                   ts: String, seq: String, op: String,
                   setCols: Seq[(String, Column)],
                   deleteOp: String = "D"): DataFrame = {
    val latest = latestVersions(changelog, key, ts, seq)
    // every touched key (incl. deletes) leaves the base; non-delete
    // winners re-enter with their new values
    val touched = latest.select(col(key))
    val upserts = latest.filter(col(op) =!= deleteOp)
      .select(col(key) +: setCols.map { case (n, c) => c.as(n) }: _*)
    val kept = base.join(touched, Seq(key), "left_anti")
    kept.select(upserts.columns.map(col): _*).unionByName(upserts)
  }
}
