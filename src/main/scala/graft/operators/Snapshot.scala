package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus version diffing — the primitive behind incremental curation.
  * A 100 TB training corpus is rebuilt by DIFF, not from scratch: each
  * refresh ships the rows that were added, removed, or changed since the
  * previous snapshot, and every downstream stage (dedup, decontamination,
  * tokenization) reprocesses only that delta. Complements
  * [[Dedup.dedupAgainstCorpus]] (which handles the "new rows vs old
  * corpus" near-dup side); this is the exact keyed delta.
  */
object Snapshot {

  /** Full keyed diff of two snapshots: one row per key present in either
    * side, with `status` in {added, removed, changed, unchanged}.
    *
    * Implemented as a single full-outer shuffle join on the key columns —
    * the minimal data movement for an exact diff. Row content is compared
    * with null-safe struct equality over `compareCols` (`<=>` on a
    * struct), not a hash, so the verdict is exact (no collision caveat)
    * and reproducible in any engine. For wide payloads where shipping
    * both sides' full rows through the shuffle is the bottleneck, set
    * `hashed = true`: each side is reduced to an xxhash64 fingerprint of
    * the row's JSON rendering before the join, trading an astronomically
    * small collision risk (~n²/2⁶⁴ "changed" rows misreported
    * "unchanged") for a key+8-bytes-per-side shuffle. The JSON form tags
    * values with their field names (a null field is omitted WITH its
    * name), so a value migrating between columns across a null — which
    * raw multi-arg xxhash64 would deterministically collide, since it
    * skips null inputs — hashes differently. At scale, snapshots written bucketed
    * by key (PsIO.writeBucketed) make the join itself shuffle-free, so
    * successive diffs cost one co-located scan.
    *
    * Output: keyCols + status. Keys duplicated within one side are not
    * collapsed (the join is relational); feed keyed snapshots.
    */
  def snapshotDiff(
      oldSnap: DataFrame,
      newSnap: DataFrame,
      keyCols: Seq[String],
      compareCols: Seq[String],
      hashed: Boolean = false): DataFrame = {
    require(keyCols.nonEmpty && compareCols.nonEmpty,
      "snapshotDiff needs key and compare columns")
    def side(df: DataFrame, tag: String): DataFrame = {
      val payload =
        if (hashed) xxhash64(to_json(struct(compareCols.map(col): _*)))
        else struct(compareCols.map(col): _*)
      df.select(keyCols.map(col) :+ payload.as(s"__${tag}_v") :+
        lit(true).as(s"__${tag}_p"): _*)
    }
    val l = side(oldSnap, "old")
    val r = side(newSnap, "new")
    val joined = l.join(r, keyCols, "full_outer")
    val status = when(col("__old_p").isNull, "added")
      .when(col("__new_p").isNull, "removed")
      .when(col("__old_v") <=> col("__new_v"), "unchanged")
      .otherwise("changed")
    joined.select(keyCols.map(col) :+ status.as("status"): _*)
  }

  /** Apply a keyed change set to a snapshot — the MERGE/upsert of
    * parquet-only pipelines (what Delta's `MERGE INTO` compiles to
    * without a transaction log): a change row with `deleteCol` true
    * removes its key; any other change row replaces-or-inserts it.
    * `changes` carries the base columns plus the delete flag; within one
    * batch keys must be unique (pre-reduce a raw CDC feed with
    * [[graft.streaming.StreamingOps.streamingDelta]]'s ordering rule or
    * a keyed `row_number` take-latest).
    *
    * Plan: ONE shuffle — base left-anti change-keys (AQE broadcasts
    * small change batches, the common refresh shape) unioned with the
    * surviving (non-delete) change rows. Nothing rewrites but the rows
    * that move; write the result with `writeBucketed` on the key and the
    * next refresh's join is co-located. Closes the CDC loop with
    * [[snapshotDiff]]: applying the rows b differs from a AS changes to
    * a reproduces b (asserted as a round-trip law in CurationOpsSpec).
    */
  def applyChanges(
      base: DataFrame,
      changes: DataFrame,
      keyCols: Seq[String],
      deleteCol: String): DataFrame = {
    require(keyCols.nonEmpty, "applyChanges needs key columns")
    val survivors = changes.filter(!col(deleteCol)).select(
      base.columns.map(col).toIndexedSeq: _*)
    base.join(changes.select(keyCols.map(col): _*), keyCols, "left_anti")
      .unionByName(survivors)
  }
}
