package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture APPLY — the lakehouse "apply changes" primitive
  * that [[Upsert]] (unique-key staging set) and [[Scd]] (full history)
  * bracket but neither provides: a raw CDC LOG carries MANY operations
  * per key (Debezium/binlog shape: inserts, updates, deletes,
  * out-of-order, replayed), and applying it means last-writer-wins
  * per key THEN merge, with delete tombstones actually deleting.
  *
  * Winner selection is ONE aggregate: max over the
  * (version, op, payload…) struct — lexicographic field order, so the
  * version decides, ties fall to the op then the payload columns, and
  * the result is a pure function of the log's ROWS (deterministic
  * under any partitioning and any replay duplication — the same row
  * twice picks the same winner; the keepBestAudit discipline without
  * the second pass, since the struct max carries the payload along).
  *
  * Apply = target rows whose key is untouched (one anti-join) plus
  * every winner that is not a tombstone. Delete-wins-tie at equal
  * version is the struct order's 'U' > 'I' > 'D' only through the op
  * STRING ordering — stated: at equal version the lexicographically
  * LARGEST op wins ('U' > 'I' > 'D'), so an equal-version
  * update-vs-delete resolves to the update; producers that need
  * delete-wins must version the delete higher (what real CDC streams
  * do — a delete always carries a later LSN).
  *
  * Scale shape: one log aggregate keyed on the CDC keys (map-side
  * combine collapses replays), one broadcast-able anti-join of the
  * winner KEY SET against the target, one union. The target is
  * scanned once and never shuffled; cost ∝ |log| + touched keys, the
  * [[Upsert.upsertPartitioned]] argument one level up. */
object Cdc {

  /** Apply `log` to `target`. `log` must carry the key columns,
    * `versionCol`, `opCol` ('I'/'U' upsert, 'D' delete), and exactly
    * the target's non-key columns as payload. Returns the new target
    * frame (same schema as `target`). */
  def applyCdc(target: DataFrame, log: DataFrame, keys: Seq[String],
               versionCol: String, opCol: String = "op"): DataFrame = {
    val payload = target.columns.filterNot(keys.contains).toSeq
    val missing = (keys ++ Seq(versionCol, opCol) ++ payload)
      .filterNot(log.columns.contains)
    require(missing.isEmpty, s"log is missing columns: ${missing.mkString(",")}")
    val winners = log
      .groupBy(keys.map(col): _*)
      .agg(max(struct((versionCol +: opCol +: payload).map(col): _*))
        .as("__w"))
      .select(keys.map(col) :+ col("__w.*"): _*)
    val untouched = target.join(
      winners.select(keys.map(col): _*), keys, "left_anti")
    untouched.unionByName(
      winners.filter(col(opCol) =!= "D")
        .select(target.columns.map(col).toSeq: _*))
  }
}
