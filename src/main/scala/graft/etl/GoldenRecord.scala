package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Golden-record survivorship — the master-data-management merge that
  * completes the duplicate-handling family: [[Merge.dedupKeepFirst]]
  * keeps one ROW, [[Cdc.applyCdc]] keeps the last WRITE, SCD2 keeps
  * the history; survivorship builds the best COMPOSITE — per entity,
  * each FIELD independently takes its value from the latest version
  * where that field is NON-NULL ("most recent non-null wins", the
  * standard MDM survivorship rule). The difference from last-writer-
  * wins is exactly the per-field independence: a recent partial
  * update (email changed, phone null) must not erase the older phone.
  *
  * Determinism: each field is ONE `max(struct(version, value))` over
  * the non-null rows — lexicographic struct order means the version
  * decides and equal versions fall to the larger value, a pure
  * function of the row multiset under any partitioning (the
  * applyCdc discipline; never `max_by`, whose tie choice is
  * partitioning-dependent).
  *
  * Scale shape: a single entity-keyed hash aggregate computing all
  * fields at once — one shuffle, map-side partials collapse
  * per-entity history early, output bounded by the entity universe.
  * Returns (entityCol, fields…, n_rows); an all-null field for an
  * entity stays NULL (nothing survives — visible, not fabricated). */
object GoldenRecord {

  def goldenRecords(rows: DataFrame, entityCol: String, versionCol: String,
                    fields: Seq[String]): DataFrame = {
    require(fields.nonEmpty, "need at least one survivorship field")
    val aggs = fields.map(f =>
      max(when(col(f).isNotNull,
        struct(col(versionCol).as("v"), col(f).as("x")))).as(s"__$f")) :+
      count(lit(1)).as("n_rows")
    rows.groupBy(col(entityCol))
      .agg(aggs.head, aggs.tail: _*)
      .select(col(entityCol) +:
        fields.map(f => col(s"__$f.x").as(f)) :+ col("n_rows"): _*)
  }
}
