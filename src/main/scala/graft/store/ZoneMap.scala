package graft.store

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level zone maps — the Iceberg/Delta data-skipping pattern as
  * an explicit store-layer operator, completing the skipping ladder:
  * parquet row-group stats skip WITHIN a file the scan already
  * opened, E115 bloom filters skip row groups for POINT lookups,
  * E65 Z-order clusters multi-dim ranges; a zone map skips WHOLE
  * FILES from the driver's plan for RANGE predicates — at 100 TB the
  * difference between "open a million files to check their footers"
  * and "read a manifest, open forty" is the job's startup time.
  *
  * `writeZoneMap` computes per-file min/max of the stated columns in
  * ONE distributed pass over `_metadata.file_path` (no driver
  * filesystem walk, no footer-reading loop) and stores the manifest
  * beside the data; `prunedScan` intersects a range predicate with
  * the manifest (overlap test: NOT (max < lo OR min > hi) — NULL
  * stats rows are kept, skipping must never be wrong) and plans the
  * scan over exactly the surviving files, re-applying the predicate
  * for row-level exactness. The result CONTRACT is the plain filtered
  * scan — pruning is physical only, which is exactly what the oracle
  * checks (the q49 bucketed-join discipline); the file-subset claim
  * is spec-asserted from the scan's own numFiles metric.
  *
  * Effectiveness tracks layout: range-clustered files (range
  * repartition, Z-order, time-partitioned appends) prune hard;
  * uniformly shuffled files prune nothing — stated, and the
  * manifest's min/max WIDTH is the audit for that. Stale manifests
  * are refused loudly: prunedScan verifies the manifest covers
  * every current data file and errors otherwise (a silent partial
  * manifest would silently drop rows — the one failure mode a
  * skipper must not have). */
object ZoneMap {

  private def manifestPath(tablePath: String) = s"$tablePath/_zonemap"

  /** One row per data file: (file_path, <c>_min, <c>_max per col). */
  def writeZoneMap(spark: SparkSession, tablePath: String,
                   cols: Seq[String]): Unit = {
    require(cols.nonEmpty, "need at least one zone-map column")
    val aggs = cols.flatMap(c => Seq(
      min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max")))
    spark.read.parquet(tablePath)
      .groupBy(col("_metadata.file_path").as("file_path"))
      .agg(aggs.head, aggs.tail: _*)
      .coalesce(1)
      .write.mode("overwrite").parquet(manifestPath(tablePath))
  }

  /** Scan `tablePath` for rows with `zoneCol` in [lo, hi], reading
    * only files whose zone overlaps. `lo`/`hi` are literal Columns
    * (lit(...)) so callers keep their own types exact. */
  def prunedScan(spark: SparkSession, tablePath: String, zoneCol: String,
                 lo: Column, hi: Column): DataFrame = {
    val manifest = spark.read.parquet(manifestPath(tablePath))
    val mn = col(s"${zoneCol}_min"); val mx = col(s"${zoneCol}_max")
    val overlap = !(mx < lo || mn > hi) || mn.isNull || mx.isNull
    val all = manifest.select("file_path").collect().map(_.getString(0))
    val keep = manifest.filter(overlap)
      .select("file_path").collect().map(_.getString(0))
    // loud staleness gate: every CURRENT data file must be mapped
    val current = spark.read.parquet(tablePath)
      .select(col("_metadata.file_path")).distinct()
      .collect().map(_.getString(0))
    val unmapped = current.toSet -- all.toSet
    require(unmapped.isEmpty,
      s"zone map at ${manifestPath(tablePath)} is stale: " +
        s"${unmapped.size} unmapped data files (rewrite the manifest)")
    if (keep.isEmpty)
      spark.read.parquet(tablePath).filter(lit(false))
    else
      spark.read.parquet(keep.toSeq: _*)
        .filter(col(zoneCol) >= lo && col(zoneCol) <= hi)
  }
}
