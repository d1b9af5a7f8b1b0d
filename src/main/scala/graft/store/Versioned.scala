package graft.store

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StringType, StructField}

import graft.etl.Upsert

/** Versioned (time-travel) parquet tables — the lakehouse snapshot
  * model in its minimal honest form: data lives in per-partition,
  * per-version directories and every table version is a MANIFEST
  * mapping each logical partition to the data version that last
  * rewrote it. A commit writes ONLY the partitions it touches and a
  * new manifest that points every untouched partition at its existing
  * files — old versions stay readable forever (until expired), and
  * readers of version N never see version N+1's files.
  *
  * Layout:
  * {{{
  *   table/data/<part>=<v>/__dv=<k>/part-*.parquet  // immutable once written
  *   table/_manifests/v<k>.json                     // {"<part>=<v>": dataVersion}
  *   table/_manifests/schema_v<k>.json              // data-file schema (StructType JSON)
  * }}}
  *
  * The data-version level is itself a key=value directory (`__dv=k`)
  * so Spark's partition discovery stays consistent — readers drop the
  * synthetic `__dv` column.
  *
  * Scale notes: the manifest is partition-count-sized (driver-safe —
  * the same bound hive metastores live with); a commit's IO is the
  * touched partitions only (the [[graft.etl.Upsert.upsertPartitioned]]
  * cost model); reads prune to the manifest's file list and recover
  * the partition column via basePath. Writers are single-process (the
  * reference's loader model) — manifest publication is the atomic
  * commit point, so a crash mid-write leaves the previous version
  * intact (data dirs without a manifest pointer are garbage, never
  * corruption).
  */
object Versioned {

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestPath(table: String, v: Int) =
    new Path(s"$table/_manifests/v$v.json")

  private def schemaPath(table: String, v: Int) =
    new Path(s"$table/_manifests/schema_v$v.json")

  /** Latest committed version, 0 if none. */
  def currentVersion(spark: SparkSession, table: String): Int = {
    val dir = new Path(s"$table/_manifests")
    val f = fs(spark, table)
    if (!f.exists(dir)) 0
    else f.listStatus(dir).map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".json") =>
        n.stripPrefix("v").stripSuffix(".json").toInt }
      .foldLeft(0)(math.max)
  }

  /** Partition-dir name for a logical partition value — the SAME
    * Hive-escaping `partitionBy` applies when laying out directories
    * (space survives; '=', '%', ':', '/', quotes, control chars →
    * %XX), so manifest keys always equal the on-disk dir names and a
    * value like "a:b" commits AND reads back. Escaped names contain no
    * '"', '\' or control chars, which is what makes the naive JSON
    * renderer below exact (VersionedSpec holds a ScalaCheck property
    * over this). Null/empty values are rejected at commit: a NULL
    * partition key in a versioned table is a modeling error, not a
    * layout problem. */
  private[store] def partitionDirName(col: String, value: String): String = {
    require(value != null && value.nonEmpty,
      s"versioned tables require non-null, non-empty '$col' partition values")
    s"$col=${org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName(value)}"
  }

  /** Flat JSON object {"partition": version}; keys are partition-dir
    * names ("month=1998-01"). Sorted for reproducible bytes. */
  private[store] def renderManifest(m: Map[String, Int]): String =
    m.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k": $v""" }
      .mkString("{", ", ", "}")

  private[store] def parseManifest(s: String): Map[String, Int] =
    "\"([^\"]+)\"\\s*:\\s*(\\d+)".r.findAllMatchIn(s)
      .map(m => m.group(1) -> m.group(2).toInt).toMap

  def readManifest(spark: SparkSession, table: String, v: Int): Map[String, Int] = {
    val p = manifestPath(table, v)
    val f = fs(spark, table)
    require(f.exists(p), s"no manifest for version $v at $p")
    val in = f.open(p)
    val bytes = try {
      val out = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, out, 8192, false)
      out.toByteArray
    } finally in.close()
    parseManifest(new String(bytes, StandardCharsets.UTF_8))
  }

  private def writeManifest(spark: SparkSession, table: String, v: Int,
                            m: Map[String, Int]): Unit = {
    val p = manifestPath(table, v)
    val f = fs(spark, table)
    require(!f.exists(p), s"version $v already committed")
    val out = f.create(p, false)
    try out.write(renderManifest(m).getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Commit `df` as the next table version, rewriting ONLY the
    * `partitionCol` partitions present in `df`. MERGE semantics per
    * touched partition against the previous version on `keys` (pass
    * `keys = Nil` for whole-partition replacement). Returns the new
    * version number. */
  def commit(spark: SparkSession, table: String, df: DataFrame,
             partitionCol: String, keys: Seq[String]): Int = {
    val prev = currentVersion(spark, table)
    val next = prev + 1
    val prevManifest =
      if (prev == 0) Map.empty[String, Int] else readManifest(spark, table, prev)
    // touched logical partitions: a tiny distinct (partition universe
    // scale), collected to name the rewrite dirs
    val touchedRaw = df.select(col(partitionCol).cast("string")).distinct()
      .collect().map(_.getString(0))
    // Validate BEFORE sorting (null poisons String ordering) and before
    // any data is written, so a bad partition value aborts with zero IO.
    require(touchedRaw.forall(v => v != null && v.nonEmpty),
      s"versioned tables require non-null, non-empty '$partitionCol' partition values")
    val touched = touchedRaw.sorted
    val touchedDirs = touched.map(pv => partitionDirName(partitionCol, pv))
    val merged = if (prev > 0 && keys.nonEmpty) {
      val touchedPrev = readVersion(spark, table, prev)
        .filter(col(partitionCol).cast("string").isInCollection(touched))
      // A MERGE commit aligns the staging frame to the previous
      // version's schema; a column the target doesn't have would be
      // silently DROPPED by the alignment select, so reject it loudly.
      // Additive schema evolution goes through whole-partition commits
      // (keys = Nil): the new version's persisted schema carries the
      // new column and untouched partitions' older files read it back
      // as NULL (VersionedSpec pins this).
      val unknown = df.columns.filterNot(touchedPrev.columns.toSet)
      require(unknown.isEmpty,
        s"MERGE commit would drop columns not in the target schema: " +
          s"${unknown.mkString(", ")}; evolve the schema with a " +
          "whole-partition commit (keys = Nil) first")
      Upsert.upsert(touchedPrev, df.select(touchedPrev.columns.map(col): _*), keys)
    } else df
    // ONE dynamic-partition job writes every touched partition:
    // partitionBy(partitionCol, __dv) lays files out exactly as
    // data/<part>=<v>/__dv=<next>/part-*.parquet. Dynamic overwrite
    // touches only the (partition, __dv=next) leaves present in the
    // DataFrame — other versions' directories are untouched, and a
    // retried crashed commit (same `next`, no manifest yet) replaces
    // its own partial leaves instead of appending duplicates. A
    // per-partition write loop here would run one Spark job —
    // re-executing the whole merge plan — per partition (~hundreds of
    // sequential jobs for a month-partitioned table).
    merged
      .withColumn(partitionCol, col(partitionCol).cast("string"))
      .withColumn("__dv", lit(next))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCol, "__dv")
      .parquet(s"$table/data")
    // Persist the DATA-FILE schema (non-partition columns) next to the
    // manifest BEFORE publication: readers then reconstruct the full
    // read schema from driver-side JSON — zero parquet-footer reads at
    // plan construction, and the partition column type is pinned
    // rather than re-inferred per read.
    val dataSchema = org.apache.spark.sql.types.StructType(
      merged.schema.filterNot(f => f.name == partitionCol))
    val sf = fs(spark, table)
    val out = sf.create(schemaPath(table, next), true) // overwrite: a
    // retried crashed commit replaces its own partial schema file
    try out.write(dataSchema.json.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    val manifest = prevManifest ++ touchedDirs.map(_ -> next)
    writeManifest(spark, table, next, manifest)
    next
  }

  /** Read table contents as of version `v` — exactly the files that
    * version's manifest points to; later commits are invisible. The
    * partition column is recovered from the directory names via
    * basePath.
    *
    * Fanout bound: every manifest partition becomes one input dir, so
    * plan construction is O(partitions) listing — the same bound a
    * hive metastore's partition enumeration lives with. Above
    * `spark.sql.sources.parallelPartitionDiscovery.threshold` (32)
    * Spark distributes the listing as a job, so wall-clock scales with
    * partitions/parallelism. Measured (round 8, local[4], warm FS,
    * `VersionedProbe`): ~3-5 s at 10^3 dirs; 27.5 s at 10^4 dirs with
    * this explicit-schema path (the old inference path took 54.5 s on
    * the same table — the persisted-schema read also halves plan
    * construction). Linear in dirs as predicted, the edge of
    * interactive at 10^4; construction itself is footer-free (schema
    * comes from the persisted JSON). Beyond ~10^5 partitions the
    * right fix is a coarser partitioning, not a smarter reader.
    * VersionedSpec pins the 10^3 steady-state case. */
  /** What [[vacuum]] did: which versions survive, which manifests were
    * expired, and how many unreferenced `<part>/__dv=<k>` leaf
    * directories were deleted. */
  final case class VacuumStats(retained: Seq[Int], expired: Seq[Int],
                               deletedLeafDirs: Int)

  /** Retention: keep the newest `keepVersions` table versions and
    * delete everything else — expired manifests (+ their schema
    * files) and every `data/<part>/__dv=<k>` leaf directory no
    * retained manifest references. Because a commit rewrites only
    * touched partitions, an old data version stays live as long as ANY
    * retained manifest still points at it, so vacuum never breaks a
    * retained version: the reclaimable set is exactly the leaves all
    * retained manifests have moved past. Orphan leaves from crashed
    * commits (data written, manifest never published) are unreferenced
    * by construction and are collected too — the store is
    * single-writer (see the class doc), so at vacuum time an
    * unreferenced leaf is garbage, never an in-flight commit.
    *
    * Cost: O(partitions × live data versions) driver-side listing —
    * the same partition-enumeration bound [[readVersion]]'s plan
    * construction and every hive metastore lives with. Deletes are
    * O(reclaimed leaves). Beyond ~10^5 partitions the listing should
    * ride a distributed job (the parallelPartitionDiscovery precedent);
    * at that scale the right fix is a coarser partitioning. */
  def vacuum(spark: SparkSession, table: String,
             keepVersions: Int): VacuumStats = {
    require(keepVersions >= 1, s"keepVersions must be >= 1, got $keepVersions")
    val f = fs(spark, table)
    val mDir = new Path(s"$table/_manifests")
    if (!f.exists(mDir)) return VacuumStats(Nil, Nil, 0)
    val versions = f.listStatus(mDir).map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".json") =>
        n.stripPrefix("v").stripSuffix(".json").toInt }
      .sorted.toSeq
    val retained = versions.takeRight(keepVersions)
    val expired = versions.dropRight(keepVersions)
    // Union of (partition dir, data version) pairs any retained
    // manifest still points at — manifest-sized, driver-safe.
    val referenced: Set[(String, Int)] = retained
      .flatMap(v => readManifest(spark, table, v).map {
        case (part, dv) => (part, dv) }).toSet
    val dataDir = new Path(s"$table/data")
    var deleted = 0
    if (f.exists(dataDir)) {
      for (partStatus <- f.listStatus(dataDir)
           if partStatus.isDirectory && partStatus.getPath.getName.contains("=")) {
        val partName = partStatus.getPath.getName
        val leaves = f.listStatus(partStatus.getPath).filter(s =>
          s.isDirectory && s.getPath.getName.startsWith("__dv="))
        for (leaf <- leaves) {
          val dv = leaf.getPath.getName.stripPrefix("__dv=").toInt
          if (!referenced.contains((partName, dv))) {
            f.delete(leaf.getPath, true)
            deleted += 1
          }
        }
        // A partition every retained manifest has dropped (or that was
        // only ever orphan data) ends up empty — remove the husk so
        // future partition listings don't pay for it.
        if (f.listStatus(partStatus.getPath).isEmpty)
          f.delete(partStatus.getPath, false)
      }
    }
    for (v <- expired) {
      f.delete(manifestPath(table, v), false)
      val sp = schemaPath(table, v)
      if (f.exists(sp)) f.delete(sp, false)
    }
    VacuumStats(retained, expired, deleted)
  }

  def readVersion(spark: SparkSession, table: String, v: Int): DataFrame = {
    val manifest = readManifest(spark, table, v)
    require(manifest.nonEmpty, s"version $v is empty")
    val sorted = manifest.toSeq.sortBy(_._1)
    val dirs = sorted.map { case (part, dv) => s"$table/data/$part/__dv=$dv" }
    // Partition values must come back as the exact strings commit()
    // wrote. Left to directory-name TYPE INFERENCE, numeric-looking
    // values coerce ("0042" -> int 42, "1e3" -> double 1000.0); cast
    // back to string they no longer equal the logical value, so the
    // merge path's touched-partition filter matches nothing and a
    // MERGE commit silently REPLACES the partition. The read therefore
    // gets an explicit schema — the data-file schema commit() persisted
    // next to the manifest (falling back to one leaf footer for tables
    // written before schema persistence) plus the partition columns
    // pinned to (string, int) — because user-specified partition types
    // disable inference and keep the (unescaped) dir value verbatim.
    // Side benefit: construction does zero parquet-footer IO.
    val partCol = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
      .unescapePathName(sorted.head._1.takeWhile(_ != '='))
    val sp = schemaPath(table, v)
    val f = fs(spark, table)
    val dataSchema =
      if (f.exists(sp)) {
        val in = f.open(sp)
        val bytes = try {
          val out = new java.io.ByteArrayOutputStream()
          org.apache.hadoop.io.IOUtils.copyBytes(in, out, 8192, false)
          out.toByteArray
        } finally in.close()
        org.apache.spark.sql.types.DataType
          .fromJson(new String(bytes, StandardCharsets.UTF_8))
          .asInstanceOf[org.apache.spark.sql.types.StructType]
      } else spark.read.parquet(dirs.head).schema
    val full = dataSchema
      .add(StructField(partCol, StringType, nullable = false))
      .add(StructField("__dv", IntegerType, nullable = false))
    spark.read.schema(full).option("basePath", s"$table/data").parquet(dirs: _*)
      .drop("__dv")
  }
}
