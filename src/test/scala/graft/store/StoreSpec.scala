package graft.store

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class StoreSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("date", DateType, nullable = false),
    StructField("symbol", StringType, nullable = false),
    StructField("close", DoubleType, nullable = false)))

  private def bars(rows: (String, String, Double)*) =
    df(schema, rows.map { case (d, s, c) =>
      Row(java.sql.Date.valueOf(d), s, c) }: _*)
      .withColumn("month", date_format(col("date"), "yyyy-MM"))

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft-$name").resolve("t").toString

  test("writePartitioned lays out hive-style partition dirs") {
    val path = tmp("layout")
    val d = bars(("2024-01-05", "A", 1.0), ("2024-02-05", "A", 2.0),
      ("2024-02-06", "B", 3.0))
    Store.writePartitioned(d, path, "month", Seq("symbol", "date"))
    val dirs = new java.io.File(path).listFiles().filter(_.isDirectory)
      .map(_.getName).sorted
    dirs.toSeq shouldBe Seq("month=2024-01", "month=2024-02")
    assertSameRows(Store.readTable(spark, path), d)
  }

  test("expirePartitions drops only below-cutoff dirs, metadata-only, idempotent") {
    val path = tmp("expire")
    val d = bars(("2023-11-05", "A", 1.0), ("2023-12-05", "A", 2.0),
      ("2024-01-05", "B", 3.0), ("2024-02-05", "B", 4.0))
    Store.writePartitioned(d, path, "month", Seq("symbol", "date"))
    val keptBefore = new java.io.File(s"$path/month=2024-01").listFiles()
      .map(f => (f.getName, f.length, f.lastModified)).toSet
    val dropped = Store.expirePartitions(spark, path, "month", cutoff = "2024-01")
    dropped shouldBe Seq("2023-11", "2023-12")
    new java.io.File(path).listFiles().filter(_.isDirectory).map(_.getName)
      .sorted.toSeq shouldBe Seq("month=2024-01", "month=2024-02")
    // surviving partitions untouched (no rewrite, no mtime churn)
    new java.io.File(s"$path/month=2024-01").listFiles()
      .map(f => (f.getName, f.length, f.lastModified)).toSet shouldBe keptBefore
    // rows of surviving partitions fully readable
    Store.readTable(spark, path).count() shouldBe 2L
    // idempotent re-run
    Store.expirePartitions(spark, path, "month", "2024-01") shouldBe Seq.empty
  }

  test("partition-key predicates prune at plan level") {
    val path = tmp("prune")
    val d = bars(("2024-01-05", "A", 1.0), ("2024-02-05", "A", 2.0),
      ("2024-03-05", "A", 3.0))
    Store.writePartitioned(d, path, "month", Seq("symbol", "date"))
    val q = Store.readTable(spark, path).filter(col("month") === "2024-02")
    val physical = q.queryExecution.executedPlan.toString
    // Directory pruning: the month predicate must land in
    // PartitionFilters (skips directories), not PushedFilters.
    physical should include("PartitionFilters")
    physical should include regex "PartitionFilters: \\[.*month.*\\]"
    q.count() shouldBe 1L
  }

  test("bucketed tables join on the bucket key with zero exchanges") {
    val d = bars(("2024-01-05", "A", 1.0), ("2024-01-06", "A", 2.0),
      ("2024-01-05", "B", 3.0), ("2024-01-07", "C", 4.0)).drop("month")
    Store.writeBucketed(d, "bars_bucketed_l", "symbol", 4)
    Store.writeBucketed(d, "bars_bucketed_r", "symbol", 4)
    val l = spark.table("bars_bucketed_l")
    val r = spark.table("bars_bucketed_r").groupBy("symbol")
      .agg(org.apache.spark.sql.functions.max("close").as("max_close"))
    val joined = l.join(r, "symbol")
    val plan = joined.queryExecution.executedPlan.toString
    // co-located: bucket layout satisfies the join's distribution on
    // both sides - no shuffle exchange anywhere in the plan
    plan should not include "Exchange hashpartitioning"
    joined.count() shouldBe 4L
    spark.sql("DROP TABLE bars_bucketed_l")
    spark.sql("DROP TABLE bars_bucketed_r")
  }

  test("bloom filters skip row groups on point lookups that min/max stats cannot") {
    import org.apache.hadoop.fs.{Path => HPath}
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    val path = tmp("bloom")
    val n = 20000L
    // Scattered high-cardinality key (a permutation of 0..n-1, stride
    // coprime to n): every row group's — and every page's — min/max
    // straddles nearly the full key range, so stats and column-index
    // skipping are useless for a point lookup. This is the 100 TB
    // doc_id-inside-a-date-partition shape the bloom filter exists for.
    val d = spark.range(n).select(
      (col("id") * 7919 % n).as("doc_id"),
      lit("2024-01").as("month"),
      col("id").as("payload"))
    d.coalesce(1).write.mode("overwrite")
      .options(Store.bloomFilterOptions(Seq("doc_id"), ndv = 4000))
      .option("parquet.block.size", (64 * 1024).toString) // many row groups
      .partitionBy("month").parquet(path)

    // Footer half: the filter is physically present per row group, and
    // for a point probe most groups answer "definitely absent".
    val conf = spark.sparkContext.hadoopConfiguration
    val pDir = new HPath(s"$path/month=2024-01")
    val file = pDir.getFileSystem(conf).listStatus(pDir)
      .map(_.getPath).filter(_.getName.endsWith(".parquet")).head
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    val probe = 12345L
    val (mayContain, excluded) = try {
      val groups = reader.getRowGroups.asScala.toSeq
      groups.size should be >= 3
      val verdicts = groups.map { rg =>
        val cd = rg.getColumns.asScala.find(_.getPath.toDotString == "doc_id").get
        val bloom = reader.getBloomFilterDataReader(rg).readBloomFilter(cd)
        bloom should not be null
        bloom.findHash(bloom.hash(probe))
      }
      (verdicts.count(identity), verdicts.count(!_))
    } finally reader.close()
    mayContain should be >= 1 // the value exists exactly once
    excluded should be >= 1   // and most groups can prove they lack it

    // Scan half: the reader acts on the filter — the same point lookup
    // reads fewer rows with bloom filtering than without, while stats
    // alone (bloom read-path disabled) cannot skip any row group.
    def scannedRows(bloomRead: Boolean): Long = {
      val q = spark.read
        .option("parquet.filter.bloom.enabled", bloomRead.toString)
        .parquet(path).filter(col("doc_id") === probe)
      q.collect().length shouldBe 1
      import org.apache.spark.sql.execution.FileSourceScanExec
      q.queryExecution.executedPlan
        .collect { case s: FileSourceScanExec => s }
        .head.metrics("numOutputRows").value
    }
    val withBloom = scannedRows(bloomRead = true)
    val without = scannedRows(bloomRead = false)
    withBloom should be < without
    withBloom should be <= n / 2  // most row groups skipped
    without should be >= (n * 9) / 10 // stats skipped ~nothing
  }

  test("maxRecordsPerFile rolls a giant partition into sorted bounded files") {
    val path = tmp("maxrec")
    val d = spark.range(20000).select(
      (col("id") % 25).cast("string").as("symbol"),
      lit("2024-01").as("month"),
      col("id").as("volume"))
    Store.writePartitioned(d, path, "month", Seq("symbol"),
      maxRecordsPerFile = 5000L)
    val dir = new java.io.File(s"$path/month=2024-01")
    val files = dir.listFiles().filter(_.getName.endsWith(".parquet"))
    files.length shouldBe 4 // 20000 / 5000, rolled sequentially
    // each rolled file is still internally sorted on the cluster key
    files.foreach { f =>
      val syms = spark.read.parquet(f.getPath).select("symbol")
        .collect().map(_.getString(0)).toSeq
      syms shouldBe syms.sorted
    }
    spark.read.parquet(path).count() shouldBe 20000L
  }

  test("zstd default beats snappy on the cluster-sorted layout, losslessly") {
    // The size claim behind the codec default, measured on this exact
    // layout (sorted columns hand the codec long similar-value runs).
    import org.apache.spark.sql.functions.rand
    val d = spark.range(30000).select(
      (col("id") % 25).cast("string").as("symbol"),
      lit("2024-01").as("month"),
      (rand(42) * 1000).as("close"),
      col("id").as("volume"))
    def dirSize(p: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isFile) f.length
        else Option(f.listFiles).map(_.map(walk).sum).getOrElse(0L)
      walk(new java.io.File(p))
    }
    val zstdPath = tmp("codec-zstd"); val snappyPath = tmp("codec-snappy")
    Store.writePartitioned(d, zstdPath, "month", Seq("symbol"))
    Store.writePartitioned(d, snappyPath, "month", Seq("symbol"), codec = "snappy")
    val (z, s) = (dirSize(zstdPath), dirSize(snappyPath))
    z should be < s
    assertSameRows(spark.read.parquet(zstdPath), spark.read.parquet(snappyPath))
  }

  test("sorted layout gets page-level skipping via the parquet column index") {
    // The other half of the layout contract: the in-file cluster sort
    // doesn't just enable row-group min/max skipping — parquet's
    // column index (page-level min/max, written by default) lets the
    // reader select individual PAGES inside a surviving row group.
    // Fixture is one 20k-row row group (so row-group stats alone can
    // skip nothing) at 4 KiB pages; a point lookup on the sorted key
    // must read only the pages containing it.
    val path = tmp("colindex")
    spark.range(20000)
      .select(col("id").as("symbol_id"), lit("2024-01").as("month"),
        col("id").as("payload"))
      .coalesce(1).sortWithinPartitions("symbol_id")
      .write.mode("overwrite")
      .option("parquet.page.size", (4 * 1024).toString)
      .partitionBy("month").parquet(path)
    def scannedRows(colIndex: Boolean): Long = {
      val q = spark.read
        .option("parquet.filter.columnindex.enabled", colIndex.toString)
        .parquet(path).filter(col("symbol_id") === 12345L)
      q.collect().length shouldBe 1
      import org.apache.spark.sql.execution.FileSourceScanExec
      q.queryExecution.executedPlan
        .collect { case s: FileSourceScanExec => s }
        .head.metrics("numOutputRows").value
    }
    val withIndex = scannedRows(colIndex = true)
    val without = scannedRows(colIndex = false)
    without shouldBe 20000L          // one row group: stats skip nothing
    withIndex should be < without / 10 // pages, not the whole group
  }

  test("ANALYZE TABLE feeds row counts to the CBO (catalog stats wiring)") {
    // The reference's BigQuery tables get statistics for free; the
    // parquet-catalog equivalent is ANALYZE TABLE. Before: the
    // optimizer sees only a file-size estimate (no row count). After:
    // the catalog carries an exact rowCount the CBO can plan joins
    // and aggregates with.
    val path = tmp("analyze")
    val d = bars(("2024-01-05", "A", 1.0), ("2024-01-06", "B", 2.0),
      ("2024-02-05", "C", 3.0))
    Store.writePartitioned(d, path, "month", Seq("symbol", "date"))
    Store.createTable(spark, "bars_analyze_test", path)
    withSQLConf("spark.sql.cbo.enabled" -> "true") {
      def rowCount: Option[BigInt] =
        spark.table("bars_analyze_test")
          .queryExecution.optimizedPlan.stats.rowCount
      rowCount shouldBe None
      spark.sql("ANALYZE TABLE bars_analyze_test COMPUTE STATISTICS")
      rowCount shouldBe Some(BigInt(3))
    }
    spark.sql("DROP TABLE bars_analyze_test")
  }

  test("createTable registers a partitioned catalog table (K8) and the view runs (K9)") {
    val path = tmp("ddl")
    val d = bars(("2024-01-05", "A", 10.0), ("2024-01-05", "A", 12.0),
      ("2024-02-06", "B", 20.0))
      .withColumn("data_source", lit("alpha_vantage"))
      .withColumn("daily_volatility", lit(1.5))
    Store.writePartitioned(d, path, "month", Seq("symbol", "date"))
    Store.createTable(spark, "bars_ddl_test", path)
    spark.table("bars_ddl_test").count() shouldBe 3L
    Store.createDailyMetricsView(spark, "bars_ddl_test", "dm_test")
    val r = spark.table("dm_test").orderBy("date", "symbol")
      .select("symbol", "close_price", "source_count")
      .as[(String, Double, Long)].collect()
    r.toSeq shouldBe Seq(("A", 10.0, 1L), ("B", 20.0, 1L))
    spark.sql("DROP VIEW dm_test")
    spark.sql("DROP TABLE bars_ddl_test")
  }

  test("evolvedRead: added columns merge, older generations read NULL") {
    val base = tmp("evolve")
    Seq((1L, 10L), (2L, 20L)).toDF("k", "v")
      .write.parquet(base + "/g1")
    Seq((3L, 30L, "x"), (4L, 40L, "y")).toDF("k", "v", "tag")
      .write.parquet(base + "/g2")
    val out = Store.evolvedRead(spark, Seq(base + "/g1", base + "/g2"))
      .orderBy("k").collect()
    out.map(_.schema.fieldNames.toSet).head shouldBe Set("k", "v", "tag")
    out.map(r => (r.getAs[Long]("k"),
      Option(r.getAs[String]("tag")))).toSeq shouldBe
      Seq(1L -> None, 2L -> None, 3L -> Some("x"), 4L -> Some("y"))
  }

  test("compact: file count collapses to the target, content survives exactly") {
    val base = tmp("compactsp")
    val d = (1 to 500).map(i => (i.toLong, s"r$i")).toDF("k", "v")
    d.repartition(32).write.parquet(base + "/in")
    def parquetFiles(p: String) =
      new java.io.File(p).listFiles.count(_.getName.endsWith(".parquet"))
    parquetFiles(base + "/in") shouldBe 32
    val out = Store.compact(spark, base + "/in", base + "/out",
      targetFiles = 3)
    parquetFiles(base + "/out") shouldBe 3
    out.collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq shouldBe
      (1 to 500).map(i => (i.toLong, s"r$i"))
  }
}
