package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}
import org.apache.spark.sql.types._

import graft.core.Exact
import graft.etl.Upsert

/** Structured Streaming re-expression of the ingest pipeline
  * (SURVEY.md §2.10): file-source event stream → watermarked dedup
  * (the streaming form of the keep-first dedup A2) → tumbling
  * event-time windows (the streaming form of the daily batch cadence)
  * → foreachBatch MERGE into the stored table (the streaming form of
  * the K7 upsert, handling late re-delivered data).
  *
  * The batch twins live in [[graft.events.EventAnalytics]] and
  * [[graft.etl.Upsert]] — same semantics, verified against each other
  * in the test suite (batch-streaming equivalence is the correctness
  * contract Structured Streaming is built on).
  *
  * Scale: state stores are keyed by (window, event_type) for the
  * aggregation and by event_id for the dedup — both bounded by the
  * watermark horizon; nothing accumulates unboundedly.
  */
object Streaming {

  /** The events table schema (TESTDATA.md), micro-second timestamps. */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false),
    StructField("props", StringType, nullable = true)))

  /** File-source ingest: new parquet files under `dir` become
    * micro-batches (the streaming analog of the reference's daily
    * landing directory). */
  def readEventsStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventsSchema).parquet(dir)

  /** Streaming dedup on event_id with a watermark: duplicates arriving
    * within `watermark` of the original are dropped; state for older
    * ids is evicted. The streaming A2. */
  def dedupWithinWatermark(events: DataFrame,
                           watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Watermarked tumbling-window aggregation — the streaming twin of
    * [[graft.events.EventAnalytics.windowedStats]] minus the distinct
    * count (distinct aggregation is unsupported over streams; the
    * scale substitute is approx_count_distinct). */
  def windowedStats(events: DataFrame, duration: String = "1 hour",
                    watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), duration).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        Exact.exactSum(col("value"), 6).as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Watermarked gap-session aggregation — the streaming twin of
    * [[graft.events.EventAnalytics.sessionize]], on Spark's native
    * `session_window` (merging state store windows, closed and
    * emitted once the watermark passes a session's end — bounded
    * state, the scale path for billions of users).
    *
    * Boundary semantics vs the batch operator, pinned by spec: each
    * event opens a window [t, t + gap) and windows MERGE when one
    * starts at-or-before another's end — so an event at EXACTLY
    * last + gap lands touching the open session's end and EXTENDS it,
    * the same `<= gap`-stays decision batch `sessionize` makes
    * (`> gapUs` starts new). Round 12 documented the opposite
    * (half-open exclusion of the exact-gap event); the tie spec in
    * StreamingSpec falsified that — the operators agree on ties, and
    * the session extent is [first, last + gap). */
  def sessionStats(events: DataFrame, gap: String = "30 minutes",
                   watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        Exact.exactSum(col("value"), 6).as("total_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("total_value"))

  /** foreachBatch MERGE sink: every micro-batch is upserted into the
    * date-partitioned parquet table at `tablePath` on `keys`
    * (late/duplicate rows update in place — the reference's K7 for
    * streams). The table is partitioned by `partitionCol` (derived
    * from the batch via `partitionExpr`) and each batch rewrites ONLY
    * the partitions it touches, through
    * [[graft.etl.Upsert.upsertPartitioned]]'s crash-recoverable
    * staged-slice commit — a minute-level micro-batch costs a
    * partition's worth of IO, never a table scan, and a crash
    * mid-commit is replayed from the staged slice on the next batch.
    * Exactly-once = checkpointed batch replay + idempotent merge. */
  def upsertSink(stream: DataFrame, tablePath: String, keys: Seq[String],
                 checkpointDir: String, partitionCol: String = "event_date",
                 partitionExpr: DataFrame => Column = df => to_date(df("ts")))
      : DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val withPart = batch.withColumn(partitionCol, partitionExpr(batch))
        // An empty batch (restart replay, data-less trigger) must write
        // NOTHING: an initial zero-row write would leave a schema-less
        // parquet dir (only _SUCCESS) that wedges every later batch's
        // upsertPartitioned read. Table creation waits for real rows.
        if (!withPart.isEmpty) {
          val fs = new Path(tablePath)
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
          if (!fs.exists(new Path(tablePath)))
            withPart.write.mode("overwrite").partitionBy(partitionCol)
              .parquet(tablePath)
          else
            Upsert.upsertPartitioned(spark, tablePath, withPart, keys, partitionCol)
        }
        ()
      }

  /** Idempotent APPEND sink — exactly-once for KEYLESS streams, the
    * complement to [[upsertSink]] (whose idempotence rides on MERGE
    * keys; an append-only fact stream has none). The mechanism is a
    * per-batch commit ledger with write-ahead ordering:
    *
    *   1. data lands in `tablePath/batch=<id>/` with OVERWRITE — a
    *      crashed half-write of the same batch is clobbered whole by
    *      the engine's replay of that epoch, never appended twice;
    *   2. only then is the zero-byte marker `_ledger/<id>` created —
    *      the marker IS the commit point;
    *   3. a re-delivered batch finds its marker and writes NOTHING
    *      (post-crash replay of the last epoch is the normal case,
    *      not an error);
    *   4. readers go through [[readCommitted]], which lists the
    *      ledger and reads exactly the committed batch dirs — a
    *      half-written uncommitted dir is invisible.
    *
    * Scale: the ledger is one tiny file per micro-batch (a listing of
    * it is minutes-cadence metadata, not data); each batch touches
    * only its own dir, so batch cost is batch-sized forever. Batch
    * dirs are the compaction units for E54 when they accumulate. */
  def appendBatch(batch: DataFrame, batchId: Long, tablePath: String): Boolean = {
    val spark = batch.sparkSession
    val fs = new Path(tablePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new Path(tablePath, s"_ledger/$batchId")
    if (fs.exists(marker)) return false
    batch.write.mode("overwrite")
      .parquet(new Path(tablePath, s"batch=$batchId").toString)
    fs.mkdirs(marker.getParent)
    fs.createNewFile(marker)
    true
  }

  /** Read exactly the committed batches of an [[appendBatch]] table.
    * Batch dirs are enumerated FROM THE LEDGER (not globbed), so
    * uncommitted half-writes never surface. */
  def readCommitted(spark: SparkSession, tablePath: String): DataFrame = {
    val fs = new Path(tablePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ledger = new Path(tablePath, "_ledger")
    val ids =
      if (!fs.exists(ledger)) Array.empty[String]
      else fs.listStatus(ledger).map(_.getPath.getName)
    if (ids.isEmpty)
      spark.emptyDataFrame
    else
      spark.read.parquet(
        ids.map(id => new Path(tablePath, s"batch=$id").toString).toSeq: _*)
  }

  /** Streaming CDC apply — [[graft.etl.Cdc.applyCdc]] per micro-batch
    * onto a parquet target: the lakehouse apply-changes stream,
    * completing the sink matrix (K7-MERGE [[upsertSink]] for
    * keyed upserts, [[idempotentAppendSink]] for keyless appends,
    * THIS for full change logs with deletes and many-ops-per-key).
    * Exactly-once rides on the same two pillars as upsertSink:
    * checkpointed replay + an IDEMPOTENT apply (applyCdc's
    * struct-max winner per key is a pure function of the log rows,
    * so re-applying a replayed batch on top of its own result is a
    * no-op — the winner beats-or-equals the applied row's version).
    * First batch with no target yet: upsert ops create the table,
    * tombstones on a non-existent table are no-ops by definition.
    *
    * Cost per batch: applyCdc's winner aggregate over the BATCH +
    * one anti-join against the target — at 100 TB the target side
    * of that anti-join wants the partition-bounded Upsert path;
    * this sink states the whole-table rewrite as the simple form
    * and defers partition pruning to upsertSink's machinery. */
  def cdcSink(stream: DataFrame, tablePath: String, keys: Seq[String],
              versionCol: String, checkpointDir: String,
              opCol: String = "op"): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyCdcBatch(batch, tablePath, keys, versionCol, opCol)
        ()
      }

  /** One CDC micro-batch applied to the parquet table at `tablePath`
    * (factored out so the spec drives replay semantics directly). */
  def applyCdcBatch(batch: DataFrame, tablePath: String, keys: Seq[String],
                    versionCol: String, opCol: String): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    val fs = new Path(tablePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val next =
      if (!fs.exists(new Path(tablePath))) {
        // no target yet: winners among upserts ARE the table. The
        // empty target is built from a FRESH schema, not from the
        // batch's plan — deriving it from `batch` would alias the
        // apply's anti-join to its own winners (ambiguous refs).
        val targetSchema = StructType(batch.schema
          .filterNot(f => f.name == opCol || f.name == versionCol))
        graft.etl.Cdc.applyCdc(
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[Row], targetSchema),
          batch, keys, versionCol, opCol)
      } else {
        val target = spark.read.parquet(tablePath)
        graft.etl.Cdc.applyCdc(target, batch, keys, versionCol, opCol)
      }
    // materialize BEFORE overwrite: the plan reads the path it rewrites
    val rows = next.localCheckpoint(true)
    rows.write.mode("overwrite").parquet(tablePath)
  }

  /** [[appendBatch]] wired as a foreachBatch sink. */
  def idempotentAppendSink(stream: DataFrame, tablePath: String,
                           checkpointDir: String): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendBatch(batch, batchId, tablePath)
        ()
      }

  def startUpsertStream(stream: DataFrame, tablePath: String,
                        keys: Seq[String], checkpointDir: String,
                        partitionCol: String = "event_date",
                        partitionExpr: DataFrame => Column = df => to_date(df("ts")))
      : StreamingQuery =
    upsertSink(stream, tablePath, keys, checkpointDir,
      partitionCol, partitionExpr).start()

  /** Streaming twin of [[graft.quality.Validators.observed]]: quality
    * metrics (row count, per-column null counts) accumulate inside
    * each micro-batch's own tasks via an `observe` node — no
    * foreachBatch detour, no second pass, no state — and surface per
    * batch in `StreamingQueryProgress.observedMetrics(name)`. This is
    * the always-on feed a stream monitor tails (alert when null rates
    * spike), complementing [[driftMonitorSink]]'s heavier
    * distribution scoring. */
  def observedQuality(stream: DataFrame, name: String,
                      nullCols: Seq[String]): DataFrame = {
    val metrics: Seq[Column] =
      Seq(count(lit(1)).as("row_count")) ++
        nullCols.map(c => count(when(col(c).isNull, 1)).as(s"null_$c"))
    stream.observe(name, metrics.head, metrics.tail: _*)
  }

  /** Streaming distribution-drift monitor: every micro-batch's
    * categorical distribution of `keyCol` is scored against a STATIC
    * baseline (the training corpus, yesterday's snapshot) with
    * [[graft.analytics.Profiling.categoricalDrift]] — the same
    * batch operator, reused inside foreachBatch: the monitoring logic
    * is written and tested ONCE and the stream gets it verbatim. Each
    * batch appends its per-category drift rows (tagged with batch id
    * and an ingest timestamp) to `outPath`; an alerting query tails
    * that table for TV spikes. Baseline is re-read per batch from its
    * path — swap the file to rotate the baseline without restarting
    * the stream; at minute-level triggers the re-read is noise, and a
    * category-sized table broadcasts. Empty batches write nothing. */
  def driftMonitorSink(stream: DataFrame, baselinePath: String,
                       keyCol: String, outPath: String,
                       checkpointDir: String): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val baseline = batch.sparkSession.read.parquet(baselinePath)
          graft.analytics.Profiling.categoricalDrift(baseline, batch, keyCol)
            .withColumn("batch_id", lit(batchId))
            .withColumn("scored_at", current_timestamp())
            .write.mode("append").parquet(outPath)
        }
        ()
      }

  /** Streaming hot-key monitor: [[graft.etl.Skew.heavyHitters]]
    * applied per micro-batch via foreachBatch — the same
    * exact-two-pass operator the batch pipeline uses (E90), applied to
    * streams unchanged (the [[driftMonitorSink]] pattern). Per-batch
    * hitters append with the batch id, giving the "which keys are hot
    * RIGHT NOW" feed that decides when to re-salt a downstream join.
    * Per-batch (not cross-batch) frequency is the point: skew
    * mitigation reacts to current traffic, not history. */
  def heavyHitterSink(stream: DataFrame, keyCol: String, phi: Double,
                      outPath: String,
                      checkpointDir: String): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          graft.etl.Skew.heavyHitters(batch, keyCol, phi)
            .withColumn("batch_id", lit(batchId))
            .write.mode("append").parquet(outPath)
        }
        ()
      }

  /** Watermarked stream-stream inner join: each left event (e.g. a
    * view) matched to the same user's right events (e.g. purchases)
    * that follow within `withinMinutes` — the streaming attribution
    * join. Both sides carry watermarks and the join condition bounds
    * the event-time distance, so the state store retains each side
    * only for watermark + bound and every match is emitted exactly
    * once; without the time bound Spark would (correctly) refuse to
    * run the join with unbounded state. Batch twin for equivalence
    * tests: the same join on static frames. */
  def attributionJoin(left: DataFrame, right: DataFrame,
                      withinMinutes: Int,
                      watermark: String = "1 hour"): DataFrame =
    enrichJoin(left, right, "user_id",
      lowerMinutes = 0, upperMinutes = withinMinutes, watermark)

  /** Watermarked stream-stream interval join, general form: each left
    * event matched to right events sharing `key` whose event time lies
    * in `[l_ts + lowerMinutes, l_ts + upperMinutes]` — signed bounds,
    * so an impression stream can enrich a click stream with events
    * BEFORE the click (`lowerMinutes = -10, upperMinutes = 0`) as well
    * as after. The streaming twin of the batch interval join
    * ([[graft.events.RangeJoin]] / [[graft.events.AsofJoin]] family).
    *
    * State bound, which is the whole point: both inputs carry
    * watermarks and the join predicate constrains the event-time
    * distance, so Spark derives a per-side state retention horizon
    * (watermark + the bound's width) and EVICTS older rows from the
    * join state store — an unbounded-state stream-stream join is
    * refused at analysis time, and this shape is the one Spark
    * accepts. At 100 TB/day the state held per executor is
    * O(key-rate x (watermark + bound)), independent of stream length;
    * the spec asserts eviction via the query's stateOperators metrics,
    * not just output correctness. */
  def enrichJoin(left: DataFrame, right: DataFrame, key: String,
                 lowerMinutes: Int, upperMinutes: Int,
                 watermark: String = "1 hour",
                 joinType: String = "inner"): DataFrame = {
    require(lowerMinutes <= upperMinutes,
      s"empty interval: [$lowerMinutes, $upperMinutes] minutes")
    val l = left.select(col("event_id").as("l_id"), col("ts").as("l_ts"),
        col(key), col("event_type").as("l_type"))
      .withWatermark("l_ts", watermark)
    val r = right.select(col("event_id").as("r_id"), col("ts").as("r_ts"),
        col(key), col("event_type").as("r_type"),
        col("value").as("r_value"))
      .withWatermark("r_ts", watermark)
    l.join(r,
      l(key) === r(key) &&
        col("r_ts") >= col("l_ts") + expr(s"INTERVAL $lowerMinutes MINUTES") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $upperMinutes MINUTES"),
      joinType)
      // coalesce: under full_outer an unmatched RIGHT has no l(key);
      // for inner/left_outer the left side is always present and the
      // coalesce is an identity projection.
      .select(coalesce(l(key), r(key)).as(key), col("l_id"), col("l_ts"),
        col("r_id"), col("r_ts"), col("r_value"))
  }

  /** [[enrichJoin]] keeping unmatched left events: the audit shape —
    * "every click, WITH its impression if one exists" — where the
    * inner join would silently drop the unattributed majority. A left
    * event can only be declared unmatched once the right-side
    * watermark has passed its whole interval (a match might still
    * arrive until then), so null-padded rows emit with watermark
    * delay — the same deferral the session timeout spec pins, and the
    * reason outer results trail inner ones in event time. State bound
    * is identical to the inner form. */
  def enrichJoinLeftOuter(left: DataFrame, right: DataFrame, key: String,
                          lowerMinutes: Int, upperMinutes: Int,
                          watermark: String = "1 hour"): DataFrame =
    enrichJoin(left, right, key, lowerMinutes, upperMinutes, watermark,
      joinType = "left_outer")

  /** Both-sides audit: unmatched LEFTS and unmatched RIGHTS survive
    * null-padded — the reconciliation shape ("every click and every
    * impression, matched where possible") that catches loss on either
    * feed. Same watermark-deferred null emission as the left-outer
    * form, on both sides. */
  def enrichJoinFullOuter(left: DataFrame, right: DataFrame, key: String,
                          lowerMinutes: Int, upperMinutes: Int,
                          watermark: String = "1 hour"): DataFrame =
    enrichJoin(left, right, key, lowerMinutes, upperMinutes, watermark,
      joinType = "full_outer")

  /** Stream-STATIC enrichment — the most common join a streaming
    * pipeline runs (event stream × dimension metadata), and the one
    * join form that is STATELESS: the static side is planned into
    * every micro-batch like any batch relation, so there is no
    * watermark, no state store, nothing to evict — the spec asserts
    * the query progress carries ZERO stateOperators, which is why
    * this shape scales without any of the interval machinery above
    * and should be preferred whenever the right side isn't itself a
    * stream. LEFT join: enrichment must not drop unmatched events
    * (the inner form silently loses every event missing dimension
    * coverage — usually the rows an audit most wants to see).
    *
    * `hintBroadcast` (default true) marks the dimension for broadcast
    * — right for the config-sized lookup tables this form usually
    * meets; pass false for a large dimension and let the per-batch
    * planner pick a shuffle join. Point-in-time correctness: a raw
    * dimension read gives "current value as of the batch", which
    * leaks future attributes into replayed history — join an SCD2
    * dimension ([[graft.etl.Scd]]) restricted with `snapshotAt`, or
    * use the stream-stream interval form, when training-data
    * correctness matters. */
  def enrichStatic(stream: DataFrame, dim: DataFrame, key: String,
                   hintBroadcast: Boolean = true): DataFrame =
    stream.join(if (hintBroadcast) broadcast(dim) else dim, Seq(key), "left")

  // --------------------------------------------------------------------
  // Composed end-to-end streaming pipeline (the q306 of streams):
  // landing-dir JSONL → malformed-record quarantine → watermark dedup →
  // session aggregation → foreachBatch MERGE into the stored table.
  // Each stage is an already-spec'd operator (E121 quarantine, E15
  // dedup+MERGE, E24/E252 sessions, E271 restart); THIS is their
  // composition as the one pipeline a deployment actually runs, with
  // the restart drill applied to the whole chain in StreamingSpec.
  // --------------------------------------------------------------------

  /** Streaming twin of [[graft.io.Sources.readJsonQuarantine]] (E121):
    * a landing directory of JSON-lines files as a stream, where a
    * malformed line neither kills the query nor silently drops — it
    * lands null-typed with its raw text in `quarantineCol`. Good rows
    * parse against [[eventsSchema]]. Timestamp format matches the
    * batch reader, so the batch twin reads the same files
    * identically. */
  def readEventsQuarantineStream(spark: SparkSession, dir: String,
                                 quarantineCol: String = "_malformed")
      : DataFrame =
    spark.readStream
      .schema(eventsSchema.add(quarantineCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", quarantineCol)
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .json(dir)

  /** The quarantine leg: malformed raws append to their own table
    * (batch id tagged for replay forensics) — the stream's dead-letter
    * feed. Stateless, so exactly-once rides on the idempotent ledger
    * ([[appendBatch]]): a restart-replayed micro-batch finds its
    * marker and writes nothing. */
  def quarantineSink(raw: DataFrame, quarantinePath: String,
                     checkpointDir: String,
                     quarantineCol: String = "_malformed")
      : DataStreamWriter[Row] = {
    // a data column must stay live beside the corrupt column all the
    // way into the OUTPUT (Spark refuses plans whose read schema is
    // only the corrupt record column, and column pruning would strip
    // a merely-intermediate one — the E121/q252 caveat). event_id is
    // the natural choice: NULL for a whole-line corruption, populated
    // when PERMISSIVE salvaged a partial parse — replay forensics for
    // free.
    val bad = raw.select(col("event_id"), col(quarantineCol).as("raw_line"))
      .filter(col("raw_line").isNotNull)
    bad.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendBatch(batch, batchId, quarantinePath)
        ()
      }
  }

  /** The curated-sessions leg, stages 2–3 of the capstone: good rows
    * only (quarantine nulls filtered), exactly-once'd by event_id
    * within the watermark horizon (the streaming A2 — state restored
    * across restarts, so a duplicate re-delivered AFTER a restart is
    * still dropped), then gap-session aggregated on the native
    * `session_window` (merging state-store windows; a session is
    * emitted once, when the watermark passes its end — so sessions
    * whose events STRADDLE a restart emit once with all their rows).
    * Both stateful operators share the one event-time watermark. */
  def curatedSessionsStream(raw: DataFrame, gap: String = "30 minutes",
                            watermark: String = "1 hour",
                            quarantineCol: String = "_malformed")
      : DataFrame =
    raw.filter(col(quarantineCol).isNull).drop(quarantineCol)
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"),
        Exact.exactSum(col("value"), 6).as("total_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"),
        col("total_value"))

  /** Stage 4: closed sessions MERGE into the date-partitioned sessions
    * table on (user_id, session_start) — [[upsertSink]] with the
    * partition derived from the session's start date, so a restart
    * replay of an uncommitted batch updates in place instead of
    * duplicating, and each micro-batch rewrites only the dates it
    * touches. */
  def sessionUpsertSink(sessions: DataFrame, tablePath: String,
                        checkpointDir: String): DataStreamWriter[Row] =
    upsertSink(sessions, tablePath,
      keys = Seq("user_id", "session_start"),
      checkpointDir = checkpointDir,
      partitionCol = "session_date",
      partitionExpr = df => to_date(df("session_start")))

  /** The whole capstone, started: returns (quarantine query, sessions
    * query) over one landing dir. Two queries because the pipeline has
    * two independent sinks (dead-letter feed + curated table), each
    * with its own checkpoint — the standard topology; the file source
    * tracks offsets per query. Restart = call again with the same
    * paths. */
  def startCapstone(spark: SparkSession, landingDir: String,
                    quarantinePath: String, tablePath: String,
                    checkpointRoot: String, gap: String = "30 minutes",
                    watermark: String = "1 hour")
      : (StreamingQuery, StreamingQuery) = {
    val raw = readEventsQuarantineStream(spark, landingDir)
    val qq = quarantineSink(raw, quarantinePath,
      s"$checkpointRoot/quarantine").start()
    val sq = sessionUpsertSink(
      curatedSessionsStream(raw, gap, watermark),
      tablePath, s"$checkpointRoot/sessions").start()
    (qq, sq)
  }

  /** The capstone's BATCH TWIN — the equivalence oracle for the
    * composed pipeline (streams aren't DuckDB-oracle-able; batch-twin
    * equality over the same landing files is the correctness
    * contract). Same stages, batch operators: E121 quarantine read →
    * good-row filter → exact dedup on event_id → E252 session_window
    * aggregation. Emits every session (batch has no watermark floor);
    * the spec compares against the streamed table on the
    * watermark-closed subset. */
  def capstoneBatchTwin(spark: SparkSession, landingDir: String,
                        gapMinutes: Int = 30,
                        quarantineCol: String = "_malformed"): DataFrame = {
    val raw = graft.io.Sources.readJsonQuarantine(
      spark, landingDir, eventsSchema, quarantineCol)
    val good = raw.filter(col(quarantineCol).isNull).drop(quarantineCol)
    // exact re-deliveries: any survivor is identical, but keep the
    // deterministic form anyway (A2 discipline)
    val deduped = graft.etl.Merge.dedupKeepFirst(good,
      Seq("event_id"), Seq(col("ts"), col("user_id")))
    graft.events.EventAnalytics.sessionWindows(deduped, gapMinutes)
      .select(col("user_id"), col("w_start").as("session_start"),
        col("w_end").as("session_end"), col("n_events"), col("total_value"))
  }
}

/** Typed rows for the stateful session operator. */
case class SessionEvent(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                        event_type: String, value: Double)

case class SessionWindow(user_id: Long, session_start: java.sql.Timestamp,
                         session_end: java.sql.Timestamp, n_events: Long,
                         total_value: Double)

/** Custom streaming state via `flatMapGroupsWithState` (SURVEY §2.10):
  * gap-based session windows — the streaming twin of
  * [[graft.events.EventAnalytics.sessionize]]. Sessions close two
  * ways: a later event from the same user arrives past the gap
  * (emitted immediately), or the event-time watermark passes the
  * session's gap horizon (emitted on timeout). State per user is one
  * open session — bounded, watermark-evicted.
  */
object StatefulSessions {
  import org.apache.spark.sql.{Dataset, Encoders}
  import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

  /** Open-session state: [start, last] bounds + running aggregates. */
  case class OpenSession(startMs: Long, lastMs: Long, n: Long, total: Double)

  /** `events` needs at least (event_id, ts, user_id, event_type,
    * value); the watermark bounds both lateness and state lifetime. */
  def sessionize(events: DataFrame, gapMinutes: Int,
                 watermark: String = "1 hour"): Dataset[SessionWindow] = {
    val gapMs = gapMinutes * 60000L
    implicit val eventEnc = Encoders.product[SessionEvent]
    implicit val stateEnc = Encoders.product[OpenSession]
    implicit val outEnc = Encoders.product[SessionWindow]
    implicit val longEnc = Encoders.scalaLong
    val typed = events
      .selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .withWatermark("ts", watermark)
      .as[SessionEvent]

    def fn(user: Long, rows: Iterator[SessionEvent],
           state: GroupState[OpenSession]): Iterator[SessionWindow] = {
      def emit(s: OpenSession) = SessionWindow(user,
        new java.sql.Timestamp(s.startMs), new java.sql.Timestamp(s.lastMs),
        s.n, s.total)
      if (state.hasTimedOut) {
        val out = state.getOption.map(emit).toIterator
        state.remove()
        out
      } else {
        // fold this micro-batch's rows (in event order) into sessions
        val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
        var open = state.getOption
        val closed = Seq.newBuilder[SessionWindow]
        sorted.foreach { e =>
          val t = e.ts.getTime
          open match {
            case Some(s) if t - s.lastMs <= gapMs =>
              open = Some(OpenSession(s.startMs, math.max(s.lastMs, t),
                s.n + 1, s.total + e.value))
            case Some(s) =>
              closed += emit(s)
              open = Some(OpenSession(t, t, 1, e.value))
            case None =>
              open = Some(OpenSession(t, t, 1, e.value))
          }
        }
        open.foreach { s =>
          state.update(s)
          // close via timeout once the watermark passes last+gap
          state.setTimeoutTimestamp(s.lastMs + gapMs)
        }
        closed.result().iterator
      }
    }

    typed.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }
}

/** Per-user running totals state. */
case class RunningTotal(user_id: Long, n_events: Long, total_cents: Long)

/** Arbitrary keyed state on Spark 4's `transformWithState` — the
  * successor API to [[StatefulSessions]]' flatMapGroupsWithState
  * (SPARK-40434 "State API v2"): named state variables through a
  * typed handle (`ValueState`/`ListState`/`MapState`), per-variable
  * TTL, timers decoupled from output mode, and schema'd state the
  * engine can evolve — the API new stateful operators should target,
  * so the engine carries both forms side by side.
  *
  * The operator: exact per-user running event count + value cents
  * (the money-in-cents discipline: the fold is integer addition, so
  * the running total is order-independent within a micro-batch and
  * engine-exact). One emission per (user, micro-batch) in Update
  * mode — the live dashboard contract.
  *
  * Scale: state is two BIGINTs per user; transformWithState REQUIRES
  * the RocksDB state store provider (the E-StateStoreProviderSpec
  * production path), so state lives off-heap on local disk with
  * incremental checkpoints — user cardinality bounds disk, not heap.
  * Totals-forever is deliberate (no watermark eviction): pass a
  * `TTLConfig` at the call site when "active in the last N days" is
  * the contract. */
object StatefulTotals {
  import org.apache.spark.sql.{Dataset, Encoders}
  import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
    TimeMode, TimerValues, TTLConfig, ValueState}

  class TotalsProcessor(ttl: TTLConfig)
      extends StatefulProcessor[Long, SessionEvent, RunningTotal] {
    @transient private var st: ValueState[(Long, Long)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Long, Long)]("totals",
        Encoders.product[(Long, Long)], ttl)
    override def handleInputRows(key: Long, rows: Iterator[SessionEvent],
                                 timers: TimerValues): Iterator[RunningTotal] = {
      var (n, cents) = if (st.exists()) st.get() else (0L, 0L)
      rows.foreach { e => n += 1; cents += math.round(e.value * 100) }
      st.update((n, cents))
      Iterator.single(RunningTotal(key, n, cents))
    }
  }

  def runningTotals(events: DataFrame,
                    ttl: TTLConfig = TTLConfig.NONE): Dataset[RunningTotal] = {
    implicit val evEnc = Encoders.product[SessionEvent]
    implicit val outEnc = Encoders.product[RunningTotal]
    implicit val keyEnc = Encoders.scalaLong
    events.selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .transformWithState(new TotalsProcessor(ttl), TimeMode.None(),
        OutputMode.Update())
  }
}

/** One buffered event (cents — the exactness discipline). */
case class RecentEvent(ts: java.sql.Timestamp, event_id: Long,
                       event_type: String, value_cents: Long)
/** The emitted buffer view: ids in (ts, event_id) order. */
case class RecentBuffer(user_id: Long, n_buffered: Int, event_ids: Seq[Long])

/** Last-k event buffer per user on `ListState` — the online
  * feature-store pattern (a serving model reads "the user's last 5
  * interactions" at request time; this operator IS that feature,
  * maintained incrementally): every micro-batch merges its rows into
  * the buffer, re-sorts by the exact (ts, event_id) order, trims to
  * the NEWEST k, and emits the current view (Update mode). The
  * re-sort makes late/out-of-order arrivals land in their true
  * position — a buffer that appended blindly would serve a
  * wrong-order feature forever.
  *
  * ListState (vs E293's ValueState holding a collection) is the
  * right primitive: the store persists elements individually, so a
  * k-sized buffer costs k small entries, not one re-serialized blob
  * per update. State per user is ≤ k events — bounded by
  * construction, no watermark needed. RocksDB provider required
  * (the v2 state API contract). */
object StatefulRecent {
  import org.apache.spark.sql.{Dataset, Encoders}
  import org.apache.spark.sql.streaming.{ListState, OutputMode,
    StatefulProcessor, TimeMode, TimerValues, TTLConfig}

  class RecentProcessor(k: Int)
      extends StatefulProcessor[Long, SessionEvent, RecentBuffer] {
    @transient private var buf: ListState[RecentEvent] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      buf = getHandle.getListState[RecentEvent]("recent",
        Encoders.product[RecentEvent], TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[SessionEvent],
                                 timers: TimerValues): Iterator[RecentBuffer] = {
      val existing = if (buf.exists()) buf.get().toSeq else Seq.empty
      val incoming = rows.map(e => RecentEvent(e.ts, e.event_id,
        e.event_type, math.round(e.value * 100))).toSeq
      val merged = (existing ++ incoming)
        .sortBy(r => (r.ts.getTime, r.event_id)).takeRight(k)
      buf.put(merged.toArray)
      Iterator.single(RecentBuffer(key, merged.size, merged.map(_.event_id)))
    }
  }

  def recentEvents(events: DataFrame, k: Int = 5): Dataset[RecentBuffer] = {
    require(k >= 1, "k must be >= 1")
    implicit val evEnc = Encoders.product[SessionEvent]
    implicit val outEnc = Encoders.product[RecentBuffer]
    implicit val keyEnc = Encoders.scalaLong
    events.selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .transformWithState(new RecentProcessor(k), TimeMode.None(),
        OutputMode.Update())
  }
}

/** One per-type count row. */
case class TypeCount(user_id: Long, event_type: String, n: Long)

/** Per-(user, type) running counts on `MapState` — the third v2
  * state shape ([[StatefulTotals]] ValueState, [[StatefulRecent]]
  * ListState, THIS MapState), and the online form of the categorical
  * feature vector ("how many views/clicks/purchases has this user
  * ever made"). MapState is the right primitive for a keyed
  * sub-map: the store reads and writes ONE (type → count) cell per
  * touched type — a ValueState holding the whole map would
  * re-serialize every type's count on every event. Each micro-batch
  * emits rows only for the types it TOUCHED (Update-mode delta
  * contract — an unchanged count is not news). */
object StatefulTypeCounts {
  import org.apache.spark.sql.{Dataset, Encoders}
  import org.apache.spark.sql.streaming.{MapState, OutputMode,
    StatefulProcessor, TimeMode, TimerValues, TTLConfig}

  class CountsProcessor
      extends StatefulProcessor[Long, SessionEvent, TypeCount] {
    @transient private var counts: MapState[String, Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getMapState[String, Long]("counts",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[SessionEvent],
                                 timers: TimerValues): Iterator[TypeCount] = {
      val touched = scala.collection.mutable.LinkedHashMap.empty[String, Long]
      rows.foreach { e =>
        val cur = touched.getOrElse(e.event_type,
          if (counts.containsKey(e.event_type)) counts.getValue(e.event_type)
          else 0L)
        touched(e.event_type) = cur + 1L
      }
      touched.foreach { case (t, n) => counts.updateValue(t, n) }
      touched.toSeq.map { case (t, n) => TypeCount(key, t, n) }.iterator
    }
  }

  def typeCounts(events: DataFrame): Dataset[TypeCount] = {
    implicit val evEnc = Encoders.product[SessionEvent]
    implicit val outEnc = Encoders.product[TypeCount]
    implicit val keyEnc = Encoders.scalaLong
    events.selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .transformWithState(new CountsProcessor, TimeMode.None(),
        OutputMode.Update())
  }
}

/** The [[StatefulSessions]] gap sessionizer re-expressed on the v2
  * state API — same semantics (sessions close when a same-user event
  * arrives past the gap, or when the event-time watermark passes the
  * open session's horizon), with the v2 machinery in place of the v1:
  * a named ValueState for the open session, an EXPLICIT event-time
  * timer (registerTimer at last+gap; each update DELETES the stale
  * timer and registers the new horizon — v1's setTimeoutTimestamp did
  * that bookkeeping implicitly, v2 makes it the operator's job, which
  * is also what makes multi-timer operators possible), and
  * handleExpiredTimer as the timeout path. The suite pins v2 ≡ v1
  * output-for-output on the same feed — the migration-safety
  * statement for every stateful operator this engine carries. */
object StatefulSessionsV2 {
  import org.apache.spark.sql.{Dataset, Encoders}
  import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
    StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}
  import StatefulSessions.OpenSession

  class SessionProcessor(gapMs: Long)
      extends StatefulProcessor[Long, SessionEvent, SessionWindow] {
    @transient private var open: ValueState[OpenSession] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[OpenSession]("open",
        Encoders.product[OpenSession], TTLConfig.NONE)

    private def emit(user: Long, s: OpenSession) = SessionWindow(user,
      new java.sql.Timestamp(s.startMs), new java.sql.Timestamp(s.lastMs),
      s.n, s.total)

    override def handleInputRows(user: Long, rows: Iterator[SessionEvent],
                                 timers: TimerValues): Iterator[SessionWindow] = {
      val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      var cur = if (open.exists()) Option(open.get()) else None
      val prevTimer = cur.map(_.lastMs + gapMs)
      val closed = Seq.newBuilder[SessionWindow]
      sorted.foreach { e =>
        val t = e.ts.getTime
        cur match {
          case Some(s) if t - s.lastMs <= gapMs =>
            cur = Some(OpenSession(s.startMs, math.max(s.lastMs, t),
              s.n + 1, s.total + e.value))
          case Some(s) =>
            closed += emit(user, s)
            cur = Some(OpenSession(t, t, 1, e.value))
          case None =>
            cur = Some(OpenSession(t, t, 1, e.value))
        }
      }
      cur.foreach { s =>
        open.update(s)
        val horizon = s.lastMs + gapMs
        if (!prevTimer.contains(horizon)) {
          prevTimer.foreach(getHandle.deleteTimer)
          getHandle.registerTimer(horizon)
        }
      }
      closed.result().iterator
    }

    override def handleExpiredTimer(user: Long, timers: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[SessionWindow] = {
      val out = if (open.exists() &&
          open.get().lastMs + gapMs == info.getExpiryTimeInMs) {
        val s = open.get(); open.clear(); Iterator.single(emit(user, s))
      } else Iterator.empty
      out
    }
  }

  def sessionize(events: DataFrame, gapMinutes: Int,
                 watermark: String = "1 hour"): Dataset[SessionWindow] = {
    implicit val evEnc = Encoders.product[SessionEvent]
    implicit val outEnc = Encoders.product[SessionWindow]
    implicit val keyEnc = Encoders.scalaLong
    events.selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .withWatermark("ts", watermark)
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapMinutes * 60000L),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
