package graft.events

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Exact

/** Event-stream analytics over the `events` table (event_id, ts,
  * user_id, event_type, value, props): gap-based sessionization,
  * tumbling-window aggregates, and JSON property extraction. These are
  * the batch twins of the streaming operators in [[graft.streaming]] —
  * same window semantics, verifiable against a SQL oracle.
  *
  * Determinism: time arithmetic is integer microseconds
  * (`unix_micros`), never floating seconds; per-user event order is
  * (ts, event_id) — event_id breaks timestamp ties; double sums go
  * through exact decimal accumulation (order-independent).
  *
  * Scale: sessionization is one shuffle on user_id + an in-partition
  * sort — the standard lag/cumsum plan, no self-join, no collect;
  * window aggregation is a single hash aggregate whose key count is
  * bounded by (time buckets × event types).
  */
object EventAnalytics {

  /** JSON property as a long: `props` is a JSON object column like
    * `{"k": 42}`. Codegen'd path extraction, no UDF. */
  def propLong(props: Column, field: String): Column =
    get_json_object(props, s"$$.$field").cast("long")

  /** Gap-based sessionization: a new session starts when a user is
    * idle for more than `gapMinutes`. Session id = running count of
    * session starts per user (dense, 1-based, deterministic). */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val gapUs = gapMinutes * 60L * 1000000L
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val us = unix_micros(col("ts"))
    val prev = lag(us, 1).over(w)
    val isNew = when(prev.isNull || (us - prev) > gapUs, 1).otherwise(0)
    events
      .withColumn("__new", isNew)
      .withColumn("session_seq",
        sum(col("__new")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        Exact.exactSum(col("value"), 6).as("total_value"),
        countDistinct(col("event_type")).as("distinct_types"))
  }

  /** Session aggregation via Spark's NATIVE `session_window` — the
    * engine primitive behind streaming session state, exercised in
    * batch form next to [[sessionize]]'s hand-rolled gaps-and-islands.
    * Boundary semantics PINNED by measurement, not assumed: an event
    * at EXACTLY the gap after its predecessor MERGES — session_window
    * treats a window touching the next event's start as overlapping
    * (closed end), so the new-session condition is strict `>` on the
    * gap, IDENTICAL to [[sessionize]]'s hand-rolled boundary (the
    * spec pins the exact-gap case on both operators side by side).
    * The emitted window end is session_window's contract: last event
    * + gap, NOT the last event itself.
    *
    * Why it earns a place beside E31: this exact aggregate is what
    * `withWatermark + session_window` runs INSIDE Structured
    * Streaming with mergeable session state — proving the batch twin
    * here is what makes the streaming form auditable (the E24
    * batch-twin discipline). One shuffle on (user, merged window). */
  def sessionWindows(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    events
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapMinutes minutes").as("w"))
      .agg(count(lit(1)).as("n_events"),
        Exact.exactSum(col("value"), 6).as("total_value"))
      .select(col("user_id"), col("w.start").as("w_start"),
        col("w.end").as("w_end"), col("n_events"), col("total_value"))

  /** Ordered k-step funnel with a per-step timeout — the general form
    * of [[funnel]]'s fixed view→purchase pair: a user completes step
    * i+1 only with an event of that type STRICTLY AFTER their step-i
    * completion and within `withinMinutes` of it; each step's
    * completion instant is the EARLIEST qualifying event (the
    * canonical funnel semantics — earliest-entry, no re-entry).
    * Output: one row per step with the user count and exact
    * integer-permille conversion vs step 1.
    *
    * Shape: k−1 sequential (filter → join-on-user → min-aggregate)
    * rounds — each join is user-keyed against an already-aggregated
    * one-row-per-user frame, so volume never exceeds users after the
    * first aggregate; no windows over raw events, no collect. The
    * sequential dependency is inherent to funnel semantics (step i+1
    * needs step i's instant); k is config-sized. */
  def funnelSteps(events: DataFrame, steps: Seq[String],
                  withinMinutes: Int): DataFrame = {
    require(steps.size >= 2, "need at least 2 steps")
    require(withinMinutes > 0, "timeout must be positive")
    val winUs = withinMinutes * 60L * 1000000L
    val us = unix_micros(col("ts"))
    val first = events.filter(col("event_type") === steps.head)
      .groupBy(col("user_id")).agg(min(us).as("__t"))
    val reached = steps.drop(1).scanLeft(first) { (prev, step) =>
      events.filter(col("event_type") === step)
        .select(col("user_id"), us.as("__e"))
        .join(prev.select(col("user_id"), col("__t")), Seq("user_id"))
        .filter(col("__e") > col("__t") && col("__e") <= col("__t") + winUs)
        .groupBy(col("user_id")).agg(min(col("__e")).as("__t"))
    }
    val stepCounts = reached.zipWithIndex.map { case (df, i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1L).as("step_index"), lit(steps(i)).as("step"),
          col("n_users"))
    }
    // fully declarative: the k 1-row aggregates union, and the step-1
    // count broadcasts back for the exact permille — nothing collected
    stepCounts.reduce(_.unionByName(_))
      .crossJoin(broadcast(stepCounts.head.select(col("n_users").as("__base"))))
      .withColumn("conversion_permille",
        expr("CASE WHEN __base = 0 THEN 0 ELSE (n_users * 1000) div __base END"))
      .drop("__base")
  }

  /** Top-k session journeys — the "most common paths" report product
    * analytics asks of sessionized traffic: each session's ordered
    * event-type sequence joined into a path string, counted across
    * sessions, top k by frequency. Reuses [[sessionize]]'s exact
    * session assignment (same gap/tie semantics, window-for-window).
    *
    * Determinism notes: the path is a FRAMED ordered window
    * `collect_list` (ordered by (ts, event_id) over the whole session
    * frame — a groupBy `collect_list` has no order contract), one row
    * per session survives via row_number, and the final top-k orders
    * by (count desc, path) so the k-boundary cut is reproducible.
    * Scale: the two windows and the session reduce share the user
    * shuffle; the path aggregate shuffles path strings (bounded by
    * sessions, not events); top-k is TakeOrderedAndProject — no
    * global sort materializes. */
  def sessionPaths(events: DataFrame, gapMinutes: Int = 30,
                   k: Int = 20): DataFrame = {
    require(k > 0, "k must be positive")
    val gapUs = gapMinutes * 60L * 1000000L
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val us = unix_micros(col("ts"))
    val prev = lag(us, 1).over(w)
    val isNew = when(prev.isNull || (us - prev) > gapUs, 1).otherwise(0)
    val tagged = events
      .withColumn("__new", isNew)
      .withColumn("__sess",
        sum(col("__new")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val sessW = Window.partitionBy(col("user_id"), col("__sess"))
      .orderBy(col("ts"), col("event_id"))
    val framed = sessW.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    tagged
      .withColumn("__path",
        concat_ws(">", collect_list(col("event_type")).over(framed)))
      .withColumn("__rn", row_number().over(sessW))
      .filter(col("__rn") === 1)
      .groupBy(col("__path").as("path"))
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(k)
  }

  /** Tumbling event-time windows (batch form of the streaming windowed
    * aggregation): per (window, event_type) — event count, distinct
    * users, exact value sum, and the sum of the JSON `k` property. */
  def windowedStats(events: DataFrame, duration: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), duration).as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("unique_users"),
        Exact.exactSum(col("value"), 6).as("total_value"),
        sum(propLong(col("props"), "k")).as("sum_k"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("unique_users"), col("total_value"), col("sum_k"))

  /** SLIDING event-time windows — the smoothing variant tumbling
    * windows can't give (a burst straddling a boundary splits across
    * two tumbling buckets; every sliding window that covers it sees
    * it whole — the E182 rate-limit lesson at the aggregate level).
    * Spark's native `window(ts, size, slide)` compiles to ONE Expand
    * node replicating each row size/slide times BEFORE the hash
    * aggregate — no self-join, no per-window scan; the stated cost is
    * exactly that multiplier (4× at 1h/15m), map-side combined away
    * per window. `size` must be a multiple of `slide` here (the
    * replication-count identity the oracle replays; Spark itself
    * allows ragged ratios). Exact integer cents. */
  def slidingStats(events: DataFrame, size: String = "1 hour",
                   slide: String = "15 minutes"): DataFrame =
    events
      .groupBy(window(col("ts"), size, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("value_cents"))
      .select(col("w.start").as("window_start"),
        col("w.end").as("window_end"), col("event_type"),
        col("n_events"), col("value_cents"))

  /** Per-user view→purchase funnel: event counts per stage, first
    * touch per stage, and whether the user converted (first purchase
    * at-or-after first view). One shuffle on user_id; conditional
    * aggregates instead of per-stage self-joins. */
  def funnel(events: DataFrame): DataFrame =
    events.groupBy(col("user_id"))
      .agg(
        count(when(col("event_type") === "view", 1)).as("n_views"),
        count(when(col("event_type") === "purchase", 1)).as("n_purchases"),
        min(when(col("event_type") === "view", col("ts"))).as("first_view"),
        min(when(col("event_type") === "purchase", col("ts"))).as("first_purchase"))
      .withColumn("converted",
        col("first_view").isNotNull && col("first_purchase").isNotNull &&
          col("first_purchase") >= col("first_view"))

  /** Cohort retention matrix: users grouped by their first-activity
    * day, counted on each subsequent active day offset. Two keyed
    * aggregations + one user-keyed join — the (user, day) activity set
    * is deduped BEFORE the join so the join input is bounded by
    * users×active-days, not raw events. */
  def cohortRetention(events: DataFrame): DataFrame = {
    val firstDay = events.groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("cohort_day"))
    val activity = events
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    activity.join(firstDay, "user_id")
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  /** First-order Markov transition matrix over each user's event
    * sequence — the behavioral fingerprint behind funnel design and
    * bot screening (scripted traffic shows near-deterministic rows;
    * organic traffic spreads). Consecutive (from → to) event-type
    * pairs per user, counted, with each row's share of its from-type
    * in exact integer permille (floor; the same engine-neutral
    * arithmetic as the concentration audit).
    *
    * Shape: one user-keyed window (lead over (ts, event_id) — the id
    * tiebreak makes equal-timestamp sequences deterministic under any
    * partitioning), one partial-agg shuffle on the pair, and a window
    * over from_type for the share — the last runs over the TYPE
    * matrix (bounded by distinct types squared), never the events. */
  def transitionMatrix(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val pairs = events
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
    val byFrom = Window.partitionBy(col("from_type"))
    pairs
      .withColumn("__tot", sum(col("n_transitions")).over(byFrom))
      // integer `div`, not float division + floor: exact at any count
      .withColumn("share_permille", expr("(n_transitions * 1000) div __tot"))
      .drop("__tot")
  }

  /** Per-user behavioral surprisal under the corpus's own first-order
    * Markov model — the ANOMALY-SCORING consumer of
    * [[transitionMatrix]]'s counts (which report the model; this
    * scores each user against it): a user whose transitions are
    * individually common scores low; scripted or compromised accounts
    * walking rare edges score high, and `max_bits` points at the
    * single most surprising hop. Self-scored (model and subjects from
    * the same corpus — the standard unsupervised-anomaly setup), so
    * every scored transition exists in the model; add-one (Laplace)
    * smoothing keeps the arithmetic total anyway and makes scores
    * comparable across re-trainings: P(b|a) = (c(a,b)+1)/(c(a·)+K),
    * K = distinct event types.
    *
    * Exact: per-transition surprisal = floor(log2(den/num)) over
    * plain BIGINTs (counts bounded by |events| — no products, unlike
    * the E335 rationals), summed/maxed per user; mean in millibits by
    * floor division; users with < 2 events kept with zero
    * transitions and NULL scores (the audit stance).
    *
    * Shape: one (ts, event_id)-ordered window pass (the E132
    * tiebreak), a types²-bounded model table joined back by type
    * keys, one user-keyed aggregate. Type keys are Zipf-skewed at
    * scale — AQE skew-join territory, same note as E335. */
  def behaviorSurprisal(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val tr = events
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .select(col("user_id"), col("event_type").as("from_type"),
        col("to_type"))
    val c12 = tr.groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("__c12"))
    val c1 = c12.groupBy(col("from_type")).agg(sum(col("__c12")).as("__c1"))
    val kTypes = events.agg(countDistinct(col("event_type")).as("__k"))
    val scored = tr
      .join(c12, Seq("from_type", "to_type"))
      .join(c1, Seq("from_type"))
      .crossJoin(broadcast(kTypes))
      .withColumn("__bits", expr(
        "CAST(length(bin((__c1 + __k) div (__c12 + 1))) - 1 AS BIGINT)"))
    val agg = scored.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_transitions"),
        sum(col("__bits")).as("total_bits"),
        max(col("__bits")).as("max_bits"))
    events.select(col("user_id")).distinct()
      .join(agg, Seq("user_id"), "left")
      .select(col("user_id"),
        coalesce(col("n_transitions"), lit(0L)).as("n_transitions"),
        col("total_bits"), col("max_bits"),
        expr("(total_bits * 1000) div n_transitions").as("mean_millibits"))
  }

  /** Most common 3-step event paths — the SECOND-ORDER sequence
    * report [[transitionMatrix]]'s first-order marginals structurally
    * cannot show: a scripted loop A→B→A→B has exactly the same
    * first-order rows as organic A↔B traffic; only the triple
    * (A,B,A)'s support exposes it (the GSP/sequence-mining question
    * at its cheapest useful length). Per user, consecutive
    * event-type triples via TWO leads over ONE (ts, event_id)-ordered
    * window (the E132 tiebreak — equal timestamps stay deterministic
    * under any partitioning; consecutive means positions i, i+1,
    * i+2 — no gap skipping, the strict-contiguity variant, stated).
    * Support counts DISTINCT users (a path one bot fires 10⁶ times
    * ranks by its reach, not its volume — `n_occurrences` carries
    * the volume separately).
    *
    * Shape: one window pass (both leads ride the same sort), one
    * hash aggregate bounded by the type-universe CUBED (types³, not
    * events), global top-k as TakeOrderedAndProject under the total
    * (support DESC, occurrences DESC, path ASC) order. */
  def commonPaths(events: DataFrame, topK: Int = 20): DataFrame = {
    require(topK >= 1, "topK must be >= 1")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events
      .withColumn("e2", lead(col("event_type"), 1).over(w))
      .withColumn("e3", lead(col("event_type"), 2).over(w))
      .filter(col("e2").isNotNull && col("e3").isNotNull)
      .groupBy(col("event_type").as("e1"), col("e2"), col("e3"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_users").desc, col("n_occurrences").desc,
        col("e1"), col("e2"), col("e3"))
      .limit(topK)
  }

  /** Session entry/exit report — the landing/exit-page table of web
    * analytics, over event types: per (entry_type, exit_type) pair,
    * session count and the single-event-session count (entry ≡ exit
    * — the bounce diagonal). Entry/exit are the FIRST/LAST events of
    * each session by the exact (ts, event_id) order ([[sessionize]]'s
    * tie rule, window-for-window), picked with min/max over a
    * (us, event_id, type) struct — no extra window pass beyond the
    * session assignment.
    *
    * Shape: the sessionize window + one (user, session) aggregate +
    * one pair aggregate bounded by the type universe squared. */
  def entryExit(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val gapUs = gapMinutes * 60L * 1000000L
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val us = unix_micros(col("ts"))
    val prev = lag(us, 1).over(w)
    val isNew = when(prev.isNull || (us - prev) > gapUs, 1).otherwise(0)
    events
      .withColumn("__new", isNew)
      .withColumn("__seq",
        sum(col("__new")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("__seq"))
      .agg(
        min(struct(us.as("u"), col("event_id").as("i"),
          col("event_type").as("t"))).getField("t").as("entry_type"),
        max(struct(us.as("u"), col("event_id").as("i"),
          col("event_type").as("t"))).getField("t").as("exit_type"),
        count(lit(1)).as("__n"))
      .groupBy(col("entry_type"), col("exit_type"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("__n") === 1, 1L).otherwise(0L)).as("n_bounces"))
  }

  /** Longest same-type streak per user — the gaps-and-islands
    * pattern (the one classic SQL idiom the registry hadn't
    * exercised): islands are maximal runs of consecutive identical
    * event types in the user's (ts, event_id) order, found by the
    * rn − rn_by_type difference (constant exactly within a run — the
    * textbook identity); per user the longest run, its type, and the
    * run count. Reads as gamification streaks or, inverted, as a bot
    * signature (a 500-long 'click' run is not a person).
    * Deterministic: both row_numbers share the same unique total
    * order; the longest-run tie breaks by (type, island start id)
    * via the min-struct pick.
    *
    * Shape: TWO row_numbers riding ONE user-keyed ordering (one
    * window pass), one (user, type, island) aggregate, one per-user
    * min-struct aggregate. */
  def longestStreaks(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wt = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    val islands = events
      .withColumn("__i", row_number().over(w) - row_number().over(wt))
      .groupBy(col("user_id"), col("event_type"), col("__i"))
      .agg(count(lit(1)).as("__len"), min(col("event_id")).as("__start"))
    islands
      .withColumn("__mx",
        max(col("__len")).over(Window.partitionBy(col("user_id"))))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_runs"),
        max(col("__len")).as("longest_streak"),
        min(when(col("__len") === col("__mx"),
          struct(col("__start"), col("event_type"))))
          .getField("event_type").as("streak_type"))
  }

  /** Rate-limit burst audit — the abuse/quota screen ("who exceeded
    * N requests in ANY sliding window?") answered exactly, not by
    * fixed buckets: for every event, the count of the same user's
    * events in the trailing window via a RANGE frame over exact
    * epoch micros (a tumbling-bucket count misses straddling bursts
    * — the classic rate-limiter bug; the range frame is the fix and
    * the point). Per user: the maximum burst, when it peaked
    * (earliest peak instant, id tie-break — deterministic), and the
    * over-limit flag.
    *
    * Shape: ONE user-keyed window with a micros RANGE frame (state
    * bounded by the user's events inside the window span), one
    * per-user aggregate. */
  def burstAudit(events: DataFrame, windowMinutes: Int = 60,
                 limit: Long = 100L): DataFrame = {
    require(windowMinutes > 0, "window must be positive")
    val winUs = windowMinutes * 60L * 1000000L
    val w = Window.partitionBy(col("user_id")).orderBy(col("__us"))
      .rangeBetween(-(winUs - 1), Window.currentRow)
    val counted = events
      .select(col("user_id"), unix_micros(col("ts")).as("__us"))
      .withColumn("__burst", count(lit(1)).over(w))
      .withColumn("__mx",
        max(col("__burst")).over(Window.partitionBy(col("user_id"))))
    counted
      .groupBy(col("user_id"))
      .agg(max(col("__burst")).as("max_burst"),
        min(when(col("__burst") === col("__mx"), col("__us")))
          .as("peak_at_us"))
      .withColumn("over_limit", col("max_burst") > limit)
  }

  /** Peak session concurrency per day — the capacity question ("how
    * many sessions were open AT ONCE at the worst moment?") answered
    * by the classic ±1 sweep: each session contributes a +1 at its
    * (clamped) start and a −1 at its end, a running sum over the
    * day's points, and the day's max. Sessions spanning midnight are
    * SPLIT at day boundaries first (a codegen'd day-sequence explode
    * bounded by the session's span), so the sweep window partitions
    * by DAY — never one global point stream. Boundary semantics
    * stated: intervals are inclusive, and ties at the same
    * microsecond order starts before ends (a back-to-back handoff
    * counts both open), then by session id — fully deterministic.
    *
    * Shape: sessionize's window, one explode, one union, ONE
    * day-partitioned sweep window, one per-day aggregate. */
  /** Merge overlapping-or-touching intervals per key into maximal
    * islands — the uptime/SLA/coverage primitive (union of monitoring
    * windows, total covered time, outage islands) and the interval
    * complement of [[sessionize]]'s point-gap logic: here inputs have
    * EXTENT, and an interval that starts inside (or exactly at the
    * end of) the running union extends it. Touching merges (start ==
    * running max end) — a handoff has no gap; stated.
    *
    * Classic gaps-and-islands, one pass: running `max(end)` over rows
    * strictly before the current (ROWS frame), a new island wherever
    * start exceeds it, island ordinal = running sum of the flag. BOTH
    * windows share one (keys, (start, end)) partitioning+sort, so
    * Catalyst plans a single exchange + in-partition sort for any
    * number of intervals per key; the closing per-island aggregate
    * moves only island-count rows. Deterministic under ties: equal
    * (start, end) rows are interchangeable — whichever physically
    * sorts first opens the island, the aggregate output is identical.
    *
    * Time axis must be integral (micros — the as-of convention);
    * `covered = island_end − island_start` stays exact. Returns
    * (keys…, island ordinal from 1, island_start, island_end,
    * n_intervals, covered). */
  def mergeIntervals(df: DataFrame, keys: Seq[String], startCol: String,
                     endCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(startCol), col(endCol))
    val prevMax = max(col(endCol))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val flagged = df
      .withColumn("__new",
        when(prevMax.isNull || col(startCol) > prevMax, 1L).otherwise(0L))
      .withColumn("island", sum(col("__new"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged
      .groupBy(keys.map(col) :+ col("island"): _*)
      .agg(min(col(startCol)).as("island_start"),
        max(col(endCol)).as("island_end"),
        count(lit(1)).as("n_intervals"))
      .withColumn("covered", col("island_end") - col("island_start"))
  }

  /** Per-key intersection TIME of two interval sets — the co-presence
    * measure ([[mergeIntervals]] gives one set's union; this asks how
    * long BOTH channels were active: session × campaign exposure,
    * monitor-A × monitor-B uptime, user × feature-flag windows).
    * Exact on the integral micros axis.
    *
    * One boundary sweep, no pair join: each interval contributes
    * (+1 at start, −1 at end+1-exclusive… here closed-open [s, e))
    * deltas tagged by side; a running sum per side over the merged
    * boundary stream gives both active counts, and every segment
    * between consecutive boundaries with BOTH counts positive adds
    * its length. An interval-PAIR join (the E35 range-join shape)
    * explodes in overlap density — k overlapping intervals on each
    * side is k² pairs but only ~2k boundaries; the sweep is the
    * at-scale form. Tie order between deltas at one timestamp is
    * irrelevant: the segment between equal timestamps has zero
    * length (closed-open semantics keep touching intervals from
    * fabricating overlap — stated).
    *
    * Returns (keys…, overlap, n_segments) per key with any overlap. */
  def intervalIntersection(a: DataFrame, b: DataFrame, keys: Seq[String],
                           startCol: String, endCol: String): DataFrame = {
    def deltas(df: DataFrame, side: String) = df
      .select(keys.map(col) :+ col(startCol).as("__t") :+
        lit(1L).as(s"__d$side") :+ lit(0L).as(s"__d${other(side)}"): _*)
      .unionByName(df.select(keys.map(col) :+ col(endCol).as("__t") :+
        lit(-1L).as(s"__d$side") :+ lit(0L).as(s"__d${other(side)}"): _*))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("__t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wLead = Window.partitionBy(keys.map(col): _*).orderBy(col("__t"))
    deltas(a, "a").unionByName(deltas(b, "b"))
      .withColumn("__ca", sum(col("__da")).over(w))
      .withColumn("__cb", sum(col("__db")).over(w))
      .withColumn("__next", lead(col("__t"), 1).over(wLead))
      .filter(col("__next").isNotNull &&
        col("__ca") > 0 && col("__cb") > 0 && col("__next") > col("__t"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__next") - col("__t")).as("overlap"),
        count(lit(1)).as("n_segments"))
  }

  private def other(side: String): String = if (side == "a") "b" else "a"

  def peakConcurrency(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val sess = sessionize(events, gapMinutes)
      .select(concat_ws("#", col("user_id"), col("session_seq")).as("__sid"),
        col("session_start"), col("session_end"))
    val perDay = sess
      .withColumn("day", explode(expr(
        "sequence(to_date(session_start), to_date(session_end), interval 1 day)")))
      .select(col("__sid"), col("day"),
        greatest(unix_micros(col("session_start")),
          unix_micros(col("day").cast("timestamp"))).as("__s"),
        least(unix_micros(col("session_end")),
          unix_micros(date_add(col("day"), 1).cast("timestamp")) - 1)
          .as("__e"))
    val points = perDay
      .select(col("day"), col("__s").as("__ts"), lit(1L).as("__d"), col("__sid"))
      .unionByName(perDay.select(col("day"), col("__e").as("__ts"),
        lit(-1L).as("__d"), col("__sid")))
    val w = Window.partitionBy(col("day"))
      .orderBy(col("__ts"), col("__d").desc, col("__sid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    points
      .withColumn("__open", sum(col("__d")).over(w))
      .groupBy(col("day"))
      .agg(max(col("__open")).as("peak_concurrency"),
        (countDistinct(col("__sid"))).as("n_sessions"))
  }

  /** Conversion-latency cohort profile — "how long from first view
    * to first purchase", the funnel's missing time axis: per
    * first-view-DAY cohort, exact order-statistic p25/p50/p75 of the
    * per-user latency in µs (ceil-rank conventions, the cadence
    * pattern — zero interpolation) over users who converted (first
    * purchase at-or-after first view, the q53 contract). Cohorting
    * by day is also the scale decision: the rank windows partition
    * by cohort, never a single global frame.
    *
    * Shape: one user-keyed conditional aggregate (first view/first
    * purchase), then per-cohort rank windows over USERS. */
  def conversionLatency(events: DataFrame): DataFrame = {
    val us = unix_micros(col("ts"))
    val per = events.groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "view", us)).as("__fv"),
        min(when(col("event_type") === "purchase", us)).as("__fp"))
      .filter(col("__fv").isNotNull && col("__fp").isNotNull &&
        col("__fp") >= col("__fv"))
      .select(col("user_id"),
        to_date(timestamp_micros(col("__fv"))).as("cohort_day"),
        (col("__fp") - col("__fv")).as("__lat"))
    val part = Window.partitionBy(col("cohort_day"))
    val w = part.orderBy(col("__lat"), col("user_id"))
    per
      .withColumn("__rk", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(part))
      .groupBy(col("cohort_day"))
      .agg(max(col("__n")).as("n_converted"),
        max(when(col("__rk") === expr("(__n + 3) div 4"), col("__lat")))
          .as("p25_latency_us"),
        max(when(col("__rk") === expr("(__n + 1) div 2"), col("__lat")))
          .as("p50_latency_us"),
        max(when(col("__rk") === expr("(3 * __n + 3) div 4"), col("__lat")))
          .as("p75_latency_us"))
  }

  /** DAU/WAU stickiness — the engagement ratio every growth report
    * tracks ("what share of this week's users showed up today"): per
    * day, distinct daily actives, distinct trailing-7-day actives,
    * and the exact permille ratio. Sliding DISTINCT does not
    * decompose into frame sums, so WAU is computed by the explode
    * identity: each (user, day) activity contributes itself to the 7
    * windows ending on day..day+6 — volume is 7× the DEDUPED
    * activity frame (users×active-days, never raw events), then one
    * distinct count per window day. Days with zero DAU but nonzero
    * WAU still surface (left join from the WAU spine, stated).
    *
    * Shape: (user, day) dedup, a codegen'd 7-element explode, two
    * keyed distinct aggregates, one day-keyed join. */
  def stickiness(events: DataFrame, windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, "window must be >= 1")
    val activity = events
      .select(col("user_id"), to_date(col("ts")).as("__day")).distinct()
    val dau = activity.groupBy(col("__day").as("day"))
      .agg(countDistinct(col("user_id")).as("dau"))
    val wau = activity
      .select(col("user_id"),
        explode(sequence(lit(0), lit(windowDays - 1))).as("__off"),
        col("__day"))
      .select(col("user_id"), date_add(col("__day"), col("__off")).as("day"))
      .groupBy(col("day"))
      .agg(countDistinct(col("user_id")).as("wau"))
      // the first windowDays-1 spine days are partial windows; the
      // trailing extension beyond the last activity day is dropped
      .crossJoin(broadcast(activity.agg(max(col("__day")).as("__last"))))
      .filter(col("day") <= col("__last"))
      .select(col("day"), col("wau"))
    wau.join(dau, Seq("day"), "left")
      .select(col("day"), coalesce(col("dau"), lit(0L)).as("dau"),
        col("wau"),
        expr("(coalesce(dau, 0L) * 1000) div wau").as("stickiness_permille"))
  }

  /** Hour-of-day volume envelope — the daily-rhythm band an ops
    * dashboard draws and pages against ("is 3 AM traffic inside its
    * usual band?"): per (type, hour 0–23), exact ORDER-STATISTIC
    * p10/p50/p90 of the per-day counts observed at that hour, using
    * the cadence-profile rank conventions (ceil ranks, stated, zero
    * interpolation — bit-identical cross-engine). Hours with no
    * events on some day contribute no observation for that day (the
    * level-shift observation convention, stated).
    *
    * Shape: one (type, day, hour) pre-aggregate, then a rank window
    * per (type, hour) over DAYS (bounded by the observation span),
    * and conditional-aggregate picks; output ≤ types×24. */
  def hourlyEnvelope(events: DataFrame): DataFrame = {
    val cnt = events
      .groupBy(col("event_type"), to_date(col("ts")).as("__day"),
        hour(col("ts")).as("hod"))
      .agg(count(lit(1)).as("n"))
    val part = Window.partitionBy(col("event_type"), col("hod"))
    val w = part.orderBy(col("n"), col("__day"))
    cnt
      .withColumn("__rk", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(part))
      .groupBy(col("event_type"), col("hod"))
      .agg(max(col("__n")).as("n_days"),
        max(when(col("__rk") === expr("(__n + 9) div 10"), col("n")))
          .as("p10"),
        max(when(col("__rk") === expr("(__n + 1) div 2"), col("n")))
          .as("p50"),
        max(when(col("__rk") === expr("(9 * __n + 9) div 10"), col("n")))
          .as("p90"))
  }

  /** New-vs-returning daily actives — the growth-accounting split
    * every product dashboard leads with (and the single-day slice of
    * the cohort matrix E-q55 renders over offsets): per day, distinct
    * active users split into first-ever-seen ("new") and returning,
    * with the exact permille share. A user is new exactly ONCE — on
    * their min activity day (stated; no windowed re-acquisition).
    *
    * Shape: (user, day) dedup BEFORE anything else (the q55 lesson —
    * the join input is users×active-days, never raw events), one
    * per-user min aggregate, one user-keyed join, one per-day
    * aggregate. Output bounded by days. */
  def newVsReturning(events: DataFrame): DataFrame = {
    val activity = events
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val first = activity.groupBy(col("user_id"))
      .agg(min(col("day")).as("__first"))
    activity.join(first, "user_id")
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_active"),
        sum(when(col("day") === col("__first"), 1L).otherwise(0L))
          .as("n_new"))
      .withColumn("n_returning", col("n_active") - col("n_new"))
      .withColumn("new_permille", expr("(n_new * 1000) div n_active"))
  }

  /** Two-window level-shift detector — the volume-monitoring alarm
    * next to the drift monitors: per (type, day), compare the last
    * `window` OBSERVATIONS' total against the `window` before
    * (observation frames, not calendar — the autocorr convention,
    * stated: a gap day simply doesn't contribute a row) and flag
    * days where the change exceeds `thresholdPermille` of the prior
    * level. The test is cross-multiplied — |recent − prev|·1000 >
    * threshold·prev — exact integers, no division, no floats.
    * Catches what KS/TV drift (value-distribution) miss: the VOLUME
    * cliff (a source going dark, a bot wave arriving).
    *
    * Shape: one (type, day) pre-aggregate, then ONE type-keyed
    * window carrying both frame sums and the row counter — three
    * window columns, one exchange, output bounded by type×day. */
  def levelShift(events: DataFrame, window: Int = 7,
                 thresholdPermille: Long = 500L): DataFrame = {
    require(window >= 1, "window must be >= 1")
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val recent = w.rowsBetween(-(window - 1), Window.currentRow)
    val prev = w.rowsBetween(-(2 * window - 1), -window)
    daily
      .withColumn("__rn", row_number().over(w))
      .withColumn("recent_total", sum(col("n")).over(recent))
      .withColumn("prev_total", sum(col("n")).over(prev))
      .filter(col("__rn") >= 2 * window && col("prev_total") > 0)
      .withColumn("change_permille",
        expr("(abs(recent_total - prev_total) * 1000) div prev_total"))
      .filter(
        abs(col("recent_total") - col("prev_total")) * 1000 >
          lit(thresholdPermille) * col("prev_total"))
      .select(col("event_type"), col("day"), col("recent_total"),
        col("prev_total"), col("change_permille"))
  }

  /** Seasonal-naive forecast backtest — the baseline every capacity /
    * anomaly forecast must beat (Hyndman & Athanasopoulos, fpp3 §5.2:
    * "forecast = the value one season ago"), scored over the
    * history: daily counts per type, forecast(d) = actual(d −
    * season), and the exact error rollup — total absolute error,
    * signed bias, MAE in milli-events, and WAPE permille (the
    * scale-free one to alert on). Only days WITH a season-prior
    * observation are scored (inner join, stated — no zero-filled
    * phantom errors); all integers, no floats.
    *
    * Shape: one (type, day) pre-aggregate — the join and everything
    * after runs on type×day rows, never events; the self-join is
    * keyed on (type, shifted day). */
  def seasonalNaiveBacktest(events: DataFrame,
                            seasonDays: Int = 7): DataFrame = {
    require(seasonDays > 0, "season must be positive")
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("__day"))
      .agg(count(lit(1)).as("actual"))
    val lagged = daily.select(col("event_type"),
      date_add(col("__day"), seasonDays).as("__day"),
      col("actual").as("forecast"))
    daily.join(lagged, Seq("event_type", "__day"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days_scored"),
        sum(abs(col("actual") - col("forecast"))).as("total_abs_err"),
        sum(col("actual") - col("forecast")).as("total_bias"),
        sum(col("actual")).as("total_actual"))
      .withColumn("mae_milli",
        expr("(total_abs_err * 1000) div n_days_scored"))
      .withColumn("wape_permille",
        expr("(total_abs_err * 1000) div total_actual"))
  }

  /** Inter-arrival cadence profile — the bot fingerprint next to the
    * transition matrix: scripted traffic fires on a timer, so its
    * inter-event gaps are NEAR-CONSTANT (tiny IQR relative to the
    * median) while humans are bursty. Per user: gap count, min, and
    * exact ORDER-STATISTIC gaps in microseconds — lower median
    * (rank (n+1) div 2), p25 (rank (n+3) div 4 = ceil(n/4)), p75
    * (rank (3n+3) div 4) — rank conventions stated, all integers, no
    * interpolation, so the profile is bit-identical on any engine.
    * `regularity_permille` = 1000 − min(1000, iqr·1000 div median):
    * 1000 = metronome (flag it), → 0 = bursty human.
    *
    * Shape: the gap lag and the rank row_number are two windows on
    * the SAME user-keyed (ts, event_id) ordering — one exchange; the
    * order-statistic picks are three conditional aggregates over the
    * ranked gaps; output bounded by users. */
  def cadenceProfile(events: DataFrame, minGaps: Long = 3L): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val us = unix_micros(col("ts"))
    val gaps = events
      .withColumn("__gap", us - lag(us, 1).over(w))
      .filter(col("__gap").isNotNull)
    val ranked = gaps
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col("user_id")).orderBy(col("__gap"), col("event_id"))))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col("user_id"))))
    ranked.groupBy(col("user_id"))
      .agg(
        max(col("__n")).as("n_gaps"),
        min(col("__gap")).as("min_gap_us"),
        max(when(col("__rk") === expr("(__n + 1) div 2"), col("__gap")))
          .as("median_gap_us"),
        max(when(col("__rk") === expr("(__n + 3) div 4"), col("__gap")))
          .as("p25_gap_us"),
        max(when(col("__rk") === expr("(3 * __n + 3) div 4"), col("__gap")))
          .as("p75_gap_us"))
      .filter(col("n_gaps") >= minGaps)
      .withColumn("iqr_us", col("p75_gap_us") - col("p25_gap_us"))
      .withColumn("regularity_permille",
        when(col("median_gap_us") > 0,
          lit(1000L) - least(lit(1000L),
            expr("(iqr_us * 1000) div median_gap_us")))
          .otherwise(lit(1000L)))
  }

  /** Half-life-decayed activity counts — the freshness-weighted
    * popularity every trending/ranking surface needs ("what is hot
    * NOW, not what was hot all year"), in EXACT integers: the decay
    * factor is quantized to whole half-lives, so each event's weight
    * is `unit div 2^age_halflives` — a floor division by a power of
    * two, bit-identical on any engine, rather than the float
    * `exp(-λ·age)` whose last ulp differs across libm builds. The
    * quantization (step decay, not smooth) is the stated deviation;
    * within a half-life every event weighs the same. The anchor is
    * the corpus max timestamp (1-row broadcast), so the result is a
    * pure function of the data. `freshness_permille` =
    * decayed·1000 div (n·unit) compresses the profile to "how recent
    * is this type's activity" (1000 = all within one half-life).
    *
    * Shape: one scan-side projection (age → shift → weight, all
    * codegen'd), one type-keyed aggregate, the 1-row anchor
    * broadcast. Shifts clamp at 62 half-lives (weight 0 beyond —
    * 2^63 territory, stated). */
  def decayedCounts(events: DataFrame, halfLifeDays: Int = 7,
                    unit: Long = 1000000L): DataFrame = {
    require(halfLifeDays > 0, "half-life must be positive")
    require(unit > 0, "unit must be positive")
    val hlUs = halfLifeDays * 86400L * 1000000L
    val anchor = events.agg(max(unix_micros(col("ts"))).as("__anchor"))
    events
      .select(col("event_type"), unix_micros(col("ts")).as("__us"))
      .crossJoin(broadcast(anchor))
      .withColumn("__age",
        least(expr(s"(__anchor - __us) div ${hlUs}L"), lit(62L)).cast("int"))
      .withColumn("__w", expr(s"${unit}L div shiftleft(1L, __age)"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("__w")).as("decayed_units"))
      .withColumn("freshness_permille",
        expr(s"(decayed_units * 1000) div (n_events * ${unit}L)"))
  }

  /** Market-basket association rules over sessionized traffic
    * (Agrawal, Imieliński & Swami, SIGMOD 1993 — the support /
    * confidence / lift triple): baskets are sessions ([[sessionize]]'s
    * exact gap/tie semantics, window-for-window), items are the
    * DISTINCT event types inside each, and every ordered type pair
    * (a → b) is a rule. Where [[transitionMatrix]] sees only ADJACENT
    * events and [[funnelSteps]] a fixed order, this asks the orderless
    * question "sessions that contain a also contain b" — the
    * recommender/bundling primitive.
    *
    * All metrics exact integer permille: support = s(ab)·1000 div n,
    * confidence = s(ab)·1000 div s(a), lift = s(ab)·n·1000 div
    * (s(a)·s(b)) (>1000 = positive association). Exactness bound for
    * the lift numerator: s(ab)·n·1000 < 2^63 ⇒ n ≲ 3e7 sessions with
    * s(ab) ≤ n — beyond that, pre-divide at permille cost (stated
    * rather than silently floated).
    *
    * Scale shape: the session assignment rides ONE user-keyed window
    * (sessionize's exchange); items dedup to ≤ |types| rows per
    * session BEFORE the self-join, so the join fans out by
    * types-per-session² — bounded by the TYPE UNIVERSE squared per
    * session, never events²; the item-frequency side is
    * type-bounded and broadcast; totals are the 1-row broadcast
    * pattern. */
  def associationRules(events: DataFrame, gapMinutes: Int = 30,
                       minSupport: Long = 2L): DataFrame = {
    val gapUs = gapMinutes * 60L * 1000000L
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val us = unix_micros(col("ts"))
    val prev = lag(us, 1).over(w)
    val isNew = when(prev.isNull || (us - prev) > gapUs, 1).otherwise(0)
    val items = events
      .withColumn("__new", isNew)
      .withColumn("__seq",
        sum(col("__new")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(concat_ws("#", col("user_id"), col("__seq")).as("__sid"),
        col("event_type"))
      .distinct()
    val totals = items.agg(countDistinct(col("__sid")).as("__n"))
    val itemCounts = items.groupBy(col("event_type"))
      .agg(count(lit(1)).as("__s"))
    val co = items.select(col("__sid"), col("event_type").as("antecedent"))
      .join(items.select(col("__sid"), col("event_type").as("consequent")),
        "__sid")
      .filter(col("antecedent") =!= col("consequent"))
      .groupBy(col("antecedent"), col("consequent"))
      .agg(count(lit(1)).as("support_sessions"))
      .filter(col("support_sessions") >= minSupport)
    co
      .join(broadcast(itemCounts.select(col("event_type").as("antecedent"),
        col("__s").as("__sa"))), "antecedent")
      .join(broadcast(itemCounts.select(col("event_type").as("consequent"),
        col("__s").as("__sb"))), "consequent")
      .crossJoin(broadcast(totals))
      .select(col("antecedent"), col("consequent"), col("support_sessions"),
        expr("(support_sessions * 1000) div __n").as("support_permille"),
        expr("(support_sessions * 1000) div __sa").as("confidence_permille"),
        expr("(support_sessions * __n * 1000) div (__sa * __sb)")
          .as("lift_permille"))
  }

  /** Multi-touch conversion attribution — the marketing-analytics
    * credit split: each conversion distributes exactly 1000 permille
    * of credit equally over the user's touch events in the strict
    * lookback window `[conv_ts − lookback, conv_ts)`; the integer
    * remainder goes to the LAST touch (classic last-touch bias,
    * stated): credit = 1000 div n per touch, + (1000 mod n) for the
    * touch latest by (ts, event_id). Conversions with no touch in
    * window surface as the `(none)` row with their full 1000 — total
    * credit is conserved at 1000 × conversions by construction (the
    * audit invariant the spec pins).
    *
    * Determinism: the remainder-carrying touch is picked by a
    * row_number ordered (ts desc, event_id desc) — exact microsecond
    * integers, unique ids — so equal-timestamp touches resolve the
    * same way on any engine and partitioning.
    *
    * Scale shape: ONE user-keyed equi-join (conversions × touches)
    * whose range predicate caps per-pair volume at the user's touch
    * count inside the lookback window — per-user activity in a
    * bounded time span, the same governor as sessionize; the
    * per-conversion window is bounded by the same quantity; the final
    * aggregate is keyed on touch_type (output bounded by the type
    * universe). Nothing is collected. */
  def attribution(events: DataFrame, convType: String = "purchase",
                  touchTypes: Seq[String] = Seq("view", "click"),
                  lookbackMinutes: Int = 1440): DataFrame = {
    require(touchTypes.nonEmpty, "need at least one touch type")
    require(lookbackMinutes > 0, "lookback must be positive")
    val lookUs = lookbackMinutes * 60L * 1000000L
    val conv = events.filter(col("event_type") === convType)
      .select(col("user_id"), col("event_id").as("__conv_id"),
        unix_micros(col("ts")).as("__conv_us"))
    val touch = events.filter(col("event_type").isin(touchTypes: _*))
      .select(col("user_id"), col("event_id").as("__touch_id"),
        col("event_type").as("touch_type"),
        unix_micros(col("ts")).as("__touch_us"))
    val joined = conv.join(touch, Seq("user_id"))
      .filter(col("__touch_us") < col("__conv_us") &&
        col("__touch_us") >= col("__conv_us") - lookUs)
    val perConv = Window.partitionBy(col("__conv_id"))
    val lastFirst = Window.partitionBy(col("__conv_id"))
      .orderBy(col("__touch_us").desc, col("__touch_id").desc)
    val credited = joined
      .withColumn("__n", count(lit(1)).over(perConv))
      .withColumn("__rn", row_number().over(lastFirst))
      .withColumn("credit_permille",
        expr("1000 div __n") +
          when(col("__rn") === 1, expr("1000 - __n * (1000 div __n)"))
            .otherwise(lit(0L)))
    val attributed = credited.groupBy(col("touch_type"))
      .agg(countDistinct(col("__conv_id")).as("n_conversions"),
        sum(col("credit_permille")).as("credit_permille"))
    val unattributed = conv
      .join(credited.select(col("__conv_id")).distinct(),
        Seq("__conv_id"), "left_anti")
      .agg(count(lit(1)).as("n_conversions"))
      .select(lit("(none)").as("touch_type"), col("n_conversions"),
        (col("n_conversions") * 1000L).as("credit_permille"))
    attributed.unionByName(unattributed)
      .filter(col("n_conversions") > 0)
  }

  /** Discrete survival-hazard table — the time-to-churn view the
    * cohort family lacks: retention (E47) asks "how many came back in
    * week k", LTV (E164) asks "what did they spend by week k"; this
    * asks the actuarial question "GIVEN a user survived to tenure
    * week w, what fraction churned there" — the discrete-time
    * Kaplan–Meier hazard, the input to any churn model.
    *
    * Per user: tenure = ⌊(last − first) / week⌋ (exact nonneg integer
    * div on micros); churned iff the last event is more than
    * `churnGapDays` before the corpus horizon (later users are
    * right-CENSORED: they count in the at-risk denominators up to
    * their observed tenure but never as churn events — the
    * distinction naive "users whose last week was w" churn tables get
    * wrong). Per tenure week: n_risk = users with tenure ≥ w (reverse
    * running sum), n_churned, and hazard‰ = ⌊1000·d_w / n_w⌋, all
    * exact. The cumulative product survival CURVE is deliberately NOT
    * emitted: a Π(1 − h_i) of floats is the one step engines can
    * round differently — callers fold the exact hazard table instead.
    *
    * Shape: one per-user aggregate, a 1-row horizon broadcast, one
    * aggregate to the WEEK domain (tens of rows), and the reverse
    * cumulative window over that bounded domain — the single-task
    * window state is the week table, never users. */
  def survivalHazard(events: DataFrame, userCol: String = "user_id",
                     tsCol: String = "ts",
                     churnGapDays: Int = 7): DataFrame = {
    val weekUs = 7L * 86400L * 1000000L
    val gapUs = churnGapDays * 86400L * 1000000L
    val perUser = events.groupBy(col(userCol))
      .agg(min(unix_micros(col(tsCol))).as("__fu"),
        max(unix_micros(col(tsCol))).as("__lu"))
    val horizon = events.agg(max(unix_micros(col(tsCol))).as("__h"))
    val users = perUser.crossJoin(broadcast(horizon))
      .select(expr(s"(__lu - __fu) div $weekUs").as("tenure_w"),
        when(col("__lu") < col("__h") - gapUs, 1L).otherwise(0L)
          .as("__churned"))
    val byWeek = users.groupBy(col("tenure_w"))
      .agg(count(lit(1)).as("__ending"), sum(col("__churned")).as("n_churned"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("tenure_w").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    byWeek
      .withColumn("n_risk", sum(col("__ending")).over(w))
      .select(col("tenure_w"), col("n_risk"), col("n_churned"),
        expr("(1000 * n_churned) div n_risk").as("hazard_permille"))
  }

  /** Cumulative-distinct growth curve — the "total users ever" line
    * on every dashboard, which a per-bucket `countDistinct` cannot
    * produce (distincts don't add across buckets — the E225 sketch
    * store exists for the approximate rollup; this is the EXACT batch
    * derivation): per time bucket, events, active keys, NEW keys
    * (first appearance — each key charged to exactly one bucket via
    * one min-bucket aggregate), and the running distinct total, which
    * is simply the prefix sum of news (exactness by construction, no
    * distinct-union ever re-evaluated).
    *
    * Shape: two key/bucket-keyed hash aggregates + [[
    * graft.analytics.Distributed.prefixSums]] over buckets — the
    * running total stays distributed even at hour-grain × years
    * cardinality; nothing is collected. NULL keys/buckets excluded
    * (stated). */
  def cumulativeDistinct(df: DataFrame, keyCol: String,
                         bucketCol: String): DataFrame = {
    val e = df.filter(col(keyCol).isNotNull && col(bucketCol).isNotNull)
      .select(col(keyCol).as("__k"), col(bucketCol).as("__b"))
    val perBucket = e.groupBy(col("__b"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("__k")).as("n_active"))
    val news = e.groupBy(col("__k")).agg(min(col("__b")).as("__b"))
      .groupBy(col("__b")).agg(count(lit(1)).as("n_new"))
    val joined = perBucket.join(news, Seq("__b"), "left")
      .withColumn("n_new", coalesce(col("n_new"), lit(0L)))
    graft.analytics.Distributed.prefixSums(joined, "__b", Seq("n_new"))
      .select(col("__b").as(bucketCol), col("n_events"),
        col("n_active"), col("n_new"),
        col("n_new_cum").as("cum_distinct"))
  }

  /** Leakage-safe churn label builder — the supervised-dataset
    * constructor behind every retention model, with the one
    * discipline that decides whether the model is real: features
    * come STRICTLY from before the cutoff instant, the label
    * strictly from the [cutoff, cutoff+horizon) window after it, and
    * nothing crosses (a feature that peeks one event past the cutoff
    * is the classic target leak — the model "predicts" what it
    * already saw). Population = users with ≥1 feature-window event
    * (the users known at scoring time, stated); label = churned ⇔ no
    * activity in the horizon. Features: exact counts, type breadth,
    * value cents, recency days at cutoff.
    *
    * Shape: two filtered aggregates over one events pass each + one
    * left join keyed by user; output bounded by users. The cutoff
    * comparison is timestamp < DATE (midnight semantics — identical
    * cast rule on both engines, stated). */
  def churnLabels(events: DataFrame, cutoff: String,
                  horizonDays: Int = 7): DataFrame = {
    require(horizonDays >= 1, "horizonDays must be >= 1")
    val cut = to_date(lit(cutoff))
    val feat = events.filter(col("ts") < cut)
      .groupBy(col("user_id")).agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("event_type")).as("n_types"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("value_cents"),
        max(col("ts")).as("__last"))
      .withColumn("recency_days",
        datediff(cut, expr("CAST(__last AS DATE)")).cast("long"))
      .drop("__last")
    val active = events
      .filter(col("ts") >= cut && col("ts") < date_add(cut, horizonDays))
      .select(col("user_id")).distinct()
      .withColumn("__active", lit(true))
    feat.join(active, Seq("user_id"), "left")
      .withColumn("churned", coalesce(col("__active"), lit(false)) === false)
      .drop("__active")
  }

  /** Per-key Simpson diversity of a categorical mix (Simpson, Nature
    * 1949) — the third bot fingerprint beside E132's transition rows
    * and E158's cadence: a human's event mix is varied, a scripted
    * agent's collapses onto one or two types. diversity = 1 − D where
    * D = Σ nᵢ(nᵢ−1) / (n(n−1)) is the EXACT probability two events
    * drawn without replacement share a type — a rational, so the
    * whole statistic is integer arithmetic (the entropy alternative
    * needs p·log p floats; Simpson reads the same collapse exactly).
    * 1000‰ → every event a different type; 0 → monoculture; keys
    * with one event report NULL (no pair to draw — the honest
    * answer, not a fabricated extreme).
    *
    * Shape: one (key, type) aggregate + one key aggregate, both
    * map-side combinable; output bounded by keys. Per-term products
    * nᵢ(nᵢ−1) ≤ n² — inside BIGINT to n ~ 3·10⁹ events per key. */
  def keyedDiversity(events: DataFrame, keyCol: String = "user_id",
                     valueCol: String = "event_type"): DataFrame = {
    events.groupBy(col(keyCol), col(valueCol))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col(keyCol))
      .agg(sum(col("__c")).as("n_events"),
        count(lit(1)).as("n_types"),
        sum(col("__c") * (col("__c") - 1)).as("__num"))
      .select(col(keyCol), col("n_events"), col("n_types"),
        when(col("n_events") >= 2,
          lit(1000L) - expr("(__num * 1000) div (n_events * (n_events - 1))"))
          .as("diversity_permille"))
  }

  /** Frequent contiguous k-grams of per-user event-type sequences
    * (k = 3) — the sequence-mining step up from [[transitionMatrix]]'s
    * bigrams: "view→click→purchase happens 4,812 times across 3,007
    * users" is the behavioral motif a funnel DESIGN starts from
    * (which paths exist and at what support — the funnel then
    * measures the one you pick) and bot screening's second look
    * (scripted traffic replays long exact motifs at impossible
    * support). Contiguity is the point: unlike general sequential
    * patterns (PrefixSpan's gap-tolerant subsequences, combinatorial
    * candidate space), contiguous k-grams are ENUMERABLE by two
    * window leads — no candidate generation, no apriori rounds.
    *
    * Per-user order is the exact (ts, event_id) tiebreak every event
    * window here rides (equal-timestamp events sequence
    * deterministically under any partitioning). Support counted two
    * ways, both exact: total occurrences (overlapping — a user
    * looping view→view→view 10 times contributes 8) and DISTINCT
    * users (the spam-resistant denominator: one obsessive user can't
    * promote a motif past `minUsers`).
    *
    * Shape: one user-keyed window (two leads share it), one hash
    * aggregate keyed by the trigram (map-side combinable; output
    * bounded by types³, tiny vs events), HAVING-style support cut.
    * At 100 TB: shuffle = one events pass keyed by user for the
    * window, then type³-bounded traffic. */
  def frequentTrigrams(events: DataFrame, minCount: Long = 5L,
                       minUsers: Long = 2L): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events
      .withColumn("__t2", lead(col("event_type"), 1).over(w))
      .withColumn("__t3", lead(col("event_type"), 2).over(w))
      .filter(col("__t3").isNotNull)
      .groupBy(col("event_type").as("step1"), col("__t2").as("step2"),
        col("__t3").as("step3"))
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("user_id")).as("n_users"))
      .filter(col("n_occurrences") >= minCount &&
        col("n_users") >= minUsers)
  }

  /** Daily-volume autocorrelation (sample ACF at lags 1..maxLag; Box &
    * Jenkins 1970) — the PERIODICITY detector the seasonality shelf
    * reads before it models: [[seasonalNaiveBacktest]] ASSUMES a
    * 7-day cycle and [[hourOfDayEnvelope]]-style reports show shape,
    * but the ACF is what says WHICH lag the data actually repeats at
    * (weekly traffic peaks r₇; a 3-day cadence peaks r₃). The
    * CALENDAR-series companion of
    * [[graft.analytics.Correlation.returnAutocorr]], with both
    * deliberate contrasts stated: returns pair OBSERVATIONS on the
    * trading calendar (that operator's documented convention) and
    * finish in decimal/double ρ; an event-VOLUME series needs calendar
    * positions — a quiet day is a real zero, and pairing present days
    * only would compress the lag axis and alias the period — and gets
    * the fully-integer finish below. Exact where
    * every float ACF is not: with daily counts x_t (calendar
    * zero-filled — missing days are real zeros, not absent rows) and
    * S = Σx, n = days, the n²-scaled numerator at lag L,
    * num = n²·Σx_t·x_{t+L} − nS·(Σ_head x + Σ_tail x) + m·S², and
    * denominator den = n²·Σx² − nS² are INTEGER identities of the
    * textbook mean-centered sums (multiply everything by n² so x̄ =
    * S/n never divides early); both are emitted as exact BIGINTs and
    * acf = num/den is ONE double division of exact integers —
    * engine-identical (the q62/assortativity device). Degenerate
    * constant series (den = 0) yields NULL, never NaN.
    *
    * Shape: one daily count aggregate, one calendar explode
    * (`sequence(d0, d1)` — days, not events), one ≤64-entry lag cross
    * join + one equi-join on the day index, one per-lag aggregate:
    * everything after the first agg is calendar-sized, never
    * event-sized. Sums ride DECIMAL(38,0) internally (count products
    * at 100 TB overflow int64 — the q304 rule); the final BIGINT cast
    * is the stated fixture-scale contract. */
  def dailyAutocorrelation(events: DataFrame, maxLag: Int = 7,
                           tsCol: String = "ts"): DataFrame = {
    require(maxLag >= 1 && maxLag <= 64, "maxLag is config-sized (<= 64)")
    val spark = events.sparkSession
    val dec = "decimal(38,0)"
    val daily = events.select(to_date(col(tsCol)).as("__day"))
      .groupBy(col("__day")).agg(count(lit(1)).as("__c"))
    val bounds = daily.agg(min(col("__day")).as("__d0"),
      max(col("__day")).as("__d1"))
    // calendar-complete series: a quiet day is a 0, not a missing row
    // (an ACF over present-days-only would see a compressed lag axis)
    val days = bounds
      .select(col("__d0"), explode(expr("sequence(__d0, __d1)")).as("__day"))
      .join(daily, Seq("__day"), "left")
      .select(datediff(col("__day"), col("__d0")).cast("long").as("__t"),
        coalesce(col("__c"), lit(0L)).cast(dec).as("__x"))
      .localCheckpoint() // feeds stats + both pair-join sides
    val stats = days.agg(count(lit(1)).cast(dec).as("__n"),
      sum(col("__x")).cast(dec).as("__s"),
      sum(col("__x") * col("__x")).cast(dec).as("__q"))
    val lags = spark.range(1, maxLag + 1).select(col("id").as("lag"))
    val tail = days.select(col("__t").as("__tb"), col("__x").as("__xb"))
    val perLag = days.select(col("__t"), col("__x").as("__xa"))
      .crossJoin(broadcast(lags))
      .join(tail, col("__tb") === col("__t") + col("lag"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).cast(dec).as("__m"),
        sum(col("__xa") * col("__xb")).cast(dec).as("__p"),
        sum(col("__xa")).cast(dec).as("__a"),
        sum(col("__xb")).cast(dec).as("__b"))
    perLag.crossJoin(broadcast(stats))
      .select(col("lag"), col("__m").cast("long").as("n_pairs"),
        (col("__n") * col("__n") * col("__p")
          - col("__n") * col("__s") * (col("__a") + col("__b"))
          + col("__m") * col("__s") * col("__s")).cast(dec).as("__num"),
        (col("__n") * col("__n") * col("__q")
          - col("__n") * col("__s") * col("__s")).cast(dec).as("__den"))
      .select(col("lag"), col("n_pairs"),
        col("__num").cast("long").as("num_scaled"),
        col("__den").cast("long").as("den_scaled"),
        when(col("__den") =!= 0,
          col("__num").cast("double") / col("__den").cast("double"))
          .as("acf"))
  }
}
