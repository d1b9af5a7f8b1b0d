package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Memory-pressure evidence for the WINDOW operators — the
  * SpillPressureSpec discipline (q296's SMJ buffer) applied to the
  * other big-state executor family. WindowExec buffers each partition
  * group in an ExternalAppendOnlyUnsafeRowArray; under a deliberately
  * tiny in-memory threshold every group pushes its buffer through the
  * spill path — the same code path a 100 TB hot key takes when its
  * group outgrows executor memory. Both halves asserted, per the
  * degrade-to-disk-not-to-wrong-answers contract: (a) the plan's
  * spillSize metrics are actually nonzero (a conf typo would silently
  * turn the spec into a no-op), and (b) output is bit-identical to the
  * no-pressure run. Targets are the two window shapes the registry
  * leans on hardest: q02's keep-first dedup row_number window (A2) and
  * the E223/E258 distributed prefix-sum primitive (range repartition +
  * per-partition running frame). */
class WindowSpillPressureSpec extends SparkSpec {

  /** Order-insensitive canonical form: q02's result order ties on
    * row_id (unique per SOURCE, not per merged row), so a raw
    * collect-order compare is partitioning-sensitive noise. */
  private def canon(rows: Array[org.apache.spark.sql.Row]): Seq[String] =
    rows.map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  private def spillBytes(df: DataFrame): Long =
    df.queryExecution.executedPlan.collect {
      case p => p.metrics.collect {
        case (k, m) if k.toLowerCase.contains("spill") => m.value
      }.sum
    }.sum

  private val pressureConfs = Seq(
    // AQE off so executedPlan is the plain tree the metric walk sees
    "spark.sql.adaptive.enabled" -> "false",
    // a 2-row in-memory buffer + 4-row force-spill threshold: every
    // window partition group larger than 2 rows takes the
    // ExternalAppendOnlyUnsafeRowArray spill path
    "spark.sql.windowExec.buffer.in.memory.threshold" -> "2",
    "spark.sql.windowExec.buffer.spill.threshold" -> "4")

  test("q02 dedup window is spill-immune by plan shape (WindowGroupLimit) and pressure-stable") {
    // The round-17 brief asked for spill evidence on q02's dedup
    // window; the measured answer is BETTER than a spill pin: Spark's
    // InferWindowGroupLimit rewrites the `row_number() = 1` filter
    // into partial+final WindowGroupLimit nodes, so the WindowExec
    // only ever sees groups already cut to 1 row — there is NO
    // unbounded group buffer in this plan, at any scale. Asserted
    // directly from the executed plan (if a future Spark or a query
    // edit loses the rewrite, this spec flags the new spill surface),
    // plus bit-identity under the 1-row buffer extreme as belt and
    // braces.
    def run() = graft.SparkEntry.queries("q02_merge_dedup")(
      spark, "/root/testdata/sf0.01")
    val baseline = canon(run().collect())
    baseline should not be empty

    withSQLConf((pressureConfs.map {
      case (k, _) if k.contains("windowExec") => k -> "1"
      case kv => kv
    }): _*) {
      val out = run()
      val pressured = canon(out.collect())
      withClue("the keep-first dedup must plan through the group-limit " +
        "pushdown (its scale story — no per-group buffering at all): ") {
        out.queryExecution.executedPlan.toString should
          include("WindowGroupLimit")
      }
      pressured shouldBe baseline
    }
  }

  test("q04 moving-average window under pressure spills and matches the no-pressure run") {
    // The registry's canonical MULTI-ROW-frame window (W2: four
    // trailing-average frames per symbol over the whole history):
    // per-symbol groups of hundreds of rows genuinely buffer, so this
    // is the shape whose spill path a 100 TB hot symbol exercises.
    def run() = graft.SparkEntry.queries("q04_moving_averages")(
      spark, "/root/testdata/sf0.01")
    val baseline = canon(run().collect())
    baseline should not be empty

    // 32/64 rather than the family 2/4: q04 computes FOUR frames over
    // ~2,400-row symbol groups, and a 2-row buffer fragments each
    // group into thousands of spill files whose concurrent LZ4
    // readers OOM the test heap — the evidence wants "big groups
    // degrade to disk", not "pathological fragmentation survives"
    withSQLConf(pressureConfs.map {
      case (k, _) if k.endsWith("in.memory.threshold") => k -> "32"
      case (k, _) if k.endsWith("spill.threshold") => k -> "64"
      case kv => kv
    }: _*) {
      val out = run()
      val pressured = canon(out.collect())
      withClue("the pressured run must actually have spilled " +
        "(window spill metrics all zero — thresholds not binding?): ") {
        spillBytes(out) should be > 0L
      }
      pressured shouldBe baseline
    }
  }

  test("prefixSums running frame under pressure spills and matches the no-pressure run") {
    import spark.implicits._
    // 2,000 distinct keys over 4 range partitions: each partition's
    // running-sum group is ~500 rows, far past the 2-row buffer
    val d = (1 to 2000).map(i => (i.toLong, (i * 37 % 101).toLong, (i % 13).toLong))
      .toDF("k", "a", "b")
    def run() = graft.analytics.Distributed
      .prefixSums(d, "k", Seq("a", "b")).orderBy("k")
    val baseline = canon(run().collect())
    baseline should have size 2000

    withSQLConf(pressureConfs: _*) {
      val out = run()
      val pressured = canon(out.collect())
      withClue("the pressured run must actually have spilled " +
        "(window spill metrics all zero — thresholds not binding?): ") {
        spillBytes(out) should be > 0L
      }
      pressured shouldBe baseline
    }
  }
}
