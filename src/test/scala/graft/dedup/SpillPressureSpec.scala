package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Memory-pressure evidence for the worst shuffle in the registry
  * (q296's shingle self-join pair generation): all bench evidence runs
  * 128 GiB-comfortable, but at 100 TB the question is behavior when the
  * join's per-key buffers DON'T fit. This pins both halves of the
  * answer: under a deliberately tiny sort-merge-join buffer budget the
  * operator (a) actually spills — asserted from the executed plan's
  * spill metrics, the batch analogue of the stateOperators-metrics
  * discipline — and (b) produces bit-identical results to the
  * no-pressure run. Spill-path correctness is what makes the "it
  * degrades to disk, never to wrong answers" scale claim checkable. */
class SpillPressureSpec extends SparkSpec {

  test("q296 pair generation under memory pressure spills and matches the no-pressure run") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    def run() = Dedup.weightedJaccardPairs(docs, tauPermille = 500)
      .orderBy(col("doc_a"), col("doc_b"))
    val baseline = run().collect().map(_.toSeq).toSeq
    baseline should not be empty

    var spilled = 0L
    var pressured: Seq[Seq[Any]] = null
    withSQLConf(
      // broadcast off so the self-join really shuffles (the
      // RuntimeBloomFilterSpec device), AQE off so executedPlan is the
      // plain tree the metric collector walks
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      // a 2-row in-memory buffer + 4-row force-spill threshold: every
      // shingle key with df > 2 (the df cap admits up to 100) pushes
      // its match buffer through ExternalAppendOnlyUnsafeRowArray's
      // spill path — the same code path a 100 TB key group takes when
      // executor memory runs out
      "spark.sql.sortMergeJoinExec.buffer.in.memory.threshold" -> "2",
      "spark.sql.sortMergeJoinExec.buffer.spill.threshold" -> "4") {
      val out = run()
      pressured = out.collect().map(_.toSeq).toSeq
      spilled = out.queryExecution.executedPlan.collect {
        case p => p.metrics.collect {
          case (k, m) if k.toLowerCase.contains("spill") => m.value
        }.sum
      }.sum
    }
    withClue("the pressured run must actually have spilled " +
      "(plan spill metrics all zero — thresholds not binding?): ") {
      spilled should be > 0L
    }
    pressured shouldBe baseline
  }
}
