package graft.core

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

import graft.SparkSpec

/** Task-retry determinism drill — the OTHER nondeterminism source a
  * 100 TB run actually meets (every operator claims partitioning
  * invariance; none was tested under a failed-and-retried task until
  * round 17). The probe is a row-identity mapPartitions stage whose
  * attempt 0 of partition 0 throws; the session master is
  * `local[4, 2]`, so Spark retries the task and the job completes.
  * The assert is output equality with the clean (probe-free) run of
  * the same pipeline: if any stage's output were a function of
  * which ATTEMPT produced it — an RNG seeded per attempt, an
  * accumulator leaking into results, a non-idempotent side effect —
  * the retried run would diverge here, not at 100 TB.
  *
  * Target is q142's curation chain (quality gate → keep-first text
  * dedup → temperature mix → training shards), the registry's
  * deepest multi-stage composition, with probes injected BOTH before
  * the first shuffle (scan-stage retry) and after the dedup shuffle
  * (reduce-stage retry), so both ends of the shuffle see a replayed
  * task. */
class TaskRetrySpec extends SparkSpec {

  /** Identity pass-through that throws on attempt 0 of partition 0 —
    * the retried attempt (attemptNumber >= 1) counts itself into
    * `retries` (accumulator updates from FAILED attempts are
    * discarded by Spark, so counting successful retries is the
    * reliable evidence the drill actually engaged). */
  private def failOnceProbe(df: DataFrame, retries: LongAccumulator): DataFrame = {
    implicit val enc = Encoders.row(df.schema)
    df.mapPartitions { it =>
      val tc = TaskContext.get()
      if (tc != null && tc.partitionId() == 0) {
        if (tc.attemptNumber() == 0)
          throw new RuntimeException(
            "injected task failure (attempt 0, partition 0) — the retry drill")
        retries.add(1)
      }
      it
    }
  }

  test("q142 curation chain output is identical when tasks fail and retry mid-pipeline") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val retries = spark.sparkContext.longAccumulator("probe_retries")

    def chain(p1: DataFrame => DataFrame, p2: DataFrame => DataFrame) = {
      val gated = p1(graft.text.QualityRules.applyRules(docs))
      val deduped = p2(graft.etl.Merge.dedupKeepFirst(gated,
        Seq("text"), Seq(col("doc_id"))))
      val mixed = graft.etl.Sampling.temperatureMixSqrt(deduped, "lang", "doc_id")
      graft.etl.Sampling.trainShards(mixed, "doc_id", 8)
        .select(col("doc_id"), col("lang"), col("shard"), col("pos"))
        .orderBy(col("doc_id"))
    }

    val clean = chain(identity, identity).collect().map(_.toSeq).toSeq
    clean should not be empty

    val probed = chain(failOnceProbe(_, retries), failOnceProbe(_, retries))
      .collect().map(_.toSeq).toSeq
    withClue("no task was actually retried (probe not engaged — " +
      "master lost its maxFailures=2, or partition 0 was empty-planned): ") {
      retries.value.longValue should be >= 2L // one per probe site at minimum
    }
    probed shouldBe clean
  }

  test("a retried task recomputes identical shuffle input for an exact aggregate") {
    // The sharper failure mode: a retry during the MAP side of a
    // shuffle re-produces partition 0's shuffle blocks from scratch.
    // If map output depended on the attempt (any per-attempt
    // randomness), downstream EXACT sums would silently shift. Pinned
    // on the exact-decimal aggregate family the engine's money-math
    // rides on.
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val retries = spark.sparkContext.longAccumulator("probe_retries_agg")
    def agg(p: DataFrame => DataFrame) =
      p(docs).groupBy(col("lang"))
        .agg(count(lit(1)).as("n"),
          sum(expr("length(text)")).cast("long").as("chars"))
        .orderBy(col("lang"))
    val clean = agg(identity).collect().map(_.toSeq).toSeq
    val probed = agg(failOnceProbe(_, retries)).collect().map(_.toSeq).toSeq
    withClue("no task was actually retried: ") {
      retries.value.longValue should be >= 1L
    }
    probed shouldBe clean
  }

  test("kNN-graph descent (LSH seed + barrier round) is identical under a retried scan task") {
    // The round-17 pipeline with the riskiest retry surface: the
    // probe's partition 0 is re-read by BOTH sides of the LSH
    // self-join AND the two score-joins, and the descent round rides
    // Iterate.barrier (localCheckpoint) — a retry that reached the
    // materialized RDD non-deterministically would freeze a DIVERGED
    // graph into the checkpoint, invisible to any later run.
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val retries = spark.sparkContext.longAccumulator("probe_retries_descent")
    def run(p: DataFrame => DataFrame) =
      graft.similarity.Similarity.knnGraphDescent(p(emb), k = 5, rounds = 1)
        .orderBy(col("vec_id"), col("rank")).collect().map(_.toSeq).toSeq
    val clean = run(identity)
    clean should not be empty
    val probed = run(failOnceProbe(_, retries))
    withClue("no task was actually retried: ") {
      retries.value.longValue should be >= 1L
    }
    probed shouldBe clean
  }
}
