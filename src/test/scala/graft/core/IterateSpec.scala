package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[Iterate.barrierCounted]]'s contract: the returned frame is
  * the barrier-materialized input (stats reset, lineage cut — same as
  * [[Iterate.barrier]]) and the returned count equals the number of
  * rows matching the predicate, collected from the checkpoint's own
  * action (no second job on the fast path). The fixpoint loops in
  * Dedup.componentLabels and LinkGraph.stronglyConnected ride this
  * for their convergence check. */
class IterateSpec extends SparkSpec {
  import spark.implicits._

  test("barrierCounted returns the frame and the changed-row count") {
    val in = Seq((1L, 10L, 10L), (2L, 5L, 7L), (3L, 1L, 2L))
      .toDF("node", "label", "__old")
    val (out, n) = Iterate.barrierCounted(in, col("label") =!= col("__old"))
    n shouldBe 2L
    out.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1) shouldBe
      Array((1L, 10L, 10L), (2L, 5L, 7L), (3L, 1L, 2L))
  }

  test("barrierCounted: zero changes and empty input both count 0") {
    val same = Seq((1L, 4L, 4L)).toDF("node", "label", "__old")
    Iterate.barrierCounted(same, col("label") =!= col("__old"))._2 shouldBe 0L
    val empty = same.filter(lit(false))
    Iterate.barrierCounted(empty, col("label") =!= col("__old"))._2 shouldBe 0L
  }

  test("barrierCounted frame survives downstream joins like barrier") {
    val in = Seq((1L, 1L, 2L), (2L, 1L, 1L)).toDF("node", "label", "__old")
    val (out, n) = Iterate.barrierCounted(in, col("label") =!= col("__old"))
    n shouldBe 1L
    // self-join over the materialized frame — the shape every fixpoint
    // round feeds back; must not recompute the observe plan
    val j = out.select(col("node"), col("label").as("p"))
      .join(out.select(col("node").as("p"), col("label").as("g")), "p")
    j.count() shouldBe 2L
  }
}
