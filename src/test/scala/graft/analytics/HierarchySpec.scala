package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HierarchySpec extends SparkSpec {
  import spark.implicits._

  private def tree(ts: (Long, Option[Long], Long)*) =
    ts.toDF("node", "parent", "m")

  test("subtreeRollup: hand tree — totals, counts, parent shares") {
    val t = tree((1L, None, 10L), (2L, Some(1L), 20L),
      (3L, Some(1L), 30L), (4L, Some(2L), 40L))
    val out = Hierarchy.subtreeRollup(t, "node", "parent", "m")
      .collect().map(r => r.getLong(0) -> r).toMap
    out(1L).getLong(4) shouldBe 100L
    out(1L).getLong(3) shouldBe 4L
    out(1L).isNullAt(5) shouldBe true          // root: share undefined
    out(2L).getLong(4) shouldBe 60L
    out(2L).getLong(5) shouldBe 600L           // 60/100
    out(3L).getLong(5) shouldBe 300L
    out(4L).getLong(4) shouldBe 40L
    out(4L).getLong(5) shouldBe 666L           // 40/60 floored
  }

  test("subtreeRollup: a forest — each root rolls up only its own tree; singletons are their own subtree") {
    val t = tree((1L, None, 5L), (2L, Some(1L), 7L),
      (10L, None, 100L), (11L, Some(10L), 1L), (99L, None, 3L))
    val out = Hierarchy.subtreeRollup(t, "node", "parent", "m")
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    out(1L) shouldBe 12L
    out(10L) shouldBe 101L
    out(99L) shouldBe 3L
  }

  test("subtreeRollup: depth-10 chain closes in log rounds; an insufficient cap throws") {
    val chain = tree((0L, None, 1L) +:
      (1 to 10).map(i => (i.toLong, Some(i - 1L), 1L)): _*)
    val r = Hierarchy.subtreeRollup(chain, "node", "parent", "m",
        maxRounds = 5)   // 2^4 = 16 >= 10, +1 round to detect stability
      .filter(col("node") === 0L).collect().head
    r.getLong(4) shouldBe 11L
    an[IllegalStateException] should be thrownBy
      Hierarchy.subtreeRollup(chain, "node", "parent", "m", maxRounds = 2)
  }

  test("subtreeRollup: a parent cycle is refused loudly, not aggregated") {
    val t = tree((1L, Some(2L), 1L), (2L, Some(1L), 1L), (3L, None, 1L))
    an[IllegalStateException] should be thrownBy
      Hierarchy.subtreeRollup(t, "node", "parent", "m")
  }

  test("subtreeRollup is invariant under input partitioning") {
    val t = tree((0 to 120).map(i =>
      (i.toLong, if (i == 0) None else Some((i - 1L) / 4), (i % 13 + 1).toLong)): _*)
    assertSameRows(
      Hierarchy.subtreeRollup(t, "node", "parent", "m"),
      Hierarchy.subtreeRollup(t.repartition(7), "node", "parent", "m"))
  }
}
