package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TopKSpec extends SparkSpec {
  import spark.implicits._

  private def topRows(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy("g")
      .agg(TopKFunctions.topKBy(col("v"), col("id"), k).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("g"), (col("pos") + 1).as("rank"),
        col("s.v").as("v"), col("s.id").as("id"))

  test("topKBy equals the window row_number idiom on random-ish data") {
    val d = (1 to 500).map(i =>
      (s"g${i % 7}", (i * 37 % 101).toLong, i.toLong)).toDF("g", "v", "id")
    val agg = topRows(d, 5)
      .as[(String, Long, Long, Long)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(col("v").desc, col("id"))
    val win = d.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5).select("g", "rank", "v", "id")
      .as[(String, Long, Long, Long)].collect().toSet
    agg shouldBe win
  }

  test("topKBy: ties break by id ascending; k beyond group size returns all") {
    val d = Seq(("a", 9L, 4L), ("a", 9L, 2L), ("a", 7L, 1L))
      .toDF("g", "v", "id")
    val out = topRows(d, 10)
      .select("rank", "v", "id").as[(Long, Long, Long)].collect().toSeq
    out shouldBe Seq((1L, 9L, 2L), (2L, 9L, 4L), (3L, 7L, 1L))
  }

  test("topKBy skips null values and ids (SQL aggregate semantics)") {
    val d = Seq(("a", Some(5L), Some(1L)), ("a", None, Some(2L)),
        ("a", Some(8L), None), ("a", Some(3L), Some(4L)))
      .toDF("g", "v", "id")
    val out = topRows(d, 2)
      .select("v", "id").as[(Long, Long)].collect().toSeq
    out shouldBe Seq((5L, 1L), (3L, 4L))
  }

  test("topKBy is exact under any partitioning (partial/merge path)") {
    val d = (1 to 2000).map(i =>
      (s"g${i % 3}", (i * 131 % 997).toLong, i.toLong)).toDF("g", "v", "id")
    assertSameRows(topRows(d, 7), topRows(d.repartition(13), 7))
  }

  test("topKBy plans as ObjectHashAggregate with NO sort of the input rows") {
    val d = (1 to 100).map(i => (s"g${i % 4}", i.toLong, i.toLong))
      .toDF("g", "v", "id")
    val out = d.groupBy("g")
      .agg(TopKFunctions.topKBy(col("v"), col("id"), 3).as("top"))
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    plan should include("ObjectHashAggregate")
    // the window idiom's defining cost — a per-group Sort of every
    // input row — must be absent from the aggregate plan
    plan should not include "Sort ["
  }

  private def mgRun(rows: Seq[Long], k: Int, parts: Int = 1): Map[Long, Long] = {
    import spark.implicits._
    rows.toDF("key").repartition(parts)
      .agg(TopKFunctions.frequentBy(col("key"), k).as("f"))
      .selectExpr("explode(f) AS e").select("e.id", "e.c")
      .as[(Long, Long)].collect().toMap
  }

  test("frequentBy: skewed stream — the heavy key survives with the MG bound") {
    // 500 copies of key 1 + 500 singletons; n = 1000, k = 10
    val rows = Seq.fill(500)(1L) ++ (1000L to 1499L)
    for (parts <- Seq(1, 7)) {
      val est = mgRun(rows, k = 10, parts)
      est.keySet should contain(1L)
      est(1L) should be >= (500L - 1000L / 11L)   // true - n/(k+1)
      est(1L) should be <= 500L                   // never overestimates
    }
  }

  test("frequentBy: at most k distinct keys means exact counts") {
    val rows = Seq.fill(7)(3L) ++ Seq.fill(4)(5L) ++ Seq(9L)
    val est = mgRun(rows, k = 5, parts = 3)
    est shouldBe Map(3L -> 7L, 5L -> 4L, 9L -> 1L)
  }

  test("frequentBy: every key above the n/(k+1) threshold is present under any partitioning") {
    // three majors at 300/250/200 of n=1000, k=4 -> threshold 200
    val rows = Seq.fill(300)(10L) ++ Seq.fill(250)(20L) ++
      Seq.fill(200)(30L) ++ (5000L until 5250L)
    for (parts <- Seq(1, 3, 13)) {
      val est = mgRun(rows, k = 4, parts)
      est.keySet should contain allOf (10L, 20L)  // strictly above n/5 = 200
      est.foreach { case (key, c) =>
        val truth = rows.count(_ == key).toLong
        c should be <= truth
        c should be >= truth - 1000L / 5L
      }
    }
  }

  /** Sum of ObjectHashAggregateExec's sort-fallback task counter over
    * the executed plan (0 when the hash path never overflowed). */
  private def fallbackTasks(df: org.apache.spark.sql.DataFrame): Long =
    df.queryExecution.executedPlan.collect {
      case p if p.nodeName.contains("ObjectHashAggregate") =>
        p.metrics.get("numTasksFallBacked").map(_.value).getOrElse(0L)
    }.sum

  // Memory-pressure evidence for the custom TypedImperativeAggregates
  // (the SpillPressureSpec discipline applied to the c-tier family):
  // under pressure ObjectHashAggregate abandons its hash map and
  // SORTS the remaining input, feeding each group's rows to the SAME
  // aggregate through the sort-based path — the one code path these
  // operators ride at 100 TB when group cardinality outgrows executor
  // memory, and the one that had zero evidence until round 17. A
  // 2-key fallback threshold forces it on toy data; the asserts are
  // (a) the fallback ACTUALLY engaged (numTasksFallBacked > 0 — a
  // threshold typo would otherwise turn this spec into a no-op) and
  // (b) output ≡ the no-pressure run.
  test("topKBy under sort-based fallback pressure matches the no-pressure run (q250 shape)") {
    // q250's registry shape on its real fixture: orders at sf0.01,
    // top-5 order keys by price cents per priority
    val o = graft.core.Tables.orders(spark, "/root/testdata/sf0.01")
      .select(col("o_orderpriority").as("g"),
        round(col("o_totalprice") * 100).cast("long").as("v"),
        col("o_orderkey").as("id"))
    val baseline = topRows(o, 5).orderBy("g", "rank")
      .collect().map(_.toSeq).toSeq
    baseline should not be empty
    withSQLConf(
      // AQE off so executedPlan is the plain tree the metric walk sees
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold" -> "2") {
      val out = topRows(o, 5).orderBy("g", "rank")
      val pressured = out.collect().map(_.toSeq).toSeq
      withClue("fallback threshold not binding (hash path never " +
        "overflowed — conf name drift?): ") {
        fallbackTasks(out) should be > 0L
      }
      pressured shouldBe baseline
    }
    // bounded top-k is a pure function of the group's multiset, so the
    // sorted-run path owes BIT-identical output, asserted above
  }

  test("frequentBy under sort-based fallback pressure keeps its guarantees") {
    import spark.implicits._
    // exact regime (≤ k distinct keys per group): the MG summary is a
    // pure function of the multiset — fallback owes bit-identity
    val exact = (1 to 300).map(i => (s"g${i % 9}", (i % 4).toLong))
      .toDF("g", "key")
    def runExact() = exact.groupBy("g")
      .agg(TopKFunctions.frequentBy(col("key"), 6).as("f"))
      .selectExpr("g", "explode(f) AS e").select(col("g"), col("e.id"), col("e.c"))
      .orderBy("g", "id")
    val base = runExact().collect().map(_.toSeq).toSeq
    withSQLConf(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold" -> "2") {
      val out = runExact()
      val pressured = out.collect().map(_.toSeq).toSeq
      withClue("fallback threshold not binding: ") {
        fallbackTasks(out) should be > 0L
      }
      pressured shouldBe base
    }
    // approximate regime (candidate set is order-dependent by MG's
    // nature, so bit-identity is NOT the contract — the published
    // bound is): heavy keys survive the sorted-run path with the same
    // n/(k+1) error envelope the partitioning-invariance spec pins
    val rows = Seq.fill(300)(10L) ++ Seq.fill(250)(20L) ++
      Seq.fill(200)(30L) ++ (5000L until 5250L)
    withSQLConf(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold" -> "2") {
      // 7 groups: the hash map must exceed the 2-key threshold per
      // task for the fallback to engage at all
      val out = rows.toDF("key")
        .withColumn("g", (col("key") % 7).cast("int"))
        .groupBy("g").agg(TopKFunctions.frequentBy(col("key"), 4).as("f"))
        .selectExpr("explode(f) AS e").select("e.id", "e.c")
      // collect on THIS frame (not through .as[...], which builds a
      // fresh QueryExecution whose metrics never run)
      val est = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      withClue("fallback threshold not binding: ") {
        fallbackTasks(out) should be > 0L
      }
      // per-group thresholds: all of 10/20/30 dominate their group
      est.keySet should contain allOf (10L, 20L, 30L)
      est.foreach { case (key, c) =>
        val truth = rows.count(_ == key).toLong
        c should be <= truth
        c should be >= truth - 1000L / 5L
      }
    }
  }

  test("frequentBy runs as ObjectHashAggregate without a sort") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i % 3, (i % 7).toLong)).toDF("g", "key")
      .groupBy("g").agg(TopKFunctions.frequentBy(col("key"), 4).as("f"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    plan should include("ObjectHashAggregate")
    plan should not include "Sort ["
  }
}
