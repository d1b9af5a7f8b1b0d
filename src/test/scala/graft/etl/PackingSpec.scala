package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (String, Long, Long)*) =
    rows.toDF("shard", "doc_id", "size")

  /** Single-threaded reference fold — the executable spec. */
  private def referencePack(sizes: Seq[(Long, Long)], cap: Long): Seq[(Long, Long)] = {
    var seq = 0L; var fill = cap + 1 // force open on first doc
    sizes.sortBy(_._1).map { case (id, sz) =>
      if (fill + sz <= cap) fill += sz else { seq += 1; fill = sz }
      id -> seq
    }
  }

  test("greedy packing: fits join the open pack, overflow opens the next") {
    val out = Packing.packGreedy(
      docs(("a", 1L, 800L), ("a", 2L, 900L), ("a", 3L, 400L), ("a", 4L, 100L),
        ("a", 5L, 1900L)),
      "shard", "doc_id", "size", capacity = 2000L)
      .orderBy("doc_id")
      .select("doc_id", "pack_seq", "pack_fill").as[(Long, Long, Long)].collect()
    // 800+900 fit (1700); 400 overflows? 1700+400>2000 -> pack 2
    out.toSeq shouldBe Seq((1L, 1L, 800L), (2L, 1L, 1700L),
      (3L, 2L, 400L), (4L, 2L, 500L), (5L, 3L, 1900L))
  }

  test("oversized documents get their own pack and never absorb followers") {
    val out = Packing.packGreedy(
      docs(("a", 1L, 5000L), ("a", 2L, 100L), ("a", 3L, 5000L), ("a", 4L, 100L)),
      "shard", "doc_id", "size", capacity = 2000L)
      .orderBy("doc_id").select("pack_seq").as[Long].collect()
    out.toSeq shouldBe Seq(1L, 2L, 3L, 4L)
  }

  test("shards pack independently; result is partitioning-invariant") {
    val base = (1L to 200L).map(i =>
      (s"s${i % 7}", i, 100L + (i * 37) % 900))
    val a = Packing.packGreedy(docs(base: _*), "shard", "doc_id", "size", 2048L)
    val b = Packing.packGreedy(docs(base: _*).repartition(13), "shard",
      "doc_id", "size", 2048L)
    assertSameRows(a, b)
    // per-shard assignment equals the single-threaded reference fold
    val got = a.select("shard", "doc_id", "pack_seq")
      .as[(String, Long, Long)].collect().groupBy(_._1)
    base.groupBy(_._1).foreach { case (shard, rows) =>
      val expect = referencePack(rows.map(r => (r._2, r._3)), 2048L).toMap
      got(shard).map(r => r._2 -> r._3).toMap shouldBe expect
    }
  }

  test("globalRowIndex equals the naive global row_number, distributed") {
    val d = (1 to 500).map(i => (i.toLong, (i * 37 % 101).toLong))
      .toDF("doc_id", "len").repartition(13)
    val got = Packing.globalRowIndex(d, Seq("len", "doc_id"))
      .select("doc_id", "row_idx").as[(Long, Long)].collect().toMap
    val naive = d.withColumn("rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("len"), col("doc_id"))))
      .select("doc_id", "rn").as[(Long, Int)].collect().toMap
    got.size shouldBe 500
    got.foreach { case (id, idx) => idx shouldBe naive(id).toLong }
  }

  test("globalRowIndex is invariant under input partitioning") {
    val d = (1 to 200).map(i => (i.toLong, (i * 7 % 31).toLong))
      .toDF("doc_id", "len")
    assertSameRows(
      Packing.globalRowIndex(d, Seq("len", "doc_id")),
      Packing.globalRowIndex(d.repartition(7), Seq("len", "doc_id")))
  }

  test("lengthBatches: consecutive slices of the length order, exact padding math") {
    val d = Seq((10L, 5L), (11L, 1L), (12L, 3L), (13L, 4L), (14L, 2L))
      .toDF("doc_id", "n_tokens")
    val out = Packing.lengthBatches(d, batchSize = 2)
      .as[(Long, Long, Long, Long, Long, Long, Option[Long])]
      .collect().sortBy(_._1)
    out.toSeq shouldBe Seq(
      (0L, 2L, 1L, 2L, 3L, 1L, Some(750L)),  // lens 1,2: pad 2*2-3=1
      (1L, 2L, 3L, 4L, 7L, 1L, Some(875L)),  // lens 3,4
      (2L, 1L, 5L, 5L, 5L, 0L, Some(1000L))) // tail batch: its own max
  }

  test("no pack exceeds capacity unless it holds a single oversized doc") {
    val base = (1L to 500L).map(i => (s"s${i % 5}", i, 50L + (i * 131) % 3000))
    val packed = Packing.packGreedy(docs(base: _*), "shard", "doc_id", "size", 2048L)
    val stats = Packing.packStats(packed, 2048L)
    val over = stats.filter(col("fill") > 2048L && col("n_docs") > 1).count()
    over shouldBe 0L
  }
}
