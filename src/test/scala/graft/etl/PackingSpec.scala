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

  /** Independent md5 token hash — java.security, not Spark: first 14
    * hex chars of md5(token) as a base-16 long, the tokenHash56
    * contract re-derived from first principles. */
  private def refHash(tok: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(tok.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.take(7).map(b => f"$b%02x").mkString, 16)
  }

  private def sftDocs(rows: (String, Long, String, String)*) =
    rows.toDF("shard", "doc_id", "prompt", "completion")

  test("sftPack: ids/mask layout hand-checked against an independent md5 hash") {
    val out = Packing.sftPack(
      sftDocs(("a", 1L, "p1 p2", "c1 c2 c3"), ("a", 2L, "q1", "r1")),
      "shard", "doc_id", "prompt", "completion", capacity = 10L)
      .collect()
    out.length shouldBe 1 // 6 + 3 = 9 <= 10: one window
    val r = out.head
    r.getLong(2) shouldBe 2L  // n_examples
    r.getLong(3) shouldBe 9L  // n_tokens
    val ids = r.getSeq[Long](4)
    val mask = r.getSeq[Int](5)
    ids shouldBe Seq(refHash("p1"), refHash("p2"), refHash("c1"),
      refHash("c2"), refHash("c3"), -1L,
      refHash("q1"), refHash("r1"), -1L, -2L)
    mask shouldBe Seq(0, 0, 1, 1, 1, 1, 0, 1, 1, 0)
  }

  test("sftPack: empty completion masks only the EOS; oversize examples drop") {
    val out = Packing.sftPack(
      sftDocs(("a", 1L, "p1 p2", ""),
        ("a", 2L, "t1 t2 t3 t4 t5", "u1 u2 u3 u4 u5")), // 11 > 8: dropped
      "shard", "doc_id", "prompt", "completion", capacity = 8L)
      .collect()
    out.length shouldBe 1
    val r = out.head
    r.getLong(2) shouldBe 1L
    r.getLong(3) shouldBe 3L
    r.getSeq[Long](4) shouldBe Seq(refHash("p1"), refHash("p2"), -1L,
      -2L, -2L, -2L, -2L, -2L)
    r.getSeq[Int](5) shouldBe Seq(0, 0, 1, 0, 0, 0, 0, 0)
  }

  test("sftPack: window split follows packGreedy; examples lay out in id order") {
    // capacity 7: ex1 (2+1+1=4) + ex2 (1+1+1=3) fill 7 exactly; ex3 opens pack 2
    val out = Packing.sftPack(
      sftDocs(("a", 1L, "a b", "c"), ("a", 2L, "d", "e"), ("a", 3L, "f", "g")),
      "shard", "doc_id", "prompt", "completion", capacity = 7L)
      .orderBy("pack_seq").collect()
    out.map(_.getLong(1)).toSeq shouldBe Seq(1L, 2L)
    out(0).getSeq[Long](4) shouldBe Seq(refHash("a"), refHash("b"),
      refHash("c"), -1L, refHash("d"), refHash("e"), -1L)
    out(1).getLong(2) shouldBe 1L
  }

  /** Sum of ObjectHashAggregateExec's sort-fallback task counter (the
    * TopKSpec device). */
  private def fallbackTasks(df: org.apache.spark.sql.DataFrame): Long =
    df.queryExecution.executedPlan.collect {
      case p if p.nodeName.contains("ObjectHashAggregate") =>
        p.metrics.get("numTasksFallBacked").map(_.value).getOrElse(0L)
    }.sum

  test("sftPack under sort-based fallback pressure is bit-identical (failure-mode tier)") {
    // the window-assembly collect_list rides ObjectHashAggregate; at
    // 100 TB the hash map overflows and the sort-based path must
    // produce the SAME padded windows — forced here with a 2-key
    // threshold, with the engaged-fallback metric asserted so a conf
    // name drift can't turn this into a no-op (the TopKSpec rules)
    val rows = (1L to 120L).map(i =>
      (s"s${i % 6}", i, s"p$i w$i", s"c$i x$i y$i"))
    val d = sftDocs(rows: _*)
    def run() = Packing.sftPack(d, "shard", "doc_id",
      "prompt", "completion", 48L).orderBy("shard", "pack_seq")
    val base = run().collect().map(_.toSeq).toSeq
    withSQLConf(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold" -> "2") {
      val out = run()
      val pressured = out.collect().map(_.toSeq).toSeq
      withClue("fallback threshold not binding: ") {
        fallbackTasks(out) should be > 0L
      }
      pressured shouldBe base
    }
  }

  test("sftPack: shards pack independently; deterministic across partitionings") {
    val rows = (1L to 60L).map(i =>
      (s"s${i % 3}", i, s"p$i w$i", s"c$i x$i y$i"))
    val d = sftDocs(rows: _*)
    val a = Packing.sftPack(d, "shard", "doc_id", "prompt", "completion", 32L)
    val b = Packing.sftPack(d.repartition(7), "shard", "doc_id",
      "prompt", "completion", 32L)
    assertSameRows(a, b)
    // every window is exactly capacity wide and mask is 0 wherever pad sits
    a.collect().foreach { r =>
      r.getSeq[Long](4).length shouldBe 32
      r.getSeq[Int](5).length shouldBe 32
      r.getSeq[Long](4).zip(r.getSeq[Int](5)).foreach { case (id, m) =>
        if (id == -2L) m shouldBe 0
      }
    }
  }
}
