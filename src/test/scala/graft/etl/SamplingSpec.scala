package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = (1L to 300L)
    .map(i => (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "de" else "fr"))
    .toDF("doc_id", "lang")

  test("hashSample is a pure function of values: partitioning-invariant") {
    val a = Sampling.hashSample(docs, "doc_id", 5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val b = Sampling.hashSample(docs.repartition(7), "doc_id", 5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    a shouldBe b
    a.size should (be > 30 and be < 90) // ~60 expected at rate 5
  }

  test("hashSample membership never flips as unrelated rows arrive") {
    val early = Sampling.hashSample(docs.filter(col("doc_id") <= 150), "doc_id", 5)
      .select("doc_id").as[Long].collect().toSet
    val late = Sampling.hashSample(docs, "doc_id", 5)
      .select("doc_id").as[Long].collect().toSet
    early shouldBe late.filter(_ <= 150)
  }

  test("stratifiedSample returns exactly k per stratum, deterministically") {
    val s = Sampling.stratifiedSample(docs, "lang", "doc_id", k = 10)
    s.groupBy("lang").count().as[(String, Long)].collect().toMap shouldBe
      Map("en" -> 10L, "de" -> 10L, "fr" -> 10L)
    val again = Sampling.stratifiedSample(docs.repartition(5), "lang", "doc_id", k = 10)
    assertSameRows(s, again)
  }

  test("prioritySample: weight-biased, deterministic, guards bad weights") {
    val weighted = (1L to 400L)
      .map(i => (i, if (i % 2 == 0) "a" else "b",
        if (i <= 40) 1000L else 1L))   // 40 heavy rows among 400
      .toDF("doc_id", "stratum", "w")
    val out = Sampling.prioritySample(weighted, "stratum", "doc_id", "w", 10)
    out.count() shouldBe 20L // k per stratum
    // priorities u div w: the 1000x-weighted rows dominate the sample
    val heavy = out.filter(col("doc_id") <= 40).count()
    heavy should be >= 15L
    // pure function of the data
    assertSameRows(out,
      Sampling.prioritySample(weighted.repartition(9), "stratum",
        "doc_id", "w", 10))
    // zero weight refused loudly (it would ALWAYS win)
    an[IllegalArgumentException] should be thrownBy
      Sampling.prioritySample(
        Seq((1L, "a", 0L)).toDF("doc_id", "stratum", "w"),
        "stratum", "doc_id", "w", 5)
  }

  test("prioritySample membership is stable as unrelated strata arrive") {
    val base = (1L to 200L).map(i => (i, "a", i % 7 + 1)).toDF("doc_id", "stratum", "w")
    val more = base.union(
      (201L to 400L).map(i => (i, "b", i % 5 + 1)).toDF("doc_id", "stratum", "w"))
    val onlyA = Sampling.prioritySample(base, "stratum", "doc_id", "w", 8)
      .select("doc_id").as[Long].collect().toSet
    val withB = Sampling.prioritySample(more, "stratum", "doc_id", "w", 8)
      .filter(col("stratum") === "a")
      .select("doc_id").as[Long].collect().toSet
    withB shouldBe onlyA
  }

  test("quotaPerGroup keeps the top-k by the given order, and plans a group limit") {
    val scored = docs.withColumn("score", (col("doc_id") % 37).cast("double"))
    val capped = Sampling.quotaPerGroup(scored, Seq("lang"),
      Seq(col("score").desc, col("doc_id")), k = 7)
    capped.groupBy("lang").count().as[(String, Long)].collect()
      .foreach(_._2 shouldBe 7L)
    // every kept row's score is >= every dropped row's score (per lang)
    val minKept = capped.groupBy("lang").agg(min("score").as("mk"))
    val joined = scored.join(capped.select(col("doc_id").as("kid")),
        col("doc_id") === col("kid"), "left_anti")
      .join(minKept, "lang")
      .filter(col("score") > col("mk")).count()
    joined shouldBe 0L
    // the rn<=k filter must compile to a pre-shuffle WindowGroupLimit
    val plan = capped.queryExecution.executedPlan.toString
    plan should include("WindowGroupLimit")
  }

  test("stratifiedRateSample: rate-0 strata vanish, rate-10000 strata stay whole") {
    val s = Sampling.stratifiedRateSample(docs, "lang", "doc_id",
      Map("en" -> 10000, "de" -> 0), defaultPermyriad = 5000)
      .select("doc_id", "lang").as[(Long, String)].collect()
    s.count(_._2 == "en") shouldBe 100     // all of en
    s.count(_._2 == "de") shouldBe 0       // none of de
    val fr = s.count(_._2 == "fr")
    fr should (be > 25 and be < 75)        // ~50 of fr at 50%
    // nested-sample property: raising a rate only ADDS rows
    val half = Sampling.stratifiedRateSample(docs, "lang", "doc_id",
      Map("fr" -> 2500), defaultPermyriad = 0)
      .select("doc_id").as[Long].collect().toSet
    val more = Sampling.stratifiedRateSample(docs, "lang", "doc_id",
      Map("fr" -> 7500), defaultPermyriad = 0)
      .select("doc_id").as[Long].collect().toSet
    half.subsetOf(more) shouldBe true
  }

  test("upsampleToFactor: whole epochs exact, fractional epochs hash-chosen, nested") {
    val out = Sampling.upsampleToFactor(docs, "lang", "doc_id",
      Map("en" -> 20000, "de" -> 25000, "fr" -> 5000))
      .select("doc_id", "lang", "copy").as[(Long, String, Long)].collect()
    // en: exactly 2 copies of each of the 100 rows, copy ids 0 and 1
    out.count(_._2 == "en") shouldBe 200
    out.filter(_._2 == "en").map(_._3).toSet shouldBe Set(0L, 1L)
    // de: 2.5 epochs -> between 2x and 3x, every row at least twice
    val de = out.filter(_._2 == "de")
    de.size should (be > 220 and be < 280)
    de.groupBy(_._1).values.foreach(_.size should be >= 2)
    // fr: half epoch -> subset, copy 0 only
    val fr = out.filter(_._2 == "fr")
    fr.size should (be > 25 and be < 75)
    fr.map(_._3).toSet shouldBe Set(0L)
    // factor 0 strata vanish
    Sampling.upsampleToFactor(docs, "lang", "doc_id",
      Map("en" -> 0), defaultPermyriad = 0).count() shouldBe 0L
    // nested: raising a factor only ADDS (doc_id, copy) pairs
    val low = Sampling.upsampleToFactor(docs, "lang", "doc_id",
      Map("de" -> 12500), defaultPermyriad = 0)
      .select("doc_id", "copy").as[(Long, Long)].collect().toSet
    val high = Sampling.upsampleToFactor(docs, "lang", "doc_id",
      Map("de" -> 17500), defaultPermyriad = 0)
      .select("doc_id", "copy").as[(Long, Long)].collect().toSet
    low.subsetOf(high) shouldBe true
    // pure function of values
    assertSameRows(
      Sampling.upsampleToFactor(docs, "lang", "doc_id", Map("de" -> 25000)),
      Sampling.upsampleToFactor(docs.repartition(7), "lang", "doc_id",
        Map("de" -> 25000)))
  }

  test("tokenBudgetFill: first-crossing kept, rest dropped, audit complete") {
    val d = Seq(
      (1L, "en", 40L, 3L), (2L, "en", 30L, 4L), (3L, "en", 20L, 5L),
      (4L, "fr", 100L, 9L)
    ).toDF("doc_id", "lang", "quality", "n_tokens")
    // en by quality desc: doc1 (cum 3) -> doc2 (cum 7, crosses 6: kept,
    // cum_before 3 < 6) -> doc3 (cum 12, cum_before 7 >= 6: dropped)
    val out = Sampling.tokenBudgetFill(d, "lang", "n_tokens",
        budget = 6L, quality = Seq(col("quality").desc), tieCol = "doc_id")
      .select("doc_id", "cum_tokens", "kept")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    out shouldBe Array(
      (1L, 3L, true), (2L, 7L, true), (3L, 12L, false), (4L, 9L, true))
    // partitioning-proof
    assertSameRows(
      Sampling.tokenBudgetFill(d, "lang", "n_tokens", 6L,
        Seq(col("quality").desc), "doc_id"),
      Sampling.tokenBudgetFill(d.repartition(5), "lang", "n_tokens", 6L,
        Seq(col("quality").desc), "doc_id"))
  }

  test("trainShards: partitioning-invariant assignment, dense per-shard positions") {
    val a = Sampling.trainShards(docs, "doc_id", 8)
      .select("doc_id", "shard", "pos").as[(Long, Int, Long)].collect().sortBy(_._1)
    val b = Sampling.trainShards(docs.repartition(7), "doc_id", 8)
      .select("doc_id", "shard", "pos").as[(Long, Int, Long)].collect().sortBy(_._1)
    a shouldBe b
    a.map(_._2).distinct.sorted shouldBe (0 until 8).toArray
    // positions within a shard are 1..size, no gaps or duplicates
    a.groupBy(_._2).foreach { case (_, rows) =>
      rows.map(_._3).sorted shouldBe (1L to rows.length).toArray
    }
    // intra-shard order must not be the assignment hash's order: the
    // salted hash decorrelates them (doc ids ascending by pos would
    // betray a correlated order)
    val shard0 = a.filter(_._2 == 0).sortBy(_._3).map(_._1)
    shard0.sorted should not be shard0
  }

  test("mixToTarget downsamples toward the target proportions, anchor kept whole") {
    // counts: en=100, de=100, fr=100; targets en 60 / de 20 / fr 20 ->
    // en is the anchor (kept whole), de/fr keep ~1/3.
    val out = Sampling.mixToTarget(docs, "lang", "doc_id",
      Map("en" -> 60, "de" -> 20, "fr" -> 20))
    val byLang = out.groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    byLang("en") shouldBe 100L
    byLang("de").toDouble shouldBe (33.0 +- 15.0)
    byLang("fr").toDouble shouldBe (33.0 +- 15.0)
    // downsample-only: survivors are a subset of the input
    out.count() should be <= 300L
  }

  test("mixToTarget drops strata outside the target mix") {
    val kept = Sampling.mixToTarget(docs, "lang", "doc_id", Map("en" -> 1))
    kept.select("lang").distinct().as[String].collect() shouldBe Array("en")
    kept.count() shouldBe 100L // en is the anchor: kept whole
  }

  test("isqrt is the exact floor square root, including perfect-square edges") {
    Sampling.isqrt(0L) shouldBe 0L
    Sampling.isqrt(1L) shouldBe 1L
    Sampling.isqrt(2L) shouldBe 1L
    Sampling.isqrt(3L) shouldBe 1L
    Sampling.isqrt(4L) shouldBe 2L
    Sampling.isqrt(35L) shouldBe 5L
    Sampling.isqrt(36L) shouldBe 6L
    Sampling.isqrt(Long.MaxValue) shouldBe 3037000499L // floor(sqrt(2^63-1))
  }

  test("temperatureRatesSqrt: hand-computed α=1/2 rates, rarest stratum anchored") {
    // counts 100/25/4 -> weights 10/5/2; w/n = .1/.2/.5 -> anchor fr.
    // en: floor(10000*10*4/(100*2)) = 2000; de: floor(10000*5*4/(25*2)) = 4000.
    Sampling.temperatureRatesSqrt(Map("en" -> 100L, "de" -> 25L, "fr" -> 4L)) shouldBe
      Map("en" -> 2000, "de" -> 4000, "fr" -> 10000)
    // single stratum: trivially kept whole
    Sampling.temperatureRatesSqrt(Map("en" -> 7L)) shouldBe Map("en" -> 10000)
    // uniform counts: everything is an anchor-rate 10000 (no-op mix)
    Sampling.temperatureRatesSqrt(Map("a" -> 50L, "b" -> 50L)) shouldBe
      Map("a" -> 10000, "b" -> 10000)
  }

  test("temperatureMixSqrt flattens the skew; audit counts match the survivors") {
    // 240 en / 45 de / 15 fr: en keep-share must drop well below de/fr's.
    val skewed = (1L to 300L).map(i =>
      (i, if (i <= 240) "en" else if (i <= 285) "de" else "fr"))
      .toDF("doc_id", "lang")
    val audit = Sampling.temperatureMixAudit(skewed, "lang", "doc_id")
      .select("lang", "n_before", "weight", "rate_permyriad", "n_after")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    audit("en")._3 shouldBe 15L // isqrt(240)
    audit("fr")._4 shouldBe 10000L // rarest language anchored, kept whole
    audit("fr")._5 shouldBe 15L
    audit("en")._4 should be < audit("de")._4 // heavier stratum, lower rate
    // audit's n_after is exactly the operator's survivor count per stratum
    val mixed = Sampling.temperatureMixSqrt(skewed, "lang", "doc_id")
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    audit.values.foreach { case (l, _, _, _, after) =>
      mixed.getOrElse(l, 0L) shouldBe after
    }
    // downsample-only and deterministic under repartitioning
    val again = Sampling.temperatureMixSqrt(skewed.repartition(7), "lang", "doc_id")
    assertSameRows(Sampling.temperatureMixSqrt(skewed, "lang", "doc_id"), again)
  }

  test("purgedTimeFolds: hand-computed blocks, embargo purge, partitioning-proof") {
    // 10 consecutive days, k=2, embargo=1: span=10, block 0 = days
    // 0-4, block 1 = days 5-9. Fold 0 purges day 5 (adjacent to its
    // test block); fold 1 purges day 4.
    val rows = (0 until 10).map(i => (i.toLong, java.sql.Date.valueOf(
      java.time.LocalDate.of(2020, 1, 1).plusDays(i).toString)))
    val d = rows.toDF("i", "date")
    val out = Sampling.purgedTimeFolds(d, "date", k = 2, embargoDays = 1)
      .select(col("fold"), col("i"), col("role"))
      .as[(Long, Long, String)].collect().toSet
    def expectRole(f: Long, i: Long): String =
      if (f == 0) { if (i <= 4) "test" else if (i == 5) "purged" else "train" }
      else { if (i >= 5) "test" else if (i == 4) "purged" else "train" }
    out shouldBe (for (f <- 0L to 1L; i <- 0L to 9L)
      yield (f, i, expectRole(f, i))).toSet
    // pure function of values: any partitioning, same assignment
    val again = Sampling.purgedTimeFolds(d.repartition(7), "date", 2, 1)
      .select(col("fold"), col("i"), col("role"))
      .as[(Long, Long, String)].collect().toSet
    again shouldBe out
  }

  test("purgedTimeFolds: every row is test in exactly one fold; embargo 0 purges nothing") {
    val rows = (0 until 37).map(i => (i.toLong, java.sql.Date.valueOf(
      java.time.LocalDate.of(2021, 3, 2).plusDays(i * 3).toString)))
    val out = Sampling.purgedTimeFolds(rows.toDF("i", "date"), "date",
      k = 5, embargoDays = 0)
    out.filter(col("role") === "test").groupBy("i").count()
      .filter(col("count") =!= 1).count() shouldBe 0L
    out.filter(col("role") === "purged").count() shouldBe 0L
  }

  test("rendezvousShard: minimal remap — every moved key goes TO the new shard") {
    val keys = (1L to 2000L).toDF("doc_id")
    val both = Sampling.rendezvousShard(
      Sampling.rendezvousShard(keys, "doc_id", 8, "s8"), "doc_id", 9, "s9")
    val moved = both.filter(col("s8") =!= col("s9"))
    // the HRW contract: a key moves ONLY because the new shard wins it
    moved.filter(col("s9") =!= 8).count() shouldBe 0L
    // expected remap fraction 1/9 of 2000 ≈ 222; loose band
    val m = moved.count()
    m should (be > 100L and be < 400L)
    // mod-sharding remaps an order of magnitude more of the universe
    val modMoved = keys
      .withColumn("m8", Sampling.keyHash(col("doc_id")) % 8)
      .withColumn("m9", Sampling.keyHash(col("doc_id")) % 9)
      .filter(col("m8") =!= col("m9")).count()
    modMoved should be > 1500L // ~8/9 of keys
  }

  test("rendezvousShard: range, rough balance, partitioning invariance") {
    val keys = (1L to 2000L).toDF("doc_id")
    val a = Sampling.rendezvousShard(keys, "doc_id", 8)
    val counts = a.groupBy("shard").count().collect()
      .map(r => r.getAs[Int]("shard") -> r.getAs[Long]("count")).toMap
    counts.keySet shouldBe (0 until 8).toSet
    counts.values.foreach(_ should (be > 150L and be < 350L)) // 250 expected
    assertSameRows(a, Sampling.rendezvousShard(keys.repartition(7),
      "doc_id", 8))
  }

  test("randomizationTest: a huge real shift is significant, a null shift is not") {
    val shifted = ((1 to 40).map(i => (i.toLong, "A", 1000L + i)) ++
      (1 to 40).map(i => (1000L + i, "B", i.toLong)))
      .toDF("k", "g", "v")
    val sig = Sampling.randomizationTest(shifted, "k", "g", "v", "A",
      replicates = 100).collect().head
    sig.getLong(0) shouldBe 40L
    sig.getLong(1) shouldBe 40L
    // A sits ~1000 above B: chance relabelings essentially never match it
    sig.getLong(5) should be < 100L // p_permille
    // identical values in both groups: observed diff 0, EVERY replicate
    // is at least as extreme, p = 1000 exactly with the +1 correction
    val nul = ((1 to 30).map(i => (i.toLong, "A", 7L)) ++
      (1 to 30).map(i => (100L + i, "B", 7L)))
      .toDF("k", "g", "v")
    val p0 = Sampling.randomizationTest(nul, "k", "g", "v", "A",
      replicates = 50).collect().head
    p0.getLong(2) shouldBe 0L      // obs_num
    p0.getLong(4) shouldBe 50L     // every replicate extreme
    p0.getLong(5) shouldBe 1000L
  }

  test("randomizationTest is deterministic under input partitioning") {
    val d = (1 to 80).map(i =>
      (i.toLong, if (i % 4 == 0) "A" else "B", (i * 13 % 50).toLong))
      .toDF("k", "g", "v")
    assertSameRows(
      Sampling.randomizationTest(d, "k", "g", "v", "A", replicates = 40),
      Sampling.randomizationTest(d.repartition(7), "k", "g", "v", "A",
        replicates = 40))
  }

  test("bootstrapStats: mean weight ~1, replicates vary, fully deterministic") {
    import spark.implicits._
    val d = (1 to 1000).map(i => (s"k$i", 2.0)).toDF("k", "v")
    val out = Sampling.bootstrapStats(d, "k", "v", replicates = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    out.length shouldBe 10
    // Poisson(1) multiplicities: total resampled mass ~ rows*replicates
    val total = out.map(_._2).sum
    total.toDouble shouldBe 10000.0 +- 500.0
    // the resample actually varies (weights are not all 1)
    out.map(_._2).distinct.length should be > 1
    // weighted sum is exactly weight * constant value
    out.foreach { case (_, n, s) => s shouldBe n * 2.0 }
    // determinism: same replicates under any partitioning
    assertSameRows(
      Sampling.bootstrapStats(d, "k", "v", replicates = 10),
      Sampling.bootstrapStats(d.repartition(7), "k", "v", replicates = 10))
  }

  test("bootstrapStats spread brackets the true statistic") {
    import spark.implicits._
    // values 1..400: true sum 80200; the replicate sums should spread
    // AROUND it (a resample CI must cover the point estimate here)
    val d = (1 to 400).map(i => (s"r$i", i.toDouble)).toDF("k", "v")
    val sums = Sampling.bootstrapStats(d, "k", "v", replicates = 20)
      .select("sum_value").as[Double].collect()
    val trueSum = (1 to 400).map(_.toDouble).sum
    sums.min should be < trueSum
    sums.max should be > trueSum
  }
test("matchedCohort: 1:1 greedy rank pairing inside bands; tails unmatched") {
    import spark.implicits._
    val d = Seq(
      (1L, true, 1L), (3L, true, 1L),                    // band 1 treated
      (2L, false, 1L), (4L, false, 1L), (6L, false, 1L), // band 1 controls
      (9L, true, 2L))                                    // band 2: no control
      .toDF("id", "treated", "band")
    val out = Sampling.matchedCohort(d, "id", "treated", "band")
      .as[(Long, Long, Long, Long)].collect().toSet
    out shouldBe Set((1L, 1L, 1L, 2L), (1L, 2L, 3L, 4L))
    // control 6 and treated 9 stay unmatched; no cross-band fills
  }

  test("matchedCohort is invariant under input partitioning") {
    import spark.implicits._
    val d = (1 to 150).map(i => (i.toLong, i % 3 == 0, (i % 5).toLong))
      .toDF("id", "treated", "band")
    assertSameRows(Sampling.matchedCohort(d, "id", "treated", "band"),
      Sampling.matchedCohort(d.repartition(7), "id", "treated", "band"))
  }
test("signFlipTest: a huge one-sided uplift is significant; symmetric noise is not") {
    import spark.implicits._
    val strong = (1 to 60).map(i => (i.toLong, 100L + i % 7))
      .toDF("pair_id", "diff")
    val s = Sampling.signFlipTest(strong, "pair_id", "diff")
      .as[(Long, Long, Long, Long, Long)].head()
    s._1 shouldBe 60L
    s._5 should be < 100L     // p < 0.1: no flip pattern reaches +6k
    // antisymmetric diffs: flipping is measure-preserving, p is large
    val noise = (1 to 60).map(i =>
      (i.toLong, if (i % 2 == 0) 50L else -50L)).toDF("pair_id", "diff")
    val n = Sampling.signFlipTest(noise, "pair_id", "diff")
      .as[(Long, Long, Long, Long, Long)].head()
    n._2 shouldBe 0L          // observed sum is zero...
    n._5 shouldBe 1000L       // ...every replicate is at least as extreme
  }

  test("tokenBudgetMix: exact weight split, first-crossing kept, unweighted source dropped") {
    import spark.implicits._
    val docs = ((1 to 4).map(i => ("A", i.toLong, 10L)) ++
      (1 to 3).map(i => ("B", (i + 10).toLong, 10L)) ++
      Seq(("C", 99L, 10L))).toDF("source", "id", "n_tokens")
    val w = Seq(("A", 3L), ("B", 1L)).toDF("source", "weight")
    val out = Sampling.tokenBudgetMix(docs, "source", "n_tokens", w,
        totalBudget = 40L, order = Seq(col("id")), tieCol = "id")
    out.filter(col("source") === "C").count() shouldBe 0L   // no weight, dropped
    val kept = out.filter(col("kept"))
      .groupBy("source").agg(count(lit(1)).as("n"), sum("n_tokens").as("t"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    kept("A") shouldBe ((3L, 30L))   // budget 30 filled exactly
    kept("B") shouldBe ((1L, 10L))   // budget 10: first doc only
  }

  test("tokenBudgetMix: the crossing document is kept — overshoot, never silent undershoot") {
    import spark.implicits._
    val docs = (1 to 5).map(i => ("A", i.toLong, 10L)).toDF("source", "id", "n_tokens")
    val w = Seq(("A", 1L)).toDF("source", "weight")
    val kept = Sampling.tokenBudgetMix(docs, "source", "n_tokens", w,
        totalBudget = 25L, order = Seq(col("id")), tieCol = "id")
      .filter(col("kept"))
    kept.count() shouldBe 3L                       // 10+10 < 25, third crosses
    kept.agg(sum("n_tokens")).as[Long].head() shouldBe 30L
  }

  test("tokenBudgetMix is invariant under input partitioning") {
    import spark.implicits._
    val docs = (1 to 120).map(i =>
      (s"s${i % 4}", i.toLong, (i % 17 + 5).toLong)).toDF("source", "id", "n_tokens")
    val w = (0 to 3).map(i => (s"s$i", (i + 1).toLong)).toDF("source", "weight")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sampling.tokenBudgetMix(d, "source", "n_tokens", w, 800L,
        Seq(Sampling.keyHash(col("id"))), "id")
    assertSameRows(run(docs), run(docs.repartition(7)))
  }

  test("signFlipTest is deterministic and partition-invariant") {
    import spark.implicits._
    val d = (1 to 80).map(i => (i.toLong, (i * 13 % 41) - 20L))
      .toDF("pair_id", "diff")
    assertSameRows(Sampling.signFlipTest(d, "pair_id", "diff"),
      Sampling.signFlipTest(d.repartition(7), "pair_id", "diff"))
  }

  private def bh(ps: (Long, Long)*) = {
    import spark.implicits._
    Sampling.bhCorrection(ps.toSeq.toDF("test_id", "p"), "test_id", "p")
      .collect().map(r => r.getAs[Long]("test_id") ->
        r.getAs[Boolean]("rejected")).toMap
  }

  test("negativeSamples: deterministic, universe-mapped, never the pair itself") {
    import spark.implicits._
    val universe = Seq(10L, 20L, 30L, 40L, 50L).toDF("vec_id")
    val pos = Seq((10L, 20L), (30L, 40L)).toDF("anchor_id", "pos_id")
    val out = Sampling.negativeSamples(pos, universe, k = 4).collect()
    out should not be empty
    // negatives come from the universe and never hit the pair
    out.foreach { r =>
      Seq(10L, 20L, 30L, 40L, 50L) should contain(r.getAs[Long]("neg_id"))
      r.getAs[Long]("neg_id") should not be r.getAs[Long]("anchor_id")
      r.getAs[Long]("neg_id") should not be r.getAs[Long]("pos_id")
    }
    // pure function of (anchor, pos, slot): identical across runs
    // and partitionings
    val again = Sampling.negativeSamples(
      pos.repartition(3), universe.repartition(5), k = 4).collect()
    again.map(_.toSeq).toSet shouldBe out.map(_.toSeq).toSet
    // at most k slots per pair, each slot at most once
    out.groupBy(r => (r.getLong(0), r.getLong(1)))
      .foreach { case (_, rs) =>
        rs.length should be <= 4
        rs.map(_.getAs[Int]("slot")).distinct.length shouldBe rs.length }
  }

  test("negativeSamples: a universe of only the pair drops everything") {
    import spark.implicits._
    val out = Sampling.negativeSamples(
      Seq((1L, 2L)).toDF("anchor_id", "pos_id"),
      Seq(1L, 2L).toDF("vec_id"), k = 8)
    out.count() shouldBe 0L
  }

  test("proportionalQuotaSample: Hamilton quotas sum exactly to the budget") {
    import spark.implicits._
    // classes of 6/3/1 rows, budget 5: bases 3/1/0, remainders 0/5/5,
    // one leftover unit -> b (tie b < c): quotas 3/2/0
    val rows = (1 to 6).map(i => (i.toLong, "a")) ++
      (7 to 9).map(i => (i.toLong, "b")) ++ Seq((10L, "c"))
    val d = rows.toDF("doc_id", "lang")
    val out = Sampling.proportionalQuotaSample(d, "lang", "doc_id", 5L)
      .collect().groupBy(_.getAs[String]("lang")).view.mapValues(_.length).toMap
    out.getOrElse("a", 0) shouldBe 3
    out.getOrElse("b", 0) shouldBe 2
    out.getOrElse("c", 0) shouldBe 0
    // budget = population: everything survives
    Sampling.proportionalQuotaSample(d, "lang", "doc_id", 10L)
      .count() shouldBe 10L
    // deterministic under partitioning
    val a = Sampling.proportionalQuotaSample(d, "lang", "doc_id", 5L)
      .collect().map(_.toSeq).toSet
    val b = Sampling.proportionalQuotaSample(d.repartition(7),
      "lang", "doc_id", 5L).collect().map(_.toSeq).toSet
    a shouldBe b
  }

  test("bhCorrection: the step-up rescue — a rank-failing p is rejected via a later rank") {
    // m=4, alpha=50: p*m vs rank*50 -> 40<=50 pass, 120<=100 FAIL,
    // 140<=150 pass => k*=3, p*=35: 30 is rejected despite failing
    // its own rank; 900 stays
    val out = bh(1L -> 10L, 2L -> 30L, 3L -> 35L, 4L -> 900L)
    out shouldBe Map(1L -> true, 2L -> true, 3L -> true, 4L -> false)
  }

  test("bhCorrection: uniform-null table rejects nothing, all-tiny rejects all") {
    val nullish = (1L to 20L).map(i => i -> (i * 50L - 25L))
    bh(nullish: _*).values.forall(_ == false) shouldBe true
    val tiny = (1L to 20L).map(i => i -> 1L)
    bh(tiny: _*).values.forall(_ == true) shouldBe true
  }

  test("bhCorrection: tie p-values share one fate regardless of rank order") {
    // two ties at the threshold boundary: rejection is p <= p*, so
    // both reject together or neither does
    val out = bh(1L -> 25L, 2L -> 25L, 3L -> 5L, 4L -> 990L)
    out(1L) shouldBe out(2L)
    out(3L) shouldBe true
    out(4L) shouldBe false
    // and the whole report is partition-invariant
    import spark.implicits._
    val d = (1L to 60L).map(i => (i, i * 7919 % 1001)).toDF("test_id", "p")
    assertSameRows(Sampling.bhCorrection(d, "test_id", "p"),
      Sampling.bhCorrection(d.repartition(7), "test_id", "p"))
  }

  private def prefFixture = {
    import spark.implicits._
    Seq(
      // g1: chosen = id 1 (score 100 ties id 5 -> min id wins); inside
      // the 20-gap: id 4 (95) and id 5 (100) excluded; rejected
      // ascending: id 3 (60) then id 2 (80)
      ("g1", 1L, 100L), ("g1", 2L, 80L), ("g1", 3L, 60L),
      ("g1", 4L, 95L), ("g1", 5L, 100L),
      // g2: runner-up inside the gap -> no pairs at all
      ("g2", 6L, 50L), ("g2", 7L, 45L),
      // g3: singleton -> no pairs
      ("g3", 8L, 70L)
    ).toDF("grp", "doc_id", "score")
  }

  test("preferencePairs: best-vs-worst with gap filter, tiebreaks, empty groups") {
    import spark.implicits._
    val out = Sampling.preferencePairs(prefFixture, "grp", "doc_id", "score",
        minGap = 20L, maxRejected = 3)
      .select("grp", "chosen_id", "rejected_id", "chosen_score",
        "rejected_score", "gap", "pair_rank")
      .orderBy("grp", "pair_rank")
      .as[(String, Long, Long, Long, Long, Long, Int)].collect().toSeq
    out shouldBe Seq(
      ("g1", 1L, 3L, 100L, 60L, 40L, 1),
      ("g1", 1L, 2L, 100L, 80L, 20L, 2))
  }

  test("preferencePairs: maxRejected caps at the widest gaps; minGap=0 still excludes self") {
    val capped = Sampling.preferencePairs(prefFixture, "grp", "doc_id",
      "score", minGap = 20L, maxRejected = 1)
    capped.count() shouldBe 1L
    capped.select("rejected_id").head().getLong(0) shouldBe 3L
    // minGap = 0: the chosen row never pairs with itself, but its
    // score twin (id 5) does pair
    val zero = Sampling.preferencePairs(prefFixture, "grp", "doc_id",
      "score", minGap = 0L, maxRejected = 10)
    zero.filter(col("rejected_id") === col("chosen_id")).count() shouldBe 0L
    zero.filter(col("grp") === "g1").count() shouldBe 4L
  }

  test("weightedInterleave: every prefix tracks the target ratios; stride arithmetic by hand") {
    import spark.implicits._
    val d = ((1L to 40L).map(i => ("a", i, 3L)) ++
      (101L to 140L).map(i => ("b", i, 1L))).toDF("src", "doc_id", "w")
    val out = Sampling.weightedInterleave(d, "src", "doc_id", "w")
      .orderBy("position")
      .select("position", "src", "vt", "source_idx")
      .as[(Long, String, Long, Long)].collect().toSeq
    out.map(_._1) shouldBe (1L to 80L)
    // stride midpoints: a_i at (2i-1)e6/6, b_j at (2j-1)e6/2
    out.find(r => r._2 == "a" && r._4 == 1L).get._3 shouldBe 166666L
    out.find(r => r._2 == "b" && r._4 == 1L).get._3 shouldBe 500000L
    // WFQ prefix property: while both sources are live, source a
    // (weight 3) holds ~3/4 of every prefix within one stride
    for (n <- 4 to 52 by 4) {
      val na = out.take(n).count(_._2 == "a")
      withClue(s"prefix $n: ") { math.abs(na - 3 * n / 4) should be <= 1 }
    }
    assertSameRows(Sampling.weightedInterleave(d, "src", "doc_id", "w"),
      Sampling.weightedInterleave(d.repartition(7), "src", "doc_id", "w"))
  }

  test("weightedInterleave fails loudly on non-positive weights") {
    import spark.implicits._
    val bad = Seq(("a", 1L, 0L)).toDF("src", "doc_id", "w")
    val ex = intercept[Exception] {
      Sampling.weightedInterleave(bad, "src", "doc_id", "w").collect()
    }
    ex.getMessage should include("non-positive weight")
  }

  test("preferencePairs is partitioning-invariant") {
    import spark.implicits._
    val big = (1L to 400L)
      .map(i => (s"p${i % 13}", i, (i * 7919) % 500))
      .toDF("grp", "doc_id", "score")
    assertSameRows(
      Sampling.preferencePairs(big, "grp", "doc_id", "score", 10L, 3),
      Sampling.preferencePairs(big.repartition(7), "grp", "doc_id", "score",
        10L, 3))
  }
}
