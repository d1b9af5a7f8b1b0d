package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.SketchFunctions

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  private def facts = (1L to 1000L).map(i => (i, i % 97)).toDF("fact_id", "key")
  private def dim = Seq(3L, 5L, 11L, 42L).toDF("dkey")

  test("bloom semi join equals the plain semi join exactly") {
    val plain = facts.join(dim, col("key") === col("dkey"), "left_semi")
    val bloomed = BloomJoin.semiJoinWithBloom(facts, dim, "key", "dkey",
      expectedItems = 100L)
    assertSameRows(bloomed, plain)
  }

  test("bloom probe: no false negatives, NULL keys drop, fpp bounded") {
    val bf = dim.stat.bloomFilter("dkey", 100L, 0.01)
    val probed = facts
      .withColumn("key", when(col("fact_id") === 1L, lit(null)).otherwise(col("key")))
      .withColumn("hit", SketchFunctions.bloomMightContain(col("key"), bf))
    val hits = probed.filter(col("hit")).select("key").as[Long].collect()
    // every true member is admitted
    Set(3L, 5L, 11L, 42L).subsetOf(hits.toSet) shouldBe true
    // false-positive rate stays in the same order as requested fpp
    val falsePos = hits.count(k => !Set(3L, 5L, 11L, 42L).contains(k))
    falsePos.toDouble / 1000 should be < 0.05
    // NULL keys are filtered, not matched
    probed.filter(col("key").isNull && col("hit")).count() shouldBe 0L
  }

  test("interpreted eval matches codegen for the bloom probe") {
    val bf = dim.stat.bloomFilter("dkey", 100L, 0.01)
    def run(): Array[(Long, Boolean)] = facts
      .select(col("fact_id"),
        SketchFunctions.bloomMightContain(col("key"), bf).as("hit"))
      .orderBy("fact_id").as[(Long, Boolean)].collect()
    val codegen = run()
    val old = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try run() shouldBe codegen
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      old.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
        spark.conf.set("spark.sql.codegen.factoryMode", _))
    }
  }
}
