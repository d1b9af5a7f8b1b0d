package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean

/** Property tests (SURVEY §5.2): run a reduced case count — each case
  * executes real Spark jobs, so 20 cases per property is the budget. */
class PropertiesSpec extends SparkSpec {

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(20)

  private def check(name: String, p: Prop): Unit = {
    val res = SCTest.check(params, p)
    assert(res.passed, s"$name: $res")
  }

  private val rowGen = for {
    date <- Gen.oneOf("2024-01-01", "2024-01-02", "2024-01-03")
    sym <- Gen.oneOf("A", "B")
    src <- Gen.oneOf("av", "yh")
    close <- Gen.choose(1, 500).map(_.toDouble)
  } yield (date, sym, src, close)

  private def frame(rows: List[(String, String, String, Double)]) = {
    import spark.implicits._
    rows.zipWithIndex.map { case ((d, s, src, c), i) => (d, s, src, c, i.toLong) }
      .toDF("date", "symbol", "data_source", "close", "row_id")
  }

  test("property: dedup is idempotent and keeps one row per key") {
    check("dedup", Prop.forAll(Gen.listOfN(12, rowGen)) { rows =>
      rows.nonEmpty ==> {
        val keys = Seq("date", "symbol", "data_source")
        val once = Merge.dedupKeepFirst(frame(rows), keys, Seq(col("row_id")))
        val twice = Merge.dedupKeepFirst(once, keys, Seq(col("row_id")))
        val keyCount = rows.map(r => (r._1, r._2, r._3)).distinct.size
        once.count() == keyCount && twice.collect().toSet == once.collect().toSet
      }
    })
  }

  test("property: upsert apply-twice is idempotent and key-complete") {
    check("upsert", Prop.forAll(Gen.listOfN(6, rowGen), Gen.listOfN(4, rowGen)) {
      (t, s) => (t.nonEmpty && s.nonEmpty) ==> {
        val keys = Seq("date", "symbol", "data_source")
        val target = Merge.dedupKeepFirst(frame(t), keys, Seq(col("row_id")))
        val staging = Merge.dedupKeepFirst(frame(s), keys, Seq(col("row_id")))
        val once = Upsert.upsert(target, staging, keys)
        val twice = Upsert.upsert(once, staging, keys)
        val expectedKeys = (t.map(r => (r._1, r._2, r._3)) ++ s.map(r => (r._1, r._2, r._3))).distinct.size
        once.count() == expectedKeys && twice.collect().toSet == once.collect().toSet
      }
    })
  }

  test("property: validator monotonicity - appending a violating row never flips fail to pass") {
    import graft.quality.Validators
    import spark.implicits._
    check("monotone", Prop.forAll(Gen.listOfN(5, rowGen)) { rows =>
      rows.nonEmpty ==> {
        def validate(extra: List[(String, String, String, Double)]) = {
          val d = (rows ++ extra).map { case (dt, s, src, c) =>
            (dt, s, 1.0, 2.0, 0.5, c, 10L, src)
          }.toDF("date", "symbol", "open", "high", "low", "close", "volume", "data_source")
          Validators.validateRaw(d, today = lit("2024-06-01").cast("date")).passed
        }
        val bad = List(("2024-01-01", "A", "av", -5.0))
        !validate(bad) || validate(Nil) // validate(bad) passed => base must pass too
      }
    })
  }
}
