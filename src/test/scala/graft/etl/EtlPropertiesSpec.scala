package graft.etl

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean

import graft.SparkSpec
import graft.events.RangeJoin

/** Property tests for the round-3 operators: invariants the oracle's
  * single fixture cannot cover — brute-force equivalence across random
  * shapes, diff algebra, sampling determinism under re-partitioning. */
class EtlPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(8)

  private def check(name: String, p: Prop): Unit = {
    val res = SCTest.check(params, p)
    assert(res.passed, s"$name: $res")
  }

  private val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
  private def ts(minute: Long) = new java.sql.Timestamp(base + minute * 60000L)

  test("property: bucketized range join equals brute-force BETWEEN for any bucket width") {
    val gen = for {
      pts <- Gen.listOfN(20, Gen.choose(0L, 500L))
      ivs <- Gen.listOfN(8, for {
        s <- Gen.choose(0L, 450L); len <- Gen.choose(0L, 120L)
      } yield (s, s + len))
      width <- Gen.oneOf(60L, 600L, 3600L, 86400L)
    } yield (pts, ivs, width)
    check("rangeJoin", Prop.forAll(gen) { case (pts, ivs, width) =>
      val points = pts.zipWithIndex.map { case (m, i) => (i.toLong, ts(m)) }
        .toDF("pid", "ts")
      val intervals = ivs.zipWithIndex.map { case ((s, e), i) => (i.toLong, ts(s), ts(e)) }
        .toDF("iid", "s", "e")
      val bucketed = RangeJoin.pointInInterval(points, intervals, "ts", "s", "e", width)
        .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
      val brute = points.crossJoin(intervals)
        .filter(col("ts") >= col("s") && col("ts") <= col("e"))
        .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
      bucketed == brute
    })
  }

  test("property: heavyHitters equals the exact filter for any stream, phi, partitioning") {
    val gen = for {
      // zipf-flavored: small ids drawn much more often, so some runs
      // have hitters and some don't
      vals <- Gen.listOfN(120, Gen.frequency(
        6 -> Gen.const("a"), 3 -> Gen.const("b"), 2 -> Gen.const("c"),
        1 -> Gen.choose(0, 30).map(i => s"t$i")))
      phi <- Gen.oneOf(0.02, 0.1, 0.3, 0.6)
      parts <- Gen.oneOf(1, 3, 13)
    } yield (vals, phi, parts)
    check("heavyHitters", Prop.forAll(gen) { case (vals, phi, parts) =>
      val n = vals.size
      val expect = vals.groupBy(identity).view
        .mapValues(_.size.toLong).filter(_._2.toDouble > phi * n).toMap
      val got = Skew.heavyHitters(
          vals.toDF("v").repartition(parts), "v", phi)
        .as[(String, Long, Double)].collect()
        .map(r => r._1 -> r._2).toMap
      got == expect
    })
  }

  test("property: diffByKey(df, df) is all-unchanged; statuses partition the key universe") {
    val gen = for {
      before <- Gen.listOfN(12, Gen.zip(Gen.choose(0L, 15L), Gen.choose(0, 5)))
      after <- Gen.listOfN(12, Gen.zip(Gen.choose(0L, 15L), Gen.choose(0, 5)))
    } yield (before.distinctBy(_._1), after.distinctBy(_._1))
    check("diffByKey", Prop.forAll(gen) { case (b, a) =>
      val bd = b.toDF("id", "v")
      val ad = a.toDF("id", "v")
      val self = Merge.diffByKey(bd, bd, Seq("id"))
        .select("diff_status").distinct().as[String].collect().toSet
      val diff = Merge.diffByKey(bd, ad, Seq("id"))
        .as[(Long, String)].collect().toMap
      val bKeys = b.map(_._1).toSet
      val aKeys = a.map(_._1).toSet
      val bMap = b.toMap
      val aMap = a.toMap
      (b.isEmpty || self == Set("unchanged")) &&
        diff.keySet == (bKeys union aKeys) &&
        (bKeys union aKeys).forall { k =>
          diff(k) == ((bKeys(k), aKeys(k)) match {
            case (false, true) => "added"
            case (true, false) => "removed"
            case (true, true) =>
              if (bMap(k) == aMap(k)) "unchanged" else "changed"
            case _ => "impossible"
          })
        }
    })
  }

  test("property: hashSample commutes with any filter (membership is per-row)") {
    val gen = Gen.listOfN(60, Gen.choose(0L, 10000L)).map(_.distinct)
    check("hashSample", Prop.forAll(gen) { ids =>
      val d = ids.toDF("doc_id")
      val sampleThenFilter = Sampling.hashSample(d, "doc_id", 4)
        .filter(col("doc_id") % 2 === 0).as[Long].collect().sorted.toSeq
      val filterThenSample = Sampling.hashSample(
        d.filter(col("doc_id") % 2 === 0), "doc_id", 4)
        .as[Long].collect().sorted.toSeq
      sampleThenFilter == filterThenSample
    })
  }
}
