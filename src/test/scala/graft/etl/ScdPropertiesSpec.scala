package graft.etl

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec
import graft.events.EventAnalytics

/** Property tests for the round-13 additions: invariants single
  * fixtures cannot cover — SCD2 interval algebra on random change
  * feeds, diff status conservation, transition-count conservation,
  * temperature-rate bounds. */
class ScdPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(8)

  private def check(name: String, p: Prop): Unit = {
    val res = SCTest.check(params, p)
    assert(res.passed, s"$name: $res")
  }

  private val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
  private def ts(minute: Long) = new Timestamp(base + minute * 60000L)

  test("property: scd2 intervals tile each key's timeline — no overlap, no gap, one open end") {
    val gen = for {
      n <- Gen.choose(1, 24)
      rows <- Gen.listOfN(n, for {
        k <- Gen.choose(1L, 3L)
        m <- Gen.choose(0L, 40L)
        v <- Gen.oneOf("a", "b", "c")
      } yield (k, m, v))
    } yield rows.distinctBy(r => (r._1, r._2)) // one snapshot per (key, instant)
    check("scd2-tiling", Prop.forAll(gen) { rows =>
      val feed = rows.map { case (k, m, v) => (k, ts(m), v) }
        .toDF("user_id", "ts", "tier")
      val dim = Scd.scd2(feed, Seq("user_id"), Seq("tier"), "ts")
        .select("user_id", "tier", "valid_from", "valid_to")
        .as[(Long, String, Timestamp, Option[Timestamp])].collect()
      dim.groupBy(_._1).forall { case (k, ivs) =>
        val sorted = ivs.sortBy(_._3.getTime)
        val feedK = rows.filter(_._1 == k)
        val chains = sorted.zip(sorted.drop(1)).forall { case (a, b) =>
          a._4.contains(b._3) } // each close = next open: no gap/overlap
        val openEnds = sorted.count(_._4.isEmpty) == 1 &&
          sorted.last._4.isEmpty
        val startsAtMin = sorted.head._3 == ts(feedK.map(_._2).min)
        val noAdjacentDup = sorted.zip(sorted.drop(1))
          .forall { case (a, b) => a._2 != b._2 } // compaction is real
        chains && openEnds && startsAtMin && noAdjacentDup
      }
    })
  }

  test("property: scd2 snapshotAt replays the feed's latest value at any instant") {
    val gen = for {
      rows <- Gen.listOfN(12, for {
        m <- Gen.choose(0L, 30L); v <- Gen.oneOf("a", "b", "c", "d")
      } yield (m, v))
      probe <- Gen.choose(0L, 35L)
    } yield (rows.distinctBy(_._1), probe)
    check("scd2-replay", Prop.forAll(gen) { case (rows, probe) =>
      val feed = rows.map { case (m, v) => (1L, ts(m), v) }
        .toDF("user_id", "ts", "tier")
      val dim = Scd.scd2(feed, Seq("user_id"), Seq("tier"), "ts")
      val got = Scd.snapshotAt(dim, lit(ts(probe)))
        .select("tier").as[String].collect().toSeq
      val expect = rows.filter(_._1 <= probe).sortBy(_._1).lastOption
        .map(_._2).toSeq
      got == expect
    })
  }

  test("property: transitionMatrix conserves counts: Σ pairs = Σ (events_u - 1)") {
    val gen = Gen.listOfN(30, for {
      id <- Gen.choose(0L, 999L); u <- Gen.choose(1L, 4L)
      m <- Gen.choose(0L, 50L); t <- Gen.oneOf("x", "y", "z")
    } yield (id, u, m, t))
    check("transition-conservation", Prop.forAll(gen) { raw =>
      val rows = raw.distinctBy(_._1)
      val d = rows.map { case (id, u, m, t) =>
        (id, ts(m), u, t, 1.0, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      val out = EventAnalytics.transitionMatrix(d)
      val total = out.agg(sum("n_transitions")).as[Long].head()
      val expect = rows.groupBy(_._2).values.map(_.size.toLong - 1).sum
      // shares within a from-type sum to at most 1000, never above
      val shareOk = out.groupBy("from_type").agg(sum("share_permille").as("s"))
        .filter(col("s") > 1000).count() == 0L
      total == expect && shareOk
    })
  }

  test("property: temperature rates are in (0, 10000], anchor exact, monotone in count") {
    val gen = Gen.nonEmptyListOf(Gen.choose(1L, 5000L)).map(_.take(8))
    check("temperature-bounds", Prop.forAll(gen) { counts =>
      val m = counts.zipWithIndex.map { case (n, i) => s"s$i" -> n }.toMap
      val rates = Sampling.temperatureRatesSqrt(m)
      val inRange = rates.values.forall(r => r > 0 && r <= 10000)
      val anchored = rates.values.max == 10000
      // smoothing direction: a clearly larger stratum keeps a lower
      // rate. NOT pairwise-monotone in general — isqrt's floor makes
      // isqrt(3)/3 < isqrt(4)/4 — but it is once the gap clears the
      // floor wobble: na >= 4·nb with nb >= 4 guarantees
      // isqrt(na)/na <= isqrt(nb)/nb exactly (proof in the margin:
      // 1/√na <= (√nb−1)/nb under those bounds).
      val mono = m.toSeq.combinations(2).forall { case Seq((a, na), (b, nb)) =>
        val (big, small, nBig, nSmall) =
          if (na >= nb) (a, b, na, nb) else (b, a, nb, na)
        if (nBig >= 4 * nSmall && nSmall >= 4) rates(big) <= rates(small)
        else true
      }
      inRange && anchored && mono
    })
  }
}
