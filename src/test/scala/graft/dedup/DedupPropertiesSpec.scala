package graft.dedup

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean

import graft.SparkSpec
import graft.etl.Skew

/** Property tests for the round-2 operator families. Case counts are
  * small (each case runs Spark jobs); properties target the invariants
  * the oracle cannot see — bounds, idempotence, salt-invariance. */
class DedupPropertiesSpec extends SparkSpec {

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(10)

  private def check(name: String, p: Prop): Unit = {
    val res = SCTest.check(params, p)
    assert(res.passed, s"$name: $res")
  }

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "eps",
    "zeta", "eta", "theta", "iota", "kappa")

  private val docGen: Gen[String] = for {
    n <- Gen.choose(3, 25)
    words <- Gen.listOfN(n, Gen.oneOf(vocab))
  } yield words.mkString(" ")

  private def docsFrame(texts: List[String]) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  test("property: minhash est_jaccard bounded in (0,1]; pairs ordered and unique") {
    check("minhash", Prop.forAll(Gen.listOfN(8, docGen)) { texts =>
      texts.nonEmpty ==> {
        val pairs = Dedup.minhashPairs(docsFrame(texts), threshold = 0.0).collect()
        pairs.forall { r =>
          val (a, b, j) = (r.getLong(0), r.getLong(1), r.getDouble(2))
          a < b && j > 0.0 && j <= 1.0
        } && pairs.map(r => (r.getLong(0), r.getLong(1))).distinct.length == pairs.length
      }
    })
  }

  test("property: identical texts always produce est_jaccard exactly 1.0") {
    check("minhash-dup", Prop.forAll(docGen) { text =>
      val pairs = Dedup.minhashPairs(docsFrame(List(text, text)), threshold = 0.0)
        .collect()
      pairs.length == 1 && pairs.head.getDouble(2) == 1.0
    })
  }

  test("property: simhash is a 32-bit value and identical docs collide at hamming 0") {
    check("simhash", Prop.forAll(docGen) { text =>
      val sims = Dedup.simhashes(docsFrame(List(text, text)))
        .select("simhash").collect().map(_.getLong(0))
      sims.length == 2 && sims(0) == sims(1) &&
        sims.forall(s => s >= 0L && s < (1L << 32))
    })
  }

  test("property: exact jaccard equals set arithmetic on shingles") {
    check("jaccard", Prop.forAll(docGen, docGen) { (t1, t2) =>
      def shingleSet(t: String): Set[String] = {
        val w = t.split(" ").toSeq
        (0 to w.length - 3).map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}").toSet
      }
      val (s1, s2) = (shingleSet(t1), shingleSet(t2))
      val expected = s1.intersect(s2).size.toDouble / s1.union(s2).size
      val got = Dedup.jaccardPairs(docsFrame(List(t1, t2)), threshold = 0.0)
        .collect().headOption.map(_.getDouble(2)).getOrElse(0.0)
      // hash collisions inside the shingle space are the only slack;
      // with md5-derived 30-bit hashes over tiny sets they don't occur
      math.abs(got - expected) < 1e-12
    })
  }

  test("property: saltedJoin is bucket-count-invariant") {
    val kv = for {
      k <- Gen.oneOf("a", "b", "c")
      v <- Gen.choose(0, 100)
    } yield (k, v)
    check("salted", Prop.forAll(Gen.listOfN(12, kv), Gen.choose(1, 6)) { (rows, buckets) =>
      rows.nonEmpty ==> {
        import spark.implicits._
        val left = rows.zipWithIndex
          .map { case ((k, v), i) => (k, v, i.toLong) }.toDF("k", "v", "rid")
        val dim = Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("k", "attr")
        val plain = left.join(dim, Seq("k")).collect().toSet
        Skew.saltedJoin(left, dim, Seq("k"), col("rid"), buckets)
          .collect().toSet == plain
      }
    })
  }
}
