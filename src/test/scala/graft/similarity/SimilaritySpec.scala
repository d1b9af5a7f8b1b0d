package graft.similarity

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("vec_id", LongType, nullable = false),
    StructField("embedding", ArrayType(FloatType, containsNull = false), nullable = false)))

  private def vecs(rows: (Long, Seq[Float])*) =
    df(schema, rows.map { case (i, v) => Row(i, v) }: _*)

  test("cosine of identical unit vectors is 1, orthogonal is 0") {
    val d = vecs(
      1L -> Seq(1f, 0f, 0f, 0f), 2L -> Seq(1f, 0f, 0f, 0f),
      3L -> Seq(0f, 1f, 0f, 0f))
    val out = d.as("a").crossJoin(d.as("b"))
      .select(col("a.vec_id"), col("b.vec_id"),
        Similarity.cosine(col("a.embedding"), col("b.embedding")).as("c"))
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, c) => (a, b) -> c }.toMap
    out((1L, 2L)) shouldBe 1.0 +- 1e-12
    out((1L, 3L)) shouldBe 0.0 +- 1e-12
  }

  test("knnBruteForce returns k nearest, self excluded, rank ordered") {
    val d = vecs(
      0L -> Seq(1f, 0f, 0f, 0f),
      1L -> Seq(0.9f, 0.1f, 0f, 0f),
      2L -> Seq(0.5f, 0.5f, 0f, 0f),
      3L -> Seq(0f, 0f, 1f, 0f),
      4L -> Seq(-1f, 0f, 0f, 0f))
    val out = Similarity.knnBruteForce(d, d.filter(col("vec_id") === 0L), k = 3)
      .orderBy("rank").as[(Long, Long, Int, Double)].collect()
    out.map(_._2).toSeq shouldBe Seq(1L, 2L, 3L)
    out.map(_._3).toSeq shouldBe Seq(1, 2, 3)
    out.map(_._4).toSeq shouldBe out.map(_._4).toSeq.sorted.reverse
  }

  test("signBucket packs sign bits of leading components") {
    val d = vecs(
      1L -> Seq(1f, -1f, 1f, -1f), // bits 0,2 -> 5
      2L -> Seq(-1f, 1f, -1f, 1f)) // bits 1,3 -> 10
    val out = d.select(col("vec_id"), Similarity.signBucket(col("embedding")).as("b"))
      .as[(Long, Int)].collect().toMap
    out(1L) shouldBe 5
    out(2L) shouldBe 10
  }

  test("knnLsh only searches the query's bucket; agrees with brute force there") {
    val d = vecs(
      0L -> Seq(1f, 1f, 1f, 1f),
      1L -> Seq(0.9f, 1f, 1f, 1f),   // same bucket as 0
      2L -> Seq(1f, 1f, 1f, 0.9f),   // same bucket as 0
      3L -> Seq(-1f, 1f, 1f, 1f))    // different bucket
    val lsh = Similarity.knnLsh(d, d.filter(col("vec_id") === 0L), k = 5)
      .as[(Long, Long, Int, Double)].collect()
    lsh.map(_._2).sorted.toSeq shouldBe Seq(1L, 2L)
    val brute = Similarity.knnBruteForce(d, d.filter(col("vec_id") === 0L), k = 5)
      .filter(col("neighbor_id").isin(1L, 2L))
      .as[(Long, Long, Int, Double)].collect()
    lsh.map(t => t._2 -> t._4).toMap shouldBe brute.map(t => t._2 -> t._4).toMap
  }

  test("ANN recall vs brute force on harness embeddings is usable") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 5)
    val brute = Similarity.knnBruteForce(emb, queries, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.knnLsh(emb, queries, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // 4 sign bits ~ 1/16 of the corpus per bucket: recall is inherently
    // partial on this tiny sample; assert it beats the ~6%
    // random-candidate floor (measured 0.16 on the sf0.001 fixture).
    val recall = (brute intersect lsh).size.toDouble / brute.size
    recall should be >= 0.1
  }

  test("nearDupPairs finds only same-bucket high-cosine pairs, a < b") {
    val d = vecs(
      1L -> Seq(1f, 1f, 0.5f, 0.5f),
      2L -> Seq(0.99f, 1.01f, 0.5f, 0.5f),
      3L -> Seq(1f, 1f, -0.5f, 0.5f))
    val out = Similarity.nearDupPairs(d, threshold = 0.99).collect()
    out.map(r => (r.getLong(0), r.getLong(1))).toSeq shouldBe Seq((1L, 2L))
    out.head.getDouble(2) should be >= 0.99
  }
}
