package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.{vecDot, vecNorm}

/** Similarity search over an embedding column (`array<float>`):
  * brute-force cosine top-k as the exactness baseline, and a
  * sign-signature LSH-bucketed variant as the scale path.
  *
  * Numerics: dot products run through the native codegen'd
  * [[graft.functions.FloatVectorDot]] — float→double promotion per
  * element, left-to-right accumulation — bit-identical to a
  * sequential fold, so a single-threaded oracle computing the same
  * fold hash-matches with no rounding fudge.
  *
  * Scale design: norms are computed ONCE per row in a projection
  * before any join (never per candidate pair); the query side of the
  * brute-force join is broadcast (queries ≪ corpus by construction);
  * the ANN path buckets both sides by the sign signature so candidate
  * generation is an equi-join, and per-bucket work is |bucket|·|Q_b|,
  * never |corpus|·|Q|. Top-k is a per-query window over candidates —
  * no global sort.
  */
object Similarity {

  /** Sequential-fold dot product (float→double per element). Kept as
    * the executable spec for [[graft.functions.FloatVectorDot]] — the
    * suite asserts bit-identity between the two. */
  def dotFold(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def dot(a: Column, b: Column): Column = vecDot(a, b)

  def norm(a: Column): Column = vecNorm(a)

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force exact top-k neighbours for each query vector.
    * `queries` must be small (it is broadcast); the corpus streams
    * once with no shuffle of the corpus side — the only shuffle is the
    * per-query top-k window. */
  def knnBruteForce(corpus: DataFrame, queries: DataFrame, k: Int = 10,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("__qv"), vecNorm(col(vecCol)).as("__qnorm")))
    val c = corpus.select(col(idCol), col(vecCol),
      vecNorm(col(vecCol)).as("__cnorm"))
    val scored = c.crossJoin(q)
      .filter(col(idCol) =!= col("query_id"))
      .withColumn("cosine",
        vecDot(col("__qv"), col(vecCol)) / (col("__qnorm") * col("__cnorm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col(idCol).as("neighbor_id"), col("rank"), col("cosine"))
  }

  val signatureBits: Int = 4

  /** Axis-aligned sign LSH signature: bit j set iff component j+1 is
    * positive. A degenerate-but-deterministic instance of
    * random-hyperplane LSH (the hyperplanes are the first
    * `signatureBits` coordinate planes) — same collision math,
    * P[bit match] = 1 - θ/π, and fully reproducible in the oracle. */
  def signBucket(vec: Column, bits: Int = signatureBits): Column =
    (0 until bits).map(j =>
      when(element_at(vec, j + 1) > 0f, lit(1 << j)).otherwise(lit(0)))
      .reduce(_ + _)

  /** ANN top-k: candidates restricted to the query's sign bucket
    * (equi-join on the signature), exact cosine + per-query top-k on
    * the candidates. Recall vs [[knnBruteForce]] is the quality
    * metric — measured in the test suite, tunable via `bits`
    * (fewer bits = more recall, bigger buckets). */
  def knnLsh(corpus: DataFrame, queries: DataFrame, k: Int = 10,
             bits: Int = signatureBits,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol), col(vecCol),
      signBucket(col(vecCol), bits).as("__bucket"),
      vecNorm(col(vecCol)).as("__cnorm"))
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("__qv"), signBucket(col(vecCol), bits).as("__bucket"),
      vecNorm(col(vecCol)).as("__qnorm")))
    val scored = c.join(q, "__bucket")
      .filter(col(idCol) =!= col("query_id"))
      .withColumn("cosine",
        vecDot(col("__qv"), col(vecCol)) / (col("__qnorm") * col("__cnorm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col(idCol).as("neighbor_id"), col("rank"), col("cosine"))
  }

  /** Embedding-cosine near-dup pairs: same-bucket candidate pairs with
    * cosine ≥ threshold. Bucketed self-join — Σ|bucket|² work, not n². */
  def nearDupPairs(corpus: DataFrame, threshold: Double,
                   bits: Int = signatureBits,
                   idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val b = corpus.select(col(idCol), col(vecCol),
      signBucket(col(vecCol), bits).as("__bucket"),
      vecNorm(col(vecCol)).as("__norm"))
    b.as("a").join(b.as("b"),
        col("a.__bucket") === col("b.__bucket") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        (vecDot(col(s"a.$vecCol"), col(s"b.$vecCol")) /
          (col("a.__norm") * col("b.__norm"))).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
