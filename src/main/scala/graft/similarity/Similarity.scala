package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.{vecDot, vecNorm}

/** Similarity search over an embedding column (`array<float>`):
  * brute-force cosine top-k as the exactness baseline, and two scale
  * paths: a sign-signature LSH-bucketed variant and an IVF-Flat
  * (trained inverted-file) index.
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

  // ------------------------------------------------------------- IVF

  /** Per-centroid comparison structs `(d = −cosine(vec, centroid), cell)`.
    * `least` / `array_sort` over these pick the closest centroid(s) via
    * codegen'd struct comparisons — no HOF lambdas (interpreted), no
    * driver round-trips. Centroid vectors and norms are folded in as
    * literals, so assignment is a pure projection: zero shuffle, zero
    * join, scales to any corpus size. */
  private def centStructs(vec: Column, norm: Column,
                          cents: Array[Array[Float]]): Seq[Column] =
    cents.toSeq.zipWithIndex.map { case (c, j) =>
      val cn = math.sqrt(c.map(x => x.toDouble * x).sum)
        .max(java.lang.Double.MIN_VALUE)
      struct((-vecDot(vec, typedLit(c)) / (norm * lit(cn))).as("d"),
        lit(j).as("cell"))
    }

  /** Cell id of the nearest (max-cosine) centroid; ties break to the
    * lowest cell id via the struct's second field. */
  def nearestCell(vec: Column, norm: Column,
                  cents: Array[Array[Float]]): Column = {
    require(cents.length >= 2, "IVF needs at least 2 centroids")
    least(centStructs(vec, norm, cents): _*).getField("cell")
  }

  /** The `nprobe` nearest cells for a query vector, closest first —
    * an array of `(d, cell)` structs. */
  def probedCells(vec: Column, norm: Column, cents: Array[Array[Float]],
                  nprobe: Int): Column =
    slice(array_sort(array(centStructs(vec, norm, cents): _*)), 1, nprobe)

  /** Train IVF centroids: deterministic seeding (the `nlist` rows with
    * the smallest `(xxhash64(id), id)` — a reproducible pseudo-random
    * spread) followed by `iters` Lloyd rounds. Each round is one
    * distributed pass: assign by literal-centroid projection, then
    * `posexplode → groupBy(cell, pos) → avg`. Only `nlist × dim`
    * aggregated doubles ever reach the driver — the collect is bounded
    * by the index shape, not the data.
    *
    * At 100 TB, train on a hash sample
    * (`corpus.filter(xxhash64(col(id)) % m === 0)`) — k-means quality
    * saturates long before the full corpus, and the search path below
    * never depends on what the centroids were trained on. Empty cells
    * keep their previous centroid (the standard Lloyd fallback). */
  def trainCentroids(corpus: DataFrame, nlist: Int = 8, iters: Int = 2,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): Array[Array[Float]] = {
    require(nlist >= 2, "IVF needs at least 2 centroids")
    var cents: Array[Array[Float]] = corpus
      .select(col(idCol).as("__id"), col(vecCol).as("__v"))
      .orderBy(xxhash64(col("__id")), col("__id"))
      .limit(nlist)
      .collect()
      .map(_.getSeq[Float](1).toArray)
    require(cents.length >= 2, s"corpus has < 2 rows, cannot train $nlist cells")
    for (_ <- 0 until iters) {
      val means = corpus
        .select(nearestCell(col(vecCol), vecNorm(col(vecCol)), cents).as("__cell"),
          posexplode(col(vecCol)).as(Seq("__pos", "__x")))
        .groupBy("__cell", "__pos")
        .agg(avg(col("__x")).as("__m"))
        .collect()
      val byCell = means.groupBy(_.getInt(0))
      cents = cents.zipWithIndex.map { case (old, j) =>
        byCell.get(j).fold(old) { rows =>
          val next = old.clone()
          rows.foreach(r => next(r.getInt(1)) = r.getDouble(2).toFloat)
          next
        }
      }
    }
    cents
  }

  /** IVF-Flat ANN top-k (the classic inverted-file index): corpus rows
    * are assigned to their nearest centroid's cell by a pure
    * projection; each query probes its `nprobe` nearest cells; exact
    * cosine re-ranks the candidates. Candidate generation is an
    * equi-join on `__cell` — per-query work is the probed cells'
    * population (~`nprobe/nlist` of the corpus), never the whole
    * corpus, and no pair outside the probed cells is ever scored.
    * Complementary to [[knnLsh]]: IVF adapts its partitions to the
    * data distribution (trained centroids) where sign-LSH uses fixed
    * coordinate planes. */
  def knnIvf(corpus: DataFrame, queries: DataFrame, k: Int = 10,
             nlist: Int = 8, nprobe: Int = 3, iters: Int = 2,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cents = trainCentroids(corpus, nlist, iters, idCol, vecCol)
    val c = corpus
      .select(col(idCol), col(vecCol), vecNorm(col(vecCol)).as("__cnorm"))
      .withColumn("__cell", nearestCell(col(vecCol), col("__cnorm"), cents))
    val q = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
        vecNorm(col(vecCol)).as("__qnorm"))
      .withColumn("__probe",
        explode(probedCells(col("__qv"), col("__qnorm"), cents, nprobe)))
      .select(col("query_id"), col("__qv"), col("__qnorm"),
        col("__probe.cell").as("__cell"))
    val scored = c.join(broadcast(q), "__cell")
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
