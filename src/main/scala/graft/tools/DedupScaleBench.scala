package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev/bench tool: the adversarial-skew instrument for the
  * MinHash / shingle-Jaccard / winnowing dedup family — the exact
  * analogue of [[AnnScaleBench]] (whose bucket-concentration probe
  * caught the correlated-hyperplane bug in round 17), aimed at the
  * family whose PRODUCTION workload is the skewed case: crawl corpora
  * are clone-heavy (mirrored/viral pages form near-dup clusters that
  * GROW with corpus size) and boilerplate-heavy (site templates carry
  * identical token blocks across a large corpus fraction). The
  * AnnScaleBench deliberately rejected clone replicas as a fixture
  * artifact because for ANN they are one; for dedup they are the
  * real input — this bench synthesizes them on purpose.
  *
  * Synthetic corpus (fully deterministic, xxhash64-driven, no RNG —
  * the resume-safety rule): n = 2000·R docs of ~100 tokens, by
  * doc_id mod 10:
  *  - class 0 (10%): ONE near-dup "hot" cluster whose size is 0.1·n —
  *    the viral-page regime. All members share a base token stream;
  *    member-specific perturbation replaces every 20th token, so
  *    pairwise shingle Jaccard stays ≈ 0.7 (true near-dups, above
  *    every threshold in the registry defaults).
  *  - classes 1–2 (20%): FIXED-size near-dup clusters (8 members per
  *    consecutive 40-id block) — the honest "more data of the same
  *    shape" component; their pair count grows LINEARLY with n.
  *  - classes 3–9 (70%): unique docs (per-doc token stream).
  *  - boilerplate: docs with doc_id mod 7 < 2 (~28.6%, cross-cutting
  *    all classes) get a fixed 30-token template block prepended —
  *    shingle df for the template ≈ 0.29·n, far above every
  *    maxDocFreq governor at every decade.
  *
  * Per decade and per operator it emits JSON lines with
  *  - the CONCENTRATION probe: for MinHash, per-(band, key) bucket
  *    sizes from the PUBLIC index surface
  *    ([[graft.dedup.Dedup.writeSignatureIndex]]); for Jaccard /
  *    winnowing, posting/fingerprint document frequencies. Reported
  *    as sum(b²) (the Σ|bucket|² probe), the candidate-pair integral
  *    Σ C(b, 2) split at the governor cap (governed vs dropped), and
  *    the max bucket;
  *  - the measured operator wall time (min of 2, count() as the
  *    action so the output volume is captured by the same run) and
  *    the output pair count.
  *
  * The claim under test: every pair-finder's candidate volume is
  * governed — bounded by a cap-linear function of n — on the
  * clone+boilerplate corpus, not just on the benign fixture. A
  * super-linear step in the measured curve or a governed-bound
  * violation is a REAL scale-killer (the E336 playbook: fix, then
  * re-measure). */
object DedupScaleBench {

  /** 30-token site-template block (lowercase alnum — the tokenizer's
    * own class, so every token survives tokenization verbatim). */
  val boilerplate: String =
    (0 until 30).map(i => s"bp$i").mkString(" ")

  /** The deterministic clone+boilerplate corpus at replica factor R
    * (n = 2000·R docs). Pure projection over range(n): generation is
    * distributed, nothing driver-side, any decade streams. */
  def corpus(spark: SparkSession, replicas: Int): DataFrame = {
    val n = 2000L * replicas
    val id = col("doc_id")
    val cls = id % 10
    // per-class base seed: hot cluster shares one seed; fixed
    // clusters share a per-40-block seed (8 members each); unique
    // docs seed on their own id (disjoint ranges via large offsets)
    // Column `/` is TRUE division (doubles) — block ids need `div`
    val blk = expr("doc_id div 40")
    val seed = when(cls === 0, lit(Long.MaxValue - 1L))
      .when(cls <= 2, blk + 4000000000L)
      .otherwise(id)
    val isClone = cls <= 2
    // member perturbation offset in [0, 20): which residue class of
    // token positions this member rewrites
    val off = pmod(id * 3L + blk, lit(20L))
    val body = transform(sequence(lit(0), lit(99)), p =>
      when(isClone && pmod(p, lit(20)) === off,
        concat(lit("p"), pmod(xxhash64(id, p), lit(1000000000000L))))
        .otherwise(
          concat(lit("t"), pmod(xxhash64(seed, p), lit(1000000000000L)))))
    val text = when(id % 7 < 2,
      concat(lit(boilerplate + " "), concat_ws(" ", body)))
      .otherwise(concat_ws(" ", body))
    spark.range(n).select(col("id").as("doc_id"))
      .select(col("doc_id"), text.as("text"))
  }

  /** Deterministic 64-bit PERCEPTUAL-HASH corpus at replica factor R
    * (n = 2000·R hashes) — the [[corpus]] story translated to the
    * banded-Hamming family's input (image dHash / audio envelope):
    * class 0 (10%) is ONE hot cluster (a viral re-encoded asset whose
    * copies grow with corpus size) sharing a base hash with at most
    * one member-specific bit flipped — pairwise Hamming ≤ 2, well
    * inside every maxHamming default; classes 1–2 are 8-member
    * fixed clusters per 40-id block (linear pair growth); classes
    * 3–9 are xxhash64-unique hashes. Pure projection over range(n). */
  def hashCorpus(spark: SparkSession, replicas: Int): DataFrame = {
    val n = 2000L * replicas
    val id = col("doc_id")
    val cls = id % 10
    val blk = expr("doc_id div 40")
    val base = when(cls === 0, lit(0x5a3c96e1d2b40f78L))
      .when(cls <= 2, xxhash64(blk + 4000000000L))
      .otherwise(xxhash64(id))
    val h = when(cls <= 2, base.bitwiseXOR(
        expr("shiftleft(cast(1 as bigint), cast(pmod(doc_id * 31, 64) as int))")))
      .otherwise(base)
    spark.range(n).select(col("id").as("doc_id"))
      .select(col("doc_id"), h.as("h64"))
  }

  private def timeMinOf2(run: () => Long): (Double, Long) = {
    val runs = (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      val rows = run()
      ((System.nanoTime() - t0) / 1e9, rows)
    }
    (runs.map(_._1).min, runs.head._2)
  }

  /** Bucket/df concentration stats over a (group → member count)
    * frame: Σb², ΣC(b,2) within the cap, ΣC(b,2) above it (the
    * candidate volume a governor must remove), max b. */
  private def concentration(counts: DataFrame, cap: Long): (Long, Long, Long, Long) = {
    val b = col("b").cast("decimal(38,0)")
    val r = counts.agg(
      sum(b * b).cast("long").as("sum_sq"),
      sum(when(col("b") <= cap, b * (b - 1) / 2).otherwise(lit(0)))
        .cast("long").as("pairs_governed"),
      sum(when(col("b") > cap, b * (b - 1) / 2).otherwise(lit(0)))
        .cast("long").as("pairs_oversized"),
      max(col("b")).as("max_b")).head
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  def main(args: Array[String]): Unit = {
    val replicasList =
      if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 4, 16, 64)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    // partitions sized to the top decade's pair volume, not the core
    // count (the AnnScaleBench note)
    val parts = sys.env.getOrElse("SPARK_GRAFT_PARTS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // minhash / jaccard / winnowing, and probe-only (concentration
    // without timing the pair joins — cheap at any decade)
    val ops = sys.env.getOrElse("SPARK_GRAFT_DEDUP_OPS",
      "minhash,jaccard,winnowing").split(",").toSet
    val scratch = "/root/repo/target/dedup_scale"

    def report(op: String, r: Int, n: Long, fields: String): Unit =
      println(s"""{"metric":"dedup_scaling","op":"$op","replicas":$r,"docs":$n,$fields}""")

    def runAll(r: Int, emit: Boolean): Unit = {
      val docs = corpus(spark, r).localCheckpoint()
      val n = docs.count()

      if (ops("minhash") || ops("probe")) {
        // concentration from the PUBLIC banded-signature index
        val idxPath = s"$scratch/sig_r$r"
        graft.dedup.Dedup.writeSignatureIndex(docs, idxPath)
        val buckets = spark.read.parquet(idxPath)
          .groupBy(col("band"), col("key")).agg(count(lit(1)).as("b"))
        val (sq, gov, over, mx) = concentration(buckets, 1000L)
        if (emit) report("minhash_buckets", r, n,
          s""""sum_b2":$sq,"pairs_governed":$gov,"pairs_oversized":$over,"max_bucket":$mx""")
        if (ops("minhash")) {
          // SPARK_GRAFT_MAXBUCKET overrides the governor (set it to
          // a huge value for the ungoverned BEFORE measurement)
          val maxB = sys.env.getOrElse("SPARK_GRAFT_MAXBUCKET", "1000").toLong
          val (sec, pairs) = timeMinOf2(() =>
            graft.dedup.Dedup.minhashPairs(docs, threshold = 0.5,
              maxBucket = maxB).count())
          if (emit) report("minhash_pairs", r, n,
            f""""sec":$sec%.3f,"out_pairs":$pairs,"max_bucket_cap":$maxB""")
        }
      }

      if (ops("compare")) {
        // VERDICT-agreement probe for the maxBucket governor: run the
        // full dedup pipeline (pairs -> componentLabels -> per-doc
        // dup/unique verdict + cluster id) from GOVERNED and
        // UNGOVERNED pairs on the same corpus, and count docs whose
        // verdict or cluster assignment differs. The governor's
        // contract is connectivity preservation for true clusters —
        // this measures it corpus-wide under the adversarial shape,
        // not just on the spec's clean fixture. (Ungoverned is
        // quadratic: run this at decades where it is still feasible.)
        def verdicts(maxB: Long) = {
          val pairs = graft.dedup.Dedup.minhashPairs(docs, threshold = 0.5,
            maxBucket = maxB)
          val labels = graft.dedup.Dedup.componentLabels(pairs)
          docs.select(col("doc_id")).join(
              labels.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left")
            .select(col("doc_id"),
              coalesce(col("label"), col("doc_id")).as("cluster"))
        }
        val g = verdicts(1000L)
        val u = verdicts(Long.MaxValue)
        val joined = g.withColumnRenamed("cluster", "gc")
          .join(u.withColumnRenamed("cluster", "uc"), Seq("doc_id"))
          .localCheckpoint()
        val diffCluster = joined.filter(col("gc") =!= col("uc")).count()
        val diffVerdict = joined.filter(
          (col("gc") === col("doc_id")) =!= (col("uc") === col("doc_id"))).count()
        if (emit) report("governor_agreement", r, n,
          s""""diff_cluster":$diffCluster,"diff_verdict":$diffVerdict""")
      }

      if (ops("simhash") || ops("probe")) {
        // byte-band bucket concentration: 256 keys per band means even
        // BENIGN corpora concentrate n/256 per bucket — the round-18
        // verdict's Θ(n²/64) construction — before the hot cluster
        // floods its buckets on top
        val sims = graft.dedup.Dedup.simhashes(docs)
        val buckets = sims.select(col("doc_id"),
            explode(array((0 until 4).map(b =>
              (shiftright(col("simhash"), 8 * b) % 256) + lit(b * 256)): _*))
              .as("bkey"))
          .groupBy(col("bkey")).agg(count(lit(1)).as("b"))
        val (sq, gov, over, mx) = concentration(buckets, 1000L)
        if (emit) report("simhash_buckets", r, n,
          s""""sum_b2":$sq,"pairs_governed":$gov,"pairs_oversized":$over,"max_bucket":$mx""")
        if (ops("simhash")) {
          val maxB = sys.env.getOrElse("SPARK_GRAFT_MAXBUCKET", "1000").toLong
          val (sec, pairs) = timeMinOf2(() =>
            graft.dedup.Dedup.simhashPairs(docs, maxHamming = 3,
              maxBucket = maxB).count())
          if (emit) report("simhash_pairs", r, n,
            f""""sec":$sec%.3f,"out_pairs":$pairs,"max_bucket_cap":$maxB""")
        }
      }

      if (ops("simhash_compare")) {
        // verdict-agreement probe for the simhash governor (the
        // minhash "compare" probe, item-for-item): governed vs
        // ungoverned full dedup verdicts on the same corpus
        def verdicts(maxB: Long) = {
          val pairs = graft.dedup.Dedup.simhashPairs(docs, maxHamming = 3,
            maxBucket = maxB)
          val labels = graft.dedup.Dedup.componentLabels(
            pairs.select(col("doc_a"), col("doc_b")))
          docs.select(col("doc_id")).join(
              labels.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left")
            .select(col("doc_id"),
              coalesce(col("label"), col("doc_id")).as("cluster"))
        }
        val g = verdicts(1000L)
        val u = verdicts(Long.MaxValue)
        val joined = g.withColumnRenamed("cluster", "gc")
          .join(u.withColumnRenamed("cluster", "uc"), Seq("doc_id"))
          .localCheckpoint()
        val diffCluster = joined.filter(col("gc") =!= col("uc")).count()
        val diffVerdict = joined.filter(
          (col("gc") === col("doc_id")) =!= (col("uc") === col("doc_id"))).count()
        if (emit) report("simhash_governor_agreement", r, n,
          s""""diff_cluster":$diffCluster,"diff_verdict":$diffVerdict""")
      }

      if (ops("hamming") || ops("probe")) {
        // banded-Hamming family (image dHash / audio envelope, shared
        // bandedHammingPairs): 16-bit keys are near-uniform on benign
        // hashes, so unlike simhash the BENIGN curve is flat — the hot
        // re-encode cluster is the entire threat model here
        val hashes = hashCorpus(spark, r).localCheckpoint()
        val buckets = hashes.select(col("doc_id"),
            explode(array((0 until 4).map(b =>
              shiftright(col("h64"), 16 * b).bitwiseAND(lit(0xffffL)) +
                lit(b.toLong << 16)): _*)).as("bkey"))
          .groupBy(col("bkey")).agg(count(lit(1)).as("b"))
        val (sq, gov, over, mx) = concentration(buckets, 1000L)
        if (emit) report("hamming_buckets", r, n,
          s""""sum_b2":$sq,"pairs_governed":$gov,"pairs_oversized":$over,"max_bucket":$mx""")
        if (ops("hamming")) {
          val maxB = sys.env.getOrElse("SPARK_GRAFT_MAXBUCKET", "1000").toLong
          val (sec, pairs) = timeMinOf2(() =>
            graft.multimodal.Multimodal.bandedHammingPairs(hashes, "doc_id",
              maxHamming = 3, maxBucket = maxB).count())
          if (emit) report("hamming_pairs", r, n,
            f""""sec":$sec%.3f,"out_pairs":$pairs,"max_bucket_cap":$maxB""")
        }
      }

      if (ops("hamming_compare")) {
        val hashes = hashCorpus(spark, r).localCheckpoint()
        def verdicts(maxB: Long) = {
          val pairs = graft.multimodal.Multimodal.bandedHammingPairs(
            hashes, "doc_id", maxHamming = 3, maxBucket = maxB)
          val labels = graft.dedup.Dedup.componentLabels(
            pairs.select(col("doc_a"), col("doc_b")))
          hashes.select(col("doc_id")).join(
              labels.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left")
            .select(col("doc_id"),
              coalesce(col("label"), col("doc_id")).as("cluster"))
        }
        val g = verdicts(1000L)
        val u = verdicts(Long.MaxValue)
        val joined = g.withColumnRenamed("cluster", "gc")
          .join(u.withColumnRenamed("cluster", "uc"), Seq("doc_id"))
          .localCheckpoint()
        val diffCluster = joined.filter(col("gc") =!= col("uc")).count()
        val diffVerdict = joined.filter(
          (col("gc") === col("doc_id")) =!= (col("uc") === col("doc_id"))).count()
        if (emit) report("hamming_governor_agreement", r, n,
          s""""diff_cluster":$diffCluster,"diff_verdict":$diffVerdict""")
      }

      if (ops("jaccard") || ops("probe")) {
        val dfs = graft.dedup.Dedup.explodedShingleHashes(docs).distinct()
          .groupBy(col("shingle")).agg(count(lit(1)).as("b"))
        val (sq, gov, over, mx) = concentration(dfs, 100L)
        if (emit) report("jaccard_postings", r, n,
          s""""sum_b2":$sq,"pairs_governed":$gov,"pairs_oversized":$over,"max_df":$mx""")
        if (ops("jaccard")) {
          // 0.5, not the 0.8 default: the synthetic clusters' true
          // pairwise Jaccard is ~0.53, so the measurement also shows
          // the operator FINDING them, not just its join volume
          val (sec, pairs) = timeMinOf2(() =>
            graft.dedup.Dedup.jaccardPairs(docs, threshold = 0.5).count())
          if (emit) report("jaccard_pairs", r, n,
            f""""sec":$sec%.3f,"out_pairs":$pairs""")
        }
      }

      if (ops("winnowing") || ops("probe")) {
        val dfs = graft.dedup.Dedup.winnowingFingerprints(docs)
          .select(col("fp_hash"), col("doc_id")).distinct()
          .groupBy(col("fp_hash")).agg(count(lit(1)).as("b"))
        val (sq, gov, over, mx) = concentration(dfs, 50L)
        if (emit) report("winnowing_fps", r, n,
          s""""sum_b2":$sq,"pairs_governed":$gov,"pairs_oversized":$over,"max_df":$mx""")
        if (ops("winnowing")) {
          val (sec, pairs) = timeMinOf2(() =>
            graft.dedup.Dedup.winnowingPairs(docs).count())
          if (emit) report("winnowing_pairs", r, n,
            f""""sec":$sec%.3f,"out_pairs":$pairs""")
        }
      }
    }

    runAll(1, emit = false) // untimed warmup: codegen/JIT
    replicasList.foreach(r => runAll(r, emit = true))
    spark.stop()
  }
}
