package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev/bench tool: synthesize a deterministic ~sf1-equivalent corpus
  * from the committed sf0.1 testdata (which is the largest the driver
  * ships), so the scaling curve for the heaviest operator families
  * gets a FOURTH decade: sf0.001 → 0.01 → 0.1 → "sf1".
  *
  * Device: 10-way self-union with key remapping — replica k of
  * `documents` shifts doc_id by k·1,000,000 and suffixes EVERY token
  * with a replica tag (`regexp_replace` on the `[a-z0-9]+` token
  * class, the same class the dedup tokenizer splits on). That makes
  * replica vocabularies pairwise disjoint, so each replica reproduces
  * the BASE corpus's internal similarity structure and contributes
  * ZERO cross-replica candidate pairs: per-document statistics (token
  * counts, shingle df distribution, dup-cluster sizes) are preserved
  * while totals scale exactly 10× — an honest "10× more data of the
  * same shape" point, NOT the adversarial 100×-pair blowup a plain
  * self-union would inject (every dup cluster would multiply
  * quadratically across replicas). `n_chars` is recomputed to stay
  * coherent with the suffixed text (q296's substr device reads it).
  * Replica 0 is the identity, so the base corpus is a subset.
  *
  * `orders` replicas shift o_orderkey by k·100,000,000 (sf0.1 keys
  * top out ~6M) and keep all other columns — the bootstrap operator
  * keys on the orderkey string, so resample structure per replica
  * matches the base.
  *
  * Output is parquet under target/scaling_sf1/ (repo scratch —
  * /root/testdata is read-only), written once; bench runs point
  * SPARK_GRAFT_SF_DIR at it. Only the tables the benched queries read
  * are materialized (documents, orders). */
object ScaleCorpus {
  def main(args: Array[String]): Unit = {
    val srcDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val outDir = if (args.length > 1) args(1) else "/root/repo/target/scaling_sf1"
    val replicas = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$srcDir/documents.parquet")
    // The replica shift constants assume base ids fit under them; an
    // overlap would silently duplicate ids across replicas and corrupt
    // the synthesized corpus's similarity structure — refuse loudly.
    val docShift = 1000000L
    val maxDocId = docs.agg(max(col("doc_id"))).head.getLong(0)
    require(maxDocId < docShift,
      s"ScaleCorpus: max(doc_id)=$maxDocId >= replica shift $docShift " +
        "— replica id ranges would overlap; raise the shift constant")
    val docReplicas = (0 until replicas).map { k =>
      if (k == 0) docs
      else docs.select(
        (col("doc_id") + k * docShift).as("doc_id"),
        regexp_replace(col("text"), "([a-z0-9]+)", s"$$1z$k").as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.map(_.withColumn("n_chars", length(col("text")).cast("long"))
      .select("doc_id", "text", "lang", "source", "n_chars"))
    docReplicas.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")

    val orders = spark.read.parquet(s"$srcDir/orders.parquet")
    val orderShift = 100000000L
    val maxOrderKey = orders.agg(max(col("o_orderkey"))).head.getLong(0)
    require(maxOrderKey < orderShift,
      s"ScaleCorpus: max(o_orderkey)=$maxOrderKey >= replica shift " +
        s"$orderShift — replica key ranges would overlap")
    val otherCols = orders.columns.filter(_ != "o_orderkey").map(col)
    (0 until replicas).map { k =>
      orders.select(
        (col("o_orderkey") + k * orderShift).as("o_orderkey") +: otherCols: _*)
    }.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/orders.parquet")

    val nd = spark.read.parquet(s"$outDir/documents.parquet").count()
    val no = spark.read.parquet(s"$outDir/orders.parquet").count()
    println(s"""{"scaled_dir":"$outDir","documents":$nd,"orders":$no,"replicas":$replicas}""")
    spark.stop()
  }
}
