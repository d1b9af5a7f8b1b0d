package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev/bench tool: the measured-evidence instrument for E356's core
  * claim — the Aho–Corasick dictionary scan reads the text ONCE for
  * the whole dictionary (cost ~ O(chars + matches)), where the
  * per-term `regexp_count` plan (the piiScan shape, correct at 3
  * patterns) rescans the text once per term and so scales LINEARLY in
  * dictionary size. Blocklists in production are 100s–1000s of terms;
  * the fixture dictionary is 6 — this bench is where the size axis
  * actually gets measured.
  *
  * Corpus: deterministic (xxhash64-driven, no RNG — the resume-safety
  * rule) n = 20000·R docs × 100 tokens over a 50-token vocabulary.
  * Dictionary at size T: even slots are two-token phrases enumerated
  * over the vocab (guaranteed hits at measurable rates), odd slots
  * are never-hit controls ("zz<k>") — so match volume grows with T at
  * roughly half the slots, the honest mixed regime.
  *
  * Variants per (R, T):
  *  - ac: [[graft.text.Blocklist.blocklistGate]] (one automaton pass,
  *    two array folds);
  *  - regex: sum of per-term `regexp_count` columns — same greedy
  *    non-overlapping semantics (regexp_count counts leftmost
  *    non-overlapping matches of a literal), so the two variants'
  *    TOTAL HIT COUNTS must be equal, and the bench ASSERTS it: the
  *    speed comparison doubles as a cross-implementation correctness
  *    probe at every decade.
  *
  * Emits one JSON line per (variant, R, T): wall sec (min of 2,
  * count-action) and total hits. */
object BlocklistScaleBench {

  def corpus(spark: SparkSession, replicas: Int): DataFrame =
    spark.range(20000L * replicas).select(
      col("id").as("doc_id"),
      expr("array_join(transform(sequence(1, 100), " +
        "i -> concat('w', pmod(xxhash64(id, i), 50))), ' ')").as("text"))

  /** Distinct dictionary of size t: even slots = enumerated two-token
    * vocab phrases (hits), odd slots = never-hit controls. */
  def dictionary(t: Int): Seq[String] = {
    require(t >= 2 && t <= 4000, s"t in [2, 4000], got $t")
    (0 until t).map { k =>
      if (k % 2 == 0) s"w${(k / 2) % 50} w${(k / 2) / 50 % 50}"
      else s"zz$k"
    }
  }

  private def timeMinOf2(action: () => Long): (Double, Long) = {
    def once(): (Double, Long) = {
      val t0 = System.nanoTime()
      val out = action()
      ((System.nanoTime() - t0) / 1e9, out)
    }
    val a = once(); val b = once()
    (math.min(a._1, b._1), b._2)
  }

  def main(args: Array[String]): Unit = {
    val replicasList = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 4)
    val termsList = sys.env.getOrElse("SPARK_GRAFT_TERMS", "8,64,512")
      .split(",").map(_.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    replicasList.foreach { r =>
      val docs = corpus(spark, r).localCheckpoint()
      val n = docs.count()
      termsList.foreach { t =>
        val dict = dictionary(t)

        val (acSec, acHits) = timeMinOf2(() =>
          graft.text.Blocklist.blocklistGate(docs, terms = dict)
            .agg(sum(col("n_hits_total"))).head.getLong(0))
        println(s"""{"metric":"blocklist_scaling","variant":"ac","replicas":$r,"docs":$n,"terms":$t,"sec":${f"$acSec%.3f"},"hits":$acHits}""")

        // balanced tree reduce: a 512-deep left-fold Add chain
        // overflows Catalyst's analyzer stack — depth log2(n) instead
        def treeSum(cs: Seq[org.apache.spark.sql.Column]): org.apache.spark.sql.Column =
          if (cs.size == 1) cs.head
          else treeSum(cs.grouped(2).map(g => g.reduce(_ + _)).toSeq)
        val regexTotal = treeSum(dict.map(term =>
          regexp_count(lower(col("text")), lit(term)).cast("long")))
        val (reSec, reHits) = timeMinOf2(() =>
          docs.select(regexTotal.as("h")).agg(sum(col("h"))).head.getLong(0))
        println(s"""{"metric":"blocklist_scaling","variant":"regex","replicas":$r,"docs":$n,"terms":$t,"sec":${f"$reSec%.3f"},"hits":$reHits}""")

        require(acHits == reHits,
          s"cross-check FAILED at r=$r t=$t: ac=$acHits regex=$reHits")
      }
    }
    spark.stop()
  }
}
