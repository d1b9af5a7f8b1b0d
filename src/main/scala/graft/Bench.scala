package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver-run per round at sf0.1). Methodology:
  *  - queries run in sorted name order, after one untimed warmup query
  *    that absorbs JVM/codegen/parquet-footer warmup (round-1 bench
  *    charged ~14 s of warmup to whichever query ran first);
  *  - the timed action is a write to the `noop` sink, which executes
  *    the FULL physical plan (including deterministic final sorts that
  *    a `.count()` action would let Catalyst eliminate) with zero IO;
  *  - each query runs `repeats` times and reports the MIN: round-2
  *    numbers showed 3-5x within-run variance on tiny-output
  *    aggregates (GC/JIT interactions across 41 sequential queries in
  *    one JVM) — the min is the plan's cost, the rest is jitter;
  *  - failures propagate: a crashed query crashes the bench (rc != 0)
  *    instead of being silently timed as success.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val repeats = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPEATS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    val names = SparkEntry.queries.keys.toSeq.sorted
    run(names.head) // untimed warmup

    val results = names.map { name =>
      val times = (1 to repeats).map { _ =>
        val t0 = System.nanoTime()
        run(name)
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }
    // Millisecond precision keeps the whole line compact (the driver
    // snapshots only a bounded tail of stdout); printed AFTER
    // spark.stop() so no late executor/log line can land after it.
    def fmt(v: Double): String = f"$v%.3f"
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    spark.stop()
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
  }
}
