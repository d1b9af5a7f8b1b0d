package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only timing probe: `sbt "Test/runMain graft.tools.ProbeMain q38_percentiles 4"`. */
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def run(n: String) = graft.SparkEntry.queries(n)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    run(name)
    for (i <- 1 to reps) {
      val t0 = System.nanoTime(); run(name)
      println(f"$name rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
