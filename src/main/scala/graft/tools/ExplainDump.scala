package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for named registry queries to files —
  * the plan-evidence tool for the optimization rounds (guide §1:
  * capture the plan shape before and after every change).
  *
  * Usage: runMain graft.tools.ExplainDump <sfDir> <outDir> [query ...]
  * Writes <outDir>/<name>.txt per query (full names or short keys,
  * same matching rule as Bench args). No action is executed: the
  * formatted plan is compiled, not run, so this is cheap enough to
  * dump the whole registry.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ExplainDump <sfDir> <outDir> [query ...]")
    val sfDir = args(0)
    val outDir = new java.io.File(args(1))
    outDir.mkdirs()
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val all = graft.SparkEntry.queries.keys.toSeq.sorted
    val names =
      if (args.length == 2) all
      else all.filter(n => args.drop(2).contains(n) ||
        args.drop(2).contains(n.takeWhile(_ != '_')))
    require(names.nonEmpty, s"no queries match ${args.drop(2).mkString(",")}")
    for (name <- names) {
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val w = new java.io.PrintWriter(new java.io.File(outDir, s"$name.txt"))
      try w.write(plan) finally w.close()
      println(s"[explain] wrote $name")
    }
    spark.stop()
  }
}
