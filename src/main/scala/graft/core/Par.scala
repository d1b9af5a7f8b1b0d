package graft.core

import org.apache.spark.sql.DataFrame

/** Scan-parallelism floor for CPU-heavy per-row work (guide §2.5,
  * input skew: "one huge unsplittable file … otherwise repartition
  * immediately after the read").
  *
  * A parquet file is only splittable at ROW-GROUP boundaries: a
  * single-row-group file (or a gzip member, or any tiny file under
  * `spark.sql.files.openCostInBytes`) scans as ONE task, and every
  * expression evaluated in that scan stage — tokenization, shingle
  * md5s, replicate explodes, vector dot products, media synthesis —
  * runs single-threaded while the other cores idle. Measured on the
  * r19 bench corpus (every sf0.1 table is one row group): the q209
  * bootstrap's 3M-hash explode ran as 1 task at local[4].
  *
  * `scaleOut` raises such a frame to the session's default
  * parallelism with one round-robin repartition of the SMALL input
  * rows (narrow keys/text, before the multiplying work), and is a
  * NO-OP whenever the frame already carries at least that many
  * partitions — at warehouse scale inputs arrive with thousands of
  * splits and this adds nothing (scale-adaptive by construction, no
  * tuned constant). Correctness: callers are partitioning-invariant
  * operators (suite-pinned across the repo), and round-robin
  * assignment is deterministic under task retries (Spark sorts
  * before repartitioning, SPARK-23207).
  *
  * Call it ONLY on frames whose plan is scan/filter/project/union —
  * reading the partition count walks the physical plan, which is
  * cheap there; behind an exchange the parallelism is already the
  * shuffle partition count and the floor is moot. */
object Par {
  def scaleOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.queryExecution.toRdd.getNumPartitions < target)
      df.repartition(target)
    else df
  }
}
