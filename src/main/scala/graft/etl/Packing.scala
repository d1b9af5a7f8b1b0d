package graft.etl

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Greedy sequence packing — the training-data step that concatenates
  * documents into fixed-capacity training sequences (context windows)
  * with minimal padding waste.
  *
  * Semantics: within each SHARD, documents are scanned in `idCol`
  * order; a document that still fits the open pack joins it, otherwise
  * it closes the pack and opens the next (first-fit on a sorted
  * stream). A document larger than the capacity gets a pack of its
  * own. Pack ids are per-shard ordinals, so the assignment is a pure
  * function of (shard, id, size) — re-running on re-partitioned input
  * is bit-identical.
  *
  * Why mapPartitions (the engine's ONLY sequential-scan operator, per
  * SURVEY §2.11's escalation ladder): capacity packing is a running
  * sum with data-dependent RESET — not expressible as a window
  * aggregate (no frame can see "the fill since the last overflow"),
  * and a recursive join would pay one shuffle per document. The
  * distributed contract is the shard column: rows are hash-partitioned
  * by shard (a shard never splits across partitions) and sorted
  * (shard, id) within partitions, so one linear pass with O(1) state
  * packs every shard; parallelism = shard count, which the caller
  * sizes (hash(doc_id) % nShards for uniform shards at any scale).
  * Plan note: the node is opaque to Catalyst — project/filter BEFORE
  * packing; nothing pushes through it.
  */
object Packing {

  case class PackInput(shard: String, doc_id: Long, size: Long)
  case class Packed(shard: String, doc_id: Long, size: Long,
                    pack_seq: Long, pack_fill: Long)

  /** @return one row per document: (shard, doc_id, size, pack_seq,
    *         pack_fill) — pack_seq the 1-based per-shard pack ordinal,
    *         pack_fill the pack's running fill AFTER this document. */
  def packGreedy(docs: DataFrame, shardCol: String, idCol: String,
                 sizeCol: String, capacity: Long): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    implicit val inEnc = Encoders.product[PackInput]
    implicit val outEnc = Encoders.product[Packed]
    val typed: Dataset[PackInput] = docs.select(
      col(shardCol).cast("string").as("shard"),
      col(idCol).cast("long").as("doc_id"),
      col(sizeCol).cast("long").as("size")).as[PackInput]
    typed
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("doc_id"))
      .mapPartitions { it =>
        var shard: String = null
        var seq = 0L
        var fill = 0L
        it.map { r =>
          if (shard == null || r.shard != shard) {
            shard = r.shard; seq = 1L; fill = r.size
          } else if (fill + r.size <= capacity) {
            fill += r.size
          } else {
            seq += 1L; fill = r.size
          }
          Packed(r.shard, r.doc_id, r.size, seq, fill)
        }
      }
      .toDF()
  }

  /** Pack-level summary: documents per pack, fill, padding waste. */
  /** EXACT global row ordinal (1-based, by `orderCols`) WITHOUT the
    * single-partition window — the distributed primitive a naive
    * `row_number().over(Window.orderBy(...))` pretends to be (Spark
    * executes that by moving ALL data to one partition; the WARN in
    * the logs is the 100 TB job that never finishes). Three steps,
    * all distributed: range-repartition on the order key (so
    * partition i's rows all precede partition i+1's), per-partition
    * local ranks (an ordinary partitioned window), and per-partition
    * row counts — a #partitions-sized frame — cumulated into offsets
    * and joined back by partition id. `global = offset + local`.
    *
    * Determinism: range boundaries come from sampling and may vary
    * run to run, but the emitted ordinal is a pure function of the
    * TOTAL order — whichever partition a row lands in, offset+local
    * is its global rank (orderCols must be a total order: include a
    * unique tiebreaker, stated & required). */
  def globalRowIndex(df: DataFrame, orderCols: Seq[String],
                     indexCol: String = "row_idx"): DataFrame = {
    val ranged = df.repartitionByRange(orderCols.map(col): _*)
      .withColumn("__pid", spark_partition_id())
    val local = ranged.withColumn("__lrn",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("__pid")).orderBy(orderCols.map(col): _*)))
    val offsets = ranged.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__off",
        coalesce(sum(col("__c")).over(org.apache.spark.sql.expressions.Window
          .orderBy(col("__pid"))
          .rowsBetween(Window0.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__off"))
    local.join(broadcast(offsets), "__pid")
      .withColumn(indexCol, col("__off") + col("__lrn"))
      .drop("__pid", "__lrn", "__off")
  }

  private val Window0 = org.apache.spark.sql.expressions.Window

  /** Length-bucketed inference batches — the padding-efficiency prep
    * every batched-inference/serving pass runs: sort by token count
    * (unique-keyed), slice into consecutive groups of `batchSize`, so
    * each batch pads to its own max instead of the corpus max.
    * Built on [[globalRowIndex]] (the naive global row_number is the
    * single-partition trap it exists to avoid). Returns the per-batch
    * report: sizes, bounds, pad cells, exact efficiency permille
    * Σlen·1000 div (rows·max). */
  def lengthBatches(docs: DataFrame, batchSize: Int,
                    idCol: String = "doc_id",
                    lenCol: String = "n_tokens"): DataFrame = {
    require(batchSize >= 1, "batchSize must be positive")
    globalRowIndex(docs.select(col(idCol), col(lenCol)),
        Seq(lenCol, idCol))
      .withColumn("batch_id", expr(s"(row_idx - 1) div $batchSize"))
      .groupBy(col("batch_id"))
      .agg(count(lit(1)).as("n_docs"),
        min(col(lenCol)).as("min_tokens"),
        max(col(lenCol)).as("max_tokens"),
        sum(col(lenCol)).as("sum_tokens"))
      .withColumn("pad_cells",
        col("n_docs") * col("max_tokens") - col("sum_tokens"))
      .withColumn("efficiency_permille",
        when(col("max_tokens") > 0,
          expr("(sum_tokens * 1000) div (n_docs * max_tokens)")))
  }

  /** SFT training-example assembly — the step [[packGreedy]] stops
    * short of: turn (prompt, completion) pairs into PACKED fixed-
    * capacity context windows carrying token ids AND the loss mask
    * (0 over prompt tokens — the model must not train on its own
    * input — 1 over completion tokens and the EOS, 0 over padding:
    * the standard SFT masking, e.g. InstructGPT-style pipelines).
    *
    * Token ids are the corpus-wide [[graft.dedup.Dedup.tokenHash56]]
    * (the shared md5 oracle hash — a stand-in vocabulary id; a real
    * tokenizer slots in per E28/E110 without changing the assembly).
    * Per example: ids = prompt_ids ++ completion_ids ++ [eosId],
    * mask aligned; examples LONGER than the capacity are dropped
    * (stated — the caller chunks long docs first, E103), and windows
    * are [[packGreedy]]'s deterministic per-shard first-fit, examples
    * laid out in id order, padded to exactly `capacity` with `padId`.
    *
    * Scale shape: two scan-side projections (token arrays
    * materialized behind their OWN select — HOF lambdas re-evaluate
    * child subtrees per element otherwise), the packGreedy shard
    * pass, one (shard, id) join back, one hash aggregate; the padded
    * window arrays are the OUTPUT — nothing wider shuffles.
    *
    * @return one row per window: (shard, pack_seq, n_examples,
    *         n_tokens pre-pad, token_ids array<long> of length
    *         `capacity`, loss_mask array<int> aligned). */
  def sftPack(examples: DataFrame, shardCol: String, idCol: String,
              promptCol: String, completionCol: String, capacity: Long,
              eosId: Long = -1L, padId: Long = -2L): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val hash = graft.dedup.Dedup.tokenHash56 _
    // NULL prompt/completion coalesces to the empty token list: a raw
    // NULL would make the id array NULL and size(NULL) = -1 slip the
    // capacity filter, feeding a corrupt size into packGreedy (ADVICE
    // r18) — an all-NULL pair still yields the bare-EOS example,
    // which is the declared semantics for empty text.
    val toks = (c: Column) => filter(split(coalesce(c, lit("")), " "),
      t => t =!= "")
    val base = examples.select(
      col(shardCol).cast("string").as("shard"),
      col(idCol).cast("long").as("doc_id"),
      transform(toks(col(promptCol)), t => hash(t)).as("p_ids"),
      transform(toks(col(completionCol)), t => hash(t)).as("c_ids"))
    val ex = base.select(col("shard"), col("doc_id"),
        concat(col("p_ids"), col("c_ids"), array(lit(eosId))).as("ids"),
        concat(array_repeat(lit(0), size(col("p_ids"))),
          array_repeat(lit(1), size(col("c_ids")) + 1)).as("mask"))
      .withColumn("sz", size(col("ids")).cast("long"))
      .filter(col("sz") <= capacity)
    val packed = packGreedy(ex, "shard", "doc_id", "sz", capacity)
      .select(col("shard"), col("doc_id"), col("pack_seq"))
    packed.join(ex, Seq("shard", "doc_id"))
      .groupBy(col("shard"), col("pack_seq"))
      .agg(count(lit(1)).as("n_examples"),
        sum(col("sz")).as("n_tokens"),
        sort_array(collect_list(
          struct(col("doc_id"), col("ids"), col("mask")))).as("__xs"))
      .select(col("shard"), col("pack_seq"), col("n_examples"),
        col("n_tokens"),
        flatten(transform(col("__xs"), x => x.getField("ids"))).as("__i"),
        flatten(transform(col("__xs"), x => x.getField("mask"))).as("__m"))
      .select(col("shard"), col("pack_seq"), col("n_examples"),
        col("n_tokens"),
        concat(col("__i"), array_repeat(lit(padId),
          (lit(capacity) - col("n_tokens")).cast("int"))).as("token_ids"),
        concat(col("__m"), array_repeat(lit(0),
          (lit(capacity) - col("n_tokens")).cast("int"))).as("loss_mask"))
  }

  def packStats(packed: DataFrame, capacity: Long): DataFrame =
    packed.groupBy(col("shard"), col("pack_seq"))
      .agg(count(lit(1)).as("n_docs"),
        max(col("pack_fill")).as("fill"),
        greatest(lit(capacity) - max(col("pack_fill")), lit(0L)).as("padding"))
}
