package graft.etl

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
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
  def packStats(packed: DataFrame, capacity: Long): DataFrame =
    packed.groupBy(col("shard"), col("pack_seq"))
      .agg(count(lit(1)).as("n_docs"),
        max(col("pack_fill")).as("fill"),
        greatest(lit(capacity) - max(col("pack_fill")), lit(0L)).as("padding"))
}
