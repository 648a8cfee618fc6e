package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training: assign documents to fixed-budget
  * training sequences WITHOUT splitting a document across sequences — the
  * complement of d17's running-sum sharding (which lets a document
  * straddle a shard boundary). No-split packing is what a pipeline needs
  * when each training sequence carries its own attention mask and a
  * document must stay contiguous inside one `max_seq_len` window; the
  * price of the no-split guarantee is padding, which this operator
  * reports exactly.
  *
  * Algorithm: NEXT-FIT within deterministic shards. Documents are
  * distributed to `nShards` streams by a portable hash of the id (the
  * same PolyHash-bucket contract as d16/d41 — the assignment is a pure
  * function of the data), ordered by id within the shard, and packed
  * sequentially: a document goes into the current open bin if it fits,
  * else the bin closes and a new one opens. Next-fit is the ONLY classic
  * packing rule with O(1) state per stream — first-fit/best-fit keep
  * every bin open (state ∝ corpus/budget, a genuine scale hazard) for
  * ~10% less padding; at 100 TB the bounded-state rule is the right
  * default, and the padding report makes the trade measurable. Shards
  * pack independently, so parallelism = nShards and per-task state is one
  * counter; raise nShards to bound per-task volume (same hatch as every
  * window family).
  *
  * Oversized documents (size > budget) get a bin of their own, flagged
  * `oversize` — the caller's cue to pre-split them with the d36 chunker
  * and re-pack. They never silently vanish and never corrupt a
  * neighbor's budget: the row AFTER an oversized document always opens a
  * fresh bin.
  *
  * Determinism: shard hash, id order, and the next-fit recurrence are all
  * pure functions of the input — the packing replays bit-for-bit on any
  * engine, any partitioning, any retry (the DuckDB oracle replays the
  * recurrence with a recursive CTE).
  *
  * Reference tie-in: the reference's batching stage groups items into
  * fixed-size lists as they arrive (`stage.py` BatchStage, size-bounded) —
  * next-fit packing is that same arrival-order batching with a
  * capacity-sum bound instead of a count bound.
  */
object Packing {

  /** Pack `(id, size)` rows into per-shard next-fit bins. Output columns:
    * `id`, `size`, `shard`, `bin` (0-based within shard), `oversize`.
    * `sizeCol` must be a non-negative integral column (token counts). */
  def nextFitPack(
      df: DataFrame,
      idCol: String,
      sizeCol: String,
      budget: Long,
      nShards: Int
  ): DataFrame = {
    require(budget > 0 && nShards > 0, "budget and nShards must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val rows = df.select(
      col(idCol).cast("long").as("id"),
      col(sizeCol).cast("long").as("size"),
      pmod(graft.expressions.PolyHash(
        concat(lit("pack|"), col(idCol).cast("string"))), lit(nShards))
        .cast("int").as("shard"))
      .as[(Long, Long, Int)]
    rows.groupByKey(_._3)
      .flatMapGroups { (shard, it) =>
        // per-shard sequential next-fit: sort by id (shard volume is the
        // caller-bounded unit of work), then one O(1)-state pass
        val docs = it.toArray.sortBy(_._1)
        var bin = -1L
        var rem = -1L
        docs.iterator.map { case (id, size, _) =>
          if (bin < 0 || size > rem) { bin += 1; rem = budget }
          rem -= size // oversize drives rem negative; next doc reopens
          (id, size, shard, bin, size > budget)
        }
      }
      .toDF("id", "size", "shard", "bin", "oversize")
  }

  /** Packing-efficiency report per shard: bins used, docs, token totals,
    * exact padding (budget − fill, oversize bins contribute zero padding
    * — they are flagged work, not waste), and fill in millionths. */
  def packingStats(packed: DataFrame, budget: Long): DataFrame = {
    val bins = packed.groupBy(col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("size")).as("fill"),
        max(col("oversize")).as("oversize"))
    bins.groupBy(col("shard")).agg(
      count(lit(1)).as("n_bins"),
      sum(col("n_docs")).as("n_docs"),
      sum(col("fill")).as("tokens"),
      sum(when(col("oversize"), 0L)
        .otherwise(lit(budget) - col("fill"))).as("padding"),
      sum(when(col("oversize"), 1L).otherwise(0L)).as("oversize_bins"))
  }
}
