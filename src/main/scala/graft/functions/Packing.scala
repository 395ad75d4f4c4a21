package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Sequence packing — the standard LLM-training prep step that concatenates
 * document chunks into fixed-token-budget training sequences ("bins").
 *
 * Offset-based packing: within a shard, chunks are laid out in a
 * deterministic order and each chunk's bin is `floor(token_start / budget)`
 * where `token_start` is the running token offset before the chunk. This is
 * the "concat then cut at budget boundaries" packing used by most training
 * pipelines (a chunk may straddle a boundary; the loader truncates/carries),
 * and unlike first-fit-decreasing it is order-deterministic and
 * oracle-reproducible in plain SQL.
 *
 * Scale shape: packing is sequential WITHIN a shard only — the window
 * cumulative sum partitions by the shard column, so shards pack in parallel
 * and no global single-task window exists. Pick `shardCol` with enough
 * cardinality for the cluster (e.g. a deterministic hash of the document id
 * modulo a few thousand at 100 TB).
 */
object Packing {

  /** Assign every chunk a `bin` within its shard. `chunks` must carry
    * `tokenCol`, `shardCol`, and the `orderBy` columns (unique per shard for
    * a deterministic layout). Adds `bin` (long); map-side except ONE shuffle
    * on the shard column. */
  def packSequences(chunks: DataFrame, tokenCol: String, shardCol: String,
                    orderBy: Seq[String], budget: Int): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(col(shardCol)).orderBy(orderBy.map(col): _*)
    chunks
      .withColumn("__start", sum(col(tokenCol)).over(w) - col(tokenCol))
      .withColumn("bin", floor(col("__start") / budget).cast("long"))
      .drop("__start")
  }

  /**
   * Deterministic training-epoch shuffle + shard assignment: every row gets
   * a `shard` in `[0, 16^hexDigits)` and a dense `pos` within its shard,
   * both pure functions of `(seed, id)` — rerunning with the same seed
   * reproduces the epoch exactly, and a new seed is a fresh global
   * permutation (the per-epoch reshuffle LLM data loaders need).
   *
   * The permutation key is `md5(seed ":" id)`; the shard is the key's first
   * `hexDigits` hex chars, the position ranks the key within the shard.
   *
   * Scale shape: a naive global shuffle (`ORDER BY hash`) funnels the whole
   * corpus through ONE task at the sort boundary's tails — here the shard
   * is computed map-side and the only shuffle is the shard-keyed
   * `row_number` window, so shards rank in parallel and the output is
   * already laid out for per-shard training files. Size `hexDigits` to the
   * cluster: 2 → 256 shards, 4 → 65 536.
   */
  def epochShards(df: DataFrame, idCol: String, seed: String,
                  hexDigits: Int = 2): DataFrame = {
    require(hexDigits >= 1 && hexDigits <= 8, "need 1 <= hexDigits <= 8")
    val key = md5(concat(lit(seed), lit(":"), col(idCol).cast("string")))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("__key"), col(idCol))
    df.withColumn("__key", key)
      .withColumn("shard",
        conv(substring(col("__key"), 1, hexDigits), 16, 10).cast("long"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("__key")
  }
}
