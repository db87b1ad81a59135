package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** TRAINING-READY sequence shards — the artifact a data pipeline
  * actually hands to a trainer: the packed sequence table
  * ([[Bpe.packSequences]]' (split, seq_id, n_tokens, token_ids,
  * doc_spans)) laid out as size-bounded parquet shards per split, plus
  * an exact-conservation AUDIT table written from the same pass.
  *
  *  - Shard = `seq_id DIV rowsPerShard` — seq ids are dense per split,
  *    so shards are equal-sized by construction (last one short), and
  *    the assignment is a pure function of the data: any cluster layout
  *    writes byte-identical shard membership.
  *  - The audit row per (split, shard) carries n_sequences, token and
  *    fixed-point id/provenance sums. [[verify]] recomputes the same
  *    digests from the shipped shards and returns the mismatching
  *    rows — an empty result is the transfer-integrity proof, the
  *    trainer-side twin of the pack's token-conservation assertion.
  *  - One shuffle (hash on the dense (split, shard) keys) aligns
  *    writer tasks with shard directories; the audit aggregates the
  *    SAME shuffled frame, so export is one pass over the corpus.
  */
object SequenceExport {

  /** Write `packed` under `path` as `sequences/` (parquet, partitioned
    * by split and shard) + `audit/` (one digest row per shard).
    * `ordCol` is the dense per-split id shards derive from — `seq_id`
    * (pack order) by default, or [[shuffled]]'s `order_id` for a
    * seeded training order. */
  def write(packed: DataFrame, path: String,
      rowsPerShard: Int = 10000, ordCol: String = "seq_id"): Unit = {
    require(rowsPerShard >= 1, "rowsPerShard must be positive")
    val sharded = packed
      .withColumn("shard", expr(s"$ordCol DIV ${rowsPerShard}L"))
      .repartition(col("split"), col("shard"))
      .persist()
    try {
      sharded.write.mode(SaveMode.Overwrite)
        .partitionBy("split", "shard")
        .parquet(s"$path/sequences")
      digests(sharded).write.mode(SaveMode.Overwrite)
        .parquet(s"$path/audit")
    } finally { sharded.unpersist(); () }
  }

  /** `packed` plus a dense 0-based `order_id` per split — a SEEDED
    * deterministic training order (trainers must not consume sequences
    * in pack order: pack order is document order, which correlates
    * content with training time). The order key is the portable md5
    * hash of (seed, split, seq_id), so epoch e's order is
    * `shuffled(packed, s"epoch$e:")` — reproducible on any engine or
    * cluster layout, a distinct permutation per seed. The dense ordinal
    * comes from the two-phase grouped kernel
    * ([[Ordinal.withGroupedOrdinal]]), never a one-task-per-split
    * window; duplicate (split, seq_id) keys throw. Shard the result
    * with `write(..., ordCol = "order_id")` — the audit digests are
    * order-insensitive sums, so [[verify]] still proves the shuffled
    * artifact conserves exactly the packed corpus. */
  def shuffled(packed: DataFrame, seed: String = "epoch0:"): DataFrame =
    Ordinal.withGroupedOrdinal(
      packed.withColumn("shuffle_key", graft.Qutil.md5Long60(
        concat(lit(seed), col("split"), lit(":"), col("seq_id")))),
      "order_id", Seq("split"),
      Seq(col("shuffle_key"), col("seq_id")),
      uniqueKeyCols = Seq("split", "seq_id"))
      // the order key is internal — exported shards must not carry an
      // extra 8 bytes/row that trainers never consume
      .drop("shuffle_key")

  /** The shipped sequence frame (all shards, shard column included). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/sequences")

  /** Recompute every shard digest from the shipped shards and compare
    * against the audit table: returns the mismatching (split, shard)
    * rows with both sides' digests — EMPTY means the artifact is exactly
    * what the pack produced (row counts, token counts, id sums and
    * provenance sums all conserve). */
  def verify(spark: SparkSession, path: String): DataFrame = {
    val got = digests(read(spark, path))
      .withColumnsRenamed(Map(
        "n_sequences" -> "got_sequences", "n_tokens_sum" -> "got_tokens",
        "id_sum" -> "got_ids", "span_sum" -> "got_spans",
        "mask_sum" -> "got_mask"))
    val wantRaw = spark.read.parquet(s"$path/audit")
    // audits written before the mask column existed verify as unmasked
    // (their shards carry no loss_mask, so the recomputed side is 0 too)
    val want =
      if (wantRaw.columns.contains("mask_sum")) wantRaw
      else wantRaw.withColumn("mask_sum", lit(0L))
    want.join(got, Seq("split", "shard"), "full_outer")
      .filter(
        col("n_sequences").isNull || col("got_sequences").isNull ||
        col("n_sequences") =!= col("got_sequences") ||
        col("n_tokens_sum") =!= col("got_tokens") ||
        col("id_sum") =!= col("got_ids") ||
        col("span_sum") =!= col("got_spans") ||
        col("mask_sum") =!= col("got_mask"))
  }

  private def digests(sharded: DataFrame): DataFrame =
    sharded.groupBy("split", "shard").agg(
      count(lit(1)).as("n_sequences"),
      sum("n_tokens").as("n_tokens_sum"),
      sum(expr("aggregate(token_ids, 0L, (a, x) -> a + x)")).as("id_sum"),
      sum(expr("aggregate(doc_spans, 0L, (a, x) -> a + x.doc_id * x.len)"))
        .as("span_sum"),
      // masked packs conserve the trainable-token count per shard too;
      // unmasked packs pin it at 0 so the audit schema stays uniform
      (if (sharded.columns.contains("loss_mask"))
        sum(expr("aggregate(loss_mask, 0L, (a, x) -> a + x)"))
      else lit(0L)).as("mask_sum"))
}
