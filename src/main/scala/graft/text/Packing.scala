package graft.text

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.text.TextAnalysis.{duckTokens, tokensExpr}

/** Sequence packing — the concat-and-chunk step an LLM training pipeline
  * runs after cleaning/dedup: token streams are concatenated per shard in
  * a deterministic order and cut every `capacity` tokens, so each training
  * example is a dense context window. A document belongs to the chunk
  * where its first token lands.
  *
  * The core primitive is an EXCLUSIVE PREFIX SUM of token counts per
  * source shard in doc_id order. A bare
  * `sum over (partition by source order by doc_id)` window funnels every
  * shard through one reducer (#sources is low-cardinality — the q50
  * lesson), so the prefix sum is two-phase:
  *   1. block partial sums — one hash aggregate over (source, block),
  *      block = doc_id div 1024;
  *   2. exclusive cumsum over the BLOCK sums (rows = #blocks, ~1/1024th
  *      of the table — the only low-parallelism window, and it shrinks
  *      with block size) broadcast-joined back;
  *   3. intra-block cumsum windowed by (source, block) — high cardinality,
  *      each window ≤ 1024 rows regardless of table size.
  * Same decomposition a 1000-executor prefix-scan would use.
  */
object Packing {

  private val capacity = 64  // tokens per packed context window
  private val block = 1024   // docs per prefix-sum block

  val defs: Seq[QueryDef] = Seq(

    // --------------------------------------------------------------- q92:
    // pack documents into `capacity`-token windows per source shard;
    // report per-chunk document and token totals. The oracle replays the
    // same packing with a single flat window cumsum — proving the
    // two-phase decomposition computes the identical prefix sum.
    QueryDef(
      "q92_sequence_packing",
      (s, d) => {
        val t = Tables(s, d, "documents")
          .select(col("source"), col("doc_id"),
            size(expr(tokensExpr)).cast("long").as("tok"))
          .withColumn("blk", expr(s"doc_id div $block"))
        val blockSums = t.groupBy("source", "blk")
          .agg(sum(col("tok")).as("blk_sum"))
        val wBlk = Window.partitionBy(col("source")).orderBy(col("blk"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val blockOffsets = blockSums
          .withColumn("blk_off", coalesce(sum(col("blk_sum")).over(wBlk), lit(0L)))
          .drop("blk_sum")
        val wLoc = Window.partitionBy(col("source"), col("blk"))
          .orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        t.join(broadcast(blockOffsets), Seq("source", "blk"))
          .withColumn("off",
            col("blk_off") + coalesce(sum(col("tok")).over(wLoc), lit(0L)))
          .withColumn("chunk_id", expr(s"off div $capacity"))
          .groupBy("source", "chunk_id")
          .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("sum_tokens"))
          .orderBy("source", "chunk_id")
      },
      Some(s"""
        WITH t AS (
          SELECT source, doc_id,
                 len($duckTokens) AS tok
          FROM documents),
        o AS (
          SELECT source, doc_id, tok,
                 CAST(COALESCE(SUM(tok) OVER (PARTITION BY source ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS off
          FROM t)
        SELECT source, CAST(off // $capacity AS BIGINT) AS chunk_id,
               COUNT(*) AS n_docs, CAST(SUM(tok) AS BIGINT) AS sum_tokens
        FROM o
        GROUP BY 1, 2
        ORDER BY source, chunk_id""")),

    // -------------------------------------------------------------- q102:
    // deterministic corpus shuffle — the seeded global permutation a
    // training pipeline applies before packing/sharding so examples are
    // decorrelated from ingest order but every re-run (and every
    // downstream consumer) sees the identical order. Shuffle key =
    // md5(seed || doc_id): replayable, uniform, engine-agnostic.
    //
    // Scale shape: assigning the global POSITION under that order is the
    // q92 two-phase prefix sum, not a global window — bucket by the key's
    // first hex byte (256 ranges), count per bucket (one hash aggregate),
    // exclusive-cumsum the 256 bucket counts (the only low-parallelism
    // window, fixed 256 rows at ANY corpus size) broadcast back, then
    // rank within bucket (high-cardinality window, ~1/256th of the table
    // each). A bare row_number() OVER (ORDER BY key) — or an RDD
    // zipWithIndex — funnels the full corpus through one task.
    QueryDef(
      "q102_corpus_shuffle",
      (s, d) => {
        val t = Tables(s, d, "documents")
          .select(col("doc_id"),
            md5(concat(lit("shuf42:"), col("doc_id").cast("string"))).as("k"))
          .withColumn("b", substring(col("k"), 1, 2))
        val bCounts = t.groupBy("b").agg(count(lit(1)).as("n"))
        val wB = Window.orderBy(col("b"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val bOff = bCounts
          .withColumn("off", coalesce(sum(col("n")).over(wB), lit(0L)))
          .drop("n")
        val wLoc = Window.partitionBy(col("b"))
          .orderBy(col("k"), col("doc_id"))
        t.join(broadcast(bOff), Seq("b"))
          .withColumn("pos", col("off") + row_number().over(wLoc))
          .select(col("pos").cast("long").as("pos"), col("doc_id"))
          .orderBy("pos")
      },
      Some("""
        SELECT CAST(ROW_NUMBER() OVER (
                 ORDER BY md5('shuf42:' || CAST(doc_id AS VARCHAR)), doc_id)
               AS BIGINT) AS pos,
               doc_id
        FROM documents
        ORDER BY pos"""))
  )
}
