package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.DataFrame

/** Throttled stream replay — the reference's Kafka producer loop
  * (`tasks/scripts/producer.py:30-43`: collect test rows, emit one JSON
  * message every 2 s) re-expressed for the sealed environment: rows are
  * appended as JSON-lines files into a directory that a Structured
  * Streaming file source (`readStream.schema(...).json(dir)`) consumes as
  * an unbounded stream — the same downstream plan shape as the Kafka
  * topic (from_json onward is identical).
  *
  * Unlike the reference's `df.collect()` (R1 — driver-memory-bound), rows
  * stream through `toLocalIterator`, so only one partition is resident
  * driver-side at a time; a 100 TB replay is bounded by the emission rate,
  * not driver heap. Order is made total by `orderCol` so replay is
  * deterministic.
  */
object Replay {

  /** Replays `df` (ordered by `orderCol`) into `outDir` as JSON-lines
    * batch files of `batchSize` rows every `intervalMs` ms. Returns rows
    * emitted. `maxRows` caps the replay (<= 0 = all rows). */
  def replay(df: DataFrame, orderCol: String, outDir: String,
             batchSize: Int = 1, intervalMs: Long = 0L,
             maxRows: Long = -1L): Long = {
    Files.createDirectories(Paths.get(outDir))
    val it = df.orderBy(orderCol).toJSON.toLocalIterator()
    var emitted = 0L
    var batchId = 0L
    val sb = new java.lang.StringBuilder
    var inBatch = 0
    def flush(): Unit = if (inBatch > 0) {
      // write-then-rename so the file source never reads a partial file
      val tmp = Paths.get(outDir, f".batch_$batchId%08d.json.tmp")
      Files.write(tmp, sb.toString.getBytes(StandardCharsets.UTF_8),
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
      Files.move(tmp, Paths.get(outDir, f"batch_$batchId%08d.json"))
      batchId += 1; inBatch = 0; sb.setLength(0)
      if (intervalMs > 0) Thread.sleep(intervalMs)
    }
    while (it.hasNext && (maxRows <= 0 || emitted < maxRows)) {
      sb.append(it.next()).append('\n')
      inBatch += 1; emitted += 1
      if (inBatch >= batchSize) flush()
    }
    flush()
    emitted
  }

  /** All-Spark replay variant: a `rate` source paces emission with NO
    * driver loop at all. The bounded replay set is ranked once (0-based,
    * total order on `orderCol`); the rate stream's monotonically
    * increasing `value` picks exactly one row per tick via a stream-static
    * inner join, so each row is emitted once, `rowsPerSecond` rows per
    * second, entirely inside the engine. Rows past the end of the replay
    * set simply stop matching — the query drains and idles.
    *
    * The global rank window is over the REPLAY SET (a bounded test split
    * by contract), not an unbounded table; pacing state lives in the rate
    * source's offsets, so the replay survives restarts from the checkpoint.
    */
  def rateReplay(df: DataFrame, orderCol: String,
                 rowsPerSecond: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val ranked = df.withColumn("__r",
      row_number().over(Window.orderBy(col(orderCol))).cast("long") - 1L)
    df.sparkSession.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond.toLong.toString)
      .load()
      // rate's (timestamp, value) renamed away: replayed tables may carry
      // their own columns with those names
      .select(col("value").as("__tick"))
      .join(ranked, col("__tick") === col("__r"))
      .drop("__r", "__tick")
  }
}
