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
}
