package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.streaming.Replay

/** Throttled replay (producer.py:30-43 analog) feeding a Structured
  * Streaming file source — the full sealed-env stand-in for the Kafka
  * produce -> subscribe loop (S4/K3/K4/R2). */
class ReplaySpec extends SparkSpec {
  import spark.implicits._

  test("replay emits ordered JSON batches a file stream consumes exactly once") {
    val dir = Files.createTempDirectory("graft_replay_").toString
    val ckpt = Files.createTempDirectory("graft_replay_ckpt_").toString
    val src = Tables(spark, sfDir, "events")
      .filter(col("event_id") < 40)
      .select("event_id", "user_id", "value")
    val emitted = Replay.replay(src, "event_id", dir, batchSize = 7, intervalMs = 1)
    assert(emitted == 40L)

    val sch = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("value", DoubleType)))
    val q = spark.readStream.schema(sch).json(dir)
      .writeStream.format("memory").queryName("replay_out")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val ids = spark.table("replay_out").select("event_id").as[Long].collect().sorted
    assert(ids.toSeq == (0L until 40L))
  }

  test("rate-source replay paces rows through the engine with no driver loop") {
    val ckpt = Files.createTempDirectory("graft_rate_ckpt_").toString
    val src = Tables(spark, sfDir, "events")
      .filter(col("event_id") < 30)
      .select("event_id", "user_id", "value")
    val q = Replay.rateReplay(src, "event_id", rowsPerSecond = 20)
      .writeStream.format("memory").queryName("rate_replay_out")
      .option("checkpointLocation", ckpt)
      .start()
    // let a few micro-batches run, then stop — emission must be a prefix
    // (each row at most once, in rank order) and visibly throttled.
    try {
      val deadline = System.nanoTime() + 8L * 1000 * 1000 * 1000
      var n = 0L
      while (n < 10 && System.nanoTime() < deadline) {
        Thread.sleep(250)
        n = spark.table("rate_replay_out").count()
      }
    } finally q.stop()
    val ids = spark.table("rate_replay_out")
      .select("event_id").as[Long].collect().sorted.toSeq
    assert(ids.nonEmpty, "rate replay emitted nothing in 8s")
    assert(ids == (0L until ids.size.toLong), s"not a clean prefix: $ids")
    assert(ids.size <= 30)
  }
}
