package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming parity tests (SURVEY.md §3.2 / phase 5): the
  * reference's Kafka JSON score loop re-expressed over MemoryStream, plus
  * watermark late-data semantics and stateful streaming dedup — the parts
  * of the streaming engine the batch oracle can't check.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private val eventSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("user_id", LongType),
    StructField("value", DoubleType)))


  test("json decode -> transform -> json encode round-trips through a stream (predict.py analog)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[String]
    in.addData(
      """{"event_id":1,"user_id":10,"value":5.0}""",
      """{"event_id":2,"user_id":11,"value":50.0}""")
    val scored = in.toDF().select(from_json(col("value"), eventSchema).as("data"))
      .select("data.*")
      // stand-in for model.transform: threshold score (predict.py:34 analog)
      .withColumn("predicted_label", when(col("value") > 10.0, 1).otherwise(0))
      .select(to_json(struct(col("event_id"), col("value"), col("predicted_label"))).as("value"))
    val q = scored.writeStream.format("memory").queryName("scored_out")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("scored_out").as[String].collect().sorted
    assert(rows.toSeq == Seq(
      """{"event_id":1,"value":5.0,"predicted_label":0}""",
      """{"event_id":2,"value":50.0,"predicted_label":1}"""))
  }

  test("watermark drops late data past the threshold in windowed aggregation") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, Double)]
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val agg = in.toDF().toDF("ts", "v")
      .withWatermark("ts", "5 minutes")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("start"), col("n"))
    val q = agg.writeStream.format("memory").queryName("wm_out")
      .outputMode("append").start()
    // batch 1: events at 10:01, 10:22 -> watermark advances to 10:17,
    // which is past the END of the [10:00, 10:10) window
    in.addData((ts(1), 1.0), (ts(22), 1.0))
    q.processAllAvailable()
    // batch 2: late event at 10:03 — its window end (10:10) is behind the
    // watermark (10:17), so state is expired and the event must be DROPPED
    in.addData((ts(3), 1.0), (ts(25), 1.0))
    q.processAllAvailable()
    // batch 3: advance far so the 10:20 window also closes
    in.addData((ts(59), 1.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("wm_out")
      .select(date_format(col("start"), "HH:mm").as("s"), col("n"))
      .as[(String, Long)].collect().toMap
    assert(out("10:00") == 1L, "late 10:03 event must not be re-counted")
    assert(out("10:20") == 2L) // 10:22 + 10:25; the late 10:03 dropped
  }

  test("stateful streaming dropDuplicates dedups across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Long]
    val q = in.toDF().toDF("id").dropDuplicates("id")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    in.addData(1L, 2L, 2L)
    q.processAllAvailable()
    in.addData(2L, 3L, 1L) // cross-batch duplicates -> state must filter
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("dedup_out").as[Long].collect().sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L))
  }

  test("mapGroupsWithState keeps custom per-key state across micro-batches") {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    implicit val sqlCtx = spark.sqlContext
    // custom stateful operator: running per-user event count + max value
    def update(user: Long, rows: Iterator[(Long, Double)],
               state: GroupState[(Long, Double)]): (Long, Long, Double) = {
      val (n0, mx0) = state.getOption.getOrElse((0L, Double.MinValue))
      var n = n0; var mx = mx0
      rows.foreach { case (_, v) => n += 1; mx = math.max(mx, v) }
      state.update((n, mx))
      (user, n, mx)
    }
    val in = MemoryStream[(Long, Double)]
    val q = in.toDS()
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(update)
      .toDF("user_id", "n", "max_value")
      .writeStream.format("memory").queryName("state_out")
      .outputMode(OutputMode.Update()).start()
    in.addData((1L, 5.0), (1L, 7.0), (2L, 1.0))
    q.processAllAvailable()
    in.addData((1L, 6.0), (2L, 9.0)) // state must carry: user 1 -> n=3, max=7
    q.processAllAvailable()
    q.stop()
    val last = spark.table("state_out")
      .groupBy("user_id").agg(max(col("n")).as("n"), max(col("max_value")).as("mx"))
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(last.toSeq == Seq((1L, 3L, 7.0), (2L, 2L, 9.0)))
  }

  test("file-stream source processes the events fixture exactly once (availableNow)") {
    val ckpt = Files.createTempDirectory("graft_test_ckpt_").toString
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val sch = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val q = spark.readStream.schema(sch)
      .option("pathGlobFilter", "events.parquet").parquet(sfDir)
      .groupBy().count()
      .writeStream.format("memory").queryName("cnt_out").outputMode("complete")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("cnt_out").as[Long].head()
    val batch = Tables(spark, sfDir, "events").count()
    assert(streamed == batch)
  }

  test("stream-static join enriches every event exactly once (q98)") {
    // user_id % 25 always hits exactly one of the 25 nations, so the
    // enrichment is total: windowed counts must sum to the event count,
    // and every nation name must come from the dimension table
    val got = SparkEntry.queries("q98_stream_static_join")(spark, sfDir)
    val total = got.agg(sum(col("n"))).head().getLong(0)
    assert(total == Tables(spark, sfDir, "events").count())
    val names = got.select("n_name").distinct().as[String].collect().toSet
    val dim = Tables(spark, sfDir, "nation")
      .select("n_name").as[String].collect().toSet
    assert(names.subsetOf(dim) && names.nonEmpty)
  }

  test("transformWithState keeps typed per-key state across micro-batches (RocksDB)") {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    implicit val sqlCtx = spark.sqlContext
    // Spark 4's arbitrary-state successor to mapGroupsWithState: typed,
    // named state variables on an explicit handle, RocksDB-only — the
    // state store that actually scales (incremental checkpoints, no JVM
    // heap residency for 100 TB-of-keys state)
    val kProv = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(kProv)
    spark.conf.set(kProv,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[(Long, Double)]
      val q = in.toDS()
        .groupByKey(_._1)
        .transformWithState(new StatsProcessor, TimeMode.None(),
          OutputMode.Update())
        .toDF("user_id", "n", "max_value")
        .writeStream.format("memory").queryName("tws_out")
        .outputMode(OutputMode.Update()).start()
      in.addData((1L, 5.0), (1L, 7.0), (2L, 1.0))
      q.processAllAvailable()
      in.addData((1L, 6.0), (2L, 9.0)) // state must carry across batches
      q.processAllAvailable()
      q.stop()
      val last = spark.table("tws_out")
        .groupBy("user_id").agg(max(col("n")).as("n"), max(col("max_value")).as("mx"))
        .as[(Long, Long, Double)].collect().sortBy(_._1)
      assert(last.toSeq == Seq((1L, 3L, 7.0), (2L, 2L, 9.0)))
    } finally prev.fold(spark.conf.unset(kProv))(v => spark.conf.set(kProv, v))
  }

  // NOTE on TTL: TTLConfig requires TimeMode.ProcessingTime, under which
  // the query self-schedules state-cleanup work — in this single-JVM
  // environment that loops batches indefinitely (processAllAvailable and
  // even Trigger.AvailableNow never settle; measured, not speculated).
  // TTL is therefore exercised nowhere: q110 documents why wall-clock
  // eviction is excluded from the oracle-paired surface, and the
  // TTLConfig.NONE paths above pin the state API itself.

  test("q103 bounded-state dedup removes the injected duplicates exactly (stream = clean batch)") {
    // every source row is doubled upstream of dropDuplicatesWithinWatermark;
    // the deduped totals must equal the CLEAN batch table's — both the
    // per-type counts (dup copies dropped) and the decimal-exact sums
    // (the surviving copy is bit-identical to the original)
    val got = SparkEntry.queries("q103_stream_dedup_bounded")(spark, sfDir)
      .as[(String, Long, Double)].collect().sortBy(_._1)
    val exp = Tables(spark, sfDir, "events")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), graft.util.Det.dsum(col("value")).as("s"))
      .as[(String, Long, Double)].collect().sortBy(_._1)
    assert(got.toSeq == exp.toSeq)
  }

  test("q141 streaming CDC sink: streamed merges == one-shot MERGE; restart and batch retry are idempotent") {
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).toSeq
    // first run: three micro-batches of changes fold into state versions
    val r1 = canon(SparkEntry.queries("q141_stream_cdc_merge")(spark, sfDir))
    // streamed-equals-batch: the final state is exactly the q131 MERGE
    val batch = canon(SparkEntry.queries("q131_cdc_apply")(spark, sfDir))
    assert(r1 == batch, "streamed CDC final state != one-shot MERGE result")
    // restart idempotence: AvailableNow over the same checkpoint sees no
    // new files and must not change state
    val r2 = canon(SparkEntry.queries("q141_stream_cdc_merge")(spark, sfDir))
    assert(r2 == r1, "restart from checkpoint changed the state")
    // crash-retry idempotence: re-apply micro-batch 0 against state
    // version 0 (exactly what a foreachBatch retry does) and assert the
    // downstream read-back is unchanged
    val base = graft.streaming.Windows.stableDirForSpec("q141", sfDir)
    val stateRoot = base.resolve("state")
    val change0 = spark.read.parquet(
      base.resolve("changes").resolve("change0.parquet").toString)
    graft.streaming.Windows.applyCdcBatch(stateRoot, change0, 0L)
    val r3 = canon(spark.read
      .parquet(graft.streaming.Windows.latestStateVersion(stateRoot).toString)
      .orderBy("o_orderkey"))
    assert(r3 == r1, "re-applied batch 0 changed the final state")
  }

  test("q141 mid-batch crash: kill between version write and checkpoint " +
      "commit; the restarted run re-applies the batch identically") {
    // The ugliest exactly-once timing: foreachBatch has WRITTEN state
    // version id+1, then the process dies before Spark commits batch id
    // to the checkpoint. On restart the batch re-runs from the offset
    // log (same id, same file), re-reads the UNTOUCHED version id, and
    // must rewrite version id+1 with identical content — q141's
    // versioning contract under a real injected crash, not a simulated
    // re-apply. Own dirs (not the declared query's stableDir): this test
    // deliberately corrupts mid-run state.
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}
    val base = java.nio.file.Files.createTempDirectory("graft_q141crash_")
    val stateRoot = base.resolve("state")
    val srcDir = base.resolve("changes")
    val ckpt = base.resolve("ckpt").toString
    Tables(spark, sfDir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
      .withColumn("action", lit("kept"))
      .write.mode("overwrite").parquet(stateRoot.resolve("ver0").toString)
    val all = graft.relational.Temporal.cdcChangeset(spark, sfDir)
    val staging = java.nio.file.Files.createTempDirectory("graft_q141crash_src_")
    Seq("D", "U", "I").zipWithIndex.foreach { case (op, i) =>
      val tmp = java.nio.file.Files.createTempDirectory("graft_q141crash_part_")
      all.filter(col("op") === op)
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      graft.util.Fs.children(tmp)
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .foreach(p => java.nio.file.Files.copy(
          p, staging.resolve(s"change$i.parquet")))
    }
    java.nio.file.Files.move(staging, srcDir)
    val chSchema = StructType(Seq(
      StructField("k", LongType), StructField("op", StringType),
      StructField("new_price", DoubleType)))
    def run(crashAfterBatch: Option[Long]): Unit = {
      val q = spark.readStream.schema(chSchema)
        .option("maxFilesPerTrigger", "1")
        .parquet(srcDir.toString)
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, id: Long) =>
          graft.streaming.Windows.applyCdcBatch(stateRoot, batch, id)
          // crash AFTER the version write, BEFORE returning — Spark never
          // commits this batch's epoch, exactly the kill window
          if (crashAfterBatch.contains(id))
            throw new RuntimeException("injected mid-batch crash")
        }
        .start()
      q.awaitTermination()
    }
    def stateRows(v: String): Seq[String] =
      spark.read.parquet(stateRoot.resolve(v).toString)
        .orderBy("o_orderkey").collect().map(_.toString).toSeq
    intercept[StreamingQueryException] { run(crashAfterBatch = Some(1L)) }
    // the doomed attempt DID write ver2 — capture it pre-retry
    val ver2FromCrashedAttempt = stateRows("ver2")
    assert(ver2FromCrashedAttempt.nonEmpty, "crash injected before the write")
    // restart: batch 1 re-runs from the offset log, then batch 2 drains
    run(crashAfterBatch = None)
    assert(stateRows("ver2") == ver2FromCrashedAttempt,
      "retried batch 1 produced a DIFFERENT ver2 than the crashed attempt")
    // version ledger is exactly ver0..ver3 — no duplicate, no gap
    val vers = graft.util.Fs.children(stateRoot)
      .map(_.getFileName.toString).sorted
    assert(vers == Seq("ver0", "ver1", "ver2", "ver3"),
      s"state version ledger corrupted: $vers")
    // and the crash-retried end state is byte-equal to the one-shot MERGE
    val fin = stateRows("ver3")
    val oneShot = SparkEntry.queries("q131_cdc_apply")(spark, sfDir)
      .collect().map(_.toString).toSeq
    assert(fin == oneShot,
      "crash-retried streamed CDC final state != one-shot MERGE result")
  }

  test("killed-run sink partitions cannot leak into a fresh run (q75/q76 sweep)") {
    // The nightmare mode: a run is killed (or its checkpoint discarded),
    // its per-batch_id sink partitions survive, and the NEXT run — which
    // reprocesses from offset zero, possibly with a different batch cut —
    // reads the orphans back alongside its own output. q141 versions its
    // state against this; the plain foreachBatch sinks sweep a sink
    // whose checkpoint is gone. Drive both queries through kill/rerun
    // with a planted orphan and assert the rerun result is unchanged.
    import org.apache.spark.sql.functions._
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).toSeq
    def rm(p: java.nio.file.Path): Unit = graft.util.Fs.rmTree(p)
    def killRerun(name: String, dirName: String)(
        plantOrphan: java.nio.file.Path => Unit): Unit = {
      val r1 = canon(SparkEntry.queries(name)(spark, sfDir))
      val base = graft.streaming.Windows.stableDirForSpec(dirName, sfDir)
      plantOrphan(base.resolve("out"))
      // kill: discard the checkpoint, keep the (now stale) sink
      rm(base.resolve("ckpt"))
      val r2 = canon(SparkEntry.queries(name)(spark, sfDir))
      assert(r2 == r1,
        s"$name rerun after kill read back orphan sink data: " +
          s"${r2.size} rows vs ${r1.size}")
    }
    // q75: per-batch_id PARTITION dirs — plant a full copy of the first
    // partition under an id no rerun produces (duplicates every row)
    killRerun("q75_stream_stream_join", "q75") { out =>
      val first = graft.util.Fs.children(out)
        .find(p => p.getFileName.toString.startsWith("batch_id="))
        .getOrElse(fail(s"no batch partitions under $out"))
      spark.read.parquet(first.toString)
        .write.mode("overwrite").parquet(out.resolve("batch_id=99").toString)
    }
    // q76: flat append files with a batch_id COLUMN and last-writer-wins
    // read-back — plant corrupted totals under the highest batch id, so
    // without the sweep the rerun would prefer the orphan's values
    killRerun("q76_foreachbatch_upsert", "q76") { out =>
      spark.read.parquet(out.toString)
        .withColumn("batch_id", lit(99L))
        .withColumn("n", col("n") + 1000L)
        .write.mode("append").parquet(out.toString)
    }
  }
}

/** transformWithState processor: running per-key count + max, held in two
  * named ValueStates (the typed replacement for GroupState). Top-level —
  * the processor is shipped to executors and must not capture the spec. */
private[graft] class StatsProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, (Long, Double), (Long, Long, Double)] {
  import org.apache.spark.sql.Encoders
  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}
  @transient private var n: ValueState[Long] = _
  @transient private var mx: ValueState[Double] = _
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    n = getHandle.getValueState[Long]("n", Encoders.scalaLong, TTLConfig.NONE)
    mx = getHandle.getValueState[Double]("mx", Encoders.scalaDouble, TTLConfig.NONE)
  }
  override def handleInputRows(key: Long, rows: Iterator[(Long, Double)],
      timers: TimerValues): Iterator[(Long, Long, Double)] = {
    var cnt = if (n.exists()) n.get() else 0L
    var m = if (mx.exists()) mx.get() else Double.MinValue
    rows.foreach { case (_, v) => cnt += 1; m = math.max(m, v) }
    n.update(cnt); mx.update(m)
    Iterator.single((key, cnt, m))
  }
}
