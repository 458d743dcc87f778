package graft

import org.apache.spark.sql.functions._

import graft.sources.Partitioned

/** Plan-shape + layout contracts for the partitioned warehouse (q90). */
class PartitionedSpec extends SparkSpec {

  test("q90 scan carries non-empty PartitionFilters (pruning is planned, not filtered)") {
    val plan = Partitioned.prunedWeek(spark, sfDir)
      .queryExecution.executedPlan.toString
    // The date predicate must land on partition VALUES at planning time.
    // If it degraded to a data filter the scan would read all 30 days.
    val pf = "PartitionFilters: \\[([^\\]]*)\\]".r
      .findFirstMatchIn(plan).map(_.group(1))
    assert(pf.exists(_.contains("event_date")),
      s"expected event_date in PartitionFilters, plan:\n$plan")
    // ...and the predicate must NOT appear among data filters/pushed
    // filters — partition columns aren't stored in the data files.
    assert(!plan.contains("PushedFilters: [IsNotNull(event_date)"))
  }

  test("pruned scan reads only the selected partitions' rows") {
    val wh = Partitioned.eventsByDay(spark, sfDir)
    val oneDay = spark.read.parquet(wh)
      .filter(col("event_date") === lit("2024-01-10"))
    val full = spark.read.parquet(wh)
    val dayRows = oneDay.count()
    assert(dayRows > 0 && dayRows < full.count())
    // the partition column round-trips as a real DATE, not a string
    assert(oneDay.schema("event_date").dataType ==
      org.apache.spark.sql.types.DateType)
  }

  test("warehouse cache invalidates when the fixture is regenerated in place") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_part_inval_")
    val fix = tmp.resolve("events.parquet").toString
    val ev = Tables(spark, sfDir, "events")
    // v1 fixture -> warehouse built from it
    ev.limit(1000).write.mode("overwrite").parquet(fix)
    val wh1 = Partitioned.eventsByDay(spark, tmp.toString)
    assert(spark.read.parquet(wh1).count() == 1000)
    // regenerate the fixture IN PLACE (same path, new content/files); the
    // content-fingerprint key must yield a different warehouse, not serve
    // the stale 1000-row copy behind the old _SUCCESS guard
    ev.limit(200).write.mode("overwrite").parquet(fix)
    val wh2 = Partitioned.eventsByDay(spark, tmp.toString)
    assert(wh2 != wh1, "regenerated fixture must not reuse the stale warehouse")
    assert(spark.read.parquet(wh2).count() == 200)
  }

  test("dynamic partition overwrite replaces only touched partitions") {
    val src = Partitioned.eventsByDay(spark, sfDir)
    val wh = "/tmp/graft_part/dyn_overwrite_spec"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(wh))
    spark.read.parquet(src).write.mode("overwrite")
      .partitionBy("event_date").parquet(wh)
    val before = spark.read.parquet(wh)
      .groupBy("event_date").count().collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap

    // The daily-backfill idiom: rewrite ONE day; with dynamic mode the
    // other 29 partitions are untouched (static mode would drop them).
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      spark.read.parquet(src)
        .filter(col("event_date") === lit("2024-01-05"))
        .limit(7)
        .write.mode("overwrite").partitionBy("event_date").parquet(wh)
    } finally prev.fold(
      spark.conf.unset("spark.sql.sources.partitionOverwriteMode"))(
      v => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v))

    val after = spark.read.parquet(wh)
      .groupBy("event_date").count().collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(after("2024-01-05") == 7L)
    assert((before - "2024-01-05") == (after - "2024-01-05"),
      "untouched partitions must survive a dynamic overwrite")
  }

  test("layout-controlled write: maxRecordsPerFile bounds files, sortWithinPartitions orders them") {
    import spark.implicits._
    // The file-sizing idiom for a 100 TB table: range-partition on the
    // clustering key, sort within partitions, cap records per file. Small
    // bounded files with narrow per-file min/max ranges are what makes
    // footer-stats data skipping effective downstream.
    val out = java.nio.file.Files
      .createTempDirectory("graft_layout_").toString
    Tables(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("value"))
      .repartitionByRange(4, col("user_id"))
      .sortWithinPartitions(col("user_id"), col("event_id"))
      .write.option("maxRecordsPerFile", 200).mode("overwrite").parquet(out)
    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.nonEmpty)
    for (f <- files) {
      val rows = spark.read.parquet(f.getPath)
        .select(col("user_id"), col("event_id")).as[(Long, Long)].collect()
      assert(rows.length <= 200, s"${f.getName} exceeds maxRecordsPerFile")
      // sorted within the file -> tight min/max footer ranges
      assert(rows.toSeq == rows.toSeq.sorted, s"${f.getName} not sorted")
    }
    // range partitioning -> distinct files cover disjoint user ranges per
    // partition; total row conservation across the layout rewrite
    val total = spark.read.parquet(out).count()
    assert(total == Tables(spark, sfDir, "events").count())
  }

  test("q169 compaction: file count shrinks to the size-targeted bound, content proven by oracle") {
    // run the query (builds + compacts once per fixture version); its
    // oracle pairing already proves content equality — here assert the
    // LAYOUT contract: 64 fragments in, ceil(bytes/target) files out
    SparkEntry.queries("q169_compact_files")(spark, sfDir).collect()
    val (small, compacted, expected) =
      graft.sources.Partitioned.compactionCounts(sfDir)
    assert(small == 64, s"staging should hold 64 fragments, found $small")
    assert(compacted == expected,
      s"compacted file count $compacted != size-targeted $expected")
    assert(compacted < small,
      s"compaction did not reduce file count ($compacted vs $small)")
  }
}
