package graft

import java.nio.file.Paths

import org.apache.spark.sql.Row

import graft.catalog.GraftPartField

/** Hidden (transform) partitioning — days/months/years/hours/truncate
  * PARTITIONED BY clauses ([[graft.catalog.GraftPartField]]).
  *
  * Contracts pinned here:
  *   - the transform semantics themselves (epoch-day/month/hour,
  *     code-point truncate, floorDiv on negatives — the pre-1970 seam);
  *   - one file per transform bucket per write (the writer's split +
  *     the clustered write distribution resolved through the catalog's
  *     FunctionCatalog);
  *   - predicates on the SOURCE column still prune files (hidden
  *     partitioning's whole point: no query rewrite needed);
  *   - dynamic partition overwrite replaces exactly the touched
  *     transform buckets;
  *   - `$partitions` renders transform keys Iceberg-style;
  *   - identity partitioning is bit-for-bit unaffected (legacy encoded
  *     form parses unchanged);
  *   - truncate() string prefix partitioning splits and prunes.
  */
class TransformPartitionSpec extends SparkSpec {

  private def sql(q: String) = spark.sql(q)

  private def setup(name: String): String = {
    spark.conf.set("spark.sql.catalog.gtest",
      classOf[graft.catalog.GraftCatalog].getName)
    val t = s"gtest.default.$name"
    sql(s"DROP TABLE IF EXISTS $t")
    t
  }

  private def graftScanOf(df: org.apache.spark.sql.DataFrame)
      : graft.catalog.GraftScan =
    df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec
          if b.scan.isInstanceOf[graft.catalog.GraftScan] =>
        b.scan.asInstanceOf[graft.catalog.GraftScan]
    }.getOrElse(fail("no GraftScan in plan"))

  test("transform semantics: epoch days/months/years/hours, truncate, " +
      "pre-1970 floor") {
    import org.apache.spark.sql.types._
    import org.apache.spark.unsafe.types.UTF8String
    val ts = TimestampType
    def us(day: Long, hour: Long = 0): Long =
      day * 86400000000L + hour * 3600000000L
    val days = GraftPartField.parse("days(ts)")
    assert(days.eval(ts, us(19797)) == 19797)
    assert(days.eval(ts, us(19797, 23)) == 19797)
    // pre-1970: -1µs is day -1 (floor), not day 0 (truncation-toward-0)
    assert(days.eval(ts, -1L) == -1)
    assert(days.eval(DateType, -1) == -1)
    val hours = GraftPartField.parse("hours(ts)")
    assert(hours.eval(ts, us(2, 5)) == 2 * 24 + 5)
    assert(hours.eval(ts, -1L) == -1)
    val months = GraftPartField.parse("months(ts)")
    assert(months.eval(ts, 0L) == 0)
    assert(months.eval(DateType, 31) == 1)   // 1970-02-01
    assert(months.eval(DateType, -1) == -1)  // 1969-12-31
    val years = GraftPartField.parse("years(ts)")
    assert(years.eval(DateType, 365) == 1)   // 1971-01-01
    assert(years.eval(DateType, -1) == -1)   // 1969
    val tr = GraftPartField.parse("truncate(3,s)")
    assert(tr.eval(StringType, UTF8String.fromString("abcdef"))
      .toString == "abc")
    assert(tr.eval(StringType, UTF8String.fromString("ab")).toString == "ab")
    val tri = GraftPartField.parse("truncate(10,v)")
    assert(tri.eval(LongType, 27L) == 20L)
    assert(tri.eval(LongType, -3L) == -10L) // floor, Iceberg semantics
    assert(tri.eval(IntegerType, 100) == 100)
    // null flows through every transform
    assert(days.eval(ts, null) == null)
    // rendering (the $partitions key spelling)
    assert(days.render(ts, 19797) == "2024-03-15")
    assert(months.render(ts, (2024 - 1970) * 12 + 2) == "2024-03")
    assert(years.render(ts, 54) == "2024")
    assert(hours.render(ts, 26) == "1970-01-02-02")
    // encoded round-trip (the persisted index spelling)
    for (s <- Seq("ts", "days(ts)", "months(d)", "years(d)", "hours(ts)",
        "truncate(4,s)"))
      assert(GraftPartField.parse(s).encoded == s)
  }

  test("days(ts): one file per day per write; source-column predicates " +
      "prune; $partitions renders day keys") {
    val n = "tp_days"; val t = setup(n)
    sql(s"CREATE TABLE $t (id BIGINT, ts TIMESTAMP, v DOUBLE) " +
      s"PARTITIONED BY (days(ts))")
    // 3 days × many distinct timestamps — identity partitioning would
    // make one file per TIMESTAMP; days() must make one per DAY
    sql(s"""INSERT INTO $t
      SELECT id, timestamp'2024-03-15 00:00:00' +
        make_interval(0,0,0,0,0,0, id * 617 % 259200), cast(id as double)
      FROM range(0, 300)""")
    val files = sql(s"SELECT * FROM gtest.default.`${n}$$files`").count()
    assert(files == 3, s"expected 3 day files, got $files")
    assert(sql(s"SELECT count(*) FROM $t").head().getLong(0) == 300L)
    // hidden partitioning: the PREDICATE stays on ts, pruning still
    // hits file selection (3 files -> 1)
    val oneDay = sql(s"SELECT * FROM $t WHERE " +
      "ts >= timestamp'2024-03-16 00:00:00' AND " +
      "ts < timestamp'2024-03-17 00:00:00'")
    assert(graftScanOf(oneDay).plannedFileCount == 1,
      "day-range predicate on the source column must prune to 1 file")
    assert(oneDay.count() > 0)
    // $partitions: Iceberg-style transform keys
    val parts = sql(s"SELECT partition FROM gtest.default.`${n}$$partitions` ORDER BY 1")
      .collect().map(_.getString(0)).toSeq
    assert(parts == Seq("days(ts)=2024-03-15", "days(ts)=2024-03-16",
      "days(ts)=2024-03-17"), s"got $parts")
  }

  test("days(ts): dynamic overwrite replaces exactly the touched day") {
    val n = "tp_dyn"; val t = setup(n)
    sql(s"CREATE TABLE $t (id BIGINT, ts TIMESTAMP, v DOUBLE) " +
      s"PARTITIONED BY (days(ts))")
    sql(s"INSERT INTO $t VALUES " +
      "(1, timestamp'2024-03-15 08:00:00', 1.0), " +
      "(2, timestamp'2024-03-16 09:00:00', 2.0), " +
      "(3, timestamp'2024-03-16 10:00:00', 3.0)")
    // dynamic overwrite of day 16 only — day 15 must survive untouched
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try sql(s"INSERT OVERWRITE $t VALUES " +
      "(9, timestamp'2024-03-16 23:00:00', 9.0)")
    finally spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    val rows = sql(s"SELECT id, v FROM $t ORDER BY id").collect().toSeq
    assert(rows == Seq(Row(1L, 1.0), Row(9L, 9.0)),
      s"day-16 rows replaced, day-15 kept; got $rows")
  }

  test("truncate(2, s): prefix buckets split files and prune on " +
      "source-column equality") {
    val n = "tp_trunc"; val t = setup(n)
    sql(s"CREATE TABLE $t (s STRING, n BIGINT) " +
      s"PARTITIONED BY (truncate(2, s))")
    sql(s"INSERT INTO $t VALUES ('aaX', 1), ('aaY', 2), ('bbZ', 3), " +
      "('ccW', 4)")
    assert(sql(s"SELECT * FROM gtest.default.`${n}$$files`").count() == 3)
    val q = sql(s"SELECT n FROM $t WHERE s = 'bbZ'")
    assert(graftScanOf(q).plannedFileCount == 1,
      "equality on the source string must prune to its prefix bucket")
    assert(q.head().getLong(0) == 3L)
    val parts = sql(s"SELECT partition FROM gtest.default.`${n}$$partitions` ORDER BY 1")
      .collect().map(_.getString(0)).toSeq
    assert(parts == Seq("truncate(2,s)=aa", "truncate(2,s)=bb",
      "truncate(2,s)=cc"), s"got $parts")
  }

  test("months(d) on DATE + identity second field compose") {
    val n = "tp_months"; val t = setup(n)
    sql(s"CREATE TABLE $t (d DATE, region STRING, v BIGINT) " +
      s"PARTITIONED BY (months(d), region)")
    sql(s"INSERT INTO $t VALUES " +
      "(date'2024-01-05', 'eu', 1), (date'2024-01-25', 'eu', 2), " +
      "(date'2024-02-10', 'eu', 3), (date'2024-01-07', 'us', 4)")
    // (2024-01, eu), (2024-02, eu), (2024-01, us) = 3 files
    assert(sql(s"SELECT * FROM gtest.default.`${n}$$files`").count() == 3)
    val parts = sql(s"SELECT partition FROM gtest.default.`${n}$$partitions` ORDER BY 1")
      .collect().map(_.getString(0)).toSeq
    assert(parts == Seq("months(d)=2024-01/region=eu",
      "months(d)=2024-01/region=us", "months(d)=2024-02/region=eu"),
      s"got $parts")
  }

  test("transform partitioning survives catalog reload (encoded form " +
      "persists) and rejects unknown transforms / wrong types loudly") {
    val n = "tp_reload"; val t = setup(n)
    sql(s"CREATE TABLE $t (id BIGINT, ts TIMESTAMP) " +
      s"PARTITIONED BY (days(ts))")
    sql(s"INSERT INTO $t VALUES (1, timestamp'2024-03-15 08:00:00')")
    val props = sql(s"SHOW TBLPROPERTIES $t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props("graft.partitioned_by") == "days(ts)")
    // wrong source type is loud at CREATE
    val e1 = intercept[Exception] {
      sql(s"CREATE TABLE ${t}_bad (id BIGINT) PARTITIONED BY (days(id))")
    }
    assert(e1.getMessage.contains("DATE/TIMESTAMP"),
      s"got ${e1.getMessage}")
    val e2 = intercept[Exception] {
      sql(s"CREATE TABLE ${t}_bad2 (s STRING) " +
        "PARTITIONED BY (truncate(0, s))")
    }
    assert(e2.getMessage.contains("width"), s"got ${e2.getMessage}")
  }

  test("hours(ts) and years(d) split and prune at table level") {
    val n = "tp_hours"; val t = setup(n)
    sql(s"CREATE TABLE $t (id BIGINT, ts TIMESTAMP) " +
      "PARTITIONED BY (hours(ts))")
    sql(s"""INSERT INTO $t SELECT id,
      timestamp'2024-03-15 06:00:00' +
        make_interval(0,0,0,0,0,0, id * 97 % 10800)
      FROM range(0, 120, 1, 1)""") // 3 hours of seconds
    assert(sql(s"SELECT count(*) FROM gtest.default.`${n}$$files`")
      .head().getLong(0) == 3)
    // count(*) over the hour-aligned range would be MANIFEST-served
    // (zero files, no scan node) — probe with a row read to see the
    // file-level pruning
    val oneHour = sql(s"SELECT id FROM $t WHERE " +
      "ts >= timestamp'2024-03-15 07:00:00' AND " +
      "ts < timestamp'2024-03-15 08:00:00'")
    assert(graftScanOf(oneHour).plannedFileCount == 1)
    assert(oneHour.count() > 0)
    val n2 = "tp_years"; val t2 = setup(n2)
    sql(s"CREATE TABLE $t2 (d DATE, v BIGINT) PARTITIONED BY (years(d))")
    sql(s"""INSERT INTO $t2 SELECT
      date_add(date'2023-06-01', CAST(id * 5 AS INT)), id
      FROM range(0, 180, 1, 1)""") // ~2.5 years -> 3 year buckets
    assert(sql(s"SELECT count(*) FROM gtest.default.`${n2}$$files`")
      .head().getLong(0) == 3)
    val parts = sql(s"SELECT partition FROM " +
      s"gtest.default.`${n2}$$partitions` ORDER BY 1").collect()
      .map(_.getString(0)).toSeq
    assert(parts == Seq("years(d)=2023", "years(d)=2024",
      "years(d)=2025"), s"got $parts")
  }

  private def pathsOf(n: String): Set[String] =
    sql(s"SELECT path FROM gtest.default.`${n}$$files`")
      .collect().map(_.getString(0)).toSet

  private def daysOf(n: String): Seq[String] =
    sql(s"SELECT partition FROM gtest.default.`${n}$$partitions` ORDER BY 1")
      .collect().map(_.getString(0)).toSeq

  test("row-level DML on a days(ts) CoW table: UPDATE/MERGE rewrite " +
      "ONLY the touched days' files, rewritten files stay day-keyed, " +
      "untouched days stay byte-identical") {
    val n = "tp_dml"; val t = setup(n)
    sql(s"CREATE TABLE $t (id BIGINT, ts TIMESTAMP, v DOUBLE) " +
      "PARTITIONED BY (days(ts))")
    sql(s"""INSERT INTO $t VALUES
      (1, timestamp'2024-03-15 08:00:00', 1.0),
      (2, timestamp'2024-03-15 09:00:00', 2.0),
      (3, timestamp'2024-03-16 10:00:00', 3.0),
      (4, timestamp'2024-03-17 11:00:00', 4.0)""")
    val seed = pathsOf(n)
    assert(seed.size == 3, s"3 day files expected, got $seed")
    // UPDATE one row of day 16: ONLY that day's file may be rewritten
    sql(s"UPDATE $t SET v = 30.0 WHERE id = 3")
    val afterUpd = pathsOf(n)
    assert(afterUpd.size == 3)
    assert((seed -- afterUpd).forall(_.nonEmpty) &&
      (seed & afterUpd).size == 2,
      s"exactly one file (day 16) rewritten; seed=$seed now=$afterUpd")
    assert(daysOf(n) == Seq("days(ts)=2024-03-15", "days(ts)=2024-03-16",
      "days(ts)=2024-03-17"), "rewritten file must stay day-keyed")
    // MERGE: update day 15, insert a NEW day 18 — days 16/17 untouched
    spark.sql(
      """SELECT * FROM VALUES
           (1, timestamp'2024-03-15 08:00:00', 100.0),
           (9, timestamp'2024-03-18 06:00:00', 9.0)
         AS src(id, ts, v)""").createOrReplaceTempView("tp_dml_src")
    sql(s"""MERGE INTO $t g USING tp_dml_src s ON g.id = s.id
            WHEN MATCHED THEN UPDATE SET v = s.v
            WHEN NOT MATCHED THEN INSERT (id, ts, v)
            VALUES (s.id, s.ts, s.v)""")
    val afterMerge = pathsOf(n)
    val kept16and17 = afterUpd & afterMerge
    assert(kept16and17.size == 2,
      s"days 16+17 must survive byte-identical; " +
        s"before=$afterUpd after=$afterMerge")
    assert(daysOf(n) == Seq("days(ts)=2024-03-15", "days(ts)=2024-03-16",
      "days(ts)=2024-03-17", "days(ts)=2024-03-18"))
    assert(sql(s"SELECT id, v FROM $t ORDER BY id").collect().toSeq ==
      Seq(Row(1L, 100.0), Row(2L, 2.0), Row(3L, 30.0), Row(4L, 4.0),
        Row(9L, 9.0)))
    // non-aligned DELETE (one row of day 15): rewrites only day 15
    sql(s"DELETE FROM $t WHERE id = 2")
    val afterRowDel = pathsOf(n)
    assert((afterMerge & afterRowDel).size == 3,
      "row-level DELETE may rewrite only day 15's file")
    assert(sql(s"SELECT count(*) FROM $t").head().getLong(0) == 4L)
  }

  test("day-aligned DELETE on a days(ts) table is METADATA-ONLY: the " +
      "day's file is dropped, no file is rewritten") {
    val n = "tp_mdel"; val t = setup(n)
    sql(s"CREATE TABLE $t (id BIGINT, ts TIMESTAMP, v DOUBLE) " +
      "PARTITIONED BY (days(ts))")
    sql(s"""INSERT INTO $t VALUES
      (1, timestamp'2024-03-15 08:00:00', 1.0),
      (2, timestamp'2024-03-16 09:00:00', 2.0),
      (3, timestamp'2024-03-17 10:00:00', 3.0)""")
    val seed = pathsOf(n)
    assert(seed.size == 3)
    sql(s"""DELETE FROM $t
            WHERE ts >= timestamp'2024-03-16 00:00:00'
              AND ts < timestamp'2024-03-17 00:00:00'""")
    val after = pathsOf(n)
    assert(after.subsetOf(seed) && after.size == 2,
      s"metadata delete must DROP day 16's file and write nothing " +
        s"new; seed=$seed after=$after")
    assert(daysOf(n) == Seq("days(ts)=2024-03-15", "days(ts)=2024-03-17"))
    assert(sql(s"SELECT id FROM $t ORDER BY id").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 3L))
  }

  test("MERGE on a days(ts) MOR table: deltas fold on read, compaction " +
      "re-splits per day and keeps the census exact") {
    val n = "tp_mor"; val t = setup(n)
    sql(s"CREATE TABLE $t (id BIGINT, ts TIMESTAMP, v DOUBLE) " +
      "PARTITIONED BY (days(ts)) " +
      "TBLPROPERTIES ('graft.mode'='mor', 'graft.row_id'='id')")
    sql(s"""INSERT INTO $t VALUES
      (1, timestamp'2024-03-15 08:00:00', 1.0),
      (2, timestamp'2024-03-16 09:00:00', 2.0),
      (3, timestamp'2024-03-17 10:00:00', 3.0)""")
    spark.sql(
      """SELECT * FROM VALUES
           (2, timestamp'2024-03-16 09:00:00', 20.0),
           (4, timestamp'2024-03-18 06:00:00', 4.0)
         AS src(id, ts, v)""").createOrReplaceTempView("tp_mor_src")
    sql(s"""MERGE INTO $t g USING tp_mor_src s ON g.id = s.id
            WHEN MATCHED THEN UPDATE SET v = s.v
            WHEN NOT MATCHED THEN INSERT (id, ts, v)
            VALUES (s.id, s.ts, s.v)""")
    sql(s"DELETE FROM $t WHERE id = 3")
    assert(sql(s"SELECT id, v FROM $t ORDER BY id").collect().toSeq ==
      Seq(Row(1L, 1.0), Row(2L, 20.0), Row(4L, 4.0)))
    sql(s"CALL gtest.system.compact('default.$n')")
    assert(sql(s"SELECT id, v FROM $t ORDER BY id").collect().toSeq ==
      Seq(Row(1L, 1.0), Row(2L, 20.0), Row(4L, 4.0)))
    assert(daysOf(n) == Seq("days(ts)=2024-03-15", "days(ts)=2024-03-16",
      "days(ts)=2024-03-18"), s"got ${daysOf(n)}")
    // hidden pruning still holds post-compaction
    val q = sql(s"SELECT v FROM $t WHERE " +
      "ts >= timestamp'2024-03-16 00:00:00' AND " +
      "ts < timestamp'2024-03-17 00:00:00'")
    assert(graftScanOf(q).plannedFileCount == 1)
  }

  test("identity partitioning unchanged: legacy behavior and SPJ " +
      "eligibility intact") {
    val n = "tp_ident"; val t = setup(n)
    sql(s"CREATE TABLE $t (k BIGINT, v STRING) PARTITIONED BY (k)")
    sql(s"INSERT INTO $t VALUES (1, 'a'), (2, 'b'), (1, 'c')")
    assert(sql(s"SELECT * FROM gtest.default.`${n}$$files`").count() == 2)
    val q = sql(s"SELECT v FROM $t WHERE k = 2")
    assert(graftScanOf(q).plannedFileCount == 1)
    val parts = sql(s"SELECT partition FROM gtest.default.`${n}$$partitions` ORDER BY 1")
      .collect().map(_.getString(0)).toSeq
    assert(parts == Seq("k=1", "k=2"), s"got $parts")
  }
}
