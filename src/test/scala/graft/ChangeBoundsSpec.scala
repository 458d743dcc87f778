package graft

/** Version-bounded incremental reads of the `$changes` companion
  * ([[graft.catalog.GraftChangeBounds]], q262): `from_version`
  * (exclusive) / `to_version` (inclusive) slice the change ledger by
  * the commit-version stamps recorded at delta commit time.
  *
  * Pinned contracts: exact (a, b] slicing, from-only and to-only
  * bounds, loud refusal of a future to_version / inverted bounds /
  * version bounds on a STREAMING read, and the retention fence — a
  * from_version at or below the highest trimmed version rejects
  * instead of silently missing trimmed changes. */
class ChangeBoundsSpec extends SparkSpec {

  private def sql(q: String) = spark.sql(q)

  private def setup(name: String, props: String = ""): String = {
    spark.conf.set("spark.sql.catalog.gcb",
      classOf[graft.catalog.GraftCatalog].getName)
    val t = s"gcb.default.$name"
    sql(s"DROP TABLE IF EXISTS $t")
    val extra = if (props.isEmpty) "" else s", $props"
    sql(s"""CREATE TABLE $t (k BIGINT, v DOUBLE)
            TBLPROPERTIES ('graft.mode'='mor', 'graft.row_id'='k'$extra)""")
    sql(s"INSERT INTO $t VALUES (1, 10.0), (2, 20.0), (3, 30.0)") // v0
    sql(s"UPDATE $t SET v = v + 1.0 WHERE k = 1")                 // v1
    sql(s"DELETE FROM $t WHERE k = 2")                            // v2
    sql(s"UPDATE $t SET v = v + 100.0 WHERE k = 3")               // v3
    t
  }

  private def feedName(t: String): String = {
    val i = t.lastIndexOf('.')
    s"${t.take(i)}.`${t.drop(i + 1)}$$changes`"
  }

  private def bounded(t: String, from: Option[Int], to: Option[Int]) = {
    var r = spark.read
    from.foreach(f => r = r.option("from_version", f.toString))
    to.foreach(x => r = r.option("to_version", x.toString))
    r.table(feedName(t))
  }

  test("(a, b] slices exactly: from exclusive, to inclusive") {
    val t = setup("cb_slice")
    // (0, 1] = the v1 update only
    assert(bounded(t, Some(0), Some(1)).collect().map(r =>
      (r.getInt(0), r.getLong(1))).toSeq == Seq((1, 1L)))
    // (1, 3] = the v2 delete + the v3 update
    assert(bounded(t, Some(1), Some(3)).orderBy("`__id`").collect().map(r =>
      (r.getInt(0), r.getLong(1))).toSeq == Seq((2, 2L), (1, 3L)))
    // from-only: everything after v2
    assert(bounded(t, Some(2), None).collect().map(_.getLong(1)).toSeq ==
      Seq(3L))
    // to-only on an untrimmed ledger: everything up to v1
    assert(bounded(t, None, Some(1)).collect().map(_.getLong(1)).toSeq ==
      Seq(1L))
    // unbounded stays the whole-window batch read
    assert(bounded(t, None, None).count() == 3L)
  }

  test("future to_version, inverted bounds, and bounded streaming " +
      "reject loudly") {
    val t = setup("cb_reject")
    val e1 = intercept[Exception] { bounded(t, Some(0), Some(9)).collect() }
    assert(e1.getMessage.contains("beyond the current version"),
      s"got ${e1.getMessage}")
    val e2 = intercept[Exception] { bounded(t, Some(3), Some(1)).collect() }
    assert(e2.getMessage.contains("must be <="), s"got ${e2.getMessage}")
    val ckpt = java.nio.file.Files.createTempDirectory("cb-ckpt-").toString
    val e3 = intercept[Exception] {
      val q = spark.readStream.option("from_version", "0")
        .table(feedName(t))
        .writeStream.format("noop")
        .option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
    }
    assert(e3.getMessage != null && (e3.getMessage.contains("batch reads") ||
      e3.getCause != null), s"got ${e3.getMessage}")
  }

  test("retention fence: a from_version at or below the trimmed " +
      "high-water mark rejects; above it still serves") {
    // append_retain=1 keeps ONE ledger entry: after v2 commits, v1's
    // entry is trimmed and changeTrimVer records version 1
    spark.conf.set("spark.sql.catalog.gcb",
      classOf[graft.catalog.GraftCatalog].getName)
    val t = "gcb.default.cb_trim"
    sql(s"DROP TABLE IF EXISTS $t")
    sql(s"""CREATE TABLE $t (k BIGINT, v DOUBLE)
            TBLPROPERTIES ('graft.mode'='mor', 'graft.row_id'='k',
                           'graft.append_retain'='1')""")
    sql(s"INSERT INTO $t VALUES (1, 10.0), (2, 20.0)")  // v0
    sql(s"UPDATE $t SET v = v + 1.0 WHERE k = 1")       // v1 (trimmed)
    sql(s"UPDATE $t SET v = v + 1.0 WHERE k = 2")       // v2 (retained)
    val e = intercept[Exception] {
      bounded(t, Some(0), Some(2)).collect()
    }
    assert(e.getMessage.contains("retained change window"),
      s"got ${e.getMessage}")
    // from_version at the fence: the range (1, 2] is fully retained
    assert(bounded(t, Some(1), Some(2)).collect().map(_.getLong(1)).toSeq ==
      Seq(2L))
    // to-only without from on a trimmed ledger is equally unprovable
    val e2 = intercept[Exception] { bounded(t, None, Some(2)).collect() }
    assert(e2.getMessage.contains("from_version"), s"got ${e2.getMessage}")
  }

  private def boundedTs(t: String, from: Option[Long], to: Option[Long]) = {
    var r = spark.read
    from.foreach(f => r = r.option("from_timestamp", f.toString))
    to.foreach(x => r = r.option("to_timestamp", x.toString))
    r.table(feedName(t))
  }

  test("timestamp bounds resolve through the commit-time axis and " +
      "slice exactly like the equivalent version bounds") {
    spark.conf.set("spark.sql.catalog.gcb",
      classOf[graft.catalog.GraftCatalog].getName)
    val t = "gcb.default.cb_ts"
    sql(s"DROP TABLE IF EXISTS $t")
    sql(s"""CREATE TABLE $t (k BIGINT, v DOUBLE)
            TBLPROPERTIES ('graft.mode'='mor', 'graft.row_id'='k')""")
    def tick(): Long = { Thread.sleep(3); System.currentTimeMillis() }
    val t_pre = tick()
    sql(s"INSERT INTO $t VALUES (1, 10.0), (2, 20.0), (3, 30.0)") // v0
    val t_v0 = tick()
    sql(s"UPDATE $t SET v = v + 1.0 WHERE k = 1")                 // v1
    val t_v1 = tick()
    sql(s"DELETE FROM $t WHERE k = 2")                            // v2
    val t_v2 = tick()
    // (t_v0, t_v1] = the v1 update only — same slice as (0, 1]
    assert(boundedTs(t, Some(t_v0), Some(t_v1)).collect().map(r =>
      (r.getInt(0), r.getLong(1))).toSeq == Seq((1, 1L)))
    // from-only: everything after t_v1 = the v2 delete
    assert(boundedTs(t, Some(t_v1), None).collect().map(r =>
      (r.getInt(0), r.getLong(1))).toSeq == Seq((2, 2L)))
    // an instant before every commit on a COMPLETE ledger means "from
    // the beginning"
    assert(boundedTs(t, Some(t_pre), Some(t_v2)).count() == 2L)
    // ISO-8601 spelling parses (far future instant: full window)
    assert(spark.read.option("from_timestamp", t_pre.toString)
      .option("to_timestamp", "2099-01-01T00:00:00Z")
      .table(feedName(t)).count() == 2L)
    // mixing the version and timestamp axes refuses
    val e = intercept[Exception] {
      spark.read.option("from_version", "0")
        .option("to_timestamp", t_v2.toString)
        .table(feedName(t)).collect()
    }
    assert(e.getMessage.contains("ONE of them"), s"got ${e.getMessage}")
    // garbage timestamp refuses with the spelling contract
    val e2 = intercept[Exception] {
      spark.read.option("from_timestamp", "yesterday")
        .table(feedName(t)).collect()
    }
    assert(e2.getMessage.contains("ISO-8601"), s"got ${e2.getMessage}")
  }

  test("timestamp bounds refuse when the instant predates the " +
      "retained snapshot window of a trimmed table; DV feeds take " +
      "timestamp bounds too") {
    spark.conf.set("spark.sql.catalog.gcb",
      classOf[graft.catalog.GraftCatalog].getName)
    // retain=2 keeps two snapshots: after 3 commits the first is gone
    val t = "gcb.default.cb_ts_trim"
    sql(s"DROP TABLE IF EXISTS $t")
    sql(s"""CREATE TABLE $t (k BIGINT, v DOUBLE)
            TBLPROPERTIES ('graft.mode'='mor', 'graft.row_id'='k',
                           'graft.retain'='2')""")
    val t_pre = System.currentTimeMillis() - 1
    sql(s"INSERT INTO $t VALUES (1, 10.0), (2, 20.0)")  // v0
    sql(s"UPDATE $t SET v = v + 1.0 WHERE k = 1")       // v1
    sql(s"UPDATE $t SET v = v + 1.0 WHERE k = 2")       // v2
    val e = intercept[Exception] {
      boundedTs(t, Some(t_pre), None).collect()
    }
    assert(e.getMessage.contains("predates the retained snapshot"),
      s"got ${e.getMessage}")
    // DV feed: the same bounds machinery serves the id-less ledger
    val dv = "gcb.default.cb_ts_dv"
    sql(s"DROP TABLE IF EXISTS $dv")
    sql(s"CREATE TABLE $dv (k BIGINT, v STRING) TBLPROPERTIES " +
      "('graft.mode'='dv')")
    sql(s"INSERT INTO $dv SELECT id, concat('x', id) FROM range(0, 6)")
    Thread.sleep(3)
    val mid = System.currentTimeMillis()
    Thread.sleep(3)
    sql(s"DELETE FROM $dv WHERE k % 2 = 1")
    val dels = boundedTs(dv, Some(mid), None).collect()
    assert(dels.map(_.getLong(2)).sorted.toSeq == Seq(1L, 3L, 5L),
      dels.mkString(", "))
  }
}
