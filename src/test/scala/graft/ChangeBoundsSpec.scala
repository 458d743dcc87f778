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
}
