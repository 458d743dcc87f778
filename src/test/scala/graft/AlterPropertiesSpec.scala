package graft

/** ALTER TABLE SET/UNSET TBLPROPERTIES for the tunable graft knobs —
  * previously a silent no-op. Tunables apply to FUTURE writes and
  * persist in the warehouse index; structural knobs reject loudly. */
class AlterPropertiesSpec extends SparkSpec {

  private def sql(q: String) = spark.sql(q)

  private def setup(): Unit =
    spark.conf.set("spark.sql.catalog.gprop",
      classOf[graft.catalog.GraftCatalog].getName)

  private def props(t: String): Map[String, String] = {
    import scala.jdk.CollectionConverters._
    spark.sessionState.catalogManager.catalog("gprop")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("default"), t))
      .properties().asScala.toMap
  }

  test("setting graft.bloom_by post-CREATE blooms FUTURE files and " +
      "they prune; pre-existing files stay bloom-less but correct") {
    setup()
    sql("DROP TABLE IF EXISTS gprop.default.bp")
    sql("CREATE TABLE gprop.default.bp (k BIGINT, v STRING)")
    sql("INSERT INTO gprop.default.bp SELECT id * 37 % 1009, 'old' " +
      "FROM range(500)")
    sql("ALTER TABLE gprop.default.bp SET TBLPROPERTIES " +
      "('graft.bloom_by' = 'k')")
    assert(props("bp").get("graft.bloom_by").contains("k"))
    sql("INSERT INTO gprop.default.bp SELECT id * 41 % 2003 + 10000, " +
      "'new' FROM range(500)")
    // a point miss INSIDE the new file's span (so only the bloom can
    // prune it): the new file is bloom-pruned, the old file (no bloom,
    // wide span) still opens
    val present = (0 until 500).map(i => 41L * i % 2003L).toSet
    val probe = 10000L + (0L until 2003L).find(!present.contains(_)).get
    val before = graft.catalog.GraftStorage.fileOpens.get()
    assert(sql(s"SELECT count(*) FROM gprop.default.bp WHERE k = $probe")
      .head().getLong(0) == 0)
    val opens = graft.catalog.GraftStorage.fileOpens.get() - before
    assert(opens <= 1, s"bloom on the new file did not prune: $opens")
    assert(sql("SELECT count(*) FROM gprop.default.bp")
      .head().getLong(0) == 1000)
  }

  test("graft.target_file_bytes set + unset round-trips the handle and " +
      "the index; survives a cold load") {
    setup()
    sql("DROP TABLE IF EXISTS gprop.default.tb")
    sql("CREATE TABLE gprop.default.tb (k BIGINT)")
    sql("ALTER TABLE gprop.default.tb SET TBLPROPERTIES " +
      "('graft.target_file_bytes' = '1048576')")
    assert(props("tb").get("graft.target_file_bytes").contains("1048576"))
    graft.catalog.GraftCatalog.dropHandlesForTest()
    assert(props("tb").get("graft.target_file_bytes").contains("1048576"),
      "tunable did not persist across a cold load")
    sql("ALTER TABLE gprop.default.tb UNSET TBLPROPERTIES " +
      "('graft.target_file_bytes')")
    assert(!props("tb").contains("graft.target_file_bytes"))
  }

  test("setting graft.sort_by post-CREATE clusters future writes " +
      "(new files carry narrow spans); old content intact") {
    setup()
    sql("DROP TABLE IF EXISTS gprop.default.sb")
    sql("CREATE TABLE gprop.default.sb (k BIGINT, v BIGINT)")
    sql("INSERT INTO gprop.default.sb SELECT id, id FROM range(1000)")
    sql("ALTER TABLE gprop.default.sb SET TBLPROPERTIES " +
      "('graft.sort_by' = 'k')")
    sql("INSERT INTO gprop.default.sb SELECT id + 5000, id FROM range(1000)")
    assert(sql("SELECT count(*) FROM gprop.default.sb")
      .head().getLong(0) == 2000)
    assert(sql("SELECT count(*) FROM gprop.default.sb WHERE k >= 5000")
      .head().getLong(0) == 1000)
  }

  test("structural knobs and unknown graft keys reject loudly; " +
      "non-graft keys stay accepted") {
    setup()
    sql("DROP TABLE IF EXISTS gprop.default.fz")
    sql("CREATE TABLE gprop.default.fz (k BIGINT)")
    assert(intercept[Exception](sql(
      "ALTER TABLE gprop.default.fz SET TBLPROPERTIES " +
        "('graft.mode' = 'mor')")) != null)
    assert(intercept[Exception](sql(
      "ALTER TABLE gprop.default.fz SET TBLPROPERTIES " +
        "('graft.bucket_by' = 'k,8')")) != null)
    assert(intercept[Exception](sql(
      "ALTER TABLE gprop.default.fz SET TBLPROPERTIES " +
        "('graft.nonsense' = '1')")) != null)
    assert(intercept[Exception](sql(
      "ALTER TABLE gprop.default.fz SET TBLPROPERTIES " +
        "('graft.sort_by' = 'nope')")) != null)
    // non-graft keys don't error (Spark internals/comments)
    sql("ALTER TABLE gprop.default.fz SET TBLPROPERTIES ('team' = 'x')")
  }
}
