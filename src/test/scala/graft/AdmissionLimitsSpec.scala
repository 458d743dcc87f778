package graft

/** maxRowsPerTrigger / maxBytesPerTrigger on the catalog streams
  * (VERDICT r12 item 8): the ledger's exact per-file row/byte counts
  * bound each micro-batch, with the at-least-one-file progress
  * guarantee; composite limits take the tightest cap. */
class AdmissionLimitsSpec extends SparkSpec {

  private def sql(q: String) = spark.sql(q)

  private def seed(name: String): Unit = {
    spark.conf.set("spark.sql.catalog.gadm",
      classOf[graft.catalog.GraftCatalog].getName)
    sql(s"DROP TABLE IF EXISTS gadm.default.$name")
    sql(s"CREATE TABLE gadm.default.$name (k BIGINT)")
    // six commits, one file each, 10 rows per file
    (0 until 6).foreach { i =>
      spark.range(i * 10, (i + 1) * 10).coalesce(1)
        .createOrReplaceTempView("adm_src")
      sql(s"INSERT INTO gadm.default.$name SELECT id FROM adm_src")
    }
  }

  private def batches(name: String,
      options: Map[String, String]): Seq[(Long, Long)] = {
    val ckpt = java.nio.file.Files
      .createTempDirectory("adm-ckpt-").toString
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var r = spark.readStream
    options.foreach { case (k, v) => r = r.option(k, v) }
    r.table(s"gadm.default.$name")
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        val n = b.count()
        out.synchronized { out += ((id, n)): Unit }
      }
      .start().awaitTermination()
    out.sortBy(_._1).toSeq
  }

  test("maxRowsPerTrigger bounds each micro-batch by ledger row counts") {
    seed("rows")
    // 6 files x 10 rows, cap 20 rows -> exactly three 20-row batches
    val bs = batches("rows", Map("maxRowsPerTrigger" -> "20"))
    assert(bs.map(_._2) == Seq(20L, 20L, 20L), s"batches: $bs")
    // a cap SMALLER than one file still admits one file per batch
    // (progress guarantee): six 10-row batches
    seed("rows")
    val bs2 = batches("rows", Map("maxRowsPerTrigger" -> "3"))
    assert(bs2.map(_._2) == Seq.fill(6)(10L), s"batches: $bs2")
  }

  test("maxBytesPerTrigger bounds batches by exact recorded file bytes") {
    seed("bytes")
    val t = spark.sessionState.catalogManager.catalog("gadm")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("default"), "bytes"))
      .asInstanceOf[graft.catalog.GraftTable]
    val sizes = t.stateNow.appendLog.map(_.bytes)
    assert(sizes.forall(_ > 0), s"files must record bytes: $sizes")
    // cap = two files' worth -> three 2-file batches (files are
    // near-identical single-partition parquet, so uniform size)
    val cap = sizes(0) + sizes(1)
    val bs = batches("bytes", Map("maxBytesPerTrigger" -> cap.toString))
    assert(bs.size == 3 && bs.map(_._2).sum == 60L, s"batches: $bs")
    assert(bs.map(_._2).forall(_ == 20L), s"uneven byte batches: $bs")
  }

  test("composite: maxFiles + maxRows takes the tighter cap") {
    seed("comp")
    // maxFiles=3 (30 rows) vs maxRows=10 (1 file): rows wins
    val bs = batches("comp",
      Map("maxFilesPerTrigger" -> "3", "maxRowsPerTrigger" -> "10"))
    assert(bs.map(_._2) == Seq.fill(6)(10L), s"batches: $bs")
    // maxFiles=1 vs maxRows=100: files wins
    seed("comp")
    val bs2 = batches("comp",
      Map("maxFilesPerTrigger" -> "1", "maxRowsPerTrigger" -> "100"))
    assert(bs2.map(_._2) == Seq.fill(6)(10L), s"batches: $bs2")
  }

  test("the MOR change feed honors row-bounded admission too") {
    spark.conf.set("spark.sql.catalog.gadm",
      classOf[graft.catalog.GraftCatalog].getName)
    sql("DROP TABLE IF EXISTS gadm.default.cfadm")
    sql("""CREATE TABLE gadm.default.cfadm (k BIGINT, v STRING)
           TBLPROPERTIES ('graft.mode'='mor', 'graft.row_id'='k')""")
    sql("INSERT INTO gadm.default.cfadm VALUES (1,'a'),(2,'b'),(3,'c')")
    // three single-row delta commits
    (1 to 3).foreach(k =>
      sql(s"UPDATE gadm.default.cfadm SET v = 'u$k' WHERE k = $k"))
    val ckpt = java.nio.file.Files
      .createTempDirectory("adm-cf-").toString
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    spark.readStream
      .option("maxRowsPerTrigger", "1")
      .table("gadm.default.`cfadm$changes`")
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val n = b.count()
        out.synchronized { out += n: Unit }
      }
      .start().awaitTermination()
    assert(out.toSeq == Seq.fill(3)(1L), s"change-feed batches: $out")
  }

  test("admission limits compose with hidden-partition sinks: bounded " +
      "batches still land one file per day (VERDICT r13 item 9)") {
    spark.conf.set("spark.sql.catalog.gadm",
      classOf[graft.catalog.GraftCatalog].getName)
    // source: 3 commits x 20 rows spanning 3 days (id % 3 picks the day)
    sql("DROP TABLE IF EXISTS gadm.default.hp_src")
    sql("CREATE TABLE gadm.default.hp_src (id BIGINT, ts TIMESTAMP, " +
      "value DOUBLE)")
    (0 until 3).foreach { i =>
      spark.range(i * 20, (i + 1) * 20).selectExpr("id",
        "timestamp'2024-03-15 06:00:00' + make_interval(0,0,0," +
          "CAST(id % 3 AS INT),0,0,0) AS ts",
        "CAST(id AS DOUBLE) / 4.0 AS value")
        .coalesce(1).createOrReplaceTempView("hp_src_batch")
      sql("INSERT INTO gadm.default.hp_src SELECT * FROM hp_src_batch")
    }
    sql("DROP TABLE IF EXISTS gadm.default.hp_tgt")
    sql("""CREATE TABLE gadm.default.hp_tgt
           (id BIGINT, ts TIMESTAMP, value DOUBLE)
           PARTITIONED BY (days(ts))""")
    val ckpt = java.nio.file.Files
      .createTempDirectory("adm-hp-").toString
    // row cap = one source file -> exactly 3 bounded micro-batches,
    // each writing its 20 rows split across the 3 touched days
    spark.readStream
      .option("maxRowsPerTrigger", "20")
      .table("gadm.default.hp_src")
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .toTable("gadm.default.hp_tgt")
      .awaitTermination()
    // 3 batches x 3 days = 9 files, every one day-pinned
    // ts stats are raw epoch-microsecond strings
    val files = sql(
      """SELECT CAST(timestamp_micros(CAST(stats['ts'].min AS BIGINT))
                  AS DATE) AS dmin,
                CAST(timestamp_micros(CAST(stats['ts'].max AS BIGINT))
                  AS DATE) AS dmax
         FROM gadm.default.`hp_tgt$files`""").collect()
    assert(files.length == 9, s"expected 3 batches x 3 days: ${files.length}")
    assert(files.forall(r => r.get(0) == r.get(1)),
      s"every file must be day-pinned: ${files.mkString(", ")}")
    // the census equals the per-day recompute
    val census = sql(
      """SELECT partition, n_rows
         FROM gadm.default.`hp_tgt$partitions` ORDER BY partition""")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val expect = sql(
      """SELECT concat('days(ts)=', CAST(CAST(ts AS DATE) AS STRING)),
                COUNT(*) FROM gadm.default.hp_src GROUP BY 1 ORDER BY 1""")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(census == expect, s"census $census != recompute $expect")
    assert(census.map(_._2).sum == 60L)
  }
}
