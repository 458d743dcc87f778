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
}
