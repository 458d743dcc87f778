package graft

/** Composed layout pruning (q244): z-order/cluster SPANS and per-file
  * BLOOM filters are independent skip axes and a scan applies both —
  * a file survives only if its clustered-column span admits the range
  * AND its bloom admits the point value. */
class ZorderBloomComposeSpec extends SparkSpec {

  private def sql(q: String) = spark.sql(q)

  private def opens(body: => Unit): Long = {
    val before = graft.catalog.GraftStorage.fileOpens.get()
    body
    graft.catalog.GraftStorage.fileOpens.get() - before
  }

  test("range x point: both mechanisms prune, composed scan opens " +
      "only the intersection") {
    spark.conf.set("spark.sql.catalog.gzb",
      classOf[graft.catalog.GraftCatalog].getName)
    sql("DROP TABLE IF EXISTS gzb.default.zb")
    sql("""CREATE TABLE gzb.default.zb (ck BIGINT, price DOUBLE, id BIGINT)
           TBLPROPERTIES ('graft.zorder_by'='ck,price',
                          'graft.bloom_by'='id')""")
    // four ck-sliced inserts -> 4 files with disjoint ck spans; ids are
    // high-cardinality and UNCLUSTERED (hash-spread), so only the bloom
    // can prune a point lookup on them
    spark.range(4000).selectExpr("id % 400 AS ck",
        "CAST(id % 97 AS DOUBLE) AS price", "id * 2654435761 % 1000003 AS id")
      .createOrReplaceTempView("zb_src")
    (0 until 4).foreach { i =>
      sql(s"""INSERT INTO gzb.default.zb SELECT * FROM zb_src
              WHERE ck >= ${i * 100} AND ck < ${(i + 1) * 100}""")
    }
    val nFiles = sql("SELECT count(*) FROM gzb.default.`zb$files`")
      .head().getLong(0)
    assert(nFiles >= 4, s"need a multi-file layout: $nFiles")
    // one real id that lives in the ck < 100 tile
    val probe = sql(
      "SELECT id, ck FROM gzb.default.zb WHERE ck = 50 LIMIT 1").head()
    val (pid, pck) = (probe.getLong(0), probe.getLong(1))

    // span-only: ck range hits one tile
    val nRange = opens {
      assert(sql(s"""SELECT count(*) FROM gzb.default.zb
                     WHERE ck BETWEEN 100 AND 199""").head().getLong(0) > 0)
    }
    assert(nRange <= 2, s"ck-range opened $nRange of $nFiles")
    // bloom-only: point id opens only files whose bloom admits it
    val nPoint = opens {
      assert(sql(s"SELECT count(*) FROM gzb.default.zb WHERE id = $pid")
        .head().getLong(0) >= 1)
    }
    assert(nPoint < nFiles, s"bloom never pruned: $nPoint of $nFiles")
    // composed: range AND point -> intersection only
    val nBoth = opens {
      assert(sql(s"""SELECT count(*) FROM gzb.default.zb
                     WHERE ck BETWEEN ${pck - 5} AND ${pck + 5}
                       AND id = $pid""").head().getLong(0) >= 1)
    }
    assert(nBoth <= math.min(nRange, nPoint),
      s"composed ($nBoth) must open no more than either axis " +
        s"(range $nRange, point $nPoint)")
    // absent id beyond every bloom AND inside a valid range: zero opens
    val nMiss = opens {
      assert(sql(s"""SELECT count(*) FROM gzb.default.zb
                     WHERE ck BETWEEN 0 AND 399 AND id = -1""")
        .head().getLong(0) == 0)
    }
    assert(nMiss == 0, s"absent point opened $nMiss files")
  }
}
