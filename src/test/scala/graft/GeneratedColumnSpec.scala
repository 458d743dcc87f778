package graft

import org.apache.spark.sql.Row

/** GENERATED ALWAYS AS columns (q266): captured from Spark's v2
  * Column[] CREATE channel (the StructType fallback drops them),
  * validated at CREATE (resolution, determinism, exact type, no
  * chains), persisted in the schema metadata under Spark's own key,
  * and RECOMPUTED by every write.
  *
  * Pinned contracts: omitted values compute; explicit matching values
  * pass; explicit mismatching values reject loudly on user writes;
  * UPDATE of a source column recomputes the derived column (the
  * rewrite path does NOT enforce against carry-over staleness);
  * filters on the generated column prune files via its real stats;
  * CREATE-time rejects (unresolvable, non-deterministic, type
  * mismatch, chained, MOR/DV modes, identity columns); and the
  * definition's columns are evolution-locked. */
class GeneratedColumnSpec extends SparkSpec {

  private def sql(q: String) = spark.sql(q)

  private def init(): Unit =
    spark.conf.set("spark.sql.catalog.ggen",
      classOf[graft.catalog.GraftCatalog].getName)

  test("omitted generated columns compute on INSERT; explicit matches " +
      "pass; mismatches reject loudly") {
    init()
    sql("DROP TABLE IF EXISTS ggen.default.gen_ins")
    sql("""CREATE TABLE ggen.default.gen_ins
           (k BIGINT, price DOUBLE,
            cents BIGINT GENERATED ALWAYS AS (CAST(price * 100 AS BIGINT)))""")
    sql("INSERT INTO ggen.default.gen_ins (k, price) VALUES (1, 2.5)")
    // explicit MATCHING value is accepted
    sql("INSERT INTO ggen.default.gen_ins VALUES (2, 4.0, 400)")
    assert(sql("SELECT k, cents FROM ggen.default.gen_ins ORDER BY k")
      .collect().toSeq == Seq(Row(1L, 250L), Row(2L, 400L)))
    val e = intercept[Exception] {
      sql("INSERT INTO ggen.default.gen_ins VALUES (3, 1.0, 999)")
    }
    assert(e.getMessage != null &&
      (e.getMessage.contains("cannot be assigned") ||
        (e.getCause != null &&
          e.getCause.getMessage.contains("cannot be assigned"))),
      s"got ${e.getMessage}")
    // the failed insert committed nothing
    assert(sql("SELECT count(*) FROM ggen.default.gen_ins").head()
      .getLong(0) == 2L)
  }

  test("UPDATE of a source column recomputes the generated column") {
    init()
    sql("DROP TABLE IF EXISTS ggen.default.gen_upd")
    sql("""CREATE TABLE ggen.default.gen_upd
           (k BIGINT, price DOUBLE,
            cents BIGINT GENERATED ALWAYS AS (CAST(price * 100 AS BIGINT)))""")
    sql("INSERT INTO ggen.default.gen_upd (k, price) " +
      "SELECT id, CAST(id AS DOUBLE) FROM range(1, 5)")
    sql("UPDATE ggen.default.gen_upd SET price = price + 0.5 WHERE k = 2")
    assert(sql("SELECT k, cents FROM ggen.default.gen_upd ORDER BY k")
      .collect().toSeq ==
      Seq(Row(1L, 100L), Row(2L, 250L), Row(3L, 300L), Row(4L, 400L)))
    // MERGE through the same rewrite recomputes too
    spark.range(2, 4).selectExpr("id AS k", "CAST(id * 10 AS DOUBLE) AS p")
      .createOrReplaceTempView("gen_src")
    sql("""MERGE INTO ggen.default.gen_upd t USING gen_src s ON t.k = s.k
           WHEN MATCHED THEN UPDATE SET price = s.p""")
    assert(sql("SELECT k, cents FROM ggen.default.gen_upd ORDER BY k")
      .collect().toSeq ==
      Seq(Row(1L, 100L), Row(2L, 2000L), Row(3L, 3000L), Row(4L, 400L)))
  }

  test("generated-column stats are real: filters on it prune files") {
    init()
    sql("DROP TABLE IF EXISTS ggen.default.gen_prune")
    sql("""CREATE TABLE ggen.default.gen_prune
           (k BIGINT,
            dbl BIGINT GENERATED ALWAYS AS (k * 2))""")
    sql("INSERT INTO ggen.default.gen_prune (k) " +
      "SELECT /*+ REPARTITION(1) */ id FROM range(0, 10)")
    sql("INSERT INTO ggen.default.gen_prune (k) " +
      "SELECT /*+ REPARTITION(1) */ id FROM range(100, 110)")
    val before = graft.catalog.GraftStorage.fileOpens.get()
    assert(sql("SELECT count(*) FROM ggen.default.gen_prune " +
      "WHERE dbl >= 200").head().getLong(0) == 10L)
    val opened = graft.catalog.GraftStorage.fileOpens.get() - before
    assert(opened <= 1, s"stats on the generated column must prune: " +
      s"$opened files opened")
  }

  test("a DV UPDATE (delete + re-insert) and a MOR MERGE recompute " +
      "generated columns on the changed rows") {
    init()
    // DV: the re-insert lands in a new file with the RECOMPUTED value
    sql("DROP TABLE IF EXISTS ggen.default.gen_dv")
    sql("""CREATE TABLE ggen.default.gen_dv
           (k BIGINT, price DOUBLE,
            cents BIGINT GENERATED ALWAYS AS (CAST(price * 100 AS BIGINT)))
           TBLPROPERTIES ('graft.mode'='dv')""")
    sql("INSERT INTO ggen.default.gen_dv (k, price) " +
      "SELECT id, CAST(id AS DOUBLE) FROM range(1, 5)")
    sql("UPDATE ggen.default.gen_dv SET price = price + 0.5 WHERE k = 3")
    assert(sql("SELECT k, cents FROM ggen.default.gen_dv ORDER BY k")
      .collect().toSeq ==
      Seq(Row(1L, 100L), Row(2L, 200L), Row(3L, 350L), Row(4L, 400L)))
    // the equality-upsert path recomputes too (keys only, no scan)
    spark.sql("SELECT 2L AS k, 9.25 AS price")
      .writeTo("ggen.default.gen_dv")
      .option("graft.upsert_keys", "k").append()
    assert(sql("SELECT cents FROM ggen.default.gen_dv WHERE k = 2")
      .head().getLong(0) == 925L)
    // MOR: the MERGE's delta rows carry recomputed derived values
    sql("DROP TABLE IF EXISTS ggen.default.gen_mor")
    sql("""CREATE TABLE ggen.default.gen_mor
           (k BIGINT, price DOUBLE,
            cents BIGINT GENERATED ALWAYS AS (CAST(price * 100 AS BIGINT)))
           TBLPROPERTIES ('graft.mode'='mor', 'graft.row_id'='k')""")
    sql("INSERT INTO ggen.default.gen_mor (k, price) " +
      "SELECT id, CAST(id AS DOUBLE) FROM range(1, 5)")
    spark.sql("SELECT 2L AS k, 7.5 AS price UNION ALL SELECT 9L, 1.25")
      .createOrReplaceTempView("gen_mor_src")
    sql("""MERGE INTO ggen.default.gen_mor t USING gen_mor_src s
           ON t.k = s.k
           WHEN MATCHED THEN UPDATE SET price = s.price
           WHEN NOT MATCHED THEN INSERT (k, price) VALUES (s.k, s.price)""")
    assert(sql("SELECT k, cents FROM ggen.default.gen_mor ORDER BY k")
      .collect().toSeq ==
      Seq(Row(1L, 100L), Row(2L, 750L), Row(3L, 300L), Row(4L, 400L),
        Row(9L, 125L)))
    // compaction preserves the recomputed values
    sql("CALL ggen.system.compact('default.gen_mor')")
    assert(sql("SELECT cents FROM ggen.default.gen_mor WHERE k = 2")
      .head().getLong(0) == 750L)
  }

  test("a generated PARTITIONED BY column keeps value-pinned files " +
      "under DV DML: re-inserts split per computed value") {
    init()
    sql("DROP TABLE IF EXISTS ggen.default.gen_dvpart")
    sql("""CREATE TABLE ggen.default.gen_dvpart
           (k BIGINT, ts TIMESTAMP,
            yr INT GENERATED ALWAYS AS (CAST(year(ts) AS INT)))
           PARTITIONED BY (yr)
           TBLPROPERTIES ('graft.mode'='dv')""")
    sql("""INSERT INTO ggen.default.gen_dvpart (k, ts)
           SELECT id, CASE WHEN id % 2 = 0
                           THEN timestamp'2023-06-01 00:00:00'
                           ELSE timestamp'2024-06-01 00:00:00' END
           FROM range(0, 20)""")
    // UPDATE moves two rows across the partition axis: the re-inserts
    // must land value-pinned per COMPUTED year
    sql("""UPDATE ggen.default.gen_dvpart
           SET ts = timestamp'2025-06-01 00:00:00' WHERE k IN (0, 1)""")
    val pins = sql(
      """SELECT stats['yr'].min AS mn, stats['yr'].max AS mx
         FROM ggen.default.`gen_dvpart$files`""").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(pins.forall(f => f._1 == f._2),
      s"every file must stay value-pinned: ${pins.mkString(", ")}")
    assert(pins.exists(_._1 == "2025"), s"re-insert pinned to the " +
      s"computed year: ${pins.mkString(", ")}")
    assert(sql("SELECT count(*) FROM ggen.default.gen_dvpart " +
      "WHERE yr = 2025").head().getLong(0) == 2L)
    assert(sql("SELECT count(*) FROM ggen.default.gen_dvpart").head()
      .getLong(0) == 20L)
  }

  test("CREATE-time rejects: unresolvable, non-deterministic, type " +
      "mismatch, chained, generated MOR row id, identity") {
    init()
    def bad(ddl: String, msg: String): Unit = {
      sql("DROP TABLE IF EXISTS ggen.default.gen_bad")
      val e = intercept[Exception] { sql(ddl) }
      assert(e.getMessage != null && e.getMessage.contains(msg),
        s"expected '$msg', got ${e.getMessage}")
    }
    bad("""CREATE TABLE ggen.default.gen_bad (k BIGINT,
           g BIGINT GENERATED ALWAYS AS (nope + 1))""",
      "UNRESOLVED_COLUMN")
    bad("""CREATE TABLE ggen.default.gen_bad (k BIGINT,
           g DOUBLE GENERATED ALWAYS AS (rand()))""",
      "not deterministic") // Spark's own create-time validation fires
    bad("""CREATE TABLE ggen.default.gen_bad (k BIGINT,
           g INT GENERATED ALWAYS AS (k * 2))""",
      "incompatible with column data type") // Spark's own validation
    bad("""CREATE TABLE ggen.default.gen_bad (k BIGINT,
           g BIGINT GENERATED ALWAYS AS (k * 2),
           h BIGINT GENERATED ALWAYS AS (g + 1))""",
      "cannot reference another generated column") // Spark validates
    bad("""CREATE TABLE ggen.default.gen_bad (k BIGINT,
           g BIGINT GENERATED ALWAYS AS (k * 2))
           TBLPROPERTIES ('graft.mode'='mor', 'graft.row_id'='g')""",
      "must not be a generated column")
    bad("""CREATE TABLE ggen.default.gen_bad
           (k BIGINT GENERATED ALWAYS AS IDENTITY, v STRING)""",
      "identity column")
  }

  test("PARTITIONED BY a generated column: files pin the computed " +
      "value (the split uses the post-generation row) and filters on " +
      "it prune exactly") {
    init()
    sql("DROP TABLE IF EXISTS ggen.default.gen_part")
    sql("""CREATE TABLE ggen.default.gen_part
           (k BIGINT, ts TIMESTAMP,
            yr INT GENERATED ALWAYS AS (CAST(year(ts) AS INT)))
           PARTITIONED BY (yr)""")
    sql("""INSERT INTO ggen.default.gen_part (k, ts)
           SELECT id, CASE WHEN id % 2 = 0
                           THEN timestamp'2023-06-01 00:00:00'
                           ELSE timestamp'2024-06-01 00:00:00' END
           FROM range(0, 20)""")
    // one file per computed year, each pinned (min == max)
    val files = sql(
      """SELECT stats['yr'].min AS mn, stats['yr'].max AS mx
         FROM ggen.default.`gen_part$files`""").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(files.length == 2, s"one file per generated year: ${files.length}")
    assert(files.forall(f => f._1 == f._2), s"unpinned: ${files.mkString}")
    // partition census renders the computed values
    val census = sql(
      """SELECT partition, n_rows FROM ggen.default.`gen_part$partitions`
         ORDER BY partition""").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(census == Seq(("yr=2023", 10L), ("yr=2024", 10L)), s"$census")
    // equality on the generated partition column opens one file
    val before = graft.catalog.GraftStorage.fileOpens.get()
    assert(sql("SELECT count(*) FROM ggen.default.gen_part " +
      "WHERE yr = 2024").head().getLong(0) == 10L)
    assert(graft.catalog.GraftStorage.fileOpens.get() - before <= 1,
      "generated-partition pruning must open at most the matching file")
  }

  test("the generation definition's columns are evolution-locked; " +
      "the definition survives a cold reload") {
    init()
    sql("DROP TABLE IF EXISTS ggen.default.gen_evo")
    sql("""CREATE TABLE ggen.default.gen_evo
           (k BIGINT, v STRING,
            g BIGINT GENERATED ALWAYS AS (k * 2))""")
    val e1 = intercept[Exception] {
      sql("ALTER TABLE ggen.default.gen_evo RENAME COLUMN k TO kk")
    }
    assert(e1.getMessage.contains("layout") ||
      e1.getMessage.contains("protected") ||
      e1.getMessage.toLowerCase.contains("cannot"), e1.getMessage)
    val e2 = intercept[Exception] {
      sql("ALTER TABLE ggen.default.gen_evo DROP COLUMN g")
    }
    assert(e2.getMessage != null, e2.getMessage)
    // unreferenced columns still evolve
    sql("ALTER TABLE ggen.default.gen_evo RENAME COLUMN v TO w")
    // cold reload: the metadata-borne definition still computes
    sql("INSERT INTO ggen.default.gen_evo (k, w) VALUES (3, 'x')")
    graft.catalog.GraftCatalog.dropHandlesForTest()
    sql("INSERT INTO ggen.default.gen_evo (k, w) VALUES (4, 'y')")
    assert(sql("SELECT k, g FROM ggen.default.gen_evo ORDER BY k")
      .collect().toSeq == Seq(Row(3L, 6L), Row(4L, 8L)))
  }
}
