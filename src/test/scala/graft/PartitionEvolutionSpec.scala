package graft

import org.apache.spark.sql.Row

/** Partition-spec evolution (`ALTER TABLE ... SET TBLPROPERTIES
  * ('graft.partitioned_by' = ...)`) — Iceberg's ADD/REPLACE PARTITION
  * FIELD through the retuning surface. Pinned contracts:
  *   - future writes split by the NEW spec, old files stay
  *     byte-identical and keep pruning through stats;
  *   - spec-sensitive ops on MIXED layouts are loud, never lossy:
  *     dynamic overwrite over an un-pinned (pre-spec) file REFUSES
  *     with a compact-first error — keying it by its min would have
  *     silently dropped every other partition's rows in that file;
  *   - system.compact re-splits the whole table under the new spec,
  *     after which dynamic overwrite works;
  *   - wrong column/type and bucket-exclusivity stay loud. */
class PartitionEvolutionSpec extends SparkSpec {

  private def sql(q: String) = spark.sql(q)

  private def setup(name: String): String = {
    spark.conf.set("spark.sql.catalog.gpe",
      classOf[graft.catalog.GraftCatalog].getName)
    val t = s"gpe.default.$name"
    sql(s"DROP TABLE IF EXISTS $t")
    t
  }

  private def nFiles(name: String): Long =
    sql(s"SELECT count(*) FROM gpe.default.`$name$$files`").head().getLong(0)

  test("retune to days(ts): new writes split per day, old files keep " +
      "serving; compact re-splits everything; dynamic overwrite is " +
      "loud before, works after") {
    val t = setup("pe_days")
    sql(s"CREATE TABLE $t (id BIGINT, ts TIMESTAMP, v DOUBLE)")
    // month 1 lands as ONE unsplit file (unpartitioned table)
    sql(s"""INSERT INTO $t SELECT id,
      timestamp'2024-01-01 00:00:00' +
        make_interval(0,0,0,0,0,0, id * 1733 % 172800),
      cast(id AS double) FROM range(0, 200, 1, 1)""")
    assert(nFiles("pe_days") == 1)
    sql(s"ALTER TABLE $t SET TBLPROPERTIES " +
      "('graft.partitioned_by' = 'days(ts)')")
    // month 2 splits one file per day (2 days of seconds)
    sql(s"""INSERT INTO $t SELECT 1000 + id,
      timestamp'2024-02-01 00:00:00' +
        make_interval(0,0,0,0,0,0, id * 1733 % 172800),
      cast(id AS double) FROM range(0, 200, 1, 1)""")
    assert(nFiles("pe_days") == 3, s"got ${nFiles("pe_days")}")
    assert(sql(s"SELECT count(*) FROM $t").head().getLong(0) == 400L)
    // dynamic overwrite touching the OLD unsplit file's span: loud
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      val e = intercept[Exception] {
        sql(s"INSERT OVERWRITE $t VALUES " +
          "(9, timestamp'2024-01-01 05:00:00', 9.0)")
      }
      assert(e.getMessage.contains("compact"), s"got ${e.getMessage}")
      assert(sql(s"SELECT count(*) FROM $t").head().getLong(0) == 400L,
        "refused overwrite must not lose rows")
      // compact re-splits the old file under the new spec
      sql("CALL gpe.system.compact('default.pe_days')")
      assert(nFiles("pe_days") == 4, s"got ${nFiles("pe_days")}")
      sql(s"INSERT OVERWRITE $t VALUES " +
        "(9, timestamp'2024-01-01 05:00:00', 9.0)")
    } finally spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    // day 2024-01-01 now holds exactly the overwrite row; other days keep
    val counts = sql(s"""SELECT CAST(ts AS DATE) AS d, count(*) AS n
      FROM $t GROUP BY 1 ORDER BY d""").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1))).toSeq
    assert(counts == Seq(("2024-01-01", 1L), ("2024-01-02", 100L),
      ("2024-02-01", 100L), ("2024-02-02", 100L)), s"got $counts")
  }

  test("identity evolution cannot lose rows: overwrite keyed over an " +
      "unsplit file refuses instead of dropping the file's other keys") {
    val t = setup("pe_ident")
    sql(s"CREATE TABLE $t (k STRING, n BIGINT)")
    // ONE task -> one genuinely unsplit file spanning all three keys
    sql(s"""INSERT INTO $t SELECT chr(97 + CAST(id AS INT)), id + 1
      FROM range(0, 3, 1, 1)""")
    assert(nFiles("pe_ident") == 1)
    sql(s"ALTER TABLE $t SET TBLPROPERTIES " +
      "('graft.partitioned_by' = 'k')")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      val e = intercept[Exception] {
        sql(s"INSERT OVERWRITE $t VALUES ('a', 99)")
      }
      assert(e.getMessage.contains("compact"), s"got ${e.getMessage}")
      assert(sql(s"SELECT count(*) FROM $t").head().getLong(0) == 3L)
      sql("CALL gpe.system.compact('default.pe_ident')")
      sql(s"INSERT OVERWRITE $t VALUES ('a', 99)")
      assert(sql(s"SELECT k, n FROM $t ORDER BY k").collect().toSeq ==
        Seq(Row("a", 99L), Row("b", 2L), Row("c", 3L)))
    } finally spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
  }

  test("rejects stay loud: unknown column, wrong transform type, " +
      "bucket exclusivity; UNSET drops the spec") {
    val t = setup("pe_rej")
    sql(s"CREATE TABLE $t (id BIGINT, s STRING)")
    assert(intercept[Exception](sql(s"ALTER TABLE $t SET TBLPROPERTIES " +
      "('graft.partitioned_by' = 'days(nope)')")) != null)
    assert(intercept[Exception](sql(s"ALTER TABLE $t SET TBLPROPERTIES " +
      "('graft.partitioned_by' = 'days(id)')")).getMessage
      .contains("DATE/TIMESTAMP"))
    val b = setup("pe_rej_b")
    sql(s"CREATE TABLE $b (id BIGINT, s STRING) " +
      "TBLPROPERTIES ('graft.bucket_by' = 'id,4')")
    assert(intercept[Exception](sql(s"ALTER TABLE $b SET TBLPROPERTIES " +
      "('graft.partitioned_by' = 's')")).getMessage
      .contains("exclusive"))
    sql(s"ALTER TABLE $t SET TBLPROPERTIES " +
      "('graft.partitioned_by' = 'truncate(2,s)')")
    sql(s"INSERT INTO $t VALUES (1, 'aaX'), (2, 'bbY')")
    assert(nFiles("pe_rej") == 2)
    sql(s"ALTER TABLE $t UNSET TBLPROPERTIES ('graft.partitioned_by')")
    // single-task insert after UNSET: no split -> exactly one new file
    sql(s"""INSERT INTO $t SELECT id, concat('zz', id)
      FROM range(3, 5, 1, 1)""")
    assert(nFiles("pe_rej") == 3)
  }
}
