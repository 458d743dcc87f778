package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

/** End-to-end concurrency stress through the SQL surface (the
  * commit-protocol specs in GraftStorageSpec pin the CAS mechanics;
  * this drives whole STATEMENTS from racing threads and pins the
  * user-visible invariants): concurrent INSERTs all land exactly once,
  * maintenance racing ingest either succeeds or conflicts LOUDLY
  * (never silently drops a commit), concurrent MOR MERGEs on disjoint
  * keys compose, and racing CREATEs elect exactly one winner. */
class ConcurrencyStressSpec extends SparkSpec {

  private def sql(q: String) = spark.sql(q)

  private def inParallel(n: Int)(body: Int => Unit): Seq[Throwable] = {
    val pool = Executors.newFixedThreadPool(n)
    val start = new CountDownLatch(1)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    (0 until n).foreach { i =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          start.await()
          try body(i) catch { case t: Throwable => errs.add(t) }
        }
      })
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS), "stress timeout")
    errs.toArray(Array.empty[Throwable]).toSeq
  }

  private def setup(name: String, ddlTail: String = ""): String = {
    spark.conf.set("spark.sql.catalog.gst",
      classOf[graft.catalog.GraftCatalog].getName)
    val t = s"gst.default.$name"
    sql(s"DROP TABLE IF EXISTS $t")
    sql(s"CREATE TABLE $t (k BIGINT, v STRING) $ddlTail")
    t
  }

  test("8 racing INSERT threads: every row lands exactly once") {
    val t = setup("cs_append")
    val errs = inParallel(8) { i =>
      (0 until 5).foreach { j =>
        sql(s"INSERT INTO $t VALUES (${i * 100 + j}, 'w$i')")
      }
    }
    assert(errs.isEmpty, s"unexpected: ${errs.map(_.getMessage)}")
    assert(sql(s"SELECT count(*), count(distinct k) FROM $t").head()
      .getLong(0) == 40L)
    assert(sql(s"SELECT count(distinct k) FROM $t").head().getLong(0) == 40L)
  }

  test("compaction racing ingest: every outcome is a success or a LOUD " +
      "conflict; no appended row is ever lost") {
    val t = setup("cs_compact")
    sql(s"INSERT INTO $t SELECT id, 'seed' FROM range(0, 50)")
    val conflicts = new AtomicInteger(0)
    val errs = inParallel(4) { i =>
      if (i < 3) (0 until 4).foreach { j =>
        sql(s"INSERT INTO $t VALUES (${1000 + i * 10 + j}, 'late')")
      }
      else (0 until 4).foreach { _ =>
        try sql("CALL gst.system.compact('default.cs_compact')")
        catch {
          case e: Exception
              if e.getMessage != null &&
                e.getMessage.contains("concurrent commit conflict") =>
            conflicts.incrementAndGet()
        }
      }
    }
    assert(errs.isEmpty, s"unexpected: ${errs.map(_.getMessage)}")
    // the invariant that matters: 50 seed + 12 late rows, none erased
    // by a compaction folding a stale scan (the replaceAllGuard)
    assert(sql(s"SELECT count(*) FROM $t").head().getLong(0) == 62L,
      s"rows lost or duplicated (conflicts seen: ${conflicts.get()})")
  }

  test("concurrent MOR MERGEs on disjoint keys both land") {
    val t = setup("cs_mor",
      "TBLPROPERTIES ('graft.mode'='mor','graft.row_id'='k')")
    sql(s"INSERT INTO $t SELECT id, 'seed' FROM range(0, 100)")
    val errs = inParallel(4) { i =>
      sql(s"""MERGE INTO $t dst
              USING (SELECT id * 4 + $i AS k, 'u$i' AS v
                     FROM range(0, 25)) src
              ON dst.k = src.k
              WHEN MATCHED THEN UPDATE SET v = src.v
              WHEN NOT MATCHED THEN INSERT (k, v) VALUES (src.k, src.v)""")
    }
    assert(errs.isEmpty, s"unexpected: ${errs.map(_.getMessage)}")
    assert(sql(s"SELECT count(*) FROM $t").head().getLong(0) == 100L)
    // every key k got thread (k mod 4)'s update
    assert(sql(s"SELECT count(*) FROM $t " +
      "WHERE v != concat('u', cast(k % 4 AS STRING))").head()
      .getLong(0) == 0L)
  }

  test("racing CREATE TABLE of one name elects exactly one winner") {
    spark.conf.set("spark.sql.catalog.gst",
      classOf[graft.catalog.GraftCatalog].getName)
    sql("DROP TABLE IF EXISTS gst.default.cs_create")
    val wins = new AtomicInteger(0)
    val errs = inParallel(6) { _ =>
      try {
        sql("CREATE TABLE gst.default.cs_create (x BIGINT)")
        wins.incrementAndGet(): Unit
      } catch {
        case e: Exception
            if e.getMessage != null &&
              e.getMessage.toLowerCase.contains("exists") => ()
      }
    }
    assert(errs.isEmpty, s"unexpected: ${errs.map(_.getMessage)}")
    assert(wins.get() == 1, s"${wins.get()} CREATEs claimed the name")
    assert(sql("SELECT count(*) FROM gst.default.cs_create")
      .head().getLong(0) == 0L)
  }

  test("concurrent positional DELETEs on disjoint rows of a DV table " +
      "both land (vectors union by construction)") {
    val t = setup("cs_dv", "TBLPROPERTIES ('graft.mode'='dv')")
    sql(s"INSERT INTO $t SELECT id, 'seed' FROM range(0, 100)")
    val errs = inParallel(4) { i =>
      // thread i tombstones k % 10 == i — disjoint position sets
      sql(s"DELETE FROM $t WHERE k % 10 = $i")
    }
    assert(errs.isEmpty, s"unexpected: ${errs.map(_.getMessage)}")
    assert(sql(s"SELECT count(*) FROM $t").head().getLong(0) == 60L)
    assert(sql(s"SELECT count(*) FROM $t WHERE k % 10 < 4").head()
      .getLong(0) == 0L)
  }

  test("positional DELETE racing compaction: success or LOUD conflict, " +
      "never a misdelete or a lost tombstone") {
    val t = setup("cs_dvc", "TBLPROPERTIES ('graft.mode'='dv')")
    sql(s"INSERT INTO $t SELECT id, 'seed' FROM range(0, 200)")
    sql(s"DELETE FROM $t WHERE k < 20") // live vectors for compact to fold
    val conflicts = new AtomicInteger(0)
    val deleted = new AtomicInteger(0)
    val errs = inParallel(2) {
      case 0 =>
        try { sql("CALL gst.system.compact('default.cs_dvc')") }
        catch { case e: Exception
            if e.getMessage != null && (e.getMessage.contains("conflict")
              || e.getMessage.contains("retry")) =>
          conflicts.incrementAndGet(): Unit }
      case _ =>
        try { sql(s"DELETE FROM $t WHERE k >= 190"); deleted.incrementAndGet(): Unit }
        catch { case e: Exception
            if e.getMessage != null && (e.getMessage.contains("conflict")
              || e.getMessage.contains("retry")) =>
          conflicts.incrementAndGet(): Unit }
    }
    assert(errs.isEmpty, s"unexpected: ${errs.map(_.getMessage)}")
    // whatever interleaving happened, the surviving state is one of
    // the two legal outcomes — never rows misdeleted by stale positions
    val n = sql(s"SELECT count(*) FROM $t").head().getLong(0)
    assert(n == 170L || n == 180L, s"rows: $n (conflicts=$conflicts)")
    if (n == 170L)
      assert(sql(s"SELECT count(*) FROM $t WHERE k >= 190").head()
        .getLong(0) == 0L)
    // k in [20, 190) must be fully intact under every interleaving
    assert(sql(s"SELECT count(*) FROM $t WHERE k >= 20 AND k < 190")
      .head().getLong(0) == 170L)
  }

  test("concurrent equality upserts of the SAME key serialize to " +
      "exactly one live row (the in-round fence makes the last " +
      "committer win)") {
    val t = setup("cs_eq", "TBLPROPERTIES ('graft.mode'='dv')")
    sql(s"INSERT INTO $t SELECT id, 'seed' FROM range(0, 10)")
    val errs = inParallel(4) { i =>
      spark.sql(s"SELECT 5L AS k, 'w$i' AS v").writeTo(t)
        .option("graft.upsert_keys", "k").append()
    }
    assert(errs.isEmpty, s"unexpected: ${errs.map(_.getMessage)}")
    // 4 upserts of one key: exactly one survivor, no duplicates — the
    // eq fence is computed INSIDE the commit round, so every later
    // committer's key-delete covers every earlier committer's insert
    assert(sql(s"SELECT count(*) FROM $t").head().getLong(0) == 10L)
    assert(sql(s"SELECT count(*) FROM $t WHERE k = 5").head()
      .getLong(0) == 1L)
    assert(sql(s"SELECT v FROM $t WHERE k = 5").head().getString(0)
      .startsWith("w"))
  }

  test("a stale positional UPDATE racing an equality upsert conflicts " +
      "loudly (positions cannot be reconciled against keys)") {
    val t = setup("cs_eqpos", "TBLPROPERTIES ('graft.mode'='dv')")
    sql(s"INSERT INTO $t SELECT /*+ REPARTITION(1) */ id, 'seed' " +
      "FROM range(0, 10)")
    val tbl = spark.sessionState.catalogManager.catalog("gst")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("default"), "cs_eqpos"))
      .asInstanceOf[graft.catalog.GraftDvTable]
    val scanVer = tbl.stateNow.current.get.version
    val victim = tbl.stateNow.current.get.files.head.path
    // the CONCURRENT upsert lands first
    spark.sql("SELECT 3L AS k, 'up' AS v").writeTo(t)
      .option("graft.upsert_keys", "k").append()
    // the STALE positional UPDATE (delete+insert) must now refuse
    import org.apache.spark.sql.types._
    val dvSchema = StructType(Seq(
      StructField("__file", StringType, nullable = false),
      StructField("__pos", LongType, nullable = false)))
    def ref(dir: String, schema: StructType,
        fill: org.apache.spark.sql.catalyst.expressions.GenericInternalRow => Unit) = {
      val w = new graft.catalog.GraftStorage.FileWriter(
        dir + "/dv-test-" + java.util.UUID.randomUUID() + ".parquet",
        schema)
      val r = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(schema.length)
      fill(r)
      w.write(r)
      w.closeAndRef()
    }
    val vec = ref(tbl.deltaDir, dvSchema, r => {
      r.update(0, org.apache.spark.unsafe.types.UTF8String
        .fromString(victim))
      r.update(1, 3L)
    })
    val data = ref(tbl.dataDir, tbl.schema(), r => {
      r.update(0, 3L)
      r.update(1, org.apache.spark.unsafe.types.UTF8String
        .fromString("stale"))
    })
    val e = intercept[IllegalStateException] {
      tbl.commitDvDelta(Seq(vec), Seq(data), Set(victim),
        scanVersion = scanVer)
    }
    assert(e.getMessage.contains("equality-delete upsert"), e.getMessage)
    assert(sql(s"SELECT v FROM $t WHERE k = 3").collect()
      .map(_.getString(0)).toSeq == Seq("up"))
    assert(sql(s"SELECT count(*) FROM $t").head().getLong(0) == 10L)
  }
}
