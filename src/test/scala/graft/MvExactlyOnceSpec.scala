package graft

/** MV crash-replay hardening (VERDICT r12 item 7): the transaction
  * ledger makes at-least-once foreachBatch application exactly-once.
  *
  * Failure model: foreachBatch commits the batch's MERGE to the MV
  * table, then the stream CRASHES before the checkpoint commit — on
  * restart the same batch id is re-delivered. Pre-fix, the MERGE
  * re-applied and the MV double-incremented. With applyBatchOnce, the
  * (appId -> batchId) stamp rides the MERGE's own commit, so the
  * replay finds it recorded and skips. */
class MvExactlyOnceSpec extends SparkSpec {

  private def sql(q: String) = spark.sql(q)

  private def setup(): graft.catalog.GraftTable = {
    spark.conf.set("spark.sql.catalog.gmv",
      classOf[graft.catalog.GraftCatalog].getName)
    sql("DROP TABLE IF EXISTS gmv.default.mv")
    sql("CREATE TABLE gmv.default.mv (k STRING, n BIGINT)")
    sql("INSERT INTO gmv.default.mv VALUES ('a', 0)")
    spark.sessionState.catalogManager.catalog("gmv")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("default"), "mv"))
      .asInstanceOf[graft.catalog.GraftTable]
  }

  private def increment(): Unit =
    sql("UPDATE gmv.default.mv SET n = n + 1 WHERE k = 'a'"): Unit
  private def current(): Long =
    sql("SELECT n FROM gmv.default.mv WHERE k = 'a'").head().getLong(0)

  test("crash between MERGE and checkpoint commit: the replayed batch " +
      "is skipped — no double-increment") {
    val t = setup()
    // batch 0 applies and stamps the ledger in the same commit
    assert(t.applyBatchOnce("mvapp", 0L) { increment() })
    assert(current() == 1)
    assert(t.stateNow.txns.get("mvapp").contains(0L),
      "ledger stamp must ride the batch's own commit")
    // CRASH here (checkpoint never recorded batch 0) -> restart
    // re-delivers batch 0: the apply must be refused
    assert(!t.applyBatchOnce("mvapp", 0L) { increment() })
    assert(current() == 1, "replayed batch double-incremented the MV")
    // the next batch applies normally
    assert(t.applyBatchOnce("mvapp", 1L) { increment() })
    assert(current() == 2)
  }

  test("crash BEFORE the batch's commit leaves no stamp: the replay " +
      "applies (at-least-once recovers the lost work)") {
    val t = setup()
    intercept[RuntimeException] {
      t.applyBatchOnce("mvapp", 0L) {
        throw new RuntimeException("die before any table commit")
      }: Unit
    }
    assert(t.stateNow.txns.get("mvapp").isEmpty,
      "a failed batch must not be recorded as applied")
    assert(t.applyBatchOnce("mvapp", 0L) { increment() })
    assert(current() == 1)
  }

  test("the ledger survives a cold load (it lives in the table log, " +
      "not the session)") {
    val t = setup()
    assert(t.applyBatchOnce("mvapp", 7L) { increment() })
    graft.catalog.GraftCatalog.dropHandlesForTest()
    val t2 = spark.sessionState.catalogManager.catalog("gmv")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("default"), "mv"))
      .asInstanceOf[graft.catalog.GraftTable]
    assert(!t2.applyBatchOnce("mvapp", 7L) { increment() })
    assert(current() == 1)
    // distinct appIds have independent ledgers
    assert(t2.applyBatchOnce("otherapp", 7L) { increment() })
    assert(current() == 2)
  }
}
