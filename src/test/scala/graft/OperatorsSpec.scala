package graft

import org.apache.spark.sql.functions._

/** Property checks for the round-1 operator additions, beyond the oracle
  * hash-match: as-of join against a naive per-row definition, IVF ANN
  * bounded by the exact baseline, multiset set-op identities, and
  * grouping-sets totals.
  */
class OperatorsSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("asof join matches the naive greatest-ts-at-or-before definition") {
    import spark.implicits._
    val got = run("q55_asof_join")
      .select("event_id", "asof_ts").as[(Long, java.sql.Timestamp)]
      .collect().toMap
    // naive: range join then per-error max click ts (quadratic — test only)
    val ev = Tables(spark, sfDir, "events")
    val err = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id").as("u"), col("ts").as("ets"))
    val clk = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("u2"), col("ts").as("cts"))
    val naive = err.join(clk, col("u") === col("u2") && col("cts") <= col("ets"))
      .groupBy("event_id").agg(max(col("cts")).as("best"))
      .as[(Long, java.sql.Timestamp)].collect().toMap
    assert(got == naive)
  }

  test("IVF ANN is bounded by brute force and probes only assigned cells") {
    import spark.implicits._
    val bf = run("q45_knn_bruteforce").filter(col("rank") === 1)
      .select("query_id", "cos_sim").as[(Long, Double)].collect().toMap
    val ivf = run("q56_knn_ivf").filter(col("rank") === 1)
      .select("query_id", "cos_sim").as[(Long, Double)].collect().toMap
    assert(ivf.nonEmpty)
    // approximate top-1 can never beat the exact top-1
    ivf.foreach { case (q, c) => assert(c <= bf(q) + 1e-9, s"query $q") }
  }

  test("INTERSECT ALL + EXCEPT ALL multiplicities sum to the left multiset") {
    import spark.implicits._
    val got = run("q59_set_ops_all")
      .select(col("suppkey"), (col("n_inter") + col("n_exc")).as("tot"))
      .as[(Long, Long)].collect().toMap
    val left = Tables(spark, sfDir, "lineitem")
      .filter(col("l_returnflag") === "R")
      .groupBy(col("l_suppkey").as("suppkey")).agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(got == left)
  }

  test("grouping sets grand-total row equals the table count") {
    val gs = run("q39_grouping_sets")
    val grand = gs.filter(col("g_flag") === 1 && col("g_status") === 1)
      .select("n").collect()
    assert(grand.length == 1)
    assert(grand.head.getLong(0) == Tables(spark, sfDir, "lineitem").count())
  }

  test("scd2 intervals sharing valid_from resolve deterministically via grp") {
    import spark.implicits._
    // user 1: A at t0 (eid 1), B at the SAME t0 (eid 2), A again at t1 —
    // the first two intervals share valid_from, the exact tie the grp
    // tie-break exists for (valid_from alone would leave lead() ambiguous)
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 01:00:00")
    val ev = Seq((1L, 1L, t0, "A"), (1L, 2L, t0, "B"), (1L, 3L, t1, "A"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val got = graft.relational.Advanced.scd2History(ev)
      .select("event_type", "valid_from", "valid_to").collect()
    assert(got.map(_.getString(0)).toSeq == Seq("A", "B", "A"))
    assert(got(0).getTimestamp(1) == t0 && got(0).getTimestamp(2) == t0)
    assert(got(1).getTimestamp(1) == t0 && got(1).getTimestamp(2) == t1)
    assert(got(2).getTimestamp(1) == t1 && got(2).getTimestamp(2) == null)
  }

  test("decontamination flags exactly the corpus docs sharing a benchmark trigram") {
    import spark.implicits._
    val flagged = run("q97_decontaminate")
      .select("doc_id", "n_hits").as[(Long, Long)].collect().toMap
    // no benchmark doc is ever flagged; every hit count is positive
    flagged.foreach { case (id, n) =>
      assert(id % 97 != 0, s"benchmark doc $id flagged as contaminated")
      assert(n >= 1)
    }
    // completeness + soundness vs a naive recomputation: a corpus doc is
    // flagged iff its trigram set intersects the benchmark trigram union
    val tri = Tables(spark, sfDir, "documents")
      .withColumn("toks", expr(graft.text.TextAnalysis.tokensExpr))
      .withColumn("tri", expr(graft.text.TextAnalysis.trigramsExpr))
      .select(col("doc_id"), col("tri"))
      .as[(Long, Seq[String])].collect()
    val bench = tri.filter(_._1 % 97 == 0).flatMap(_._2).toSet
    val expect = tri.filter(_._1 % 97 != 0)
      .filter(_._2.exists(bench.contains)).map(_._1).toSet
    assert(flagged.keySet == expect)
  }

  test("map battery n_types equals countDistinct per user") {
    import spark.implicits._
    val got = run("q38_map_funcs")
      .select(col("user_id"), col("n_types").cast("long")).as[(Long, Long)]
      .collect().toMap
    val exp = Tables(spark, sfDir, "events")
      .groupBy("user_id").agg(countDistinct("event_type").as("n"))
      .as[(Long, Long)].collect().toMap
    assert(got == exp)
  }
}
