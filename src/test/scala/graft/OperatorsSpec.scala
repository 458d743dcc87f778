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

  test("q100 sessions partition each user's events with 30-min gap boundaries") {
    import spark.implicits._
    val sessions = run("q100_session_stats")
      .select(col("user_id"), col("session_ord"),
        unix_micros(col("session_start")).as("s"),
        unix_micros(col("session_end")).as("e"), col("n_events"))
      .as[(Long, Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    // session event counts add up to each user's event count
    val perUser = Tables(spark, sfDir, "events")
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(sessions.view.mapValues(_.map(_._5).sum).toMap == perUser)
    val gapUs = 1800000000L
    for ((u, ss) <- sessions) {
      // ordinals are 1..k and consecutive sessions are > gap apart —
      // merging any two adjacent sessions would violate the gap rule
      assert(ss.map(_._2).toSeq == (1L to ss.size).toSeq, s"user $u ordinals")
      ss.foreach { case (_, _, s, e, _) => assert(s <= e) }
      ss.toSeq.sliding(2).foreach {
        case Seq((_, _, _, e1, _), (_, _, s2, _, _)) =>
          assert(s2 - e1 > gapUs, s"user $u sessions closer than the gap")
        case _ => ()
      }
    }
  }

  test("q101 boilerplate spans are exactly those shared by >= 2 docs (naive replay)") {
    import spark.implicits._
    val got = run("q101_span_dedup")
      .select(col("doc_id"), col("n_spans"), col("n_boiler"))
      .as[(Long, Long, Long)].collect()
      .map { case (id, ns, nb) => id -> ((ns, nb)) }.toMap
    // naive driver-side replay at smoke scale
    val toks = Tables(spark, sfDir, "documents")
      .select(col("doc_id"),
        expr("filter(split(lower(text), '[^a-z0-9]+'), x -> x != '')"))
      .as[(Long, Seq[String])].collect()
    val spans = toks.map { case (id, t) =>
      id -> t.sliding(8).filter(_.size == 8).map(_.mkString(" ")).toSet
    }.toMap
    val freq = spans.values.flatten.groupBy(identity).view.mapValues(_.size)
    val boiler = freq.filter(_._2 >= 2).keySet
    for ((id, sp) <- spans) {
      val (ns, nb) = got(id)
      assert(ns == sp.size, s"doc $id n_spans")
      assert(nb == sp.count(boiler.contains), s"doc $id n_boiler")
    }
  }

  test("q107 cascade counts are monotone non-increasing from the full table") {
    import spark.implicits._
    val got = run("q107_clean_cascade")
      .select(col("stage_ord"), col("rows_kept")).as[(Int, Long)]
      .collect().sortBy(_._1).map(_._2)
    assert(got.head == Tables(spark, sfDir, "documents").count())
    got.toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(b <= a, "a filter stage grew the data")
      case _ => ()
    }
    assert(got.last > 0, "cascade must not empty the corpus on the fixture")
  }

  test("q108 diff classes partition the union of snapshot keys") {
    import spark.implicits._
    val got = run("q108_table_diff")
      .select(col("class"), col("n_keys")).as[(String, Long)].collect().toMap
    val ev = Tables(spark, sfDir, "events")
    val nOld = ev.filter(col("event_id") % 13 =!= 0).count()
    val nNew = ev.filter(col("event_id") % 17 =!= 0).count()
    // |old| = deleted + changed + unchanged; |new| = inserted + changed + unchanged
    val (ins, del) = (got.getOrElse("inserted", 0L), got.getOrElse("deleted", 0L))
    val (chg, unc) = (got.getOrElse("changed", 0L), got.getOrElse("unchanged", 0L))
    assert(del + chg + unc == nOld)
    assert(ins + chg + unc == nNew)
  }

  test("q104 recursive spine has no holes and conserves the event count") {
    import spark.implicits._
    val got = run("q104_recursive_cte")
      .select(unix_micros(col("day")), col("n")).as[(Long, Long)].collect()
    val dayUs = 86400000000L
    // consecutive spine rows are exactly one day apart (recursion emitted
    // every day, no duplicates, no gaps)
    got.map(_._1).toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(b - a == dayUs, "spine hole")
      case _ => ()
    }
    assert(got.map(_._2).sum == Tables(spark, sfDir, "events").count())
  }

  test("q105 centroids equal the naive per-label mean (driver replay)") {
    import spark.implicits._
    val got = run("q105_label_centroids")
      .select(col("label"), col("pos"), col("centroid"))
      .as[(Long, Long, Double)].collect()
      .map { case (l, p, c) => (l, p) -> c }.toMap
    val vecs = Tables(spark, sfDir, "embeddings")
      .select(col("label").cast("long"), col("embedding"))
      .as[(Long, Seq[Float])].collect()
    for ((label, group) <- vecs.groupBy(_._1); pos <- group.head._2.indices) {
      val exp = group.map { case (_, v) =>
        BigDecimal(v(pos).toDouble).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      }.sum.toDouble / group.size
      assert(math.abs(got((label, pos.toLong)) - exp) < 1e-12,
        s"centroid ($label, $pos)")
    }
  }

  test("observe() surfaces pipeline data-quality metrics without a second scan") {
    // the Observation API is how a production pipeline audits a stage
    // (row counts, null rates) as a side-effect of the action it already
    // runs — no extra job, no driver-side re-aggregation
    val obs = new org.apache.spark.sql.Observation("docs_quality")
    val out = Tables(spark, sfDir, "documents")
      .observe(obs, count(lit(1)).as("rows"),
        sum(when(col("lang").isNull, 1).otherwise(0)).as("null_lang"))
      .filter(col("n_chars") > 0)
    val kept = out.count()
    val m = obs.get
    assert(m("rows").asInstanceOf[Long] ==
      Tables(spark, sfDir, "documents").count())
    assert(m("null_lang").asInstanceOf[Long] == 0L)
    assert(kept <= m("rows").asInstanceOf[Long])
  }

  test("native TopKPerGroup equals the window-rank idiom on every (group, k)") {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables(spark, sfDir, "events")
      .select(col("user_id"), col("event_id"), col("value"))
    for (k <- Seq(1, 3, 17)) { // k=17 > events-per-user/2 exercises partial passthrough; k=3 the compaction loop
      val got = graft.plans.TopK.perGroup(ev,
        Seq(ev("user_id")), Seq(ev("value").desc, ev("event_id")), k)
        .select("user_id", "event_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("value").desc, col("event_id"))
      val exp = ev.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k).select("user_id", "event_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == exp, s"k=$k mismatch")
    }
  }

  test("native TopKPerGroup matches a naive reference on random inputs (property)") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    import spark.implicits._
    val rowsGen = Gen.listOf(Gen.zip(
      Gen.choose(0L, 5L), Gen.choose(-3L, 3L), Gen.choose(0, 10000)))
    val prop = Prop.forAll(rowsGen, Gen.choose(1, 4)) { (rows, k) =>
      // uid makes the order total, so the reference is unambiguous
      val data = rows.zipWithIndex.map { case ((g, v, _), i) => (g, v, i.toLong) }
      val df = data.toDF("g", "v", "uid")
      val got = graft.plans.TopK.perGroup(df, Seq(df("g")),
        Seq(df("v").desc, df("uid")), k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val exp = data.groupBy(_._1).values.flatMap(
        _.sortBy { case (_, v, uid) => (-v, uid) }.take(k)).toSet
      got == exp
    }
    val res = check(Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  test("native TopKPerGroup is identical with AQE disabled (non-adaptive exchange path)") {
    val kAqe = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(kAqe)
    val ev = Tables(spark, sfDir, "events")
      .select(col("user_id"), col("event_id"), col("value"))
    def run() = graft.plans.TopK.perGroup(ev,
      Seq(ev("user_id")), Seq(ev("value").desc, ev("event_id")), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val withAqe = run()
    spark.conf.set(kAqe, "false")
    try assert(run() == withAqe)
    finally spark.conf.set(kAqe, prev)
  }

  test("native TopKPerGroup handles null keys, null order values, and empty input") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, java.lang.Double)](
      (1L, 5.0), (1L, null), (1L, 7.0), (null, 3.0), (null, 9.0), (2L, 1.0))
      .toDF("g", "v")
    val got = graft.plans.TopK.perGroup(df, Seq(df("g")),
      Seq(df("v").desc_nulls_last), 2)
      .collect().map(r => (Option(r.get(0)), Option(r.get(1)))).toSet
    // null group key is its own group (same as groupBy); null order values
    // sort last under desc_nulls_last so they are cut first
    assert(got == Set(
      (Some(1L), Some(7.0)), (Some(1L), Some(5.0)),
      (None, Some(9.0)), (None, Some(3.0)),
      (Some(2L), Some(1.0))))
    val empty = graft.plans.TopK.perGroup(df.filter(col("g") > 100),
      Seq(df("g")), Seq(df("v")), 3)
    assert(empty.count() == 0)
  }

  test("q102 shuffle positions are a permutation and follow the md5 key order") {
    import spark.implicits._
    val got = run("q102_corpus_shuffle")
      .select(col("pos"), col("doc_id")).as[(Long, Long)].collect()
    val n = Tables(spark, sfDir, "documents").count()
    assert(got.map(_._1).sorted.toSeq == (1L to n).toSeq, "pos not a permutation")
    // two-phase assignment must equal the naive global order
    val naive = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), md5(concat(lit("shuf42:"), col("doc_id").cast("string"))).as("k"))
      .as[(Long, String)].collect().sortBy { case (id, k) => (k, id) }
      .map(_._1).toSeq
    assert(got.sortBy(_._1).map(_._2).toSeq == naive, "order differs from naive sort")
  }
}
