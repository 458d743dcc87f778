package graft

/** Plan-shape regression guards for the scale-critical physical choices:
  * the properties that make a query survive a 100 TB input are planning
  * facts (what got broadcast, what got pushed to the scan), not row
  * counts — so they are asserted on the executed plan directly. Each
  * query is collected first so AQE's final (re-planned) physical plan is
  * what's inspected, not the initial speculative one.
  */
class PlanShapeSpec extends SparkSpec {

  private def finalPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.collect() // force AQE to finalize the plan
    // the AQE tree string prints BOTH the final and the initial plan;
    // shape assertions are about what actually ran
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("q02 filter and projection reach the parquet scan") {
    val plan = finalPlan("q02_filter_project")
    // the FileScan line truncates long field lists with "..." so parse
    // leniently: a non-empty PushedFilters list, not the exact contents
    assert("PushedFilters: \\[[^\\]]".r.findFirstIn(plan).isDefined,
      s"filter not pushed to the scan:\n$plan")
    // column pruning: the scan's (untruncated) output column list must
    // not carry l_comment (the widest lineitem column)
    val scanCols = "FileScan parquet \\[([^\\]]*)\\]".r
      .findFirstMatchIn(plan).map(_.group(1)).getOrElse("")
    assert(scanCols.nonEmpty && !scanCols.contains("l_comment"),
      s"projection not pruned, scan reads: $scanCols")
  }

  test("q06 dimension join is a broadcast hash join") {
    val plan = finalPlan("q06_broadcast_dim_join")
    assert(plan.contains("BroadcastHashJoin"),
      s"dim join did not broadcast:\n$plan")
  }

  test("q97 benchmark n-gram set is broadcast (corpus side stays map-side)") {
    val plan = finalPlan("q97_decontaminate")
    assert(plan.contains("BroadcastHashJoin"),
      s"benchmark set not broadcast:\n$plan")
  }

  test("q99 new-batch band keys are broadcast against the corpus index") {
    val plan = finalPlan("q99_incremental_dedup")
    assert(plan.contains("BroadcastHashJoin"),
      s"new-batch bands not broadcast:\n$plan")
  }

  test("q01 aggregate is partially applied map-side before the shuffle") {
    val plan = finalPlan("q01_pricing_summary")
    // two HashAggregate nodes (partial + final) around one exchange —
    // the map-side combine that keeps a 100 TB groupBy's shuffle small
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      s"no partial aggregation:\n$plan")
  }

  test("q30 per-row text pipeline adds no shuffle beyond fan-out and final sort") {
    val plan = finalPlan("q30_token_stats")
    // codegen spans render as "*(n)" in the executed-plan tree; the
    // higher-order-function projects sit between spans (HOF expressions
    // aren't codegen-supported) but must still be per-row only:
    assert(plan.contains("*("), s"no codegen span at all:\n$plan")
    // exactly two exchanges — the Tables fan-out repartition and the
    // final ORDER BY range partitioning; anything more means the per-row
    // pipeline grew cross-row state it doesn't need
    val exchanges = "\\+- Exchange ".r.findAllIn(plan).size
    assert(exchanges <= 2, s"unexpected extra shuffle ($exchanges):\n$plan")
  }

  test("q100 session window + aggregate ride a single user_id exchange") {
    val plan = finalPlan("q100_session_stats")
    // the groupBy keys (user_id, sid) contain the window partitioning
    // (user_id) as a subset, so HashPartitioning(user_id) must satisfy the
    // aggregate's distribution: exactly ONE hash exchange in the plan
    // (the final ORDER BY adds a range exchange, not a hash one)
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashEx == 1, s"sessionize re-shuffled ($hashEx hash exchanges):\n$plan")
  }

  test("q106 native top-k plans as partial -> exchange -> final (map-side cut)") {
    val plan = finalPlan("q106_native_topk")
    assert(plan.contains("PartialTopKPerGroup"),
      s"partial stage missing:\n$plan")
    assert(plan.contains("FinalTopKPerGroup"),
      s"final stage missing:\n$plan")
    // the partial stage must sit BELOW the exchange (its whole point is
    // cutting rows before the shuffle)
    val ex = plan.indexOf("Exchange hashpartitioning")
    val partial = plan.indexOf("PartialTopKPerGroup")
    assert(ex >= 0 && partial > ex,
      s"partial stage not below the group-key exchange:\n$plan")
  }

  test("q106 late select prunes the parquet scan through the custom node") {
    // q106 hands the FULL 16-column lineitem to TopK.perGroup and selects
    // late — PushThroughTopKPerGroup must prune the scan to exactly the
    // group ∪ order ∪ output columns, or the partial stage would buffer
    // (and the scan would read) the whole width
    val plan = finalPlan("q106_native_topk")
    val scanCols = "FileScan parquet \\[([^\\]]*)\\]".r
      .findFirstMatchIn(plan).map(_.group(1)).getOrElse("")
    val read = scanCols.split(",").map(_.trim.replaceAll("#\\d+L?", ""))
      .filter(_.nonEmpty).toSet
    assert(read == Set("l_returnflag", "l_linestatus", "l_orderkey",
      "l_linenumber", "l_extendedprice"),
      s"scan not pruned to the 5 needed columns, reads: $scanCols\n$plan")
  }

  test("group-key filters push below the custom top-k node to the scan") {
    import org.apache.spark.sql.functions.col
    val li = Tables(spark, sfDir, "lineitem")
    val df = graft.plans.TopK.perGroup(li,
      Seq(li("l_returnflag"), li("l_linestatus")),
      Seq(li("l_extendedprice").desc, li("l_orderkey"), li("l_linenumber")), 3)
      .filter(col("l_returnflag") === "R")
      .select("l_returnflag", "l_orderkey", "l_extendedprice")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert("PushedFilters: \\[[^\\]]".r.findFirstIn(plan).isDefined,
      s"group-key filter did not reach the scan:\n$plan")
    // and the filtered result matches the filter-first formulation
    val expected = graft.plans.TopK.perGroup(
      {val f = li.filter(col("l_returnflag") === "R"); f},
      Seq(li("l_returnflag"), li("l_linestatus")),
      Seq(li("l_extendedprice").desc, li("l_orderkey"), li("l_linenumber")), 3)
      .select("l_returnflag", "l_orderkey", "l_extendedprice")
    assert(df.orderBy("l_orderkey", "l_extendedprice").collect().toSeq ==
      expected.orderBy("l_orderkey", "l_extendedprice").collect().toSeq)
  }

  test("non-group-key filters do NOT push below the custom top-k node") {
    import org.apache.spark.sql.functions.col
    // a predicate on the ORDER column filters individual rows, not whole
    // groups — pushing it below top-k would change which rows rank in the
    // top k. The rule must leave it above; results must equal the
    // filter-AFTER-window-rank reference.
    val li = Tables(spark, sfDir, "lineitem")
    val cut = 5000.0
    val df = graft.plans.TopK.perGroup(li,
      Seq(li("l_returnflag")),
      Seq(li("l_extendedprice").desc, li("l_orderkey"), li("l_linenumber")), 8)
      .filter(col("l_extendedprice") > cut)
      .select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice")
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.row_number
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    val ref = li.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 8).filter(col("l_extendedprice") > cut)
      .select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice")
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getString(0), r.getLong(1), r.getInt(2))
    assert(df.collect().map(key).toSet == ref.collect().map(key).toSet)
    // and the plan kept the row-level filter ABOVE the final top-k stage
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val filterIdx = plan.indexOf("Filter")
    val finalIdx = plan.indexOf("FinalTopKPerGroup")
    assert(filterIdx >= 0 && finalIdx > filterIdx,
      s"row-level filter was pushed below the top-k node:\n$plan")
  }

  test("q102 global position never funnels the corpus through one task") {
    val plan = finalPlan("q102_corpus_shuffle")
    // the full-table rank must be windowed by the bucket column (a hash
    // exchange); the only SinglePartition exchange allowed is the one
    // feeding the 256-row bucket-offset cumsum
    assert(plan.contains("Exchange hashpartitioning(b"),
      s"per-bucket rank not hash-partitioned:\n$plan")
    // bucket offsets join back as a broadcast, not a shuffle join
    assert(plan.contains("BroadcastHashJoin"),
      s"bucket offsets not broadcast:\n$plan")
  }

  test("q120 both SCD2 windows share one o_custkey exchange and one sort") {
    val plan = finalPlan("q120_scd2_merge")
    // one hash exchange for the key; the only other exchange is the
    // rangepartitioning for the deterministic output order
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      s"expected exactly one hash exchange:\n$plan")
    // the lead() window after the change filter must piggyback on the
    // lag() window's sort — 2 Windows, but only the output Sort plus ONE
    // window sort in the whole plan
    assert("Window".r.findAllIn(plan).size == 2 &&
      "\\bSort\\b".r.findAllIn(plan).size <= 2,
      s"second window re-sorted:\n$plan")
  }

  test("q125 window chain and session aggregate ride a single user_id exchange") {
    val plan = finalPlan("q125_sessionize")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      s"expected exactly one hash exchange:\n$plan")
    // groupBy(user_id, session_seq) must reuse the user_id partitioning:
    // no exchange between the windows and the aggregate pair
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      s"no partial aggregation:\n$plan")
  }

  test("q121 funnel stages broadcast the shrinking user frames, never the event scan") {
    val plan = finalPlan("q121_funnel")
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      s"funnel stage joins did not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"an event-scan side was shuffled for a funnel join:\n$plan")
  }

  test("q123 vocabulary is broadcast back against the token stream") {
    val plan = finalPlan("q123_unigram_score")
    assert(plan.contains("BroadcastHashJoin"),
      s"vocab not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"corpus side shuffled for the term join:\n$plan")
  }

  test("q127 centroids reach every partition as a broadcast, points never shuffle for distances") {
    // the declared query's plan is the checkpoint scan (cached iterative
    // op) — assert the iteration body's shape via the probe instead
    val df = graft.similarity.Clustering.assignPlanProbe(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // the k-row centroid frame joins via broadcast nested loop (cross
    // join); the argmin is a partial+final aggregate pair, so the only
    // exchange carries one pre-reduced row per (point, mapper)
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"centroid cross join not broadcast:\n$plan")
    assert("HashAggregate|ObjectHashAggregate|SortAggregate".r.findAllIn(plan).size >= 2,
      s"argmin not partially aggregated map-side:\n$plan")
  }

  test("q134 injects a bloom runtime filter below the fact-side exchange") {
    val plan = graft.relational.RuntimeFilters.bloomPlanProbe(spark, sfDir)
    assert(plan.contains("might_contain"),
      s"no runtime bloom probe on the lineitem scan:\n$plan")
    assert(plan.contains("bloom_filter_agg"),
      s"no bloom build over the filtered orders keys:\n$plan")
  }

  test("q159 BM25: query terms and corpus stats broadcast; postings never sort-merge join") {
    val plan = finalPlan("q159_bm25_topk")
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"qterms/stats not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin") || plan.contains("BroadcastHashJoin"),
      s"posting scoring shuffled the corpus side:\n$plan")
  }

  test("q03 flagship: dims broadcast, no cartesian, top-10 is TakeOrderedAndProject") {
    val plan = finalPlan("q03_shipping_priority")
    assert(plan.contains("BroadcastHashJoin"),
      s"no broadcast join in the 3-way star:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"a join degenerated to a cartesian/nested-loop:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-10 planned as a global sort:\n$plan")
  }

  test("q144 interval overlap: bucket decomposition keeps every join an equi-join") {
    val plan = finalPlan("q144_interval_overlap_join")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"interval join planned as nested-loop/cartesian:\n$plan")
    assert("SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin".r
      .findFirstIn(plan).isDefined,
      s"no hash-based equi-join in the plan:\n$plan")
  }

  test("q159 df-ranks derive via TakeOrderedAndProject, never a vocab-wide window") {
    val plan = finalPlan("q159_bm25_topk")
    // two top-k sites: the qterms df-rank derivation (limit 7) and the
    // final top-10 — both must plan as TakeOrderedAndProject so only k
    // rows per partition ever cross the wire; any Window in the plan
    // runs over the ≤7 survivors, not the vocabulary
    assert("TakeOrderedAndProject".r.findAllIn(plan).size >= 2,
      s"df-rank window not reduced to a top-k plan:\n$plan")
  }

  test("q142 vocab-id assignment rides a TakeOrderedAndProject capped at |alphabet|+rounds") {
    val plan = finalPlan("q142_bpe_tokenize_ids")
    assert(plan.contains("TakeOrderedAndProject"),
      s"vocab-id rank not planned as top-k:\n$plan")
  }

  test("q161 TWAP: window and aggregation share ONE user_id exchange") {
    val plan = finalPlan("q161_time_weighted_avg")
    // one shuffle for the window; the groupBy on the same key reuses the
    // partitioning (no second hashpartitioning exchange on user_id)
    val exchanges = "Exchange hashpartitioning\\(user_id".r
      .findAllIn(plan).size
    assert(exchanges == 1,
      s"expected exactly one user_id exchange, saw $exchanges:\n$plan")
  }

  test("q171 weighted sample plans a TakeOrderedAndProject, not a global sort") {
    val plan = finalPlan("q171_weighted_sample")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k not planned as TakeOrderedAndProject:\n$plan")
  }

  test("q163 attribution: the as-of window adds no join operator at all") {
    val plan = finalPlan("q163_lasttouch_attribution")
    assert(!plan.contains("Join"),
      s"attribution planned a join where one window suffices:\n$plan")
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(plan).size == 1,
      s"more than one user_id exchange:\n$plan")
  }

  test("AQE splits a skewed join partition at runtime (the unsalted path)") {
    // q47 handles skew by SALTING — the write-side fix you apply when
    // you know the hot keys. This pins the complementary RUNTIME fix the
    // engine leans on everywhere else: AQE detecting a skewed shuffle
    // partition after the map stage and splitting it into sub-reads.
    // Thresholds are lowered so the fixture-scale hot key (90% of rows
    // on one join key) crosses them; the assertion is on the FINAL
    // adaptive plan ("n skewed partitions" in the AQEShuffleRead) plus
    // the join's row-level correctness under the split.
    import org.apache.spark.sql.functions._
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val n = 300000L
      // 90% of rows land on key 0 — one shuffle partition dwarfs the rest
      val fact = spark.range(n).select(
        when(col("id") % 10 =!= 0, lit(0L)).otherwise(col("id")).as("k"),
        concat(lit("payload_payload_payload_"), col("id")).as("pay"))
      val dim = spark.range(200).select(col("id").as("k"),
        concat(lit("d"), col("id")).as("dv"))
      val joined = fact.join(dim, "k")
      // collect() (not count()) so the inspected DataFrame's OWN plan is
      // the one that executed — count() wraps it in a fresh execution
      // and the original never finalizes under AQE
      val got = joined.collect().length.toLong
      // key 0 matches dim row 0; every other fact key k>0 (k%10==0) too
      val expected = fact.filter(col("k") < 200).count()
      assert(got == expected, s"skew-join row count $got != $expected")
      val plan = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(plan.contains("SortMergeJoin(skew=true)") &&
          plan.contains("AQEShuffleRead skewed"),
        s"AQE did not split the skewed partition:\n$plan")
    } finally prev.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("q35/q164 tokenize exactly once: CollapseProject must not inline " +
      "graft_tokens into every trigram reference") {
    // the round-8 regression class: `toks` referenced naively lets
    // CollapseProject substitute graft_tokens(text) into each of its ~6
    // uses, re-tokenizing every row per use (measured 6.3 s -> 0.9 s
    // after the lambda-binding fix). The optimized plan is the contract:
    // exactly ONE graft_tokens call per document scan.
    def tokenizeCalls(df: org.apache.spark.sql.DataFrame): Int =
      "graft_tokens".r
        .findAllIn(df.queryExecution.optimizedPlan.toString).length
    val q35 = SparkEntry.queries("q35_top_trigrams")(spark, sfDir)
    assert(tokenizeCalls(q35) == 1,
      s"q35 tokenizes ${tokenizeCalls(q35)}x:\n" +
        q35.queryExecution.optimizedPlan.toString)
    // q164's tokenize feeds the checkpointed shingle index; pin the
    // pre-checkpoint plan (the one that actually runs the tokenizer)
    val idx = graft.text.TextAnalysis.q164ShingleIndex(spark, sfDir)
    assert(tokenizeCalls(idx) == 1,
      s"q164 shingle index tokenizes ${tokenizeCalls(idx)}x:\n" +
        idx.queryExecution.optimizedPlan.toString)
    // q101's contract is THREE corpus passes (the size(spans) branch
    // plus boilerCounts consuming its spans frame twice: doc-frequency
    // side and re-join side) — one tokenize each. The explode
    // substitution bug would push this to 7 (each exploding pass pays
    // 3x); pin the per-pass budget.
    val q101 = SparkEntry.queries("q101_span_dedup")(spark, sfDir)
    assert(tokenizeCalls(q101) <= 3,
      s"q101 tokenizes ${tokenizeCalls(q101)}x:\n" +
        q101.queryExecution.optimizedPlan.toString)
  }

  test("storage-partitioned join: two co-partitioned catalog tables " +
      "join AND aggregate with zero Exchange (VERDICT r11 item 1)") {
    // the single biggest remaining scale lever: a 100-TB fact-to-fact
    // join between tables clustered on the same key must NOT pay a
    // full-corpus shuffle — the scans report KeyGroupedPartitioning
    // and Spark's SPJ planner aligns same-key file groups directly
    spark.conf.set("spark.sql.catalog.gstore",
      classOf[graft.catalog.GraftCatalog].getName)
    def sql(q: String) = spark.sql(q)
    sql("DROP TABLE IF EXISTS gstore.default.spj_a")
    sql("DROP TABLE IF EXISTS gstore.default.spj_b")
    sql("CREATE TABLE gstore.default.spj_a (k BIGINT, v BIGINT) PARTITIONED BY (k)")
    sql("CREATE TABLE gstore.default.spj_b (k BIGINT, w BIGINT) PARTITIONED BY (k)")
    sql("INSERT INTO gstore.default.spj_a SELECT id % 5, id FROM range(100)")
    sql("INSERT INTO gstore.default.spj_b SELECT id % 5, id * 10 FROM range(40)")
    val confs = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val df = sql(
        """SELECT a.k, count(*) AS pairs, sum(a.v + b.w) AS s
           FROM gstore.default.spj_a a
           JOIN gstore.default.spj_b b ON a.k = b.k
           GROUP BY a.k""")
      val rows = df.collect()
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(!plan.contains("Exchange"),
        s"co-partitioned join still shuffles:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a shuffle-family join riding the storage partitioning:\n$plan")
      // correctness: per key, 20 a-rows x 8 b-rows = 160 pairs
      assert(rows.length == 5 && rows.forall(_.getLong(1) == 160L),
        s"SPJ result wrong: ${rows.mkString(", ")}")
      // exact sums per key: sum over (v,w) pairs of v+w
      val expect = (0L until 5L).map { k =>
        val vs = (0L until 100L).filter(_ % 5 == k)
        val ws = (0L until 40L).filter(_ % 5 == k).map(_ * 10)
        k -> (vs.sum * ws.size + ws.sum * vs.size)
      }.toMap
      rows.foreach(r => assert(r.getLong(2) == expect(r.getLong(0)),
        s"sum mismatch at k=${r.getLong(0)}"))
      // and with the switch OFF the same query falls back to per-file
      // partitions + ordinary exchanges — the report never lies about
      // a layout the planner isn't honoring
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
      val off = sql(
        """SELECT a.k, count(*) AS pairs
           FROM gstore.default.spj_a a
           JOIN gstore.default.spj_b b ON a.k = b.k GROUP BY a.k""")
      assert(off.collect().forall(_.getLong(1) == 160L))
      assert(off.queryExecution.executedPlan.toString.contains("Exchange"),
        "conf-off path unexpectedly claimed key-grouped layout")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
    sql("DROP TABLE gstore.default.spj_a")
    sql("DROP TABLE gstore.default.spj_b")
  }

  test("SPJ survives MISMATCHED partition sets (pushPartValues): one " +
      "side missing keys still joins with zero Exchange") {
    spark.conf.set("spark.sql.catalog.gstore",
      classOf[graft.catalog.GraftCatalog].getName)
    def sql(q: String) = spark.sql(q)
    sql("DROP TABLE IF EXISTS gstore.default.spj_m1")
    sql("DROP TABLE IF EXISTS gstore.default.spj_m2")
    sql("CREATE TABLE gstore.default.spj_m1 (k BIGINT, v BIGINT) " +
      "PARTITIONED BY (k)")
    sql("CREATE TABLE gstore.default.spj_m2 (k BIGINT, w BIGINT) " +
      "PARTITIONED BY (k)")
    // left holds keys 0..4, right only 0..2: the planner must align
    // the key groups (padding the missing ones) instead of shuffling
    sql("INSERT INTO gstore.default.spj_m1 SELECT id % 5, id FROM range(100)")
    sql("INSERT INTO gstore.default.spj_m2 SELECT id % 3, id * 10 FROM range(30)")
    val confs = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val df = sql(
        """SELECT a.k, count(*) AS pairs
           FROM gstore.default.spj_m1 a
           JOIN gstore.default.spj_m2 b ON a.k = b.k
           GROUP BY a.k""")
      val rows = df.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(!plan.contains("Exchange"),
        s"mismatched-partition SPJ still shuffles:\n$plan")
      // keys 0..2 join (20 left x 10 right); 3..4 drop out
      assert(rows == Map(0L -> 200L, 1L -> 200L, 2L -> 200L),
        s"SPJ mismatch result wrong: $rows")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
    sql("DROP TABLE gstore.default.spj_m1")
    sql("DROP TABLE gstore.default.spj_m2")
  }

  test("MCV-hot join auto-salts: salt projection + dim explode appear, " +
      "stale stats refuse, results identical either way") {
    def sql(q: String) = spark.sql(q)
    spark.conf.set("spark.sql.catalog.gsalt",
      classOf[graft.catalog.GraftCatalog].getName)
    // broadcast disabled: a test-scale dim sits under the BHJ
    // threshold, and the profit gate (r16 item 2) correctly refuses to
    // salt a broadcast join — this test exercises the shuffle-join path
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
    Seq("salt_f", "salt_d").foreach(t =>
      sql(s"DROP TABLE IF EXISTS gsalt.default.$t"))
    sql("CREATE TABLE gsalt.default.salt_f (k STRING, v BIGINT)")
    sql("INSERT INTO gsalt.default.salt_f SELECT CASE WHEN id % 10 < 9 " +
      "THEN 'HOT' ELSE concat('c', id % 7) END, id FROM range(0, 1000)")
    sql("CREATE TABLE gsalt.default.salt_d (k STRING, d STRING)")
    sql("INSERT INTO gsalt.default.salt_d SELECT DISTINCT k, " +
      "concat('d_', k) FROM gsalt.default.salt_f")
    val q = """SELECT dm.d, COUNT(*) AS n, SUM(f.v) AS sv
               FROM gsalt.default.salt_f f
               JOIN gsalt.default.salt_d dm ON f.k = dm.k
               GROUP BY dm.d ORDER BY dm.d"""
    def optimized = sql(q).queryExecution.optimizedPlan.toString

    // no stats yet -> no salting
    assert(!optimized.contains("__graft_salt"),
      s"salting must not fire without MCV stats:\n$optimized")
    val unsalted = sql(q).collect().toSeq

    sql("CALL gsalt.system.analyze(table => 'default.salt_f', " +
      "columns => 'k', mcv => 3)")
    val plan = optimized
    assert(plan.contains("__graft_salt_s") &&
      plan.contains("__graft_salt_r"),
      s"hot MCV must salt the join:\n$plan")
    assert(plan.contains("explode"), s"dim side must replicate:\n$plan")
    // physical-only: identical results, original schema
    val salted = sql(q).collect().toSeq
    assert(salted == unsalted)
    assert(sql(q).columns.toSeq == Seq("d", "n", "sv"))

    // conf off -> plain plan again
    spark.conf.set("spark.graft.salt.enabled", "false")
    try assert(!optimized.contains("__graft_salt"))
    finally spark.conf.unset("spark.graft.salt.enabled")

    // a commit stales the MCV -> the rewrite stops firing (no silently
    // stale skew decisions)
    sql("INSERT INTO gsalt.default.salt_f VALUES ('HOT', -1)")
    assert(!optimized.contains("__graft_salt"),
      "stale MCV must not salt")
    Seq("salt_f", "salt_d").foreach(t =>
      sql(s"DROP TABLE gsalt.default.$t"))
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("salting refuses a broadcast-small dim: BHJ has no skewed " +
      "Exchange to fix, so the hot MCV must NOT explode the broadcast side") {
    def sql(q: String) = spark.sql(q)
    spark.conf.set("spark.sql.catalog.gsalt",
      classOf[graft.catalog.GraftCatalog].getName)
    Seq("salt_bf", "salt_bd").foreach(t =>
      sql(s"DROP TABLE IF EXISTS gsalt.default.$t"))
    sql("CREATE TABLE gsalt.default.salt_bf (k STRING, v BIGINT)")
    sql("INSERT INTO gsalt.default.salt_bf SELECT CASE WHEN id % 10 < 9 " +
      "THEN 'HOT' ELSE concat('c', id % 7) END, id FROM range(0, 1000)")
    sql("CREATE TABLE gsalt.default.salt_bd (k STRING, d STRING)")
    sql("INSERT INTO gsalt.default.salt_bd SELECT DISTINCT k, " +
      "concat('d_', k) FROM gsalt.default.salt_bf")
    sql("CALL gsalt.system.analyze(table => 'default.salt_bf', " +
      "columns => 'k', mcv => 3)")
    val q = """SELECT dm.d, COUNT(*) AS n
               FROM gsalt.default.salt_bf f
               JOIN gsalt.default.salt_bd dm ON f.k = dm.k
               GROUP BY dm.d ORDER BY dm.d"""
    // default broadcast threshold: the 8-key dim broadcasts, so the
    // profit gate keeps the plan — no salt names anywhere, and the
    // physical join is a BroadcastHashJoin
    val df = sql(q)
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("__graft_salt"),
      s"broadcast-small dim must keep BHJ, not salt:\n$optimized")
    val phys = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(phys.contains("BroadcastHashJoin"),
      s"expected BHJ on the broadcast-small dim:\n$phys")
    df.collect()
    Seq("salt_bf", "salt_bd").foreach(t =>
      sql(s"DROP TABLE gsalt.default.$t"))
  }

  test("salting refuses co-bucketed SPJ sides: a hot key on " +
      "bucket-compatible layouts keeps the zero-Exchange plan") {
    def sql(q: String) = spark.sql(q)
    spark.conf.set("spark.sql.catalog.gsalt",
      classOf[graft.catalog.GraftCatalog].getName)
    val saved = Seq("spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.enabled")
      .map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      spark.conf.set(
        "spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
      // broadcast off: otherwise the tiny bucketed dim would broadcast
      // and never reach either the SPJ or the salt decision
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      Seq("salt_sf", "salt_sd").foreach(t =>
        sql(s"DROP TABLE IF EXISTS gsalt.default.$t"))
      sql("""CREATE TABLE gsalt.default.salt_sf (k STRING, v BIGINT)
             TBLPROPERTIES ('graft.bucket_by' = 'k,4')""")
      sql("INSERT INTO gsalt.default.salt_sf SELECT CASE WHEN id % 10 < 9 " +
        "THEN 'HOT' ELSE concat('c', id % 7) END, id FROM range(0, 1000)")
      sql("""CREATE TABLE gsalt.default.salt_sd (k STRING, d STRING)
             TBLPROPERTIES ('graft.bucket_by' = 'k,4')""")
      sql("INSERT INTO gsalt.default.salt_sd SELECT DISTINCT k, " +
        "concat('d_', k) FROM gsalt.default.salt_sf")
      sql("CALL gsalt.system.analyze(table => 'default.salt_sf', " +
        "columns => 'k', mcv => 3)")
      val q = """SELECT dm.d, COUNT(*) AS n
                 FROM gsalt.default.salt_sf f
                 JOIN gsalt.default.salt_sd dm ON f.k = dm.k
                 GROUP BY dm.d, f.k ORDER BY dm.d"""
      val df = sql(q)
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("__graft_salt"),
        s"co-bucketed SPJ sides must not salt (the rewrite would " +
          s"resurrect the Exchange SPJ removes):\n$optimized")
      val phys = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      val joinIdx = phys.indexOf("SortMergeJoin")
      assert(joinIdx >= 0, s"expected a sort-merge SPJ join:\n$phys")
      assert(!phys.substring(joinIdx).contains("Exchange"),
        s"co-bucketed join must stay Exchange-free below the join:\n$phys")
      df.collect()
      Seq("salt_sf", "salt_sd").foreach(t =>
        sql(s"DROP TABLE gsalt.default.$t"))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("ANN index probe opens exactly the probed cells' files: " +
      "PARTITIONED BY (cell_id) + literal probe list = the IVF read ratio") {
    def sql(q: String) = spark.sql(q)
    spark.conf.set("spark.sql.catalog.gann",
      classOf[graft.catalog.GraftCatalog].getName)
    def opens(body: => Unit): Long = {
      val before = graft.catalog.GraftStorage.fileOpens.get()
      body
      graft.catalog.GraftStorage.fileOpens.get() - before
    }
    sql("DROP TABLE IF EXISTS gann.default.probe_idx")
    // q275/q281's index layout at toy scale: 8 cells, one partition
    // (-> one data file) per cell
    sql("""CREATE TABLE gann.default.probe_idx PARTITIONED BY (cell_id)
           TBLPROPERTIES ('graft.mode'='mor','graft.row_id'='vec_id')
           AS SELECT id AS vec_id, id % 8 AS cell_id FROM range(0, 800)""")
    val t = spark.sessionState.catalogManager.catalog("gann")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("default"), "probe_idx"))
      .asInstanceOf[graft.catalog.GraftTable]
    val baseFiles = t.stateNow.current.get.files
    assert(baseFiles.size == 8,
      s"partitioned CTAS must split one file per cell: ${baseFiles.size}")
    // the q275 probe shape: a literal 2-cell IN list (nprobe=2 of
    // ncells=8) must read exactly those cells' files — the read ratio
    // IVF exists to buy; before r16 item 3 the index was unpartitioned
    // and every probe scanned the whole assignment table
    val n = opens {
      assert(sql("""SELECT COUNT(*) AS n FROM gann.default.probe_idx
                    WHERE cell_id IN (2, 5)""").head().getLong(0) == 200L)
    }
    assert(n <= 2, s"2-cell probe opened $n files (want <= 2: exact " +
      "partition pushdown may even serve the count from the manifest)")
    val rows = sql("""SELECT vec_id FROM gann.default.probe_idx
                      WHERE cell_id IN (2, 5) ORDER BY vec_id LIMIT 3""")
    val nRows = opens { assert(rows.collect().map(_.getLong(0)).toSeq ==
      Seq(2L, 5L, 10L)) }
    assert(nRows == 2, s"2-cell row probe opened $nRows files, want 2")
    // a curation MERGE keeps the layout: the moved vector's new cell
    // gains a delta, and the probe still opens only probed-cell files
    sql("""MERGE INTO gann.default.probe_idx t
           USING (SELECT 2 AS vec_id, 5 AS cell_id) s
           ON t.vec_id = s.vec_id
           WHEN MATCHED THEN UPDATE SET cell_id = s.cell_id""")
    assert(sql("""SELECT COUNT(*) FROM gann.default.probe_idx
                  WHERE cell_id = 5""").head().getLong(0) == 101L)
    sql("DROP TABLE gann.default.probe_idx")
  }

  test("histogram-detected NUMERIC hot key auto-salts too: degenerate " +
      "hot bins carry the mass share MCVs carry for strings") {
    def sql(q: String) = spark.sql(q)
    spark.conf.set("spark.sql.catalog.gsalt",
      classOf[graft.catalog.GraftCatalog].getName)
    // broadcast off for the same reason as the MCV test: the profit
    // gate refuses to salt a join BHJ already owns
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
    Seq("salt_nf", "salt_nd").foreach(t =>
      sql(s"DROP TABLE IF EXISTS gsalt.default.$t"))
    sql("CREATE TABLE gsalt.default.salt_nf (k BIGINT, v BIGINT)")
    // 90% of rows carry k = 7
    sql("INSERT INTO gsalt.default.salt_nf SELECT CASE WHEN id % 10 < 9 " +
      "THEN 7 ELSE id % 5 END, id FROM range(0, 1000)")
    sql("CREATE TABLE gsalt.default.salt_nd (k BIGINT, d STRING)")
    sql("INSERT INTO gsalt.default.salt_nd SELECT DISTINCT k, " +
      "concat('d_', k) FROM gsalt.default.salt_nf")
    val q = """SELECT dm.d, COUNT(*) AS n FROM gsalt.default.salt_nf f
               JOIN gsalt.default.salt_nd dm ON f.k = dm.k
               GROUP BY dm.d ORDER BY dm.d"""
    def optimized = sql(q).queryExecution.optimizedPlan.toString
    assert(!optimized.contains("__graft_salt"))
    val unsalted = sql(q).collect().toSeq
    // numeric column: MCV collection skips it; the 10-bin equi-height
    // histogram pins the hot value in >= 5 degenerate bins
    sql("CALL gsalt.system.analyze(table => 'default.salt_nf', " +
      "columns => 'k', buckets => 10, mcv => 3)")
    assert(optimized.contains("__graft_salt_s"),
      s"histogram-hot numeric key must salt:\n$optimized")
    assert(sql(q).collect().toSeq == unsalted)
    Seq("salt_nf", "salt_nd").foreach(t =>
      sql(s"DROP TABLE gsalt.default.$t"))
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
