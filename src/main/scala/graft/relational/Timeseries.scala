package graft.relational

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Event-stream analytics: closed-form OLS trend fitting, z-score
  * anomaly ranking, Markov next-event transitions, and two-proportion
  * A/B testing — all built so every cross-row reduction is an integer
  * sum (order-independent, map-side combinable) and IEEE arithmetic
  * appears only in per-row final projections — the suite's determinism
  * contract, applied to the statistics a monitoring / experimentation
  * pipeline computes over every metric.
  */
object Timeseries {

  /** Per-(event_type, day) counts with a day index x measured from the
    * GLOBAL min event date — derived from the data (one 1-row aggregate,
    * broadcast cross join), never a hard-coded epoch, so x is provably
    * non-negative at any date range. */
  private def daily(s: org.apache.spark.sql.SparkSession, d: String) = {
    val ev = Tables(s, d, "events")
      .select(col("event_type"), to_date(col("ts")).as("day"))
    val d0 = ev.agg(min("day").as("d0"))
    ev.groupBy("event_type", "day").agg(count(lit(1)).as("y"))
      .crossJoin(broadcast(d0))
      .withColumn("x", datediff(col("day"), col("d0")).cast("long"))
  }

  private val duckDaily =
    """ev AS (SELECT event_type, CAST(ts AS DATE) AS day FROM events),
      |d0 AS (SELECT min(day) AS d0 FROM ev),
      |daily AS (SELECT event_type, day, count(*) AS y,
      |                 CAST(date_diff('day', (SELECT d0 FROM d0), day)
      |                   AS BIGINT) AS x
      |          FROM ev GROUP BY 1, 2)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // -------------------------------------------------------------- q149:
    // Per-group OLS trend over daily counts, closed form:
    //   slope     = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
    //   intercept = (Σy·Σx² − Σx·Σxy) / (n·Σx² − (Σx)²)
    // Numerators and denominator are EXACT BIGINT cross-multiplications
    // of plain integer sums — no float accumulation across rows, so the
    // result is independent of partitioning and both engines agree
    // bit-for-bit after the single final division. Overflow bound:
    // x ≤ days, y ≤ rows/day ⇒ n·Σxy ≤ days²·rows — int64-safe through
    // ~10^9 daily rows over a decade; past that the sums switch to
    // DECIMAL(38,0) with the same plan.
    //
    // Scale shape: one map-side-combined (group, day) count (the only
    // corpus-sized shuffle), then one map-side-combined 5-sum fold per
    // group — at 100 TB the second stage carries groups × 5 longs.
    QueryDef(
      "q149_trend_ols",
      (s, d) => {
        val agg = daily(s, d).groupBy("event_type").agg(
          count(lit(1)).as("n"),
          sum("x").as("sx"),
          sum("y").as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"))
        agg
          .withColumn("den", col("n") * col("sxx") - col("sx") * col("sx"))
          .select(col("event_type"), col("n").as("n_days"),
            col("sy").as("total_events"),
            when(col("den") > 0, round(
              (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
                col("den").cast("double"), 6)).as("slope"),
            when(col("den") > 0, round(
              (col("sy") * col("sxx") - col("sx") * col("sxy")).cast("double") /
                col("den").cast("double"), 6)).as("intercept"))
          .orderBy("event_type")
      },
      Some(s"""
        WITH $duckDaily,
        a AS (SELECT event_type,
                     count(*) AS n,
                     CAST(sum(x) AS BIGINT) AS sx,
                     CAST(sum(y) AS BIGINT) AS sy,
                     CAST(sum(x * y) AS BIGINT) AS sxy,
                     CAST(sum(x * x) AS BIGINT) AS sxx
              FROM daily GROUP BY 1)
        SELECT event_type, n AS n_days, sy AS total_events,
               CASE WHEN n * sxx - sx * sx > 0 THEN round(
                 CAST(n * sxy - sx * sy AS DOUBLE) /
                 CAST(n * sxx - sx * sx AS DOUBLE), 6) END AS slope,
               CASE WHEN n * sxx - sx * sx > 0 THEN round(
                 CAST(sy * sxx - sx * sxy AS DOUBLE) /
                 CAST(n * sxx - sx * sx AS DOUBLE), 6) END AS intercept
        FROM a ORDER BY event_type""")),

    // -------------------------------------------------------------- q150:
    // Daily-count anomaly ranking: top-3 most anomalous days per group by
    // population z-score. The RANKING key is the integer |y·n − S1|
    // (∝ |z| within a group, since n and σ are per-group constants) with
    // the day as tiebreaker — float comparisons never decide order. The
    // reported z itself is computed in ONE final per-row projection:
    // mean = S1/n, var = (n·S2 − S1²)/n² (exact BIGINT numerator),
    // z = (y − mean)/sqrt(var) — IEEE sqrt is correctly rounded, so both
    // engines produce the identical double. Zero-variance groups emit
    // NULL z (every day identical ⇒ nothing is anomalous).
    QueryDef(
      "q150_daily_anomaly",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val stats = daily(s, d).groupBy("event_type").agg(
          count(lit(1)).as("n"),
          sum("y").as("s1"),
          sum(col("y") * col("y")).as("s2"))
        val w = Window.partitionBy("event_type")
          .orderBy(abs(col("y") * col("n") - col("s1")).desc, col("day"))
        daily(s, d).join(broadcast(stats), "event_type")
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 3)
          .withColumn("varnum", col("n") * col("s2") - col("s1") * col("s1"))
          .select(col("event_type"), col("rank"), col("day"), col("y"),
            when(col("varnum") > 0, round(
              (col("y").cast("double") -
                col("s1").cast("double") / col("n").cast("double")) /
                sqrt(col("varnum").cast("double") /
                  (col("n") * col("n")).cast("double")), 4)).as("z_score"))
          .orderBy("event_type", "rank")
      },
      Some(s"""
        WITH $duckDaily,
        st AS (SELECT event_type,
                      count(*) AS n,
                      CAST(sum(y) AS BIGINT) AS s1,
                      CAST(sum(y * y) AS BIGINT) AS s2
               FROM daily GROUP BY 1),
        r AS (SELECT d.event_type, d.day, d.y, st.n, st.s1, st.s2,
                     CAST(ROW_NUMBER() OVER (PARTITION BY d.event_type
                       ORDER BY abs(d.y * st.n - st.s1) DESC, d.day)
                       AS INTEGER) AS rank
              FROM daily d JOIN st USING (event_type))
        SELECT event_type, rank, day, y,
               CASE WHEN n * s2 - s1 * s1 > 0 THEN round(
                 (CAST(y AS DOUBLE) - CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                 / sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE) /
                        CAST(n * n AS DOUBLE)), 4) END AS z_score
        FROM r WHERE rank <= 3
        ORDER BY event_type, rank""")),

    // -------------------------------------------------------------- q151:
    // Markov next-event transition matrix: per-user event sequences
    // (total order: ts, then event_id — duplicate timestamps never make
    // the lag nondeterministic, the q125 advisor lesson), consecutive
    // (src → dst) pairs counted, conditional p(dst|src) as integer counts
    // with one final division. The |types|² matrix and the |types| row
    // totals are broadcast-sized at ANY event volume — the only
    // corpus-sized operation is the one shuffle on user_id for the
    // sequence window.
    QueryDef(
      "q151_markov_transitions",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id")
          .orderBy("ts", "event_id")
        val trans = Tables(s, d, "events")
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type").as("src"))
          .withColumn("dst", lead("src", 1).over(w))
          .filter(col("dst").isNotNull)
          .groupBy("src", "dst").agg(count(lit(1)).as("n_trans"))
        val totals = trans.groupBy("src")
          .agg(sum("n_trans").as("n_src"))
        trans.join(broadcast(totals), "src")
          .select(col("src"), col("dst"), col("n_trans"),
            round(col("n_trans").cast("double") /
              col("n_src").cast("double"), 6).as("p_cond"))
          .orderBy("src", "dst")
      },
      Some("""
        WITH seq AS (SELECT user_id, event_type AS src,
                       lead(event_type) OVER (PARTITION BY user_id
                         ORDER BY ts, event_id) AS dst
                     FROM events),
        tr AS (SELECT src, dst, count(*) AS n_trans
               FROM seq WHERE dst IS NOT NULL GROUP BY 1, 2),
        tot AS (SELECT src, CAST(sum(n_trans) AS BIGINT) AS n_src
                FROM tr GROUP BY 1)
        SELECT tr.src, tr.dst, tr.n_trans,
               round(CAST(tr.n_trans AS DOUBLE) /
                 CAST(tot.n_src AS DOUBLE), 6) AS p_cond
        FROM tr JOIN tot USING (src)
        ORDER BY tr.src, tr.dst""")),

    // -------------------------------------------------------------- q152:
    // Two-proportion A/B test: arms by user_id parity (the deterministic
    // hash-split an experimentation system does), conversion = any
    // purchase with value > 180. Everything reduces to four integers
    // (n, k per arm) — the rates, lift, pooled rate, and z statistic are
    // ONE final row of IEEE arithmetic written identically in both
    // engines (sqrt is correctly rounded, so the doubles agree
    // bit-for-bit). At 100 TB the corpus shuffles once on user_id to
    // decide per-user conversion; the rest is a 2-row fold.
    QueryDef(
      "q152_ab_test",
      (s, d) => {
        val users = Tables(s, d, "events")
          .groupBy("user_id").agg(
            max(when(col("event_type") === "purchase" &&
              col("value") > 180.0, 1L).otherwise(0L)).as("converted"))
          .withColumn("arm", (col("user_id") % 2).cast("int"))
        val arms = users.groupBy("arm").agg(
          count(lit(1)).as("n"),
          sum("converted").as("k"))
        val c = arms.filter(col("arm") === 0)
          .select(col("n").as("n_c"), col("k").as("k_c"))
        val t = arms.filter(col("arm") === 1)
          .select(col("n").as("n_t"), col("k").as("k_t"))
        c.crossJoin(t) // 1 row x 1 row
          .withColumn("rate_c",
            col("k_c").cast("double") / col("n_c").cast("double"))
          .withColumn("rate_t",
            col("k_t").cast("double") / col("n_t").cast("double"))
          .withColumn("p_pool",
            (col("k_c") + col("k_t")).cast("double") /
              (col("n_c") + col("n_t")).cast("double"))
          .select(col("n_c"), col("k_c"), col("n_t"), col("k_t"),
            round(col("rate_c"), 6).as("rate_c"),
            round(col("rate_t"), 6).as("rate_t"),
            round(col("rate_t") / col("rate_c"), 6).as("lift"),
            round((col("rate_t") - col("rate_c")) /
              sqrt(col("p_pool") * (lit(1.0) - col("p_pool")) *
                (lit(1.0) / col("n_c").cast("double") +
                  lit(1.0) / col("n_t").cast("double"))), 4).as("z_stat"))
      },
      Some("""
        WITH u AS (SELECT user_id,
                     max(CASE WHEN event_type = 'purchase' AND value > 180
                       THEN 1 ELSE 0 END) AS converted
                   FROM events GROUP BY 1),
        arms AS (SELECT CAST(user_id % 2 AS INTEGER) AS arm,
                        count(*) AS n,
                        CAST(sum(converted) AS BIGINT) AS k
                 FROM u GROUP BY 1),
        c AS (SELECT n AS n_c, k AS k_c FROM arms WHERE arm = 0),
        t AS (SELECT n AS n_t, k AS k_t FROM arms WHERE arm = 1),
        x AS (SELECT n_c, k_c, n_t, k_t,
                     CAST(k_c AS DOUBLE) / CAST(n_c AS DOUBLE) AS rate_c,
                     CAST(k_t AS DOUBLE) / CAST(n_t AS DOUBLE) AS rate_t,
                     CAST(k_c + k_t AS DOUBLE) / CAST(n_c + n_t AS DOUBLE)
                       AS p_pool
              FROM c, t)
        SELECT n_c, k_c, n_t, k_t,
               round(rate_c, 6) AS rate_c,
               round(rate_t, 6) AS rate_t,
               round(rate_t / rate_c, 6) AS lift,
               round((rate_t - rate_c) /
                 sqrt(p_pool * (1.0 - p_pool) *
                   (1.0 / CAST(n_c AS DOUBLE) + 1.0 / CAST(n_t AS DOUBLE))),
                 4) AS z_stat
        FROM x""")),

    // -------------------------------------------------------------- q161:
    // Time-weighted average value (TWAP) per user: each observation's
    // value is weighted by how long it remained current (the gap to the
    // user's next event; the final observation carries zero weight —
    // the standard right-open convention). The arithmetic mean
    // overweights bursts; TWAP is what billing / monitoring actually
    // wants from an irregular event stream.
    //
    // Determinism: weights are INTEGER microsecond gaps (lead over the
    // per-user order, unique ts tiebreak on event_id); value is scaled
    // to integer 1e4-units (the fixture's 4-decimal domain), so every
    // cross-row sum is a BIGINT fold — wt_us < 2^40, value_u < 2^24,
    // products < 2^63 overflow-safe — and ONE final IEEE division per
    // user produces the average. No float ever folds across rows.
    //
    // Scale shape: one shuffle on user_id for the window, then the
    // aggregation reuses the same partitioning (no second exchange —
    // Catalyst sees the groupBy key equal to the window partition key).
    QueryDef(
      "q161_time_weighted_avg",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts"), col("event_id"))
        Tables(s, d, "events")
          .filter(col("user_id") < 100)
          .withColumn("next_us",
            lead(unix_micros(col("ts")), 1).over(w))
          .withColumn("wt_us",
            coalesce(col("next_us") - unix_micros(col("ts")), lit(0L)))
          .withColumn("value_u",
            expr("CAST(round(value * 1e4) AS BIGINT)"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_events"),
            sum("wt_us").as("span_us"),
            sum(expr("wt_us * value_u")).as("wsum"))
          .filter(col("span_us") > 0)
          .select(col("user_id"), col("n_events"), col("span_us"),
            round(col("wsum").cast("double") /
              (col("span_us").cast("double") * 1e4), 6).as("twap"))
          .orderBy("user_id")
      },
      Some("""
        WITH e AS (SELECT user_id, event_id, ts, value,
                     CAST(epoch_us(lead(ts) OVER
                            (PARTITION BY user_id ORDER BY ts, event_id))
                          - epoch_us(ts) AS BIGINT) AS wt_us
                   FROM events WHERE user_id < 100),
        g AS (SELECT user_id,
                COUNT(*) AS n_events,
                CAST(SUM(COALESCE(wt_us, 0)) AS BIGINT) AS span_us,
                CAST(SUM(COALESCE(wt_us, 0) *
                     CAST(round(value * 1e4) AS BIGINT)) AS BIGINT) AS wsum
              FROM e GROUP BY 1)
        SELECT user_id, n_events, span_us,
               round(CAST(wsum AS DOUBLE) /
                     (CAST(span_us AS DOUBLE) * 1e4), 6) AS twap
        FROM g WHERE span_us > 0
        ORDER BY user_id""")),

    // -------------------------------------------------------------- q165:
    // Daily EXACT percentile bands per event_type (P50/P95 of value) —
    // the latency-dashboard primitive. Percentile = the value at sorted
    // position floor((n−1)·p) (0-based), selected by RANK, not
    // interpolated: picking an order statistic is engine-exact (the
    // value at a sorted position is a multiset property — tie order
    // can't change it), where interpolation would add cross-engine IEEE
    // arithmetic for nothing a dashboard needs.
    //
    // Scale shape: one shuffle on (event_type, day); the window sorts
    // WITHIN each group, so per-group volume is a day×type slice —
    // bounded for monitoring workloads. For a group too large to sort
    // in one task, q154's two-phase stripe-rank method computes the
    // same exact rank with no global sort; this query is the
    // small-group fast path.
    QueryDef(
      "q165_daily_percentiles",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("event_type", "day")
          .orderBy(col("value"), col("event_id"))
        val wn = Window.partitionBy("event_type", "day")
        Tables(s, d, "events")
          .select(col("event_type"), to_date(col("ts")).as("day"),
            col("value"), col("event_id"))
          .withColumn("r", row_number().over(w))
          .withColumn("n", count(lit(1)).over(wn))
          .groupBy("event_type", "day")
          .agg(max("n").as("n"),
            max(when(col("r") === expr("(n - 1) * 50 DIV 100 + 1"),
              col("value"))).as("p50"),
            max(when(col("r") === expr("(n - 1) * 95 DIV 100 + 1"),
              col("value"))).as("p95"))
          .orderBy("event_type", "day")
      },
      Some("""
        WITH e AS (SELECT event_type, CAST(ts AS DATE) AS day,
                          value, event_id
                   FROM events),
        r AS (SELECT event_type, day, value,
                ROW_NUMBER() OVER (PARTITION BY event_type, day
                                   ORDER BY value, event_id) AS r,
                COUNT(*) OVER (PARTITION BY event_type, day) AS n
              FROM e)
        SELECT event_type, day, CAST(MAX(n) AS BIGINT) AS n,
               MAX(CASE WHEN r = ((n - 1) * 50) // 100 + 1
                        THEN value END) AS p50,
               MAX(CASE WHEN r = ((n - 1) * 95) // 100 + 1
                        THEN value END) AS p95
        FROM r GROUP BY 1, 2
        ORDER BY event_type, day""")),

    // -------------------------------------------------------------- q166:
    // LOCF densification (last observation carried forward): sparse
    // per-user observations become a DENSE daily series — each user's
    // calendar spine runs from their first to their last event day
    // (q62's generator, per key), and days without an observation carry
    // the previous day's closing value. The daily-balance / position
    // snapshot every ledger pipeline materializes.
    //
    // Determinism: the day's closing value is the LAST event by
    // (ts, event_id) — an order-statistic pick, no arithmetic. Scale
    // shape: closing values are one (user, day) aggregate; the spine
    // explode fans out |users|·|days-active| rows (bounded by the
    // calendar, not the event volume — a user with 1M events in a day
    // still yields one spine row); the carry-forward window rides the
    // same user_id partitioning the aggregate produced.
    QueryDef(
      "q166_locf_daily_balance",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val wPick = Window.partitionBy("user_id", "day")
          .orderBy(col("ts").desc, col("event_id").desc)
        val closing = Tables(s, d, "events")
          .filter(col("user_id") < 30)
          .withColumn("day", to_date(col("ts")))
          .withColumn("rn", row_number().over(wPick))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("day"), col("value").as("close_value"))
        val spine = closing.groupBy("user_id")
          .agg(min("day").as("d0"), max("day").as("d1"))
          .select(col("user_id"),
            explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
        val wFill = Window.partitionBy("user_id")
          .orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        spine.join(closing, Seq("user_id", "day"), "left")
          .withColumn("balance",
            last(col("close_value"), ignoreNulls = true).over(wFill))
          .withColumn("is_carried", col("close_value").isNull)
          .select("user_id", "day", "balance", "is_carried")
          .orderBy("user_id", "day")
      },
      Some("""
        WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day, ts, event_id,
                          value
                   FROM events WHERE user_id < 30),
        pick AS (SELECT user_id, day, value AS close_value,
                   ROW_NUMBER() OVER (PARTITION BY user_id, day
                                      ORDER BY ts DESC, event_id DESC) AS rn
                 FROM e),
        closing AS (SELECT user_id, day, close_value FROM pick WHERE rn = 1),
        spine AS (SELECT user_id,
                    unnest(generate_series(min(day), max(day),
                                           INTERVAL 1 DAY)) AS day
                  FROM closing GROUP BY user_id),
        j AS (SELECT s.user_id, CAST(s.day AS DATE) AS day, c.close_value
              FROM spine s LEFT JOIN closing c
                ON c.user_id = s.user_id AND c.day = CAST(s.day AS DATE))
        SELECT user_id, day,
               LAST_VALUE(close_value IGNORE NULLS) OVER
                 (PARTITION BY user_id ORDER BY day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS balance,
               close_value IS NULL AS is_carried
        FROM j
        ORDER BY user_id, day""")),

    // -------------------------------------------------------------- q175:
    // Pointwise mutual information between event types co-occurring in
    // the same (user, hour) basket — "which behaviors actually go
    // together beyond chance" (PMI > 0) vs "which repel" (PMI < 0), the
    // association measure q155's lift is the ratio form of. Every input
    // to the formula is an exact integer (basket counts via the q155
    // explode-pairs trick — never a basket self-join); PMI itself is
    // ONE ln() per output row, rounded to 6dp (the q63 guard). The
    // |types|² output is broadcast-sized at ANY event volume.
    QueryDef(
      "q175_event_pmi",
      (s, d) => {
        val bk = Tables(s, d, "events")
          .select(col("user_id"), date_trunc("hour", col("ts")).as("hr"),
            col("event_type"))
          .groupBy("user_id", "hr")
          .agg(sort_array(collect_set(col("event_type"))).as("arr"))
        val nB = bk.agg(count(lit(1)).as("n_baskets"))
        val marg = bk.select(explode(col("arr")).as("t"))
          .groupBy("t").agg(count(lit(1)).as("n_t"))
        val pairs = bk
          .select(explode(expr(
            """flatten(transform(arr, (x, i) ->
              |  transform(slice(arr, i + 2, size(arr)),
              |            y -> struct(x AS ta, y AS tb))))""".stripMargin))
            .as("p"))
          .select(col("p.ta"), col("p.tb"))
          .groupBy("ta", "tb").agg(count(lit(1)).as("n_ab"))
        pairs
          .join(broadcast(marg.select(col("t").as("ta"),
            col("n_t").as("n_a"))), "ta")
          .join(broadcast(marg.select(col("t").as("tb"),
            col("n_t").as("n_b"))), "tb")
          .crossJoin(broadcast(nB))
          .select(col("ta"), col("tb"), col("n_ab"), col("n_a"), col("n_b"),
            round(log((col("n_ab") * col("n_baskets")).cast("double") /
              (col("n_a") * col("n_b")).cast("double")), 6).as("pmi"))
          .orderBy("ta", "tb")
      },
      Some("""
        WITH bk AS (SELECT user_id, date_trunc('hour', ts) AS hr,
                           list_sort(list_distinct(list(event_type))) AS arr
                    FROM events GROUP BY 1, 2),
        n AS (SELECT count(*) AS n_baskets FROM bk),
        m AS (SELECT t, count(*) AS n_t
              FROM (SELECT unnest(arr) AS t FROM bk) GROUP BY 1),
        pr AS (SELECT x.t AS ta, y.t AS tb, count(*) AS n_ab FROM (
                 SELECT user_id, hr, unnest(arr) AS t FROM bk) x
               JOIN (SELECT user_id, hr, unnest(arr) AS t FROM bk) y
                 ON x.user_id = y.user_id AND x.hr = y.hr AND x.t < y.t
               GROUP BY 1, 2)
        SELECT pr.ta, pr.tb, pr.n_ab, ma.n_t AS n_a, mb.n_t AS n_b,
               round(ln(CAST(pr.n_ab * n.n_baskets AS DOUBLE) /
                        CAST(ma.n_t * mb.n_t AS DOUBLE)), 6) AS pmi
        FROM pr
        JOIN m ma ON ma.t = pr.ta
        JOIN m mb ON mb.t = pr.tb
        CROSS JOIN n
        ORDER BY ta, tb""")),

    // -------------------------------------------------------------- q177:
    // Day-of-week seasonality profile per event_type: each type's share
    // of events by weekday and its seasonality index (share × 7 — 1.0 =
    // flat, >1 = overrepresented day), the weekly fingerprint an ops
    // dashboard draws and an anomaly detector normalizes by before
    // alerting (a Monday spike is only a spike relative to Mondays).
    // Counts are exact integers on a 7×|types| key; the two divisions
    // are the only IEEE ops, rounded at 6dp. Weekday = Spark weekday()
    // == DuckDB isodow − 1 (the q20 equivalence, Monday = 0).
    QueryDef(
      "q177_weekday_seasonality",
      (s, d) => {
        val byDow = Tables(s, d, "events")
          .select(col("event_type"), weekday(col("ts")).cast("int").as("wd"))
          .groupBy("event_type", "wd").agg(count(lit(1)).as("n"))
        val totals = byDow.groupBy("event_type")
          .agg(sum("n").as("n_type"))
        byDow.join(broadcast(totals), "event_type")
          .select(col("event_type"), col("wd"), col("n"),
            round(col("n").cast("double") /
              col("n_type").cast("double"), 6).as("share"),
            round(col("n").cast("double") * 7.0 /
              col("n_type").cast("double"), 6).as("seasonality_idx"))
          .orderBy("event_type", "wd")
      },
      Some("""
        WITH b AS (SELECT event_type,
                          CAST(isodow(ts) - 1 AS INTEGER) AS wd,
                          count(*) AS n
                   FROM events GROUP BY 1, 2),
        t AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS n_type
              FROM b GROUP BY 1)
        SELECT b.event_type, b.wd, b.n,
               round(CAST(b.n AS DOUBLE) / CAST(t.n_type AS DOUBLE), 6)
                 AS share,
               round(CAST(b.n AS DOUBLE) * 7.0 / CAST(t.n_type AS DOUBLE), 6)
                 AS seasonality_idx
        FROM b JOIN t USING (event_type)
        ORDER BY event_type, wd""")),

    // -------------------------------------------------------------- q179:
    // Chi-square INDEPENDENCE test on the event_type × weekday
    // contingency table — "is behavior mix actually day-dependent?",
    // the inferential complement of q177's descriptive profile (and a
    // different test from q176's goodness-of-fit and q152's z-test:
    // this one has no assumed distribution, expectations come from the
    // margins). Observed counts and all three margins are exact
    // integers; each cell's expected value and χ² term is one IEEE
    // expression rounded at 6dp, and the table-level χ² folds the
    // ROUNDED terms as BIGINT 1e6-units so the 35-cell sum is
    // order-free. Contingency tables are |types|×7 at any volume.
    QueryDef(
      "q179_chi2_independence",
      (s, d) => {
        val cells = Tables(s, d, "events")
          .select(col("event_type"), weekday(col("ts")).cast("int").as("wd"))
          .groupBy("event_type", "wd").agg(count(lit(1)).as("n_obs"))
        val rowT = cells.groupBy("event_type").agg(sum("n_obs").as("n_row"))
        val colT = cells.groupBy("wd").agg(sum("n_obs").as("n_col"))
        val grand = cells.agg(sum("n_obs").as("n_all"))
        val scored = cells
          .join(broadcast(rowT), "event_type")
          .join(broadcast(colT), "wd")
          .crossJoin(broadcast(grand))
          .withColumn("expected", round(
            (col("n_row") * col("n_col")).cast("double") /
              col("n_all").cast("double"), 6))
          .withColumn("chi2_term", round(
            expr("""pow(CAST(n_obs AS DOUBLE) -
                   |  CAST(n_row * n_col AS DOUBLE) / CAST(n_all AS DOUBLE), 2)
                   |/ (CAST(n_row * n_col AS DOUBLE) / CAST(n_all AS DOUBLE))"""
              .stripMargin), 6))
        val total = scored
          .agg((sum(expr("CAST(round(chi2_term * 1e6) AS BIGINT)"))
            .cast("double") / 1e6).as("chi2_total"))
        scored.crossJoin(broadcast(total))
          .select(col("event_type"), col("wd"), col("n_obs"),
            col("expected"), col("chi2_term"), col("chi2_total"))
          .orderBy("event_type", "wd")
      },
      Some("""
        WITH c AS (SELECT event_type,
                          CAST(isodow(ts) - 1 AS INTEGER) AS wd,
                          count(*) AS n_obs
                   FROM events GROUP BY 1, 2),
        rt AS (SELECT event_type, CAST(sum(n_obs) AS BIGINT) AS n_row
               FROM c GROUP BY 1),
        ct AS (SELECT wd, CAST(sum(n_obs) AS BIGINT) AS n_col
               FROM c GROUP BY 1),
        g AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n_all FROM c),
        sc AS (SELECT c.event_type, c.wd, c.n_obs,
                 round(CAST(rt.n_row * ct.n_col AS DOUBLE) /
                   CAST(g.n_all AS DOUBLE), 6) AS expected,
                 round(pow(CAST(c.n_obs AS DOUBLE) -
                     CAST(rt.n_row * ct.n_col AS DOUBLE) /
                     CAST(g.n_all AS DOUBLE), 2)
                   / (CAST(rt.n_row * ct.n_col AS DOUBLE) /
                      CAST(g.n_all AS DOUBLE)), 6) AS chi2_term
               FROM c JOIN rt USING (event_type) JOIN ct USING (wd)
               CROSS JOIN g),
        tot AS (SELECT CAST(sum(CAST(round(chi2_term * 1e6) AS BIGINT))
                  AS DOUBLE) / 1e6 AS chi2_total FROM sc)
        SELECT event_type, wd, n_obs, expected, chi2_term, chi2_total
        FROM sc CROSS JOIN tot
        ORDER BY event_type, wd""")),

    // -------------------------------------------------------------- q180:
    // Rolling 7-day active users (the WAU curve) — the growth metric
    // every product dashboard leads with, computed the SCALABLE way:
    // each distinct (user, day) incidence fans out to the ≤7 window-end
    // days it contributes to (a bounded ×7 expand of the |user-days|
    // frame), then one distinct count per end day. The naive
    // formulation re-scans the corpus per day (365 scans/year) or
    // range-joins days × activity; this is one scan + one bounded
    // expand + one exact distinct aggregate, at any event volume.
    QueryDef(
      "q180_rolling_wau",
      (s, d) => {
        val ud = Tables(s, d, "events")
          .select(col("user_id"), to_date(col("ts")).as("day"))
          .distinct()
        val dmax = ud.agg(max("day").as("dmax"))
        ud.select(col("user_id"),
            explode(expr("sequence(0, 6)")).as("g"), col("day"))
          .select(col("user_id"), expr("date_add(day, g)").as("wday"))
          .crossJoin(broadcast(dmax))
          .filter(col("wday") <= col("dmax"))
          .groupBy("wday")
          .agg(countDistinct(col("user_id")).as("wau"))
          .orderBy("wday")
      },
      Some("""
        WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
                    FROM events),
        mx AS (SELECT max(day) AS dmax FROM ud),
        ex AS (SELECT user_id, day + CAST(g AS INTEGER) AS wday
               FROM ud, (SELECT unnest(generate_series(0, 6)) AS g))
        SELECT CAST(wday AS DATE) AS wday,
               count(DISTINCT user_id) AS wau
        FROM ex, mx
        WHERE wday <= dmax
        GROUP BY 1
        ORDER BY wday"""))
  )
}
