package graft.sketch

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.text.TextAnalysis.{duckTokens, tokensExpr}

/** Probabilistic-sketch operators, made deterministic enough to
  * oracle-pair: a HyperLogLog cardinality sketch and a Count-Min
  * frequency sketch, both with registers derived from md5 (the suite's
  * cross-engine hash — see [[graft.util.Hashing]]) and folded with
  * integer-exact arithmetic. Together with q133's Misra–Gries heavy
  * hitters these form the sketch battery a 100 TB profiler runs instead
  * of exact aggregation: registers are FIXED-size regardless of input
  * cardinality, so the shuffle is O(groups × registers), never O(keys).
  *
  * Sketch estimates are normally nondeterministic across engines because
  * the hash differs; here BOTH engines compute the identical md5-derived
  * registers, so even the ESTIMATES hash-match — the oracle checks the
  * full sketch math, not just a tolerance band.
  */
object Sketches {

  val defs: Seq[QueryDef] = Seq(

    // -------------------------------------------------------------- q147:
    // HyperLogLog distinct-count per event_type (m = 64 registers).
    // Register index = 8 md5 bits mod 64; rho = leading-zero rank of the
    // next 56 bits, extracted by STRING ops on the md5 hex (leading '0'
    // digits + a 4-way CASE on the first non-zero digit) — no
    // transcendental log2, so both engines agree bit-for-bit. Register
    // fold is max(rho) (order-independent); the harmonic sum is the
    // integer-exact Σ 2^(56 − M[j]) (each term a BIGINT power of two,
    // 64 · 2^56 < 2^63 — no overflow, no float-order sensitivity); the
    // only IEEE op is ONE final division. Raw HLL estimate only: the
    // small-range linear-counting correction needs ln(), which is not
    // cross-engine stable — v_zero is emitted so a caller can apply it.
    //
    // Scale shape: per (event_type, j) max is map-side combined — the
    // shuffle after the scan carries at most groups × 64 rows no matter
    // how many events; the dense-register frame is groups × 64 literals.
    // The exact countDistinct alongside is the AUDIT (it re-shuffles the
    // key space); a production run at 100 TB ships only the sketch.
    QueryDef(
      "q147_hll_cardinality",
      (s, d) => {
        val ev = Tables(s, d, "events")
        val h = ev
          .select(col("event_type"),
            md5(concat(lit("q147:"), col("event_id").cast("string")))
              .as("hex"))
          .select(col("event_type"),
            expr("CAST(CAST(conv(substr(hex, 1, 2), 16, 10) AS BIGINT) " +
              "% 64 AS INT)").as("j"),
            expr("substr(hex, 3, 14)").as("tail"))
          .withColumn("nlz", length(regexp_extract(col("tail"), "^(0*)", 1)))
          .withColumn("d1", expr("substr(tail, nlz + 1, 1)"))
          .withColumn("rho", expr(
            """CAST(LEAST(CASE WHEN d1 = '' THEN 57 ELSE nlz * 4 + 1 +
              |  (CASE WHEN d1 = '1' THEN 3
              |        WHEN d1 IN ('2', '3') THEN 2
              |        WHEN d1 IN ('4', '5', '6', '7') THEN 1
              |        ELSE 0 END) END, 56) AS INT)""".stripMargin))
        val regs = h.groupBy("event_type", "j").agg(max("rho").as("m"))
        val dense = ev.select("event_type").distinct()
          .select(col("event_type"), explode(expr("sequence(0, 63)")).as("j"))
        val sk = dense.join(regs, Seq("event_type", "j"), "left")
          .withColumn("m", coalesce(col("m"), lit(0)))
          .groupBy("event_type").agg(
            sum(expr("shiftleft(CAST(1 AS BIGINT), 56 - m)")).as("s_reg"),
            sum(when(col("m") === 0, 1L).otherwise(0L)).as("v_zero"))
        val exact = ev.groupBy("event_type")
          .agg(countDistinct("event_id").as("n_exact"))
        sk.join(exact, "event_type")
          .withColumn("est_raw",
            lit(0.709) * lit(4096.0) * lit(72057594037927936.0) /
              col("s_reg").cast("double"))
          .select(col("event_type"), col("n_exact"), col("v_zero"),
            round(col("est_raw"), 3).as("hll_est"),
            round(abs(col("est_raw") - col("n_exact").cast("double")) /
              col("n_exact").cast("double"), 4).as("rel_err"))
          .orderBy("event_type")
      },
      Some("""
        WITH h AS (SELECT event_type,
                     md5('q147:' || CAST(event_id AS VARCHAR)) AS hex
                   FROM events),
        x AS (SELECT event_type,
                CAST(CAST(concat('0x', substr(hex, 1, 2)) AS BIGINT) % 64
                  AS INTEGER) AS j,
                substr(hex, 3, 14) AS tail
              FROM h),
        r AS (SELECT event_type, j,
                length(regexp_extract(tail, '^(0*)', 1)) AS nlz,
                substr(tail,
                  length(regexp_extract(tail, '^(0*)', 1)) + 1, 1) AS d1
              FROM x),
        rr AS (SELECT event_type, j,
                 CAST(LEAST(CASE WHEN d1 = '' THEN 57 ELSE nlz * 4 + 1 +
                   (CASE WHEN d1 = '1' THEN 3
                         WHEN d1 IN ('2', '3') THEN 2
                         WHEN d1 IN ('4', '5', '6', '7') THEN 1
                         ELSE 0 END) END, 56) AS INTEGER) AS rho
               FROM r),
        regs AS (SELECT event_type, j, max(rho) AS m FROM rr GROUP BY 1, 2),
        dense AS (SELECT DISTINCT e.event_type, g.j
                  FROM events e,
                       (SELECT unnest(generate_series(0, 63)) AS j) g),
        fl AS (SELECT d.event_type, d.j, COALESCE(regs.m, 0) AS m
               FROM dense d LEFT JOIN regs USING (event_type, j)),
        sk AS (SELECT event_type,
                 CAST(sum(CAST(1 AS BIGINT) << (56 - m)) AS BIGINT) AS s_reg,
                 CAST(sum(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS v_zero
               FROM fl GROUP BY 1),
        ex AS (SELECT event_type, count(DISTINCT event_id) AS n_exact
               FROM events GROUP BY 1),
        est AS (SELECT s.event_type, e.n_exact, s.v_zero,
                  CAST(0.709 AS DOUBLE) * CAST(4096 AS DOUBLE) *
                    CAST(72057594037927936 AS DOUBLE) /
                    CAST(s.s_reg AS DOUBLE) AS est_raw
                FROM sk s JOIN ex e USING (event_type))
        SELECT event_type, n_exact, v_zero,
               round(est_raw, 3) AS hll_est,
               round(abs(est_raw - CAST(n_exact AS DOUBLE)) /
                 CAST(n_exact AS DOUBLE), 4) AS rel_err
        FROM est ORDER BY event_type""")),

    // -------------------------------------------------------------- q148:
    // Count-Min frequency sketch over the token stream (depth 4 × width
    // 256), probed at the exact top-20 terms. The sketch is built from
    // the AGGREGATED vocab (term, cnt) — cell[r][i] = Σ cnt over terms
    // hashing to (r, i) — not from raw occurrences: one corpus shuffle
    // produces the vocab (q123's shape), then the 4 × vocab hash fan-out
    // and the 1024-cell fold are vocab-sized, trivial at any corpus
    // scale. Registers are BIGINT sums (order-independent); the probe
    // joins 20 × 4 cells and takes min — all integer, fully
    // deterministic. CMS guarantees est ≥ exact; `over_est` shows the
    // collision inflation directly.
    QueryDef(
      "q148_cms_frequency",
      (s, d) => {
        import graft.util.Hashing.sparkMd5Long
        val docs = Tables(s, d, "documents")
        val vocab = docs
          .select(explode(expr(tokensExpr)).as("term"))
          .groupBy("term").agg(count(lit(1)).as("cnt"))
        val hashed = vocab
          .select(col("term"), col("cnt"),
            explode(expr("sequence(0, 3)")).as("r"))
          .withColumn("idx", expr(
            s"CAST(${sparkMd5Long("concat('q148:', CAST(r AS STRING), ':', term)")} % 256 AS INT)"))
        val cells = hashed.groupBy("r", "idx")
          .agg(sum("cnt").as("cell"))
        val probe = vocab
          .orderBy(col("cnt").desc, col("term")).limit(20)
          .select(col("term"), col("cnt").as("n_exact"),
            explode(expr("sequence(0, 3)")).as("r"))
          .withColumn("idx", expr(
            s"CAST(${sparkMd5Long("concat('q148:', CAST(r AS STRING), ':', term)")} % 256 AS INT)"))
        probe.join(broadcast(cells), Seq("r", "idx"))
          .groupBy("term", "n_exact").agg(min("cell").as("cms_est"))
          .select(col("term"), col("n_exact"), col("cms_est"),
            (col("cms_est") - col("n_exact")).as("over_est"))
          .orderBy(col("n_exact").desc, col("term"))
      },
      Some(s"""
        WITH t AS (SELECT unnest($duckTokens) AS term FROM documents),
        v AS (SELECT term, count(*) AS cnt FROM t GROUP BY 1),
        hx AS (SELECT term, cnt, r,
                 CAST(CAST(concat('0x', substr(md5(
                   'q148:' || CAST(r AS VARCHAR) || ':' || term), 1, 15))
                   AS BIGINT) % 256 AS INTEGER) AS idx
               FROM v, (SELECT unnest(generate_series(0, 3)) AS r) g),
        cells AS (SELECT r, idx, CAST(sum(cnt) AS BIGINT) AS cell
                  FROM hx GROUP BY 1, 2),
        probe AS (SELECT term, cnt AS n_exact FROM v
                  ORDER BY cnt DESC, term LIMIT 20),
        ph AS (SELECT p.term, p.n_exact, g.r,
                 CAST(CAST(concat('0x', substr(md5(
                   'q148:' || CAST(g.r AS VARCHAR) || ':' || p.term), 1, 15))
                   AS BIGINT) % 256 AS INTEGER) AS idx
               FROM probe p, (SELECT unnest(generate_series(0, 3)) AS r) g)
        SELECT ph.term, ph.n_exact,
               min(cells.cell) AS cms_est,
               min(cells.cell) - ph.n_exact AS over_est
        FROM ph JOIN cells USING (r, idx)
        GROUP BY ph.term, ph.n_exact
        ORDER BY ph.n_exact DESC, ph.term""")),

    // -------------------------------------------------------------- q160:
    // HLL MERGEABILITY — the property that makes sketches the 100 TB
    // answer: registers built independently over two ingest halves
    // (event_id parity = two arrival batches) and max-merged per
    // register must equal the registers built over the whole corpus in
    // one pass. That is what lets a warehouse keep per-partition/per-day
    // sketch columns and answer "distinct over any date range" by
    // folding registers (the materialized-view merge contract, sketch
    // edition — q130's incremental-agg sibling). max is associative and
    // commutative, so max(max(A), max(B)) ≡ max(A ∪ B); the query
    // PROVES it numerically per event_type: merged register sum, direct
    // register sum, their HLL estimates, and an is_equal flag the oracle
    // must also derive as true.
    //
    // Scale shape: identical to q147 (register shuffles are
    // groups × 64 regardless of corpus size), run three times (half A,
    // half B, direct) — in production the halves are per-partition
    // sketch columns already materialized, and only the 64-register
    // folds run at query time.
    QueryDef(
      "q160_hll_merge",
      (s, d) => {
        val ev = Tables(s, d, "events")
        // md5-derived (j, rho) per event — the q147 register pipeline
        def rhoRows(src: org.apache.spark.sql.DataFrame) = src
          .select(col("event_type"),
            md5(concat(lit("q147:"), col("event_id").cast("string")))
              .as("hex"))
          .select(col("event_type"),
            expr("CAST(CAST(conv(substr(hex, 1, 2), 16, 10) AS BIGINT) " +
              "% 64 AS INT)").as("j"),
            expr("substr(hex, 3, 14)").as("tail"))
          .withColumn("nlz", length(regexp_extract(col("tail"), "^(0*)", 1)))
          .withColumn("d1", expr("substr(tail, nlz + 1, 1)"))
          .withColumn("rho", expr(
            """CAST(LEAST(CASE WHEN d1 = '' THEN 57 ELSE nlz * 4 + 1 +
              |  (CASE WHEN d1 = '1' THEN 3
              |        WHEN d1 IN ('2', '3') THEN 2
              |        WHEN d1 IN ('4', '5', '6', '7') THEN 1
              |        ELSE 0 END) END, 56) AS INT)""".stripMargin))
          .select("event_type", "j", "rho")
        def regs(src: org.apache.spark.sql.DataFrame) =
          rhoRows(src).groupBy("event_type", "j").agg(max("rho").as("m"))
        val halfA = regs(ev.filter(col("event_id") % 2 === 0))
        val halfB = regs(ev.filter(col("event_id") % 2 === 1))
        val merged = halfA.unionAll(halfB)
          .groupBy("event_type", "j").agg(max("m").as("m"))
        val direct = regs(ev)
        def fold(r: org.apache.spark.sql.DataFrame, pfx: String) = {
          val dense = ev.select("event_type").distinct()
            .select(col("event_type"), explode(expr("sequence(0, 63)")).as("j"))
          dense.join(r, Seq("event_type", "j"), "left")
            .withColumn("m", coalesce(col("m"), lit(0)))
            .groupBy("event_type").agg(
              sum(expr("shiftleft(CAST(1 AS BIGINT), 56 - m)"))
                .as(s"${pfx}_reg_sum"))
        }
        fold(merged, "merged").join(fold(direct, "direct"), "event_type")
          .select(col("event_type"),
            col("merged_reg_sum"), col("direct_reg_sum"),
            (col("merged_reg_sum") === col("direct_reg_sum")).as("is_equal"),
            round(lit(0.709) * lit(4096.0) * lit(72057594037927936.0) /
              col("merged_reg_sum").cast("double"), 3).as("hll_est"))
          .orderBy("event_type")
      },
      Some("""
        WITH h AS (SELECT event_type, event_id,
                     md5('q147:' || CAST(event_id AS VARCHAR)) AS hex
                   FROM events),
        x AS (SELECT event_type, event_id,
                CAST(CAST(concat('0x', substr(hex, 1, 2)) AS BIGINT) % 64
                  AS INTEGER) AS j,
                substr(hex, 3, 14) AS tail
              FROM h),
        r AS (SELECT event_type, event_id, j,
                length(regexp_extract(tail, '^(0*)', 1)) AS nlz,
                substr(tail,
                  length(regexp_extract(tail, '^(0*)', 1)) + 1, 1) AS d1
              FROM x),
        rr AS (SELECT event_type, event_id, j,
                 CAST(LEAST(CASE WHEN d1 = '' THEN 57 ELSE nlz * 4 + 1 +
                   (CASE WHEN d1 = '1' THEN 3
                         WHEN d1 IN ('2', '3') THEN 2
                         WHEN d1 IN ('4', '5', '6', '7') THEN 1
                         ELSE 0 END) END, 56) AS INTEGER) AS rho
               FROM r),
        ra AS (SELECT event_type, j, max(rho) AS m FROM rr
               WHERE event_id % 2 = 0 GROUP BY 1, 2),
        rb AS (SELECT event_type, j, max(rho) AS m FROM rr
               WHERE event_id % 2 = 1 GROUP BY 1, 2),
        mg AS (SELECT event_type, j, max(m) AS m
               FROM (SELECT * FROM ra UNION ALL SELECT * FROM rb)
               GROUP BY 1, 2),
        dr AS (SELECT event_type, j, max(rho) AS m FROM rr GROUP BY 1, 2),
        dense AS (SELECT DISTINCT e.event_type, g.j
                  FROM events e,
                       (SELECT unnest(generate_series(0, 63)) AS j) g),
        fm AS (SELECT d.event_type,
                 CAST(sum(CAST(1 AS BIGINT) << (56 - COALESCE(mg.m, 0)))
                   AS BIGINT) AS merged_reg_sum
               FROM dense d LEFT JOIN mg USING (event_type, j) GROUP BY 1),
        fd AS (SELECT d.event_type,
                 CAST(sum(CAST(1 AS BIGINT) << (56 - COALESCE(dr.m, 0)))
                   AS BIGINT) AS direct_reg_sum
               FROM dense d LEFT JOIN dr USING (event_type, j) GROUP BY 1)
        SELECT fm.event_type, fm.merged_reg_sum, fd.direct_reg_sum,
               fm.merged_reg_sum = fd.direct_reg_sum AS is_equal,
               round(CAST(0.709 AS DOUBLE) * CAST(4096 AS DOUBLE) *
                 CAST(72057594037927936 AS DOUBLE) /
                 CAST(fm.merged_reg_sum AS DOUBLE), 3) AS hll_est
        FROM fm JOIN fd USING (event_type)
        ORDER BY event_type""")),

    // -------------------------------------------------------------- q173:
    // HLL set-INTERSECTION estimate by inclusion-exclusion: |A∩B| ≈
    // est(A) + est(B) − est(A∪B), where the union estimate folds the
    // max-merged registers (the q160 property — HLLs union for free,
    // they never intersect directly). A = users who click, B = users
    // who purchase; the exact intersection runs alongside as the audit.
    // This is the sketch-scale sibling of q164's exact overlap matrix:
    // at 100 TB you keep per-slice user sketches (64 registers each)
    // and answer any pairwise audience overlap from register folds —
    // zero re-scans, zero joins — accepting the inclusion-exclusion
    // error the audit column measures. Deterministic end-to-end: same
    // md5 registers both engines, estimates and error included in the
    // hash compare.
    QueryDef(
      "q173_hll_intersection",
      (s, d) => {
        val ev = Tables(s, d, "events")
        def rhoOf(tpe: String) = ev
          .filter(col("event_type") === tpe)
          .select(md5(concat(lit("q173:"), col("user_id").cast("string")))
            .as("hex"))
          .select(
            expr("CAST(CAST(conv(substr(hex, 1, 2), 16, 10) AS BIGINT) " +
              "% 64 AS INT)").as("j"),
            expr("substr(hex, 3, 14)").as("tail"))
          .withColumn("nlz", length(regexp_extract(col("tail"), "^(0*)", 1)))
          .withColumn("d1", expr("substr(tail, nlz + 1, 1)"))
          .withColumn("rho", expr(
            """CAST(LEAST(CASE WHEN d1 = '' THEN 57 ELSE nlz * 4 + 1 +
              |  (CASE WHEN d1 = '1' THEN 3
              |        WHEN d1 IN ('2', '3') THEN 2
              |        WHEN d1 IN ('4', '5', '6', '7') THEN 1
              |        ELSE 0 END) END, 56) AS INT)""".stripMargin))
          .groupBy("j").agg(max("rho").as("m"))
        val ra = rhoOf("click")
        val rb = rhoOf("purchase")
        val dense = ev.sparkSession.range(0, 64)
          .select(col("id").cast("int").as("j"))
        def est(regs: org.apache.spark.sql.DataFrame, name: String) =
          dense.join(regs, Seq("j"), "left")
            .withColumn("m", coalesce(col("m"), lit(0)))
            .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), 56 - m)")).as("sr"))
            .select((lit(0.709) * lit(4096.0) * lit(72057594037927936.0) /
              col("sr").cast("double")).as(name))
        val merged = ra.unionAll(rb).groupBy("j").agg(max("m").as("m"))
        val exact = ev.filter(col("event_type") === "click")
          .select(col("user_id")).intersect(
            ev.filter(col("event_type") === "purchase").select(col("user_id")))
          .agg(count(lit(1)).as("n_exact"))
        est(ra, "est_a").crossJoin(est(rb, "est_b"))
          .crossJoin(est(merged, "est_union"))
          .crossJoin(exact)
          .select(
            round(col("est_a"), 3).as("est_clickers"),
            round(col("est_b"), 3).as("est_buyers"),
            round(col("est_union"), 3).as("est_union"),
            round(col("est_a") + col("est_b") - col("est_union"), 3)
              .as("est_intersection"),
            col("n_exact"),
            round(abs(col("est_a") + col("est_b") - col("est_union") -
              col("n_exact").cast("double")) /
              col("n_exact").cast("double"), 4).as("rel_err"))
      },
      Some("""
        WITH h AS (SELECT event_type, user_id,
                     md5('q173:' || CAST(user_id AS VARCHAR)) AS hex
                   FROM events WHERE event_type IN ('click', 'purchase')),
        x AS (SELECT event_type,
                CAST(CAST(concat('0x', substr(hex, 1, 2)) AS BIGINT) % 64
                  AS INTEGER) AS j,
                substr(hex, 3, 14) AS tail
              FROM h),
        rr AS (SELECT event_type, j,
                 CAST(LEAST(CASE WHEN substr(tail,
                       length(regexp_extract(tail, '^(0*)', 1)) + 1, 1) = ''
                     THEN 57
                     ELSE length(regexp_extract(tail, '^(0*)', 1)) * 4 + 1 +
                       (CASE WHEN substr(tail,
                          length(regexp_extract(tail, '^(0*)', 1)) + 1, 1)
                            = '1' THEN 3
                        WHEN substr(tail,
                          length(regexp_extract(tail, '^(0*)', 1)) + 1, 1)
                            IN ('2', '3') THEN 2
                        WHEN substr(tail,
                          length(regexp_extract(tail, '^(0*)', 1)) + 1, 1)
                            IN ('4', '5', '6', '7') THEN 1
                        ELSE 0 END) END, 56) AS INTEGER) AS rho
               FROM x),
        ra AS (SELECT j, max(rho) AS m FROM rr
               WHERE event_type = 'click' GROUP BY 1),
        rb AS (SELECT j, max(rho) AS m FROM rr
               WHERE event_type = 'purchase' GROUP BY 1),
        mg AS (SELECT j, max(m) AS m
               FROM (SELECT * FROM ra UNION ALL SELECT * FROM rb)
               GROUP BY 1),
        dense AS (SELECT unnest(generate_series(0, 63)) AS j),
        ea AS (SELECT CAST(0.709 * 4096 * 72057594037927936 AS DOUBLE) /
                 CAST(sum(CAST(1 AS BIGINT) << (56 - COALESCE(ra.m, 0)))
                   AS DOUBLE) AS est_a
               FROM dense d LEFT JOIN ra ON ra.j = d.j),
        eb AS (SELECT CAST(0.709 * 4096 * 72057594037927936 AS DOUBLE) /
                 CAST(sum(CAST(1 AS BIGINT) << (56 - COALESCE(rb.m, 0)))
                   AS DOUBLE) AS est_b
               FROM dense d LEFT JOIN rb ON rb.j = d.j),
        eu AS (SELECT CAST(0.709 * 4096 * 72057594037927936 AS DOUBLE) /
                 CAST(sum(CAST(1 AS BIGINT) << (56 - COALESCE(mg.m, 0)))
                   AS DOUBLE) AS est_union
               FROM dense d LEFT JOIN mg ON mg.j = d.j),
        ex AS (SELECT count(*) AS n_exact FROM (
                 SELECT DISTINCT user_id FROM events
                 WHERE event_type = 'click'
                 INTERSECT
                 SELECT DISTINCT user_id FROM events
                 WHERE event_type = 'purchase'))
        SELECT round(est_a, 3) AS est_clickers,
               round(est_b, 3) AS est_buyers,
               round(est_union, 3) AS est_union,
               round(est_a + est_b - est_union, 3) AS est_intersection,
               n_exact,
               round(abs(est_a + est_b - est_union -
                 CAST(n_exact AS DOUBLE)) / CAST(n_exact AS DOUBLE), 4)
                 AS rel_err
        FROM ea, eb, eu, ex"""))
  )
}
