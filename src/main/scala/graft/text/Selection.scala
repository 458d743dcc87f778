package graft.text

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Data-selection operators over the document corpus: DSIR-style
  * importance selection (hashed-feature importance weights from a target
  * vs raw distribution — Xie et al. 2023, "Data Selection for Language
  * Models via Importance Resampling") and bounded-memory heavy-hitter
  * extraction (Misra–Gries partial summaries + exact recount). Both ride
  * the native single-pass [[graft.functions.GraftTokens]] tokenizer.
  */
object Selection {

  import TextAnalysis.{tokensExpr, duckTokens}

  val defs: Seq[QueryDef] = Seq(

    // -------------------------------------------------------------- q132:
    // DSIR-style importance selection: score every document by how much
    // its tokens are over-represented in a TARGET distribution (here the
    // corpus's lang='en' slice — the "quality/domain" target) relative to
    // the RAW corpus, keep the top 100. Published DSIR weighs features by
    // log(p_target/p_raw); transcendental logs are not cross-engine
    // hash-stable, so the per-term weight is the exact cross-multiplied
    // ratio difference w(t) = cnt_en(t)·N_all − cnt_all(t)·N_en (BIGINT;
    // same sign and same ordering intent as the log-ratio, integer-exact).
    // A doc's score sums w over its token OCCURRENCES, as DSIR does.
    // Overflow bound: |w| ≤ T², score ≤ maxDocTokens·T² — safe in int64
    // through ~30M corpus tokens per aggregation scope; beyond that the
    // weight switches to DECIMAL(38,0) with the same plan.
    //
    // Scale shape: ONE explode of the corpus feeds both count aggregates
    // (map-side combined, one shuffle each, vocab-sized output); the
    // 2-value totals row is a broadcast cross join; the weight table is
    // vocab-sized and BROADCAST back against the token stream, so the
    // corpus never shuffles for the scoring join; per-doc sums are
    // map-side combined on doc_id; the final top-100 plans as
    // TakeOrderedAndProject (per-partition heap + driver merge of 100
    // rows), never a global sort. Empty docs carry no tokens and cannot
    // score — documented out of the selection by construction.
    QueryDef(
      "q132_dsir_select",
      (s, d) => {
        val docs = Tables(s, d, "documents")
        val tok = docs.select(col("doc_id"), col("lang"),
          explode(expr(tokensExpr)).as("term"))
        val cntAll = tok.groupBy("term").agg(count(lit(1)).as("ca"))
        val cntEn = tok.filter(col("lang") === "en")
          .groupBy("term").agg(count(lit(1)).as("ce"))
        val totals = tok.agg(
          count(lit(1)).as("na"),
          sum(when(col("lang") === "en", 1L).otherwise(0L)).as("ne"))
        val weights = cntAll.join(cntEn, Seq("term"), "left")
          .crossJoin(broadcast(totals))
          .select(col("term"),
            (coalesce(col("ce"), lit(0L)) * col("na") -
              col("ca") * col("ne")).as("w"))
        tok.join(broadcast(weights), "term")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_tok"), sum("w").as("score"))
          .join(docs.select("doc_id", "lang"), "doc_id")
          .select("doc_id", "lang", "n_tok", "score")
          .orderBy(col("score").desc, col("doc_id"))
          .limit(100)
      },
      Some(s"""
        WITH t AS (SELECT doc_id, lang, unnest($duckTokens) AS term
                   FROM documents),
        ca AS (SELECT term, count(*) AS ca FROM t GROUP BY 1),
        ce AS (SELECT term, count(*) AS ce FROM t WHERE lang = 'en'
               GROUP BY 1),
        tot AS (SELECT count(*) AS na,
                       count(*) FILTER (lang = 'en') AS ne FROM t),
        w AS (SELECT ca.term,
                     COALESCE(ce.ce, 0) * tot.na - ca.ca * tot.ne AS w
              FROM ca LEFT JOIN ce USING (term) CROSS JOIN tot),
        sc AS (SELECT t.doc_id, count(*) AS n_tok,
                      CAST(sum(w.w) AS BIGINT) AS score
               FROM t JOIN w USING (term) GROUP BY 1)
        SELECT d.doc_id, d.lang, sc.n_tok, sc.score
        FROM sc JOIN documents d USING (doc_id)
        ORDER BY score DESC, doc_id
        LIMIT 100""")),

    // -------------------------------------------------------------- q133:
    // Heavy hitters at bounded memory: every term with frequency
    // > N/64 of the corpus token stream, with EXACT counts. The scale
    // device is Misra–Gries: each partition reduces its token stream to a
    // ≤63-entry candidate summary inside one mapPartitions pass (O(c)
    // memory regardless of vocabulary size — the pigeonhole argument
    // guarantees every global heavy hitter survives in at least one
    // partition's summary), then ONLY the candidate superset is exactly
    // recounted via a broadcast semi-join — the full-vocabulary groupBy a
    // naive formulation would shuffle never happens, and the exact-count
    // aggregation state is ≤ 63·partitions terms. The final strict filter
    // cnt·64 > N makes the output independent of which superset the
    // partitioning produced — MG nondeterminism cannot leak into results,
    // which is why a plain SQL oracle exists for an approximate-summary
    // operator.
    QueryDef(
      "q133_heavy_hitters",
      (s, d) => {
        import s.implicits._
        val docs = Tables(s, d, "documents")
        val tok = docs.select(explode(expr(tokensExpr)).as("term"))
        val cands = tok.as[String].mapPartitions(misraGries(_, 63))
          .toDF("term").distinct()
        // N from one scan WITHOUT the explode (per-doc token counts sum)
        val totals = docs.select(
            expr(s"CAST(size($tokensExpr) AS BIGINT)").as("n"))
          .agg(sum("n").as("n_total"))
        tok.join(broadcast(cands), "term", "left_semi")
          .groupBy("term").agg(count(lit(1)).as("cnt"))
          .crossJoin(broadcast(totals))
          .filter(col("cnt") * 64L > col("n_total"))
          .select("term", "cnt", "n_total")
          .orderBy(col("cnt").desc, col("term"))
      },
      Some(s"""
        WITH t AS (SELECT unnest($duckTokens) AS term FROM documents),
        tot AS (SELECT count(*) AS n_total FROM t),
        c AS (SELECT term, count(*) AS cnt FROM t GROUP BY 1)
        SELECT c.term, c.cnt, tot.n_total
        FROM c CROSS JOIN tot
        WHERE c.cnt * 64 > tot.n_total
        ORDER BY cnt DESC, term""")),

    // -------------------------------------------------------------- q137:
    // Corpus-mixture drift: pairwise total-variation distance between the
    // per-source unigram distributions — the monitor a training pipeline
    // runs when the domain mixture (q95) must stay stable across crawl
    // snapshots. TV(a,b) = ½·Σ_t |p_a(t) − p_b(t)| involves divisions, so
    // the engine carries the EXACT integer numerator
    //   num = Σ_t |cnt_a(t)·N_b − cnt_b(t)·N_a|
    // and divides once at the end (2·N_a·N_b). Terms present in only one
    // source are folded in WITHOUT a full-outer join via
    //   Σ_{t∈a∖b} cnt_a·N_b = (N_a − Σ_{t∈both} cnt_a)·N_b  (and sym.) —
    // the pair join stays an INNER join on term.
    //
    // Scale shape: one shuffle builds per-(source, term) counts; source
    // totals are a |sources|-row broadcast; the pair stage joins the
    // vocab-sized count table to itself on term (all source pairs of one
    // term meet in one partition — shuffle is vocab-sized, output is
    // |pairs per term| ≤ |sources|²; with thousands of snapshots you'd
    // bound pairs to adjacent snapshots, the 10-source fixture keeps all
    // 45). The corpus itself is touched once.
    QueryDef(
      "q137_corpus_drift",
      (s, d) => {
        val tc = Tables(s, d, "documents")
          .select(col("source"), explode(expr(tokensExpr)).as("term"))
          .groupBy("source", "term").agg(count(lit(1)).as("cnt"))
        val totals = tc.groupBy("source").agg(sum("cnt").as("n"))
        val a = tc.join(broadcast(totals), "source")
          .select(col("source").as("src_a"), col("term"),
            col("cnt").as("ca"), col("n").as("na"))
        val b = tc.join(broadcast(totals), "source")
          .select(col("source").as("src_b"), col("term"),
            col("cnt").as("cb"), col("n").as("nb"))
        a.join(b, Seq("term"))
          .filter(col("src_a") < col("src_b"))
          .groupBy("src_a", "src_b")
          .agg(first("na").as("n_a"), first("nb").as("n_b"),
            sum("ca").as("shared_a"), sum("cb").as("shared_b"),
            sum(abs(col("ca") * col("nb") - col("cb") * col("na")))
              .as("num_both"))
          .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"),
            (col("num_both") +
              (col("n_a") - col("shared_a")) * col("n_b") +
              (col("n_b") - col("shared_b")) * col("n_a")).as("tv_num"))
          .withColumn("tv",
            col("tv_num").cast("double") /
              (lit(2.0) * (col("n_a") * col("n_b")).cast("double")))
          .orderBy("src_a", "src_b")
      },
      Some(s"""
        WITH t AS (SELECT source, unnest($duckTokens) AS term
                   FROM documents),
        tc AS (SELECT source, term, count(*) AS cnt FROM t GROUP BY 1, 2),
        tot AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS n
                FROM tc GROUP BY 1),
        p AS (SELECT a.source AS src_a, b.source AS src_b,
                     ta.n AS n_a, tb.n AS n_b,
                     CAST(sum(a.cnt) AS BIGINT) AS shared_a,
                     CAST(sum(b.cnt) AS BIGINT) AS shared_b,
                     CAST(sum(abs(a.cnt * tb.n - b.cnt * ta.n)) AS BIGINT)
                       AS num_both
              FROM tc a JOIN tc b ON a.term = b.term AND a.source < b.source
              JOIN tot ta ON ta.source = a.source
              JOIN tot tb ON tb.source = b.source
              GROUP BY 1, 2, 3, 4)
        SELECT src_a, src_b, n_a, n_b,
               num_both + (n_a - shared_a) * n_b + (n_b - shared_b) * n_a
                 AS tv_num,
               CAST(num_both + (n_a - shared_a) * n_b + (n_b - shared_b) * n_a
                 AS DOUBLE) / (2.0 * CAST(n_a * n_b AS DOUBLE)) AS tv
        FROM p
        ORDER BY src_a, src_b"""))
  )

  /** Misra–Gries frequent-candidates summary of one partition's token
    * stream at capacity `c`: retains every term whose in-partition
    * frequency exceeds 1/(c+1) of the partition (decrement-counting;
    * Misra & Gries 1982). Returns candidate terms only — counts are
    * lower bounds and are deliberately discarded; the caller recounts
    * exactly.
    */
  private[text] def misraGries(it: Iterator[String], c: Int): Iterator[String] = {
    val m = new java.util.HashMap[String, Long](c * 2)
    while (it.hasNext) {
      val t = it.next()
      val cur = m.get(t)
      if (cur != 0L) m.put(t, cur + 1L)
      else if (m.size < c) m.put(t, 1L)
      else {
        val e = m.entrySet().iterator()
        while (e.hasNext) {
          val kv = e.next()
          if (kv.getValue == 1L) e.remove() else kv.setValue(kv.getValue - 1L)
        }
      }
    }
    import scala.jdk.CollectionConverters._
    m.keySet().iterator().asScala
  }
}
