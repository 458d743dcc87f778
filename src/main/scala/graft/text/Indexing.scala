package graft.text

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.plans.TopK

/** Corpus-statistics operators built on the token stream: unigram
  * frequency scoring (the CCNet-style LM-quality proxy), an inverted
  * index build (the retrieval-side artifact a decontamination / search
  * pipeline materializes), and overlapping context-window chunking. All
  * ride the native single-pass [[graft.functions.GraftTokens]] tokenizer.
  */
object Indexing {

  import TextAnalysis.{tokensExpr, duckTokens}

  val defs: Seq[QueryDef] = Seq(

    // -------------------------------------------------------------- q123:
    // Unigram corpus-frequency document scoring (the integer-exact
    // sibling of CCNet's LM perplexity filter: rare-token-heavy documents
    // score low). Transcendental logprobs would break cross-engine hash
    // equality (libm vs Math.log are not both correctly rounded), so the
    // score is mean corpus frequency of the document's tokens — exact
    // BIGINT sums with ONE final IEEE division.
    //
    // Scale shape: explode -> map-side-combined vocab count (one shuffle,
    // one row per distinct term), then the vocab is BROADCAST back
    // against the token stream — the stopword-skewed term join never
    // shuffles the corpus side. (A vocab too large to broadcast splits
    // by frequency: broadcast the head, shuffle-join the long tail — the
    // head covers virtually all token occurrences by Zipf.) Empty
    // documents survive the explode via the final left join: n_tok = 0,
    // NULL score.
    QueryDef(
      "q123_unigram_score",
      (s, d) => {
        val docs = Tables(s, d, "documents")
        val tok = docs.select(col("doc_id"),
          explode(expr(tokensExpr)).as("term"))
        val vocab = tok.groupBy("term").agg(count(lit(1)).as("cnt"))
        val scored = tok.join(broadcast(vocab), "term")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_tok"), sum("cnt").as("sum_freq"))
        docs.select("doc_id").join(scored, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_tok"), lit(0L)).as("n_tok"),
            col("sum_freq"),
            when(col("n_tok") > 0,
              col("sum_freq").cast("double") / col("n_tok").cast("double"))
              .as("mean_freq"))
          .orderBy("doc_id")
      },
      Some(s"""
        WITH t AS (SELECT doc_id, unnest($duckTokens) AS term
                   FROM documents),
        v AS (SELECT term, count(*) AS cnt FROM t GROUP BY 1),
        sc AS (SELECT t.doc_id, count(*) AS n_tok,
                      CAST(sum(v.cnt) AS BIGINT) AS sum_freq
               FROM t JOIN v USING (term) GROUP BY 1)
        SELECT d.doc_id,
               COALESCE(sc.n_tok, 0) AS n_tok,
               sc.sum_freq AS sum_freq,
               CASE WHEN sc.n_tok > 0 THEN
                 CAST(sc.sum_freq AS DOUBLE) / CAST(sc.n_tok AS DOUBLE) END
                 AS mean_freq
        FROM documents d LEFT JOIN sc USING (doc_id)
        ORDER BY doc_id""")),

    // -------------------------------------------------------------- q124:
    // Inverted index build: term -> document frequency, total term
    // frequency, and a BOUNDED posting-list sample (the 16 smallest
    // doc_ids). The sample rides the custom TopKPerGroup operator, whose
    // partial stage cuts every partition to <= 16 rows per term BEFORE
    // the exchange — a stopword term at 100 TB ships 16·partitions rows,
    // not its full posting list, and no executor ever buffers an
    // unbounded collect_list. df/tf_total are plain map-side-combined
    // aggregates over the (term, doc_id) pre-aggregation, which also
    // de-duplicates repeated terms within a document.
    QueryDef(
      "q124_inverted_index",
      (s, d) => {
        val perDoc = Tables(s, d, "documents")
          .select(col("doc_id"), explode(expr(tokensExpr)).as("term"))
          .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
        val inv = perDoc.groupBy("term")
          .agg(count(lit(1)).as("df"), sum("tf").as("tf_total"))
        val pd = perDoc.select("term", "doc_id")
        // The sample is emitted as a comma-joined string — the driver's
        // value compare is scalar-typed (and the parquet dump stays flat).
        val sample = TopK.perGroup(pd, Seq(pd("term")),
            Seq(pd("doc_id").asc), 16)
          .groupBy("term")
          .agg(array_join(
            expr("transform(sort_array(collect_list(doc_id)), x -> CAST(x AS STRING))"),
            ",").as("postings_sample"))
        inv.join(sample, "term")
          .select("term", "df", "tf_total", "postings_sample")
          .orderBy("term")
      },
      Some(s"""
        WITH t AS (SELECT doc_id, unnest($duckTokens) AS term
                   FROM documents),
        pd AS (SELECT term, doc_id, count(*) AS tf FROM t GROUP BY 1, 2)
        SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS tf_total,
               array_to_string(list_slice(list(doc_id ORDER BY doc_id), 1, 16), ',')
                 AS postings_sample
        FROM pd GROUP BY term
        ORDER BY term""")),

    // -------------------------------------------------------------- q129:
    // Context-window chunking: split each document's token stream into
    // max-32-token chunks with an 8-token overlap (stride 24; sized so
    // the <=99-token fixture docs actually split — real context windows
    // just scale the two constants) — the
    // operator that turns a cleaned corpus into training sequences when
    // packing (q92) isn't wanted because document boundaries must hold.
    // Per-row work only: the chunk fan-out is an explode over
    // sequence(0, floor((n-1)/24)) and a slice per chunk — no join, no
    // shuffle before the deterministic output sort; at 100 TB this is
    // embarrassingly parallel and the output is ~n/stride rows per doc.
    QueryDef(
      "q129_chunking",
      (s, d) => {
        Tables(s, d, "documents")
          .select(col("doc_id"), expr(tokensExpr).as("toks"))
          .withColumn("n", size(col("toks")).cast("long"))
          .filter(col("n") > 0)
          .select(col("doc_id"), col("toks"),
            explode(expr("sequence(0L, CAST(floor((n - 1) / 24) AS LONG))"))
              .as("chunk_id"))
          .withColumn("start_tok", col("chunk_id") * 24L)
          .select(col("doc_id"), col("chunk_id"), col("start_tok"),
            expr("CAST(size(slice(toks, CAST(start_tok + 1 AS INT), 32)) AS BIGINT)")
              .as("n_tok_chunk"),
            expr("array_join(slice(toks, CAST(start_tok + 1 AS INT), 32), ' ')")
              .as("chunk_text"))
          .orderBy("doc_id", "chunk_id")
      },
      Some(s"""
        WITH t AS (SELECT doc_id, $duckTokens AS toks FROM documents),
        f AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n
              FROM t WHERE len(toks) > 0),
        c AS (SELECT doc_id, toks,
                unnest(generate_series(0, CAST(floor((n - 1) / 24) AS BIGINT)))
                  AS chunk_id
              FROM f)
        SELECT doc_id, chunk_id, chunk_id * 24 AS start_tok,
               CAST(len(list_slice(toks, chunk_id * 24 + 1,
                 chunk_id * 24 + 32)) AS BIGINT) AS n_tok_chunk,
               array_to_string(list_slice(toks, chunk_id * 24 + 1,
                 chunk_id * 24 + 32), ' ') AS chunk_text
        FROM c
        ORDER BY doc_id, chunk_id""")),

    // -------------------------------------------------------------- q146:
    // Held-out bigram-LM document scoring — the conditional-probability
    // sibling of q123's unigram filter, with a real train/score split:
    // the model (bigram counts B(w1 w2) and prefix counts P(w1)) is
    // trained on even doc_ids only, then ODD docs are scored against it.
    // Unseen-bigram rate is the integer-exact stand-in for perplexity
    // (transcendental logprobs would break cross-engine hash equality —
    // same rationale as q123): BIGINT sums per doc, IEEE division only in
    // the final projection.
    //
    // Scale shape: bigram formation is map-only (transform over the token
    // array — no shuffle, no window). Training is one map-side-combined
    // count per key space (bigram, prefix). Scoring BROADCASTs the model
    // back against the held-out bigram stream, so the skewed key join
    // never shuffles the corpus side; a bigram vocab too large to
    // broadcast splits by frequency exactly as q123 documents (broadcast
    // the Zipf head, shuffle-join the tail). Docs with < 2 tokens survive
    // via the final left join (n_bigrams = 0, NULL rates).
    QueryDef(
      "q146_bigram_lm_score",
      (s, d) => {
        val docs = Tables(s, d, "documents")
        val big = docs.select(col("doc_id"), expr(tokensExpr).as("t"))
          .filter(size(col("t")) >= 2)
          .select(col("doc_id"), explode(expr(
            """transform(sequence(1, size(t) - 1), i -> struct(
              |  element_at(t, i) AS w1,
              |  concat(element_at(t, i), ' ', element_at(t, i + 1)) AS bg))"""
              .stripMargin)).as("b"))
          .select(col("doc_id"), col("b.w1").as("w1"), col("b.bg").as("bg"))
        val train = big.filter(col("doc_id") % 2 === 0)
        val bcnt = train.groupBy("bg").agg(count(lit(1)).as("b_cnt"))
        val pcnt = train.groupBy("w1").agg(count(lit(1)).as("p_cnt"))
        val scored = big.filter(col("doc_id") % 2 === 1)
          .join(broadcast(bcnt), Seq("bg"), "left")
          .join(broadcast(pcnt), Seq("w1"), "left")
          .groupBy("doc_id").agg(
            count(lit(1)).as("nb"),
            sum(when(col("b_cnt").isNull, 1L).otherwise(0L)).as("nu"),
            sum(coalesce(col("b_cnt"), lit(0L))).as("sb"),
            sum(coalesce(col("p_cnt"), lit(0L))).as("sp"))
        val nb = coalesce(col("nb"), lit(0L))
        docs.filter(col("doc_id") % 2 === 1).select("doc_id")
          .join(scored, Seq("doc_id"), "left")
          .select(col("doc_id"),
            nb.as("n_bigrams"),
            coalesce(col("nu"), lit(0L)).as("n_unseen"),
            coalesce(col("sb"), lit(0L)).as("sum_bigram_freq"),
            coalesce(col("sp"), lit(0L)).as("sum_prefix_freq"),
            when(nb > 0, col("nu").cast("double") / nb.cast("double"))
              .as("unseen_rate"),
            when(col("sp") > 0,
              col("sb").cast("double") / col("sp").cast("double"))
              .as("cond_coverage"))
          .orderBy("doc_id")
      },
      Some(s"""
        WITH t AS (SELECT doc_id, $duckTokens AS t FROM documents),
        bg AS (SELECT doc_id, t[i] AS w1, t[i] || ' ' || t[i + 1] AS bg
               FROM t, unnest(generate_series(1, len(t) - 1)) AS u(i)
               WHERE len(t) >= 2),
        bc AS (SELECT bg, count(*) AS b_cnt FROM bg
               WHERE doc_id % 2 = 0 GROUP BY 1),
        pc AS (SELECT w1, count(*) AS p_cnt FROM bg
               WHERE doc_id % 2 = 0 GROUP BY 1),
        sc AS (SELECT g.doc_id, count(*) AS nb,
                      CAST(sum(CASE WHEN bc.b_cnt IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS nu,
                      CAST(sum(COALESCE(bc.b_cnt, 0)) AS BIGINT) AS sb,
                      CAST(sum(COALESCE(pc.p_cnt, 0)) AS BIGINT) AS sp
               FROM bg g LEFT JOIN bc USING (bg) LEFT JOIN pc USING (w1)
               WHERE g.doc_id % 2 = 1 GROUP BY 1)
        SELECT d.doc_id,
               COALESCE(sc.nb, 0) AS n_bigrams,
               COALESCE(sc.nu, 0) AS n_unseen,
               COALESCE(sc.sb, 0) AS sum_bigram_freq,
               COALESCE(sc.sp, 0) AS sum_prefix_freq,
               CASE WHEN sc.nb > 0 THEN
                 CAST(sc.nu AS DOUBLE) / CAST(sc.nb AS DOUBLE) END
                 AS unseen_rate,
               CASE WHEN sc.sp > 0 THEN
                 CAST(sc.sb AS DOUBLE) / CAST(sc.sp AS DOUBLE) END
                 AS cond_coverage
        FROM documents d LEFT JOIN sc USING (doc_id)
        WHERE d.doc_id % 2 = 1
        ORDER BY d.doc_id""")),

    // -------------------------------------------------------------- q159:
    // BM25 top-10 retrieval — the ranking function that turns q124's
    // inverted index into a search engine (k1 = 1.2, b = 0.75). The
    // query's term set is itself DERIVED in-plan (document-frequency
    // ranks 5-7 by (df DESC, term)) so both engines score the identical
    // query without a literal term list going stale when fixtures
    // regenerate.
    //
    // Determinism: the only transcendental is ln() inside idf; per-term
    // partial scores are rounded to 1e-6 and summed as INTEGER
    // micro-units (round(x·1e6) as BIGINT), so the per-document fold is
    // order-free — an ulp of libm divergence cannot survive the
    // rounding, and no float addition order can differ (the q63/q123
    // lesson applied to a multi-term score). All divisions are written
    // with identical association in both engines.
    //
    // Scale shape: tf/dl/df are the q63 pipeline (explode → map-side-
    // combined counts, shuffles are key-sized, never corpus-sized); the
    // 3-term query and the 2-value corpus stats broadcast against the
    // posting rows, so scoring touches ONLY the query terms' postings —
    // exactly what serving from an inverted index means (the corpus
    // never re-shuffles per query).
    QueryDef(
      "q159_bm25_topk",
      (s, d) => {
        val docs = Tables(s, d, "documents")
        val tok = docs.select(col("doc_id"), explode(expr(tokensExpr)).as("term"))
        val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        // dl DERIVED from tf (round-18, guide §2.4): dl = Σ tf per doc
        // by definition, so deriving it reuses tf's exchange instead of
        // re-tokenizing the corpus and shuffling raw token instances by
        // doc_id — the before-plan had FOUR parquet scans of documents
        // and nine exchanges because the doc_id-keyed token shuffle
        // could not be reused by the (doc_id, term)-keyed one; with
        // every subtree derived from tf, ReuseExchange collapses them
        // (plans/r18/q159_bm25_topk_{before,after}.txt). Same rows: the
        // per-doc token count is the sum of its per-term counts.
        val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
        val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
        // corpus stats over docs that HAVE tokens (dl rows) — same
        // population both engines
        val stats = dl.agg(count(lit(1)).as("nd"), sum("dl").as("tot_dl"))
        // df-ranks 5-7 via the q171 top-k pattern: orderBy+limit plans
        // TakeOrderedAndProject (7 rows per partition cross the wire, at
        // any vocab size), and the rank window then runs over the 7
        // survivors only — a bare global row_number here would pull the
        // whole vocab through one partition.
        val qterms = dfreq
          .orderBy(col("df").desc, col("term")).limit(7)
          .withColumn("dfrk", row_number().over(
            org.apache.spark.sql.expressions.Window
              .orderBy(col("df").desc, col("term"))))
          .filter(col("dfrk").between(5, 7))
          .select("term", "df")
        tf.join(broadcast(qterms), Seq("term"))
          .join(dl, Seq("doc_id"))
          .crossJoin(broadcast(stats))
          .withColumn("score_u", expr(
            """cast(round(
              |  ln((cast(nd AS DOUBLE) - cast(df AS DOUBLE) + 0.5) /
              |     (cast(df AS DOUBLE) + 0.5) + 1.0) *
              |  ((cast(tf AS DOUBLE) * 2.2) /
              |   (cast(tf AS DOUBLE) + 1.2 *
              |    (0.25 + 0.75 * (cast(dl AS DOUBLE) /
              |     (cast(tot_dl AS DOUBLE) / cast(nd AS DOUBLE)))))) * 1e6)
              |AS BIGINT)""".stripMargin))
          .groupBy("doc_id")
          .agg((sum("score_u").cast("double") / 1e6).as("bm25"),
            count(lit(1)).as("n_query_terms"))
          .orderBy(col("bm25").desc, col("doc_id"))
          .limit(10)
      },
      Some(s"""
        WITH tok AS (SELECT doc_id, unnest($duckTokens) AS term FROM documents),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
        dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        stats AS (SELECT count(*) AS nd, sum(dl) AS tot_dl FROM dl),
        qterms AS (SELECT term, df FROM (
                     SELECT term, df, ROW_NUMBER() OVER
                       (ORDER BY df DESC, term) AS dfrk
                     FROM dfreq)
                   WHERE dfrk BETWEEN 5 AND 7),
        scored AS (SELECT tf.doc_id,
                          CAST(round(
                            ln((CAST(nd AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) /
                               (CAST(df AS DOUBLE) + 0.5) + 1.0) *
                            ((CAST(tf AS DOUBLE) * 2.2) /
                             (CAST(tf AS DOUBLE) + 1.2 *
                              (0.25 + 0.75 * (CAST(dl AS DOUBLE) /
                               (CAST(tot_dl AS DOUBLE) / CAST(nd AS DOUBLE)))))) * 1e6)
                          AS BIGINT) AS score_u
                   FROM tf JOIN qterms USING (term)
                   JOIN dl USING (doc_id)
                   CROSS JOIN stats)
        SELECT doc_id,
               CAST(SUM(score_u) AS DOUBLE) / 1e6 AS bm25,
               COUNT(*) AS n_query_terms
        FROM scored
        GROUP BY doc_id
        ORDER BY bm25 DESC, doc_id
        LIMIT 10"""))
  )
}
