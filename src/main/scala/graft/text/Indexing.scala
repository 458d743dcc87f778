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
        ORDER BY doc_id, chunk_id"""))
  )
}
