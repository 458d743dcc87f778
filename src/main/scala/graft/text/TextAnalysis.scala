package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Text-analysis suite over the `documents` table — the training-data-
  * pipeline text operators (token stats, language ID, quality scoring,
  * fingerprinting, n-gram extraction).
  *
  * Everything is a per-row higher-order-function expression over a token
  * array (`filter(split(lower(text), ...))`), so the hot path is
  * whole-stage-codegen'd, shuffles only for the final aggregates, and
  * scales linearly: at 100 TB each document is processed exactly once with
  * no cross-row state.
  *
  * Reference analog: the reference has no text ops (SURVEY.md §2.2) — this
  * is north-star coverage; tokenization mirrors what its JSON pipeline
  * would need for document payloads (predict.py:30-44 shape).
  */
object TextAnalysis {

  /** Tokens: lowercase, split on non-alphanumeric runs, drop empties —
    * via the native single-pass [[graft.functions.GraftTokens]]
    * expression (equal to
    * `filter(split(lower(text), '[^a-z0-9]+'), x -> x != '')` on ASCII
    * corpora; FunctionsSpec pins the equivalence). The composed form
    * pays a Unicode lowercase allocation + regex split + a
    * CodegenFallback `filter` HOF per row; the native walk stays inside
    * whole-stage codegen. */
  val tokensExpr = "graft_tokens(text)"
  val duckTokens = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"

  /** Word trigrams (shingles) of the token array, distinct. Guarded: Spark
    * sequence(1, n) with n < 1 would generate a *descending* sequence. */
  /** Distinct token trigrams. The `toks` reference is BOUND ONCE through
    * a single-element transform lambda: naively referencing `toks` in
    * each of the 5 places this expression needs it lets CollapseProject
    * inline `graft_tokens(text)` into every reference, re-tokenizing
    * each row ~6× (measured 6.3 s → 0.9 s for the q164 trigram explode
    * at sf0.1). A lambda variable is evaluated once per row, period. */
  val trigramsExpr =
    """flatten(transform(array(toks), t ->
      |  CASE WHEN size(t) < 3 THEN CAST(array() AS ARRAY<STRING>)
      |  ELSE array_distinct(transform(sequence(1, size(t) - 2),
      |    i -> concat_ws(' ', element_at(t, i), element_at(t, i+1), element_at(t, i+2)))) END))""".stripMargin
  val duckTrigrams =
    """list_distinct(list_transform(generate_series(1, len(toks) - 2),
      |  i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2])))""".stripMargin

  private def docsWithTokens(df: DataFrame): DataFrame =
    df.withColumn("toks", expr(tokensExpr))

  /** q164's fp -> source-set shingle index, pre-checkpoint. Extracted so
    * PlanShapeSpec can pin the SINGLE-TOKENIZE contract on its optimized
    * plan (the checkpoint in the query body truncates lineage): fp is a
    * BIGINT (top 60 md5 bits, the q148 idiom) — an 8-byte shuffle key
    * instead of a 32-char string, and the SAME function in both engines
    * so even collisions agree. The (fp, source) dedup runs as a codegen
    * hash aggregate BEFORE the per-fp collect_set, so the object-hash
    * aggregate only ever sees the deduped frame, not raw occurrences. */
  private[graft] def q164ShingleIndex(
      s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    Tables(s, d, "documents")
      .withColumn("toks", expr(tokensExpr))
      .withColumn("tri", expr(trigramsExpr))
      // explode_OUTER + post-filter, not plain explode: for the latter,
      // InferFiltersFromGenerate synthesizes `size(tri) > 0 AND
      // isnotnull(tri)` below the Generate and predicate pushdown
      // substitutes the FULL trigram expression (tokenizer included)
      // into both conjuncts — re-tokenizing every row 3x (the plan-pin
      // in PlanShapeSpec caught exactly this). The outer explode emits
      // one null per empty array instead, dropped right after.
      .select(col("source"), explode_outer(col("tri")).as("gram"))
      .filter(col("gram").isNotNull)
      .select(expr("CAST(conv(substr(md5(gram), 1, 15), 16, 10) AS BIGINT)")
        .as("fp"), col("source"))
      .groupBy("fp", "source").agg(count(lit(1)).as("cnt"))
      .groupBy("fp").agg(sort_array(collect_set(col("source"))).as("srcs"))

  /** Per-language stopword lists (distinct-match heuristics — intersect
    * semantics so Spark/DuckDB agree exactly). */
  private val stop = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "es" -> Seq("el", "los", "las", "y", "es"))
  private def sparkStopHits(l: String) =
    s"CAST(size(array_intersect(toks, array(${stop(l).map("'" + _ + "'").mkString(",")}))) AS BIGINT)"
  private def duckStopHits(l: String) =
    s"CAST(len(list_intersect(toks, [${stop(l).map("'" + _ + "'").mkString(",")}])) AS BIGINT)"

  /** Overlapping 8-token spans, distinct per document (expects `toks`).
    * Shared by q101 and q107's boilerplate stage — span width and the
    * >= 2-docs threshold must stay in lockstep between them. */
  val spansExpr: String =
    """flatten(transform(array(toks), t ->
      |  CASE WHEN size(t) < 8 THEN CAST(array() AS ARRAY<STRING>)
      |  ELSE array_distinct(transform(sequence(1, size(t) - 7),
      |    i -> concat_ws(' ', slice(t, i, 8)))) END))""".stripMargin
  val duckSpans: String =
    """list_distinct(list_transform(generate_series(1, len(toks) - 7),
      |  i -> array_to_string(toks[i:i+7], ' ')))""".stripMargin

  /** (doc_id, n_boiler) from a frame carrying (doc_id, spans): spans
    * whose md5 occurs in >= 2 distinct docs, counted per doc. The
    * cross-corpus aggregate and the re-join shuffle md5(span) — a
    * fixed-width key — never span text. */
  private def boilerCounts(withSpans: DataFrame): DataFrame = {
    val spans = withSpans
      // explode_OUTER + post-filter (q164's lesson, pinned in
      // PlanShapeSpec): plain explode of a projected expensive array
      // lets InferFiltersFromGenerate + pushdown substitute the whole
      // span pipeline (tokenizer included) into two inferred filter
      // conjuncts — 3x the per-row cost.
      .select(col("doc_id"), explode_outer(col("spans")).as("span"))
      .filter(col("span").isNotNull)
      .select(col("doc_id"), md5(col("span")).as("h"))
    val boiler = spans.groupBy("h")
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2).select("h")
    spans.join(boiler, "h").groupBy("doc_id")
      .agg(count(lit(1)).as("n_boiler"))
  }

  /** Boilerplate EXCISION over a frame carrying (doc_id, toks): q101's
    * span geometry (8-token spans, >= 2 distinct docs as "boilerplate"),
    * but with ALL occurrences positioned (q101 distincts spans per doc
    * for counting; removal needs every covered position). Emits
    * (doc_id, n_tokens, n_removed, clean_text) — shared by q112 (whole
    * corpus) and q118 (cascade survivors). */
  private def excised(docs: DataFrame): DataFrame = {
    val spansPos = docs
      .select(col("doc_id"), explode(expr(
        // toks bound once via the single-element lambda (see trigramsExpr)
        """flatten(transform(array(toks), t ->
          |  CASE WHEN size(t) < 8
          |  THEN CAST(array() AS ARRAY<STRUCT<st: INT, h: STRING>>)
          |  ELSE transform(sequence(1, size(t) - 7),
          |    i -> struct(i AS st, md5(concat_ws(' ', slice(t, i, 8))) AS h))
          |  END))""".stripMargin)).as("sp"))
      .select(col("doc_id"), col("sp.st").as("st"), col("sp.h").as("h"))
    val boiler = spansPos.groupBy("h")
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2).select("h")
    val starts = spansPos.join(boiler, "h")
      .groupBy("doc_id").agg(collect_list(col("st")).as("starts"))
    docs.join(starts, Seq("doc_id"), "left")
      .withColumn("starts",
        coalesce(col("starts"), expr("CAST(array() AS ARRAY<INT>)")))
      .withColumn("kept", expr(
        """CASE WHEN size(toks) = 0 THEN CAST(array() AS ARRAY<INT>)
          |ELSE filter(sequence(1, size(toks)),
          |  i -> NOT exists(starts, s -> s <= i AND i <= s + 7)) END"""
          .stripMargin))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        (size(col("toks")) - size(col("kept"))).cast("long").as("n_removed"),
        expr("concat_ws(' ', transform(kept, i -> element_at(toks, i)))")
          .as("clean_text"))
  }

  /** The excision CTE chain over a CTE named `src` carrying
    * (doc_id, toks) — the oracle mirror of [[excised]]; terminal CTE
    * `excised` has (doc_id, n_tokens, n_removed, clean_text). */
  private def duckExciseCtes(src: String): String =
    s"""xsp AS (SELECT doc_id, i AS st,
       |              md5(array_to_string(toks[i:i+7], ' ')) AS h
       |       FROM (SELECT doc_id, toks,
       |                    unnest(generate_series(1, len(toks) - 7)) AS i
       |             FROM $src)),
       |xb AS (SELECT h FROM (SELECT h, COUNT(DISTINCT doc_id) nd
       |                      FROM xsp GROUP BY h) WHERE nd >= 2),
       |xst AS (SELECT doc_id, list(xsp.st) AS starts
       |        FROM xsp JOIN xb USING (h) GROUP BY doc_id),
       |xk AS (SELECT $src.doc_id, toks,
       |              list_filter(generate_series(1, len(toks)),
       |                i -> len(list_filter(COALESCE(starts, []),
       |                       s -> s <= i AND i <= s + 7)) = 0) AS kept
       |       FROM $src LEFT JOIN xst ON $src.doc_id = xst.doc_id),
       |excised AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
       |                   CAST(len(toks) - len(kept) AS BIGINT) AS n_removed,
       |                   COALESCE(array_to_string(list_transform(kept,
       |                     i -> toks[CAST(i AS INTEGER)]), ' '), '') AS clean_text
       |            FROM xk)""".stripMargin

  /** The sp/b/pd CTE chain over a CTE named `ws` carrying
    * (doc_id, spans) — the oracle mirror of [[boilerCounts]]. */
  private def duckBoilerCtes(ws: String): String =
    s"""sp AS (SELECT doc_id, md5(span) AS h
       |       FROM (SELECT doc_id, unnest(spans) AS span FROM $ws)),
       |b AS (SELECT h FROM (SELECT h, COUNT(DISTINCT doc_id) nd
       |                     FROM sp GROUP BY h) WHERE nd >= 2),
       |pd AS (SELECT doc_id, COUNT(*) AS n_boiler
       |       FROM sp JOIN b USING (h) GROUP BY doc_id)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // --------------------------------------------------------------- q30:
    // per-document token statistics (token counting for budget/quota
    // accounting in a data pipeline).
    QueryDef(
      "q30_token_stats",
      (s, d) =>
        docsWithTokens(Tables(s, d, "documents"))
          .select(
            col("doc_id"),
            col("n_chars"),
            expr("CAST(size(toks) AS BIGINT)").as("n_tokens"),
            expr("CAST(size(array_distinct(toks)) AS BIGINT)").as("n_distinct"),
            // empty doc → NULL in BOTH engines (Spark's 0.0/0 would give
            // NaN; DuckDB's bare list_reduce would raise on the empty
            // list) — the totality guard that keeps the oracle contract
            // defined over the full fixture schema, not just non-empty docs.
            expr("""CASE WHEN size(toks) = 0 THEN NULL
                 ELSE CAST(aggregate(toks, 0L, (acc, x) -> acc + length(x)) AS DOUBLE) / size(toks) END""")
              .as("avg_token_len"))
          .orderBy("doc_id"),
      Some("""
        WITH t AS (SELECT doc_id, n_chars,
                          list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') toks
                   FROM documents)
        SELECT doc_id, n_chars,
               CAST(len(toks) AS BIGINT) AS n_tokens,
               CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
               CASE WHEN len(toks) = 0 THEN NULL
                    ELSE CAST(list_reduce(list_transform(toks, x -> CAST(length(x) AS BIGINT)), (a,b) -> a+b) AS DOUBLE)
                         / len(toks) END AS avg_token_len
        FROM t ORDER BY doc_id""")),

    // --------------------------------------------------------------- q31:
    // global word frequency top-k: explode -> hash agg -> top-k. The agg
    // shuffles one row per distinct word (partial agg map-side), then
    // TakeOrderedAndProject — no full sort at any scale.
    QueryDef(
      "q31_word_freq_topk",
      (s, d) =>
        docsWithTokens(Tables(s, d, "documents"))
          // explode_outer: plain explode gets an inferred non-empty filter
          // whose scan-pushed condition re-runs the tokenizer (see Dedup)
          .select(col("doc_id"), explode_outer(col("toks")).as("word"))
          .filter(length(col("word")) > 2)
          .groupBy("word")
          .agg(count(lit(1)).as("n_occurrences"),
               countDistinct(col("doc_id")).as("n_docs"))
          .orderBy(col("n_occurrences").desc, col("word"))
          .limit(50),
      Some("""
        WITH w AS (SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                                     x -> x <> '')) AS word
                   FROM documents)
        SELECT word, COUNT(*) AS n_occurrences, COUNT(DISTINCT doc_id) AS n_docs
        FROM w WHERE length(word) > 2
        GROUP BY word
        ORDER BY n_occurrences DESC, word
        LIMIT 50""")),

    // --------------------------------------------------------------- q32:
    // language identification via stopword-set hits (n-gram-free heuristic
    // — per-row, no shuffle).
    QueryDef(
      "q32_lang_id",
      (s, d) =>
        docsWithTokens(Tables(s, d, "documents"))
          .select(
            col("doc_id"), col("lang"),
            expr(sparkStopHits("en")).as("hits_en"),
            expr(sparkStopHits("de")).as("hits_de"),
            expr(sparkStopHits("fr")).as("hits_fr"),
            expr(sparkStopHits("es")).as("hits_es"))
          .withColumn("guess",
            expr("""CASE WHEN hits_en >= greatest(hits_de, hits_fr, hits_es) THEN 'en'
                         WHEN hits_de >= greatest(hits_fr, hits_es) THEN 'de'
                         WHEN hits_fr >= hits_es THEN 'fr'
                         ELSE 'es' END"""))
          .withColumn("is_match", col("guess") === col("lang"))
          .orderBy("doc_id"),
      Some(s"""
        WITH t AS (SELECT doc_id, lang, $duckTokens toks FROM documents),
        h AS (SELECT doc_id, lang,
                     ${duckStopHits("en")} hits_en, ${duckStopHits("de")} hits_de,
                     ${duckStopHits("fr")} hits_fr, ${duckStopHits("es")} hits_es
              FROM t)
        SELECT doc_id, lang, hits_en, hits_de, hits_fr, hits_es,
               CASE WHEN hits_en >= greatest(hits_de, hits_fr, hits_es) THEN 'en'
                    WHEN hits_de >= greatest(hits_fr, hits_es) THEN 'de'
                    WHEN hits_fr >= hits_es THEN 'fr'
                    ELSE 'es' END AS guess,
               (CASE WHEN hits_en >= greatest(hits_de, hits_fr, hits_es) THEN 'en'
                     WHEN hits_de >= greatest(hits_fr, hits_es) THEN 'de'
                     WHEN hits_fr >= hits_es THEN 'fr'
                     ELSE 'es' END) = lang AS is_match
        FROM h ORDER BY doc_id""")),

    // --------------------------------------------------------------- q33:
    // document quality scoring: length/alnum-ratio/stopword-ratio
    // composite. Pure per-row IEEE arithmetic, bit-identical both engines.
    QueryDef(
      "q33_quality_score",
      (s, d) =>
        docsWithTokens(Tables(s, d, "documents"))
          .select(
            col("doc_id"),
            expr("CAST(length(text) AS BIGINT)").as("len_chars"),
            expr("CAST(size(toks) AS BIGINT)").as("n_tokens"),
            // zero-denominator guards: DuckDB float division by zero is
            // NULL while Spark's is NaN — nullify explicitly so both
            // engines agree on empty docs (fixtures have none today).
            expr("""CASE WHEN length(text) = 0 THEN NULL
                 ELSE CAST(length(regexp_replace(text, '[^a-zA-Z0-9]', '')) AS DOUBLE) / length(text) END""")
              .as("alnum_ratio"),
            when(expr("size(toks)") === 0, lit(null))
              .otherwise(expr(sparkStopHits("en")).cast("double") / expr("size(toks)"))
              .as("stop_ratio"))
          .withColumn("quality",
            round(least(lit(1.0), col("n_tokens") / 100.0) * 0.5 +
                  col("alnum_ratio") * 0.3 + (lit(1.0) - col("stop_ratio")) * 0.2, 6))
          .orderBy("doc_id"),
      Some(s"""
        WITH t AS (SELECT doc_id, text, $duckTokens toks FROM documents),
        m AS (SELECT doc_id,
                     CAST(length(text) AS BIGINT) len_chars,
                     CAST(len(toks) AS BIGINT) n_tokens,
                     CAST(length(regexp_replace(text, '[^a-zA-Z0-9]', '', 'g')) AS DOUBLE) / length(text) alnum_ratio,
                     CAST(${duckStopHits("en")} AS DOUBLE) / len(toks) stop_ratio
              FROM t)
        SELECT doc_id, len_chars, n_tokens, alnum_ratio, stop_ratio,
               round(least(1.0, n_tokens / 100.0) * 0.5 + alnum_ratio * 0.3 + (1.0 - stop_ratio) * 0.2, 6) AS quality
        FROM m ORDER BY doc_id""")),

    // --------------------------------------------------------------- q34:
    // document fingerprinting: md5 of whitespace-normalized text plus an
    // order-independent content fingerprint (md5 of the sorted distinct
    // trigram set) with duplicate-group counts.
    QueryDef(
      "q34_fingerprint",
      (s, d) => {
        val fp = docsWithTokens(Tables(s, d, "documents"))
          .withColumn("tri", expr(trigramsExpr))
          .select(
            col("doc_id"),
            md5(expr("trim(regexp_replace(lower(text), '\\\\s+', ' '))")).as("fp_norm"),
            md5(expr("concat_ws('|', array_sort(tri))")).as("fp_shingle"))
        val grp = fp.groupBy("fp_shingle").agg(count(lit(1)).as("n_same_shingle"))
        fp.join(grp, "fp_shingle")
          .select("doc_id", "fp_norm", "fp_shingle", "n_same_shingle")
          .orderBy("doc_id")
      },
      Some(s"""
        WITH t AS (SELECT doc_id, text, $duckTokens toks FROM documents),
        f AS (SELECT doc_id,
                     md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) fp_norm,
                     md5(array_to_string(list_sort($duckTrigrams), '|')) fp_shingle
              FROM t)
        SELECT doc_id, fp_norm, fp_shingle,
               COUNT(*) OVER (PARTITION BY fp_shingle) AS n_same_shingle
        FROM f ORDER BY doc_id""")),

    // --------------------------------------------------------------- q35:
    // top word-trigrams corpus-wide (n-gram extraction + hash agg).
    QueryDef(
      "q35_top_trigrams",
      (s, d) =>
        docsWithTokens(Tables(s, d, "documents"))
          .withColumn("tri", expr(trigramsExpr))
          .select(col("doc_id"), explode_outer(col("tri")).as("trigram"))
          .filter(col("trigram").isNotNull)
          .groupBy("trigram")
          .agg(countDistinct(col("doc_id")).as("n_docs"))
          .orderBy(col("n_docs").desc, col("trigram"))
          .limit(30),
      Some(s"""
        WITH t AS (SELECT doc_id, $duckTokens toks FROM documents),
        g AS (SELECT doc_id, unnest($duckTrigrams) AS trigram FROM t)
        SELECT trigram, COUNT(DISTINCT doc_id) AS n_docs
        FROM g GROUP BY trigram
        ORDER BY n_docs DESC, trigram
        LIMIT 30""")),

    // --------------------------------------------------------------- q36:
    // token counting two ways: whitespace split vs a BPE-ish regex that
    // segments runs of letters / digits / punctuation with their leading
    // space (the GPT-2 pre-tokenizer shape, ASCII subset) — the budget
    // numbers an LLM-data pipeline accounts with. Pure per-row regex,
    // codegen'd, no shuffle until the final ORDER BY.
    QueryDef(
      "q36_bpe_token_count",
      (s, d) =>
        Tables(s, d, "documents")
          .select(
            col("doc_id"),
            expr("CAST(size(filter(split(text, '\\\\s+'), x -> x != '')) AS BIGINT)")
              .as("ws_tokens"),
            expr("CAST(size(regexp_extract_all(lower(text), ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+', 0)) AS BIGINT)")
              .as("bpe_tokens"),
            expr("CAST(length(text) AS BIGINT)").as("n_chars"))
          // empty text → 0 bpe tokens → NULL (matches DuckDB's NULL-on-
          // zero-division; Spark alone would produce NaN)
          .withColumn("chars_per_bpe_token",
            when(col("bpe_tokens") === 0, lit(null))
              .otherwise(col("n_chars").cast("double") / col("bpe_tokens")))
          .orderBy("doc_id"),
      Some("""
        SELECT doc_id,
               CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS BIGINT) AS ws_tokens,
               CAST(len(regexp_extract_all(lower(text), ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+')) AS BIGINT) AS bpe_tokens,
               CAST(length(text) AS BIGINT) AS n_chars,
               CAST(length(text) AS DOUBLE)
                 / len(regexp_extract_all(lower(text), ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+')) AS chars_per_bpe_token
        FROM documents
        ORDER BY doc_id""")),

    // --------------------------------------------------------------- q63:
    // exact distributed TF-IDF, top-3 terms per document: the classic
    // explode → (doc,term) partial-agg → df agg → broadcast-N join
    // pipeline (every shuffle is key-sized; corpus count arrives as a
    // 1-row broadcast). Scores are ranked on the ROUNDED value so an
    // ulp of ln() difference between engines can't flip the order.
    QueryDef(
      "q63_tfidf_topk",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables(s, d, "documents")
        val tf = docs.select(col("doc_id"), explode(expr(tokensExpr)).as("term"))
          .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
        val n = docs.agg(count(lit(1)).as("nn"))
        val w = Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("term"))
        tf.filter(col("doc_id") < 100)
          .join(dfreq, Seq("term"))
          .crossJoin(broadcast(n))
          .withColumn("score", round(col("tf") *
            (log((col("nn") + 1.0) / (col("df") + 1.0)) + 1.0), 6))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select(col("doc_id"), col("rk"), col("term"), col("score"))
          .orderBy("doc_id", "rk")
      },
      Some(s"""
        WITH tok AS (SELECT doc_id, unnest($duckTokens) AS term FROM documents),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        n AS (SELECT count(*) AS nn FROM documents),
        sc AS (SELECT tf.doc_id, tf.term,
                      round(tf.tf * (ln((nn + 1.0) / (df + 1.0)) + 1.0), 6) AS score
               FROM tf JOIN dfreq USING (term) CROSS JOIN n
               WHERE tf.doc_id < 100),
        r AS (SELECT doc_id, term, score,
                     CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                          ORDER BY score DESC, term) AS INTEGER) AS rk
              FROM sc)
        SELECT doc_id, rk, term, score
        FROM r WHERE rk <= 3
        ORDER BY doc_id, rk""")),

    // --------------------------------------------------------------- q93:
    // PII scrub — regex redaction over a per-row text field, the pass a
    // training pipeline runs on every document before anything ships. All
    // codegen'd string expressions (regexp_replace / regexp_extract_all),
    // zero shuffles until the final sort: per-row cost only, embarrassingly
    // parallel at any scale. The synthetic fixture's PII-shaped payload is
    // the customer id embedded in c_name ('Customer#000000042'); the
    // pattern is deliberately RE2-safe so DuckDB replays it exactly
    // (DuckDB needs the 'g' flag for replace-ALL — Java's default).
    QueryDef(
      "q93_pii_scrub",
      (s, d) => {
        val msg = concat(lit("reach "), col("c_name"),
          lit(" segment "), col("c_mktsegment"))
        Tables(s, d, "customer")
          .withColumn("scrubbed", regexp_replace(msg, "#[0-9]+", "#[ID]"))
          .withColumn("n_redacted",
            size(expr("regexp_extract_all(concat('reach ', c_name, " +
              "' segment ', c_mktsegment), '#[0-9]+', 0)")))
          .filter(col("n_redacted") > 0)
          .select(col("c_custkey"), col("scrubbed"), col("n_redacted"))
          .orderBy("c_custkey")
      },
      Some("""
        WITH m AS (SELECT c_custkey,
                          'reach ' || c_name || ' segment ' || c_mktsegment AS msg
                   FROM customer)
        SELECT c_custkey,
               regexp_replace(msg, '#[0-9]+', '#[ID]', 'g') AS scrubbed,
               CAST(len(regexp_extract_all(msg, '#[0-9]+')) AS INTEGER) AS n_redacted
        FROM m
        WHERE len(regexp_extract_all(msg, '#[0-9]+')) > 0
        ORDER BY c_custkey""")),

    // --------------------------------------------------------------- q94:
    // repetition-ratio quality filter (the Gopher/C4-family signal q33's
    // length/punct/stopword scores don't capture): share of tokens that
    // are repeats of an earlier token. Pure per-row higher-order-function
    // arithmetic — no shuffle until the final sort. Totality: the ratio
    // is defined 0 for empty docs on BOTH sides (ADVICE round-1 lesson:
    // oracles must not divide by zero when fixtures grow empty docs).
    QueryDef(
      "q94_repetition_ratio",
      (s, d) =>
        Tables(s, d, "documents")
          .withColumn("n_tok", size(expr(tokensExpr)).cast("long"))
          .withColumn("n_uniq",
            size(array_distinct(expr(tokensExpr))).cast("long"))
          // rep_ratio unrounded (raw IEEE 1.0 - u/t is bit-identical
          // across engines; round(double, 6) is not at scale-6 decimal
          // ties); the 0.55 cut keeps round-half-up semantics
          // (round(ratio,6) <= 0.55  ⇔  ratio < 0.5500005, STRICT: a
          // ratio of exactly 0.5500005 rounds up to 0.550001 and is
          // excluded) as EXACT integer arithmetic
          .withColumn("rep_ratio",
            when(col("n_tok") === 0, lit(0.0))
              .otherwise(lit(1.0) - col("n_uniq") / col("n_tok")))
          .withColumn("keep", col("n_tok") === 0 ||
            (col("n_tok") - col("n_uniq")) * 10000000L <
              col("n_tok") * 5500005L)
          .select(col("doc_id"), col("n_tok"), col("n_uniq"),
            col("rep_ratio"), col("keep"))
          .orderBy("doc_id"),
      Some(s"""
        WITH t AS (SELECT doc_id,
                          CAST(len($duckTokens) AS BIGINT) AS n_tok,
                          CAST(len(list_distinct($duckTokens)) AS BIGINT) AS n_uniq
                   FROM documents)
        SELECT doc_id, n_tok, n_uniq,
               CASE WHEN n_tok = 0 THEN 0.0
                    ELSE 1.0 - n_uniq / n_tok END AS rep_ratio,
               (n_tok = 0 OR
                (n_tok - n_uniq) * 10000000 < n_tok * 5500005) AS keep
        FROM t
        ORDER BY doc_id""")),

    // --------------------------------------------------------------- q97:
    // benchmark decontamination — flag corpus documents sharing any word
    // trigram with a held-out benchmark set (the pass every pretraining
    // pipeline runs so eval data never leaks into training data; here the
    // benchmark is the deterministic doc_id % 97 == 0 slice).
    //
    // Scale shape: the benchmark n-gram set is tiny relative to the corpus
    // (evals are thousands of docs, the corpus is billions), so it is
    // BROADCAST — the corpus side explodes trigrams and probes the
    // broadcast hash map entirely map-side. The only shuffle is the
    // per-doc distinct-hit count over the matched subset (contaminated
    // docs only), which is orders of magnitude smaller than the corpus.
    QueryDef(
      "q97_decontaminate",
      (s, d) => {
        val tri = Tables(s, d, "documents")
          .withColumn("toks", expr(tokensExpr))
          .withColumn("tri", expr(trigramsExpr))
          .select(col("doc_id"), explode_outer(col("tri")).as("trigram"))
          .filter(col("trigram").isNotNull)
        val bench = tri.filter(col("doc_id") % 97 === 0)
          .select("trigram").distinct()
        tri.filter(col("doc_id") % 97 =!= 0)
          .join(broadcast(bench), "trigram")
          .groupBy("doc_id")
          .agg(countDistinct(col("trigram")).as("n_hits"))
          .orderBy("doc_id")
      },
      Some(s"""
        WITH t AS (SELECT doc_id, $duckTokens toks FROM documents),
        g AS (SELECT doc_id, unnest($duckTrigrams) AS trigram FROM t),
        b AS (SELECT DISTINCT trigram FROM g WHERE doc_id % 97 = 0)
        SELECT c.doc_id, CAST(COUNT(DISTINCT c.trigram) AS BIGINT) AS n_hits
        FROM g c JOIN b USING (trigram)
        WHERE c.doc_id % 97 <> 0
        GROUP BY c.doc_id
        ORDER BY doc_id""")),

    // -------------------------------------------------------------- q101:
    // cross-document repeated-span (boilerplate) detection — the
    // CCNet/RefinedWeb-style pass that flags documents dominated by text
    // shared with OTHER documents (site headers/footers, licence blocks,
    // templated pages). Spans are overlapping 8-token shingles, distinct
    // per document; a span occurring in >= 2 distinct documents is
    // boilerplate; a document keeps only if its boilerplate span fraction
    // is <= 0.5.
    //
    // Scale shape: the cross-corpus frequency aggregate and the per-doc
    // re-join shuffle md5(span) — a FIXED-WIDTH 32-char key — never the
    // span text, so shuffle width is independent of span length (at 100 TB
    // the 8-gram text payload would dominate the wire otherwise). Both
    // aggregates partial-combine map-side; the doc-frequency table only
    // carries spans, not documents, so its size is bounded by the distinct
    // span count, and the >= 2 filter shrinks it to the (rare) repeated
    // tail before the re-join.
    QueryDef(
      "q101_span_dedup",
      (s, d) => {
        val docs = Tables(s, d, "documents")
          .withColumn("toks", expr(tokensExpr))
          .withColumn("spans", expr(spansExpr))
        // boiler_frac stays UNROUNDED: both engines divide the same two
        // exact small integers widened to double — bit-identical IEEE —
        // whereas round() on a double near a scale-6 decimal tie
        // (1/640 = 0.0015625) resolves differently per engine (the q105
        // lesson)
        docs.select(col("doc_id"), size(col("spans")).cast("long").as("n_spans"))
          .join(boilerCounts(docs), Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_spans"),
            coalesce(col("n_boiler"), lit(0L)).as("n_boiler"))
          .withColumn("boiler_frac", when(col("n_spans") === 0, lit(0.0))
            .otherwise(col("n_boiler").cast("double") / col("n_spans")))
          .withColumn("keep", col("boiler_frac") <= 0.5)
          .orderBy("doc_id")
      },
      Some(s"""
        WITH ws AS (
          SELECT doc_id, $duckSpans AS spans
          FROM (SELECT doc_id, $duckTokens toks FROM documents)),
        ${duckBoilerCtes("ws")},
        base AS (SELECT doc_id, CAST(len(spans) AS BIGINT) AS n_spans FROM ws)
        SELECT base.doc_id, n_spans,
               CAST(COALESCE(n_boiler, 0) AS BIGINT) AS n_boiler,
               CASE WHEN n_spans = 0 THEN 0.0
                    ELSE COALESCE(n_boiler, 0) / n_spans END AS boiler_frac,
               (CASE WHEN n_spans = 0 THEN 0.0
                     ELSE COALESCE(n_boiler, 0) / n_spans END) <= 0.5 AS keep
        FROM base LEFT JOIN pd USING (doc_id)
        ORDER BY doc_id""")),

    // -------------------------------------------------------------- q107:
    // the CLEANING CASCADE — the individual filters (q31 lang, q30
    // length, q94 repetition, q101 boilerplate, q40 exact dedup)
    // composed in pipeline order, reporting per-stage survivor counts:
    // the funnel report every training-data run publishes. Stage order
    // matters (each filter sees only the previous stage's survivors) and
    // is identical in both engines.
    //
    // Scale shape: stages 0-3 are cumulative BOOLEAN FLAGS computed in a
    // single scan pass (And short-circuits per row, so the repetition
    // ratio is only evaluated for length-passing docs) and counted by
    // one conditional-sum aggregate — six independent count branches
    // would rescan and re-tokenize the corpus per stage, since Catalyst
    // shares no subplans across union branches. Only the cross-doc
    // boilerplate stage (md5(span) frequency over stage-3 survivors,
    // q101's shape via the shared boilerCounts) and the final dedup
    // fingerprint pay additional passes.
    QueryDef(
      "q107_clean_cascade",
      (s, d) => {
        val flagged = Tables(s, d, "documents")
          .withColumn("toks", expr(tokensExpr))
          .withColumn("n_tok", size(col("toks")).cast("long"))
          .withColumn("f1", col("lang") === "en")
          .withColumn("f2", col("f1") &&
            col("n_tok") >= 10 && col("n_tok") <= 10000)
          // f3 is EXACTLY q94's keep predicate (same integer arithmetic,
          // same strict boundary) so a doc q94 keeps is never dropped by
          // the cascade that documents itself as composing q94's filter
          .withColumn("f3", col("f2") &&
            (col("n_tok") - size(array_distinct(col("toks"))).cast("long"))
              * 10000000L < col("n_tok") * 5500005L)
        val s3 = flagged.filter(col("f3"))
          .withColumn("spans", expr(spansExpr))
        val s4 = s3
          .select(col("doc_id"), col("text"),
            size(col("spans")).cast("long").as("n_spans"))
          .join(boilerCounts(s3), Seq("doc_id"), "left")
          .filter(coalesce(col("n_boiler"), lit(0L)).cast("double") <=
            col("n_spans") * 0.5 || col("n_spans") === 0)
        val headCounts = flagged.agg(
          count(lit(1)).as("c0"),
          sum(col("f1").cast("long")).as("c1"),
          sum(col("f2").cast("long")).as("c2"),
          sum(col("f3").cast("long")).as("c3"))
        val tailCounts = s4.agg(
          count(lit(1)).as("c4"),
          countDistinct(md5(col("text"))).as("c5"))
        headCounts.crossJoin(tailCounts)
          .select(expr(
            """stack(6,
              |0, 'input', c0, 1, 'lang', c1, 2, 'length', c2,
              |3, 'repetition', c3, 4, 'boilerplate', c4,
              |5, 'exact_dedup', c5) AS (stage_ord, stage, rows_kept)"""
              .stripMargin))
          .orderBy("stage_ord")
      },
      Some(s"""
        WITH s0 AS (SELECT doc_id, text, lang, $duckTokens toks,
                           CAST(len($duckTokens) AS BIGINT) n_tok
                    FROM documents),
        s1 AS (SELECT * FROM s0 WHERE lang = 'en'),
        s2 AS (SELECT * FROM s1 WHERE n_tok BETWEEN 10 AND 10000),
        s3 AS (SELECT * FROM s2
               WHERE (n_tok - CAST(len(list_distinct(toks)) AS BIGINT))
                       * 10000000 < n_tok * 5500005),
        ws AS (SELECT doc_id, text, $duckSpans spans FROM s3),
        ${duckBoilerCtes("ws")},
        s4 AS (SELECT ws.doc_id, ws.text
               FROM ws LEFT JOIN pd USING (doc_id)
               WHERE COALESCE(n_boiler, 0) <= len(spans) * 0.5
                  OR len(spans) = 0),
        s5 AS (SELECT md5(text) fp, MIN(doc_id) doc_id FROM s4 GROUP BY 1)
        SELECT * FROM (
          SELECT 0 AS stage_ord, 'input' AS stage, COUNT(*) AS rows_kept FROM s0
          UNION ALL SELECT 1, 'lang', COUNT(*) FROM s1
          UNION ALL SELECT 2, 'length', COUNT(*) FROM s2
          UNION ALL SELECT 3, 'repetition', COUNT(*) FROM s3
          UNION ALL SELECT 4, 'boilerplate', COUNT(*) FROM s4
          UNION ALL SELECT 5, 'exact_dedup', COUNT(*) FROM s5)
        ORDER BY stage_ord""")),

    // -------------------------------------------------------------- q112:
    // span-level boilerplate REMOVAL (RefinedWeb-style) — the operator a
    // cleaning pipeline runs after q101 DECIDES which spans are
    // boilerplate: excise every token covered by a cross-document span,
    // keep the rest in original order, and report the removal accounting.
    // Width 8 and the >= 2-distinct-docs threshold are q101's — the two
    // queries must stay in lockstep (q101 flags, q112 excises).
    //
    // Scale shape: span occurrences shuffle as (md5, start) — fixed-width
    // hash + int, never span text; the boilerplate set is derived with one
    // map-side-combined distinct-count; coverage is a per-doc array fold
    // (exists() over the doc's own boiler starts — tens of ints), so the
    // only corpus-sized shuffles are the span hash aggregate and the
    // starts re-join, both keyed small.
    QueryDef(
      "q112_boiler_removal",
      (s, d) => excised(Tables(s, d, "documents")
        .select(col("doc_id"), expr(tokensExpr).as("toks")))
        .orderBy("doc_id"),
      Some(s"""
        WITH dt AS (SELECT doc_id, $duckTokens AS toks FROM documents),
        ${duckExciseCtes("dt")}
        SELECT doc_id, n_tokens, n_removed, clean_text
        FROM excised
        ORDER BY doc_id""")),

    // -------------------------------------------------------------- q118:
    // the cleaning pipeline MATERIALIZED — q107 reports the funnel, this
    // emits the corpus a training run would actually consume: lang →
    // length → repetition filters (q107's exact predicates), boilerplate
    // EXCISION over the survivors (q112's operator, not just the 50%
    // drop rule), a post-excision minimum length, and exact dedup on the
    // CLEANED text (min doc_id survives). Every stage is individually
    // oracle-proven; this pins their composition.
    QueryDef(
      "q118_clean_corpus",
      (s, d) => {
        val survivors = Tables(s, d, "documents")
          .withColumn("toks", expr(tokensExpr))
          .withColumn("n_tok", size(col("toks")).cast("long"))
          .filter(col("lang") === "en")
          .filter(col("n_tok") >= 10 && col("n_tok") <= 10000)
          .filter((col("n_tok") - size(array_distinct(col("toks"))).cast("long"))
            * 10000000L < col("n_tok") * 5500005L)
          .select(col("doc_id"), col("toks"))
        excised(survivors)
          .filter(col("n_tokens") - col("n_removed") >= 10)
          .groupBy(md5(col("clean_text")).as("fp"))
          .agg(expr(
            "min_by(struct(doc_id, n_tokens, n_removed, clean_text), doc_id)")
            .as("k"))
          .select(col("k.doc_id").as("doc_id"),
            col("k.n_tokens").as("n_tokens_raw"),
            (col("k.n_tokens") - col("k.n_removed")).as("n_tokens_clean"),
            col("k.clean_text").as("clean_text"))
          .orderBy("doc_id")
      },
      Some(s"""
        WITH s0 AS (SELECT doc_id, lang, $duckTokens AS toks FROM documents),
        f1 AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n_tok
               FROM s0 WHERE lang = 'en'),
        f2 AS (SELECT * FROM f1 WHERE n_tok BETWEEN 10 AND 10000),
        f3 AS (SELECT doc_id, toks FROM f2
               WHERE (n_tok - CAST(len(list_distinct(toks)) AS BIGINT))
                       * 10000000 < n_tok * 5500005),
        ${duckExciseCtes("f3")},
        c2 AS (SELECT * FROM excised WHERE n_tokens - n_removed >= 10),
        r AS (SELECT doc_id, n_tokens AS n_tokens_raw,
                     n_tokens - n_removed AS n_tokens_clean, clean_text,
                     ROW_NUMBER() OVER (PARTITION BY md5(clean_text)
                       ORDER BY doc_id) AS rn
              FROM c2)
        SELECT doc_id, n_tokens_raw, n_tokens_clean, clean_text
        FROM r WHERE rn = 1
        ORDER BY doc_id""")),

    // -------------------------------------------------------------- q164:
    // Pairwise source-overlap (contamination) matrix: trigram-shingle
    // Jaccard between every pair of document sources — the dataset-
    // quality report that answers "how much does slice A leak into
    // slice B" before mixing corpora (q97 checks docs against ONE
    // benchmark; this is the all-pairs slice audit). All counts are
    // exact integers; jaccard is ONE final division.
    //
    // Scale shape: shingles shuffle as 32-char md5 fingerprints (never
    // span text — q101's lesson), and the WHOLE matrix derives from ONE
    // corpus shuffle: groupBy(fp) + collect_set(source) dedups and
    // inverts in the same aggregate (no pre-distinct pass, no fp
    // self-join — the first cut joined the per-source fp set against
    // itself and recomputed the explode pipeline three times, measured
    // 7.8 s at sf0.1; this shape is ~6× cheaper). The resulting
    // fp → source-set frame is the shingle index a dedup pipeline
    // materializes anyway; it is checkpointed once and the per-fp pair
    // fan-out is bounded by |sources|² (the q155 basket-pair trick),
    // never corpus × corpus. Zero-overlap pairs are preserved via the
    // broadcast size-frame cross.
    QueryDef(
      "q164_source_overlap_matrix",
      (s, d) => {
        val srcSets = q164ShingleIndex(s, d).localCheckpoint(true)
        val sizes = srcSets.select(explode(col("srcs")).as("source"))
          .groupBy("source").agg(count(lit(1)).as("n"))
        val inter = srcSets
          .select(explode(expr(
            """flatten(transform(srcs, (x, i) ->
              |  transform(slice(srcs, i + 2, size(srcs)),
              |            y -> struct(x AS source_a, y AS source_b))))""".stripMargin))
            .as("p"))
          .select(col("p.source_a"), col("p.source_b"))
          .groupBy("source_a", "source_b")
          .agg(count(lit(1)).as("n_inter"))
        val pairs = sizes.select(col("source").as("source_a"), col("n").as("n_a"))
          .crossJoin(sizes.select(col("source").as("source_b"), col("n").as("n_b")))
          .filter(col("source_a") < col("source_b"))
        broadcast(pairs).join(inter, Seq("source_a", "source_b"), "left")
          .withColumn("n_inter", coalesce(col("n_inter"), lit(0L)))
          .select(col("source_a"), col("source_b"),
            col("n_a"), col("n_b"), col("n_inter"),
            round(col("n_inter").cast("double") /
              (col("n_a") + col("n_b") - col("n_inter")).cast("double"), 6)
              .as("jaccard"))
          .orderBy("source_a", "source_b")
      },
      Some(s"""
        WITH t AS (SELECT source, $duckTokens toks FROM documents),
        g0 AS (SELECT source, unnest($duckTrigrams) AS gram FROM t),
        g AS (SELECT DISTINCT source,
                CAST(concat('0x', substr(md5(gram), 1, 15)) AS BIGINT) AS fp
              FROM g0),
        sz AS (SELECT source, count(*) AS n FROM g GROUP BY 1),
        it AS (SELECT a.source AS source_a, b.source AS source_b,
                      count(*) AS n_inter
               FROM g a JOIN g b USING (fp)
               WHERE a.source < b.source
               GROUP BY 1, 2),
        pr AS (SELECT za.source AS source_a, zb.source AS source_b,
                      za.n AS n_a, zb.n AS n_b
               FROM sz za, sz zb WHERE za.source < zb.source)
        SELECT pr.source_a, pr.source_b, pr.n_a, pr.n_b,
               COALESCE(it.n_inter, 0) AS n_inter,
               round(CAST(COALESCE(it.n_inter, 0) AS DOUBLE) /
                     CAST(pr.n_a + pr.n_b - COALESCE(it.n_inter, 0)
                       AS DOUBLE), 6) AS jaccard
        FROM pr LEFT JOIN it USING (source_a, source_b)
        ORDER BY source_a, source_b"""))
  )
}
