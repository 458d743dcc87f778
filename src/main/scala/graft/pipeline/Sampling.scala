package graft.pipeline

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Reference-parity sampling ops (SURVEY.md §2.1 F1/F2): exact-n
  * stratified sampling and a stratified 70/30 train/test split, re-expressed
  * as distributed Spark transformations.
  *
  * The reference does this driver-side in pandas/sklearn
  * (prepare_data.py:19-31, seed 42) — fine for 2,000 rows, impossible at
  * 100 TB. Here the "random" order is a deterministic md5 of "42:<key>"
  * (seed 42 analog), ranked per class with a window — one shuffle on the
  * class key, no driver collect, and the sample is stable under any
  * cluster size or partitioning. The DuckDB oracle replays the identical
  * ranking, so the *exact row identity* of the sample is verified, not
  * just its size.
  */
object Sampling {

  private[graft] val rkSpark = md5(concat(lit("42:"), col("vec_id").cast("string")))

  /** Exact per-class rank WITHOUT a bare-label window (scale-safe exact-n
    * stratification for callers that need the rank of every row, e.g. a
    * data-dependent quota — q60 / FraudPipeline).
    *
    * A `row_number().over(partitionBy(label))` funnels the whole table
    * through #labels reducer tasks. Here the rank is assembled in two
    * phases instead: (label, 16-bit md5-prefix bucket) counts are
    * partial-aggregated map-side into a ≤ #labels × 65,536-row table whose
    * per-label running sum gives each bucket's starting offset
    * (broadcast back), and the row-level window ranks only WITHIN
    * (label, bucket) — 65,536-way parallel per label, each partition
    * ~n/65,536 rows. Lexicographic md5 order equals numeric bucket order
    * for fixed-width hex, so `bucket offset + local rank` is exactly the
    * rank the direct window would produce.
    *
    * Adds `rn` (int, 1-based rank in (rkCol, idCol) order per label) and
    * `n_class` (long) to `df`'s columns. See q51 for the cheaper variant
    * when only a threshold decision (not the rank itself) is needed.
    */
  def rankedByClass(df: org.apache.spark.sql.DataFrame, labelCol: String,
                    rkCol: org.apache.spark.sql.Column, idCol: String): org.apache.spark.sql.DataFrame = {
    val base = df.withColumn("__rk", rkCol)
      .withColumn("__bkt", conv(substring(col("__rk"), 1, 4), 16, 10).cast("int"))
    val wcum = Window.partitionBy(col(labelCol)).orderBy(col("__bkt"))
    val info = base.groupBy(labelCol, "__bkt").agg(count(lit(1)).as("__cnt"))
      .withColumn("__cum_before", sum(col("__cnt")).over(wcum) - col("__cnt"))
      .withColumn("n_class",
        sum(col("__cnt")).over(Window.partitionBy(col(labelCol))))
      .drop("__cnt")
    val wloc = Window.partitionBy(col(labelCol), col("__bkt"))
      .orderBy(col("__rk"), col(idCol))
    base.join(broadcast(info), Seq(labelCol, "__bkt"))
      .withColumn("rn", (col("__cum_before") + row_number().over(wloc)).cast("int"))
      .drop("__rk", "__bkt", "__cum_before")
  }

  val defs: Seq[QueryDef] = Seq(

    // --------------------------------------------------------------- q50:
    // exact-n stratified sample: 20 rows per label, seed-42-deterministic.
    // Scale note: the rn <= 20 filter sits directly above row_number, so
    // Spark plants WindowGroupLimit on BOTH sides of the exchange
    // (verified in the physical plan): each map task emits at most 20 rows
    // per label before the shuffle, bounding the per-label reducer input
    // at 20 × #tasks regardless of table size — the low-cardinality
    // partition key never sees the full table.
    QueryDef(
      "q50_stratified_sample",
      (s, d) => {
        val w = Window.partitionBy(col("label")).orderBy(col("rk"), col("vec_id"))
        Tables(s, d, "embeddings")
          .withColumn("rk", rkSpark)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 20)
          .select(col("vec_id"), col("label"), col("rn"))
          .orderBy("label", "rn")
      },
      Some("""
        SELECT vec_id, label, rn FROM (
          SELECT vec_id, label,
                 CAST(ROW_NUMBER() OVER (PARTITION BY label
                      ORDER BY md5(concat('42:', vec_id)), vec_id) AS INTEGER) rn
          FROM embeddings) x
        WHERE rn <= 20
        ORDER BY label, rn""")),

    // --------------------------------------------------------------- q51:
    // stratified 70/30 split: per-class md5 rank against ceil(0.7 * n) —
    // exactly stratified (unlike randomSplit, which is only approximate).
    //
    // Two-phase formulation (scale-safe): unlike q50's top-k, EVERY row
    // needs a decision, so a plain per-label row_number window would funnel
    // the whole table through #labels reducer tasks. Instead:
    //   1. bucket each row by the first 4 hex chars of its md5 rank key
    //      (65,536 buckets; lexicographic md5 order == numeric bucket order
    //      for fixed-width hex, so bucket order is consistent with rank
    //      order) and aggregate (label, bucket) counts — partial-aggregated
    //      map-side, output bounded by #labels × 65,536 rows;
    //   2. a running sum over that TINY aggregate locates each label's
    //      boundary bucket: buckets wholly before the ceil(0.7·n) cut are
    //      'train', wholly after are 'test', with no per-row ranking at all;
    //   3. only the single boundary bucket per label (~n/65,536 rows) is
    //      ranked, via a window keyed by (label, bucket) — never by bare
    //      label.
    // Output is bit-identical to the direct window formulation (the oracle
    // keeps it), but the widest shuffle carries decision bits, not ranks,
    // and no task ever sees more than a bucket of one label.
    QueryDef(
      "q51_train_test_split",
      (s, d) => {
        val base = Tables(s, d, "embeddings")
          .withColumn("rk", rkSpark)
          .withColumn("bkt", conv(substring(col("rk"), 1, 4), 16, 10).cast("int"))
        val cnts = base.groupBy("label", "bkt").agg(count(lit(1)).as("cnt"))
        val wcum = Window.partitionBy(col("label")).orderBy(col("bkt"))
        val info = cnts
          .withColumn("cum_end", sum(col("cnt")).over(wcum))
          .withColumn("cum_before", col("cum_end") - col("cnt"))
          .withColumn("t",
            ceil(sum(col("cnt")).over(Window.partitionBy(col("label"))) * 0.7)
              .cast("long"))
        val rows2 = base.join(broadcast(info), Seq("label", "bkt"))
        val sure = rows2.filter(col("cum_end") <= col("t") || col("cum_before") >= col("t"))
          .withColumn("split",
            when(col("cum_end") <= col("t"), "train").otherwise("test"))
        val wsl = Window.partitionBy(col("label"), col("bkt"))
          .orderBy(col("rk"), col("vec_id"))
        val sliver = rows2.filter(col("cum_before") < col("t") && col("cum_end") > col("t"))
          .withColumn("rn_local", row_number().over(wsl))
          .withColumn("split",
            when(col("cum_before") + col("rn_local") <= col("t"), "train")
              .otherwise("test"))
        sure.select(col("vec_id"), col("label"), col("split"))
          .unionByName(sliver.select(col("vec_id"), col("label"), col("split")))
          .orderBy("vec_id")
      },
      Some("""
        SELECT vec_id, label,
               CASE WHEN rn <= CAST(CEIL(n_class * 0.7) AS BIGINT)
                    THEN 'train' ELSE 'test' END AS split
        FROM (SELECT vec_id, label,
                     CAST(ROW_NUMBER() OVER (PARTITION BY label
                          ORDER BY md5(concat('42:', vec_id)), vec_id) AS INTEGER) rn,
                     COUNT(*) OVER (PARTITION BY label) n_class
              FROM embeddings) x
        ORDER BY vec_id""")),

    // --------------------------------------------------------------- q95:
    // domain-mixture resampling (DoReMi/Pile-style): draw a corpus whose
    // language proportions match an explicit TARGET MIX, not the source
    // distribution — the knob every LLM data pipeline turns after dedup.
    // Per-language quotas come from the target weights (broadcast-tiny
    // literal map), and the deterministic md5 rank picks which rows fill
    // each quota — reusing the two-phase rankedByClass machinery, so no
    // bare-language window touches the full table. The oracle replays the
    // identical rank, verifying exact row identity of the drawn mix.
    QueryDef(
      "q95_domain_mixture",
      (s, d) => {
        val budget = 200
        val weights = Seq("en" -> 0.40, "fr" -> 0.20, "de" -> 0.20,
          "es" -> 0.10, "zh" -> 0.10)
        val wdf = broadcast(
          s.createDataFrame(weights.map { case (l, w) =>
            (l, Math.round(budget * w))
          }).toDF("lang", "quota"))
        val ranked = rankedByClass(Tables(s, d, "documents"), "lang",
          md5(concat(lit("mix42:"), col("doc_id").cast("string"))), "doc_id")
        ranked.join(wdf, Seq("lang"))
          .filter(col("rn") <= least(col("quota"), col("n_class")))
          .select(col("lang"), col("doc_id"), col("rn"))
          .orderBy("lang", "rn")
      },
      Some("""
        WITH w(lang, quota) AS (VALUES ('en', 80), ('fr', 40), ('de', 40),
                                       ('es', 20), ('zh', 20)),
        r AS (SELECT lang, doc_id,
                     CAST(ROW_NUMBER() OVER (PARTITION BY lang
                          ORDER BY md5(concat('mix42:', doc_id)), doc_id)
                       AS INTEGER) AS rn,
                     COUNT(*) OVER (PARTITION BY lang) AS n_class
              FROM documents)
        SELECT r.lang, r.doc_id, r.rn
        FROM r JOIN w ON r.lang = w.lang
        WHERE rn <= LEAST(w.quota, n_class)
        ORDER BY r.lang, rn""")),

    // -------------------------------------------------------------- q171:
    // Weighted sampling without replacement (Efraimidis–Spirakis A-ES),
    // deterministic: each document draws u from the TOP 52 md5 bits
    // (u = (v + 0.5) / 2^52 ∈ (0,1), exactly representable), and the
    // sample is the k smallest keys −ln(u)/w with w = n_chars — longer
    // documents are proportionally likelier, the data-mixing primitive
    // a corpus-weighted training run uses. Keys are ROUNDED to 9dp
    // before ranking (the q63 ln-ulp guard) with doc_id as tiebreak.
    //
    // Scale shape: per-row key computation, then ONE global top-k
    // (TakeOrderedAndProject — never a full sort); at any corpus size
    // the shuffle carries k rows per partition.
    QueryDef(
      "q171_weighted_sample",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        // top-k FIRST (orderBy+limit plans TakeOrderedAndProject — k rows
        // per partition cross the wire, never a global sort); the rank
        // window then runs over the 20 survivors only. A bare global
        // row_number window here would single-partition the corpus.
        val top = Tables(s, d, "documents")
          .select(col("doc_id"), col("n_chars"),
            expr("""round(-ln((CAST(conv(substr(md5(concat('q171:',
                   |  CAST(doc_id AS STRING))), 1, 13), 16, 10) AS DOUBLE)
                   |  + 0.5) / 4503599627370496.0)
                   |  / CAST(n_chars AS DOUBLE), 9)""".stripMargin)
              .as("key"))
          .orderBy(col("key"), col("doc_id"))
          .limit(20)
        top
          .withColumn("rk",
            row_number().over(Window.orderBy(col("key"), col("doc_id"))))
          .select(col("rk"), col("doc_id"), col("n_chars"), col("key"))
          .orderBy("rk")
      },
      Some("""
        WITH k AS (SELECT doc_id, n_chars,
                     round(-ln((CAST(concat('0x', substr(md5(concat('q171:',
                           CAST(doc_id AS VARCHAR))), 1, 13)) AS BIGINT)
                           + 0.5) / 4503599627370496.0)
                           / CAST(n_chars AS DOUBLE), 9) AS key
                   FROM documents),
        r AS (SELECT doc_id, n_chars, key,
                CAST(ROW_NUMBER() OVER (ORDER BY key, doc_id) AS INTEGER)
                  AS rk
              FROM k)
        SELECT rk, doc_id, n_chars, key
        FROM r WHERE rk <= 20
        ORDER BY rk"""))
  )
}
