package graft.similarity

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Product quantization (PQ) — the memory-side half of a production ANN
  * index (IVF-PQ): each 64-dim vector compresses to m=4 one-byte codes
  * (one per 16-dim subspace), and search scores candidates through an
  * asymmetric-distance (ADC) lookup table instead of touching raw
  * vectors. At 100 TB the index holds 4 bytes/vector instead of 256, and
  * the query-time work per candidate is 4 table lookups + 3 additions.
  *
  * Codebooks here are deterministic samples (the 16 lowest-vec_id
  * subvectors per subspace) so the DuckDB oracle can replay them exactly;
  * a production build trains each subspace with the q127 Lloyd machinery
  * — the encode/search plumbing below is identical either way.
  */
object ProductQuant {

  private val M = 4        // subspaces
  private val SUB = 16     // dims per subspace
  private val K = 16       // codewords per subspace

  /** Exact sequential-fold squared L2 between two ARRAY<FLOAT> columns —
    * the native codegen [[graft.functions.SqDist]] (float→double per
    * element, left-to-right accumulation, the same op order as the
    * oracle's list_reduce; 0.0 + x == x exactly for the non-negative
    * squares, so the fold seeds agree). The `aggregate(zip_with(...))`
    * composition computes the identical value but interprets a boxed
    * lambda per element — on the encode stage's corpus × 64 codeword
    * evaluations that overhead dominates. */
  private def sqDist(a: String, b: String): String = s"sq_dist($a, $b)"

  private def duckSqDist(a: String, b: String): String =
    s"""list_reduce(list_transform(generate_series(1, len($a)), i ->
       |  (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE)) *
       |  (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE))),
       |  (acc, v) -> acc + v)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // -------------------------------------------------------------- q136:
    // PQ encode + ADC top-10 for query vectors vec_id < 5.
    //
    // Plan shape, stage by stage (every stage is broadcast-or-map-side —
    // the corpus never shuffles before the per-query top-k):
    //  1. codebook: 16 lowest-vec_id vectors × 4 subspace slices = 64
    //     rows — BROADCAST.
    //  2. encode: corpus × subspace explode (4 rows/vector) joins the
    //     broadcast codebook, argmin over the 16 codewords per (vector,
    //     subspace) via a map-side-combined min(struct(dist, code)) —
    //     64 bounded folds per vector, zero shuffles of raw vectors;
    //     output is the 4-code PQ index (what a warehouse materializes).
    //  3. ADC tables: queries × codebook = 5·64 rows — BROADCAST.
    //  4. search: the CODES (not the vectors) join the broadcast ADC
    //     table; the 4 per-subspace lookups pivot into columns and sum in
    //     FIXED order ((d0+d1)+d2)+d3 — a groupBy sum over doubles would
    //     be partial-order nondeterministic — then per-query top-10 via
    //     rank window (WindowGroupLimit cuts map-side, as in q45).
    QueryDef(
      "q136_pq_adc_search",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val v = Tables(s, d, "embeddings")
        val sub = explode(expr(
          s"transform(sequence(0, ${M - 1}), m2 -> " +
            s"struct(m2 AS m, slice(embedding, m2 * $SUB + 1, $SUB) AS sv))"))
        val cb = v.filter(col("vec_id") < K)
          .select(col("vec_id").cast("int").as("code_id"), sub.as("s"))
          .select(col("code_id"), col("s.m").as("m"), col("s.sv").as("cv"))
        val corpus = v.select(col("vec_id"), sub.as("s"))
          .select(col("vec_id"), col("s.m").as("m"), col("s.sv").as("xv"))
        val enc = corpus.join(broadcast(cb), "m")
          .withColumn("dist", expr(sqDist("xv", "cv")))
          .groupBy("vec_id", "m")
          .agg(min(struct(col("dist"), col("code_id"))).as("best"))
          .select(col("vec_id"), col("m"), col("best.code_id").as("code"))
        val adc = v.filter(col("vec_id") < 5)
          .select(col("vec_id").as("query_id"), sub.as("s"))
          .select(col("query_id"), col("s.m").as("m"), col("s.sv").as("qv"))
          .join(broadcast(cb), "m")
          .withColumn("qd", expr(sqDist("qv", "cv")))
          .select("query_id", "m", "code_id", "qd")
        val scored = enc.join(broadcast(adc),
            enc("m") === adc("m") && enc("code") === adc("code_id"))
          .groupBy(col("query_id"), col("vec_id").as("cand_id"))
          .agg(max(when(enc("m") === 0, col("qd"))).as("d0"),
            (1 until M).map(m2 =>
              max(when(enc("m") === m2, col("qd"))).as(s"d$m2")): _*)
          .withColumn("adc_dist",
            ((col("d0") + col("d1")) + col("d2")) + col("d3"))
          .filter(col("query_id") =!= col("cand_id"))
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("adc_dist"), col("cand_id"))
        scored
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 10)
          .select(col("query_id"), col("rank"), col("cand_id"),
            round(col("adc_dist"), 6).as("adc_dist"))
          .orderBy("query_id", "rank")
      },
      Some(s"""
        WITH sub AS (SELECT vec_id, t.m AS m,
                            list_slice(embedding, t.m * $SUB + 1,
                              t.m * $SUB + $SUB) AS sv
                     FROM embeddings
                     CROSS JOIN generate_series(0, ${M - 1}) AS t(m)),
        cb AS (SELECT CAST(vec_id AS INTEGER) AS code_id, m, sv AS cv
               FROM sub WHERE vec_id < $K),
        dists AS (SELECT x.vec_id, x.m, cb.code_id,
                         ${duckSqDist("x.sv", "cb.cv")} AS dist
                  FROM sub x JOIN cb USING (m)),
        enc AS (SELECT vec_id, m, code_id AS code FROM
                  (SELECT vec_id, m, code_id, dist,
                          ROW_NUMBER() OVER (PARTITION BY vec_id, m
                            ORDER BY dist, code_id) AS rn
                   FROM dists) WHERE rn = 1),
        adc AS (SELECT q.vec_id AS query_id, q.m, cb.code_id,
                       ${duckSqDist("q.sv", "cb.cv")} AS qd
                FROM sub q JOIN cb USING (m) WHERE q.vec_id < 5),
        piv AS (SELECT a.query_id, e.vec_id AS cand_id,
                       MAX(CASE WHEN e.m = 0 THEN a.qd END) AS d0,
                       MAX(CASE WHEN e.m = 1 THEN a.qd END) AS d1,
                       MAX(CASE WHEN e.m = 2 THEN a.qd END) AS d2,
                       MAX(CASE WHEN e.m = 3 THEN a.qd END) AS d3
                FROM enc e JOIN adc a ON e.m = a.m AND e.code = a.code_id
                GROUP BY 1, 2),
        sc AS (SELECT query_id, cand_id,
                      ((d0 + d1) + d2) + d3 AS adc_dist
               FROM piv WHERE query_id <> cand_id),
        r AS (SELECT query_id, cand_id, adc_dist,
                     CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                          ORDER BY adc_dist, cand_id) AS INTEGER) AS rank
              FROM sc)
        SELECT query_id, rank, cand_id, round(adc_dist, 6) AS adc_dist
        FROM r WHERE rank <= 10
        ORDER BY query_id, rank"""))
  )
}
