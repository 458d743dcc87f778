package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.util.Hashing._

/** Approximate-nearest-neighbor search over the `embeddings` table.
  *
  * q45 is the exact baseline: brute-force cosine top-k for a fixed query
  * set. The dot product is a per-row sequential double fold (zip_with +
  * aggregate), so it stays in whole-stage codegen; top-k per query is a
  * rank-window over the query partition, never a global sort.
  *
  * q46 is the scale path: random-hyperplane LSH. Each vector gets an 8-bit
  * signature (sign of dot with 8 deterministic md5-derived hyperplanes);
  * search is an equi-join on the bucket id, so at 100 TB the shuffle is
  * bucket-sized, not corpus-sized. The hyperplanes derive from md5 — the
  * DuckDB oracle replays the identical planes, so even this "random"
  * structure is exactly reproducible.
  */
object Similarity {

  /** dot(v, plane_p): plane weight for (p, d) = ((md5long('p:d') % 2001)
    * - 1000) / 1000.0 in [-1, 1]. The weights are CONSTANTS, so they are
    * evaluated once at plan-build time (graft.util.Hashing.md5Long — the
    * same md5 both engines would compute) and interpolated as integer
    * literals: per-row work drops from 8×64 md5 calls to 8 plain folds,
    * with op order `(e * m) / 1000.0` preserved exactly so every bucket id
    * is bit-identical to the in-engine formulation. */
  private val planeW: IndexedSeq[Seq[Long]] =
    (0 until 8).map(p => (0 until 64).map(d2 =>
      (md5Long(s"$p:$d2") % 2001) - 1000))
  private def duckPlaneDotOf(w: Seq[Long]) =
    s"""list_reduce(list_transform(generate_series(0, 63), d2 ->
       |  CAST(embedding[d2 + 1] AS DOUBLE) *
       |  (${duckArray(w)})[d2 + 1] / 1000.0),
       |  (a2, b2) -> a2 + b2)""".stripMargin
  private def duckPlaneDotLit(p: Int) = duckPlaneDotOf(planeW(p))

  /** q116 banded-search geometry: 4 bands x 6 sign bits = 24 planes,
    * deterministic md5 weights (seed "q116:p:d"), same integer-literal
    * interpolation contract as [[planeW]]. */
  private val bandPlanes: IndexedSeq[Seq[Long]] =
    (0 until 24).map(p => (0 until 64).map(d2 =>
      (md5Long(s"q116:$p:$d2") % 2001) - 1000))

  /** q145 signed-random-projection geometry: 16 output dims x 64 input
    * dims, seed "q145:j:d", same integer-literal contract as [[planeW]].
    * 16 doubles instead of 64 floats — a 4x reduction in pairwise-scoring
    * FLOPs and (at 100 TB) in what the dedup/ANN pair stages shuffle. */
  private val rpPlanes: IndexedSeq[Seq[Long]] =
    (0 until 16).map(j => (0 until 64).map(d2 =>
      (md5Long(s"q145:$j:$d2") % 2001) - 1000))

  /** Native codegen'd cosine (graft.functions.CosineSimilarity) — same
    * sequential-fold double semantics as the oracle's list_reduce. */
  private def cosCol = graft.functions.functions.cosine_sim(
    col("q.embedding"), col("c.embedding"))

  private val duckCos =
    """list_reduce(list_transform(generate_series(1, len(q.embedding)),
      |  i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)),
      |  (a2, b2) -> a2 + b2) / (q.norm * c.norm)""".stripMargin

  private val duckNormed =
    """v AS (SELECT vec_id, label, embedding,
      |        sqrt(list_reduce(list_transform(generate_series(1, len(embedding)),
      |             i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)),
      |             (a2, b2) -> a2 + b2)) norm
      |      FROM embeddings)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // --------------------------------------------------------------- q45:
    // brute-force cosine top-10 for query vectors vec_id < 5.
    QueryDef(
      "q45_knn_bruteforce",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val v = Tables(s, d, "embeddings")
        val q = v.filter(col("vec_id") < 5).select(
          col("vec_id").as("query_id"), col("embedding")).as("q")
        val c = v.select(col("vec_id").as("cand_id"), col("embedding")).as("c")
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("cand_id"))
        // Broadcast the QUERY set and stream the corpus — unhinted, Spark
        // builds right and broadcasts the whole corpus, which inverts at
        // scale (queries are a handful, the corpus is the 100 TB side).
        // Per-partition WindowGroupLimit then keeps top-k map-side; only
        // ~k rows per partition reach the query_id exchange.
        broadcast(q).join(c, col("query_id") =!= col("cand_id"))
          .withColumn("cos", cosCol)
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 10)
          .select(col("query_id"), col("rank"), col("cand_id"),
            round(col("cos"), 6).as("cos_sim"))
          .orderBy("query_id", "rank")
      },
      Some(s"""
        WITH $duckNormed,
        p AS (SELECT q.vec_id query_id, c.vec_id cand_id, $duckCos cos
              FROM v q JOIN v c ON q.vec_id < 5 AND q.vec_id <> c.vec_id),
        r AS (SELECT query_id, cand_id, cos,
                     CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                          ORDER BY cos DESC, cand_id) AS INTEGER) rank
              FROM p)
        SELECT query_id, rank, cand_id, round(cos, 6) AS cos_sim
        FROM r WHERE rank <= 10
        ORDER BY query_id, rank""")),

    // --------------------------------------------------------------- q46:
    // LSH-bucketed ANN: 8 hyperplane sign bits -> bucket id; candidates
    // share the query's bucket (equi-join); top-5 within bucket.
    QueryDef(
      "q46_knn_lsh_bucketed",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        // native codegen'd plane dots (graft.functions.PlaneDot) — the
        // signature projection stays inside whole-stage codegen instead of
        // 8 interpreted HOF folds per row
        val v = Tables(s, d, "embeddings")
          .withColumn("bucket", (0 until 8).map(p =>
            when(graft.functions.PlaneDot.plane_dot(col("embedding"), planeW(p)) > 0,
              lit(1 << p)).otherwise(lit(0))).reduce(_ + _))
        val q = v.filter(col("vec_id") < 20).select(
          col("vec_id").as("query_id"), col("embedding"), col("bucket")).as("q")
        val c = v.select(col("vec_id").as("cand_id"),
          col("embedding"), col("bucket")).as("c")
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("cand_id"))
        q.join(c, col("q.bucket") === col("c.bucket") && col("query_id") =!= col("cand_id"))
          .withColumn("cos", cosCol)
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 5)
          .select(col("query_id"), expr("q.bucket").as("bucket"), col("rank"),
            col("cand_id"), round(col("cos"), 6).as("cos_sim"))
          .orderBy("query_id", "rank")
      },
      Some(s"""
        WITH $duckNormed,
        vb AS (SELECT vec_id, embedding, norm,
                      CAST(${(0 until 8).map(p =>
                        s"(CASE WHEN (${duckPlaneDotLit(p)}) > 0 THEN ${1 << p} ELSE 0 END)")
                        .mkString(" + ")} AS INTEGER) bucket
               FROM v),
        p AS (SELECT q.vec_id query_id, q.bucket bucket, c.vec_id cand_id, $duckCos cos
              FROM vb q JOIN vb c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
              WHERE q.vec_id < 20),
        r AS (SELECT query_id, bucket, cand_id, cos,
                     CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                          ORDER BY cos DESC, cand_id) AS INTEGER) rank
              FROM p)
        SELECT query_id, bucket, rank, cand_id, round(cos, 6) AS cos_sim
        FROM r WHERE rank <= 5
        ORDER BY query_id, rank""")),

    // --------------------------------------------------------------- q56:
    // IVF ANN — the second scale path beside LSH (q46). Coarse quantizer =
    // a deterministic 16-entry codebook (the first 16 corpus vectors), so
    // unlike KMeans init the whole structure is exactly reproducible and
    // DuckDB-oracle-checkable. Every vector is assigned to its nearest
    // cell (16-way broadcast scoring, map-side); queries probe their 2
    // nearest cells; candidates arrive via an equi-join on cell_id — at
    // 100 TB the search shuffle is cell-sized, not corpus-sized, and the
    // corpus side can be pre-partitioned by cell.
    QueryDef(
      "q56_knn_ivf",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val cos2 = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
          graft.functions.functions.cosine_sim(a, b)
        val v = Tables(s, d, "embeddings").select(col("vec_id"), col("embedding"))
        val cb = v.filter(col("vec_id") < 16)
          .select(col("vec_id").as("cell_id"), col("embedding").as("cb_emb"))
        // Cell assignment = argmax over the 16 broadcast codebook entries.
        // max_by partial-aggregates map-side, so the corpus-side shuffle is
        // N rows — a row_number window here would shuffle the full 16×N
        // expansion. Ordering key (cd, -cell_id) reproduces the oracle's
        // tie-break exactly: max cd, then MIN cell_id.
        val assigned = v.crossJoin(broadcast(cb))
          .withColumn("cd", cos2(col("embedding"), col("cb_emb")))
          .groupBy(col("vec_id"))
          .agg(max_by(struct(col("cell_id"), col("embedding")),
            struct(col("cd"), negate(col("cell_id")))).as("best"))
          .select(col("vec_id").as("cand_id"),
            col("best.embedding").as("c_emb"), col("best.cell_id").as("cell_id"))
        // Query side (nprobe=2 cells) is a handful of vectors by contract —
        // filtered BEFORE the codebook expansion, so its rank window covers
        // |queries|×16 rows, never the corpus.
        val wq = Window.partitionBy(col("vec_id")).orderBy(col("cd").desc, col("cell_id"))
        val qcells = v.filter(col("vec_id") < 5).crossJoin(broadcast(cb))
          .withColumn("cd", cos2(col("embedding"), col("cb_emb")))
          .withColumn("arn", row_number().over(wq))
          .filter(col("arn") <= 2)
          .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"), col("cell_id"))
        val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("cand_id"))
        broadcast(qcells).join(assigned, Seq("cell_id"))
          .filter(col("cand_id") =!= col("query_id"))
          .withColumn("cos", cos2(col("q_emb"), col("c_emb")))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 10)
          .select(col("query_id"), col("rank"), col("cand_id"), col("cell_id"),
            round(col("cos"), 6).as("cos_sim"))
          .orderBy("query_id", "rank")
      },
      Some("""
        WITH vn AS (SELECT vec_id, embedding,
               sqrt(list_reduce(list_transform(generate_series(1, len(embedding)),
                    i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)),
                    (a2, b2) -> a2 + b2)) norm
             FROM embeddings),
        cb AS (SELECT vec_id AS cell_id, embedding AS cb_emb, norm AS cb_norm
               FROM vn WHERE vec_id < 16),
        ass AS (SELECT vn.vec_id, vn.embedding, vn.norm, cb.cell_id,
               list_reduce(list_transform(generate_series(1, len(vn.embedding)),
                 i -> CAST(vn.embedding[i] AS DOUBLE) * CAST(cb.cb_emb[i] AS DOUBLE)),
                 (a2, b2) -> a2 + b2) / (vn.norm * cb.cb_norm) AS cd
               FROM vn CROSS JOIN cb),
        rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                        ORDER BY cd DESC, cell_id) AS arn FROM ass),
        assigned AS (SELECT vec_id AS cand_id, embedding AS c_emb, norm AS c_norm, cell_id
                     FROM rk WHERE arn = 1),
        qc AS (SELECT vec_id AS query_id, embedding AS q_emb, norm AS q_norm, cell_id
               FROM rk WHERE vec_id < 5 AND arn <= 2),
        scored AS (SELECT q.query_id, a.cand_id, q.cell_id,
               list_reduce(list_transform(generate_series(1, len(q.q_emb)),
                 i -> CAST(q.q_emb[i] AS DOUBLE) * CAST(a.c_emb[i] AS DOUBLE)),
                 (a2, b2) -> a2 + b2) / (q.q_norm * a.c_norm) AS cos
               FROM qc q JOIN assigned a USING (cell_id)
               WHERE a.cand_id <> q.query_id),
        r AS (SELECT query_id, cand_id, cell_id, cos,
                     CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                          ORDER BY cos DESC, cand_id) AS INTEGER) AS rank
              FROM scored)
        SELECT query_id, rank, cand_id, cell_id, round(cos, 6) AS cos_sim
        FROM r WHERE rank <= 10
        ORDER BY query_id, rank""")),

    // -------------------------------------------------------------- q105:
    // per-label embedding centroids (class prototypes — the E-step of a
    // supervised k-means / the "mean embedding per class" every
    // embedding-quality report starts from). DISTRIBUTED element-wise
    // mean: posexplode fans each vector into (label, pos, v) rows, the
    // per-(label, pos) aggregate partial-combines map-side, so the
    // shuffle carries at most labels x dims rows PER TASK no matter the
    // corpus size — never whole vectors to one reducer, never a
    // collect-and-average on the driver. Decimal-exact sums (Det policy)
    // keep the mean bit-identical across engines and shuffle orders.
    QueryDef(
      "q105_label_centroids",
      (s, d) => {
        val e = Tables(s, d, "embeddings")
          .select(col("label"),
            posexplode(col("embedding")).as(Seq("pos", "v")))
        // centroid stays UNROUNDED: the decimal sum is order-free exact,
        // its double cast is correctly rounded (scaled int < 2^53), and
        // the IEEE division by n is deterministic — whereas round() on a
        // double near a half-ulp tie differs between engines. The float
        // element widens to DOUBLE first on BOTH engines: a direct
        // float->decimal cast rounds the float's (short) decimal repr,
        // where scale-6 ties are common and engines disagree; the
        // double's expansion makes a tie at scale 6 unrepresentable
        // (the Det argument).
        e.groupBy(col("label"), col("pos").cast("long").as("pos"))
          .agg(count(lit(1)).as("n"),
            (sum(col("v").cast("double").cast("decimal(16,6)")).cast("double") /
              count(lit(1))).as("centroid"))
          .select(col("label").cast("long").as("label"), col("pos"),
            col("n"), col("centroid"))
          .orderBy("label", "pos")
      },
      Some("""
        WITH x AS (
          SELECT label, generate_subscripts(embedding, 1) - 1 AS pos,
                 unnest(embedding) AS v
          FROM embeddings)
        SELECT CAST(label AS BIGINT) AS label, CAST(pos AS BIGINT) AS pos,
               COUNT(*) AS n,
               CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(16,6))) AS DOUBLE)
                 / COUNT(*) AS centroid
        FROM x
        GROUP BY 1, 2
        ORDER BY label, pos""")),

    // -------------------------------------------------------------- q115:
    // ANN recall evaluation — the acceptance measurement a pipeline runs
    // before trusting an approximate index: recall@5 of the q46-style
    // LSH-bucketed search against the exact brute-force top-5, per query.
    // Both arms and the scoring are deterministic (cand_id tiebreak), so
    // even the quality metric itself is oracle hash-checked.
    //
    // Measured finding (sf0.01): mean recall@5 = 0.03 — q46's single-table
    // 8-bit signature is a WEAK index on the near-uniform fixture
    // embeddings (256 buckets x 500 vectors; bucket mates are rarely true
    // neighbors). That is the point of shipping the evaluator: it is the
    // query that tells you to reach for q44's banded multi-table LSH (8
    // bands x 3 bits, candidate recall by union over bands) or q56's IVF
    // with rerank before trusting an index at 100 TB.
    //
    // Scale shape: the exact arm broadcasts the 20-query set against the
    // corpus (the q45 plan — never the reverse); the LSH arm shuffles
    // bucket-sized; the scoring join is 20x5 rows. At 100 TB the exact
    // arm is the expensive audit you run on a SAMPLE of queries (exactly
    // this shape), not per lookup.
    QueryDef(
      "q115_ann_recall",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val v = Tables(s, d, "embeddings")
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("cand_id"))
        val q = v.filter(col("vec_id") < 20).select(
          col("vec_id").as("query_id"), col("embedding")).as("q")
        val c = v.select(col("vec_id").as("cand_id"), col("embedding")).as("c")
        val exact = broadcast(q).join(c, col("query_id") =!= col("cand_id"))
          .withColumn("cos", cosCol)
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 5)
          .select("query_id", "cand_id")
        val vb = v.withColumn("bucket", (0 until 8).map(p =>
          when(graft.functions.PlaneDot.plane_dot(col("embedding"), planeW(p)) > 0,
            lit(1 << p)).otherwise(lit(0))).reduce(_ + _))
        val qb = vb.filter(col("vec_id") < 20).select(
          col("vec_id").as("query_id"), col("embedding"), col("bucket")).as("q")
        val cb = vb.select(
          col("vec_id").as("cand_id"), col("embedding"), col("bucket")).as("c")
        val approx = qb
          .join(cb, col("q.bucket") === col("c.bucket") &&
            col("query_id") =!= col("cand_id"))
          .withColumn("cos", cosCol)
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 5)
          .select("query_id", "cand_id")
        val hit = exact.join(approx, Seq("query_id", "cand_id"))
          .groupBy("query_id").agg(count(lit(1)).as("n_hit"))
        val got = approx.groupBy("query_id").agg(count(lit(1)).as("n_lsh"))
        exact.groupBy("query_id").agg(count(lit(1)).as("n_exact"))
          // the scoring tables are |queries| rows — broadcast, never SMJ
          .join(broadcast(got), Seq("query_id"), "left")
          .join(broadcast(hit), Seq("query_id"), "left")
          .select(col("query_id"),
            col("n_exact"),
            coalesce(col("n_lsh"), lit(0L)).as("n_lsh"),
            coalesce(col("n_hit"), lit(0L)).as("n_hit"),
            (coalesce(col("n_hit"), lit(0L)) / col("n_exact").cast("double"))
              .as("recall"))
          .orderBy("query_id")
      },
      Some(s"""
        WITH $duckNormed,
        ep AS (SELECT q.vec_id query_id, c.vec_id cand_id, $duckCos cos
               FROM v q JOIN v c ON q.vec_id < 20 AND q.vec_id <> c.vec_id),
        er AS (SELECT query_id, cand_id,
                      ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY cos DESC, cand_id) rn
               FROM ep),
        exact AS (SELECT query_id, cand_id FROM er WHERE rn <= 5),
        vb AS (SELECT vec_id, embedding, norm,
                      CAST(${(0 until 8).map(p =>
                        s"(CASE WHEN (${duckPlaneDotLit(p)}) > 0 THEN ${1 << p} ELSE 0 END)")
                        .mkString(" + ")} AS INTEGER) bucket
               FROM v),
        ap AS (SELECT q.vec_id query_id, c.vec_id cand_id, $duckCos cos
               FROM vb q JOIN vb c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
               WHERE q.vec_id < 20),
        ar AS (SELECT query_id, cand_id,
                      ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY cos DESC, cand_id) rn
               FROM ap),
        approx AS (SELECT query_id, cand_id FROM ar WHERE rn <= 5),
        hit AS (SELECT query_id, COUNT(*) AS n_hit
                FROM exact JOIN approx USING (query_id, cand_id)
                GROUP BY query_id),
        got AS (SELECT query_id, COUNT(*) AS n_lsh FROM approx GROUP BY query_id),
        ex AS (SELECT query_id, COUNT(*) AS n_exact FROM exact GROUP BY query_id)
        SELECT query_id, n_exact,
               COALESCE(n_lsh, 0) AS n_lsh,
               COALESCE(n_hit, 0) AS n_hit,
               COALESCE(n_hit, 0) / CAST(n_exact AS DOUBLE) AS recall
        FROM ex LEFT JOIN got USING (query_id) LEFT JOIN hit USING (query_id)
        ORDER BY query_id""")),

    // -------------------------------------------------------------- q116:
    // the fix q115's measurement demands: BANDED multi-table LSH search —
    // 4 bands x 6 sign bits (own md5-derived planes), candidates = union
    // of the query's 4 band buckets, exact cosine rerank, then the same
    // recall@5 audit against brute force. Also reports the candidate
    // count, because banding buys recall by touching more of the corpus —
    // the recall/cost tradeoff IS the result. At 100 TB each band is an
    // equi-join on a 6-bit key within a band (pre-partitionable corpus
    // index per band); the rerank touches only the candidate union.
    //
    // Measured (sf0.01, vs q115's 0.03 on the single-table index): mean
    // recall@5 = 0.22 at a mean candidate set of 36.6 of 500 vectors —
    // 7x the recall for 7% of the corpus touched. More bands/bits move
    // along the same curve; the evaluator makes the knob measurable.
    QueryDef(
      "q116_knn_banded_recall",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val v = Tables(s, d, "embeddings")
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("cand_id"))
        val q = v.filter(col("vec_id") < 20).select(
          col("vec_id").as("query_id"), col("embedding")).as("q")
        val c = v.select(col("vec_id").as("cand_id"), col("embedding")).as("c")
        val exact = broadcast(q).join(c, col("query_id") =!= col("cand_id"))
          .withColumn("cos", cosCol)
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 5)
          .select("query_id", "cand_id")
        val sig = v.withColumn("sig", (0 until 24).map(p =>
          when(graft.functions.PlaneDot.plane_dot(
            col("embedding"), bandPlanes(p)) > 0, lit(1 << p)).otherwise(lit(0)))
          .reduce(_ + _))
        val bands = sig.select(col("vec_id"), explode(expr(
            """transform(sequence(0, 3),
              |  b -> struct(b AS band,
              |              CAST(shiftright(sig, b * 6) & 63 AS INT) AS key))"""
              .stripMargin)).as("bk"))
          .select(col("vec_id"), col("bk.band").as("band"), col("bk.key").as("key"))
        val cand = broadcast(
            bands.filter(col("vec_id") < 20).select(
              col("vec_id").as("query_id"), col("band"), col("key")))
          .join(bands.select(col("vec_id").as("cand_id"), col("band"), col("key")),
            Seq("band", "key"))
          .filter(col("query_id") =!= col("cand_id"))
          .select("query_id", "cand_id").distinct()
        // cand is queries x bucket-mates (tiny vs the corpus): broadcast it
        // through both embedding re-joins so the corpus never shuffles
        val approx = broadcast(broadcast(cand)
          .join(v.select(col("vec_id").as("query_id"), col("embedding").as("qe")),
            "query_id"))
          .join(v.select(col("vec_id").as("cand_id"), col("embedding").as("ce")),
            "cand_id")
          .withColumn("cos",
            graft.functions.functions.cosine_sim(col("qe"), col("ce")))
          .withColumn("rank", row_number().over(w))
        val top = approx.filter(col("rank") <= 5).select("query_id", "cand_id")
        val nCand = cand.groupBy("query_id").agg(count(lit(1)).as("n_cand"))
        val hit = exact.join(top, Seq("query_id", "cand_id"))
          .groupBy("query_id").agg(count(lit(1)).as("n_hit"))
        exact.groupBy("query_id").agg(count(lit(1)).as("n_exact"))
          // the scoring tables are |queries| rows — broadcast, never SMJ
          .join(broadcast(nCand), Seq("query_id"), "left")
          .join(broadcast(hit), Seq("query_id"), "left")
          .select(col("query_id"), col("n_exact"),
            coalesce(col("n_cand"), lit(0L)).as("n_cand"),
            coalesce(col("n_hit"), lit(0L)).as("n_hit"),
            (coalesce(col("n_hit"), lit(0L)) / col("n_exact").cast("double"))
              .as("recall"))
          .orderBy("query_id")
      },
      Some(s"""
        WITH $duckNormed,
        ep AS (SELECT q.vec_id query_id, c.vec_id cand_id, $duckCos cos
               FROM v q JOIN v c ON q.vec_id < 20 AND q.vec_id <> c.vec_id),
        er AS (SELECT query_id, cand_id,
                      ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY cos DESC, cand_id) rn
               FROM ep),
        exact AS (SELECT query_id, cand_id FROM er WHERE rn <= 5),
        sb AS (SELECT vec_id,
                      CAST(${(0 until 24).map(p =>
                        s"(CASE WHEN (${duckPlaneDotOf(bandPlanes(p))}) > 0 THEN ${1 << p} ELSE 0 END)")
                        .mkString(" + ")} AS BIGINT) sig
               FROM v),
        bands AS (SELECT vec_id, b AS band,
                         CAST((sig >> (b * 6)) & 63 AS INTEGER) AS key
                  FROM sb, generate_series(0, 3) AS t2(b)),
        cand AS (SELECT DISTINCT x.vec_id query_id, y.vec_id cand_id
                 FROM bands x JOIN bands y USING (band, key)
                 WHERE x.vec_id < 20 AND x.vec_id <> y.vec_id),
        ap AS (SELECT cand.query_id, cand.cand_id, $duckCos cos
               FROM cand JOIN v q ON q.vec_id = cand.query_id
                         JOIN v c ON c.vec_id = cand.cand_id),
        ar AS (SELECT query_id, cand_id,
                      ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY cos DESC, cand_id) rn
               FROM ap),
        top5 AS (SELECT query_id, cand_id FROM ar WHERE rn <= 5),
        nc AS (SELECT query_id, COUNT(*) AS n_cand FROM cand GROUP BY query_id),
        hit AS (SELECT query_id, COUNT(*) AS n_hit
                FROM exact JOIN top5 USING (query_id, cand_id)
                GROUP BY query_id),
        ex AS (SELECT query_id, COUNT(*) AS n_exact FROM exact GROUP BY query_id)
        SELECT query_id, n_exact,
               COALESCE(n_cand, 0) AS n_cand,
               COALESCE(n_hit, 0) AS n_hit,
               COALESCE(n_hit, 0) / CAST(n_exact AS DOUBLE) AS recall
        FROM ex LEFT JOIN nc USING (query_id) LEFT JOIN hit USING (query_id)
        ORDER BY query_id""")),

    // --------------------------------------------------------------- q145:
    // Signed-random-projection dimensionality reduction (64 floats -> 16
    // doubles) with a cosine-preservation audit. The projection itself is
    // MAP-ONLY: the 16x64 weight matrix is a plan-time constant (broadcast
    // implicitly as literals), so at 100 TB the reduce step adds zero
    // shuffles — each row folds 16 native codegen'd plane_dots. The audit
    // pairs each vector with its successor (b.vec_id = a.vec_id + 1 — a
    // LINEAR equi-join, never all-pairs), computes cosine in both spaces
    // with identical sequential fold order, and emits the |cos64 - cos16|
    // error histogram: O(buckets) output regardless of corpus size.
    // Doubles stay bit-identical cross-engine because Catalyst's
    // ReorderAssociativeOperator only reassociates integral types — the
    // unrolled left-assoc double chains below survive optimization as
    // written, matching DuckDB's left-assoc parse of the same chain.
    QueryDef(
      "q145_random_projection_audit",
      (s, d) => {
        val v = Tables(s, d, "embeddings")
        val red = v.select(
          col("vec_id") +: col("embedding") +:
            (0 until 16).map(j => graft.functions.PlaneDot
              .plane_dot(col("embedding"), rpPlanes(j)).as(s"r$j")): _*)
        val dot16 = (0 until 16).map(j => col(s"a.r$j") * col(s"b.r$j"))
          .reduce(_ + _)
        val na16 = (0 until 16).map(j => col(s"a.r$j") * col(s"a.r$j"))
          .reduce(_ + _)
        val nb16 = (0 until 16).map(j => col(s"b.r$j") * col(s"b.r$j"))
          .reduce(_ + _)
        red.as("a")
          .join(red.as("b"), col("b.vec_id") === col("a.vec_id") + 1)
          .select(
            graft.functions.functions
              .cosine_sim(col("a.embedding"), col("b.embedding"))
              .as("cos64"),
            (dot16 / (sqrt(na16) * sqrt(nb16))).as("cos16"))
          .select(floor(abs(col("cos64") - col("cos16")) * 20)
            .cast("int").as("err_bucket"))
          .groupBy("err_bucket").agg(count(lit(1)).as("n_pairs"))
          .orderBy("err_bucket")
      },
      Some(s"""
        WITH $duckNormed,
        red AS (SELECT vec_id, embedding, norm,
                       ${(0 until 16).map(j =>
                         s"(${duckPlaneDotOf(rpPlanes(j))}) AS r$j")
                         .mkString(",\n                       ")}
                FROM v),
        p AS (SELECT $duckCos cos64,
                     (${(0 until 16).map(j => s"q.r$j * c.r$j")
                       .mkString(" + ")}) /
                     (sqrt(${(0 until 16).map(j => s"q.r$j * q.r$j")
                       .mkString(" + ")}) *
                      sqrt(${(0 until 16).map(j => s"c.r$j * c.r$j")
                       .mkString(" + ")})) AS cos16
              FROM red q JOIN red c ON c.vec_id = q.vec_id + 1)
        SELECT CAST(floor(abs(cos64 - cos16) * 20) AS INTEGER) AS err_bucket,
               count(*) AS n_pairs
        FROM p GROUP BY 1 ORDER BY 1""")),

    // -------------------------------------------------------------- q170:
    // Per-dimension embedding health check — the profile an embedding
    // pipeline runs before trusting a new encoder drop: per dim, count,
    // min/max (raw float comparisons — exact), zero-fraction, and mean
    // via integer 1e6-units of the 6dp-rounded values (float32→double
    // widening is identical in both engines, so the rounded units
    // match; the cross-row fold is a BIGINT sum — order-free). A dead
    // dimension (all zeros) or an exploded one (|mean| ≫ 0) is the
    // classic silent encoder bug this surfaces.
    //
    // Scale shape: posexplode fans corpus × dims rows, then ONE
    // map-side-combined aggregate on the |dims|-sized key — shuffle
    // carries dims × partials, never the corpus.
    QueryDef(
      "q170_embedding_dim_stats",
      (s, d) => {
        Tables(s, d, "embeddings")
          .select(posexplode(col("embedding")).as(Seq("dim", "v")))
          .select(col("dim"),
            col("v").cast("double").as("vd"),
            expr("CAST(round(CAST(v AS DOUBLE) * 1e6) AS BIGINT)").as("vu"))
          .groupBy("dim")
          .agg(count(lit(1)).as("n"),
            min("vd").as("min_v"), max("vd").as("max_v"),
            sum(when(col("vu") === 0L, 1L).otherwise(0L)).as("n_zero"),
            round(sum(col("vu")).cast("double") /
              (count(lit(1)).cast("double") * 1e6), 6).as("mean_v"))
          .orderBy("dim")
      },
      Some("""
        WITH ix AS (SELECT e.embedding,
                           unnest(generate_series(0, len(e.embedding) - 1))
                             AS dim
                    FROM embeddings e),
        x AS (SELECT CAST(dim AS INTEGER) AS dim,
                     CAST(embedding[CAST(dim AS INTEGER) + 1] AS DOUBLE)
                       AS vd,
                     CAST(round(CAST(embedding[CAST(dim AS INTEGER) + 1]
                       AS DOUBLE) * 1e6) AS BIGINT) AS vu
              FROM ix)
        SELECT dim, COUNT(*) AS n,
               MIN(vd) AS min_v, MAX(vd) AS max_v,
               CAST(SUM(CASE WHEN vu = 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_zero,
               round(CAST(SUM(vu) AS DOUBLE) /
                     (CAST(COUNT(*) AS DOUBLE) * 1e6), 6) AS mean_v
        FROM x GROUP BY dim
        ORDER BY dim""")),

    // -------------------------------------------------------------- q240:
    // SCALAR-QUANTIZED (int8) ANN — the embedding-store compression
    // every production vector corpus runs before anything fancier:
    // each vector stores as 64 int8 codes + ONE per-vector scale
    // (symmetric max-abs quantization) — a 4x reduction in what a
    // 100-TB embedding scan reads and shuffles. Search is asymmetric:
    // the full-precision query scores against codes
    // (sum(code_d * q_d) * amax / 127 ≈ dot), the top-25 approximate
    // candidates are exactly reranked by true cosine, and the top-10
    // ship. Quantization error only moves the CANDIDATE CUT, and the
    // 2.5x overfetch absorbs it; the emitted scores are exact. The
    // oracle replays the identical quantizer (floor(x*127/amax + .5)
    // — explicit floor(+0.5), the one rounding both engines share
    // bit-for-bit) and the identical fold order, so ranks and scores
    // hash-match.
    QueryDef(
      "q240_sq_int8_ann",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val v = Tables(s, d, "embeddings")
        val quant = v.select(col("vec_id"), col("embedding"))
          .withColumn("amax", expr(
            """aggregate(embedding, CAST(0.0 AS DOUBLE),
               (a, x) -> greatest(a, abs(CAST(x AS DOUBLE))))"""))
          .withColumn("codes", expr(
            """transform(embedding, x ->
               CAST(floor(CAST(x AS DOUBLE) * 127.0 / amax + 0.5d)
                 AS INT))"""))
        val q = v.filter(col("vec_id") < 5)
          .select(col("vec_id").as("query_id"),
            col("embedding").as("qv")).as("q")
        val c = quant.select(col("vec_id").as("cand_id"), col("codes"),
          col("amax"), col("embedding").as("cv")).as("c")
        val approx = broadcast(q)
          .join(c, col("query_id") =!= col("cand_id"))
          // asymmetric SQ score: codes x full-precision query
          .withColumn("sq_dot", expr(
            """aggregate(zip_with(codes, qv,
                 (cd, qd) -> CAST(cd AS DOUBLE) * CAST(qd AS DOUBLE)),
               CAST(0.0 AS DOUBLE), (a, x) -> a + x)
               * amax / 127.0"""))
        val wA = Window.partitionBy(col("query_id"))
          .orderBy(col("sq_dot").desc, col("cand_id"))
        val cands = approx
          .withColumn("arank", row_number().over(wA))
          .filter(col("arank") <= 25)
        val wE = Window.partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("cand_id"))
        cands
          .withColumn("cos", graft.functions.functions.cosine_sim(
            col("qv"), col("cv")))
          .withColumn("rank", row_number().over(wE))
          .filter(col("rank") <= 10)
          .select(col("query_id"), col("rank"), col("cand_id"),
            round(col("cos"), 6).as("cos_sim"))
          .orderBy("query_id", "rank")
      },
      Some(s"""
        WITH $duckNormed,
        sq AS (SELECT vec_id,
                      list_reduce(list_transform(embedding,
                        x -> abs(CAST(x AS DOUBLE))),
                        (a2, b2) -> greatest(a2, b2)) amax,
                      embedding
               FROM embeddings),
        codes AS (SELECT vec_id, amax,
                         list_transform(embedding, x ->
                           CAST(floor(CAST(x AS DOUBLE) * 127.0 / amax
                             + 0.5) AS INTEGER)) codes
                  FROM sq),
        a AS (SELECT q.vec_id query_id, c.vec_id cand_id,
                     list_reduce(list_transform(
                       generate_series(1, len(c.codes)),
                       i -> CAST(c.codes[i] AS DOUBLE) *
                            CAST(q.embedding[i] AS DOUBLE)),
                       (a2, b2) -> a2 + b2) * c.amax / 127.0 sq_dot
              FROM v q JOIN codes c
                ON q.vec_id < 5 AND q.vec_id <> c.vec_id),
        ar AS (SELECT query_id, cand_id,
                      CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                           ORDER BY sq_dot DESC, cand_id) AS INTEGER)
                        arank
               FROM a),
        ex AS (SELECT ar.query_id, ar.cand_id, $duckCos cos
               FROM ar
               JOIN v q ON q.vec_id = ar.query_id
               JOIN v c ON c.vec_id = ar.cand_id
               WHERE ar.arank <= 25),
        r AS (SELECT query_id, cand_id, cos,
                     CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                          ORDER BY cos DESC, cand_id) AS INTEGER) rank
              FROM ex)
        SELECT query_id, rank, cand_id, round(cos, 6) AS cos_sim
        FROM r WHERE rank <= 10
        ORDER BY query_id, rank""")),

    // -------------------------------------------------------------- q247:
    // IVF x INT8-SQ COMPOSED ANN — the production pairing q240's
    // in-source caveat named: SQ alone is COMPRESSION (4x less read/
    // shuffled, but every candidate still scores), IVF alone is
    // PRUNING (nprobe/ncells of the corpus scores, at full width).
    // Composed: cell assignment prunes the candidate pool to the
    // probed cells, the asymmetric int8 score ranks that pool reading
    // only codes+scale, and the top-25 rerank exactly — at 100 TB the
    // scan cost is (nprobe/ncells) x (1/4) of brute force while the
    // emitted scores stay exact. Same codebook/tie-break as q56, same
    // quantizer as q240, so the oracle replays both bit-for-bit.
    QueryDef(
      "q247_ivf_sq_ann",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val cos2 = (a: org.apache.spark.sql.Column,
            b: org.apache.spark.sql.Column) =>
          graft.functions.functions.cosine_sim(a, b)
        val v = Tables(s, d, "embeddings")
          .select(col("vec_id"), col("embedding"))
        val cb = v.filter(col("vec_id") < 16)
          .select(col("vec_id").as("cell_id"),
            col("embedding").as("cb_emb"))
        // q240's symmetric max-abs quantizer, applied corpus-wide
        val quant = v
          .withColumn("amax", expr(
            """aggregate(embedding, CAST(0.0 AS DOUBLE),
               (a, x) -> greatest(a, abs(CAST(x AS DOUBLE))))"""))
          .withColumn("codes", expr(
            """transform(embedding, x ->
               CAST(floor(CAST(x AS DOUBLE) * 127.0 / amax + 0.5d)
                 AS INT))"""))
        // q56's cell assignment (argmax cosine, tie -> min cell), the
        // codes and scale riding along in the max_by payload so the
        // corpus shuffles ONCE
        val assigned = quant.crossJoin(broadcast(cb))
          .withColumn("cd", cos2(col("embedding"), col("cb_emb")))
          .groupBy(col("vec_id"))
          .agg(max_by(struct(col("cell_id"), col("embedding"),
            col("codes"), col("amax")),
            struct(col("cd"), negate(col("cell_id")))).as("best"))
          .select(col("vec_id").as("cand_id"),
            col("best.cell_id").as("cell_id"),
            col("best.codes").as("codes"), col("best.amax").as("amax"),
            col("best.embedding").as("cv"))
        val wq = Window.partitionBy(col("vec_id"))
          .orderBy(col("cd").desc, col("cell_id"))
        val qcells = v.filter(col("vec_id") < 5).crossJoin(broadcast(cb))
          .withColumn("cd", cos2(col("embedding"), col("cb_emb")))
          .withColumn("arn", row_number().over(wq))
          .filter(col("arn") <= 2)
          .select(col("vec_id").as("query_id"),
            col("embedding").as("qv"), col("cell_id"))
        // IVF prune (join on the probed cells) -> asymmetric SQ score
        // over codes only -> top-25 -> exact rerank -> top-10
        val wA = Window.partitionBy(col("query_id"))
          .orderBy(col("sq_dot").desc, col("cand_id"))
        val wE = Window.partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("cand_id"))
        broadcast(qcells).join(assigned, Seq("cell_id"))
          .filter(col("cand_id") =!= col("query_id"))
          .withColumn("sq_dot", expr(
            """aggregate(zip_with(codes, qv,
                 (cd, qd) -> CAST(cd AS DOUBLE) * CAST(qd AS DOUBLE)),
               CAST(0.0 AS DOUBLE), (a, x) -> a + x)
               * amax / 127.0"""))
          .withColumn("arank", row_number().over(wA))
          .filter(col("arank") <= 25)
          .withColumn("cos", cos2(col("qv"), col("cv")))
          .withColumn("rank", row_number().over(wE))
          .filter(col("rank") <= 10)
          .select(col("query_id"), col("rank"), col("cand_id"),
            col("cell_id"), round(col("cos"), 6).as("cos_sim"))
          .orderBy("query_id", "rank")
      },
      Some("""
        WITH vn AS (SELECT vec_id, embedding,
               sqrt(list_reduce(list_transform(generate_series(1, len(embedding)),
                    i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)),
                    (a2, b2) -> a2 + b2)) norm
             FROM embeddings),
        cb AS (SELECT vec_id AS cell_id, embedding AS cb_emb, norm AS cb_norm
               FROM vn WHERE vec_id < 16),
        ass AS (SELECT vn.vec_id, vn.embedding, vn.norm, cb.cell_id,
               list_reduce(list_transform(generate_series(1, len(vn.embedding)),
                 i -> CAST(vn.embedding[i] AS DOUBLE) * CAST(cb.cb_emb[i] AS DOUBLE)),
                 (a2, b2) -> a2 + b2) / (vn.norm * cb.cb_norm) AS cd
               FROM vn CROSS JOIN cb),
        rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                        ORDER BY cd DESC, cell_id) AS arn FROM ass),
        codes AS (SELECT vec_id,
                         list_reduce(list_transform(embedding,
                           x -> abs(CAST(x AS DOUBLE))),
                           (a2, b2) -> greatest(a2, b2)) amax,
                         list_transform(embedding, x ->
                           CAST(floor(CAST(x AS DOUBLE) * 127.0 /
                             list_reduce(list_transform(embedding,
                               y -> abs(CAST(y AS DOUBLE))),
                               (a2, b2) -> greatest(a2, b2))
                             + 0.5) AS INTEGER)) codes
                  FROM embeddings),
        assigned AS (SELECT rk.vec_id AS cand_id, rk.embedding AS c_emb,
                            rk.norm AS c_norm, rk.cell_id,
                            codes.amax, codes.codes
                     FROM rk JOIN codes ON codes.vec_id = rk.vec_id
                     WHERE arn = 1),
        qc AS (SELECT vec_id AS query_id, embedding AS q_emb,
                      norm AS q_norm, cell_id
               FROM rk WHERE vec_id < 5 AND arn <= 2),
        a AS (SELECT q.query_id, c.cand_id, q.cell_id, q.q_emb, q.q_norm,
                     c.c_emb, c.c_norm,
                     list_reduce(list_transform(
                       generate_series(1, len(c.codes)),
                       i -> CAST(c.codes[i] AS DOUBLE) *
                            CAST(q.q_emb[i] AS DOUBLE)),
                       (a2, b2) -> a2 + b2) * c.amax / 127.0 sq_dot
              FROM qc q JOIN assigned c USING (cell_id)
              WHERE c.cand_id <> q.query_id),
        ar AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY sq_dot DESC, cand_id) AS INTEGER) arank
               FROM a),
        ex AS (SELECT query_id, cand_id, cell_id,
                      list_reduce(list_transform(
                        generate_series(1, len(q_emb)),
                        i -> CAST(q_emb[i] AS DOUBLE) *
                             CAST(c_emb[i] AS DOUBLE)),
                        (a2, b2) -> a2 + b2) / (q_norm * c_norm) cos
               FROM ar WHERE arank <= 25),
        r AS (SELECT query_id, cand_id, cell_id, cos,
                     CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                          ORDER BY cos DESC, cand_id) AS INTEGER) rank
              FROM ex)
        SELECT query_id, rank, cand_id, cell_id, round(cos, 6) AS cos_sim
        FROM r WHERE rank <= 10
        ORDER BY query_id, rank""")),

    // -------------------------------------------------------------- q253:
    // HARD-NEGATIVE MINING for contrastive training pairs — the
    // retrieval-training data op (DPR/SimCSE-style): for each anchor,
    // emit its nearest SAME-label neighbor as the positive and the 3
    // highest-cosine DIFFERENT-label candidates as hard negatives (the
    // near-misses a contrastive loss learns the most from; random
    // negatives are trivially separable). Plan: anchors broadcast, the
    // corpus streams ONCE, one window partitioned by (anchor,
    // same-label side) ranks both roles in a single pass —
    // WindowGroupLimit keeps <=4 rows per anchor-side per partition
    // map-side, so only ~4 rows/anchor/partition reach the exchange.
    // At 100 TB the candidate set composes with the IVF cells of
    // q56/q247 exactly like every other ANN query here; the mining
    // logic is unchanged.
    QueryDef(
      "q253_hard_negative_mining",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val v = Tables(s, d, "embeddings")
        val q = v.filter(col("vec_id") < 10).select(
          col("vec_id").as("query_id"), col("embedding"),
          col("label").as("q_label")).as("q")
        val c = v.select(col("vec_id").as("cand_id"), col("embedding"),
          col("label").as("c_label")).as("c")
        val w = Window.partitionBy(col("query_id"), col("same"))
          .orderBy(col("cos").desc, col("cand_id"))
        broadcast(q).join(c, col("query_id") =!= col("cand_id"))
          .withColumn("cos", cosCol)
          .withColumn("same",
            (col("q_label") === col("c_label")).cast("int"))
          .withColumn("rank", row_number().over(w))
          // rank <= 3 FIRST and ALONE in its conjunct: that's the shape
          // InferWindowGroupLimit recognizes, so each task keeps only 3
          // rows per (anchor, side) map-side before the window exchange
          // — an OR-only filter would ship every scored candidate
          .filter(col("rank") <= 3)
          .filter(col("same") === 0 || col("rank") === 1)
          .select(col("query_id"),
            when(col("same") === 1, lit("positive"))
              .otherwise(lit("hard_negative")).as("role"),
            col("rank"), col("cand_id"),
            round(col("cos"), 6).as("cos_sim"))
          .orderBy("query_id", "role", "rank")
      },
      Some(s"""
        WITH $duckNormed,
        p AS (SELECT q.vec_id query_id,
                     CASE WHEN q.label = c.label THEN 1 ELSE 0 END same,
                     c.vec_id cand_id, $duckCos cos
              FROM v q JOIN v c ON q.vec_id < 10 AND q.vec_id <> c.vec_id),
        r AS (SELECT query_id, same, cand_id, cos,
                     CAST(ROW_NUMBER() OVER (PARTITION BY query_id, same
                          ORDER BY cos DESC, cand_id) AS INTEGER) rank
              FROM p)
        SELECT query_id,
               CASE WHEN same = 1 THEN 'positive'
                    ELSE 'hard_negative' END AS role,
               rank, cand_id, round(cos, 6) AS cos_sim
        FROM r
        WHERE (same = 1 AND rank = 1) OR (same = 0 AND rank <= 3)
        ORDER BY query_id, role, rank"""))
  )
}
