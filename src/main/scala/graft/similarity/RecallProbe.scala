package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.util.Hashing.md5Long

/** ANN recall measurement on a CLUSTERED corpus.
  *
  * q115/q116/q140 measure recall on the fixture embeddings, which are
  * near-isotropic random vectors — the one geometry where LSH/IVF
  * *cannot* beat scanning (pairwise cosines concentrate, bucket mates are
  * rarely true neighbors), so the measured 0.03–0.22 recall there is an
  * honest property of the fixture, not of the index family. Real
  * embedding corpora are the opposite: encoder outputs cluster heavily.
  * This probe builds a deterministic mixture-of-Gaussians corpus (the
  * clusterable case) and runs the SAME index shapes the declared queries
  * use — IVF cell probing (q56/q139) and banded hyperplane LSH (q116) —
  * reporting recall@k against brute force together with the fraction of
  * the corpus each query actually scanned. AnnRecallCurveSpec pins the
  * resulting curve (recall ≥ 0.8 at ≤ 15 % scanned); the measured points
  * are recorded in BASELINE.md.
  *
  * Scale shape (same contracts as the declared queries): centers/
  * centroids are broadcast-sized; cell assignment is a map-side-combined
  * argmin (one exchange of per-point partials, never a window over the
  * corpus); the search join is an equi-join on cell/bucket keys, so the
  * per-query work is candidate-sized, not corpus-sized.
  */
object RecallProbe {

  /** Deterministic clustered corpus: `n` points in `dims`-d around `k`
    * centers. Center coords are md5-derived constants in [-1, 1]
    * (interpolated as plan literals); per-point noise is xxhash64-derived
    * (deterministic inside Spark — this probe has no DuckDB oracle, so
    * Spark-internal determinism is the requirement) and scaled by
    * `noise`. Point i belongs to cluster i % k — the label is returned
    * for diagnostics but never consulted by the index. Generation is
    * map-only over spark.range: no data ever originates on the driver
    * beyond the k×dims literal centers (codebook-sized by definition).
    */
  def clusteredCorpus(s: SparkSession, n: Int, k: Int, dims: Int,
      noise: Double): DataFrame = {
    val centers: IndexedSeq[IndexedSeq[Double]] =
      (0 until k).map(c => (0 until dims).map(d =>
        ((md5Long(s"ctr:$c:$d") % 2001) - 1000) / 1000.0))
    val ctrs: Column = array(centers.map(ca => array(ca.map(lit): _*)): _*)
    s.range(n.toLong).toDF("vec_id")
      .withColumn("true_cluster", (col("vec_id") % k).cast("int"))
      .withColumn("ctrs", ctrs)
      // CAST to FLOAT: same element type as the fixture embeddings table,
      // which is what the native cosine_sim / plane_dot expressions accept
      .withColumn("embedding", expr(
        s"""transform(sequence(0, ${dims - 1}), dd -> CAST(
           |  element_at(element_at(ctrs, true_cluster + 1), dd + 1) +
           |  $noise * ((pmod(xxhash64(concat(CAST(vec_id AS STRING), ':',
           |    CAST(dd AS STRING))), 2001) - 1000) / 1000.0) AS FLOAT))"""
          .stripMargin))
      .drop("ctrs")
  }

  private val cosine = (a: Column, b: Column) =>
    graft.functions.functions.cosine_sim(a, b)

  /** Exact brute-force top-`topK` per query (vec_id < nQueries), the
    * ground-truth arm: broadcast the query set, stream the corpus,
    * per-partition WindowGroupLimit keeps k rows map-side. */
  private def exactTopK(corpus: DataFrame, nQueries: Int, topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = corpus.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val c = corpus.select(col("vec_id").as("cand_id"), col("embedding").as("ce"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("cand_id"))
    broadcast(q).join(c, col("query_id") =!= col("cand_id"))
      .withColumn("cos", cosine(col("qe"), col("ce")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select("query_id", "cand_id")
  }

  /** Join an approximate candidate list (query_id, cand_id) against the
    * exact arm: one row per query with recall@topK and the scanned
    * fraction. The scoring tables are |queries|-sized → broadcast. */
  private def score(corpus: DataFrame, cand: DataFrame, nQueries: Int,
      topK: Int, n: Long): DataFrame = {
    val exact = exactTopK(corpus, nQueries, topK)
    val emb = corpus.select(col("vec_id"), col("embedding"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("cand_id"))
    val top = broadcast(broadcast(cand)
        .join(emb.select(col("vec_id").as("query_id"),
          col("embedding").as("qe")), "query_id"))
      .join(emb.select(col("vec_id").as("cand_id"),
        col("embedding").as("ce")), "cand_id")
      .withColumn("cos", cosine(col("qe"), col("ce")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select("query_id", "cand_id")
    val nScan = cand.groupBy("query_id").agg(count(lit(1)).as("n_scanned"))
    val hit = exact.join(top, Seq("query_id", "cand_id"))
      .groupBy("query_id").agg(count(lit(1)).as("n_hit"))
    exact.groupBy("query_id").agg(count(lit(1)).as("n_exact"))
      .join(broadcast(nScan), Seq("query_id"), "left")
      .join(broadcast(hit), Seq("query_id"), "left")
      .select(col("query_id"), col("n_exact"),
        coalesce(col("n_scanned"), lit(0L)).as("n_scanned"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        (coalesce(col("n_hit"), lit(0L)) / col("n_exact").cast("double"))
          .as("recall"),
        (coalesce(col("n_scanned"), lit(0L)) / lit(n.toDouble))
          .as("scanned_frac"))
      .orderBy("query_id")
  }

  /** IVF recall audit: Lloyd-trained `kCells` coarse quantizer
    * (lowest-vec_id seeding, `rounds` centroid updates — the q127
    * recipe), every vector assigned to its nearest cell, queries probe
    * their `nprobe` nearest cells, exact cosine rerank of the union.
    * Returns one row per query: (query_id, n_exact, n_scanned, n_hit,
    * recall, scanned_frac). */
  def ivfRecall(corpus: DataFrame, nQueries: Int, kCells: Int, rounds: Int,
      nprobe: Int, topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val n = corpus.count()
    val pts = corpus.select(col("vec_id"), col("embedding").as("pe"))
    val sqDist = expr(
      "aggregate(zip_with(pe, ce, (x, y) -> (x - y) * (x - y)), 0D, (acc, v) -> acc + v)")
    def assign(cents: DataFrame): DataFrame =
      pts.crossJoin(broadcast(cents))
        .withColumn("sq_dist", sqDist)
        .groupBy("vec_id")
        .agg(min(struct(col("sq_dist"), col("cell"))).as("m"))
        .select(col("vec_id"), col("m.cell").as("cell"))
    def update(asg: DataFrame): DataFrame =
      asg.join(pts, "vec_id")
        .select(col("cell"), posexplode(col("pe")).as(Seq("dim", "v")))
        .groupBy("cell", "dim")
        .agg((sum(col("v")) / count(lit(1))).as("m"))
        .groupBy("cell")
        .agg(expr("transform(array_sort(collect_list(struct(dim, m))), s2 -> s2.m)")
          .as("ce"))
    var cents = pts.orderBy("vec_id").limit(kCells)
      .select(col("vec_id").as("cell"), col("pe").as("ce"))
      .localCheckpoint(true)
    for (_ <- 1 to rounds)
      cents = update(assign(cents)).localCheckpoint(true)
    val asg = assign(cents)
    val wq = Window.partitionBy(col("vec_id"))
      .orderBy(col("sq_dist"), col("cell"))
    val probes = pts.filter(col("vec_id") < nQueries)
      .crossJoin(broadcast(cents))
      .withColumn("sq_dist", sqDist)
      .withColumn("arn", row_number().over(wq))
      .filter(col("arn") <= nprobe)
      .select(col("vec_id").as("query_id"), col("cell"))
    val cand = broadcast(probes)
      .join(asg.select(col("vec_id").as("cand_id"), col("cell")), "cell")
      .filter(col("query_id") =!= col("cand_id"))
      .select("query_id", "cand_id").distinct()
    score(corpus, cand, nQueries, topK, n)
  }

  /** Banded hyperplane-LSH recall audit (the q116 geometry generalized):
    * `bands` bands × `bits` sign bits each, planes md5-derived from
    * `seed`; candidates = union over bands of the query's bucket mates,
    * exact cosine rerank. */
  def bandedLshRecall(corpus: DataFrame, nQueries: Int, bands: Int,
      bits: Int, topK: Int, seed: String = "probe"): DataFrame = {
    val n = corpus.count()
    // plane length must match the corpus dimensionality — derive it,
    // don't assume 64 (a mismatch dots only a prefix, silently)
    val dims = corpus.select(size(col("embedding"))).head().getInt(0)
    val planes: IndexedSeq[Seq[Long]] =
      (0 until bands * bits).map(p => (0 until dims).map(d =>
        (md5Long(s"$seed:$p:$d") % 2001) - 1000))
    val sig = corpus.withColumn("sig", (0 until bands * bits).map(p =>
        when(graft.functions.PlaneDot.plane_dot(col("embedding"), planes(p)) > 0,
          lit(1L << p)).otherwise(lit(0L))).reduce(_ + _))
    val mask = (1L << bits) - 1
    val bandKeys = sig.select(col("vec_id"), explode(expr(
        s"""transform(sequence(0, ${bands - 1}),
           |  b -> struct(b AS band,
           |              CAST(shiftright(sig, b * $bits) & $mask AS BIGINT) AS key))"""
          .stripMargin)).as("bk"))
      .select(col("vec_id"), col("bk.band").as("band"), col("bk.key").as("key"))
    val cand = broadcast(
        bandKeys.filter(col("vec_id") < nQueries)
          .select(col("vec_id").as("query_id"), col("band"), col("key")))
      .join(bandKeys.select(col("vec_id").as("cand_id"), col("band"), col("key")),
        Seq("band", "key"))
      .filter(col("query_id") =!= col("cand_id"))
      .select("query_id", "cand_id").distinct()
    score(corpus, cand, nQueries, topK, n)
  }

  // ------------------------------------------------------------------ q198
  // The probe's headline finding — high ANN recall at a small scanned
  // fraction on a CLUSTERABLE corpus — promoted from spec/BASELINE
  // evidence into the driver's correctness channel (VERDICT r9 item 5).
  // To make the whole measurement ORACLE-PAIRED (the spec corpus uses
  // xxhash64, Spark-only), the declared variant is built on an integer
  // lattice: center coordinates and per-point noise are md5-derived
  // integers (byte-identical in DuckDB), embeddings are ARRAY<BIGINT>,
  // and neighbors rank by squared L2 distance — pure int64 arithmetic,
  // so both arms, the rerank, and the recall itself hash-match exactly.

  private val QN = 2000 // corpus size
  private val QK = 8 // clusters = IVF cells
  private val QD = 16 // dimensions
  private val QQ = 16 // audited queries
  private val QPROBE = 2 // cells probed per query
  private val QTOP = 5 // recall@K

  /** Cluster centers on the integer lattice, scaled by 1000 so the
    * (±1000-range) noise perturbs at 15% of the coordinate scale —
    * same literals interpolated into the Spark plan and the oracle. */
  private val latCenters: IndexedSeq[IndexedSeq[Long]] =
    (0 until QK).map(c => (0 until QD).map(d =>
      ((md5Long(s"lat:$c:$d") % 2001) - 1000) * 1000L))

  private def duckCenters: String =
    latCenters.map(_.mkString("[", ", ", "]")).mkString("[", ", ", "]")

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q198_ivf_recall_clustered",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ctrs: Column =
          array(latCenters.map(ca => array(ca.map(lit): _*)): _*)
        // corpus: map-only over spark.range — point i near center i % K,
        // md5 noise per (point, dim). Nothing originates on the driver
        // beyond the K x D literal centers (codebook-sized).
        val corpus = s.range(QN.toLong).toDF("vec_id")
          .withColumn("ctrs", ctrs)
          .withColumn("embedding", expr(
            s"""transform(sequence(0, ${QD - 1}), dd ->
               |  element_at(element_at(ctrs, CAST(vec_id % $QK AS INT) + 1),
               |             dd + 1)
               |  + 150 * (CAST(conv(substr(md5(concat(
               |      CAST(vec_id AS STRING), ':', CAST(dd AS STRING))),
               |      1, 15), 16, 10) AS BIGINT) % 2001 - 1000))"""
              .stripMargin))
          // IVF assignment with the KNOWN codebook: distances to all K
          // cells per point (map-side, no shuffle), argmin with
          // first-index tiebreak
          .withColumn("dists", expr(
            """transform(ctrs, ctr ->
              |  aggregate(zip_with(embedding, ctr,
              |    (x, y) -> (x - y) * (x - y)), 0L, (acc, v) -> acc + v))"""
              .stripMargin))
          .withColumn("cell", expr("array_position(dists, array_min(dists))"))
          .drop("ctrs")
        val l2 = expr(
          """aggregate(zip_with(qe, ce, (x, y) -> (x - y) * (x - y)),
            |          0L, (acc, v) -> acc + v)""".stripMargin)
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("dist"), col("cand_id"))
        val emb = corpus.select(col("vec_id"), col("embedding"))
        // queries probe their QPROBE nearest cells
        val probes = corpus.filter(col("vec_id") < QQ)
          .select(col("vec_id").as("query_id"),
            posexplode(col("dists")).as(Seq("cpos", "cdist")))
          .withColumn("rnk", row_number().over(Window
            .partitionBy(col("query_id"))
            .orderBy(col("cdist"), col("cpos"))))
          .filter(col("rnk") <= QPROBE)
          .select(col("query_id"), (col("cpos") + 1).cast("long").as("cell"))
        // candidates = corpus members of the probed cells (equi-join on
        // cell — candidate-sized work, never corpus x corpus)
        val cand = broadcast(probes)
          .join(corpus.select(col("vec_id").as("cand_id"), col("cell")),
            "cell")
          .filter(col("query_id") =!= col("cand_id"))
          .select("query_id", "cand_id")
        val approxTop = broadcast(broadcast(cand)
            .join(emb.select(col("vec_id").as("query_id"),
              col("embedding").as("qe")), "query_id"))
          .join(emb.select(col("vec_id").as("cand_id"),
            col("embedding").as("ce")), "cand_id")
          .withColumn("dist", l2)
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= QTOP)
          .select("query_id", "cand_id")
        // ground truth: brute-force top-K (broadcast the query arm)
        val exact = broadcast(emb.filter(col("vec_id") < QQ)
            .select(col("vec_id").as("query_id"), col("embedding").as("qe")))
          .join(emb.select(col("vec_id").as("cand_id"),
            col("embedding").as("ce")),
            col("query_id") =!= col("cand_id"))
          .withColumn("dist", l2)
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= QTOP)
          .select("query_id", "cand_id")
        val nScan = cand.groupBy("query_id").agg(count(lit(1)).as("n_scanned"))
        val hit = exact.join(approxTop, Seq("query_id", "cand_id"))
          .groupBy("query_id").agg(count(lit(1)).as("n_hit"))
        exact.groupBy("query_id").agg(count(lit(1)).as("n_exact"))
          .join(broadcast(nScan), Seq("query_id"), "left")
          .join(broadcast(hit), Seq("query_id"), "left")
          .select(col("query_id"), col("n_exact"),
            coalesce(col("n_scanned"), lit(0L)).as("n_scanned"),
            coalesce(col("n_hit"), lit(0L)).as("n_hit"),
            (coalesce(col("n_hit"), lit(0L)) /
              col("n_exact").cast("double")).as("recall"),
            (coalesce(col("n_scanned"), lit(0L)) / lit(QN.toDouble))
              .as("scanned_frac"))
          .orderBy("query_id")
      },
      Some(s"""
        WITH ctr AS (SELECT $duckCenters AS cs),
        ids AS (SELECT CAST(r.range AS BIGINT) AS vec_id FROM range(0, $QN) r),
        emb AS (SELECT vec_id,
                  list_transform(range(0, $QD), dd ->
                    cs[CAST(vec_id % $QK AS INTEGER) + 1][dd + 1]
                    + 150 * (CAST(concat('0x', substr(md5(
                        CAST(vec_id AS VARCHAR) || ':' ||
                        CAST(dd AS VARCHAR)), 1, 15)) AS BIGINT)
                      % 2001 - 1000)) AS e
                FROM ids, ctr),
        cl AS (SELECT vec_id, e,
                 list_transform(cs, c2 ->
                   list_sum(list_transform(range(0, $QD), dd ->
                     (e[dd + 1] - c2[dd + 1]) * (e[dd + 1] - c2[dd + 1]))))
                   AS dists
               FROM emb, ctr),
        cell1 AS (SELECT vec_id, e, dists,
                    CAST(list_position(dists, list_min(dists)) AS BIGINT)
                      AS cell
                  FROM cl),
        pr AS (SELECT vec_id AS query_id,
                      unnest(range(0, $QK)) AS j, unnest(dists) AS cdist
               FROM cell1 WHERE vec_id < $QQ),
        prr AS (SELECT query_id, j,
                       ROW_NUMBER() OVER (PARTITION BY query_id
                         ORDER BY cdist, j) AS rnk
                FROM pr),
        probes AS (SELECT query_id, j + 1 AS cell FROM prr
                   WHERE rnk <= $QPROBE),
        cand AS (SELECT p.query_id, c.vec_id AS cand_id
                 FROM probes p JOIN cell1 c ON c.cell = p.cell
                 WHERE c.vec_id <> p.query_id),
        qv AS (SELECT vec_id AS query_id, e AS qe FROM cell1
               WHERE vec_id < $QQ),
        ap AS (SELECT cand.query_id, cand.cand_id,
                 list_sum(list_transform(range(0, $QD), dd ->
                   (qv.qe[dd + 1] - ce.e[dd + 1]) *
                   (qv.qe[dd + 1] - ce.e[dd + 1]))) AS dist
               FROM cand JOIN qv USING (query_id)
               JOIN cell1 ce ON ce.vec_id = cand.cand_id),
        apr AS (SELECT query_id, cand_id,
                  ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY dist, cand_id) AS rn
                FROM ap),
        atop AS (SELECT query_id, cand_id FROM apr WHERE rn <= $QTOP),
        ep AS (SELECT q.query_id, c.vec_id AS cand_id,
                 list_sum(list_transform(range(0, $QD), dd ->
                   (q.qe[dd + 1] - c.e[dd + 1]) *
                   (q.qe[dd + 1] - c.e[dd + 1]))) AS dist
               FROM qv q JOIN cell1 c ON c.vec_id <> q.query_id),
        er AS (SELECT query_id, cand_id,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY dist, cand_id) AS rn
               FROM ep),
        exact AS (SELECT query_id, cand_id FROM er WHERE rn <= $QTOP),
        ns AS (SELECT query_id, COUNT(*) AS n_scanned FROM cand
               GROUP BY query_id),
        nh AS (SELECT e2.query_id, COUNT(*) AS n_hit
               FROM exact e2 JOIN atop USING (query_id, cand_id)
               GROUP BY e2.query_id),
        ne AS (SELECT query_id, COUNT(*) AS n_exact FROM exact
               GROUP BY query_id)
        SELECT ne.query_id, CAST(n_exact AS BIGINT) AS n_exact,
               CAST(COALESCE(n_scanned, 0) AS BIGINT) AS n_scanned,
               CAST(COALESCE(n_hit, 0) AS BIGINT) AS n_hit,
               COALESCE(n_hit, 0) / CAST(n_exact AS DOUBLE) AS recall,
               COALESCE(n_scanned, 0) / CAST($QN AS DOUBLE) AS scanned_frac
        FROM ne LEFT JOIN ns USING (query_id) LEFT JOIN nh USING (query_id)
        ORDER BY query_id"""))
  )
}
