package graft

/** q275 invariant (VERDICT r15 item 2): the change-feed-maintained ANN
  * index must be INDISTINGUISHABLE from a full rebuild — not just
  * recall-equivalent, assignment-identical. The query's own oracle
  * already hash-checks the census; this pins the full per-vector
  * assignment table (including cells the search never probes) and the
  * frozen-codebook contract.
  */
class AnnIndexFeedSpec extends SparkSpec {

  test("incremental re-index equals a from-scratch rebuild, per vector") {
    // drives the whole q275 cycle: CTAS -> seed index -> UPDATE/DELETE/
    // INSERT waves -> bounded feed read -> MERGE re-index
    SparkEntry.queries("q275_ann_index_feed")(spark, sfDir).collect()

    // full rebuild from the CURRENT corpus against the same frozen cells
    val rebuilt = spark.sql("""
      SELECT v.vec_id,
             max_by(c.cell_id, named_struct(
               'cd', cosine_sim(v.embedding, c.cb_emb),
               'nc', -c.cell_id)) AS cell_id
      FROM graft_cat.default.emb_cdc v
      CROSS JOIN graft_cat.default.ann_cells c
      GROUP BY v.vec_id""")
    val idx = spark.table("graft_cat.default.ann_idx")

    // same key set, same assignment for every key (EXCEPT both ways)
    assert(idx.count() == rebuilt.count())
    assert(idx.exceptAll(rebuilt).count() == 0)
    assert(rebuilt.exceptAll(idx).count() == 0)

    // the waves actually moved things: deletes shrank the index below
    // the corpus seed, inserts placed brand-new ids, the re-encode
    // UPDATE changed at least one surviving vector's cell
    val n0 = spark.sql(
      "SELECT COUNT(*) FROM graft_cat.default.emb_cdc VERSION AS OF 0")
      .head().getLong(0)
    assert(idx.count() < n0 + idx.filter("vec_id >= 100000").count())
    assert(idx.filter("vec_id >= 100000").count() > 0)
    val moved = spark.sql("""
      SELECT COUNT(*) FROM graft_cat.default.ann_idx i
      JOIN (SELECT v.vec_id,
                   max_by(c.cell_id, named_struct(
                     'cd', cosine_sim(v.embedding, c.cb_emb),
                     'nc', -c.cell_id)) AS cell_id
            FROM graft_cat.default.emb_cdc VERSION AS OF 0 v
            CROSS JOIN graft_cat.default.ann_cells c
            GROUP BY v.vec_id) s
        ON i.vec_id = s.vec_id AND i.cell_id <> s.cell_id""")
      .head().getLong(0)
    assert(moved > 0, "the re-encode UPDATE should move at least one " +
      "surviving vector between cells")

    // frozen-quantizer contract: the cells table still holds the
    // version-0 codebook even though some codebook vectors were deleted
    // from the corpus by the curation wave
    assert(spark.table("graft_cat.default.ann_cells").count() == 16)
  }

  test("q281: the feed-maintained SQ-code index equals a from-scratch " +
      "requantization, per vector and per code array") {
    SparkEntry.queries("q281_ann_index_sq")(spark, sfDir).collect()
    val rebuilt = spark.sql("""
      SELECT vec_id, cell_id, amax,
             transform(embedding, x ->
               CAST(floor(CAST(x AS DOUBLE) * 127.0 / amax + 0.5d)
                 AS INT)) AS codes
      FROM (
        SELECT v.vec_id, v.embedding,
               aggregate(v.embedding, CAST(0.0 AS DOUBLE),
                 (a, x) -> greatest(a, abs(CAST(x AS DOUBLE)))) AS amax,
               max_by(c.cell_id, named_struct(
                 'cd', cosine_sim(v.embedding, c.cb_emb),
                 'nc', -c.cell_id)) AS cell_id
        FROM graft_cat.default.emb_sq v
        CROSS JOIN graft_cat.default.sq_cells c
        GROUP BY v.vec_id, v.embedding)""")
    val idx = spark.table("graft_cat.default.sq_idx")
    assert(idx.count() == rebuilt.count())
    assert(idx.exceptAll(rebuilt).count() == 0)
    assert(rebuilt.exceptAll(idx).count() == 0)
  }
}
