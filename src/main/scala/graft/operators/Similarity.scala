package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{HashExprs, SketchOracleSql, VectorFns, VectorOracleSql => V}

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Three paths, per the scale of the query side:
  *  - `bruteForceTopK`: exact top-k via a broadcast nested-loop join —
  *    correct baseline; right choice when |queries| is broadcast-sized
  *    (the corpus side streams, never materializes the cross product).
  *  - `lshTopK`: random-hyperplane LSH bucketing (banded, OR-amplified)
  *    prunes the candidate set before exact cosine re-ranking — the 100 TB
  *    path: one shuffle on (band, key), candidate lists bounded by bucket
  *    size instead of |corpus|.
  *  - `ivfTopK`: inverted-file index — corpus partitioned into Voronoi
  *    cells around broadcast centroids; queries probe only the `nProbe`
  *    nearest cells. The cell assignment IS the cluster partitioning, so
  *    at scale the corpus can be written bucketed by `centroid_id` and the
  *    probe join prunes to nProbe/|C| of the data.
  *
  * LSH follows Charikar's random-hyperplane scheme (STOC 2002); IVF is the
  * coarse-quantization structure of Jégou/Douze/Schmid ("Product
  * quantization for nearest neighbor search", TPAMI 2011) without the PQ
  * residual codes (exact vectors re-rank instead).
  */
object Similarity {

  /** Self-pair exclusion predicate shared by the three top-k paths.
    * ASSUMES queries and corpus share one id space (the fixture queries ARE
    * corpus rows); with an external query set whose ids coincidentally
    * collide with corpus ids, pass `excludeSelfPairs = false` or a real
    * neighbor is silently dropped. Null-safe: a null id on either side is a
    * distinct entity, not a self-pair. */
  private def notSelf(corpusId: String, queryId: String,
                      exclude: Boolean): Column =
    if (exclude) !(col(corpusId) <=> col(queryId)) else lit(true)

  /** Exact cosine top-k for each query vector. `queries` must be small
    * enough to broadcast. Output: (query_id, vec_id, score, rank). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     corpusId: String = "vec_id", corpusVec: String = "embedding",
                     queryId: String = "query_id", queryVec: String = "q_embedding",
                     excludeSelfPairs: Boolean = true): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .withColumn("score", VectorFns.cosine(col(corpusVec), col(queryVec)))
      .filter(notSelf(corpusId, queryId, excludeSelfPairs))
    val w = Window.partitionBy(col(queryId))
      .orderBy(col("score").desc, col(corpusId))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryId), col(corpusId), col("score"), col("rank"))
  }

  /** LSH-bucketed approximate top-k. Both sides are bucketed by banded
    * hyperplane signatures; candidates = pairs sharing >= 1 band key; exact
    * cosine re-rank inside candidates. Recall < 1 by design; raise `bands`
    * for higher recall at higher cost. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nPlanes: Int = 16, bands: Int = 4, dim: Int = 64,
              corpusId: String = "vec_id", corpusVec: String = "embedding",
              queryId: String = "query_id", queryVec: String = "q_embedding",
              excludeSelfPairs: Boolean = true): DataFrame = {
    val scored = lshScoredCandidates(corpus, queries, nPlanes, bands, dim,
      corpusId, corpusVec, queryId, queryVec, excludeSelfPairs)
    val w = Window.partitionBy(col(queryId))
      .orderBy(col("score").desc, col(corpusId))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryId), col(corpusId), col("score"), col("rank"))
  }

  /** Shared LSH front half: banded bucket join -> distinct id-only
    * candidate pairs -> vectors joined back -> exact cosine `score`.
    * [[lshTopK]] cuts by rank, [[rangeSearch]] by radius. */
  private def lshScoredCandidates(corpus: DataFrame, queries: DataFrame,
                                  nPlanes: Int, bands: Int, dim: Int,
                                  corpusId: String, corpusVec: String,
                                  queryId: String, queryVec: String,
                                  excludeSelfPairs: Boolean): DataFrame = {
    // dim MUST cover the embedding length: HyperplaneSig projects onto
    // min(|v|, |plane|) dimensions, so short planes silently degrade recall
    val planes = VectorFns.randomPlanes(nPlanes, dim)
    val bitsPerBand = nPlanes / bands
    // banded rows carry ids only; vectors join back per candidate pair
    val cb = VectorFns.lshBuckets(corpus, Seq(corpusId), corpusVec,
      planes, bands, bitsPerBand)
    val qb = VectorFns.lshBuckets(queries, Seq(queryId), queryVec,
      planes, bands, bitsPerBand)
    cb.join(qb, Seq("band", "key"))
      .filter(notSelf(corpusId, queryId, excludeSelfPairs))
      .select(col(queryId), col(corpusId)).distinct()
      .join(corpus.select(col(corpusId), col(corpusVec)), Seq(corpusId))
      .join(queries.select(col(queryId), col(queryVec)), Seq(queryId))
      .withColumn("score", VectorFns.cosine(col(corpusVec), col(queryVec)))
  }

  /** Radius (range) similarity search: every corpus vector within cosine
    * `tau` of each query, LSH-prefiltered. Same banded hyperplane buckets
    * as [[lshTopK]] — candidates are pairs sharing >= 1 band key, then the
    * exact cosine filter keeps `score >= tau`. Unlike top-k there is no
    * per-query result bound, so the output is candidate-bounded, not
    * k-bounded: at 100 TB the bucket join still carries ids only and the
    * radius filter runs before the (query, corpus) vectors are ever
    * materialized together beyond the candidate set. Recall < 1 by design
    * (a neighbor colliding in no band is unseen — the trade that avoids
    * the all-pairs cross product); raise `bands` for recall.
    * Output: (query_id, vec_id, score), score >= tau. */
  def rangeSearch(corpus: DataFrame, queries: DataFrame, tau: Double,
                  nPlanes: Int = 16, bands: Int = 4, dim: Int = 64,
                  corpusId: String = "vec_id", corpusVec: String = "embedding",
                  queryId: String = "query_id", queryVec: String = "q_embedding",
                  excludeSelfPairs: Boolean = true): DataFrame =
    lshScoredCandidates(corpus, queries, nPlanes, bands, dim,
      corpusId, corpusVec, queryId, queryVec, excludeSelfPairs)
      .filter(col("score") >= tau)
      .select(col(queryId), col(corpusId), col("score"))

  /** Fixed-size codebook: a uniform pseudo-random sample of `codebookSize`
    * corpus vectors, picked as the rows whose FNV-1a64 id-hash sorts lowest
    * (deterministic, seed-free, oracle-replicable). ORDER BY + LIMIT K
    * executes as TakeOrderedAndProject — O(N log K) narrow work, only K
    * rows ever leave the executors — so the codebook is CONSTANT-sized no
    * matter how large the corpus grows (the round-1 design derived
    * |centroids| = N/50 from `id % step`, which made the assignment
    * cross-join O(N^2/50) and the broadcast unbounded). */
  def sampledCodebook(corpus: DataFrame, codebookSize: Int,
                      corpusId: String = "vec_id",
                      corpusVec: String = "embedding",
                      denseIds: Boolean = false): DataFrame = {
    val picked = corpus
      .orderBy(HashExprs.fnv1a64Col(col(corpusId).cast("string")), col(corpusId))
      .limit(codebookSize)
    if (!denseIds)
      picked.select(col(corpusId).as("centroid_id"), col(corpusVec).as("c_vec"))
    else
      // dense 0..k-1 centroid ids (same (hash, id) sample order): what lets
      // PQ store codes as genuine small integers (k<=256 -> one byte per
      // subspace) instead of arbitrary 64-bit source ids. The global window
      // runs over the already-LIMITed k rows — driver-scale by contract.
      picked
        .select(col(corpusId), col(corpusVec),
          HashExprs.fnv1a64Col(col(corpusId).cast("string")).as("__h"))
        .withColumn("centroid_id",
          row_number().over(Window.orderBy(col("__h"), col(corpusId))) - 1)
        .select(col("centroid_id"), col(corpusVec).as("c_vec"))
  }

  /** Nearest-centroid assignment (n=1 argmax): max_by aggregates map-side,
    * so the shuffle carries |corpus| rows — a window over the corpus x
    * cents product would shuffle |centroids| times more. Tie-break mirrors
    * (score DESC, centroid_id ASC) via lexicographic (score, -id) max. */
  private[operators] def assignToCells(corpus: DataFrame, cents: DataFrame,
                                       corpusId: String,
                                       corpusVec: String): DataFrame =
    corpus.crossJoin(broadcast(cents))
      .withColumn("c_score", VectorFns.cosine(col(corpusVec), col("c_vec")))
      .groupBy(col(corpusId))
      .agg(max_by(struct(col("centroid_id"), col(corpusVec).as("__v")),
        struct(col("c_score"), (-col("centroid_id")).as("__neg"))).as("__best"))
      .select(col(corpusId), col("__best.centroid_id").as("centroid_id"),
        col("__best.__v").as(corpusVec))

  /** Query-side probes: each query's `nProbe` nearest cells (window — the
    * query side is small). private[graft]: ScaleSpec re-derives the probed
    * cell set to assert the index scan's partition pruning. */
  private[graft] def probeCells(queries: DataFrame, cents: DataFrame, nProbe: Int,
                                queryId: String, queryVec: String): DataFrame =
    queries.crossJoin(broadcast(cents))
      .withColumn("c_score", VectorFns.cosine(col(queryVec), col("c_vec")))
      .withColumn("c_rank", row_number().over(Window.partitionBy(col(queryId))
        .orderBy(col("c_score").desc, col("centroid_id"))))
      .filter(col("c_rank") <= nProbe)
      .drop("c_vec", "c_score", "c_rank")

  /** Exact cosine re-rank of (assigned cells x probes) to top-k. */
  private def rerankTopK(cellCorpus: DataFrame, probes: DataFrame, k: Int,
                         corpusId: String, corpusVec: String,
                         queryId: String, queryVec: String,
                         excludeSelfPairs: Boolean): DataFrame = {
    val w = Window.partitionBy(col(queryId))
      .orderBy(col("score").desc, col(corpusId))
    cellCorpus.join(probes, Seq("centroid_id"))
      .filter(notSelf(corpusId, queryId, excludeSelfPairs))
      .withColumn("score", VectorFns.cosine(col(corpusVec), col(queryVec)))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryId), col(corpusId), col("score"), col("rank"))
  }

  /** IVF (inverted-file) approximate top-k. Centroids are a fixed-K sampled
    * codebook (see [[sampledCodebook]]; a k-means refinement would reuse the
    * same structure); the coarse quantization is the real thing: every
    * corpus vector is assigned to its nearest centroid (broadcast
    * nested-loop, narrow, O(N*K) with K constant), queries probe the
    * `nProbe` nearest cells, and the exact re-rank touches only those
    * cells' vectors. At scale, materialize [[writeIvfIndex]] once and probe
    * with [[ivfTopKIndexed]] — the probe then READS only nProbe/K of the
    * corpus via partition pruning. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              codebookSize: Int = 16, nProbe: Int = 2,
              corpusId: String = "vec_id", corpusVec: String = "embedding",
              queryId: String = "query_id", queryVec: String = "q_embedding",
              excludeSelfPairs: Boolean = true): DataFrame = {
    val cents = sampledCodebook(corpus, codebookSize, corpusId, corpusVec)
    val assigned = assignToCells(corpus, cents, corpusId, corpusVec)
    val probes = probeCells(queries, cents, nProbe, queryId, queryVec)
    rerankTopK(assigned, probes, k, corpusId, corpusVec, queryId, queryVec,
      excludeSelfPairs)
  }

  /** Radius search over the IVF structure — the indexed twin of
    * [[rangeSearch]], completing the serving matrix (top-k and radius
    * both exist on the LSH and the IVF paths): queries probe their
    * `nProbe` nearest cells and the exact cosine filter keeps
    * `score >= tau` inside those cells only. Recall is bounded by cell
    * probing exactly as in [[ivfTopK]]; against a MATERIALIZED index the
    * same probe reads nProbe/K of the data via partition pruning. */
  def ivfRangeSearch(corpus: DataFrame, queries: DataFrame, tau: Double,
                     codebookSize: Int = 16, nProbe: Int = 2,
                     corpusId: String = "vec_id",
                     corpusVec: String = "embedding",
                     queryId: String = "query_id",
                     queryVec: String = "q_embedding",
                     excludeSelfPairs: Boolean = true): DataFrame = {
    val cents = sampledCodebook(corpus, codebookSize, corpusId, corpusVec)
    val assigned = assignToCells(corpus, cents, corpusId, corpusVec)
    val probes = probeCells(queries, cents, nProbe, queryId, queryVec)
    assigned.join(probes, Seq("centroid_id"))
      .filter(notSelf(corpusId, queryId, excludeSelfPairs))
      .withColumn("score", VectorFns.cosine(col(corpusVec), col(queryVec)))
      .filter(col("score") >= tau)
      .select(col(queryId), col(corpusId), col("score"))
  }

  /** Materialize the IVF index: the assigned corpus written PARTITIONED by
    * `centroid_id` (bounded files per cell, same layout discipline as
    * [[graft.sources.Sinks.writeFactPartitioned]]). Returns the codebook —
    * persist it next to the index; probing with a REGENERATED codebook from
    * a changed corpus would silently probe wrong cells. */
  def writeIvfIndex(corpus: DataFrame, path: String, codebookSize: Int = 16,
                    corpusId: String = "vec_id",
                    corpusVec: String = "embedding",
                    filesPerCell: Int = 4): DataFrame = {
    val cents = sampledCodebook(corpus, codebookSize, corpusId, corpusVec)
    assignToCells(corpus, cents, corpusId, corpusVec)
      .repartition(col("centroid_id"),
        pmod(spark_partition_id(), lit(filesPerCell)))
      .write.mode("overwrite").partitionBy("centroid_id").parquet(path)
    cents
  }

  /** APPEND a new vector batch to a materialized IVF index — the ANN twin
    * of the MinHash band-index append discipline (`s_minhash_index_append`
    * / the NearDupStream store): assign the batch against the EXISTING
    * codebook and write into the same cell-partitioned layout (`append`
    * mode — new files join each cell's directory; no rewrite, no
    * re-clustering). The codebook is the index's IDENTITY and is never
    * re-sampled on append — probe results then equal a full rebuild over
    * (corpus ∪ batch) with the same codebook, which is exactly what the
    * `ann_ivf_append` oracle restates. Distribution drift (cells growing
    * imbalanced as new data shifts) is an offline re-clustering concern —
    * rebuild codebook + re-assign, the compaction of this index — and
    * until then every probe stays correct w.r.t. the index's own
    * codebook. */
  def appendIvfIndex(batch: DataFrame, cents: DataFrame, path: String,
                     corpusId: String = "vec_id",
                     corpusVec: String = "embedding",
                     filesPerCell: Int = 4): Unit = {
    assignToCells(batch, cents, corpusId, corpusVec)
      .repartition(col("centroid_id"),
        pmod(spark_partition_id(), lit(filesPerCell)))
      .write.mode("append").partitionBy("centroid_id").parquet(path)
    ()
  }

  /** Probe a materialized IVF index: only the probed cells' DIRECTORIES are
    * read (static partition pruning via the collected cell set — ScaleSpec
    * asserts PartitionFilters and the scanned file list). The collected
    * cell ids are bounded by |queries| * nProbe; for a query side too big
    * to collect, join on centroid_id instead and let dynamic partition
    * pruning do the same cut. */
  def ivfTopKIndexed(indexPath: String, cents: DataFrame, queries: DataFrame,
                     k: Int, nProbe: Int = 2,
                     corpusId: String = "vec_id",
                     corpusVec: String = "embedding",
                     queryId: String = "query_id",
                     queryVec: String = "q_embedding",
                     excludeSelfPairs: Boolean = true): DataFrame = {
    val spark = queries.sparkSession
    val probes = probeCells(queries, cents, nProbe, queryId, queryVec)
    val cells = probes.select(col("centroid_id")).distinct()
      .collect().map(_.get(0)).toSeq
    val cellCorpus = spark.read.parquet(indexPath)
      .where(col("centroid_id").isin(cells: _*))
    rerankTopK(cellCorpus, probes, k, corpusId, corpusVec, queryId, queryVec,
      excludeSelfPairs)
  }

  // ---------------------------------------------------------------- oracles

  /** DuckDB mirror of `bruteForceTopK` over the `embeddings` fixture
    * (queries = vec_id < 10) — bit-exact, see [[graft.functions.VectorOracleSql]]. */
  /** Contrastive-training triplet mining (the ANCE-style hard-negative
    * selection — Xiong et al., "Approximate Nearest Neighbor Negative
    * Contrastive Learning for Dense Text Retrieval", ICLR 2021): for each
    * query, the top-1 SAME-label neighbor is the positive and the top-1
    * DIFFERENT-label neighbor the hard negative — the nearest wrong
    * answer is the most informative gradient. Output one row per query:
    * `(query_id, positive_id, pos_score, negative_id, neg_score,
    * margin)`; queries whose label class has no other member emit a null
    * positive rather than vanishing (total, like [[TextClassifier
    * .scoreWith]]). `margin` subtracts two engine-identical doubles —
    * exact.
    *
    * Scale: the scored candidate frame here is the broadcast nested-loop
    * baseline ([[bruteForceTopK]]'s contract — queries broadcast-sized);
    * at corpus scale swap [[lshScoredCandidates]]/[[ivfTopK]]'s probed
    * frame in front of the same dual-rank tail, which is one window over
    * candidates bounded per query. */
  def hardNegativeTriplets(corpus: DataFrame, queries: DataFrame,
                           corpusId: String = "vec_id",
                           corpusVec: String = "embedding",
                           labelCol: String = "label",
                           queryId: String = "query_id",
                           queryVec: String = "q_embedding",
                           queryLabel: String = "q_label"): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .withColumn("score", VectorFns.cosine(col(corpusVec), col(queryVec)))
      .filter(notSelf(corpusId, queryId, exclude = true))
      .withColumn("__same", col(labelCol) <=> col(queryLabel))
    val w = Window.partitionBy(col(queryId), col("__same"))
      .orderBy(col("score").desc, col(corpusId))
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .groupBy(col(queryId))
      .agg(
        max(when(col("__same"), col(corpusId))).as("positive_id"),
        max(when(col("__same"), col("score"))).as("pos_score"),
        max(when(!col("__same"), col(corpusId))).as("negative_id"),
        max(when(!col("__same"), col("score"))).as("neg_score"))
      .withColumn("margin", col("pos_score") - col("neg_score"))
  }

  /** DuckDB mirror of [[hardNegativeTriplets]] over the embeddings
    * fixture with the `vec_id < 10` query slice. */
  def hardNegOracleSql(): String =
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb, label AS q_label
       |           FROM embeddings WHERE vec_id < 10),
       |scored AS (
       |  SELECT q.query_id, e.vec_id, e.label IS NOT DISTINCT FROM q.q_label AS same,
       |    ${V.cosine("e.embedding", "q.q_emb")} AS score
       |  FROM embeddings e CROSS JOIN q
       |  WHERE e.vec_id <> q.query_id
       |), best AS (
       |  SELECT * FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id, same
       |      ORDER BY score DESC, vec_id) AS rn
       |    FROM scored) WHERE rn = 1
       |)
       |SELECT query_id,
       |  MAX(CASE WHEN same THEN vec_id END) AS positive_id,
       |  MAX(CASE WHEN same THEN score END) AS pos_score,
       |  MAX(CASE WHEN NOT same THEN vec_id END) AS negative_id,
       |  MAX(CASE WHEN NOT same THEN score END) AS neg_score,
       |  MAX(CASE WHEN same THEN score END)
       |    - MAX(CASE WHEN NOT same THEN score END) AS margin
       |FROM best GROUP BY query_id
       |ORDER BY query_id""".stripMargin

  /** DuckDB mirror of the `embed_matryoshka_recall` gate: the full-dim
    * brute top-k is the truth; each truncated tier re-ranks under the
    * SAME cosine fold restricted to the first `d` elements (exactly the
    * engine's slice), and recall@k joins back per query. */
  def matryoshkaOracleSql(k: Int = 5,
                          dims: Seq[Int] = Seq(64, 32, 16)): String = {
    def topCte(name: String, d: Int): String =
      s"""$name AS (
         |  SELECT query_id, vec_id FROM (
         |    SELECT q.query_id, e.vec_id,
         |      ROW_NUMBER() OVER (PARTITION BY q.query_id
         |        ORDER BY ${V.cosine("e.embedding", "q.q_emb", d)} DESC,
         |          e.vec_id) AS rank
         |    FROM embeddings e CROSS JOIN q
         |    WHERE e.vec_id <> q.query_id
         |  ) WHERE rank <= $k
         |)""".stripMargin
    val tierCtes = dims.map(d => topCte(s"top_$d", d) +
      s""", hits_$d AS (
         |  SELECT t.query_id, CAST(COUNT(*) AS BIGINT) AS n_hits
         |  FROM truth t JOIN top_$d a USING (query_id, vec_id)
         |  GROUP BY t.query_id
         |)""".stripMargin).mkString(",\n")
    val branches = dims.map(d =>
      s"""SELECT CAST($d AS BIGINT) AS dims, q.query_id,
         |  CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
         |  CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / $k.0 AS recall_at_$k
         |FROM (SELECT vec_id AS query_id FROM embeddings WHERE vec_id < 10) q
         |LEFT JOIN hits_$d h USING (query_id)""".stripMargin)
      .mkString("\n  UNION ALL ")
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb
       |           FROM embeddings WHERE vec_id < 10),
       |${topCte("truth", 64)},
       |$tierCtes
       |SELECT * FROM (
       |  $branches
       |) ORDER BY dims DESC, query_id""".stripMargin
  }

  def bruteOracleSql(k: Int = 5): String =
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings WHERE vec_id < 10),
       |scored AS (
       |  SELECT q.query_id, e.vec_id, ${V.cosine("e.embedding", "q.q_emb")} AS score
       |  FROM embeddings e CROSS JOIN q
       |  WHERE e.vec_id <> q.query_id
       |)
       |SELECT query_id, vec_id, score, rank FROM (
       |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS INTEGER) AS rank
       |  FROM scored) WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin

  /** Shared oracle front half mirroring [[lshScoredCandidates]]: the
    * fixture corpus/query CTEs, hyperplane signatures, banded bucket
    * join, and the distinct `cand(query_id, vec_id)` pair set. */
  private def lshCandCtes(nPlanes: Int, bands: Int): String = {
    val planes = VectorFns.randomPlanes(nPlanes, 64)
    val bitsPerBand = nPlanes / bands
    val mask = (1L << bitsPerBand) - 1
    val bandVals = (0 until bands).map(b => s"($b)").mkString("(VALUES ", ", ", ")")
    s"""corpus AS (SELECT vec_id, embedding FROM embeddings),
       |q AS (SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings WHERE vec_id < 10),
       |${V.sigCtes("corpus", "vec_id", "embedding", planes)},
       |${V.sigCtes("q", "query_id", "q_emb", planes)},
       |cb AS (
       |  SELECT s.id AS vec_id, b.band, (sig >> (b.band * $bitsPerBand)) & $mask AS key
       |  FROM __sigs_corpus s CROSS JOIN $bandVals AS b(band)
       |), qb AS (
       |  SELECT s.id AS query_id, b.band, (sig >> (b.band * $bitsPerBand)) & $mask AS key
       |  FROM __sigs_q s CROSS JOIN $bandVals AS b(band)
       |), cand AS (
       |  SELECT DISTINCT qb.query_id, cb.vec_id
       |  FROM cb JOIN qb ON cb.band = qb.band AND cb.key = qb.key
       |  WHERE cb.vec_id <> qb.query_id
       |)""".stripMargin
  }

  /** DuckDB mirror of `lshTopK` (nPlanes=16, bands=4) over the fixture. */
  def lshOracleSql(k: Int = 5, nPlanes: Int = 16, bands: Int = 4): String =
    s"""WITH ${lshCandCtes(nPlanes, bands)},
       |scored AS (
       |  SELECT c.query_id, c.vec_id, ${V.cosine("e.embedding", "q.q_emb")} AS score
       |  FROM cand c JOIN corpus e ON e.vec_id = c.vec_id JOIN q ON q.query_id = c.query_id
       |)
       |SELECT query_id, vec_id, score, rank FROM (
       |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS INTEGER) AS rank
       |  FROM scored) WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin

  /** DuckDB mirror of `rangeSearch` (nPlanes=16, bands=4) over the
    * fixture — the same banded buckets, then the radius filter instead of
    * a rank cut. */
  def rangeOracleSql(tau: Double, nPlanes: Int = 16,
                     bands: Int = 4): String =
    s"""WITH ${lshCandCtes(nPlanes, bands)}
       |SELECT c.query_id, c.vec_id, ${V.cosine("e.embedding", "q.q_emb")} AS score
       |FROM cand c JOIN corpus e ON e.vec_id = c.vec_id JOIN q ON q.query_id = c.query_id
       |WHERE ${V.cosine("e.embedding", "q.q_emb")} >= $tau
       |ORDER BY c.query_id, c.vec_id""".stripMargin

  /** DuckDB mirror of `ivfTopK` (codebookSize=16, nProbe=2) over the
    * fixture. The codebook rank restates the FNV-1a64 id-hash sample
    * ([[SketchOracleSql.fnvFold]], signed-long ordering like Spark's). */
  def ivfOracleSql(k: Int = 5, codebookSize: Int = 16, nProbe: Int = 2): String =
    s"""WITH ${ivfScoredCtes(codebookSize, nProbe)}
       |SELECT query_id, vec_id, score, rank FROM (
       |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS INTEGER) AS rank
       |  FROM scored) WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin

  /** Oracle for `ann_ivf_append`: probing an index built on the
    * `vec_id % 3 <> 0` subset then APPENDED with the `% 3 == 0` batch
    * must equal a rebuild over the full corpus with the SUBSET-sampled
    * codebook — so the restatement is [[ivfOracleSql]] with only the
    * codebook-sampling CTE filtered to the prior subset (assignment,
    * probes and re-rank run over everything). */
  def ivfAppendOracleSql(k: Int = 5, codebookSize: Int = 16,
                         nProbe: Int = 2, mod: Int = 3): String =
    s"""WITH ${ivfScoredCtes(codebookSize, nProbe,
         s" WHERE vec_id % $mod <> 0")}
       |SELECT query_id, vec_id, score, rank FROM (
       |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS INTEGER) AS rank
       |  FROM scored) WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin

  /** DuckDB mirror of `ivfRangeSearch` (codebookSize=16, nProbe=2) — the
    * same probed-cell scoring with the radius cut instead of a rank. */
  def ivfRangeOracleSql(tau: Double, codebookSize: Int = 16,
                        nProbe: Int = 2): String =
    s"""WITH ${ivfScoredCtes(codebookSize, nProbe)}
       |SELECT query_id, vec_id, score FROM scored
       |WHERE score >= $tau
       |ORDER BY query_id, vec_id""".stripMargin

  /** Shared IVF oracle front half mirroring codebook -> assignment ->
    * probes -> exact `scored(query_id, vec_id, score)` over probed
    * cells. */
  private def ivfScoredCtes(codebookSize: Int, nProbe: Int,
                            centWhere: String = ""): String = {
    val idHash = SketchOracleSql.fnvFold("CAST(vec_id AS VARCHAR)")
    s"""corpus AS (SELECT vec_id, embedding FROM embeddings),
       |q AS (SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings WHERE vec_id < 10),
       |idh AS (
       |  SELECT vec_id, embedding,
       |    CAST(CASE WHEN u >= CAST('9223372036854775808' AS HUGEINT)
       |         THEN u - CAST('18446744073709551616' AS HUGEINT) ELSE u END AS BIGINT) AS h
       |  FROM (SELECT vec_id, embedding, $idHash AS u FROM corpus$centWhere)
       |),
       |cents AS (
       |  SELECT vec_id AS centroid_id, embedding AS c_vec FROM (
       |    SELECT vec_id, embedding, ROW_NUMBER() OVER (ORDER BY h, vec_id) AS rn FROM idh
       |  ) WHERE rn <= $codebookSize
       |),
       |assigned AS (
       |  SELECT vec_id, embedding, centroid_id FROM (
       |    SELECT e.vec_id, e.embedding, c.centroid_id,
       |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${V.cosine("e.embedding", "c.c_vec")} DESC, c.centroid_id) AS c_rank
       |    FROM corpus e CROSS JOIN cents c) WHERE c_rank = 1
       |), probes AS (
       |  SELECT query_id, q_emb, centroid_id FROM (
       |    SELECT q.query_id, q.q_emb, c.centroid_id,
       |      ROW_NUMBER() OVER (PARTITION BY q.query_id
       |        ORDER BY ${V.cosine("q.q_emb", "c.c_vec")} DESC, c.centroid_id) AS c_rank
       |    FROM q CROSS JOIN cents c) WHERE c_rank <= $nProbe
       |), scored AS (
       |  SELECT p.query_id, a.vec_id, ${V.cosine("a.embedding", "p.q_emb")} AS score
       |  FROM assigned a JOIN probes p USING (centroid_id)
       |  WHERE a.vec_id <> p.query_id
       |)""".stripMargin
  }
}
