package graft.functions

/** DuckDB-SQL generators that mirror [[VectorExprs]] bit-for-bit.
  *
  * The driver's correctness gate hash-compares Spark results against DuckDB
  * running `SparkEntry.oracleSql`. Doubles only hash-match if every
  * floating-point operation happens in the same order on both engines, so
  * these fragments replicate the exact evaluation of the native expressions:
  *  - `DotProduct`/`CosineSim` are sequential left-to-right folds starting
  *    at 0.0 — `list_reduce` is a left fold starting at the first element,
  *    and IEEE `0.0 + x == x`, so the sums are identical;
  *  - `HyperplaneSig` compares each sequential plane-dot to 0 and sets bit
  *    `p` — reproduced with the plane matrix embedded as literal DOUBLE
  *    lists (Double.toString round-trips exactly through DuckDB's strtod).
  */
object VectorOracleSql {

  /** Sequential-fold dot product of two vector expressions. */
  def dot(a: String, b: String, dim: Int = 64): String =
    s"list_reduce(list_transform(range(1, ${dim + 1}), " +
      s"i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x, y) -> x + y)"

  /** CosineSim analog: dot / (sqrt(norm_a) * sqrt(norm_b)). */
  def cosine(a: String, b: String, dim: Int = 64): String =
    s"(${dot(a, b, dim)} / (sqrt(${dot(a, a, dim)}) * sqrt(${dot(b, b, dim)})))"

  /** [[graft.functions.VectorFns.l2DistSq]] analog: left-fold sum of
    * squared element differences. The engine folds `(0.0 + e1) + e2 ...`;
    * the init-free list_reduce folds `(e1 + e2) + ...` — identical because
    * `0.0 + e1 == e1` in IEEE for the non-negative squares. */
  def l2sq(a: String, b: String, dim: Int = 64): String =
    s"list_reduce(list_transform(range(1, ${dim + 1}), " +
      s"i -> (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE)) * " +
      s"(CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE))), (x, y) -> x + y)"

  /** Unrolled power-iteration oracle for `embed_pca_power`
    * ([[graft.operators.VectorAgg.pcaPowerTop]]): per-round CTEs restate
    * the identical covariance action — sequential-fold dots, DECIMAL(18,6)
    * carrier for every aggregation, the same a/n − m·t̄ operation tree —
    * so loadings hash-match bit-for-bit at a fixed round count. */
  def pcaPowerSql(iters: Int = 3, dim: Int = 64): String =
    s"""WITH ${pcaCtes(iters, dim)}
       |SELECT i - 1 AS dim, CAST(v[i] AS DOUBLE) AS loading
       |FROM v$iters, unnest(range(1, ${dim + 1})) AS r(i)
       |ORDER BY dim""".stripMargin

  /** Oracle for `embed_pca_project`: the same unrolled training chain,
    * finished by the per-vector sequential-fold projection onto the
    * learned component. */
  def pcaProjectSql(iters: Int = 3, dim: Int = 64): String =
    s"""WITH ${pcaCtes(iters, dim)}
       |SELECT c.vec_id, ${dot("c.x", "vr.v", dim)} AS pc1
       |FROM clean c CROSS JOIN v$iters vr
       |ORDER BY c.vec_id""".stripMargin

  private def pcaCtes(iters: Int, dim: Int): String = {
    val d1 = dim + 1
    def decSum(e: String) = s"CAST(SUM(CAST($e AS DECIMAL(18,6))) AS DOUBLE)"
    val rounds = (0 until iters).map { r =>
      s"""s$r AS (
         |  SELECT c.x, ${dot("c.x", "vr.v", dim)} AS s
         |  FROM clean c CROSS JOIN v$r vr
         |), muv$r AS (
         |  SELECT ${dot("ma.mu", "vr.v", dim)} AS muv
         |  FROM muarr ma CROSS JOIN v$r vr
         |), st$r AS (
         |  SELECT s.x, s.s - m.muv AS t FROM s$r s CROSS JOIN muv$r m
         |), tbar$r AS (
         |  SELECT ${decSum("t")} / (SELECT n FROM nrel) AS tbar FROM st$r
         |), pd$r AS (
         |  SELECT i - 1 AS dim, ${decSum("CAST(x[i] AS DOUBLE) * t")} AS sxt
         |  FROM st$r, unnest(range(1, $d1)) AS r(i) GROUP BY i
         |), w$r AS (
         |  SELECT p.dim,
         |    p.sxt / (SELECT n FROM nrel)
         |      - mu.m * (SELECT tbar FROM tbar$r) AS w
         |  FROM pd$r p JOIN mu ON mu.dim = p.dim
         |), nrm$r AS (
         |  SELECT sqrt(${decSum("w * w")}) AS nrm FROM w$r
         |), v${r + 1} AS (
         |  SELECT list(w / (SELECT nrm FROM nrm$r) ORDER BY dim) AS v
         |  FROM w$r
         |)""".stripMargin
    }.mkString(",\n")
    s"""clean AS (
       |  SELECT vec_id, list_transform(embedding, e -> CAST(e AS DOUBLE)) AS x
       |  FROM embeddings WHERE embedding IS NOT NULL
       |), xp AS (
       |  SELECT i - 1 AS dim, CAST(x[i] AS DOUBLE) AS val
       |  FROM clean, unnest(range(1, $d1)) AS r(i)
       |), mu AS (
       |  SELECT dim, ${decSum("val")} / COUNT(*) AS m
       |  FROM xp GROUP BY dim
       |), nrel AS (
       |  SELECT COUNT(*) AS n FROM clean
       |), muarr AS (
       |  SELECT list(m ORDER BY dim) AS mu FROM mu
       |), v0 AS (
       |  SELECT list_transform(range(1, $d1), i -> 0.125) AS v
       |),
       |$rounds""".stripMargin
  }

  /** Unrolled Lloyd's k-means oracle: `iters` rounds of (L2-argmin
    * assignment → decimal-carrier per-dim means) from the deterministic
    * FNV-sampled codebook — the SQL mirror of
    * [[graft.operators.VectorAgg.kmeansLloyd]] at a fixed iteration count.
    * Each round's CTE trio (asg/pd/cents) restates exactly what the engine
    * computes: ROW_NUMBER (distance, centroid_id) = min_by tie-break, and
    * means as CAST(SUM(DECIMAL(18,6)) AS DOUBLE)/COUNT — so a fixpoint
    * reached early on the engine side still hash-matches (extra oracle
    * rounds are no-ops by definition of a fixpoint). Output is the last
    * round's per-dim scalar rows `(centroid_id, n_assigned, dim, m)`. */
  /** The shared Lloyd CTE chain (`corpus` → `cents0` seeds → per-round
    * asg/pd/cents trios) — the WITH body both [[kmeansLloydSql]] and
    * [[semanticRepsSql]] build their finals on. */
  private def lloydCtes(k: Int, iters: Int, dim: Int): String = {
    require(iters >= 1)
    val idHash = SketchOracleSql.fnvFold("CAST(vec_id AS VARCHAR)")
    val rounds = (1 to iters).map { r =>
      val prev = s"cents${r - 1}"
      s"""asg$r AS (
         |  SELECT centroid_id, embedding FROM (
         |    SELECT e.embedding, c.centroid_id,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${l2sq("e.embedding", "c.c_vec", dim)}, c.centroid_id) AS r
         |    FROM corpus e CROSS JOIN $prev c) WHERE r = 1
         |), pd$r AS (
         |  SELECT centroid_id, d.dim AS dim,
         |    CAST(SUM(CAST(CAST(embedding[d.dim + 1] AS DOUBLE) AS DECIMAL(18,6))) AS DOUBLE)
         |      / COUNT(*) AS m,
         |    COUNT(*) AS n
         |  FROM asg$r CROSS JOIN (SELECT unnest(range(0, $dim)) AS dim) d
         |  GROUP BY centroid_id, d.dim
         |), cents$r AS (
         |  SELECT centroid_id, list(m ORDER BY dim) AS c_vec FROM pd$r GROUP BY centroid_id
         |)""".stripMargin
    }.mkString(", ")
    s"""corpus AS (
       |  SELECT vec_id, embedding FROM embeddings WHERE embedding IS NOT NULL
       |), idh AS (
       |  SELECT vec_id, embedding,
       |    CAST(CASE WHEN u >= CAST('9223372036854775808' AS HUGEINT)
       |         THEN u - CAST('18446744073709551616' AS HUGEINT) ELSE u END AS BIGINT) AS h
       |  FROM (SELECT vec_id, embedding, $idHash AS u FROM corpus)
       |), cents0 AS (
       |  SELECT vec_id AS centroid_id, embedding AS c_vec FROM (
       |    SELECT vec_id, embedding, ROW_NUMBER() OVER (ORDER BY h, vec_id) AS rn FROM idh
       |  ) WHERE rn <= $k
       |), $rounds""".stripMargin
  }

  def kmeansLloydSql(k: Int, iters: Int, dim: Int = 64): String =
    s"""WITH ${lloydCtes(k, iters, dim)}
       |SELECT centroid_id, n AS n_assigned, CAST(dim AS INTEGER) AS dim, m
       |FROM pd$iters
       |ORDER BY centroid_id, dim""".stripMargin

  /** Oracle for `kmeans_db_index`: the same Lloyd rounds, final-centroid
    * assignment, per-cluster mean distance (per-row sqrt quantized
    * through the decimal carrier, then an exact sum), k×k centroid
    * separations, and the Davies-Bouldin per-cluster component
    * `max_{j≠i} (s_i + s_j) / d_ij`. */
  def dbIndexSql(k: Int, iters: Int, dim: Int = 64): String =
    s"""WITH ${lloydCtes(k, iters, dim)},
       |fin AS (SELECT centroid_id, c_vec FROM cents$iters),
       |asgD AS (
       |  SELECT vec_id, centroid_id, d2 FROM (
       |    SELECT vec_id, centroid_id, d2,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id
       |        ORDER BY d2, centroid_id) AS r
       |    FROM (SELECT e.vec_id, c.centroid_id,
       |            ${l2sq("e.embedding", "c.c_vec", dim)} AS d2
       |          FROM corpus e CROSS JOIN fin c)) WHERE r = 1
       |), sc AS (
       |  SELECT centroid_id, COUNT(*) AS n_assigned,
       |    CAST(SUM(CAST(sqrt(d2) AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
       |      AS si
       |  FROM asgD GROUP BY 1
       |), dsep AS (
       |  SELECT a.centroid_id AS i, b.centroid_id AS j,
       |    sqrt(${l2sq("a.c_vec", "b.c_vec", dim)}) AS dij
       |  FROM fin a CROSS JOIN fin b WHERE a.centroid_id <> b.centroid_id
       |)
       |SELECT d.i AS centroid_id, s1.n_assigned, s1.si AS scatter,
       |  MAX((s1.si + s2.si) / d.dij) AS db_component
       |FROM dsep d
       |JOIN sc s1 ON d.i = s1.centroid_id
       |JOIN sc s2 ON d.j = s2.centroid_id
       |GROUP BY 1, 2, 3 ORDER BY centroid_id""".stripMargin

  /** Oracle for `dedup_semantic`: the same Lloyd rounds, then each vector
    * assigned to its final centroid and each cluster reduced to the vector
    * CLOSEST to the centroid (tie on vec_id) — ROW_NUMBER restating the
    * engine's min_by tiebreaks at both levels. */
  def semanticRepsSql(k: Int, iters: Int, dim: Int = 64): String =
    s"""WITH ${lloydCtes(k, iters, dim)},
       |asgF AS (
       |  SELECT vec_id, centroid_id, dist FROM (
       |    SELECT e.vec_id, c.centroid_id,
       |      ${l2sq("e.embedding", "c.c_vec", dim)} AS dist,
       |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${l2sq("e.embedding", "c.c_vec", dim)}, c.centroid_id) AS r
       |    FROM corpus e CROSS JOIN cents$iters c) WHERE r = 1
       |)
       |SELECT centroid_id, vec_id AS rep_vec_id, ROUND(dist, 6) AS dist
       |FROM (
       |  SELECT centroid_id, vec_id, dist,
       |    ROW_NUMBER() OVER (PARTITION BY centroid_id
       |                       ORDER BY dist, vec_id) AS rr
       |  FROM asgF) WHERE rr = 1
       |ORDER BY centroid_id""".stripMargin

  /** `(idx, plane)` VALUES rows with the plane matrix as literal lists.
    * Fine when only COMPARISONS against the planes matter (hyperplane
    * signs): DuckDB types bare decimal literals as DECIMAL, which
    * round-trips the matrix off by an ulp — sign-invariant, but NOT
    * value-exact. Use [[planesValuesDouble]] when projected VALUES are
    * compared. */
  def planesValues(planes: Seq[Seq[Double]]): String =
    planes.zipWithIndex
      .map { case (p, i) => s"($i, [${p.mkString(", ")}])" }
      .mkString("(VALUES ", ", ", ")")

  /** [[planesValues]] with every element forced through a VARCHAR->DOUBLE
    * cast: the string parse is correctly rounded, so the oracle's matrix
    * is bit-identical to the engine's `lit(double)` values (measured: the
    * bare-literal DECIMAL detour shifted projections by ~1 ulp per
    * element, failing the embed_project hash). */
  def planesValuesDouble(planes: Seq[Seq[Double]]): String =
    planes.zipWithIndex
      .map { case (p, i) =>
        s"($i, [${p.map(v => s"CAST('$v' AS DOUBLE)").mkString(", ")}])"
      }
      .mkString("(VALUES ", ", ", ")")

  /** CTE pair `__pd` / `__sigs(id, sig)`: HyperplaneSig over relation
    * `rel(idCol, vecCol)` with the given literal planes. COALESCE mirrors
    * the expression's null-element rule (a null element contributes 0 to
    * the projection, it does not null the signature). */
  def sigCtes(rel: String, idCol: String, vecCol: String,
              planes: Seq[Seq[Double]], dim: Int = 64): String = {
    val planeDot = s"list_reduce(list_transform(range(1, ${dim + 1}), " +
      s"i -> COALESCE(CAST(s.$vecCol[i] AS DOUBLE) * p.plane[i], 0.0)), (x, y) -> x + y)"
    s"""__pd_$rel AS (
       |  SELECT s.$idCol AS id, p.idx, $planeDot AS d
       |  FROM $rel s CROSS JOIN ${planesValues(planes)} AS p(idx, plane)
       |), __sigs_$rel AS (
       |  SELECT id, SUM(CASE WHEN d >= 0 THEN (CAST(1 AS BIGINT) << idx) ELSE CAST(0 AS BIGINT) END) AS sig
       |  FROM __pd_$rel GROUP BY id
       |)""".stripMargin
  }

  // ---------------------------------------------------------------- PQ ---

  /** Subvector `s` of `d` dims from a list expression (1-based source). */
  private def svec(e: String, s: Int, d: Int): String =
    s"list_transform(range(1, ${d + 1}), i -> $e[${s * d} + i])"

  /** Shared PQ CTE block mirroring [[graft.operators.Pq.train]] +
    * [[graft.operators.Pq.encode]]: FNV-sampled seeds, per-subspace sliced
    * corpora, `iters` unrolled Lloyd rounds per subspace (same
    * ROW_NUMBER (distance, centroid_id) argmin and decimal-carrier means as
    * [[kmeansLloydSql]]), and per-subspace code assignment. Yields CTEs
    * `cents${"$"}{iters}_s` and a union-able `encode_s` per subspace, plus
    * a `trainset` CTE (idh rows filtered by `trainWhere` when non-empty —
    * the [[graft.operators.Pq.trainSample]] mirror): seeds and training
    * rounds read `trainset`, code assignment reads the full corpus. */
  private def pqCtes(m: Int, k: Int, iters: Int, dim: Int,
                     trainWhere: String = ""): String = {
    require(m >= 1 && dim % m == 0 && iters >= 1)
    val d = dim / m
    val idHash = SketchOracleSql.fnvFold("CAST(vec_id AS VARCHAR)")
    val trainFilter = if (trainWhere.isEmpty) "" else s" WHERE $trainWhere"
    val perSub = (0 until m).map { s =>
      val base =
        s"""sub$s AS (
           |  SELECT vec_id, ${svec("embedding", s, d)} AS sv FROM corpus
           |), subT$s AS (
           |  SELECT vec_id, ${svec("embedding", s, d)} AS sv FROM trainset
           |), cents0_$s AS (
           |  SELECT centroid_id, ${svec("embedding", s, d)} AS c_vec FROM seeds
           |)""".stripMargin
      val rounds = (1 to iters).map { r =>
        val prev = s"cents${r - 1}_$s"
        s"""asg${r}_$s AS (
           |  SELECT centroid_id, sv FROM (
           |    SELECT e.sv, c.centroid_id,
           |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
           |        ORDER BY ${l2sq("e.sv", "c.c_vec", d)}, c.centroid_id) AS r
           |    FROM subT$s e CROSS JOIN $prev c) WHERE r = 1
           |), pd${r}_$s AS (
           |  SELECT centroid_id, dd.dim AS dim,
           |    CAST(SUM(CAST(CAST(sv[dd.dim + 1] AS DOUBLE) AS DECIMAL(18,6))) AS DOUBLE)
           |      / COUNT(*) AS m
           |  FROM asg${r}_$s CROSS JOIN (SELECT unnest(range(0, $d)) AS dim) dd
           |  GROUP BY centroid_id, dd.dim
           |), cents${r}_$s AS (
           |  SELECT centroid_id, list(m ORDER BY dim) AS c_vec
           |  FROM pd${r}_$s GROUP BY centroid_id
           |)""".stripMargin
      }
      val enc =
        s"""encode_$s AS (
           |  SELECT vec_id, $s AS subspace, centroid_id AS code FROM (
           |    SELECT e.vec_id, c.centroid_id,
           |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
           |        ORDER BY ${l2sq("e.sv", "c.c_vec", d)}, c.centroid_id) AS r
           |    FROM sub$s e CROSS JOIN cents${iters}_$s c) WHERE r = 1
           |)""".stripMargin
      (base +: rounds :+ enc).mkString(", ")
    }.mkString(", ")
    s"""corpus AS (
       |  SELECT vec_id, embedding FROM embeddings WHERE embedding IS NOT NULL
       |), idh AS (
       |  SELECT vec_id, embedding,
       |    CAST(CASE WHEN u >= CAST('9223372036854775808' AS HUGEINT)
       |         THEN u - CAST('18446744073709551616' AS HUGEINT) ELSE u END AS BIGINT) AS h
       |  FROM (SELECT vec_id, embedding, $idHash AS u FROM corpus)
       |), trainset AS (
       |  SELECT vec_id, embedding, h FROM idh$trainFilter
       |), seeds AS (
       |  SELECT CAST(rn - 1 AS INTEGER) AS centroid_id, embedding FROM (
       |    SELECT vec_id, embedding, ROW_NUMBER() OVER (ORDER BY h, vec_id) AS rn FROM trainset
       |  ) WHERE rn <= $k
       |), $perSub""".stripMargin
  }

  private def trainWhereOf(trainMask: Long): String =
    if (trainMask == 0L) "" else s"(h & $trainMask) = 0"

  /** Oracle for [[graft.operators.Pq.encode]]: integer codes per
    * (vector, subspace). `trainMask` mirrors
    * [[graft.operators.Pq.trainSample]] on the training relation. */
  def pqEncodeSql(m: Int, k: Int, iters: Int, trainMask: Long = 0L,
                  dim: Int = 64): String = {
    val union = (0 until m).map(s => s"SELECT * FROM encode_$s")
      .mkString(" UNION ALL ")
    s"""WITH ${pqCtes(m, k, iters, dim, trainWhereOf(trainMask))}
       |SELECT vec_id, CAST(subspace AS INTEGER) AS subspace, code
       |FROM ($union)
       |ORDER BY vec_id, subspace""".stripMargin
  }

  /** Oracle for [[graft.operators.Pq.adcTopK]] with the query vector taken
    * from corpus row `queryId`: per-subspace decimal lookup-table
    * distances, summed per vector, top-`topK`. */
  def pqAdcSql(m: Int, k: Int, iters: Int, queryId: Long, topK: Int,
               trainMask: Long = 0L, dim: Int = 64): String = {
    val d = dim / m
    val luts = (0 until m).map { s =>
      s"""lut_$s AS (
         |  SELECT $s AS subspace, c.centroid_id AS code,
         |    CAST(${l2sq("q.qs", "c.c_vec", d)} AS DECIMAL(18,6)) AS pd
         |  FROM cents${iters}_$s c CROSS JOIN
         |    (SELECT ${svec("embedding", s, d)} AS qs FROM corpus
         |     WHERE vec_id = $queryId) q
         |)""".stripMargin
    }.mkString(", ")
    val encUnion = (0 until m).map(s => s"SELECT * FROM encode_$s")
      .mkString(" UNION ALL ")
    val lutUnion = (0 until m).map(s => s"SELECT * FROM lut_$s")
      .mkString(" UNION ALL ")
    s"""WITH ${pqCtes(m, k, iters, dim, trainWhereOf(trainMask))}, $luts,
       |dists AS (
       |  SELECT e.vec_id, SUM(l.pd) AS s
       |  FROM ($encUnion) e JOIN ($lutUnion) l
       |    ON e.subspace = l.subspace AND e.code = l.code
       |  GROUP BY e.vec_id
       |)
       |SELECT vec_id, CAST(s AS DOUBLE) AS adc_dist
       |FROM dists ORDER BY s, vec_id LIMIT $topK""".stripMargin
  }

  /** Oracle for [[graft.operators.Pq.ivfPqTopK]]: the coarse quantizer is
    * `ivfIters` unrolled Lloyd rounds (the [[kmeansLloydSql]] round shape —
    * L2 argmin with (distance, centroid_id) tie-break, decimal-carrier
    * per-dim means) from the FNV-sampled seeds, then cosine cell
    * assignment/probes over the TRAINED centroids, then per-query ADC
    * ranking over the PQ CTEs' codes. Queries = corpus rows with
    * `vec_id < 10`, self-pairs excluded. A fixpoint reached early on the
    * engine side still hash-matches: extra oracle rounds are no-ops.
    * `trainMask` mirrors [[graft.operators.Pq.trainSample]]: both
    * quantizers train on idh rows with the masked hash bits zero. */
  def ivfPqSql(m: Int, pqK: Int, iters: Int, ivfK: Int, nProbe: Int,
               topK: Int, ivfIters: Int = 2, trainMask: Long = 3L,
               dim: Int = 64): String = {
    val d = dim / m
    val luts = (0 until m).map { s =>
      s"""lut_$s AS (
         |  SELECT q.query_id, $s AS subspace, c.centroid_id AS code,
         |    CAST(${l2sq(svec("q.q_emb", s, d), "c.c_vec", d)} AS DECIMAL(18,6)) AS pd
         |  FROM cents${iters}_$s c CROSS JOIN q
         |)""".stripMargin
    }.mkString(", ")
    val encUnion = (0 until m).map(s => s"SELECT * FROM encode_$s")
      .mkString(" UNION ALL ")
    val lutUnion = (0 until m).map(s => s"SELECT * FROM lut_$s")
      .mkString(" UNION ALL ")
    val ivfRounds = (1 to ivfIters).map { r =>
      val prev = s"ivfcents${r - 1}"
      s"""ivfasg$r AS (
         |  SELECT centroid_id, embedding FROM (
         |    SELECT e.embedding, c.centroid_id,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${l2sq("e.embedding", "c.c_vec", dim)}, c.centroid_id) AS r
         |    FROM trainset e CROSS JOIN $prev c) WHERE r = 1
         |), ivfpd$r AS (
         |  SELECT centroid_id, d.dim AS dim,
         |    CAST(SUM(CAST(CAST(embedding[d.dim + 1] AS DOUBLE) AS DECIMAL(18,6))) AS DOUBLE)
         |      / COUNT(*) AS m
         |  FROM ivfasg$r CROSS JOIN (SELECT unnest(range(0, $dim)) AS dim) d
         |  GROUP BY centroid_id, d.dim
         |), ivfcents$r AS (
         |  SELECT centroid_id, list(m ORDER BY dim) AS c_vec FROM ivfpd$r GROUP BY centroid_id
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH ${pqCtes(m, pqK, iters, dim, trainWhereOf(trainMask))},
       |q AS (SELECT vec_id AS query_id, embedding AS q_emb FROM corpus WHERE vec_id < 10),
       |ivfcents0 AS (
       |  SELECT vec_id AS centroid_id, embedding AS c_vec FROM (
       |    SELECT vec_id, embedding, ROW_NUMBER() OVER (ORDER BY h, vec_id) AS rn FROM trainset
       |  ) WHERE rn <= $ivfK
       |), $ivfRounds, ivfcents AS (
       |  SELECT centroid_id, c_vec FROM ivfcents$ivfIters
       |), assigned AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT e.vec_id, c.centroid_id AS cell,
       |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${cosine("e.embedding", "c.c_vec", dim)} DESC, c.centroid_id) AS c_rank
       |    FROM corpus e CROSS JOIN ivfcents c) WHERE c_rank = 1
       |), probes AS (
       |  SELECT query_id, cell FROM (
       |    SELECT q.query_id, c.centroid_id AS cell,
       |      ROW_NUMBER() OVER (PARTITION BY q.query_id
       |        ORDER BY ${cosine("q.q_emb", "c.c_vec", dim)} DESC, c.centroid_id) AS c_rank
       |    FROM q CROSS JOIN ivfcents c) WHERE c_rank <= $nProbe
       |), $luts,
       |cand AS (
       |  SELECT p.query_id, e.vec_id, e.subspace, e.code
       |  FROM ($encUnion) e
       |  JOIN assigned a USING (vec_id)
       |  JOIN probes p ON a.cell = p.cell
       |  WHERE e.vec_id <> p.query_id
       |), dists AS (
       |  SELECT c.query_id, c.vec_id, SUM(l.pd) AS s
       |  FROM cand c JOIN ($lutUnion) l
       |    ON c.query_id = l.query_id AND c.subspace = l.subspace
       |   AND c.code = l.code
       |  GROUP BY c.query_id, c.vec_id
       |)
       |SELECT query_id, vec_id, CAST(s AS DOUBLE) AS adc_dist, rank FROM (
       |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY s, vec_id) AS INTEGER) AS rank
       |  FROM dists) WHERE rank <= $topK
       |ORDER BY query_id, rank""".stripMargin
  }
}
