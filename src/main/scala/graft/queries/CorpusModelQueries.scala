package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-8 corpus-modeling operators: the statistical-LM and vector-
  * quantization family a training-data pipeline runs between cleaning and
  * sampling. All five are hash-gated with EXACT integer outputs — floats
  * are quantized (ln·1e6 floor, coordinate·1e3 floor) BEFORE any aggregate,
  * so every sum is an order-free BIGINT and no cross-engine ulp can flip
  * the gate (the DSIR precedent from round 7).
  *
  *  - llm_bigram_lm — CCNet/KenLM-style LM quality scoring: train a bigram
  *    model with add-1 smoothing ON the corpus, score every document by its
  *    total smoothed log-probability. The classic perplexity filter with the
  *    KenLM binary replaced by two aggregations. Scale: bigram/unigram count
  *    frames grow with VOCABULARY (Heaps' law, ≪ corpus); the score join is
  *    two equi-joins on word keys — shuffle-partitioned, no driver state.
  *  - llm_vocab_coverage — frequency top-K vocabulary induction + per-source
  *    out-of-vocabulary rates, the tokenizer-fit diagnostic run before
  *    committing a vocab. Top-K via sort-limit (TakeOrderedAndProject: per-
  *    partition top-K then merge — never a global sort); the K-row vocab
  *    broadcasts to the token stream.
  *  - llm_bpe_pairs — adjacent-character-pair frequencies inside words: the
  *    argmax candidates of the FIRST BPE merge step (Sennrich et al.), i.e.
  *    one iteration of tokenizer training as a pure count query. Iterating
  *    it (re-tokenize with the merged symbol, recount) is this same query in
  *    a loop; each round is one explode+groupBy shuffle.
  *  - llm_kmeans_assign — one Lloyd assignment step over embeddings against
  *    deterministic seeds (vec_id < 8), in QUANTIZED integer space: coords
  *    floor-scaled to 1e-3 grid, distances are exact BIGINT sums, argmin
  *    tie-broken by seed id. The building block of k-means curriculum
  *    bucketing and of IVF coarse quantizer training. Scale: seeds
  *    broadcast; assignment is a map-side pass + one groupBy.
  *  - llm_pq_codes — product quantization (Jégou et al.): 64-dim vectors
  *    split into 4×16-dim subspaces, each subvector coded by its nearest of
  *    4 per-subspace centroids (codebook = subvectors of vec_id < 4). The
  *    memory-compression path for billion-vector ANN: 64 floats → 4 bytes.
  *    Same broadcast-codebook shape as kmeans_assign, per-subspace.
  */
object CorpusModelQueries {

  /** Shared quantized-embedding projection: float coords are exact in
    * double, ·1e3 is one correctly-rounded IEEE multiply (identical in both
    * engines), floor is deterministic — so qv is the same BIGINT lattice
    * point everywhere, and all distance math downstream is exact integers. */
  private val quantize =
    "transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1e3) AS BIGINT))"

  /** Exact squared L2 on quantized lattice points — the codegen'd
    * [[graft.plans.L2SqExpression]] (one static call inside whole-stage
    * codegen) instead of the interpreted `aggregate(zip_with(...))` chain
    * it replaces: same BIGINT result, ~element-count× fewer boxed
    * expression evals on the pair hot paths. */
  private def l2sq(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.plans.L2SqExpression(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(a),
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(b)))

  /** Shared per-document bigram-LM scorer: (doc_id, n_bigrams, lm_qscore),
    * unordered — `llm_bigram_lm` reports it directly, and
    * `llm_perplexity_filter` normalizes it into a keep/drop decision.
    * Count frames (cb, cu) grow with vocabulary, not corpus; the scalar V
    * is a 1-row broadcast; the score join is two word-key equi-joins. */
  private def docLmScores(s: SparkSession, dir: String): DataFrame = {
    val wsAll = Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ", -1).as("ws"))
    val ws = wsAll.where(size(col("ws")) >= 2)
    val bg = ws.select(col("doc_id"), explode(expr(
      """transform(sequence(1, size(ws) - 1),
        |          i -> struct(element_at(ws, i) AS w1,
        |                      element_at(ws, i + 1) AS w2))""".stripMargin)).as("b"))
      .select(col("doc_id"), col("b.w1"), col("b.w2"))
    val cb = bg.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
    val cu = cb.groupBy("w1").agg(sum("cb").as("cu"))
    // 1-row vocabulary-size aggregate: broadcast-by-construction scalar.
    // Built from the UNFILTERED corpus (wsAll), matching the oracle's v CTE:
    // a single-word doc whose token appears nowhere else still grows V.
    val v = wsAll.select(explode(col("ws")).as("u")).agg(countDistinct("u").as("v"))
    bg.join(cb, Seq("w1", "w2")).join(cu, Seq("w1")).crossJoin(v)
      .select(col("doc_id"),
        expr("CAST(FLOOR(LN((cb + 1.0) / (cu + v)) * 1e6) AS BIGINT)").as("q"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("q").as("lm_qscore"))
  }

  val bigramLm: Reg = Reg.sql(
    "llm_bigram_lm",
    """WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |bgp AS (SELECT doc_id,
      |          UNNEST(list_transform(generate_series(1, len(w) - 1),
      |                   i -> {'w1': w[i], 'w2': w[i + 1]})) AS p
      |        FROM ws WHERE len(w) >= 2),
      |bg AS (SELECT doc_id, p.w1 AS w1, p.w2 AS w2 FROM bgp),
      |cb AS (SELECT w1, w2, COUNT(*) AS cb FROM bg GROUP BY 1, 2),
      |cu AS (SELECT w1, CAST(SUM(cb) AS BIGINT) AS cu FROM cb GROUP BY 1),
      |v AS (SELECT COUNT(DISTINCT u) AS v
      |      FROM (SELECT UNNEST(w) AS u FROM ws))
      |SELECT bg.doc_id, COUNT(*) AS n_bigrams,
      |       CAST(SUM(CAST(FLOOR(LN((cb + 1.0) / (cu + v)) * 1e6) AS BIGINT))
      |            AS BIGINT) AS lm_qscore
      |FROM bg JOIN cb USING (w1, w2) JOIN cu USING (w1) CROSS JOIN v
      |GROUP BY bg.doc_id ORDER BY bg.doc_id""".stripMargin) { (s, dir) =>
    docLmScores(s, dir).orderBy("doc_id")
  }

  val vocabCoverage: Reg = Reg.sql(
    "llm_vocab_coverage",
    """WITH tok AS (SELECT source, UNNEST(string_split(text, ' ')) AS w
      |             FROM documents),
      |freq AS (SELECT w, COUNT(*) AS cnt FROM tok GROUP BY 1),
      |vocab AS (SELECT w FROM freq ORDER BY cnt DESC, w LIMIT 500)
      |SELECT source, COUNT(*) AS total_tokens,
      |       CAST(SUM(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |         AS oov_tokens,
      |       CAST(SUM(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) * 1000
      |            // COUNT(*) AS BIGINT) AS oov_permille
      |FROM tok LEFT JOIN vocab v ON tok.w = v.w
      |GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
    val tok = Tables.documents(s, dir)
      .select(col("source"), explode(split(col("text"), " ", -1)).as("w"))
    // Sort-limit compiles to TakeOrderedAndProject (per-partition top-K +
    // driver merge of K·parts rows) — the vocab never causes a global sort.
    val vocab = tok.groupBy("w").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("w")).limit(500)
      .select(col("w").as("vw"))
    tok.join(broadcast(vocab), col("w") === col("vw"), "left")
      .groupBy("source")
      .agg(
        count(lit(1)).as("total_tokens"),
        sum(when(col("vw").isNull, 1L).otherwise(0L)).as("oov_tokens"))
      // positive operands: truncating div == floor-div, same in both engines
      .withColumn("oov_permille",
        expr("CAST(oov_tokens * 1000 DIV total_tokens AS BIGINT)"))
      .orderBy("source")
  }

  val bpePairs: Reg = Reg.sql(
    "llm_bpe_pairs",
    """WITH wd AS (SELECT UNNEST(string_split(text, ' ')) AS w FROM documents),
      |pr AS (SELECT UNNEST(list_transform(generate_series(1, length(w) - 1),
      |                i -> substr(w, i, 2))) AS pair
      |       FROM wd WHERE length(w) >= 2)
      |SELECT pair, COUNT(*) AS cnt FROM pr GROUP BY pair
      |ORDER BY cnt DESC, pair LIMIT 20""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir)
      .select(explode(split(col("text"), " ", -1)).as("w"))
      .where(length(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("pair")).limit(20)
  }

  val kmeansAssign: Reg = Reg.sql(
    "llm_kmeans_assign",
    """WITH q AS (SELECT vec_id,
      |             list_transform(embedding,
      |               x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1e3) AS BIGINT)) AS qv
      |           FROM embeddings),
      |s AS (SELECT vec_id AS sid, qv AS sv FROM q WHERE vec_id < 8),
      |d AS (SELECT q.vec_id, s.sid,
      |        CAST(SUM((qv[i] - sv[i]) * (qv[i] - sv[i])) AS BIGINT) AS dist
      |      FROM q CROSS JOIN s CROSS JOIN generate_series(1, 64) AS g(i)
      |      GROUP BY 1, 2),
      |a AS (SELECT vec_id, sid, dist,
      |        ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, sid) AS rn
      |      FROM d)
      |SELECT sid AS cluster, COUNT(*) AS n,
      |       CAST(SUM(dist) AS BIGINT) AS total_qdist
      |FROM a WHERE rn = 1 GROUP BY sid ORDER BY sid""".stripMargin) { (s, dir) =>
    val q = Tables.embeddings(s, dir).select(col("vec_id"), expr(quantize).as("qv"))
    val seeds = q.where(col("vec_id") < 8)
      .select(col("vec_id").as("sid"), col("qv").as("sv"))
    q.crossJoin(broadcast(seeds))
      .select(col("vec_id"), col("sid"),
        l2sq(col("qv"), col("sv")).as("dist"))
      .groupBy("vec_id")
      .agg(min(struct(col("dist"), col("sid"))).as("best"))
      .select(col("best.sid").as("cluster"), col("best.dist").as("dist"))
      .groupBy("cluster")
      .agg(count(lit(1)).as("n"), sum("dist").as("total_qdist"))
      .orderBy("cluster")
  }

  /** Simplified (centroid-based) silhouette for the llm_kmeans_assign
    * clustering — the standard quality diagnostic a curation pipeline runs
    * before trusting cluster-based semantic dedup or pruning: per vector,
    * a = distance to its own (nearest) centroid, b = distance to the
    * second-nearest, silhouette = (b − a) / b. Run on SQUARED lattice
    * distances (the documented squared-silhouette variant) so a and b are
    * exact integers; a ≤ b by construction of the assignment, so the
    * permille score (b−a)·1000 div b is a NON-NEGATIVE exact integer —
    * truncating and flooring division agree, no cross-engine exposure.
    *
    * 100 TB shape: identical to the assignment itself — 8 broadcast seeds,
    * map-side distances, ONE shuffle by vec_id whose per-key group is 8
    * rows (sort_array over a bounded collect), then the per-cluster
    * rollup. Output is |clusters| rows at any corpus size. */
  val silhouette: Reg = Reg.sql(
    "llm_silhouette",
    """WITH q AS (SELECT vec_id,
      |             list_transform(embedding,
      |               x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1e3) AS BIGINT)) AS qv
      |           FROM embeddings),
      |s AS (SELECT vec_id AS sid, qv AS sv FROM q WHERE vec_id < 8),
      |d AS (SELECT q.vec_id, s.sid,
      |        CAST(SUM((qv[i] - sv[i]) * (qv[i] - sv[i])) AS BIGINT) AS dist
      |      FROM q CROSS JOIN s CROSS JOIN generate_series(1, 64) AS g(i)
      |      GROUP BY 1, 2),
      |r AS (SELECT vec_id, sid, dist,
      |        ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, sid) AS rn
      |      FROM d),
      |p AS (SELECT vec_id,
      |        MIN(CASE WHEN rn = 1 THEN sid END) AS cluster,
      |        MIN(CASE WHEN rn = 1 THEN dist END) AS a2,
      |        MIN(CASE WHEN rn = 2 THEN dist END) AS b2
      |      FROM r WHERE rn <= 2 GROUP BY vec_id),
      |sp AS (SELECT cluster,
      |         CASE WHEN b2 = 0 THEN 0
      |              ELSE (b2 - a2) * 1000 // b2 END AS s_permille
      |       FROM p)
      |SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n,
      |       CAST(SUM(s_permille) AS BIGINT) AS sil_sum_permille,
      |       CAST(SUM(s_permille) // COUNT(*) AS BIGINT) AS sil_mean_permille
      |FROM sp GROUP BY cluster ORDER BY cluster""".stripMargin) { (s, dir) =>
    val q = Tables.embeddings(s, dir).select(col("vec_id"), expr(quantize).as("qv"))
    val seeds = q.where(col("vec_id") < 8)
      .select(col("vec_id").as("sid"), col("qv").as("sv"))
    val two = q.crossJoin(broadcast(seeds))
      .select(col("vec_id"), col("sid"), l2sq(col("qv"), col("sv")).as("dist"))
      .groupBy("vec_id")
      // 8 structs per key, totally ordered by (dist, sid) — bounded buffer
      .agg(sort_array(collect_list(struct(col("dist"), col("sid")))).as("ds"))
      .select(
        col("ds")(0).getField("sid").as("cluster"),
        col("ds")(0).getField("dist").as("a2"),
        col("ds")(1).getField("dist").as("b2"))
    two
      .select(col("cluster"),
        when(col("b2") === 0, 0L)
          .otherwise(expr("(b2 - a2) * 1000 div b2")).as("s_permille"))
      .groupBy("cluster")
      .agg(count(lit(1)).as("n"),
        sum("s_permille").as("sil_sum_permille"))
      .withColumn("sil_mean_permille",
        expr("CAST(sil_sum_permille div n AS BIGINT)"))
      .orderBy("cluster")
  }

  val pqCodes: Reg = Reg.sql(
    "llm_pq_codes",
    """WITH q AS (SELECT vec_id,
      |             list_transform(embedding,
      |               x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1e3) AS BIGINT)) AS qv
      |           FROM embeddings),
      |sub AS (SELECT vec_id, m, qv[(16 * m + 1):(16 * m + 16)] AS sq
      |        FROM q, generate_series(0, 3) AS gm(m)),
      |cb AS (SELECT m, vec_id AS code, sq AS cv FROM sub WHERE vec_id < 4),
      |d AS (SELECT sub.vec_id, sub.m, cb.code,
      |        CAST(SUM((sq[i] - cv[i]) * (sq[i] - cv[i])) AS BIGINT) AS dist
      |      FROM sub, cb, generate_series(1, 16) AS g(i)
      |      WHERE sub.m = cb.m
      |      GROUP BY 1, 2, 3),
      |a AS (SELECT vec_id, m, code,
      |        ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY dist, code)
      |          AS rn
      |      FROM d)
      |SELECT m AS subspace, code, COUNT(*) AS n
      |FROM a WHERE rn = 1 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    val q = Tables.embeddings(s, dir).select(col("vec_id"), expr(quantize).as("qv"))
    val sub = q.select(col("vec_id"), explode(expr(
      """transform(sequence(0, 3),
        |          m -> struct(m AS m, slice(qv, 16 * m + 1, 16) AS sq))""".stripMargin)).as("t"))
      .select(col("vec_id"), col("t.m").as("m"), col("t.sq").as("sq"))
    val cb = sub.where(col("vec_id") < 4)
      .select(col("m"), col("vec_id").as("code"), col("sq").as("cv"))
    sub.join(broadcast(cb), "m")
      .select(col("vec_id"), col("m"), col("code"),
        l2sq(col("sq"), col("cv")).as("dist"))
      .groupBy("vec_id", "m")
      .agg(min(struct(col("dist"), col("code"))).as("best"))
      .select(col("m").as("subspace"), col("best.code").as("code"))
      .groupBy("subspace", "code")
      .agg(count(lit(1)).as("n"))
      .orderBy("subspace", "code")
  }

  /** CTE chain restating [[graft.llm.Similarity.trainCodebookExact]]:
    * `iters` UNROLLED Lloyd steps in exact lattice integers. Init picks
    * `ksub` vectors by the Knuth multiplicative-hash shuffle of ids
    * (seeded deterministic sample — the trained replacement for the
    * round-10/11-flagged "first k vectors" toy codebook); each step
    * assigns train subvectors to their nearest code (exact L2, ties to
    * the smaller code) and re-centers at the per-dimension floor(mean)
    * back on the lattice (exact integer sums; one IEEE divide + floor —
    * bit-identical across engines); empty codes keep their previous
    * centroid via the LEFT JOIN + COALESCE grid. Emits `{p}sub`
    * (vec_id, m, sq) and the trained codebook `{p}cb{iters}` EXPLODED by
    * dimension index i — the form downstream distance CTEs consume.
    * The m=1 case is the IVF coarse quantizer. */
  private def lloydCtes(p: String, src: String, m: Int, sd: Int, ksub: String,
      iters: Int): String = {
    val b = new StringBuilder
    b ++= s"""${p}sub AS (SELECT vec_id, m, qv[($sd * m + 1):($sd * m + $sd)] AS sq
             |        FROM $src, generate_series(0, ${m - 1}) AS ${p}gm(m)),
             |${p}ini AS (SELECT vec_id, rn - 1 AS code FROM (
             |        SELECT vec_id,
             |          ROW_NUMBER() OVER (ORDER BY (vec_id * 2654435761) % 4294967296,
             |                             vec_id) AS rn
             |        FROM $src) WHERE rn <= ($ksub)),
             |${p}cb0 AS (SELECT s.m, i.code, g.i, s.sq[g.i] AS cve
             |        FROM ${p}sub s JOIN ${p}ini i USING (vec_id),
             |             generate_series(1, $sd) AS g(i)),
             |""".stripMargin
    for (t <- 1 to iters) {
      b ++= s"""${p}d$t AS (SELECT s.vec_id, s.m, c.code,
               |          CAST(SUM((s.sq[c.i] - c.cve) * (s.sq[c.i] - c.cve)) AS BIGINT) AS d
               |        FROM ${p}sub s JOIN ${p}cb${t - 1} c ON s.m = c.m
               |        GROUP BY 1, 2, 3),
               |${p}a$t AS (SELECT vec_id, m, code FROM (
               |        SELECT vec_id, m, code,
               |          ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d, code) AS rn
               |        FROM ${p}d$t) WHERE rn = 1),
               |${p}n$t AS (SELECT a.m, a.code, g.i,
               |          CAST(FLOOR(CAST(SUM(s.sq[g.i]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cve
               |        FROM ${p}a$t a JOIN ${p}sub s ON s.vec_id = a.vec_id AND s.m = a.m,
               |             generate_series(1, $sd) AS g(i)
               |        GROUP BY 1, 2, 3),
               |${p}cb$t AS (SELECT c.m, c.code, c.i, COALESCE(n.cve, c.cve) AS cve
               |        FROM ${p}cb${t - 1} c LEFT JOIN ${p}n$t n
               |          ON n.m = c.m AND n.code = c.code AND n.i = c.i),
               |""".stripMargin
    }
    b.result()
  }

  /** The production ANN serving pattern Jégou et al.'s PQ exists for:
    * ASYMMETRIC DISTANCE COMPUTATION. Vectors are stored only as M=8
    * subspace codes (8 bytes instead of 64 floats) against per-subspace
    * codebooks of ksub=16 codes, Lloyd-TRAINED in exact lattice integers
    * (2 unrolled iterations — [[lloydCtes]] / `trainCodebookExact`); a
    * query batch builds a per-subspace lookup table of exact distances to
    * every centroid (M × ksub entries per query — the bounded side BY
    * CONSTRUCTION: the LUT frame scales with the query batch, never the
    * corpus), and each corpus vector's approximate distance is M table
    * lookups summed — O(n·M) adds per query, no vector math on the scan
    * side. An ADC shortlist (top-10) is then exactly re-ranked by true
    * lattice L2 (`l2_sq`) to the final top-3 — the standard two-stage
    * shape.
    *
    * Everything runs on the 1e-3 integer lattice, so training AND both
    * search stages are exact integer arithmetic and the ENTIRE pipeline —
    * codebook training, codes, LUTs, ADC sums, shortlist boundary,
    * re-rank — is restated verbatim by the oracle: the rare ANN query
    * that hash-gates end-to-end with no planted-copy trick. Ties break on
    * vec_id at both stages (total order). Both rank≤K windows compile to
    * WindowGroupLimit. `PqAdcRecallSpec` separately gates retrieval
    * quality (recall@10 vs brute force) on clustered skewed corpora —
    * the case where an untrained codebook visibly loses. */
  val annPqAdc: Reg = Reg.sql(
    "llm_ann_pq_adc",
    """WITH q AS (SELECT vec_id,
      |             list_transform(embedding,
      |               x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1e3) AS BIGINT)) AS qv
      |           FROM embeddings),
      |""".stripMargin +
      lloydCtes("p", "q", m = 8, sd = 8, ksub = "16", iters = 2) +
      """cdist AS (SELECT s.vec_id, s.m, c.code,
      |          CAST(SUM((s.sq[c.i] - c.cve) * (s.sq[c.i] - c.cve)) AS BIGINT) AS dist
      |        FROM psub s JOIN pcb2 c ON s.m = c.m GROUP BY 1, 2, 3),
      |codes AS (SELECT vec_id, m, code FROM (
      |        SELECT vec_id, m, code,
      |          ROW_NUMBER() OVER (PARTITION BY vec_id, m
      |                             ORDER BY dist, code) AS rn FROM cdist)
      |      WHERE rn = 1),
      |lut AS (SELECT s.vec_id AS q_id, s.m, c.code,
      |          CAST(SUM((s.sq[c.i] - c.cve) * (s.sq[c.i] - c.cve)) AS BIGINT) AS ld
      |        FROM psub s JOIN pcb2 c ON s.m = c.m
      |        WHERE s.vec_id < 8
      |        GROUP BY 1, 2, 3),
      |adc AS (SELECT lut.q_id, codes.vec_id,
      |          CAST(SUM(lut.ld) AS BIGINT) AS adc_dist
      |        FROM codes JOIN lut ON codes.m = lut.m AND codes.code = lut.code
      |        GROUP BY 1, 2),
      |short AS (SELECT q_id, vec_id, adc_dist FROM (
      |        SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
      |                  ORDER BY adc_dist, vec_id) AS srn FROM adc)
      |      WHERE srn <= 10),
      |ex AS (SELECT short.q_id, short.vec_id, short.adc_dist,
      |         CAST(SUM((v.qv[i] - qq.qv[i]) * (v.qv[i] - qq.qv[i])) AS BIGINT)
      |           AS exact_dist
      |       FROM short
      |       JOIN q v ON v.vec_id = short.vec_id
      |       JOIN q qq ON qq.vec_id = short.q_id, generate_series(1, 64) AS g(i)
      |       GROUP BY 1, 2, 3)
      |SELECT q_id, CAST(rnk AS BIGINT) AS rank, vec_id, adc_dist, exact_dist
      |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
      |              ORDER BY exact_dist, vec_id) AS rnk FROM ex)
      |WHERE rnk <= 3 ORDER BY q_id, rank""".stripMargin) { (s, dir) =>
    graft.llm.Similarity.pqAdcTopK(
      Tables.embeddings(s, dir).select(col("vec_id"), expr(quantize).as("qv")),
      queryIds = _ < 8, k = 3, m = 8, ksub = 16, shortlist = 10,
      trainIters = 2)
      .orderBy("q_id", "rank")
  }

  /** IVF + PQ — the composed billion-vector architecture (FAISS IVFPQ):
    * BOTH levels Lloyd-trained in exact lattice integers ([[lloydCtes]]):
    * the coarse quantizer is the m=1 case (8 full-vector centroids — the
    * trained replacement for the first-8-seed-vectors device), each query
    * probes its 2 nearest cells, and ONLY probed-cell vectors are
    * ADC-scored against the trained m=8/ksub=16 codebooks (codes join the
    * candidate set BEFORE the LUT join — the scan prunes before any
    * distance work), then the `llm_ann_pq_adc` shortlist + exact re-rank.
    * Every stage — training included — is integer arithmetic, so
    * centroids, cell assignments, probe sets, ADC sums, shortlist
    * boundaries, and the re-rank all sit under one hash — the full
    * trained two-level index, exactly oracled. */
  /** Oracle restatement of the trained two-level IVF+PQ build + search,
    * shared by `llm_ann_ivfpq` (index built inline) and
    * `s27_stream_pq_index` (index built by streaming commits): both must
    * hash to THIS exact result — the stream-built index is only done when
    * it serves the same answers as the batch-built one. */
  private lazy val ivfPqOracleSql: String =
    """WITH q AS (SELECT vec_id,
      |             list_transform(embedding,
      |               x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1e3) AS BIGINT)) AS qv
      |           FROM embeddings),
      |""".stripMargin +
      "nq AS (SELECT COUNT(*) AS n FROM q),\n" +
      lloydCtes("c", "q", m = 1, sd = 64,
        ksub = "SELECT CAST(CEIL(n / 250.0) AS BIGINT) FROM nq", iters = 2) +
      lloydCtes("p", "q", m = 8, sd = 8, ksub = "16", iters = 2) +
      ivfPqSearchTailSql

  /** s37's oracle: the SAME trained-index search, but over the DRIFTED
    * corpus (base ∪ an out-of-distribution +8000 copy of every 5th
    * vector) at occupancy-50 cells — dense enough that a cell histogram
    * is a meaningful drift statistic even at sf0.01. */
  private lazy val retrainOracleSql: String =
    """WITH base AS (SELECT vec_id,
      |             list_transform(embedding,
      |               x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1e3) AS BIGINT)) AS qv
      |           FROM embeddings),
      |q AS (SELECT vec_id, qv FROM base
      |      UNION ALL
      |      SELECT vec_id + 10000000,
      |             list_transform(qv, x -> x + 8000)
      |      FROM base WHERE vec_id % 5 = 0),
      |""".stripMargin +
      "nq AS (SELECT COUNT(*) AS n FROM q),\n" +
      lloydCtes("c", "q", m = 1, sd = 64,
        ksub = "SELECT CAST(CEIL(n / 50.0) AS BIGINT) FROM nq", iters = 2) +
      lloydCtes("p", "q", m = 8, sd = 8, ksub = "16", iters = 2) +
      ivfPqSearchTailSql

  /** The ADC search CTE chain shared by every IVF+PQ oracle: assignment,
    * %250 probes at nprobe 2, per-query LUT, ADC shortlist of 10, exact
    * re-rank to top 3. */
  private lazy val ivfPqSearchTailSql: String =
      """ad AS (SELECT s.vec_id, c.code AS seed,
      |         CAST(SUM((s.sq[c.i] - c.cve) * (s.sq[c.i] - c.cve)) AS BIGINT) AS d
      |       FROM csub s JOIN ccb2 c ON s.m = c.m GROUP BY 1, 2),
      |assign AS (SELECT vec_id, seed AS cell FROM (
      |        SELECT vec_id, seed,
      |          ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, seed) AS rn
      |        FROM ad) WHERE rn = 1),
      |probes AS (SELECT vec_id AS q_id, seed AS cell FROM (
      |        SELECT vec_id, seed,
      |          ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, seed) AS rn
      |        FROM ad WHERE vec_id % 250 = 0) WHERE rn <= 2),
      |cand AS (SELECT probes.q_id, assign.vec_id
      |         FROM assign JOIN probes USING (cell)),
      |cdist AS (SELECT s.vec_id, s.m, c.code,
      |          CAST(SUM((s.sq[c.i] - c.cve) * (s.sq[c.i] - c.cve)) AS BIGINT) AS dist
      |        FROM psub s JOIN pcb2 c ON s.m = c.m GROUP BY 1, 2, 3),
      |codes AS (SELECT vec_id, m, code FROM (
      |        SELECT vec_id, m, code,
      |          ROW_NUMBER() OVER (PARTITION BY vec_id, m
      |                             ORDER BY dist, code) AS rn FROM cdist)
      |      WHERE rn = 1),
      |lut AS (SELECT s.vec_id AS q_id, s.m, c.code,
      |          CAST(SUM((s.sq[c.i] - c.cve) * (s.sq[c.i] - c.cve)) AS BIGINT) AS ld
      |        FROM psub s JOIN pcb2 c ON s.m = c.m
      |        WHERE s.vec_id % 250 = 0
      |        GROUP BY 1, 2, 3),
      |adc AS (SELECT cand.q_id, cand.vec_id,
      |          CAST(SUM(lut.ld) AS BIGINT) AS adc_dist
      |        FROM cand
      |        JOIN codes ON codes.vec_id = cand.vec_id
      |        JOIN lut ON lut.q_id = cand.q_id AND lut.m = codes.m
      |                AND lut.code = codes.code
      |        GROUP BY 1, 2),
      |short AS (SELECT q_id, vec_id, adc_dist FROM (
      |        SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
      |                  ORDER BY adc_dist, vec_id) AS srn FROM adc)
      |      WHERE srn <= 10),
      |ex AS (SELECT short.q_id, short.vec_id, short.adc_dist,
      |         CAST(SUM((v.qv[i] - qq.qv[i]) * (v.qv[i] - qq.qv[i])) AS BIGINT)
      |           AS exact_dist
      |       FROM short
      |       JOIN q v ON v.vec_id = short.vec_id
      |       JOIN q qq ON qq.vec_id = short.q_id, generate_series(1, 64) AS g(i)
      |       GROUP BY 1, 2, 3)
      |SELECT q_id, CAST(rnk AS BIGINT) AS rank, vec_id, adc_dist, exact_dist
      |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
      |              ORDER BY exact_dist, vec_id) AS rnk FROM ex)
      |WHERE rnk <= 3 ORDER BY q_id, rank""".stripMargin

  val annIvfPq: Reg = Reg.sql("llm_ann_ivfpq", ivfPqOracleSql) { (s, dir) =>
    val emb = Tables.embeddings(s, dir)
    // nlist scales with the corpus so CELL OCCUPANCY stays ~250 constant
    // (the FAISS sizing rule): the probed candidate set per query is then
    // nprobe*250 rows at ANY corpus size — restated by the oracle as
    // CEIL(COUNT(*)/250). At true warehouse scale nlist ~ sqrt(n) also
    // bounds the n*nlist assignment term; for the measured decades the
    // constant-occupancy rule is the binding one.
    val nSeeds = math.ceil(emb.count() / 250.0).toInt
    graft.llm.Similarity.ivfPqTopK(
      emb.select(col("vec_id"), expr(quantize).as("qv")),
      queryIds = _ % 250 === 0, k = 3,
      nSeeds = nSeeds, nprobe = 2, m = 8, ksub = 16, shortlist = 10,
      trainIters = 2)
      .orderBy("q_id", "rank")
  }

  /** Hard-negative mining through the TRAINED IVF+PQ index — the
    * sub-quadratic sibling of `llm_hard_negatives`: that operator scores
    * every (probe, opposite-label vector) pair (inherently quadratic in
    * the probed fraction), while this one prunes candidates to the
    * probe's `nprobe` coarse cells FIRST, drops same-label rows alongside
    * the coarse prune (before any distance work), ADC-scores only the
    * surviving cell members, and exactly re-ranks the shortlist — so the
    * mined per-probe negatives cost ~nprobe/nlist of the corpus instead
    * of all of it. Exact-integer training + search keep it fully
    * hash-oracled (the trade being ANN recall, which PqAdcRecallSpec
    * gates). Output: (p_id, rnk, neg_id, adc_dist, dist). */
  val hardNegativesAnn: Reg = Reg.sql(
    "llm_hard_negatives_ann",
    """WITH q AS (SELECT vec_id, label,
      |             list_transform(embedding,
      |               x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1e3) AS BIGINT)) AS qv
      |           FROM embeddings),
      |""".stripMargin +
      "nq AS (SELECT COUNT(*) AS n FROM q),\n" +
      lloydCtes("c", "q", m = 1, sd = 64,
        ksub = "SELECT CAST(CEIL(n / 250.0) AS BIGINT) FROM nq", iters = 2) +
      lloydCtes("p", "q", m = 8, sd = 8, ksub = "16", iters = 2) +
      """ad AS (SELECT s.vec_id, c.code AS seed,
      |         CAST(SUM((s.sq[c.i] - c.cve) * (s.sq[c.i] - c.cve)) AS BIGINT) AS d
      |       FROM csub s JOIN ccb2 c ON s.m = c.m GROUP BY 1, 2),
      |assign AS (SELECT vec_id, seed AS cell FROM (
      |        SELECT vec_id, seed,
      |          ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, seed) AS rn
      |        FROM ad) WHERE rn = 1),
      |probes AS (SELECT vec_id AS q_id, seed AS cell FROM (
      |        SELECT vec_id, seed,
      |          ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, seed) AS rn
      |        FROM ad WHERE vec_id % 50 = 0) WHERE rn <= 2),
      |plabels AS (SELECT vec_id AS q_id, label AS p_lbl FROM q
      |            WHERE vec_id % 50 = 0),
      |cand AS (SELECT probes.q_id, assign.vec_id
      |         FROM assign JOIN probes USING (cell)
      |         JOIN q v ON v.vec_id = assign.vec_id
      |         JOIN plabels ON plabels.q_id = probes.q_id
      |         WHERE v.label <> plabels.p_lbl),
      |cdist AS (SELECT s.vec_id, s.m, c.code,
      |          CAST(SUM((s.sq[c.i] - c.cve) * (s.sq[c.i] - c.cve)) AS BIGINT) AS dist
      |        FROM psub s JOIN pcb2 c ON s.m = c.m GROUP BY 1, 2, 3),
      |codes AS (SELECT vec_id, m, code FROM (
      |        SELECT vec_id, m, code,
      |          ROW_NUMBER() OVER (PARTITION BY vec_id, m
      |                             ORDER BY dist, code) AS rn FROM cdist)
      |      WHERE rn = 1),
      |lut AS (SELECT s.vec_id AS q_id, s.m, c.code,
      |          CAST(SUM((s.sq[c.i] - c.cve) * (s.sq[c.i] - c.cve)) AS BIGINT) AS ld
      |        FROM psub s JOIN pcb2 c ON s.m = c.m
      |        WHERE s.vec_id % 50 = 0
      |        GROUP BY 1, 2, 3),
      |adc AS (SELECT cand.q_id, cand.vec_id,
      |          CAST(SUM(lut.ld) AS BIGINT) AS adc_dist
      |        FROM cand
      |        JOIN codes ON codes.vec_id = cand.vec_id
      |        JOIN lut ON lut.q_id = cand.q_id AND lut.m = codes.m
      |                AND lut.code = codes.code
      |        GROUP BY 1, 2),
      |short AS (SELECT q_id, vec_id, adc_dist FROM (
      |        SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
      |                  ORDER BY adc_dist, vec_id) AS srn FROM adc)
      |      WHERE srn <= 10),
      |ex AS (SELECT short.q_id, short.vec_id, short.adc_dist,
      |         CAST(SUM((v.qv[i] - qq.qv[i]) * (v.qv[i] - qq.qv[i])) AS BIGINT)
      |           AS exact_dist
      |       FROM short
      |       JOIN q v ON v.vec_id = short.vec_id
      |       JOIN q qq ON qq.vec_id = short.q_id, generate_series(1, 64) AS g(i)
      |       GROUP BY 1, 2, 3)
      |SELECT q_id AS p_id, CAST(rnk AS BIGINT) AS rnk, vec_id AS neg_id,
      |       adc_dist, exact_dist AS dist
      |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
      |              ORDER BY exact_dist, vec_id) AS rnk FROM ex)
      |WHERE rnk <= 3 ORDER BY p_id, rnk""".stripMargin) { (s, dir) =>
    val emb = Tables.embeddings(s, dir)
    // constant cell occupancy (~250/cell), as llm_ann_ivfpq
    val nSeeds = math.ceil(emb.count() / 250.0).toInt
    graft.llm.Similarity.ivfPqTopK(
      emb.select(col("vec_id"), col("label"), expr(quantize).as("qv")),
      queryIds = _ % 50 === 0, k = 3,
      nSeeds = nSeeds, nprobe = 2, m = 8, ksub = 16, shortlist = 10,
      trainIters = 2, excludeLabelCol = Some("label"))
      .select(col("q_id").as("p_id"), col("rank").as("rnk"),
        col("vec_id").as("neg_id"), col("adc_dist"),
        col("exact_dist").as("dist"))
      .orderBy("p_id", "rnk")
  }

  /** BPE round 2 — the first merge APPLIED, then recounted: the argmax
    * pair of round 1 (cnt desc, pair asc — deterministic) is replaced by a
    * single placeholder symbol (chr(1), absent from any corpus) inside
    * every word, and pair statistics are recomputed over the new symbol
    * stream. Pairs spanning the placeholder are exactly BPE's symbol-pair
    * semantics (the merged unit counts as ONE symbol). This is the loop
    * body of tokenizer training: each further round is this same query
    * with a longer merge list; every round costs one explode + one
    * groupBy + a 1-row argmax broadcast. */
  val bpeRound2: Reg = Reg.sql(
    "llm_bpe_round2",
    """WITH wd AS (SELECT UNNEST(string_split(text, ' ')) AS w FROM documents),
      |ws AS (SELECT w FROM wd WHERE length(w) >= 2),
      |p1 AS (SELECT UNNEST(list_transform(generate_series(1, length(w) - 1),
      |                i -> substr(w, i, 2))) AS pair
      |       FROM ws),
      |c1 AS (SELECT pair, COUNT(*) AS cnt FROM p1 GROUP BY pair),
      |top1 AS (SELECT pair AS mp FROM c1 ORDER BY cnt DESC, pair LIMIT 1),
      |m AS (SELECT replace(w, (SELECT mp FROM top1), chr(1)) AS w2 FROM ws),
      |mm AS (SELECT w2 FROM m WHERE length(w2) >= 2),
      |p2 AS (SELECT UNNEST(list_transform(generate_series(1, length(w2) - 1),
      |                i -> substr(w2, i, 2))) AS pair
      |       FROM mm)
      |SELECT pair, COUNT(*) AS cnt FROM p2 GROUP BY pair
      |ORDER BY cnt DESC, pair LIMIT 20""".stripMargin) { (s, dir) =>
    val words = Tables.documents(s, dir)
      .select(explode(split(col("text"), " ", -1)).as("w"))
      .where(length(col("w")) >= 2)
    val top1 = words
      .select(explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("pair")).limit(1)
      .select(col("pair").as("mp"))
    words.crossJoin(broadcast(top1))
      .select(expr("replace(w, mp, chr(1))").as("w2"))
      .where(length(col("w2")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(w2) - 1), i -> substring(w2, i, 2))")).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("pair")).limit(20)
  }

  /** Character-entropy quality gate — the gibberish/binary-blob filter:
    * per-document Shannon entropy over the character distribution. Each
    * class term c·ln(c/n) floor-quantizes to the 1e-6 grid BEFORE the
    * per-doc sum (same order-free-integer discipline as the LM scorer);
    * the output is the negated micro-nat total plus a per-char integer
    * rate, so low-entropy (repetitive) and high-entropy (random) tails
    * are both selectable without any float crossing the gate. */
  val charEntropy: Reg = Reg.sql(
    "llm_char_entropy",
    """WITH ch AS (
      |  SELECT doc_id, UNNEST(list_transform(generate_series(1, length(text)),
      |           i -> substr(text, i, 1))) AS c
      |  FROM documents WHERE length(text) >= 1),
      |cc AS (SELECT doc_id, c, COUNT(*) AS k FROM ch GROUP BY doc_id, c),
      |n AS (SELECT doc_id, CAST(SUM(k) AS BIGINT) AS n FROM cc GROUP BY doc_id)
      |SELECT cc.doc_id, n.n AS n_chars,
      |       CAST(-SUM(k * CAST(FLOOR(LN(CAST(k AS DOUBLE) / n.n) * 1e6)
      |                          AS BIGINT)) AS BIGINT) AS entropy_micro,
      |       CAST(-SUM(k * CAST(FLOOR(LN(CAST(k AS DOUBLE) / n.n) * 1e6)
      |                          AS BIGINT)) // n.n AS BIGINT) AS per_char_micro
      |FROM cc JOIN n ON n.doc_id = cc.doc_id
      |GROUP BY cc.doc_id, n.n ORDER BY cc.doc_id""".stripMargin) { (s, dir) =>
    // length>=1 guard both sides: the UDF returns null for empty text, and
    // DuckDB's generate_series(1, 0) is empty — an empty document must
    // drop identically in both engines. The metric is per-row computable,
    // so the Spark side is ONE fused scan pass (TextAnalysis
    // .charEntropyStats — per-doc count map in a JIT UDF) instead of the
    // oracle's explode shape, which pays one row per CHARACTER through two
    // corpus-character-sized shuffles; at sf1 that explode form was the
    // slowest non-join query on the surface (22 s → ~2 s).
    Tables.documents(s, dir)
      .where(length(col("text")) >= 1)
      .select(col("doc_id"),
        graft.llm.TextAnalysis.charEntropyStats(col("text")).as("r"))
      .select(col("doc_id"),
        col("r._1").as("n_chars"), col("r._2").as("entropy_micro"))
      // non-negative operands: truncating DIV == DuckDB's floor //
      .withColumn("per_char_micro",
        expr("CAST(entropy_micro DIV n_chars AS BIGINT)"))
      .orderBy("doc_id")
  }

  /** Filter cascade — the FineWeb/Gopher-style ensemble gate: every rule
    * contributes one bit to a per-document reject mask, and the corpus
    * reports its mask histogram (mask 0 = kept). Thresholds compare by
    * integer cross-multiplication (stop·10 < wc ⟺ stop/wc < 0.1) so no
    * ratio ever materializes as a float. Per-row array expressions fused
    * into the scan; the histogram is one tiny aggregate. Auditing WHICH
    * rules fire together (not just a keep count) is what lets a pipeline
    * tune one rule without re-running the rest. */
  val filterCascade: Reg = Reg.sql(
    "llm_filter_cascade",
    """WITH f AS (
      |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |m AS (
      |  SELECT doc_id,
      |         CASE WHEN len(ws) < 30 THEN 1 ELSE 0 END
      |       + CASE WHEN len(list_filter(ws, w -> w IN
      |               ('the','of','and','a','to','in','is','it'))) * 10
      |               < len(ws) THEN 2 ELSE 0 END
      |       + CASE WHEN len(list_distinct(ws)) * 2 < len(ws)
      |              THEN 4 ELSE 0 END
      |       + CASE WHEN list_max(list_transform(ws, w -> length(w))) > 25
      |              THEN 8 ELSE 0 END AS mask
      |  FROM f)
      |SELECT CAST(mask AS BIGINT) AS mask, COUNT(*) AS cnt
      |FROM m GROUP BY mask ORDER BY mask""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ", -1).as("ws"))
      .select(col("doc_id"), (
        when(size(col("ws")) < 30, 1).otherwise(0)
          + when(expr(
            """size(filter(ws, w -> w IN
              |('the','of','and','a','to','in','is','it'))) * 10""".stripMargin)
            < size(col("ws")), 2).otherwise(0)
          + when(size(array_distinct(col("ws"))) * 2 < size(col("ws")), 4)
            .otherwise(0)
          + when(expr("array_max(transform(ws, w -> length(w)))") > 25, 8)
            .otherwise(0)).as("mask"))
      .groupBy(col("mask").cast("bigint").as("mask"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("mask")
  }

  /** Hard-negative mining — for each probe vector, the 3 nearest vectors
    * with a DIFFERENT label (the contrastive-training pair generator for
    * retrievers/rerankers). Distances are the exact quantized-integer L2
    * of kmeans/PQ, tie-broken by id, so the mined set is bit-stable run to
    * run — resumable curriculum generation needs exactly that. The probe
    * batch broadcasts (bounded per run); at corpus scale the candidate
    * side pre-filters through the IVF cells of llm_ann_ivf rather than
    * scanning — same join, bucketed feed. */
  val hardNegatives: Reg = Reg.sql(
    "llm_hard_negatives",
    """WITH q AS (SELECT vec_id, label,
      |             list_transform(embedding,
      |               x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1e3) AS BIGINT)) AS qv
      |           FROM embeddings),
      |p AS (SELECT vec_id AS p_id, label AS p_label, qv AS pv
      |      FROM q WHERE vec_id % 50 = 0),
      |d AS (SELECT p.p_id, q.vec_id AS neg_id,
      |        CAST(SUM((qv[i] - pv[i]) * (qv[i] - pv[i])) AS BIGINT) AS dist
      |      FROM p CROSS JOIN q CROSS JOIN generate_series(1, 64) AS g(i)
      |      WHERE q.label <> p.p_label
      |      GROUP BY 1, 2),
      |r AS (SELECT *, ROW_NUMBER() OVER
      |        (PARTITION BY p_id ORDER BY dist, neg_id) AS rnk
      |      FROM d)
      |SELECT p_id, CAST(rnk AS BIGINT) AS rnk, neg_id, dist
      |FROM r WHERE rnk <= 3 ORDER BY p_id, rnk""".stripMargin) { (s, dir) =>
    val q = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("label"), expr(quantize).as("qv"))
    // Dedup-before-expensive (the j12 discipline): distance mining runs on
    // DISTINCT (vector, label) groups; ids re-expand after ranking. Under
    // duplicate-heavy data (the sf1 replica: every vector ×10) the scored
    // pair count drops by the duplicate multiplicity on BOTH sides.
    // Exactness: a duplicate group reaches the expanded (dist, neg_id)
    // top-3 only if its (dist, min_id) group key ranks in the group
    // top-3 — each contributing group contributes its min id first, so a
    // group ranked 4th is preceded by at least three smaller (dist, id)
    // pairs from other groups' minima alone.
    val groups = q.groupBy("qv", "label").agg(min("vec_id").as("min_id"))
      .localCheckpoint(false) // reused for negatives + the probe filter below
    val probeGroups = q.where(col("vec_id") % 50 === 0)
      .groupBy(col("qv").as("pv"), col("label").as("p_label"))
      .agg(count(lit(1)).as("__n"))
    val wG = org.apache.spark.sql.expressions.Window
      .partitionBy("pv", "p_label").orderBy("dist", "min_id")
    val top3Groups = groups.crossJoin(broadcast(probeGroups))
      .where(col("label") =!= col("p_label"))
      .select(col("pv"), col("p_label"), col("qv"), col("label"), col("min_id"),
        l2sq(col("qv"), col("pv")).as("dist"))
      .withColumn("__g", row_number().over(wG))
      .where(col("__g") <= 3)
    // expand the surviving groups back to ids, re-rank per probe VECTOR
    val wV = org.apache.spark.sql.expressions.Window
      .partitionBy("pv", "p_label").orderBy("dist", "neg_id")
    val topPerVector = top3Groups
      .join(q.select(col("qv"), col("label"), col("vec_id").as("neg_id")),
        Seq("qv", "label"))
      .withColumn("rnk", row_number().over(wV).cast("bigint"))
      .where(col("rnk") <= 3)
    // expand probe vectors back to probe ids (copies share the ranking)
    topPerVector
      .join(q.where(col("vec_id") % 50 === 0)
        .select(col("qv").as("pv"), col("label").as("p_label"),
          col("vec_id").as("p_id")), Seq("pv", "p_label"))
      .select(col("p_id"), col("rnk"), col("neg_id"), col("dist"))
      .orderBy("p_id", "rnk")
  }

  /** N-gram novelty — per document, how many of its distinct word
    * trigrams appear in NO lower-id document: the incremental-information
    * metric curriculum ordering and near-dup triage both consume. One
    * explode to distinct (doc, gram), a min(doc_id) per gram (gram-keyed
    * shuffle, vocabulary-sized frame), one join back — a gram is novel
    * exactly where its global first-seer is this doc. Integer counts only. */
  val ngramNovelty: Reg = Reg.sql(
    "llm_ngram_novelty",
    """WITH g AS (
      |  SELECT DISTINCT doc_id,
      |         UNNEST(list_transform(generate_series(1, len(w) - 2),
      |                  i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])) AS gram
      |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
      |  WHERE len(w) >= 3),
      |fs AS (SELECT gram, MIN(doc_id) AS first_doc FROM g GROUP BY gram)
      |SELECT g.doc_id, COUNT(*) AS n_grams,
      |       CAST(SUM(CASE WHEN fs.first_doc = g.doc_id THEN 1 ELSE 0 END)
      |            AS BIGINT) AS novel_grams
      |FROM g JOIN fs ON fs.gram = g.gram
      |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin) { (s, dir) =>
    val g = Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ", -1).as("w"))
      .where(size(col("w")) >= 3)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(w) - 2),
          |  i -> concat_ws(' ', element_at(w, i), element_at(w, i + 1),
          |                 element_at(w, i + 2)))""".stripMargin)).as("gram"))
      .distinct()
    val firstSeen = g.groupBy("gram").agg(min("doc_id").as("first_doc"))
    g.join(firstSeen, "gram")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .as("novel_grams"))
      .orderBy("doc_id")
  }

  /** Iterative BPE through `Bpe.trainMerges` — six merge rounds of the
    * argmax-merge-recount loop as ONE operator with Heaps-law vocab
    * compression and per-round lineage cuts; the oracle is the same loop
    * unrolled into six chained DuckDB CTEs (generated, not hand-written),
    * exact because every count is an integer and the argmax order
    * (cnt DESC, pair ASC) is total. */
  val bpeK: Reg = Reg.sql("llm_bpe_k", graft.llm.Bpe.oracleSqlFor(6)) { (s, dir) =>
    val words = Tables.documents(s, dir)
      .select(explode(split(col("text"), " ", -1)).as("w"))
    graft.llm.Bpe.trainMergesDriver(s, words, "w", 6)
  }

  /** BPE at production vocab scale: 64 merge rounds in ONE Spark job —
    * `Bpe.trainMergesDriver` collects the Heaps-law-sized (word, count)
    * vocabulary once and runs the whole merge loop driver-side with
    * incremental pair-count maintenance (only words containing the merged
    * pair are touched per round), exactly how HuggingFace/SentencePiece
    * train. Placeholders live in the Unicode private use area
    * (U+E000+r−1) so 64 (or 50 000) rounds cannot collide with corpus
    * text the way chr(1..31) control chars would past k=31. The oracle is
    * the same loop unrolled into 64 chained DuckDB CTEs with the same
    * PUA placeholders — exact integer counts, total argmax order. */
  val bpeK64: Reg = Reg.sql(
    "llm_bpe_k64", graft.llm.Bpe.oracleSqlFor(64, r => 0xE000 + r - 1)) {
    (s, dir) =>
      val words = Tables.documents(s, dir)
        .select(explode(split(col("text"), " ", -1)).as("w"))
      graft.llm.Bpe.trainMergesDriver(s, words, "w", 64,
        placeholder = r => (0xE000 + r - 1).toChar)
  }

  /** Train-then-ENCODE through `Bpe.encode`: six merges trained, then
    * applied in training order to the FULL word stream (no length filter —
    * encoding keeps every word), then the per-symbol token-frequency table
    * of the encoded corpus. The merge list is k driver-side literals baked
    * into one narrow map pass (broadcast by construction); only the final
    * symbol count shuffles. */
  val bpeEncode: Reg = Reg.sql(
    "llm_bpe_encode", graft.llm.Bpe.encodeOracleSqlFor(6, 30)) { (s, dir) =>
    val words = Tables.documents(s, dir)
      .select(explode(split(col("text"), " ", -1)).as("w"))
    val merges = graft.llm.Bpe.trainMergesDriver(s, words, "w", 6)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    graft.llm.Bpe.encode(words.where(length(col("w")) >= 1), "w", merges)
      .select(explode(expr(
        "transform(sequence(1, length(w)), i -> substring(w, i, 1))")).as("sym"))
      .groupBy("sym").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("sym")).limit(30)
  }

  /** Tokenizer FERTILITY per source — tokens emitted per whitespace word
    * under the trained BPE, the standard metric for how well a tokenizer
    * fits each slice of a mix (a high-fertility source costs more context
    * window per word; multilingual pipelines budget by exactly this
    * number). Six merges train on the full stream (the llm_bpe_encode
    * device), every word encodes through the k driver-side merge literals
    * (broadcast by construction — one narrow map pass), and the rollup is
    * one |sources|-row aggregate. Token counts are symbol lengths after
    * the merge chain; fertility is exact integer permille, so the gate
    * hashes training, encoding, AND the ratio. */
  val tokenizerFertility: Reg = Reg.sql(
    "llm_tokenizer_fertility", graft.llm.Bpe.fertilityOracleSqlFor(6)) {
    (s, dir) =>
      val words = Tables.documents(s, dir)
        .select(col("source"), explode(split(col("text"), " ", -1)).as("w"))
      val merges = graft.llm.Bpe
        .trainMergesDriver(s, words.select("w"), "w", 6)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      graft.llm.Bpe.encode(words.where(length(col("w")) >= 1), "w", merges,
        keepCols = Seq("source"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_words"),
          sum(length(col("w"))).as("n_tokens"))
        .withColumn("fertility_permille",
          expr("CAST(n_tokens * 1000 DIV n_words AS BIGINT)"))
        .orderBy("source")
  }

  /** CCNet-style perplexity filtering (Wenzek et al., "CCNet: Extracting
    * High Quality Monolingual Datasets from Web Crawl Data"): score every
    * document by its average per-bigram negative log-probability under the
    * corpus's own add-1-smoothed bigram LM, then DROP the worst decile.
    * The decile cut is rank-exact yet scale-safe: instead of a global
    * ROW_NUMBER window (single-partition funnel at 100 TB), the K worst
    * (avg_nll, doc_id) keys come from a sort-limit (TakeOrderedAndProject:
    * per-partition top-K, K·partitions rows to the driver), collapse to a
    * ONE-ROW lexicographic threshold, and the verdict is a broadcast
    * compare fused into the scan of the scored frame. doc_id uniqueness
    * makes the (avg_nll DESC, doc_id ASC) order total, so the
    * threshold-compare set equals the oracle's rank set exactly. */
  val perplexityFilter: Reg = Reg.sql(
    "llm_perplexity_filter",
    """WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |bgp AS (SELECT doc_id,
      |          UNNEST(list_transform(generate_series(1, len(w) - 1),
      |                   i -> {'w1': w[i], 'w2': w[i + 1]})) AS p
      |        FROM ws WHERE len(w) >= 2),
      |bg AS (SELECT doc_id, p.w1 AS w1, p.w2 AS w2 FROM bgp),
      |cb AS (SELECT w1, w2, COUNT(*) AS cb FROM bg GROUP BY 1, 2),
      |cu AS (SELECT w1, CAST(SUM(cb) AS BIGINT) AS cu FROM cb GROUP BY 1),
      |v AS (SELECT COUNT(DISTINCT u) AS v
      |      FROM (SELECT UNNEST(w) AS u FROM ws)),
      |doc AS (SELECT bg.doc_id, COUNT(*) AS n_bigrams,
      |          CAST(SUM(CAST(FLOOR(LN((cb + 1.0) / (cu + v)) * 1e6) AS BIGINT))
      |               AS BIGINT) AS lm
      |        FROM bg JOIN cb USING (w1, w2) JOIN cu USING (w1) CROSS JOIN v
      |        GROUP BY bg.doc_id),
      |sc AS (SELECT doc_id, n_bigrams,
      |              CAST((-lm) // n_bigrams AS BIGINT) AS avg_nll_micro
      |       FROM doc),
      |r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY avg_nll_micro DESC, doc_id) AS rn,
      |             COUNT(*) OVER () AS n FROM sc)
      |SELECT doc_id, n_bigrams, avg_nll_micro,
      |       CASE WHEN rn <= (n + 9) // 10 THEN 'drop' ELSE 'keep' END AS verdict
      |FROM r ORDER BY doc_id""".stripMargin) { (s, dir) =>
    // avg_nll is positive (every smoothed bigram prob < 1 → lm_qscore < 0),
    // so truncating DIV == DuckDB floor // — same rationale as vocabCoverage.
    val scored = docLmScores(s, dir)
      .select(col("doc_id"), col("n_bigrams"),
        expr("CAST((-lm_qscore) DIV n_bigrams AS BIGINT)").as("avg_nll_micro"))
      // three consumers (count, top-K, verdict scan): materialize once
      .localCheckpoint(false)
    val n = scored.count()
    if (n == 0) {
      scored.withColumn("verdict", lit("keep"))
    } else {
      val k = ((n + 9) / 10).toInt
      val thr = scored
        .orderBy(desc("avg_nll_micro"), asc("doc_id"))
        .limit(k)
        .agg(min(struct(col("avg_nll_micro").as("a"),
          (-col("doc_id")).as("negid"))).as("t"))
        .select(col("t.a").as("t_avg"), col("t.negid").as("t_negid"))
      scored.crossJoin(broadcast(thr))
        .select(col("doc_id"), col("n_bigrams"), col("avg_nll_micro"),
          when(col("avg_nll_micro") > col("t_avg") ||
            (col("avg_nll_micro") === col("t_avg") &&
              -col("doc_id") >= col("t_negid")), "drop")
            .otherwise("keep").as("verdict"))
        .orderBy("doc_id")
    }
  }

  /** Sparse random projection (Achlioptas 2003 / Johnson-Lindenstrauss):
    * embeddings down-projected to 4 dimensions through a DETERMINISTIC
    * {-1, 0, +1} matrix derived from an integer hash of (i, j) — no RNG,
    * no materialized matrix, no broadcast even: the "matrix" is a codegen'd
    * CASE inside one narrow map pass, so at 100 TB this is a pure scan-
    * projection with zero shuffle (the cheapest possible dim-reduction
    * before LSH bucketing or coarse clustering). Coordinates are quantized
    * to the 1e-3 BIGINT lattice BEFORE the dot products, so every sum is
    * exact integer arithmetic in both engines (the kmeans/pq precedent).
    * The conventional sqrt(3/k) scale factor is omitted: downstream cosine
    * / bucketing decisions are scale-invariant, and keeping the output
    * integral keeps the gate exact. */
  val randProj: Reg = {
    // CAST(i AS BIGINT): Spark's sequence() yields INT elements and ANSI
    // mode (Spark 4 default) would overflow-throw on i * 1315423911 in INT;
    // the cast forces 64-bit arithmetic in both engines.
    def w(j: Int) =
      s"(CASE (CAST(i AS BIGINT) * 1315423911 + $j * 2654435761) % 6" +
        " WHEN 0 THEN 1 WHEN 1 THEN -1 ELSE 0 END)"
    val duckCols = (0 to 3).map { j =>
      s"""       CAST(list_sum(list_transform(generate_series(0, len(qv) - 1),
         |         i -> qv[i + 1] * ${w(j)})) AS BIGINT) AS p$j""".stripMargin
    }.mkString(",\n")
    Reg.sql(
      "llm_rand_proj",
      s"""WITH q AS (SELECT vec_id,
         |  list_transform(embedding,
         |    x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1e3) AS BIGINT)) AS qv
         |  FROM embeddings)
         |SELECT vec_id,
         |$duckCols
         |FROM q ORDER BY vec_id""".stripMargin) { (s, dir) =>
      def proj(j: Int) = expr(
        s"""aggregate(sequence(0, size(qv) - 1), 0L,
           |  (acc, i) -> acc + element_at(qv, i + 1) * ${w(j)})""".stripMargin)
        .as(s"p$j")
      Tables.embeddings(s, dir)
        .select(col("vec_id"), expr(quantize).as("qv"))
        .select(col("vec_id") +: (0 to 3).map(proj): _*)
        .orderBy("vec_id")
    }
  }

  /** Windowed co-occurrence PMI (Church & Hanks 1990) — the word2vec/GloVe
    * preprocessing statistic: count unordered word pairs within a ±2 token
    * window, score each by pointwise mutual information against unigram
    * frequencies, report the top-50 most-associated pairs (support ≥ 5).
    * Scale: pair instances explode 2× the token stream (bounded), the
    * count frames are vocabulary-sized, T/P are 1-row broadcast scalars,
    * and the top-50 is a sort-limit (TakeOrderedAndProject). Float
    * discipline: one LN per surviving pair over an identical IEEE
    * operation tree in both engines, floor-quantized to micro-units
    * before the ORDER BY (the BM25/DSIR precedent). */
  val pmiCooccur: Reg = Reg.sql(
    "llm_pmi_cooccur",
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |p1 AS (SELECT UNNEST(list_transform(generate_series(1, len(w) - 1),
      |         i -> {'w1': least(w[i], w[i + 1]),
      |               'w2': greatest(w[i], w[i + 1])})) AS p
      |       FROM w WHERE len(w) >= 2),
      |p2 AS (SELECT UNNEST(list_transform(generate_series(1, len(w) - 2),
      |         i -> {'w1': least(w[i], w[i + 2]),
      |               'w2': greatest(w[i], w[i + 2])})) AS p
      |       FROM w WHERE len(w) >= 3),
      |pr AS (SELECT p.w1 AS w1, p.w2 AS w2 FROM p1
      |       UNION ALL SELECT p.w1, p.w2 FROM p2),
      |cp AS (SELECT w1, w2, COUNT(*) AS c_ab FROM pr GROUP BY 1, 2),
      |cw AS (SELECT u AS tok, COUNT(*) AS c
      |       FROM (SELECT UNNEST(w) AS u FROM w) GROUP BY 1),
      |ts AS (SELECT COUNT(*) AS t FROM (SELECT UNNEST(w) AS u FROM w)),
      |ps AS (SELECT COUNT(*) AS p FROM pr)
      |SELECT cp.w1, cp.w2, c_ab AS pair_cnt,
      |       CAST(FLOOR(LN((CAST(c_ab AS DOUBLE) * t * t) /
      |                     (CAST(p AS DOUBLE) * a.c * b.c)) * 1e6) AS BIGINT)
      |         AS pmi_micro
      |FROM cp JOIN cw a ON a.tok = cp.w1 JOIN cw b ON b.tok = cp.w2
      |CROSS JOIN ts CROSS JOIN ps
      |WHERE c_ab >= 5
      |ORDER BY pmi_micro DESC, w1, w2 LIMIT 50""".stripMargin) { (s, dir) =>
    val w = Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ", -1).as("w"))
    def pairsGap(g: Int) = w.where(size(col("w")) >= g + 1)
      .select(explode(expr(
        s"""transform(sequence(1, size(w) - $g),
           |  i -> struct(least(element_at(w, i), element_at(w, i + $g)) AS w1,
           |              greatest(element_at(w, i), element_at(w, i + $g)) AS w2))""".stripMargin))
        .as("p"))
      .select(col("p.w1"), col("p.w2"))
    val pairs = pairsGap(1).unionByName(pairsGap(2))
    val cp = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c_ab"))
    val toks = w.select(explode(col("w")).as("tok"))
    val cw = toks.groupBy("tok").agg(count(lit(1)).as("c"))
    // two 1-row scalar frames: broadcast by construction
    val scalars = toks.agg(count(lit(1)).as("t"))
      .crossJoin(pairs.agg(count(lit(1)).as("p")))
    cp.where(col("c_ab") >= 5)
      .join(cw.select(col("tok").as("w1"), col("c").as("c_a")), "w1")
      .join(cw.select(col("tok").as("w2"), col("c").as("c_b")), "w2")
      .crossJoin(broadcast(scalars))
      .select(col("w1"), col("w2"), col("c_ab").as("pair_cnt"),
        expr("""CAST(FLOOR(LN((CAST(c_ab AS DOUBLE) * t * t) /
               |              (CAST(p AS DOUBLE) * c_a * c_b)) * 1e6) AS BIGINT)""".stripMargin)
          .as("pmi_micro"))
      .orderBy(desc("pmi_micro"), asc("w1"), asc("w2")).limit(50)
  }

  /** S23 — STREAMING maintenance of the IVF coarse index: vectors arrive
    * in micro-batches (file stream, 3 batches via maxFilesPerTrigger) and
    * each batch is assigned to its nearest TRAINED coarse centroid as
    * map-side work — the trained quantizer ([[graft.llm.Similarity
    * .trainCodebookExact]], m=1, corpus-scaled nlist) is a broadcast
    * literal, the per-row argmin is ONE array expression (no shuffle, no
    * state), and the streamed assignments append to the index's cell
    * layout. This is how the ANN family's index stays fresh as a corpus
    * streams in: assignment cost is O(batch · nlist) flat map work at any
    * corpus size, and cell rebalancing (retraining) is a separate offline
    * decision, exactly as FAISS does it.
    *
    * The oracle restates training (lloydCtes m=1) + assignment + the
    * per-cell rollup over the whole corpus in one shot — equal because
    * assignment is stateless, so batch slicing is invisible. */
  val streamIvfAssign: Reg = Reg.sql(
    "s23_stream_ivf_assign",
    """WITH q AS (SELECT vec_id,
      |             list_transform(embedding,
      |               x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1e3) AS BIGINT)) AS qv
      |           FROM embeddings),
      |""".stripMargin +
      "nq AS (SELECT COUNT(*) AS n FROM q),\n" +
      lloydCtes("c", "q", m = 1, sd = 64,
        ksub = "SELECT CAST(CEIL(n / 250.0) AS BIGINT) FROM nq", iters = 2) +
      """ad AS (SELECT s.vec_id, c.code AS seed,
      |         CAST(SUM((s.sq[c.i] - c.cve) * (s.sq[c.i] - c.cve)) AS BIGINT) AS d
      |       FROM csub s JOIN ccb2 c ON s.m = c.m GROUP BY 1, 2),
      |assign AS (SELECT vec_id, seed AS cell, d FROM (
      |        SELECT vec_id, seed, d,
      |          ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, seed) AS rn
      |        FROM ad) WHERE rn = 1)
      |SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_vecs,
      |       CAST(SUM(d) AS BIGINT) AS total_qdist
      |FROM assign GROUP BY cell ORDER BY cell""".stripMargin) { (s, dir) =>
    val work = graft.Scratch.dir("graft_stream_ivf")
    try {
      val quantized = Tables.embeddings(s, dir)
        .select(col("vec_id"), expr(quantize).as("qv"))
      val nSeeds = math.ceil(quantized.count() / 250.0).toInt
      val cb = graft.llm.Similarity.trainCodebookExact(
        quantized, m = 1, ksub = nSeeds, iters = 2)(0) // nSeeds × dims longs
      // the trained quantizer as ONE literal array-of-structs column —
      // KBs of driver state broadcast into every task, FAISS-style
      val cbArr = array(cb.zipWithIndex.map { case (cv, cell) =>
        struct(
          array(cv.map(lit(_)): _*).as("cv"),
          lit(cell.toLong).as("cell"))
      }: _*)

      val src = work + "/in"
      quantized.repartition(3).write.parquet(src)
      val stream = s.readStream.schema(s.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
      val assigned = stream
        .withColumn("best", array_min(transform(cbArr, c => struct(
          l2sq(col("qv"), c.getField("cv")).as("d"),
          c.getField("cell").as("cell")))))
        .select(col("vec_id"),
          col("best").getField("cell").as("cell"),
          col("best").getField("d").as("dist"))
      val q = assigned.writeStream
        .format("parquet")
        .option("path", work + "/out")
        .option("checkpointLocation", work + "/ckpt")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()

      val agg = s.read.parquet(work + "/out")
        .groupBy("cell")
        .agg(count(lit(1)).as("n_vecs"), sum("dist").as("total_qdist"))
        .orderBy("cell")
      // |cells| rows: materialize so the scratch dir can be deleted now
      s.createDataFrame(java.util.Arrays.asList(agg.collect(): _*), agg.schema)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(work))
    }
  }

  /** S27 — STREAMING PQ INDEX MAINTENANCE, closing the s23 loop: each
    * micro-batch is assigned its coarse cell AND its m=8 PQ codes as
    * pure map-side work (both trained quantizers ride along as broadcast
    * literals — zero shuffle, zero state), and the (vec_id, cell, codes)
    * rows land as FENCED commits into a [[graft.mutation.VersionedTable]]
    * — replay-safe, snapshot-isolated, time-travelable: "search the index
    * as of version N" is a manifest read. After the stream drains,
    * `llm_ann_ivfpq`-style queries are served FROM the stream-built head
    * snapshot ([[graft.llm.Similarity.ivfPqTopKFromIndex]]) — and the
    * oracle is the SAME statement as the batch-built index's, so the
    * stream-built index is correct exactly when its search results
    * hash-match the batch path's.
    *
    * 100 TB shape: ingest cost is O(batch · (nlist + m·ksub)) flat map
    * arithmetic; a query touches the index snapshot (codes, not raw
    * vectors) plus nprobe cells' worth of ADC lookups; retraining is an
    * offline decision that commits a new index root. */
  val streamPqIndex: Reg = Reg.sql(
    "s27_stream_pq_index", ivfPqOracleSql) { (s, dir) =>
    import graft.mutation.VersionedTable
    val work = graft.Scratch.dir("graft_stream_pq")
    val root = s"$work/idx"
    try {
      val quantized = Tables.embeddings(s, dir)
        .select(col("vec_id"), expr(quantize).as("qv"))
      val nSeeds = math.ceil(quantized.count() / 250.0).toInt
      val cbs = graft.llm.Similarity.trainCodebooksExact(
        quantized, Seq((1, nSeeds), (8, 16)), iters = 2)
      val m = 8

      val src = work + "/in"
      quantized.repartition(3).write.parquet(src)
      val stream = s.readStream.schema(s.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
      val q = stream.writeStream
        .foreachBatch {
          (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
           id: Long) =>
            // both trained quantizers ride inside pqAssign as literal
            // columns (the s23 device): KBs of driver state broadcast
            // into every ingest task — shared with the s37 retrain path
            VersionedTable.appendFenced(batch.sparkSession, root,
              pqAssign(batch.toDF(), cbs, m), id)
            ()
        }
        .option("checkpointLocation", work + "/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()

      // serve the batch query FROM the stream-built head snapshot
      graft.llm.Similarity.ivfPqTopKFromIndex(
        quantized.localCheckpoint(), // scratch dies below; freeze lineage
        VersionedTable.read(s, root).localCheckpoint(),
        cbs, queryIds = _ % 250 === 0, k = 3, nprobe = 2, m = m,
        shortlist = 10)
        .orderBy("q_id", "rank")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(work))
    }
  }

  /** Coarse-cell + PQ-code assignment of `df` (vec_id, qv) under trained
    * quantizers, as pure map-side literal arithmetic — the s27 ingest
    * expressions, shared with the s37 retrain path so both commit the
    * byte-identical index rows for the same codebooks. */
  private def pqAssign(
      df: DataFrame, cbs: Seq[Array[Array[Array[Long]]]],
      m: Int = 8): DataFrame = {
    val coarseArr = array(cbs.head(0).zipWithIndex.map { case (cv, cell) =>
      struct(array(cv.map(lit(_)): _*).as("cv"), lit(cell.toLong).as("cell"))
    }: _*)
    val sd = cbs(1)(0)(0).length
    val codesExpr = array((0 until m).map { mm =>
      val sub = expr(s"slice(qv, ${sd * mm + 1}, $sd)")
      array_min(array(cbs(1)(mm).zipWithIndex.map { case (cv, code) =>
        struct(l2sq(sub, array(cv.map(lit(_)): _*)).as("d"),
          lit(code.toLong).as("code"))
      }: _*)).getField("code")
    }: _*)
    df.withColumn("best", array_min(transform(coarseArr, c => struct(
        l2sq(col("qv"), c.getField("cv")).as("d"),
        c.getField("cell").as("cell")))))
      .select(col("vec_id"),
        col("best").getField("cell").as("cell"),
        codesExpr.as("codes"))
  }

  /** S37 — INDEX DRIFT RETRAIN, closing s27's maintenance loop (the
    * carried round-15 optional): the index is first committed under a
    * STALE quantizer pair trained on ONE label's region of the corpus —
    * the production shape where the corpus drifts after the quantizer
    * ships — so coarse-cell occupancy skews; the occupancy-skew probe
    * (the a33 pre-flight discipline run on the index's own cell
    * histogram) trips the documented retrain trigger; retraining on the
    * live corpus recommits assignments + codes as a NEW SNAPSHOT
    * (`replace`) of the same versioned index, leaving the drifted
    * snapshot time-travel readable for audit. The oracle is the SAME
    * statement as llm_ann_ivfpq / s27: search served from the
    * post-retrain head must be bit-identical to an index built from
    * scratch on the current corpus — exactly the "retrain converged"
    * contract. At 100 TB: the trigger is one |cells|-sized histogram
    * off the index (never the vectors), the retrain is the offline
    * decision s27's docstring defers, and the recommit is one snapshot
    * swap readers pick up atomically. */
  val indexRetrain: Reg = Reg.sql(
    "s37_index_retrain", retrainOracleSql) { (s, dir) =>
    import graft.mutation.VersionedTable
    val work = graft.Scratch.dir("graft_retrain")
    val root = s"$work/idx"
    try {
      val base = Tables.embeddings(s, dir)
        .select(col("vec_id"), expr(quantize).as("qv"))
      // the DRIFT: a post-deployment batch far outside the trained
      // distribution (+8000 on every quantized coordinate)
      val drifted = base.where(col("vec_id") % 5 === 0)
        .select((col("vec_id") + 10000000L).as("vec_id"),
          transform(col("qv"), x => x + lit(8000L)).as("qv"))
      val corpus = base.unionByName(drifted)
        .localCheckpoint() // training + 2 assignment passes + serve
      val n = corpus.count()
      val nSeeds = math.ceil(n / 50.0).toInt
      // t0 quantizers: trained on the PRE-DRIFT corpus — correct for
      // their era, exactly how a shipped index meets new data
      val preDrift = corpus.where(col("vec_id") < 10000000L)
      val stale = graft.llm.Similarity.trainCodebooksExact(
        preDrift, Seq((1, nSeeds), (8, 16)), iters = 2)
      // t0 commit: the pre-drift corpus under its own quantizers …
      VersionedTable.create(s, root, pqAssign(preDrift, stale))
      // … then the drifted batch ingested through the SAME stale
      // quantizers (the s27 ingest path) — it piles into boundary cells
      VersionedTable.append(s, root, pqAssign(drifted, stale))
      // occupancy-skew statistic: max/mean cell occupancy over the
      // index head — a |cells|-row histogram, never a vector read
      def skewOf(): Double = {
        val r = VersionedTable.read(s, root)
          .groupBy("cell").agg(count(lit(1)).as("c"))
          .agg(max(col("c")).cast("double"), avg(col("c"))).head()
        r.getDouble(0) / r.getDouble(1)
      }
      val skewDrifted = skewOf()
      // RETRAIN on the live corpus; recommit as a new snapshot readers
      // pick up atomically — the drifted snapshot stays for audit
      val cbs = graft.llm.Similarity.trainCodebooksExact(
        corpus, Seq((1, nSeeds), (8, 16)), iters = 2)
      VersionedTable.replace(s, root, pqAssign(corpus, cbs)) // v2
      val skewRetrained = skewOf()
      // the TRIGGER gate: the planted drift must be detectably worse
      // than the retrained balance, and retraining must remove it
      require(skewDrifted >= 1.2 * skewRetrained && skewDrifted >= 1.8,
        f"planted drift failed to trip the retrain trigger: " +
          f"drifted $skewDrifted%.2f vs retrained $skewRetrained%.2f")
      // audit: the pre-retrain snapshots remain readable after the swap
      require(VersionedTable.read(s, root, Some(1L)).count() == n,
        "pre-retrain snapshot lost by the recommit")
      graft.llm.Similarity.ivfPqTopKFromIndex(
        corpus,
        VersionedTable.read(s, root).localCheckpoint(),
        cbs, queryIds = _ % 250 === 0, k = 3, nprobe = 2, m = 8,
        shortlist = 10)
        .orderBy("q_id", "rank")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(work))
    }
  }

  /** SELF-BLEU within (lang, source) blocks — the corpus DIVERSITY
    * monitor (Zhu et al.'s Texygen metric): each document scored against
    * its successor in the block with clipped n-gram matches for
    * n = 1..4; a templated/boilerplate source shows near-total overlap
    * long before exact dedup fires. Emitted as the EXACT INTEGER
    * sufficient statistics (clipped matches + totals + lengths) rather
    * than the geometric-mean BLEU — the ln/exp would be the only float
    * in the pipeline, and the counts are what a monitor thresholds
    * anyway. One grams pass per side with multiplicity (COUNT, not
    * DISTINCT — clipping needs true counts), n unrolled 1..4 by a tiny
    * broadcast; the only corpus-sized shuffles are the two gram-count
    * aggregates. Pairing is LEAD over (lang, source) — no self-join
    * explosion at any block size. */
  val selfBleu: Reg = Reg.sql(
    "llm_self_bleu",
    """WITH d AS (SELECT doc_id, lang, source,
      |                  string_split(text, ' ') AS w FROM documents),
      |p AS (SELECT doc_id, w,
      |             LEAD(doc_id) OVER (PARTITION BY lang, source
      |                                ORDER BY doc_id) AS ref_id
      |      FROM d),
      |pr AS (SELECT p.doc_id, p.ref_id, p.w AS cw, d2.w AS rw
      |       FROM p JOIN d d2 ON d2.doc_id = p.ref_id),
      |ns AS (SELECT UNNEST(generate_series(1, 4)) AS n),
      |cg AS (SELECT doc_id, n, gram, CAST(COUNT(*) AS BIGINT) AS c FROM (
      |         SELECT pr.doc_id, ns.n AS n,
      |                UNNEST(list_transform(
      |                  generate_series(1, len(cw) - ns.n + 1),
      |                  i -> array_to_string(cw[i:i+ns.n-1], ' '))) AS gram
      |         FROM pr, ns WHERE len(cw) >= ns.n)
      |       GROUP BY 1, 2, 3),
      |rg AS (SELECT doc_id, n, gram, CAST(COUNT(*) AS BIGINT) AS c FROM (
      |         SELECT pr.doc_id, ns.n AS n,
      |                UNNEST(list_transform(
      |                  generate_series(1, len(rw) - ns.n + 1),
      |                  i -> array_to_string(rw[i:i+ns.n-1], ' '))) AS gram
      |         FROM pr, ns WHERE len(rw) >= ns.n)
      |       GROUP BY 1, 2, 3),
      |m AS (SELECT cg.doc_id, cg.n,
      |             CAST(SUM(LEAST(cg.c, rg.c)) AS BIGINT) AS matches
      |      FROM cg JOIN rg ON rg.doc_id = cg.doc_id AND rg.n = cg.n
      |                     AND rg.gram = cg.gram
      |      GROUP BY 1, 2),
      |tot AS (SELECT pr.doc_id, pr.ref_id, ns.n AS n,
      |               CAST(GREATEST(len(cw) - ns.n + 1, 0) AS BIGINT)
      |                 AS total_grams,
      |               CAST(len(cw) AS BIGINT) AS cand_len,
      |               CAST(len(rw) AS BIGINT) AS ref_len
      |        FROM pr, ns)
      |SELECT t.doc_id, t.ref_id, CAST(t.n AS BIGINT) AS n,
      |       COALESCE(m.matches, 0) AS matches, t.total_grams,
      |       t.cand_len, t.ref_len
      |FROM tot t LEFT JOIN m ON m.doc_id = t.doc_id AND m.n = t.n
      |ORDER BY t.doc_id, n""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val d = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), col("source"),
        split(col("text"), " ", -1).as("w"))
    val p = d.withColumn("ref_id", lead("doc_id", 1).over(
      Window.partitionBy("lang", "source").orderBy("doc_id")))
    val pr = p.where(col("ref_id").isNotNull)
      .select(col("doc_id"), col("ref_id"), col("w").as("cw"))
      .join(d.select(col("doc_id").as("ref_id"), col("w").as("rw")),
        Seq("ref_id"))
      .localCheckpoint() // feeds both gram passes and the totals
    val ns = s.range(1, 5).select(col("id").cast("int").as("n"))
    def grams(side: String) = pr.crossJoin(broadcast(ns))
      .where(size(col(side)) >= col("n"))
      .select(col("doc_id"), col("n"), explode(expr(
        s"""transform(sequence(1, size($side) - n + 1),
           |  i -> array_join(slice($side, i, n), ' '))""".stripMargin))
        .as("gram"))
      .groupBy("doc_id", "n", "gram")
      .agg(count(lit(1)).cast("bigint").as("c"))
    val m = grams("cw").as("cg")
      .join(grams("rw").as("rg"),
        col("cg.doc_id") === col("rg.doc_id") && col("cg.n") === col("rg.n")
          && col("cg.gram") === col("rg.gram"))
      .groupBy(col("cg.doc_id").as("doc_id"), col("cg.n").as("n"))
      .agg(sum(least(col("cg.c"), col("rg.c"))).cast("bigint").as("matches"))
    val tot = pr.crossJoin(broadcast(ns))
      .select(col("doc_id"), col("ref_id"), col("n"),
        greatest(size(col("cw")) - col("n") + 1, lit(0)).cast("bigint")
          .as("total_grams"),
        size(col("cw")).cast("bigint").as("cand_len"),
        size(col("rw")).cast("bigint").as("ref_len"))
    tot.join(m, Seq("doc_id", "n"), "left")
      .select(col("doc_id"), col("ref_id"), col("n").cast("bigint").as("n"),
        coalesce(col("matches"), lit(0L)).as("matches"), col("total_grams"),
        col("cand_len"), col("ref_len"))
      .orderBy("doc_id", "n")
  }

  val all: Seq[Reg] =
    Seq(bigramLm, vocabCoverage, bpePairs, kmeansAssign, pqCodes,
      bpeRound2, charEntropy, filterCascade, hardNegatives, ngramNovelty,
      bpeK, bpeK64, bpeEncode, perplexityFilter, randProj, pmiCooccur,
      annPqAdc, annIvfPq, hardNegativesAnn, silhouette, streamIvfAssign,
      streamPqIndex, indexRetrain, tokenizerFertility, selfBleu)
}
