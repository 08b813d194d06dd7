package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Round-9 tokenizer/LM completions: the two statistical-tokenization
  * operators the BPE family (train / iterate / encode) still lacked, plus
  * nothing else — segmentation inference and state-of-the-art smoothing.
  *
  *  - llm_unigram_viterbi — SentencePiece-style unigram-LM segmentation
  *    (Kudo 2018): induce a substring vocabulary with -log-likelihood
  *    costs from the corpus, then run the Viterbi DP to find each word's
  *    minimum-cost segmentation. The DP is a per-row `aggregate` over
  *    char positions (O(n·Lmax) per word, no shuffle); the vocabulary is
  *    vocabulary-sized (Heaps' law) and broadcast to the word frame. At
  *    100 TB the segmentation pass is a narrow map over the token stream
  *    with one broadcast — the exact shape SentencePiece inference has
  *    inside a tokenizer worker, here as a declarative plan. Costs are
  *    floor-quantized to BIGINT micro-nats BEFORE the DP, so every
  *    addition/min is exact integer arithmetic in both engines; the
  *    DuckDB oracle re-derives the same optimum by exhaustive recursive
  *    path enumeration (bounded: parts ≤ 3, len ≤ 12 ⇒ ≤ 927 paths/word),
  *    so the gate proves the linear DP against brute force.
  *  - llm_kneser_ney — interpolated Kneser-Ney bigram smoothing (Kneser &
  *    Ney 1995, Chen & Goodman 1999), the standard n-gram LM estimator
  *    KenLM implements: absolute discount D=0.75 with continuation-count
  *    backoff. All four count frames (pair, left-context, right-
  *    continuation, type total) are vocabulary-sized aggregates of one
  *    bigram stream — at 100 TB the token explode is the only
  *    data-proportional pass; everything after is vocab-sized joins.
  */
object TokenizerQueries {

  private val SENT = "CAST(2000000000000000 AS BIGINT)"

  /** Unigram-LM Viterbi segmentation. Pieces are all substrings of length
    * 1..3; cost(piece) = -ln(cnt/total) in floor-micro-nats; single-char
    * pieces are always kept so the DP is total. Output: per selected word
    * (top-200 by frequency, len ≤ 12) the minimum total segmentation cost
    * — unique regardless of tie-breaking, hence hash-stable. */
  val unigramViterbi: Reg = Reg.sql(
    "llm_unigram_viterbi",
    """WITH RECURSIVE
      |tok AS (SELECT UNNEST(string_split(text, ' ')) AS w FROM documents),
      |wf AS (SELECT w, COUNT(*) AS freq FROM tok WHERE w <> '' GROUP BY 1),
      |pi AS (SELECT w, freq, UNNEST(generate_series(1, len(w))) AS i FROM wf),
      |pl AS (SELECT w, freq, i,
      |         UNNEST(generate_series(1, least(3, i))) AS l FROM pi),
      |pc AS (SELECT substr(w, i - l + 1, l) AS piece, SUM(freq) AS cnt
      |       FROM pl GROUP BY 1),
      |tt AS (SELECT SUM(cnt) AS t FROM pc),
      |vocab AS (SELECT piece,
      |            CAST(FLOOR(-LN(CAST(cnt AS DOUBLE) / CAST(t AS DOUBLE))
      |                       * 1e6) AS BIGINT) AS c
      |          FROM pc CROSS JOIN tt WHERE cnt >= 5 OR len(piece) = 1),
      |sel AS (SELECT w, freq FROM wf WHERE len(w) <= 12
      |        ORDER BY freq DESC, w LIMIT 200),
      |dp AS (
      |  SELECT w, 0 AS pos, CAST(0 AS BIGINT) AS cost FROM sel
      |  UNION ALL
      |  SELECT dp.w, dp.pos + l.l AS pos, dp.cost + v.c AS cost
      |  FROM dp
      |  CROSS JOIN (SELECT UNNEST([1, 2, 3]) AS l) l
      |  JOIN vocab v ON v.piece = substr(dp.w, dp.pos + 1, l.l)
      |  WHERE dp.pos + l.l <= len(dp.w))
      |SELECT s.w AS word, s.freq, MIN(dp.cost) AS best_cost_micro
      |FROM dp JOIN sel s ON s.w = dp.w
      |WHERE dp.pos = len(dp.w)
      |GROUP BY 1, 2 ORDER BY word""".stripMargin) { (s, dir) =>
    val tok = Tables.documents(s, dir)
      .select(explode(split(col("text"), " ", -1)).as("w"))
      .where(col("w") =!= "")
    val wf = tok.groupBy("w").agg(count(lit(1)).as("freq"))
    // piece counts: every substring of length 1..3, weighted by word freq
    val pieces = wf
      .select(col("w"), col("freq"),
        explode(expr("sequence(1, length(w))")).as("i"))
      .select(col("w"), col("freq"), col("i"),
        explode(expr("sequence(1, least(3, i))")).as("l"))
      .select(expr("substring(w, i - l + 1, l)").as("piece"), col("freq"))
      .groupBy("piece").agg(sum("freq").as("cnt"))
    val tot = pieces.agg(sum("cnt").as("t"))
    val vocab = pieces.crossJoin(broadcast(tot))
      .where(col("cnt") >= 5 || length(col("piece")) === 1)
      .select(col("piece"),
        expr("CAST(FLOOR(-LN(CAST(cnt AS DOUBLE) / CAST(t AS DOUBLE)) * 1e6) AS BIGINT)")
          .as("c"))
    val sel = wf.where(length(col("w")) <= 12)
      .orderBy(desc("freq"), asc("w")).limit(200)
    // cost grid: cs[(i-1)*3 + l] = cost of piece ending at i with length l,
    // SENT where the piece is out of range or not in the vocabulary
    val grid = sel
      .select(col("w"), col("freq"),
        explode(expr("sequence(1, length(w))")).as("i"))
      .select(col("w"), col("freq"), col("i"),
        explode(expr("sequence(1, 3)")).as("l"))
      .withColumn("piece",
        when(col("l") <= col("i"), expr("substring(w, i - l + 1, l)")))
      .join(broadcast(vocab), Seq("piece"), "left")
      .select(col("w"), col("freq"),
        ((col("i") - 1) * 3 + col("l")).as("idx"),
        coalesce(col("c"), expr(SENT)).as("cc"))
    val cs = grid.groupBy("w", "freq")
      .agg(expr("transform(array_sort(collect_list(struct(idx, cc))), x -> x.cc)")
        .as("cs"))
    // Viterbi: best[i] = min over piece length l of best[i-l] + cost; the
    // accumulator is the growing best[] array (index j+1 holds best[j])
    cs.select(col("w").as("word"), col("freq"),
        expr(s"""element_at(
                |  aggregate(sequence(1, length(w)), array(CAST(0 AS BIGINT)),
                |    (acc, i) -> concat(acc, array(least(
                |      element_at(acc, i) + element_at(cs, (i - 1) * 3 + 1),
                |      CASE WHEN i >= 2
                |           THEN element_at(acc, i - 1) + element_at(cs, (i - 1) * 3 + 2)
                |           ELSE $SENT END,
                |      CASE WHEN i >= 3
                |           THEN element_at(acc, i - 2) + element_at(cs, (i - 1) * 3 + 3)
                |           ELSE $SENT END)))),
                |  length(w) + 1)""".stripMargin).as("best_cost_micro"))
      .orderBy("word")
  }

  /** Interpolated Kneser-Ney bigram probabilities for the 100 most
    * frequent bigrams: P(w2|w1) = (c_ab - D)/c_a + D·N1+(w1·)/c_a ·
    * N1+(·w2)/|pairs|, D = 0.75. One LN per output row over an identical
    * IEEE op tree in both engines, floor-quantized to micro-nats. */
  val kneserNey: Reg = Reg.sql(
    "llm_kneser_ney",
    """WITH w AS (SELECT string_split(text, ' ') AS w FROM documents),
      |pr AS (SELECT UNNEST(list_transform(generate_series(1, len(w) - 1),
      |         i -> {'w1': w[i], 'w2': w[i + 1]})) AS p
      |       FROM w WHERE len(w) >= 2),
      |cab AS (SELECT p.w1 AS w1, p.w2 AS w2, COUNT(*) AS c_ab
      |        FROM pr GROUP BY 1, 2),
      |ca AS (SELECT w1, SUM(c_ab) AS c_a, COUNT(*) AS n1p_a
      |       FROM cab GROUP BY 1),
      |cb AS (SELECT w2, COUNT(*) AS nc_b FROM cab GROUP BY 1),
      |np AS (SELECT COUNT(*) AS npairs FROM cab),
      |top AS (SELECT cab.w1 AS w1, cab.w2 AS w2, c_ab,
      |  CAST(FLOOR(LN(((CAST(c_ab AS DOUBLE) - 0.75) / CAST(c_a AS DOUBLE)) +
      |    (0.75 * CAST(n1p_a AS DOUBLE) / CAST(c_a AS DOUBLE)) *
      |    (CAST(nc_b AS DOUBLE) / CAST(npairs AS DOUBLE))) * 1e6) AS BIGINT)
      |    AS kn_micro
      |  FROM cab JOIN ca ON ca.w1 = cab.w1 JOIN cb ON cb.w2 = cab.w2
      |  CROSS JOIN np
      |  ORDER BY c_ab DESC, cab.w1, cab.w2 LIMIT 100)
      |SELECT w1, w2, c_ab, kn_micro FROM top ORDER BY w1, w2""".stripMargin) {
    (s, dir) =>
      val ws = Tables.documents(s, dir)
        .select(split(col("text"), " ", -1).as("w"))
        .where(size(col("w")) >= 2)
      val pr = ws.select(explode(expr(
          """transform(sequence(1, size(w) - 1),
            |  i -> struct(element_at(w, i) AS w1, element_at(w, i + 1) AS w2))"""
            .stripMargin)).as("p"))
        .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      val cab = pr.groupBy("w1", "w2").agg(count(lit(1)).as("c_ab"))
      val ca = cab.groupBy("w1")
        .agg(sum("c_ab").as("c_a"), count(lit(1)).as("n1p_a"))
      val cb = cab.groupBy("w2").agg(count(lit(1)).as("nc_b"))
      val np = cab.agg(count(lit(1)).as("npairs"))
      cab.join(ca, "w1").join(cb, "w2").crossJoin(broadcast(np))
        .select(col("w1"), col("w2"), col("c_ab"),
          expr("""CAST(FLOOR(LN(((CAST(c_ab AS DOUBLE) - 0.75) / CAST(c_a AS DOUBLE)) +
                 |  (0.75 * CAST(n1p_a AS DOUBLE) / CAST(c_a AS DOUBLE)) *
                 |  (CAST(nc_b AS DOUBLE) / CAST(npairs AS DOUBLE))) * 1e6) AS BIGINT)"""
            .stripMargin).as("kn_micro"))
        .orderBy(desc("c_ab"), asc("w1"), asc("w2")).limit(100)
        .orderBy("w1", "w2")
  }

  /** Greedy longest-match subword segmentation — the WordPiece-family
    * encoder, completing the tokenizer triad (BPE = merge-based,
    * unigram-Viterbi = DP-based, this = greedy longest-prefix). Vocab is
    * corpus-derived and deterministic: every single character plus the
    * top-50 substrings of length 2–4 (all positions, multiplicity,
    * weighted by word frequency; cnt DESC, piece ASC total order).
    * Encoding runs per DISTINCT word (Heaps-law compression — each word
    * encodes once, its pieces weighted by frequency): at each position
    * take the longest vocab piece (4→3→2, else the single char, which is
    * always in vocab so the walk is total). The vocab is a ≤(50+alphabet)
    * driver set baked into one JIT'd map pass — the corpus never shuffles
    * to encode; only the final piece count aggregates. Oracle: the same
    * greedy walk as a recursive CTE with per-length IN membership. */
  val subwordGreedy: Reg = Reg.sql(
    "llm_subword_greedy",
    """WITH RECURSIVE
      |tok AS (SELECT UNNEST(string_split(text, ' ')) AS w FROM documents),
      |wf AS (SELECT w, COUNT(*) AS freq FROM tok WHERE w <> '' GROUP BY 1),
      |pi AS (SELECT w, freq, UNNEST(generate_series(1, len(w))) AS i FROM wf),
      |pl AS (SELECT w, freq, i,
      |         UNNEST(generate_series(2, least(4, i))) AS l FROM pi
      |       WHERE i >= 2),
      |pc AS (SELECT substr(w, i - l + 1, l) AS piece, SUM(freq) AS cnt
      |       FROM pl GROUP BY 1),
      |top AS (SELECT piece FROM pc ORDER BY cnt DESC, piece LIMIT 50),
      |chars AS (SELECT DISTINCT substr(w, i, 1) AS piece FROM pi),
      |vocab AS (SELECT piece FROM top UNION SELECT piece FROM chars),
      |enc AS (
      |  SELECT w, freq, 0 AS pos, CAST(NULL AS VARCHAR) AS piece FROM wf
      |  UNION ALL
      |  SELECT w, freq, pos + plen, substr(w, pos + 1, plen)
      |  FROM (SELECT w, freq, pos,
      |          CASE WHEN substr(w, pos + 1, 4) IN
      |                 (SELECT piece FROM vocab WHERE len(piece) = 4) THEN 4
      |               WHEN substr(w, pos + 1, 3) IN
      |                 (SELECT piece FROM vocab WHERE len(piece) = 3) THEN 3
      |               WHEN substr(w, pos + 1, 2) IN
      |                 (SELECT piece FROM vocab WHERE len(piece) = 2) THEN 2
      |               ELSE 1 END AS plen
      |        FROM enc WHERE pos < len(w)))
      |SELECT piece, CAST(SUM(freq) AS BIGINT) AS cnt
      |FROM enc WHERE piece IS NOT NULL
      |GROUP BY piece ORDER BY cnt DESC, piece LIMIT 30""".stripMargin) {
    (s, dir) =>
      val wf = Tables.documents(s, dir)
        .select(explode(split(col("text"), " ", -1)).as("w"))
        .where(col("w") =!= "")
        .groupBy("w").agg(count(lit(1)).as("freq"))
        .localCheckpoint(false) // vocab induction + encode share it
      // vocab: top-50 substrings len 2..4 (all positions, multiplicity)
      val topPieces = wf
        .select(col("w"), col("freq"),
          explode(expr("sequence(1, length(w))")).as("i"))
        .where(col("i") >= 2)
        .select(col("w"), col("freq"), col("i"),
          explode(expr("sequence(2, least(4, i))")).as("l"))
        .select(expr("substring(w, i - l + 1, l)").as("piece"), col("freq"))
        .groupBy("piece").agg(sum("freq").as("cnt"))
        .orderBy(desc("cnt"), asc("piece")).limit(50)
        .collect().map(_.getString(0))
      val chars = wf
        .select(explode(expr(
          "transform(sequence(1, length(w)), i -> substring(w, i, 1))"))
          .as("piece"))
        .distinct().collect().map(_.getString(0))
      val vocab = (topPieces ++ chars).toSet
      val encodeUdf = udf { w: String => greedyEncode(vocab, w) }
      wf.select(explode(encodeUdf(col("w"))).as("piece"), col("freq"))
        .groupBy("piece").agg(sum("freq").cast("bigint").as("cnt"))
        .orderBy(desc("cnt"), asc("piece")).limit(30)
  }

  /** The greedy longest-match walk, by CODE POINT — the vocab pieces come
    * from Spark `substring` (code-point semantics) and the oracle walks
    * with DuckDB `substr` (likewise), so a UTF-16-unit walk would split
    * surrogate pairs and match pieces the engines never built (the Bpe
    * pair-window defect class; CollationSpec pins this rendering).
    * Exposed for that spec. */
  private[graft] def greedyEncode(vocab: Set[String], w: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val ncp = w.codePointCount(0, w.length)
    var p = 0 // code-point index
    var off = 0 // UTF-16 offset of p
    while (p < ncp) {
      var l = math.min(4, ncp - p)
      while (l > 1 && !vocab.contains(w.substring(off, w.offsetByCodePoints(off, l))))
        l -= 1
      val end = w.offsetByCodePoints(off, l)
      out += w.substring(off, end)
      p += l
      off = end
    }
    out.toSeq
  }

  val all: Seq[Reg] = Seq(unigramViterbi, kneserNey, subwordGreedy)
}
