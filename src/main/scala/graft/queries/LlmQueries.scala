package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Training-data-pipeline operators over the `documents` and `embeddings`
  * tables (SQL-expressible subset; the LSH/MinHash/ANN scale paths live in
  * `graft.llm` with ScalaTest coverage and rows-only registration).
  *
  * Scale notes: exact dedup is a hash-groupBy on a 64-hex digest (one
  * shuffle, partial-aggregatable); text stats are pure per-row expressions
  * fused into the scan; none of these collect to the driver.
  */
object LlmQueries {

  /** Exact dedup via content hash (sha2 groupBy) — the baseline dedup every
    * 100 TB text pipeline starts with. */
  val exactDedup: Reg = Reg.sql(
    "llm_exact_dedup",
    """SELECT lang, COUNT(*) AS cnt,
      |       COUNT(DISTINCT sha256(text)) AS distinct_docs,
      |       COUNT(*) - COUNT(DISTINCT sha256(text)) AS dup_cnt
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir)
      .select(col("lang"), sha2(col("text"), 256).as("h"))
      .groupBy("lang")
      .agg(count(lit(1)).as("cnt"),
        countDistinct(col("h")).as("distinct_docs"),
        (count(lit(1)) - countDistinct(col("h"))).as("dup_cnt"))
      .orderBy("lang")
  }

  /** Token counting + length stats per language (whitespace tokenizer). */
  val textStats: Reg = Reg.sql(
    "llm_text_stats",
    """WITH t AS (
      |  SELECT lang, n_chars, LEN(STRING_SPLIT(text, ' ')) AS wc
      |  FROM documents)
      |SELECT lang, COUNT(*) AS cnt,
      |       ROUND(AVG(wc), 4) AS avg_words,
      |       MIN(wc) AS min_words, MAX(wc) AS max_words,
      |       ROUND(AVG(n_chars), 4) AS avg_chars
      |FROM t GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir)
      .select(col("lang"), col("n_chars"),
        size(split(col("text"), " ", -1)).cast("bigint").as("wc"))
      .groupBy("lang")
      .agg(count(lit(1)).as("cnt"),
        round(avg("wc"), 4).as("avg_words"),
        min("wc").as("min_words"), max("wc").as("max_words"),
        round(avg("n_chars"), 4).as("avg_chars"))
      .orderBy("lang")
  }

  /** Quality scoring: length factor + stopword-ratio factor, clamped to [0,1]
    * (the standard pretraining-corpus heuristic family). */
  val qualityScore: Reg = Reg.sql(
    "llm_quality_score",
    """WITH t AS (
      |  SELECT source,
      |         LEN(STRING_SPLIT(text, ' ')) AS wc,
      |         LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
      |                         w -> w IN ('the', 'a', 'of', 'and'))) AS stop_cnt,
      |         n_chars
      |  FROM documents),
      |sc AS (
      |  SELECT source,
      |         LEAST(1.0, 0.3 + 0.4 * LEAST(n_chars / 500.0, 1.0)
      |                  + 0.3 * LEAST(5.0 * stop_cnt / wc, 1.0)) AS score
      |  FROM t WHERE wc > 0)
      |SELECT source, COUNT(*) AS cnt, ROUND(AVG(score), 4) AS avg_score
      |FROM sc GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
    val words = split(col("text"), " ", -1)
    val stopCnt = size(filter(words,
      w => w === "the" || w === "a" || w === "of" || w === "and"))
    val score = least(lit(1.0),
      lit(0.3) + lit(0.4) * least(col("n_chars") / 500.0, lit(1.0)) +
        lit(0.3) * least(lit(5.0) * stopCnt / size(words), lit(1.0)))
    Tables.documents(s, dir)
      .select(col("source"), size(words).as("wc"), score.as("score"))
      .where(col("wc") > 0)
      .groupBy("source")
      .agg(count(lit(1)).as("cnt"), round(avg("score"), 4).as("avg_score"))
      .orderBy("source")
  }

  /** Language-ID by marker-token heuristic, cross-tabbed against the labeled
    * lang column (n-gram/marker heuristic family; deterministic). */
  val langIdHeuristic: Reg = Reg.sql(
    "llm_langid_heuristic",
    """WITH p AS (
      |  SELECT lang,
      |         CASE WHEN text LIKE '%the%' THEN 'en'
      |              WHEN text LIKE '%data%' THEN 'dataish'
      |              ELSE 'unk' END AS pred_lang
      |  FROM documents)
      |SELECT lang, pred_lang, COUNT(*) AS cnt
      |FROM p GROUP BY lang, pred_lang ORDER BY lang, pred_lang""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir)
      .select(col("lang"),
        when(col("text").like("%the%"), "en")
          .when(col("text").like("%data%"), "dataish")
          .otherwise("unk").as("pred_lang"))
      .groupBy("lang", "pred_lang")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("lang", "pred_lang")
  }

  /** Document fingerprinting: stable 64-bit-ish content fingerprint (prefix
    * of the content hash) — join-key shape for incremental dedup. */
  val fingerprint: Reg = Reg.sql(
    "llm_fingerprint",
    """SELECT doc_id, SUBSTRING(sha256(text), 1, 16) AS fp
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir)
      .select(col("doc_id"), substring(sha2(col("text"), 256), 1, 16).as("fp"))
      .orderBy("doc_id")
  }

  val all: Seq[Reg] = Seq(exactDedup, textStats, qualityScore, langIdHeuristic, fingerprint)
}
