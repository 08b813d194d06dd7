package graft.llm

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Iterative BPE merge training (Sennrich et al., "Neural Machine
  * Translation of Rare Words with Subword Units") as a distributed
  * operator: "find the most frequent adjacent symbol pair, merge it
  * everywhere, recount, repeat k times" — the loop body of tokenizer
  * training that `llm_bpe_pairs`/`llm_bpe_round2` hand-unrolled for one
  * and two rounds.
  *
  * Scale shape (the reason this is NOT a per-round pass over the corpus):
  * the loop state is the WORD-FREQUENCY table (w, wcnt) — vocabulary-sized
  * by Heaps' law, ≪ corpus — exactly how production BPE trainers
  * (HuggingFace tokenizers, SentencePiece) train. The raw token stream is
  * read ONCE to build the vocab; each round then costs one explode+groupBy
  * over the vocab for pair counts plus one map+groupBy to apply the merge,
  * with `localCheckpoint` cutting lineage so the plan stays flat across
  * rounds (the ConnectedComponents loop discipline). The merge TABLE is
  * driver-sized by definition (k rows — it IS the trained artifact), so
  * the one-row argmax collect per round is bounded, not a data-sized
  * funnel.
  *
  * Merged units are represented by single placeholder symbols chr(1..k)
  * (control characters, absent from any text corpus), so "pair" stays a
  * 2-symbol window at every round — BPE's symbol-pair semantics where a
  * merged unit counts as ONE symbol.
  *
  * Determinism: counts are exact BIGINTs and the per-round argmax is taken
  * under the total order (cnt DESC, pair ASC), so every round's merge — and
  * therefore the whole table — is reproducible on any partitioning.
  */
object Bpe {

  private val outSchema = StructType(Seq(
    StructField("round", LongType, nullable = false),
    StructField("merged", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false)))

  /** Train `k` BPE merges over a word column.
    *
    * @param words frame with one string column `wCol` (the raw token
    *              stream; duplicates expected — frequencies matter)
    * @return merge table (round BIGINT, merged STRING, cnt BIGINT),
    *         one row per executed round (fewer than k if pairs run dry),
    *         ordered by round
    */
  def trainMerges(
      spark: SparkSession,
      words: DataFrame,
      wCol: String,
      k: Int): DataFrame = {
    require(k >= 1 && k <= 31,
      s"k=$k: placeholder symbols are chr(1..k) control chars, so k <= 31")

    // Heaps-law compression: loop state is (w, wcnt), vocabulary-sized.
    var vocab = words.select(col(wCol).as("w"))
      .where(length(col("w")) >= 2)
      .groupBy("w").agg(count(lit(1)).as("wcnt"))
      .localCheckpoint(false)

    val merges = Seq.newBuilder[Row]
    var round = 1
    var dry = false
    while (round <= k && !dry) {
      val top = vocab
        .select(explode(expr(
          "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
          .as("pair"), col("wcnt"))
        .groupBy("pair").agg(sum("wcnt").as("cnt"))
        .orderBy(desc("cnt"), asc("pair")).limit(1)
        .collect()
      if (top.isEmpty) dry = true
      else {
        val mp = top.head.getString(0)
        val cnt = top.head.getLong(1)
        merges += Row(round.toLong, mp, cnt)
        val next = vocab
          .select(replace(col("w"), lit(mp), lit(round.toChar.toString)).as("w"),
            col("wcnt"))
          .where(length(col("w")) >= 2)
          // distinct words can collapse onto the same symbol string
          .groupBy("w").agg(sum("wcnt").as("wcnt"))
          .localCheckpoint(false)
        vocab.unpersist()
        vocab = next
        round += 1
      }
    }
    vocab.unpersist()
    spark.createDataFrame(
      java.util.Arrays.asList(merges.result(): _*), outSchema)
      .orderBy("round")
  }

  /** Apply a trained merge table to a word column — the ENCODE half of the
    * tokenizer: each word has the merges applied in training order (round 1
    * first; BPE's apply order IS its train order), yielding the symbol
    * string whose characters are the final tokens. No length filter here —
    * unlike training (where sub-2-symbol words can't contribute pairs),
    * encoding must keep every word. One narrow map pass: the merge table is
    * a driver-side array of k literals baked into the plan (broadcast by
    * construction), the corpus is never shuffled. */
  def encode(
      words: DataFrame,
      wCol: String,
      merges: Seq[(Long, String)]): DataFrame = {
    var enc = words.select(col(wCol).as("w"))
    merges.sortBy(_._1).foreach { case (round, mp) =>
      enc = enc.select(
        replace(col("w"), lit(mp), lit(round.toInt.toChar.toString)).as("w"))
    }
    enc
  }

  /** DuckDB restatement of `trainMerges` for a given k: the same
    * argmax-merge-recount loop unrolled into k chained CTEs over the raw
    * word stream (COUNT(*) over the stream ≡ SUM(wcnt) over the vocab —
    * exact integer equivalence, so engine-side compression is invisible
    * to the gate). */
  def oracleSqlFor(k: Int): String = {
    val sb = new StringBuilder
    sb.append("WITH wd AS (SELECT UNNEST(string_split(text, ' ')) AS w FROM documents),\n")
    sb.append("w0 AS (SELECT w FROM wd WHERE length(w) >= 2)")
    for (r <- 1 to k) {
      val prev = s"w${r - 1}"
      sb.append(s""",
p$r AS (SELECT UNNEST(list_transform(generate_series(1, length(w) - 1),
          i -> substr(w, i, 2))) AS pair FROM $prev),
t$r AS (SELECT pair AS mp, CAST(COUNT(*) AS BIGINT) AS cnt FROM p$r
        GROUP BY pair ORDER BY cnt DESC, pair LIMIT 1),
w$r AS (SELECT w FROM (SELECT replace(w, (SELECT mp FROM t$r), chr($r)) AS w
                       FROM $prev) WHERE length(w) >= 2)""")
    }
    sb.append("\n")
    sb.append((1 to k)
      .map(r => s"SELECT CAST($r AS BIGINT) AS round, mp AS merged, cnt FROM t$r")
      .mkString("\nUNION ALL "))
    sb.append("\nORDER BY round")
    sb.toString
  }

  /** DuckDB restatement of train-then-ENCODE: the training CTE chain for
    * the merge pairs, then a second replace chain over the UNFILTERED word
    * stream (encoding keeps every word), then per-symbol counts of the
    * encoded corpus — the token-frequency table a sampler consumes. */
  def encodeOracleSqlFor(k: Int, topN: Int): String = {
    val sb = new StringBuilder
    sb.append("WITH wd AS (SELECT UNNEST(string_split(text, ' ')) AS w FROM documents),\n")
    sb.append("w0 AS (SELECT w FROM wd WHERE length(w) >= 2)")
    for (r <- 1 to k) {
      val prev = s"w${r - 1}"
      sb.append(s""",
p$r AS (SELECT UNNEST(list_transform(generate_series(1, length(w) - 1),
          i -> substr(w, i, 2))) AS pair FROM $prev),
t$r AS (SELECT pair AS mp, CAST(COUNT(*) AS BIGINT) AS cnt FROM p$r
        GROUP BY pair ORDER BY cnt DESC, pair LIMIT 1),
w$r AS (SELECT w FROM (SELECT replace(w, (SELECT mp FROM t$r), chr($r)) AS w
                       FROM $prev) WHERE length(w) >= 2)""")
    }
    sb.append(",\ne0 AS (SELECT w FROM wd WHERE length(w) >= 1)")
    for (r <- 1 to k) {
      sb.append(s""",
e$r AS (SELECT replace(w, (SELECT mp FROM t$r), chr($r)) AS w FROM e${r - 1})""")
    }
    sb.append(s""",
sym AS (SELECT UNNEST(list_transform(generate_series(1, length(w)),
          i -> substr(w, i, 1))) AS sym FROM e$k)
SELECT sym, CAST(COUNT(*) AS BIGINT) AS cnt FROM sym
GROUP BY sym ORDER BY cnt DESC, sym LIMIT $topN""")
    sb.toString
  }
}
