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

  /** Train `k` BPE merges with ONE Spark job, however large `k` is — the
    * shape that survives a real 50k-merge production vocabulary, where
    * [[trainMerges]]'s one-aggregation-per-round loop would submit 50k
    * Spark jobs.
    *
    * The insight (how HuggingFace tokenizers / SentencePiece train): BPE
    * never needs the corpus after the initial word count — its entire
    * loop state is the (word, frequency) table, vocabulary-sized by
    * Heaps' law. So: one distributed `groupBy(w).count` pass builds the
    * vocab, ONE bounded collect brings it to the driver, and the full
    * merge loop runs in memory with INCREMENTAL pair-count maintenance —
    * each merge touches only the words containing the merged pair (an
    * inverted pair→words index), the textbook O(affected)-per-round
    * trainer. Result is bit-identical to [[trainMerges]]: same pair
    * windows (overlapping counted), same left-to-right non-overlapping
    * replace, same (cnt DESC, pair ASC) argmax total order.
    *
    * At warehouse scale the vocab collect is the one driver-sized object
    * (~10⁷ distinct words for a 100 TB web corpus); the standard
    * production knob when that overflows is a min-count cutoff on the
    * vocab (`minCount`) — hapax pruning, the same approximation every
    * production trainer applies.
    *
    * Placeholder symbols are injectable (`placeholder`): the default
    * chr(1..k) control-char scheme caps k at 31 before colliding with
    * printable text; larger vocabularies pass a private-use-area mapping
    * (e.g. U+E000+r) that no corpus character can collide with.
    */
  def trainMergesDriver(
      spark: SparkSession,
      words: DataFrame,
      wCol: String,
      k: Int,
      placeholder: Int => Char = _.toChar,
      minCount: Long = 1L): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    val phs = (1 to k).map(placeholder)
    require(phs.distinct.length == phs.length, "placeholder must be injective")

    // THE one Spark job: vocabulary aggregation + bounded collect
    // (Heaps-law-sized; minCount is the overflow knob).
    val vocab = words.select(col(wCol).as("w"))
      .where(length(col("w")) >= 2)
      .groupBy("w").agg(count(lit(1)).as("wcnt"))
      .where(col("wcnt") >= minCount)
      .collect().map(r => (r.getString(0), r.getLong(1)))

    val merges = trainInMemory(vocab, k, placeholder)
    spark.createDataFrame(
      java.util.Arrays.asList(
        merges.map { case (r, m, c) => Row(r, m, c) }: _*), outSchema)
      .orderBy("round")
  }

  /** UTF-8-byte-order string comparison (== code-point order), matching
    * Spark's UTF8String and DuckDB's collation — the shared
    * [[graft.functions.Collation]] device (aliased here for the argmax
    * hot loop and the specs that pin it). */
  private[graft] def codePointCompare(a: String, b: String): Int =
    graft.functions.Collation.codePointCompare(a, b)

  /** The in-memory merge loop over a (word, count) vocabulary —
    * incremental pair counts via an inverted pair→slots index, so each
    * round costs O(words containing the merged pair), not O(vocab).
    * Exposed for property tests. */
  private[graft] def trainInMemory(
      vocab: Array[(String, Long)],
      k: Int,
      placeholder: Int => Char): Seq[(Long, String, Long)] = {
    import scala.collection.mutable
    val wArr = vocab.map(_._1)
    val cArr = vocab.map(_._2)
    val pc = mutable.HashMap.empty[String, Long]
    val idx = mutable.HashMap.empty[String, mutable.Set[Int]]

    // Pair windows iterate by CODE POINT, not UTF-16 unit: the distributed
    // trainer and the DuckDB oracle window with substring(w, i, 2) over
    // code points (Spark's UTF8String and DuckDB both count code points),
    // so a UTF-16 walk would split surrogate pairs and diverge on the
    // exact non-BMP corpora the codePointCompare tie-break exists for.
    def eachPair(w: String)(f: String => Unit): Unit = {
      var j = 0
      while (j < w.length) {
        val n1 = Character.charCount(w.codePointAt(j))
        if (j + n1 < w.length) {
          val n2 = Character.charCount(w.codePointAt(j + n1))
          f(w.substring(j, j + n1 + n2))
        }
        j += n1
      }
    }
    def add(i: Int): Unit = {
      val c = cArr(i)
      eachPair(wArr(i)) { p =>
        pc.update(p, pc.getOrElse(p, 0L) + c)
        idx.getOrElseUpdate(p, mutable.Set.empty) += i
      }
    }
    def remove(i: Int): Unit = {
      val c = cArr(i)
      eachPair(wArr(i)) { p =>
        val n = pc(p) - c
        if (n == 0L) { pc.remove(p); () } else pc.update(p, n)
        idx.get(p).foreach { s => s -= i; if (s.isEmpty) idx.remove(p) }
      }
    }
    wArr.indices.foreach(add)

    val out = Seq.newBuilder[(Long, String, Long)]
    var round = 1
    var dry = false
    while (round <= k && !dry) {
      if (pc.isEmpty) dry = true
      else {
        // argmax under the same total order as the distributed trainer:
        // cnt DESC, pair ASC in CODE POINT order — Spark/DuckDB compare
        // strings by UTF-8 bytes, which is code-point order; Java's
        // UTF-16 compareTo diverges from it when a supplementary
        // (non-BMP) character meets a char >= U+E000
        var bestP: String = null
        var bestC = -1L
        pc.foreach { case (p, c) =>
          if (c > bestC || (c == bestC && codePointCompare(p, bestP) < 0)) {
            bestP = p; bestC = c
          }
        }
        out += ((round.toLong, bestP, bestC))
        val ph = placeholder(round).toString
        // only words containing the merged pair change — snapshot, rewrite
        val affected = idx.get(bestP).map(_.toArray).getOrElse(Array.empty)
        affected.foreach { i =>
          remove(i)
          // left-to-right non-overlapping, same as SQL replace()
          wArr(i) = wArr(i).replace(bestP, ph)
          add(i)
        }
        round += 1
      }
    }
    out.result()
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
      merges: Seq[(Long, String)],
      keepCols: Seq[String] = Nil): DataFrame = {
    var enc = words.select((keepCols.map(col) :+ col(wCol).as("w")): _*)
    merges.sortBy(_._1).foreach { case (round, mp) =>
      enc = enc.select((keepCols.map(col) :+
        replace(col("w"), lit(mp), lit(round.toInt.toChar.toString)).as("w")): _*)
    }
    enc
  }

  /** DuckDB restatement of `trainMerges` for a given k: the same
    * argmax-merge-recount loop unrolled into k chained CTEs over the raw
    * word stream (COUNT(*) over the stream ≡ SUM(wcnt) over the vocab —
    * exact integer equivalence, so engine-side compression is invisible
    * to the gate). */
  def oracleSqlFor(k: Int, chrOf: Int => Int = identity): String = {
    // every CTE is MATERIALIZED: each w<r> is referenced twice (pair scan
    // + next round), and inlining would both re-open the parquet file per
    // reference (fd exhaustion at k=64) and re-derive the chain
    val sb = new StringBuilder
    sb.append("WITH wd AS MATERIALIZED (SELECT UNNEST(string_split(text, ' ')) AS w FROM documents),\n")
    sb.append("w0 AS MATERIALIZED (SELECT w FROM wd WHERE length(w) >= 2)")
    for (r <- 1 to k) {
      val prev = s"w${r - 1}"
      sb.append(s""",
p$r AS MATERIALIZED (SELECT UNNEST(list_transform(generate_series(1, length(w) - 1),
          i -> substr(w, i, 2))) AS pair FROM $prev),
t$r AS MATERIALIZED (SELECT pair AS mp, CAST(COUNT(*) AS BIGINT) AS cnt FROM p$r
        GROUP BY pair ORDER BY cnt DESC, pair LIMIT 1),
w$r AS MATERIALIZED (SELECT w FROM (SELECT replace(w, (SELECT mp FROM t$r), chr(${chrOf(r)})) AS w
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
  /** DuckDB restatement of train-then-encode + the per-SOURCE fertility
    * rollup (`llm_tokenizer_fertility`): the k training rounds are the
    * `encodeOracleSqlFor` chain, the encode pass carries `source`, and
    * fertility is exact integer permille (tokens·1000 // words). */
  def fertilityOracleSqlFor(k: Int): String = {
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
    sb.append(""",
se0 AS (SELECT source, w FROM (
          SELECT source, UNNEST(string_split(text, ' ')) AS w FROM documents)
        WHERE length(w) >= 1)""")
    for (r <- 1 to k) {
      sb.append(s""",
se$r AS (SELECT source, replace(w, (SELECT mp FROM t$r), chr($r)) AS w
         FROM se${r - 1})""")
    }
    sb.append(s"""
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(length(w)) AS BIGINT) AS n_tokens,
       CAST(SUM(length(w)) * 1000 // COUNT(*) AS BIGINT) AS fertility_permille
FROM se$k GROUP BY source ORDER BY source""")
    sb.toString
  }

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
