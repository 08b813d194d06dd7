package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis scalar operators for a pretraining-data pipeline — all pure
  * Column expressions (codegen'd, fused with the scan; zero UDFs).
  */
object TextAnalysis {

  /** Whitespace token count (trailing empties preserved ↔ DuckDB parity). */
  def tokenCount(text: Column): Column = size(split(text, " ", -1))

  /** BPE-ish token estimate: word count + punctuation marks + one extra per
    * 4 chars of long words (the standard chars/4 heuristic, deterministic). */
  def tokenEstimate(text: Column): Column = {
    val words = split(text, "\\s+")
    val punct = length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))
    val longWordExtra = aggregate(
      transform(words, w => greatest(lit(0), floor((length(w) - 4) / 4).cast("int"))),
      lit(0), (acc, x) => acc + x)
    size(words) + punct + longWordExtra
  }

  /** Marker-token language-ID heuristic (n-gram family): first matching
    * marker wins; "unk" otherwise. Deterministic, SQL-parity shape. */
  def langId(text: Column): Column =
    when(text.like("%the%") || text.like("% and %"), "en")
      .when(text.like("% der %") || text.like("% und %"), "de")
      .when(text.like("% el %") || text.like("% los %"), "es")
      .when(text.like("% le %") || text.like("% les %"), "fr")
      .otherwise("unk")

  /** Quality score in [0,1]: length factor + stopword-ratio factor +
    * alpha-ratio factor (the standard corpus-filtering heuristic family). */
  def qualityScore(text: Column, nChars: Column): Column = {
    val words = split(text, " ", -1)
    val stop = size(filter(words, w => w.isin("the", "a", "of", "and", "to", "in")))
    val stopRatio = when(size(words) === 0, 0.0).otherwise(stop / size(words).cast("double"))
    val alphaRatio = when(length(text) === 0, 0.0)
      .otherwise(length(regexp_replace(text, "[^a-zA-Z ]", "")) / length(text).cast("double"))
    least(lit(1.0),
      lit(0.2) + lit(0.3) * least(nChars / 500.0, lit(1.0)) +
        lit(0.3) * least(stopRatio * 5.0, lit(1.0)) +
        lit(0.2) * alphaRatio)
  }

  /** Stable 64-hex content fingerprint (exact-dedup join key). */
  def fingerprint(text: Column): Column = sha2(text, 256)

  /** Gopher-family repetition metrics (Rae et al. 2021 §A1.1: duplicate
    * n-gram fractions and top-n-gram character fractions are the canonical
    * repetition filters for pretraining corpora) — one O(n) pass per row:
    *
    *   dup_word_frac       = 1 − distinct words / total words
    *   dup_2gram_frac      = 1 − distinct 2-grams / total 2-grams
    *   top_2gram_char_frac = occurrences(most frequent 2-gram) × chars(gram)
    *                         ÷ chars(text)   (tie → lexicographically least)
    *
    * A JIT UDF with per-doc hash maps, not HOFs: the HOF top-gram search is
    * O(n²) per row (no CSE inside lambdas — see winnowHof's note), which a
    * 100k-word document turns into 10^10 interpreted ops. Per-row and
    * shuffle-free either way. All divisions are single double ops on exact
    * integer counts, restated literally by the llm_repetition oracle. */
  def repetitionStats(text: Column): Column = repetitionUdf(text)

  private val repetitionUdf = udf { (text: String) => repetitionMetrics(text) }

  /** Pure form of the metric computation (property-tested in PropertySpec). */
  private[graft] def repetitionMetrics(text: String): Option[(Double, Double, Double)] = {
    if (text == null) None
    else {
      val words = text.split(" ", -1)
      val nw = words.length
      if (nw < 2) None // no 2-grams: the gate filters these upstream
      else {
        val wordCnt = new java.util.HashMap[String, Int]()
        var i = 0
        while (i < nw) {
          wordCnt.merge(words(i), 1, (a: Int, b: Int) => a + b)
          i += 1
        }
        val gramCnt = new java.util.HashMap[String, Int]()
        i = 0
        while (i < nw - 1) {
          gramCnt.merge(words(i) + " " + words(i + 1), 1, (a: Int, b: Int) => a + b)
          i += 1
        }
        var topGram: String = null
        var topCnt = 0
        val it = gramCnt.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          // tie-break in CODE POINT order (Spark/DuckDB collation), not
          // Java's UTF-16 compareTo — the tied grams can differ in length,
          // so the winner changes the char-fraction metric (the Bpe
          // argmax defect class, swept by CollationSpec)
          if (e.getValue > topCnt ||
            (e.getValue == topCnt && (topGram == null ||
              graft.functions.Collation.codePointCompare(e.getKey, topGram) < 0))) {
            topGram = e.getKey
            topCnt = e.getValue
          }
        }
        val nChars = text.codePointCount(0, text.length)
        val gramChars = topGram.codePointCount(0, topGram.length)
        Some((
          1.0 - wordCnt.size.toDouble / nw.toDouble,
          1.0 - gramCnt.size.toDouble / (nw - 1).toDouble,
          topCnt.toDouble * gramChars.toDouble / nChars.toDouble))
      }
    }
  }

  /** Rolling polynomial fingerprint of the first `n` tokens — the
    * prefix-dup detector (news-wire boilerplate etc.). */
  def prefixFingerprint(text: Column, n: Int): Column =
    xxhash64(concat_ws(" ", slice(split(lower(text), "\\s+"), 1, n)))

  /** One-pass Shannon char-entropy metrics: struct(n_chars, entropy_micro)
    * or null for null/empty text. Each class term k·⌊ln(k/n)·1e6⌋ is
    * floor-quantized to the micro-nat grid BEFORE the sum (exact Long
    * arithmetic — order-free, engine-portable; `Math.log` here is the same
    * libm-equivalent double `LN` compiles to in both engines, proven by the
    * llm_char_entropy hash gate).
    *
    * A JIT UDF with one per-doc count map instead of the explode form
    * (one row per CHARACTER → two corpus-character-sized shuffles + a
    * per-doc join): the metric is per-row computable, so at 100 TB this is
    * a fused scan pass with zero shuffle — measured 10x at sf1 where the
    * explode shape was the worst non-join query on the surface. Counts are
    * per Unicode code point, matching Spark's `length`/`substring` units. */
  def charEntropyStats(text: Column): Column = charEntropyUdf(text)

  private val charEntropyUdf = udf { (text: String) => charEntropyMetrics(text) }

  /** Pure form (property-tested against the explode restatement). */
  private[graft] def charEntropyMetrics(text: String): Option[(Long, Long)] = {
    if (text == null || text.isEmpty) None
    else {
      val counts = scala.collection.mutable.LongMap.empty[Long]
      var i = 0
      var n = 0L
      while (i < text.length) {
        val cp = text.codePointAt(i)
        counts(cp.toLong) = counts.getOrElse(cp.toLong, 0L) + 1L
        n += 1
        i += Character.charCount(cp)
      }
      var total = 0L
      counts.foreachValue { k =>
        total += k * math.floor(math.log(k.toDouble / n.toDouble) * 1e6).toLong
      }
      Some((n, -total))
    }
  }

  /** Winnowing document fingerprints (Schleimer et al., "Winnowing: Local
    * Algorithms for Document Fingerprinting", SIGMOD 2003): a rolling
    * polynomial hash over character k-grams, with the minimum hash selected
    * from every window of `w` consecutive gram hashes, deduped and sorted.
    * The winnowing guarantee: any shared substring of at least w + k − 1
    * characters yields at least one shared fingerprint, while only
    * ~2/(w+1) of the gram hashes are kept.
    *
    * Pure codegen'd higher-order functions — no UDF — and restatable
    * exactly in SQL (the llm_winnow_neardup oracle does): the hash is
    * (acc·31 + codepoint) mod 1e9+7, which never leaves BIGINT range, so
    * Spark and DuckDB integer semantics agree bit-for-bit. */
  def winnow(text: Column, k: Int = 8, w: Int = 4): Column =
    winnowUdf(text, lit(k), lit(w))

  /** The hot-path rendering: a JIT-compiled UDF with a TRUE rolling hash —
    * h(i+1) = ((h(i) − c_i·31^(k−1))·31 + c_(i+k)) mod P, O(n) per row
    * versus the HOF form's O(n·k) interpreted ops (measured 15.4 s → well
    * under 1 s over sf0.1's 5 000 docs). Produces BIT-IDENTICAL values to
    * `winnowHof` — `TextAnalysisSpec` asserts the parity on real corpus
    * rows, which is what keeps the DuckDB oracle exact. */
  private val winnowUdf = udf { (text: String, k: Int, w: Int) =>
    if (text == null) Array.empty[Long]
    else {
      val P = 1000000007L
      val cps = text.codePoints().toArray // characters as both engines' substr counts them
      val n = cps.length
      if (n < k) Array.empty[Long]
      else {
        val grams = new Array[Long](n - k + 1)
        var h = 0L
        var j = 0
        while (j < k) { h = (h * 31 + cps(j)) % P; j += 1 }
        grams(0) = h
        var pow = 1L // 31^(k-1) mod P
        j = 1
        while (j < k) { pow = (pow * 31) % P; j += 1 }
        var i = 1
        while (i <= n - k) {
          h = ((h - (cps(i - 1) * pow) % P + P) % P * 31 + cps(i + k - 1)) % P
          grams(i) = h
          i += 1
        }
        if (grams.length < w) Array.empty[Long]
        else {
          val sel = new java.util.TreeSet[java.lang.Long]() // distinct + sorted
          var s = 0
          while (s <= grams.length - w) {
            var m = grams(s)
            var t = s + 1
            while (t < s + w) { if (grams(t) < m) m = grams(t); t += 1 }
            sel.add(m)
            s += 1
          }
          val out = new Array[Long](sel.size)
          val it = sel.iterator()
          var z = 0
          while (it.hasNext) { out(z) = it.next(); z += 1 }
          out
        }
      }
    }
  }

  /** The restatable higher-order-function form — the arithmetic the DuckDB
    * oracle states literally. Kept as the parity reference for the UDF. */
  private[llm] def winnowHof(text: Column, k: Int, w: Int): Column = {
    val P = 1000000007L
    val grams = when(length(text) >= k,
      transform(sequence(lit(1), length(text) - k + 1), i =>
        aggregate(
          transform(sequence(i, i + (k - 1)), p => ascii(text.substr(p, lit(1))).cast("long")),
          lit(0L), (acc, c) => (acc * 31 + c) % P)))
      .otherwise(array().cast("array<bigint>"))
    // Let-binding through a 1-element transform: HOF lambdas have no CSE,
    // so referencing `grams` inside the per-window lambda would recompute
    // the WHOLE gram array for every window (O(n²·k) per row, measured
    // minutes on 500-char docs). Binding it to a lambda variable evaluates
    // it once per row.
    element_at(
      transform(array(grams), g =>
        when(size(g) >= w,
          array_sort(array_distinct(
            transform(sequence(lit(1), size(g) - (w - 1)), j =>
              array_min(slice(g, j, lit(w)))))))
          .otherwise(array().cast("array<bigint>"))),
      1)
  }
}
