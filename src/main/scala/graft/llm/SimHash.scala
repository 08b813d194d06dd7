package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimHash near-duplicate fingerprinting: one 64-bit signature per document,
  * Hamming distance ≈ cosine distance of the token multiset.
  *
  * Banding for scale: the 64 bits split into 4 × 16-bit bands; two docs
  * within Hamming distance 3 share at least one exact band (pigeonhole), so
  * candidates again come from an equi-join on (band, value) — never an
  * all-pairs scan. Verification uses `bit_count(a XOR b)` (codegen'd).
  */
object SimHash {

  /** Deterministic 64-bit simhash of a token array (weighted bit voting). */
  private val simhashUdf = udf { (tokens: Seq[String]) =>
    if (tokens == null || tokens.isEmpty) 0L
    else {
      val votes = new Array[Int](64)
      tokens.foreach { t =>
        var h = scala.util.hashing.MurmurHash3.stringHash(t, 0x9747b28c).toLong << 32 |
          (scala.util.hashing.MurmurHash3.stringHash(t, 0x85ebca6b).toLong & 0xffffffffL)
        var i = 0
        while (i < 64) {
          if ((h & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
          h >>>= 1
          i += 1
        }
      }
      var out = 0L
      var i = 0
      while (i < 64) { if (votes(i) > 0) out |= (1L << i); i += 1 }
      out
    }
  }

  def simhash(text: Column): Column = simhashUdf(split(lower(text), "\\s+"))

  /** docs(idCol, textCol) → (id, simhash). */
  def signed(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"), simhash(col(textCol)).as("simhash"))

  /** Near-dup pairs with Hamming distance ≤ maxHamming. Output
    * (id_a, id_b, hamming).
    *
    * The 4×16-bit banding is exhaustive up to Hamming 3 ONLY for pairs whose
    * buckets survive the mega-bucket guardrail: a band value shared by a
    * cluster larger than `maxBucketSize` (every empty doc hashes to 0L, for
    * one) would go quadratic in the self-join, so those buckets are dropped —
    * trading recall on degenerate clusters for bounded work, same policy as
    * MinHash. Pre-filter empty documents (or raise the cap) when exhaustive
    * duplicate groups over degenerate content matter. */
  def nearDuplicates(
      docs: DataFrame, idCol: String, textCol: String, maxHamming: Int = 3,
      maxBucketSize: Int = 1000): DataFrame = {
    require(maxHamming <= 3, "4 bands of 16 bits are only exhaustive up to Hamming 3")
    val s = signed(docs, idCol, textCol)
    val bandCols = (0 until 4).map(b =>
      shiftrightunsigned(col("simhash"), b * 16).bitwiseAND(lit(0xffffL)))
    val bandedAll = s.select(col("id"), col("simhash"),
      posexplode(array(bandCols: _*)).as(Seq("band", "bucket")))
    val bucketSizes = bandedAll.groupBy("band", "bucket").count()
    val banded = bandedAll.join(
      bucketSizes.where(col("count") <= maxBucketSize).select("band", "bucket"),
      Seq("band", "bucket"))
    val a = banded.select(col("band"), col("bucket"),
      col("id").as("id_a"), col("simhash").as("h_a"))
    val b = banded.select(col("band"), col("bucket"),
      col("id").as("id_b"), col("simhash").as("h_b"))
    a.join(b, Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("h_a").bitwiseXOR(col("h_b"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }
}
