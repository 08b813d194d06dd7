package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuite

/** llm_k_anonymity on a corpus no generalization level can fix: with
  * fewer than k = 5 documents even full suppression leaves one group
  * below k, the DuckDB oracle's scalar `MIN(level) WHERE risk = 0`
  * subquery is NULL, and `chosen` must be NULL on every row — the query
  * used to throw on the empty driver-side min instead (round-16 ADVICE,
  * divergent failure mode vs the oracle). */
class KAnonymityEdgeSpec extends AnyFunSuite with Matchers with SparkSuite {

  test("a <5-document corpus yields NULL chosen on every ladder level, not a throw") {
    import spark.implicits._
    val dir = graft.Scratch.dir("graft_kanon_tiny")
    Seq(
      (1L, "en", "web", 120L, "alpha"),
      (2L, "en", "web", 97L, "beta"),
      (3L, "de", "book", 5000L, "gamma"))
      .toDF("doc_id", "lang", "source", "n_chars", "text")
      .write.parquet(s"$dir/documents.parquet")
    val out = LlmQueries.kAnonymity.build(spark, dir)
      .orderBy("level").collect()
    out should have length 6
    out.foreach { r =>
      withClue(s"level ${r.getLong(0)}") {
        r.getLong(3) should be > 0L // rows stay at risk at every level
        r.isNullAt(4) shouldBe true // chosen mirrors the SQL NULL
      }
    }
  }

  test("the regular corpus still chooses exactly one minimal compliant level") {
    val out = LlmQueries.kAnonymity.build(spark, sfDir).orderBy("level").collect()
    out.count(r => !r.isNullAt(4) && r.getLong(4) == 1L) shouldBe 1
  }
}
