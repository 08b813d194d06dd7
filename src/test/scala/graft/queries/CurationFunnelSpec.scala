package graft.queries

import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkSuite, Tables}

/** Structural invariants of the single-pass curation funnel. */
class CurationFunnelSpec extends AnyFunSuite with Matchers with SparkSuite {

  test("funnel: stages chain, counts are monotone, dedup drops the planted copies") {
    val rows = LlmQueries.curationFunnel.build(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    rows.map(_._2).toSeq shouldBe
      Seq("lang_en", "quality", "exact_dedup", "decontaminate", "train_split")
    // docs_in of stage k == docs_out of stage k-1; every stage monotone
    rows.sliding(2).foreach { case Array(a, b) => b._3 shouldBe a._4 }
    rows.foreach { case (_, s, in, out) =>
      withClue(s) { out should be <= in }
    }
    // ingest count = corpus + planted exact copies (doc_id % 13)
    val docs = Tables.documents(spark, sfDir)
    val n = docs.count()
    val copies = docs.where(F.col("doc_id") % 13 === 0).count()
    rows.head._3 shouldBe (n + copies)
    // dedup drops exactly the planted survivors: stage-3 removals equal
    // the number of distinct-survivor hash groups with a copy, which is
    // at most the planted-copy count and strictly positive here
    val dropped = rows(2)._3 - rows(2)._4
    dropped should be > 0L
    dropped should be <= copies
  }
}
