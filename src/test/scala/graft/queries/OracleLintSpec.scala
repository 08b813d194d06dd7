package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Registry-wide lint against the DuckDB integer-SUM type-drift class
  * (round-6 verdict: the only two red entries were bare `SUM(<integer>)`
  * oracles — DuckDB types them HUGEINT, the harness surfaces that as a
  * different representation than Spark's BIGINT, and the value hash drifts
  * on EQUAL numbers).
  *
  * Rule: any `SUM(...)` in oracle SQL whose argument is integer-typed
  * (a known integer column, an integer-literal expression over them, or a
  * CASE whose branches are integer literals) must be covered by a cast —
  * an enclosing `CAST(... AS BIGINT/DOUBLE/DECIMAL)` or an enclosing
  * parenthesized group suffixed `::DOUBLE`-style. Sums over known DOUBLE
  * columns are exempt (DuckDB sums doubles as DOUBLE, no drift).
  *
  * The linter is a tripwire, not a type checker: identifiers it cannot
  * classify (CTE aliases it has not been told about) are treated as
  * non-integer, and the driver's hash gate remains the backstop. When a
  * new CTE alias carries an integer, add it to `intCols` below.
  */
class OracleLintSpec extends AnyFunSuite with Matchers {

  /** Integer-typed columns: every int32/int64 column of the testdata
    * parquet tables, plus CTE aliases known to carry integers in the
    * current oracle corpus. */
  private val intCols: Set[String] = Set(
    // base tables (pyarrow schema dump of /root/testdata/sf0.001)
    "c_custkey", "c_nationkey", "doc_id", "n_chars", "vec_id", "label",
    "event_id", "user_id", "l_orderkey", "l_partkey", "l_suppkey",
    "l_linenumber", "n_nationkey", "n_regionkey", "o_orderkey", "o_custkey",
    "p_partkey", "p_size", "r_regionkey", "s_suppkey", "s_nationkey",
    // CTE aliases that carry integers in the current oracles
    "is_valid", "tokens", "r", "brk", "micro", "quality_weight")

  private val sqlKeywords: Set[String] = Set(
    "distinct", "case", "when", "then", "else", "end", "and", "or", "not",
    "in", "is", "null", "like", "between", "true", "false")

  /** Query-name -> substring-of-argument exemptions, each justified:
    * the summed integer never reaches an output column (grouping-only),
    * so HUGEINT-vs-BIGINT cannot drift the hash. */
  private val exemptions: Map[String, Set[String]] = Map(
    // `SUM(brk) OVER (...)` builds the session id used only in GROUP BY;
    // every output column of o9 is explicitly cast.
    "o9_sessionize" -> Set("brk"))

  private def stripQualifiers(s: String): String =
    s.replaceAll("\\b[A-Za-z_]\\w*\\.", "")

  private def isIntToken(tok: String): Boolean = {
    val t = stripQualifiers(tok.trim).toLowerCase
    t.matches("-?\\d+") || intCols.contains(t)
  }

  /** An argument is integer-risky when its type in DuckDB would be an
    * integer (and the SUM therefore HUGEINT). */
  private def integerRisky(arg: String): Boolean = {
    val a = arg.trim
    if (a.isEmpty) return false
    // An inner cast (CAST(...) / ::type) decides the type explicitly.
    if (a.toUpperCase.contains("CAST") || a.contains("::")) return false
    if (a.toUpperCase.matches("(?s).*\\bCASE\\b.*")) {
      // Only the THEN/ELSE branch values type a CASE.
      val branches = "(?is)\\b(?:THEN|ELSE)\\s+([^\\s)]+)".r
        .findAllMatchIn(a).map(_.group(1)).toSeq
      branches.nonEmpty && branches.forall(isIntToken)
    } else {
      // Decimal literals or double math make it DOUBLE.
      if (a.matches("(?s).*\\d\\.\\d.*")) return false
      val idents = "[A-Za-z_]\\w*".r.findAllIn(stripQualifiers(a)).toSeq
        .filterNot(t => sqlKeywords.contains(t.toLowerCase))
      idents.nonEmpty && idents.forall(t => intCols.contains(t.toLowerCase))
    }
  }

  /** All balanced-paren spans of `sql` as (openIdx, closeIdx). */
  private def parenSpans(sql: String): Seq[(Int, Int)] = {
    val stack = scala.collection.mutable.Stack[Int]()
    val spans = Seq.newBuilder[(Int, Int)]
    var i = 0
    var inStr = false
    while (i < sql.length) {
      val c = sql.charAt(i)
      // skip -- comments (they may carry apostrophes that would desync)
      if (!inStr && c == '-' && i + 1 < sql.length && sql.charAt(i + 1) == '-') {
        while (i < sql.length && sql.charAt(i) != '\n') i += 1
      } else {
        if (c == '\'') inStr = !inStr
        else if (!inStr && c == '(') stack.push(i)
        else if (!inStr && c == ')' && stack.nonEmpty) spans += ((stack.pop(), i))
        i += 1
      }
    }
    spans.result()
  }

  /** Is the SUM call at [sumStart, sumEnd] covered by an enclosing
    * CAST(...) or a parenthesized group suffixed with `::`? */
  private def castCovered(sql: String, spans: Seq[(Int, Int)],
      sumStart: Int, sumEnd: Int): Boolean =
    spans.exists { case (o, c) =>
      o < sumStart && c > sumEnd && {
        val before = sql.substring(0, o).replaceAll("\\s+$", "")
        val after = sql.substring(c + 1).replaceAll("^\\s+", "")
        before.toUpperCase.endsWith("CAST") || after.startsWith("::")
      }
    }

  test("registered query names are unique and every query carries an oracle") {
    // SparkEntry.queries is a Map keyed by name: a duplicate Reg name would
    // SILENTLY shadow an earlier query (it would vanish from the driver's
    // correctness run while its file still compiles — the worst failure
    // mode, zero signal). Pin uniqueness and full oracle coverage here.
    val names = graft.SparkEntry.registered.map(_.name)
    val dups = names.groupBy(identity).filter(_._2.size > 1).keys.toSeq.sorted
    withClue(s"duplicate query names: ${dups.mkString(", ")}")(
      dups shouldBe empty)
    val unoracled = graft.SparkEntry.registered
      .filter(_.oracle.isEmpty).map(_.name).sorted
    // rows-only registration is allowed by the contract but currently
    // unused — every operator has a DuckDB restatement; if one genuinely
    // can't, list it here explicitly rather than silently weakening.
    withClue(s"queries without an oracle: ${unoracled.mkString(", ")}")(
      unoracled shouldBe empty)
  }

  test("every integer-typed SUM in oracle SQL is cast-covered") {
    val sumRe = "(?i)\\bSUM\\s*\\(".r
    val violations = graft.SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (name, sql) =>
        val spans = parenSpans(sql)
        sumRe.findAllMatchIn(sql).flatMap { m =>
          val open = sql.indexOf('(', m.start)
          val close = spans.find(_._1 == open).map(_._2).getOrElse(sql.length - 1)
          val arg = sql.substring(open + 1, close)
          val exempt = exemptions.getOrElse(name, Set.empty)
            .exists(arg.contains)
          if (integerRisky(arg) && !exempt &&
              !castCovered(sql, spans, m.start, close))
            Some(s"$name: un-cast integer SUM(${arg.trim.take(60)})")
          else None
        }
    }
    withClue(violations.mkString("\n")) { violations shouldBe empty }
  }

  test("every multi-row oracle carries a total-order ORDER BY") {
    // Row order is part of the driver's correctness hash: an oracled query
    // without ORDER BY hash-flakes the round as soon as either engine
    // changes its natural output order. Single-row aggregates are the only
    // legitimate exemptions (order is vacuous on one row) — each name
    // below returns exactly 1 row by construction.
    val singleRow = Set(
      "a6_merge_label_purge", "a8_purge_partitioned", "a10_hotspot_full",
      "a19_compact_partitions", "f18_reject_isolation", "llm_link_triangles",
      "o17_hll_merge", "q6_forecast_revenue", "q14_promo_effect",
      "q19_discounted_revenue", "r7_refine_loop", "s3_batched_sink",
      "f14_row_id_contract", "o27_kmv_distinct", "llm_drift_chi2",
      "c8_circle_filter", "llm_drift_psi", "a31_forget_user",
      "a36_versioned_merge", "a38_versioned_compact", "a39_versioned_forget",
      "a40_incremental_read", "a41_mor_delete", "a42_mor_upsert",
      "a43_changelog_apply", "a45_versioned_schema_evolution",
      "a46_binpack_compact", "a48_versioned_rename",
      "a49_partition_evolution", "s30_stream_schema_drift",
      "s34_stream_occ_maintenance", "a57_position_deletes",
      "a58_string_stats", "a59_import_files", "s35_stream_forget",
      "a61_snapshot_tags", "s36_stream_import",
      "llm_source_gini") // global aggregate — exactly 1 row
    val unordered = graft.SparkEntry.oracleSql.toSeq.sortBy(_._1).collect {
      case (name, sql)
          if !sql.toUpperCase.contains("ORDER BY") && !singleRow(name) =>
        name
    }
    withClue(s"oracles without ORDER BY (add ordering or, if provably " +
      s"1-row, extend the exemption set): ${unordered.mkString(", ")}") {
      unordered shouldBe empty
    }
  }

  test("the linter itself flags the round-6 defect patterns") {
    // q12 shape: CASE with integer-literal branches
    integerRisky(
      "CASE WHEN o.o_orderpriority IN ('1-URGENT') THEN 1 ELSE 0 END") shouldBe true
    // s4 shape: bare integer column
    integerRisky("n_chars") shouldBe true
    // covered / non-integer shapes must not fire
    integerRisky("l_extendedprice * (1 - l_discount)") shouldBe false
    integerRisky("CAST(value AS DECIMAL(18,2))") shouldBe false
    integerRisky("m.lat * (m.w / t.total_w)") shouldBe false
    val sql = "SELECT CAST(SUM(n_chars) AS BIGINT) AS s FROM documents"
    val spans = parenSpans(sql)
    val m = "(?i)\\bSUM\\s*\\(".r.findFirstMatchIn(sql).get
    castCovered(sql, spans, m.start, sql.indexOf(')', m.end)) shouldBe true
  }
}
