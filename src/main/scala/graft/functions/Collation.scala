package graft.functions

/** UTF-8-byte-order string comparison (== code-point order) — the
  * collation Spark's UTF8String and DuckDB both sort by. Java's
  * `String.compareTo` is UTF-16 *unit* order instead, which sorts
  * U+E000..U+FFFF AFTER supplementary characters (their lead surrogates
  * are 0xD800..0xDBFF), so any DRIVER-SIDE comparison that breaks ties
  * or orders strings with `compareTo` silently diverges from the engine
  * collation the moment a non-BMP character appears. Every driver-side
  * string ordering that can cross an oracle gate goes through here
  * (CollationSpec sweeps them). */
object Collation {

  def codePointCompare(a: String, b: String): Int = {
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca)
      j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  /** `Ordering` view for driver-side `.sorted` / `.sortBy` call sites. */
  val ordering: Ordering[String] =
    (a: String, b: String) => codePointCompare(a, b)
}
