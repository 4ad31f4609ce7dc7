package graft.bitemporal

/** Shared SQL-text lexing for the temporal front-end's rewrite stages
  * ([[BitemporalSql]] stage 1, [[PeriodSql]], [[BitemporalDml]]'s
  * statement splitting): the spans of a query that are NOT SQL code and
  * must never be rewritten, split on, or scanned for keywords —
  *
  *   - single-quoted string literals (`''` doubling and `\'` escapes,
  *     both accepted by Spark's lexer)
  *   - double-quoted strings/identifiers (same escape rules)
  *   - backtick-quoted identifiers (`` `weird name` ``, ```` `` ````
  *     doubling)
  *   - `--` line comments (to end of line)
  *   - bracketed comments, NESTED as Spark allows (SPARK-28880):
  *     `/* outer /* inner */ still comment */`
  *
  * One tokenizer for every stage: the previous per-file literal
  * scanners did not know about comments, so an apostrophe inside
  * `-- don't` opened a phantom string span and silently swallowed the
  * rest of the query from the rewriter's point of view.
  */
object SqlText {

  /** Inclusive-start/exclusive-end offsets of every masked span. */
  def maskedSpans(q: String): Seq[(Int, Int)] = {
    val spans = Seq.newBuilder[(Int, Int)]
    var i = 0
    while (i < q.length) {
      val c = q.charAt(i)
      if (c == '\'' || c == '"') {
        val start = i
        i = closeQuote(q, i + 1, c, backslash = true)
        spans += ((start, i))
      } else if (c == '`') {
        val start = i
        i = closeQuote(q, i + 1, '`', backslash = false)
        spans += ((start, i))
      } else if (c == '-' && i + 1 < q.length && q.charAt(i + 1) == '-') {
        val start = i
        while (i < q.length && q.charAt(i) != '\n') i += 1
        spans += ((start, i))
      } else if (c == '/' && i + 1 < q.length && q.charAt(i + 1) == '*') {
        val start = i
        var depth = 1
        i += 2
        while (i < q.length && depth > 0) {
          if (q.charAt(i) == '/' && i + 1 < q.length && q.charAt(i + 1) == '*') {
            depth += 1; i += 2
          } else if (q.charAt(i) == '*' && i + 1 < q.length && q.charAt(i + 1) == '/') {
            depth -= 1; i += 2
          } else i += 1
        }
        spans += ((start, i))
      } else i += 1
    }
    spans.result()
  }

  /** Offset just past the span opened by `quote` (opening char already
    * consumed): handles doubled-quote escapes, and backslash escapes
    * when the quote kind allows them. Unterminated spans run to the end
    * of the text (same recovery as Spark's lexer error path — nothing
    * after them is code). */
  private def closeQuote(q: String, from: Int, quote: Char,
                         backslash: Boolean): Int = {
    var i = from
    while (i < q.length) {
      val d = q.charAt(i)
      if (backslash && d == '\\') i += 2
      else if (d == quote) {
        if (i + 1 < q.length && q.charAt(i + 1) == quote) i += 2 // doubled
        else return i + 1
      } else i += 1
    }
    i
  }

  def masked(spans: Seq[(Int, Int)], i: Int): Boolean =
    spans.exists(s => i >= s._1 && i < s._2)

  /** `q` with leading comments and whitespace removed — the text whose
    * FIRST TOKEN decides statement routing (`/* retry */ UPDATE …` is
    * an UPDATE). Only comment spans are skipped: a leading string
    * literal or quoted identifier is real syntax and stays. */
  def stripLeadingComments(q: String): String = {
    val spans = maskedSpans(q)
    var i = 0
    var moved = true
    while (moved && i < q.length) {
      moved = false
      while (i < q.length && q.charAt(i).isWhitespace) { i += 1; moved = true }
      spans.find(s => s._1 == i &&
          (q.startsWith("--", i) || q.startsWith("/*", i))).foreach { s =>
        i = s._2; moved = true
      }
    }
    q.substring(i)
  }
}
