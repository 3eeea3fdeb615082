package graft.functions

/** RE2-dialect compatibility gate. The reference's regex filter is RE2
  * (/root/reference/graph/iterator/regex.go; RE2 syntax), while Spark's
  * `rlike` is java.util.regex. The dialects agree on the corpus's
  * patterns, but Java ACCEPTS constructs RE2 rejects — backreferences,
  * lookaround, possessive quantifiers, conditionals. Rejecting those at
  * plan time restores observable parity: a query the reference refuses is
  * refused here too, instead of silently using Java semantics.
  * (The `re2j` library would evaluate true RE2; it is not available
  * offline, and rejection covers the divergent surface.)
  */
object Re2Compat {
  final case class Re2SyntaxError(msg: String)
      extends IllegalArgumentException(msg)

  /** Throws [[Re2SyntaxError]] if `pattern` uses syntax RE2 rejects. */
  def validate(pattern: String): Unit = {
    var i = 0
    val n = pattern.length
    var inClass = false
    while (i < n) {
      val c = pattern.charAt(i)
      if (c == '\\' && i + 1 < n) {
        val d = pattern.charAt(i + 1)
        if (!inClass && d.isDigit && d != '0')
          throw Re2SyntaxError(
            s"invalid escape sequence: \\$d (RE2 does not support backreferences)")
        if (d == 'G' || d == 'k')
          throw Re2SyntaxError(
            s"invalid escape sequence: \\$d (not supported by RE2)")
        i += 2
      } else if (inClass) {
        if (c == ']') inClass = false
        i += 1
      } else if (c == '[') {
        inClass = true; i += 1
      } else if (c == '(' && i + 1 < n && pattern.charAt(i + 1) == '?') {
        // allow (?i) flags, (?:...) groups, (?P<name>...)
        val rest = pattern.substring(i + 2)
        if (rest.startsWith("=") || rest.startsWith("!") ||
          rest.startsWith("<=") || rest.startsWith("<!"))
          throw Re2SyntaxError(
            "invalid or unsupported Perl syntax: lookaround is not supported by RE2")
        i += 2
      } else if ((c == '*' || c == '+' || c == '?' || c == '}') &&
        i + 1 < n && pattern.charAt(i + 1) == '+') {
        throw Re2SyntaxError(
          s"invalid nested repetition operator: $c+ (possessive quantifiers are not supported by RE2)")
      } else i += 1
    }
  }
}
