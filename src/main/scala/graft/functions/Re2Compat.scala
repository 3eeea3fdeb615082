package graft.functions

/** RE2-dialect gate. The reference's regex filter is RE2
  * (/root/reference/graph/iterator/regex.go; RE2 syntax). Validation
  * delegates to the real [[Re2]] parser, so a pattern is rejected exactly
  * when RE2's grammar rejects it — backreferences, lookaround, possessive
  * quantifiers, `\Z`/`\G`/`\k`, bad repeat counts, unknown escapes — and
  * accepted patterns are evaluated with RE2 semantics by the Pike VM
  * ([[Re2Match]]), not java.util.regex.
  */
object Re2Compat {
  final case class Re2SyntaxError(msg: String)
      extends IllegalArgumentException(msg)

  /** Throws [[Re2SyntaxError]] if `pattern` uses syntax RE2 rejects. */
  def validate(pattern: String): Unit = {
    Re2.compile(pattern)
    ()
  }
}
