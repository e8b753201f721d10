package graft.serve

/**
 * The ONE escape/unescape pair for every hand-built JSON string in the
 * serving layer (token payloads, API responses, adapter bodies). Two
 * private copies of this table already diverged once — an escaping fix
 * applied to one side changes the wire format without changing the
 * token format — so both directions live here and nowhere else.
 */
private[serve] object Json {

  def escape(s: String): String = s.flatMap {
    case '"'          => "\\\""
    case '\\'         => "\\\\"
    case '\n'         => "\\n"
    case '\r'         => "\\r"
    case '\t'         => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c            => c.toString
  }

  /** Full JSON string-escape decoding: the named escapes (\n \t \r \b
    * \f \" \\ \/), \uXXXX, and — leniently — any other \X as the bare
    * X (matching how [[escape]] never emits such a pair). */
  def unescape(s: String): String = {
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'u' if i + 5 < s.length &&
            s.substring(i + 2, i + 6).forall(h =>
              (h >= '0' && h <= '9') || (h >= 'a' && h <= 'f') ||
                (h >= 'A' && h <= 'F')) =>
            out.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
            i += 6
          case 'n' => out.append('\n'); i += 2
          case 't' => out.append('\t'); i += 2
          case 'r' => out.append('\r'); i += 2
          case 'b' => out.append('\b'); i += 2
          case 'f' => out.append('\f'); i += 2
          case e   => out.append(e); i += 2
        }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }
}
