package graft.core

/** Text sanitisation for golden-comparable output, mirroring
  * /root/reference/knowledge_graph/labelled_passage.py:109-133 exactly:
  * pass 1 replaces XML-special characters with '_', pass 2 normalizes a
  * fixed set of unicode/whitespace codepoints. Character-for-character port
  * of the two `str.maketrans` tables (verified against the source bytes).
  */
object Sanitise {
  def apply(text: String): String = {
    val sb = new java.lang.StringBuilder(text.length + 8)
    var i = 0
    while (i < text.length) {
      text.charAt(i) match {
        // pass 1: bad XML strings -> '_' (each key is one char)
        case '&' | '<' | '>' | '"' | '\'' => sb.append('_')
        // pass 2: normalization table (U+0020/U+0027 map to themselves)
        case '\n' | '\t' => sb.append(' ')
        case '…'    => sb.append("...")
        case '—'    => sb.append('-')
        case '’'    => sb.append('\'')
        case '“' | '”' => sb.append('"')
        case c           => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }
}
