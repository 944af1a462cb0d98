package graft.core

import java.security.MessageDigest

/** Deterministic 8-char identifiers from a 31-char unambiguous alphabet.
  *
  * Semantics mirror the reference's `Identifier.generate`
  * (/root/reference/knowledge_graph/identifiers.py:131-149): stringify every
  * argument, concatenate, SHA-256 the UTF-8 bytes, then map each of the first
  * 8 digest bytes into the alphabet via `byte % 31`. Python's `str(None)` is
  * "None", which we reproduce for absent optional args so span/concept ids
  * match the reference's golden fixtures byte-for-byte.
  */
object Identifier8 {
  val alphabet: String = "abcdefghjkmnpqrstuvwxyz23456789"

  private def stringify(arg: Any): String = arg match {
    case null    => "None"
    case None    => "None"
    case Some(x) => stringify(x)
    case other   => other.toString
  }

  def generate(args: Any*): String = {
    require(args.nonEmpty, "Identifier8.generate requires at least one argument")
    val joined = args.map(stringify).mkString("")
    ofString(joined)
  }

  // one digest instance per executor thread: MessageDigest.getInstance on
  // every call costs more than the hash itself at 10^8-mention scale
  private val digestTL: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("SHA-256"))

  /** Hash a pre-concatenated string (hot path: avoids varargs boxing). */
  def ofString(joined: String): String = {
    val md = digestTL.get()
    md.reset()
    val digest = md.digest(joined.getBytes("UTF-8"))
    val sb = new java.lang.StringBuilder(8)
    var i = 0
    while (i < 8) {
      sb.append(alphabet.charAt((digest(i) & 0xff) % 31))
      i += 1
    }
    sb.toString
  }

  private val ValidPattern = ("^[" + alphabet + "]{8}$").r

  def isValid(value: String): Boolean = ValidPattern.pattern.matcher(value).matches()

  /** Span id = generate(text, start, end, concept_id)
    * (/root/reference/knowledge_graph/span.py:82-91). */
  def spanId(text: String, start: Int, end: Int, conceptId: String): String =
    ofString(text + start.toString + end.toString + (if (conceptId == null) "None" else conceptId))
}
