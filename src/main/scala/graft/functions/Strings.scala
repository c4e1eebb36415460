package graft.functions

/** Scalar helpers mirroring the T-SQL metadata functions the reference
  * leans on for command building (SURVEY.md §2.8). Plain Scala — they run
  * on the driver inside command construction, never per-row. */
object Strings {

  /** QUOTENAME (ref IntegrityChecks_VLDB.sql:133,523,684): bracket-quote an
    * identifier, doubling any `]`. */
  def quoteName(s: String): String = "[" + s.replace("]", "]]") + "]"

  /** PARSENAME(s, part) (ref ola/DatabaseIntegrityCheck.sql:682-684):
    * split a dotted name and index parts FROM THE RIGHT (1 = object).
    * Returns None when the part doesn't exist — same as T-SQL NULL. */
  def parseName(s: String, part: Int): Option[String] = {
    val parts = splitDotted(s)
    if (part < 1 || part > parts.size) None
    else Some(parts(parts.size - part))
  }

  /** Dot-split honoring `[...]` quoting (so `[a.b].c` is 2 parts). */
  def splitDotted(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inBracket = false
    s.foreach {
      case '[' if !inBracket => inBracket = true
      case ']' if inBracket  => inBracket = false
      case '.' if !inBracket => out += cur.toString; cur.clear()
      case c                 => cur.append(c)
    }
    out += cur.toString
    out.toSeq
  }
}
