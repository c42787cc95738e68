package graft.write

import scala.collection.mutable.ArrayBuffer

/** Quote-aware SQL statement splitter + placeholder counter — a
  * faithful port of the reference's pure string algorithm
  * (/root/reference/src/sql_utils.cpp:19-193):
  *
  *  - splits on `;` only outside '…' / "…" / $tag$…$tag$ contexts;
  *  - '' and "" are in-quote escapes;
  *  - dollar tags are $identifier$ (alnum/underscore, possibly empty)
  *    and only recognized outside the other quote kinds;
  *  - empty/whitespace-only fragments are dropped;
  *  - countPlaceholders counts `?` under the same quote rules so a
  *    multi-statement binding plan can be sliced per statement.
  */
object SqlSplitter {

  def split(query: String): Vector[String] = {
    val statements = Vector.newBuilder[String]
    val current = new StringBuilder
    var inSingle = false
    var inDouble = false
    var inDollar = false
    var dollarTag = ""

    var i = 0
    while (i < query.length) {
      val c = query.charAt(i)
      var consumed = false

      if (!inSingle && !inDouble && c == '$') {
        val tagEnd = query.indexOf('$', i + 1)
        if (tagEnd >= 0) {
          val tag = query.substring(i, tagEnd + 1)
          val valid = tag.substring(1, tag.length - 1)
            .forall(tc => tc.isLetterOrDigit || tc == '_')
          if (valid) {
            if (inDollar && tag == dollarTag) {
              inDollar = false; current.append(tag); i = tagEnd; consumed = true
            } else if (!inDollar) {
              inDollar = true; dollarTag = tag; current.append(tag); i = tagEnd; consumed = true
            }
          }
        }
        if (!consumed) { current.append(c); consumed = true }
      } else if (!inDouble && !inDollar && c == '\'') {
        if (inSingle && i + 1 < query.length && query.charAt(i + 1) == '\'') {
          current.append("''"); i += 1
        } else {
          inSingle = !inSingle; current.append(c)
        }
        consumed = true
      } else if (!inSingle && !inDollar && c == '"') {
        if (inDouble && i + 1 < query.length && query.charAt(i + 1) == '"') {
          current.append("\"\""); i += 1
        } else {
          inDouble = !inDouble; current.append(c)
        }
        consumed = true
      }

      if (!consumed) {
        if (c == ';' && !inSingle && !inDouble && !inDollar) {
          val trimmed = current.toString.trim
          if (trimmed.nonEmpty) statements += trimmed
          current.clear()
        } else current.append(c)
      }
      i += 1
    }
    val last = current.toString.trim
    if (last.nonEmpty) statements += last
    statements.result()
  }

  def countPlaceholders(statement: String): Int = {
    var count = 0
    var inSingle = false
    var inDouble = false
    var inDollar = false
    var dollarTag = ""
    var i = 0
    while (i < statement.length) {
      val c = statement.charAt(i)
      var handled = false
      if (!inSingle && !inDouble && c == '$') {
        val tagEnd = statement.indexOf('$', i + 1)
        if (tagEnd >= 0) {
          val tag = statement.substring(i, tagEnd + 1)
          val valid = tag.substring(1, tag.length - 1)
            .forall(tc => tc.isLetterOrDigit || tc == '_')
          if (valid) {
            if (inDollar && tag == dollarTag) { inDollar = false; i = tagEnd; handled = true }
            else if (!inDollar) { inDollar = true; dollarTag = tag; i = tagEnd; handled = true }
          }
        }
        handled = true // bare $ consumes itself either way
      } else if (!inDouble && !inDollar && c == '\'') {
        if (inSingle && i + 1 < statement.length && statement.charAt(i + 1) == '\'') i += 1
        else inSingle = !inSingle
        handled = true
      } else if (!inSingle && !inDollar && c == '"') {
        if (inDouble && i + 1 < statement.length && statement.charAt(i + 1) == '"') i += 1
        else inDouble = !inDouble
        handled = true
      }
      if (!handled && c == '?' && !inSingle && !inDouble && !inDollar) count += 1
      i += 1
    }
    count
  }

  /** Slice a whole-template binding array across statements by their
    * `?` counts (database_manager.cpp:569-598); throws on mismatch. */
  def sliceBindings[T](statements: Seq[String], bindings: Seq[T]): Seq[Seq[T]] = {
    var cursor = 0
    val out = ArrayBuffer.empty[Seq[T]]
    statements.foreach { stmt =>
      val n = countPlaceholders(stmt)
      require(cursor + n <= bindings.size,
        s"binding plan/placeholder mismatch: need ${cursor + n}, have ${bindings.size}")
      out += bindings.slice(cursor, cursor + n)
      cursor += n
    }
    require(cursor == bindings.size,
      s"binding plan/placeholder mismatch: $cursor placeholders vs ${bindings.size} bindings")
    out.toSeq
  }
}
