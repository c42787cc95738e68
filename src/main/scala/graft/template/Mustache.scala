package graft.template

/** Minimal Mustache engine for SQL templates.
  *
  * Implements exactly the grammar flapi's template layer needs (reference:
  * /root/reference/src/prepared_template_rewriter.cpp:52-92 defines the tag
  * lexer; /root/reference/src/sql_template_processor.cpp:120-218 the context):
  *
  *   - `{{ name }}`    variable, HTML-escaped (standard Mustache default)
  *   - `{{{ name }}}`  variable, raw
  *   - `{{# name }}...{{/ name }}`  section: rendered iff the name resolves
  *   - `{{^ name }}...{{/ name }}`  inverted section: rendered iff it doesn't
  *
  * Names are dotted paths into a nested string map ("params.id",
  * "conn.path", "cache.table"). A section is truthy when the path resolves
  * to a present value (flapi request params are flat strings — absent keys
  * are simply not in the map, so presence == truthiness; an empty string is
  * still "present", matching the reference's behavior where any set param
  * renders its section).
  *
  * No lists, partials, lambdas, or delimiter changes — the reference never
  * uses them in SQL templates.
  */
object Mustache {

  // ---- tag lexer (shared with PreparedRewriter) -------------------------

  sealed trait TagKind
  object TagKind {
    case object OpenSection extends TagKind
    case object OpenInverted extends TagKind
    case object CloseSection extends TagKind
    case object Triple extends TagKind
    case object Double extends TagKind
  }

  /** One scanned tag: [start, end) spans the braces; inner is trimmed. */
  final case class Tag(kind: TagKind, start: Int, end: Int, inner: String)

  /** Find the next tag at or after `from`; None when no complete tag
    * remains (an unterminated `{{` is treated as plain text). */
  def nextTag(s: String, from: Int): Option[Tag] = {
    var searchFrom = from
    while (searchFrom < s.length) {
      val open = s.indexOf("{{", searchFrom)
      if (open < 0) return None
      if (s.startsWith("{{{", open)) {
        val close = s.indexOf("}}}", open + 3)
        if (close < 0) return None // unterminated: rest is text
        return Some(Tag(TagKind.Triple, open, close + 3,
          s.substring(open + 3, close).trim))
      }
      val close = s.indexOf("}}", open + 2)
      if (close < 0) return None
      val raw = s.substring(open + 2, close)
      val (kind, inner) =
        if (raw.startsWith("#")) (TagKind.OpenSection, raw.substring(1).trim)
        else if (raw.startsWith("^")) (TagKind.OpenInverted, raw.substring(1).trim)
        else if (raw.startsWith("/")) (TagKind.CloseSection, raw.substring(1).trim)
        else (TagKind.Double, raw.trim)
      return Some(Tag(kind, open, close + 2, inner))
    }
    None
  }

  // ---- AST --------------------------------------------------------------

  sealed trait Node
  final case class Text(s: String) extends Node
  final case class Variable(name: String, raw: Boolean) extends Node
  final case class Section(name: String, inverted: Boolean, body: Vector[Node]) extends Node

  final case class ParseError(msg: String) extends RuntimeException(msg)

  /** Parse a template into an AST. Mismatched section tags raise ParseError
    * (a config-time failure in the serving layer, never per-request). */
  def parse(template: String): Vector[Node] = {
    // Recursive-descent over the flat tag stream with an explicit stack.
    def walk(pos: Int, sectionName: Option[String]): (Vector[Node], Int) = {
      val out = Vector.newBuilder[Node]
      var cursor = pos
      while (cursor < template.length) {
        nextTag(template, cursor) match {
          case None =>
            sectionName.foreach(n => throw ParseError(s"unclosed section {{#$n}}"))
            out += Text(template.substring(cursor))
            return (out.result(), template.length)
          case Some(t) =>
            if (t.start > cursor) out += Text(template.substring(cursor, t.start))
            t.kind match {
              case TagKind.Double => out += Variable(t.inner, raw = false)
              case TagKind.Triple => out += Variable(t.inner, raw = true)
              case TagKind.OpenSection | TagKind.OpenInverted =>
                // Handlebars-style `{{#if path}} … {{/if}}` (used by the
                // reference's cache templates, customers_cache.sql:35):
                // section lookup path is the argument, the close tag is
                // the literal `if`/`unless`.
                val (closeAs, lookupName) = t.inner.split("\\s+", 2) match {
                  case Array(kw @ ("if" | "unless"), path) => (kw, path)
                  case _ => (t.inner, t.inner)
                }
                val (body, after) = walk(t.end, Some(closeAs))
                val inverted =
                  t.kind == TagKind.OpenInverted || closeAs == "unless"
                out += Section(lookupName, inverted, body)
                cursor = after
              case TagKind.CloseSection =>
                sectionName match {
                  case Some(n) if n == t.inner => return (out.result(), t.end)
                  case Some(n) =>
                    throw ParseError(s"section mismatch: {{#$n}} closed by {{/${t.inner}}}")
                  case None =>
                    throw ParseError(s"unopened section close {{/${t.inner}}}")
                }
            }
            if (t.kind == TagKind.Double || t.kind == TagKind.Triple) cursor = t.end
        }
      }
      sectionName match {
        case Some(n) => throw ParseError(s"unclosed section {{#$n}}")
        case None    => (out.result(), template.length)
      }
    }
    walk(0, None)._1
  }

  // ---- rendering --------------------------------------------------------

  /** HTML-escape per Mustache spec (& < > " '). SQL rarely cares, but the
    * reference's renderer escapes double-brace output, and templates rely
    * on triple-brace for raw — matching it keeps templates portable. */
  def htmlEscape(s: String): String = {
    val b = new StringBuilder(s.length)
    s.foreach {
      case '&' => b.append("&amp;")
      case '<' => b.append("&lt;")
      case '>' => b.append("&gt;")
      case '"' => b.append("&quot;")
      case '\'' => b.append("&#39;")
      case c => b.append(c)
    }
    b.toString
  }

  def render(template: String, ctx: TemplateContext): String =
    renderNodes(parse(template), ctx)

  def renderNodes(nodes: Vector[Node], ctx: TemplateContext): String = {
    val b = new StringBuilder
    def go(ns: Vector[Node]): Unit = ns.foreach {
      case Text(s) => b.append(s)
      case Variable(name, raw) =>
        ctx.lookup(name).foreach(v => b.append(if (raw) v else htmlEscape(v)))
      case Section(name, inverted, body) =>
        val present = ctx.lookup(name).isDefined
        if (present != inverted) go(body)
    }
    go(nodes)
    b.toString
  }
}

/** Nested string-valued render context: namespace -> key -> value, looked
  * up by dotted path. flapi's context namespaces are params / conn / env /
  * cache / auth (sql_template_processor.cpp:120-218). */
final case class TemplateContext(ns: Map[String, Map[String, String]]) {
  def lookup(path: String): Option[String] = {
    val dot = path.indexOf('.')
    if (dot < 0) {
      // bare name: a namespace is "present" if non-empty (sections like
      // {{#params}} are unused in practice but shouldn't crash)
      if (ns.get(path).exists(_.nonEmpty)) Some("") else None
    } else {
      val (space, key) = (path.substring(0, dot), path.substring(dot + 1))
      ns.get(space).flatMap(_.get(key))
    }
  }

  def withNamespace(name: String, kv: Map[String, String]): TemplateContext =
    copy(ns = ns + (name -> (ns.getOrElse(name, Map.empty) ++ kv)))
}

object TemplateContext {
  val empty: TemplateContext = TemplateContext(Map.empty)

  /** Build the standard flapi context from a flat request param map.
    *
    * Mirrors createTemplateContext (sql_template_processor.cpp:120-218):
    * cache* / cursor* / primaryKeys params move into the `cache` namespace,
    * reserved `__auth_*` params into `auth`, whitelisted env vars into
    * `env`, connection properties into `conn`, and everything left is a
    * plain request param.
    */
  private val cacheKeyMap: Map[String, String] = Map(
    "cacheCatalog" -> "catalog",
    "cacheSchema" -> "schema",
    "cacheTable" -> "table",
    "cacheSchedule" -> "schedule",
    "cacheSnapshotId" -> "snapshotId",
    "cacheSnapshotTimestamp" -> "snapshotTimestamp",
    "previousSnapshotId" -> "previousSnapshotId",
    "previousSnapshotTimestamp" -> "previousSnapshotTimestamp",
    "cursorColumn" -> "cursorColumn",
    "cursorType" -> "cursorType",
    "cursorLastValue" -> "cursorLastValue",
    "primaryKeys" -> "primaryKeys")

  /** Reserved cache-namespace param names (reference cache_manager.cpp
    * injects them; the serving shell strips user-supplied ones so a
    * caller can never redirect a template's cache-table reference). */
  val reservedCacheKeys: Set[String] = cacheKeyMap.keySet

  private val authKeyMap: Map[String, String] = Map(
    "__auth_username" -> "username",
    "__auth_roles" -> "roles",
    "__auth_email" -> "email",
    "__auth_type" -> "type",
    "__auth_authenticated" -> "authenticated")

  def forRequest(
      params: Map[String, String],
      connProps: Map[String, String] = Map.empty,
      envAllow: String => Boolean = _ => false,
      env: Map[String, String] = sys.env): TemplateContext = {
    val cache = params.collect { case (k, v) if cacheKeyMap.contains(k) => cacheKeyMap(k) -> v }
    val auth = params.collect { case (k, v) if authKeyMap.contains(k) => authKeyMap(k) -> v }
    val plain = params.filterNot { case (k, _) =>
      cacheKeyMap.contains(k) || authKeyMap.contains(k)
    }
    TemplateContext(Map(
      "params" -> plain,
      "conn" -> connProps,
      "env" -> env.filter { case (k, _) => envAllow(k) },
      "cache" -> cache,
      "auth" -> auth))
  }
}
