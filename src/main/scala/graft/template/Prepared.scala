package graft.template

import graft.config.{RequestFieldConfig}

/** Typed prepared-parameter binding: the structural SQL-injection defense.
  *
  * Pipeline (reference behavior: prepared_template_rewriter.cpp:116-191,
  * sql_parameter_classifier.cpp:12-54, prepared_value_converter.cpp):
  *
  *  1. [[PreparedRewriter.rewrite]] scans the raw template and replaces
  *     every *top-level, double-brace* `{{params.X}}` whose declared field
  *     has a bindable validator type with a positional `?`, recording an
  *     ordered [[BindingSpec]]. Triple-brace tags and anything inside a
  *     Mustache section stay on the text path (a section that renders
  *     falsy would otherwise drop a `?` and shift every later position).
  *  2. The remaining template is Mustache-rendered (sections, conn/env/
  *     cache/auth vars).
  *  3. [[ValueConverter.convert]] strictly parses each raw string param
  *     into its bind type; the typed values go to Spark's parameterized
  *     SQL (`spark.sql(sql, args)`) where they are bound as literal
  *     expressions — never spliced into SQL text.
  */
object SqlParamType extends Enumeration {
  val IntegerT, DoubleT, BooleanT, DateT, TimeT, VarcharT = Value
}

/** One `?` produced by the rewriter, in template order. */
final case class BindingSpec(fieldName: String, tpe: SqlParamType.Value, position: Int)

final case class PreparedRewrite(sql: String, bindings: Vector[BindingSpec])

/** Validator type name -> bind type. First recognized validator wins (for
  * determinism); unknown names leave the field unbindable so it stays on
  * the Mustache path. Mapping per sql_parameter_classifier.cpp:12-54. */
object ParamClassifier {
  def mapType(typeName: String): Option[SqlParamType.Value] = typeName match {
    case "int" | "integer" => Some(SqlParamType.IntegerT)
    case "number" | "float" | "double" => Some(SqlParamType.DoubleT)
    case "boolean" | "bool" => Some(SqlParamType.BooleanT)
    case "date" => Some(SqlParamType.DateT)
    case "time" => Some(SqlParamType.TimeT)
    case "uuid" | "string" | "email" | "enum" => Some(SqlParamType.VarcharT)
    case _ => None
  }

  def classify(field: RequestFieldConfig): Option[SqlParamType.Value] =
    field.validators.iterator.map(v => mapType(v.tpe)).collectFirst {
      case Some(t) => t
    }
}

object PreparedRewriter {
  import Mustache.{TagKind, nextTag}

  /** Rewrite bindable top-level `{{params.X}}` to `?`. Everything else —
    * text, sections, triple braces, unknown/untyped params — is copied
    * through verbatim for the Mustache pass. */
  def rewrite(template: String, fields: Seq[RequestFieldConfig]): PreparedRewrite = {
    val byName = fields.map(f => f.fieldName -> f).toMap
    val out = new StringBuilder(template.length)
    val bindings = Vector.newBuilder[BindingSpec]
    var n = 0
    var cursor = 0
    var sectionDepth = 0
    var done = false
    while (!done && cursor < template.length) {
      nextTag(template, cursor) match {
        case None =>
          out.append(template.substring(cursor)); done = true
        case Some(t) =>
          out.append(template.substring(cursor, t.start))
          t.kind match {
            case TagKind.OpenSection | TagKind.OpenInverted =>
              sectionDepth += 1
              out.append(template.substring(t.start, t.end))
            case TagKind.CloseSection =>
              if (sectionDepth > 0) sectionDepth -= 1
              out.append(template.substring(t.start, t.end))
            case TagKind.Triple =>
              out.append(template.substring(t.start, t.end))
            case TagKind.Double =>
              val bindType =
                if (sectionDepth == 0 && t.inner.startsWith("params."))
                  byName.get(t.inner.stripPrefix("params."))
                    .flatMap(ParamClassifier.classify)
                else None
              bindType match {
                case Some(tpe) =>
                  out.append('?')
                  bindings += BindingSpec(t.inner.stripPrefix("params."), tpe, n)
                  n += 1
                case None =>
                  out.append(template.substring(t.start, t.end))
              }
          }
          cursor = t.end
      }
    }
    PreparedRewrite(out.toString, bindings.result())
  }
}

/** Strict string -> typed-value conversion for prepared binds. Any parse
  * failure is a client error (HTTP 400 in the serving shell) — never
  * silently truncated, since "1; DROP TABLE t" must not bind as 1.
  * Behavior per prepared_value_converter.cpp. */
object ValueConverter {
  sealed trait Outcome
  /** value is the JVM object Spark's parameterized SQL will bind as a
    * typed literal; None encodes SQL NULL (absent param). */
  final case class Ok(value: Option[Any]) extends Outcome
  final case class Err(message: String) extends Outcome

  val intErr = "Integer parameter is not a valid signed 64-bit integer"
  val dblErr = "Double parameter is not a valid IEEE-754 number"
  val boolErr = "Boolean parameter must be 'true', 'false', '1', or '0'"
  val dateErr = "Date parameter must be YYYY-MM-DD"
  val timeErr = "Time parameter must be HH:MM:SS or HH:MM:SS.ffffff"

  def convert(tpe: SqlParamType.Value, raw: Option[String]): Outcome = raw match {
    case None => Ok(None)
    case Some(s) =>
      tpe match {
        case SqlParamType.IntegerT => convertInt(s)
        case SqlParamType.DoubleT => convertDouble(s)
        case SqlParamType.BooleanT => convertBool(s)
        case SqlParamType.DateT => convertDate(s)
        case SqlParamType.TimeT => convertTime(s)
        case SqlParamType.VarcharT => Ok(Some(s))
      }
  }

  // Leading sign + digits, full consume modulo trailing whitespace (the
  // reference allows trailing spaces after strtoll, nothing else).
  private def convertInt(s: String): Outcome = {
    val core = s.replaceAll("[ \t\n\r]+$", "")
    if (core.isEmpty) return Err(intErr)
    try Ok(Some(java.lang.Long.parseLong(core)))
    catch { case _: NumberFormatException => Err(intErr) }
  }

  private def convertDouble(s: String): Outcome = {
    val core = s.replaceAll("[ \t\n\r]+$", "")
    if (core.isEmpty) return Err(dblErr)
    // java parseDouble accepts "1d", "0x1p3", "Infinity", "NaN" — strtod
    // accepts hex/inf/nan too, but not the 'd'/'f' suffixes; reject those.
    if (core.exists(c => c == 'd' || c == 'D' || c == 'f' || c == 'F') &&
        !core.toLowerCase.contains("inf") && !core.toLowerCase.contains("nan") &&
        !core.toLowerCase.startsWith("0x") && !core.toLowerCase.startsWith("-0x"))
      return Err(dblErr)
    try Ok(Some(java.lang.Double.parseDouble(core)))
    catch { case _: NumberFormatException => Err(dblErr) }
  }

  private def convertBool(s: String): Outcome = s.toLowerCase match {
    case "true" | "1" => Ok(Some(java.lang.Boolean.TRUE))
    case "false" | "0" => Ok(Some(java.lang.Boolean.FALSE))
    case _ => Err(boolErr)
  }

  // YYYY-MM-DD with a real calendar check; empty string -> NULL (the
  // reference treats empty date/time as absent).
  private def convertDate(s: String): Outcome = {
    if (s.isEmpty) return Ok(None)
    if (s.length != 10 || s.charAt(4) != '-' || s.charAt(7) != '-') return Err(dateErr)
    val parts = Seq(s.substring(0, 4), s.substring(5, 7), s.substring(8, 10))
    if (!parts.forall(_.forall(_.isDigit))) return Err(dateErr)
    try Ok(Some(java.time.LocalDate.of(parts(0).toInt, parts(1).toInt, parts(2).toInt)))
    catch { case _: java.time.DateTimeException => Err(dateErr) }
  }

  // HH:MM:SS[.ffffff]; empty -> NULL.
  private def convertTime(s: String): Outcome = {
    if (s.isEmpty) return Ok(None)
    if (s.length < 8 || s.charAt(2) != ':' || s.charAt(5) != ':') return Err(timeErr)
    val (h, m, sec) = (s.substring(0, 2), s.substring(3, 5), s.substring(6, 8))
    if (!(h + m + sec).forall(_.isDigit)) return Err(timeErr)
    val (hi, mi, si) = (h.toInt, m.toInt, sec.toInt)
    if (hi > 23 || mi > 59 || si > 59) return Err(timeErr)
    var micros = 0
    if (s.length > 8) {
      if (s.charAt(8) != '.') return Err(timeErr)
      val frac = s.substring(9)
      if (frac.isEmpty || frac.length > 6 || !frac.forall(_.isDigit)) return Err(timeErr)
      micros = frac.padTo(6, '0').toInt
    }
    Ok(Some(java.time.LocalTime.of(hi, mi, si, micros * 1000)))
  }
}
