package graft.validate

import graft.config.{RequestFieldConfig, ValidatorConfig}
import graft.template.{ParamClassifier, SqlParamType}

/** Request-parameter validation (reference: request_validator.cpp:14-388).
  *
  * Two layers of defense, applied before any SQL is built:
  *  - per-field typed validators (string/int/email/uuid/date/time/enum)
  *  - a SQL-keyword/pattern heuristic on every value, demoted to a no-op
  *    for fields that bind through a non-varchar prepared type (the typed
  *    bind is the hard defense there; varchar fields keep the heuristic
  *    because templates may still reference them via raw triple-brace).
  */
final case class ValidationError(field: String, message: String)

object RequestValidator {

  def validate(
      fields: Seq[RequestFieldConfig],
      params: Map[String, String]): Seq[ValidationError] =
    fields.flatMap(f => validateField(f, params))

  def validateField(
      field: RequestFieldConfig,
      params: Map[String, String]): Seq[ValidationError] =
    params.get(field.fieldName) match {
      case None =>
        if (field.required) Seq(ValidationError(field.fieldName, "Required field is missing"))
        else Nil
      case Some(value) =>
        val typed = field.validators.flatMap { v =>
          v.tpe match {
            case "string" => validateString(field.fieldName, value, v)
            case "int" => validateInt(field.fieldName, value, v)
            case "email" => validateEmail(field.fieldName, value)
            case "uuid" => validateUuid(field.fieldName, value)
            case "date" => validateDate(field.fieldName, value, v)
            case "time" => validateTime(field.fieldName, value, v)
            case "enum" => validateEnum(field.fieldName, value, v)
            case _ => Nil
          }
        }
        typed ++ injectionCheck(field, value)
    }

  /** Heuristic runs unless ALL validators opt out; demoted (log-only in
    * the reference, skipped here) when the field binds as a non-varchar
    * prepared type — those bind sites cannot carry SQL text. */
  private def injectionCheck(
      field: RequestFieldConfig,
      value: String): Seq[ValidationError] = {
    val enabled =
      field.validators.isEmpty || field.validators.exists(_.preventSqlInjection)
    if (!enabled) return Nil
    val bindType = ParamClassifier.classify(field)
    val bypass = bindType.exists(_ != SqlParamType.VarcharT)
    if (bypass) Nil else validateSqlInjection(field.fieldName, value)
  }

  // ---- typed validators --------------------------------------------------

  def validateString(name: String, value: String, v: ValidatorConfig): Seq[ValidationError] = {
    val errs = Seq.newBuilder[ValidationError]
    if (v.min > 0 && value.length < v.min)
      errs += ValidationError(name, "String is shorter than the minimum allowed length")
    if (v.max > 0 && value.length > v.max)
      errs += ValidationError(name, "String is longer than the maximum allowed length")
    if (v.regex.nonEmpty && !v.regex.r.matches(value))
      errs += ValidationError(name, "Invalid string format")
    errs.result()
  }

  /** Full-consume strict parse: "1; DROP TABLE t" must not validate as 1. */
  def validateInt(name: String, value: String, v: ValidatorConfig): Seq[ValidationError] =
    try {
      val i = Integer.parseInt(value)
      val errs = Seq.newBuilder[ValidationError]
      if (i < v.min) errs += ValidationError(name, "Integer is less than the minimum allowed value")
      if (v.max != 0 && i > v.max)
        errs += ValidationError(name, "Integer is greater than the maximum allowed value")
      errs.result()
    } catch {
      case _: NumberFormatException => Seq(ValidationError(name, "Invalid integer value"))
    }

  private val emailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}".r
  def validateEmail(name: String, value: String): Seq[ValidationError] =
    if (emailRe.matches(value)) Nil else Seq(ValidationError(name, "Invalid email format"))

  private val uuidRe =
    "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$".r
  def validateUuid(name: String, value: String): Seq[ValidationError] =
    if (uuidRe.matches(value)) Nil else Seq(ValidationError(name, "Invalid UUID format"))

  def validateDate(name: String, value: String, v: ValidatorConfig): Seq[ValidationError] = {
    parseDateStrict(value) match {
      case None => Seq(ValidationError(name, "Invalid date format"))
      case Some(d) =>
        val errs = Seq.newBuilder[ValidationError]
        if (v.minDate.nonEmpty) parseDateStrict(v.minDate).foreach { min =>
          if (d.isBefore(min))
            errs += ValidationError(name, "Date is before the minimum allowed date")
        }
        if (v.maxDate.nonEmpty) parseDateStrict(v.maxDate).foreach { max =>
          if (d.isAfter(max))
            errs += ValidationError(name, "Date is after the maximum allowed date")
        }
        errs.result()
    }
  }

  private def parseDateStrict(s: String): Option[java.time.LocalDate] = {
    if (s.length != 10 || s.charAt(4) != '-' || s.charAt(7) != '-') return None
    try Some(java.time.LocalDate.parse(s))
    catch { case _: java.time.format.DateTimeParseException => None }
  }

  def validateTime(name: String, value: String, v: ValidatorConfig): Seq[ValidationError] = {
    parseTimeStrict(value) match {
      case None => Seq(ValidationError(name, "Invalid time format"))
      case Some(t) =>
        val errs = Seq.newBuilder[ValidationError]
        if (v.minTime.nonEmpty) parseTimeStrict(v.minTime).foreach { min =>
          if (t.isBefore(min))
            errs += ValidationError(name, "Time is before the minimum allowed time")
        }
        if (v.maxTime.nonEmpty) parseTimeStrict(v.maxTime).foreach { max =>
          if (t.isAfter(max))
            errs += ValidationError(name, "Time is after the maximum allowed time")
        }
        errs.result()
    }
  }

  private def parseTimeStrict(s: String): Option[java.time.LocalTime] = {
    if (s.length != 8 || s.charAt(2) != ':' || s.charAt(5) != ':') return None
    try Some(java.time.LocalTime.parse(s))
    catch { case _: java.time.format.DateTimeParseException => None }
  }

  def validateEnum(name: String, value: String, v: ValidatorConfig): Seq[ValidationError] =
    if (v.allowedValues.contains(value)) Nil
    else Seq(ValidationError(name, "Invalid enum value"))

  // ---- SQL-injection heuristic (request_validator.cpp:265-353) -----------

  private val sqlKeywords = Seq(
    "SELECT", "INSERT", "UPDATE", "DELETE", "DROP", "TRUNCATE", "ALTER",
    "CREATE", "TABLE", "UNION", "EXEC", "EXECUTE", "SCRIPT", "DECLARE",
    "CAST", "CONVERT")
  private val keywordRes = sqlKeywords.map(k => ("(?i)\\b" + k + "\\b").r)

  private val dangerousPatterns = Seq(
    "';", "--", "/*", "*/", "xp_", "sp_",
    " OR 1=1", " OR '1'='1", "AND 1=1", "1=1", "1=2")

  def validateSqlInjection(name: String, value: String): Seq[ValidationError] = {
    val hit = ValidationError(name, "Potential SQL injection detected")
    if (keywordRes.exists(_.findFirstIn(value).isDefined)) return Seq(hit)
    val upper = value.toUpperCase
    if (dangerousPatterns.exists(p => upper.contains(p.toUpperCase))) return Seq(hit)
    // Bare single quote: flag only when the surrounding context smells of
    // boolean logic (OR/AND/;/= near the quote).
    var pos = value.indexOf('\'')
    while (pos >= 0) {
      val ctx = value.substring(math.max(0, pos - 2),
        math.min(value.length, pos + 3)).toUpperCase
      if (ctx.contains("OR") || ctx.contains("AND") || ctx.contains(";") || ctx.contains("="))
        return Seq(hit)
      pos = value.indexOf('\'', pos + 1)
    }
    Nil
  }

  // ---- unknown-param rejection (T7, request_validator.cpp:355-388) -------

  private val authReservedPrefix = "__auth_"

  /** offset/limit are always allowed (pagination); `__auth_*` keys are
    * engine-injected, never user input. */
  def validateUnknownParams(
      fields: Seq[RequestFieldConfig],
      params: Map[String, String]): Seq[ValidationError] = {
    val known = fields.map(_.fieldName).toSet + "offset" + "limit"
    params.keys.collect {
      case k if !k.startsWith(authReservedPrefix) && !known.contains(k) &&
          // system-injected cache namespace (server strips user-supplied
          // ones before injection, so this never weakens REST validation)
          !graft.template.TemplateContext.reservedCacheKeys.contains(k) =>
        ValidationError(k, "Unknown parameter not defined in endpoint configuration")
    }.toSeq
  }
}
