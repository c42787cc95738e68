package graft.api

import graft.config.EndpointConfig

/** Endpoint-config validation shared by the server's config API and
  * the offline CLI — one rule set, so the two surfaces cannot drift: a
  * config `graft-cli validate` passes must be one the running config
  * service accepts (same checks, same error strings).
  */
object EndpointValidator {

  /** Checks that need no template text: URL shape, field uniqueness.
    * Prompt-/tool-only configs (mcpOnly) have no REST route and are
    * exempt from the url-path rule. */
  def structuralErrors(cfg: EndpointConfig): Seq[String] = {
    val errs = scala.collection.mutable.ArrayBuffer.empty[String]
    if (!cfg.mcpOnly && !cfg.urlPath.startsWith("/"))
      errs += "url-path must start with '/'"
    cfg.requestFields.groupBy(_.fieldName).collect {
      case (n, fs) if fs.size > 1 => errs += s"duplicate request field '$n'"
    }
    errs.toSeq
  }

  /** Template checks: non-empty + a dry render with defaults (catches
    * Mustache/dialect errors without executing anything). */
  def templateErrors(cfg: EndpointConfig, template: String,
      connProps: Map[String, String] = Map.empty): Seq[String] =
    if (template.trim.isEmpty) Seq("template is empty")
    else
      try {
        TemplatePipeline.prepare(cfg, template, Map.empty, connProps) match {
          case Left(_) => Nil // param errors on EMPTY params are fine
          case Right(_) => Nil
        }
      } catch { case e: Exception =>
        Seq(s"template error: ${String.valueOf(e.getMessage)}")
      }

  /** Full check: structure first; the dry render runs only on a
    * structurally-sound config (its errors would be noise otherwise). */
  def errors(cfg: EndpointConfig, template: String,
      connProps: Map[String, String] = Map.empty): Seq[String] = {
    val structural = structuralErrors(cfg)
    if (template.trim.isEmpty) structural :+ "template is empty"
    else if (structural.nonEmpty) structural
    else templateErrors(cfg, template, connProps)
  }
}
