package graft.template

import java.nio.file.{Files, Paths}

/** Template-path validation (reference path_validator.cpp): template
  * sources can be set by config-service operators at runtime (REST PUT
  * /template, graft_update_template MCP tool), so a hostile or sloppy
  * value must not escape a RELATIVE base by traversal, and absolute /
  * remote sources are governed by `allowedPrefixes` / the scheme
  * allowlist — untrusted surfaces (the config API) pass the configured
  * storage dirs as allowed prefixes, so absolute escapes like
  * /etc/passwd are rejected there; trusted boot-time loading keeps
  * absolute paths available.
  *
  * Order matters and mirrors the reference: URL-decode FIRST (an
  * encoded `%2e%2e%2f` must not survive to the filesystem), then
  * reject `..` segments in either separator style, then dispatch
  * remote (scheme allowlist, no filesystem canonicalization) vs local
  * (optional base-confinement + symlink resolution + prefix check).
  */
object PathValidator {

  final case class Config(
      allowLocal: Boolean = true,
      allowRelative: Boolean = true,
      allowedSchemes: Set[String] = Set(
        "http", "https", "file", "hdfs",
        "s3", "s3a", "s3n", "gs", "abfs", "abfss", "wasb", "wasbs"),
      allowedPrefixes: Seq[String] = Nil, // empty = any prefix
      resolveSymlinks: Boolean = false)

  /** Decode %XX escapes only ('+' stays literal — template names may
    * legitimately contain it; the reference decodes the same way). A
    * malformed escape decodes to itself rather than erroring: the
    * traversal check must still see whatever the filesystem would. */
  private[template] def urlDecode(s: String): String = {
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
          Character.digit(s.charAt(i + 1), 16) >= 0 &&
          Character.digit(s.charAt(i + 2), 16) >= 0) {
        out.append((Character.digit(s.charAt(i + 1), 16) * 16 +
          Character.digit(s.charAt(i + 2), 16)).toChar)
        i += 3
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  private[template] def containsTraversal(path: String): Boolean =
    path.split("[/\\\\]", -1).contains("..")

  /** Returns Right(validated path) or Left(reason). */
  def validate(
      userPath: String,
      basePath: Option[String],
      cfg: Config = Config()): Either[String, String] = {
    if (userPath.isEmpty) return Left("Path cannot be empty")
    val decoded = urlDecode(userPath)
    // any scheme-like prefix (colon before the first slash) must pass
    // the allowlist — "jar:file://…"-style nested URIs are not local
    // filenames and must not fall through to the local branch
    val colonIdx = decoded.indexOf(':')
    val slashIdx = decoded.indexOf('/')
    val schemeLike = colonIdx > 0 && (slashIdx < 0 || colonIdx < slashIdx)
    if (TemplateSource.isRemote(decoded) || schemeLike) {
      val scheme = decoded.takeWhile(_ != ':').toLowerCase
      if (!cfg.allowedSchemes.contains(scheme))
        Left(s"URL scheme not allowed: $scheme")
      else if (scheme == "file") {
        // a file: URI is a LOCAL read wearing a scheme — it must pass
        // the same base-confinement/prefix checks as a bare path, or
        // `file:///etc/passwd` sails through any allowedPrefixes fence
        // that correctly blocks `/etc/passwd` (untrusted config-API
        // submissions pass the storage dirs as prefixes). Strip the
        // scheme/authority and run the ALREADY-DECODED remainder
        // through the local branch — not a recursive validate(), which
        // would decode a second time and make `file:` paths resolve
        // differently from the same path written bare.
        val rest = decoded.substring("file:".length)
        if (rest.startsWith("//")) {
          val after = rest.substring(2)
          val slash = after.indexOf('/')
          val authority = if (slash < 0) after else after.substring(0, slash)
          // RFC 8089: empty and "localhost" authorities mean local
          if (authority.nonEmpty && authority != "localhost")
            Left("file URI with a remote authority is not allowed")
          else if (slash < 0) Left("file URI has no path")
          else validateLocal(after.substring(slash), basePath, cfg)
        } else validateLocal(rest, basePath, cfg)
      }
      else if (containsTraversal(decoded.dropWhile(_ != ':')))
        Left("Path traversal not allowed")
      else Right(decoded)
    } else validateLocal(decoded, basePath, cfg)
  }

  /** The local branch: traversal rejection, optional base confinement,
    * symlink resolution, allowed-prefix fence. `decoded` must already
    * be percent-decoded exactly once. */
  private def validateLocal(
      decoded: String,
      basePath: Option[String],
      cfg: Config): Either[String, String] = {
      if (!cfg.allowLocal) return Left("Local paths not allowed")
      if (containsTraversal(decoded)) return Left("Path traversal not allowed")
      val p = Paths.get(decoded)
      val canonical =
        if (p.isAbsolute) p.normalize()
        else {
          if (!cfg.allowRelative) return Left("Relative paths not allowed")
          basePath.filter(_.nonEmpty) match {
            case Some(base) =>
              val b = Paths.get(base).toAbsolutePath.normalize()
              val joined = b.resolve(decoded).normalize()
              // belt-and-braces: even without a ".." segment the join
              // must land inside the base
              if (!joined.startsWith(b)) return Left("Path traversal not allowed")
              joined
            case None => p.normalize()
          }
        }
      val real =
        if (cfg.resolveSymlinks && Files.exists(canonical))
          try canonical.toRealPath()
          catch { case e: java.io.IOException =>
            return Left(s"Failed to resolve path: ${e.getMessage}")
          }
        else canonical
      if (cfg.allowedPrefixes.nonEmpty &&
          !cfg.allowedPrefixes.exists(pre =>
            real.startsWith(Paths.get(pre).toAbsolutePath.normalize())))
        Left("Path not within allowed directory")
      else Right(real.toString)
  }
}
