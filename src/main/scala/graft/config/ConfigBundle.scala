package graft.config

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.file.{Files, Path, StandardCopyOption}
import java.util.zip.{ZipEntry, ZipFile, ZipOutputStream}

import scala.jdk.CollectionConverters._
import scala.util.matching.Regex

/** Self-contained config bundles — the reference's self-packaging
  * surface (pack.cpp, bundle_locator.cpp, embedded_archive_file_
  * provider.cpp) re-expressed for a JVM library.
  *
  * flapi packs its YAML/SQL config tree into a deterministic ZIP and
  * appends it to the executable; at startup a locator finds the
  * archive and the server boots from it. graft is a library in a
  * Spark cluster, so the distributable artifact is a bundle FILE (or
  * a bundle appended to any host file, e.g. the application jar —
  * the JDK's ZipFile performs the same tail EOCD scan the reference
  * implements by hand, so appended bundles open directly):
  *
  *  - [[pack]] mirrors pack.cpp: recursive collect, forward-slash
  *    relative names, refuse secret-looking files (.env, secrets/,
  *    *.pem, *.key — the reference's deny list, pack.cpp:20-27)
  *    unless explicitly overridden, validate BEFORE any output I/O,
  *    deterministic output via SOURCE_DATE_EPOCH (explicit arg →
  *    env var → 0, pack.cpp:30-41), entries sorted by name;
  *  - [[unpackTo]] + [[discoverEndpoints]] mirror the embedded
  *    archive provider: boot the endpoint tree from a bundle.
  */
object ConfigBundle {

  /** pack.cpp:20-27 — the same four deny patterns. */
  private val SecretPatterns: Seq[Regex] = Seq(
    "(^|/)[^/]*\\.env$".r,
    "(^|/)secrets/".r,
    "(^|/)[^/]*\\.pem$".r,
    "(^|/)[^/]*\\.key$".r)

  def isSecretExcluded(relPath: String): Boolean =
    SecretPatterns.exists(_.findFirstIn(relPath).isDefined)

  final case class PackResult(output: Path, entryCount: Int, archiveSize: Long)

  final class PackError(msg: String) extends RuntimeException(msg)

  private def resolveEpoch(explicit: Option[Long]): Long =
    explicit.orElse(sys.env.get("SOURCE_DATE_EPOCH").flatMap(_.toLongOption))
      .getOrElse(0L)

  /** Pack `inDir` into a ZIP bundle at `out`. With `appendTo`, the host
    * file's bytes are copied first and the archive appended after them
    * (the packed-binary layout; ZipFile still opens the result). */
  def pack(
      inDir: Path,
      out: Path,
      allowSecrets: Boolean = false,
      sourceDateEpoch: Option[Long] = None,
      appendTo: Option[Path] = None): PackResult = {
    if (!Files.isDirectory(inDir))
      throw new PackError(s"input is not a directory: $inDir")
    // Collect + validate against the deny list BEFORE any output I/O —
    // a rejected .env must not leave a half-written bundle behind
    // (pack.cpp:148-152).
    val entries = Files.walk(inDir).iterator().asScala
      .filter(Files.isRegularFile(_))
      .map { p =>
        val rel = inDir.relativize(p).iterator().asScala.mkString("/")
        if (!allowSecrets && isSecretExcluded(rel))
          throw new PackError(
            s"refusing to bundle secret-looking file: $rel (override with allowSecrets)")
        rel -> Files.readAllBytes(p)
      }
      .toSeq.sortBy(_._1)
    val epochMillis = resolveEpoch(sourceDateEpoch) * 1000L

    // a bare relative filename has a null getParent — anchor on the
    // absolute path so the temp sibling (same-filesystem atomic move)
    // always has a directory
    val outAbs = out.toAbsolutePath
    val tmp = Files.createTempFile(outAbs.getParent, ".bundle", ".part")
    try {
      val hostBytes = appendTo.map(Files.size(_)).getOrElse(0L)
      val fos = new FileOutputStream(tmp.toFile)
      appendTo.foreach(host => Files.copy(host, fos))
      val zos = new ZipOutputStream(new BufferedOutputStream(fos))
      entries.foreach { case (name, data) =>
        val e = new ZipEntry(name)
        e.setTime(epochMillis)
        zos.putNextEntry(e)
        zos.write(data)
        zos.closeEntry()
      }
      zos.close()
      val total = Files.size(tmp)
      Files.move(tmp, outAbs, StandardCopyOption.REPLACE_EXISTING,
        StandardCopyOption.ATOMIC_MOVE)
      PackResult(out, entries.size, total - hostBytes)
    } finally Files.deleteIfExists(tmp)
  }

  /** List bundle entry names (bundle may be standalone or appended to a
    * host file — ZipFile's tail scan finds the archive either way). */
  def entryNames(bundle: Path): Seq[String] = {
    val zf = new ZipFile(bundle.toFile)
    try zf.entries().asScala.map(_.getName).toSeq.sorted
    finally zf.close()
  }

  /** Read one entry's bytes, or None. */
  def entry(bundle: Path, name: String): Option[Array[Byte]] = {
    val zf = new ZipFile(bundle.toFile)
    try Option(zf.getEntry(name)).map { e =>
      zf.getInputStream(e).readAllBytes()
    } finally zf.close()
  }

  /** Extract the bundle under `destDir` (zip-slip-hardened: every entry
    * must resolve inside `destDir`). Returns `destDir`. */
  def unpackTo(bundle: Path, destDir: Path): Path = {
    val root = destDir.toAbsolutePath.normalize()
    Files.createDirectories(root)
    val zf = new ZipFile(bundle.toFile)
    try {
      zf.entries().asScala.foreach { e =>
        if (!e.isDirectory) {
          val target = root.resolve(e.getName).normalize()
          if (!target.startsWith(root))
            throw new PackError(s"bundle entry escapes destination: ${e.getName}")
          Files.createDirectories(target.getParent)
          val in = zf.getInputStream(e)
          try Files.write(target, in.readAllBytes())
          finally in.close()
        }
      }
      root
    } finally zf.close()
  }

  /** Boot path: endpoint configs straight from a bundle (embedded
    * archive provider parity — the tree is staged to a scratch dir and
    * discovered with the standard loader, so includes/env expansion
    * behave identically to a directory boot). The scratch tree is
    * deleted before returning: a bundle packed with allowSecrets must
    * not leave config copies accumulating under the world-readable
    * tmpdir. Callers that need the files themselves (template serving)
    * use [[unpackTo]] with a directory they own. */
  def discoverEndpoints(
      bundle: Path,
      envAllow: String => Boolean = _ => false): Seq[EndpointConfig] = {
    val scratch = Files.createTempDirectory("graft_bundle")
    try YamlConfig.discoverEndpoints(unpackTo(bundle, scratch).toString, envAllow)
    finally {
      Files.walk(scratch).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.deleteIfExists(p))
    }
  }
}
