package graft.config

import java.nio.file.{Files, Path}
import java.security.MessageDigest
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.scalatest.funsuite.AnyFunSuite

/** Self-packaging parity (pack.cpp / bundle_locator.cpp): deterministic
  * bundles, the secret deny list, appended-to-host archives, zip-slip
  * hardening, and boot-from-bundle endpoint discovery. */
class ConfigBundleSpec extends AnyFunSuite {

  private def tree(): Path = {
    val d = Files.createTempDirectory("bundle_in")
    Files.writeString(d.resolve("customers.yaml"),
      """url-path: /customers
        |template-source: customers.sql
        |connection: [main]
        |""".stripMargin)
    Files.createDirectories(d.resolve("sql"))
    Files.writeString(d.resolve("sql/customers.sql"),
      "SELECT * FROM customer")
    d
  }

  private def sha(p: Path): String =
    MessageDigest.getInstance("SHA-256").digest(Files.readAllBytes(p))
      .map("%02x".format(_)).mkString

  test("pack collects the tree with forward-slash names, sorted") {
    val in = tree()
    val out = Files.createTempDirectory("bundle_out").resolve("b.zip")
    val r = ConfigBundle.pack(in, out, sourceDateEpoch = Some(0L))
    assert(r.entryCount == 2 && r.archiveSize > 0)
    assert(ConfigBundle.entryNames(out) == Seq("customers.yaml", "sql/customers.sql"))
    assert(new String(ConfigBundle.entry(out, "sql/customers.sql").get)
      .contains("SELECT"))
  }

  test("pack accepts a bare relative output filename (null getParent)") {
    val in = tree()
    val out = java.nio.file.Paths.get("graft_test_rel_bundle.zip")
    try {
      val r = ConfigBundle.pack(in, out)
      assert(r.entryCount == 2 && Files.exists(out))
    } finally Files.deleteIfExists(out)
  }

  test("pack output is byte-deterministic under a pinned epoch") {
    val in = tree()
    val d = Files.createTempDirectory("bundle_out")
    val a = d.resolve("a.zip"); val b = d.resolve("b.zip")
    ConfigBundle.pack(in, a, sourceDateEpoch = Some(1700000000L))
    ConfigBundle.pack(in, b, sourceDateEpoch = Some(1700000000L))
    assert(sha(a) == sha(b))
  }

  test("secret-looking files are refused before any output is written") {
    val in = tree()
    Files.writeString(in.resolve("prod.env"), "DB_PASSWORD=hunter2")
    val out = Files.createTempDirectory("bundle_out").resolve("b.zip")
    val e = intercept[ConfigBundle.PackError] { ConfigBundle.pack(in, out) }
    assert(e.getMessage.contains("prod.env"))
    assert(!Files.exists(out), "rejected pack must not leave output behind")
    // explicit override packs it (pack.cpp --allow-secrets)
    val r = ConfigBundle.pack(in, out, allowSecrets = true)
    assert(r.entryCount == 3)
  }

  test("deny list matches the reference patterns") {
    assert(ConfigBundle.isSecretExcluded("a/.env"))
    assert(ConfigBundle.isSecretExcluded("prod.env"))
    assert(ConfigBundle.isSecretExcluded("secrets/token.txt"))
    assert(ConfigBundle.isSecretExcluded("tls/server.pem"))
    assert(ConfigBundle.isSecretExcluded("deep/dir/signing.key"))
    assert(!ConfigBundle.isSecretExcluded("environment.yaml"))
    assert(!ConfigBundle.isSecretExcluded("monkey.yaml"))
  }

  test("bundle appended to a host file still opens (EOCD tail scan)") {
    val in = tree()
    val d = Files.createTempDirectory("bundle_out")
    val host = d.resolve("host.bin")
    Files.write(host, Array.fill[Byte](4096)(0x42))
    val out = d.resolve("packed.bin")
    val r = ConfigBundle.pack(in, out, appendTo = Some(host))
    assert(r.archiveSize > 0)
    // host prefix preserved byte-for-byte
    assert(Files.readAllBytes(out).take(4096).forall(_ == 0x42))
    // the archive is located and readable despite the prefix
    assert(ConfigBundle.entryNames(out).contains("customers.yaml"))
  }

  test("unpack refuses zip-slip entries") {
    val d = Files.createTempDirectory("bundle_out")
    val evil = d.resolve("evil.zip")
    val zos = new ZipOutputStream(Files.newOutputStream(evil))
    zos.putNextEntry(new ZipEntry("../outside.txt"))
    zos.write("x".getBytes)
    zos.closeEntry(); zos.close()
    intercept[ConfigBundle.PackError] {
      ConfigBundle.unpackTo(evil, d.resolve("dest"))
    }
  }

  test("endpoints boot straight from a bundle") {
    val in = tree()
    val out = Files.createTempDirectory("bundle_out").resolve("b.zip")
    ConfigBundle.pack(in, out)
    val eps = ConfigBundle.discoverEndpoints(out)
    assert(eps.map(_.urlPath) == Seq("/customers"))
    assert(eps.head.templateSource == "customers.sql")
  }
}
