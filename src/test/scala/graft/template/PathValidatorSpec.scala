package graft.template

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** path_validator.cpp parity: decode-then-check ordering, traversal
  * rejection in both separator styles, scheme allowlist, base
  * confinement, prefix restriction. */
class PathValidatorSpec extends AnyFunSuite {

  private def bad(p: String, base: Option[String] = Some("/srv/templates")) =
    PathValidator.validate(p, base).isLeft
  private def ok(p: String, base: Option[String] = Some("/srv/templates")) =
    PathValidator.validate(p, base).isRight

  test("plain and encoded traversal rejected; legit names pass") {
    assert(bad("../secrets.sql"))
    assert(bad("a/../../b.sql"))
    assert(bad("..\\windows\\style.sql"))
    assert(bad("%2e%2e%2fetc%2fpasswd"))       // decodes to ../etc/passwd
    assert(bad("%2e%2e/partial-encoding.sql"))
    assert(ok("customers.sql"))
    assert(ok("northwind/orders.sql"))
    assert(ok("dotted..name.sql"))              // '..' inside a segment is fine
    assert(bad(""))
  }

  test("remote schemes: known allowed, unknown rejected, traversal still checked") {
    assert(ok("s3a://bucket/templates/x.sql", None))
    assert(ok("https://host/x.sql", None))
    assert(bad("ftp://host/x.sql", None))
    assert(bad("jar:file:///x.sql!/y", None))
    assert(bad("https://host/../x.sql", None))
  }

  test("file: URIs obey the allowed-prefix fence like bare local paths") {
    val base = Files.createTempDirectory("pv_file_uri")
    Files.writeString(base.resolve("t.sql"), "SELECT 1")
    val cfg = PathValidator.Config(allowedPrefixes = Seq(base.toString))
    // the r5-advised bypass: file:///etc/passwd must not sail through
    // the remote branch while /etc/passwd is correctly fenced
    assert(PathValidator.validate("file:///etc/passwd", None, cfg).isLeft)
    assert(PathValidator.validate("/etc/passwd", None, cfg).isLeft)
    assert(PathValidator.validate(s"file://$base/t.sql", None, cfg).isRight)
    // a file URI with a remote authority is not a local read
    assert(PathValidator.validate("file://evilhost/x.sql", None, cfg).isLeft)
    // scheme allowlist still applies before any rewriting
    assert(PathValidator.validate("file:///x.sql", None,
      PathValidator.Config(allowedSchemes = Set("https"))).isLeft)
    // unfenced trusted use (no prefixes) keeps absolute file: loads
    assert(PathValidator.validate(s"file://$base/t.sql", None).isRight)
    // RFC 8089: a localhost authority means local
    assert(PathValidator.validate(s"file://localhost$base/t.sql", None, cfg).isRight)
    // the scheme must not add a second percent-decode: file:-wrapped
    // and bare spellings of the same path resolve identically
    assert(PathValidator.validate("file:///data/a%2520b.sql", None) ==
      PathValidator.validate("/data/a%2520b.sql", None))
  }

  test("base confinement and allowed-prefix restriction") {
    val base = Files.createTempDirectory("pv_base")
    val outside = Files.createTempDirectory("pv_outside")
    Files.writeString(base.resolve("t.sql"), "SELECT 1")
    val cfg = PathValidator.Config(allowedPrefixes = Seq(base.toString))
    assert(PathValidator.validate("t.sql", Some(base.toString), cfg).isRight)
    // absolute path outside the allowed prefix is rejected
    assert(PathValidator.validate(
      outside.resolve("x.sql").toString, Some(base.toString), cfg).isLeft)
  }

  test("TemplateSource.load refuses traversal before touching the filesystem") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[1]").appName("pv-spec")
      .config("spark.ui.enabled", "false").getOrCreate()
    try {
      val base = Files.createTempDirectory("pv_load")
      val e = intercept[SecurityException] {
        TemplateSource.load(spark, "../../etc/passwd", Some(base.toString))
      }
      assert(e.getMessage.contains("traversal"))
    } finally spark.stop()
  }
}
