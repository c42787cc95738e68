package graft.server

import java.security.KeyStore
import java.security.cert.CertificateFactory
import java.util.Base64

import javax.net.ssl.{KeyManagerFactory, SSLContext}

/** `enforce-https:` block (reference flapi.yaml + test_https_config.py:
  * enabled + PEM cert/key paths). Validation is two-tier: parseProject
  * rejects structural errors (scalar block, enabled without paths) and
  * [[TlsSupport.validate]] rejects missing/unreadable files — both as
  * DIRECTED single-line errors before any listener binds. */
final case class HttpsConfig(
    enabled: Boolean = false,
    certFile: String = "",
    keyFile: String = "")

/** PEM certificate/key → JDK [[SSLContext]] for the
  * `com.sun.net.httpserver.HttpsServer` listener — dependency-free TLS
  * (the SURVEY §7.1-8 serving-shell discipline; the reference wires
  * OpenSSL through crow, test_tls_wireup.py:1-15 is the behavioural
  * contract this mirrors: https handshake completes, plain http on the
  * TLS port does not get a normal response). */
object TlsSupport {

  /** Directed config validation (mirrors --validate-config in
    * test_https_config.py): file existence + parseability, before the
    * server ever binds. No-op when the block is absent or disabled. */
  def validate(cfg: Option[HttpsConfig]): Unit =
    cfg.filter(_.enabled).foreach { h =>
      def checkFile(p: String, what: String): Unit = {
        val path = java.nio.file.Paths.get(p)
        if (!java.nio.file.Files.isRegularFile(path))
          throw new IllegalArgumentException(
            s"enforce-https: $what not found: $p")
      }
      checkFile(h.certFile, "ssl-cert-file")
      checkFile(h.keyFile, "ssl-key-file")
      sslContext(h.certFile, h.keyFile) // parse errors surface directed here
      ()
    }

  /** Build an SSLContext from a PEM certificate (chain) and a PKCS#8
    * PEM private key. PKCS#1 (`BEGIN RSA PRIVATE KEY`) is refused with
    * the openssl conversion hint rather than failing on an opaque
    * KeySpec error — the JDK has no PKCS#1 parser and silently-wrong
    * guidance costs a deploy cycle. */
  def sslContext(certFile: String, keyFile: String): SSLContext = {
    val certPem = java.nio.file.Files.readString(
      java.nio.file.Paths.get(certFile))
    val keyPem = java.nio.file.Files.readString(
      java.nio.file.Paths.get(keyFile))
    if (keyPem.contains("BEGIN RSA PRIVATE KEY") ||
        keyPem.contains("BEGIN EC PRIVATE KEY"))
      throw new IllegalArgumentException(
        s"enforce-https: ssl-key-file $keyFile is PKCS#1/SEC1 — convert " +
          "to PKCS#8 with: openssl pkcs8 -topk8 -nocrypt -in key.pem")
    val keyBytes = pemBlock(keyPem, "PRIVATE KEY").getOrElse(
      throw new IllegalArgumentException(
        s"enforce-https: no PRIVATE KEY block in $keyFile"))
    val spec = new java.security.spec.PKCS8EncodedKeySpec(keyBytes)
    // PKCS#8 wraps any algorithm; try the two the JDK serves TLS with
    val key = Seq("RSA", "EC").view.flatMap { alg =>
      try Some(java.security.KeyFactory.getInstance(alg).generatePrivate(spec))
      catch { case _: java.security.spec.InvalidKeySpecException => None }
    }.headOption.getOrElse(throw new IllegalArgumentException(
      s"enforce-https: ssl-key-file $keyFile is not an RSA or EC PKCS#8 key"))
    val cf = CertificateFactory.getInstance("X.509")
    val certs = cf.generateCertificates(
      new java.io.ByteArrayInputStream(certPem.getBytes("UTF-8")))
    if (certs.isEmpty) throw new IllegalArgumentException(
      s"enforce-https: no CERTIFICATE block in $certFile")
    val ks = KeyStore.getInstance("PKCS12")
    ks.load(null, null)
    val chain = certs.toArray(new Array[java.security.cert.Certificate](0))
    ks.setKeyEntry("graft", key, Array.emptyCharArray, chain)
    val kmf = KeyManagerFactory.getInstance(KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(ks, Array.emptyCharArray)
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, null, null)
    ctx
  }

  /** DER bytes of the first `-----BEGIN <label>-----` block. */
  private def pemBlock(pem: String, label: String): Option[Array[Byte]] = {
    val begin = s"-----BEGIN $label-----"
    val end = s"-----END $label-----"
    val i = pem.indexOf(begin)
    val j = pem.indexOf(end)
    if (i < 0 || j < 0) None
    else {
      val b64 = pem.substring(i + begin.length, j)
        .replaceAll("\\s", "")
      Some(Base64.getDecoder.decode(b64))
    }
  }
}
