package graft.sources

import org.apache.hadoop.conf.Configuration
import org.scalatest.funsuite.AnyFunSuite

/** Credential discovery/injection behavior locked against the
  * reference's credential_manager.cpp semantics (env precedence,
  * Azure connection-string > account+key > managed identity, audit
  * trail of key names only). */
class CredentialManagerSpec extends AnyFunSuite {

  private def envOf(m: Map[String, String]): String => Option[String] = m.get

  test("S3 env discovery maps to s3a keys; region fallback honored") {
    val cm = new CredentialManager(envOf(Map(
      "AWS_ACCESS_KEY_ID" -> "AKIA123",
      "AWS_SECRET_ACCESS_KEY" -> "shhh",
      "AWS_DEFAULT_REGION" -> "eu-west-1",
      "AWS_SESSION_TOKEN" -> "tok",
      "AWS_ENDPOINT_URL" -> "http://minio.local:9000")))
    cm.loadFromEnvironment()
    assert(cm.s3Credentials.exists(_.region == "eu-west-1"))
    val conf = new Configuration(false)
    val applied = cm.configureHadoop(conf)
    assert(conf.get("fs.s3a.access.key") == "AKIA123")
    assert(conf.get("fs.s3a.secret.key") == "shhh")
    assert(conf.get("fs.s3a.session.token") == "tok")
    assert(conf.get("fs.s3a.endpoint") == "http://minio.local:9000")
    assert(conf.get("fs.s3a.endpoint.region") == "eu-west-1")
    // the audit trail names keys, never values
    assert(applied.contains("fs.s3a.secret.key") && !applied.exists(_.contains("shhh")))
  }

  test("instance-profile type sets the IAM provider instead of static keys") {
    val cm = new CredentialManager(envOf(Map.empty))
    cm.setS3Credentials(S3Credentials(
      credentialType = CredentialType.InstanceProfile, region = "us-east-1"))
    val conf = new Configuration(false)
    cm.configureHadoop(conf)
    assert(Option(conf.get("fs.s3a.aws.credentials.provider"))
      .exists(_.contains("IAMInstanceCredentialsProvider")))
    assert(conf.get("fs.s3a.access.key") == null)
  }

  test("Azure precedence: connection string > account+key > managed identity") {
    val viaConn = new CredentialManager(envOf(Map(
      "AZURE_STORAGE_CONNECTION_STRING" ->
        "DefaultEndpointsProtocol=https;AccountName=acct1;AccountKey=k1==;EndpointSuffix=core.windows.net",
      "AZURE_STORAGE_ACCOUNT" -> "ignored", "AZURE_STORAGE_KEY" -> "ignored")))
    viaConn.loadFromEnvironment()
    assert(viaConn.azureCredentials.exists(_.credentialType == CredentialType.ConnectionString))
    val conf = new Configuration(false)
    viaConn.configureHadoop(conf)
    assert(conf.get("fs.azure.account.key.acct1.dfs.core.windows.net") == "k1==")

    val viaKeys = new CredentialManager(envOf(Map(
      "AZURE_STORAGE_ACCOUNT" -> "acct2", "AZURE_STORAGE_KEY" -> "k2")))
    viaKeys.loadFromEnvironment()
    val conf2 = new Configuration(false)
    viaKeys.configureHadoop(conf2)
    assert(conf2.get("fs.azure.account.key.acct2.dfs.core.windows.net") == "k2")

    val viaMsi = new CredentialManager(envOf(Map(
      "AZURE_TENANT_ID" -> "t", "AZURE_CLIENT_ID" -> "c",
      "AZURE_STORAGE_ACCOUNT" -> "acct3")))
    viaMsi.loadFromEnvironment()
    assert(viaMsi.azureCredentials.exists(_.credentialType == CredentialType.ManagedIdentity))
    val conf3 = new Configuration(false)
    viaMsi.configureHadoop(conf3)
    assert(conf3.get("fs.azure.account.auth.type.acct3.dfs.core.windows.net") == "OAuth")
  }

  test("GCS service-account discovery with project fallbacks") {
    val cm = new CredentialManager(envOf(Map(
      "GOOGLE_APPLICATION_CREDENTIALS" -> "/keys/sa.json",
      "GCLOUD_PROJECT" -> "proj-2")))
    cm.loadFromEnvironment()
    val conf = new Configuration(false)
    cm.configureHadoop(conf)
    assert(conf.get("google.cloud.auth.service.account.json.keyfile") == "/keys/sa.json")
    assert(conf.get("fs.gs.project.id") == "proj-2")
  }

  test("resolveRef: env and secretfile indirection, passthrough otherwise") {
    assert(CredentialManager.resolveRef("env:MY_SECRET",
      envOf(Map("MY_SECRET" -> "v1"))) == "v1")
    assert(CredentialManager.resolveRef("env:ABSENT", envOf(Map.empty)) == "")
    val f = java.nio.file.Files.createTempFile("graft_secret", ".txt")
    java.nio.file.Files.writeString(f, "filesecret\n")
    assert(CredentialManager.resolveRef(s"secretfile:$f") == "filesecret")
    assert(CredentialManager.resolveRef("literal-value") == "literal-value")
    // file: is a legitimate Hadoop URI scheme — must pass through
    assert(CredentialManager.resolveRef("file:///srv/data") == "file:///srv/data")
  }

  test("connection string parser tolerates empty segments") {
    val m = CredentialManager.parseAzureConnectionString(
      "AccountName=a;;AccountKey=b=extra;X")
    assert(m("AccountName") == "a")
    assert(m("AccountKey") == "b=extra")
  }
}
