package graft.sources

import org.apache.hadoop.conf.Configuration

/** Cloud-credential discovery + injection (reference
  * credential_manager.cpp): resolve S3/GCS/Azure credentials from the
  * standard environment variables (loadFromEnvironment, :64-130) or
  * explicit setters, then inject them into Spark's Hadoop
  * configuration — the engine-appropriate analog of the reference
  * SETting DuckDB httpfs options (configureDuckDB, :169-280). Explicit
  * `fs.*` connection properties always win over discovered values
  * (they are applied after this manager in Connections.init).
  *
  * All keys written are the public s3a / gcs-connector / abfs
  * contract keys. `configureHadoop` returns the key NAMES it set —
  * never values — so callers can log an audit trail without leaking
  * secrets.
  */
sealed trait CredentialType
object CredentialType {
  case object None extends CredentialType
  case object Environment extends CredentialType
  case object Secret extends CredentialType
  case object InstanceProfile extends CredentialType
  case object ServiceAccount extends CredentialType
  case object ConnectionString extends CredentialType
  case object ManagedIdentity extends CredentialType

  def name(t: CredentialType): String = t match {
    case None => "none"
    case Environment => "environment"
    case Secret => "secret"
    case InstanceProfile => "instance_profile"
    case ServiceAccount => "service_account"
    case ConnectionString => "connection_string"
    case ManagedIdentity => "managed_identity"
  }
}

final case class S3Credentials(
    accessKeyId: String = "",
    secretAccessKey: String = "",
    region: String = "",
    sessionToken: String = "",
    endpoint: String = "",
    useSsl: Boolean = true,
    credentialType: CredentialType = CredentialType.Environment)

final case class GcsCredentials(
    serviceAccountKeyFile: String = "",
    projectId: String = "",
    credentialType: CredentialType = CredentialType.ServiceAccount)

final case class AzureCredentials(
    connectionString: String = "",
    accountName: String = "",
    accountKey: String = "",
    credentialType: CredentialType = CredentialType.Environment)

final class CredentialManager(env: String => Option[String] = n => sys.env.get(n)) {

  private var s3Creds: Option[S3Credentials] = None
  private var gcsCreds: Option[GcsCredentials] = None
  private var azureCreds: Option[AzureCredentials] = None

  def setS3Credentials(c: S3Credentials): Unit = s3Creds = Some(c)
  def setGcsCredentials(c: GcsCredentials): Unit = gcsCreds = Some(c)
  def setAzureCredentials(c: AzureCredentials): Unit = azureCreds = Some(c)
  def s3Credentials: Option[S3Credentials] = s3Creds
  def gcsCredentials: Option[GcsCredentials] = gcsCreds
  def azureCredentials: Option[AzureCredentials] = azureCreds

  /** Standard-variable discovery, same precedence as the reference:
    * AWS key pair (+ region/session-token/endpoint); GCS service-
    * account file (+ project from the three conventional variables);
    * Azure connection string > account+key > managed identity. */
  def loadFromEnvironment(): Unit = {
    val awsKey = env("AWS_ACCESS_KEY_ID").getOrElse("")
    val awsSecret = env("AWS_SECRET_ACCESS_KEY").getOrElse("")
    if (awsKey.nonEmpty && awsSecret.nonEmpty)
      s3Creds = Some(S3Credentials(
        accessKeyId = awsKey,
        secretAccessKey = awsSecret,
        region = env("AWS_REGION").orElse(env("AWS_DEFAULT_REGION")).getOrElse(""),
        sessionToken = env("AWS_SESSION_TOKEN").getOrElse(""),
        endpoint = env("AWS_ENDPOINT_URL").getOrElse(""),
        credentialType = CredentialType.Environment))

    env("GOOGLE_APPLICATION_CREDENTIALS").filter(_.nonEmpty).foreach { keyFile =>
      gcsCreds = Some(GcsCredentials(
        serviceAccountKeyFile = keyFile,
        projectId = env("GOOGLE_CLOUD_PROJECT").orElse(env("GCLOUD_PROJECT"))
          .orElse(env("GCP_PROJECT")).getOrElse("")))
    }

    val azConn = env("AZURE_STORAGE_CONNECTION_STRING").getOrElse("")
    val azAccount = env("AZURE_STORAGE_ACCOUNT").getOrElse("")
    val azKey = env("AZURE_STORAGE_KEY").getOrElse("")
    if (azConn.nonEmpty)
      azureCreds = Some(AzureCredentials(connectionString = azConn,
        credentialType = CredentialType.ConnectionString))
    else if (azAccount.nonEmpty && azKey.nonEmpty)
      azureCreds = Some(AzureCredentials(accountName = azAccount, accountKey = azKey))
    else if (env("AZURE_TENANT_ID").isDefined && env("AZURE_CLIENT_ID").isDefined)
      azureCreds = Some(AzureCredentials(
        accountName = azAccount,
        credentialType = CredentialType.ManagedIdentity))
  }

  /** Write discovered credentials into a Hadoop configuration; returns
    * the names of the keys set (values withheld — audit-safe). */
  def configureHadoop(conf: Configuration): Seq[String] = {
    val applied = scala.collection.mutable.ListBuffer.empty[String]
    def set(k: String, v: String): Unit =
      if (v.nonEmpty) { conf.set(k, v); applied += k }

    s3Creds.foreach { c =>
      c.credentialType match {
        case CredentialType.InstanceProfile =>
          set("fs.s3a.aws.credentials.provider",
            "org.apache.hadoop.fs.s3a.auth.IAMInstanceCredentialsProvider")
        case _ =>
          set("fs.s3a.access.key", c.accessKeyId)
          set("fs.s3a.secret.key", c.secretAccessKey)
          set("fs.s3a.session.token", c.sessionToken)
      }
      set("fs.s3a.endpoint.region", c.region)
      set("fs.s3a.endpoint", c.endpoint)
      if (c.endpoint.nonEmpty && !c.useSsl)
        set("fs.s3a.connection.ssl.enabled", "false")
    }

    gcsCreds.foreach { c =>
      set("google.cloud.auth.service.account.json.keyfile", c.serviceAccountKeyFile)
      set("fs.gs.project.id", c.projectId)
    }

    azureCreds.foreach { c =>
      val parsed =
        if (c.connectionString.nonEmpty) CredentialManager.parseAzureConnectionString(c.connectionString)
        else Map.empty[String, String]
      val account = parsed.getOrElse("AccountName", c.accountName)
      val key = parsed.getOrElse("AccountKey", c.accountKey)
      c.credentialType match {
        case CredentialType.ManagedIdentity if account.nonEmpty =>
          set(s"fs.azure.account.auth.type.$account.dfs.core.windows.net", "OAuth")
          set(s"fs.azure.account.oauth.provider.type.$account.dfs.core.windows.net",
            "org.apache.hadoop.fs.azurebfs.oauth2.MsiTokenProvider")
        case _ if account.nonEmpty && key.nonEmpty =>
          set(s"fs.azure.account.key.$account.dfs.core.windows.net", key)
        case _ => ()
      }
    }
    applied.toSeq
  }
}

object CredentialManager {

  /** `AccountName=…;AccountKey=…;…` → key/value map (reference uses the
    * raw string against DuckDB; abfs needs the parts). */
  def parseAzureConnectionString(cs: String): Map[String, String] =
    cs.split(';').iterator.flatMap { part =>
      part.split("=", 2) match {
        case Array(k, v) if k.trim.nonEmpty => Some(k.trim -> v.trim)
        case _ => scala.None
      }
    }.toMap

  /** Resolve indirect property values: `env:NAME` reads the variable,
    * `secretfile:/path` reads (and trims) the file — the offline
    * analogs of the reference's SECRET type. Anything else passes
    * through — notably `file:` URIs, which are legitimate Hadoop
    * filesystem values (fs.defaultFS: file:///…) and must never be
    * mistaken for secret indirection. */
  def resolveRef(value: String, env: String => Option[String] = n => sys.env.get(n)): String =
    if (value.startsWith("env:")) env(value.stripPrefix("env:")).getOrElse("")
    else if (value.startsWith("secretfile:")) {
      try java.nio.file.Files.readString(
        java.nio.file.Paths.get(value.stripPrefix("secretfile:"))).trim
      catch { case _: Exception => "" }
    } else value
}
