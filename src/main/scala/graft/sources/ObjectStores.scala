package graft.sources

import org.apache.spark.sql.SparkSession

/** Per-source object-store configuration → Hadoop FS configuration.
  *
  * The reference maps URL schemes to object-store providers with per-source
  * `storage_config` key maps (aqueducts/core/src/store/mod.rs:187-202, S3 keys
  * store/s3.rs:60-106). In Spark the equivalent surface is
  * `sparkContext.hadoopConfiguration`: s3a / gs / abfss connectors read their
  * credentials and endpoints from there. Keys already in Hadoop form
  * (`fs.*`) pass through untouched, so users can always reach the full
  * connector surface.
  *
  * Scoping: the Hadoop configuration is session-global, while the reference
  * contract is per-source. For s3a we restore per-source isolation with
  * hadoop-aws per-bucket keys (`fs.s3a.bucket.<bucket>.*`), so two sources on
  * different buckets can carry different credentials. Azure account keys are
  * naturally scoped per account. For connectors with no scoped form (gs, or
  * s3a without a resolvable bucket), conflicting values for the same global
  * key are rejected up front — last-writer-wins against lazy scans would
  * otherwise pick credentials nondeterministically.
  */
object ObjectStores {

  /** Preferred entry: derives scheme + bucket from the location so s3a keys
    * can be bucket-scoped.
    */
  def configure(spark: SparkSession, location: graft.config.Location,
      storageConfig: Map[String, String]): Unit =
    configure(spark, location.scheme, storageConfig,
      Option(location.uri.getAuthority).filter(_.nonEmpty))

  def configure(spark: SparkSession, scheme: String, storageConfig: Map[String, String],
      bucket: Option[String] = None): Unit = {
    if (storageConfig.isEmpty) return
    val conf = spark.sparkContext.hadoopConfiguration
    storageConfig.foreach { case (k, v) =>
      translate(scheme, k.toLowerCase(java.util.Locale.ROOT), storageConfig).getOrElse(Seq(k -> v)).foreach {
        case (hk, hv) =>
          val scoped = bucket match {
            case Some(b) if (scheme == "s3" || scheme == "s3a") && hk.startsWith("fs.s3a.") =>
              s"fs.s3a.bucket.$b.${hk.stripPrefix("fs.s3a.")}"
            case _ => hk
          }
          checkNoConflict(spark, scoped, hv)
          conf.set(scoped, hv)
      }
    }
  }

  // Values this engine has applied, per SparkContext: re-configuring the same
  // (possibly bucket-scoped) key with a DIFFERENT value is a config error,
  // not a race to be lost by whichever scan executes last. Weak outer keys:
  // stopped contexts must not be pinned forever in a long-lived service.
  private val applied = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[org.apache.spark.SparkContext,
      java.util.concurrent.ConcurrentHashMap[String, String]]())

  private def checkNoConflict(spark: SparkSession, key: String, value: String): Unit = {
    val perCtx = applied.synchronized {
      applied.computeIfAbsent(spark.sparkContext,
        _ => new java.util.concurrent.ConcurrentHashMap[String, String]())
    }
    // record only the WINNING value: writing the conflicting one first would
    // let an immediate retry of the same pipeline slip past the guard and
    // silently flip the global conf
    val prev = perCtx.putIfAbsent(key, value)
    if (prev != null && prev != value)
      throw new IllegalArgumentException(
        s"Conflicting storage_config for '$key': a previous source/destination set a different " +
          "value. Hadoop object-store config is global per key — scope it per bucket " +
          "(s3a supports fs.s3a.bucket.<bucket>.*; pass a bucketed location) or unify the configs.")
  }

  /** Map one object_store-style key to its Hadoop equivalent(s); None ⇒ pass
    * the key through verbatim (covers `fs.*` keys and unknown extras).
    */
  private def translate(
      scheme: String,
      key: String,
      all: Map[String, String]): Option[Seq[(String, String)]] = {
    def v = all.find(_._1.equalsIgnoreCase(key)).map(_._2).getOrElse("")
    scheme match {
      case "s3" | "s3a" => key match {
        case "aws_access_key_id" | "access_key_id" => Some(Seq("fs.s3a.access.key" -> v))
        case "aws_secret_access_key" | "secret_access_key" => Some(Seq("fs.s3a.secret.key" -> v))
        case "aws_session_token" | "session_token" => Some(Seq("fs.s3a.session.token" -> v))
        case "aws_region" | "region" => Some(Seq("fs.s3a.endpoint.region" -> v))
        case "aws_endpoint" | "endpoint" | "endpoint_url" => Some(Seq("fs.s3a.endpoint" -> v))
        case "aws_allow_http" | "allow_http" =>
          Some(Seq("fs.s3a.connection.ssl.enabled" -> (!v.toBoolean).toString))
        case _ if key.startsWith("fs.") => None
        case _ => None
      }
      case "gs" | "gcs" => key match {
        case "google_service_account" | "service_account" | "service_account_path" =>
          Some(Seq(
            "fs.gs.auth.service.account.json.keyfile" -> v,
            "fs.gs.auth.type" -> "SERVICE_ACCOUNT_JSON_KEYFILE"))
        case _ => None
      }
      case "az" | "azure" | "abfs" | "abfss" =>
        val account = all.find(_._1.equalsIgnoreCase("azure_storage_account_name")).map(_._2)
        key match {
          case "azure_storage_account_key" | "account_key" =>
            account.map(a => Seq(s"fs.azure.account.key.$a.dfs.core.windows.net" -> v))
          case "azure_storage_account_name" | "account_name" => Some(Nil) // consumed above
          case _ => None
        }
      case _ => None
    }
  }
}
