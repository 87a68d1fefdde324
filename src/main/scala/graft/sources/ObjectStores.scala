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
  */
object ObjectStores {

  def configure(spark: SparkSession, scheme: String, storageConfig: Map[String, String]): Unit = {
    if (storageConfig.isEmpty) return
    val conf = spark.sparkContext.hadoopConfiguration
    storageConfig.foreach { case (k, v) =>
      translate(scheme, k.toLowerCase, storageConfig).getOrElse(Seq(k -> v)).foreach {
        case (hk, hv) => conf.set(hk, hv)
      }
    }
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
