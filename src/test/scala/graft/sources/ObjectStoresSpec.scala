package graft.sources

import graft.SparkSpec

class ObjectStoresSpec extends SparkSpec {

  test("s3 storage_config keys map to fs.s3a.* hadoop conf") {
    ObjectStores.configure(spark, "s3a", Map(
      "aws_access_key_id" -> "AKID",
      "secret_access_key" -> "SECRET",
      "region" -> "eu-central-1",
      "endpoint" -> "http://minio:9000",
      "allow_http" -> "true",
      "fs.s3a.path.style.access" -> "true")) // hadoop-form passthrough
    val c = spark.sparkContext.hadoopConfiguration
    assert(c.get("fs.s3a.access.key") == "AKID")
    assert(c.get("fs.s3a.secret.key") == "SECRET")
    assert(c.get("fs.s3a.endpoint.region") == "eu-central-1")
    assert(c.get("fs.s3a.endpoint") == "http://minio:9000")
    assert(c.get("fs.s3a.connection.ssl.enabled") == "false")
    assert(c.get("fs.s3a.path.style.access") == "true")
  }

  test("azure account key maps to the per-account hadoop key") {
    ObjectStores.configure(spark, "abfss", Map(
      "azure_storage_account_name" -> "acct1",
      "azure_storage_account_key" -> "KEY=="))
    assert(spark.sparkContext.hadoopConfiguration
      .get("fs.azure.account.key.acct1.dfs.core.windows.net") == "KEY==")
  }

  test("gcs service account maps to keyfile auth") {
    ObjectStores.configure(spark, "gs", Map("service_account" -> "/tmp/sa.json"))
    val c = spark.sparkContext.hadoopConfiguration
    assert(c.get("fs.gs.auth.service.account.json.keyfile") == "/tmp/sa.json")
  }
}
