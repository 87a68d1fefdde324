package graft.config

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** The generated JSON Schema must accept exactly what ConfigParser accepts:
  * a mini draft-07 validator (the subset SchemaGen emits) is run against
  * every reference example pipeline, and every parser tag/alias must appear.
  */
class SchemaGenSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()
  private lazy val schema = mapper.readTree(SchemaGen.schemaJson)

  test("schema is valid JSON with the draft-07 shell") {
    assert(schema.get("$schema").asText.contains("draft-07"))
    assert(schema.get("title").asText == "Aqueduct")
    assert(schema.get("required").elements().asScala.map(_.asText).toSet == Set("sources", "stages"))
    assert(schema.get("definitions").has("Source"))
    assert(schema.get("definitions").has("Destination"))
  }

  test("every parser tag and alias appears in the schema") {
    val text = SchemaGen.schemaJson
    val tags = Seq(
      // sources + destinations
      "in_memory", "memory", "inmemory", "file", "directory", "dir",
      "delta", "managed", "table", "odbc", "database", "jdbc",
      // formats
      "csv", "json", "jsonl", "parquet", "orc", "avro",
      // write modes
      "append", "upsert", "replace", "custom")
    tags.foreach(t => assert(text.contains(s""""$t""""), s"tag '$t' missing from schema"))
  }

  test("reference example pipelines validate against the generated schema") {
    val params = Map("local_path" -> "/tmp/x", "run_id" -> "r1",
      "month" -> "01", "year" -> "2024", "user" -> "u", "pass" -> "p")
    val yaml = new ObjectMapper(new YAMLFactory())
    val dir = java.nio.file.Paths.get("/root/reference/examples")
    var n = 0
    java.nio.file.Files.list(dir).iterator().asScala.foreach { f =>
      val name = f.getFileName.toString
      if (name.endsWith(".yml") || name.endsWith(".yaml") || name.endsWith(".json")) {
        val raw = ConfigParser.substitute(java.nio.file.Files.readString(f), params)
        val tree = if (name.endsWith(".json")) mapper.readTree(raw) else yaml.readTree(raw)
        val errs = validate(schema, tree)
        assert(errs.isEmpty, s"$name: ${errs.mkString("; ")}")
        n += 1
      }
    }
    assert(n >= 4)
  }

  test("a config the parser rejects also fails the schema") {
    val bad = mapper.readTree(
      """{"sources": [{"type": "sorcery", "name": "x"}], "stages": [[{"name": "s", "query": "SELECT 1"}]]}""")
    assert(validate(schema, bad).nonEmpty)
    val missingQuery = mapper.readTree(
      """{"sources": [], "stages": [[{"name": "s"}]]}""")
    assert(validate(schema, missingQuery).nonEmpty)
  }

  // ------------------------- mini validator for the subset SchemaGen emits

  /** Serde aliases ConfigParser accepts for canonical field names. */
  private val fieldAliases: Map[String, Seq[String]] = Map(
    "format" -> Seq("format", "file_type"),
    "partition_columns" -> Seq("partition_columns", "partition_cols"),
    "write_mode" -> Seq("write_mode", "mode"),
    "load_query" -> Seq("load_query", "query"),
    "storage_config" -> Seq("storage_config", "storage_options"),
    "metadata" -> Seq("metadata", "custom_metadata"),
    "data_type" -> Seq("data_type", "type"))

  private def aliasesOf(name: String): Seq[String] = fieldAliases.getOrElse(name, Seq(name))

  private def validate(s: JsonNode, data: JsonNode): Seq[String] = {
    val defs = schema.get("definitions")
    def go(s: JsonNode, d: JsonNode): Seq[String] = {
      if (s.has("$ref"))
        return go(defs.get(s.get("$ref").asText.stripPrefix("#/definitions/")), d)
      if (s.has("oneOf")) {
        val variants = s.get("oneOf").elements().asScala.toSeq
        return if (variants.exists(v => go(v, d).isEmpty)) Nil
        else Seq(s"no variant matched: ${d.toString.take(80)}")
      }
      s.path("type").asText("") match {
        case "object" =>
          if (!d.isObject) return Seq(s"expected object, got ${d.getNodeType}")
          val required = s.path("required").elements().asScala.map(_.asText).toSeq
          val missing = required.filterNot(r => aliasesOf(r).exists(d.has))
          if (missing.nonEmpty) return missing.map(m => s"missing required '$m'")
          s.path("properties").properties().asScala.toSeq.flatMap { e =>
            aliasesOf(e.getKey).find(d.has).toSeq.flatMap { actual =>
              val dv = d.get(actual)
              if (e.getValue.has("enum")) {
                val ok = e.getValue.get("enum").elements().asScala
                  .exists(_.asText == dv.asText().toLowerCase)
                if (ok) Nil else Seq(s"${e.getKey}='${dv.asText}' not in enum")
              } else go(e.getValue, dv)
            }
          }
        case "array" =>
          if (!d.isArray) Seq(s"expected array, got ${d.getNodeType}")
          else d.elements().asScala.toSeq.flatMap(el => go(s.get("items"), el))
        case "string" => // YAML scalars (numbers in templated strings) are fine
          if (d.isValueNode) Nil else Seq(s"expected scalar, got ${d.getNodeType}")
        case "integer" => if (d.isNumber) Nil else Seq(s"expected integer")
        case "boolean" => if (d.isBoolean) Nil else Seq(s"expected boolean")
        case _ => Nil
      }
    }
    go(s, data)
  }
}
