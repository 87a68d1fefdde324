package graft.config

import org.scalatest.funsuite.AnyFunSuite

class TomlSpec extends AnyFunSuite {

  private def obj(toml: String) = Toml.parse(toml)

  test("reference example pipeline TOML deserializes unchanged") {
    val p = java.nio.file.Paths.get("/root/reference/examples/aqueduct_pipeline_example.toml")
    val aq = ConfigParser.fromFile(p, Map("local_path" -> "/tmp/x", "run_id" -> "r1"))
    assert(aq.version == "v2")
    assert(aq.sources.length == 2)
    val src = aq.sources.head.asInstanceOf[FileSource]
    assert(src.name == "jan_data")
    assert(src.format.asInstanceOf[CsvFormat].hasHeader)
    assert(src.format.asInstanceOf[CsvFormat].delimiter == ',')
    assert(src.location.spark.endsWith("examples/temp_readings_jan_2024.csv"))
    assert(aq.stages.length == 2)      // two sequential groups
    assert(aq.stages.head.length == 2) // first group runs two stages concurrently
    assert(aq.stages.head.head.name == "jan_aggregated")
    assert(aq.stages.head.head.show.contains(20))
    assert(aq.stages.head.head.query.contains("FROM jan_data"))
    assert(aq.stages(1).head.printSchema)
    val dest = aq.destination.get.asInstanceOf[ManagedTableDestination]
    assert(dest.writeMode == TableUpsert(Seq("date")))
    assert(dest.partitionColumns == Seq("date"))
    assert(dest.schema.length == 8)
    assert(dest.schema.head.name == "date")
    assert(dest.schema.head.dataType == org.apache.spark.sql.types.DateType)
  }

  test("tables, dotted headers, and arrays of tables") {
    val t = obj(
      """|version = "v2"
         |[owner]
         |name = "x"
         |[owner.meta]
         |level = 3
         |[[items]]
         |id = 1
         |[items.detail]
         |note = "first"
         |[[items]]
         |id = 2
         |""".stripMargin)
    assert(t.get("version").asText() == "v2")
    assert(t.get("owner").get("meta").get("level").asLong() == 3L)
    // dotted header after [[items]] attaches to the LAST array element
    assert(t.get("items").get(0).get("detail").get("note").asText() == "first")
    assert(t.get("items").get(1).get("id").asLong() == 2L)
    assert(t.get("items").get(1).get("detail") == null)
  }

  test("string forms: basic escapes, literals, multiline trimming and quotes") {
    val tq = "\"\"\"" // TOML triple quote
    val t = obj(Seq(
      "a = \"tab\\there A\"",
      "b = 'no \\escapes'",
      s"c = $tq",
      "line1",
      s"line2$tq",
      "d = '''x'y'''",
      "").mkString("\n"))
    assert(t.get("a").asText() == "tab\there A")
    assert(t.get("b").asText() == "no \\escapes")
    assert(t.get("c").asText() == "line1\nline2") // first newline trimmed
    assert(t.get("d").asText() == "x'y")
  }

  test("multiline string content may end in quotes") {
    val t = Toml.parse("k = \"\"\"ends with \"\"\"\"\n")
    assert(t.get("k").asText() == "ends with \"")
  }

  test("numbers: underscores, hex/octal/binary, floats; booleans; dates stay textual") {
    val t = obj(
      """|big = 1_000_000
         |hex = 0xFF
         |oct = 0o17
         |bin = 0b101
         |pi = 3.14
         |exp = 1e3
         |neg = -7
         |yes = true
         |no = false
         |when = 2024-01-02T03:04:05Z
         |day = 2024-01-02
         |""".stripMargin)
    assert(t.get("big").asLong() == 1000000L)
    assert(t.get("hex").asLong() == 255L)
    assert(t.get("oct").asLong() == 15L)
    assert(t.get("bin").asLong() == 5L)
    assert(t.get("pi").asDouble() == 3.14)
    assert(t.get("exp").asDouble() == 1000.0)
    assert(t.get("neg").asLong() == -7L)
    assert(t.get("yes").asBoolean() && !t.get("no").asBoolean())
    assert(t.get("when").asText() == "2024-01-02T03:04:05Z")
    assert(t.get("day").asText() == "2024-01-02")
  }

  test("arrays: nested, multiline, trailing commas; inline tables; empty table") {
    val t = obj(
      """|nested = [ [1, 2], [3], ]
         |mixed = [
         |  { name = "a", n = 1 },
         |  { name = "b", n = 2 },
         |]
         |empty = {}
         |""".stripMargin)
    assert(t.get("nested").get(0).get(1).asLong() == 2L)
    assert(t.get("nested").get(1).get(0).asLong() == 3L)
    assert(t.get("mixed").get(1).get("name").asText() == "b")
    assert(t.get("empty").isObject && t.get("empty").isEmpty)
  }

  test("comments and dotted keys in assignments") {
    val t = obj(
      """|# full-line comment
         |a.b.c = 1 # trailing comment
         |"quoted key" = 2
         |""".stripMargin)
    assert(t.get("a").get("b").get("c").asLong() == 1L)
    assert(t.get("quoted key").asLong() == 2L)
  }

  test("errors: duplicate keys, unterminated strings, garbage after value") {
    intercept[Toml.TomlError](Toml.parse("a = 1\na = 2\n"))
    intercept[Toml.TomlError](Toml.parse("a = \"unclosed\n"))
    intercept[Toml.TomlError](Toml.parse("a = 1 junk\n"))
    intercept[Toml.TomlError](Toml.parse("a = ???\n"))
  }

  test("ConfigParser.fromToml applies templating before parse") {
    val aq = ConfigParser.fromToml(
      """|version = "v2"
         |[[stages]]
         |name = "s"
         |query = "SELECT ${n} AS n"
         |""".stripMargin, Map("n" -> "42"))
    assert(aq.stages.head.head.query == "SELECT 42 AS n")
  }
}
