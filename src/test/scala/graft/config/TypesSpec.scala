package graft.config

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class TypesSpec extends AnyFunSuite {

  test("primitive types and aliases") {
    assert(Types.parse("bool") == BooleanType)
    assert(Types.parse("boolean") == BooleanType)
    assert(Types.parse("int8") == ByteType)
    assert(Types.parse("int16") == ShortType)
    assert(Types.parse("int32") == IntegerType)
    assert(Types.parse("int") == IntegerType)
    assert(Types.parse("integer") == IntegerType)
    assert(Types.parse("int64") == LongType)
    assert(Types.parse("long") == LongType)
    assert(Types.parse("float32") == FloatType)
    assert(Types.parse("float") == FloatType)
    assert(Types.parse("float64") == DoubleType)
    assert(Types.parse("double") == DoubleType)
    assert(Types.parse("string") == StringType)
    assert(Types.parse("utf8") == StringType)
    assert(Types.parse("large_string") == StringType)
    assert(Types.parse("binary") == BinaryType)
    assert(Types.parse("date32") == DateType)
    assert(Types.parse("date") == DateType)
  }

  test("unsigned ints widen so every value stays representable") {
    assert(Types.parse("uint8") == ShortType)
    assert(Types.parse("uint16") == IntegerType)
    assert(Types.parse("uint32") == LongType)
    assert(Types.parse("uint64") == DecimalType(20, 0))
  }

  test("parameterized types") {
    assert(Types.parse("decimal<10,2>") == DecimalType(10, 2))
    assert(Types.parse("decimal128<38,10>") == DecimalType(38, 10))
    assert(Types.parse("list<string>") == ArrayType(StringType))
    assert(Types.parse("large_list<int64>") == ArrayType(LongType))
    assert(Types.parse("fixed_list<float32,3>") == ArrayType(FloatType))
    assert(Types.parse("fixed_binary<16>") == BinaryType)
    assert(Types.parse("map<string,int32>") == MapType(StringType, IntegerType))
    assert(Types.parse("timestamp<millisecond,UTC>") == TimestampType)
    assert(Types.parse("timestamp<microsecond>") == TimestampNTZType)
    assert(Types.parse("struct<name:string,age:int32>") ==
      StructType(Seq(StructField("name", StringType), StructField("age", IntegerType))))
  }

  test("nesting-aware splitting") {
    assert(Types.parse("list<struct<a:int32,b:list<string>>>") ==
      ArrayType(StructType(Seq(
        StructField("a", IntegerType),
        StructField("b", ArrayType(StringType))))))
    assert(Types.parse("map<string,struct<x:float64,y:decimal<10,2>>>") ==
      MapType(StringType, StructType(Seq(
        StructField("x", DoubleType),
        StructField("y", DecimalType(10, 2))))))
  }

  test("whitespace tolerated") {
    assert(Types.parse(" struct< a : int32 , b : string > ") ==
      StructType(Seq(StructField("a", IntegerType), StructField("b", StringType))))
  }

  test("errors") {
    assertThrows[Exception](Types.parse("not_a_type"))
    assertThrows[Exception](Types.parse("decimal<10>"))
    assertThrows[Exception](Types.parse("decimal<99,2>")) // beyond Spark max precision
    assertThrows[Exception](Types.parse("list<a,b>"))
    assertThrows[Exception](Types.parse("timestamp<fortnight>"))
  }

  // property: render ∘ parse is stable (fixpoint after one round)
  private val genType: Gen[String] = {
    val prim = Gen.oneOf("bool", "int8", "int16", "int32", "int64", "float32",
      "float64", "string", "binary", "date32", "decimal<10,2>", "decimal<38,18>")
    def nested(depth: Int): Gen[String] =
      if (depth == 0) prim
      else Gen.frequency(
        3 -> prim,
        1 -> nested(depth - 1).map(t => s"list<$t>"),
        1 -> (for { k <- prim; v <- nested(depth - 1) } yield s"map<$k,$v>"),
        1 -> (for {
          n <- Gen.choose(1, 3)
          ts <- Gen.listOfN(n, nested(depth - 1))
        } yield ts.zipWithIndex.map { case (t, i) => s"f$i:$t" }.mkString("struct<", ",", ">")))
    nested(3)
  }

  test("parse/render round-trip (property, 300 random nested types)") {
    (1 to 300).foreach { i =>
      val s = genType(Gen.Parameters.default, Seed(i.toLong)).get
      val dt = Types.parse(s)
      val rendered = Types.render(dt)
      assert(Types.parse(rendered) == dt, s"re-parse mismatch for $s")
      assert(rendered == s, s"canonical round-trip mismatch for $s")
    }
  }

  test("field specs convert to StructType with nullability and description") {
    val st = Types.toStruct(Seq(
      Types.FieldSpec("a", IntegerType, nullable = false),
      Types.FieldSpec("b", StringType, description = Some("the b"))))
    assert(!st("a").nullable)
    assert(st("b").nullable)
    assert(st("b").metadata.getString("description") == "the b")
  }
}
