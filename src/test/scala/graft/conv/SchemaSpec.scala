package graft.conv

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import graft.proto._
import graft.Protarrow
import graft.conv.GraftConfig.{EnumRepr, TimeUnit, Width}

/** Schema-shape tests mirroring the reference's pinned expectations
  * (tests/data/test_schema.py; tests/test_conversion.py:164-203, 952-962;
  * tests/test_conversion_recursive_messages.py). */
class SchemaSpec extends AnyFunSuite {

  private val reg = Schemas.registry
  private def schema(name: String, cfg: GraftConfig = GraftConfig()): StructType =
    Protarrow.messageTypeToSchema(Schemas.msg(name), cfg, reg)

  test("MyProto schema (FIXTURES.md §1)") {
    assert(schema("MyProto") === StructType(Seq(
      StructField("name", StringType, nullable = false),
      StructField("id", IntegerType, nullable = false),
      StructField("values", ArrayType(IntegerType, containsNull = false),
        nullable = false))))
  }

  test("NullableExample nullability matrix (test_schema.py:10-76)") {
    val s = schema("NullableExample")
    val nested = StructType(Seq(StructField("nested_int", IntegerType, nullable = false)))
    assert(s === StructType(Seq(
      StructField("int_value", IntegerType, nullable = false),
      StructField("int_repeated", ArrayType(IntegerType, containsNull = false), nullable = false),
      StructField("int_map", MapType(StringType, IntegerType, valueContainsNull = false), nullable = false),
      StructField("message_value", nested, nullable = true),
      StructField("message_repeated", ArrayType(nested, containsNull = false), nullable = false),
      StructField("message_map", MapType(StringType, nested, valueContainsNull = false), nullable = false))))
  }

  test("wrapper fields nullable, plain fields not (test_schema.py:87-103)") {
    val s = schema("ExampleMessage")
    assert(!s("double_value").nullable)
    assert(!s("double_values").nullable)
    assert(s("wrapped_double_value").nullable)
    assert(s("optional_double_value").nullable)
  }

  test("nested message schema equals top-level schema (test_schema.py:93-103)") {
    val s = schema("ExampleMessage")
    val nested = schema("NestedExampleMessage")("example_message").dataType
    assert(nested === s)
  }

  test("list/map nullability knobs (test_schema.py:106-160)") {
    for (b <- Seq(true, false)) {
      val s = schema("ExampleMessage", GraftConfig(listNullable = b, mapNullable = b,
        listValueNullable = b, mapValueNullable = b))
      assert(s("double_values").nullable == b)
      assert(s("double_string_map").nullable == b)
      assert(s("double_values").dataType.asInstanceOf[ArrayType].containsNull == b)
      assert(s("double_string_map").dataType.asInstanceOf[MapType].valueContainsNull == b)
    }
  }

  test("WKT types and units") {
    val s = schema("ExampleMessage")
    assert(s("timestamp_value").dataType === TimestampType)
    assert(s("date_value").dataType === DateType)
    assert(s("time_of_day_value").dataType === LongType)
    assert(s("duration_value").dataType === LongType)
    assert(s("empty_value").dataType === StructType(Nil))
    assert(s("empty_value").nullable)
    assert(s("wrapped_int64_value").dataType === LongType)
    // unsigned policy: uint32 value-preserving, uint64 bit-preserving
    assert(s("uint32_value").dataType === LongType)
    assert(s("uint64_value").dataType === LongType)
  }

  test("enum repr knob (tests/test_conversion.py:317-331)") {
    assert(schema("WithEnum")("test_enum").dataType === IntegerType)
    assert(schema("WithEnum", GraftConfig(enumType = EnumRepr.StringRepr))("test_enum")
      .dataType === StringType)
    assert(schema("WithEnum", GraftConfig(enumType = EnumRepr.Binary))("test_enum")
      .dataType === BinaryType)
    assert(schema("WithEnum", GraftConfig(enumType = EnumRepr.DictString))("test_enum")
      .dataType === StringType)
  }

  test("enum/string width validation (common.py:26-44)") {
    assertThrows[IllegalArgumentException] {
      GraftConfig(enumType = EnumRepr.LargeString, stringType = Width.Normal)
    }
    // consistent large widths are accepted (storage-level no-op in Spark)
    GraftConfig(enumType = EnumRepr.LargeString, stringType = Width.Large)
  }

  test("field-number metadata (tests/test_conversion.py:952-962)") {
    val s = schema("MyProto", GraftConfig(fieldNumberKey = Some("PARQUET:field_id")))
    assert(s("id").metadata.getLong("PARQUET:field_id") === 2L)
    // nested fields carry metadata too
    val nested = schema("NullableExample",
      GraftConfig(fieldNumberKey = Some("k")))("message_value")
      .dataType.asInstanceOf[StructType]
    assert(nested("nested_int").metadata.getLong("k") === 1L)
  }

  test("map_as_list shape (proto_to_arrow.py:494-543)") {
    val s = schema("NullableExample", GraftConfig(mapAsList = true))
    val t = s("int_map").dataType
    assert(t === ArrayType(StructType(Seq(
      StructField("key", StringType, nullable = false),
      StructField("item", IntegerType, nullable = false))), containsNull = false))
    val named = schema("NullableExample",
      GraftConfig(mapAsList = true, mapValueName = "foo"))("int_map").dataType
    assert(named.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
      .fieldNames.toSeq === Seq("key", "foo"))
  }

  test("recursive schemas raise with trace; skip prunes to empty struct " +
    "(tests/test_conversion_recursive_messages.py)") {
    for (m <- Seq("RecursiveSelfReferentialMessage", "RecursiveNestedMessageLevel1",
      "RecursiveSelfReferentialRepeatedMessage", "RecursiveSelfReferentialMapMessage")) {
      val e = intercept[IllegalArgumentException](schema(m))
      assert(e.getMessage.contains(m))
      val pruned = schema(m, GraftConfig(skipRecursiveMessages = true))
      assert(pruned.fields.nonEmpty)
    }
    val pruned = schema("RecursiveSelfReferentialMessage",
      GraftConfig(skipRecursiveMessages = true))
    assert(pruned("next").dataType === StructType(Nil))
    assert(pruned("depth").dataType === IntegerType)
    // 3-cycle: level1 → level2 → level3 → pruned level1
    val l1 = schema("RecursiveNestedMessageLevel1", GraftConfig(skipRecursiveMessages = true))
    val l3 = l1("next").dataType.asInstanceOf[StructType]("next")
      .dataType.asInstanceOf[StructType]
    assert(l3("next").dataType === StructType(Nil))
  }

  test("unsupported field kinds reject loudly (tests/test_coverage.py:281-295 " +
    "TYPE_GROUP contract)") {
    // The reference raises `TypeError: Unsupported field type TYPE_GROUP for
    // foo` from the dispatch fallthrough. Here the sealed PType ADT makes a
    // group unrepresentable, so the contract splits into the two reachable
    // rejection sites — both must stay LOUD, typed, and name the offender:
    // 1. proto2 `group` syntax dies at parse time
    val pe = intercept[IllegalArgumentException](ProtoParser.parse("""
      syntax = "proto2";
      message HasGroup {
        group Result = 1 { optional string url = 2; }
      }"""))
    assert(pe.getMessage.contains("unsupported proto2 construct: group"))
    // 2. the parser also rejects unresolved names up front, so the schema
    // layer's own guard needs the reference's FakeDescriptor trick: a
    // hand-built descriptor whose field kind the registry cannot resolve
    // dies at derivation with the descriptor trace
    val fake = PMessageDesc("Outer",
      Seq(PField("foo", 1, PType.PMessage("Mystery"))))
    val emptyReg = new ProtoRegistry(Map("Outer" -> fake), Map.empty)
    val e = intercept[IllegalArgumentException](
      Protarrow.messageTypeToSchema(fake, GraftConfig(), emptyReg))
    assert(e.getMessage.contains("Unsupported field type"))
    assert(e.getMessage.contains("Mystery"))
    assert(e.getMessage.contains("Outer -> Mystery"), "trace must show the path")
  }

  test("schema defined for empty input (tests/test_conversion.py:110-116)") {
    val spark = graft.SparkTestBase.spark
    val df = Protarrow.messagesToDataFrame(spark, Seq.empty, Schemas.msg("MyProto"),
      reg = reg)
    assert(df.count() === 0)
    assert(df.schema === schema("MyProto"))
  }
}
