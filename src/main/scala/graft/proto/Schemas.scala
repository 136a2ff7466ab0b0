package graft.proto

import graft.proto.PType._

/** The reference's conformance schemas, reconstructed over the IR.
  *
  * `example.proto` messages are parsed from an embedded proto3 source
  * (exercising [[ProtoParser]]); the generated `bench.proto` family
  * (`ExampleMessage` — ~190 fields over 30 type templates × singular /
  * repeated / map<int32,_> / map<string,_> / optional) is built by the same
  * systematic generation the reference uses (scripts/generate_proto.py →
  * protos/bench.proto:24-173): template i gets singular number i, repeated
  * 30+i, int32-map 90+i, string-map 120+i, optional 180+i (primitives and
  * enum only).
  */
object Schemas {

  val Pkg = "protarrow.protos"

  // ---- example.proto (protos/example.proto) -----------------------------
  private val exampleProto = s"""
    syntax = "proto3";
    package $Pkg;

    message MyProto {
      string name = 1;
      int32 id = 2;
      repeated int32 values = 3;
    }

    message NullableExample {
      message NestedNullableExample {
        int32 nested_int = 1;
      }
      int32 int_value = 1;
      repeated int32 int_repeated = 2;
      map<string, int32> int_map = 3;
      NestedNullableExample message_value = 10;
      repeated NestedNullableExample message_repeated = 11;
      map<string, NestedNullableExample> message_map = 12;
    }

    message EmptyMessage {
      google.protobuf.Empty empty_value = 1;
    }

    message NestedEmptyMessage {
      EmptyMessage empty_message = 1;
      repeated EmptyMessage repeated_empty_message = 2;
      map<int32, EmptyMessage> empty_example_message_int32_map = 4;
      map<string, EmptyMessage> empty_example_message_string_map = 5;
    }

    message MessageWithOptional {
      optional string optional_string = 1;
      string plain_string = 2;
      google.protobuf.StringValue string_value = 3;
      repeated google.protobuf.StringValue string_values = 4;
    }

    message WithRepeated {
      repeated double repeated_doubles = 1;
    }

    message NestedWithRepeated {
      WithRepeated with_repeated = 1;
    }

    enum TestEnum {
      UNKNOWN_TEST_ENUM = 0;
      TEST_ENUM_1 = 1;
      TEST_ENUM_2 = 2;
    }

    message WithEnum {
      TestEnum test_enum = 1;
    }
  """

  // ---- bench.proto family (protos/bench.proto) --------------------------

  val exampleEnum: PEnumDesc = PEnumDesc(s"$Pkg.ExampleEnum", Seq(
    "UNKNOWN_EXAMPLE_ENUM" -> 0, "EXAMPLE_ENUM_1" -> 1, "EXAMPLE_ENUM_2" -> 2))

  /** The 30 type templates in declaration order (prefix, type). */
  private val templates: Seq[(String, PType)] = Seq(
    "double" -> PDouble, "float" -> PFloat, "int32" -> PInt32,
    "int64" -> PInt64, "uint32" -> PUInt32, "uint64" -> PUInt64,
    "sint32" -> PSInt32, "sint64" -> PSInt64, "fixed32" -> PFixed32,
    "fixed64" -> PFixed64, "sfixed32" -> PSFixed32, "sfixed64" -> PSFixed64,
    "bool" -> PBool, "string" -> PString, "bytes" -> PBytes,
    "wrapped_double" -> PMessage("google.protobuf.DoubleValue"),
    "wrapped_float" -> PMessage("google.protobuf.FloatValue"),
    "wrapped_int32" -> PMessage("google.protobuf.Int32Value"),
    "wrapped_int64" -> PMessage("google.protobuf.Int64Value"),
    "wrapped_uint32" -> PMessage("google.protobuf.UInt32Value"),
    "wrapped_uint64" -> PMessage("google.protobuf.UInt64Value"),
    "wrapped_bool" -> PMessage("google.protobuf.BoolValue"),
    "wrapped_string" -> PMessage("google.protobuf.StringValue"),
    "wrapped_bytes" -> PMessage("google.protobuf.BytesValue"),
    "example_enum" -> PEnum(s"$Pkg.ExampleEnum"),
    "timestamp" -> PMessage(WellKnown.TimestampName),
    "date" -> PMessage(WellKnown.DateName),
    "time_of_day" -> PMessage(WellKnown.TimeOfDayName),
    "empty" -> PMessage(WellKnown.EmptyName),
    "duration" -> PMessage(WellKnown.DurationName))

  val exampleMessage: PMessageDesc = {
    val singular = templates.zipWithIndex.map { case ((p, t), i) =>
      PField(s"${p}_value", i + 1, t)
    }
    val repeated = templates.zipWithIndex.map { case ((p, t), i) =>
      PField(s"${p}_values", 31 + i, t, repeated = true)
    }
    val int32Maps = templates.zipWithIndex.map { case ((p, t), i) =>
      PField(s"${p}_int32_map", 91 + i, t, mapKV = Some((PInt32, t)))
    }
    val stringMaps = templates.zipWithIndex.map { case ((p, t), i) =>
      PField(s"${p}_string_map", 121 + i, t, mapKV = Some((PString, t)))
    }
    // optional: primitives (templates 1-15) and enum (template 25)
    val optionals = templates.zipWithIndex.collect {
      case ((p, t), i) if i < 15 || p == "example_enum" =>
        PField(s"optional_${p}_value", 181 + i, t, explicitOptional = true)
    }
    PMessageDesc(s"$Pkg.ExampleMessage",
      singular ++ repeated ++ int32Maps ++ stringMaps ++ optionals)
  }

  val nestedExampleMessage: PMessageDesc = {
    val em = PMessage(exampleMessage.fullName)
    PMessageDesc(s"$Pkg.NestedExampleMessage", Seq(
      PField("example_message", 1, em),
      PField("repeated_example_message", 2, em, repeated = true),
      PField("example_message_int32_map", 4, em, mapKV = Some((PInt32, em))),
      PField("example_message_string_map", 5, em, mapKV = Some((PString, em)))))
  }

  val superNestedExampleMessage: PMessageDesc = {
    val nem = PMessage(nestedExampleMessage.fullName)
    val em = PMessage(exampleMessage.fullName)
    PMessageDesc(s"$Pkg.SuperNestedExampleMessage", Seq(
      PField("nested_example_message", 1, nem),
      PField("repeated_nested_example_message", 2, nem, repeated = true),
      PField("nested_example_message_int32_map", 4, em, mapKV = Some((PInt32, em))),
      PField("nested_example_message_string_map", 5, em, mapKV = Some((PString, em)))))
  }

  // ---- recursive schemas (protos/bench.proto:191-222) -------------------

  val recursiveSelf: PMessageDesc = PMessageDesc(
    s"$Pkg.RecursiveSelfReferentialMessage", Seq(
      PField("next", 1, PMessage(s"$Pkg.RecursiveSelfReferentialMessage")),
      PField("depth", 2, PInt32)))

  val recursiveLevel1: PMessageDesc = PMessageDesc(
    s"$Pkg.RecursiveNestedMessageLevel1", Seq(
      PField("name", 1, PString),
      PField("next", 2, PMessage(s"$Pkg.RecursiveNestedMessageLevel2"))))
  val recursiveLevel2: PMessageDesc = PMessageDesc(
    s"$Pkg.RecursiveNestedMessageLevel2", Seq(
      PField("name", 1, PString),
      PField("next", 2, PMessage(s"$Pkg.RecursiveNestedMessageLevel3"))))
  val recursiveLevel3: PMessageDesc = PMessageDesc(
    s"$Pkg.RecursiveNestedMessageLevel3", Seq(
      PField("name", 1, PString),
      PField("next", 2, PMessage(s"$Pkg.RecursiveNestedMessageLevel1"))))

  val recursiveRepeated: PMessageDesc = PMessageDesc(
    s"$Pkg.RecursiveSelfReferentialRepeatedMessage", Seq(
      PField("depth", 1, PInt32),
      PField("children", 2,
        PMessage(s"$Pkg.RecursiveSelfReferentialRepeatedMessage"), repeated = true)))

  val recursiveMap: PMessageDesc = {
    val self = PMessage(s"$Pkg.RecursiveSelfReferentialMapMessage")
    PMessageDesc(s"$Pkg.RecursiveSelfReferentialMapMessage", Seq(
      PField("name", 1, PString),
      PField("children_map", 2, self, mapKV = Some((PString, self)))))
  }

  /** Full registry: example.proto (parsed) + bench family + WKTs. */
  val registry: ProtoRegistry = {
    val bench = new ProtoRegistry(
      Seq(exampleMessage, nestedExampleMessage, superNestedExampleMessage,
        recursiveSelf, recursiveLevel1, recursiveLevel2, recursiveLevel3,
        recursiveRepeated, recursiveMap).map(d => d.fullName -> d).toMap,
      Map(exampleEnum.fullName -> exampleEnum))
    ProtoParser.parse(exampleProto) ++ bench
  }

  def msg(shortName: String): PMessageDesc = registry.message(s"$Pkg.$shortName")
}
