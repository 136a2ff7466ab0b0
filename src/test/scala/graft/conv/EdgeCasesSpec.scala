package graft.conv

import graft.proto._
import graft.{Protarrow, SparkSpec}
import graft.conv.GraftConfig.EnumRepr

/** Numeric-extreme and wrapper edge cases (SURVEY §7.4 risks 1-2). */
class EdgeCasesSpec extends SparkSpec {

  private val reg = Schemas.registry
  private val md = Schemas.msg("ExampleMessage")

  test("uint32 full range (0..2^32-1) value-preserves") {
    val f = md.byName("uint32_value")
    val extremes = Seq(0L, 1L, Int.MaxValue.toLong, 1L << 31, 0xFFFFFFFFL)
    val msgs = extremes.map(v => DynamicMessage(md, Map(f.number -> v)))
    val df = Protarrow.messagesToDataFrame(spark, msgs, md, GraftConfig(), reg)
    assert(df.select("uint32_value").collect().map(_.getLong(0)).toSeq === extremes)
    assert(Protarrow.dataFrameToMessages(df, md, GraftConfig(), reg) === msgs)
    msgs.foreach(m => assert(ProtoWire.decode(ProtoWire.encode(m, reg), md, reg) === m))
  }

  test("uint64 wrapper extremes through wrapper presence") {
    val f = md.byName("wrapped_uint64_value")
    val wd = reg.message("google.protobuf.UInt64Value")
    val extremes = Seq(0L, Long.MaxValue, Long.MinValue, -1L)
    val msgs = extremes.map(v => DynamicMessage(md, Map(f.number -> DynamicMessage(wd, Map(1 -> v)))))
    val df = Protarrow.messagesToDataFrame(spark, msgs, md, GraftConfig(), reg)
    val back = Protarrow.dataFrameToMessages(df, md, GraftConfig(), reg)
    assert(back === msgs)
    // wrapper with default value stays present (0 → present wrapper)
    assert(back.head.has(f.number))
  }

  test("float/double specials: infinities and extreme magnitudes") {
    val msgs = Seq(
      DynamicMessage(md, Map(1 -> Double.MaxValue, 2 -> Float.MaxValue)),
      DynamicMessage(md, Map(1 -> Double.MinPositiveValue, 2 -> Float.MinPositiveValue)),
      DynamicMessage(md, Map(1 -> Double.PositiveInfinity, 2 -> Float.NegativeInfinity)))
    val df = Protarrow.messagesToDataFrame(spark, msgs, md, GraftConfig(), reg)
    assert(Protarrow.dataFrameToMessages(df, md, GraftConfig(), reg) === msgs)
    msgs.foreach(m => assert(ProtoWire.decode(ProtoWire.encode(m, reg), md, reg) === m))
  }

  test("strings with unicode and embedded quotes survive JSON + wire") {
    val myProto = Schemas.msg("MyProto")
    val tricky = "héllo \"wörld\" \t 日本語 \\ \n emoji 😀"
    val m = DynamicMessage(myProto, Map(1 -> tricky, 2 -> 1))
    assert(ProtoWire.decode(ProtoWire.encode(m, reg), myProto, reg) === m)
    assert(ProtoJson.parse(ProtoJson.toJson(m, reg), myProto, reg) === m)
    val df = Protarrow.messagesToDataFrame(spark, Seq(m), myProto, GraftConfig(), reg)
    assert(Protarrow.dataFrameToMessages(df, myProto, GraftConfig(), reg) === Seq(m))
  }

  test("binary enum repr round-trips unknown values via first-name fallback") {
    val md2 = Schemas.msg("WithEnum")
    val cfg = GraftConfig(enumType = EnumRepr.Binary)
    val known = DynamicMessage(md2, Map(1 -> 2))
    val unknown = DynamicMessage(md2, Map(1 -> 99))
    val df = Protarrow.messagesToDataFrame(spark, Seq(known, unknown), md2, cfg, reg)
    val back = Protarrow.dataFrameToMessages(df, md2, cfg, reg)
    assert(back(0) === known)
    assert(back(1) === DynamicMessage.empty(md2)) // 99 → fallback name → 0
  }

  test("null map VALUE decodes to an entry with the proto default, not a crash") {
    // mirrors the reference's _merge_assign_map: a None value still
    // materializes the key with a default entry (arrow_to_proto.py:399-404)
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val fInt = md.byName("int32_int32_map")
    val nestedMd = Schemas.msg("NestedExampleMessage")
    val fMsg = nestedMd.byName("example_message_int32_map")
    val schema = StructType(Seq(
      StructField(fInt.name, MapType(IntegerType, IntegerType,
        valueContainsNull = true), nullable = true)))
    val df = spark.createDataFrame(
      java.util.List.of(Row(Map(1 -> null, 2 -> Int.box(7)))), schema)
    val back = Protarrow.dataFrameToMessages(df, md, GraftConfig(), reg)
    assert(back.head.get(fInt.number) ===
      Some(Map(1 -> 0, 2 -> 7)), "null int value → default 0 entry")
    // message-valued map: null struct value → empty nested message entry
    val msgSchema = StructType(Seq(
      StructField(fMsg.name, MapType(IntegerType,
        SchemaConversion.messageTypeToSchema(md, GraftConfig(), reg),
        valueContainsNull = true), nullable = true)))
    val df2 = spark.createDataFrame(
      java.util.List.of(Row(Map(5 -> null))), msgSchema)
    val back2 = Protarrow.dataFrameToMessages(df2, nestedMd, GraftConfig(), reg)
    assert(back2.head.get(fMsg.number) ===
      Some(Map(5 -> DynamicMessage.empty(md))),
      "null message value → default (empty) entry, previously an NPE")
  }

  test("null ELEMENT in a repeated column raises loudly instead of shrinking the list") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val f = md.byName("int64_values")
    val schema = StructType(Seq(
      StructField(f.name, ArrayType(LongType, containsNull = true), nullable = true)))
    val df = spark.createDataFrame(
      java.util.List.of(Row(Seq(1L, null, 3L))), schema)
    // dataFrameToMessages extracts driver-side → the error surfaces directly
    val e = intercept[IllegalArgumentException] {
      Protarrow.dataFrameToMessages(df, md, GraftConfig(), reg)
    }
    assert(e.getMessage.contains("null element"))
  }
}
