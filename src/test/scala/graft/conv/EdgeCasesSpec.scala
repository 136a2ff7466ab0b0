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
}
