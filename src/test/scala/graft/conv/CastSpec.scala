package graft.conv

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.proto._
import graft.{Protarrow, SparkSpec}
import graft.conv.GraftConfig.EnumRepr

/** cast_table semantics pinned by the reference
  * (tests/test_conversion.py:493-631; docs/usage.md:69-85). */
class CastSpec extends SparkSpec {

  private val reg = Schemas.registry

  test("idempotence: cast(messagesToDF(x)) == same data " +
    "(tests/test_conversion.py:502-508)") {
    val md = Schemas.msg("MyProto")
    val msgs = Seq(
      DynamicMessage(md, Map(1 -> "foo", 2 -> 1, 3 -> Vector(1, 2, 4))),
      DynamicMessage(md, Map(1 -> "bar", 2 -> 2, 3 -> Vector(3, 4, 5))))
    val df = Protarrow.messagesToDataFrame(spark, msgs, md, GraftConfig(), reg)
    val casted = Protarrow.castToProto(df, md, GraftConfig(), reg)
    assert(casted.collect().toSeq === df.collect().toSeq)
    assert(Protarrow.dataFrameToMessages(casted, md, GraftConfig(), reg) === msgs)
  }

  test("missing columns fill with defaults (docs/usage.md:69-85)") {
    import spark.implicits._
    val md = Schemas.msg("MyProto")
    val df = Seq("hello").toDF("name")
    val casted = Protarrow.castToProto(df, md, GraftConfig(), reg)
    assert(casted.columns.toSeq === Seq("name", "id", "values"))
    val row = casted.collect().head
    assert(row.getString(0) === "hello")
    assert(row.getInt(1) === 0)
    assert(row.getSeq[Int](2) === Seq.empty)
  }

  test("missing singular message column → nulls, not defaults " +
    "(tests/test_conversion.py:590-631)") {
    import spark.implicits._
    val md = Schemas.msg("NullableExample")
    val df = Seq(5).toDF("int_value")
    val casted = Protarrow.castToProto(df, md, GraftConfig(), reg)
    val row = casted.collect().head
    assert(row.getInt(0) === 5)
    assert(row.isNullAt(casted.columns.indexOf("message_value")))
    assert(row.getSeq[Any](casted.columns.indexOf("message_repeated")) === Seq.empty)
    assert(row.getMap[Any, Any](casted.columns.indexOf("int_map")).isEmpty)
  }

  test("null cells of non-presence fields fill with defaults " +
    "(cast_to_proto.py:99-102)") {
    val md = Schemas.msg("MyProto")
    val schema = StructType(Seq(
      StructField("name", StringType, nullable = true),
      StructField("id", IntegerType, nullable = true)))
    val df = spark.createDataFrame(
      java.util.List.of(Row(null, null), Row("a", 7)), schema)
    val rows = Protarrow.castToProto(df, md, GraftConfig(), reg).collect()
    assert(rows(0).getString(0) === "")
    assert(rows(0).getInt(1) === 0)
    assert(rows(0).getSeq[Int](2) === Seq.empty)
    assert(rows(1).getString(0) === "a")
    assert(rows(1).getInt(1) === 7)
  }

  test("enum int ↔ name re-encode round trip (tests/test_conversion.py:532-548)") {
    val md = Schemas.msg("WithEnum")
    val msgs = Seq(
      DynamicMessage(md, Map(1 -> 1)),
      DynamicMessage(md, Map(1 -> 2)),
      DynamicMessage.empty(md))
    val intDf = Protarrow.messagesToDataFrame(spark, msgs, md, GraftConfig(), reg)
    // int table → string-enum shape
    val strCfg = GraftConfig(enumType = EnumRepr.StringRepr)
    val asStr = Protarrow.castToProto(intDf, md, strCfg, reg)
    assert(asStr.collect().map(_.getString(0)).toSeq ===
      Seq("TEST_ENUM_1", "TEST_ENUM_2", "UNKNOWN_TEST_ENUM"))
    // ... and back to int shape
    val asInt = Protarrow.castToProto(asStr, md, GraftConfig(), reg)
    assert(asInt.collect().map(_.getInt(0)).toSeq === Seq(1, 2, 0))
    assert(Protarrow.dataFrameToMessages(asInt, md, GraftConfig(), reg) === msgs)
  }

  test("presence enum fields keep null through the cast (no fallback fabrication)") {
    // the unknown-value fallbacks (firstName / 0) are for PRESENT values;
    // a null cell of an optional enum field must stay unset in both
    // repr directions, or a round trip fabricates presence
    val enumTyp = Schemas.msg("WithEnum").fields.head.typ
    val md = PMessageDesc("graft.test.OptEnum",
      Seq(PField("e", 1, enumTyp, explicitOptional = true)))
    val intSchema = StructType(Seq(StructField("e", IntegerType, nullable = true)))
    val intDf = spark.createDataFrame(
      java.util.List.of(Row(null), Row(Int.box(1))), intSchema)
    val asStr = Protarrow.castToProto(intDf, md,
      GraftConfig(enumType = EnumRepr.StringRepr), reg).collect()
    assert(asStr(0).isNullAt(0), "null presence enum must stay null (int → name)")
    assert(asStr(1).getString(0) === "TEST_ENUM_1")
    val strSchema = StructType(Seq(StructField("e", StringType, nullable = true)))
    val strDf = spark.createDataFrame(
      java.util.List.of(Row(null), Row("TEST_ENUM_2")), strSchema)
    val asInt = Protarrow.castToProto(strDf, md, GraftConfig(), reg).collect()
    assert(asInt(0).isNullAt(0), "null presence enum must stay null (name → int)")
    assert(asInt(1).getInt(0) === 2)
  }

  test("numeric widening/narrowing casts") {
    import spark.implicits._
    val md = Schemas.msg("MyProto")
    val df = Seq(("x", 3L)).toDF("name", "id") // long → int32 field
    val row = Protarrow.castToProto(df, md, GraftConfig(), reg).collect().head
    assert(row.getInt(1) === 3)
  }

  test("nested struct cast preserves null mask (cast_to_proto.py:216-240)") {
    val md = Schemas.msg("NullableExample")
    val nested = Schemas.msg("NullableExample.NestedNullableExample")
    val msgs = Seq(
      DynamicMessage(md, Map(10 -> DynamicMessage(nested, Map(1 -> 5)))),
      DynamicMessage.empty(md))
    val df = Protarrow.messagesToDataFrame(spark, msgs, md, GraftConfig(), reg)
    val casted = Protarrow.castToProto(df, md, GraftConfig(), reg)
    val back = Protarrow.dataFrameToMessages(casted, md, GraftConfig(), reg)
    assert(back === msgs)
  }

  test("map as list ↔ map shape changes") {
    val md = Schemas.msg("NullableExample")
    val msgs = Seq(DynamicMessage(md, Map(3 -> Map("a" -> 1, "b" -> 2))))
    val mapDf = Protarrow.messagesToDataFrame(spark, msgs, md, GraftConfig(), reg)
    val listCfg = GraftConfig(mapAsList = true)
    val asList = Protarrow.castToProto(mapDf, md, listCfg, reg)
    assert(asList.schema("int_map").dataType.isInstanceOf[ArrayType])
    assert(Protarrow.dataFrameToMessages(asList, md, listCfg, reg) === msgs)
    val backToMap = Protarrow.castToProto(asList, md, GraftConfig(), reg)
    assert(Protarrow.dataFrameToMessages(backToMap, md, GraftConfig(), reg) === msgs)
  }
}
