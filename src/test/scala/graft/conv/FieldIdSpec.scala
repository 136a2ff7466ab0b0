package graft.conv

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec
import graft.operators.{FieldIds, T}
import graft.proto._
import graft.proto.PType._

/** Physical parquet field-id round trip (reference: common.py:89-93 writes
  * `b"PARQUET:field_id"` metadata; tests/test_conversion.py:952-962 pins
  * it). Here the proto field numbers become REAL parquet field ids via
  * Spark's `parquet.field.id` metadata key + the fieldId write/read confs,
  * and column resolution on re-read is by id, not name — the
  * schema-evolution story field ids exist for. */
class FieldIdSpec extends SparkSpec {

  private def freshOut() =
    java.nio.file.Files.createTempDirectory("graft_fieldid_spec").toString + "/t"

  private val md = PMessageDesc("graft.LineId", Seq(
    PField("l_orderkey", 1, PInt64),
    PField("l_returnflag", 2, PString)))

  private def writeStamped(out: String): Unit = {
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    val schema = SchemaConversion.messageTypeToSchema(
      md, GraftConfig(fieldNumberKey = Some(FieldIds.SparkKey)), WellKnown.registry)
    T(spark, sfDir, "lineitem").select(
      col("l_orderkey").as("l_orderkey", schema("l_orderkey").metadata),
      col("l_returnflag").as("l_returnflag", schema("l_returnflag").metadata))
      .write.mode("overwrite").parquet(out)
  }

  test("renamed read schema resolves by PHYSICAL field id") {
    val out = freshOut()
    writeStamped(out)
    val renamed = StructType(Seq(
      StructField("ok", LongType, nullable = true, FieldIds.meta(1)),
      StructField("flag", StringType, nullable = true, FieldIds.meta(2))))
    val back = spark.read.schema(renamed).parquet(out)
    val src = T(spark, sfDir, "lineitem")
    assert(back.count() === src.count())
    assert(back.filter(col("ok").isNull || col("flag").isNull).count() === 0,
      "id resolution must populate every renamed column")
    assert(back.agg(sum("ok")).head().getLong(0) ===
      src.agg(sum("l_orderkey")).head().getLong(0))
  }

  test("the same renamed names WITHOUT ids fall back to name matching → nulls") {
    val out = freshOut()
    writeStamped(out)
    // no parquet.field.id metadata in the request schema: resolution is
    // by name, the renamed names don't exist in the file, values are
    // NULL — proving the positive case above really resolved by id
    val plain = StructType(Seq(
      StructField("ok", LongType, nullable = true),
      StructField("flag", StringType, nullable = true)))
    val back = spark.read.schema(plain).parquet(out)
    assert(back.filter(col("ok").isNotNull || col("flag").isNotNull).count() === 0)
  }

  test("nested struct fields carry ids and resolve by id when renamed") {
    val out = freshOut()
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    val nestedMd = PMessageDesc("graft.Outer", Seq(
      PField("id", 1, PInt64),
      PField("inner", 2, PMessage("graft.Inner"))))
    val innerMd = PMessageDesc("graft.Inner", Seq(
      PField("qty", 3, PDouble),
      PField("flag", 4, PString)))
    val reg = WellKnown.registry ++ new ProtoRegistry(
      Map(nestedMd.fullName -> nestedMd, innerMd.fullName -> innerMd), Map.empty)
    val schema = SchemaConversion.messageTypeToSchema(
      nestedMd, GraftConfig(fieldNumberKey = Some(FieldIds.SparkKey)), reg)
    val innerSchema = schema("inner").dataType.asInstanceOf[StructType]
    T(spark, sfDir, "lineitem").select(
      col("l_orderkey").as("id", schema("id").metadata),
      struct(
        col("l_quantity").as("qty", innerSchema("qty").metadata),
        col("l_returnflag").as("flag", innerSchema("flag").metadata))
        .as("inner", schema("inner").metadata))
      .write.mode("overwrite").parquet(out)
    val renamed = StructType(Seq(
      StructField("k", LongType, nullable = true, FieldIds.meta(1)),
      StructField("payload", StructType(Seq(
        StructField("amount", DoubleType, nullable = true, FieldIds.meta(3)),
        StructField("tag", StringType, nullable = true, FieldIds.meta(4)))),
        nullable = true, FieldIds.meta(2))))
    val back = spark.read.schema(renamed).parquet(out)
    assert(back.filter(col("k").isNull || col("payload.amount").isNull ||
      col("payload.tag").isNull).count() === 0)
    val src = T(spark, sfDir, "lineitem")
    // PINNED QUIRK: nested schema pruning rewrites the requested struct
    // to just the accessed leaf and DROPS the field-id metadata in the
    // pruned schema, so the reader silently falls back to name matching
    // → NULLs (measured: sum = null pruned, correct unpruned). A query
    // that projects a nested leaf from an id-resolved parquet must
    // disable pruning (or read the full struct, as the filter above
    // does). Flat schemas (pa65's shape) are unaffected.
    val pruneKey = "spark.sql.optimizer.nestedSchemaPruning.enabled"
    assert(back.agg(sum("payload.amount")).head().isNullAt(0),
      "if this starts resolving, Spark fixed the pruning/field-id clash — drop the workaround")
    spark.conf.set(pruneKey, "false")
    try
      assert(back.agg(sum("payload.amount")).head().getDouble(0) ===
        src.agg(sum("l_quantity")).head().getDouble(0))
    finally spark.conf.set(pruneKey, "true")
  }
}
