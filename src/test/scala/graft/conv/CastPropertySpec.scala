package graft.conv

import org.scalacheck.Gen
import graft.proto._
import graft.{Protarrow, SparkSpec}

/** Property battery for castToProto (cast_table parity — reference cast
  * behaviors: tests/test_conversion.py:493-631): random (message type,
  * config, messages) triples driven through REORDERED, NARROWED
  * (missing columns) and WIDENED (extra columns) source shapes, pinning
  *  - idempotence: casting an already-canonical frame is the identity;
  *  - column-order normalization: any source order casts to the
  *    descriptor's field order with values untouched;
  *  - default-fill: a dropped plain column reads back as proto3
  *    defaults (= the field absent from the decoded message), while
  *    dropped presence fields come back null/unset — exactly the
  *    messages with those fields removed;
  *  - projection: columns unknown to the descriptor are dropped.
  * Schema equality is modulo nullability (the documented castDataFrame
  * relaxation — Catalyst infers it, Spark cannot tighten it); VALUE
  * equality goes through message decode, the conversion ground truth.
  * CastSpec pins the reference's deterministic fixtures; this spec walks
  * the random space around them (the RoundTripSpec/RandomRoundTripSpec
  * split, applied to the cast surface). */
class CastPropertySpec extends SparkSpec {

  /** (name, type) shape with nullability erased — DataType.sql drops
    * containsNull/valueContainsNull/field nullability. */
  private def shape(df: org.apache.spark.sql.DataFrame): Seq[(String, String)] =
    df.schema.fields.toSeq.map(f => (f.name, f.dataType.sql))

  import TestGen.{sample, genMessage}

  private val reg = Schemas.registry

  // config rows chosen to cover the cast-relevant knobs: default, string
  // enums, list-as-map shape, nullable-list toggles
  private def cfgs = Seq(
    GraftConfig(),
    GraftConfig(enumType = GraftConfig.EnumRepr.StringRepr),
    GraftConfig(listNullable = true, mapNullable = true),
    GraftConfig(listValueNullable = true, mapValueNullable = true))

  private val types = Seq("MyProto", "ExampleMessage", "NullableExample")

  for (name <- types; (cfg, ci) <- cfgs.zipWithIndex) {
    test(s"cast properties: $name [config ${ci + 1}/${cfgs.size}]") {
      val md = Schemas.msg(name)
      for (seed <- 1L to 3L) {
        val msgs = sample(Gen.listOfN(4, genMessage(md)), seed)
          .map(Truncation.truncate(_, cfg))
        val df = Protarrow.messagesToDataFrame(spark, msgs, md, cfg, reg)
        def decodes(d: org.apache.spark.sql.DataFrame,
            expect: Seq[DynamicMessage], what: String): Unit =
          assert(Protarrow.dataFrameToMessages(d, md, cfg, reg) === expect,
            s"seed $seed: $what")

        // idempotence: the canonical frame casts to itself
        val idem = Protarrow.castToProto(df, md, cfg, reg)
        assert(shape(idem) === shape(df), s"seed $seed: idempotent shape")
        decodes(idem, msgs, "idempotent values")

        // reorder: a shuffled column order casts back to canonical
        val perm = sample(Gen.const(()).flatMap(_ =>
          Gen.delay(org.scalacheck.Gen.oneOf(
            df.columns.toSeq.permutations.take(24).toSeq))), seed)
        val reordered = Protarrow.castToProto(
          df.select(perm.map(org.apache.spark.sql.functions.col): _*),
          md, cfg, reg)
        assert(reordered.columns.toSeq === df.columns.toSeq,
          s"seed $seed: column order must normalize")
        decodes(reordered, msgs, "reordering columns must not change values")

        // narrow: drop a random nonempty strict subset of columns; the
        // cast must fill them back as defaults/unset — i.e. decode to
        // the original messages WITHOUT the dropped fields
        val dropCount = 1 + (seed % df.columns.length.max(2)).toInt
          .min(df.columns.length - 1)
        val dropped = sample(
          Gen.pick(dropCount, df.columns.toSeq), seed).toSet
        val kept = df.columns.filterNot(dropped)
        val narrowed = Protarrow.castToProto(
          df.select(kept.map(org.apache.spark.sql.functions.col): _*),
          md, cfg, reg)
        assert(narrowed.columns.toSeq === df.columns.toSeq,
          s"seed $seed: dropped columns must be re-materialized")
        val droppedNums = md.fields.filter(f => dropped(f.name)).map(_.number).toSet
        val expect = msgs.map(m =>
          DynamicMessage(md, m.values.filterNot { case (n, _) => droppedNums(n) }))
        decodes(narrowed,
          expect, s"dropped fields must decode as absent/default, " +
            s"kept fields untouched (dropped=$dropped)")

        // widen: an extra column unknown to the descriptor is dropped
        val widened = Protarrow.castToProto(
          df.withColumn("graft_extra",
            org.apache.spark.sql.functions.lit(42)), md, cfg, reg)
        assert(widened.columns.toSeq === df.columns.toSeq,
          s"seed $seed: unknown columns must be projected away")
        decodes(widened, msgs, "projection must not change values")
      }
    }
  }

  test("cast widens a narrower source integer column to the field's type") {
    import org.apache.spark.sql.functions._
    val md = Schemas.msg("ExampleMessage")
    val f = md.byName("int64_value")
    val msgs = Seq(7, -3, 0).map(v =>
      DynamicMessage(md, Map(f.number -> v.toLong)))
    val df = Protarrow.messagesToDataFrame(spark, msgs, md, GraftConfig(), reg)
    // shrink the physical column to int32 — the cast must widen it back
    val narrowTyped = df.withColumn("int64_value",
      col("int64_value").cast("int"))
    val casted = Protarrow.castToProto(narrowTyped, md, GraftConfig(), reg)
    assert(casted.schema("int64_value").dataType ===
      org.apache.spark.sql.types.LongType)
    assert(Protarrow.dataFrameToMessages(casted, md, GraftConfig(), reg) === msgs)
  }
}
