package graft.conv

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.proto._
import graft.proto.PType._
import graft.{Protarrow, SparkSpec}
import graft.conv.GraftConfig.{EnumRepr, TimeUnit}

/** Property-based round trips with a reflective random generator over the
  * descriptor IR — full numeric ranges (incl. uint64 0..2^64-1 as
  * bit-patterns) and random presence, mirroring
  * tests/random_generator.py:58-128. */
class RandomRoundTripSpec extends SparkSpec {

  import TestGen.{sample, genMessage}

  private val reg = Schemas.registry

  private val configs = Seq(
    GraftConfig(),
    GraftConfig(enumType = EnumRepr.StringRepr, timestampUnit = TimeUnit.Seconds,
      timeOfDayUnit = TimeUnit.Micros, durationUnit = TimeUnit.Millis),
    GraftConfig(mapAsList = true, listNullable = true, mapNullable = true))

  for (cfg <- configs) {
    test(s"random ExampleMessage round trip [$cfg]") {
      val md = Schemas.msg("ExampleMessage")
      for (seed <- 1L to 5L) {
        val msgs = sample(Gen.listOfN(8, genMessage(md)), seed)
        val df = Protarrow.messagesToDataFrame(spark, msgs, md, cfg, reg)
        val back = Protarrow.dataFrameToMessages(df, md, cfg, reg)
        assert(back === msgs.map(Truncation.truncate(_, cfg)), s"seed $seed")
      }
    }
  }

  test("random SuperNestedExampleMessage round trip (regenerated fixture — " +
    "reference jsonl is absent from the checkout, FIXTURES.md §1)") {
    val md = Schemas.msg("SuperNestedExampleMessage")
    for (seed <- 1L to 3L) {
      val msgs = sample(Gen.listOfN(2, genMessage(md)), seed)
      val df = Protarrow.messagesToDataFrame(spark, msgs, md, GraftConfig(), reg)
      val back = Protarrow.dataFrameToMessages(df, md, GraftConfig(), reg)
      assert(back === msgs.map(Truncation.truncate(_, GraftConfig())), s"seed $seed")
    }
  }

  test("random wire round trip") {
    val md = Schemas.msg("ExampleMessage")
    for (seed <- 1L to 10L) {
      val m = sample(genMessage(md), seed)
      assert(ProtoWire.decode(ProtoWire.encode(m, reg), md, reg) === m, s"seed $seed")
    }
  }

  test("uint64 extremes bit-preserve through DataFrame and wire") {
    val md = Schemas.msg("ExampleMessage")
    val f = md.byName("uint64_value")
    val extremes = Seq(0L, 1L, Long.MaxValue, Long.MinValue /* = 2^63 */, -1L /* = 2^64-1 */)
    val msgs = extremes.map(v => DynamicMessage(md, Map(f.number -> v)))
    val df = Protarrow.messagesToDataFrame(spark, msgs, md, GraftConfig(), reg)
    val back = Protarrow.dataFrameToMessages(df, md, GraftConfig(), reg)
    assert(back === msgs)
    msgs.foreach(m => assert(ProtoWire.decode(ProtoWire.encode(m, reg), md, reg) === m))
  }
}
