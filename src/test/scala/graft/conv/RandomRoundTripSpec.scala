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

  /** The FULL 35-config × 3-message-type random matrix, mirroring the
    * reference's parametrization (tests/test_conversion.py:54-96 ×
    * test_with_random :127-134): RANDOM messages — not just the
    * deterministic fixtures — exercise every config row, because the
    * 35-way interaction bugs (presence × unit truncation × nullability
    * knobs × map/list shape) live exactly in the random space. The
    * deterministic-fixture twin of this matrix is RoundTripSpec; the
    * config list is SHARED ([[RoundTripSpec.configs]]) so the two
    * matrices cannot drift. Row counts per config are smaller than the
    * 3-config spec ran before (the matrix is 35× wider); seeds stay
    * fixed so failures reproduce. */
  private val matrixTypes = Seq(
    ("ExampleMessage", 4, 2L),           // widest field surface
    ("NestedExampleMessage", 3, 2L),     // nesting + presence masks
    ("SuperNestedExampleMessage", 2, 1L)) // deep recursion shell

  for ((cfg, i) <- RoundTripSpec.configs.zipWithIndex; (name, n, seeds) <- matrixTypes) {
    test(s"random $name round trip [config ${i + 1}/35]") {
      val md = Schemas.msg(name)
      for (seed <- 1L to seeds) {
        val msgs = sample(Gen.listOfN(n, genMessage(md)), seed)
        val df = Protarrow.messagesToDataFrame(spark, msgs, md, cfg, reg)
        val back = Protarrow.dataFrameToMessages(df, md, cfg, reg)
        assert(back === msgs.map(Truncation.truncate(_, cfg)), s"seed $seed")
      }
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
