package graft.proto

import scala.io.Source
import org.scalatest.funsuite.AnyFunSuite

/** Wire-format codec round trips over the golden fixtures (the codec is
  * the engine's protobuf-java replacement, SURVEY.md §7.0). */
class WireSpec extends AnyFunSuite {

  private val reg = Schemas.registry

  private def fixture(name: String): Seq[DynamicMessage] = {
    val md = Schemas.msg(name)
    val in = getClass.getResourceAsStream(s"/protarrow/$name.jsonl")
    Source.fromInputStream(in, "UTF-8").getLines().filter(_.nonEmpty)
      .map(l => ProtoJson.parse(l, md, reg)).toVector
  }

  for (name <- Seq("ExampleMessage", "NestedExampleMessage",
    "RecursiveSelfReferentialMessage", "RecursiveNestedMessageLevel1",
    "RecursiveSelfReferentialRepeatedMessage", "RecursiveSelfReferentialMapMessage")) {
    test(s"$name: wire round trip") {
      val md = Schemas.msg(name)
      fixture(name).zipWithIndex.foreach { case (m, i) =>
        val bytes = ProtoWire.encode(m, reg)
        val back = ProtoWire.decode(bytes, md, reg)
        assert(back === m, s"row $i")
      }
    }
  }

  test("zigzag") {
    for (v <- Seq(0, -1, 1, Int.MinValue, Int.MaxValue))
      assert(ProtoWire.unzigzag32(ProtoWire.zigzag32(v)) === v)
    for (v <- Seq(0L, -1L, 1L, Long.MinValue, Long.MaxValue))
      assert(ProtoWire.unzigzag64(ProtoWire.zigzag64(v)) === v)
  }

  test("unknown fields are skipped") {
    val myProto = Schemas.msg("MyProto")
    val m = DynamicMessage(myProto, Map(1 -> "x", 2 -> 3, 3 -> Vector(1, 2)))
    val bytes = ProtoWire.encode(m, reg)
    // decode against a narrower descriptor: only field 2 known
    val narrow = PMessageDesc("narrow", Seq(PField("id", 2, PType.PInt32)))
    val back = ProtoWire.decode(bytes, narrow, reg)
    assert(back === DynamicMessage(narrow, Map(2 -> 3)))
  }

  test("json writer round trips") {
    val md = Schemas.msg("ExampleMessage")
    fixture("ExampleMessage").foreach { m =>
      val back = ProtoJson.parse(ProtoJson.toJson(m, reg), md, reg)
      assert(back === m)
    }
  }
}
