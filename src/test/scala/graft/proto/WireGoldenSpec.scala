package graft.proto

import org.scalatest.funsuite.AnyFunSuite
import PType._

/** Golden-byte conformance battery for the wire codec, hand-derived from
  * the PUBLIC proto3 encoding spec (protobuf.dev/programming-guides/
  * encoding): varint little-endian base-128 with continuation bits,
  * negative int32/int64 as 10-byte two's-complement sign extension,
  * zigzag for sint*, little-endian fixed32/64, length-delimited strings/
  * bytes/messages, packed repeated scalars, map fields as repeated
  * (key=1, value=2) entry messages, ascending-field-number canonical
  * output, and unknown-field skipping over every wire type.
  *
  * WHY: the container has no protobuf runtime (SURVEY.md §7.0), so every
  * other wire test round-trips the codec against ITSELF — a bug
  * symmetric in encode and decode survives them all. These vectors pin
  * each direction against literal bytes derived from the spec, the
  * substitute for the runtime-backed fixtures the reference runs
  * (reference: tests/test_conversion.py:99-105).
  */
class WireGoldenSpec extends AnyFunSuite {

  private val reg0 = WellKnown.registry

  private def md1(t: PType, repeated: Boolean = false,
      optional: Boolean = false): PMessageDesc =
    PMessageDesc("g.T", Seq(PField("a", 1, t, repeated = repeated,
      explicitOptional = optional)))

  private def bytesOf(hex: String): Array[Byte] =
    hex.split("\\s+").filter(_.nonEmpty)
      .map(h => Integer.parseInt(h, 16).toByte)

  private def hexOf(b: Array[Byte]): String =
    b.map(x => f"${x & 0xFF}%02X").mkString(" ")

  /** Assert encode(msg) == bytes AND decode(bytes) == msg. */
  private def golden(name: String, md: PMessageDesc, values: Map[Int, Any],
      hex: String, reg: ProtoRegistry = reg0): Unit = test(s"golden: $name") {
    val m = DynamicMessage(md, values)
    val expect = bytesOf(hex)
    val enc = ProtoWire.encode(m, reg)
    assert(hexOf(enc) === hexOf(expect), "encode direction")
    assert(ProtoWire.decode(expect, md, reg) === m, "decode direction")
  }

  /** Decode-only vector (legal alternative encodings the spec requires
    * parsers to accept but canonical encoders never emit). */
  private def decodes(name: String, md: PMessageDesc, hex: String,
      values: Map[Int, Any], reg: ProtoRegistry = reg0): Unit =
    test(s"golden (decode-only): $name") {
      assert(ProtoWire.decode(bytesOf(hex), md, reg) ===
        DynamicMessage(md, values))
    }

  // ------------------------------------------------------------- varint
  // spec example: field 1 varint 150 → 08 96 01
  golden("int32 150 (the spec's example)", md1(PInt32), Map(1 -> 150),
    "08 96 01")
  golden("int32 1", md1(PInt32), Map(1 -> 1), "08 01")
  // proto3 plain scalar at its default is NOT serialized
  golden("int32 0 (plain default → absent)", md1(PInt32), Map(1 -> 0), "")
  // negative int32 is sign-extended to 64 bits → always 10 bytes
  golden("int32 -1 (10-byte sign extension)", md1(PInt32), Map(1 -> -1),
    "08 FF FF FF FF FF FF FF FF FF 01")
  golden("int32 Int.MinValue", md1(PInt32), Map(1 -> Int.MinValue),
    "08 80 80 80 80 F8 FF FF FF FF 01")
  golden("int64 Long.MaxValue", md1(PInt64), Map(1 -> Long.MaxValue),
    "08 FF FF FF FF FF FF FF FF 7F")
  golden("int64 Long.MinValue", md1(PInt64), Map(1 -> Long.MinValue),
    "08 80 80 80 80 80 80 80 80 80 01")
  golden("uint32 4294967295", md1(PUInt32), Map(1 -> 4294967295L),
    "08 FF FF FF FF 0F")
  // uint64 2^64-1 rides the Long bit pattern -1
  golden("uint64 2^64-1", md1(PUInt64), Map(1 -> -1L),
    "08 FF FF FF FF FF FF FF FF FF 01")
  golden("bool true, field 2",
    PMessageDesc("g.B", Seq(PField("b", 2, PBool))), Map(2 -> true), "10 01")
  golden("enum number 3", md1(PEnum("g.E")), Map(1 -> 3), "08 03",
    new ProtoRegistry(Map.empty,
      Map("g.E" -> PEnumDesc("g.E", Seq("Z" -> 0, "X" -> 3)))) ++ reg0)

  // ------------------------------------------------------------- zigzag
  golden("sint32 -1 → zigzag 1", md1(PSInt32), Map(1 -> -1), "08 01")
  golden("sint32 1 → zigzag 2", md1(PSInt32), Map(1 -> 1), "08 02")
  golden("sint32 Int.MaxValue", md1(PSInt32), Map(1 -> Int.MaxValue),
    "08 FE FF FF FF 0F")
  golden("sint32 Int.MinValue", md1(PSInt32), Map(1 -> Int.MinValue),
    "08 FF FF FF FF 0F")
  golden("sint64 Long.MaxValue", md1(PSInt64), Map(1 -> Long.MaxValue),
    "08 FE FF FF FF FF FF FF FF FF 01")
  golden("sint64 Long.MinValue", md1(PSInt64), Map(1 -> Long.MinValue),
    "08 FF FF FF FF FF FF FF FF FF 01")

  // -------------------------------------------------------------- fixed
  golden("fixed32 1 (little-endian)", md1(PFixed32), Map(1 -> 1L),
    "0D 01 00 00 00")
  golden("fixed32 4294967295", md1(PFixed32), Map(1 -> 4294967295L),
    "0D FF FF FF FF")
  golden("fixed64 1", md1(PFixed64), Map(1 -> 1L),
    "09 01 00 00 00 00 00 00 00")
  golden("sfixed32 -2", md1(PSFixed32), Map(1 -> -2), "0D FE FF FF FF")
  golden("sfixed64 -2", md1(PSFixed64), Map(1 -> -2L),
    "09 FE FF FF FF FF FF FF FF")
  golden("double 2.5 (IEEE-754 LE)", md1(PDouble), Map(1 -> 2.5d),
    "09 00 00 00 00 00 00 04 40")
  golden("float -2.25", md1(PFloat), Map(1 -> -2.25f), "0D 00 00 10 C0")

  // ----------------------------------------------------- length-delimited
  // spec example: field 2 string "testing" → 12 07 74..67
  golden("string \"testing\" (the spec's example)",
    PMessageDesc("g.S", Seq(PField("b", 2, PString))), Map(2 -> "testing"),
    "12 07 74 65 73 74 69 6E 67")
  golden("optional string \"\" keeps presence as a zero-length record",
    md1(PString, optional = true), Map(1 -> ""), "0A 00")
  golden("string \"€\" (3-byte UTF-8)", md1(PString), Map(1 -> "€"),
    "0A 03 E2 82 AC")
  golden("bytes 00 01 FF", md1(PBytes),
    Map(1 -> Bytes.owned(Array[Byte](0, 1, -1))), "0A 03 00 01 FF")

  // ------------------------------------------------------------- packed
  // spec example: repeated int32 field 4 [3, 270, 86942]
  golden("packed repeated int32 [3,270,86942] (the spec's example)",
    PMessageDesc("g.P", Seq(PField("d", 4, PInt32, repeated = true))),
    Map(4 -> Vector(3, 270, 86942)), "22 06 03 8E 02 9E A7 05")
  golden("packed repeated sint64 [-1, Long.MinValue]",
    md1(PSInt64, repeated = true), Map(1 -> Vector(-1L, Long.MinValue)),
    "0A 0B 01 FF FF FF FF FF FF FF FF FF 01")
  golden("packed repeated fixed32 [1, 2]",
    md1(PFixed32, repeated = true), Map(1 -> Vector(1L, 2L)),
    "0A 08 01 00 00 00 02 00 00 00")
  golden("repeated string is never packed",
    md1(PString, repeated = true), Map(1 -> Vector("a", "bc")),
    "0A 01 61 0A 02 62 63")

  // ------------------------------------------------------------- nested
  private val leaf = PMessageDesc("g.Leaf", Seq(PField("a", 1, PInt32)))
  private val mid = PMessageDesc("g.Mid",
    Seq(PField("m", 1, PMessage("g.Leaf"))))
  private val regN = new ProtoRegistry(
    Map("g.Leaf" -> leaf, "g.Mid" -> mid), Map.empty) ++ reg0

  // spec example: field 3 message { field 1 varint 150 } → 1A 03 08 96 01
  golden("nested message (the spec's example)",
    PMessageDesc("g.N", Seq(PField("c", 3, PMessage("g.Leaf")))),
    Map(3 -> DynamicMessage(leaf, Map(1 -> 150))), "1A 03 08 96 01", regN)
  golden("two-level nesting",
    PMessageDesc("g.N2", Seq(PField("m", 1, PMessage("g.Mid")))),
    Map(1 -> DynamicMessage(mid,
      Map(1 -> DynamicMessage(leaf, Map(1 -> 150))))),
    "0A 05 0A 03 08 96 01", regN)
  golden("empty nested message keeps presence as a zero-length record",
    PMessageDesc("g.N", Seq(PField("c", 3, PMessage("g.Leaf")))),
    Map(3 -> DynamicMessage.empty(leaf)), "1A 00", regN)

  // fields declared out of order still encode in ascending field number
  golden("canonical ascending-field-number output",
    PMessageDesc("g.O", Seq(PField("z", 2, PString), PField("a", 1, PInt32))),
    Map(2 -> "x", 1 -> 1), "08 01 12 01 78")

  // --------------------------------------------------------------- maps
  golden("map<string,int32> {\"a\"→1}",
    PMessageDesc("g.M", Seq(PField("m", 1, PInt32,
      mapKV = Some((PString, PInt32))))),
    Map(1 -> Map("a" -> 1)), "0A 05 0A 01 61 10 01")
  golden("map<int32,string> {2→\"x\"}",
    PMessageDesc("g.M", Seq(PField("m", 1, PString,
      mapKV = Some((PInt32, PString))))),
    Map(1 -> Map(2 -> "x")), "0A 05 08 02 12 01 78")

  // -------------------------------------------------------- decode-only
  decodes("overlong varint (non-canonical 150) is accepted",
    md1(PInt32), "08 96 81 00", Map(1 -> 150))
  decodes("unpacked occurrences of a packed-declared field",
    PMessageDesc("g.P", Seq(PField("d", 4, PInt32, repeated = true))),
    "20 03 20 8E 02", Map(4 -> Vector(3, 270)))
  decodes("two packed records for one field concatenate",
    md1(PInt32, repeated = true), "0A 02 03 04 0A 01 05",
    Map(1 -> Vector(3, 4, 5)))
  decodes("repeated scalar occurrences of a singular field: last wins",
    md1(PInt32), "08 01 08 02", Map(1 -> 2))
  decodes("unknown fields of every wire type are skipped",
    md1(PInt32),
    // f99 varint 1, f12 fixed64, f13 LEN "ab", f14 fixed32, then known f1
    "98 06 01 " +            // field 99, varint
      "61 02 00 00 00 00 00 00 00 " + // field 12 (tag 0x61), fixed64
      "6A 02 61 62 " +       // field 13 (tag 0x6A), len 2
      "75 05 00 00 00 " +    // field 14 (tag 0x75), fixed32
      "08 96 01",            // field 1, int32 150
    Map(1 -> 150))
  decodes("map entry fields may arrive value-before-key",
    PMessageDesc("g.M", Seq(PField("m", 1, PInt32,
      mapKV = Some((PString, PInt32))))),
    "0A 05 10 01 0A 01 61", Map(1 -> Map("a" -> 1)))
  decodes("map entry with omitted default key and value",
    PMessageDesc("g.M", Seq(PField("m", 1, PInt32,
      mapKV = Some((PInt32, PInt32))))),
    "0A 00", Map(1 -> Map(0 -> 0)))
}
