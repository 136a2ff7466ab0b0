package graft.proto

import org.scalatest.funsuite.AnyFunSuite
import graft.proto.PType._

/** Parser + descriptor edge cases beyond what Schemas exercises. */
class ProtoParserSpec extends AnyFunSuite {

  test("oneof members get presence; options and reserved are skipped") {
    val reg = ProtoParser.parse("""
      syntax = "proto3";
      package t;
      message M {
        option deprecated = true;
        reserved 5, 6;
        reserved "old_name";
        oneof choice {
          string name = 1;
          int32 id = 2;
        }
        int32 plain = 3 [deprecated = true];
      }
    """)
    val m = reg.message("t.M")
    assert(m.byName("name").hasPresence)
    assert(m.byName("id").hasPresence)
    assert(!m.byName("plain").hasPresence)
  }

  test("nested scope resolution prefers the innermost message") {
    val reg = ProtoParser.parse("""
      syntax = "proto3";
      package t;
      message Inner { int32 outer_level = 1; }
      message Outer {
        message Inner { string inner_level = 1; }
        Inner pick = 1;
      }
    """)
    val f = reg.message("t.Outer").byName("pick")
    assert(f.typ === PMessage("t.Outer.Inner"))
  }

  test("proto2 group constructs are rejected (proto_to_arrow.py:378-383)") {
    val e = intercept[IllegalArgumentException](ProtoParser.parse("""
      syntax = "proto2";
      message M { group G = 1 { optional int32 x = 2; } }
    """))
    assert(e.getMessage.contains("group"))
  }

  test("enums allow negative and sparse numbers") {
    val reg = ProtoParser.parse("""
      syntax = "proto3";
      enum E { E_ZERO = 0; E_NEG = -5; E_BIG = 1000; }
      message M { E e = 1; }
    """)
    val ed = reg.enum("E")
    assert(ed.nameToNumber === Map("E_ZERO" -> 0, "E_NEG" -> -5, "E_BIG" -> 1000))
    // wire round trip of a negative enum number (sign-extended varint)
    val md = reg.message("M")
    val m = DynamicMessage(md, Map(1 -> -5))
    assert(ProtoWire.decode(ProtoWire.encode(m, reg), md, reg) === m)
  }

  test("unresolved type names fail loudly") {
    val e = intercept[IllegalArgumentException](ProtoParser.parse("""
      syntax = "proto3";
      message M { Missing x = 1; }
    """))
    assert(e.getMessage.contains("Missing"))
  }
}
