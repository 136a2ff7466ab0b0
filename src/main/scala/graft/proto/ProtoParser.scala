package graft.proto

import scala.collection.mutable
import graft.proto.PType._

/** Minimal proto3 `.proto` text parser → [[ProtoRegistry]].
  *
  * Covers the subset the engine's schemas need: `syntax`, `package`,
  * `import` (recorded, not followed — well-known types are built in),
  * nested `message`/`enum`, `repeated`/`optional` labels, `map<K, V>`,
  * `reserved`, comments. Unsupported proto2 constructs (`group`,
  * `extensions`) are rejected — mirroring the reference's TYPE_GROUP
  * rejection (proto_to_arrow.py:378-383).
  */
object ProtoParser {

  private val scalarNames: Map[String, PType] = Map(
    "double" -> PDouble, "float" -> PFloat, "int32" -> PInt32,
    "int64" -> PInt64, "uint32" -> PUInt32, "uint64" -> PUInt64,
    "sint32" -> PSInt32, "sint64" -> PSInt64, "fixed32" -> PFixed32,
    "fixed64" -> PFixed64, "sfixed32" -> PSFixed32, "sfixed64" -> PSFixed64,
    "bool" -> PBool, "string" -> PString, "bytes" -> PBytes)

  def parse(source: String): ProtoRegistry = {
    val toks = tokenize(source)
    var pos = 0
    def peek: String = if (pos < toks.length) toks(pos) else ""
    def next(): String = { val t = peek; pos += 1; t }
    def expect(t: String): Unit = {
      val got = next()
      require(got == t, s"expected '$t', got '$got'")
    }

    var pkg = ""
    // collected raw declarations; type names resolved in a second pass
    val messages = mutable.Map[String, Seq[RawField]]()
    val enums = mutable.Map[String, Seq[(String, Int)]]()

    def parseEnum(scope: String): Unit = {
      val name = next()
      val full = if (scope.isEmpty) name else s"$scope.$name"
      expect("{")
      val values = mutable.Buffer[(String, Int)]()
      while (peek != "}") {
        peek match {
          case "option" | "reserved" => while (next() != ";") {}
          case _ =>
            val vname = next(); expect("="); val num = next().toInt
            expect(";")
            values += (vname -> num)
        }
      }
      expect("}")
      enums(full) = values.toSeq
    }

    def parseMessage(scope: String): Unit = {
      val name = next()
      val full = if (scope.isEmpty) name else s"$scope.$name"
      expect("{")
      val fields = mutable.Buffer[RawField]()
      while (peek != "}") {
        peek match {
          case "message" => next(); parseMessage(full)
          case "enum" => next(); parseEnum(full)
          case "option" | "reserved" => while (next() != ";") {}
          case "group" | "extensions" | "extend" =>
            throw new IllegalArgumentException(s"unsupported proto2 construct: $peek")
          case "oneof" =>
            next(); next(); expect("{")
            while (peek != "}") fields += parseField(oneof = true)
            expect("}")
          case _ => fields += parseField(oneof = false)
        }
      }
      expect("}")
      messages(full) = fields.toSeq

      def parseField(oneof: Boolean): RawField = {
        var repeated = false
        var optional = oneof // oneof members have presence
        peek match {
          case "repeated" => next(); repeated = true
          case "optional" => next(); optional = true
          case _ =>
        }
        if (peek == "map") {
          next(); expect("<")
          val k = next(); expect(","); val v = next(); expect(">")
          val fname = next(); expect("="); val num = next().toInt
          skipOptionsAndSemi()
          RawField(fname, num, v, repeated = false, optional = false,
            mapKey = Some(k), scope = full)
        } else {
          val tname = next()
          val fname = next(); expect("="); val num = next().toInt
          skipOptionsAndSemi()
          RawField(fname, num, tname, repeated, optional, None, full)
        }
      }
      def skipOptionsAndSemi(): Unit = {
        if (peek == "[") { while (next() != "]") {} }
        expect(";")
      }
    }

    while (pos < toks.length) {
      next() match {
        case "syntax" => expect("="); next(); expect(";")
        case "package" => pkg = next(); expect(";")
        case "import" => while (next() != ";") {}
        case "option" => while (next() != ";") {}
        case "message" => parseMessage(pkg)
        case "enum" => parseEnum(pkg)
        case "" =>
        case other => throw new IllegalArgumentException(s"unexpected token: $other")
      }
    }

    // second pass: resolve type names against scopes, enums, messages, WKTs
    def resolve(tname: String, scope: String): PType =
      scalarNames.get(tname) match {
        case Some(s) => s
        case None =>
          val candidates = scopes(scope).map(s => s"$s.$tname") :+ tname
          candidates.collectFirst {
            case c if enums.contains(c) => PEnum(c)
            case c if messages.contains(c) => PMessage(c)
            case c if WellKnown.registry.messages.contains(c) => PMessage(c)
          }.getOrElse(throw new IllegalArgumentException(
            s"unresolved type '$tname' in scope '$scope'"))
      }

    def scopes(scope: String): Seq[String] = {
      // innermost scope outward: a.b.c → [a.b.c, a.b, a]
      val parts = scope.split('.')
      (parts.length to 1 by -1).map(n => parts.take(n).mkString("."))
    }

    val msgDescs = messages.map { case (full, raws) =>
      full -> PMessageDesc(full, raws.map { r =>
        if (r.mapKey.isDefined)
          PField(r.name, r.number, resolve(r.tname, r.scope),
            mapKV = Some((resolve(r.mapKey.get, r.scope), resolve(r.tname, r.scope))))
        else
          PField(r.name, r.number, resolve(r.tname, r.scope),
            repeated = r.repeated, explicitOptional = r.optional)
      })
    }.toMap

    new ProtoRegistry(msgDescs, enums.map { case (k, v) => k -> PEnumDesc(k, v) }.toMap) ++
      WellKnown.registry
  }

  private final case class RawField(name: String, number: Int, tname: String,
      repeated: Boolean, optional: Boolean, mapKey: Option[String], scope: String)

  private def tokenize(src: String): Array[String] = {
    val noComments = src.linesIterator
      .map(l => if (l.contains("//")) l.substring(0, l.indexOf("//")) else l)
      .mkString("\n")
    val out = mutable.Buffer[String]()
    var i = 0
    val s = noComments
    while (i < s.length) {
      val c = s(i)
      if (c.isWhitespace) i += 1
      else if (c == '"') {
        val end = s.indexOf('"', i + 1)
        out += s.substring(i + 1, end); i = end + 1
      } else if ("{}=;<>,[]".contains(c)) { out += c.toString; i += 1 }
      else {
        var j = i
        while (j < s.length && !s(j).isWhitespace && !"{}=;<>,[]\"".contains(s(j))) j += 1
        out += s.substring(i, j); i = j
      }
    }
    out.toArray
  }
}
