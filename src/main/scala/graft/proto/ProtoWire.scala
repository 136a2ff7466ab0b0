package graft.proto

import java.io.ByteArrayOutputStream
import graft.proto.PType._

/** Proto3 wire-format codec over the descriptor IR (the public protobuf
  * encoding spec: varint / zigzag / fixed32 / fixed64 / length-delimited;
  * packed repeated scalars; maps as repeated entry messages).
  *
  * Needed because the environment has no protobuf-java (SURVEY.md §7.0);
  * powers `to_proto`/`from_proto` binary parity
  * ([[graft.Protarrow.toProtoBinary]] / fromProtoBinary).
  */
object ProtoWire {

  private final val Varint = 0
  private final val Fixed64 = 1
  private final val Len = 2
  private final val Fixed32 = 5

  private def wireType(t: PType): Int = t match {
    case PDouble | PFixed64 | PSFixed64 => Fixed64
    case PFloat | PFixed32 | PSFixed32 => Fixed32
    case PString | PBytes | PMessage(_) => Len
    case _ => Varint
  }

  private def packable(t: PType): Boolean = t match {
    case PString | PBytes | PMessage(_) => false
    case _ => true
  }

  // ---------------------------------------------------------------- encode

  final class Writer(val out: ByteArrayOutputStream = new ByteArrayOutputStream()) {
    def varint(v: Long): Unit = {
      var x = v
      while ((x & ~0x7FL) != 0) {
        out.write(((x & 0x7F) | 0x80).toInt)
        x = x >>> 7
      }
      out.write(x.toInt)
    }
    def tag(field: Int, wt: Int): Unit = varint((field.toLong << 3) | wt)
    def fixed32(v: Int): Unit = {
      out.write(v & 0xFF); out.write((v >>> 8) & 0xFF)
      out.write((v >>> 16) & 0xFF); out.write((v >>> 24) & 0xFF)
    }
    def fixed64(v: Long): Unit = { fixed32(v.toInt); fixed32((v >>> 32).toInt) }
    def bytes(b: Array[Byte]): Unit = { varint(b.length.toLong); out.write(b) }
  }

  def zigzag32(v: Int): Long = ((v << 1) ^ (v >> 31)).toLong & 0xFFFFFFFFL
  def zigzag64(v: Long): Long = (v << 1) ^ (v >> 63)
  def unzigzag32(v: Long): Int = (((v >>> 1) ^ -(v & 1)).toInt)
  def unzigzag64(v: Long): Long = (v >>> 1) ^ -(v & 1)

  private def writeScalar(w: Writer, t: PType, v: Any, reg: ProtoRegistry): Unit = t match {
    case PDouble => w.fixed64(java.lang.Double.doubleToLongBits(v.asInstanceOf[Double]))
    case PFloat => w.fixed32(java.lang.Float.floatToIntBits(v.asInstanceOf[Float]))
    case PInt32 => w.varint(v.asInstanceOf[Int].toLong) // sign-extended per spec
    case PInt64 => w.varint(v.asInstanceOf[Long])
    case PUInt32 => w.varint(v.asInstanceOf[Long] & 0xFFFFFFFFL)
    case PFixed32 => w.fixed32(v.asInstanceOf[Long].toInt)
    case PUInt64 => w.varint(v.asInstanceOf[Long])
    case PFixed64 => w.fixed64(v.asInstanceOf[Long])
    case PSInt32 => w.varint(zigzag32(v.asInstanceOf[Int]))
    case PSInt64 => w.varint(zigzag64(v.asInstanceOf[Long]))
    case PSFixed32 => w.fixed32(v.asInstanceOf[Int])
    case PSFixed64 => w.fixed64(v.asInstanceOf[Long])
    case PBool => w.varint(if (v.asInstanceOf[Boolean]) 1L else 0L)
    case PString => w.bytes(v.asInstanceOf[String]
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    case PBytes => w.bytes(v.asInstanceOf[Bytes].toArray)
    case PEnum(_) => w.varint(v.asInstanceOf[Int].toLong)
    case PMessage(_) => w.bytes(encode(v.asInstanceOf[DynamicMessage], reg))
  }

  def encode(m: DynamicMessage, reg: ProtoRegistry = WellKnown.registry): Array[Byte] = {
    val w = new Writer()
    // ascending field number: canonical, deterministic output (order is
    // precomputed on the descriptor — encode runs per row per nested
    // message on the toProtoBinary hot path)
    m.descriptor.fieldsByNumberAsc.foreach { f =>
      m.get(f.number).foreach { v =>
        if (f.isMap) {
          v.asInstanceOf[Map[Any, Any]].foreach { case (k, mv) =>
            // both entry fields are ALWAYS serialized, defaults included —
            // protobuf-java/C++ map-entry serialization does the same, so
            // byte-for-byte parity holds for maps like {0 -> 0}
            val entry = new Writer()
            entry.tag(1, wireType(f.mapKey)); writeScalar(entry, f.mapKey, k, reg)
            entry.tag(2, wireType(f.mapValue)); writeScalar(entry, f.mapValue, mv, reg)
            w.tag(f.number, Len); w.bytes(entry.out.toByteArray)
          }
        } else if (f.repeated) {
          val xs = v.asInstanceOf[Vector[Any]]
          if (packable(f.typ)) {
            // proto3 default: packed
            val payload = new Writer()
            xs.foreach(x => writeScalar(payload, f.typ, x, reg))
            w.tag(f.number, Len); w.bytes(payload.out.toByteArray)
          } else xs.foreach { x =>
            w.tag(f.number, wireType(f.typ)); writeScalar(w, f.typ, x, reg)
          }
        } else {
          w.tag(f.number, wireType(f.typ)); writeScalar(w, f.typ, v, reg)
        }
      }
    }
    w.out.toByteArray
  }

  // ---------------------------------------------------------------- decode

  /** Bounds-checked reader: every read is confined to [pos, end). Corrupt
    * input (a truncated record off Kafka, a length prefix pointing past the
    * payload) must raise a clear, catchable error — the previous unchecked
    * reads silently zero-padded truncated bytes (Arrays.copyOfRange pads)
    * and let a nested message with an oversized length prefix parse its
    * PARENT's adjacent bytes as its own fields. */
  final class Reader(buf: Array[Byte], var pos: Int, val end: Int) {
    def this(buf: Array[Byte]) = this(buf, 0, buf.length)
    def hasMore: Boolean = pos < end
    // n > end - pos, NOT pos + n > end: the latter wraps for n near
    // Int.MaxValue and lets a corrupt length prefix fabricate an empty
    // nested message before crashing with an unrelated exception
    private def need(n: Int): Unit =
      if (n < 0 || n > end - pos) throw new IllegalArgumentException(
        s"truncated message: need $n bytes at offset $pos, end $end")
    // length prefixes are read as Long then range-checked BEFORE toInt:
    // a corrupt 64-bit length like 2^32+5 would otherwise truncate to 5
    // and silently misparse
    private def lenPrefix(): Int = {
      val len = varint()
      if (len < 0 || len > Int.MaxValue) throw new IllegalArgumentException(
        s"bad length prefix $len at offset $pos")
      len.toInt
    }
    def varint(): Long = {
      var shift = 0; var result = 0L
      while (shift < 64) {
        need(1)
        val b = buf(pos); pos += 1
        result |= (b & 0x7FL) << shift
        if ((b & 0x80) == 0) return result
        shift += 7
      }
      throw new IllegalArgumentException("malformed varint")
    }
    def fixed32(): Int = {
      need(4)
      val v = (buf(pos) & 0xFF) | ((buf(pos + 1) & 0xFF) << 8) |
        ((buf(pos + 2) & 0xFF) << 16) | ((buf(pos + 3) & 0xFF) << 24)
      pos += 4; v
    }
    def fixed64(): Long =
      (fixed32().toLong & 0xFFFFFFFFL) | (fixed32().toLong << 32)
    def bytes(): Array[Byte] = {
      val len = lenPrefix()
      need(len)
      val b = java.util.Arrays.copyOfRange(buf, pos, pos + len)
      pos += len; b
    }
    def slice(): Reader = {
      val len = lenPrefix()
      need(len)
      val r = new Reader(buf, pos, pos + len)
      pos += len; r
    }
    def skip(wt: Int): Unit = wt match {
      case Varint => varint(); ()
      case Fixed64 => need(8); pos += 8
      case Fixed32 => need(4); pos += 4
      case Len => val len = lenPrefix(); need(len); pos += len
      case other => throw new IllegalArgumentException(s"bad wire type $other")
    }
  }

  private def readScalar(r: Reader, t: PType, reg: ProtoRegistry,
      depth: Int): Any = t match {
    case PDouble => java.lang.Double.longBitsToDouble(r.fixed64())
    case PFloat => java.lang.Float.intBitsToFloat(r.fixed32())
    case PInt32 => r.varint().toInt
    case PInt64 => r.varint()
    case PUInt32 => r.varint() & 0xFFFFFFFFL
    case PUInt64 => r.varint()
    case PSInt32 => unzigzag32(r.varint())
    case PSInt64 => unzigzag64(r.varint())
    case PFixed32 => r.fixed32().toLong & 0xFFFFFFFFL
    case PFixed64 => r.fixed64()
    case PSFixed32 => r.fixed32()
    case PSFixed64 => r.fixed64()
    case PBool => r.varint() != 0L
    case PString => new String(r.bytes(), java.nio.charset.StandardCharsets.UTF_8)
    case PBytes => Bytes.owned(r.bytes())
    case PEnum(_) => r.varint().toInt
    case PMessage(name) => decodeReader(r.slice(), reg.message(name), reg, depth + 1)
  }

  /** Nesting cap on decode, matching protobuf-java's default: a crafted
    * deeply-recursive payload must raise, not blow the executor's stack. */
  val MaxDecodeDepth = 100

  def decode(bytes: Array[Byte], md: PMessageDesc,
      reg: ProtoRegistry = WellKnown.registry): DynamicMessage =
    decodeReader(new Reader(bytes), md, reg, 0)

  /** proto merge semantics for repeated occurrences of a singular message
    * field: scalars last-win, nested singular messages merge recursively,
    * repeated/map fields concatenate (a conformant encoder may emit a
    * message field twice — e.g. the standard concatenate-two-partials
    * merge idiom — and the parse result must be their merge). */
  private def mergeMessages(a: DynamicMessage, b: DynamicMessage): DynamicMessage = {
    val md = a.descriptor
    val merged = b.values.foldLeft(a.values) { case (acc, (num, bv)) =>
      val nv = (md.byNumber.get(num), acc.get(num)) match {
        case (Some(f), Some(av)) =>
          if (f.isMap) av.asInstanceOf[Map[Any, Any]] ++ bv.asInstanceOf[Map[Any, Any]]
          else if (f.repeated) av.asInstanceOf[Vector[Any]] ++ bv.asInstanceOf[Vector[Any]]
          else f.typ match {
            case PMessage(_) => mergeMessages(av.asInstanceOf[DynamicMessage],
              bv.asInstanceOf[DynamicMessage])
            case _ => bv
          }
        case _ => bv
      }
      acc.updated(num, nv)
    }
    DynamicMessage(md, merged)
  }

  /** Does the tag's wire type match what the descriptor declares? A
    * mismatch (schema evolution, corrupt tag) means the payload is NOT the
    * declared field — protobuf-java treats it as an unknown field and
    * skips it rather than misparsing the bytes. Packed repeated scalars
    * legitimately arrive as either Len (packed) or their scalar wire type
    * (unpacked), so both are accepted. */
  private def wireTypeMatches(f: PField, wt: Int): Boolean =
    if (f.isMap) wt == Len
    else if (f.repeated && packable(f.typ)) wt == Len || wt == wireType(f.typ)
    else wt == wireType(f.typ)

  private def decodeReader(r: Reader, md: PMessageDesc, reg: ProtoRegistry,
      depth: Int): DynamicMessage = {
    if (depth > MaxDecodeDepth) throw new IllegalArgumentException(
      s"message nesting exceeds $MaxDecodeDepth levels")
    var values = Map.empty[Int, Any]
    while (r.hasMore) {
      val t = r.varint()
      val num = (t >>> 3).toInt
      val wt = (t & 7).toInt
      md.byNumber.get(num) match {
        case None => r.skip(wt) // unknown field
        case Some(f) if !wireTypeMatches(f, wt) => r.skip(wt) // wrong wire type → unknown
        case Some(f) if f.isMap =>
          val er = r.slice()
          var k: Any = PType.defaultOf(f.mapKey)
          var v: Any = f.mapValue match {
            case PMessage(name) => DynamicMessage.empty(reg.message(name))
            case mt => PType.defaultOf(mt)
          }
          while (er.hasMore) {
            val et = er.varint()
            (et >>> 3).toInt match {
              case 1 => k = readScalar(er, f.mapKey, reg, depth)
              case 2 => v = readScalar(er, f.mapValue, reg, depth)
              case _ => er.skip((et & 7).toInt)
            }
          }
          val prev = values.getOrElse(num, Map.empty[Any, Any]).asInstanceOf[Map[Any, Any]]
          values += (num -> (prev + (k -> v)))
        case Some(f) if f.repeated =>
          val prev = values.getOrElse(num, Vector.empty[Any]).asInstanceOf[Vector[Any]]
          if (wt == Len && packable(f.typ)) {
            val pr = r.slice()
            var xs = prev
            while (pr.hasMore) xs = xs :+ readScalar(pr, f.typ, reg, depth)
            values += (num -> xs)
          } else values += (num -> (prev :+ readScalar(r, f.typ, reg, depth)))
        case Some(f) =>
          val v = readScalar(r, f.typ, reg, depth)
          val merged = (f.typ, values.get(num)) match {
            case (PMessage(_), Some(prev: DynamicMessage)) =>
              mergeMessages(prev, v.asInstanceOf[DynamicMessage])
            case _ => v
          }
          values += (num -> merged)
      }
    }
    DynamicMessage(md, values)
  }
}
