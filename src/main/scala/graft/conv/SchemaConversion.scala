package graft.conv

import org.apache.spark.sql.types._
import graft.proto._
import graft.proto.PType._

/** Schema derivation: proto descriptor → Spark StructType (SURVEY.md §2
  * A1, mirroring proto_to_arrow.py:716-741, 267-383).
  *
  * The schema is a pure function of (descriptor, config) — never inferred
  * from data; an empty input still yields the full schema
  * (tests/test_conversion.py:110-116).
  *
  * Type policy (SURVEY.md §7.0):
  *  - Timestamp → TimestampType (µs): ns configs truncate at encode, the
  *    same truncation the reference's tests apply per configured unit.
  *  - TimeOfDay / Duration → LongType ticks in the configured unit
  *    (lossless for all four units, incl. nanos).
  *  - Date → DateType with the year-0 sentinel (epoch day -719163).
  *  - uint32/fixed32 → LongType (value-preserving); uint64/fixed64 →
  *    LongType (bit-preserving two's complement round trip).
  *  - Wrappers → nullable primitive; Empty → StructType(Nil).
  */
object SchemaConversion {

  /** Epoch day of the reference's unset-date sentinel: one day before
    * 0001-01-01 (common.py:9, docs/types.md:79-84). */
  val DateSentinelEpochDay: Long = -719163L

  def messageTypeToSchema(md: PMessageDesc, cfg: GraftConfig, reg: ProtoRegistry): StructType =
    StructType(md.fields.map(f => fieldToStructField(f, cfg, reg, Vector(md.fullName))))

  /** Identical shape — Spark has no schema/struct distinction
    * (proto_to_arrow.py:730-741). */
  def messageTypeToStructType(md: PMessageDesc, cfg: GraftConfig, reg: ProtoRegistry): StructType =
    messageTypeToSchema(md, cfg, reg)

  def fieldToStructField(f: PField, cfg: GraftConfig, reg: ProtoRegistry,
      trace: Vector[String]): StructField = {
    val metadata = cfg.fieldNumberKey match {
      case Some(key) =>
        new MetadataBuilder().putLong(key, f.number.toLong).build()
      case None => Metadata.empty
    }
    StructField(f.name, fieldToDataType(f, cfg, reg, trace),
      nullable = fieldNullable(f, cfg), metadata = metadata)
  }

  /** Nullability rule (_proto_field_nullable, proto_to_arrow.py:593-601). */
  def fieldNullable(f: PField, cfg: GraftConfig): Boolean =
    if (f.isMap) cfg.mapNullable
    else if (f.repeated) cfg.listNullable
    else f.hasPresence

  def fieldToDataType(f: PField, cfg: GraftConfig, reg: ProtoRegistry,
      trace: Vector[String]): DataType =
    if (f.isMap) {
      val valueType = typeToDataType(f.mapValue, cfg, reg, trace)
      if (cfg.mapAsList)
        ArrayType(StructType(Seq(
          StructField("key", typeToDataType(f.mapKey, cfg, reg, trace), nullable = false),
          StructField(cfg.mapValueName, valueType, nullable = cfg.mapValueNullable))),
          containsNull = false)
      else
        MapType(typeToDataType(f.mapKey, cfg, reg, trace), valueType,
          valueContainsNull = cfg.mapValueNullable)
    } else if (f.repeated)
      ArrayType(typeToDataType(f.typ, cfg, reg, trace),
        containsNull = cfg.listValueNullable)
    else typeToDataType(f.typ, cfg, reg, trace)

  def typeToDataType(t: PType, cfg: GraftConfig, reg: ProtoRegistry,
      trace: Vector[String]): DataType = t match {
    case PDouble => DoubleType
    case PFloat => FloatType
    case PInt32 | PSInt32 | PSFixed32 => IntegerType
    case PInt64 | PSInt64 | PSFixed64 => LongType
    case PUInt32 | PFixed32 => LongType
    case PUInt64 | PFixed64 => LongType
    case PBool => BooleanType
    case PString => StringType
    case PBytes => BinaryType
    case PEnum(_) =>
      if (!cfg.enumType.nameBased) IntegerType
      else if (cfg.enumType.binary) BinaryType
      else StringType
    case PMessage(name) => messageDataType(name, cfg, reg, trace)
  }

  /** WKT shortcuts + nested-struct recursion
    * (_message_field_to_data_type, proto_to_arrow.py:326-354). */
  def messageDataType(fullName: String, cfg: GraftConfig, reg: ProtoRegistry,
      trace: Vector[String]): DataType = fullName match {
    case WellKnown.TimestampName => TimestampType
    case WellKnown.DateName => DateType
    case WellKnown.TimeOfDayName => LongType
    case WellKnown.DurationName => LongType
    case WellKnown.EmptyName => StructType(Nil)
    case n if WellKnown.isWrapper(n) =>
      typeToDataType(WellKnown.wrapperNames(n), cfg, reg, trace)
    case n =>
      if (trace.contains(n)) {
        if (cfg.skipRecursiveMessages) StructType(Nil) // prune (proto_to_arrow.py:341-345)
        else throw new IllegalArgumentException(
          s"Cannot convert recursive message: ${(trace :+ n).mkString(" -> ")}")
      } else {
        // the reference's unsupported-kind fallthrough (proto_to_arrow.py:
        // 378-383, "Unsupported field type TYPE_GROUP for foo"): the sealed
        // PType ADT makes a TYPE_GROUP literally unrepresentable here (the
        // parser rejects `group` at parse time), so the reachable analog is
        // a field whose type name resolves to no known message — reject
        // loudly with the descriptor trace, never a bare key-miss.
        val md = reg.messages.getOrElse(n, throw new IllegalArgumentException(
          s"Unsupported field type: unknown message type $n" +
            s" (at ${(trace :+ n).mkString(" -> ")})"))
        StructType(md.fields.map(f => fieldToStructField(f, cfg, reg, trace :+ n)))
      }
  }
}
