package graft.conv

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.proto._
import graft.proto.PType._

/** Schema-directed cast/normalize — the reference's `cast_table`
  * (SURVEY.md §2 A4, cast_to_proto.py:243-253): reorder an arbitrary
  * DataFrame to descriptor field order, cast each column to the
  * proto-shaped type, fill missing columns with defaults (or nulls for
  * presence fields), and fill null cells of non-presence fields with proto
  * defaults.
  *
  * Everything is pure Column expressions (`cast`/`coalesce`/`transform`/
  * `map_from_arrays`/`when`), so Catalyst analyzes, optimizes, and
  * codegens the whole normalization — no row-level interpreter (mirrors
  * the reference's reliance on vectorized kernels, cast_to_proto.py:71-102).
  */
object CastToProto {

  def castDataFrame(df: DataFrame, md: PMessageDesc, cfg: GraftConfig,
      reg: ProtoRegistry): DataFrame = {
    // derive (and thereby recursion-check) the full target schema up front
    SchemaConversion.messageTypeToSchema(md, cfg, reg)
    val srcType = StructType(df.schema.fields)
    // NOTE: output nullability is Catalyst-inferred, not the derived
    // schema's (Spark can neither cast away containsNull nor prove a
    // maybe-null source non-null — `to(schema)` raises on the tightening
    // direction). Types, names, order and VALUES match cast_table
    // exactly; CastPropertySpec pins that contract modulo nullability.
    df.select(md.fields.map { f =>
      fieldColumn(name => if (srcType.fieldNames.contains(name)) Some(df(name)) else None,
        srcType, f, cfg, reg, Vector(md.fullName)).as(f.name)
    }: _*)
  }

  private def targetType(f: PField, cfg: GraftConfig, reg: ProtoRegistry,
      trace: Vector[String]): DataType =
    SchemaConversion.fieldToDataType(f, cfg, reg, trace)

  /** Cast a single struct column to `md`'s shape (cast_struct_array,
    * cast_to_proto.py:216-240). */
  def castStructColumn(c: Column, srcType: StructType, md: PMessageDesc,
      cfg: GraftConfig, reg: ProtoRegistry): Column = {
    SchemaConversion.messageTypeToSchema(md, cfg, reg) // recursion check
    castValue(c, srcType, PMessage(md.fullName), cfg, reg, Vector.empty)
  }

  /** One descriptor field → output Column (get_casted_array,
    * cast_to_proto.py:166-193): present → cast; absent+presence → nulls;
    * absent+no-presence → default-filled. */
  private def fieldColumn(src: String => Option[Column], srcType: StructType,
      f: PField, cfg: GraftConfig, reg: ProtoRegistry,
      trace: Vector[String]): Column = {
    src(f.name) match {
      case Some(c) =>
        val st = srcType.fields(srcType.fieldNames.indexOf(f.name)).dataType
        castColumn(c, st, f, cfg, reg, trace)
      case None =>
        if (f.hasPresence) lit(null).cast(targetType(f, cfg, reg, trace))
        else defaultColumn(f, cfg, reg, trace)
    }
  }

  /** Default-valued column for an absent non-presence field
    * (get_arrow_default_value, cast_to_proto.py:28-46). */
  private def defaultColumn(f: PField, cfg: GraftConfig, reg: ProtoRegistry,
      trace: Vector[String]): Column = {
    val target = targetType(f, cfg, reg, trace)
    if (f.isMap && !cfg.mapAsList) emptyMap(target)
    else if (f.isMap || f.repeated) array().cast(target)
    else defaultScalar(f.typ, cfg, reg).cast(target)
  }

  private def emptyMap(target: DataType): Column = map().cast(target)

  private def defaultScalar(t: PType, cfg: GraftConfig, reg: ProtoRegistry): Column = t match {
    case PString => lit("")
    case PBytes => lit(Array.emptyByteArray)
    case PBool => lit(false)
    case PDouble => lit(0.0d)
    case PFloat => lit(0.0f)
    case PEnum(name) =>
      if (!cfg.enumType.nameBased) lit(0)
      else {
        val nm = reg.enum(name).numberToName.getOrElse(0, reg.enum(name).firstName)
        if (cfg.enumType.binary) lit(nm.getBytes("UTF-8")) else lit(nm)
      }
    case _ => lit(0L)
  }

  /** Cast a present column to the field's target shape
    * (_cast_array, cast_to_proto.py:105-163). */
  private def castColumn(c: Column, srcType: DataType, f: PField,
      cfg: GraftConfig, reg: ProtoRegistry, trace: Vector[String]): Column = {
    val target = targetType(f, cfg, reg, trace)
    if (f.isMap) castMap(c, srcType, f, target, cfg, reg, trace)
    else if (f.repeated) {
      val elemSrc = srcType match {
        case ArrayType(et, _) => et
        case other => other
      }
      // element-wise cast inside the lambda; no outer cast — Spark cannot
      // cast away containsNull, and the decode contract only needs types
      val casted = transform(c, x => castValue(x, elemSrc, f.typ, cfg, reg, trace))
      val elemTarget = SchemaConversion.typeToDataType(f.typ, cfg, reg, trace)
      if (!cfg.listNullable)
        coalesce(casted, array().cast(ArrayType(elemTarget, containsNull = true)))
      else casted
    } else {
      val casted = castValue(c, srcType, f.typ, cfg, reg, trace)
      // fill_null with the proto default for non-presence fields
      // (cast_to_proto.py:99-102)
      if (!f.hasPresence)
        coalesce(casted.cast(target), defaultScalar(f.typ, cfg, reg).cast(target))
      else casted.cast(target)
    }
  }

  /** Map casts, incl. the list-of-struct ↔ map shape changes
    * (cast_to_proto.py:105-163, _map_as_list_from_arrays). */
  private def castMap(c: Column, srcType: DataType, f: PField, target: DataType,
      cfg: GraftConfig, reg: ProtoRegistry, trace: Vector[String]): Column = {
    val result = (srcType, cfg.mapAsList) match {
      case (MapType(sk, sv, _), false) =>
        map_from_arrays(
          transform(map_keys(c), k => castValue(k, sk, f.mapKey, cfg, reg, trace)),
          transform(map_values(c), v => castValue(v, sv, f.mapValue, cfg, reg, trace)))
      case (MapType(sk, sv, _), true) =>
        transform(map_entries(c), e => struct(
          castValue(e.getField("key"), sk, f.mapKey, cfg, reg, trace).as("key"),
          castValue(e.getField("value"), sv, f.mapValue, cfg, reg, trace).as(cfg.mapValueName)))
      case (ArrayType(st: StructType, _), asList) =>
        val valueName = st.fieldNames.find(_ != "key").getOrElse("value")
        val sk = st.fields(st.fieldNames.indexOf("key")).dataType
        val sv = st.fields(st.fieldNames.indexOf(valueName)).dataType
        if (asList)
          transform(c, e => struct(
            castValue(e.getField("key"), sk, f.mapKey, cfg, reg, trace).as("key"),
            castValue(e.getField(valueName), sv, f.mapValue, cfg, reg, trace).as(cfg.mapValueName)))
        else
          map_from_arrays(
            transform(c, e => castValue(e.getField("key"), sk, f.mapKey, cfg, reg, trace)),
            transform(c, e => castValue(e.getField(valueName), sv, f.mapValue, cfg, reg, trace)))
      case (other, _) =>
        throw new IllegalArgumentException(s"cannot cast $other to map field ${f.name}")
    }
    // relaxed-nullability twins of the target for the typed empties; no
    // outer cast (Spark cannot cast away containsNull)
    val kT = SchemaConversion.typeToDataType(f.mapKey, cfg, reg, trace)
    val vT = SchemaConversion.typeToDataType(f.mapValue, cfg, reg, trace)
    val empty =
      if (cfg.mapAsList)
        array().cast(ArrayType(StructType(Seq(
          StructField("key", kT), StructField(cfg.mapValueName, vT))),
          containsNull = true))
      else map().cast(MapType(kT, vT, valueContainsNull = true))
    if (!cfg.mapNullable) coalesce(result, empty) else result
  }

  /** Scalar/struct/WKT value cast (_cast_flat_array/_cast_to_message_type,
    * cast_to_proto.py:49-102). */
  private def castValue(c: Column, srcType: DataType, t: PType,
      cfg: GraftConfig, reg: ProtoRegistry, trace: Vector[String]): Column = t match {
    case PEnum(name) => castEnum(c, srcType, reg.enum(name), cfg)
    case PMessage(mn) if !WellKnown.isWellKnown(mn) =>
      if (trace.contains(mn)) {
        // recursion: schema derivation pruned this subtree to struct<>
        when(c.isNotNull, struct()).otherwise(lit(null).cast(StructType(Nil)))
      } else {
        val md = reg.message(mn)
        val srcStruct = srcType match {
          case st: StructType => st
          case _ => StructType(Nil)
        }
        val target = SchemaConversion.messageDataType(mn, cfg, reg, trace)
        if (md.fields.isEmpty)
          // empty message: presence is the struct's own nullity
          when(c.isNotNull, struct()).otherwise(lit(null).cast(StructType(Nil)))
        else {
          val children = md.fields.map { f =>
            fieldColumn(
              name => if (srcStruct.fieldNames.contains(name)) Some(c.getField(name)) else None,
              srcStruct, f, cfg, reg, trace :+ mn).as(f.name)
          }
          // preserve the struct-level null mask (cast_struct_array,
          // cast_to_proto.py:216-240)
          when(c.isNull, lit(null).cast(target)).otherwise(struct(children: _*))
        }
      }
    case _ =>
      val target = SchemaConversion.typeToDataType(t, cfg, reg, trace)
      c.cast(target)
  }

  /** Enum re-encode between int / name reprs with the reference's
    * fallbacks (cast_to_proto.py:83-90; proto_to_arrow.py:236-264). */
  private def castEnum(c: Column, srcType: DataType, ed: PEnumDesc,
      cfg: GraftConfig): Column = {
    val srcIsInt = srcType match {
      case IntegerType | LongType | ShortType | ByteType => true
      case _ => false
    }
    // null-preserving: the unknown-value fallbacks (firstName / 0) apply
    // only to PRESENT values — a null cell must stay null here so presence
    // fields keep their unset state (the non-presence default fill happens
    // one layer up in castScalar, like the reference's fill_null)
    def asName(intCol: Column): Column =
      when(intCol.isNull, lit(null).cast(StringType)).otherwise(
        coalesce(element_at(typedlit(ed.numberToName), intCol.cast(IntegerType)),
          lit(ed.firstName)))
    def asNumber(strCol: Column): Column =
      when(strCol.isNull, lit(null).cast(IntegerType)).otherwise(
        coalesce(element_at(typedlit(ed.nameToNumber), strCol), lit(0)))
    if (!cfg.enumType.nameBased) {
      if (srcIsInt) c.cast(IntegerType) else asNumber(c.cast(StringType))
    } else {
      val name = if (srcIsInt) asName(c) else c.cast(StringType)
      if (cfg.enumType.binary) name.cast(BinaryType) else name
    }
  }
}
