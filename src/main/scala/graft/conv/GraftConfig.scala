package graft.conv

/** The 15-knob conversion config, mirroring the reference's
  * `ProtarrowConfig` (common.py:47-100) with the same validation rules
  * (common.py:66-87), re-expressed for Spark's type system.
  *
  * Spark collapses the storage-level knobs — `large_*` string/binary/list
  * variants and dictionary-encoded enums have no logical-type distinction
  * in Spark (SURVEY.md §1.4), so they are accepted, validated, and mapped
  * to the same Spark types (documented no-ops). `listValueName` /
  * `mapValueName` exist in Arrow field metadata only; Spark `ArrayType`
  * has no element name, so they surface only in `mapAsList` struct fields.
  */
object GraftConfig {

  sealed trait TimeUnit extends Serializable {
    def nanos: Long
  }
  object TimeUnit {
    case object Seconds extends TimeUnit { val nanos = 1000000000L }
    case object Millis extends TimeUnit { val nanos = 1000000L }
    case object Micros extends TimeUnit { val nanos = 1000L }
    case object Nanos extends TimeUnit { val nanos = 1L }
    val all: Seq[TimeUnit] = Seq(Seconds, Millis, Micros, Nanos)
  }

  /** Enum representation (common.py:11-19,49): int32 number, name as
    * string/binary (plain, large, or dictionary-encoded — the latter two
    * are Spark no-ops). */
  sealed trait EnumRepr extends Serializable {
    /** true when the repr is name-based (string or binary). */
    def nameBased: Boolean = this != EnumRepr.Int32
    def binary: Boolean = this match {
      case EnumRepr.Binary | EnumRepr.LargeBinary | EnumRepr.DictBinary => true
      case _ => false
    }
    def large: Boolean = this match {
      case EnumRepr.LargeString | EnumRepr.LargeBinary => true
      case _ => false
    }
  }
  object EnumRepr {
    case object Int32 extends EnumRepr
    case object StringRepr extends EnumRepr
    case object LargeString extends EnumRepr
    case object Binary extends EnumRepr
    case object LargeBinary extends EnumRepr
    case object DictString extends EnumRepr
    case object DictBinary extends EnumRepr
  }

  sealed trait Width extends Serializable
  object Width {
    case object Normal extends Width
    case object Large extends Width
  }
}

final case class GraftConfig(
    enumType: GraftConfig.EnumRepr = GraftConfig.EnumRepr.Int32,
    timestampUnit: GraftConfig.TimeUnit = GraftConfig.TimeUnit.Nanos,
    timestampTz: String = "UTC",
    timeOfDayUnit: GraftConfig.TimeUnit = GraftConfig.TimeUnit.Nanos,
    durationUnit: GraftConfig.TimeUnit = GraftConfig.TimeUnit.Nanos,
    listNullable: Boolean = false,
    mapNullable: Boolean = false,
    listValueNullable: Boolean = false,
    mapValueNullable: Boolean = false,
    listValueName: String = "item",
    mapValueName: String = "item",
    /** When set, each StructField carries its proto field number under this
      * metadata key (e.g. "PARQUET:field_id" — common.py:89-93). */
    fieldNumberKey: Option[String] = None,
    stringType: GraftConfig.Width = GraftConfig.Width.Normal,
    binaryType: GraftConfig.Width = GraftConfig.Width.Normal,
    listArrayType: GraftConfig.Width = GraftConfig.Width.Normal,
    skipRecursiveMessages: Boolean = false,
    mapAsList: Boolean = false) extends Serializable {

  // Mirrors ProtarrowConfig.__post_init__ (common.py:66-87): a name-based
  // enum repr must agree in width with the configured string/binary type.
  require(!(enumType.nameBased && !enumType.binary && enumType.large != (stringType == GraftConfig.Width.Large)) ||
    enumType == GraftConfig.EnumRepr.DictString,
    s"enum_type width must match string_type ($stringType)")
  require(!(enumType.binary && enumType.large != (binaryType == GraftConfig.Width.Large)) ||
    enumType == GraftConfig.EnumRepr.DictBinary,
    s"enum_type width must match binary_type ($binaryType)")
}
