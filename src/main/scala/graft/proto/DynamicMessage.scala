package graft.proto

/** A protobuf message value over the descriptor IR, with proto3
  * default/presence semantics baked into equality.
  *
  * Canonical value types per field kind:
  *  - int32/sint32/sfixed32 → Int; int64/sint64/sfixed64 → Long
  *  - uint32/fixed32 → Long (value-preserving, 0..2^32-1)
  *  - uint64/fixed64 → Long (bit-preserving two's complement)
  *  - float → Float, double → Double, bool → Boolean, string → String
  *  - bytes → [[Bytes]], enum → Int (raw number, unknown values preserved)
  *  - message → DynamicMessage (well-known types included)
  *  - repeated → Vector[Any]; map → Map[Any, Any]
  *
  * Normalization (applied by [[DynamicMessage.apply]]) makes `==`
  * structural under proto3 rules: plain scalar fields equal to their
  * default are dropped (absent ⇔ default, no presence), empty repeated/map
  * fields are dropped, presence fields (optional / message / wrapper) are
  * kept even when default-valued. This mirrors protobuf message equality
  * that the reference's round-trip tests rely on
  * (tests/test_conversion.py:127-134).
  */
final case class DynamicMessage private (
    descriptor: PMessageDesc,
    values: Map[Int, Any]) extends Serializable {

  def has(number: Int): Boolean = values.contains(number)
  def get(number: Int): Option[Any] = values.get(number)

  /** Value or proto3 default (plain fields read as defaults when absent). */
  def getOrDefault(f: PField): Any =
    values.getOrElse(f.number, DynamicMessage.defaultFor(f))

  def set(f: PField, v: Any): DynamicMessage =
    DynamicMessage(descriptor, values.updated(f.number, v))

  override def toString: String =
    s"${descriptor.name}(${values.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString(", ")})"
}

object DynamicMessage {

  def empty(descriptor: PMessageDesc): DynamicMessage =
    new DynamicMessage(descriptor, Map.empty)

  /** Build with normalization (drop absent-equivalent entries). */
  def apply(descriptor: PMessageDesc, values: Map[Int, Any]): DynamicMessage = {
    val kept = values.filter { case (num, v) =>
      descriptor.byNumber.get(num) match {
        case None => false // unknown field: drop
        case Some(f) =>
          if (f.repeated || f.isMap) v match {
            case s: Iterable[_] => s.nonEmpty
            case m: collection.Map[_, _] => m.nonEmpty
            case _ => true
          }
          else if (f.hasPresence) true
          else v != PType.defaultOf(f.typ) // plain scalar: default ⇔ absent
      }
    }
    new DynamicMessage(descriptor, kept)
  }

  def defaultFor(f: PField): Any =
    if (f.isMap) Map.empty[Any, Any]
    else if (f.repeated) Vector.empty[Any]
    else f.typ match {
      case PType.PMessage(_) => null // singular message default: unset
      case t => PType.defaultOf(t)
    }
}
