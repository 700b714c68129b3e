package graft.sources.proto

import org.apache.spark.sql.types._

/** Minimal proto3 schema model, declared in code and mapped to Spark
  * `StructType`. Plays the role the reference delegates to bufarrow
  * ("use your protobuf message as a type parameter to autogenerate an
  * Arrow schema", /root/reference/README.md:6, main.go:203): schema and
  * field numbers declared once, Spark types derived mechanically.
  *
  * Type mapping follows SURVEY.md §1.3: proto3 scalars decode to their
  * defaults (never null), message fields decode to null structs when
  * absent, repeated fields to empty arrays.
  */
sealed trait PType
case object PString extends PType
case object PInt32 extends PType
case object PInt64 extends PType
case object PFloat extends PType
case object PBool extends PType
final case class PMessage(name: String, fields: Seq[PField]) extends PType {
  lazy val byNumber: Map[Int, (PField, Int)] =
    fields.zipWithIndex.map { case (f, i) => f.number -> (f, i) }.toMap

  /** Field-number → ordinal lookup without Map boxing on the decode hot
    * path: a direct-indexed array when field numbers are dense/small
    * (every real message here; max 30), Map fallback otherwise. -1 =
    * unknown field.
    */
  @transient private lazy val fastIdx: Array[Int] = {
    val maxN = fields.map(_.number).max
    if (maxN <= 256) {
      val a = Array.fill(maxN + 1)(-1)
      fields.zipWithIndex.foreach { case (f, i) => a(f.number) = i }
      a
    } else null
  }

  def ordinalOf(fieldNo: Int): Int =
    if (fastIdx != null) {
      if (fieldNo >= 0 && fieldNo < fastIdx.length) fastIdx(fieldNo) else -1
    } else byNumber.get(fieldNo).map(_._2).getOrElse(-1)
}

final case class PField(number: Int, name: String, t: PType,
                        repeated: Boolean = false)

object ProtoSchema {

  def sparkType(t: PType): DataType = t match {
    case PString        => StringType
    case PInt32         => IntegerType
    case PInt64         => LongType
    case PFloat         => FloatType
    case PBool          => BooleanType
    case m: PMessage    => toStructType(m)
  }

  def toStructType(m: PMessage): StructType =
    StructType(m.fields.map { f =>
      val base = sparkType(f.t)
      val dt = if (f.repeated) ArrayType(base, containsNull = false) else base
      // proto3: scalars always materialize (defaults), messages nullable
      val nullable = f.t.isInstanceOf[PMessage] || f.repeated
      StructField(f.name, dt, nullable)
    })
}
