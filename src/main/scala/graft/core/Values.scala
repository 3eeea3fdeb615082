package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Node value model: a closed sum of RDF-ish term kinds mirroring the
  * reference's `quad.Value` (full enumeration visible in
  * /root/reference/graph/graphtest/graphtest.go:800-810 and constructors in
  * /root/reference/query/gizmo/environ.go:244-256).
  *
  * Storage representation is a flat, sparse struct
  * `(kind, s, i, d, b, t, lang, dt)` — columnar-friendly: Parquet
  * dictionary-encodes the string column and min/max row-group stats work per
  * field. Node identity (the reference's `refs.ValueHash`,
  * /root/reference/graph/refs/refs.go:55-70) is a 64-bit content hash of the
  * struct fields, computed identically on the driver (for literal
  * resolution — the `Lookup`/`Resolver` analog) and in distributed column
  * expressions (for dictionary builds), so resolving a literal to its node
  * id is pure local computation: no dictionary round-trip at plan time.
  */
sealed trait QValue extends Product with Serializable {
  def kind: Int

  /** The reference's `quad.Value.String()` form — used for `Sort` ordering
    * (see /root/reference/graph/iterator/sort.go getSortedValues) and
    * display. IRIs render as `<iri>`, plain strings unquoted.
    */
  def sortKey: String

  /** Unambiguous N-Quads-style term used when serializing. */
  def nquads: String
}

object Kind {
  val Iri = 1
  val BNode = 2
  val Str = 3
  val LangStr = 4
  val TypedStr = 5
  val IntK = 6
  val FloatK = 7
  val BoolK = 8
  val TimeK = 9

  val all: Seq[Int] =
    Seq(Iri, BNode, Str, LangStr, TypedStr, IntK, FloatK, BoolK, TimeK)
}

object QValue {
  final case class Iri(v: String) extends QValue {
    def kind = Kind.Iri
    def sortKey = "<" + v + ">"
    def nquads = "<" + v + ">"
  }
  final case class BNode(v: String) extends QValue {
    def kind = Kind.BNode
    def sortKey = "_:" + v
    def nquads = "_:" + v
  }
  final case class Str(v: String) extends QValue {
    def kind = Kind.Str
    def sortKey = v
    def nquads = "\"" + NQuadEscape.escape(v) + "\""
  }
  final case class LangStr(v: String, lang: String) extends QValue {
    def kind = Kind.LangStr
    def sortKey = v + "@" + lang
    def nquads = "\"" + NQuadEscape.escape(v) + "\"@" + lang
  }
  final case class TypedStr(v: String, dtype: String) extends QValue {
    def kind = Kind.TypedStr
    def sortKey = v + "^^<" + dtype + ">"
    def nquads = "\"" + NQuadEscape.escape(v) + "\"^^<" + dtype + ">"
  }
  final case class IntV(v: Long) extends QValue {
    def kind = Kind.IntK
    def sortKey = v.toString
    def nquads =
      "\"" + v + "\"^^<http://www.w3.org/2001/XMLSchema#integer>"
  }
  final case class FloatV(v: Double) extends QValue {
    def kind = Kind.FloatK
    def sortKey = v.toString
    def nquads = "\"" + v + "\"^^<http://www.w3.org/2001/XMLSchema#double>"
  }
  final case class BoolV(v: Boolean) extends QValue {
    def kind = Kind.BoolK
    def sortKey = v.toString
    def nquads = "\"" + v + "\"^^<http://www.w3.org/2001/XMLSchema#boolean>"
  }
  /** Timestamp as epoch microseconds, UTC. */
  final case class TimeV(micros: Long) extends QValue {
    def kind = Kind.TimeK
    def sortKey = TimeV.iso(micros)
    def nquads =
      "\"" + TimeV.iso(micros) + "\"^^<http://www.w3.org/2001/XMLSchema#dateTime>"
  }
  object TimeV {
    def iso(micros: Long): String = {
      val inst = java.time.Instant.EPOCH.plus(micros, java.time.temporal.ChronoUnit.MICROS)
      java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")
        .withZone(java.time.ZoneOffset.UTC)
        .format(inst)
    }
  }

  /** The node id (the `Ref`): Spark-`xxhash64`-compatible content hash over
    * the non-null storage fields, in schema order. Must stay in lockstep
    * with [[Values.idCol]]; the `XXH64ParitySpec` test pins this.
    */
  def id(v: QValue): Long = {
    var h = 42L
    v match {
      case Iri(s) =>
        h = XXH64.hashInt(Kind.Iri, h); h = XXH64.hashString(s, h)
      case BNode(s) =>
        h = XXH64.hashInt(Kind.BNode, h); h = XXH64.hashString(s, h)
      case Str(s) =>
        h = XXH64.hashInt(Kind.Str, h); h = XXH64.hashString(s, h)
      case LangStr(s, l) =>
        h = XXH64.hashInt(Kind.LangStr, h); h = XXH64.hashString(s, h)
        h = XXH64.hashString(l, h)
      case TypedStr(s, dt) =>
        h = XXH64.hashInt(Kind.TypedStr, h); h = XXH64.hashString(s, h)
        h = XXH64.hashString(dt, h)
      case IntV(i) =>
        h = XXH64.hashInt(Kind.IntK, h); h = XXH64.hashLong(i, h)
      case FloatV(d) =>
        h = XXH64.hashInt(Kind.FloatK, h)
        val dd = if (d == -0.0d) 0.0d else d
        h = XXH64.hashLong(java.lang.Double.doubleToLongBits(dd), h)
      case BoolV(b) =>
        h = XXH64.hashInt(Kind.BoolK, h); h = XXH64.hashInt(if (b) 1 else 0, h)
      case TimeV(m) =>
        h = XXH64.hashInt(Kind.TimeK, h); h = XXH64.hashLong(m, h)
    }
    h
  }

  /** Build from a flat storage row (inverse of the struct encoding). */
  def fromFields(kind: Int, s: String, i: java.lang.Long, d: java.lang.Double,
                 b: java.lang.Boolean, t: java.lang.Long, lang: String,
                 dt: String): QValue = kind match {
    case Kind.Iri      => Iri(s)
    case Kind.BNode    => BNode(s)
    case Kind.Str      => Str(s)
    case Kind.LangStr  => LangStr(s, lang)
    case Kind.TypedStr => TypedStr(s, dt)
    case Kind.IntK     => IntV(i)
    case Kind.FloatK   => FloatV(d)
    case Kind.BoolK    => BoolV(b)
    case Kind.TimeK    => TimeV(t)
    case k => throw new IllegalArgumentException(s"unknown value kind $k")
  }
}

object NQuadEscape {
  def escape(s: String): String = {
    val b = new StringBuilder(s.length + 8)
    s.foreach {
      case '\\' => b.append("\\\\")
      case '"'  => b.append("\\\"")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c    => b.append(c)
    }
    b.toString
  }

  def unescape(s: String): String = {
    val b = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n'  => b.append('\n'); i += 2
          case 'r'  => b.append('\r'); i += 2
          case 't'  => b.append('\t'); i += 2
          case '\\' => b.append('\\'); i += 2
          case '"'  => b.append('"'); i += 2
          case '\'' => b.append('\''); i += 2
          case 'u' =>
            b.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
            i += 6
          case 'U' =>
            b.appendAll(Character.toChars(Integer.parseInt(s.substring(i + 2, i + 10), 16)))
            i += 10
          case other => b.append(other); i += 2
        }
      } else { b.append(c); i += 1 }
    }
    b.toString
  }
}

/** Flat value row used with Spark Encoders (nullable fields boxed). */
final case class QV(kind: Int, s: String, i: java.lang.Long,
                    d: java.lang.Double, b: java.lang.Boolean,
                    t: java.lang.Long, lang: String, dt: String)

object QV {
  def apply(v: QValue): QV = v match {
    case QValue.Iri(s)          => QV(Kind.Iri, s, null, null, null, null, null, null)
    case QValue.BNode(s)        => QV(Kind.BNode, s, null, null, null, null, null, null)
    case QValue.Str(s)          => QV(Kind.Str, s, null, null, null, null, null, null)
    case QValue.LangStr(s, l)   => QV(Kind.LangStr, s, null, null, null, null, l, null)
    case QValue.TypedStr(s, dt) => QV(Kind.TypedStr, s, null, null, null, null, null, dt)
    case QValue.IntV(i)         => QV(Kind.IntK, null, i, null, null, null, null, null)
    case QValue.FloatV(d)       => QV(Kind.FloatK, null, null, d, null, null, null, null)
    case QValue.BoolV(b)        => QV(Kind.BoolK, null, null, null, b, null, null, null)
    case QValue.TimeV(m)        => QV(Kind.TimeK, null, null, null, null, m, null, null)
  }

  def toQValue(r: QV): QValue =
    QValue.fromFields(r.kind, r.s, r.i, r.d, r.b, r.t, r.lang, r.dt)
}

/** Column-side helpers over the flat value fields. */
object Values {
  val fieldNames: Seq[String] = Seq("kind", "s", "i", "d", "b", "t", "lang", "dt")

  /** Node id of a value struct column — Spark's builtin xxhash64 over the
    * fields in schema order (codegen'd; no UDF in any hot path).
    */
  def idCol(v: Column): Column =
    xxhash64(v.getField("kind"), v.getField("s"), v.getField("i"),
      v.getField("d"), v.getField("b"), v.getField("t"),
      v.getField("lang"), v.getField("dt"))

  def idColOfFields(prefix: String => Column): Column =
    xxhash64(fieldNames.map(prefix): _*)

  /** `quad.Value.String()` rendering as a column over flat fields — used by
    * Sort (reference sorts by value string form, sort.go) and collation.
    */
  def sortKeyCol(f: String => Column): Column = {
    val k = f("kind")
    when(k === Kind.Iri, concat(lit("<"), f("s"), lit(">")))
      .when(k === Kind.BNode, concat(lit("_:"), f("s")))
      .when(k === Kind.Str, f("s"))
      .when(k === Kind.LangStr, concat(f("s"), lit("@"), f("lang")))
      .when(k === Kind.TypedStr, concat(f("s"), lit("^^<"), f("dt"), lit(">")))
      .when(k === Kind.IntK, f("i").cast(StringType))
      .when(k === Kind.FloatK, f("d").cast(StringType))
      .when(k === Kind.BoolK, f("b").cast(StringType))
      .when(k === Kind.TimeK,
        date_format((f("t").cast(DoubleType) / 1000000.0d).cast(TimestampType),
          "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"))
  }

  val structType: StructType = StructType(Seq(
    StructField("kind", IntegerType, nullable = false),
    StructField("s", StringType), StructField("i", LongType),
    StructField("d", DoubleType), StructField("b", BooleanType),
    StructField("t", LongType), StructField("lang", StringType),
    StructField("dt", StringType)))
}
