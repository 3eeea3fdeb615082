package graft.core

import org.apache.spark.sql.{DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Typed object ↔ quad mapping — the reference's `schema` package
  * (/root/reference/schema/schema.go:58-108: Go structs ↔ quads via
  * reflection and `quad:"pred"` tags). Here the Encoder's schema plays the
  * role of reflection: each case-class field becomes a predicate, each row
  * a subject with an rdf:type quad; `fromQuads` pivots back to a
  * `Dataset[T]`.
  */
object SchemaMapper {
  private val RdfType = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

  /** Dataset[T] → quad-struct DataFrame (feed to Graph.fromQuadDF /
    * addQuads). Subject IRI = `<typeIri>:<idField>`; every field f emits
    * `(subj, <f>, value)`; plus `(subj, rdf:type, <typeIri>)`.
    */
  def toQuads[T](ds: Dataset[T], typeIri: String, idField: String): DataFrame = {
    val df = ds.toDF()
    val attrs = Graph.quadifyTable(df, typeIri, idField)
    def iri(c: org.apache.spark.sql.Column) = struct(
      lit(Kind.Iri).as("kind"), c.as("s"), lit(null).cast(LongType).as("i"),
      lit(null).cast(DoubleType).as("d"), lit(null).cast(BooleanType).as("b"),
      lit(null).cast(LongType).as("t"), lit(null).cast(StringType).as("lang"),
      lit(null).cast(StringType).as("dt"))
    val typeQuads = df.select(
      iri(concat(lit(typeIri + ":"), col(idField).cast(StringType))).as("sub"),
      iri(lit(RdfType)).as("pred"), iri(lit(typeIri)).as("obj"),
      lit(null).cast(Values.structType).as("lbl"))
    attrs.unionAll(typeQuads)
  }

  /** Graph → Dataset[T]: select subjects of rdf:type `typeIri`, join one
    * predicate per target field, cast to the encoder's schema. Field
    * `idField` parses back from the subject IRI.
    */
  def fromQuads[T: Encoder](g: Graph, typeIri: String, idField: String): Dataset[T] = {
    val enc = implicitly[Encoder[T]]
    val schema = enc.schema
    val typeId = QValue.id(QValue.Iri(typeIri))
    val typePredId = QValue.id(QValue.Iri(RdfType))
    val subjects = g.quads
      .where(col("p") === typePredId && col("o") === typeId)
      .select(col("s").as("__subj")).distinct()

    def payloadFor(dt: DataType): org.apache.spark.sql.Column = dt match {
      case StringType => col("s")
      case LongType | IntegerType | ShortType => col("i")
      case DoubleType | FloatType => col("d")
      case BooleanType => col("b")
      case TimestampType =>
        ((col("t").cast(DoubleType)) / 1000000.0d).cast(TimestampType)
      case other =>
        throw new IllegalArgumentException(s"unsupported field type $other")
    }

    var cur = subjects
    schema.fields.filter(_.name != idField).zipWithIndex.foreach { case (f, i) =>
      val predId = QValue.id(QValue.Iri(f.name))
      val vals = g.quads.where(col("p") === lit(predId))
        .select(col("s").as(s"__s$i"), col("o").as(s"__o$i"))
      val dict = g.nodes.select(col("id").as(s"__d$i"),
        payloadFor(f.dataType).cast(f.dataType).as(f.name))
      cur = cur
        .join(vals, col("__subj") === col(s"__s$i"), "left")
        .join(dict, col(s"__o$i") === col(s"__d$i"), "left")
        .drop(s"__s$i", s"__o$i", s"__d$i")
    }
    // id field from the subject IRI suffix
    val idType = schema(idField).dataType
    val subjDict = g.nodes
      .where(col("kind") === Kind.Iri && col("s").startsWith(typeIri + ":"))
      .select(col("id").as("__sd"),
        regexp_replace(col("s"),
          "^" + java.util.regex.Pattern.quote(typeIri + ":"), "")
          .cast(idType).as(idField))
    cur = cur.join(subjDict, col("__subj") === col("__sd"), "left")
      .drop("__subj", "__sd")
    cur.select(schema.fieldNames.toIndexedSeq.map(col): _*).as[T]
  }
}
