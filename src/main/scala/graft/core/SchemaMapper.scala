package graft.core

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Namespace registry — the reference's `voc` prefix table used by the
  * schema package (/root/reference/schema/namespaces.go): short forms like
  * `rdf:type` expand to full IRIs on save and load.
  */
object Namespaces {
  private val prefixes = scala.collection.concurrent.TrieMap[String, String](
    "rdf:" -> "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs:" -> "http://www.w3.org/2000/01/rdf-schema#",
    "schema:" -> "http://schema.org/",
    "xsd:" -> "http://www.w3.org/2001/XMLSchema#")

  def register(prefix: String, full: String): Unit = prefixes.put(prefix, full)

  def expand(s: String): String = {
    val c = s.indexOf(':')
    if (c <= 0) s
    else prefixes.get(s.substring(0, c + 1)) match {
      case Some(full) => full + s.substring(c + 1)
      case None       => s
    }
  }
}

/** Per-field mapping rule — the `quad:"..."` tag analog
  * (/root/reference/schema/schema.go:130-200). Defaults: predicate = the
  * field name, forward direction, required-ness from the Encoder schema's
  * nullability (Option[...] and Seq[...] fields are optional, plain
  * primitives required — the loader's `,optional`/`,required` markers).
  *
  * @param pred       predicate IRI (namespace-expanded); null = field name
  * @param reverse    store/load the quad in the reverse direction
  *                   (`child --pred--> parent`); struct-valued fields only
  * @param required   override the nullability-derived required flag
  * @param nestedType rdf:type IRI written for nested-object values; also
  *                   the IRI prefix when `nestedId` names their id field
  * @param nestedId   field inside a nested struct holding its identity;
  *                   absent = anonymous children (deterministic BNodes)
  */
final case class FieldRule(pred: String = null, reverse: Boolean = false,
                           required: Option[Boolean] = None,
                           nestedType: String = null, nestedId: String = null)

/** Type-level rules: per-field overrides (keys are dotted field paths for
  * nesting, e.g. `"children.name"`) plus fixed (predicate, value)
  * constraints every instance carries — the reference's
  * `quad:"rdf:type > some:item"` marker fields (schema.go:86-92).
  */
final case class SchemaRules(fields: Map[String, FieldRule] = Map.empty,
                             constraints: Seq[(String, QValue)] = Nil) {
  def fieldRule(path: String): FieldRule =
    fields.getOrElse(path, FieldRule())
}

/** Typed object ↔ quad mapping — the reference's `schema` package
  * (/root/reference/schema/schema.go:58-108, writer.go, loader.go: Go
  * structs ↔ quads via reflection and `quad:` tags). The Spark Encoder's
  * schema plays reflection's role: scalar fields become value quads,
  * nested struct fields become linked child objects (with their own
  * rdf:type and identity, or deterministic BNodes when anonymous), array
  * fields become one quad per element, and nullability drives the
  * loader's optional-vs-required join semantics. Everything is
  * DataFrame-native: saves are a single staged explode per nesting level,
  * loads are per-predicate equi-joins the optimizer reorders freely.
  */
object SchemaMapper {
  private val RdfType = Namespaces.expand("rdf:type")

  // ---------------------------------------------------------------- common
  private def qv(kind: Int, s: Column = lit(null).cast(StringType),
                 i: Column = lit(null).cast(LongType),
                 d: Column = lit(null).cast(DoubleType),
                 b: Column = lit(null).cast(BooleanType),
                 t: Column = lit(null).cast(LongType)): Column =
    struct(lit(kind).as("kind"), s.as("s"), i.as("i"), d.as("d"), b.as("b"),
      t.as("t"), lit(null).cast(StringType).as("lang"),
      lit(null).cast(StringType).as("dt"))

  private def iriV(c: Column): Column = qv(Kind.Iri, s = c)

  private def scalarValue(c: Column, dt: DataType): Column = dt match {
    case StringType => qv(Kind.Str, s = c)
    case LongType | IntegerType | ShortType => qv(Kind.IntK, i = c.cast(LongType))
    case DoubleType | FloatType => qv(Kind.FloatK, d = c.cast(DoubleType))
    case BooleanType => qv(Kind.BoolK, b = c)
    case TimestampType => qv(Kind.TimeK, t = unix_micros(c))
    case DateType => qv(Kind.TimeK, t = unix_micros(c.cast(TimestampType)))
    case other =>
      throw new IllegalArgumentException(s"unsupported scalar type $other")
  }

  private def isScalar(dt: DataType): Boolean = dt match {
    case StringType | LongType | IntegerType | ShortType | DoubleType |
         FloatType | BooleanType | TimestampType | DateType => true
    case _ => false
  }

  // ----------------------------------------------------------------- write
  /** Dataset[T] → quad-struct DataFrame (feed to Graph.fromQuadDF /
    * addQuads). Subject IRI = `<typeIri>:<idField>`; every field emits its
    * rule's predicate; plus `(subj, rdf:type, <typeIri>)` and any
    * constraint quads. Nested structs / arrays-of-struct link to child
    * objects written recursively (writer.go's writeAsQuads).
    */
  def toQuads[T](ds: Dataset[T], typeIri: String, idField: String,
                 rules: SchemaRules = SchemaRules()): DataFrame = {
    val df = ds.toDF()
    val subj = iriV(concat(lit(Namespaces.expand(typeIri) + ":"),
      col(idField).cast(StringType)))
    // quads are a SET (the reference store dedups on ApplyDeltas): a child
    // object shared by many parents is emitted once per parent above, so
    // dedup here — otherwise shared-child attribute quads multiply loads
    emitLevel(df.select(col("*"), subj.as("__subj")),
      Namespaces.expand(typeIri), Some(idField), rules, "")
      .dropDuplicates()
  }

  /** One nesting level over a DataFrame that already carries its subject
    * in `__subj`: a staged single-scan explode for the scalar and
    * constraint quads, plus recursive emits for struct/array children.
    * Internal `__`-prefixed columns are never treated as fields.
    */
  private def emitLevel(staged: DataFrame, typeIri: String,
                        idField: Option[String], rules: SchemaRules,
                        path: String): DataFrame = {
    val fields = staged.schema.fields.toSeq.filterNot(_.name.startsWith("__"))
    def rule(f: String): FieldRule =
      rules.fieldRule(if (path.isEmpty) f else s"$path.$f")
    def predOf(f: String): String = {
      val r = rule(f)
      Namespaces.expand(if (r.pred == null) f else r.pred)
    }

    def mkQuad(sub: Column, pred: String, obj: Column): Column =
      struct(sub.as("sub"), iriV(lit(pred)).as("pred"), obj.as("obj"),
        lit(null).cast(Values.structType).as("lbl"))

    // scalar + fixed quads in ONE explode scan (quadifyTable's pattern)
    val fixed: Seq[Column] =
      (if (typeIri != null)
        Seq(mkQuad(col("__subj"), RdfType, iriV(lit(typeIri))))
      else Nil) ++
        (if (path.isEmpty) rules.constraints.map { case (p, v) =>
          mkQuad(col("__subj"), Namespaces.expand(p), litQV(v))
        } else Nil)
    val scalarQuads = fields
      .filter(f => !idField.contains(f.name) && isScalar(f.dataType))
      .map { f =>
        val r = rule(f.name)
        if (r.reverse) throw new IllegalArgumentException(
          s"reverse rule on scalar field ${f.name}: only object-valued " +
            "fields can be stored in the reverse direction")
        when(col(f.name).isNotNull,
          mkQuad(col("__subj"), predOf(f.name),
            scalarValue(col(f.name), f.dataType)))
      }
    val arrScalarQuads = fields.collect {
      case f@StructField(_, ArrayType(et, _), _, _)
        if !idField.contains(f.name) && isScalar(et) => f
    }.map { f => // one quad per element (slice fields, schema.go:208)
      val staged2 = staged.where(col(f.name).isNotNull)
        .select(col("__subj"), explode(col(f.name)).as("__e"))
      staged2.where(col("__e").isNotNull).select(
        col("__subj").as("sub"),
        iriV(lit(predOf(f.name))).as("pred"),
        scalarValue(col("__e"),
          f.dataType.asInstanceOf[ArrayType].elementType).as("obj"),
        lit(null).cast(Values.structType).as("lbl"))
    }
    val base =
      if (fixed.isEmpty && scalarQuads.isEmpty) Nil
      else Seq(staged
        .select(explode(array((fixed ++ scalarQuads): _*)).as("q"))
        .where(col("q").isNotNull)
        .select(col("q.sub").as("sub"), col("q.pred").as("pred"),
          col("q.obj").as("obj"), col("q.lbl").as("lbl")))

    // nested objects: link quad + recursive emit per child level
    def childSubj(f: StructField, elem: Column, pos: Column): Column = {
      val r = rule(f.name)
      if (r.nestedId != null) {
        val prefix =
          if (r.nestedType != null) Namespaces.expand(r.nestedType)
          else predOf(f.name)
        iriV(concat(lit(prefix + ":"),
          elem.getField(r.nestedId).cast(StringType)))
      } else {
        // anonymous child: deterministic BNode from parent identity,
        // predicate, and element position (loader.go's genObject analog)
        qv(Kind.BNode, s = concat(lit("sb"),
          hex(xxhash64(col("__subj").getField("s"), lit(predOf(f.name)),
            pos))))
      }
    }
    def emitChild(f: StructField, childDf: DataFrame): DataFrame = {
      val r = rule(f.name)
      val childPath = if (path.isEmpty) f.name else s"$path.${f.name}"
      emitLevel(childDf.select(col("__csub").as("__subj"), col("__e.*")),
        if (r.nestedType != null) Namespaces.expand(r.nestedType) else null,
        Option(r.nestedId), rules, childPath)
    }
    val structQuads = fields.flatMap { f =>
      f.dataType match {
        case _: StructType if !idField.contains(f.name) =>
          val r = rule(f.name)
          val withChild = staged.where(col(f.name).isNotNull)
            .select(col("__subj"), col(f.name).as("__e"),
              lit(0L).as("__pos"))
            .withColumn("__csub", childSubj(f, col("__e"), col("__pos")))
          val link = withChild.select(
            (if (r.reverse) col("__csub") else col("__subj")).as("sub"),
            iriV(lit(predOf(f.name))).as("pred"),
            (if (r.reverse) col("__subj") else col("__csub")).as("obj"),
            lit(null).cast(Values.structType).as("lbl"))
          Seq(link, emitChild(f, withChild))
        case ArrayType(_: StructType, _) if !idField.contains(f.name) =>
          val r = rule(f.name)
          val withChild = staged.where(col(f.name).isNotNull)
            .select(col("__subj"),
              posexplode(col(f.name)).as(Seq("__pos", "__e")))
            .where(col("__e").isNotNull)
            .withColumn("__csub",
              childSubj(f, col("__e"), col("__pos").cast(LongType)))
          val link = withChild.select(
            (if (r.reverse) col("__csub") else col("__subj")).as("sub"),
            iriV(lit(predOf(f.name))).as("pred"),
            (if (r.reverse) col("__subj") else col("__csub")).as("obj"),
            lit(null).cast(Values.structType).as("lbl"))
          Seq(link, emitChild(f, withChild))
        case _ => Nil
      }
    }
    (base ++ arrScalarQuads ++ structQuads).reduce(_ unionAll _)
  }

  private def litQV(v: QValue): Column = v match {
    case QValue.Iri(s)    => qv(Kind.Iri, s = lit(s))
    case QValue.BNode(s)  => qv(Kind.BNode, s = lit(s))
    case QValue.Str(s)    => qv(Kind.Str, s = lit(s))
    case QValue.IntV(i)   => qv(Kind.IntK, i = lit(i))
    case QValue.FloatV(d) => qv(Kind.FloatK, d = lit(d))
    case QValue.BoolV(b)  => qv(Kind.BoolK, b = lit(b))
    case QValue.TimeV(t)  => qv(Kind.TimeK, t = lit(t))
    case other =>
      throw new IllegalArgumentException(s"unsupported constraint value $other")
  }

  // ------------------------------------------------------------------ read
  /** Graph → Dataset[T] — the loader (loader.go:92-140) as joins: subjects
    * constrained by rdf:type (and any rule constraints), then one
    * per-predicate join per field. Required fields (non-nullable in the
    * Encoder schema, or `FieldRule.required = Some(true)`) inner-join —
    * objects missing them are skipped, the loader's required semantics;
    * optional fields left-join. Nested struct fields load their child
    * objects recursively and assemble struct columns; array fields
    * collect_list per subject (unordered, as quads are).
    */
  def fromQuads[T: Encoder](g: Graph, typeIri: String, idField: String,
                            rules: SchemaRules = SchemaRules()): Dataset[T] = {
    val enc = implicitly[Encoder[T]]
    val schema = enc.schema
    val full = Namespaces.expand(typeIri)
    var subjects = g.quads
      .where(col("p") === QValue.id(QValue.Iri(RdfType)) &&
        col("o") === QValue.id(QValue.Iri(full)))
      .select(col("s").as("__subj")).distinct()
    rules.constraints.foreach { case (p, v) =>
      val hits = g.quads
        .where(col("p") === QValue.id(QValue.Iri(Namespaces.expand(p))) &&
          col("o") === QValue.id(v))
        .select(col("s").as("__c")).distinct()
      subjects = subjects.join(hits, col("__subj") === col("__c"), "left_semi")
    }
    val loaded =
      loadLevel(g, subjects, schema, Some(idField), Some(full), rules, "")
    loaded.select(schema.fieldNames.toIndexedSeq.map(col): _*).as[T]
  }

  /** The reference's LoadPathTo (schema/loader.go:123-126): load typed
    * objects whose ROOTS are a Path's result set instead of every
    * instance of the type — iterator-restricted loading over the same
    * per-level join machinery, so the restriction is pushed into the
    * first subject set (no full-type scan, then filter).
    */
  def fromPath[T: Encoder](g: Graph, p: graft.path.Path, typeIri: String,
                           idField: String,
                           rules: SchemaRules = SchemaRules()): Dataset[T] = {
    val enc = implicitly[Encoder[T]]
    val schema = enc.schema
    val full = Namespaces.expand(typeIri)
    val subjects = graft.exec.Exec.run(g, p).df
      .select(col("id").as("__subj")).distinct()
    val loaded =
      loadLevel(g, subjects, schema, Some(idField), Some(full), rules, "")
    loaded.select(schema.fieldNames.toIndexedSeq.map(col): _*).as[T]
  }

  /** Load one nesting level: returns `__subj` + one column per field. */
  private def loadLevel(g: Graph, subjects: DataFrame, schema: StructType,
                        idField: Option[String], typePrefix: Option[String],
                        rules: SchemaRules, path: String): DataFrame = {
    var cur = subjects
    var n = 0
    def rule(f: String): FieldRule =
      rules.fieldRule(if (path.isEmpty) f else s"$path.$f")
    def predIdOf(f: String): Long = {
      val r = rule(f)
      QValue.id(QValue.Iri(Namespaces.expand(if (r.pred == null) f else r.pred)))
    }
    def requiredOf(f: StructField): Boolean =
      rule(f.name).required.getOrElse(!f.nullable)

    def payloadFor(dt: DataType): Column = dt match {
      case StringType => col("s")
      case LongType | IntegerType | ShortType => col("i")
      case DoubleType | FloatType => col("d")
      case BooleanType => col("b")
      case TimestampType =>
        ((col("t").cast(DoubleType)) / 1000000.0d).cast(TimestampType)
      case other =>
        throw new IllegalArgumentException(s"unsupported field type $other")
    }

    /** (parent `__p`, child node id `__o`) pairs for an object-valued
      * field, honoring the reverse direction.
      */
    def links(f: String): DataFrame = {
      val r = rule(f)
      val q = g.quads.where(col("p") === lit(predIdOf(f)))
      if (r.reverse) q.select(col("o").as("__p"), col("s").as("__o"))
      else q.select(col("s").as("__p"), col("o").as("__o"))
    }

    /** Recursively loaded child objects for field f: `__subj` + columns. */
    def childObjects(f: StructField, childSchema: StructType): DataFrame = {
      val r = rule(f.name)
      // prune to children of THIS type's subjects before recursing — other
      // types sharing the predicate must not inflate the child load
      val childSubjects = links(f.name)
        .join(subjects.select(col("__subj").as("__pp")),
          col("__p") === col("__pp"), "left_semi")
        .select(col("__o").as("__subj")).distinct()
      val childPath = if (path.isEmpty) f.name else s"$path.${f.name}"
      val childPrefix =
        if (r.nestedId == null) None
        else Some(
          if (r.nestedType != null) Namespaces.expand(r.nestedType)
          else Namespaces.expand(if (r.pred == null) f.name else r.pred))
      loadLevel(g, childSubjects, childSchema, Option(r.nestedId),
        childPrefix, rules, childPath)
    }

    schema.fields.filterNot(f => idField.contains(f.name)).foreach { f =>
      n += 1
      val how = if (requiredOf(f)) "inner" else "left"
      f.dataType match {
        case st: StructType => // nested object → struct column
          val child = childObjects(f, st)
          val withParent = links(f.name)
            .join(child, col("__o") === child("__subj"))
            .select(col("__p").as(s"__lp$n"),
              struct(st.fieldNames.toIndexedSeq.map(col): _*).as(f.name))
          cur = cur.join(withParent, col("__subj") === col(s"__lp$n"), how)
            .drop(s"__lp$n")
        case ArrayType(st: StructType, _) => // array of objects
          val child = childObjects(f, st)
          val grouped = links(f.name)
            .join(child, col("__o") === child("__subj"))
            .groupBy(col("__p").as(s"__lp$n"))
            .agg(collect_list(
              struct(st.fieldNames.toIndexedSeq.map(col): _*)).as(f.name))
          cur = cur.join(grouped, col("__subj") === col(s"__lp$n"), how)
            .drop(s"__lp$n")
          if (how == "left") // absent → empty, not null (Go zero slice)
            cur = cur.withColumn(f.name,
              coalesce(col(f.name), array().cast(f.dataType)))
        case ArrayType(et, _) if isScalar(et) => // multi-valued scalars
          val vals = g.quads.where(col("p") === lit(predIdOf(f.name)))
            .select(col("s").as(s"__s$n"), col("o").as(s"__o$n"))
          val dict = g.nodes.select(col("id").as(s"__d$n"),
            payloadFor(et).cast(et).as("__v"))
          val grouped = vals
            .join(dict, col(s"__o$n") === col(s"__d$n"))
            .groupBy(col(s"__s$n"))
            .agg(collect_list(col("__v")).as(f.name))
          cur = cur.join(grouped, col("__subj") === col(s"__s$n"), how)
            .drop(s"__s$n")
          if (how == "left")
            cur = cur.withColumn(f.name,
              coalesce(col(f.name), array().cast(f.dataType)))
        case dt if isScalar(dt) =>
          // Non-slice fields load ONE value per subject (loader.go keeps a
          // single object per subject for scalar fields); a subject with
          // several quads for this predicate would otherwise fan out one
          // loaded object per value. min(o) makes the survivor
          // deterministic (node ids are content hashes).
          val vals = g.quads.where(col("p") === lit(predIdOf(f.name)))
            .groupBy(col("s").as(s"__s$n"))
            .agg(min(col("o")).as(s"__o$n"))
          val dict = g.nodes.select(col("id").as(s"__d$n"),
            payloadFor(dt).cast(dt).as(f.name))
          cur = cur
            .join(vals, col("__subj") === col(s"__s$n"), how)
            .join(dict, col(s"__o$n") === col(s"__d$n"),
              if (how == "inner") "inner" else "left")
            .drop(s"__s$n", s"__o$n", s"__d$n")
        case other =>
          throw new IllegalArgumentException(
            s"unsupported field type $other for ${f.name}")
      }
    }
    // identity: parse back from the subject IRI suffix when named
    idField.foreach { idf =>
      val idType = schema(idf).dataType
      val prefix = typePrefix.getOrElse(
        throw new IllegalArgumentException(
          s"id field $idf requires a type/prefix"))
      val subjDict = g.nodes
        .where(col("kind") === Kind.Iri && col("s").startsWith(prefix + ":"))
        .select(col("id").as("__sd"),
          regexp_replace(col("s"),
            "^" + java.util.regex.Pattern.quote(prefix + ":"), "")
            .cast(idType).as(idf))
      cur = cur.join(subjDict, col("__subj") === col("__sd"), "left")
        .drop("__sd")
    }
    cur
  }
}
