package graft

import org.apache.spark.sql.types._

/** Schema-text catalog (S2): a Prisma-style `model` block parsed into
  * the `StructType` registry, completing the reference's
  * schema-drives-the-pipeline design (`src/migrate.ts:19-30` loads
  * `schema.prisma`, `getDMMF` derives the model list, and that list —
  * not code — decides what the migrate loop copies). Here the same
  * schema text yields both the table list and the Spark schemas, so
  * pointing the pipeline at a new table set means editing a schema
  * string, not Scala.
  *
  * Supported surface (DMMF-parity for the constructs the reference's
  * schemas can carry): scalar fields (`name Type`), optional `?`,
  * list `[]`, line and trailing `//` comments, `enum` blocks (an
  * enum-typed field is a String column whose allowed values the
  * catalog records, Prisma's text storage convention), field
  * attributes (`@id`; `@default(...)` captured per field and
  * applicable on the write path via
  * [[graft.operators.WritePath.applyDefaults]]; `@relation(fields:
  * [...], references: [...])` captured as foreign-key metadata),
  * block attributes (`@@map("table")` sets the physical table name;
  * other `@@...` ignored), and relation fields (type = another model
  * name) which are dropped from the physical columns exactly as
  * Prisma's DMMF separates them from the scalars. Non-model blocks
  * (`datasource`, `generator`) are skipped.
  */
object SchemaCatalog {

  /** Prisma scalar → Spark type. Decimal maps to the house
    * DECIMAL(18,6); Json stays a string column (the reference's JSON
    * columns are written with JSON.stringify — Reshape.scala's q18
    * convention).
    */
  private val scalarTypes: Map[String, DataType] = Map(
    "String" -> StringType,
    "Boolean" -> BooleanType,
    "Int" -> IntegerType,
    "BigInt" -> LongType,
    "Float" -> DoubleType,
    "Decimal" -> DecimalType(18, 6),
    "DateTime" -> TimestampType,
    "Json" -> StringType,
    "Bytes" -> BinaryType)

  /** A parsed `@relation` foreign key: the (dropped) relation field's
    * name, the related model, and the fk/referenced column lists.
    */
  case class Relation(field: String, related: String,
                      fkFields: Seq[String], refFields: Seq[String])

  /** One parsed model: Prisma model name, physical table name
    * (`@@map` or the lowercased model name), scalar column schema,
    * the non-`?` field names, per-field `@default` expressions (raw
    * Prisma text — `now()`, literals, enum values), declared
    * relations, and enum-typed fields with their allowed values.
    * Requiredness is carried separately instead of as
    * `nullable = false` because a Spark parquet scan yields nullable
    * columns regardless — the catalog keeps Spark's convention so a
    * parsed schema is comparable to a scanned one.
    */
  case class Model(name: String, table: String, schema: StructType,
                   required: Seq[String],
                   defaults: Map[String, String] = Map.empty,
                   relations: Seq[Relation] = Nil,
                   enumFields: Map[String, Seq[String]] = Map.empty)

  private val ModelBlock = """model\s+(\w+)\s*\{([^}]*)\}""".r
  private val EnumBlock = """enum\s+(\w+)\s*\{([^}]*)\}""".r
  private val MapAttr = """@@map\(\s*"([^"]+)"\s*\)""".r
  // one nesting level: @default(now()), @default(dbgenerated("..."))
  private val DefaultAttr = """@default\(((?:[^()]|\([^()]*\))*)\)""".r
  private val RelationAttr = """@relation\(([^)]*)\)""".r
  private val FieldsList = """fields:\s*\[([^\]]*)\]""".r
  private val RefsList = """references:\s*\[([^\]]*)\]""".r

  /** Parse every `model` block, in declaration order (the reference's
    * `getModels` order is the migrate order).
    */
  def parseModels(schemaText: String): Seq[Model] = {
    val noComments = schemaText.linesIterator
      .map(l => l.indexOf("//") match {
        case -1 => l
        case i  => l.substring(0, i)
      })
      .mkString("\n")
    val enums = EnumBlock.findAllMatchIn(noComments).map { m =>
      // one value per line; a value may carry @map("...") — the
      // Prisma-side name (the first token) is the stored text
      m.group(1) -> m.group(2).linesIterator.map(_.trim)
        .filter(l => l.nonEmpty && !l.startsWith("@@"))
        .map(_.split("\\s+")(0)).toSeq
    }.toMap
    val models = ModelBlock.findAllMatchIn(noComments).map { m =>
      (m.group(1), m.group(2))
    }.toSeq
    val modelNames = models.map(_._1).toSet
    models.map { case (name, body) =>
      val lines = body.linesIterator.map(_.trim).filter(_.nonEmpty).toSeq
      val table = lines.collectFirst {
        case l if l.startsWith("@@map") =>
          MapAttr.findFirstMatchIn(l).map(_.group(1)).getOrElse(
            throw new IllegalArgumentException(
              s"model $name: unparseable $l"))
      }.getOrElse(name.toLowerCase)
      var defaults = Map.empty[String, String]
      var relations = Seq.empty[Relation]
      var enumFields = Map.empty[String, Seq[String]]
      val parsed = lines.filterNot(_.startsWith("@@")).flatMap { line =>
        val toks = line.split("\\s+")
        if (toks.length < 2) throw new IllegalArgumentException(
          s"model $name: field line needs 'name Type': $line")
        val fieldName = toks(0)
        val rawType = toks(1)
        val attrs = toks.drop(2)
        val isList = rawType.endsWith("[]")
        val isOptional = rawType.endsWith("?")
        val base = rawType.stripSuffix("[]").stripSuffix("?")
        DefaultAttr.findFirstMatchIn(line).foreach { d =>
          defaults += fieldName -> d.group(1).trim
        }
        def scalarField(t0: DataType): Option[(StructField, Boolean)] = {
          // native-type attribute: Prisma's @db.Real narrows Float
          // to float32 (the embeddings column convention)
          val t = if (base == "Float" && attrs.contains("@db.Real"))
            FloatType else t0
          val dt = if (isList) ArrayType(t) else t
          Some((StructField(fieldName, dt), !isOptional))
        }
        scalarTypes.get(base) match {
          case Some(t0) => scalarField(t0)
          case None if enums.contains(base) =>
            // enum column: stored as text (Prisma's convention); the
            // allowed values ride along for write-path validation
            enumFields += fieldName -> enums(base)
            scalarField(StringType)
          case None if modelNames.contains(base) =>
            // relation field — not a physical column (DMMF parity);
            // capture the fk metadata if the @relation spells it out
            RelationAttr.findFirstMatchIn(line).foreach { r =>
              def names(re: scala.util.matching.Regex): Seq[String] =
                re.findFirstMatchIn(r.group(1)).toSeq.flatMap(
                  _.group(1).split(",").map(_.trim).filter(_.nonEmpty))
              relations :+= Relation(fieldName, base,
                names(FieldsList), names(RefsList))
            }
            None
          case None => throw new IllegalArgumentException(
            s"model $name: unknown type $base for field $fieldName " +
              s"(not a Prisma scalar, enum, or declared model)")
        }
      }
      Model(name, table, StructType(parsed.map(_._1)),
        parsed.collect { case (f, true) => f.name },
        defaults, relations, enumFields)
    }
  }

  /** Physical-table catalog from a schema text — the drop-in
    * replacement for the hand-declared [[Tables.schemas]] registry.
    */
  def parse(schemaText: String): Map[String, StructType] =
    parseModels(schemaText).map(m => m.table -> m.schema).toMap

  /** Migrate order: physical table names in declaration order
    * (reference `getModels`, `migrate.ts:27-30`).
    */
  def tableNames(schemaText: String): Seq[String] =
    parseModels(schemaText).map(_.table)

  /** The driver test-table catalog restated AS a schema text — parsing
    * it must reproduce [[Tables.schemas]] (asserted in SourcesSpec),
    * which keeps the two catalog forms from drifting.
    */
  val testdataSchema: String =
    """// graft test-table catalog (TESTDATA.md) as a Prisma datamodel
      |datasource db {
      |  provider = "postgresql"
      |  url      = env("DATABASE_URL")
      |}
      |
      |model Region {
      |  r_regionkey Int    @id
      |  r_name      String
      |  @@map("region")
      |}
      |model Nation {
      |  n_nationkey Int    @id
      |  n_name      String
      |  n_regionkey Int
      |  @@map("nation")
      |}
      |model Customer {
      |  c_custkey    BigInt @id
      |  c_name       String
      |  c_nationkey  Int
      |  c_acctbal    Float
      |  c_mktsegment String
      |  @@map("customer")
      |}
      |model Supplier {
      |  s_suppkey   BigInt @id
      |  s_name      String
      |  s_nationkey Int
      |  s_acctbal   Float
      |  @@map("supplier")
      |}
      |model Part {
      |  p_partkey     BigInt @id
      |  p_name        String
      |  p_brand       String
      |  p_type        String
      |  p_size        Int
      |  p_retailprice Float
      |  @@map("part")
      |}
      |model Orders {
      |  o_orderkey      BigInt   @id
      |  o_custkey       BigInt
      |  o_orderstatus   String
      |  o_totalprice    Float
      |  o_orderdate     DateTime
      |  o_orderpriority String
      |  @@map("orders")
      |}
      |model Lineitem {
      |  l_orderkey      BigInt
      |  l_partkey       BigInt
      |  l_suppkey       BigInt
      |  l_linenumber    Int
      |  l_quantity      Float
      |  l_extendedprice Float
      |  l_discount      Float
      |  l_tax           Float
      |  l_returnflag    String
      |  l_linestatus    String
      |  l_shipdate      DateTime
      |  @@map("lineitem")
      |}
      |model Events {
      |  event_id   BigInt   @id
      |  ts         DateTime
      |  user_id    BigInt
      |  event_type String
      |  value      Float
      |  props      String
      |  @@map("events")
      |}
      |model Documents {
      |  doc_id  BigInt @id
      |  text    String
      |  lang    String
      |  source  String
      |  n_chars BigInt
      |  @@map("documents")
      |}
      |model Embeddings {
      |  vec_id    BigInt  @id
      |  embedding Float[] @db.Real
      |  label     Int
      |  @@map("embeddings")
      |}
      |""".stripMargin
}
