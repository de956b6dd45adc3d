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
  * Supported surface (the subset the reference's schemas use):
  * scalar fields (`name Type`), optional `?`, list `[]`, line and
  * trailing `//` comments, field attributes (`@id`, `@default(...)`,
  * `@relation(...)` — ignored), block attributes (`@@map("table")`
  * sets the physical table name; other `@@...` ignored), and
  * relation fields (type = another model name) which are dropped
  * exactly as Prisma's DMMF separates them from the scalar columns.
  * Non-model blocks (`datasource`, `generator`, `enum`) are skipped.
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

  /** One parsed model: Prisma model name, physical table name
    * (`@@map` or the lowercased model name), scalar column schema,
    * and the non-`?` field names. Requiredness is carried separately
    * instead of as `nullable = false` because a Spark parquet scan
    * yields nullable columns regardless — the catalog keeps Spark's
    * convention so a parsed schema is comparable to a scanned one.
    */
  case class Model(name: String, table: String, schema: StructType,
                   required: Seq[String])

  private val ModelBlock = """model\s+(\w+)\s*\{([^}]*)\}""".r
  private val MapAttr = """@@map\(\s*"([^"]+)"\s*\)""".r

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
        scalarTypes.get(base) match {
          case Some(t0) =>
            // native-type attribute: Prisma's @db.Real narrows Float
            // to float32 (the embeddings column convention)
            val t = if (base == "Float" && attrs.contains("@db.Real"))
              FloatType else t0
            val dt = if (isList) ArrayType(t) else t
            Some((StructField(fieldName, dt), !isOptional))
          case None if modelNames.contains(base) =>
            None // relation field — not a physical column (DMMF parity)
          case None => throw new IllegalArgumentException(
            s"model $name: unknown type $base for field $fieldName " +
              s"(not a Prisma scalar or a declared model)")
        }
      }
      Model(name, table, StructType(parsed.map(_._1)),
        parsed.collect { case (f, true) => f.name })
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
