package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Skew, TableWriters}
import graft.sources.{Http, Jdbc}

/** HTTP retry kernel, JDBC config plumbing, salted-join equivalence,
  * and the reference's typed-writer conflict specs.
  */
class SourcesSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("http: success on first try, 404 no-retry, 429 retried to cap") {
    var calls = 0
    val flaky: String => (Int, String) = {
      case "ok" => (200, "body")
      case "gone" => calls += 1; (404, "")
      case "busy" => calls += 1; (429, "")
      case u => (500, u)
    }
    assert(Http.fetchWithRetry(flaky, "ok") === Http.FetchResult("ok", 200, Some("body"), 1))
    calls = 0
    assert(Http.fetchWithRetry(flaky, "gone").attempts === 1) // 404: no retry
    calls = 0
    val busy = Http.fetchWithRetry(flaky, "busy")
    assert(busy.attempts === 3 && busy.body.isEmpty && calls === 3) // retried to cap
  }

  test("http: distributed fetch over a URL dataset") {
    val urls = Seq("ok", "busy", "ok").toDS()
    val got = Http.fetchAll(urls, () => {
      case "ok" => (200, "b")
      case _ => (503, "")
    }).collect().sortBy(_.url)
    assert(got.count(_.status == 200) === 2)
    assert(got.find(_.url == "busy").get.attempts === 3)
  }

  test("jdbc: env config fail-fast (reference E5)") {
    val cfg = Jdbc.configFromEnv("SRC", Map("SRC_DB_URL" -> "jdbc:x", "SRC_DB_USER" -> "u"))
    assert(cfg.url === "jdbc:x" && cfg.user === "u")
    intercept[IllegalArgumentException](Jdbc.configFromEnv("DEST", Map.empty))
  }

  test("salted join equals plain join") {
    val fact = Seq((1, 10L, "x"), (1, 11L, "y"), (2, 12L, "z"), (1, 13L, "w"))
      .toDF("k", "id", "payload")
    val dim = Seq((1, "one"), (2, "two"), (3, "three")).toDF("k", "name")
    val plain = fact.join(dim, "k").select("id", "name")
      .as[(Long, String)].collect().sorted.toSeq
    val salted = Skew.saltedJoin(fact, dim, "k", 4, col("id"))
      .select("id", "name").as[(Long, String)].collect().sorted.toSeq
    assert(salted === plain)
  }

  test("AQE splits the skewed partition of a sort-merge join at runtime") {
    // the engine's stated skew posture is salting for aggs + AQE for
    // SMJ skew; prove the AQE half actually fires: one hot key big
    // enough to cross the (lowered) skew thresholds, broadcast off so
    // the join stays sort-merge, then the FINAL adaptive plan must
    // mark the join skew=true
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "20KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "20KB")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // hot key: 3/4 of all rows land on k = 0
      val fact = spark.range(60000).select(
        when(col("id") % 4 =!= 0, lit(0L)).otherwise(col("id") % 1000).as("k"),
        col("id").as("v"))
      val dim = spark.range(2000).select(col("id").as("k"), (col("id") * 2).as("w"))
      val joined = fact.join(dim, "k")
      // collect() executes THIS df's plan (count() would wrap a new
      // aggregate plan and leave joined's adaptive plan unexecuted)
      assert(joined.collect().nonEmpty)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"))
      assert(plan.contains("skew=true"), s"no skew split in final plan:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("two-level aggregation equals direct aggregation") {
    val df = Seq.tabulate(100)(i => (i % 3, i.toLong)).toDF("k", "v")
    val direct = df.groupBy($"k").agg(sum($"v").as("s"), count(lit(1)).as("n"))
      .as[(Int, Long, Long)].collect().sortBy(_._1).toSeq
    val twoLevel = Skew.twoLevelAgg(df, "k", col("v"), 8,
      partialAgg = Seq(sum($"v").as("ps"), count(lit(1)).as("pn")),
      finalAgg = Seq(sum($"ps").as("s"), sum($"pn").as("n")))
      .as[(Int, Long, Long)].collect().sortBy(_._1).toSeq
    assert(twoLevel === direct)
  }

  test("typed writer specs: upsert tables update, history PK tables insert-ignore") {
    val existing = Seq(("d1", "Old", 1L)).toDF("handle", "name", "updatedAt")
    val incoming = Seq(("d1", "New", 2L), ("d2", "Fresh", 2L))
      .toDF("handle", "name", "updatedAt").withColumn("__v", lit(1))
    val dev = TableWriters.write("Developer", existing, incoming, "__v")
      .as[(String, String, Long)].collect().sortBy(_._1).toSeq
    assert(dev === Seq(("d1", "New", 2L), ("d2", "Fresh", 2L)))

    // RecommendedAppHistory: PK covers all columns -> conflict keeps existing
    val hist = Seq(("a", "r", 1, 10L)).toDF("appHandle", "recommendedAppHandle", "position", "capturedAt")
    val histIn = Seq(("a", "r", 1, 10L), ("a", "r", 2, 10L))
      .toDF("appHandle", "recommendedAppHandle", "position", "capturedAt")
      .withColumn("__v", lit(1))
    val out = TableWriters.write("RecommendedAppHistory", hist, histIn, "__v")
    assert(out.count() === 2) // (a,r,1,10) kept once + (a,r,2,10) appended
  }

  test("orc: lossless roundtrip and predicate pushdown to the scan") {
    val src = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val dir = java.nio.file.Files.createTempDirectory("graft-orc").toString + "/docs"
    src.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    // roundtrip: exact same rows (ORC preserves the declared types)
    assert(back.count() === src.count())
    assert(back.exceptAll(src).count() === 0 && src.exceptAll(back).count() === 0)
    // pushdown: the filter must reach the ORC scan, not sit in a
    // post-scan Filter only (same audit as the parquet PushedFilters
    // checks in PlansSpec)
    val plan = back.filter(col("doc_id") < 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") && plan.contains("LessThan(doc_id,10)"),
      s"no ORC pushdown in:\n$plan")
  }

  test("parquet footer-aggregate pushdown: count/min/max answered from metadata") {
    // scan-free statistics (the q70 profile's cheap path for
    // min/max/count): with aggregate pushdown on, parquet answers
    // whole-file aggregates from footer stats without materializing
    // rows — the plan shows PushedAggregation instead of a full scan
    val prev = spark.conf.getOption("spark.sql.parquet.aggregatePushdown")
    val prevV1 = spark.conf.getOption("spark.sql.sources.useV1SourceList")
    spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    // aggregate pushdown lives in the DSv2 scan builder; the default
    // useV1SourceList routes parquet through the v1 FileScan
    spark.conf.set("spark.sql.sources.useV1SourceList", "")
    try {
      val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("mn"),
          max(col("doc_id")).as("mx"))
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("PushedAggregation: [COUNT(*), MIN(doc_id), MAX(doc_id)]"),
        s"no aggregate pushdown in:\n$plan")
      val r = df.head
      assert(r.getLong(0) > 0 && r.getLong(1) === 0L)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.parquet.aggregatePushdown", v)
        case None => spark.conf.unset("spark.sql.parquet.aggregatePushdown")
      }
      prevV1 match {
        case Some(v) => spark.conf.set("spark.sql.sources.useV1SourceList", v)
        case None => spark.conf.unset("spark.sql.sources.useV1SourceList")
      }
    }
  }

  test("jsonl: clean/quarantine split, missing-id quarantined, round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl")
    val lines = Seq(
      """{"doc_id": 1, "text": "hello world", "lang": "en", "source": "s0", "n_chars": 11}""",
      "",                 // blank shard-concat artifact: skipped entirely
      """{"doc_id": 2, "text": "bonjour", "lang": "fr", "source": "s1", "n_chars": 7}""",
      """not json at all {{{""",
      """{"text": "no id here", "lang": "en", "source": "s0", "n_chars": 10}""",
      // parseable but type-mismatched field: must quarantine, not
      // flow through with n_chars silently nulled
      """{"doc_id": 3, "text": "t", "lang": "en", "source": "s0", "n_chars": "oops"}""")
    java.nio.file.Files.write(dir.resolve("part-0.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))
    val (clean, quarantine) = graft.sources.Jsonl.readDocuments(spark, dir.toString)
    assert(clean.schema === Tables.schemas("documents"))
    assert(clean.select($"doc_id").as[Long].collect().sorted.toSeq === Seq(1L, 2L))
    val q = quarantine.select($"raw_line").as[String].collect().toSeq
    assert(q.length === 3)
    assert(q.exists(_.startsWith("not json")))
    assert(q.exists(_.contains("no id here")))
    assert(q.exists(_.contains("oops")))
    // round-trip: write clean docs, read back, identical rows
    val out = s"$dir/out"
    graft.sources.Jsonl.writeDocuments(clean, out)
    val (back, backQ) = graft.sources.Jsonl.readDocuments(spark, out)
    assert(backQ.isEmpty)
    assert(back.orderBy($"doc_id").collect().map(_.toString).toSeq ===
      clean.orderBy($"doc_id").collect().map(_.toString).toSeq)
  }

  test("JDBC integration: embedded Derby round-trip, sharded read, dup-skip append") {
    // a REAL DriverManager connection without network: Derby runs
    // embedded in this JVM (jar ships with Spark), so the S1/S3/S5
    // wrappers are exercised against an actual database, not mocks
    System.setProperty("derby.system.home",
      java.nio.file.Files.createTempDirectory("graft-derby").toString)
    val cfg = Jdbc.JdbcConfig("jdbc:derby:memory:graftdb;create=true")
    val region = Tables.load(spark, "/root/testdata/sf0.001", "region")
    Jdbc.writeTable(region, cfg, "REGION_T") // Append creates the table
    // plain read-back
    val back = Jdbc.readTable(spark, cfg, "REGION_T")
      .as[(Int, String)].collect().toSeq.sorted
    assert(back === region.as[(Int, String)].collect().toSeq.sorted)
    // bounds-probed sharded read (the scale path): same rows, >1 RDD
    // partition proves the partitionColumn options actually applied
    val sharded = Jdbc.readTable(spark, cfg, "REGION_T",
      partitionColumn = Some("r_regionkey"), numPartitions = 3)
    assert(sharded.rdd.getNumPartitions === 3)
    assert(sharded.as[(Int, String)].collect().toSeq.sorted === back)
    // S5 shape against a live destination: anti-join against the
    // existing keys, append only the novel rows, re-read and check
    val incoming = region.unionByName(
      Seq((99, "NOWHERE")).toDF("r_regionkey", "r_name"))
    val existing = Jdbc.readTable(spark, cfg, "REGION_T")
    Jdbc.writeTable(incoming.join(existing, Seq("r_regionkey"), "left_anti"),
      cfg, "REGION_T")
    val after = Jdbc.readTable(spark, cfg, "REGION_T")
      .as[(Int, String)].collect().toSeq.sorted
    assert(after.length === back.length + 1 && after.contains((99, "NOWHERE")))
  }

  test("SchemaCatalog: the schema-text catalog reproduces the registry (S2)") {
    // the two catalog forms must not drift: parsing the schema text
    // yields exactly Tables.schemas, in the same migrate order
    assert(SchemaCatalog.parse(SchemaCatalog.testdataSchema) === Tables.schemas)
    assert(SchemaCatalog.tableNames(SchemaCatalog.testdataSchema) === Tables.names)
  }

  test("SchemaCatalog: scalar mapping, modifiers, attributes, relations") {
    import org.apache.spark.sql.types._
    val models = SchemaCatalog.parseModels(
      """// a kitchen-sink model
        |model Thing {
        |  id       BigInt   @id @default(autoincrement())
        |  name     String   // trailing comment with model Fake { junk }
        |  score    Float?
        |  exact    Decimal
        |  seen     DateTime
        |  flags    Boolean
        |  blob     Bytes
        |  meta     Json
        |  counts   Int[]
        |  vec      Float[]  @db.Real
        |  owner    Owner    @relation(fields: [ownerId], references: [id])
        |  ownerId  BigInt
        |  @@map("things")
        |  @@index([name])
        |}
        |model Owner {
        |  id     BigInt  @id
        |  things Thing[]
        |}
        |""".stripMargin)
    assert(models.map(_.table) === Seq("things", "owner"))
    val t = models.head
    assert(t.name === "Thing")
    assert(t.schema === StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType), StructField("exact", DecimalType(18, 6)),
      StructField("seen", TimestampType), StructField("flags", BooleanType),
      StructField("blob", BinaryType), StructField("meta", StringType),
      StructField("counts", ArrayType(IntegerType)),
      StructField("vec", ArrayType(FloatType)),
      StructField("ownerId", LongType))))
    assert(t.required === t.schema.fieldNames.toSeq.filterNot(_ == "score"))
    // relation-only model: list-of-model field dropped, default table name
    assert(models(1).schema.fieldNames.toSeq === Seq("id"))
    // unknown type is an error, not a silent drop
    val e = intercept[IllegalArgumentException] {
      SchemaCatalog.parseModels("model M { x NotAType }")
    }
    assert(e.getMessage.contains("NotAType"))
  }

  test("Html: linear scanner covers the cheerio consumer surface (S11)") {
    import graft.sources.Html
    val page =
      """<!DOCTYPE html>
        |<html><head>
        |  <title> Graft &amp; Friends </title>
        |  <style>body { color: red; } /* <a href="not-a-link"> */</style>
        |  <script>if (1 < 2) { document.write("<a href='fake'>x</a>"); }</script>
        |</head>
        |<body>
        |  <!-- comment with <a href="nope"> inside -->
        |  <p>Hello&nbsp;<b>big</b> world &#33;&#x21;</p>
        |  <a href="https://example.com/a?x=1&amp;y=2">first</a>
        |  <a class=plain href=/relative>second</a>
        |  <a name="anchor-no-href">not a link</a>
        |  <div><div>outer <div>inner</div> tail</div></div>
        |  <img src="x.png"/>
        |</body></html>""".stripMargin
    // $('title').text()
    assert(Html.title(page) === Some("Graft & Friends"))
    // $('a') + attr('href'): quoted, unquoted, entity-decoded;
    // script/style/comment fakes and href-less anchors excluded
    assert(Html.links(page) ===
      Seq("https://example.com/a?x=1&y=2", "/relative"))
    // $.text(): script/style suppressed, entities decoded, normalized
    val t = Html.text(page)
    assert(t.contains("Hello big world !!"))
    assert(!t.contains("color"), t)
    assert(!t.contains("document.write"), t)
    assert(!t.contains("comment with"), t)
    // selectText: nested same-name tags belong to the outermost match
    assert(Html.selectText(page, "div") === Seq("outer inner tail"))
    assert(Html.selectText(page, "b") === Seq("big"))
    // malformed input degrades, never throws
    assert(Html.links("<a href='unclosed") === Nil)
    assert(Html.text("a < b & c") === "a < b & c")
    assert(Html.text("<p>tail never closed") === "tail never closed")
  }

  test("jsonl sharded writer: budget honored within one line, manifest matches disk, round-trip") {
    import graft.sources.Jsonl
    val dir = java.nio.file.Files.createTempDirectory("graft-shard").toString
    val docs = (1L to 40L)
      .map(i => (i, s"doc body number $i padded ${"x" * (i % 7).toInt}",
        "en", "unit", 10L + i))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val budget = 400L
    val manifest = Jsonl.writeShardedDocuments(docs, s"$dir/out", budget)
      .as[(Long, Long, Long)].collect().toSeq
    assert(manifest.size > 1, "fixture must span multiple shards")
    // shards are contiguous ids from 0
    assert(manifest.map(_._1) === manifest.indices.map(_.toLong))
    // every row landed exactly once
    assert(manifest.map(_._2).sum === 40L)
    // budget: a shard exceeds it by at most one line (the closer)
    val maxLine = docs.select(
        org.apache.spark.sql.functions.max(
          org.apache.spark.sql.functions.octet_length(
            org.apache.spark.sql.functions.to_json(
              org.apache.spark.sql.functions.struct(docs.columns.map(
                org.apache.spark.sql.functions.col): _*))))).as[Int].head + 1
    assert(manifest.forall(_._3 <= budget + maxLine))
    // all but the last shard actually CROSSED the budget line
    assert(manifest.init.forall(_._3 + maxLine >= budget))
    // manifest reconciles with the bytes on disk per shard dir
    manifest.foreach { case (shard, _, nBytes) =>
      val d = new java.io.File(s"$dir/out/shard=$shard")
      val onDisk = d.listFiles().filter(_.getName.endsWith(".txt"))
        .map(_.length()).sum
      assert(onDisk === nBytes, s"shard $shard: $onDisk != $nBytes")
    }
    // round-trip: reading the shards back yields the exact corpus
    val (clean, quarantine) = Jsonl.readDocuments(spark, s"$dir/out/*/")
    assert(quarantine.count() === 0L)
    assert(clean.select("doc_id", "text").as[(Long, String)].collect().toSet
      === docs.select("doc_id", "text").as[(Long, String)].collect().toSet)
    // determinism: a second write produces the same manifest
    val again = Jsonl.writeShardedDocuments(docs, s"$dir/out2", budget)
      .as[(Long, Long, Long)].collect().toSeq
    assert(again === manifest)
  }
}
