package graft.tools

/** Duplicate-operator screen (round-12 verdict item 3 of "what's
  * missing"): three near-duplicate queries reached review only by hand
  * (q470, q493, a q508 CUPED draft — the last slipping past a broken
  * `grep -E 'a\|b'` alternation). With 500+ registered queries the next
  * collision is a matter of time, so the screen is now the engine's own
  * n-gram Jaccard core (the q26 near-dup detector) dogfooded on the
  * `SparkEntry.oracleSql` strings and wired into `sbt test`
  * (DupCheckSpec).
  *
  * Method: normalize each oracle SQL (lowercase, collapse whitespace),
  * shingle into character 5-grams, score every pair by Jaccard
  * similarity with a size-ratio prefilter (J <= |A|/|B| for |A|<=|B|,
  * so wildly different-length texts skip the intersection entirely).
  * Two queries CAN legitimately share scaffolding — the dense-daily-
  * grid CTE, the fixedSample preamble — so the gate is tuned above the
  * scaffolding band (measured: sibling families sit ~0.5-0.65) and an
  * explicit allowlist names accepted pairs with the reason reviewable
  * in one place.
  *
  * Pure Scala (no SparkSession): 532 texts -> ~141k pairs screen in
  * seconds inside the test JVM.
  */
object DupCheck {

  /** Pairs that SHOULD share (near-)identical oracle SQL: the grading
    * discipline for a scale-path twin is "different Spark plan, SAME
    * relation", proven by grading both against one oracle. Each entry
    * names the reason so the exemption is reviewable in one place; a
    * NEW pair landing at >= `threshold` that is not here fails
    * DupCheckSpec and must either be de-duplicated or argued onto this
    * list.
    */
  val intentionalTwins: Map[(String, String), String] = Map(
    ("q02_latest_event_per_user", "q33_latest_event_agg") ->
      "same DISTINCT-ON relation: window form vs max-struct aggregate form",
    ("q104_knn_sq8", "q29_knn_brute") ->
      "SQ8-quantized top-k graded exactly against the brute-force relation",
    ("q164_inverted_index", "q361_index_incremental") ->
      "merge==rebuild proof: incremental index graded against full rebuild",
    ("q296_asof_native", "q345_asof_broadcast") ->
      "same as-of relation: shuffle path vs broadcast SortedFloorIndex path",
    ("q307_substring_dup_extent", "q424_substring_extent_rolling") ->
      "O(n) rolling-hash extent graded against the md5 shingle relation",
    ("q351_vocab_two_level", "q36_vocabulary") ->
      "two-level (salted) aggregation proven relation-preserving",
    ("q61_decontamination", "q69_decontamination_bloom") ->
      "bloom pre-filter graded against the exact anti-join relation")

  /** Gate tuned against the measured round-13 distribution: the seven
    * intentional twins sit at 1.0; the densest ACCIDENTAL-risk band —
    * sibling families sharing scaffolding CTEs (dense daily grid,
    * fixedSample preamble, minhash tables) — tops out at 0.902
    * (q112~q445). 0.93 splits the two populations with margin on both
    * sides.
    */
  val threshold: Double = 0.93

  def normalize(sql: String): String =
    sql.toLowerCase.replaceAll("\\s+", " ").trim

  def shingles(sql: String, k: Int = 5): Set[String] = {
    val t = normalize(sql)
    if (t.length < k) Set(t)
    else (0 to t.length - k).iterator.map(i => t.substring(i, i + k)).toSet
  }

  def jaccard(a: Set[String], b: Set[String]): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    val (small, large) = if (a.size <= b.size) (a, b) else (b, a)
    val inter = small.count(large.contains)
    inter.toDouble / (a.size + b.size - inter)
  }

  /** All pairs at or above `threshold`, most-similar first. */
  def duplicates(entries: Map[String, String], threshold: Double)
      : Seq[(String, String, Double)] = {
    val sh = entries.toSeq.sortBy(_._1)
      .map { case (n, s) => (n, shingles(s)) }
    val out = Seq.newBuilder[(String, String, Double)]
    var i = 0
    while (i < sh.length) {
      var j = i + 1
      while (j < sh.length) {
        val (na, a) = sh(i)
        val (nb, b) = sh(j)
        // size-ratio upper bound on Jaccard: skip the intersection
        // when even identical overlap couldn't reach the threshold
        val bound = math.min(a.size, b.size).toDouble / math.max(a.size, b.size)
        if (bound >= threshold) {
          val sim = jaccard(a, b)
          if (sim >= threshold) out += ((na, nb, sim))
        }
        j += 1
      }
      i += 1
    }
    out.result().sortBy(-_._3)
  }

  /** The gate DupCheckSpec enforces: flagged = pairs at or above
    * [[threshold]] that are not on [[intentionalTwins]] (order-
    * insensitive).
    */
  def flagged(entries: Map[String, String]): Seq[(String, String, Double)] =
    duplicates(entries, threshold).filterNot { case (a, b, _) =>
      intentionalTwins.contains((a, b)) || intentionalTwins.contains((b, a))
    }

  /** Scaladoc first-lines per query: every operator doc opens with
    * `qNNN — <summary>` on the doc's first line; the summaries are a
    * second, PROSE-level
    * dedup surface (two operators can have dissimilar SQL but describe
    * the same statistic — the q286/q536 near-miss was caught by the
    * compiler only because the METHOD name collided). Extracts the
    * first physical line of each `qNNN —` scaladoc under `root`.
    */
  def scaladocFirstLines(root: java.io.File): Map[String, String] = {
    val out = scala.collection.mutable.Map.empty[String, String]
    def walk(f: java.io.File): Unit =
      if (f.isDirectory) f.listFiles.foreach(walk)
      else if (f.getName.endsWith(".scala")) {
        val src = new String(
          java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
        val re = """/\*\* (q\d+) — ([^\n]*)""".r
        re.findAllMatchIn(src).foreach { m =>
          out(m.group(1)) = m.group(2)
        }
      }
    walk(root)
    out.toMap
  }

  /** First-line screen: prose summaries are short, so the gate is
    * tuned to the measured distribution separately from the SQL gate
    * (siblings share vocabulary; only near-verbatim lines flag).
    */
  val docThreshold: Double = 0.82

  def flaggedDocs(root: java.io.File): Seq[(String, String, Double)] =
    duplicates(scaladocFirstLines(root), docThreshold)

  // ------------------------------------------------------------------
  // canonicalized-plan-digest screen (round-13 verdict item 7): the
  // SQL screen cannot see two queries whose ORACLES differ textually
  // but whose Spark plans are the same tree — e.g. a re-registered
  // operator whose twin oracle was rewritten just enough to slip the
  // 0.93 shingle gate. The plan IS the operator; hash it directly.
  // ------------------------------------------------------------------

  /** Queries the plan screen skips, each with its reason reviewable
    * here: the five graded streaming replays EXECUTE their stream
    * inside the builder and return a materialized LocalRelation — the
    * digest would hash result data, not an operator tree (and building
    * the DataFrame costs a full replay).
    */
  val planScreenExclusions: Map[String, String] = Map(
    "q533_streaming_croston" ->
      "replay harness: runs flatMapGroupsWithState eagerly, returns a local snapshot",
    "q543_streaming_cdc" ->
      "replay harness: runs foreachBatch CDC eagerly, returns a local snapshot",
    "q551_streaming_interval_join" ->
      "replay harness: runs the stream-stream join eagerly, returns local pairs",
    "q552_streaming_dedup_eviction" ->
      "replay harness: runs dropDuplicatesWithinWatermark eagerly, returns local counts",
    "q554_streaming_sessions" ->
      "replay harness: runs session_window eagerly, returns local sessions")

  /** md5 of the ANALYZED plan's canonicalized tree PLUS the plan's
    * closure capture sites: `canonicalized` normalizes exprIds and
    * erases cosmetic naming, so two structurally identical operator
    * trees digest equal no matter how many times or in what order they
    * were built, while any real difference (another operator, another
    * literal, another column) digests apart. Closures (mapPartitions
    * kernels, typed maps, ScalaUDFs) are NOT part of canonicalization
    * — the screen's first run proved it by colliding q244 aHash with
    * q295 pHash, whose entire difference is the kernel lambda — so the
    * digest appends each closure's capture-site class name (the JVM
    * lambda class, one per definition site, `/0x…` suffix stripped):
    * the same site rebuilt digests equal; a different kernel digests
    * apart.
    */
  def planDigest(df: org.apache.spark.sql.DataFrame): String = {
    val analyzed = df.queryExecution.analyzed
    val canon = analyzed.canonicalized.toString +
      closureSites(analyzed).mkString("\n", "\n", "")
    java.security.MessageDigest.getInstance("MD5")
      .digest(canon.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
  }

  /** Capture-site class names of every function object reachable from
    * the plan's nodes and expressions, in tree order.
    */
  private[graft] def closureSites(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : Seq[String] = {
    val out = Seq.newBuilder[String]
    def site(f: AnyRef): String = f.getClass.getName.takeWhile(_ != '/')
    def fromProduct(p: Product): Unit = p.productIterator.foreach {
      case f: scala.Function1[_, _] => out += site(f)
      case f: scala.Function2[_, _, _] => out += site(f)
      case f: scala.Function3[_, _, _, _] => out += site(f)
      case _ => ()
    }
    plan.foreach { node =>
      node match {
        // a checkpointed/materialized source erases its lineage from
        // the logical tree (q244 vs q295 collide: both are the same
        // band-join tree over an opaque LogicalRDD — the aHash/pHash
        // kernels ran at localCheckpoint time). The RDD's debug string
        // keeps the DEFINITION callsite (file:line), which is exactly
        // the capture-site identity; run-varying [id] tags stripped.
        case lr: org.apache.spark.sql.execution.LogicalRDD =>
          out += lr.rdd.toDebugString.replaceAll("\\[\\d+\\]", "[]")
        case _ => ()
      }
      fromProduct(node)
      node.expressions.foreach(_.foreach(e => fromProduct(e)))
    }
    out.result()
  }

  /** Digest every registered (non-excluded) query at `dir` and return
    * the digest-collision groups (>= 2 names per digest). Empty =
    * every registered operator plans a distinct tree.
    */
  def samePlanGroups(spark: org.apache.spark.sql.SparkSession,
                     dir: String): Seq[Seq[String]] =
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (n, _) => planScreenExclusions.contains(n) }
      .map { case (n, fn) => n -> planDigest(fn(spark, dir)) }
      .groupBy(_._2).values
      .collect { case g if g.size > 1 => g.map(_._1).sorted }
      .toSeq.sortBy(_.head)

  /** Diagnostic main: print the top-N most similar oracle pairs so a
    * threshold change is set against the measured distribution, not a
    * guess.
    */
  def main(args: Array[String]): Unit = {
    val topN = args.headOption.map(_.toInt).getOrElse(25)
    val entries = graft.SparkEntry.oracleSql
    val scored = duplicates(entries, 0.30)
    println(s"pairs >= 0.30 among ${entries.size} oracle SQL strings:")
    scored.take(topN).foreach { case (a, b, s) =>
      println(f"  $s%.3f  $a  ~  $b")
    }
    val srcRoot = new java.io.File("src/main/scala/graft")
    if (srcRoot.isDirectory) {
      val docs = scaladocFirstLines(srcRoot)
      val docScored = duplicates(docs, 0.40)
      println(s"\nscaladoc first-line pairs >= 0.40 among ${docs.size}:")
      docScored.take(topN).foreach { case (a, b, s) =>
        println(f"  $s%.3f  $a  ~  $b")
      }
    }
  }
}
