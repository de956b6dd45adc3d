package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions._

/** Deduplication suite over `documents` (north-star extension): exact,
  * n-gram Jaccard, MinHash+LSH, SimHash. Each returns a deterministic
  * DataFrame; the exact and Jaccard variants are oracle-checked, the
  * sketch variants (MinHash/SimHash use xxhash64, which DuckDB lacks)
  * get the driver's rows-only check.
  *
  * Scale posture (100 TB): every variant is built on shuffle-by-key
  * joins/aggregations — no driver materialization, no cross join. The
  * candidate generators (shared-shingle inverted index, LSH band
  * buckets) bound pair generation; high-frequency shingles are pruned
  * (df cap) so no single reduce key explodes.
  */
object Dedup {

  /** q25 — exact dedup: group by whitespace-normalized content hash,
    * canonical representative = min doc_id (reference analogue: the
    * skipDuplicates/ON CONFLICT key dedup, migrate.ts:64 / lib.ts:91,
    * lifted to content identity).
    */
  def exact(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val w = Window.partitionBy(col("content_fp"))
    docs.select(col("doc_id"), contentFingerprint(col("text")).as("content_fp"))
      .withColumn("rep_id", min(col("doc_id")).over(w))
      .withColumn("is_dup", (col("doc_id") =!= col("rep_id")).cast("int"))
      .orderBy(col("doc_id"))
  }

  val exactSql: String =
    """SELECT doc_id,
      |  md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS content_fp,
      |  MIN(doc_id) OVER (PARTITION BY md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'))) AS rep_id,
      |  CASE WHEN doc_id <> MIN(doc_id) OVER (PARTITION BY
      |    md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'))) THEN 1 ELSE 0 END AS is_dup
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Distinct word-k-gram shingles per doc (docs shorter than k tokens
    * produce none and drop out of pair generation).
    */
  private def shingles(docs: DataFrame, k: Int): DataFrame =
    docs.select(col("doc_id"), tokens(col("text")).as("toks"))
      .withColumn("n", size(col("toks")))
      .filter(col("n") >= k)
      .select(col("doc_id"), explode(expr(
        s"array_distinct(transform(sequence(0, n - $k), i -> concat_ws(' ', slice(toks, i + 1, $k))))"
      )).as("shingle"))

  /** q26 — n-gram Jaccard near-dup pairs: inverted-index candidate
    * generation (pairs sharing >= 1 surviving shingle) + exact Jaccard
    * verification. Because threshold > 0 implies a shared shingle, the
    * candidate step loses nothing — the result equals the full O(n^2)
    * computation, which is what the oracle states.
    *
    * dfCap prunes degenerate high-frequency shingles (identically on
    * both sides) so no inverted-index key fans out quadratically.
    */
  def ngramJaccardPairs(spark: SparkSession, dir: String, k: Int = 3,
                        threshold: Double = 0.6, dfCap: Int = 200): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    // persisted: the exploded shingle table feeds the df-filter, the
    // size aggregate, and both sides of the candidate join — without
    // materialization the tokenize+explode runs four times.
    val sh = shingles(docs, k).persist()
    val rare = sh.groupBy(col("shingle"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= dfCap)
      .select("shingle")
    val kept = sh.join(rare, "shingle")
    val sizes = kept.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val pairsShared = kept.as("a").join(kept.as("b"), "shingle")
      .filter(col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
    pairsShared
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
      .withColumn("jaccard",
        round(col("n_shared").cast("double") / (col("n_a") + col("n_b") - col("n_shared")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val ngramJaccardPairsSql: String =
    """WITH sh AS (
      |  SELECT doc_id, unnest(list_distinct([array_to_string(toks[i:i+2], ' ')
      |    for i in range(1, len(toks) - 1)])) AS shingle
      |  FROM (SELECT doc_id,
      |          list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS toks
      |        FROM documents)
      |  WHERE len(toks) >= 3
      |), kept AS (
      |  SELECT doc_id, shingle FROM sh
      |  WHERE shingle IN (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 200)
      |), sizes AS (
      |  SELECT doc_id, COUNT(*) AS n_sh FROM kept GROUP BY doc_id
      |), shared AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
      |  FROM kept a JOIN kept b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2
      |)
      |SELECT s.doc_a, s.doc_b,
      |  ROUND(CAST(s.n_shared AS DOUBLE) / (sa.n_sh + sb.n_sh - s.n_shared), 6) AS jaccard
      |FROM shared s
      |JOIN sizes sa ON s.doc_a = sa.doc_id
      |JOIN sizes sb ON s.doc_b = sb.doc_id
      |WHERE CAST(s.n_shared AS DOUBLE) / (sa.n_sh + sb.n_sh - s.n_shared) >= 0.6
      |ORDER BY doc_a, doc_b""".stripMargin

  /** MinHash signature matrix: numHashes independent hash slots per
    * doc, h_i(doc) = min over shingles of xxhash64(i, shingle) —
    * computed by the single-buffer [[graft.functions.MinHashSketch]]
    * aggregate (bit-equal to numHashes separate min(xxhash64) columns,
    * which this replaces; see PipelineSpec).
    */
  private def minhashSignatures(spark: SparkSession, kept: DataFrame,
                                numHashes: Int): DataFrame = {
    val sig = kept.groupBy(col("doc_id"))
      .agg(graft.functions.MinHashSketch.minhash(spark, col("shingle"), numHashes).as("sig"))
    sig.select(col("doc_id") +:
      (0 until numHashes).map(i => col("sig").getItem(i).as(s"h$i")): _*)
  }

  /** q38 — dedup clustering: connected components over the near-dup
    * pair graph, each doc mapped to its cluster representative
    * (min doc_id reachable). Iterative min-label propagation — the
    * loop is driver-controlled but every iteration is a distributed
    * join; convergence in O(cluster diameter) rounds (near-dup
    * clusters are tiny, so 2-3). The oracle states the same fixpoint
    * as a recursive transitive-closure CTE.
    */
  def dedupClusters(spark: SparkSession, dir: String, k: Int = 3,
                    threshold: Double = 0.6, maxIters: Int = 50): DataFrame = {
    val docs = Tables.load(spark, dir, "documents").select(col("doc_id"))
    val pairs = ngramJaccardPairs(spark, dir, k, threshold)
      .select(col("doc_a"), col("doc_b")).persist()
    // materialize BEFORE deriving the undirected edge list: both union
    // branches read pairs, and inside one job they'd race the cache
    // and each recompute the whole jaccard join
    pairs.count()
    // propagation runs only over nodes that appear in edges (the
    // near-dup graph is a sliver of the corpus), then joins back once.
    val edges = pairs.unionByName(
      pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b"))).persist()
    // Iterative lineage must be TRUNCATED, not just cached: the loop's
    // broadcast-hinted joins defeat cache-plan matching, so without
    // truncation every downstream action re-runs the whole jaccard
    // subtree per reference (profiled: 3x slower end-to-end).
    // localCheckpoint materializes each round's tiny label table to
    // executor storage and cuts the plan there — the standard shape
    // for iterative graph algorithms.
    var labels = edges.select(col("doc_a").as("doc_id")).distinct()
      .withColumn("rep_id", col("doc_id")).localCheckpoint(true)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      iter += 1
      // broadcast joins: the label/edge frames are tiny — shuffling
      // them through 32 partitions per iteration is pure scheduling
      // overhead
      val neighborMin = edges
        .join(broadcast(labels), edges("doc_b") === labels("doc_id"))
        .groupBy(col("doc_a").as("doc_id2"))
        .agg(min(col("rep_id")).as("n_rep"))
      val next = labels.join(broadcast(neighborMin), labels("doc_id") === col("doc_id2"), "left")
        .select(col("doc_id"),
          least(col("rep_id"), coalesce(col("n_rep"), col("rep_id"))).as("rep_id"))
        .localCheckpoint(true)
      val changed = next.join(broadcast(labels.withColumnRenamed("rep_id", "old_rep")), "doc_id")
        .filter(col("rep_id") =!= col("old_rep")).limit(1).count()
      labels = next
      converged = changed == 0
    }
    if (!converged)
      System.err.println(s"[dedupClusters] WARNING: not converged after " +
        s"$maxIters rounds — a near-dup chain longer than $maxIters hops " +
        "exists; labels for its tail are not yet the cluster minimum")
    docs.join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("rep_id"), col("doc_id")).as("rep_id"))
      .withColumn("is_canonical", (col("doc_id") === col("rep_id")).cast("int"))
      .orderBy(col("doc_id"))
  }

  val dedupClustersSql: String =
    """WITH RECURSIVE pairs AS (
      |  SELECT doc_a, doc_b FROM (
      |    WITH sh AS (
      |      SELECT doc_id, unnest(list_distinct([array_to_string(toks[i:i+2], ' ')
      |        for i in range(1, len(toks) - 1)])) AS shingle
      |      FROM (SELECT doc_id,
      |              list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS toks
      |            FROM documents)
      |      WHERE len(toks) >= 3
      |    ), kept AS (
      |      SELECT doc_id, shingle FROM sh
      |      WHERE shingle IN (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 200)
      |    ), sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM kept GROUP BY doc_id),
      |    shared AS (
      |      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
      |      FROM kept a JOIN kept b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |      GROUP BY 1, 2)
      |    SELECT s.doc_a, s.doc_b
      |    FROM shared s JOIN sizes sa ON s.doc_a = sa.doc_id
      |    JOIN sizes sb ON s.doc_b = sb.doc_id
      |    WHERE CAST(s.n_shared AS DOUBLE) / (sa.n_sh + sb.n_sh - s.n_shared) >= 0.6
      |  )
      |), edges AS (
      |  SELECT doc_a, doc_b FROM pairs
      |  UNION SELECT doc_b, doc_a FROM pairs
      |), reach(a, b) AS (
      |  SELECT doc_a, doc_b FROM edges
      |  UNION
      |  SELECT r.a, e.doc_b FROM reach r JOIN edges e ON r.b = e.doc_a
      |)
      |SELECT d.doc_id,
      |  LEAST(d.doc_id, COALESCE(MIN(r.b), d.doc_id)) AS rep_id,
      |  CASE WHEN LEAST(d.doc_id, COALESCE(MIN(r.b), d.doc_id)) = d.doc_id
      |       THEN 1 ELSE 0 END AS is_canonical
      |FROM documents d LEFT JOIN reach r ON d.doc_id = r.a
      |GROUP BY d.doc_id
      |ORDER BY d.doc_id""".stripMargin

  /** q27 — MinHash + LSH banding near-dup pairs (rows-only check: the
    * banding is probabilistic and xxhash64 has no DuckDB twin).
    * numHashes=24 split into 8 bands of 3: P(candidate) = 1-(1-j^3)^8,
    * ~0.997 at j=0.8. Candidates are verified with exact Jaccard so
    * precision is 1.0 — only recall is approximate.
    *
    * Scale: band buckets are the shuffle keys; signature build is one
    * aggregation over the shingle table.
    */
  def minhashLshPairs(spark: SparkSession, dir: String, k: Int = 3,
                      numHashes: Int = 24, bands: Int = 8,
                      threshold: Double = 0.6): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val sh = shingles(docs, k).persist()
    val rare = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= 200).select("shingle")
    val kept = sh.join(rare, "shingle").persist()
    val rows = numHashes / bands
    val sig = minhashSignatures(spark, kept, numHashes)
    // band keys via one explode (a union of per-band selects would
    // recompute the signature aggregation once per band — the plan
    // audit showed 19 shuffles); each element is (band, hash-of-slice)
    val bandStructs = (0 until bands).map { b =>
      val slice = (0 until rows).map(r => col(s"h${b * rows + r}"))
      struct(lit(b).as("band"), xxhash64(slice: _*).as("bucket"))
    }
    val banded = sig.select(col("doc_id"), explode(array(bandStructs: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
      .persist()
    val candidates = banded.as("a").join(banded.as("b"), Seq("band", "bucket"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    // exact-Jaccard verification of candidates ONLY (no all-pairs work:
    // the candidate set is the LSH payoff — keep it that way).
    val sets = kept.groupBy(col("doc_id")).agg(collect_set(col("shingle")).as("sh_set"))
    candidates
      .join(sets.select(col("doc_id").as("doc_a"), col("sh_set").as("set_a")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("sh_set").as("set_b")), "doc_b")
      .withColumn("n_shared", size(array_intersect(col("set_a"), col("set_b"))))
      .withColumn("jaccard", round(col("n_shared").cast("double") /
        (size(col("set_a")) + size(col("set_b")) - col("n_shared")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** q28 — SimHash near-dup pairs (rows-only check). 64-bit simhash
    * from token hashes; pairs from 16-bit band buckets verified by
    * Hamming distance <= maxHamming. Banding over 4 bands guarantees
    * recall for Hamming <= 3 (pigeonhole: some band is untouched).
    */
  def simhashPairs(spark: SparkSession, dir: String,
                   maxHamming: Int = 3): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val toks = docs.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .withColumn("th", xxhash64(col("tok")))
    // per bit: sum of +1/-1 votes across token occurrences
    val bitSums = (0 until 64).map(b =>
      sum(when(shiftright(col("th"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$b"))
    val sims = toks.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map(b =>
          when(col(s"b$b") > 0, shiftleft(lit(1L), b)).otherwise(0L)).reduce(_ bitwiseOR _)
          .as("simhash"))
    // one explode instead of a 4-way union (which re-scanned and
    // re-aggregated the token table per band — 8 scans in the audit)
    val banded = sims.select(col("doc_id"), col("simhash"),
        explode(array((0 until 4).map(b => struct(lit(b).as("band"),
          shiftright(col("simhash"), b * 16).bitwiseAND(0xFFFFL).as("bucket"))): _*)).as("bb"))
      .select(col("doc_id"), col("simhash"),
        col("bb.band").as("band"), col("bb.bucket").as("bucket"))
      .persist()
    banded.as("a").join(banded.as("b"), Seq("band", "bucket"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy(col("doc_a"), col("doc_b"))
  }
}
