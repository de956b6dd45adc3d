package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Similarity search over `embeddings.embedding: array<float>`
  * (north-star extension): brute-force cosine top-k as the exact
  * baseline, sign-LSH bucketing as the scale path, and blocked
  * embedding near-dup detection.
  *
  * The dot product / norms are higher-order-function expressions
  * (`zip_with` + `aggregate`) over the array column — codegen'd, no
  * UDF, accumulation in double with deterministic left-to-right order
  * (so the DuckDB oracle can reproduce values exactly).
  *
  * Scale posture: brute-force is a broadcast of the (small) query set
  * against a partitioned scan of the corpus — linear, no shuffle until
  * the final per-query top-k (tiny). The LSH variant turns the corpus
  * into bucket-keyed partitions so each probe touches a sliver.
  */
object Similarity {

  /** Sequential-order double dot product of two float arrays —
    * composable higher-order-function form (CodegenFallback; kept as
    * the readable reference implementation and for tests).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0),
      (acc, v) => acc + v.cast("double") * v.cast("double")))

  /** Numerically identical to `dot(a,b)/(norm(a)*norm(b))` but fused
    * into one codegen'd loop — see [[graft.functions.CosineSimilarity]].
    */
  def cosine(spark: SparkSession, a: Column, b: Column): Column =
    graft.functions.CosineSimilarity.cosine(spark, a, b)

  /** q29 — brute-force cosine top-k (oracle-checked): for each query
    * vector (vec_id < nQueries) the k nearest corpus vectors.
    * The query side is broadcast; the corpus side streams — the only
    * shuffle is the per-query top-k windowing.
    */
  def knnBrute(spark: SparkSession, dir: String, nQueries: Int = 8,
               k: Int = 10): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val scored = emb.filter(col("vec_id") >= nQueries)
      .crossJoin(broadcast(queries))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(cosine(spark, col("q_emb"), col("embedding")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy(col("query_id"), col("rank"))
  }

  /** DuckDB mirror of [[dot]]/[[norm]]: list_reduce over the zipped
    * per-element double products preserves the same left-to-right
    * double accumulation, so cos_sim matches bit-for-bit before the
    * shared round(6).
    */
  val knnBruteSql: String =
    """WITH q AS (
      |  SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings WHERE vec_id < 8
      |), scored AS (
      |  SELECT q.query_id, e.vec_id AS neighbor_id,
      |    ROUND(
      |      list_reduce(list_prepend(0.0, [CAST(q.q_emb[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)
      |          for i in range(1, len(q.q_emb) + 1)]), (a, b) -> a + b)
      |      / (sqrt(list_reduce(list_prepend(0.0, [CAST(v AS DOUBLE) * CAST(v AS DOUBLE)
      |            for v in q.q_emb]), (a, b) -> a + b))
      |       * sqrt(list_reduce(list_prepend(0.0, [CAST(v AS DOUBLE) * CAST(v AS DOUBLE)
      |            for v in e.embedding]), (a, b) -> a + b))), 6) AS cos_sim
      |  FROM embeddings e, q WHERE e.vec_id >= 8
      |)
      |SELECT query_id, neighbor_id, cos_sim,
      |  CAST(row_number() OVER (PARTITION BY query_id
      |    ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rank
      |FROM scored
      |QUALIFY rank <= 10
      |ORDER BY query_id, rank""".stripMargin

  /** Sign-LSH bucket id: nBits pseudo-random hyperplanes; hyperplane
    * j's i-th coordinate is a deterministic ±1 derived from
    * xxhash64(j, i). Buckets = nBits-bit signature.
    */
  def lshBucket(emb: Column, nBits: Int): Column =
    (0 until nBits).map { j =>
      // (element, index) transform — dimension-generic, no hardcoded
      // vector length
      val proj = aggregate(
        transform(emb, (v, i) =>
          v.cast("double") * when(pmod(xxhash64(lit(j), i), lit(2)) === 0, 1.0).otherwise(-1.0)),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0, shiftleft(lit(1L), j)).otherwise(0L)
    }.reduce(_ bitwiseOR _)

  /** q30 — ANN via sign-LSH bucketing (rows-only check: approximate).
    * Queries probe only their own bucket; exact cosine rerank inside.
    * The corpus bucket assignment is the one-off "index build"; at
    * 100 TB it would be persisted bucketed-by `bucket`.
    */
  def knnLsh(spark: SparkSession, dir: String, nQueries: Int = 8,
             k: Int = 10, nBits: Int = 8): DataFrame = {
    // persisted: the bucket assignment (an interpreted HOF projection)
    // feeds both the query and corpus branches
    val emb = Tables.load(spark, dir, "embeddings")
      .withColumn("bucket", lshBucket(col("embedding"), nBits))
      .persist()
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"), col("bucket"))
    val scored = emb.filter(col("vec_id") >= nQueries)
      .join(broadcast(queries), "bucket")
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(cosine(spark, col("q_emb"), col("embedding")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy(col("query_id"), col("rank"))
  }

  /** q37 — IVF-style ANN (rows-only check: approximate): the per-label
    * centroids act as the coarse quantizer; every vector is assigned
    * to its nearest centroid cell, queries probe only their own cell
    * (nprobe=1) and rerank with exact cosine. The full IVF flow —
    * train (centroids) / assign / probe — expressed as three joins.
    * At 100 TB the assignment is a broadcast of K centroids against
    * the corpus scan, and cells are the storage partitioning.
    */
  def knnIvf(spark: SparkSession, dir: String, nQueries: Int = 8,
             k: Int = 10): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    // train: reassemble the long-form centroids into arrays
    val centroids = labelCentroids(spark, dir)
      .groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("centroid")))),
        s => s.getField("centroid").cast("float")).as("c_emb"))
      .select(col("label").as("cell"), col("c_emb"))
    // assign: nearest centroid per vector (broadcast K centroids)
    def assign(df: DataFrame): DataFrame = {
      val scored = df.crossJoin(broadcast(centroids))
        .withColumn("c_sim", cosine(spark, col("embedding"), col("c_emb")))
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("c_sim").desc, col("cell"))
      scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(df.columns.map(col) :+ col("cell"): _*)
    }
    val assigned = assign(emb).persist()
    val queries = assigned.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"), col("cell"))
    // probe own cell only, exact rerank inside
    val scored = assigned.filter(col("vec_id") >= nQueries)
      .join(broadcast(queries), "cell")
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(cosine(spark, col("q_emb"), col("embedding")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy(col("query_id"), col("rank"))
  }

  /** q31 — embedding-cosine near-dup pairs (oracle-checked), blocked
    * by the coarse `label` column (the IVF-style partition): pairs
    * within a block with cosine >= threshold. Restricted to a bounded
    * id range so the exact all-pairs stays O(bound^2) at any SF — the
    * unbounded scale path is [[knnLsh]]'s bucketing.
    */
  def embeddingNearDups(spark: SparkSession, dir: String,
                        threshold: Double = 0.4, maxId: Long = 2000L): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
      .filter(col("vec_id") < maxId)
      .select(col("vec_id"), col("label"), col("embedding"))
    emb.as("a").join(emb.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        col("a.label").as("label"),
        round(cosine(spark, col("a.embedding"), col("b.embedding")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
      .orderBy(col("vec_a"), col("vec_b"))
  }

  /** q35 — per-label embedding centroids in long form (label, dim,
    * value): posexplode + grouped exact-decimal mean. The IVF
    * "training" step — at 100 TB this is one shuffle on (label, dim)
    * with map-side combine; the long form avoids an array
    * reassembly and is directly oracle-comparable.
    */
  def labelCentroids(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    emb.select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy(col("label"), col("dim"))
      .agg((Relational.decSum(col("v").cast("double")) / count(col("v"))).as("centroid"))
      .orderBy(col("label"), col("dim"))
  }

  val labelCentroidsSql: String =
    """SELECT label, i - 1 AS dim,
      |  CAST(SUM(CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(18,6))) AS DOUBLE)
      |    / COUNT(embedding[i]) AS centroid
      |FROM embeddings, generate_series(1, 64) AS t(i)
      |GROUP BY label, i
      |ORDER BY label, dim""".stripMargin

  val embeddingNearDupsSql: String =
    """SELECT * FROM (
      |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label,
      |    ROUND(
      |      list_reduce(list_prepend(0.0, [CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)
      |          for i in range(1, len(a.embedding) + 1)]), (x, y) -> x + y)
      |      / (sqrt(list_reduce(list_prepend(0.0, [CAST(v AS DOUBLE) * CAST(v AS DOUBLE)
      |            for v in a.embedding]), (x, y) -> x + y))
      |       * sqrt(list_reduce(list_prepend(0.0, [CAST(v AS DOUBLE) * CAST(v AS DOUBLE)
      |            for v in b.embedding]), (x, y) -> x + y))), 6) AS cos_sim
      |  FROM embeddings a JOIN embeddings b
      |    ON a.label = b.label AND a.vec_id < b.vec_id
      |  WHERE a.vec_id < 2000 AND b.vec_id < 2000
      |) WHERE cos_sim >= 0.4
      |ORDER BY vec_a, vec_b""".stripMargin
}
