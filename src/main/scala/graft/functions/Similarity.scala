package graft.functions

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column
  * (array<float>), Spark-first: the dot product is
  * aggregate(zip_with(...)) — pure built-ins inside whole-stage codegen,
  * no UDF.
  */
object Similarity {

  /** Exact dot product of two vector columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0d), (acc, v) => acc + v))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Integer-quantized dot product (scale ×1000, round) — bit-exact across
    * engines, used by the oracle-checked query.
    */
  def quantizedDot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) =>
        round(x.cast("double") * 1000).cast("long") *
          round(y.cast("double") * 1000).cast("long")),
      lit(0L), (acc, v) => acc + v)

  /** Brute-force top-k cosine neighbors for each query vector — the
    * baseline: cross join (broadcast queries), window rank.
    */
  def bruteForceTopK(embeddings: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val joined = embeddings.as("e").crossJoin(broadcast(queries.as("q")))
      .filter(col("e.vec_id") =!= col("q.vec_id"))
      .withColumn("sim", cosine(col("e.embedding"), col("q.embedding")))
    joined.withColumn("rank", row_number().over(
        Window.partitionBy(col("q.vec_id"))
          .orderBy(col("sim").desc, col("e.vec_id").asc)))
      .filter(col("rank") <= k)
      .select(col("q.vec_id").as("query_id"), col("e.vec_id").as("neighbor_id"),
        col("sim"), col("rank"))
  }

  /** IVF-style ANN: partition vectors into nCells buckets by nearest of
    * nCells random centroids (deterministic: centroids are the vectors of
    * the first nCells ids), search only the query's nProbe nearest cells.
    * The scale path: the shuffle key is the cell id; each cell is scanned
    * independently; recall is tunable with nProbe.
    */
  def ivfTopK(embeddings: DataFrame, queries: DataFrame, k: Int,
              nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    val centroids = embeddings.orderBy(col("vec_id")).limit(nCells)
      .select(col("vec_id").as("cell"), col("embedding").as("centroid"))
    // assign each vector to its nearest centroid
    def assign(df: DataFrame, vecCol: String, idCol: String, n: Int): DataFrame =
      df.crossJoin(broadcast(centroids))
        .withColumn("d", cosine(col(vecCol), col("centroid")))
        .withColumn("r", row_number().over(
          Window.partitionBy(col(idCol)).orderBy(col("d").desc, col("cell").asc)))
        .filter(col("r") <= n).drop("d", "r", "centroid")
    val cells = assign(embeddings, "embedding", "vec_id", 1)
    val probes = assign(
      queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb")),
      "q_emb", "q_id", nProbe)
    val scored = cells.join(probes, Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("sim", cosine(col("embedding"), col("q_emb")))
    scored.withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("vec_id").asc)))
      .filter(col("rank") <= k)
      .select(col("q_id").as("query_id"), col("vec_id").as("neighbor_id"),
        col("sim"), col("rank"))
  }

  /** Random-hyperplane LSH buckets for cosine: sign-bit signature of nBits
    * pseudo-random hyperplanes. The ±1 hyperplane weights are deterministic
    * (parity of xxh64("b:d")) and PRECOMPUTED driver-side as literal
    * arrays — the projection is a single zip_with/aggregate per bit over
    * constants, instead of re-hashing row×dim×bit at runtime.
    */
  def cosineLshBuckets(embeddings: DataFrame, nBits: Int = 16, dim: Int = 64): DataFrame = {
    val sigBits = (0 until nBits).map { b =>
      val weights = array((0 until dim).map(d =>
        lit(graft.gen.RefImpl.lshWeight(b, d))): _*)
      val proj = aggregate(
        zip_with(col("embedding"), weights, (x, w) => x * w),
        lit(0.0d), (acc, v) => acc + v)
      when(proj > 0, shiftleft(lit(1L), b)).otherwise(0L)
    }
    embeddings.select(col("vec_id"),
      sigBits.reduce((a, b) => a.bitwiseOR(b)).as("lsh_bucket"))
  }

  /** Embedding-cosine near-duplicate pairs: LSH-bucketed candidate
    * generation (same sign-signature bucket — an 8-byte join key), exact
    * cosine verification within buckets only. Never all-pairs: the join
    * is an equi-join on lsh_bucket, so at 100 TB the shuffle moves
    * (vec_id, bucket, embedding) once and each bucket verifies
    * independently. Recall is tuned with nBits (fewer bits → bigger
    * buckets → higher recall, more verification).
    */
  def cosineNearDupPairs(embeddings: DataFrame, minCos: Double,
                         nBits: Int = 8, dim: Int = 64): DataFrame = {
    val keyed = cosineLshBuckets(embeddings, nBits, dim)
      .join(embeddings, Seq("vec_id"))
    keyed.as("a").join(keyed.as("b"),
        col("a.lsh_bucket") === col("b.lsh_bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos", cosine(col("a.embedding"), col("b.embedding")))
      .filter(col("cos") >= minCos)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
  }
}
