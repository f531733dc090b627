package graft.functions

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column
  * (array<float>), Spark-first: the dot/norm inner loops are native
  * codegen expressions (graft.spark.VectorOps) with the exact arithmetic
  * of their former aggregate(zip_with(...)) built-in formulations — the
  * higher-order functions are CodegenFallback (interpreted per element),
  * which made the vector math the dominant per-row cost. No UDFs.
  */
object Similarity {

  /** Exact dot product of two vector columns. Native codegen expression
    * (graft.spark.DotCols) replacing the former
    * aggregate(zip_with(a, b, x*y), 0.0, +): higher-order functions are
    * CodegenFallback — an interpreted expression tree evaluated per
    * ELEMENT — so the inner loop of every cosine ran boxed. Bit-identical
    * totals: same float multiply, same left-to-right double accumulation,
    * same null/length semantics (VectorOps scaladoc).
    */
  def dot(a: Column, b: Column): Column = graft.spark.VectorOps.dotCols(a, b)

  /** sqrt of the sum of squares — SumSq is the native-codegen twin of
    * aggregate(transform(a, x*x), 0.0, +), same float square + double
    * accumulate.
    */
  def norm(a: Column): Column = sqrt(graft.spark.VectorOps.sumSq(a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Integer-quantized dot product (scale ×1000, round) — bit-exact across
    * engines, used by the oracle-checked query. Native codegen expression
    * replicating the former
    * aggregate(zip_with(a, b, round(x*1000).cast(long) * round(y*1000)
    * .cast(long)), 0L, +) verbatim, including Spark Round's BigDecimal
    * HALF_UP semantics (graft.spark.VectorOps.quantDotF).
    */
  def quantizedDot(a: Column, b: Column): Column =
    graft.spark.VectorOps.quantDot(a, b)

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

  /** IVF-style ANN with REAL centroids: deterministic seeded-sample
    * k-means — init = the nCells vectors with smallest (xxhash64(vec_id),
    * vec_id) (a seeded pseudo-random sample), then `lloydIters` Lloyd
    * steps. The centroid update is an order-independent integer sum of
    * ×1000-quantized components (map-side-combinable groupBy; Spark's
    * nondeterministic float-sum ordering can never perturb the model), one
    * double division at the end — so the trained centroids are bit-equal
    * to the independent mirror in RefImpl.ivfTopK regardless of
    * partitioning.
    *
    * Centroids are model parameters (nCells × dim doubles): they ride the
    * plan as LITERAL arrays, so assignment is a pure projection inside
    * whole-stage codegen — no join, no shuffle. The search remains an
    * equi-join on the cell id: each cell scans independently, recall tuned
    * with nProbe; per-iteration driver traffic is the nCells×dim centroid
    * matrix only.
    */
  def ivfTopK(embeddings: DataFrame, queries: DataFrame, k: Int,
              nCells: Int = 16, nProbe: Int = 4, lloydIters: Int = 2): DataFrame = {
    // cosine of a vector column against a constant centroid, arithmetic
    // order mirrored exactly by RefImpl.cosineD. The centroid rides the
    // plan as ONE array literal (typedlit), not dim CreateArray children —
    // the nCells×dim literal forest made analysis/optimization the
    // dominant cost of the whole operator — and |vec| is computed once per
    // row via a shared column instead of once per centroid (same value,
    // same division, bit-identical sims).
    def cosineTo(vecCol: Column, vnorm: Column, c: Array[Double]): Column = {
      val normC = math.sqrt(c.map(x => x * x).sum)
      // native codegen dot against the constant centroid (double multiply
      // after the float→double cast, left-to-right accumulation — exactly
      // the former aggregate(zip_with(vec, typedlit(c), x*y), 0.0, +),
      // which as a higher-order function evaluated an interpreted tree
      // per element). The centroid components AND |c| both ride the
      // codegen references array (DotConst weights / DoubleParam), never
      // the source text: a primitive lit(normC) was inlined into the
      // generated Java, so every Lloyd iteration's freshly-trained norms
      // made the assignment pipeline textually new and Janino recompiled
      // it per iteration. Same values, same division → bit-identical sims.
      graft.spark.VectorOps.dotConst(vecCol, c) /
        (vnorm * graft.spark.DoubleParam.col(normC))
    }
    // argmax over struct(sim, -cell): equal sims keep the smaller cell
    def cellStructs(vecCol: Column, vnorm: Column, cs: Array[Array[Double]]) =
      cs.zipWithIndex.map { case (c, i) =>
        struct(cosineTo(vecCol, vnorm, c).as("sim"), lit(-i).as("negcell")) }
    def nearestExpr(vecCol: Column, vnorm: Column, cs: Array[Array[Double]]): Column =
      array_max(array(cellStructs(vecCol, vnorm, cs): _*)).getField("negcell") * -1

    // (measured: a Dedup.spread parallelism floor here LOST ~0.8 s — the
    // per-iteration jobs are too small to amortize the extra exchange)
    val embs = embeddings

    // seeded deterministic init sample
    var centroids: Array[Array[Double]] = embs
      .select(col("vec_id"), col("embedding"))
      .orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(nCells)
      .collect().map(_.getSeq[Float](1).toArray.map(_.toDouble))
    val dim = centroids.head.length
    for (_ <- 1 to lloydIters) {
      // native ×1000 HALF_UP quantization — the former transform(embedding,
      // x => round(x*1000).cast(long)) ran an interpreted round per
      // element per Lloyd iteration (identical BigDecimal rounding)
      val qvec = graft.spark.QuantizeVec.col(col("embedding"))
      val rows = embs
        .withColumn("__vn", norm(col("embedding")))
        .select(nearestExpr(col("embedding"), col("__vn"), centroids).as("cell"), qvec.as("qv"))
        .groupBy(col("cell"))
        .agg(count(lit(1)).as("n"),
          (0 until dim).map(d => sum(element_at(col("qv"), d + 1)).as(s"s$d")): _*)
        .collect()
      val next = centroids.clone()
      rows.foreach { r =>
        val cell = r.getInt(0)
        val n = r.getLong(1)
        next(cell) = Array.tabulate(dim)(d => r.getLong(2 + d).toDouble / (1000.0 * n))
      } // cells with no members keep their previous centroid
      centroids = next
    }

    val cells = embs
      .withColumn("__vn", norm(col("embedding")))
      .withColumn("cell", nearestExpr(col("embedding"), col("__vn"), centroids))
      .drop("__vn")
    val probes = queries
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      .withColumn("__qn", norm(col("q_emb")))
      .select(col("q_id"), col("q_emb"),
        explode(slice(sort_array(
          array(cellStructs(col("q_emb"), col("__qn"), centroids): _*),
          asc = false), 1, nProbe)).as("p"))
      .select(col("q_id"), col("q_emb"), (col("p.negcell") * -1).as("cell"))
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
  /** Sign-signature of `nBits` hyperplanes starting at family index
    * `bitOffset` — shared by the single-table buckets and the banded
    * multi-table near-dup pairs (each table = an independent slice of the
    * same deterministic hyperplane family).
    */
  private def lshSignature(nBits: Int, dim: Int, bitOffset: Int): Column = {
    val sigBits = (0 until nBits).map { b =>
      // one references-array double[] per hyperplane (DotConst) instead of
      // dim CreateArray literal children: the nBits×dim (×nTables in the
      // near-dup caller, ×2 under its self-join) literal forest was pure
      // analyzer/optimizer weight — and the former zip_with/aggregate
      // projection was a CodegenFallback interpreted per element; the
      // native expression runs the identical double multiply-accumulate
      // as a primitive loop in generated code (bit-identical projections)
      val weights = Array.tabulate(dim)(d =>
        graft.gen.RefImpl.lshWeight(bitOffset + b, d))
      val proj = graft.spark.VectorOps.dotConst(col("embedding"), weights)
      when(proj > 0, shiftleft(lit(1L), b)).otherwise(0L)
    }
    sigBits.reduce((a, b) => a.bitwiseOR(b))
  }

  def cosineLshBuckets(embeddings: DataFrame, nBits: Int = 16, dim: Int = 64): DataFrame =
    embeddings.select(col("vec_id"), lshSignature(nBits, dim, 0).as("lsh_bucket"))

  /** Embedding-cosine near-duplicate pairs: banded multi-table LSH
    * candidate generation, exact cosine verification once per candidate.
    *
    * `nTables` INDEPENDENT sign-signatures of `nBits` hyperplanes each
    * (table t uses hyperplane family indices [t·nBits, (t+1)·nBits)); a
    * pair is a candidate if it collides in ANY table — the same
    * band/bucket shape as [[Dedup.minhashLshPairs]]. The join key is
    * (table, 8-byte signature), so bucket width is bounded by the
    * nBits-bit signature (expected N/2^nBits per bucket for non-dup
    * vectors) instead of one global 2^nBits-bucket partition: at 10^9
    * vectors, 16-bit tables hold ~15k random vectors per bucket, not
    * ~4M — the in-bucket verify stays near-linear. Recall is tuned with
    * nTables (more tables → more chances to collide); a true near-dup
    * cluster of course still shares buckets — its quadratic verify is the
    * answer itself, not overhead. Never all-pairs.
    */
  def cosineNearDupPairs(embeddings: DataFrame, minCos: Double,
                         nBits: Int = 16, dim: Int = 64,
                         nTables: Int = 16): DataFrame = {
    val banded = embeddings.select(col("vec_id"),
      posexplode(array((0 until nTables).map(t =>
        lshSignature(nBits, dim, t * nBits)): _*)).as(Seq("table", "sig")))
    val cands = banded.as("a").join(banded.as("b"),
        col("a.table") === col("b.table") && col("a.sig") === col("b.sig") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .distinct() // verify each candidate pair ONCE across tables
    cands
      .join(embeddings.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a")), Seq("vec_a"))
      .join(embeddings.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b")), Seq("vec_b"))
      .withColumn("cos", cosine(col("emb_a"), col("emb_b")))
      .filter(col("cos") >= minCos)
      .select(col("vec_a"), col("vec_b"))
  }
}
