package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession, Column}
import org.apache.spark.sql.functions._

/** Large-scale training-data deduplication operators over a `documents`
  * table (doc_id, text). Each is expressed Spark-first: shuffles only on
  * the candidate-generation keys (shingle / band / bucket), never all-pairs
  * except within buckets.
  */
object Dedup {

  /** Scale-adaptive parallelism floor (guide §2: derive partitioning from
    * input size, never from a constant tuned for one deployment): the
    * per-doc operators below are pure projections whose parallelism is
    * the SCAN's split count — right at scale (plenty of splits, zero
    * shuffles added), but a tiny local input reads as one split and would
    * serialize the whole compute on one core. When the scan provides
    * fewer splits than the session's default parallelism, round-robin the
    * rows out once; at real scale this is a no-op.
    */
  private[graft] def spread(docs: DataFrame): DataFrame = {
    if (docs.isStreaming) return docs // .rdd is undefined on streaming DFs
    val p = docs.sparkSession.sparkContext.defaultParallelism
    if (docs.rdd.getNumPartitions < p) docs.repartition(p) else docs
  }

  /** Exact dedupe: one keeper (min doc_id) per identical text.
    * At 100 TB: group on xxhash64(text) first so the shuffle moves 8-byte
    * keys, verify text equality within hash groups.
    */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(xxhash64(col("text")).as("text_hash"))
      .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** Distinct word n-grams of one document as an array Column, computed
    * in-row: gram i = tokens[i..i+n-1] joined by " ", per-doc dedupe
    * keeping first occurrence. Same (doc, gram) set as the former
    * posexplode + window-lead + global distinct formulation, with zero
    * exchanges (guide §2.4: the window exchange on doc_id and the
    * distinct exchange both disappear — the dedupe scope was
    * per-document all along, so no data ever needed to move for it).
    *
    * Native codegen expression (graft.spark.GramArray): the intermediate
    * array-built-in form (zip_with of the token array against its own
    * shifted slices + concat_ws + array_distinct) computed the identical
    * set, but higher-order functions are CodegenFallback — an
    * interpreted expression tree per token — which made gram building
    * the dominant per-row cost of the whole dedup family once the
    * shuffles were gone. Value parity pinned in ShingleOpsSpec against
    * the HOF form verbatim.
    */
  private[functions] def gramArray(textCol: Column, n: Int): Column =
    graft.spark.ShingleOps.gramArray(textCol, n)

  /** Word-shingle set per document — explode of [[gramArray]]: a pure
    * projection, no shuffle (explode drops empty arrays, so docs with no
    * full n-gram are absent exactly as before).
    */
  def shingles(docs: DataFrame, n: Int = 2): DataFrame =
    spread(docs).select(col("doc_id"), explode(gramArray(col("text"), n)).as("gram"))

  /** Candidate pairs with n-gram Jaccard ≥ threshold, computed with an
    * integer-only test (3·common ≥ |A|+|B| ⟺ J ≥ 0.5 for the default) to
    * stay float-free. Shuffle = shingle join (inverted index), classic
    * "small candidate set" shape; hot shingles can be dropped by df
    * frequency cap for scale.
    *
    * The df cap itself is skew-proof: document frequency comes from a
    * map-side-combinable `groupBy(gram).count` (partial aggregation
    * collapses a mega-gram per input partition before the exchange — a
    * window over gram would put every occurrence of the hottest gram in
    * ONE partition first, recreating the exact straggler the cap guards
    * against), and the HOT grams — at most Σoccurrences/cap distinct
    * values, tiny by construction — broadcast into a left-anti, so the
    * full shingle set never shuffles just to learn its df.
    */
  def ngramJaccardPairs(docs: DataFrame, n: Int = 2, maxShingleFreq: Int = 1000): DataFrame = {
    val d = spread(docs)
    val sh = shingles(d, n)
    // |shingle set| per doc is a property of the row alone: size of the
    // distinct-gram array, no exchange (was a groupBy over every exploded
    // shingle row). cast keeps the former count(*) long type.
    val sizes = d.select(col("doc_id"),
      size(gramArray(col("text"), n)).cast("long").as("sz"))
    val rare =
      if (maxShingleFreq == Int.MaxValue) sh // exact twin: nothing to cap
      else {
        val hot = sh.groupBy(col("gram")).agg(count(lit(1)).as("df"))
          .filter(col("df") > maxShingleFreq).select(col("gram"))
        sh.join(broadcast(hot), Seq("gram"), "left_anti")
      }
    val pairs = rare.as("a").join(rare.as("b"),
        col("a.gram") === col("b.gram") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("common"))
    pairs
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "size_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "size_b"), "doc_b")
      .filter(col("common") * 3 >= col("size_a") + col("size_b")) // J ≥ 0.5
      .select(col("doc_a"), col("doc_b"), col("common"), col("size_a"), col("size_b"))
  }

  /** MinHash signatures: k permutations via affine transforms of xxhash64.
    * Returns (doc_id, sig: array<bigint>). All built-ins — the per-doc min
    * over shingle hashes is a groupBy aggregate (map-side combinable).
    */
  def minhashSignatures(docs: DataFrame, k: Int = 32, shingleN: Int = 2): DataFrame = {
    // permutation i = xxhash64("i:" + gram) — ANSI-safe (no wrapping
    // arithmetic), independent hash families by seed prefix; the
    // single-string form is reproducible by the plain-Scala oracle
    // implementation (graft.gen.RefImpl.minhashSig).
    //
    // The signature is a per-document property, so the whole operator is
    // a PROJECTION over the gram array — the former explode + groupBy(16
    // min-aggregates) exchange is gone (guide §2.4); min over the same
    // distinct-gram set → identical values. Docs with no full n-gram had
    // no shingle rows and were absent from the groupBy — the size>0
    // filter preserves that. The k min-scans are one native codegen pass
    // (graft.spark.MinhashSig) hashing the exact "i:"++gram bytes the
    // former k× array_min(transform(g, xxhash64(concat(...)))) chain
    // hashed — that chain was k interpreted per-element walks per row.
    spread(docs).select(col("doc_id"), gramArray(col("text"), shingleN).as("g"))
      .filter(size(col("g")) > 0)
      .select(col("doc_id"),
        graft.spark.ShingleOps.minhashSig(col("g"), k).as("sig"))
  }

  /** MinHash-LSH candidate pairs: band the signature, bucket-join on
    * (band, hash(band slice)). bands*rows = k. The join key is a single
    * 8-byte hash → minimal shuffle.
    */
  def minhashLshPairs(docs: DataFrame, k: Int = 32, bands: Int = 8,
                      shingleN: Int = 2): DataFrame = {
    val rows = k / bands
    val sig = minhashSignatures(docs, k, shingleN)
    val banded = sig.select(col("doc_id"),
        posexplode(array((0 until bands).map(b =>
          xxhash64(concat_ws(",",
            (0 until rows).map(r => col("sig")(b * rows + r)): _*))): _*))
          .as(Seq("band", "bucket")))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** SimHash (64-bit) per document: sign-sum of token-hash bits weighted by
    * term frequency; near-dups have small Hamming distance.
    */
  def simhash(docs: DataFrame): DataFrame = {
    // per bit: sum over token OCCURRENCES of (bit ? +1 : -1) — identical
    // integer totals to the former per-(doc, w) tf pre-aggregation
    // (Σ_w tf_w·s_w ≡ Σ_occurrences s_w), with one exchange instead of
    // two: the (doc_id, w) groupBy existed only to count tf, which the
    // occurrence-level sum already folds in. Partial aggregation still
    // collapses each doc to one 64-column row per map partition before
    // the exchange.
    val tokens = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .withColumn("h", xxhash64(col("w")))
    val bitSums = (0 until 64).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1L)
        .otherwise(-1L)).as(s"b$b")
    }
    val sums = tokens.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    val hash = (0 until 64).map(b =>
      when(col(s"b$b") > 0, shiftleft(lit(1L), b)).otherwise(0L))
      .reduce((a, b) => a.bitwiseOR(b))
    sums.select(col("doc_id"), hash.as("simhash"))
  }

  /** SimHash near-dup pairs within Hamming distance maxDist, using the
    * pigeonhole trick: split 64 bits into (maxDist+1) blocks; any pair
    * within maxDist agrees exactly on ≥1 block → block-join, verify.
    */
  def simhashPairs(docs: DataFrame, maxDist: Int = 3): DataFrame = {
    val blocks = maxDist + 1
    val width = 64 / blocks
    val sh = simhash(docs)
    val keyed = sh.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until blocks).map(b =>
        shiftright(col("simhash"), b * width)
          .bitwiseAND((1L << width) - 1)): _*)).as(Seq("block", "key")))
    val popcount = (x: Column) => bit_count(x)
    keyed.as("a").join(keyed.as("b"),
        col("a.block") === col("b.block") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        popcount(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }

  /** Rolling-hash document fingerprint (winnowing-lite): min xxhash64 over
    * each w-token window, distinct mins = fingerprint set.
    */
  def fingerprints(docs: DataFrame, window: Int = 4): DataFrame = {
    // fp at position i = min token hash over [i, i+window) — a property
    // of the row's own token sequence, so it is a projection (short tail
    // windows shrink exactly like the former rowsBetween frame / slice)
    // with first-occurrence dedupe replacing the global distinct: zero
    // exchanges where the window + distinct formulation had two (guide
    // §2.4). The hash + rolling-min + dedupe is one native codegen pass
    // (graft.spark.FingerprintSet) — the intermediate transform/
    // array_min(slice)/array_distinct chain recomputed an interpreted
    // min-scan per token. Values identical (ShingleOpsSpec pins parity).
    docs.select(col("doc_id"),
      explode(graft.spark.ShingleOps.fingerprintSet(col("text"), window)).as("fp"))
  }
}
