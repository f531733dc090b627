package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.gen.RefImpl

/** The independent oracle implementations must agree with the Spark-side
  * operators — in particular the from-spec xxHash64 must be bit-identical
  * to Spark's xxhash64() for every input length class (empty, <4, <8,
  * <32, multi-stripe, non-ASCII).
  */
class RefImplSpec extends AnyFunSuite {
  private lazy val spark = graft.engine.EngineSpec.spark

  test("xxh64 matches Spark xxhash64 across length classes") {
    import spark.implicits._
    val samples = Seq("", "a", "ab", "abc", "abcd", "abcde", "abcdefg",
      "abcdefgh", "0123456789abcdef", "0123456789abcdef0123456789abcde",
      "0123456789abcdef0123456789abcdef",
      "0123456789abcdef0123456789abcdef0123456789abcdef0123456789abcdefXYZ",
      "héllo wörld ünïcode ✓", "the quick brown fox jumps over the lazy dog",
      "0:the data", "13:crawl web")
    val sparkHashes = samples.toDF("s").select(col("s"), xxhash64(col("s")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    samples.foreach { s =>
      assert(RefImpl.xxh64s(s) == sparkHashes(s), s"mismatch for '$s'")
    }
  }

  test("xxh64long matches Spark xxhash64 on LongType (k-means init seed)") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 7L, 42L, -1L, Long.MaxValue, Long.MinValue, 123456789L)
    val sparkHashes = ids.toDF("v").select(col("v"), xxhash64(col("v")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ids.foreach(v => assert(RefImpl.xxh64long(v) == sparkHashes(v), s"mismatch for $v"))
  }

  test("ivfTopK (seeded k-means) agrees exactly with the RefImpl mirror") {
    import spark.implicits._
    val embs = graft.gen.OracleData.embeddingsSeq
    val sparkOut = Similarity.ivfTopK(
        embs.toDF("vec_id", "embedding"),
        embs.filter(_._1 < 10).toDF("vec_id", "embedding"),
        k = 5, nCells = 8, nProbe = 3)
      .select("query_id", "neighbor_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val refOut = RefImpl.ivfTopK(embs, (0L until 10L), k = 5, nCells = 8, nProbe = 3).toSet
    assert(sparkOut == refOut, "Spark k-means IVF must be bit-equal to the independent mirror")
  }

  test("minhash / simhash / fingerprints / lsh bucket agree with Spark queries on a sample") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the data crawl web spark engine scale fast queue host"),
      (2L, "the data crawl web spark engine scale fast queue host"),
      (3L, "link page text dedup hash band token wave fetch robot"),
      (4L, "link page text dedup hash band token wave fetch robots")
    ).toDF("doc_id", "text")

    val sparkSig = Dedup.minhashSignatures(docs, k = 8).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    Seq(1L, 3L, 4L).foreach { id =>
      val text = Seq("the data crawl web spark engine scale fast queue host",
        "", "link page text dedup hash band token wave fetch robot",
        "link page text dedup hash band token wave fetch robots")(
        if (id == 1L) 0 else id.toInt - 1)
      assert(sparkSig(id).toSeq == RefImpl.minhashSig(text, 8).toSeq, s"minhash doc $id")
    }

    val sparkSim = Dedup.simhash(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sparkSim(1L) == RefImpl.simhash("the data crawl web spark engine scale fast queue host"))
    assert(sparkSim(3L) == RefImpl.simhash("link page text dedup hash band token wave fetch robot"))

    val sparkFp = Dedup.fingerprints(docs).collect()
      .groupBy(_.getLong(0)).map { case (k, v) => k -> v.map(_.getLong(1)).toSet }
    assert(sparkFp(1L) == RefImpl.fingerprints("the data crawl web spark engine scale fast queue host"))

    val emb = Seq((1L, Array(0.5f, -0.25f, 0.75f, -1.0f)),
      (2L, Array(-0.1f, 0.9f, 0.3f, 0.2f))).toDF("vec_id", "embedding")
    val sparkBuckets = Similarity.cosineLshBuckets(emb, nBits = 8, dim = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sparkBuckets(1L) == RefImpl.cosLshBucket(Array(0.5f, -0.25f, 0.75f, -1.0f), 8))
    assert(sparkBuckets(2L) == RefImpl.cosLshBucket(Array(-0.1f, 0.9f, 0.3f, 0.2f), 8))
  }
}
