package graft.spark

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

/** The native shingle/MinHash/fingerprint expressions must be
  * VALUE-IDENTICAL to the higher-order-function chains they replaced —
  * same tokenization (split " " limit -1, trailing empties kept), same
  * gram join, same first-occurrence dedupe order, same "i:"++gram hash
  * bytes, same shrinking tail windows. Pinned against the original HOF
  * chains evaluated side by side, plus RefImpl (the independent oracle
  * mirror) on the edge strings.
  */
class ShingleOpsSpec extends AnyFunSuite {
  private lazy val spark = graft.engine.EngineSpec.spark

  // the exact former formulations, kept verbatim as the executable spec
  private def hofGramArray(textCol: Column, n: Int): Column = {
    val toks = split(textCol, " ")
    if (n <= 1) array_distinct(toks)
    else {
      val len = greatest(size(toks) - (n - 1), lit(0))
      var grams: Column = slice(toks, lit(1), len)
      for (j <- 1 until n)
        grams = zip_with(grams, slice(toks, lit(j + 1), len),
          (g, t) => concat_ws(" ", g, t))
      array_distinct(grams)
    }
  }
  private def hofMinhash(g: Column, k: Int): Column =
    array((0 until k).map(i =>
      array_min(transform(g, x => xxhash64(concat(lit(s"$i:"), x))))): _*)
  private def hofFingerprints(textCol: Column, window: Int): Column = {
    val hs = transform(split(textCol, " "), t => xxhash64(t))
    // two-step to mirror the former hs-column indirection
    array_distinct(transform(hs, (h, i) => array_min(slice(hs, i + 1, lit(window)))))
  }

  private val edgeTexts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a a a a a",                      // heavy duplication
    "  leading double space",         // leading empties
    "trailing space ",                // trailing empty kept by limit -1
    "double  space  inside",          // empty tokens mid-string
    "single",                         // fewer tokens than n
    "",                               // empty text → [""]
    " ",                              // two empty tokens
    "päße ünïcode 日本語 text ümlauts", // multi-byte UTF-8
    "x y x y x y z"                   // repeated grams, order matters
  )

  private def df = {
    import spark.implicits._
    edgeTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  test("GramArray bit-equal to the zip_with/concat_ws/array_distinct chain (n=1,2,3)") {
    for (n <- Seq(1, 2, 3)) {
      val rows = df.select(
        ShingleOps.gramArray(col("text"), n).as("native"),
        hofGramArray(col("text"), n).as("hof")).collect()
      rows.foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1), s"n=$n")
      }
    }
  }

  test("GramArray matches RefImpl shingle SET") {
    val rows = df.select(col("text"),
      ShingleOps.gramArray(col("text"), 2).as("g")).collect()
    rows.foreach { r =>
      assert(r.getSeq[String](1).toSet == graft.gen.RefImpl.shingles(r.getString(0), 2))
    }
  }

  test("MinhashSig bit-equal to k× array_min(transform(xxhash64(concat)))") {
    val g = ShingleOps.gramArray(col("text"), 2)
    val rows = df.select(
      ShingleOps.minhashSig(g, 16).as("native"),
      hofMinhash(g, 16).as("hof")).collect()
    rows.foreach { r =>
      // empty gram arrays → all-null mins in both forms
      assert(r.getSeq[java.lang.Long](0) == r.getSeq[java.lang.Long](1))
    }
  }

  test("MinhashSig matches RefImpl.minhashSig on non-empty docs") {
    val rows = df.select(col("text"),
      ShingleOps.minhashSig(ShingleOps.gramArray(col("text"), 2), 16).as("s"))
      .collect()
    rows.foreach { r =>
      val text = r.getString(0)
      if (graft.gen.RefImpl.shingles(text, 2).nonEmpty)
        assert(r.getSeq[Long](1) == graft.gen.RefImpl.minhashSig(text, 16).toSeq, text)
    }
  }

  test("FingerprintSet bit-equal to the transform/array_min(slice)/distinct chain") {
    val rows = df.select(
      ShingleOps.fingerprintSet(col("text"), 4).as("native"),
      hofFingerprints(col("text"), 4).as("hof")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
  }

  test("FingerprintSet matches RefImpl fingerprint SET") {
    val rows = df.select(col("text"),
      ShingleOps.fingerprintSet(col("text"), 4).as("fp")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](1).toSet == graft.gen.RefImpl.fingerprints(r.getString(0), 4))
    }
  }

  test("null text propagates to null in all three") {
    import spark.implicits._
    val d = Seq((1L, Option.empty[String]), (2L, Some("a b c"))).toDF("doc_id", "text")
    val r = d.select(
      ShingleOps.gramArray($"text", 2).as("g"),
      ShingleOps.minhashSig(ShingleOps.gramArray($"text", 2), 4).as("s"),
      ShingleOps.fingerprintSet($"text", 4).as("f")
    ).orderBy(d("doc_id")).collect()
    assert(r(0).isNullAt(0) && r(0).isNullAt(1) && r(0).isNullAt(2))
    assert(!r(1).isNullAt(0) && !r(1).isNullAt(1) && !r(1).isNullAt(2))
  }
}
