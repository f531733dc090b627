package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import graft.wave.Wave
import graft.frontier.FrontierStore

/** Storage-encoding round trips: the wave log and frontier physical
  * layouts elide redundant URL strings at rest (Wave.encodeLog /
  * FrontierStore.encodeFrontier); decode∘encode must be the identity on
  * the logical schema — through an actual parquet write/read, since that
  * is the seam the crawl loop uses.
  */
class LogCodecSpec extends AnyFunSuite {
  import EngineSpec._

  private def roundTrip(df: org.apache.spark.sql.DataFrame,
                        enc: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
                        dec: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
                        readSchema: org.apache.spark.sql.types.StructType): Seq[Row] = {
    val dir = tmpDir("codec")
    enc(df).write.mode("overwrite").parquet(dir)
    val back = dec(spark.read.schema(readSchema).parquet(dir))
    back.select(df.columns.map(col): _*).collect().toSeq
  }

  test("encodeLog/decodeLog is identity through parquet (all disposition arms)") {
    val s = spark
    import s.implicits._
    // claimed rows (cand cols null) + cand rows (claimed cols null),
    // covering: seed self-reference, distinct seed, parent_seed==parent,
    // raw==href, raw!=href, rejected (href null), every disposition code
    val claimed = Seq(
      ("http://a.com/", "http://a.com/", "FETCHED"), // seed: seed_id == url_canon
      ("http://a.com/x", "http://a.com/", "SEEN") // asset: distinct seed
    ).toDF("url_canon", "seed_id", "disposition")
      .withColumn("row_type", lit("claimed"))
    val cands = (Wave.CandDisp.values.zipWithIndex.map { case (d, i) =>
      (s"http://p.com/$i", s"http://p.com/$i", s"/l$i", s"http://p.com/l$i", d)
    } ++ Seq(
      ("http://p.com/a", "http://seed.com/", "http://t.com/x", "http://t.com/x", "PASS"),
      ("http://p.com/b", "http://p.com/b", "::bad::", null, "REJECT_PARSE_ERROR")))
      .toDF("parent_canon", "parent_seed", "raw_link", "href", "cand_disposition")
      .withColumn("row_type", lit("cand"))
    val all = claimed.columns ++ cands.columns.filterNot(claimed.columns.contains)
    def widen(df: org.apache.spark.sql.DataFrame) =
      df.select(all.map(c => if (df.columns.contains(c)) col(c)
                             else lit(null).cast("string").as(c)): _*)
    val unified = widen(claimed).unionByName(widen(cands))
    val back = roundTrip(unified, Wave.encodeLog, Wave.decodeLog,
      Wave.encodedLogSchema(unified.schema))
    assert(back.toSet == unified.collect().toSet)
  }

  test("encodeLog raises on a disposition outside the closed set") {
    val s = spark
    import s.implicits._
    val bad = Seq(("http://p/", "http://p/", "x", "x", "NOT_A_DISPOSITION"))
      .toDF("parent_canon", "parent_seed", "raw_link", "href", "cand_disposition")
      .withColumn("row_type", lit("cand"))
      .withColumn("url_canon", lit(null).cast("string"))
      .withColumn("seed_id", lit(null).cast("string"))
    val e = intercept[Exception] { Wave.encodeLog(bad).collect() }
    assert(e.getMessage.contains("cand_disposition") ||
      Option(e.getCause).exists(_.getMessage.contains("cand_disposition")))
  }

  test("encodeFrontier/decodeFrontier is identity through parquet") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      // seed: id == url == url_canon == seed_id (fully elided at rest)
      ("http://a.com/", "http://a.com/", "http://a.com/", "a.com", 3,
        "http://a.com/", "", "seed", 0, 0, 0, 0, 0L),
      // asset with a raw url differing from canon and a distinct seed
      ("http://b.com/x", "http://B.com/x?", "http://b.com/x", "b.com", 7,
        "http://a.com/", "http://a.com/", "asset", 1, 0, 0, 0, 2L))
      .toDF("id", "url", "url_canon", "host", "host_bucket", "seed_id",
        "via", "kind", "depth", "hops", "redirects", "css_jump", "ts")
    val back = roundTrip(rows, FrontierStore.encodeFrontier,
      FrontierStore.decodeFrontier,
      org.apache.spark.sql.types.StructType.fromDDL(FrontierStore.frontierDdl))
    assert(back.toSet == rows.collect().toSet)
    // the physical file must actually elide: no id column, null url/seed_id
    val dir = tmpDir("codec-f")
    FrontierStore.encodeFrontier(rows).write.mode("overwrite").parquet(dir)
    val raw = spark.read.parquet(dir)
    assert(!raw.columns.contains("id"))
    assert(raw.filter(col("url").isNull && col("seed_id").isNull).count() == 1)
  }
}
