package graft.spark

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.canon.Canon

/** Native Fnv64a Expression: parity with the pure-Scala reference hash,
  * null propagation, and whole-stage codegen participation.
  */
class Fnv64aSpec extends AnyFunSuite {
  private lazy val spark = graft.engine.EngineSpec.spark

  test("expression matches Canon.fnv64a on a corpus of urls") {
    import spark.implicits._
    val urls = Seq("", "a", "hello", "http://example.com/",
      "https://sub.host.org/path?q=1&r=2", "日本語のURL/パス")
    val got = urls.toDF("u")
      .select($"u", Fnv64a($"u").as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    urls.foreach { u => assert(got(u) == Canon.fnv64a(u), u) }
  }

  test("null propagation") {
    import spark.implicits._
    val df = Seq(Some("x"), None).toDF("u").select(Fnv64a($"u").as("h"))
    val rows = df.collect()
    assert(rows.count(_.isNullAt(0)) == 1)
  }

  test("participates in whole-stage codegen") {
    import spark.implicits._
    graft.gen.OracleData.ensure(spark)
    val df = spark.read.parquet(s"${graft.gen.OracleData.Dir}/frontier")
      .select(Fnv64a($"url_canon").as("h"))
      .filter($"h" =!= 0L)
    val plan = df.queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators fused into WholeStageCodegen
    assert(plan.contains("*(1) Project [fnv64a("), plan)
    assert(df.count() > 0)
  }
}
