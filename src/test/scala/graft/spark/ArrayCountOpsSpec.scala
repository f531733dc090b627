package graft.spark

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

/** LinkKindCount / StopHits / QuantizeVec must be value-identical to the
  * higher-order-function chains they replaced (filter-drop-null rules,
  * size-of-null null, HALF_UP quantization) — pinned against the former
  * formulations kept verbatim.
  */
class ArrayCountOpsSpec extends AnyFunSuite {
  private lazy val spark = graft.engine.EngineSpec.spark

  private def hofKindCount(links: Column, kind: String): Column =
    size(filter(links, l => l.getField("kind") === kind))
  private def hofStopHits(tokens: Column, stops: Seq[String]): Column =
    size(filter(tokens, t => stops.map(s => t === s).reduce(_ || _)))
  private def hofQuantize(a: Column): Column =
    transform(a, x => round(x.cast("double") * 1000).cast("long"))

  test("LinkKindCount equals size(filter(getField===kind)) incl. null rules") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        | (array(named_struct('link','a','kind','outlink'),
        |        named_struct('link','b','kind','asset'),
        |        named_struct('link','c','kind','outlink'))),
        | (array(named_struct('link','d','kind',cast(null as string)))),
        | (cast(null as array<struct<link:string,kind:string>>)),
        | (array(cast(null as struct<link:string,kind:string>))),
        | (array())
        |AS t(links)""".stripMargin
        .replace("(array())",
          "(cast(array() as array<struct<link:string,kind:string>>))"))
    val rows = df.select(
      LinkKindCount.col(col("links"), "outlink").as("n"),
      hofKindCount(col("links"), "outlink").as("h")).collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getInt(0) == r.getInt(1))
    }
    assert(rows.count(_.isNullAt(0)) == 1) // only the null array row
  }

  test("StopHits equals the 8-way OR filter count") {
    import spark.implicits._
    val stops = Seq("the", "and", "of", "to", "in", "is", "that", "for")
    val df = Seq(
      "the cat and the dog of a for in",
      "no stopwords here",
      "",
      "the the the the").toDF("text")
      .select(split(lower(col("text")), "\\s+", -1).as("toks"))
    val rows = df.select(
      StopHits.col(col("toks"), stops).as("n"),
      hofStopHits(col("toks"), stops).as("h")).collect()
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1)))
    assert(rows.map(_.getInt(0)).toSeq == Seq(6, 0, 0, 4))
  }

  test("QuantizeVec equals transform(round(x*1000).cast(long)) incl. ties and nulls") {
    val df = spark.sql(
      """SELECT array(cast(0.0015 as float), cast(-0.0025 as float),
        |             cast(1.5 as float), cast(-1.5 as float),
        |             cast(null as float), cast(0.33333 as float)) AS v
        |UNION ALL SELECT cast(null as array<float>)""".stripMargin)
    val rows = df.select(
      QuantizeVec.col(col("v")).as("n"),
      hofQuantize(col("v")).as("h")).collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1))
      if (!r.isNullAt(0))
        assert(r.getSeq[java.lang.Long](0) == r.getSeq[java.lang.Long](1))
    }
    // double-element arrays take the double kernel
    val d = spark.sql("SELECT array(0.0005d, -0.0005d, 2.7d) AS v")
      .select(QuantizeVec.col(col("v")).as("n"), hofQuantize(col("v")).as("h"))
      .collect()(0)
    assert(d.getSeq[Long](0) == d.getSeq[Long](1))
  }
}
