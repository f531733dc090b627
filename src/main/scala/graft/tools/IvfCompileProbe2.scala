package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

/** Isolate which part of the Lloyd-iteration plan changes codegen text
  * when only centroid VALUES change: run the identical aggregation job
  * with two different centroid matrices and count Janino compiles on the
  * second (0 ⇒ full text stability).
  */
object IvfCompileProbe2 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.metrics.source.CodegenMetrics
    def c: Long = CodegenMetrics.METRIC_COMPILATION_TIME.getCount

    def cosineTo(vecCol: Column, vnorm: Column, cc: Array[Double]): Column = {
      val normC = math.sqrt(cc.map(x => x * x).sum)
      val dotC = aggregate(
        zip_with(vecCol, typedlit(cc), (x, y) => x * y),
        lit(0.0d), (acc, v) => acc + v)
      dotC / (vnorm * graft.spark.DoubleParam.col(normC))
    }
    def nearestExpr(vecCol: Column, vnorm: Column, cs: Array[Array[Double]]): Column =
      array_max(array(cs.zipWithIndex.map { case (cc, i) =>
        struct(cosineTo(vecCol, vnorm, cc).as("sim"), lit(-i).as("negcell")) }: _*))
        .getField("negcell") * -1

    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val dim = 64
    def runIter(cs: Array[Array[Double]], label: String): Unit = {
      val qvec = transform(col("embedding"),
        x => round(x.cast("double") * 1000).cast("long"))
      val c0 = c; val t0 = System.nanoTime()
      embs.withColumn("__vn", graft.functions.Similarity.norm(col("embedding")))
        .select(nearestExpr(col("embedding"), col("__vn"), cs).as("cell"), qvec.as("qv"))
        .groupBy(col("cell"))
        .agg(count(lit(1)).as("n"),
          (0 until dim).map(d => sum(element_at(col("qv"), d + 1)).as(s"s$d")): _*)
        .collect()
      println(f"ITER $label wall=${(System.nanoTime() - t0) / 1e9}%.2f compiles=${c - c0}")
    }
    val cs1 = Array.tabulate(16, dim)((i, d) => (i * dim + d + 1).toDouble / 1000)
    val cs2 = Array.tabulate(16, dim)((i, d) => (i * dim + d + 7).toDouble / 997)
    runIter(cs1, "first")
    runIter(cs2, "second-different-values")
    runIter(cs2, "third-same-values")
    spark.stop()
  }
}
