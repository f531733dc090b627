package graft.tools

import org.apache.spark.sql.SparkSession

/** Optimization-round instrument: Janino compile counts of the IVF
  * operator's phases (Lloyd iterations run eagerly during construction;
  * the search query executes twice). If per-iteration codegen text were
  * stable, iterations 2..n and the final assignment would reuse
  * iteration 1's classes.
  */
object IvfCompileProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("ivf-compile-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.metrics.source.CodegenMetrics
    def c: Long = CodegenMetrics.METRIC_COMPILATION_TIME.getCount
    def secs: Double = {
      val n = CodegenMetrics.METRIC_COMPILATION_TIME.getCount
      CodegenMetrics.METRIC_COMPILATION_TIME.getSnapshot.getMean * n / 1e3
    }
    import org.apache.spark.sql.functions._
    for (rep <- 1 to 2) {
      val (c0, s0) = (c, secs)
      val t0 = System.nanoTime()
      val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val df = graft.functions.Similarity.ivfTopK(e,
        e.filter(col("vec_id") < 10), k = 10, nCells = 16, nProbe = 4)
      val t1 = System.nanoTime()
      val (c1, s1) = (c, secs)
      df.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      val (c2, s2) = (c, secs)
      println(f"IVF_PROBE rep=$rep lloyd_wall=${(t1 - t0) / 1e9}%.2f " +
        f"lloyd_compiles=${c1 - c0} lloyd_csecs=${s1 - s0}%.2f " +
        f"exec_wall=${(t2 - t1) / 1e9}%.2f exec_compiles=${c2 - c1} " +
        f"exec_csecs=${s2 - s1}%.2f")
    }
    spark.stop()
  }
}
