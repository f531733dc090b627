package graft.tools

import org.apache.spark.sql.SparkSession

/** Optimization-round instrument: where does the sweep's crawl_2waves
  * time go in a Bench.newSession-shaped session (default 100-entry
  * codegen cache)? Runs the fixture loop twice and splits wall into
  * Janino compile time (CodegenMetrics) vs everything else, per run.
  */
object CrawlSweepProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("crawl-sweep-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // per-execution Catalyst phase attribution (analysis/optimization/
    // planning) + execution wall, keyed by the write's job description
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit = {
        val ph = qe.tracker.phases.map { case (k, v) =>
          f"$k=${(v.endTimeMs - v.startTimeMs) / 1e3}%.2f" }.mkString(" ")
        val p = qe.executedPlan.toString.toLowerCase
        def n(s: String) = p.sliding(s.length).count(_ == s)
        println(f"  QE $funcName total=${durationNs / 1e9}%.2f $ph " +
          f"pathof=${n("pathof")} filtertest=${n("filtertest")} " +
          f"robotsallow=${n("robotsallow")} canonudf=${n("udf(")}")
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    })
    import org.apache.spark.metrics.source.CodegenMetrics
    def compiles: (Long, Double) = {
      val n = CodegenMetrics.METRIC_COMPILATION_TIME.getCount
      (n, CodegenMetrics.METRIC_COMPILATION_TIME.getSnapshot.getMean * n / 1e3)
    }
    def genClasses: Long = CodegenMetrics.METRIC_GENERATED_CLASS_BYTECODE_SIZE.getCount
    for (rep <- 1 to 3) {
      val (c0, s0) = compiles; val g0 = genClasses
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries("crawl_2waves")(spark, "/root/testdata/sf0.1")
      val tPlan = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t1 = System.nanoTime()
      val (c1, s1) = compiles; val g1 = genClasses
      println(f"CRAWL_PROBE rep=$rep wall=${(t1 - t0) / 1e9}%.2f " +
        f"build=${(tPlan - t0) / 1e9}%.2f compile_n=${c1 - c0} " +
        f"compile_secs=${s1 - s0}%.2f classes=${g1 - g0}")
    }
    spark.stop()
  }
}
