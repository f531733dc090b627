package graft.tools

import org.apache.spark.sql.SparkSession

/** Repeated wall-clock timing of one named SparkEntry query in a single
  * JVM — the A/B instrument for per-query bench regressions (e.g. the
  * round-4 `crawl_2waves` 29→126 s question): N reps in one session
  * separate JIT/first-plan cost (rep 1) from steady-state (reps 2+), and
  * a window probe before/after tags the measurement with the co-tenant
  * state so a slow wall self-identifies.
  *
  * Usage: runMain graft.tools.QueryTimer <name> [reps=3] [sfDir] [cores=32]
  */
object QueryTimer {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = if (args.length > 2) args(2) else
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cores = if (args.length > 3) args(3).toInt else 32
    val fn = graft.SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query: $name (have ${graft.SparkEntry.queries.keys.toSeq.sorted})"))
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"query-timer-$name")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (ser0, par0) = graft.Bench.windowProbe(cores)
    System.err.println(f"PROBE_BEFORE serial=$ser0%.2f parallel=$par0%.2f " +
      f"(models ${graft.Bench.ProbeSerModel}/${graft.Bench.ProbeParModel})")
    (1 to reps).foreach { rep =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => fn(spark, sfDir).count() }
      println(f"QUERY_TIME name=$name rep=$rep secs=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    val (ser1, par1) = graft.Bench.windowProbe(cores)
    System.err.println(f"PROBE_AFTER serial=$ser1%.2f parallel=$par1%.2f")
    spark.stop()
  }
}
