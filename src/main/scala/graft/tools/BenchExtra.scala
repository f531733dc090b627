package graft.tools

import org.apache.spark.sql.SparkSession

/** Optimization-round instrument (guide §1.4): per-query isolation of the
  * driver sweep with a planning/execution split and plan dumps.
  *
  * For every query in the driver sweep (SparkEntry.queries + the Bench
  * scale twins replicated here), in the SAME session config the frozen
  * Bench.newSession uses, measures:
  *   - plan_secs:  analysis + optimization + physical planning (forcing
  *                 queryExecution.executedPlan)
  *   - exec1_secs: first noop execution (codegen compile + run)
  *   - exec2_secs: second noop execution (steady state)
  * and optionally writes `.explain("formatted")` to a plans directory.
  *
  * Usage: runMain graft.tools.BenchExtra [plansDir|-] [suffix] [nameFilter...]
  * Env:   SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as in Bench.
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val plansDir = args.headOption.filter(_ != "-")
    val suffix = args.lift(1).getOrElse("before")
    val filter = args.drop(2).toSet
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("zenospark-bench-extra")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (ser, par) = graft.Bench.windowProbe(cpus)
    System.err.println(f"PROBE serial=$ser%.2f parallel=$par%.2f " +
      f"(models ${graft.Bench.ProbeSerModel}/${graft.Bench.ProbeParModel})")

    import org.apache.spark.sql.functions._
    def sf(s: SparkSession, dir: String, name: String) =
      s.read.parquet(s"$dir/$name.parquet")
    // same five scale twins the frozen Bench sweep times (Bench.benchOnlyQueries)
    val benchOnly: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] = Map(
      "bench_minhash_sf" -> ((s, dir) =>
        graft.functions.Dedup.minhashSignatures(sf(s, dir, "documents"), k = 16)),
      "bench_simhash_sf" -> ((s, dir) =>
        graft.functions.Dedup.simhash(sf(s, dir, "documents"))),
      "bench_fingerprints_sf" -> ((s, dir) =>
        graft.functions.Dedup.fingerprints(sf(s, dir, "documents"))),
      "bench_ann_lsh_sf" -> ((s, dir) =>
        graft.functions.Similarity.cosineLshBuckets(sf(s, dir, "embeddings"),
            nBits = 12, dim = 64)
          .groupBy(col("lsh_bucket")).agg(count(lit(1)).as("n_vectors"))),
      "bench_ann_ivf_sf" -> ((s, dir) => {
        val e = sf(s, dir, "embeddings")
        graft.functions.Similarity.ivfTopK(e,
          e.filter(col("vec_id") < 10), k = 5, nCells = 8, nProbe = 3)
      }))

    val all = (graft.SparkEntry.queries ++ benchOnly).toSeq.sortBy(_._1)
      .filter { case (n, _) => filter.isEmpty || filter.exists(n.contains) }
    all.foreach { case (name, fn) =>
      spark.sparkContext.setJobDescription(s"bench-extra: $name")
      try {
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        df.queryExecution.executedPlan // force analysis+optimization+planning
        val tPlan = (System.nanoTime() - t0) / 1e9
        plansDir.foreach { d =>
          java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"$d/${name}_$suffix.txt"), txt)
        }
        val t1 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val tE1 = (System.nanoTime() - t1) / 1e9
        val t2 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val tE2 = (System.nanoTime() - t2) / 1e9
        println(f"BENCH_EXTRA name=$name plan=$tPlan%.2f exec1=$tE1%.2f exec2=$tE2%.2f total1=${tPlan + tE1}%.2f")
      } catch { case e: Throwable =>
        println(s"BENCH_EXTRA name=$name ERROR ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
      }
    }
    val (ser1, par1) = graft.Bench.windowProbe(cpus)
    System.err.println(f"PROBE_AFTER serial=$ser1%.2f parallel=$par1%.2f")
    spark.stop()
  }
}
