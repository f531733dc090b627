package graft.loop

import org.apache.spark.sql.{Dataset, SparkSession}

/** Seed-list file scan (S2): one URL per line, blanks and '#' comments
  * skipped. Reference: /root/reference/cmd/get_list.go:90-148.
  */
object SeedList {
  def read(spark: SparkSession, path: String): Dataset[String] = {
    import spark.implicits._
    spark.read.textFile(path)
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
  }
}
