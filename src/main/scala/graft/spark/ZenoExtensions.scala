package graft.spark

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the engine's native
  * functions for SQL users, so `spark.sql("SELECT fnv64a(url) ...")` works
  * in any session built with
  * `.withExtensions(new graft.spark.ZenoExtensions)` or via
  * `spark.sql.extensions=graft.spark.ZenoExtensions`.
  */
class ZenoExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("fnv64a"),
      new ExpressionInfo(classOf[Fnv64a].getName, "fnv64a"),
      (children: Seq[Expression]) => Fnv64a(children.head)))
    ext.injectFunction((
      FunctionIdentifier("surt_host"),
      new ExpressionInfo(classOf[SurtHost].getName, "surt_host"),
      (children: Seq[Expression]) => SurtHost(children.head)))
  }
}

object ZenoExtensions {
  /** Imperative registration into an existing session (getOrCreate ignores
    * withExtensions when a session already exists). Also registers the
    * Scala-UDF surface for SQL users: zeno_canonicalize(url[, parent])
    * and zeno_host(url) over the default config.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("fnv64a", es => Fnv64a(es.head), "built-in")
    reg.createOrReplaceTempFunction("surt_host", es => SurtHost(es.head), "built-in")
    val conf = graft.conf.ZenoConf.default
    spark.udf.register("zeno_canonicalize", (raw: String, parent: String) =>
      graft.canon.Canon.canonicalize(raw, Option(parent), conf)
        .toOption.map(_.href).orNull)
    spark.udf.register("zeno_host", (raw: String) =>
      graft.canon.Canon.canonicalize(raw, None, conf)
        .toOption.map(_.host).orNull)
  }
}
