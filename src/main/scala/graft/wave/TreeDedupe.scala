package graft.wave

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** J1 — per-seed work-tree dedupe with the keep-Completed preference
  * (reference: pkg/models/item_dedupe.go:4-33, invoked from
  * internal/pkg/preprocessor/preprocessor.go:242).
  *
  * The reference flattens one seed's item tree into DFS pre-order, walks
  * it through a URL-keyed map and removes duplicate nodes. Tracing the
  * map updates gives the winner per (seed, url) group:
  *
  *   - the tree ROOT never participates (`node.parent == nil` is skipped
  *     at item_dedupe.go:17-19) and is never removed;
  *   - if the FIRST occurrence is Completed it stays (the replace guard
  *     `existing.status != Completed` fails for every later duplicate);
  *   - otherwise the FIRST Completed occurrence replaces it (and then
  *     sticks, by the same guard);
  *   - with no Completed occurrence at all, the first occurrence wins.
  *
  * So winner = min over (status ≠ Completed, dfs_order) — exactly a
  * windowed `row_number() = 1` per (seed_id, url), which is the
  * Spark-native form: one hash exchange on (seed_id, url) with map-side
  * WindowGroupLimit pruning, no tree structure materialized. The
  * trailing `markCompleted` sweep in the reference (item_dedupe.go:56-70)
  * is the seed-completion fold, covered by A1
  * (`SparkEntry.queries("a1_seed_completion")` / CrawlLoop seeds_finished).
  *
  * In the live wave the same rank logic runs inside [[Wave.finish]]'s
  * single dedupe exchange (kind-rank ordering; candidates there are all
  * pre-fetch so no Completed rows exist yet); this standalone form is the
  * full reference semantics over an arbitrary mid-crawl item snapshot,
  * where re-queued trees DO carry mixed statuses.
  *
  * Expected columns: `seed_id`, `url_canon`, `status`, `ord` (DFS
  * pre-order position within the tree), `is_root`.
  */
object TreeDedupe {

  val Completed = "Completed"

  /** Keep the reference-winning node per (seed, url); roots pass through
    * untouched. Output schema = input schema.
    */
  def perSeed(items: DataFrame): DataFrame = {
    val roots = items.filter(col("is_root"))
    val kept = items.filter(!col("is_root"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("seed_id"), col("url_canon"))
          .orderBy(when(col("status") === Completed, 0).otherwise(1).asc,
            col("ord").asc)))
      .filter(col("__rn") === 1).drop("__rn")
    kept.unionByName(roots)
  }
}
