package graft.spark

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
import org.apache.spark.sql.execution.joins.BaseJoinExec

/** Physical-plan shape inspection for the 100-TB invariants the engine
  * promises (and WavePlanSpec/PlanCheck assert):
  *
  *  - the web corpus is NEVER on the build/shuffle side of anything — no
  *    shuffle exchange may have the corpus scan in its (stage-local)
  *    subtree;
  *  - the seen table is only ever consumed scan-side through a broadcast
  *    join (Wave.seenLookup) — the first exchange-or-join above its scan
  *    must be a BroadcastHashJoin.
  */
object PlanShapes {

  /** Children across AQE / cache / reuse / subquery boundaries. */
  def edges(p: SparkPlan): Seq[SparkPlan] = {
    val structural = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.inputPlan)
      case q: QueryStageExec => Seq(q.plan)
      case r: ReusedExchangeExec => Seq(r.child)
      case im: InMemoryTableScanExec => Seq(im.relation.cachedPlan)
      case _ => p.children
    }
    structural ++ p.subqueries
  }

  /** Like [[edges]] but stopping at cache boundaries: a persist() is a
    * materialization barrier, so bytes moving above an InMemoryTableScan
    * are the CACHED rows, not the cache's inputs — an exchange there does
    * not re-shuffle the underlying table.
    */
  private def stageEdges(p: SparkPlan): Seq[SparkPlan] = p match {
    case _: InMemoryTableScanExec => Nil
    case _ => edges(p)
  }

  def flatten(p: SparkPlan): Seq[SparkPlan] = p +: edges(p).flatMap(flatten)

  private def flattenStage(p: SparkPlan): Seq[SparkPlan] =
    p +: stageEdges(p).flatMap(flattenStage)

  def isScanOf(p: SparkPlan, pathSubstring: String): Boolean = p match {
    case f: FileSourceScanExec =>
      f.relation.location.rootPaths.exists(_.toString.contains(pathSubstring))
    case _ => false
  }

  /** Shuffle exchanges that would move rows of the table at
    * `pathSubstring` (cache boundaries excluded — see [[stageEdges]]).
    * Must be empty for the corpus in every wave plan.
    */
  def shufflesAbove(plan: SparkPlan, pathSubstring: String): Seq[SparkPlan] =
    flatten(plan).collect {
      case e: ShuffleExchangeLike
          if flattenStage(e.asInstanceOf[SparkPlan].children.head)
            .exists(isScanOf(_, pathSubstring)) =>
        e.asInstanceOf[SparkPlan]
    }

  /** Root→scan ancestor path to the first scan of `pathSubstring`. */
  def pathToScan(plan: SparkPlan, pathSubstring: String): Option[List[SparkPlan]] =
    if (isScanOf(plan, pathSubstring)) Some(List(plan))
    else edges(plan).iterator
      .flatMap(c => pathToScan(c, pathSubstring))
      .nextOption()
      .map(plan :: _)

  /** The first join or shuffle met walking UP from the scan of
    * `pathSubstring`. For the seen table this must be a BroadcastHashJoin
    * (scan-side streaming lookup), never an exchange.
    */
  def firstJoinOrShuffleAboveScan(plan: SparkPlan, pathSubstring: String): Option[SparkPlan] =
    pathToScan(plan, pathSubstring).flatMap { path =>
      path.reverse.drop(1).find {
        case _: ShuffleExchangeLike => true
        case _: BaseJoinExec => true
        case _ => false
      }
    }
}
