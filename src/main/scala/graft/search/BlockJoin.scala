package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Parent-side block join aggregation — the re-expression of the reference's
  * `ToParentBlockJoinQuery` score modes (ref
  * `/root/reference/lucene/join/src/java/org/apache/lucene/search/join/ScoreMode.java`):
  * a parent's score is an aggregate (Max / Avg / Total / Min) of its matching
  * children's scores. Child scores arrive as a DataFrame keyed by the parent
  * column; the aggregation is one partial-agg shuffle on the parent key —
  * map-side combine keeps the shuffle narrow at any scale.
  */
object BlockJoin {

  sealed trait ScoreMode
  object ScoreMode {
    case object Max extends ScoreMode
    case object Avg extends ScoreMode
    case object Total extends ScoreMode
    case object Min extends ScoreMode
    /** Parent matches but takes no score from children (ref ScoreMode.None —
      * `None` collides with scala.None, so the reference's name maps to
      * `Ignore`).
      */
    case object Ignore extends ScoreMode
  }

  /** Aggregate child scores up to their parents.
    *
    * @param childScores (parentCol, "score") rows — one per matching child
    * @param parentCol   grouping key identifying the parent block
    * @return (parentCol, parent_score, n_children), parent_score 6-dp rounded
    */
  def parentScores(
      childScores: DataFrame, parentCol: String, mode: ScoreMode
  ): DataFrame = {
    val agg = mode match {
      case ScoreMode.Max => max(col("score"))
      case ScoreMode.Avg => avg(col("score"))
      case ScoreMode.Total => sum(col("score"))
      case ScoreMode.Min => min(col("score"))
      case ScoreMode.Ignore => lit(0.0)
    }
    childScores.groupBy(col(parentCol))
      .agg(round(agg, 6).as("parent_score"), count(lit(1)).as("n_children"))
  }
}
