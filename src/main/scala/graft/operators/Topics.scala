package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** K13 topic listing (reference `src/list_topics.py:17-19`): the distinct
  * node labels. Labels are opaque whole strings — `gene:protein` is a
  * distinct topic from `gene` (SURVEY.md §2 note F). */
object Topics {
  def list(nodes: DataFrame): DataFrame =
    nodes.select(col("label")).distinct()
}
