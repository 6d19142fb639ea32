package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Top-k rows per group WITHOUT a window: one bounded aggregate
  * ([[graft.plans.TopKStructs]], O(k) state per group, map-side partial
  * top-k before the exchange) instead of
  * `row_number().over(partitionBy(g).orderBy(...)) <= k`, which sorts
  * every group's FULL row set per task — at a billion rows per hot group
  * the window is the difference between a bounded heap and a spill.
  */
object TopK {

  /** Emit the top-`k` rows per group: `ranked` is a STRUCT whose fields
    * compare lexicographically, greatest kept — put ranking keys first
    * (negate for descending) and include a unique tiebreak field; every
    * struct field is emitted as a column after (groupCols, rank).
    *
    * @return groupCols ++ (rank INT from 1, greatest first) ++ struct fields
    */
  def topKByGroup(df: DataFrame, groupCols: Seq[Column], ranked: Column, k: Int): DataFrame = {
    val agged = df.groupBy(groupCols: _*)
      .agg(graft.plans.TopKStructs.column(ranked, k).as("__top"))
    val gNames = agged.columns.filterNot(_ == "__top").toSeq
    agged.select(gNames.map(col) :+ posexplode(col("__top")): _*)
      .select(gNames.map(col) ++
        Seq((col("pos") + 1).cast("int").as("rank"), col("col.*")): _*)
  }
}
