package graft

import graft.similarity.Clustering
import graft.sources.{Storage, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 analytics gates: incremental aggregate-view maintenance
  * (q157) and deterministic distributed k-means (q158).
  */
object AnalyticsGates {

  // shared with q159's streaming equivalence gate (StreamingGates)
  private[graft] val Cutoff = "2000-01-01 00:00:00"
  private[graft] val DeleteMod = 97
  private val KmK = 8
  private val KmIters = 3

  /** q157 — maintain the per-customer order view (n, total, max) through a
    * batch of inserts (orders on/after the cutoff) and deletes (orderkey ≡
    * 0 mod 97 among the base) WITHOUT re-aggregating the base: count/sum by
    * delta arithmetic, max recomputed only for delete-dirty keys over a
    * semi-join-restricted scan ([[Storage.mergeAggDelta]]). The oracle
    * re-aggregates the final row set from scratch — the gate proves the
    * incremental path lands on the exact same view.
    */
  private def q157DeltaAgg(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select(
      col("o_orderkey").as("row_id"), col("o_custkey").as("key"),
      col("o_totalprice").as("value"), col("o_orderdate"))
    val base = o.where(col("o_orderdate") < to_timestamp(lit(Cutoff))).drop("o_orderdate")
    val inserts = o.where(col("o_orderdate") >= to_timestamp(lit(Cutoff))).drop("o_orderdate")
    val deleteIds = base.where(col("row_id") % DeleteMod === 0).select(col("row_id"))
    val state = base.groupBy(col("key"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"), max(col("value")).as("mx"))
    Storage.mergeAggDelta(state, base, inserts, deleteIds, "row_id", "key", "value")
      .select(col("key").as("o_custkey"), col("n").as("n_orders"),
        round(col("total"), 2).as("total_r"), col("mx").as("max_price"))
  }

  /** q158 — k-means assignment after 3 deterministic Lloyd rounds over the
    * embeddings (k = 8, seeds = the 8 smallest vec_ids, distances and
    * centroids grid-rounded — [[Clustering.lloyd]]). The oracle unrolls
    * all three assign/update rounds in SQL on the same grids.
    */
  private def q158Kmeans(s: SparkSession, d: String): DataFrame =
    Clustering.lloyd(Tables.embeddings(s, d), col("vec_id"), col("embedding"),
        k = KmK, iters = KmIters)
      .select(col("id").as("vec_id"), col("cluster"), col("dist"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q157_delta_agg" -> (q157DeltaAgg _),
    "q158_kmeans" -> (q158Kmeans _)
  )

  // --- oracles ----------------------------------------------------------

  private def deltaAggSql: String =
    s"""WITH base AS (SELECT o_orderkey, o_custkey, o_totalprice FROM orders
       |  WHERE o_orderdate < TIMESTAMP '$Cutoff'),
       |final AS (
       |  SELECT * FROM base WHERE o_orderkey % $DeleteMod != 0
       |  UNION ALL
       |  SELECT o_orderkey, o_custkey, o_totalprice FROM orders
       |  WHERE o_orderdate >= TIMESTAMP '$Cutoff')
       |SELECT o_custkey, count(*)::BIGINT AS n_orders,
       |  round(sum(o_totalprice), 2) AS total_r, max(o_totalprice) AS max_price
       |FROM final GROUP BY o_custkey""".stripMargin

  /** Three unrolled Lloyd rounds: assignment = rounded squared-L2 argmin
    * with ties to the lowest cluster; update = per-dimension mean on the
    * centroid grid; empty clusters keep their previous centroid.
    */
  private def kmeansSql: String = {
    val prelude =
      s"""WITH dims AS (SELECT max(len(embedding))::INT AS dm FROM embeddings),
         |pos AS (SELECT unnest(range(1, (SELECT dm FROM dims) + 1))::INT AS p),
         |v AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
         |c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c,
         |              list_transform(v, x -> round(x, 6)) AS cv
         |       FROM (SELECT * FROM v ORDER BY vec_id LIMIT $KmK))""".stripMargin
    val rounds = (1 to KmIters).map { i =>
      val p = s"c${i - 1}"
      s"""a$i AS (
         |  SELECT vec_id, c, round(list_sum(list_transform(range(1, len(v.v)+1),
         |      j -> (v.v[j] - $p.cv[j]) * (v.v[j] - $p.cv[j]))), 6) AS dist
         |  FROM v CROSS JOIN $p),
         |b$i AS (SELECT vec_id, c, dist,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY dist, c) AS rn FROM a$i),
         |m$i AS (SELECT vec_id, c FROM b$i WHERE rn = 1),
         |u$i AS (
         |  SELECT m.c, pos.p, round(avg(v.v[pos.p]), 6) AS val
         |  FROM m$i m JOIN v ON v.vec_id = m.vec_id CROSS JOIN pos
         |  GROUP BY m.c, pos.p),
         |c$i AS (
         |  SELECT pc.c,
         |    coalesce(list(u.val ORDER BY u.p) FILTER (u.val IS NOT NULL), pc.cv) AS cv
         |  FROM $p pc LEFT JOIN u$i u ON u.c = pc.c GROUP BY pc.c, pc.cv)""".stripMargin
    }
    val epilogue =
      s"""fa AS (
         |  SELECT vec_id, c, round(list_sum(list_transform(range(1, len(v.v)+1),
         |      j -> (v.v[j] - cf.cv[j]) * (v.v[j] - cf.cv[j]))), 6) AS dist
         |  FROM v CROSS JOIN c$KmIters cf),
         |fb AS (SELECT vec_id, c, dist,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY dist, c) AS rn FROM fa)
         |SELECT vec_id, c::INT AS cluster, dist FROM fb WHERE rn = 1""".stripMargin
    prelude + ",\n" + rounds.mkString(",\n") + ",\n" + epilogue
  }

  def oracleSql: Map[String, String] = Map(
    "q157_delta_agg" -> deltaAggSql,
    "q158_kmeans" -> kmeansSql
  )
}
