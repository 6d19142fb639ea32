package graft.sources

import org.apache.spark.sql.DataFrame

/** Storage-layout helpers — the parts of the 100 TB design that live in
  * how data is WRITTEN rather than how a query is planned.
  */
object Storage {

  /** Write a bucketed + in-bucket-sorted managed parquet table. Two tables
    * bucketed by the same key into the same bucket count join/aggregate on
    * that key with NO shuffle Exchange (and no sort, thanks to `sortBy`) —
    * the pre-shuffle is paid once at write time instead of on every query.
    * This is the standing answer for fact tables that are repeatedly
    * joined on one key (orders ⋈ lineitem on orderkey, documents ⋈
    * signatures on doc_id): at 100 TB the avoided exchange IS the query
    * cost. Verified by ScaleTechniquesSpec (the executed plan literally
    * contains no Exchange).
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
      mode: String = "overwrite"): Unit =
    df.write.mode(mode).format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)
}
