package graft.curation

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Table-level data-quality audits — the "profile every column before you
  * train on the table" step a curation pipeline runs on each new snapshot
  * (the shape popularized by declarative data-quality suites: completeness,
  * cardinality, range per column in one report).
  */
object Audit {

  /** One profile row per column: row count, null count, EXACT distinct
    * count, numeric min/max (null for non-numeric columns) and string
    * length min/max (null for numeric columns) — the schema-drift /
    * completeness / cardinality readout in ONE job.
    *
    * Scale shape: the table MELTS once (`explode` of one struct entry per
    * profiled column — k× rows through a single pipeline, the same volume
    * any per-column exact-distinct pass must touch) and aggregates by
    * column name; counts/min/max combine map-side, and the exact distinct
    * runs as the standard two-phase (column, value) partial → final
    * re-aggregation, so no executor ever holds a column's full value set.
    * `n` repeats the table row count per column by construction — a free
    * conservation check on the melt. Distinctness is counted over the
    * column's SINGLE surfaced representation (numeric columns surface
    * their double image, everything else its string form), so the count
    * equals the source column's `count(DISTINCT col)` as long as the
    * numeric cast is injective on the column's values — true for every
    * integral type up to 2^53 (a BIGINT id column beyond that would
    * alias; profile it as a string column instead).
    */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "columnProfile: need at least one column")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columnProfile: not in schema: ${missing.mkString(", ")}")
    val numeric = cols.filter(c =>
      df.schema(c).dataType.isInstanceOf[NumericType]).toSet
    val entries = cols.map { c =>
      struct(
        lit(c).as("column"),
        (if (numeric(c)) col(c).cast("double")
         else lit(null).cast("double")).as("num_val"),
        (if (numeric(c)) lit(null).cast("string")
         else col(c).cast("string")).as("str_val"),
        col(c).isNull.as("is_null"))
    }
    df.select(explode(array(entries: _*)).as("e"))
      .select(col("e.column").as("column"), col("e.num_val").as("num_val"),
        col("e.str_val").as("str_val"), col("e.is_null").as("is_null"))
      .groupBy(col("column"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("is_null"), 1L).otherwise(0L)).as("n_null"),
        // + 0.0 collapses IEEE signed zero before the string image:
        // a Float/Double column holding both -0.0 and 0.0 would render
        // "-0.0" vs "0.0" and count as TWO distincts while
        // count(DISTINCT col) in SQL (and plain Spark) treats them as
        // one value (NaN already renders uniformly as "NaN")
        countDistinct(coalesce(col("str_val"),
            (col("num_val") + lit(0.0)).cast("string")))
          .as("n_distinct"),
        min(col("num_val")).as("min_num"),
        max(col("num_val")).as("max_num"),
        min(length(col("str_val"))).cast("long").as("min_len"),
        max(length(col("str_val"))).cast("long").as("max_len"))
  }

  /** Referential-integrity audit: how many child rows point at no parent
    * — the orphan count a pipeline checks after every partial re-crawl /
    * selective delete (a training example whose joined-in dimension row
    * vanished silently trains on nulls). Returns ONE row:
    * `(n_child, n_orphans, n_orphan_keys)`.
    *
    * Scale shape: ONE left equi join on the key (the parent side reduced
    * to DISTINCT keys first, so the join never fans out and carries only
    * an existence flag) + one map-combined aggregate — total and orphan
    * counts fall out of the same pass. Null child keys count as orphans
    * (they join to nothing — the loud choice; filter upstream if
    * nullable FKs are legal).
    */
  def fkOrphans(
      child: DataFrame,
      parent: DataFrame,
      childKey: Column,
      parentKey: Column
  ): DataFrame = {
    val c = child.select(childKey.as("__k"))
    val p = parent.select(parentKey.as("__k")).distinct()
      .withColumn("__hit", lit(1))
    c.join(p, Seq("__k"), "left")
      .agg(
        count(lit(1)).as("n_child"),
        count(when(col("__hit").isNull, 1)).as("n_orphans"),
        countDistinct(when(col("__hit").isNull, col("__k"))).as("n_orphan_keys"))
  }

  /** Freshness audit: per group, the row count, latest event time, and
    * staleness `asOf − max(ts)` in whole seconds — the "did this source's
    * feed stall" monitor, evaluated against an EXPLICIT reference instant
    * rather than the wall clock (deterministic: re-running the audit on
    * yesterday's snapshot reproduces yesterday's report). One
    * map-combined aggregate; groups whose timestamps are all null report
    * a null `last_seen` and null `lag_s` — a loud "never seen", not a
    * zero.
    */
  def freshness(df: DataFrame, group: Column, ts: Column,
      asOf: java.sql.Timestamp): DataFrame =
    df.groupBy(group.as("g"))
      .agg(
        count(lit(1)).as("n"),
        max(ts).cast("long").as("last_seen"),
        (lit(asOf.getTime / 1000) - max(ts).cast("long")).as("lag_s"))

  /** Key-uniqueness audit: is `cols` a primary key? Returns ONE row:
    * `(n, n_keys, n_dup_keys, max_multiplicity)` — `n_dup_keys` = 0 means
    * unique. The check every IVM maintainer in this library contracts on
    * (unique row ids) and every CDC feed must prove. One map-combined
    * groupBy on the key + one bounded re-aggregation.
    */
  def keyUniqueness(df: DataFrame, cols: Seq[Column]): DataFrame = {
    require(cols.nonEmpty, "keyUniqueness: need at least one key column")
    df.groupBy(cols: _*).agg(count(lit(1)).as("__m"))
      .agg(
        sum(col("__m")).cast("long").as("n"),
        count(lit(1)).as("n_keys"),
        sum(when(col("__m") > 1, 1L).otherwise(0L)).as("n_dup_keys"),
        max(col("__m")).as("max_multiplicity"))
  }
}
