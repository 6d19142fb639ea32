package graft.curation

import org.apache.spark.sql.DataFrame
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
        countDistinct(coalesce(col("str_val"), col("num_val").cast("string")))
          .as("n_distinct"),
        min(col("num_val")).as("min_num"),
        max(col("num_val")).as("max_num"),
        min(length(col("str_val"))).cast("long").as("min_len"),
        max(length(col("str_val"))).cast("long").as("max_len"))
  }
}
