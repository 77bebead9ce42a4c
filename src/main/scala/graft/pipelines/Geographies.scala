package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.Joins

/** Geography grouping/renaming — Spark re-expression of
  * R/rename_geographies.R:46-176.
  */
object Geographies {

  /** reference :51-107 group_identical_geographies: geographies whose
    * country sets overlap >= tol are grouped; each maps to the longest
    * name of its pair; chains are pruned (a name that is itself mapped
    * away never appears as a target).
    *
    * Returns a mapping DataFrame (shortest_name, longest_name).
    */
  def groupIdenticalGeographies(benchRegions: DataFrame, matchingTol: Double): DataFrame = {
    val pairs = Joins.setOverlapPairs(
      benchRegions.select(col("scenario_geography").as("g"), col("country_iso").as("item")),
      "g", "item", matchingTol)
    val named = pairs
      .withColumn("longest_name",
        when(length(col("g_x")) >= length(col("g_y")), col("g_x")).otherwise(col("g_y")))
      .withColumn("shortest_name",
        when(length(col("g_x")) >= length(col("g_y")), col("g_y")).otherwise(col("g_x")))
      .select("shortest_name", "longest_name")
      .distinct()
    // reference :96-100 — prune transitive chains
    named.join(named.select(col("shortest_name").as("__mid")),
      col("longest_name") === col("__mid"), "left_anti")
  }

  /** reference :144-176 standardize_geoographies_name, as one column
    * expression chain: & -> " and ", title-case (only multi-word names),
    * strip whitespace, strip "(R5)".
    */
  def standardizeGeographyName(c: Column): Column = {
    val andified = regexp_replace(c, "&", " and ")
    val titled = when(andified.contains(" "), initcap(andified)).otherwise(andified)
    val noWs = regexp_replace(titled, " ", "")
    // case-insensitive: initcap lowercases the R in "(R5)" where R's ICU
    // title-case (str_to_title) keeps it — the marker is stripped either way
    regexp_replace(noWs, "(?i)\\(r5\\)", "")
  }

  /** Apply a (from, to) mapping DataFrame to a geography column —
    * broadcast-join recode; unmapped values pass through
    * (reference R/helpers.R:156-168 applied over the grouping mapper).
    */
  def applyGeographyMapping(df: DataFrame, geoCol: String, mapping: DataFrame): DataFrame =
    df.join(broadcast(mapping), df(geoCol) === mapping("shortest_name"), "left")
      .withColumn(geoCol, coalesce(col("longest_name"), col(geoCol)))
      .drop("shortest_name", "longest_name")
}
