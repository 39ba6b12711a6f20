package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** camelCase → snake_case field normalization (SURVEY.md §2 #13).
  *
  * The reference normalizes every GraphQL field/entity name with a
  * configured strcase caser (reference schema/normalize.go:9-82). The
  * documented subset re-expressed as a codegen'd regex pipeline:
  *
  *   1. `aB`  → `a_B`   (split on lower/digit → upper; splitCase rule)
  *   2. `ABc` → `A_Bc`  (acronym boundary; splitAcronym rule)
  *   3. `a1`  → `a_1`   (split before a number unless prev is upper;
  *                       splitBeforeNumber rule — `V2` stays `v2`)
  *   4. lowercase everything.
  *
  * e.g. `userClickID`→`user_click_id`, `APIKey`→`api_key`,
  * `totalCountV2`→`total_count_v2`.
  */
object Normalize {

  def toSnake(c: Column): Column =
    lower(
      regexp_replace(
        regexp_replace(
          regexp_replace(c, "([a-z0-9])([A-Z])", "$1_$2"),
          "([A-Z]+)([A-Z][a-z])", "$1_$2"),
        "([a-z])([0-9])", "$1_$2"))

  /** DuckDB twin (RE2, `\1` backrefs, global flag). */
  def toSnakeSql(expr: String): String =
    s"""lower(regexp_replace(regexp_replace(regexp_replace($expr, '([a-z0-9])([A-Z])', '\\1_\\2', 'g'), '([A-Z]+)([A-Z][a-z])', '\\1_\\2', 'g'), '([a-z])([0-9])', '\\1_\\2', 'g'))"""
}
