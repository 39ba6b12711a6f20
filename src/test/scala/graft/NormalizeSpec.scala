package graft

import graft.functions.Normalize
import org.scalatest.funsuite.AnyFunSuite

/** Full-parity vectors for the exact strcase caser (reference
  * schema/normalize.go:9-82), hand-derived by walking the reference's
  * split rules character by character. */
class NormalizeSpec extends AnyFunSuite {

  private val vectors = Seq(
    // splitCase + acronym rules
    "userClickID" -> "user_click_id",
    "APIKey" -> "api_key",
    "ABCDef" -> "abc_def",
    "ABC" -> "abc",
    "simple" -> "simple",
    "Simple" -> "simple",
    // upper-before-digit protected, lower-before-digit split (the
    // deliberate non-idempotence: V2 → v2 → v_2)
    "totalCountV2" -> "total_count_v2",
    "V2" -> "v2",
    "v2" -> "v_2",
    "A1" -> "a1",
    // splitAfterNumber: digit → non-digit non-upper splits
    "a1b" -> "a_1_b",
    "amount0x" -> "amount_0_x",
    "HTML5Parser" -> "html5_parser",
    "Total2Count" -> "total_2_count",
    // number-formatting preservation: . and , kept between digits
    "price1.5usd" -> "price_1.5_usd",
    "big1,000count" -> "big_1,000_count",
    "1.5" -> "1.5",
    // delimiters * . , and whitespace are consumed separators
    "some.field" -> "some_field",
    "a*b" -> "a_b",
    "foo bar" -> "foo_bar",
    "tab\tsep" -> "tab_sep",
    "a..b" -> "a_b",
    // characters with no rule pass through (graph-node's block$)
    "block$" -> "block$",
    "snake_case" -> "snake_case",
    "" -> ""
  )

  test("exact caser matches the reference rule set on derived vectors") {
    vectors.foreach { case (in, want) =>
      assert(Normalize.toSnakeExact(in) === want, s"input: '$in'")
    }
  }

  test("digit-free names: exact caser agrees with the portable column-expression subset") {
    // on digit- and delimiter-free identifiers the two rule sets are
    // the same two splits (case + acronym); the subset exists only for
    // DuckDB-portable data-path normalization
    val names = Seq("userClickID", "APIKey", "ABCDef", "lastOp", "dailyVolumeUSD", "txCount")
    names.foreach { n =>
      val subset = n.replaceAll("([a-z0-9])([A-Z])", "$1_$2")
        .replaceAll("([A-Z]+)([A-Z][a-z])", "$1_$2").toLowerCase
      assert(Normalize.toSnakeExact(n) === subset, n)
    }
  }

  test("output is lowercase with no empty segments") {
    (vectors.map(_._1) ++ Seq("**", " a ", "..", "A*.B")).foreach { in =>
      val out = Normalize.toSnakeExact(in)
      assert(out === out.toLowerCase)
      assert(!out.contains("__"), s"'$in' -> '$out'")
      assert(!out.startsWith("_") && !out.endsWith("_"), s"'$in' -> '$out'")
    }
  }
}
