package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_json_long(json, key)` — extract one top-level integer field
  * from a JSON object in a single byte pass. Registered via
  * [[graft.plans.GraftExtensions]].
  *
  * Why a native expression: the composable forms (`from_json` with a
  * one-field schema, `get_json_object` + cast) each stand up a full
  * Jackson parse per row — for the reference's JSONL change-line shape
  * (csvprocessor/entity.go:48-139: small flat objects, one interesting
  * field) the parser setup IS the cost, ~10× what the actual scan
  * needs. This kernel walks the UTF-8 bytes once: structural JSON is
  * ASCII so byte-level scanning is UTF-8-safe; strings are skipped
  * with escape handling, nested objects/arrays are skipped by depth,
  * and only the matching key's value is materialized — as a long.
  *
  * Parity with the composable twins (spec-pinned, JsonKernelSpec):
  * returns null when the key is absent, the value is not an integral
  * number (floats/exponents/strings/bools/null/containers), the
  * integer overflows int64, or the input is not a JSON object —
  * exactly `from_json(j, "k BIGINT").k` / `CAST(get_json_object(j,
  * '$.k') AS BIGINT)` on well-formed inputs. First occurrence wins on
  * duplicate keys — the get_json_object convention (Jackson/from_json
  * takes the LAST; the twins themselves disagree there, and the
  * corpus contract is no-duplicates — JsonKernelSpec). On MALFORMED
  * input the kernel follows the `from_json` twin: the whole object is
  * validated (truncated objects, leading-zero numbers, a malformed
  * member AFTER the matched key → null; trailing bytes past the
  * closing brace are ignored, as from_json reads one root value and
  * stops), and escaped member keys decode before comparison — the
  * twins disagree with each other on some dirty shapes
  * (get_json_object is lenient); from_json is the declared tie-break,
  * spec-pinned in JsonKernelSpec.
  *
  * Scale: map-only, codegen-resident, no per-row object allocation on
  * the miss path — a 100 TB JSONL scan parses at byte-scan speed.
  */
case class JsonLong(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_json_long expects (string, string), got (${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(json: Any, key: Any): Any =
    JsonLong.compute(json.asInstanceOf[UTF8String], key.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val boxed = ctx.freshName("jl")
    nullSafeCodeGen(ctx, ev, (j, k) => s"""
      |java.lang.Long $boxed = graft.functions.JsonLong.compute($j, $k);
      |if ($boxed == null) { ${ev.isNull} = true; } else { ${ev.value} = $boxed.longValue(); }
      |""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JsonLong =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_json_long"
}

object JsonLong {

  /** Null (boxed) on any shape the composable twins reject. The WHOLE
    * object is validated (members after the matched key included, plus
    * a whitespace-only tail) — truncated objects, leading-zero
    * numbers, and trailing garbage all null out exactly like the
    * strict `from_json` twin, instead of the kernel being lenient
    * where the twins are not. */
  def compute(json: UTF8String, key: UTF8String): java.lang.Long = {
    val b = json.getBytes
    val kb = key.getBytes
    val n = b.length
    var i = skipWs(b, 0, n)
    if (i >= n || b(i) != '{') return null
    i += 1
    var first = true
    var found = false
    var result: java.lang.Long = null
    while (i < n) {
      i = skipWs(b, i, n)
      if (i < n && b(i) == '}') {
        // object closed: trailing bytes are IGNORED (the from_json
        // twin reads one root value and stops — spec-pinned)
        return if (found) result else null
      }
      if (!first) {
        if (i >= n || b(i) != ',') return null
        i = skipWs(b, i + 1, n)
      }
      first = false
      // member key
      if (i >= n || b(i) != '"') return null
      val keyStart = i + 1
      i = skipString(b, i, n)
      if (i < 0) return null
      // first occurrence wins — later duplicates are skipped (but
      // still structurally validated like any other member)
      val matched = !found && keyMatches(b, keyStart, i - 1, kb)
      i = skipWs(b, i, n)
      if (i >= n || b(i) != ':') return null
      i = skipWs(b, i + 1, n)
      if (matched) {
        found = true
        result = parseLong(b, i, n) // null on non-integral — kept null
      }
      i = skipValue(b, i, n)
      if (i < 0) return null
    }
    null // ran off the end before the object closed → malformed
  }

  /** Compare the raw key span `[s, e)` against the wanted key bytes.
    * Fast path is a raw byte compare; a backslash anywhere in the span
    * falls back to full JSON-escape decoding, so a key spelled with
    * escapes (e.g. backslash-u-006b for `k`) matches exactly like the
    * composable twins. */
  private def keyMatches(b: Array[Byte], s: Int, e: Int, kb: Array[Byte]): Boolean = {
    var esc = false
    var i = s
    while (i < e && !esc) { if (b(i) == '\\') esc = true; i += 1 }
    if (!esc) {
      if (e - s != kb.length) return false
      var j = 0
      while (j < kb.length && b(s + j) == kb(j)) j += 1
      j == kb.length
    } else {
      val dec = unescape(b, s, e)
      dec != null && java.util.Arrays.equals(dec, kb)
    }
  }

  /** Decode the JSON string-escape sequences in span `[s, e)` to UTF-8
    * bytes; null on a malformed escape. Surrogate-pair `\uD8xx\uDCxx`
    * runs combine into one code point; a lone surrogate encodes as its
    * own 3-byte sequence (matches no well-formed UTF-8 key). */
  private def unescape(b: Array[Byte], s: Int, e: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(e - s)
    var i = s
    while (i < e) {
      if (b(i) != '\\') { out.write(b(i)); i += 1 }
      else {
        if (i + 1 >= e) return null
        b(i + 1) match {
          case '"' => out.write('"'); i += 2
          case '\\' => out.write('\\'); i += 2
          case '/' => out.write('/'); i += 2
          case 'b' => out.write('\b'); i += 2
          case 'f' => out.write('\f'); i += 2
          case 'n' => out.write('\n'); i += 2
          case 'r' => out.write('\r'); i += 2
          case 't' => out.write('\t'); i += 2
          case 'u' =>
            if (i + 6 > e) return null
            var cp = hex4(b, i + 2)
            if (cp < 0) return null
            i += 6
            if (cp >= 0xD800 && cp <= 0xDBFF && i + 6 <= e &&
              b(i) == '\\' && b(i + 1) == 'u') {
              val lo = hex4(b, i + 2)
              if (lo >= 0xDC00 && lo <= 0xDFFF) {
                cp = 0x10000 + ((cp - 0xD800) << 10) + (lo - 0xDC00)
                i += 6
              }
            }
            writeUtf8(out, cp)
          case _ => return null
        }
      }
    }
    out.toByteArray
  }

  private def hex4(b: Array[Byte], i: Int): Int = {
    var v = 0
    var j = 0
    while (j < 4) {
      val c = b(i + j)
      val d =
        if (c >= '0' && c <= '9') c - '0'
        else if (c >= 'a' && c <= 'f') c - 'a' + 10
        else if (c >= 'A' && c <= 'F') c - 'A' + 10
        else return -1
      v = v * 16 + d
      j += 1
    }
    v
  }

  private def writeUtf8(o: java.io.ByteArrayOutputStream, cp: Int): Unit = {
    if (cp < 0x80) o.write(cp)
    else if (cp < 0x800) {
      o.write(0xC0 | (cp >> 6)); o.write(0x80 | (cp & 0x3F))
    } else if (cp < 0x10000) {
      o.write(0xE0 | (cp >> 12)); o.write(0x80 | ((cp >> 6) & 0x3F))
      o.write(0x80 | (cp & 0x3F))
    } else {
      o.write(0xF0 | (cp >> 18)); o.write(0x80 | ((cp >> 12) & 0x3F))
      o.write(0x80 | ((cp >> 6) & 0x3F)); o.write(0x80 | (cp & 0x3F))
    }
  }

  private def skipWs(b: Array[Byte], i0: Int, n: Int): Int = {
    var i = i0
    while (i < n && (b(i) == ' ' || b(i) == '\t' || b(i) == '\n' || b(i) == '\r')) i += 1
    i
  }

  /** i points at the opening quote; returns index AFTER the closing
    * quote, or -1 on malformed. */
  private def skipString(b: Array[Byte], i0: Int, n: Int): Int = {
    var i = i0 + 1
    while (i < n) {
      val c = b(i)
      if (c == '\\') i += 2
      else if (c == '"') return i + 1
      else i += 1
    }
    -1
  }

  /** Skip one JSON value of any type; returns index after it, -1 on
    * malformed. Containers are skipped by depth with in-string escape
    * handling — never parsed. */
  private def skipValue(b: Array[Byte], i0: Int, n: Int): Int = {
    if (i0 >= n) return -1
    b(i0) match {
      case '"' => skipString(b, i0, n)
      case '{' | '[' =>
        var depth = 0
        var i = i0
        while (i < n) {
          b(i) match {
            case '"' =>
              i = skipString(b, i, n)
              if (i < 0) return -1
            case '{' | '[' => depth += 1; i += 1
            case '}' | ']' =>
              depth -= 1; i += 1
              if (depth == 0) return i
            case _ => i += 1
          }
        }
        -1
      case _ => // number / true / false / null: run to delimiter
        var i = i0
        while (i < n && b(i) != ',' && b(i) != '}' && b(i) != ']' &&
          b(i) != ' ' && b(i) != '\t' && b(i) != '\n' && b(i) != '\r') i += 1
        if (i == i0) -1 else i
    }
  }

  /** Parse an integral JSON number; null on floats, exponents,
    * non-numbers, overflow, or trailing garbage. */
  private def parseLong(b: Array[Byte], i0: Int, n: Int): java.lang.Long = {
    var i = i0
    if (i >= n) return null
    val neg = b(i) == '-'
    if (neg) i += 1
    if (i >= n || b(i) < '0' || b(i) > '9') return null
    val digits0 = i
    val firstDigit = b(i)
    // accumulate NEGATIVE so Long.MinValue parses exactly
    var v = 0L
    while (i < n && b(i) >= '0' && b(i) <= '9') {
      val d = b(i) - '0'
      if (v < (Long.MinValue + d) / 10) return null // overflow → twin-null
      v = v * 10 - d
      i += 1
    }
    if (!neg && v == Long.MinValue) return null
    // JSON grammar forbids leading zeros ("0123") — twin-null
    if (firstDigit == '0' && i - digits0 > 1) return null
    // a fraction or exponent makes the value non-integral → twin-null
    if (i < n && (b(i) == '.' || b(i) == 'e' || b(i) == 'E')) return null
    // value must end at a structural delimiter or whitespace
    if (i < n && b(i) != ',' && b(i) != '}' && b(i) != ']' &&
      b(i) != ' ' && b(i) != '\t' && b(i) != '\n' && b(i) != '\r') return null
    java.lang.Long.valueOf(if (neg) v else -v)
  }
}
