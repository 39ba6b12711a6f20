package graft

/** The oracle_sql.json rendering shared by [[Verify]] (the driver's
  * correctness dump) and [[Bench]] (the interleaved DuckDB worker's
  * input) — one escaping implementation so both artifacts stay
  * loadable by the same `json.load`. */
object OracleJson {
  /** JSON string escape: backslash, quote, and ALL control chars
    * (<0x20) — a tab or CR in builder-authored SQL would otherwise
    * make the driver's json.load fail and silently zero the round's
    * correctness. */
  def quote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def render(m: Map[String, String]): String =
    m.map { case (k, v) => s"${quote(k)}: ${quote(v)}" }.mkString("{", ",", "}")

  def write(path: java.nio.file.Path, m: Map[String, String]): Unit = {
    java.nio.file.Files.writeString(path, render(m)): Unit
  }
}
