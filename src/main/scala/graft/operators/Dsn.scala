package graft.operators

/** Postgres DSN parsing (reference postgres/dsn.go:14-80) — the
  * connection-config surface every reference command that talks to
  * postgres consumes (`create-index`/`drop-index`/`inject-csv`/
  * `handoff` all take a `<psql-dsn>` argument and call
  * `postgres.ParseDSN`, e.g. create-indexes.go:34-40).
  *
  * Semantics, matched to dsn.go:
  *   - `${VAR}` / `$VAR` environment expansion runs FIRST (dsn.go:19
  *     via the public drone/envsubst shell grammar; modeled: unset
  *     variables expand to empty, `$$` escapes a literal dollar, and
  *     the default forms `${VAR:-d}`/`${VAR:=d}`/`${VAR-d}`/`${VAR=d}`
  *     — the remaining shell operators are refused loudly, never
  *     silently expanded to empty);
  *   - the expanded string must be a `postgresql://` URL (dsn.go:29 —
  *     same error text);
  *   - port defaults to 5432 when the host carries none (dsn.go:35-38);
  *   - database = the URL path with its leading `/` stripped;
  *   - query options are rendered `key=value`, SORTED by key
  *     (dsn.go:49 — Go map iteration is randomized, the sort is what
  *     makes the output deterministic), multi-valued keys joined with
  *     `,` (dsn.go:53);
  *   - [[Parsed.keyValue]] reproduces `DSN()` (dsn.go:70-76)
  *     byte-for-byte, including its quirks: a trailing space when the
  *     option list is empty, and `password=` appended LAST and only
  *     when non-empty.
  *
  * This is a driver-side config artifact — bounded metadata, never
  * row-proportional work. */
object Dsn {

  /** The parsed connection facts (DSN struct, dsn.go:59-68). */
  case class Parsed(original: String, host: String, port: Long,
                    database: String, username: String, password: String,
                    options: Seq[String]) {
    /** Key/value (libpq) form — dsn.go:70-76 `DSN()` byte-for-byte. */
    def keyValue: String = {
      val out = s"host=$host port=$port user=$username dbname=$database " +
        options.mkString(" ")
      if (password.nonEmpty) out + " password=" + password else out
    }
    override def toString: String = original // dsn.go:78-80 String()
  }

  /** `${VAR}` / `$VAR` expansion with `$$` as the literal-dollar
    * escape; unset variables expand to "" (the drone/envsubst default
    * the reference relies on to splice `${PG_PASSWORD}` from the
    * environment).
    *
    * The default-value forms of the grammar are implemented with
    * drone/envsubst's semantics: `${VAR:-default}` / `${VAR:=default}`
    * substitute the default when VAR is unset OR empty (envsubst can't
    * assign the process env, so `:=` degenerates to `:-` there too);
    * `${VAR-default}` / `${VAR=default}` only when unset. The default
    * text is itself expanded, so `${A:-$B}` chains. The REST of the
    * shell grammar (`:?`, `:+`, `#`/`##`, `%`/`%%`, `/`, `^`, `,`,
    * `:offset:len`) is refused loudly rather than silently treating
    * `VAR:-default` as a variable named `VAR:-default` and expanding
    * the whole thing to "" — a production DSN must never silently lose
    * its password default. */
  private[graft] def envsubst(s: String, env: String => Option[String]): String = {
    val out = new StringBuilder
    var i = 0
    // drone/envsubst's name grammar is ASCII [A-Za-z_][A-Za-z0-9_]*;
    // a Unicode-aware isLetterOrDigit would treat ${üVAR} or ${1FOO}
    // as valid-but-unset names and silently expand them to empty —
    // exactly the silent-empty failure the default-form handling
    // refuses loudly elsewhere
    def isVarChar(c: Char) =
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c == '_'
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '$' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '$' => out += '$'; i += 2
          case '{' =>
            // matching close brace, depth-aware so a nested default
            // like ${A:-${B:-x}} scans to ITS OWN close
            var close = i + 2
            var depth = 1
            while (close < s.length && depth > 0) {
              if (s.charAt(close) == '}') depth -= 1
              else if (s.charAt(close) == '$' && close + 1 < s.length &&
                s.charAt(close + 1) == '{') { depth += 1; close += 1 }
              if (depth > 0) close += 1
            }
            if (depth > 0)
              throw new IllegalArgumentException(
                "variables expansion failed: unclosed ${ in DSN")
            val body = s.substring(i + 2, close)
            var k = 0
            while (k < body.length && isVarChar(body.charAt(k))) k += 1
            val name = body.take(k)
            val rest = body.drop(k)
            if (name.isEmpty || name.charAt(0).isDigit)
              throw new IllegalArgumentException(
                s"variables expansion failed: bad variable name in $${$body}")
            out ++= (rest match {
              case "" => env(name).getOrElse("")
              case r if r.startsWith(":-") || r.startsWith(":=") =>
                env(name).filter(_.nonEmpty)
                  .getOrElse(envsubst(r.drop(2), env))
              case r if r.startsWith("-") || r.startsWith("=") =>
                env(name).getOrElse(envsubst(r.drop(1), env))
              case r =>
                val op = r.takeWhile(ch => !isVarChar(ch))
                throw new IllegalArgumentException(
                  s"variables expansion failed: unsupported expansion " +
                    s"operator '$op' in $${$body} (only $${VAR}, " +
                    s"$${VAR:-default}, $${VAR:=default}, $${VAR-default}, " +
                    s"$${VAR=default} are supported)")
            })
            i = close + 1
          case d if isVarChar(d) && !d.isDigit =>
            var j = i + 1
            while (j < s.length && isVarChar(s.charAt(j))) j += 1
            out ++= env(s.substring(i + 1, j)).getOrElse("")
            i = j
          case _ => out += c; i += 1
        }
      } else { out += c; i += 1 }
    }
    out.result()
  }

  /** Parse a DSN with an explicit environment (parseDSN, dsn.go:18-57;
    * the reference's test injects the env map the same way). Left =
    * the reference's error strings. */
  def parse(dsn: String, env: String => Option[String]): Either[String, Parsed] = {
    val expanded =
      try envsubst(dsn, env)
      catch { case e: IllegalArgumentException => return Left(e.getMessage) }
    val uri =
      try new java.net.URI(expanded)
      catch { case e: java.net.URISyntaxException =>
        return Left(s"invalid url: ${e.getMessage}") }
    if (uri.getScheme != "postgresql")
      return Left(s"""invalid scheme "${uri.getScheme}", should be "postgresql"""")
    val host = Option(uri.getHost).getOrElse("")
    val port = if (uri.getPort >= 0) uri.getPort.toLong else 5432L
    val (user, pass) = Option(uri.getUserInfo).getOrElse("") match {
      case ui if ui.contains(':') =>
        val k = ui.indexOf(':'); (ui.take(k), ui.drop(k + 1))
      case ui => (ui, "")
    }
    val database = Option(uri.getPath).getOrElse("").stripPrefix("/")
    // raw query split (not URI.getQuery's eager decode): key order is
    // re-sorted anyway, values keep their URL form like Go's url.Values
    // rendering of the already-decoded pairs
    val pairs = Option(uri.getRawQuery).getOrElse("") match {
      case "" => Nil
      case q => q.split('&').toSeq.filter(_.nonEmpty).map { kv =>
        val k = kv.indexOf('=')
        if (k < 0) (urlDecode(kv), "")
        else (urlDecode(kv.take(k)), urlDecode(kv.drop(k + 1)))
      }
    }
    val options = pairs.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (k, vs) => s"$k=${vs.map(_._2).mkString(",")}" }
    Right(Parsed(dsn, host, port, database, user, pass, options))
  }

  /** Parse against the process environment (ParseDSN, dsn.go:14-16). */
  def parse(dsn: String): Either[String, Parsed] =
    parse(dsn, k => sys.env.get(k))

  private def urlDecode(s: String): String =
    java.net.URLDecoder.decode(s, "UTF-8")
}
