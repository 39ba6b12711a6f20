package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.operators.CsvSerializer
import graft.sources.GraphqlSchema.{EntityDesc, Field, FieldType}

/** Golden-file gate for the graph-CSV surface: the serialized bytes of
  * a constructed entity are diffed byte-for-byte against a checked-in,
  * HAND-VERIFIED fixture derived from the reference's writer
  * conventions (csvprocessor/writer.go:142-311 field rendering +
  * entity.go:23-29 block ranges + Go `encoding/csv` quoting). This
  * pins the writer independently of the DuckDB oracle twins: an
  * accidental change to hex case, array escaping, NULL text, range
  * brackets, header order, or CSV quoting fails here even if both
  * engine twins drift together.
  *
  * Covered conventions: bytea `\x<lowerhex>`, bytes arrays
  * `{\xaa,\x0b}`, string-array escaping (`\`→`\\`, `,`→`\,`, NUL
  * stripped), scalar-string NUL strip (toValidString), typed
  * NULL/defaults per nullability (NULL / `` / 0 / false), both
  * block_range forms `[s,e)` and `[s,)`, the immutable `block$`
  * header, field ordering (id, range, then name-sorted), and Go-csv
  * quoting (quote iff comma/quote/newline; `"`→`""`; LF rows).
  *
  * Known Go-csv edges NOT exercised (both engines quote-safe but
  * differently): a field that is exactly `\.` and fields with leading
  * whitespace — Go quotes them, univocity does not. Neither occurs in
  * graph-node CSV output (every such value arrives wrapped in `{}`,
  * `\x`, or digits). */
class GoldenCsvSpec extends SparkSpec {

  private def golden(name: String): String = {
    val in = getClass.getResourceAsStream(s"/graft/golden/$name")
    assert(in != null, s"missing fixture $name")
    try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
  }

  private def writtenCsv(df: org.apache.spark.sql.DataFrame): String = {
    val tmp = Files.createTempDirectory("golden_csv").toFile
    tmp.deleteOnExit()
    val out = tmp.getAbsolutePath + "/out"
    df.coalesce(1).write.mode("overwrite")
      .options(CsvSerializer.writeOptions) // the canonical Go-csv-parity set
      .csv(out)
    val part = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("part-")).head
    new String(Files.readAllBytes(Paths.get(part.getPath)),
      StandardCharsets.UTF_8)
  }

  private def fieldsOf(fs: Field*): Map[String, Field] =
    fs.map(f => f.name -> f).toMap

  private val thingDesc = EntityDesc("thing", fieldsOf(
    Field("id", FieldType.Id, nullable = false, array = false),
    Field("b_opt", FieldType.Bytes, nullable = true, array = false),
    Field("b_req", FieldType.Bytes, nullable = false, array = false),
    Field("big_req", FieldType.BigInt, nullable = false, array = false),
    Field("dec_opt", FieldType.BigDecimal, nullable = true, array = false),
    Field("flag_req", FieldType.Bool, nullable = false, array = false),
    Field("hexes", FieldType.Bytes, nullable = false, array = true),
    Field("i_opt", FieldType.Int32, nullable = true, array = false),
    Field("slug", FieldType.Str, nullable = false, array = false),
    Field("tags", FieldType.Str, nullable = false, array = true),
    Field("title", FieldType.Str, nullable = true, array = false)
  ), immutable = false)

  test("mutable entity serializes byte-for-byte to the hand-verified fixture") {
    import spark.implicits._
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    val desc = thingDesc
    val rows = Seq(
      ("e-1", 100L, Option(250L), Option(b(0xDE, 0xAD)), b(0x00, 0xFF),
        Option("123456789012345678901234567890"), Option("1.5"),
        Option(true), Seq(b(0xAA), b(0x0B)), Option(42), Option("ok"),
        Seq("plain", "with,comma", "back\\slash", "nul\u0000char"),
        Option("Hello, \"World\"\nnext")),
      // NUL in the id pins the scalar toValidString strip; every
      // nullable field null; non-nullable nulls take typed defaults
      ("e-2\u0000x", 300L, Option.empty[Long], Option.empty[Array[Byte]],
        b(0x01), Option.empty[String], Option.empty[String],
        Option.empty[Boolean], Seq.empty[Array[Byte]], Option.empty[Int],
        Option.empty[String], Seq.empty[String], Option.empty[String])
    ).toDF("id", "start_block", "end_block", "b_opt", "b_req", "big_req",
      "dec_opt", "flag_req", "hexes", "i_opt", "slug", "tags", "title")
    assert(writtenCsv(CsvSerializer.serialize(rows, desc)) ===
      golden("thing.csv"))
  }

  test("reader round-trip: fixture -> typed rows -> re-serialized CSV is byte-identical") {
    // read the committed golden file back through GraphCsvReader, then
    // re-serialize: serialize ∘ read must be the identity on the TEXT
    // (the format-level inverse gate — any drift in hex case, array
    // escaping, NULL text, range brackets, or quoting breaks it)
    val desc = thingDesc
    val tmp = Files.createTempDirectory("golden_rt").toFile
    tmp.deleteOnExit()
    val src = tmp.getAbsolutePath + "/thing.csv"
    Files.writeString(Paths.get(src), golden("thing.csv"))
    val typed = graft.sources.GraphCsvReader.read(spark, src, desc)
    assert(writtenCsv(CsvSerializer.serialize(typed, desc)) ===
      golden("thing.csv"))
    // and the typed values themselves parse correctly
    val rows = typed.orderBy(org.apache.spark.sql.functions.col("id"))
      .collect()
    assert(rows.length === 2)
    val r1 = rows(0)
    assert(r1.getAs[String]("id") === "e-1")
    assert(r1.getAs[Long]("start_block") === 100L)
    assert(r1.getAs[Long]("end_block") === 250L)
    assert(r1.getAs[Array[Byte]]("b_req").toSeq === Seq(0x00.toByte, 0xFF.toByte))
    assert(r1.getAs[Seq[Array[Byte]]]("hexes").map(_.toSeq) ===
      Seq(Seq(0xAA.toByte), Seq(0x0B.toByte)))
    assert(r1.getAs[Seq[String]]("tags") ===
      Seq("plain", "with,comma", "back\\slash", "nulchar"))
    assert(r1.getAs[String]("title") === "Hello, \"World\"\nnext")
    assert(r1.getAs[String]("big_req") === "123456789012345678901234567890")
    assert(r1.getAs[Boolean]("flag_req") === true)
    assert(r1.getAs[Int]("i_opt") === 42)
    val r2 = rows(1)
    assert(r2.getAs[String]("id") === "e-2x")
    assert(r2.isNullAt(r2.fieldIndex("end_block"))) // live row: [300,)
    assert(r2.isNullAt(r2.fieldIndex("b_opt")))
    assert(r2.isNullAt(r2.fieldIndex("title")))
    assert(r2.isNullAt(r2.fieldIndex("i_opt")))
    assert(r2.getAs[Seq[String]]("tags") === Seq.empty)
    assert(r2.getAs[Seq[Array[Byte]]]("hexes") === Seq.empty)
    // FORCE_NOT_NULL: the empty slug cell reads as '' — a VALUE,
    // never SQL null (what postgres COPY loads for this column set)
    assert(!r2.isNullAt(r2.fieldIndex("slug")))
    assert(r2.getAs[String]("slug") === "")
  }

  test("reader handles a multi-file bundle directory (per-file headers)") {
    // a store is MANY bundle files, each with its own header row —
    // the read must union them and drop every header
    val tmp = Files.createTempDirectory("golden_dir").toFile
    tmp.deleteOnExit()
    val txt = golden("thing.csv")
    val (head, rows) = {
      val i = txt.indexOf('\n')
      (txt.substring(0, i + 1), txt.substring(i + 1))
    }
    // split the two records across two "bundles" (record 2 is the
    // final line; record 1 spans a quoted newline)
    val r2start = rows.lastIndexOf("e-2x,")
    Files.writeString(Paths.get(tmp.getPath, "0000000000-0000000999.csv"),
      head + rows.substring(0, r2start))
    Files.writeString(Paths.get(tmp.getPath, "0000001000-0000001999.csv"),
      head + rows.substring(r2start))
    val typed = graft.sources.GraphCsvReader.read(spark, tmp.getPath, thingDesc)
    assert(typed.count() === 2)
    assert(typed.select("id").collect().map(_.getString(0)).sorted.toSeq ===
      Seq("e-1", "e-2x"))
    // still byte-faithful after the union: re-serialized rows (sorted
    // by id) equal the fixture's data lines
    val reser = writtenCsv(CsvSerializer.serialize(
      typed.orderBy(org.apache.spark.sql.functions.col("id")), thingDesc))
    assert(reser === txt)
  }

  test("randomized end-to-end file round-trip: serialize -> csv -> read -> serialize") {
    import spark.implicits._
    // 40 deterministic pseudo-random rows over the full type surface;
    // values avoid only the DOCUMENTED format collapses (nullable
    // literal "NULL", nullable empty string, lone-[""] arrays, NUL)
    val rnd = new scala.util.Random(42)
    def rndStr(): String = {
      val alphabet = "ab\\,{}\"\n xyz09"
      val s = (0 until rnd.nextInt(12)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      if (s == "NULL" || s.isEmpty) s + "#" else s
    }
    def rndBytes(): Array[Byte] = {
      val b = new Array[Byte](rnd.nextInt(6)); rnd.nextBytes(b); b
    }
    val rows = (0 until 40).map { k =>
      val arr = (0 until rnd.nextInt(4)).map(_ => rndStr())
      val arrOk = if (arr == Seq("")) Seq("#") else arr
      ("id-" + k, k.toLong * 10,
        if (rnd.nextBoolean()) Option(k.toLong * 10 + 5) else None,
        if (rnd.nextBoolean()) Option(rndBytes()) else None,
        rndBytes(),
        if (rnd.nextBoolean()) Option(rnd.nextLong().toString) else None,
        Option(s"${rnd.nextInt(100)}.${rnd.nextInt(100)}"),
        Option(rnd.nextBoolean()),
        (0 until rnd.nextInt(3)).map(_ => rndBytes()),
        if (rnd.nextBoolean()) Option(rnd.nextInt()) else None,
        Option(rndStr()),
        arrOk,
        if (rnd.nextBoolean()) Option(rndStr()) else None)
    }.toDF("id", "start_block", "end_block", "b_opt", "b_req", "big_req",
      "dec_opt", "flag_req", "hexes", "i_opt", "slug", "tags", "title")
    // NOTE big_req is non-nullable in the desc but the rows leave it
    // null sometimes — exercising the typed "0" default through the
    // file and back (reads as "0", re-renders "0": stable from the
    // first pass on)
    val first = writtenCsv(CsvSerializer.serialize(rows.coalesce(1), thingDesc))
    val tmp = Files.createTempDirectory("golden_rnd").toFile
    tmp.deleteOnExit()
    val f = tmp.getAbsolutePath + "/r.csv"
    Files.writeString(Paths.get(f), first)
    val typed = graft.sources.GraphCsvReader.read(spark, f, thingDesc)
    val second = writtenCsv(CsvSerializer.serialize(typed, thingDesc))
    assert(second === first)
  }

  test("string-array unescape inverts the writer escaping on adversarial values") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // every nasty shape: separators, escapes, runs of backslashes,
    // braces, quotes, empties — NUL is excluded because the WRITER
    // strips it (that guarantee is what makes the parse exact).
    // Seq("") is excluded as a FORMAT property, not a parser one: the
    // writer renders both [] and [""] as `{}` (the reference's loader
    // has the same collapse), so the reader reads `{}` as [].
    val cases = Seq(
      Seq("a", "b"), Seq("", ""), Seq(","), Seq("\\"),
      Seq("\\,"), Seq("\\\\"), Seq("a,b", "c\\d"), Seq("{x}", "}{"),
      Seq("a\\", "\\b"), Seq("\"q\"", "line\nbreak"),
      Seq("\\\\\\", ",,,"), Seq("end\\"))
    cases.foreach { c =>
      val df = Seq(Tuple1(c)).toDF("arr")
      val rt = df.select(graft.sources.GraphCsvReader.stringArray(
        graft.functions.GraphCsv.escapedStringArray(col("arr"))).as("rt"))
      assert(rt.collect().head.getAs[Seq[String]]("rt") === c, s"case $c")
    }
  }

  test("immutable entity serializes byte-for-byte to the hand-verified fixture") {
    import spark.implicits._
    val desc = EntityDesc("imm", fieldsOf(
      Field("id", FieldType.Id, nullable = false, array = false),
      Field("v", FieldType.Int32, nullable = false, array = false)
    ), immutable = true)
    val rows = Seq(("i-1", 7L, 5)).toDF("id", "start_block", "v")
    assert(writtenCsv(CsvSerializer.serialize(rows, desc)) ===
      golden("imm.csv"))
  }
}
