package graft

import graft.functions.{GraphCsv, PortableHash, Vectors}
import graft.sources.GraphqlSchema
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants for the portable primitives — randomized
  * inputs driven through the actual Spark expressions (scalacheck
  * generators, deterministic seeds). */
class PropertySpec extends SparkSpec {

  import spark.implicits._

  private def forAll[A](gen: Gen[A], n: Int = 25)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  private def whenever(c: Boolean)(f: => Unit): Unit = if (c) f

  test("property: graft_char_stats matches a brute-force code-point histogram") {
    val gen = Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar,
      2 -> Gen.oneOf(' ', '.', ','),
      1 -> Gen.oneOf('é', 'ß', '中', '€'))).map(_.mkString)
    val cases = scala.collection.mutable.ListBuffer.empty[(Long, String)]
    var id = 0L
    forAll(gen, n = 40) { s => cases += ((id, s)); id += 1 }
    cases += ((id, "")) // empty string: (0, 0, 0) by definition
    val got = charStatsOf(cases.toSeq)
    cases.foreach { case (i, s) =>
      val counts = s.codePoints().toArray.groupBy(identity).view.mapValues(_.length.toLong)
      val n = counts.values.sum
      val sumsq = counts.values.map(c => c * c).sum
      assert(got(i) === ((n, counts.size.toLong, sumsq)), s"for ${s.take(40)}")
    }
  }

  test("property: native simhash/minhash/bigram forms equal the composable pipelines") {
    import spark.implicits._
    // random word sequences with heavy repetition, empty tokens from
    // double spaces, and occasional accents — the distributions the
    // corpus equality specs can't reach
    val word = Gen.frequency(
      6 -> Gen.oneOf("a", "b", "c", "dog", "cat", "née"),
      3 -> Gen.alphaLowerStr.suchThat(_.nonEmpty).map(_.take(5)),
      1 -> Gen.const("")) // "" between spaces == a double space
    val doc = Gen.chooseNum(0, 24).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    val cases = scala.collection.mutable.ListBuffer.empty[(Long, String)]
    var id = 0L
    forAll(doc, n = 50) { s => cases += ((id, s)); id += 1 }
    val docs = cases.toSeq.toDF("doc_id", "text")
    graft.plans.GraftExtensions.ensureRegistered(spark)

    // simhash: native vs explode+bit-vote aggregate
    val simNative = docs.selectExpr("doc_id", "graft_simhash(text) AS v")
      .where($"v".isNotNull).as[(Long, Long)].collect().toMap
    val sh = docs.withColumn("w", graft.functions.Shingles.tokens($"text"))
      .select($"doc_id", explode(graft.functions.Shingles.hashedFromTokens($"w")).as("h"))
    val proj = sh.select(col("doc_id") +: (0 until 4).map(g =>
      graft.functions.PortableHash.perm(
        graft.queries.Dedup.SimhashPermBase + g, $"h").as(s"g$g")): _*)
    val bitCols = (0 until 64).map { j =>
      sum(when(shiftright(col(s"g${j / 16}"), j % 16).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"b$j")
    }
    val simCol = (0 until 64).map(j =>
      when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L))).reduce(_ + _)
    val simComposed = proj.groupBy($"doc_id").agg(bitCols.head, bitCols.tail: _*)
      .withColumn("v", simCol).select($"doc_id", $"v").as[(Long, Long)].collect().toMap
    assert(simNative === simComposed)

    // minhash: native sigs vs explode+min aggregate
    val mhNative = docs.selectExpr("doc_id", "graft_minhash_sigs(text) AS hs")
      .where($"hs".isNotNull)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    val minCols = (0 until graft.queries.Dedup.NumPerms).map(i =>
      min(graft.functions.PortableHash.perm(i, $"h")).as(s"h$i"))
    val mhComposed = sh.groupBy($"doc_id").agg(minCols.head, minCols.tail: _*)
      .collect().map(r => r.getLong(0) ->
        (0 until graft.queries.Dedup.NumPerms).map(i => r.getAs[Long](s"h$i")).toList).toMap
    assert(mhNative === mhComposed)

    // bigram moments: native vs explode+double-groupBy
    val bgNative = graft.queries.TextAnalysis.repetitionMetrics(docs).collect()
      .map(r => r.getLong(0) -> ((r.getAs[Long]("n_tok"),
        r.getAs[Long]("top_bigram_x1000"), r.getAs[Long]("dup_bigram_x1000")))).toMap
    val bgComposed = graft.queries.TextAnalysis.repetitionMetricsComposable(docs).collect()
      .map(r => r.getLong(0) -> ((r.getAs[Long]("n_tok"),
        r.getAs[Long]("top_bigram_x1000"), r.getAs[Long]("dup_bigram_x1000")))).toMap
    assert(bgNative === bgComposed)
  }

  private def charStatsOf(rows: Seq[(Long, String)]): Map[Long, (Long, Long, Long)] = {
    graft.plans.GraftExtensions.ensureRegistered(spark)
    rows.toDF("doc_id", "text")
      .selectExpr("doc_id", "graft_char_stats(text) AS st")
      .selectExpr("doc_id", "st.n_ch", "st.distinct_chars", "st.sumsq")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
  }

  private val word = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)

  test("property: escaped pg arrays never contain an unescaped comma or backslash") {
    val gen = Gen.listOfN(4, Gen.oneOf(word, Gen.const("a\\b"), Gen.const("x,y"), Gen.const("")))
    forAll(gen) { (xs: List[String]) =>
      val out = Seq(Tuple1(xs)).toDF("arr")
        .select(GraphCsv.escapedStringArray($"arr")).as[String].head()
      assert(out.startsWith("{") && out.endsWith("}"))
      val body = out.drop(1).dropRight(1)
      // after splitting on UNESCAPED commas we must get the arity back
      val parts = body.split("(?<!\\\\),", -1)
      assert(xs.isEmpty || parts.length === xs.length)
      // every backslash escapes either a backslash or a comma
      val noPairs = body.replace("\\\\", "").replace("\\,", "")
      assert(!noPairs.contains("\\"))
    }
  }

  test("property: undo canonicalization equals a sequential replay interpreter") {
    // a delivery log: changes at increasing seq with block == seq, plus
    // undo signals at random positions rolling back a random depth
    case class Log(changeSeqs: List[Long], undos: List[(Long, Long)])
    val gen = for {
      n <- Gen.chooseNum(5, 60)
      seqs = (1L to n.toLong).toList
      undoCount <- Gen.chooseNum(0, 5)
      undos <- Gen.listOfN(undoCount, for {
        useq <- Gen.chooseNum(2L, n.toLong)
        depth <- Gen.chooseNum(1L, 30L)
      } yield (useq, math.max(0L, useq - depth)))
    } yield Log(seqs.filterNot(undos.map(_._1).toSet), undos.distinctBy(_._1))

    forAll(gen, n = 15) { (log: Log) =>
      // sequential replay: walk the merged log in seq order, keeping the
      // set of live blocks; an undo discards every block above last_valid
      val merged = (log.changeSeqs.map(s => (s, None: Option[Long])) ++
        log.undos.map { case (u, lv) => (u, Some(lv)) }).sortBy(_._1)
      var live = List.empty[Long]
      merged.foreach {
        case (s, None)      => live = s :: live
        case (_, Some(lv))  => live = live.filter(_ <= lv)
      }
      val changes = log.changeSeqs.map(s => (s.toString, s, "UPDATE", 1.0))
        .toDF("id", "block_num", "op", "value")
      val undos = log.undos.toDF("useq", "last_valid")
      val got = graft.operators.UndoCanonicalizer
        .canonicalize(spark, changes, undos)
        .select("block_num").as[Long].collect().toSet
      assert(got === live.toSet, s"log: $log")
    }
  }

  test("property: snake_case normalization is idempotent (digit-free) and lowercase") {
    // digit boundaries are NOT idempotent by design: the reference
    // splits lower→digit but protects upper→digit, so V2→v2→v_2
    // (schema/normalize.go:49-58); idempotence holds without digits
    val camel = for {
      parts <- Gen.nonEmptyListOf(Gen.oneOf("user", "Click", "ID", "count", "API"))
    } yield parts.mkString
    forAll(camel) { (s: String) =>
      val one = GraphqlSchema.toSnake(s)
      assert(GraphqlSchema.toSnake(one) === one) // idempotent
      assert(one === one.toLowerCase)
      assert(!one.contains("__"))
    }
  }

  test("property: scala toSnake matches the column expression on digit-free names") {
    // digit boundaries intentionally differ: GraphqlSchema.toSnake is
    // the full-parity caser (splitAfterNumber etc., NormalizeSpec),
    // the column expression is the DuckDB-portable subset
    val camel = Gen.nonEmptyListOf(Gen.oneOf("user", "Click", "ID", "API", "Big")).map(_.mkString)
    forAll(Gen.listOfN(8, camel)) { (names: List[String]) =>
      whenever(names.nonEmpty) {
        val viaExpr = names.toDF("s")
          .select(graft.functions.Normalize.toSnake($"s")).as[String].collect().toList
        assert(viaExpr === names.map(GraphqlSchema.toSnake))
      }
    }
  }

  test("property: universal-hash perms stay in [0, P) and are injective-ish") {
    forAll(Gen.listOfN(50, Gen.chooseNum(0L, (1L << 60) - 1))) { (hs: List[Long]) =>
      val df = hs.toDF("h")
      val out = df.select(PortableHash.perm(3, $"h").as("p")).as[Long].collect()
      assert(out.forall(p => p >= 0 && p < PortableHash.P))
    }
  }

  test("property: LongDot equals the reference fold on random vectors") {
    val vec = Gen.listOfN(16, Gen.chooseNum(-1000000L, 1000000L))
    forAll(Gen.zip(vec, vec)) { case (a: List[Long], b: List[Long]) =>
      graft.plans.GraftExtensions.ensureRegistered(spark)
      val got = Seq((a, b)).toDF("a", "b")
        .select(Vectors.dot($"a", $"b")).as[Long].head()
      assert(got === a.zip(b).map { case (x, y) => x * y }.sum)
    }
  }

  test("property: AsofJoin matches a naive in-memory point-in-time lookup") {
    val keyGen = Gen.chooseNum(0L, 4L)
    val timeGen = Gen.chooseNum(0L, 50L)
    val rightsGen = Gen.listOfN(30, Gen.zip(keyGen, timeGen, Gen.chooseNum(0L, 999L)))
    val leftsGen = Gen.listOfN(20, Gen.zip(keyGen, timeGen))
    forAll(Gen.zip(rightsGen, leftsGen), n = 10) { case (rights0, lefts0) =>
      // dedup right on (key,time) like the production wrapper does
      val rights = rights0.groupBy(r => (r._1, r._2))
        .map { case ((k, t), vs) => (k, t, vs.map(_._3).max) }.toList
      val lefts = lefts0.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
      val leftDf = lefts.toDF("row_id", "k", "t")
      val rightDf = rights.toDF("k", "t", "v")
      val got = graft.operators.AsofJoin
        .asofJoin(leftDf, rightDf, "k", "t", "k", "t", Seq("v"))
        .collect()
        .map(r => r.getAs[Long]("row_id") ->
          Option(r.get(r.fieldIndex("asof_v"))).map(_.asInstanceOf[Long])).toMap
      val want = lefts.map { case (id, k, t) =>
        val cands = rights.filter(r => r._1 == k && r._2 <= t)
        id -> (if (cands.isEmpty) None else Some(cands.maxBy(_._2)._3))
      }.toMap
      assert(got === want)
    }
  }

  test("property: AsofJoin's tie-break equals dedup-by-MAX then as-of on random tied inputs") {
    // round 8: the production wrapper stopped pre-aggregating ties and
    // instead orders equal-time right rows by value inside the window
    // — on ANY input with duplicate (key, time) right rows the two
    // formulations must agree
    val keyGen = Gen.chooseNum(0L, 3L)
    val timeGen = Gen.chooseNum(0L, 12L) // small domain => dense ties
    val rightsGen = Gen.listOfN(40, Gen.zip(keyGen, timeGen, Gen.chooseNum(0L, 999L)))
    val leftsGen = Gen.listOfN(20, Gen.zip(keyGen, timeGen))
    forAll(Gen.zip(rightsGen, leftsGen), n = 10) { case (rights, lefts0) =>
      val lefts = lefts0.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
      val leftDf = lefts.toDF("row_id", "k", "t")
      val rightDf = rights.toDF("k", "t", "v")
      val got = graft.operators.AsofJoin
        .asofJoin(leftDf, rightDf, "k", "t", "k", "t", Seq("v"),
          rightTieBreak = Seq("v"))
        .collect()
        .map(r => r.getAs[Long]("row_id") ->
          Option(r.get(r.fieldIndex("asof_v"))).map(_.asInstanceOf[Long])).toMap
      val deduped = rights.groupBy(r => (r._1, r._2))
        .map { case ((k, t), vs) => (k, t, vs.map(_._3).max) }.toList
      val want = lefts.map { case (id, k, t) =>
        val cands = deduped.filter(r => r._1 == k && r._2 <= t)
        id -> (if (cands.isEmpty) None else Some(cands.maxBy(_._2)._3))
      }.toMap
      assert(got === want)
    }
  }

  test("AsofJoin carries a genuinely-NULL right value instead of skipping it") {
    // right rows: v=7 at t=5, then v=NULL at t=10 — a left row at t=12
    // must see NULL (the latest right row), not fall back to 7
    val rightDf = Seq((1L, 5L, Some(7L)), (1L, 10L, None))
      .toDF("k", "t", "v")
    val leftDf = Seq((100L, 1L, 12L), (101L, 1L, 6L), (102L, 1L, 3L))
      .toDF("row_id", "k", "t")
    val got = graft.operators.AsofJoin
      .asofJoin(leftDf, rightDf, "k", "t", "k", "t", Seq("v"))
      .collect()
      .map(r => r.getAs[Long]("row_id") ->
        Option(r.get(r.fieldIndex("asof_v"))).map(_.asInstanceOf[Long])).toMap
    assert(got === Map(100L -> None, 101L -> Some(7L), 102L -> None))
  }

  test("property: connected components equal a union-find oracle on random graphs") {
    case class G(n: Int, edges: List[(Long, Long)])
    val gen = for {
      n <- Gen.chooseNum(2, 40)
      m <- Gen.chooseNum(1, 60)
      raw <- Gen.listOfN(m, for {
        a <- Gen.chooseNum(0, n - 1)
        b <- Gen.chooseNum(0, n - 1)
      } yield (a.toLong, b.toLong))
    } yield G(n, raw.filter(e => e._1 != e._2).distinct)

    forAll(gen, n = 5) { (g: G) =>
      whenever(g.edges.nonEmpty) {
        val pairs = g.edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
          .distinct.toDF("doc_a", "doc_b")
        val got = graft.queries.Dedup.connectedComponents(pairs).collect()
          .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
        // local union-find with min-root union: each root ends as its
        // component's minimum node id — exactly the operator's label
        val parent = Array.tabulate(g.n)(identity)
        def find(x: Int): Int = {
          var r = x
          while (parent(r) != r) r = parent(r)
          var c = x
          while (parent(c) != c) { val nx = parent(c); parent(c) = r; c = nx }
          r
        }
        g.edges.foreach { case (a, b) =>
          val ra = find(a.toInt); val rb = find(b.toInt)
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val touched = g.edges.flatMap(e => Seq(e._1, e._2)).distinct
        val want = touched.map(v => v -> find(v.toInt).toLong).toMap
        assert(got === want)
        // BOTH closure engines: the default gate closes graphs this
        // size on the driver, so force the distributed pointer-jumping
        // loop too — the random graphs must agree with the oracle on
        // either side of the 2^18-edge gate
        val gotDist = graft.queries.Dedup.connectedComponents(pairs, 0L).collect()
          .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
        assert(gotDist === want)
      }
    }
  }

  test("property: PQ kernels match a brute-force reference on random codebooks") {
    import graft.functions.{PqCodes, PqTable}
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    val numM = 4; val sub = 4; val dims = numM * sub; val k = 5
    val gen = for {
      vec <- Gen.listOfN(dims, Gen.chooseNum(-1000000L, 1000000L))
      books <- Gen.listOfN(numM * k * sub, Gen.chooseNum(-1000000L, 1000000L))
    } yield (vec.toArray, books.toArray)
    forAll(gen, n = 40) { case (vec, books) =>
      // reference: per subspace, explicit argmin of the true L2², first
      // minimum wins ties (the kernel's strict > on 2·dot − |c|² must
      // agree: both reduce to the same lexicographic choice)
      def l2(m: Int, j: Int): Long = (0 until sub).map { d =>
        val diff = vec(m * sub + d) - books((m * k + j) * sub + d)
        diff * diff
      }.sum
      val wantCodes = (0 until numM).map(m =>
        (0 until k).minBy(j => (l2(m, j), j))).toArray
      val wantTable = (0 until numM).flatMap(m => (0 until k).map(j =>
        (0 until sub).map(d =>
          vec(m * sub + d) * books((m * k + j) * sub + d)).sum)).toArray
      val vecData = new GenericArrayData(vec)
      val booksData = new GenericArrayData(books)
      val gotCodes = PqCodes(null, null, null)
        .nullSafeEval(vecData, booksData, numM).asInstanceOf[ArrayData].toIntArray()
      val gotTable = PqTable(null, null, null)
        .nullSafeEval(vecData, booksData, numM).asInstanceOf[ArrayData].toLongArray()
      assert(gotCodes.sameElements(wantCodes),
        s"codes ${gotCodes.toList} != ${wantCodes.toList}")
      assert(gotTable.sameElements(wantTable))
    }
  }

  test("property: shuffle-shard partitions any id set losslessly with exact offsets") {
    import graft.queries.Analytics
    val gen = for {
      n <- Gen.choose(0, 60)
      ids <- Gen.listOfN(n, Gen.choose(0L, 100000L)).map(_.distinct)
      sizes <- Gen.listOfN(ids.length, Gen.choose(0L, 500L))
    } yield ids.zip(sizes)
    forAll(gen, n = 10) { docs =>
      val df = docs.toDF("doc_id", "n_chars")
      val out = Analytics.shuffleShard(df, 4).collect()
      assert(out.length === docs.length) // lossless
      val sizeOf = docs.toMap
      out.groupBy(_.getAs[Long]("shard")).values.foreach { g =>
        val inOrder = g.sortBy(_.getAs[Long]("pos"))
        assert(inOrder.map(_.getAs[Long]("pos")).toSeq ===
          (0L until g.length).toSeq)
        var off = 0L
        inOrder.foreach { r =>
          assert(r.getAs[Long]("start_offset") === off)
          off += sizeOf(r.getAs[Long]("doc_id"))
        }
      }
    }
  }

  test("property: distributed PageRank equals the sequential integer recurrence on random graphs") {
    import graft.queries.Analytics
    // random directed multigraphs, made undirected exactly like the
    // operator (both directions, multiplicity = weight)
    val gen = for {
      n <- Gen.choose(2, 12)
      m <- Gen.choose(1, 40)
      es <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n.toLong - 1)
        b <- Gen.choose(0L, n.toLong - 1) if a != b
      } yield (a, b))
      if es.nonEmpty
    } yield es
    forAll(gen, n = 12) { es =>
      val und = (es ++ es.map(_.swap)).groupBy(identity)
        .map { case (e, os) => e -> os.length.toLong }
      val deg = und.groupBy(_._1._1).map { case (s, g) => s -> g.values.sum }
      val nodes = deg.keySet
      val base = 15L * Analytics.PrScale / 100L
      var r = nodes.map(_ -> Analytics.PrScale).toMap
      for (_ <- 1 to Analytics.PrIters) {
        val in = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
        for (((s, dd), w) <- und) in(dd) += w * (r(s) / deg(s))
        r = nodes.map(v => v -> (base + (85L * in(v)) / 100L)).toMap
      }
      val want = r.toSeq.sortBy { case (v, rk) => (-rk, v) }
      val edgesDf = und.toSeq.map { case ((s, dd), w) => (s, dd, w, deg(s)) }
        .toDF("src", "dst", "w", "deg")
      val got = Analytics.pagerank(edgesDf, Analytics.PrIters, 1000)
        .collect().map(x => (x.getAs[Long]("node"), x.getAs[Long]("rank_scaled")))
      assert(got.toSeq === want, s"edges=$es")
    }
  }

  test("property: graph-CSV string-array unescape inverts the writer on random values") {
    // elements drawn heavy on the escape alphabet (backslash, comma,
    // braces, quotes, newline); NUL excluded (the writer strips it)
    // and the lone-[""] array excluded (the format renders [] and
    // [""] identically — documented, shared with the reference)
    val elemGen = Gen.listOf(Gen.frequency(
      4 -> Gen.oneOf('\\', ','),
      2 -> Gen.oneOf('{', '}', '"', '\n'),
      6 -> Gen.alphaNumChar)).map(_.mkString)
    val arrGen = Gen.choose(0, 5).flatMap(n => Gen.listOfN(n, elemGen))
      .suchThat(a => a != List(""))
    forAll(arrGen, n = 60) { a =>
      val rt = Seq(Tuple1(a)).toDF("arr")
        .select(graft.sources.GraphCsvReader.stringArray(
          GraphCsv.escapedStringArray(col("arr"))).as("rt"))
        .collect().head.getSeq[String](0).toList
      assert(rt === a, s"array $a")
    }
  }

  test("property: BM25 ranking equals an exact-integer reference fold on random indexes") {
    import graft.queries.TextAnalysis
    // random (doc_id, t, c) index with counts up to 10^6 (exercises the
    // decimal(38) headroom) + random multi-term queries over the same
    // small vocabulary; the reference fold computes the same algebra
    // with BigInt division (truncating, operands positive == DIV)
    val vocab = Vector("a", "b", "c", "d", "e")
    val gen = for {
      nDocs <- Gen.chooseNum(1, 8)
      rows <- Gen.sequence[List[(Long, String, Long)], (Long, String, Long)](
        (0 until nDocs).flatMap { d =>
          vocab.map(t => for {
            keep <- Gen.prob(0.6)
            c <- Gen.chooseNum(1L, 1000000L)
          } yield if (keep) (d.toLong, t, c) else (d.toLong, t, 0L))
        })
      nq <- Gen.chooseNum(1, 3)
      qs <- Gen.listOfN(nq, Gen.someOf(vocab :+ "zz").suchThat(_.nonEmpty))
    } yield (rows.filter(_._3 > 0), qs.zipWithIndex.flatMap { case (ts, i) =>
      ts.map(t => (i.toLong + 1L, t)) })
    forAll(gen, n = 20) { case (rows, queries) =>
      whenever(rows.nonEmpty && queries.nonEmpty) {
        val dl = rows.groupBy(_._1).map { case (d, rs) => d -> rs.map(_._3).sum }
        val avgdl = dl.values.sum / dl.size
        val dfm = rows.groupBy(_._2).map { case (t, rs) => t -> rs.size.toLong }
        val cmap = rows.map { case (d, t, c) => (d, t) -> c }.toMap
        val want = queries.groupBy(_._1).toSeq.flatMap { case (q, qts) =>
          val scores = dl.keys.toSeq.flatMap { d =>
            val s = qts.map(_._2).flatMap { t =>
              for (c <- cmap.get((d, t)); df <- dfm.get(t)) yield {
                val idf = 1000000000L / df
                val num = BigInt(idf) * c * 22000 * avgdl
                val den = BigInt(10000) * avgdl * c + BigInt(3000) * avgdl +
                  BigInt(9000) * dl(d)
                (num / den).toLong
              }
            }.sum
            if (qts.map(_._2).exists(t => cmap.contains((d, t)))) Some(d -> s) else None
          }
          scores.sortBy { case (d, s) => (-s, d) }.take(10).zipWithIndex
            .map { case ((d, s), i) => (q, i + 1, d, s) }
        }.toSet
        val got = TextAnalysis.bm25TopDocs(
            rows.toDF("doc_id", "t", "c"), queries, 10).collect()
          .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rk"),
            r.getAs[Long]("doc_id"), r.getAs[Long]("score"))).toSet
        assert(got === want, s"rows=$rows queries=$queries")
      }
    }
  }

  test("property: RRF fusion equals a reference fold on random rank lists") {
    import graft.queries.Ann
    // per query: a random subset of docs ranked 1..n by each retriever
    // independently (possibly disjoint); the reference fold computes
    // 1e6/(60+rk) contributions and ranks (-rrf, doc)
    val gen = for {
      docs <- Gen.chooseNum(1, 10)
      nLex <- Gen.chooseNum(0, docs)
      nVec <- Gen.chooseNum(0, docs)
      lexDocs <- Gen.pick(nLex, 0 until docs)
      vecDocs <- Gen.pick(nVec, 0 until docs)
    } yield (lexDocs.zipWithIndex.map { case (d, i) => (1L, d.toLong, i + 1) },
      vecDocs.zipWithIndex.map { case (d, i) => (1L, d.toLong, i + 1) })
    forAll(gen, n = 30) { case (lex, vec) =>
      whenever(lex.nonEmpty || vec.nonEmpty) {
        val contrib = (rk: Int) => 1000000L / (60L + rk)
        val byDoc = (lex.map { case (_, d, rk) => d -> (contrib(rk), rk, 0) } ++
          vec.map { case (_, d, rk) => d -> (contrib(rk), 0, rk) })
          .groupBy(_._1).map { case (d, xs) =>
            (d, xs.map(_._2._1).sum, xs.map(_._2._2).max, xs.map(_._2._3).max)
          }.toSeq
        val want = byDoc.sortBy { case (d, rrf, _, _) => (-rrf, d) }.take(5)
          .zipWithIndex.map { case ((d, rrf, l, v), i) => (1L, i + 1, d, rrf, l, v) }.toSet
        val got = Ann.rrfFuse(
            lex.toSeq.toDF("query_id", "doc_id", "lex_rk"),
            vec.toSeq.toDF("query_id", "doc_id", "vec_rk"), 5).collect()
          .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rk"),
            r.getAs[Long]("doc_id"), r.getAs[Long]("rrf"),
            r.getAs[Int]("lex_rk"), r.getAs[Int]("vec_rk"))).toSet
        assert(got === want, s"lex=$lex vec=$vec")
      }
    }
  }

  test("property: graft_fingerprint equals the composable md5 chain on random unicode") {
    graft.plans.GraftExtensions.ensureRegistered(spark)
    // char pool weighted toward the kernel's decision boundaries:
    // case-mapped ASCII, the two non-ASCII → ASCII lowercases (Kelvin
    // sign, dotted İ), multi-byte strips, digits, punctuation, runs of
    // spaces, other whitespace
    val ch = Gen.frequency(
      8 -> Gen.alphaNumChar,
      4 -> Gen.const(' '),
      2 -> Gen.oneOf('!', '.', '-', '_', '\t', '\n'),
      2 -> Gen.oneOf('é', 'ß', '中', '€', 'Σ', 'ı', 'K', 'İ'),
      1 -> Gen.oneOf('̇', 'Ａ', '\ud83d')) // bare high surrogate
    val gen = Gen.listOf(ch).map(_.mkString)
    val cases = scala.collection.mutable.ListBuffer.empty[(Long, String)]
    var id = 0L
    forAll(gen, n = 60) { s =>
      // a bare high surrogate (from the emoji's first char landing
      // without its pair) is not valid UTF-16; String→UTF8String
      // replaces it — keep those too, they exercise the malformed path
      cases += ((id, s)); id += 1
    }
    val rows = cases.toSeq.toDF("id", "text")
      .select(col("id"),
        call_function("graft_fingerprint", col("text")).as("got"),
        graft.queries.TextAnalysis.fingerprintTwin(col("text")).as("twin"))
      .collect()
    rows.foreach { r =>
      assert(r.getString(1) === r.getString(2),
        s"id=${r.getLong(0)} text=${cases(r.getLong(0).toInt)._2.take(60)}")
    }
  }

  test("property: graft_md5 is bit-identical to Spark's md5 on strings and binary") {
    graft.plans.GraftExtensions.ensureRegistered(spark)
    val gen = Gen.oneOf(
      Gen.listOf(Gen.asciiPrintableChar).map(_.mkString),
      Gen.listOf(Gen.oneOf("é", "中", "😀", "a", " ")).map(_.mkString),
      Gen.const(""))
    val cases = scala.collection.mutable.ListBuffer.empty[(Long, String)]
    var id = 0L
    forAll(gen, n = 50) { s => cases += ((id, s)); id += 1 }
    val rows = cases.toSeq.toDF("id", "text")
      .select(col("id"),
        md5(col("text")).as("want"),
        call_function("graft_md5", col("text")).as("got"),
        md5(col("text").cast("binary")).as("want_bin"),
        call_function("graft_md5", col("text").cast("binary")).as("got_bin"))
      .collect()
    rows.foreach { r =>
      assert(r.getString(2) === r.getString(1), s"string arm, id=${r.getLong(0)}")
      assert(r.getString(4) === r.getString(3), s"binary arm, id=${r.getLong(0)}")
    }
    // null propagates like the builtin
    val nr = Seq[(Integer, String)]((1, null)).toDF("id", "text")
      .select(call_function("graft_md5", col("text"))).collect()(0)
    assert(nr.isNullAt(0))
  }

  test("property: WavCodec round-trips all params; parse NEVER throws on garbage") {
    import graft.sources.WavCodec
    // round-trip: every parameter combination over random sample bytes
    val params = for {
      rate <- Gen.chooseNum(1, 192000)
      channels <- Gen.chooseNum(1, 8)
      bits <- Gen.oneOf(8, 16, 24, 32)
      n <- Gen.chooseNum(0, 300)
      bytes <- Gen.listOfN(n, Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
      list <- Gen.oneOf(true, false)
    } yield (rate, channels, bits, bytes.toArray, list)
    forAll(params, n = 60) { case (rate, channels, bits, samples, list) =>
      val meta = WavCodec.parse(WavCodec.encode(samples, rate, channels, bits, list))
        .fold(e => fail(s"self-encoded refused: $e"), identity)
      assert(meta.sampleRate === rate && meta.channels === channels &&
        meta.bitsPerSample === bits && meta.dataBytes === samples.length)
      assert(meta.nSamples === samples.length.toLong / (channels * bits / 8))
    }
    // total-function contract for 100 TB of dirty payloads: arbitrary
    // garbage — including prefixes of VALID files, the nastiest class —
    // parses to Left or Right, never an exception
    val garbage = Gen.oneOf(
      Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue)).map(_.toArray),
      for {
        n <- Gen.chooseNum(0, 80)
        cut <- Gen.chooseNum(0, 44 + 80)
      } yield WavCodec.encode(Array.fill(n)(7.toByte), 8000, 1, 8).take(cut),
      // valid container with a few random bytes flipped
      for {
        n <- Gen.chooseNum(0, 40)
        pos <- Gen.chooseNum(0, 43)
        b <- Gen.chooseNum(Byte.MinValue, Byte.MaxValue)
      } yield {
        val f = WavCodec.encode(Array.fill(n)(3.toByte), 44100, 2, 16)
        f(pos % f.length) = b; f
      })
    forAll(garbage, n = 120) { bytes =>
      WavCodec.parse(bytes).fold(
        err => assert(err.nonEmpty),
        meta => assert(meta.channels > 0 && meta.bitsPerSample > 0))
    }
  }
}
