package graft

import graft.queries.{Ann, Dedup, Multimodal, TextAnalysis}
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  test("dd_exact: keep_id is the minimum doc_id of its hash group") {
    val rows = Dedup.ddExact(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_dups")).sum === Tables.documents(spark, sf).count())
    assert(rows.forall(_.getAs[Long]("keep_id") >= 0))
  }

  test("dd_exact_incremental: merged state equals the full recompute, any split") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val full = Dedup.ddExact(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // three different deterministic splits, incl. empty-batch extremes
    Seq[org.apache.spark.sql.Column => org.apache.spark.sql.Column](
      c => c % 5 === 0, c => c % 2 === 0, c => c < 0).foreach { batchOf =>
      def state(df: org.apache.spark.sql.DataFrame) = df
        .groupBy(md5($"text").as("text_hash"))
        .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_dups"))
      val merged = Dedup.mergeExactState(
          state(docs.filter(!batchOf($"doc_id"))),
          state(docs.filter(batchOf($"doc_id")))).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(merged === full)
    }
  }

  test("dd_ngram_jaccard: pairs are ordered, jaccard >= 1/2, symmetric-free") {
    val rows = Dedup.ddNgramJaccard(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
      assert(r.getAs[Long]("inter") * 2 >= r.getAs[Long]("union_n"))
    }
    val keys = rows.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    assert(keys.distinct.length === keys.length)
  }

  test("dd_containment: threshold holds on real data; pairs ordered and distinct") {
    val rows = Dedup.ddContainment(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
      assert(r.getAs[Long]("inter") * 10 >= r.getAs[Long]("n_small") * 9)
      assert(r.getAs[Long]("inter") <= r.getAs[Long]("n_small"))
    }
    val keys = rows.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    assert(keys.distinct.length === keys.length)
  }

  test("dd_containment: planted near-superset found where jaccard rejects it") {
    import spark.implicits._
    // doc 0 = a 30-word passage; doc 1 = that passage verbatim plus a
    // 300-word continuation: containment(0 in 1) = 1.0 but jaccard
    // ~ 28/328 — the quote-inclusion class only the containment
    // predicate catches. doc 2 is unrelated.
    def words(tag: String, n: Int) = (0 until n).map(i => s"$tag$i").mkString(" ")
    val small = words("a", 30)
    val docs = Seq(
      (0L, small, "en", "web", small.length.toLong),
      (1L, small + " " + words("b", 300), "en", "web", 0L),
      (2L, words("c", 50), "en", "web", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("contain").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val cont = Dedup.ddContainment(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    assert(cont.toSet === Set((0L, 1L)))
    val jac = Dedup.ddNgramJaccard(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    assert(!jac.contains((0L, 1L)), "jaccard should reject the asymmetric pair")
  }

  test("dd_minhash_lsh: exact duplicates always collide") {
    import spark.implicits._
    // exact dups share every shingle => identical signature => same bands
    val dupPairs = Tables.documents(spark, sf)
      .groupBy(md5($"text").as("h")).agg(collect_list($"doc_id").as("ids"))
      .filter(size($"ids") > 1).select($"ids").as[Seq[Long]].collect()
      .flatMap(ids => ids.sorted.combinations(2).map(p => (p(0), p(1))))
      .toSet
    val got = Dedup.ddMinhashLsh(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    // only pairs with >=3 words shingle; documents here are all long
    assert(dupPairs.subsetOf(got), s"missing ${dupPairs.diff(got).take(5)}")
  }

  test("dd_cluster: collapse+star labels equal clique-pair CC on real data") {
    // the round-5 linear path (exact-collapse + star edges) must be
    // indistinguishable from CC over the full clique pair set — the
    // formulation the DuckDB oracle still uses
    val got = Dedup.ddCluster(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    val want = Dedup.connectedComponents(Dedup.ddMinhashLsh(spark, sf)).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("star edges: linear volume per bucket, closure identical to clique") {
    import spark.implicits._
    // one mega-bucket of 50 + one pair bucket + a bridge doc in both:
    // clique edges = C(50,2)+..., star = 49+...; components must agree
    val bands = (
      (1L to 50L).map(id => (id, 0, "mega")) ++
        Seq((100L, 0, "pb"), (101L, 0, "pb"), (50L, 1, "bridge"), (100L, 1, "bridge"))
      ).toDF("doc_id", "band", "bkey")
    val star = Dedup.starEdges(bands)
    // 49 (mega) + 1 (pb) + 1 (bridge) = 51 edges, vs C(50,2)+2 = 1227
    assert(star.count() === 51)
    val labels = Dedup.connectedComponents(star).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    // bridge doc 50/100 unites mega + pb into one component rooted at 1
    assert((1L to 50L).forall(labels(_) === 1L))
    assert(labels(100L) === 1L && labels(101L) === 1L)
  }

  test("dd_cluster_incremental: merged state equals the full clustering, any split") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val full = Dedup.ddCluster(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    // three deterministic splits incl. the empty-batch and
    // everything-is-new extremes; labels must be IDENTICAL — including
    // when a new twin's doc_id undercuts the standing representative
    Seq[org.apache.spark.sql.Column => org.apache.spark.sql.Column](
      c => c % 5 === 0, c => c % 2 === 1, c => c >= 0).foreach { batchOf =>
      val got = Dedup.clusterIncremental(
          docs.filter(!batchOf($"doc_id")), docs.filter(batchOf($"doc_id"))).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
      assert(got === full)
    }
    assert(full.nonEmpty)
  }

  test("dd_cluster: min-label propagation resolves chains, cycles, and islands") {
    import spark.implicits._
    // chain 1-2-3-4 (diameter 3, needs >1 round), triangle 10-11-12,
    // island pair 20-21 — asserted on BOTH closure engines: the default
    // (driver union-find at this size) and the forced distributed loop
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (20L, 21L)).toDF("doc_a", "doc_b")
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L)
    Seq(Dedup.CcDriverMaxEdges, 0L).foreach { gate =>
      val got = Dedup.connectedComponents(pairs, gate).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
      assert(got === want, s"driverMaxEdges=$gate")
    }
  }

  test("dd_cluster: pointer jumping resolves a 200-node chain within the round cap") {
    import spark.implicits._
    // diameter 199 — pure neighbor propagation needs 199 rounds and
    // would hit MaxCcIters (25); path doubling converges in ~log2(199).
    // driverMaxEdges=0 forces the DISTRIBUTED loop (the default would
    // close this 398-directed-edge graph on the driver)
    val chain = (0L until 199L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(chain, 0L).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id"))
    assert(got.length === 200)
    assert(got.forall(_._2 === 0L))
  }

  test("dd_cluster: driver union-find equals the distributed loop on real LSH candidates") {
    val pairs = Dedup.ddMinhashLsh(spark, sf)
    val driver = Dedup.connectedComponents(pairs, Dedup.CcDriverMaxEdges).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    val dist = Dedup.connectedComponents(pairs, 0L).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    assert(driver === dist)
    assert(driver.nonEmpty)
  }

  test("tx_repetition: constructed repetition scores exactly") {
    import spark.implicits._
    // "a b a b a b": 5 bigram slots — "a b"×3, "b a"×2 → top 3/5, dup 5/5
    // "x y z": 2 distinct bigrams → top 1/2, dup 0
    // "solo": no bigrams → excluded
    val docs = Seq((1L, "a b a b a b"), (2L, "x y z"), (3L, "solo"))
      .toDF("doc_id", "text")
    val rows = graft.queries.TextAnalysis.repetitionMetrics(docs)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("top_bigram_x1000"), r.getAs[Long]("dup_bigram_x1000")))).toMap
    assert(rows === Map(1L -> ((600L, 1000L)), 2L -> ((500L, 0L))))
    // the real operator over the corpus: per-milles bounded, and the top
    // bigram's share never exceeds the duplicated share unless unique
    val real = graft.queries.TextAnalysis.txRepetition(spark, sf).collect()
    assert(real.nonEmpty)
    real.foreach { r =>
      val top = r.getAs[Long]("top_bigram_x1000")
      val dup = r.getAs[Long]("dup_bigram_x1000")
      assert(top >= 0 && top <= 1000 && dup >= 0 && dup <= 1000, r.toString)
    }
  }

  test("tx_repetition: native expression is value-identical to the explode+agg form") {
    def snap(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      r.getAs[Long]("doc_id") -> ((r.getAs[Long]("n_tok"),
        r.getAs[Long]("top_bigram_x1000"), r.getAs[Long]("dup_bigram_x1000")))).toMap
    val docs = Tables.documents(spark, sf)
    val native = snap(graft.queries.TextAnalysis.repetitionMetrics(docs))
    val composed = snap(graft.queries.TextAnalysis.repetitionMetricsComposable(docs))
    assert(native.keySet === composed.keySet)
    native.foreach { case (id, v) => assert(v === composed(id), s"doc $id") }
  }

  test("tx_repetition: stateless expression form equals the distributed aggregation") {
    // the streaming gate's per-row expression and the batch
    // explode+agg are two implementations of the same metric — they
    // must agree on every corpus doc (incl. 0 for bigram-less docs)
    val viaAgg = graft.queries.TextAnalysis.txRepetition(spark, sf)
      .select(col("doc_id"), col("dup_bigram_x1000")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaExpr = Tables.documents(spark, sf)
      .select(col("doc_id"),
        graft.queries.TextAnalysis.dupBigramX1000Expr(col("text")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // agg form excludes n_tok<2 docs; expr form maps them to 0
    viaAgg.foreach { case (id, v) => assert(viaExpr(id) === v, s"doc $id") }
    (viaExpr.keySet -- viaAgg.keySet).foreach(id => assert(viaExpr(id) === 0L, s"doc $id"))
  }

  test("dd_simhash: identical texts get identical simhash; hamming to dups is 0") {
    import spark.implicits._
    val withText = Tables.documents(spark, sf).select($"doc_id", md5($"text").as("h"))
    val sim = Dedup.ddSimhash(spark, sf)
    val joined = sim.join(withText, "doc_id")
      .groupBy($"h").agg(countDistinct($"simhash").as("n"))
      .agg(max($"n")).collect().head.getLong(0)
    assert(joined === 1L)
  }

  test("dd_diversity_sample: exact ceil(n/10) quota per bucket, reproducible") {
    val rows = Dedup.ddDiversitySample(spark, sf).collect()
    assert(rows.nonEmpty)
    // one row per kept doc, and keeps are a subset of the corpus
    val ids = rows.map(_.getAs[Long]("doc_id"))
    assert(ids.distinct.length === ids.length)
    rows.groupBy(_.getAs[Long]("bucket")).foreach { case (_, rs) =>
      val n = rs.head.getAs[Long]("bucket_n")
      assert(rs.forall(_.getAs[Long]("bucket_n") === n))
      val quota = (n + Dedup.DiversityKeepDiv - 1) / Dedup.DiversityKeepDiv
      assert(rs.length.toLong === quota)
      // picks are the dense prefix 1..quota of the bucket's hash order
      assert(rs.map(_.getAs[Long]("pick")).sorted.toSeq === (1L to quota))
    }
    // bucket sizes account for every signable doc (≥3 tokens)
    val signable = Dedup.ddSimhash(spark, sf).count()
    val totalN = rows.groupBy(_.getAs[Long]("bucket"))
      .map(_._2.head.getAs[Long]("bucket_n")).sum
    assert(totalN === signable)
    val again = Dedup.ddDiversitySample(spark, sf).collect()
    assert(again.map(_.toSeq).toSet === rows.map(_.toSeq).toSet)
  }

  test("diversitySample at 16-bit buckets: wider prefix, same quota semantics") {
    // the 100 TB remedy is a parameter, not an edit: 16 bits ⇒ 65536
    // buckets, quota rule unchanged, and every bucket key is the top
    // 16 simhash bits of its members
    val rows = Dedup.diversitySample(Tables.documents(spark, sf), 16).collect()
    assert(rows.nonEmpty)
    val simhash = Dedup.ddSimhash(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    rows.foreach { r =>
      val want = (simhash(r.getAs[Long]("doc_id")) >>> 48) & 0xffffL
      assert(r.getAs[Long]("bucket") === want)
    }
    rows.groupBy(_.getAs[Long]("bucket")).foreach { case (_, rs) =>
      val n = rs.head.getAs[Long]("bucket_n")
      val quota = (n + Dedup.DiversityKeepDiv - 1) / Dedup.DiversityKeepDiv
      assert(rs.length.toLong === quota)
    }
    // a 16-bit partition of the corpus refines the 12-bit one: strictly
    // more buckets on any corpus with >1 distinct 16-bit prefix
    val b12 = Dedup.ddDiversitySample(spark, sf).collect()
      .map(_.getAs[Long]("bucket")).distinct.length
    val b16 = rows.map(_.getAs[Long]("bucket")).distinct.length
    assert(b16 >= b12)
  }

  test("dd_keep_best: kept doc is the argmax of (alpha, stop, -id) within its cluster") {
    val clusters = Dedup.ddCluster(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id"))
    val quality = TextAnalysis.txQualityScore(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("alpha_x1000"), r.getAs[Long]("stop_x1000")))).toMap
    // independent in-memory argmax over the same inputs
    val want = clusters.groupBy(_._2).map { case (cid, members) =>
      val ids = members.map(_._1)
      val keep = ids.maxBy(id => (quality(id)._1, quality(id)._2, -id))
      cid -> ((ids.length.toLong, keep, quality(keep)._1))
    }
    val got = Dedup.ddKeepBest(spark, sf).collect()
      .map(r => r.getAs[Long]("cluster_id") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("keep_id"),
          r.getAs[Long]("keep_alpha_x1000")))).toMap
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("dd_minhash_lsh: native signatures equal the explode+min-agg form") {
    graft.plans.GraftExtensions.ensureRegistered(spark)
    val native = Tables.documents(spark, sf)
      .selectExpr("doc_id", "graft_minhash_sigs(text) AS hs")
      .where(col("hs").isNotNull)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getSeq[Long](1).toList).toMap
    val composed = Dedup.minhashSignaturesComposable(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (0 until Dedup.NumPerms).map(i => r.getAs[Long](s"h$i")).toList).toMap
    assert(native.keySet === composed.keySet)
    native.foreach { case (id, v) => assert(v === composed(id), s"doc $id") }
    // <3 tokens ⇒ null ⇒ filtered, same as the agg form emitting no row
    import spark.implicits._
    val tiny = Seq((1L, "one two"), (2L, "a b c")).toDF("doc_id", "text")
      .selectExpr("doc_id", "graft_minhash_sigs(text) AS hs")
      .where(col("hs").isNotNull).select("doc_id")
      .as[Long].collect().toSet
    assert(tiny === Set(2L))
  }

  test("dd_simhash: native expression is bit-for-bit the composable aggregate") {
    import spark.implicits._
    val native = Dedup.ddSimhash(spark, sf)
      .select($"doc_id", $"simhash", $"band").as[(Long, Long, Long)]
      .collect().map { case (id, h, b) => id -> ((h, b)) }.toMap
    val composed = Dedup.ddSimhashComposable(spark, sf)
      .select($"doc_id", $"simhash", $"band").as[(Long, Long, Long)]
      .collect().map { case (id, h, b) => id -> ((h, b)) }.toMap
    assert(native.keySet === composed.keySet)
    native.foreach { case (id, v) => assert(v === composed(id), s"doc $id") }
  }

  test("dd_simhash: <3-token and multi-space texts match the composable form") {
    import spark.implicits._
    val docs = Seq(
      (1L, "one two"),             // 2 tokens: no shingles, no row
      (2L, "a  b c d"),            // double space: empty token kept
      (3L, "x y z"),               // exactly one shingle
      (4L, "a a a a a a")          // repeated shingles: distinct-set vote
    ).toDF("doc_id", "text")
    graft.plans.GraftExtensions.ensureRegistered(spark)
    val native = docs
      .selectExpr("doc_id", "graft_simhash(text) AS simhash")
      .where($"simhash".isNotNull)
      .as[(Long, Long)].collect().toMap
    // composable reference over the same constructed frame
    import org.apache.spark.sql.functions.{col => c}
    val sh = docs.withColumn("w", graft.functions.Shingles.tokens(c("text")))
      .select(c("doc_id"),
        org.apache.spark.sql.functions.explode(
          graft.functions.Shingles.hashedFromTokens(c("w"))).as("h"))
    val proj = sh.select(c("doc_id") +:
      (0 until 4).map(g =>
        graft.functions.PortableHash.perm(Dedup.SimhashPermBase + g, c("h")).as(s"g$g")): _*)
    val bitCols = (0 until 64).map { j =>
      org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.when(
          org.apache.spark.sql.functions.shiftright(c(s"g${j / 16}"), j % 16)
            .bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$j")
    }
    val simCol = (0 until 64).map(j =>
      org.apache.spark.sql.functions.when(c(s"b$j") > 0,
        org.apache.spark.sql.functions.lit(1L << j))
        .otherwise(org.apache.spark.sql.functions.lit(0L))).reduce(_ + _)
    val composed = proj.groupBy(c("doc_id")).agg(bitCols.head, bitCols.tail: _*)
      .withColumn("simhash", simCol)
      .select(c("doc_id"), c("simhash")).as[(Long, Long)].collect().toMap
    assert(native.keySet === Set(2L, 3L, 4L))
    assert(native === composed)
  }

  test("dd_embed_cosine: pairs pass the cosine threshold and share a bucket") {
    val rows = Dedup.ddEmbedCosine(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("id_a") < r.getAs[Long]("id_b"))
      assert(r.getAs[Double]("cos") >= Dedup.CosTau)
    }
  }

  test("dd_chunk_dup: planted duplicate passage scores 1000, unique text 0") {
    import spark.implicits._
    // docs 1 and 2 are exact copies (every chunk duplicated corpus-wide);
    // doc 3 shares no vocabulary, so no chunk can collide
    val passage = Tables.documents(spark, sf).limit(1)
      .collect().head.getAs[String]("text")
    val unique = (1 to 80).map(i => s"uniqueword$i").mkString(" ")
    val docs = Seq((1L, passage), (2L, passage), (3L, unique))
      .toDF("doc_id", "text")
    val got = Dedup.chunkDupProfile(TextAnalysis.chunkFingerprints(docs))
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("dup_chunk_x1000"), r.getAs[Long]("dup_word_x1000")))).toMap
    assert(got(1L) === ((1000L, 1000L)))
    assert(got(2L) === ((1000L, 1000L)))
    assert(got(3L) === ((0L, 0L)))
    // corpus invariants: shares bounded, word totals cover the corpus
    val real = Dedup.ddChunkDup(spark, sf).collect()
    assert(real.length === Tables.documents(spark, sf).count())
    real.foreach { r =>
      val c = r.getAs[Long]("dup_chunk_x1000"); val w = r.getAs[Long]("dup_word_x1000")
      assert(c >= 0 && c <= 1000 && w >= 0 && w <= 1000, r.toString)
    }
  }

  test("dd_embed_cosine finds planted near-identical vectors at the 0.95 cut") {
    import spark.implicits._
    graft.plans.GraftExtensions.ensureRegistered(spark)
    val rnd = new scala.util.Random(7)
    def vec(): Array[Float] = Array.fill(Dedup.Dims)(rnd.nextFloat() * 2 - 1)
    val base = vec()
    // id 1 = base + tiny noise (cos ≈ 0.999); ids 2.. = independent noise
    val near = base.map(x => x + (rnd.nextFloat() - 0.5f) * 0.02f)
    val planted = ((0L, base) :: (1L, near) ::
      (2L to 40L).map(i => (i, vec())).toList)
      .toDF("vec_id", "embedding")
    val got = Dedup.embedCosinePairs(planted, 0.95)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    assert(got.contains((0L, 1L)), s"planted pair missing, got ${got.toList}")
    assert(got.forall { case (a, b) => a == 0L && b == 1L },
      s"random vectors must not pass 0.95: ${got.toList}")
  }
}

class TextAnalysisSpec extends SparkSpec {

  test("tx_char_diversity: exact ppb Simpson on constructed strings") {
    import spark.implicits._
    // "aaaa": one char class => concentration 1, simpson 0.
    // "abab": two chars 2+2, sumsq 8, n² 16 => 1e9 - 8e9/16 = 5e8.
    // "aab":  counts 2,1, sumsq 5, n² 9 => 1e9 - 5e9 DIV 9 = 444444445
    //         (truncating div: 5e9/9 = 555555555.5… -> 555555555).
    val docs = Seq((1L, "aaaa"), (2L, "abab"), (3L, "aab"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.charDiversity(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_ch"), r.getAs[Long]("distinct_chars"),
          r.getAs[Long]("simpson_x1e9")))).toMap
    assert(got(1L) === ((4L, 1L, 0L)))
    assert(got(2L) === ((4L, 2L, 500000000L)))
    assert(got(3L) === ((3L, 2L, 444444445L)))
  }

  test("tx_char_diversity: one row per doc, index strictly below 1e9") {
    val n = Tables.documents(spark, sf).count()
    val rows = TextAnalysis.txCharDiversity(spark, sf).collect()
    assert(rows.length === n)
    rows.foreach { r =>
      val s = r.getAs[Long]("simpson_x1e9")
      assert(s >= 0 && s < 1000000000L)
      assert(r.getAs[Long]("distinct_chars") <= r.getAs[Long]("n_ch"))
    }
  }

  test("tx_token_count: counts are positive and n_bpe >= n_ws on clean text") {
    val rows = TextAnalysis.txTokenCount(spark, sf).collect()
    assert(rows.length === Tables.documents(spark, sf).count())
    rows.foreach { r =>
      assert(r.getAs[Long]("n_ws") > 0)
      assert(r.getAs[Long]("n_bpe") >= r.getAs[Long]("n_ws"))
    }
  }

  test("tx_quality_score: ratios are in [0, 1000]") {
    TextAnalysis.txQualityScore(spark, sf).collect().foreach { r =>
      val s = r.getAs[Long]("stop_x1000"); val a = r.getAs[Long]("alpha_x1000")
      assert(s >= 0 && s <= 1000); assert(a >= 0 && a <= 1000)
    }
  }

  test("tx_lang_id: guess is one of the known langs or und") {
    val langs = (TextAnalysis.LangOrder :+ "und").toSet
    TextAnalysis.txLangId(spark, sf).collect().foreach { r =>
      assert(langs.contains(r.getAs[String]("lang_guess")))
    }
  }

  test("tx_rarity: exact parts-per-billion on a constructed vocabulary") {
    import spark.implicits._
    // corpus tokens: a×5, b×1, c×1, d×1 → total 8;
    // freq(a) = 5e9 DIV 8 = 625_000_000, freq(b|c|d) = 125_000_000
    val docs = Seq((1L, "a a a a"), (2L, "a b"), (3L, "c d"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.rarityScores(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tok"), r.getAs[Long]("mean_freq_x1e9")))).toMap
    assert(got(1L) === ((4L, 625000000L)))
    assert(got(2L) === ((2L, (625000000L + 125000000L) / 2)))
    assert(got(3L) === ((2L, 125000000L)))
    // corpus invariants: one row per doc, scores in (0, 1e9]
    val real = TextAnalysis.txRarity(spark, sf).collect()
    assert(real.length === Tables.documents(spark, sf).count())
    real.foreach { r =>
      val f = r.getAs[Long]("mean_freq_x1e9")
      assert(f > 0 && f <= 1000000000L, r.toString)
    }
  }

  test("tx_tfidf_topterms: rare terms outrank common ones, ties break by term") {
    import spark.implicits._
    // df(a)=3 → unit 333_333_333; df(b)=2 → 500_000_000; df(c)=1 → 1e9.
    // doc 1: a×4 (score 4·333333333=1333333332) beats b×1 (5e8): the
    // 4×-repeated common term still wins — tf matters; doc 2: the
    // df-1 term c (1e9) outranks b (5e8) outranks nothing — idf matters.
    val docTf = Seq(
      (1L, "a", 4L), (1L, "b", 1L),
      (2L, "a", 1L), (2L, "b", 1L), (2L, "c", 1L),
      (3L, "a", 1L)).toDF("doc_id", "t", "c")
    val got = TextAnalysis.tfidfTop(docTf, 2).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("rk")) ->
        ((r.getAs[String]("t"), r.getAs[Long]("score")))).toMap
    assert(got((1L, 1)) === (("a", 4L * 333333333L)))
    assert(got((1L, 2)) === (("b", 500000000L)))
    assert(got((2L, 1)) === (("c", 1000000000L)))
    assert(got((2L, 2)) === (("b", 500000000L)))
    assert(got((3L, 1)) === (("a", 333333333L)))
    // corpus invariants: ≤K rows per doc, ranks contiguous from 1
    val real = TextAnalysis.txTfidfTopterms(spark, sf).collect()
    val byDoc = real.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.nonEmpty)
    byDoc.foreach { case (_, rows) =>
      assert(rows.length <= TextAnalysis.TfidfTopK)
      assert(rows.map(_.getAs[Int]("rk")).sorted === (1 to rows.length))
    }
  }

  test("tx_bm25: exact integer scores, tf saturation, absent terms, tie-break") {
    import spark.implicits._
    // corpus: d1 = x·2 y·1 (dl 3), d2 = x·1 z·3 (dl 4); avgdl = 7 DIV 2 = 3.
    // df(x)=2 → idf 5e8; df(y)=df(z)=1 → idf 1e9. Per-term score =
    // idf·tf·22000·avgdl DIV (10000·avgdl·tf + 3000·avgdl + 9000·dl):
    //   d1/x: 5e8·2·22000·3 DIV (60000+9000+27000) = 6.6e13 DIV 96000  = 687500000
    //   d2/x: 5e8·1·22000·3 DIV (30000+9000+36000) = 3.3e13 DIV 75000  = 440000000
    //   d2/z: 1e9·3·22000·3 DIV (90000+9000+36000) = 1.98e14 DIV 135000 = 1466666666
    //   d1/y: 1e9·1·22000·3 DIV (30000+9000+27000) = 6.6e13 DIV 66000  = 1000000000
    val docTf = Seq(
      (1L, "x", 2L), (1L, "y", 1L),
      (2L, "x", 1L), (2L, "z", 3L)).toDF("doc_id", "t", "c")
    val qs = Seq(1L -> "x", 1L -> "z", 1L -> "missing", 2L -> "y", 3L -> "missing")
    val got = TextAnalysis.bm25TopDocs(docTf, qs, 10).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rk")) ->
        ((r.getAs[Long]("doc_id"), r.getAs[Long]("score")))).toMap
    assert(got((1L, 1)) === ((2L, 440000000L + 1466666666L))) // multi-term sum
    assert(got((1L, 2)) === ((1L, 687500000L)))
    assert(got((2L, 1)) === ((1L, 1000000000L)))
    // query 3's only term has no postings: the query yields NO rows
    // (not a zero-score row) in both engines
    assert(got.size === 3)
    // tie-break: identical docs score identically → doc_id ascending
    val tie = Seq((10L, "w", 1L), (7L, "w", 1L)).toDF("doc_id", "t", "c")
    val tGot = TextAnalysis.bm25TopDocs(tie, Seq(1L -> "w"), 10).collect()
      .map(r => r.getAs[Int]("rk") -> r.getAs[Long]("doc_id")).toMap
    assert(tGot === Map(1 -> 7L, 2 -> 10L))
    // corpus invariants: ≤K rows per query, ranks contiguous from 1,
    // scores non-increasing in rank (the two-level top-K is exact)
    val real = TextAnalysis.txBm25(spark, sf).collect()
    val byQ = real.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.nonEmpty)
    byQ.foreach { case (_, rows) =>
      assert(rows.length <= TextAnalysis.Bm25TopK)
      val sorted = rows.sortBy(_.getAs[Int]("rk"))
      assert(sorted.map(_.getAs[Int]("rk")).toSeq === (1 to rows.length))
      val scores = sorted.map(_.getAs[Long]("score")).toSeq
      assert(scores === scores.sorted.reverse)
    }
  }

  test("tx_calibration: exact curve rows, negative-score range, corpus invariants") {
    import spark.implicits._
    // mn=0 mx=100 B=4 → wd = 100 DIV 4 + 1 = 26; buckets: 0,50→1,90→3,100→3
    // top-down: b3 (n=2,pos=1) → prec 5e8, recall 5e8 (tp=2)
    //           b1 (cum 3, 2)  → prec 666666666, recall 1e9
    //           b0 (cum 4, 2)  → prec 5e8, recall 1e9
    val scored = Seq((1L, 100L, 1L), (2L, 90L, 0L), (3L, 50L, 1L), (4L, 0L, 0L))
      .toDF("doc_id", "score", "pos")
    val got = TextAnalysis.calibrationCurve(scored, 4).collect()
      .map(r => r.getAs[Long]("bucket") ->
        ((r.getAs[Long]("threshold_lo"), r.getAs[Long]("n"),
          r.getAs[Long]("cum_n"), r.getAs[Long]("cum_pos"),
          r.getAs[Long]("precision_x1e9"), r.getAs[Long]("recall_x1e9")))).toMap
    assert(got(3L) === ((78L, 2L, 2L, 1L, 500000000L, 500000000L)))
    assert(got(1L) === ((26L, 1L, 3L, 2L, 666666666L, 1000000000L)))
    assert(got(0L) === ((0L, 1L, 4L, 2L, 500000000L, 1000000000L)))
    assert(got.size === 3)
    // negative score range: mn=-10 mx=10 B=2 → wd=11; thresholds -10/1
    val neg = Seq((1L, -10L, 1L), (2L, 10L, 0L)).toDF("doc_id", "score", "pos")
    val gotN = TextAnalysis.calibrationCurve(neg, 2).collect()
      .map(r => r.getAs[Long]("bucket") ->
        ((r.getAs[Long]("threshold_lo"), r.getAs[Long]("precision_x1e9"),
          r.getAs[Long]("recall_x1e9")))).toMap
    assert(gotN(1L) === ((1L, 0L, 0L)))
    assert(gotN(0L) === ((-10L, 500000000L, 1000000000L)))
    // degenerate range: every score identical → wd = 0 DIV B + 1 = 1,
    // one bucket at threshold mn, full recall
    val flat = Seq((1L, 7L, 1L), (2L, 7L, 0L), (3L, 7L, 1L)).toDF("doc_id", "score", "pos")
    val gotF = TextAnalysis.calibrationCurve(flat, 4).collect()
    assert(gotF.length === 1)
    val fr = gotF.head
    assert(fr.getAs[Long]("bucket") === 0L)
    assert(fr.getAs[Long]("threshold_lo") === 7L)
    assert(fr.getAs[Long]("cum_n") === 3L)
    assert(fr.getAs[Long]("precision_x1e9") === 666666666L)
    assert(fr.getAs[Long]("recall_x1e9") === 1000000000L)
    // corpus: bottom row covers every doc and full recall; precision in
    // range; cum counts strictly increasing top-down
    val real = TextAnalysis.txCalibration(spark, sf).collect()
      .sortBy(-_.getAs[Long]("bucket"))
    assert(real.nonEmpty && real.length <= TextAnalysis.CalBuckets)
    val nDocs = Tables.documents(spark, sf).count()
    assert(real.last.getAs[Long]("cum_n") === nDocs)
    assert(real.last.getAs[Long]("recall_x1e9") === 1000000000L)
    real.foreach { r =>
      val p = r.getAs[Long]("precision_x1e9")
      assert(p >= 0L && p <= 1000000000L, r.toString)
    }
    val cums = real.map(_.getAs[Long]("cum_n"))
    assert(cums.zip(cums.tail).forall { case (a, b) => a < b })
  }

  test("tx_classify: scores are exact weight sums over hashed features") {
    import spark.implicits._
    // reference computation in plain Scala: same md5 hash, same mod
    def idx(t: String): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8"))
      val h = java.lang.Long.parseLong(
        d.take(8).map("%02x".format(_)).mkString.take(15), 16)
      (h % TextAnalysis.ClsDims).toInt
    }
    val docs = Seq((1L, "alpha beta gamma"), (2L, "alpha alpha"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.classifyScores(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tok"), r.getAs[Long]("score"), r.getAs[Long]("kept")))).toMap
    val s1 = Seq("alpha", "beta", "gamma").map(t => TextAnalysis.clsWeight(idx(t))).sum
    val s2 = 2 * TextAnalysis.clsWeight(idx("alpha"))
    assert(got(1L) === ((3L, s1, if (s1 > 0) 1L else 0L)))
    assert(got(2L) === ((2L, s2, if (s2 > 0) 1L else 0L)))
    // corpus: one row per doc, kept consistent with score
    val real = TextAnalysis.txClassify(spark, sf).collect()
    assert(real.length === Tables.documents(spark, sf).count())
    real.foreach { r =>
      assert((r.getAs[Long]("score") > 0) === (r.getAs[Long]("kept") == 1L))
    }
    // the synthetic weights must not be degenerate: both classes occur
    assert(real.exists(_.getAs[Long]("kept") == 1L))
    assert(real.exists(_.getAs[Long]("kept") == 0L))
  }

  test("tx_pack: exact offsets and bins on a constructed shard") {
    import spark.implicits._
    // one shard (ids all ≡ 1 mod 8): lengths 3, 4, 5 → starts 0, 3, 7;
    // budget 6 → bins 0, 0, 1. doc 16 lands in shard 0, start 0.
    val docs = Seq(
      (1L, "a b c"), (9L, "d e f g"), (17L, "h i j k l"), (16L, "m n"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.packSequences(docs, 8, 6L).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("shard"), r.getAs[Long]("n_tok"),
          r.getAs[Long]("start_tok"), r.getAs[Long]("seq_in_shard")))).toMap
    assert(got(1L) === ((1L, 3L, 0L, 0L)))
    assert(got(9L) === ((1L, 4L, 3L, 0L)))
    assert(got(17L) === ((1L, 5L, 7L, 1L)))
    assert(got(16L) === ((0L, 2L, 0L, 0L)))
  }

  test("tx_pack: corpus layout is gapless and deterministic per shard") {
    val rows = TextAnalysis.txPack(spark, sf).collect()
    assert(rows.length === Tables.documents(spark, sf).count())
    rows.groupBy(_.getAs[Long]("shard")).values.foreach { shard =>
      val inOrder = shard.sortBy(_.getAs[Long]("doc_id"))
      // each doc starts exactly where the previous one ended — the
      // packed stream has no holes and no overlaps
      inOrder.foldLeft(0L) { (expectStart, r) =>
        assert(r.getAs[Long]("start_tok") === expectStart, r.toString)
        assert(r.getAs[Long]("seq_in_shard")
          === expectStart / TextAnalysis.PackBudget)
        expectStart + r.getAs[Long]("n_tok")
      }
    }
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("tx_pii_scrub: planted PII is counted and replaced, kinds don't cross-fire") {
    import spark.implicits._
    val docs = Seq(
      (1L, "contact alice@example.com or bob@test.org today"),
      (2L, "server at 10.1.2.3 and 192.168.0.1 up"),
      (3L, "call +15551234567 now"),
      (4L, "no personal information here"),
      (5L, "mixed alice@example.com at 10.1.2.3 call +15551234567")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.piiScrub(docs, col("text")).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_email"), r.getAs[Long]("n_ipv4"),
          r.getAs[Long]("n_phone"), r.getAs[String]("scrubbed_md5")))).toMap
    assert(got(1L) === ((2L, 0L, 0L,
      md5Hex("contact <EMAIL> or <EMAIL> today"))))
    assert(got(2L) === ((0L, 2L, 0L, md5Hex("server at <IP> and <IP> up"))))
    assert(got(3L) === ((0L, 0L, 1L, md5Hex("call <PHONE> now"))))
    assert(got(4L) === ((0L, 0L, 0L, md5Hex("no personal information here"))))
    assert(got(5L) === ((1L, 1L, 1L, md5Hex("mixed <EMAIL> at <IP> call <PHONE>"))))
  }

  test("tx_pii_scrub: counts are replacement counts — overlaps inside emails don't double-count") {
    import spark.implicits._
    // an IPv4-shaped local part and a phone-shaped local part are
    // consumed by the email replacement; counting on the ORIGINAL text
    // would report phantom n_ipv4/n_phone with no matching substitution
    val docs = Seq(
      (1L, "x 1.2.3.4@host.com y"),
      (2L, "y +15551234567@mail.example.org z")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.piiScrub(docs, col("text")).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_email"), r.getAs[Long]("n_ipv4"),
          r.getAs[Long]("n_phone"), r.getAs[String]("scrubbed_md5")))).toMap
    assert(got(1L) === ((1L, 0L, 0L, md5Hex("x <EMAIL> y"))))
    assert(got(2L) === ((1L, 0L, 0L, md5Hex("y <EMAIL> z"))))
  }

  test("tx_pii_scrub: the fused kernel equals the composable six-regex chain") {
    import spark.implicits._
    // adversarial shapes: trigger bytes without matches, matches whose
    // replacement sits flush against later-pass candidates, multi-byte
    // text, emails consuming ip/phone shapes, boundary \b cases
    val adversarial = Seq(
      "a@b", "@", "x@y.z", "a@b.co", ".1.", "1.2", "1.2.3.4", "999.999.999.999",
      "1.2.3.4.5", "a1.2.3.4b", "+", "+1", "+1234567", "+123456789012345",
      "+1234567890123456", "plus+7notnum", "üñïçødé@exämple.com 1.2.3.4",
      "tail@x.com5.6.7.8", "2.2@x.com 3.3.4.4", "+1555@x.com +7654321",
      "<EMAIL> 1.2.3.4", "a@b.cd+1234567", "", " ", "a.b@c.d.e.fg",
      "edge1.2.3.4@5.6.7.8mail.com", "1.2.3.4@x.co 5.6.7.8 +9876543"
    )
    val docs = (adversarial.zipWithIndex.map { case (t, i) => (i.toLong, t) } ++
      Tables.documents(spark, sf).collect()
        .map(r => (1000L + r.getAs[Long]("doc_id"), r.getAs[String]("text"))))
      .toDF("doc_id", "text")
    val planted = TextAnalysis.withSyntheticPii(docs)
    def key(r: org.apache.spark.sql.Row) =
      r.getAs[Long]("doc_id") -> ((r.getAs[Long]("n_email"), r.getAs[Long]("n_ipv4"),
        r.getAs[Long]("n_phone"), r.getAs[String]("scrubbed_md5")))
    val kernel = TextAnalysis.piiScrub(planted, col("pii_text")).collect().map(key).toMap
    val twin = TextAnalysis.piiScrubComposable(planted, col("pii_text")).collect().map(key).toMap
    assert(kernel === twin)
    assert(kernel.nonEmpty)
  }

  test("tx_pii_scrub: synthetic corpus counts follow the residue rule") {
    // withSyntheticPii plants exactly one email/ip/phone for doc_id
    // residues 3/5/7; the base corpus is PII-free word soup
    val rows = TextAnalysis.txPiiScrub(spark, sf).collect()
    assert(rows.length === Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("n_email") === (if (id % 3 == 0) 1L else 0L), s"doc $id email")
      assert(r.getAs[Long]("n_ipv4") === (if (id % 5 == 0) 1L else 0L), s"doc $id ipv4")
      assert(r.getAs[Long]("n_phone") === (if (id % 7 == 0) 1L else 0L), s"doc $id phone")
    }
  }

  test("tx_fingerprint: identical for identical texts, stable across runs") {
    val a = TextAnalysis.txFingerprint(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val b = TextAnalysis.txFingerprint(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(a === b)
  }
}

class AnnSpec extends SparkSpec {

  test("ann_topk_brute: exactly top-k rows per query, ranks dense, cos descending") {
    val rows = Ann.annTopkBrute(spark, sf).collect()
    rows.groupBy(_.getAs[Long]("qid")).values.foreach { g =>
      val byRank = g.sortBy(_.getAs[Int]("rank"))
      assert(byRank.map(_.getAs[Int]("rank")).sameElements(1 to g.length))
      assert(g.length === Ann.TopK)
      val cs = byRank.map(_.getAs[Double]("cos"))
      assert(cs.zip(cs.tail).forall { case (x, y) => x >= y })
    }
  }

  test("ann_hybrid_rrf: exact RRF scores, one-sided docs, tie-break, fusion order") {
    import spark.implicits._
    // query 1: doc 5 is lex rk1 + vec rk2 → 10⁶ DIV 61 + 10⁶ DIV 62 =
    // 16393 + 16129 = 32522; doc 6 is lex-only rk2 → 10⁶ DIV 62 =
    // 16129; doc 7 is vec-only rk1 → 16393. Fusion beats either alone;
    // the vec-only rk1 doc outranks the lex-only rk2 doc.
    val lex = Seq((1L, 5L, 1), (1L, 6L, 2)).toDF("query_id", "doc_id", "lex_rk")
    val vec = Seq((1L, 7L, 1), (1L, 5L, 2)).toDF("query_id", "doc_id", "vec_rk")
    val got = Ann.rrfFuse(lex, vec, 10).collect()
      .map(r => r.getAs[Int]("rk") ->
        ((r.getAs[Long]("doc_id"), r.getAs[Long]("rrf"),
          r.getAs[Int]("lex_rk"), r.getAs[Int]("vec_rk")))).toMap
    assert(got(1) === ((5L, 32522L, 1, 2)))
    assert(got(2) === ((7L, 16393L, 0, 1)))
    assert(got(3) === ((6L, 16129L, 2, 0)))
    // tie: same ranks from disjoint retrievers → identical rrf, doc_id asc
    val lex2 = Seq((1L, 9L, 1)).toDF("query_id", "doc_id", "lex_rk")
    val vec2 = Seq((1L, 3L, 1)).toDF("query_id", "doc_id", "vec_rk")
    val tie = Ann.rrfFuse(lex2, vec2, 10).collect()
      .map(r => r.getAs[Int]("rk") -> r.getAs[Long]("doc_id")).toMap
    assert(tie === Map(1 -> 3L, 2 -> 9L))
    // corpus: every query present on either side appears; ranks dense;
    // rrf non-increasing; no null rank columns anywhere
    val real = Ann.annHybridRrf(spark, sf).collect()
    assert(real.nonEmpty)
    real.groupBy(_.getAs[Long]("query_id")).values.foreach { g =>
      val byRank = g.sortBy(_.getAs[Int]("rk"))
      assert(byRank.map(_.getAs[Int]("rk")).sameElements(1 to g.length))
      assert(g.length <= Ann.HybridTopK)
      val rrfs = byRank.map(_.getAs[Long]("rrf"))
      assert(rrfs.zip(rrfs.tail).forall { case (x, y) => x >= y })
      g.foreach { r =>
        assert(!r.isNullAt(r.fieldIndex("lex_rk")) && !r.isNullAt(r.fieldIndex("vec_rk")))
        assert(r.getAs[Int]("lex_rk") > 0 || r.getAs[Int]("vec_rk") > 0)
      }
    }
  }

  test("ann_lsh_bucket: recall >= 0.9 vs brute force at sf0.001") {
    def keys(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid"))).toSet
    val brute = keys(Ann.annTopkBrute(spark, sf))
    val lsh = keys(Ann.annLshBucket(spark, sf))
    val recall = lsh.intersect(brute).size.toDouble / brute.size
    info(s"lsh recall = $recall")
    assert(recall >= 0.9, s"recall $recall too low")
  }

  test("ann_knn_graph: multiplicity conserved, ranks dense, edges verified in-bucket") {
    import org.apache.spark.sql.functions._
    val rows = Ann.annKnnGraph(spark, sf).collect()
    assert(rows.nonEmpty)
    // one neighbor list per DISTINCT vector; multiplicities cover the
    // whole (signable) corpus
    val perRep = rows.groupBy(_.getAs[Long]("rep_id"))
    val mSum = perRep.map(_._2.head.getAs[Long]("m")).sum
    val corpus = Tables.embeddings(spark, sf).count()
    assert(mSum <= corpus)
    val distinctReps = perRep.size
    assert(mSum >= distinctReps)
    perRep.values.foreach { g =>
      val byRank = g.sortBy(_.getAs[Int]("rank"))
      assert(byRank.map(_.getAs[Int]("rank")).sameElements(1 to g.length))
      assert(g.length <= Ann.KnnK)
      val cs = byRank.map(_.getAs[Double]("cos"))
      assert(cs.zip(cs.tail).forall { case (x, y) => x >= y })
      // no self edges
      assert(g.forall(r => r.getAs[Long]("nid") != r.getAs[Long]("rep_id")))
    }
    // determinism
    val again = Ann.annKnnGraph(spark, sf).collect().map(_.toSeq).toSet
    assert(again === rows.map(_.toSeq).toSet)
  }
}

class MultimodalSpec extends SparkSpec {

  test("mm_resize: resamples the DECODED gray plane; geometry from the parsed header") {
    val rows = Multimodal.mmResize(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val resized = r.getAs[Array[Byte]]("resized")
      val origLen = r.getAs[Int]("orig_len")
      val w = r.getAs[Int]("width")
      val h = r.getAs[Int]("height")
      // geometry must be what the PARSER read back from the container
      assert(w === Multimodal.imageWidth(origLen))
      assert(h === math.max((origLen + w - 1) / w, 1))
      // the plane is w·h samples (letterboxed), not the raw payload
      assert(resized.length === math.min(w * h, Multimodal.ResizeTarget))
    }
    // exact bytes for one known payload through the real decode chain
    val p = Array.tabulate(200)(_.toByte)
    val img = Multimodal.decodeGray(p)
    assert(img.width === Multimodal.imageWidth(200))
    assert(img.gray.length === img.width * img.height)
    assert(img.gray.take(200).toSeq === p.toSeq)
    val out = Multimodal.resamplePlane(img.gray, 64)
    assert(out.length === 64)
    assert(out(0) === img.gray(0) &&
      out(63) === img.gray((63L * img.gray.length / 64).toInt))
  }

  test("mm_binary_meta: every field is what the RIFF walker reads from the container") {
    val rows = Multimodal.mmBinaryMeta(spark, sf).collect()
    val texts = Tables.documents(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"))).toMap
    assert(rows.length === texts.size)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val bytes = texts(id).getBytes("UTF-8")
      val (rate, channels, bits) = Multimodal.wavParams(id)
      // rebuild the container independently and parse it HERE — the
      // distributed row must be exactly the local walk's facts
      val wav = graft.sources.WavCodec.encode(bytes, rate, channels, bits,
        withListChunk = id % 3 == 0)
      val meta = graft.sources.WavCodec.parse(wav).toOption.get
      assert(r.getAs[Int]("byte_len") === wav.length)
      assert(r.getAs[Int]("sample_rate") === meta.sampleRate)
      assert(r.getAs[Int]("channels") === meta.channels)
      assert(r.getAs[Int]("bits") === meta.bitsPerSample)
      assert(r.getAs[Long]("n_samples") === meta.nSamples)
      assert(r.getAs[Long]("duration_ms") === meta.durationMs)
      // ...and the parsed facts reconcile with first principles
      assert(meta.dataBytes === bytes.length)
      assert(meta.nSamples === bytes.length.toLong / (channels * bits / 8))
    }
  }
}

class ChunkFingerprintSpec extends SparkSpec {

  test("content-defined chunks are shift-resilient: a prefix edit only touches chunk 0") {
    import spark.implicits._
    val base = Tables.documents(spark, sf).limit(1).collect().head.getAs[String]("text")
    val docs = Seq((0L, base), (1L, "inserted prefix words " + base)).toDF("doc_id", "text")
    val fps = graft.queries.TextAnalysis.chunkFingerprints(docs)
      .collect().groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.map(_.getAs[String]("chunk_fp")).toSet).toMap
    val shared = fps(0L).intersect(fps(1L))
    // every chunk of the original except (at most) the first survives
    assert(shared.size >= fps(0L).size - 1,
      s"expected all but one chunk shared, got ${shared.size} of ${fps(0L).size}")
  }

  test("chunk word counts cover the document exactly") {
    import org.apache.spark.sql.functions._
    val total = graft.queries.TextAnalysis.txChunkFingerprint(spark, sf)
      .agg(sum("n_words")).collect().head.getLong(0)
    val expected = Tables.documents(spark, sf)
      .select(size(split(col("text"), " ")).cast("long").as("n"))
      .agg(sum("n")).collect().head.getLong(0)
    assert(total === expected)
  }
}

class PqSpec extends SparkSpec {
  test("ann_pq: recall >= 0.8 vs brute force after exact re-rank") {
    // collect each pipeline ONCE; recall and the exact-score check both
    // derive from the same rows (these are the suite's priciest plans)
    val bruteRows = graft.queries.Ann.annTopkBrute(spark, sf).collect()
    val pqRows = graft.queries.Ann.annPq(spark, sf).collect()
    def keys(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid"))).toSet
    val brute = keys(bruteRows)
    val recall = keys(pqRows).intersect(brute).size.toDouble / brute.size
    info(s"pq recall = $recall")
    assert(recall >= 0.8, s"recall $recall too low")
    // the re-ranked cosines are EXACT — any (qid, nid) the shortlist
    // shares with brute force must carry the identical score
    val bruteCos = bruteRows
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid")) -> r.getAs[Double]("cos")).toMap
    pqRows.foreach { r =>
      val k = (r.getAs[Long]("qid"), r.getAs[Long]("nid"))
      bruteCos.get(k).foreach(c => assert(c === r.getAs[Double]("cos"), k.toString))
    }
  }
}

class SemanticSpec extends SparkSpec {
  test("dd_semantic: decisions equal a sequential in-memory recompute") {
    val out = graft.queries.Ann.ddSemantic(spark, sf).collect()
      .map(r => r.getAs[Long]("vec_id") -> ((r.getAs[Int]("cent"),
        r.getAs[Int]("keep"),
        Option(r.getAs[java.lang.Long]("witness_id")).map(_.toLong))))
      .toMap
    val cents = graft.queries.Ann.semCentroidsForSpec
      .getOrElse(fail("centroids not trained"))
    // quantize exactly as Vectors.quantize, sequentially
    val vecs = Tables.embeddings(spark, sf).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1e6).toLong).toArray)
      .filter { case (_, v) => v.map(x => x * x).sum > 0 }
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.iterator.zip(b.iterator).map { case (x, y) => x * y }.sum
    def cos(a: Array[Long], b: Array[Long]): Double =
      dot(a, b).toDouble / math.sqrt(dot(a, a).toDouble * dot(b, b).toDouble)
    // assignment: argmax cosine, ties to the HIGHER centroid id
    val assigned = vecs.map { case (id, v) =>
      val scores = cents.map(c => cos(v, c))
      val cent = scores.indices.maxBy(j => (scores(j), j))
      (id, v, cent, scores(cent))
    }
    val expected = assigned.map { case (id, v, cent, ccos) =>
      val pruners = assigned.filter { case (uid, uv, ucent, uccos) =>
        ucent == cent && (uccos < ccos || (uccos == ccos && uid < id)) &&
          cos(uv, v) >= graft.queries.Ann.SemTau
      }
      val witness = pruners.sortBy { case (uid, _, _, uccos) => (uccos, uid) }
        .headOption.map(_._1)
      id -> ((cent, if (witness.isEmpty) 1 else 0, witness))
    }.toMap
    assert(out === expected)
    assert(out.nonEmpty)
    info(s"${out.size} vectors, ${out.count(_._2._2 == 0)} pruned")
  }

  test("dd_semantic: exact-collapsed form equals the all-pairs direct form") {
    val a = graft.queries.Ann.ddSemantic(spark, sf).collect()
      .map(_.toSeq).toSet
    val b = graft.queries.Ann.ddSemanticDirect(spark, sf).collect()
      .map(_.toSeq).toSet
    assert(a === b)
  }
}

class BestCentSpec extends SparkSpec {
  test("graft_best_cent: fused kernel equals the composable greatest(struct) twin") {
    import org.apache.spark.sql.functions._
    // train (memoized) so the centroids exist
    graft.queries.Ann.ddSemantic(spark, sf).collect()
    val cents = graft.queries.Ann.semCentroidsForSpec
      .getOrElse(fail("centroids not trained"))
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), graft.functions.Vectors.quantize(col("embedding")).as("qv"))
      .withColumn("n2", graft.functions.Vectors.dot(col("qv"), col("qv")))
      .filter(col("n2") > 0)
    val rows = e.select(col("vec_id"),
        graft.queries.Ann.bestCent(cents).as("k"),
        graft.queries.Ann.assignStructTwin(cents).as("t"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val k = r.getStruct(1)
      val t = r.getStruct(2)
      assert(k.getDouble(0) === t.getDouble(0), s"s for vec ${r.getLong(0)}")
      assert(k.getInt(1) === t.getInt(1), s"j for vec ${r.getLong(0)}")
    }
  }
}

class IvfSpec extends SparkSpec {
  test("ann_ivf: recall >= 0.7 vs brute force at sf0.001") {
    def keys(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid"))).toSet
    val brute = keys(graft.queries.Ann.annTopkBrute(spark, sf))
    val ivf = keys(graft.queries.Ann.annIvf(spark, sf))
    val recall = ivf.intersect(brute).size.toDouble / brute.size
    info(s"ivf recall = $recall")
    assert(recall >= 0.7, s"recall $recall too low")
  }
}

class IvfPqSpec extends SparkSpec {
  test("ann_ivf_pq: composed index recall vs brute force, exact re-rank scores, dense ranks") {
    val bruteRows = graft.queries.Ann.annTopkBrute(spark, sf).collect()
    val rows = graft.queries.Ann.annIvfPq(spark, sf).collect()
    def keys(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid"))).toSet
    val brute = keys(bruteRows)
    val recall = keys(rows).intersect(brute).size.toDouble / brute.size
    info(s"ivf+pq recall = $recall")
    // the two approximations compound (probed-list miss × ADC-shortlist
    // miss), so the floor sits below either standalone key's
    assert(recall >= 0.6, s"recall $recall too low")
    // re-ranked cosines are EXACT: any (qid, nid) shared with brute
    // force must carry the identical double
    val bruteCos = bruteRows
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid")) -> r.getAs[Double]("cos")).toMap
    rows.foreach { r =>
      val k = (r.getAs[Long]("qid"), r.getAs[Long]("nid"))
      bruteCos.get(k).foreach(c => assert(c === r.getAs[Double]("cos"), k.toString))
    }
    // structural: per query ranks dense from 1, bounded by TopK, no
    // self edges, descending scores
    rows.groupBy(_.getAs[Long]("qid")).values.foreach { g =>
      val byRank = g.sortBy(_.getAs[Int]("rank"))
      assert(byRank.map(_.getAs[Int]("rank")).sameElements(1 to g.length))
      assert(g.length <= graft.queries.Ann.TopK)
      assert(g.forall(r => r.getAs[Long]("nid") != r.getAs[Long]("qid")))
      val cs = byRank.map(_.getAs[Double]("cos"))
      assert(cs.zip(cs.tail).forall { case (x, y) => x >= y })
    }
  }
}

class FrameSampleSpec extends SparkSpec {
  test("mm_audio_window: offsets/lengths/digests match a sequential reference") {
    val texts = Tables.documents(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val rows = Multimodal.mmAudioWindow(spark, sf).collect()
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.keySet === texts.keySet)
    val md = java.security.MessageDigest.getInstance("MD5")
    byDoc.foreach { case (id, ws) =>
      val p = texts(id).getBytes("UTF-8")
      val expected = Iterator.from(0).map(_ * Multimodal.AudioHop)
        .takeWhile(_ < p.length).zipWithIndex.map { case (off, i) =>
          val len = math.min(Multimodal.AudioWin, p.length - off)
          md.reset(); md.update(p, off, len)
          (i, off, len, md.digest().map("%02x".format(_)).mkString)
        }.toSeq
      val got = ws.sortBy(_.getAs[Int]("win_idx")).map(r =>
        (r.getAs[Int]("win_idx"), r.getAs[Int]("win_offset"),
          r.getAs[Int]("win_len"), r.getAs[String]("win_md5"))).toSeq
      assert(got === expected, s"doc $id")
    }
  }

  test("tx_mix_plan: exact budget and rates on constructed weights") {
    import spark.implicits._
    // en weight 1000 (target 50%), fr 600 (15%): caps are
    // 1000e6/500000 = 2000 and 600e6/150000 = 4000 → budget 2000,
    // en alloc 1000 → rate 1e6; fr alloc 300 → rate 300e6/600 = 500000
    val docs = Seq(("en", 600L), ("en", 400L), ("fr", 600L))
      .toDF("lang", "n_chars")
    val got = TextAnalysis.mixPlan(docs).collect()
      .map(r => r.getAs[String]("lang") ->
        ((r.getAs[Long]("chars_total"), r.getAs[Long]("budget"),
          r.getAs[Long]("rate_ppm")))).toMap
    assert(got === Map(
      "en" -> ((1000L, 2000L, 1000000L)),
      "fr" -> ((600L, 2000L, 500000L))))
    // corpus run: rates bounded, the binding language ~wholesale
    val real = TextAnalysis.txMixPlan(spark, sf).collect()
    assert(real.length === TextAnalysis.TargetMixPpm.length)
    assert(real.forall(_.getAs[Long]("rate_ppm") <= 1000000L))
    assert(real.map(_.getAs[Long]("rate_ppm")).max >= 999990L)
  }

  test("mm_frame_sample: evenly spaced offsets, features match payload bytes") {
    val texts = Tables.documents(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text").getBytes("UTF-8"))).toMap
    val rows = graft.queries.Multimodal.mmFrameSample(spark, sf).collect()
    assert(rows.length === texts.size * graft.queries.Multimodal.FramesPerDoc)
    rows.foreach { r =>
      val payload = texts(r.getAs[Long]("doc_id"))
      val off = r.getAs[Int]("frame_offset")
      assert(off < payload.length)
      assert(r.getAs[Int]("frame_feature") === (payload(off) & 0xff))
    }
  }
}

class BpePairsSpec extends SparkSpec {

  test("tx_bpe_pairs: top merges equal a brute-force single-threaded count") {
    val got = TextAnalysis.txBpePairs(spark, sf).collect()
      .map(r => (r.getAs[String]("pair"), r.getAs[Long]("cnt")))
    // brute force: every adjacent char pair of every word occurrence
    val counts = new scala.collection.mutable.HashMap[String, Long]()
    Tables.documents(spark, sf).select("text").collect()
      .flatMap(r => Option(r.getString(0)))
      .foreach(_.split(" ", -1).foreach { w =>
        var i = 0
        while (i + 1 < w.length) {
          val p = w.substring(i, i + 2)
          counts.update(p, counts.getOrElse(p, 0L) + 1L)
          i += 1
        }
      })
    val want = counts.toSeq.sortBy { case (p, c) => (-c, p) }
      .take(TextAnalysis.BpeTopK)
    assert(got.toSeq === want)
  }
}

class PhashSpec extends SparkSpec {

  test("mm_phash: bands equal an independent bit-level recompute") {
    val texts = Tables.documents(spark, sf).collect()
      .flatMap(r => Option(r.getString(1)).filter(_.nonEmpty)
        .map(t => r.getAs[Long]("doc_id") -> t)).toMap
    val got = Multimodal.mmPhash(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("b0"), r.getAs[Int]("b1"), r.getAs[Int]("b2"), r.getAs[Int]("b3")))
      .toMap
    assert(got.keySet === texts.keySet)
    texts.foreach { case (id, t) =>
      // independent path: rebuild the letterboxed plane and the 9×8
      // grid dHash from scratch (no codec), 64-bit hash assembled
      // MSB-first, then split into bands
      val p = t.getBytes("UTF-8")
      val w = 36 + (p.length % 5) * 3
      val h = math.max((p.length + w - 1) / w, 1)
      val px = Array.tabulate(w * h)(k => if (k < p.length) p(k) else ' '.toByte)
      var hash = BigInt(0)
      for (i <- 63 to 0 by -1) {
        val r = i / 8
        val c = i % 8
        val a = px((r * h / 8) * w + (c * w / 9)) & 0xff
        val b = px((r * h / 8) * w + ((c + 1) * w / 9)) & 0xff
        hash = (hash << 1) | (if (a > b) 1 else 0)
      }
      val want = Tuple4(
        (hash & 0xffff).toInt, ((hash >> 16) & 0xffff).toInt,
        ((hash >> 32) & 0xffff).toInt, ((hash >> 48) & 0xffff).toInt)
      assert(got(id) === want, s"doc $id")
    }
  }

  test("phashPairs: planted near-identical payloads pair up, distinct ones don't") {
    import spark.implicits._
    val base = Array.tabulate(256)(i => ((i * 37 + 11) % 251).toByte)
    // byte 8 is sample 2; 250 crosses both adjacent compares (159, 204)
    val near = base.clone(); near(8) = 250.toByte
    val far = base.reverse
    val hashed = Seq(1L -> base, 2L -> near, 3L -> far)
      .map { case (id, p) =>
        val h = Multimodal.stubPhash(p); (id, h(0), h(1), h(2), h(3))
      }.toDF("doc_id", "b0", "b1", "b2", "b3")
    val pairs = Multimodal.phashPairs(hashed, maxHamming = 3).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"), r.getAs[Int]("hamming")))
    assert(pairs.map(p => (p._1, p._2)).toSet === Set((1L, 2L)))
    // one flipped sample flips at most its two adjacent-compare bits,
    // and pigeonhole over 4 bands makes recall exact at ≤3
    assert(pairs.head._3 <= 2 && pairs.head._3 >= 1)
  }

  test("mm_phash_dedup: gated pairs equal an all-pairs recompute restricted to band collisions") {
    val hashed = Multimodal.mmPhash(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        Array(r.getAs[Int]("b0"), r.getAs[Int]("b1"), r.getAs[Int]("b2"), r.getAs[Int]("b3")))
    val got = Multimodal.mmPhashDedup(spark, sf).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"), r.getAs[Int]("hamming"))).toSet
    // sequential reference: every ordered pair that shares a band AND
    // passes the popcount budget — the banded join may never add or
    // drop a pair relative to this definition
    val want = (for {
      (a, ha) <- hashed; (b, hb) <- hashed if a < b
      if ha.indices.exists(i => ha(i) == hb(i))
      ham = ha.indices.map(i => Integer.bitCount(ha(i) ^ hb(i))).sum
      if ham <= Multimodal.PhashMaxHamming
    } yield (a, b, ham)).toSet
    assert(got === want)
    got.foreach { case (a, b, h) => assert(a < b && h >= 0) }
  }

  test("mm_scene_cut: cuts exactly at deltas >= tau; scenes aggregate spans") {
    import spark.implicits._
    // doc 1: deltas 2, 78, 1 → cut at frame 0 (start) and frame 2:
    // scenes (1: frames 0-1), (2: frames 2-3); doc 2: single frame
    val frames = Seq(
      (1L, 0, 0, 10), (1L, 1, 5, 12), (1L, 2, 10, 90), (1L, 3, 15, 91),
      (2L, 0, 0, 40))
      .toDF("doc_id", "frame_idx", "frame_offset", "frame_feature")
    val got = Multimodal.sceneCut(frames).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("scene_id")) ->
        ((r.getAs[Int]("first_frame"), r.getAs[Long]("n_frames"),
          r.getAs[Int]("f_min"), r.getAs[Int]("f_max")))).toMap
    assert(got.keySet === Set((1L, 1L), (1L, 2L), (2L, 1L)))
    assert(got((1L, 1L)) === ((0, 2L, 10, 12)))
    assert(got((1L, 2L)) === ((2, 2L, 90, 91)))
    assert(got((2L, 1L)) === ((0, 1L, 40, 40)))
    // corpus invariants: scene frame counts partition each doc's frames
    val frameCounts = Multimodal.mmFrameSample(spark, sf)
      .groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sceneSums = Multimodal.mmSceneCut(spark, sf)
      .groupBy("doc_id").agg(sum("n_frames").as("s")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sceneSums === frameCounts)
  }
}

class BpeApplySpec extends SparkSpec {

  /** Reference algorithm: repeatedly merge the LOWEST-RANK pair
    * present anywhere in the word (the original BPE apply), not the
    * rank-order full-pass form the query compiles to — the spec gates
    * their equivalence. */
  private def refSegment(word: String): Seq[String] = {
    val rank = graft.queries.TextAnalysis.BpeMerges.zipWithIndex.toMap
    var s: Vector[String] = word.map(_.toString).toVector
    var done = false
    while (!done && s.length > 1) {
      val present = s.zip(s.tail).flatMap(p => rank.get(p).map(_ -> p))
      if (present.isEmpty) done = true
      else {
        val (_, (x, y)) = present.minBy(_._1)
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < s.length) {
          if (i < s.length - 1 && s(i) == x && s(i + 1) == y) {
            out += x + y; i += 2
          } else { out += s(i); i += 1 }
        }
        s = out.result()
      }
    }
    s
  }

  test("tx_bpe_apply: nested-replace segmentation equals min-rank-iterative BPE") {
    val texts = Tables.documents(spark, sf).collect()
      .flatMap(r => Option(r.getString(1)).map(r.getAs[Long]("doc_id") -> _)).toMap
    val got = TextAnalysis.txBpeApply(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_pieces"), r.getAs[String]("seg_md5"))).toMap
    assert(got.keySet === texts.keySet)
    val md = java.security.MessageDigest.getInstance("MD5")
    texts.foreach { case (id, t) =>
      val segs = t.split(" ", -1).filter(_.nonEmpty).map(refSegment)
      val joined = segs.map(_.mkString(" ")).mkString("/")
      md.reset()
      val want = md.digest(joined.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(got(id)._1 === segs.map(_.length.toLong).sum, s"doc $id pieces")
      assert(got(id)._2 === want, s"doc $id digest")
    }
  }

  test("tx_bpe_apply: the fused kernel equals the composable replace chain") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_pieces"), r.getAs[String]("seg_md5")))).toMap
    val kernel = rows(TextAnalysis.txBpeApply(spark, sf))
    val twin = rows(TextAnalysis.txBpeApplyComposable(spark, sf))
    assert(kernel === twin)
    assert(kernel.nonEmpty)
  }

  test("tx_bpe_apply: merges actually fire, incl. composed ones") {
    import spark.implicits._
    val one = Seq((1L, "join the merger party")).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length($"text"))
    one.createOrReplaceTempView("ignored")
    val seg = TextAnalysis.txBpeApply(spark, sf) // smoke real table path
    assert(seg.columns.toSeq === Seq("doc_id", "n_pieces", "seg_md5"))
    // direct check of the composed chain on a planted word: "join" ->
    // j o i n -> (i,n)-> j o in -> (j,o)-> jo in -> (jo,in)-> join
    assert(refSegment("join") === Seq("join"))
    assert(refSegment("merger") === Seq("mer", "g", "er"))
  }
}

class BpeTrainSpec extends SparkSpec {

  test("tx_bpe_train: learned merges equal a symbol-level reference trainer") {
    val words = Tables.documents(spark, sf).select("text").collect()
      .flatMap(r => Option(r.getString(0)))
      .flatMap(_.split(" ", -1)).filter(_.nonEmpty)
    // reference: symbol-level merge application, occurrence-weighted
    var segs: Map[Vector[String], Long] = words.groupBy(identity)
      .map { case (w, ws) => w.map(_.toString).toVector -> ws.length.toLong }
    val want = (0 until TextAnalysis.BpeTrainIters).map { rank =>
      val cnt = scala.collection.mutable.HashMap.empty[(String, String), Long]
      segs.foreach { case (s, c) =>
        s.zip(s.tail).foreach(p => cnt.update(p, cnt.getOrElse(p, 0L) + c))
      }
      val ((x, y), c) = cnt.toSeq.minBy { case ((a, b), n) => (-n, a + " " + b) }
      segs = segs.groupMapReduce { case (s, _) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < s.length) {
          if (i < s.length - 1 && s(i) == x && s(i + 1) == y) { out += x + y; i += 2 }
          else { out += s(i); i += 1 }
        }
        out.result()
      }(_._2)(_ + _)
      (rank, s"$x $y", x + y, c)
    }
    val got = TextAnalysis.txBpeTrain(spark, sf).collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[String]("pair"),
        r.getAs[String]("merged"), r.getAs[Long]("cnt"))).sortBy(_._1).toSeq
    assert(got === want)
    // the first learned merge IS tx_bpe_pairs' argmax (round 0 counts
    // character pairs, before any merged symbol exists)
    val topPair = TextAnalysis.txBpePairs(spark, sf).collect().head
    assert(got.head._3 === topPair.getAs[String]("pair"))
    assert(got.head._4 === topPair.getAs[Long]("cnt"))
  }

  test("tx_bpe_train: driver merge loop equals the distributed per-round argmax") {
    val loop = TextAnalysis.txBpeTrain(spark, sf).collect().map(_.toSeq).toSeq
    val dist = TextAnalysis.txBpeTrainDistributed(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(loop === dist)
  }
}

class BigramLmSpec extends SparkSpec {

  test("tx_bigram_lm: exact parts-per-billion on a constructed corpus") {
    import spark.implicits._
    // bigrams: (p,q)×10, (q,r)×10 from the ordered docs; (r,q), (q,p)
    // from the scrambled one. Left-context totals: p=10, q=11, r=1.
    // cond(p,q) = 10e9 DIV 10 = 1e9; cond(q,r) = 10e9 DIV 11;
    // cond(r,q) = 1e9; cond(q,p) = 1e9 DIV 11.
    val docs = ((1L to 10L).map(i => (i, "p q r")) :+ (11L, "r q p"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.bigramLmScores(TextAnalysis.docBigramCounts(docs))
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Long]("mean_cond_x1e9")))).toMap
    val condQR = 10L * 1000000000L / 11L
    val condQP = 1000000000L / 11L
    assert(got(1L) === ((2L, (1000000000L + condQR) / 2)))
    assert(got(11L) === ((2L, (1000000000L + condQP) / 2)))
    // the point of the bigram upgrade: same WORDS, rare ORDER scores
    // strictly lower than the common order (the unigram proxy cannot
    // distinguish these two docs at all)
    assert(got(11L)._2 < got(1L)._2)
    // corpus invariants: one row per ≥2-token doc, scores in (0, 1e9]
    val real = TextAnalysis.txBigramLm(spark, sf).collect()
    assert(real.length > 0)
    real.foreach { r =>
      val m = r.getAs[Long]("mean_cond_x1e9")
      assert(m > 0 && m <= 1000000000L, r.toString)
      assert(r.getAs[Long]("n_bigrams") >= 1L)
    }
  }
}

class CandidateVerifySpec extends SparkSpec {

  test("dd_minhash_est: match counts equal the explode+agg signature twin") {
    // independent path: signatures from the retained explode+min-agg
    // pipeline, matches recomputed in Scala per candidate pair
    val sigs = Dedup.minhashSignaturesComposable(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (0 until Dedup.NumPerms).map(i => r.getAs[Long](s"h$i"))).toMap
    val est = Dedup.ddMinhashEst(spark, sf).collect()
    assert(est.nonEmpty)
    est.foreach { r =>
      val a = r.getAs[Long]("doc_a"); val b = r.getAs[Long]("doc_b")
      val want = sigs(a).zip(sigs(b)).count { case (x, y) => x == y }
      assert(r.getAs[Int]("n_match") === want, s"pair ($a,$b)")
      assert(r.getAs[Long]("est_x1e6") === want.toLong * 62500L)
    }
  }

  test("dd_lev_verify: distances match a reference Wagner-Fischer DP") {
    def lev(a: String, b: String): Int = {
      val prev = Array.tabulate(b.length + 1)(identity)
      for (i <- 1 to a.length) {
        var diag = prev(0); prev(0) = i
        for (j <- 1 to b.length) {
          val cur = math.min(math.min(prev(j) + 1, prev(j - 1) + 1),
            diag + (if (a(i - 1) == b(j - 1)) 0 else 1))
          diag = prev(j); prev(j) = cur
        }
      }
      prev(b.length)
    }
    val texts = Tables.documents(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val rows = Dedup.ddLevVerify(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val a = r.getAs[Long]("doc_a"); val b = r.getAs[Long]("doc_b")
      val want = lev(texts(a), texts(b))
      assert(r.getAs[Int]("lev") === want, s"pair ($a,$b)")
      val maxLen = math.max(texts(a).length, texts(b).length)
      assert(r.getAs[Int]("max_len") === maxLen)
      assert(r.getAs[Int]("near") ===
        (if (want * Dedup.LevDen <= maxLen * Dedup.LevNum) 1 else 0))
    }
  }

  test("tx_train_quality: distributed GD equals an in-memory integer reference") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        Option(r.getAs[String]("text")).getOrElse(""))
    // features: token counts per hashed bucket, same portable hash
    def h60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(8).map("%02x".format(_)).mkString
        .take(15), 16)
    }
    val dims = TextAnalysis.TrainDims.toInt
    val feat = docs.map { case (id, t) =>
      val x = new Array[Long](dims)
      t.split(" ").filter(_.nonEmpty)
        .foreach(w => x(((h60("tq:" + w) % dims) + dims).toInt % dims) += 1)
      id -> x
    }
    val y = docs.map { case (id, t) =>
      id -> (if (t.split(" ").contains("spark")) 1L else 0L)
    }.toMap
    val n = docs.length.toLong
    val w = new Array[Long](dims)
    for (_ <- 1 to TextAnalysis.TrainIters) {
      val grad = new Array[Long](dims)
      feat.foreach { case (id, x) =>
        var pred = 0L
        var i = 0
        while (i < dims) { pred += x(i) * w(i); i += 1 }
        val r = pred - y(id) * TextAnalysis.TrainScale
        i = 0
        while (i < dims) { grad(i) += x(i) * r; i += 1 }
      }
      val den = n * TextAnalysis.TrainLrDen
      var i = 0
      while (i < dims) { // truncating division, matching both engines
        val g = grad(i)
        w(i) -= (if (g < 0) -((-g) / den) else g / den)
        i += 1
      }
    }
    val got = TextAnalysis.txTrainQuality(spark, sf).collect()
      .map(r => r.getAs[Long]("i") -> r.getAs[Long]("w")).sortBy(_._1)
    assert(got.map(_._1).toSeq === (0L until dims).toSeq)
    assert(got.map(_._2).toSeq === w.toSeq)
    // training moved at least one weight (the gate is non-vacuous)
    assert(w.exists(_ != 0L))
  }

  test("dd_lev_verify: distinct-pair kernel equals the per-pair direct form") {
    val a = Dedup.ddLevVerify(spark, sf).collect().map(_.toSeq).toSet
    val b = Dedup.ddLevVerifyDirect(spark, sf).collect().map(_.toSeq).toSet
    assert(a === b)
    assert(a.nonEmpty)
  }
}
