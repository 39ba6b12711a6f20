package graft.queries

import graft.Tables
import graft.functions.Vectors
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor family (SURVEY.md §2 #32-33) over the
  * `embeddings` table (64-dim float vectors).
  *
  * Cosine math runs on quantized int64 vectors ([[Vectors]]) so results
  * are bit-identical across engines. Four tiers:
  *
  *   - brute force — the correctness baseline (exact);
  *   - multi-table multiprobe sign-LSH — candidates only from the
  *     query's bucket and its hamming<=2 neighbors across 8 tables,
  *     per-query work ~ tables·probes·n/2^planes ≪ n;
  *   - IVF — Lloyd-trained coarse lists, nprobe probing: the
  *     billion-scale layout (partition the corpus once, scan few
  *     lists per query);
  *   - PQ — per-subspace codebooks, ADC shortlist over 4-byte codes,
  *     exact re-rank: the billion-vectors-in-RAM memory layout.
  */
object Ann {

  val TopK = 10
  /** Query set: the first 8 vectors. */
  val NumQueries = 8
  val NumPlanes = 8
  val Dims = 64

  private val quantizedMemo = graft.SessionMemo.named[DataFrame]("ann_quantized")

  private def quantized(s: SparkSession, d: String): DataFrame =
    quantizedMemo.getOrBuild(s, d) {
      graft.plans.GraftExtensions.ensureRegistered(s)
      // spill-safe persist: the quantized projection is the working set
      // every ANN query (and the Lloyd training loop, which runs actions
      // during plan construction) iterates over several times — without
      // it each pass re-scans and re-quantizes the parquet. Spark's
      // CacheManager dedupes by canonicalized plan, so all ANN queries
      // share one materialization. At 100 TB the same line persists the
      // bounded TRAINING SAMPLE and the per-list IVF layout instead of
      // the raw corpus; MEMORY_AND_DISK degrades to disk, never OOM.
      Tables.embeddings(s, d)
        .select(col("vec_id"), Vectors.quantize(col("embedding")).as("qv"))
        .withColumn("n2", Vectors.dot(col("qv"), col("qv")))
        .filter(col("n2") > 0)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

  // ---- #32 brute-force top-k ----------------------------------------

  /** Brute-force cosine top-k: tiny query set broadcast against the
    * full corpus; per-query ranking via a windowed row_number. The
    * corpus scan is map-only; the only shuffle is |queries|·|corpus|
    * pre-aggregated to top-k per partition by the window's rank. */
  def annTopkBrute(s: SparkSession, d: String): DataFrame = {
    val e = quantized(s, d)
    val q = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qid"), col("qv").as("qqv"), col("n2").as("qn2"))
    val scored = e.join(broadcast(q), col("vec_id") =!= col("qid"))
      .withColumn("cos", Vectors.cosine(
        Vectors.dot(col("qv"), col("qqv")), col("n2"), col("qn2")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("qid"), col("vec_id").as("nid"), col("rank"), col("cos"))
  }

  val annTopkBruteSql: String = {
    val qv = Vectors.quantizeSql("embedding")
    s"""WITH e AS (
       |  SELECT vec_id, $qv AS qv FROM embeddings),
       |n AS MATERIALIZED (
       |  SELECT vec_id, qv, ${Vectors.dotSql("qv", "qv")} AS n2 FROM e),
       |nn AS MATERIALIZED (SELECT * FROM n WHERE n2 > 0),
       |q AS MATERIALIZED (SELECT vec_id AS qid, qv AS qqv, n2 AS qn2 FROM nn WHERE vec_id < $NumQueries),
       |scored AS MATERIALIZED (
       |  SELECT qid, vec_id,
       |         ${Vectors.cosineSql(Vectors.dotSql("qv", "qqv"), "n2", "qn2")} AS cos
       |  FROM nn, q WHERE vec_id <> qid)
       |SELECT qid, vec_id AS nid,
       |       CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS INT) AS rank,
       |       cos
       |FROM scored
       |QUALIFY rank <= $TopK""".stripMargin
  }

  // ---- #33 LSH-bucketed top-k (rows-only) ---------------------------

  /** Multi-table multiprobe parameters: 8 independent 8-plane tables,
    * each query probing every bucket within hamming distance 2.
    * For neighbor cosine ~0.4 (this corpus), per-table hit probability
    * is ~0.38, so P(miss all 8 tables) ~ 0.62^8 ~ 0.02 → recall >0.9 measured,
    * while candidates stay ~tables·probes·n/2^planes ≪ n. */
  val NumTables = 8
  val ProbeDist = 2

  /** All 8 tables' integer bucket keys in one single-pass expression. */
  private def tableBuckets(v: Column) =
    Vectors.signBucketsInt(v, NumTables * NumPlanes, Dims)

  /** The standing LSH index over any quantized corpus frame: one row
    * per (vector, table) with its bucket key — the structure a
    * production deployment keeps ON DISK between ingests and that
    * [[annLshIncremental]] / [[graft.streaming.AnnStream]] probe. */
  private[graft] def lshIndex(e: DataFrame): DataFrame =
    e.select(col("vec_id"), col("qv"), col("n2"),
      posexplode(tableBuckets(col("qv"))).as(Seq("tbl", "bucket")))

  /** LSH-bucketed ANN: corpus bucketed once per table by the
    * deterministic sign-LSH; each query probes its own bucket plus all
    * hamming<=2 neighbors in every table. Scale: the bucket equi-join
    * replaces the cross product; recall vs brute is spec-checked. */
  def annLshBucket(s: SparkSession, d: String): DataFrame = {
    val e = quantized(s, d)
    lshAnswer(lshIndex(e), e)
  }

  /** The probe/re-rank path over an already-built index — shared by
    * the batch, incremental, and (structurally) streaming entries. */
  private[graft] def lshAnswer(corpus: DataFrame, e: DataFrame): DataFrame = {
    val q = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qid"), col("qv").as("qqv"), col("n2").as("qn2"),
        posexplode(tableBuckets(col("qv"))).as(Seq("tbl", "qbucket")))
      .withColumn("probe", explode(
        Vectors.hammingProbesInt(col("qbucket"), NumPlanes, ProbeDist)))

    // dedup on the id pair BEFORE touching vectors — a distinct over
    // 64-element arrays would hash/compare the payload for every
    // duplicate probe hit
    val candidates = corpus.join(broadcast(q),
        corpus("tbl") === q("tbl") && col("bucket") === col("probe") &&
          col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"))
      .distinct()

    val qvecs = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qid"), col("qv").as("qqv"), col("n2").as("qn2"))
    val scored = candidates
      .join(e, "vec_id")
      .join(broadcast(qvecs), "qid")
      .withColumn("cos", Vectors.cosine(
        Vectors.dot(col("qv"), col("qqv")), col("n2"), col("qn2")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("qid"), col("vec_id").as("nid"), col("rank"), col("cos"))
  }

  // ---- #33d incremental LSH index maintenance -----------------------

  private val lshStateMemo = graft.SessionMemo.named[DataFrame]("ann_lsh_incremental_state")

  /** #33d ann_lsh_incremental — fold a batch of NEW vectors into a
    * STANDING LSH bucket index: only the batch is quantized and
    * bucketed (O(batch) per ingest — prior vectors are never
    * re-hashed; in production the standing index is the on-disk
    * (vec_id, tbl, bucket) table and the ingest appends to it), and
    * the merged index must be INDISTINGUISHABLE from rebuilding on
    * prior ∪ batch — gated by answering the standard query set through
    * the merged index with the FULL-recompute oracle (the LSH planes
    * are static literals, so [[annLshBucketSql]] applies verbatim).
    * This closes the incremental-state family across the engine:
    * scd2/squash (entities), exact/cluster (dedup), and now the ANN
    * serving index — each with the same contract, per-ingest cost
    * O(batch + state), oracle = full recompute. Batch = `vec_id % 5
    * == 0` (the [[graft.queries.Dedup.ddClusterIncremental]] split
    * convention); the same state feeds [[graft.streaming.AnnStream]]'s
    * standing side. Disjointness contract as everywhere in the
    * incremental family: batch ids must not already exist in the
    * state (ingest is append-only; upserts route through the SCD2
    * surface). */
  def annLshIncremental(s: SparkSession, d: String): DataFrame = {
    val e = quantized(s, d)
    val state = lshStateMemo.getOrBuild(s, d) {
      lshIndex(e.filter(col("vec_id") % 5 =!= 0))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    lshAnswer(state.unionAll(lshIndex(e.filter(col("vec_id") % 5 === 0))), e)
  }

  // ---- #33b IVF top-k (rows-only) -----------------------------------

  /** IVF parameters: 16 coarse centroids, queries probe the best 4. */
  val NumCentroids = 16
  val NumProbes = 4
  val LloydIters = 2

  /** Lloyd training on the (already tiny relative to 100 TB) corpus:
    * seeds = first k vectors, two distributed assign+mean rounds, the
    * k×dims centroid table collected to the driver each round (k·dims
    * doubles — bounded, broadcastable). At real scale this trains on a
    * bounded SAMPLE — the pattern is identical. */
  private val centroidMemo = graft.SessionMemo.named[Array[Array[Long]]]("ann_ivf_centroids")

  private def trainCentroids(e: DataFrame, spark: SparkSession,
      k: Int = NumCentroids): Array[Array[Long]] = {
    import spark.implicits._
    var cents: Array[Array[Long]] = e.filter(col("vec_id") < k)
      .orderBy("vec_id").select("qv").as[Seq[Long]].collect().map(_.toArray)
    for (_ <- 0 until LloydIters) {
      val assigned = e.withColumn("cent", assignExpr(cents))
      val means = assigned
        .select(col("cent"), posexplode(col("qv")).as(Seq("d", "v")))
        .groupBy(col("cent"), col("d")).agg(avg(col("v")).as("m"))
        .groupBy(col("cent"))
        .agg(map_from_arrays(collect_list(col("d")), collect_list(col("m"))).as("dims"))
        .as[(Int, Map[Int, Double])].collect()
        .map { case (j, dims) => j -> (0 until Dims).map(d => dims(d).round).toArray }
        .toMap
      // empty clusters keep their previous centroid (the PQ codebook
      // convention) so centroid ids never shift positions mid-training
      cents = cents.indices.map(j => means.getOrElse(j, cents(j))).toArray
    }
    cents
  }

  /** Composable twin of [[bestCent]]: greatest() over (score, id)
    * structs — lexicographic max picks the best score, ties to the
    * higher id. Retained so the spec can pin the fused kernel
    * bit-for-bit against the built-in-operator formulation. */
  private[graft] def assignStructTwin(cents: Array[Array[Long]]): Column = {
    val scored = cents.zipWithIndex.map { case (c, j) =>
      val cn2 = c.map(x => x * x).sum
      struct(
        Vectors.cosine(Vectors.dot(col("qv"), typedLit(c.toSeq)), col("n2"), lit(cn2)).as("s"),
        lit(j).as("j"))
    }
    greatest(scored.toIndexedSeq: _*)
  }

  /** Best-centroid (s, j) via the fused [[graft.functions.BestCent]]
    * kernel — one tree node instead of k literal arrays whose
    * analysis/codegen cost ~1.3 s of constant per-query driver time at
    * k=32 (same bit-for-bit result as [[assignStructTwin]]). */
  private[graft] def bestCent(cents: Array[Array[Long]]): Column =
    call_function("graft_best_cent", col("qv"), typedLit(cents.flatten.toSeq))

  /** argmax-cosine centroid id. */
  private def assignExpr(cents: Array[Array[Long]]): Column =
    bestCent(cents).getField("j")

  /** IVF ANN: corpus partitioned once by nearest centroid; each query
    * scans only its `NumProbes` closest inverted lists. The candidate
    * join is a broadcast equi-join on the centroid id — per-query work
    * is nprobe/k of the corpus, the billion-scale layout (train on a
    * sample, partition by list, probe few). Rows-only; recall vs brute
    * is spec-gated. */
  def annIvf(s: SparkSession, d: String): DataFrame = {
    val e = quantized(s, d)
    // train once per session+corpus: the Lloyd rounds are real jobs at
    // build time, and a trained coarse quantizer is a session-scoped
    // artifact (the k×dims table), not per-query work
    val cents = Ann.centroidMemo.getOrBuild(s, d)(trainCentroids(e, s))
    trainedCentroids = Some(cents) // see [[oracles]] — the SQL twin embeds them
    val corpus = e.withColumn("cent", assignExpr(cents))
    val probes = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qid"), col("qv").as("qqv"), col("n2").as("qn2"))
      .withColumn("cent", explode(probeExpr(cents)))
    val scored = corpus.join(broadcast(probes),
        corpus("cent") === probes("cent") && col("vec_id") =!= col("qid"))
      .withColumn("cos", Vectors.cosine(
        Vectors.dot(col("qv"), col("qqv")), col("n2"), col("qn2")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("qid"), col("vec_id").as("nid"), col("rank"), col("cos"))
  }

  /** The query's `NumProbes` best centroid ids, via one sorted-array
    * expression over (score, id) structs. */
  private def probeExpr(cents: Array[Array[Long]]): Column = {
    val scored = cents.zipWithIndex.map { case (c, j) =>
      val cn2 = c.map(x => x * x).sum
      struct(
        (-Vectors.cosine(Vectors.dot(col("qqv"), typedLit(c.toSeq)), col("qn2"), lit(cn2))).as("s"),
        lit(j).as("j"))
    }
    slice(transform(array_sort(array(scored.toIndexedSeq: _*)), x => x.getField("j")),
      1, NumProbes)
  }

  // ---- #33c PQ top-k (rows-only) ------------------------------------

  /** Product-quantization parameters: 64 dims split into 8 subspaces of
    * 8 dims; 16 centroids per subspace → 8 × 4-bit codes ≈ 4 bytes per
    * vector (vs 512 for the raw floats) — the memory layout that fits a
    * billion vectors in RAM. ADC shortlists 128 candidates per query;
    * exact re-rank restores ranking fidelity on the shortlist. */
  val PqSubspaces = 8
  val PqSubDims: Int = Dims / PqSubspaces
  val PqK = 16
  val PqLloydIters = 2
  val PqShortlist = 128

  /** Codebooks are a session-scoped trained artifact (M×k×subdims =
    * 1024 longs), like the IVF centroids. */
  private val pqMemo =
    graft.SessionMemo.named[Array[Array[Array[Long]]]]("ann_pq_codebooks")

  /** The codebook as the flattened (m-major) literal the
    * [[graft.functions.PqCodes]]/[[graft.functions.PqTable]] kernels
    * take. One tree node instead of the ~400-node per-subspace
    * dot/struct/greatest composition, whose analysis + codegen
    * dominated ann_pq's wall-clock at every data size (the same
    * pathology [[graft.functions.SignBuckets]] fixed for LSH). */
  private def booksLit(books: Array[Array[Array[Long]]]): Column =
    typedLit(books.flatMap(_.flatMap(_.toSeq)).toSeq)

  /** All M argmin-L2 codes of a vector in one fused kernel. */
  private def pqCodes(v: Column, books: Array[Array[Array[Long]]]): Column =
    call_function("graft_pq_codes", v, booksLit(books), lit(PqSubspaces))

  /** Per-subspace Lloyd on the subvectors — all M subspaces train in
    * the SAME distributed pass: one fused-kernel assign of all M codes
    * per vector, one posexplode of the vector's dims (subspace and
    * in-subspace dim derive from the position), per-(m, code, dim)
    * mean. Collected state is M·k·subdims longs per round — bounded,
    * broadcastable. Empty clusters keep their previous centroid. */
  private def trainCodebooks(e: DataFrame, spark: SparkSession): Array[Array[Array[Long]]] = {
    import spark.implicits._
    val seeds = e.filter(col("vec_id") < PqK).orderBy("vec_id")
      .select("qv").as[Seq[Long]].collect()
    require(seeds.nonEmpty, "PQ training needs at least one non-zero vector")
    // pad by cycling when fewer than PqK seeds survive the n2>0 filter:
    // every books(m) row must exist up to index PqK-1 because the
    // empty-cluster fallback below indexes the full code range
    // (duplicate centroids are harmless — argmin ties break low)
    var books: Array[Array[Array[Long]]] = Array.tabulate(PqSubspaces)(m =>
      Array.tabulate(PqK)(j =>
        seeds(j % seeds.length).slice(m * PqSubDims, (m + 1) * PqSubDims).toArray))
    for (_ <- 0 until PqLloydIters) {
      val means = e.select(pqCodes(col("qv"), books).as("codes"),
          posexplode(col("qv")).as(Seq("d", "v")))
        .select(expr(s"CAST(d DIV $PqSubDims AS INT)").as("m"),
          expr(s"CAST(d % $PqSubDims AS INT)").as("sd"), col("codes"), col("v"))
        .select(col("m"), element_at(col("codes"), col("m") + lit(1)).as("j"),
          col("sd"), col("v"))
        .groupBy(col("m"), col("j"), col("sd")).agg(avg(col("v")).as("mean"))
        .as[(Int, Int, Int, Double)].collect()
        .groupBy(t => (t._1, t._2))
        .view.mapValues(ts => ts.sortBy(_._3).map(_._4.round).toArray).toMap
      books = Array.tabulate(PqSubspaces)(m => Array.tabulate(PqK)(j =>
        means.getOrElse((m, j), books(m)(j))))
    }
    books
  }

  /** #33c ann_pq — product-quantized ANN with asymmetric-distance
    * shortlisting and exact re-rank:
    *
    *   1. encode the corpus to M 4-bit codes (map-only, the one pass
    *      that would run at ingest in production);
    *   2. per query, precompute the M×k table of subspace dot products
    *      (128 longs — the classic ADC lookup table), broadcast it;
    *   3. approximate dot(q, v) = Σₘ table[m][code[m]] — an O(M)
    *      array-lookup per (query, candidate), no vector math on the
    *      corpus side at all;
    *   4. shortlist `PqShortlist` per query by approximate cosine,
    *      fetch the true vectors for the shortlist ONLY, exact re-rank
    *      to top-k.
    *
    * Scale: step 3 touches 4-byte codes instead of 512-byte vectors —
    * the full-corpus scan cost drops ~100×, and the exact math is
    * confined to |queries|·shortlist rows. Rows-only; recall vs brute
    * is spec-gated. */
  def annPq(s: SparkSession, d: String): DataFrame = {
    val e = quantized(s, d)
    val books = pqMemo.getOrBuild(s, d)(trainCodebooks(e, s))
    trainedBooks = Some(books) // see [[oracles]] — the SQL twin embeds them
    val codes = e.select(col("vec_id"), col("n2"),
      pqCodes(col("qv"), books).as("codes"))
    // per-query ADC table, flat: qtab[m·K + j] = dot(q_sub[m], book[m][j])
    val q = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qid"),
        call_function("graft_pq_table", col("qv"), booksLit(books), lit(PqSubspaces))
          .as("qtab"))
    // statically unrolled Σₘ qtab[m·K + code[m]] — PqSubspaces is a
    // compile-time constant, and a higher-order aggregate() here would
    // be CodegenFallback, running an interpreted fold on the hottest
    // path of the query (every corpus row × query); the unrolled sum
    // stays inside whole-stage codegen
    val approx = codes.join(broadcast(q), col("vec_id") =!= col("qid"))
      .withColumn("adc", (0 until PqSubspaces).map(m =>
        element_at(col("qtab"),
          lit(m * PqK) + element_at(col("codes"), lit(m + 1)) + lit(1)))
        .reduce(_ + _))
      // approximate cosine: ADC dot over the candidate's TRUE norm
      // (query norm is constant per partition — ranking-irrelevant)
      .withColumn("score", col("adc").cast("double") / sqrt(col("n2").cast("double")))
    val ws = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("vec_id"))
    val shortlist = approx.withColumn("srank", row_number().over(ws))
      .filter(col("srank") <= PqShortlist)
      .select(col("qid"), col("vec_id"))
    // exact re-rank on the shortlist only
    val qvecs = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qid"), col("qv").as("qqv"), col("n2").as("qn2"))
    val scored = shortlist.join(e, "vec_id").join(broadcast(qvecs), "qid")
      .withColumn("cos", Vectors.cosine(
        Vectors.dot(col("qv"), col("qqv")), col("n2"), col("qn2")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("qid"), col("vec_id").as("nid"), col("rank"), col("cos"))
  }

  // ---- #33g IVF+PQ composed index (rows-only recall, oracle-gated) ---

  /** #33g ann_ivf_pq — the IVF·PQ COMPOSITION: coarse quantizer
    * partitions the corpus into inverted lists, PQ codes stand in for
    * the vectors inside each list, queries probe their `NumProbes`
    * closest lists and rank candidates by ADC lookup sums, then the
    * exact re-rank runs on the shortlist only. This is the layout
    * every billion-scale vector index actually ships (FAISS IVFPQ,
    * ScaNN's tree-AH): IVF bounds the fraction of the corpus a query
    * touches (nprobe/k), PQ bounds the bytes per candidate (M 4-bit
    * codes ≈ 4 B vs 512 B raw) — the two bounds multiply, so the
    * per-query scan cost drops ~100× × ~100× vs brute force.
    *
    * Spark-first: both trained artifacts are session-scoped literals
    * (k×dims centroids, M×K×subdims codebooks — the same memos the
    * standalone keys train), the corpus pass is ONE map-only
    * projection (fused best-cent + pq-codes kernels, whole-stage
    * codegen), candidates come from a broadcast equi-join on the
    * list id, and the ADC sum is the statically-unrolled in-codegen
    * lookup chain [[annPq]] uses. A corpus vector lives in exactly
    * one list and probes are distinct per query, so (qid, vec_id)
    * needs no dedup. At 100 TB: store the coded corpus bucketed by
    * `cent` (the q_bucket_join layout) and each probe reads only its
    * list's buckets — the scan never touches the raw vectors until
    * the |queries|·shortlist re-rank fetch. */
  def annIvfPq(s: SparkSession, d: String): DataFrame = {
    val e = quantized(s, d)
    val cents = centroidMemo.getOrBuild(s, d)(trainCentroids(e, s))
    trainedCentroids = Some(cents)
    val books = pqMemo.getOrBuild(s, d)(trainCodebooks(e, s))
    trainedBooks = Some(books)
    // one map-only ingest pass: list id + codes + norm per vector
    val corpus = e.select(col("vec_id"), col("n2"),
      assignExpr(cents).as("cent"),
      pqCodes(col("qv"), books).as("codes"))
    // per query: nprobe list ids + the M×K ADC lookup table
    val probes = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qid"), col("qv").as("qqv"), col("n2").as("qn2"))
      .withColumn("cent", explode(probeExpr(cents)))
      .withColumn("qtab",
        call_function("graft_pq_table", col("qqv"), booksLit(books), lit(PqSubspaces)))
      .select(col("qid"), col("cent"), col("qtab"))
    val approx = corpus.join(broadcast(probes),
        corpus("cent") === probes("cent") && col("vec_id") =!= col("qid"))
      .withColumn("adc", (0 until PqSubspaces).map(m =>
        element_at(col("qtab"),
          lit(m * PqK) + element_at(col("codes"), lit(m + 1)) + lit(1)))
        .reduce(_ + _))
      .withColumn("score", col("adc").cast("double") / sqrt(col("n2").cast("double")))
    val ws = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("vec_id"))
    val shortlist = approx.withColumn("srank", row_number().over(ws))
      .filter(col("srank") <= PqShortlist)
      .select(col("qid"), col("vec_id"))
    // exact re-rank on the shortlist only — the one place raw vectors load
    val qvecs = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qid"), col("qv").as("qqv"), col("n2").as("qn2"))
    val scored = shortlist.join(e, "vec_id").join(broadcast(qvecs), "qid")
      .withColumn("cos", Vectors.cosine(
        Vectors.dot(col("qv"), col("qqv")), col("n2"), col("qn2")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("qid"), col("vec_id").as("nid"), col("rank"), col("cos"))
  }

  // ---- #31b SemDeDup semantic dedup ---------------------------------

  /** SemDeDup parameters: k clusters must grow with the corpus (the
    * published recipe runs ~50k clusters at web scale) so per-cluster
    * pair work stays bounded; the prune threshold is calibrated to
    * this corpus's cosine range (pairwise max < 0.6 — the spec
    * recomputes the decisions independently). */
  val SemK = 32
  val SemTau = 0.40

  private val semMemo =
    graft.SessionMemo.named[Array[Array[Long]]]("dd_semantic_centroids")
  @volatile private var semCentroids: Option[Array[Array[Long]]] = None
  /** Trained-artifact accessor for the sequential-recompute spec. */
  private[graft] def semCentroidsForSpec: Option[Array[Array[Long]]] = semCentroids

  /** #31b dd_semantic — SemDeDup-style SEMANTIC dedup (cluster-then-
    * prune over embeddings, the published training-data recipe for
    * removing paraphrase-level duplicates that no shingle/minhash pass
    * can see): k-means cluster the corpus with the same Lloyd trainer
    * as IVF (k = [[SemK]]), then WITHIN each cluster prune every
    * vector that has a cosine >= [[SemTau]] neighbor of higher keep
    * priority, where priority = (cosine-to-own-centroid ASC, vec_id
    * ASC) — the "keep the examples farthest from their centroid" rule
    * made deterministic (a strict total order, so both engines agree).
    * One decision row per vector: (vec_id, cent, keep, witness_id),
    * witness = the highest-priority neighbor that pruned it.
    *
    * Scale: pair generation is BLOCKED BY CLUSTER — one equi-join on
    * the centroid id, never all-pairs; with k ∝ n per-cluster size is
    * bounded, so pair work stays linear in the corpus. Assignment is a
    * map-only projection over the persisted quantized corpus (CSE
    * collapses the shared greatest() under whole-stage codegen);
    * training cost is the bounded Lloyd loop shared with IVF. */
  /** Exact-duplicate pre-collapse (the defense the ×10 soak named):
    * identical vectors share cent/ccos and have pairwise cos ≈ 1 ≥ τ,
    * so the quadratic within-cluster pair term only ever needs to run
    * over DISTINCT vectors. The per-member decisions re-derive
    * EXACTLY, because within a duplicate group G (rep g₁ = min id,
    * common priority ccos c):
    *   - a member gₖ (k ≥ 2) is always pruned (g₁ precedes it and
    *     qualifies), and its witness is min((c, g₁), external best):
    *     any external candidate with uid between g₁ and gₖ loses the
    *     (uccos, uid) min to g₁, so the external best is exactly the
    *     REP's own witness — independent of k;
    *   - for the rep, an equal-ccos external group H contributes iff
    *     rep_H < g₁ (members of H above rep_H can't beat rep_H), so
    *     rep-level strict priority captures the tie boundary exactly.
    * [[ddSemanticDirect]] (the all-pairs member-level form) is kept
    * spec-pinned identical; the DuckDB oracle is unchanged and
    * member-level, so the collapse is hash-gated at every sf. */
  def ddSemantic(s: SparkSession, d: String): DataFrame = {
    val e = quantized(s, d)
    val cents = semMemo.getOrBuild(s, d)(trainCentroids(e, s, SemK))
    semCentroids = Some(cents) // see [[oracles]] — the SQL twin embeds them
    val g = bestCent(cents)
    val assigned = e.select(col("vec_id"), col("qv"), col("n2"),
      g.getField("j").as("cent"), g.getField("s").as("ccos"))
    // collapse: one representative (min id) per distinct vector
    val groups = assigned
      .groupBy(col("qv"), col("n2"), col("cent"), col("ccos"))
      .agg(min(col("vec_id")).as("rep_id"))
    val reps = groups.select(col("rep_id").as("vec_id"), col("qv"),
      col("n2"), col("cent"), col("ccos"))
    val u = reps.select(col("vec_id").as("uid"), col("qv").as("uqv"),
      col("n2").as("un2"), col("cent").as("ucent"), col("ccos").as("uccos"))
    // rep u prunes rep v iff same cluster, cos(u, v) >= tau, and u
    // strictly precedes v in (ccos, id) priority order
    val prunedRep = reps.join(u,
        col("ucent") === col("cent") &&
          (col("uccos") < col("ccos") ||
            (col("uccos") === col("ccos") && col("uid") < col("vec_id"))))
      .filter(Vectors.cosine(
        Vectors.dot(col("qv"), col("uqv")), col("n2"), col("un2")) >= SemTau)
      .groupBy(col("vec_id"))
      .agg(min_by(col("uid"), struct(col("uccos"), col("uid"))).as("witness_id"))
    val repDecision = reps.join(prunedRep, Seq("vec_id"), "left")
      .select(col("vec_id").as("rep_id"), col("cent").as("rcent"),
        col("witness_id"))
    val repRows = repDecision.select(col("rep_id").as("vec_id"),
      col("rcent").as("cent"),
      when(col("witness_id").isNull, lit(1)).otherwise(lit(0)).as("keep"),
      col("witness_id"))
    // member expansion: every non-rep duplicate is pruned; its witness
    // is the rep's own witness when one exists (it strictly precedes
    // the rep in (ccos, id) priority by construction, so it wins the
    // min against (c, g₁)), else the rep itself
    val memberRows = assigned.select(col("vec_id"), col("qv"))
      .join(groups.select(col("qv"), col("rep_id")), Seq("qv"))
      .filter(col("vec_id") =!= col("rep_id"))
      .join(repDecision, Seq("rep_id"))
      .select(col("vec_id"), col("rcent").as("cent"), lit(0).as("keep"),
        coalesce(col("witness_id"), col("rep_id")).as("witness_id"))
    repRows.unionByName(memberRows)
  }

  /** The all-pairs member-level form [[ddSemantic]] replaced — kept
    * as the equality cross-check (SemanticSpec): the collapsed form
    * must emit identical decisions row-for-row. */
  private[graft] def ddSemanticDirect(s: SparkSession, d: String): DataFrame = {
    val e = quantized(s, d)
    val cents = semMemo.getOrBuild(s, d)(trainCentroids(e, s, SemK))
    val g = bestCent(cents)
    val assigned = e.select(col("vec_id"), col("qv"), col("n2"),
      g.getField("j").as("cent"), g.getField("s").as("ccos"))
    val u = assigned.select(col("vec_id").as("uid"), col("qv").as("uqv"),
      col("n2").as("un2"), col("cent").as("ucent"), col("ccos").as("uccos"))
    val pruned = assigned.join(u,
        col("ucent") === col("cent") &&
          (col("uccos") < col("ccos") ||
            (col("uccos") === col("ccos") && col("uid") < col("vec_id"))))
      .filter(Vectors.cosine(
        Vectors.dot(col("qv"), col("uqv")), col("n2"), col("un2")) >= SemTau)
      .groupBy(col("vec_id"))
      .agg(min_by(col("uid"), struct(col("uccos"), col("uid"))).as("witness_id"))
    assigned.join(pruned, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cent"),
        when(col("witness_id").isNull, lit(1)).otherwise(lit(0)).as("keep"),
        col("witness_id"))
  }

  /** DuckDB twin of the WHOLE SemDeDup pipeline from the trained
    * centroids: literal k×dims matrix → grouped-sum dots → assignment
    * (ties to the higher id, matching `greatest(struct(s, j))`) →
    * within-cluster candidate pairs under the same strict priority
    * order → VECTORIZED pair dots via the element unnest (the
    * grouped-sum-join formulation, not a per-pair lambda) → prune +
    * witness via one window. Integer dots + one-rounding double
    * cosines both sides ⇒ rows+schema+hash must match bit-for-bit. */
  private def ddSemanticSql(cents: Array[Array[Long]]): String = {
    val cn2s = cents.zipWithIndex
      .map { case (c, j) => s"($j, ${c.map(x => x * x).sum})" }.mkString(", ")
    s"""WITH $oraclePreambleSql,
       |${matrixCteSql("cmat", cents.flatten.toIndexedSeq, Dims)},
       |cn AS MATERIALIZED (SELECT * FROM (VALUES $cn2s) t(j, cn2)),
       |cdots AS MATERIALIZED (
       |  SELECT vec_id, r AS j, CAST(SUM(v * w) AS BIGINT) AS dot
       |  FROM vels JOIN cmat USING (i) GROUP BY 1, 2),
       |cscore AS MATERIALIZED (
       |  SELECT c.vec_id, c.j,
       |         ${Vectors.cosineSql("c.dot", "nn.n2", "cn.cn2")} AS s
       |  FROM cdots c JOIN nn ON nn.vec_id = c.vec_id JOIN cn ON cn.j = c.j),
       |assign AS MATERIALIZED (
       |  SELECT vec_id, j AS cent, s AS ccos FROM cscore
       |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, j DESC) = 1),
       |av AS MATERIALIZED (SELECT nn.vec_id, nn.n2, a.cent, a.ccos
       |       FROM nn JOIN assign a ON a.vec_id = nn.vec_id),
       |cand AS MATERIALIZED (
       |  SELECT u.vec_id AS uid, u.n2 AS un2, u.ccos AS uccos,
       |         v.vec_id AS vid, v.n2 AS vn2
       |  FROM av u JOIN av v ON u.cent = v.cent
       |   AND (u.ccos < v.ccos OR (u.ccos = v.ccos AND u.vec_id < v.vec_id))),
       |pdot AS MATERIALIZED (
       |  SELECT c.uid, c.vid, c.uccos,
       |         ${Vectors.cosineSql("CAST(SUM(a.v * b.v) AS BIGINT)", "c.un2", "c.vn2")} AS cos
       |  FROM cand c
       |  JOIN vels a ON a.vec_id = c.uid
       |  JOIN vels b ON b.vec_id = c.vid AND b.i = a.i
       |  GROUP BY 1, 2, 3, c.un2, c.vn2),
       |pruned AS MATERIALIZED (
       |  SELECT vid AS vec_id, uid AS witness_id FROM pdot WHERE cos >= $SemTau
       |  QUALIFY row_number() OVER (PARTITION BY vid ORDER BY uccos, uid) = 1)
       |SELECT av.vec_id, av.cent,
       |       CASE WHEN p.vec_id IS NULL THEN 1 ELSE 0 END AS keep,
       |       p.witness_id
       |FROM av LEFT JOIN pruned p ON p.vec_id = av.vec_id""".stripMargin
  }

  // ---- #33e k-NN graph ----------------------------------------------

  /** LSH tables the graph build blocks on (recall/cost dial: 2 of the
    * 8 standing tables — candidates ≈ 2·n/2⁸ per vector; raise for
    * recall, the plan shape is unchanged). */
  val KnnTables = 2
  /** Neighbors kept per distinct vector. */
  val KnnK = 5

  private val knnRepsMemo = graft.SessionMemo.named[DataFrame]("ann_knn_reps")

  /** Distinct-vector collapse of the quantized corpus — the standing
    * artifact the k-NN graph builds over: one row per distinct
    * (qv, n2) with its canonical rep_id (min vec_id) and multiplicity.
    * Memoized + persisted beside [[quantized]]: the graph build reads
    * it THREE times (bucket index + both ends of the vector
    * re-attach), and production maintains exactly this collapsed
    * corpus as its dedup state. */
  private def knnReps(s: SparkSession, d: String): DataFrame =
    knnRepsMemo.getOrBuild(s, d) {
      quantized(s, d).groupBy(col("qv"), col("n2"))
        .agg(min(col("vec_id")).as("rep_id"), count(lit(1)).as("m"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

  /** #33e ann_knn_graph — k-NN GRAPH construction: top-k neighbors
    * for EVERY vector (not a query set) — the building block under
    * SemDeDup-style pruning, graph-based curation, and label
    * propagation. Exact duplicates are collapsed FIRST by grouping on
    * the quantized vector itself (arrays are engine-portable group
    * keys), so the graph is built over DISTINCT vectors with a
    * multiplicity column — a twin flood inflates only the collapse
    * aggregation, never the candidate pair set (the dd_cluster /
    * dd_lev_verify move applied to the vector side; production
    * expands members through their rep after pruning).
    *
    * Scale: the bucket equi-join replaces the n² cross product with
    * per-bucket blocks over distinct vectors, and ONLY ids ride the
    * candidate shuffles — the self-join and the (rep, nid) dedup move
    * 16-byte pairs, and the quantized vectors re-attach AFTERWARDS by
    * two equi-joins against the collapsed corpus (broadcast under the
    * threshold, shuffle-hash above — either way the per-candidate
    * vector payload is paid once, on the deduped set, not on the raw
    * bucket-block multiset). The exact-integer re-rank projects the
    * vectors away before the ranking window, so the final exchange is
    * ids+cos again. Output is exactly |distinct|·k rows; the window
    * partitions on rep_id — high-cardinality by construction. */
  def annKnnGraph(s: SparkSession, d: String): DataFrame = {
    val reps = knnReps(s, d)
    val idx = reps.select(col("rep_id"),
      posexplode(slice(tableBuckets(col("qv")), 1, KnnTables))
        .as(Seq("tbl", "bucket")))
    val cand = idx
      .join(idx.select(col("rep_id").as("nid"), col("tbl"), col("bucket")),
        Seq("tbl", "bucket"))
      .filter(col("rep_id") =!= col("nid"))
      .select(col("rep_id"), col("nid"))
      .dropDuplicates("rep_id", "nid")
    val scored = cand
      .join(reps.select(col("rep_id"), col("m"),
        col("qv").as("qva"), col("n2").as("n2a")), "rep_id")
      .join(reps.select(col("rep_id").as("nid"),
        col("qv").as("qvb"), col("n2").as("n2b")), "nid")
      .withColumn("cos", Vectors.cosine(
        Vectors.dot(col("qva"), col("qvb")), col("n2a"), col("n2b")))
      .select(col("rep_id"), col("m"), col("nid"), col("cos"))
    val w = Window.partitionBy(col("rep_id")).orderBy(col("cos").desc, col("nid"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= KnnK)
      .select(col("rep_id"), col("m"), col("nid"), col("rank"), col("cos"))
  }

  val annKnnGraphSql: String =
    s"""WITH $oraclePreambleSql,
       |${matrixCteSql("pmat", Vectors.planeMatrix(KnnTables * NumPlanes, Dims), Dims)},
       |g AS MATERIALIZED (
       |  SELECT qv, n2, min(vec_id) AS rep_id, CAST(count(*) AS BIGINT) AS m
       |  FROM nn GROUP BY qv, n2),
       |pdots AS MATERIALIZED (
       |  SELECT v.vec_id, p.r AS p, CAST(SUM(v.v * p.w) AS BIGINT) AS dot
       |  FROM vels v JOIN pmat p USING (i)
       |  JOIN g ON g.rep_id = v.vec_id
       |  GROUP BY 1, 2),
       |gb AS MATERIALIZED (
       |  SELECT vec_id AS rep_id, CAST(p // $NumPlanes AS INT) AS tbl,
       |         CAST(SUM(CASE WHEN dot >= 0 THEN 1 << (p % $NumPlanes) ELSE 0 END) AS BIGINT) AS bucket
       |  FROM pdots GROUP BY 1, 2),
       |cand AS MATERIALIZED (
       |  SELECT DISTINCT a.rep_id, b.rep_id AS nid
       |  FROM gb a JOIN gb b ON a.tbl = b.tbl AND a.bucket = b.bucket
       |  WHERE a.rep_id <> b.rep_id),
       |scored AS MATERIALIZED (
       |  SELECT c.rep_id, c.nid,
       |         ${Vectors.cosineSql(Vectors.dotSql("x.qv", "y.qv"), "x.n2", "y.n2")} AS cos
       |  FROM cand c
       |  JOIN nn x ON x.vec_id = c.rep_id
       |  JOIN nn y ON y.vec_id = c.nid)
       |SELECT s.rep_id, g.m, s.nid,
       |       CAST(row_number() OVER (PARTITION BY s.rep_id
       |            ORDER BY s.cos DESC, s.nid) AS INT) AS rank,
       |       s.cos
       |FROM scored s JOIN g ON g.rep_id = s.rep_id
       |QUALIFY rank <= $KnnK""".stripMargin

  // ---- #33f hybrid RRF retrieval --------------------------------------

  /** Rank depth each retriever contributes to the fusion. */
  val FuseDepth = 20
  /** The standard RRF constant (Cormack/Clarke/Buettcher's k=60),
    * and the fixed-point scale that keeps 1/(k+rank) an exact
    * integer: score = 10⁶ DIV (60 + rank). */
  val RrfKConst = 60L
  val RrfScale = 1000000L
  val HybridTopK = 10

  /** #33f ann_hybrid_rrf — hybrid retrieval: BM25 lexical ranks fused
    * with embedding-cosine ranks by Reciprocal Rank Fusion, the
    * standard two-tower serving stack (lexical recall + semantic
    * recall, rank-level fusion so neither scorer's scale dominates).
    * Query q contributes its literal term set (tx_bm25's workload) on
    * the lexical side and vector vec_id=q on the vector side
    * (vec_id≡doc_id in this corpus); RRF = Σ 10⁶ DIV (60 + rank) over
    * the retrievers that returned the doc within FuseDepth — exact
    * integers, no FP. A doc found by only one retriever still scores
    * (the union fold keeps it), which is RRF's point.
    *
    * Scale: both inputs are already top-FuseDepth per query — the
    * fusion unions two ≤|queries|·depth row frames (metadata-sized at
    * any corpus size) through ONE aggregate shuffle; the final
    * per-query window sorts ≤2·depth candidates. The lexical side
    * rides the memoized BM25 standing artifacts, the vector side the
    * memoized quantized corpus. */
  def annHybridRrf(s: SparkSession, d: String): DataFrame = {
    val lex = TextAnalysis.bm25Score(
        TextAnalysis.bm25Postings(s, d, TextAnalysis.Bm25Queries), FuseDepth)
      .select(col("query_id"), col("doc_id"), col("rk").as("lex_rk"))
    val e = quantized(s, d)
    val qids = TextAnalysis.Bm25Queries.map(_._1).distinct
    val q = e.filter(col("vec_id").isin(qids: _*))
      .select(col("vec_id").as("qid"), col("qv").as("qqv"), col("n2").as("qn2"))
    val scored = e.join(broadcast(q), col("vec_id") =!= col("qid"))
      .withColumn("cos", Vectors.cosine(
        Vectors.dot(col("qv"), col("qqv")), col("n2"), col("qn2")))
    // rank filter → WindowGroupLimit partial+final: upstream tasks
    // pre-prune to top-N per query before the window exchange (the
    // low-cardinality window-skew guard, same as bm25Score)
    val fin = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    val vec = scored
      .withColumn("vec_rk", row_number().over(fin)).filter(col("vec_rk") <= FuseDepth)
      .select(col("qid").as("query_id"), col("vec_id").as("doc_id"), col("vec_rk"))
    rrfFuse(lex, vec, HybridTopK)
  }

  /** The fusion over any two (query_id, doc_id, *_rk) rank lists —
    * split out so specs can pin exact RRF scores, one-sided docs, and
    * the tie-break on constructed lists. Absent ranks surface as 0
    * (never null — null ints round-trip differently through the two
    * engines' parquet→pandas paths). */
  private[graft] def rrfFuse(lex: DataFrame, vec: DataFrame, k: Int): DataFrame = {
    // union + one aggregate, not an outer join: a (query, doc) pair
    // appears at most once per retriever, so summing per-retriever
    // contributions over the union IS the outer-join fusion with one
    // shuffle instead of two (and no null rank columns to scrub)
    def contrib(rk: String) =
      expr(s"CAST($RrfScale DIV ($RrfKConst + $rk) AS BIGINT)")
    val both = lex
      .select(col("query_id"), col("doc_id"), col("lex_rk"),
        lit(0).as("vec_rk"), contrib("lex_rk").as("c"))
      .unionByName(vec.select(col("query_id"), col("doc_id"),
        lit(0).as("lex_rk"), col("vec_rk"), contrib("vec_rk").as("c")))
    val fused = both.groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("c")).as("rrf"),
        max(col("lex_rk")).as("lex_rk"), max(col("vec_rk")).as("vec_rk"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("rrf").desc, col("doc_id"))
    fused.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("doc_id"), col("rrf"),
        col("lex_rk"), col("vec_rk"))
  }

  val annHybridRrfSql: String = {
    val qids = TextAnalysis.Bm25Queries.map(_._1).distinct.mkString(", ")
    val qv = Vectors.quantizeSql("embedding")
    s"""WITH e AS (
       |  SELECT vec_id, $qv AS qv FROM embeddings),
       |n AS MATERIALIZED (
       |  SELECT vec_id, qv, ${Vectors.dotSql("qv", "qv")} AS n2 FROM e),
       |nn AS MATERIALIZED (SELECT * FROM n WHERE n2 > 0),
       |${TextAnalysis.bm25ScoredCtesSql},
       |lex AS MATERIALIZED (
       |  SELECT query_id, doc_id, CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY score DESC, doc_id) AS INT) AS lex_rk
       |  FROM bm25scored QUALIFY lex_rk <= $FuseDepth),
       |vq AS MATERIALIZED (SELECT vec_id AS qid, qv AS qqv, n2 AS qn2
       |  FROM nn WHERE vec_id IN ($qids)),
       |vscored AS MATERIALIZED (
       |  SELECT CAST(qid AS BIGINT) AS query_id, vec_id AS doc_id,
       |         ${Vectors.cosineSql(Vectors.dotSql("qv", "qqv"), "n2", "qn2")} AS cos
       |  FROM nn, vq WHERE vec_id <> qid),
       |vr AS MATERIALIZED (
       |  SELECT query_id, doc_id, CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY cos DESC, doc_id) AS INT) AS vec_rk
       |  FROM vscored QUALIFY vec_rk <= $FuseDepth),
       |fused AS (
       |  SELECT query_id, doc_id,
       |         COALESCE(l.lex_rk, 0) AS lex_rk, COALESCE(v.vec_rk, 0) AS vec_rk
       |  FROM lex l FULL JOIN vr v USING (query_id, doc_id)),
       |rrfd AS (
       |  SELECT query_id, doc_id, lex_rk, vec_rk,
       |    CAST((CASE WHEN lex_rk > 0 THEN $RrfScale // ($RrfKConst + lex_rk) ELSE 0 END)
       |       + (CASE WHEN vec_rk > 0 THEN $RrfScale // ($RrfKConst + vec_rk) ELSE 0 END)
       |     AS BIGINT) AS rrf
       |  FROM fused)
       |SELECT query_id,
       |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY rrf DESC, doc_id) AS INT) AS rk,
       |  doc_id, rrf, lex_rk, vec_rk
       |FROM rrfd QUALIFY rk <= $HybridTopK""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_hybrid_rrf" -> (annHybridRrf _),
    "ann_knn_graph" -> (annKnnGraph _),
    "ann_topk_brute" -> (annTopkBrute _),
    "ann_lsh_bucket" -> (annLshBucket _),
    "ann_lsh_incremental" -> (annLshIncremental _),
    "ann_ivf" -> (annIvf _),
    "ann_pq" -> (annPq _),
    "ann_ivf_pq" -> (annIvfPq _),
    "dd_semantic" -> (ddSemantic _)
  )

  /** The most recently trained session artifacts, recorded so the
    * IVF/PQ oracle SQL can embed them as literals. [[graft.Verify]]
    * runs every query BEFORE dumping `SparkEntry.oracleSql`, and both
    * run against one sf dir per process, so at dump time these hold
    * exactly the quantizer the dumped results were produced with. When
    * the query never ran in this JVM the key is omitted and the driver
    * records the (pre-round-5) rows-only result instead of a false
    * mismatch. */
  @volatile private var trainedCentroids: Option[Array[Array[Long]]] = None
  @volatile private var trainedBooks: Option[Array[Array[Array[Long]]]] = None
  /** DuckDB twin of the WHOLE LSH pipeline — buckets, multiprobe,
    * candidate dedup, exact re-rank. The ±1 plane matrix is embedded
    * as 64 literal sign arrays (the same [[Vectors.planeSign]] values
    * Spark passes to the native SignBuckets expression), each table's
    * bucket is the 8-bit sign pattern of its plane group, and the
    * hamming≤2 multiprobe is `xor(bucket, mask)` over the 37 literal
    * low-popcount masks. Dots stay exact integers end-to-end, so the
    * candidate SET — not just the ranking — must match the native
    * expression bit-for-bit. This moves ann_lsh_bucket from rows-only
    * to rows+schema+hash (recall vs brute stays spec-gated). */
  /** Shared oracle preamble: quantized vectors + norms + the
    * per-(vec_id, dim) element unnest every literal-matrix dot joins
    * against. One `vels` row per element — the grouped-sum join
    * formulation keeps literal-matrix dot products vectorized instead
    * of running a `list_transform` lambda per (row, matrix-row), which
    * made the round-4 LSH oracle dominate the whole DuckDB suite. */
  private def oraclePreambleSql: String = {
    val qv = Vectors.quantizeSql("embedding")
    s"""e AS MATERIALIZED (
       |  SELECT vec_id, $qv AS qv FROM embeddings),
       |n AS MATERIALIZED (
       |  SELECT vec_id, qv, ${Vectors.dotSql("qv", "qv")} AS n2 FROM e),
       |nn AS MATERIALIZED (SELECT * FROM n WHERE n2 > 0),
       |vels AS MATERIALIZED (
       |  SELECT vec_id, t.i AS i, qv[t.i] AS v
       |  FROM nn CROSS JOIN generate_series(1, $Dims) t(i))""".stripMargin
  }

  /** A literal row-major matrix as an (r, i, w) table: row r in
    * [0, rows), 1-based column i, weight w — the join side of the
    * grouped-sum dot product. */
  private def matrixCteSql(name: String, flat: Seq[Long], cols: Int): String =
    s"""$name AS (
       |  SELECT CAST((k - 1) // $cols AS INT) AS r,
       |         CAST((k - 1) % $cols + 1 AS INT) AS i, f[k] AS w
       |  FROM (SELECT ${flat.mkString("[", ", ", "]")} AS f)
       |  CROSS JOIN generate_series(1, ${flat.length}) t(k))""".stripMargin

  val annLshBucketSql: String = {
    val masks = (0 until (1 << NumPlanes))
      .filter(m => Integer.bitCount(m) <= ProbeDist).mkString("[", ", ", "]")
    s"""WITH $oraclePreambleSql,
       |${matrixCteSql("pmat", Vectors.planeMatrix(NumTables * NumPlanes, Dims), Dims)},
       |pdots AS MATERIALIZED (
       |  SELECT vec_id, r AS p, CAST(SUM(v * w) AS BIGINT) AS dot
       |  FROM vels JOIN pmat USING (i) GROUP BY 1, 2),
       |corpus_b AS MATERIALIZED (
       |  SELECT vec_id, CAST(p // $NumPlanes AS INT) AS tbl,
       |         CAST(SUM(CASE WHEN dot >= 0 THEN 1 << (p % $NumPlanes) ELSE 0 END) AS BIGINT) AS bucket
       |  FROM pdots GROUP BY 1, 2),
       |probes AS MATERIALIZED (
       |  SELECT c.vec_id AS qid, c.tbl, xor(c.bucket, m.mask) AS probe
       |  FROM corpus_b c CROSS JOIN (SELECT unnest($masks) AS mask) m
       |  WHERE c.vec_id < $NumQueries),
       |cand AS MATERIALIZED (
       |  SELECT DISTINCT p.qid, c.vec_id
       |  FROM probes p JOIN corpus_b c ON c.tbl = p.tbl AND c.bucket = p.probe
       |  WHERE c.vec_id <> p.qid),
       |q AS MATERIALIZED (SELECT vec_id AS qid, qv AS qqv, n2 AS qn2 FROM nn WHERE vec_id < $NumQueries),
       |scored AS MATERIALIZED (
       |  SELECT cand.qid, cand.vec_id,
       |         ${Vectors.cosineSql(Vectors.dotSql("nn.qv", "q.qqv"), "nn.n2", "q.qn2")} AS cos
       |  FROM cand
       |  JOIN nn ON nn.vec_id = cand.vec_id
       |  JOIN q ON q.qid = cand.qid)
       |SELECT qid, vec_id AS nid,
       |       CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS INT) AS rank,
       |       cos
       |FROM scored
       |QUALIFY rank <= $TopK""".stripMargin
  }

  /** DuckDB twin of the WHOLE IVF pipeline from the trained centroids:
    * literal k×dims matrix → grouped-sum dots → exact-double cosine →
    * assignment (ties to the HIGHER centroid id, matching the
    * `greatest(struct(s, j))` lexicographic max) → top-`NumProbes`
    * probes (s DESC, id ASC, matching `array_sort((-s, j))`) →
    * candidate join → exact re-rank. Every comparison runs on either
    * exact integers or the identical one-rounding double expression,
    * so rows+schema+hash must match bit-for-bit. */
  private def annIvfSql(cents: Array[Array[Long]]): String = {
    val cn2s = cents.zipWithIndex
      .map { case (c, j) => s"($j, ${c.map(x => x * x).sum})" }.mkString(", ")
    s"""WITH $oraclePreambleSql,
       |${matrixCteSql("cmat", cents.flatten.toIndexedSeq, Dims)},
       |cn AS MATERIALIZED (SELECT * FROM (VALUES $cn2s) t(j, cn2)),
       |cdots AS MATERIALIZED (
       |  SELECT vec_id, r AS j, CAST(SUM(v * w) AS BIGINT) AS dot
       |  FROM vels JOIN cmat USING (i) GROUP BY 1, 2),
       |cscore AS MATERIALIZED (
       |  SELECT c.vec_id, c.j,
       |         ${Vectors.cosineSql("c.dot", "nn.n2", "cn.cn2")} AS s
       |  FROM cdots c JOIN nn ON nn.vec_id = c.vec_id JOIN cn ON cn.j = c.j),
       |assign AS MATERIALIZED (
       |  SELECT vec_id, j AS cent FROM cscore
       |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, j DESC) = 1),
       |probes AS MATERIALIZED (
       |  SELECT vec_id AS qid, j AS cent FROM cscore WHERE vec_id < $NumQueries
       |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, j ASC) <= $NumProbes),
       |q AS MATERIALIZED (SELECT vec_id AS qid, qv AS qqv, n2 AS qn2 FROM nn WHERE vec_id < $NumQueries),
       |scored AS MATERIALIZED (
       |  SELECT p.qid, a.vec_id,
       |         ${Vectors.cosineSql(Vectors.dotSql("nn.qv", "q.qqv"), "nn.n2", "q.qn2")} AS cos
       |  FROM assign a
       |  JOIN probes p ON p.cent = a.cent AND a.vec_id <> p.qid
       |  JOIN nn ON nn.vec_id = a.vec_id
       |  JOIN q ON q.qid = p.qid)
       |SELECT qid, vec_id AS nid,
       |       CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS INT) AS rank,
       |       cos
       |FROM scored
       |QUALIFY rank <= $TopK""".stripMargin
  }

  /** DuckDB twin of the WHOLE PQ pipeline from the trained codebooks:
    * literal M×K×subdims matrix → per-subspace argmin-L2 codes (exact
    * integers, ties to the LOWER code id — [[graft.functions.PqCodes]]
    * uses strict `>` on 2·dot−‖c‖², which ties identically to min-L2)
    * → per-query ADC tables → Σₘ lookup sum → approximate-score
    * shortlist (`adc/sqrt(n2)`, the identical double expression) →
    * exact re-rank of the shortlist. Candidate SET and ranking must
    * match the fused native kernels bit-for-bit. */
  private def annPqSql(books: Array[Array[Array[Long]]]): String = {
    val flat = books.flatMap(_.flatMap(_.toSeq)).toIndexedSeq
    s"""WITH $oraclePreambleSql,
       |${matrixCteSql("bflat", flat, PqSubDims)},
       |bmat AS MATERIALIZED (
       |  SELECT CAST(r // $PqK AS INT) AS m, CAST(r % $PqK AS INT) AS j, i AS sd, w
       |  FROM bflat),
       |svels AS MATERIALIZED (
       |  SELECT vec_id, CAST((i - 1) // $PqSubDims AS INT) AS m,
       |         CAST((i - 1) % $PqSubDims + 1 AS INT) AS sd, v
       |  FROM vels),
       |dists AS MATERIALIZED (
       |  SELECT s.vec_id, b.m, b.j, SUM((s.v - b.w) * (s.v - b.w)) AS l2
       |  FROM svels s JOIN bmat b ON b.m = s.m AND b.sd = s.sd
       |  GROUP BY 1, 2, 3),
       |codes AS MATERIALIZED (
       |  SELECT vec_id, m, j AS code FROM dists
       |  QUALIFY row_number() OVER (PARTITION BY vec_id, m ORDER BY l2 ASC, j ASC) = 1),
       |qtab AS MATERIALIZED (
       |  SELECT s.vec_id AS qid, b.m, b.j, CAST(SUM(s.v * b.w) AS BIGINT) AS dot
       |  FROM svels s JOIN bmat b ON b.m = s.m AND b.sd = s.sd
       |  WHERE s.vec_id < $NumQueries
       |  GROUP BY 1, 2, 3),
       |adc AS MATERIALIZED (
       |  SELECT t.qid, c.vec_id, CAST(SUM(t.dot) AS BIGINT) AS adc
       |  FROM codes c JOIN qtab t ON t.m = c.m AND t.j = c.code
       |  WHERE c.vec_id <> t.qid
       |  GROUP BY 1, 2),
       |shortlist AS MATERIALIZED (
       |  SELECT a.qid, a.vec_id
       |  FROM adc a JOIN nn ON nn.vec_id = a.vec_id
       |  QUALIFY row_number() OVER (PARTITION BY a.qid
       |    ORDER BY CAST(a.adc AS DOUBLE) / sqrt(CAST(nn.n2 AS DOUBLE)) DESC, a.vec_id) <= $PqShortlist),
       |q AS MATERIALIZED (SELECT vec_id AS qid, qv AS qqv, n2 AS qn2 FROM nn WHERE vec_id < $NumQueries),
       |scored AS MATERIALIZED (
       |  SELECT sl.qid, sl.vec_id,
       |         ${Vectors.cosineSql(Vectors.dotSql("nn.qv", "q.qqv"), "nn.n2", "q.qn2")} AS cos
       |  FROM shortlist sl
       |  JOIN nn ON nn.vec_id = sl.vec_id
       |  JOIN q ON q.qid = sl.qid)
       |SELECT qid, vec_id AS nid,
       |       CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS INT) AS rank,
       |       cos
       |FROM scored
       |QUALIFY rank <= $TopK""".stripMargin
  }

  /** DuckDB twin of the WHOLE composed IVF·PQ pipeline from BOTH
    * trained artifacts: the IVF half reuses [[annIvfSql]]'s CTE chain
    * verbatim (assignment ties to the HIGHER centroid id, probe order
    * s DESC / id ASC), the PQ half reuses [[annPqSql]]'s (argmin-L2
    * codes tie LOW, per-query ADC tables), and the ADC aggregation is
    * restricted to candidates whose list a query probes — exactly the
    * broadcast equi-join the Spark side runs. Every comparison is
    * exact-integer or the identical one-rounding double expression,
    * so rows+schema+hash must match bit-for-bit. */
  private def annIvfPqSql(cents: Array[Array[Long]],
      books: Array[Array[Array[Long]]]): String = {
    val cn2s = cents.zipWithIndex
      .map { case (c, j) => s"($j, ${c.map(x => x * x).sum})" }.mkString(", ")
    val flat = books.flatMap(_.flatMap(_.toSeq)).toIndexedSeq
    s"""WITH $oraclePreambleSql,
       |${matrixCteSql("cmat", cents.flatten.toIndexedSeq, Dims)},
       |cn AS MATERIALIZED (SELECT * FROM (VALUES $cn2s) t(j, cn2)),
       |cdots AS MATERIALIZED (
       |  SELECT vec_id, r AS j, CAST(SUM(v * w) AS BIGINT) AS dot
       |  FROM vels JOIN cmat USING (i) GROUP BY 1, 2),
       |cscore AS MATERIALIZED (
       |  SELECT c.vec_id, c.j,
       |         ${Vectors.cosineSql("c.dot", "nn.n2", "cn.cn2")} AS s
       |  FROM cdots c JOIN nn ON nn.vec_id = c.vec_id JOIN cn ON cn.j = c.j),
       |assign AS MATERIALIZED (
       |  SELECT vec_id, j AS cent FROM cscore
       |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, j DESC) = 1),
       |probes AS MATERIALIZED (
       |  SELECT vec_id AS qid, j AS cent FROM cscore WHERE vec_id < $NumQueries
       |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, j ASC) <= $NumProbes),
       |${matrixCteSql("bflat", flat, PqSubDims)},
       |bmat AS MATERIALIZED (
       |  SELECT CAST(r // $PqK AS INT) AS m, CAST(r % $PqK AS INT) AS j, i AS sd, w
       |  FROM bflat),
       |svels AS MATERIALIZED (
       |  SELECT vec_id, CAST((i - 1) // $PqSubDims AS INT) AS m,
       |         CAST((i - 1) % $PqSubDims + 1 AS INT) AS sd, v
       |  FROM vels),
       |dists AS MATERIALIZED (
       |  SELECT s.vec_id, b.m, b.j, SUM((s.v - b.w) * (s.v - b.w)) AS l2
       |  FROM svels s JOIN bmat b ON b.m = s.m AND b.sd = s.sd
       |  GROUP BY 1, 2, 3),
       |codes AS MATERIALIZED (
       |  SELECT vec_id, m, j AS code FROM dists
       |  QUALIFY row_number() OVER (PARTITION BY vec_id, m ORDER BY l2 ASC, j ASC) = 1),
       |qtab AS MATERIALIZED (
       |  SELECT s.vec_id AS qid, b.m, b.j, CAST(SUM(s.v * b.w) AS BIGINT) AS dot
       |  FROM svels s JOIN bmat b ON b.m = s.m AND b.sd = s.sd
       |  WHERE s.vec_id < $NumQueries
       |  GROUP BY 1, 2, 3),
       |adc AS MATERIALIZED (
       |  SELECT p.qid, a.vec_id, CAST(SUM(t.dot) AS BIGINT) AS adc
       |  FROM assign a
       |  JOIN probes p ON p.cent = a.cent AND a.vec_id <> p.qid
       |  JOIN codes c ON c.vec_id = a.vec_id
       |  JOIN qtab t ON t.qid = p.qid AND t.m = c.m AND t.j = c.code
       |  GROUP BY 1, 2),
       |shortlist AS MATERIALIZED (
       |  SELECT a.qid, a.vec_id
       |  FROM adc a JOIN nn ON nn.vec_id = a.vec_id
       |  QUALIFY row_number() OVER (PARTITION BY a.qid
       |    ORDER BY CAST(a.adc AS DOUBLE) / sqrt(CAST(nn.n2 AS DOUBLE)) DESC, a.vec_id) <= $PqShortlist),
       |q AS MATERIALIZED (SELECT vec_id AS qid, qv AS qqv, n2 AS qn2 FROM nn WHERE vec_id < $NumQueries),
       |scored AS MATERIALIZED (
       |  SELECT sl.qid, sl.vec_id,
       |         ${Vectors.cosineSql(Vectors.dotSql("nn.qv", "q.qqv"), "nn.n2", "q.qn2")} AS cos
       |  FROM shortlist sl
       |  JOIN nn ON nn.vec_id = sl.vec_id
       |  JOIN q ON q.qid = sl.qid)
       |SELECT qid, vec_id AS nid,
       |       CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS INT) AS rank,
       |       cos
       |FROM scored
       |QUALIFY rank <= $TopK""".stripMargin
  }

  /** ann_ivf/ann_pq oracles are SESSION-ARTIFACT twins: present only
    * once the corresponding query has trained its quantizer in this
    * JVM (always true in a [[graft.Verify]] run, which executes every
    * query before dumping the SQL). gl_poi_stablehash stays the one
    * genuinely rows-only key. */
  def oracles: Map[String, String] = Map(
    "ann_knn_graph" -> annKnnGraphSql,
    "ann_topk_brute" -> annTopkBruteSql,
    "ann_hybrid_rrf" -> annHybridRrfSql,
    "ann_lsh_bucket" -> annLshBucketSql,
    // the merged index must equal the rebuilt one — same full-pipeline
    // recompute gates the incremental entry (planes are static literals)
    "ann_lsh_incremental" -> annLshBucketSql
  ) ++ trainedCentroids.map(c => "ann_ivf" -> annIvfSql(c)) ++
    trainedBooks.map(b => "ann_pq" -> annPqSql(b)) ++
    (for (c <- trainedCentroids; b <- trainedBooks)
      yield "ann_ivf_pq" -> annIvfPqSql(c, b)) ++
    semCentroids.map(c => "dd_semantic" -> ddSemanticSql(c))
}
