package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.functions._

/** Scale soak: run the dedup/ANN/heavy-text family at ~sf1 and record
  * per-query wall time plus PER-STAGE SHUFFLE VOLUME, so the scale
  * claims ("df-cap keeps buckets bounded", "band-join never goes
  * all-pairs") are backed by measured shuffle bytes on data where the
  * Zipf head actually hurts, not just by plan shapes at sf0.1.
  *
  * The soak corpus is a `copies`-way self-union of sf0.1 with remapped
  * ids — deliberately adversarial for dedup: every document gains
  * `copies-1` exact twins, so every shingle's document frequency and
  * every LSH bucket's occupancy inflates by exactly `copies`. A pair
  * generator that were quadratic in bucket size would blow up by
  * copies² here; the expected (and asserted-by-eye) behavior is
  * shuffle volume and runtime growing ~linearly in `copies`.
  *
  * Usage: `sbt "runMain graft.Soak"`; env knobs:
  *   SPARK_GRAFT_SOAK_SRC    source sf dir   (default /root/testdata/sf0.1)
  *   SPARK_GRAFT_SOAK_DIR    scratch dir     (default target/soak-sf1)
  *   SPARK_GRAFT_SOAK_COPIES union factor    (default 10 → ~sf1)
  *   SPARK_GRAFT_CPUS        local cores     (default 8)
  * Prints one JSON line per query:
  *   {"query":…,"sec":…,"shuffle_write_mb":…,"shuffle_read_mb":…,
  *    "spill_mb":…,"stages":…,"max_stage_shuffle_write_mb":…}
  */
object Soak {

  /** Queries whose scale behavior the soak certifies: every near-dup
    * variant, the ANN tiers, the shuffle-heaviest text queries, and
    * the window/state-heavy reference-surface (gl/event) queries. The
    * events corpus keeps ORIGINAL user ids while remapping event ids,
    * so per-entity histories get `copies`× DEEPER — the adversarial
    * axis for the SCD2/sessionize windows (state per key grows, key
    * count does not). */
  val SoakQueries: Seq[String] = Seq(
    "dd_exact", "dd_minhash_lsh", "dd_ngram_jaccard", "dd_simhash",
    "dd_chunk_dup", "dd_cluster", "dd_cluster_incremental", "dd_embed_cosine",
    "dd_semantic",
    "ann_topk_brute", "ann_lsh_bucket", "ann_lsh_incremental", "ann_ivf", "ann_pq",
    "tx_rarity", "tx_repetition", "tx_top_ngrams", "tx_pack", "tx_cms_topk",
    "gl_scd2_versions", "gl_squash_latest", "gl_delete_tombstone",
    "gl_vid_assign", "gl_poi_block_digest",
    "q_sessionize", "q_asof_join", "q_skew_agg", "q_hll_distinct",
    // sketch-only serving arm: registers collapse map-side, so its
    // shuffle must stay ~FLAT at ×10 where the exact rider is linear;
    // the incremental fold doubles the register build but merges
    // ≤2m rows per type — also ~flat by construction
    "q_hll_serve", "q_hll_incremental",
    "q_quantile_hist", "q_zorder_layout", "q_bloom_join", "q_bloom_join_off",
    // round-5 tail: deepened user histories stress the funnel/retention
    // windows; twin cliques stress containment's capped buckets; the
    // char-pair explode is the most data-proportional text stage; the
    // tokenizer + phash keys certify the map-only claim at volume
    "q_window_funnel", "q_retention", "dd_containment", "q_agg_incremental",
    "tx_bpe_pairs", "tx_bpe_apply", "mm_phash",
    // round-5 close-out keys: the salted join must keep its fact
    // shuffle linear while the 5 hot keys deepen 10×; tfidf's df table
    // gains no vocabulary from exact twins (counts only); scene-cut
    // certifies the single-exchange window+agg at frame volume
    "q_skew_join", "tx_tfidf_topterms", "mm_scene_cut",
    // round-5 continuation keys: the exact-twin corpus inflates every
    // LSH bucket 10×, so the candidate-pair set the verify keys join
    // texts/signatures onto grows quadratically IN PAIRS (their
    // declared output) — the claim under test is that nothing beyond
    // the pair set itself blows up; bigram-lm's pair vocabulary gains
    // nothing from twins (counts only, the tx_tfidf argument)
    "dd_minhash_est", "dd_lev_verify", "tx_bigram_lm",
    // round-5 additions: the FK-consistent remap gives pagerank 10×
    // nodes AND 10× edges — both the one-time edge build and the
    // per-iteration contribution shuffle must scale ~linearly;
    // shuffle-shard moves every doc row through its one exchange
    // (linear by construction — certify it); diversity-sample's twin
    // cliques land in the same simhash bucket, so bucket occupancy
    // inflates 10× and the quota keeps the kept-set at ~n/10
    "q_pagerank", "q_shuffle_shard", "dd_diversity_sample",
    // GD training: the feature build is the only corpus-sized stage;
    // per-round shuffles are O(|feat| rows) — must scale linearly
    "tx_train_quality",
    // knn-graph collapses exact-duplicate vectors before blocking, so
    // the ×10 twin flood must leave the graph itself IDENTICAL — only
    // the collapse aggregation may grow
    "ann_knn_graph",
    // round-7 retrieval stack: the exact-twin corpus inflates every
    // query term's posting list exactly ×10 (df ×10, vocabulary
    // unchanged), so bm25's filtered index scan + candidate set must
    // grow linearly while stage count stays flat; the hybrid fuses two
    // top-depth lists whose SIZE is corpus-independent — its fusion
    // shuffle must stay ~FLAT at ×10, only the retriever scans grow
    "tx_bm25", "ann_hybrid_rrf")

  def main(args: Array[String]): Unit = {
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SOAK_SRC", "/root/testdata/sf0.1")
    val workDir = sys.env.getOrElse("SPARK_GRAFT_SOAK_DIR", "target/soak-sf1")
    val copies = sys.env.getOrElse("SPARK_GRAFT_SOAK_COPIES", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ---- corpus build: copies-way self-union, ids remapped so every
    // copy is a distinct row (offset is far above any real id) ----
    val off = 100000000L
    // SPARK_GRAFT_SOAK_MEGACLIQUE=K appends K verbatim copies of ONE
    // document (fresh ids) — the "cookie banner" shape: a single
    // boilerplate text dominating the corpus. The exact-collapse paths
    // (dd_cluster, dd_lev_verify, ann_knn_graph, dd_diversity_sample's
    // bucket quota) must stay flat-ish; anything quadratic in ONE
    // clique's size blows up here even when the uniform ×10 soak
    // looks linear.
    val megaClique = sys.env.getOrElse("SPARK_GRAFT_SOAK_MEGACLIQUE", "0").toInt
    val docs = Tables.documents(spark, srcDir)
    val unioned = (0 until copies)
      .map(i => docs.withColumn("doc_id", col("doc_id") + lit(i * off)))
      .reduce(_ unionAll _)
    val withClique = if (megaClique == 0) unioned else {
      val one = docs.orderBy(col("doc_id")).limit(1)
        .select(col("text"), col("lang"), col("source"), col("n_chars"))
      unioned.unionByName(
        spark.range(megaClique)
          .select((col("id") + lit(copies.toLong * off)).as("doc_id"))
          .crossJoin(broadcast(one))
          .select(unioned.columns.map(col): _*))
    }
    withClique
      .repartition(32)
      .write.mode("overwrite").parquet(s"$workDir/documents.parquet")
    val embs = Tables.embeddings(spark, srcDir)
    val embsUnioned = (0 until copies)
      .map(i => embs.withColumn("vec_id", col("vec_id") + lit(i * off)))
      .reduce(_ unionAll _)
    // the mega-clique knob duplicates ONE embedding too — the vector
    // side of the cookie-banner shape (dd_semantic / ann_knn_graph /
    // dd_embed_cosine must collapse it, not pair over it)
    val embsWithClique = if (megaClique == 0) embsUnioned else {
      val one = embs.orderBy(col("vec_id")).limit(1)
        .select(col("embedding"), col("label"))
      embsUnioned.unionByName(
        spark.range(megaClique)
          .select((col("id") + lit(copies.toLong * off)).as("vec_id"))
          .crossJoin(broadcast(one))
          .select(embsUnioned.columns.map(col): _*))
    }
    embsWithClique
      .repartition(32)
      .write.mode("overwrite").parquet(s"$workDir/embeddings.parquet")
    // events: RAW read (ts stays a nanos long so Tables.events can
    // re-apply its conversion on the soak copy), event ids remapped,
    // user ids KEPT — per-user histories deepen by `copies`×
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val evs = spark.read.parquet(s"$srcDir/events.parquet")
    (0 until copies).map(i => evs.withColumn("event_id", col("event_id") + lit(i * off)))
      .reduce(_ unionAll _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$workDir/events.parquet")

    // lineitem + part for the fact⋈dim family: part keys remap WITH
    // the fact's foreign keys, so the dim grows `copies`× too (the
    // realistic axis for q_bloom_join — a bigger dim, same selectivity)
    val li = Tables.lineitem(spark, srcDir)
    (0 until copies).map(i => li
        .withColumn("l_orderkey", col("l_orderkey") + lit(i * off))
        .withColumn("l_partkey", col("l_partkey") + lit(i * off)))
      .reduce(_ unionAll _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$workDir/lineitem.parquet")
    // orders for q_pagerank: o_orderkey remaps WITH l_orderkey (FK
    // intact) and o_custkey remaps too (10× customer nodes), while
    // lineitem's l_suppkey is deliberately KEPT — supplier hubs keep
    // their identity and their degree deepens `copies`×, the
    // adversarial axis for the per-iteration contribution shuffle
    val ord = Tables.orders(spark, srcDir)
    (0 until copies).map(i => ord
        .withColumn("o_orderkey", col("o_orderkey") + lit(i * off))
        .withColumn("o_custkey", col("o_custkey") + lit(i * off)))
      .reduce(_ unionAll _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$workDir/orders.parquet")
    val pt = Tables.part(spark, srcDir)
    (0 until copies).map(i => pt.withColumn("p_partkey", col("p_partkey") + lit(i * off)))
      .reduce(_ unionAll _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$workDir/part.parquet")

    val nDocs = spark.read.parquet(s"$workDir/documents.parquet").count()
    val nVecs = spark.read.parquet(s"$workDir/embeddings.parquet").count()
    println(s"""{"soak_corpus":{"docs":$nDocs,"vecs":$nVecs,"copies":$copies,"src":"$srcDir"}}""")

    val listener = new TaskMetricsListener
    spark.sparkContext.addSparkListener(listener)

    val queries = SparkEntry.queries
    // comma-separated subset (same contract as Bench's SPARK_GRAFT_ONLY)
    val only = sys.env.get("SPARK_GRAFT_SOAK_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    SoakQueries.filter(q => only.forall(_.contains(q))).foreach { name =>
      // counterfactual row, not a gated key: q_bloom_join with the
      // runtime filter off — the soak report pairs the two so the
      // map-side reduction is a measured delta
      val fn = if (name == "q_bloom_join_off") graft.queries.Analytics.qBloomJoinOff _
        else queries(name)
      listener.reset()
      val t0 = System.nanoTime()
      val res =
        try { fn(spark, workDir).write.format("noop").mode("overwrite").save(); Right(()) }
        catch { case e: Exception => Left(e.getClass.getSimpleName + ": " + e.getMessage) }
      val sec = (System.nanoTime() - t0) / 1e9
      // census_clean=false marks a query whose listener events missed
      // the quiescence deadline — its shuffle/stage numbers undercount
      val clean = listener.quiesce()
      def mb(l: AtomicLong) = l.get() / 1e6
      res match {
        case Right(_) =>
          println(f"""{"query":"$name","sec":$sec%.2f,"shuffle_write_mb":${mb(listener.shuffleWrite)}%.1f,"shuffle_read_mb":${mb(listener.shuffleRead)}%.1f,"spill_mb":${mb(listener.spill)}%.1f,"stages":${listener.stages.get()},"max_stage_shuffle_write_mb":${mb(listener.maxStageShuffleWrite)}%.1f,"census_clean":$clean}""")
        case Left(e) =>
          println(s"""{"query":"$name","error":"${e.replaceAll("[\"\\\\\n]", " ").take(160)}"}""")
      }
    }
    spark.stop()
  }
}
