package graft

import graft.operators.Bucketing
import org.apache.spark.sql.execution.ExplainMode

class BucketingSpec extends SparkSpec {

  test("same-bucketed tables join without any shuffle") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val ord = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
      .withColumnRenamed("o_orderkey", "l_orderkey")

    Bucketing.writeBucketed(li, "b_lineitem", "l_orderkey", 8)
    Bucketing.writeBucketed(ord, "b_orders", "l_orderkey", 8)
    try {
      val joined = Bucketing.colocatedJoin(spark, "b_lineitem", "b_orders", "l_orderkey")
      val plan = joined.queryExecution.explainString(ExplainMode.fromString("simple"))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      // and it still computes the right thing
      val n = joined.count()
      val expected = li.join(ord, "l_orderkey").count()
      assert(n === expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }

  test("pagerank iteration over bucketed edges: zero edge-side exchange") {
    // substantiates qPagerank's scaladoc claim: when |V| outgrows the
    // broadcast threshold, storing the edge+degree frame BUCKETED on
    // src keeps the per-iteration join exchange-free on the big side.
    import org.apache.spark.sql.functions._
    val e = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
    val und = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w"))
    val deg = und.groupBy(col("src")).agg(sum(col("w")).as("deg"))
    Bucketing.writeBucketed(und.join(deg, "src"), "b_pr_edges", "src", 8)
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // rank can't broadcast
      val bucketed = spark.table("b_pr_edges")
      val it = graft.queries.Analytics.pagerank(bucketed, 1, 1000000)
      val plan = it.queryExecution.explainString(ExplainMode.fromString("simple"))
      // the only hashpartitioning exchanges may touch the RANK side
      // (node-keyed) and the contribution agg (dst) — never src: the
      // bucketed scan already reports hashpartitioning(src)
      assert(!plan.matches("(?s).*Exchange hashpartitioning\\(src\\#.*"),
        s"edge side re-shuffled despite bucketing:\n$plan")
      // and the bucketed iteration computes exactly the plain result
      val want = graft.queries.Analytics.pagerank(und.join(deg, "src"), 1, 1000000)
        .collect().map(_.toSeq).toSet
      assert(it.collect().map(_.toSeq).toSet === want)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS b_pr_edges")
    }
  }

  test("the sorted-bucket-scan conf q_bucket_join relies on is still registered") {
    // Pins the Spark-version assumption behind q_bucket_join's
    // zero-sort contract. If this fails after a Spark upgrade: the
    // key DEGRADES, not breaks — qBucketJoin warns and runs the same
    // (correct) join with a read-time re-Sort, and PlanSpec's gate
    // flags instead of failing. Fix by re-planning the key on a hash
    // join over the bucketed scans (like q3/q5's serve path), which
    // needs no sort order at all.
    assert(spark.conf.isModifiable(graft.queries.Analytics.SortedBucketScanConf),
      s"${graft.queries.Analytics.SortedBucketScanConf} was dropped by this " +
        "Spark version — see this test's comment for the degrade path")
    // ...and the unknown-key premise the detector rests on: RuntimeConf
    // accepts arbitrary keys silently, so conf.set alone can't detect
    assert(!spark.conf.isModifiable("spark.sql.graft.no.such.conf"))
  }

  test("the subset-co-partition conf q5 relies on is still registered, and its premise holds") {
    // Same treatment as the sorted-scan conf: q5's serve clone relaxes
    // requireAllClusterKeysForCoPartition because the fact join carries
    // (orderkey, nationkey) over orderkey-only bucketing. If this
    // fails after a Spark upgrade the key DEGRADES (one extra exchange
    // of the resolved map), not breaks — q5Multijoin warns.
    assert(spark.conf.isModifiable(graft.queries.Analytics.SubsetCoPartitionConf),
      s"${graft.queries.Analytics.SubsetCoPartitionConf} was dropped by " +
        "this Spark version — see this test's comment for the degrade path")
    // ...and the SEMANTIC premise that makes subset-key co-location
    // safe here: orderkey is the fact's primary key in the orders
    // table (one row per orderkey), so bucketing by it alone cannot
    // split a join group across buckets
    val ord = graft.Tables.orders(spark, sf)
    assert(ord.groupBy("o_orderkey").count().where("count > 1").isEmpty)
  }

  test("orphan scrub is enforced host-local: only file/scheme-less warehouses qualify") {
    import graft.queries.Analytics.scrubAllowed
    assert(scrubAllowed(new java.net.URI("file:/root/repo/spark-warehouse")))
    assert(scrubAllowed(new java.net.URI("/plain/path")))
    // every shared scheme refuses — a second host's live pid would
    // look dead to this host's liveness probe
    for (u <- Seq("hdfs://nn:8020/warehouse", "s3a://bucket/warehouse",
        "gs://bucket/warehouse", "abfs://c@a.dfs.core.windows.net/w",
        "viewfs://cluster/warehouse"))
      assert(!scrubAllowed(new java.net.URI(u)), u)
  }

  test("writeBucketed produces exactly ONE file per bucket") {
    // the safety premise of the sorted-bucket-scan conf q_bucket_join
    // turns on: multi-file buckets concatenate UNSORTED at read time,
    // so claiming the sortBy order would silently mis-merge the join.
    // The writer's repartition-on-key makes one task own each bucket —
    // pin that here against writer regressions (e.g. dropping the
    // repartition, or AQE splitting the write stage).
    import org.apache.spark.sql.functions._
    // 16 shuffle-visible input partitions writing into 4 buckets:
    // without the repartition this produces up to 16 files per bucket
    val df = spark.range(0, 10000, 1, 16).select(
      (col("id") % 97).as("k"), col("id").as("v"))
    Bucketing.writeBucketed(df, "b_single_file", "k", 4)
    try {
      val loc = new java.net.URI(spark.sql("DESCRIBE TABLE EXTENDED b_single_file")
        .filter(col("col_name") === "Location").head().getString(1))
      val files = new java.io.File(loc).listFiles()
        .filter(f => f.getName.startsWith("part-") && !f.getName.endsWith(".crc"))
      assert(files.length === 4,
        s"expected 1 file x 4 buckets, got:\n${files.map(_.getName).mkString("\n")}")
      // and every row is still present exactly once
      assert(spark.table("b_single_file").count() === 10000L)
    } finally spark.sql("DROP TABLE IF EXISTS b_single_file")
  }
}
