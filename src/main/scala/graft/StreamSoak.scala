package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming-family soak: drives PackStream, CurationStream and
  * EmbedDedupStream with micro-batches at ×1 vs ×`copies` input rate
  * and records PER-BATCH latency plus the state store's row count and
  * memory from `StreamingQueryProgress` — the measured evidence behind
  * each handler's "bounded state by construction" claim:
  *
  *   - PackStream: state = ONE cursor per shard — rows must stay at
  *     `shards` forever, at any input rate;
  *   - CurationStream (curatedDocs): dedup keys age out at the
  *     watermark horizon — state rows must plateau at ~one horizon's
  *     distinct hashes, not grow with stream length;
  *   - EmbedDedupStream: stream-static anti-join — NO state operator
  *     at all, the progress must report none;
  *   - QuantileStream: state = one 1024-long bin array per event
  *     type — rows must stay at |types| forever, at any input rate.
  *
  * Usage: `sbt "runMain graft.StreamSoak"`; env knobs:
  *   SPARK_GRAFT_SOAK_SRC     sf dir        (default /root/testdata/sf0.1)
  *   SPARK_GRAFT_SOAK_COPIES  rate factor   (default 10)
  *   SPARK_GRAFT_SOAK_BATCHES micro-batches (default 8)
  *   SPARK_GRAFT_CPUS         local cores   (default 8)
  *   SPARK_GRAFT_SOAK_STREAMS comma-separated subset (default: all)
  *   SPARK_GRAFT_SOAK_STATESTORE  `rocksdb` switches the state store
  *     to RocksDBStateStoreProvider — the provider a production
  *     cluster runs (state off-heap + incremental checkpoints, state
  *     size no longer bounded by executor memory). The bounded-state
  *     claims must hold under BOTH providers, and RocksDB exercises
  *     the row serialization paths the default in-memory store skips.
  * Prints one JSON line per (stream, batch).
  */
object StreamSoak {

  private def stateLine(q: StreamingQuery): (Long, Double, String) = {
    val p = q.lastProgress
    if (p == null) (0L, 0.0, "{}")
    else {
      val dur = {
        val it = p.durationMs.entrySet().iterator()
        val b = Seq.newBuilder[String]
        while (it.hasNext) { val e = it.next(); b += s""""${e.getKey}":${e.getValue}""" }
        b.result().sorted.mkString("{", ",", "}")
      }
      (p.stateOperators.map(_.numRowsTotal).sum,
        p.stateOperators.map(_.memoryUsedBytes).sum / 1e6, dur)
    }
  }

  private val only: Option[Set[String]] =
    sys.env.get("SPARK_GRAFT_SOAK_STREAMS").map(_.split(",").map(_.trim).toSet)

  private def run(name: String, copies: Int, batches: Int)
                 (mk: () => (Int => Unit, StreamingQuery)): Unit = {
    if (!only.forall(_.contains(name))) return
    val (feed, q) = mk()
    try {
      (0 until batches).foreach { b =>
        val t0 = System.nanoTime()
        feed(b)
        val tFeed = (System.nanoTime() - t0) / 1e9
        q.processAllAvailable()
        val sec = (System.nanoTime() - t0) / 1e9
        if (sys.env.contains("SPARK_GRAFT_SOAK_DEBUG")) {
          System.err.println(f"[soak-debug] $name feed=$tFeed%.2f total=$sec%.2f")
          q.recentProgress.takeRight(4).foreach(p =>
            System.err.println(s"[soak-debug]   mb=${p.batchId} rows=${p.numInputRows} dur=${p.durationMs}"))
        }
        val (rows, mb, dur) = stateLine(q)
        val bid = Option(q.lastProgress).map(_.batchId).getOrElse(-1L)
        println(f"""{"stream":"$name","copies":$copies,"batch":$b,"micro_batch_id":$bid,"sec":$sec%.2f,"state_rows":$rows,"state_mb":$mb%.3f,"last_duration_ms":$dur}""")
      }
    } finally q.stop()
  }

  def main(args: Array[String]): Unit = {
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SOAK_SRC", "/root/testdata/sf0.1")
    val copies = sys.env.getOrElse("SPARK_GRAFT_SOAK_COPIES", "10").toInt
    val batches = sys.env.getOrElse("SPARK_GRAFT_SOAK_BATCHES", "8").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val stateStore = sys.env.getOrElse("SPARK_GRAFT_SOAK_STATESTORE", "hdfs")
    val builder = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
    if (stateStore == "rocksdb") builder.config(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val spark = builder.getOrCreate()
    println(s"""{"stream_soak_state_store":"$stateStore"}""")
    spark.sparkContext.setLogLevel("WARN")
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val ckRoot = s"target/stream-soak-ck-${System.nanoTime()}"

    // source slices, cycled with per-batch remapped ids so every batch
    // at rate `copies` carries copies× the base batch's rows
    val docs = Tables.documents(spark, srcDir)
      .select($"doc_id", $"text", $"lang").as[(Long, String, String)]
      .collect()
    val embs = Tables.embeddings(spark, srcDir)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])]
      .collect()
    val baseDocBatch = 500
    val baseVecBatch = 200
    val off = 100000000L

    def docSlice(b: Int, n: Int): Seq[(Long, String, String)] =
      (0 until n).map { i =>
        val (id, t, l) = docs((b * n + i) % docs.length)
        (id + (b.toLong * n + i) / docs.length * off, t, l)
      }

    // ---- PackStream ----
    run("pack_stream", copies, batches) { () =>
      val input = MemoryStream[(Long, String)]
      val q = graft.streaming.PackStream.assignments(
          input.toDF().toDF("doc_id", "text"),
          graft.queries.TextAnalysis.PackShards, graft.queries.TextAnalysis.PackBudget)
        .writeStream.format("noop").outputMode("append")
        .option("checkpointLocation", s"$ckRoot/pack").start()
      (b => input.addData(docSlice(b, baseDocBatch * copies).map(d => (d._1, d._2))), q)
    }

    // ---- CurationStream.curatedDocs ----
    // event time advances one hour per batch — far past the 10-minute
    // watermark horizon, so dedup keys from batch b-2 must have aged
    // out by batch b and state plateaus instead of accumulating
    run("curation_stream", copies, batches) { () =>
      val input = MemoryStream[(java.sql.Timestamp, Long, String, String)]
      val q = graft.streaming.CurationStream.curatedDocs(
          input.toDF().toDF("ts", "doc_id", "text", "lang"), "10 minutes")
        .writeStream.format("noop").outputMode("append")
        .option("checkpointLocation", s"$ckRoot/curation").start()
      (b => input.addData(docSlice(b, baseDocBatch * copies).zipWithIndex.map {
        case ((id, t, l), i) =>
          (new java.sql.Timestamp(1700000000000L + b * 3600000L + i), id, t, l)
      }), q)
    }

    // ---- EmbedDedupStream ----
    val refIndex = graft.streaming.EmbedDedupStream
      .referenceIndex(Tables.embeddings(spark, srcDir))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    refIndex.count(): Unit
    run("embed_dedup_stream", copies, batches) { () =>
      val input = MemoryStream[(Long, Array[Float])]
      val q = graft.streaming.EmbedDedupStream.novelVectors(
          input.toDF().toDF("vec_id", "embedding"), refIndex,
          graft.queries.Dedup.CosTau)
        .writeStream.format("noop").outputMode("append")
        .option("checkpointLocation", s"$ckRoot/embed").start()
      (b => input.addData((0 until baseVecBatch * copies).map { i =>
        val (id, v) = embs((b * baseVecBatch * copies + i) % embs.length)
        (id + (b.toLong * baseVecBatch * copies + i) / embs.length * off, v)
      }), q)
    }

    // ---- QuantileStream ----
    // values cycle the real distribution; state must hold exactly
    // |event types| rows (one 8 KiB bin array each) at any rate
    val evRows = Tables.events(spark, srcDir)
      .filter($"value".isNotNull)
      .select($"event_type", $"value").as[(String, Double)]
      .collect()
    run("quantile_stream", copies, batches) { () =>
      val input = MemoryStream[(String, Double)]
      val q = graft.streaming.QuantileStream.sketchContinuous(
          input.toDF().toDF("event_type", "value"))
        .writeStream.format("noop").outputMode("update")
        .option("checkpointLocation", s"$ckRoot/quantile").start()
      (b => input.addData((0 until baseDocBatch * copies).map { i =>
        evRows((b * baseDocBatch * copies + i) % evRows.length)
      }), q)
    }

    spark.stop()
  }
}
