package graft

import graft.streaming.{Evt, EventsStream}
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSpec {

  test("streaming windowed counts (AvailableNow + watermark) match batch aggregation") {
    val streaming = EventsStream.windowedCounts(EventsStream.source(spark, sf))
    val got = EventsStream
      .runToMemory(spark, streaming, "win_counts")
      .agg(sum("n"))
      .collect()
      .head
      .getLong(0)
    val batch = spark.read.parquet(s"$sf/events.parquet").count()
    // append mode withholds only windows not yet finalized by the watermark;
    // with AvailableNow over a bounded file the final watermark passes all
    // but the trailing window(s)
    assert(got > batch / 2 && got <= batch)
  }

  test("streaming sliding windows: each finalized window's count matches the batch hopping agg") {
    val streaming = EventsStream.slidingCounts(EventsStream.source(spark, sf))
    val got = EventsStream
      .runToMemory(spark, streaming, "slide_counts")
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val batch = graft.queries.RelQueries
      .queries("events_hopping_agg")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(got.nonEmpty)
    // every window the stream finalized must agree exactly with batch
    got.foreach { case (k, n) => assert(batch(k) == n, s"window $k") }
  }

  test("watermark late-drops are OBSERVABLE: lateDropCount and the lifetime accumulator agree") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val acc = new graft.streaming.LateDropAccumulator
    spark.streams.addListener(acc)
    try {
      val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Long)]
      val events = input
        .toDF()
        .select(col("_1").as("event_type"), timestamp_seconds(col("_2")).as("t"))
      val q = EventsStream
        .windowedCounts(events)
        .writeStream
        .format("memory")
        .queryName("late_drop_stream")
        .outputMode("append")
        .start()
      // batch 0: max t = 100000 → watermark = 96400 (processAllAvailable
      // lets the trailing no-data batch carry it into the LATE-event
      // filter — within a run that filter lags one batch behind eviction)
      input.addData(("click", 90000L), ("click", 95000L), ("view", 100000L))
      q.processAllAvailable()
      // next data batch: two rows hours past the watermark — two late
      // (window, event_type) groups, the grain the engine counts drops
      // at — plus one row above it (kept in state, window not finalized)
      input.addData(("click", 80000L), ("view", 80500L), ("click", 99500L))
      q.processAllAvailable()
      val runId = q.runId
      q.stop()
      assert(EventsStream.lateDropCount(q) == 2L)
      assert(acc.total(runId) == 2L)
      assert(acc.total(java.util.UUID.randomUUID()) == 0L) // unseen run: zero, not a crash
      // emission check (pins the oracle's boundary rule): batch 1 runs under
      // watermark 96400, so exactly the [90000, 93600) window finalizes —
      // the held windows and the dropped rows contribute nothing
      val out = spark.table("late_drop_stream")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(out == Set((90000000000L, "click", 1L)))
    } finally spark.streams.removeListener(acc)
  }

  test("lateDropCount also observes stream-stream join state drops (no aggregation required)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, Long, Long)]
    val events = input
      .toDF()
      .select(
        col("_1").as("user_id"),
        col("_2").as("event_type"),
        timestamp_seconds(col("_3")).as("t"),
        col("_4").as("value"))
      .withColumn("event_id", col("value"))
    val q = EventsStream
      .purchaseAttribution(events)
      .writeStream
      .format("memory")
      .queryName("late_join_stream")
      .outputMode("append")
      .start()
    // batch 0 advances both sides' watermarks to 96400
    input.addData((1L, "click", 99000L, 1L), (1L, "purchase", 100000L, 2L))
    q.processAllAvailable()
    input.addData((1L, "click", 99500L, 3L)) // in-band: watermark filter warms
    q.processAllAvailable()
    // hours-late rows on BOTH sides: the join's state-store input filters
    // drop them, and the same engine accounting surfaces it
    input.addData((1L, "click", 50000L, 4L), (1L, "purchase", 50500L, 5L))
    q.processAllAvailable()
    q.stop()
    assert(EventsStream.lateDropCount(q) >= 2L,
      s"join drops observable, got ${EventsStream.lateDropCount(q)}")
  }

  test("late drops against the SESSION state faces: built-in windows count, the custom face keeps") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // --- built-in session_window + watermark (sessionCounts): the session
    // store's pre-aggregate input filter drops late rows and the engine
    // accounts for them in numRowsDroppedByWatermark, same as tumbling
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long)]
    val events = input.toDF()
      .select(col("_1").as("user_id"), timestamp_seconds(col("_2")).as("t"))
    val q = EventsStream.sessionCounts(events, gap = "5 minutes", horizon = "1 hour")
      .writeStream
      .format("memory")
      .queryName("late_session_stream")
      .outputMode("append")
      .start()
    // batch 0: watermark advances to 100000 - 3600 = 96400; the trailing
    // no-data batch carries it into the late filter (two-value tracker)
    input.addData((1L, 95000L), (1L, 100000L))
    q.processAllAvailable()
    // one row hours past the watermark, one above it
    input.addData((2L, 50000L), (1L, 99000L))
    q.processAllAvailable()
    q.stop()
    assert(EventsStream.lateDropCount(q) == 1L,
      s"session_window drops must be observable, got ${EventsStream.lateDropCount(q)}")
    // the late user's session never surfaces
    assert(spark.table("late_session_stream").filter(col("user_id") === 2L).count() === 0L)
    // --- custom flatMapGroupsWithState sessionization (sessionize): NO
    // watermark anywhere, so nothing is ever watermark-dropped — a
    // straggler becomes its own session (the documented policy) and
    // lateDropCount honestly reads 0 (nothing silently vanished)
    val input2 = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Evt]
    val q2 = EventsStream.sessionize(input2.toDS(), gapSecs = 300L)
      .writeStream
      .format("memory")
      .queryName("late_sessionize_stream")
      .outputMode("append")
      .start()
    input2.addData(Evt(1L, 95000L), Evt(1L, 100000L))
    q2.processAllAvailable()
    // the same hours-late straggler: kept, closed as its own session once
    // a newer fragment exists for the user
    input2.addData(Evt(1L, 50000L), Evt(1L, 100100L))
    q2.processAllAvailable()
    input2.addData(Evt(1L, 101000L))
    q2.processAllAvailable()
    q2.stop()
    assert(EventsStream.lateDropCount(q2) == 0L,
      s"sessionize has no watermark: got ${EventsStream.lateDropCount(q2)} phantom drops")
    val sess = spark.table("late_sessionize_stream")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(sess.exists { case (u, st, en, n) => u == 1L && st == 50000L && en == 50000L && n == 1 },
      s"the straggler must surface as its own session, got ${sess.mkString(",")}")
  }

  test("append-mode emission boundary: a window whose end EQUALS the watermark finalizes") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Long)]
    val events = input
      .toDF()
      .select(col("_1").as("event_type"), timestamp_seconds(col("_2")).as("t"))
    val q = EventsStream
      .windowedCounts(events)
      .writeStream
      .format("memory")
      .queryName("wm_boundary_stream")
      .outputMode("append")
      .start()
    // max t = 104400 (hour-aligned) → watermark after batch 0 = 100800,
    // EXACTLY the end of 99000's window [97200, 100800)
    input.addData(("click", 99000L), ("click", 104400L))
    q.processAllAvailable()
    input.addData(("view", 104500L)) // just advances a batch under wm = 100800
    q.processAllAvailable()
    q.stop()
    val out = spark.table("wm_boundary_stream")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    // the oracle mirrors this exact rule: window_end <= watermark finalizes
    assert(out == Set((97200000000L, "click", 1L)))
  }

  test("stream-static enrichment join broadcasts the dimension, no stream state") {
    val s = spark
    import s.implicits._
    val dim = Seq((0L, "alpha"), (1L, "beta")).toDF("user_id", "cohort")
    val streaming = EventsStream
      .enriched(EventsStream.source(spark, sf).withColumn("user_id", col("user_id") % 2), dim, "user_id")
      .groupBy("cohort")
      .agg(count(lit(1)).as("n"))
    val rows = EventsStream
      .runToMemory(spark, streaming, "enriched_counts", org.apache.spark.sql.streaming.OutputMode.Complete)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    val total = spark.read.parquet(s"$sf/events.parquet").count()
    assert(rows.keySet == Set("alpha", "beta"))
    assert(rows.values.sum == total)
  }

  test("stream-stream interval join matches the batch bound join, state bounded by watermarks") {
    val src = EventsStream.source(spark, sf)
    val got = EventsStream
      .runToMemory(spark, EventsStream.purchaseAttribution(src), "attribution")
      .count()
    val evRaw = spark.read.parquet(s"$sf/events.parquet")
    val ev = evRaw
      .select(
        col("user_id"),
        col("event_id"),
        col("event_type"),
        graft.io.EventTime.tsSecs(evRaw).as("ts_secs"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_secs").as("pt"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts_secs").as("ct"))
    val batch = p.join(
      c,
      col("user_id") === col("cu") &&
        col("ct") <= col("pt") && col("ct") >= col("pt") - 3600).count()
    // AvailableNow over a bounded file processes everything; with the final
    // watermark no pair is dropped, so counts agree exactly
    assert(got == batch, s"stream=$got batch=$batch")
    assert(got > 0)
  }

  test("landingSink: batch-id-keyed overwrite lands every row once, rerun adds nothing") {
    val dir = java.nio.file.Files.createTempDirectory("landing").toString
    val cp = s"$dir/cp"
    val out = s"$dir/out"
    def run(): Unit = {
      val q = EventsStream.landingSink(
        EventsStream.source(spark, sf).select("event_id", "user_id", "event_type"),
        out,
        cp)
      q.awaitTermination()
    }
    run()
    val n1 = spark.read.json(s"$out/batch_id=*").count()
    assert(n1 == spark.read.parquet(s"$sf/events.parquet").count())
    run() // no new source data, same checkpoint: nothing new lands
    val n2 = spark.read.json(s"$out/batch_id=*").count()
    assert(n2 == n1, "re-run with an up-to-date checkpoint must be a no-op")
  }

  test("ivfIngest: first batch trains the quantizer, later batches grow the index, rerun is a no-op") {
    val dir = java.nio.file.Files.createTempDirectory("annidx").toString
    val e = spark.read.parquet(s"$sf/embeddings.parquet").select("vec_id", "embedding")
    val q = e.filter(col("vec_id") < 8)
    val embSchema = e.schema
    def run(): Unit =
      graft.streaming.AnnIngest
        .ivfIngest(
          spark.readStream.schema(embSchema).parquet(s"$dir/in"),
          s"$dir/idx",
          s"$dir/cp")
        .awaitTermination()
    def probe() = graft.ops.Similarity.probeIvfIndex(spark, s"$dir/idx", q, k = 5)

    // batch 0: the base corpus trains the quantizer and fills the cells —
    // probing must equal the in-memory k-means IVF over the same corpus
    e.write.mode("append").parquet(s"$dir/in")
    run()
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r =>
        (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
          r.getAs[Long]("neighbor_id"), r.getAs[Double]("cos_r")))
      .toSet
    assert(rows(probe()) == rows(graft.ops.Similarity.ivfTopK(q, e, k = 5)))

    // batch 1: exact copies of the queries stream in under fresh ids —
    // frozen centroids route them to their originals' cells, so each
    // query now sees its copy at rank 1, cosine 1.0
    q.withColumn("vec_id", col("vec_id") + 1000000L)
      .write.mode("append").parquet(s"$dir/in")
    run()
    val grown = probe().filter(col("rank") === 1).collect()
      .map(r => r.getAs[Long]("query_id") ->
        ((r.getAs[Long]("neighbor_id"), r.getAs[Double]("cos_r"))))
      .toMap
    (0L until 8L).foreach { qid =>
      assert(grown(qid) == ((qid + 1000000L, 1.0)), s"query $qid: ${grown(qid)}")
    }

    // rerun with no new files: the checkpoint makes it a no-op
    val before = rows(probe())
    run()
    assert(rows(probe()) == before, "an up-to-date rerun must not change the index")
  }

  test("ivfIngest → drift → retrain mid-stream: probe equals clean rebuild, stream keeps going") {
    val dir = java.nio.file.Files.createTempDirectory("annretrain").toString
    val e = spark.read.parquet(s"$sf/embeddings.parquet").select("vec_id", "embedding")
    val q = e.filter(col("vec_id") < 8)
    val embSchema = e.schema
    def run(): Unit =
      graft.streaming.AnnIngest
        .ivfIngest(
          spark.readStream.schema(embSchema).parquet(s"$dir/in"),
          s"$dir/idx",
          s"$dir/cp")
        .awaitTermination()
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r =>
        (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
          r.getAs[Long]("neighbor_id"), r.getAs[Double]("cos_r")))
      .toSet

    // batch 0 trains on a SLICE (a soon-to-be-stale quantizer); batch 1
    // ingests the rest under the frozen centroids
    val part0 = e.filter(col("vec_id") % 3 =!= 2)
    val part1 = e.filter(col("vec_id") % 3 === 2)
    part0.write.mode("append").parquet(s"$dir/in")
    run()
    part1.write.mode("append").parquet(s"$dir/in")
    run()
    // the audit SAYS retrain (drift signal exists); then ACT on it
    val audit = graft.ops.Similarity.annIndexAudit(spark, s"$dir/idx", part1)
    assert(audit.count() > 0)
    graft.ops.Similarity.retrainIvfIndex(spark, s"$dir/idx")
    // probe-after-retrain must equal a clean batch rebuild over the full
    // live content (same seeds, same Lloyd loop, same assignment)
    val clean = java.nio.file.Files.createTempDirectory("annclean").toString + "/idx"
    graft.ops.Similarity.writeIvfIndex(e, clean)
    assert(
      rows(graft.ops.Similarity.probeIvfIndex(spark, s"$dir/idx", q, k = 5)) ==
        rows(graft.ops.Similarity.probeIvfIndex(spark, clean, q, k = 5)),
      "retrained probe must equal the clean rebuild")
    // the store stays batch-keyed (-1 fold), so the STREAM continues: a
    // post-retrain batch lands beside the fold and is immediately probeable
    q.withColumn("vec_id", col("vec_id") + 1000000L)
      .write.mode("append").parquet(s"$dir/in")
    run()
    val grown = graft.ops.Similarity.probeIvfIndex(spark, s"$dir/idx", q, k = 5)
      .filter(col("rank") === 1).collect()
      .map(r => r.getAs[Long]("query_id") ->
        ((r.getAs[Long]("neighbor_id"), r.getAs[Double]("cos_r"))))
      .toMap
    (0L until 8L).foreach { qid =>
      assert(grown(qid) == ((qid + 1000000L, 1.0)), s"query $qid after retrain+ingest: ${grown(qid)}")
    }
  }

  test("ivfPqIngest: batch 0 trains both quantizers, growth probes, compact mid-stream survives") {
    val dir = java.nio.file.Files.createTempDirectory("ivfpqing").toString
    val e = spark.read.parquet(s"$sf/embeddings.parquet").select("vec_id", "embedding")
    val q = e.filter(col("vec_id") < 8)
    val embSchema = e.schema
    def run(): Unit =
      graft.streaming.AnnIngest
        .ivfPqIngest(
          spark.readStream.schema(embSchema).parquet(s"$dir/in"),
          s"$dir/idx",
          s"$dir/cp")
        .awaitTermination()
    def rows() = graft.ops.Similarity.probeIvfPqIndex(spark, s"$dir/idx", q, k = 5).collect()
      .map(r =>
        (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
          r.getAs[Long]("neighbor_id"), r.getAs[Long]("adc_dist")))
      .toSet

    // batch 0 trains both quantizers: probe must equal a clean batch build
    e.write.mode("append").parquet(s"$dir/in")
    run()
    val clean = java.nio.file.Files.createTempDirectory("ivfpqclean").toString
    graft.ops.Similarity.writeIvfPqIndex(e, clean)
    val cleanRows = graft.ops.Similarity.probeIvfPqIndex(spark, clean, q, k = 5).collect()
      .map(r =>
        (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
          r.getAs[Long]("neighbor_id"), r.getAs[Long]("adc_dist")))
      .toSet
    assert(rows() == cleanRows, "streamed build must equal the batch build")

    // batch 1: exact query copies — identical vector → identical cell and
    // code → each query must see its copy in top-5
    q.withColumn("vec_id", col("vec_id") + 1000000L).write.mode("append").parquet(s"$dir/in")
    run()
    val grown = rows()
    (0L until 8L).foreach { qid =>
      assert(grown.exists(r => r._1 == qid && r._3 == qid + 1000000L), s"query $qid copy missing")
    }

    // mid-stream compaction folds generations; the stream continues
    graft.ops.Similarity.compactIvfPqIndex(spark, s"$dir/idx")
    assert(rows() == grown, "probe-after-compact must equal probe-before")
    e.limit(3).withColumn("vec_id", col("vec_id") + 2000000L)
      .write.mode("append").parquet(s"$dir/in")
    run()
    assert(rows().nonEmpty)
    // rerun with no new files: checkpointed no-op
    val before = rows()
    run()
    assert(rows() == before)
  }

  test("textIngest: streamed index ≡ batch build through growth, dedupe, and a crash window") {
    val dir = java.nio.file.Files.createTempDirectory("textstream").toString
    val s2 = spark
    import s2.implicits._
    val d0 = Seq((1L, "rare common common"), (2L, "common")).toDF("doc_id", "text")
    val d1 = Seq((2L, "common"), (3L, "common common common")).toDF("doc_id", "text") // resends 2
    val schema = d0.schema
    def run(): Unit =
      graft.streaming.TextIngest
        .textIngest(
          spark.readStream.schema(schema).parquet(s"$dir/in"),
          s"$dir/idx",
          s"$dir/cp")
        .awaitTermination()
    def served(terms: Seq[String]) =
      graft.ops.TextAnalysis.searchTextIndex(spark, s"$dir/idx", terms, k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    def direct(docs: org.apache.spark.sql.DataFrame, terms: Seq[String]) =
      graft.ops.TextAnalysis.searchTopK(docs, terms, k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    d0.write.mode("append").parquet(s"$dir/in")
    run()
    assert(served(Seq("rare", "common")) === direct(d0, Seq("rare", "common")))
    // growth batch re-sends doc 2: the dedupe must land only doc 3
    d1.write.mode("append").parquet(s"$dir/in")
    run()
    val union = d0.unionAll(d1.filter(col("doc_id") === 3L))
    assert(served(Seq("rare", "common")) === direct(union, Seq("rare", "common")))
    // a CRASHED generation (postings landed, docids not, marker up):
    // readers refuse, other mutators refuse, the retried batch repairs
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq((9L, "rare rare")).toDF("doc_id", "text")
      .select(col("doc_id"), org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split(col("text"), " ")).as("tok"))
      .groupBy("doc_id", "tok")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).cast("long").as("tf"))
      .withColumn("bucket", graft.ops.TextAnalysis.tokBucket(col("tok"), 64))
      .write.partitionBy("bucket").parquet(s"$dir/idx/postings/batch_id=7")
    val out = fs.create(new org.apache.hadoop.fs.Path(s"$dir/idx/inflight"), true)
    out.write("ingestTextBatch".getBytes("UTF-8")); out.close()
    intercept[IllegalStateException](
      graft.ops.TextAnalysis.searchTextIndex(spark, s"$dir/idx", Seq("rare"), k = 5))
    intercept[IllegalStateException](
      graft.ops.TextAnalysis.compactTextIndex(spark, s"$dir/idx"))
    // the retried batch overwrites its own half-landed generation
    graft.ops.TextAnalysis.ingestTextBatch(
      Seq((9L, "rare rare")).toDF("doc_id", "text"), s"$dir/idx", 7L)
    val withNine = union.unionAll(Seq((9L, "rare rare")).toDF("doc_id", "text"))
    assert(served(Seq("rare", "common")) === direct(withNine, Seq("rare", "common")))
    // TIME TRAVEL: serving as of generation 0 sees only d0's corpus —
    // idf's historical N included (the direct twin over d0 alone)
    def servedAsOf(n: Long) =
      graft.ops.TextAnalysis.searchTextIndexAsOf(spark, s"$dir/idx", Seq("rare", "common"), n, k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(servedAsOf(0L) === direct(d0, Seq("rare", "common")))
    assert(servedAsOf(1L) === direct(union, Seq("rare", "common")))
    assert(servedAsOf(7L) === direct(withNine, Seq("rare", "common")))
    // a mid-stream fold changes nothing served; a batch append refuses;
    // below-fold as-of reads refuse with the fold stated, above resumes
    graft.ops.TextAnalysis.compactTextIndex(spark, s"$dir/idx")
    assert(served(Seq("rare", "common")) === direct(withNine, Seq("rare", "common")))
    val ef = intercept[IllegalArgumentException](servedAsOf(1L))
    assert(ef.getMessage.contains("folded"), ef.getMessage)
    assert(servedAsOf(7L) === direct(withNine, Seq("rare", "common")))
    // a tombstoned stream store refuses as-of (deletes are not
    // generation-stamped); a STREAMED re-insert of the tombstoned doc
    // refuses too (the appendTextIndex rule — never silently swallowed
    // as already-known); compaction reclaims and as-of resumes
    graft.ops.TextAnalysis.deleteFromTextIndex(Seq(9L).toDF("doc_id"), s"$dir/idx")
    val et = intercept[IllegalArgumentException](servedAsOf(7L))
    assert(et.getMessage.contains("tombstones"), et.getMessage)
    val er = intercept[IllegalArgumentException](
      graft.ops.TextAnalysis.ingestTextBatch(
        Seq((9L, "rare rare")).toDF("doc_id", "text"), s"$dir/idx", 12L))
    assert(er.getMessage.contains("compact"), er.getMessage)
    graft.ops.TextAnalysis.compactTextIndex(spark, s"$dir/idx")
    assert(servedAsOf(7L) === direct(union, Seq("rare", "common")))
    // the RE-fold of an already-folded store must keep the fold pin —
    // regressing it to -1 would silently re-admit below-fold reads over
    // folded data
    val ef2 = intercept[IllegalArgumentException](servedAsOf(1L))
    assert(ef2.getMessage.contains("folded"), ef2.getMessage)
    val e = intercept[IllegalArgumentException](
      graft.ops.TextAnalysis.appendTextIndex(
        Seq((50L, "x")).toDF("doc_id", "text"), s"$dir/idx"))
    assert(e.getMessage.contains("stream"), e.getMessage)
    // a batch-built store has no generations to travel over
    val bdir = java.nio.file.Files.createTempDirectory("textasofbatch").toString
    graft.ops.TextAnalysis.writeTextIndex(d0, bdir)
    val eb = intercept[IllegalArgumentException](
      graft.ops.TextAnalysis.searchTextIndexAsOf(spark, bdir, Seq("rare"), 0L))
    assert(eb.getMessage.contains("batch-built"), eb.getMessage)
  }

  test("ivfIngest: an empty leading batch neither crashes nor leaves the index untrained") {
    val dir = java.nio.file.Files.createTempDirectory("annempty").toString
    val e = spark.read.parquet(s"$sf/embeddings.parquet").select("vec_id", "embedding")
    val q = e.filter(col("vec_id") < 8)
    val embSchema = e.schema
    def run(): Unit =
      graft.streaming.AnnIngest
        .ivfIngest(
          spark.readStream.schema(embSchema).parquet(s"$dir/in"),
          s"$dir/idx",
          s"$dir/cp")
        .awaitTermination()
    // batch 0 is EMPTY (a zero-row parquet file): must no-op, not crash,
    // and must NOT consume the one-shot training slot
    e.limit(0).write.mode("append").parquet(s"$dir/in")
    run()
    // the first NON-EMPTY batch trains; probing then equals the in-memory
    // k-means IVF over that batch
    e.write.mode("append").parquet(s"$dir/in")
    run()
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r =>
        (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
          r.getAs[Long]("neighbor_id"), r.getAs[Double]("cos_r")))
      .toSet
    assert(
      rows(graft.ops.Similarity.probeIvfIndex(spark, s"$dir/idx", q, k = 5)) ==
        rows(graft.ops.Similarity.ivfTopK(q, e, k = 5)))
    // probing with an empty query set returns empty instead of throwing
    assert(
      graft.ops.Similarity
        .probeIvfIndex(spark, s"$dir/idx", q.filter(col("vec_id") < 0), k = 5)
        .count() == 0L)
  }

  test("ivf ingest → compact → probe: results preserved, batch lineage folded, retrain replaces all") {
    val dir = java.nio.file.Files.createTempDirectory("anncompact").toString
    val e = spark.read.parquet(s"$sf/embeddings.parquet").select("vec_id", "embedding")
    val q = e.filter(col("vec_id") < 8)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r =>
        (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
          r.getAs[Long]("neighbor_id"), r.getAs[Double]("cos_r")))
      .toSet
    // two ingest generations (the foreachBatch bodies, driven directly)
    graft.ops.Similarity.ingestIvfBatch(e, dir, 0L)
    graft.ops.Similarity.ingestIvfBatch(
      q.withColumn("vec_id", col("vec_id") + 1000000L), dir, 1L)
    val before = rows(graft.ops.Similarity.probeIvfIndex(spark, dir, q, k = 5))
    assert(spark.read.parquet(s"$dir/cells").columns.contains("batch_id"))
    graft.ops.Similarity.compactIvfIndex(spark, dir)
    assert(rows(graft.ops.Similarity.probeIvfIndex(spark, dir, q, k = 5)) == before,
      "compaction must not change probe results")
    // stream generations fold into ONE synthetic batch_id=-1 dir — NOT a
    // flat layout, which would collide with the next ingest batch's
    // batch_id=N dir and break partition discovery mid-stream
    assert(
      spark.read.parquet(s"$dir/cells").select(col("batch_id").cast("long")).distinct()
        .collect().map(_.getLong(0)).toSet == Set(-1L),
      "compaction must fold the batch generations into one")
    // the stream keeps growing AFTER a mid-stream compaction: the next
    // batch lands beside the compacted generation and probes see both
    graft.ops.Similarity.ingestIvfBatch(
      q.withColumn("vec_id", col("vec_id") + 2000000L), dir, 2L)
    val grown = rows(graft.ops.Similarity.probeIvfIndex(spark, dir, q, k = 5))
    assert(grown.exists(_._3 >= 2000000L),
      "post-compaction ingest batch must be visible to probes")
    // a FRESH stream pointed at the path (batch 0 again) retrains and
    // REPLACES the whole index: no cell written under the old quantizer —
    // batch-keyed or compacted — may survive into probes
    val small = e.filter(col("vec_id") % 2 === 0)
    graft.ops.Similarity.ingestIvfBatch(small, dir, 0L)
    val ids = spark.read.parquet(s"$dir/cells")
      .select("neighbor_id").collect().map(_.getLong(0)).toSet
    val want = small.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(ids == want, s"stale cells survived the retrain: ${(ids -- want).take(5)}")
  }

  test("pqIngest: codebook trains on batch 0, grown store equals rebuild-from-union") {
    val dir = java.nio.file.Files.createTempDirectory("pqstream").toString
    val e = spark.read.parquet(s"$sf/embeddings.parquet").select("vec_id", "embedding")
    val q = e.filter(col("vec_id") < 8)
    val embSchema = e.schema
    def run(): Unit =
      graft.streaming.AnnIngest
        .pqIngest(
          spark.readStream.schema(embSchema).parquet(s"$dir/in"),
          s"$dir/idx",
          s"$dir/cp")
        .awaitTermination()
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r =>
        (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
          r.getAs[Long]("neighbor_id"), r.getAs[Long]("adc_dist")))
      .toSet

    // an EMPTY leading batch no-ops without consuming the training slot
    // (the same contract as ivfIngest, pinned on the PQ path too)
    e.limit(0).write.mode("append").parquet(s"$dir/in")
    run()
    e.write.mode("append").parquet(s"$dir/in")
    run()
    assert(
      rows(graft.ops.Similarity.probePqIndex(spark, s"$dir/idx", q, k = 5)) ==
        rows(graft.ops.Similarity.pqTopK(q, e, k = 5)))

    // batch 1 streams in high-id copies: the codebook seeds (lowest ids)
    // are untouched, so the grown store must equal the in-memory ADC over
    // the unioned corpus — the same append≡rebuild property as the batch
    // appendPqIndex
    val copies = q.withColumn("vec_id", col("vec_id") + 1000000L)
    copies.write.mode("append").parquet(s"$dir/in")
    run()
    assert(
      rows(graft.ops.Similarity.probePqIndex(spark, s"$dir/idx", q, k = 5)) ==
        rows(graft.ops.Similarity.pqTopK(q, e.unionByName(copies), k = 5)))
  }

  test("dedupIngest: history-backed dedupe across runs, in-batch min-id, idempotent rerun") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ingest").toString
    def addDocs(docs: Seq[(Long, String)]): Unit =
      docs.toDF("doc_id", "text").write.mode("append").parquet(s"$dir/in")
    def run(): Unit = {
      val stream = spark.readStream
        .schema("doc_id LONG, text STRING")
        .parquet(s"$dir/in")
      val q = graft.streaming.CorpusIngest.dedupIngest(stream, s"$dir/out", s"$dir/cp")
      q.awaitTermination()
    }
    def landed(): Set[Long] =
      spark.read.parquet(s"$dir/out/docs").select("doc_id").as[Long].collect().toSet

    addDocs(Seq((1L, "alpha beta"), (2L, "alpha beta"), (3L, "gamma delta")))
    run()
    assert(landed() == Set(1L, 3L), "in-batch dup must collapse to the min id")

    // run 2: a re-crawl (same normalized fingerprint) and a genuinely new doc
    addDocs(Seq((10L, "Alpha   BETA"), (11L, "epsilon zeta")))
    run()
    assert(landed() == Set(1L, 3L, 11L), "history must drop the re-crawl")

    // run 3: no new input — nothing changes
    run()
    assert(landed() == Set(1L, 3L, 11L))
    // the fingerprint store holds exactly the landed docs' fingerprints
    val fps = spark.read.parquet(s"$dir/out/fps").select("fingerprint").as[String].collect()
    assert(fps.length == 3 && fps.distinct.length == 3)
  }

  test("setJoinDedupIngest: landed pairs across batches equal the full batch join; rerun no-op") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("setjoiningest").toString
    val hist = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog forever and ever"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta")).toDF("doc_id", "text")
    val batch = Seq(
      (11L, "the quick brown fox jumps over the lazy dog tonight"),
      (12L, "the quick brown fox jumps over the lazy dog forever"),
      (13L, "nothing shares any trigram with anything indexed at all")).toDF("doc_id", "text")
    val schema = hist.schema
    def run(): Unit =
      graft.streaming.CorpusIngest.setJoinDedupIngest(
        spark.readStream.schema(schema).parquet(s"$dir/in"),
        s"$dir/idx", s"$dir/cp", thresholdMilli = 500)
        .awaitTermination()
    def landed(): Set[(Long, Long, Long)] =
      spark.read.parquet(s"$dir/idx/pairs")
        .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Long]("inter")))
        .toSet
    hist.write.mode("append").parquet(s"$dir/in")
    run()
    batch.write.mode("append").parquet(s"$dir/in")
    run()
    // every qualifying pair of the FULL corpus landed exactly once, in
    // the batch of its later doc — union across batch dirs = batch join
    val want = graft.ops.Dedup.setSimilarityJoin(hist.unionAll(batch), thresholdMilli = 500)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(landed() === want && want.nonEmpty, s"landed=${landed()} want=$want")
    assert(want.exists(p => p._1 == 1L && p._2 == 11L), "cross-batch pair expected")
    run() // no new files, same checkpoint: nothing changes
    assert(landed() === want)
  }

  test("tokenEditIngest: landed ed<=1 pairs across batches equal the full batch join") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tokeditingest").toString
    val hist = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "totally unrelated words here")).toDF("doc_id", "text")
    val batch = Seq(
      (11L, "alpha beta gamma delta epsilon"),
      (12L, "alpha beta gamma delta"),
      (13L, "nothing like anything at all indexed")).toDF("doc_id", "text")
    val schema = hist.schema
    def run(): Unit =
      graft.streaming.CorpusIngest.tokenEditIngest(
        spark.readStream.schema(schema).parquet(s"$dir/in"), s"$dir/idx", s"$dir/cp")
        .awaitTermination()
    hist.write.mode("append").parquet(s"$dir/in")
    run()
    batch.write.mode("append").parquet(s"$dir/in")
    run()
    val landed = spark.read.parquet(s"$dir/idx/pairs")
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Long]("ed")))
      .toSet
    val want = graft.ops.Dedup.tokenEditJoin(hist.unionAll(batch))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(landed === want && want.contains((1L, 12L, 0L)), s"landed=$landed want=$want")
  }

  test("spanDedupIngest: cross-batch spans excised, index grows, retry idempotent, compact survives") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("spandup").toString
    def addDocs(docs: Seq[(Long, String)]): Unit =
      docs.toDF("doc_id", "text").write.mode("append").parquet(s"$dir/in")
    def run(): Unit =
      graft.streaming.CorpusIngest
        .spanDedupIngest(
          spark.readStream.schema("doc_id LONG, text STRING").parquet(s"$dir/in"),
          s"$dir/idx",
          s"$dir/cp")
        .awaitTermination()
    def landed(): Map[Long, (String, Long)] =
      spark.read.parquet(s"$dir/idx/docs")
        .select("doc_id", "text", "n_removed")
        .collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2))))
        .toMap

    val passage = "alpha beta gamma delta epsilon zeta eta theta iota kappa" // 10 tokens
    // batch 1: docs 1/2 share the passage AND the following token "doc"
    // (span runs to token 11); doc 3 is untouched
    addDocs(Seq(
      (1L, s"$passage doc one unique ending tokens here"),
      (2L, s"$passage doc two other ending material now"),
      (3L, "totally fresh unrelated document with zero shared runs anywhere")))
    run()
    val b1 = landed()
    assert(b1(1L) == (("one unique ending tokens here", 11L)))
    assert(b1(2L) == (("two other ending material now", 11L)))
    assert(b1(3L) == (("totally fresh unrelated document with zero shared runs anywhere", 0L)))

    // batch 2: a re-crawl embedding the history passage is stripped of
    // exactly it; a fresh doc lands untouched
    addDocs(Seq(
      (10L, s"recrawl prefix then $passage and beyond that point"),
      (11L, "another wholly original piece of training text right here")))
    run()
    val b2 = landed()
    assert(b2(10L) == (("recrawl prefix then and beyond that point", 10L)))
    assert(b2(11L) == (("another wholly original piece of training text right here", 0L)))

    // the grown store IS probeable with the batch face
    val probeSpans = graft.ops.TextAnalysis
      .probeDupSpans(spark, s"$dir/idx", Seq((50L, s"lead in $passage trail out")).toDF("doc_id", "text"))
      .collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(probeSpans.toSeq == Seq((3L, 12L)), s"probe must find the passage span, got ${probeSpans.toSeq}")

    // a directly-retried batch rewrites its own dirs instead of duplicating
    graft.ops.TextAnalysis.ingestGramBatch(
      Seq(
        (10L, s"recrawl prefix then $passage and beyond that point"),
        (11L, "another wholly original piece of training text right here")).toDF("doc_id", "text"),
      s"$dir/idx", 1L)
    assert(landed() == b2, "retried batch must be idempotent")

    // mid-stream compaction folds generations; later batches still match history
    graft.ops.TextAnalysis.compactGramIndex(spark, s"$dir/idx")
    addDocs(Seq(
      (20L, s"third wave copy $passage closing words differ"),
      (21L, "completely independent final document with nothing repeated at all")))
    run()
    val b3 = landed()
    assert(b3(20L)._2 == 10L, s"post-compaction batch must still strip against folded history: ${b3(20L)}")
    assert(b3(21L)._2 == 0L)
  }

  test("decontamIngest: benchmark spans excised at ingest, index static, retired suite stops marking") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("decontam").toString
    val evalq = "what is the capital of france and when was it founded exactly" // 12 tokens
    val evalq2 = "name every planet of the solar system in order from the sun"  // 12 tokens
    // the benchmark index is built ONCE, before the stream exists
    graft.ops.TextAnalysis.writeGramIndex(
      Seq((9000L, evalq), (9001L, evalq2)).toDF("doc_id", "text"), s"$dir/bench")
    def addDocs(docs: Seq[(Long, String)]): Unit =
      docs.toDF("doc_id", "text").write.mode("append").parquet(s"$dir/in")
    def run(): Unit =
      graft.streaming.CorpusIngest
        .decontamIngest(
          spark.readStream.schema("doc_id LONG, text STRING").parquet(s"$dir/in"),
          s"$dir/bench",
          s"$dir/out",
          s"$dir/cp")
        .awaitTermination()
    def landed(): Map[Long, (String, Long)] =
      spark.read.parquet(s"$dir/out/docs")
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap

    addDocs(Seq(
      (1L, s"training prose then $evalq and more after"),
      (2L, "wholly original training document with no benchmark overlap at all here")))
    run()
    val b1 = landed()
    assert(b1(1L) == (("training prose then and more after", 12L)), s"${b1(1L)}")
    assert(b1(2L)._2 == 0L)
    // batch 2: leaks from the SECOND suite also excise; two batch docs
    // sharing a passage with each other (but not the benchmark) pass —
    // decontamination is one-directional, not a dedup
    val shared = "our corpus repeats this exact sentence across two documents verbatim"
    addDocs(Seq(
      (3L, s"$evalq2 opener then body text follows"),
      (4L, s"alpha $shared omega one"),
      (5L, s"beta $shared omega two")))
    run()
    val b2 = landed()
    assert(b2(3L) == (("opener then body text follows", 12L)), s"${b2(3L)}")
    assert(b2(4L)._2 == 0L && b2(5L)._2 == 0L, "corpus-internal dups must NOT excise here")
    // the static index never grew: still exactly the two benchmark docs
    val idxDocs = spark.read.parquet(s"$dir/bench/postings").select("doc_id").distinct()
      .as[Long].collect().toSet
    assert(idxDocs == Set(9000L, 9001L), s"index must stay static: $idxDocs")
    // retiring suite 9001 (tombstone) stops its marks from the NEXT batch
    graft.ops.Similarity.deleteFromIndex(Seq(9001L).toDF("doc_id"), s"$dir/bench", idCol = "doc_id")
    addDocs(Seq((6L, s"$evalq2 opener then fresh closing material")))
    run()
    assert(landed()(6L)._2 == 0L, "a retired eval suite must stop marking")
  }

  test("mediaDedupIngest: in-batch + cross-batch near-dup media drop, retry idempotent, compact survives") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mediadup").toString
    // rows are CONTENT-addressed: MediaSynth bytes depend on the content
    // id, re-keyed to a fresh doc id — same content id ⇒ identical bytes
    // (an exact re-upload, hamming 0)
    def keyed(pairs: Seq[(Long, Long)], kind: String): org.apache.spark.sql.DataFrame = {
      val gen: Long => Array[Byte] =
        if (kind.startsWith("image/")) graft.etl.MediaSynth.docBmp else graft.etl.MediaSynth.docWav
      pairs
        .map { case (newId, contentId) =>
          val b = gen(contentId)
          (newId, kind, b.length.toLong, b)
        }
        .toDF("doc_id", "kind", "n_bytes", "media")
    }
    def addKeyed(pairs: Seq[(Long, Long)], kind: String): Unit =
      keyed(pairs, kind).write.mode("append").parquet(s"$dir/in")
    def run(): Unit =
      graft.streaming.CorpusIngest
        .mediaDedupIngest(
          spark.readStream.schema("doc_id LONG, kind STRING, n_bytes LONG, media BINARY").parquet(s"$dir/in"),
          s"$dir/idx",
          s"$dir/cp")
        .awaitTermination()
    def landed(): Set[Long] =
      spark.read.parquet(s"$dir/idx/docs").select("doc_id").as[Long].collect().toSet

    // batch 0: image content 1 twice (ids 1001, 2001 — in-batch near-dup:
    // only the lowest id lands), image content 4 once, wav content 1 once
    // (content ids picked pairwise Hamming > 6 apart per medium, so only
    // the planted duplicates are near-dups at the default threshold 3)
    addKeyed(Seq((1001L, 1L), (2001L, 1L), (1002L, 4L)), "image/bmp")
    addKeyed(Seq((1003L, 1L)), "audio/wav")
    run()
    assert(landed() == Set(1001L, 1002L, 1003L),
      s"in-batch image near-dup must collapse to the lowest id: ${landed()}")

    // batch 1: a re-upload of image content 1 and wav content 1 (both must
    // drop against history), a fresh image content 11 (lands)
    addKeyed(Seq((3001L, 1L), (3004L, 11L)), "image/bmp")
    addKeyed(Seq((3003L, 1L)), "audio/wav")
    run()
    assert(landed() == Set(1001L, 1002L, 1003L, 3004L),
      s"cross-batch re-uploads must drop: ${landed()}")

    // a directly-retried batch 1 rewrites its own dirs instead of
    // duplicating or re-dropping against its own half-written rows
    graft.ops.Multimodal.ingestMediaBatch(
      keyed(Seq((3001L, 1L), (3004L, 11L)), "image/bmp")
        .unionByName(keyed(Seq((3003L, 1L)), "audio/wav")),
      s"$dir/idx", 1L)
    assert(landed() == Set(1001L, 1002L, 1003L, 3004L), "retried batch must be idempotent")

    // the grown store IS probeable with the batch face
    val probe = graft.ops.Multimodal
      .probeMediaIndex(spark, s"$dir/idx", keyed(Seq((9001L, 11L)), "image/bmp"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(probe.toSeq == Seq((9001L, "image", 3004L, 0L)), s"probe: ${probe.toSeq}")

    // mid-stream compaction folds generations; later batches still match history
    graft.ops.Multimodal.compactMediaIndex(spark, s"$dir/idx")
    addKeyed(Seq((5004L, 11L), (5005L, 12L)), "image/bmp")
    run()
    val fin = landed()
    assert(!fin.contains(5004L), "post-compaction re-upload must still drop against folded history")
    assert(fin.contains(5005L), "fresh post-compaction content must land")

    // drops are (doc_id, medium)-keyed: one doc id carrying an image that
    // near-matches history AND a fresh audio clip loses only the image row
    addKeyed(Seq((7001L, 1L)), "image/bmp") // image content 1: history near-dup
    addKeyed(Seq((7001L, 4L)), "audio/wav") // audio content 4: fresh
    run()
    val kinds7001 = spark.read.parquet(s"$dir/idx/docs")
      .filter(col("doc_id") === 7001L).select("kind").as[String].collect().toSet
    assert(kinds7001 == Set("audio/wav"),
      s"doc 7001 must land its fresh audio and lose only its dup image: $kinds7001")
  }

  test("nearDedupIngest: cross-batch near-dups dropped, index grows, mid-stream compact survives") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("neardup").toString
    def addDocs(docs: Seq[(Long, String)]): Unit =
      docs.toDF("doc_id", "text").write.mode("append").parquet(s"$dir/in")
    def run(): Unit =
      graft.streaming.CorpusIngest
        .nearDedupIngest(
          spark.readStream.schema("doc_id LONG, text STRING").parquet(s"$dir/in"),
          s"$dir/idx",
          s"$dir/cp")
        .awaitTermination()
    def landed(): Set[Long] =
      spark.read.parquet(s"$dir/idx/docs").select("doc_id").as[Long].collect().toSet

    val base = (1 to 30).map(i => s"token$i").mkString(" ")
    val other = (100 to 130).map(i => s"word$i").mkString(" ")
    // batch 1: a NEAR-dup pair (not byte-identical — the exact face would
    // miss it) collapses to the min id; an unrelated doc lands
    addDocs(Seq((1L, base), (2L, base + " tail"), (3L, other)))
    run()
    assert(landed() == Set(1L, 3L), "in-batch near-dup must collapse to one representative")

    // batch 2: a re-crawl near-dup of history is dropped, a fresh doc lands
    val fresh = (200 to 230).map(i => s"new$i").mkString(" ")
    addDocs(Seq((10L, base + " re crawl"), (11L, fresh)))
    run()
    assert(landed() == Set(1L, 3L, 11L), "history near-dup must be dropped")

    // the grown store IS a probeable LSH index
    val probe = Seq((50L, base + " probing")).toDF("doc_id", "text")
    val hits = graft.ops.Dedup.probeLshIndex(spark, s"$dir/idx", probe)
      .select("corpus_id").as[Long].collect().toSet
    assert(hits == Set(1L), "probe must surface the landed near-dup partner")

    // a directly-retried batch rewrites itself instead of duplicating
    graft.ops.Dedup.ingestLshBatch(
      Seq((10L, base + " re crawl"), (11L, fresh)).toDF("doc_id", "text"), s"$dir/idx", 1L)
    assert(landed() == Set(1L, 3L, 11L), "retried batch must be idempotent")

    // mid-stream compaction folds generations; the stream keeps growing after
    graft.ops.Dedup.compactLshIndex(spark, s"$dir/idx")
    addDocs(Seq((20L, fresh + " again"), (21L, (300 to 330).map(i => s"x$i").mkString(" "))))
    run()
    assert(landed() == Set(1L, 3L, 11L, 21L),
      "post-compaction batch must still dedup against folded history and land the rest")
  }

  test("dedupIngest blocklist: blocked docs neither land nor claim fingerprints") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ingestbl").toString
    def run(): Unit = {
      val stream = spark.readStream
        .schema("doc_id LONG, text STRING")
        .parquet(s"$dir/in")
      graft.streaming.CorpusIngest
        .dedupIngest(stream, s"$dir/out", s"$dir/cp", blocklist = Seq("badword"))
        .awaitTermination()
    }
    Seq((1L, "clean alpha text"), (2L, "has badword inside"))
      .toDF("doc_id", "text").write.mode("append").parquet(s"$dir/in")
    run()
    val landed = spark.read.parquet(s"$dir/out/docs").select("doc_id").as[Long].collect().toSet
    assert(landed == Set(1L), "the blocked doc must not land")
    // the blocked doc claimed no fingerprint: a later clean doc with the
    // SAME id-space slot and different content still ingests normally
    Seq((3L, "clean gamma text")).toDF("doc_id", "text")
      .write.mode("append").parquet(s"$dir/in")
    run()
    assert(
      spark.read.parquet(s"$dir/out/docs").select("doc_id").as[Long].collect().toSet ==
        Set(1L, 3L))
    val fps = spark.read.parquet(s"$dir/out/fps").count()
    assert(fps == 2L, "exactly the two landed docs hold fingerprints")
  }

  test("flatMapGroupsWithState sessionization splits on gaps") {
    val s = spark
    import s.implicits._
    val ev = Seq(
      Evt(1L, 1000L), Evt(1L, 1500L), Evt(1L, 4000L), // gap 2500 > 1800 → 2 sessions
      Evt(2L, 100L)
    ).toDS()
    val sessions = EventsStream.sessionize(ev, gapSecs = 1800).collect()
    // batch mode emits only CLOSED sessions (state cannot persist): user 1's
    // first session closes when the gap appears
    assert(sessions.length == 1)
    assert(sessions.head == graft.streaming.Session(1L, 1000L, 1500L, 2))
  }

  test("sessionize handles out-of-order events within a batch (fragment merge, no buffering)") {
    val s = spark
    import s.implicits._
    // arrival order scrambled; 2000 arrives last and BRIDGES 1000 and 3000
    val ev = Seq(
      Evt(1L, 3000L), Evt(1L, 1000L), Evt(1L, 2000L), Evt(1L, 9000L)
    ).toDS()
    val sessions = EventsStream.sessionize(ev, gapSecs = 1800).collect()
    assert(sessions.toSeq == Seq(graft.streaming.Session(1L, 1000L, 3000L, 3)))
  }

  test("sessionize across micro-batches: bounded state, stragglers become their own session") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Evt]
    val q = EventsStream
      .sessionize(input.toDS(), gapSecs = 1800)
      .writeStream
      .format("memory")
      .queryName("sess_ooo")
      .outputMode("append")
      .start()
    input.addData(Evt(1L, 1000L), Evt(1L, 4000L))
    q.processAllAvailable()
    input.addData(Evt(1L, 1200L), Evt(1L, 4300L)) // 1200 is a cross-batch straggler
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sess_ooo").as[graft.streaming.Session].collect().toSet
    // batch 1 closes (1000); batch 2: 4300 extends the open session (4000..4300),
    // the straggler 1200 cannot rejoin the already-emitted session — it closes alone
    assert(got == Set(
      graft.streaming.Session(1L, 1000L, 1000L, 1),
      graft.streaming.Session(1L, 1200L, 1200L, 1)))
  }

  test("sessionCounts: built-in session windows merge across batches, close at the watermark") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long)]
    val events = input.toDF()
      .select(col("_1").as("user_id"), timestamp_seconds(col("_2")).as("t"))
    val q = graft.streaming.EventsStream
      .sessionCounts(events, gap = "30 minutes", horizon = "10 minutes")
      .writeStream
      .format("memory")
      .queryName("sess_win")
      .outputMode("append")
      .start()
    input.addData((1L, 1000L), (1L, 1500L))
    q.processAllAvailable()
    input.addData((1L, 2000L)) // merges into the open session (gap < 30 min)
    q.processAllAvailable()
    input.addData((1L, 100000L)) // watermark sails past the session end -> emit
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sess_win").collect()
      .map(r =>
        (r.getAs[Long]("user_id"), r.getAs[Long]("session_start"),
          r.getAs[Long]("session_end"), r.getAs[Long]("n_events")))
      .toSet
    // one merged session 1000..2000+1800, all three events counted
    assert(got == Set((1L, 1000L, 3800L, 3L)), got.toString)
  }

  test("runningTotals (transformWithState): ValueState accumulates across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // the new arbitrary-state operator requires the RocksDB state store
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[graft.streaming.ValEvt]
      val q = graft.streaming.EventsStream
        .runningTotals(input.toDS())
        .writeStream
        .format("memory")
        .queryName("run_tot")
        .outputMode("update")
        .start()
      input.addData(graft.streaming.ValEvt(1L, 10L), graft.streaming.ValEvt(1L, 5L))
      q.processAllAvailable()
      input.addData(graft.streaming.ValEvt(1L, 7L), graft.streaming.ValEvt(2L, 3L))
      q.processAllAvailable()
      q.stop()
      val rows = spark.table("run_tot").as[graft.streaming.UserTotals].collect()
      val latest = rows.groupBy(_.user_id).view.mapValues(_.maxBy(_.n_events)).toMap
      assert(latest(1L) == graft.streaming.UserTotals(1L, 3L, 22L))
      assert(latest(2L) == graft.streaming.UserTotals(2L, 1L, 3L))
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("transitionStream: the cross-batch edge the batch lag-1 window cannot see") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[graft.streaming.TypedEvt]
      val q = graft.streaming.EventsStream
        .transitionStream(input.toDS())
        .writeStream
        .format("memory")
        .queryName("trans_stream")
        .outputMode("append")
        .start()
      import graft.streaming.{Transition, TypedEvt}
      // batch 1: user 1 view -> click (out-of-order arrival, sorted by ts)
      input.addData(TypedEvt(1L, 200L, 2L, "click"), TypedEvt(1L, 100L, 1L, "view"))
      q.processAllAvailable()
      // batch 2: user 1's purchase chains from batch 1's click (the
      // cross-batch edge); user 2 emits nothing on a single event
      input.addData(TypedEvt(1L, 300L, 3L, "purchase"), TypedEvt(2L, 50L, 4L, "view"))
      q.processAllAvailable()
      // batch 3: user 2's second event chains from state; user 1 gets a
      // LATE event (ts below the stored state) which must be dropped —
      // emitting it would chain time-backward and regress the state
      input.addData(TypedEvt(2L, 60L, 5L, "click"), TypedEvt(1L, 150L, 6L, "error"))
      q.processAllAvailable()
      // batch 4: user 1's next on-time event still chains from purchase,
      // proving the late event neither emitted nor regressed the state
      input.addData(TypedEvt(1L, 400L, 7L, "signup"))
      q.processAllAvailable()
      q.stop()
      val rows = spark.table("trans_stream").as[Transition].collect().toSet
      assert(rows === Set(
        Transition(1L, "view", "click", 200L),
        Transition(1L, "click", "purchase", 300L),
        Transition(2L, "view", "click", 60L),
        Transition(1L, "purchase", "signup", 400L)))
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("transitionStream TTL: an expired user re-chains from scratch, a live one keeps chaining") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[graft.streaming.TypedEvt]
      val q = graft.streaming.EventsStream
        .transitionStream(input.toDS(), ttlMs = 3000L)
        .writeStream
        .format("memory")
        .queryName("trans_ttl")
        .outputMode("append")
        .start()
      import graft.streaming.{Transition, TypedEvt}
      // the processing-time TimeMode keeps scheduling no-data batches to
      // service TTL, so `noNewData` never latches and processAllAvailable
      // would block forever — poll the sink instead (Spark's own TTL
      // suites avoid it via manual clocks for the same reason)
      def rows(): Set[Transition] = spark.table("trans_ttl").as[Transition].collect().toSet
      def await(cond: => Boolean, what: String): Unit = {
        val end = System.currentTimeMillis + 90000L
        while (!cond && System.currentTimeMillis < end) Thread.sleep(200L)
        assert(cond, s"timed out waiting for $what; rows=${rows()}")
      }
      input.addData(TypedEvt(1L, 100L, 1L, "view"))
      input.addData(TypedEvt(1L, 200L, 2L, "click"))
      // state alive within the TTL: the edge emits (cross-batch or in-batch)
      await(rows().contains(Transition(1L, "view", "click", 200L)), "view->click")
      // idle past the TTL: the cell is evicted
      Thread.sleep(7000L)
      // the expired user re-chains from scratch — the fresh event seeds
      // new state, proven by the NEXT edge emitting
      input.addData(TypedEvt(1L, 300L, 3L, "purchase"))
      input.addData(TypedEvt(1L, 400L, 4L, "signup"))
      await(rows().contains(Transition(1L, "purchase", "signup", 400L)), "purchase->signup")
      q.stop()
      // no stale click->purchase edge: the month-old context never chains
      assert(rows() === Set(
        Transition(1L, "view", "click", 200L),
        Transition(1L, "purchase", "signup", 400L)), rows().toString)
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("runningTotals TTL: an expired user restarts from zero, a live one keeps accumulating") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[graft.streaming.ValEvt]
      val q = graft.streaming.EventsStream
        .runningTotals(input.toDS(), ttlMs = 3000L)
        .writeStream
        .format("memory")
        .queryName("totals_ttl")
        .outputMode("update")
        .start()
      import graft.streaming.{UserTotals, ValEvt}
      // same polling discipline as the transitions TTL round: the
      // processing-time TimeMode never latches noNewData
      def rows(): Set[UserTotals] = spark.table("totals_ttl").as[UserTotals].collect().toSet
      def await(cond: => Boolean, what: String): Unit = {
        val end = System.currentTimeMillis + 90000L
        while (!cond && System.currentTimeMillis < end) Thread.sleep(200L)
        assert(cond, s"timed out waiting for $what; rows=${rows()}")
      }
      // one micro-batch: on a loaded box two separate batches can straddle
      // the 3 s TTL and the accumulated row would never appear (the
      // cross-batch accumulation path is already proven by the non-TTL
      // runningTotals round)
      input.addData(ValEvt(1L, 10L), ValEvt(1L, 5L))
      await(rows().contains(UserTotals(1L, 2L, 15L)), "running total 2/15")
      // idle past the TTL: the cell is evicted — the next event RESTARTS
      // the count (the documented forgetting semantics, not a bug)
      Thread.sleep(7000L)
      input.addData(ValEvt(1L, 7L))
      await(rows().contains(UserTotals(1L, 1L, 7L)), "post-expiry restart at 1/7")
      q.stop()
      assert(!rows().contains(UserTotals(1L, 3L, 22L)),
        s"an expired cell must not keep accumulating: ${rows()}")
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("heavyHitterStream: k-bounded emissions, heavy token never lost across batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, String)]
    val q = graft.streaming.EventsStream
      .heavyHitterStream(input.toDS(), k = 4)
      .writeStream
      .format("memory")
      .queryName("hh_stream")
      .outputMode("update")
      .start()
    input.addData(Seq.fill(30)(("chan", "hot")) ++ (1 to 10).map(i => ("chan", s"u$i")): _*)
    q.processAllAvailable()
    input.addData(Seq.fill(20)(("chan", "hot")) ++ (11 to 20).map(i => ("chan", s"v$i")): _*)
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("hh_stream").as[graft.streaming.TokCount].collect()
    assert(rows.length <= 2 * 4, "each batch emits at most k rows per key")
    // hot: true count 50 of N=70; with k=4 the undercount is bounded by ~N/k
    val hot = rows.filter(_.token == "hot").map(_.est).max
    assert(hot <= 50 && 50 - hot <= 18, s"hot est=$hot")
  }

  test("distinctSketchStream: live estimate equals the batch KMV sketch over the same prefix") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, String)]
    val q = graft.streaming.EventsStream
      .distinctSketchStream(input.toDS(), k = 8)
      .writeStream
      .format("memory")
      .queryName("kmv_stream")
      .outputMode("update")
      .start()
    val b1 = (0 until 5).map(i => ("small", s"u$i")) ++ (0 until 40).map(i => ("big", s"x$i"))
    val b2 = (3 until 7).map(i => ("small", s"u$i")) ++ (30 until 60).map(i => ("big", s"x$i"))
    input.addData(b1: _*)
    q.processAllAvailable()
    input.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    // latest emission per key (batch 2 re-emits updated keys)
    val rows = spark.table("kmv_stream").as[graft.streaming.KeyDistinct].collect()
    val latest = rows.groupBy(_.key).map { case (k2, rs) => k2 -> rs.last }
    // the stream's state must equal the one-pass batch sketch over b1 ++ b2
    val want = graft.ops.Stats
      .kmvDistinct((b1 ++ b2).toDF("event_type", "user_id"), "event_type", "user_id", k = 8)
      .collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("n_kept"), r.getAs[Long]("est_distinct"))))
      .toMap
    assert(latest("small").n_kept == want("small")._1 &&
      latest("small").est_distinct == want("small")._2)
    assert(latest("small").est_distinct == 7L) // 7 distinct users < k = 8: exact path
    assert(latest("big").n_kept == want("big")._1 &&
      latest("big").est_distinct == want("big")._2)
  }

  test("dedupeStream drops cross-batch duplicates within the watermark horizon") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long)]
    val events = input
      .toDF()
      .select(col("_1").as("event_id"), timestamp_seconds(col("_2")).as("t"))
    val q = EventsStream
      .dedupeStream(events, "event_id")
      .writeStream
      .format("memory")
      .queryName("dedup_stream")
      .outputMode("append")
      .start()
    input.addData((1L, 1000L), (2L, 1010L), (1L, 1020L)) // in-batch dup of 1
    q.processAllAvailable()
    input.addData((2L, 1030L), (3L, 1040L)) // cross-batch dup of 2
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("dedup_stream").select("event_id").as[Long].collect().sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L))
  }

  test("batch sessionization closes open sessions and matches the state-based split") {
    val s = spark
    import s.implicits._
    val ev = Seq(
      Evt(1L, 1000L), Evt(1L, 1500L), Evt(1L, 4000L),
      Evt(2L, 100L)
    ).toDS()
    val sessions = EventsStream
      .sessionizeBatch(ev, gapSecs = 1800)
      .collect()
      .map(r =>
        (r.getAs[Long]("user_id"), r.getAs[Long]("session_start"),
          r.getAs[Long]("session_end"), r.getAs[Int]("n_events")))
      .toSet
    assert(sessions == Set((1L, 1000L, 1500L, 2), (1L, 4000L, 4000L, 1), (2L, 100L, 100L, 1)))
  }

  test("kmvIngest: batch-bounded sketches, rollup == one-pass, retry idempotent, k pinned") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("kmv").toString
    val b1 = (0L until 20L).map(u => ("a", u)) ++ (0L until 3L).map(u => ("b", u))
    val b2 = (10L until 30L).map(u => ("a", u)) ++ Seq(("b", 3L))
    def addEvents(rows: Seq[(String, Long)]): Unit =
      rows.toDF("event_type", "user_id").write.mode("append").parquet(s"$dir/in")
    def run(): Unit =
      graft.streaming.SketchIngest
        .kmvIngest(
          spark.readStream.schema("event_type STRING, user_id LONG").parquet(s"$dir/in"),
          s"$dir/store",
          s"$dir/cp",
          "event_type",
          "user_id",
          k = 8)
        .awaitTermination()
    def rollup(): Map[String, (Long, Long)] =
      graft.ops.Stats.readKmvEstimate(spark, s"$dir/store", "event_type", k = 8)
        .collect()
        .map(r => r.getString(0) -> ((r.getAs[Long]("n_kept"), r.getAs[Long]("est_distinct"))))
        .toMap

    addEvents(b1)
    run()
    addEvents(b2)
    run()
    // per-batch sketch is k-bounded: at most k rows per group per batch
    val perBatch = spark.read.parquet(s"$dir/store/sketch")
      .groupBy("batch_id", "grp").count().collect()
    assert(perBatch.nonEmpty && perBatch.forall(_.getAs[Long]("count") <= 8))
    // rollup equals the one-pass sketch over everything ingested
    val want = graft.ops.Stats
      .kmvDistinct((b1 ++ b2).toDF("event_type", "user_id"), "event_type", "user_id", k = 8)
      .collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("n_kept"), r.getAs[Long]("est_distinct"))))
      .toMap
    val got = rollup()
    assert(got == want, s"rollup $got != one-pass $want")
    assert(got("b") == ((4L, 4L))) // below k: exact
    // a checkpoint-retried batch overwrites its own sketch: no drift
    graft.ops.Stats.ingestKmvBatch(
      b2.toDF("event_type", "user_id"), s"$dir/store", 1L, "event_type", "user_id", k = 8)
    assert(rollup() == got, "retried batch must be idempotent")
    // the store pins k: merging sketches of different k is refused
    val err = intercept[IllegalArgumentException] {
      graft.ops.Stats.ingestKmvBatch(
        b2.toDF("event_type", "user_id"), s"$dir/store", 2L, "event_type", "user_id", k = 16)
    }
    assert(err.getMessage.contains("k=8"))
    // a NEW stream lifecycle (batch 0) replaces the stale store even when
    // its first batch is EMPTY — old sketches must not leak into rollups —
    // and the claimed-but-empty store reads as empty, not as a crash
    graft.ops.Stats.ingestKmvBatch(
      Seq.empty[(String, Long)].toDF("event_type", "user_id"),
      s"$dir/store", 0L, "event_type", "user_id", k = 8)
    assert(rollup().isEmpty, "stale sketches survived a fresh batch-0 claim")
  }

  test("confusionIngest: folded cells == one-pass report, retry idempotent, columns pinned") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("conf").toString
    val b1 = Seq(("a", "a"), ("a", "b"), ("b", "b"))
    val b2 = Seq(("a", "a"), ("b", "a"), ("c", "c"))
    def addRows(rows: Seq[(String, String)]): Unit =
      rows.toDF("truth", "pred").write.mode("append").parquet(s"$dir/in")
    def run(): Unit =
      graft.streaming.SketchIngest
        .confusionIngest(
          spark.readStream.schema("truth STRING, pred STRING").parquet(s"$dir/in"),
          s"$dir/store",
          s"$dir/cp",
          "truth",
          "pred")
        .awaitTermination()
    def report() =
      graft.ops.Checks.readClassificationReport(spark, s"$dir/store")
        .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    addRows(b1)
    run()
    addRows(b2)
    run()
    val want = graft.ops.Checks
      .classificationReport((b1 ++ b2).toDF("truth", "pred"), "truth", "pred")
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    val got = report()
    assert(got === want, s"folded store $got != one-pass $want")
    // retried batch overwrites its own cells: no double counting
    graft.ops.Checks.ingestConfusionBatch(
      b2.toDF("truth", "pred"), s"$dir/store", 1L, "truth", "pred")
    assert(report() === got, "retried batch must be idempotent")
    // the store pins the label columns
    val err = intercept[IllegalArgumentException] {
      graft.ops.Checks.ingestConfusionBatch(
        b2.toDF("other", "pred"), s"$dir/store", 2L, "other", "pred")
    }
    assert(err.getMessage.contains("pins"))
  }

  test("cmsIngest: summed batch counters == one-pass sketch, retry idempotent, depth pinned") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cms").toString
    val b1 = Seq.fill(5)("a") ++ Seq.fill(2)("b") ++ (0 until 30).map(i => s"x$i")
    val b2 = Seq.fill(3)("a") ++ Seq("b", "c") ++ (0 until 20).map(i => s"y$i")
    def addValues(rows: Seq[String]): Unit =
      rows.toDF("v").write.mode("append").parquet(s"$dir/in")
    def run(): Unit =
      graft.streaming.SketchIngest
        .cmsIngest(
          spark.readStream.schema("v STRING").parquet(s"$dir/in"),
          s"$dir/store",
          s"$dir/cp",
          "v",
          depth = 4)
        .awaitTermination()
    def estimates(): Map[String, Long] =
      graft.ops.Stats.readCmsEstimate(spark, s"$dir/store", (b1 ++ b2).toDF("v"), "v")
        .collect()
        .map(r => r.getString(0) -> r.getAs[Long]("est_count"))
        .toMap

    addValues(b1)
    run()
    addValues(b2)
    run()
    // each batch's counter table is depth-bounded regardless of cardinality
    val perBatch = spark.read.parquet(s"$dir/store/sketch")
      .groupBy("batch_id").count().collect()
    assert(perBatch.length == 2 && perBatch.forall(_.getAs[Long]("count") <= 4 * 256))
    // linearity: the rollup equals querying the one-pass whole-stream sketch
    val whole = graft.ops.Stats
      .cmsQuery(
        graft.ops.Stats.cmsBuild((b1 ++ b2).toDF("v"), "v", depth = 4),
        (b1 ++ b2).toDF("v"),
        "v")
      .collect()
      .map(r => r.getString(0) -> r.getAs[Long]("est_count"))
      .toMap
    val got = estimates()
    assert(got == whole, s"rollup $got != one-pass $whole")
    assert(got("a") == 8L && got("b") == 3L && got("c") == 1L) // collision-free draw
    // a checkpoint-retried batch overwrites its own counters: no double count
    graft.ops.Stats.ingestCmsBatch(b2.toDF("v"), s"$dir/store", 1L, "v", depth = 4)
    assert(estimates() == got, "retried batch must be idempotent")
    // the store pins depth: a mixed-depth rollup would undercount
    val err = intercept[IllegalArgumentException] {
      graft.ops.Stats.ingestCmsBatch(b2.toDF("v"), s"$dir/store", 2L, "v", depth = 2)
    }
    assert(err.getMessage.contains("depth=4"))
    // batch 0 claims: stale counters never leak into a new stream's rollup
    graft.ops.Stats.ingestCmsBatch(Seq.empty[String].toDF("v"), s"$dir/store", 0L, "v", depth = 4)
    assert(estimates().forall(_._2 == 0L), "stale counters survived a fresh batch-0 claim")
  }
}
