package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}
import graft.queries.CoreQueries

class StreamingSpec extends SparkSpec {

  import spark.implicits._

  /** events.parquet copied into a directory (readStream wants a dir). */
  lazy val streamDir: String = {
    val dir = Files.createTempDirectory("graft-events-stream")
    Files.copy(Paths.get(s"$sf001/events.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    dir.toString
  }

  test("streaming windowed agg == batch windowed agg (same transform)") {
    val stream = Streaming.windowedCounts(Streaming.eventsStream(spark, streamDir))
    val q = stream.writeStream
      .format("memory").queryName("win_out").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("win_out")
      .orderBy(col("w_start"), col("event_type")).collect()
    val expected = CoreQueries.qEventsTimeWindow(spark, sf001).collect()
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (g, e) =>
      assert(g.getTimestamp(0) == e.getTimestamp(0))
      assert(g.getString(1) == e.getString(1))
      assert(g.getLong(2) == e.getLong(2))
      assert(math.abs(g.getDouble(3) - e.getDouble(3)) < 1e-6)
    }
  }

  test("streaming windowed approx users == batch; sketch within rsd of exact") {
    val stream = Streaming.windowedApproxUsers(Streaming.eventsStream(spark, streamDir))
    val q = stream.writeStream
      .format("memory").queryName("users_out").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("users_out")
      .orderBy(col("w_start"), col("event_type")).collect()
    // HLL register-merge is order-insensitive → stream must equal the
    // batch run of the SAME transform bit-for-bit
    val batch = Streaming.windowedApproxUsers(Tables.events(spark, sf001))
      .orderBy(col("w_start"), col("event_type")).collect()
    assert(got.map(_.toSeq).toSeq == batch.map(_.toSeq).toSeq,
      "stream and batch HLL estimates diverge")
    // and the sketch must sit within its error band of the exact tier
    val exact = graft.queries.CoreQueries.qEventsWindowUsers(spark, sf001)
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    got.foreach { r =>
      val key = (r.getTimestamp(0), r.getString(1))
      val est = r.getLong(2).toDouble
      val ex = exact(key).toDouble
      assert(math.abs(est - ex) / math.max(ex, 1.0) < 0.10,
        s"window $key: estimate $est vs exact $ex")
    }
  }

  test("streaming windowed quantiles (KLL sketch state) within rank bound of exact per window") {
    val stream = Streaming.windowedQuantiles(Streaming.eventsStream(spark, streamDir))
    val q = stream.writeStream
      .format("memory").queryName("quant_out").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("quant_out")
      .orderBy(col("w_start"), col("event_type")).collect()
    // exact per-window order statistics from the batch table
    val exact = Tables.events(spark, sf001)
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sort_array(collect_list(col("value"))).as("vs"))
      .select(col("window.start"), col("event_type"), col("n"), col("vs"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) ->
        ((r.getLong(2), r.getSeq[Double](3)))).toMap
    assert(got.nonEmpty && got.length == exact.size)
    val eps = org.apache.datasketches.kll.KllSketch
      .getNormalizedRankError(graft.functions.KllSketch.DefaultK, false)
    def rankOf(sorted: Seq[Double], v: Double): Double =
      sorted.count(_ <= v).toDouble / sorted.length
    got.foreach { r =>
      val key = (r.getTimestamp(0), r.getString(1))
      val (n, vs) = exact(key)
      assert(r.getLong(2) == n, s"window $key: n ${r.getLong(2)} vs exact $n")
      Seq(0.5 -> r.getDouble(3), 0.9 -> r.getDouble(4)).foreach { case (p, est) =>
        assert(vs.contains(est), s"window $key p$p: $est not an input member")
        assert(math.abs(rankOf(vs, est) - p) <= 2 * eps + 1.0 / vs.length,
          s"window $key p$p: $est has exact rank ${rankOf(vs, est)}")
      }
    }
  }

  test("streaming windowed top-k == batch windowed top-k (heap state, same transform)") {
    val stream = Streaming.windowedTopK(Streaming.eventsStream(spark, streamDir))
    val q = stream.writeStream
      .format("memory").queryName("topk_out").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("topk_out")
      .orderBy(col("w_start"), col("rank")).collect()
    val expected = Streaming.windowedTopK(Tables.events(spark, sf001))
      .orderBy(col("w_start"), col("rank")).collect()
    assert(got.length == expected.length && got.nonEmpty)
    got.zip(expected).foreach { case (g, e) => assert(g == e, s"$g != $e") }
  }

  test("streaming heavy hitters (approx_top_k sketch state) == batch exact counts") {
    // maxItemsTracked (100) exceeds the event_type vocabulary (5), so
    // the frequent-items sketch stays in its exact phase: the streaming
    // state-store merge must produce the same counts as one batch pass
    def hh(df: org.apache.spark.sql.DataFrame) = df
      .select(col("event_type"))
      .agg(expr("approx_top_k(event_type, 5, 100)").as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.item").as("event_type"), col("e.count").as("n"))
    val q = hh(Streaming.eventsStream(spark, streamDir)).writeStream
      .format("memory").queryName("hh_out").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("hh_out")
      .orderBy(col("n").desc, col("event_type")).collect()
    val expected = hh(Tables.events(spark, sf001))
      .orderBy(col("n").desc, col("event_type")).collect()
    assert(got.nonEmpty && got.toSeq == expected.toSeq)
    // and the sketch counts are the TRUE counts (exact phase)
    val exact = Tables.events(spark, sf001).groupBy(col("event_type"))
      .count().orderBy(col("count").desc, col("event_type")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq.take(5)
    assert(got.map(r => (r.getString(0), r.getLong(1))).toSeq == exact)
  }

  test("streaming incremental curation: foreachBatch folds SketchState across trigger batches") {
    import graft.text.{Curation, Dedup}
    val minQ = graft.queries.DedupQueries.CurationMinQuality
    val off = graft.queries.DedupQueries.IdOffset
    val history = Tables.documents(spark, sf001).select(col("doc_id"), col("text"))
    val day0 = Curation.curateSketch(history, minQ, withAccounting = false)
    // two delta files: reversed docs (new content) and verbatim copies
    // of them at higher ids — whichever batch runs first claims the
    // content, the other batch's copy must die AGAINST THE FOLDED STATE
    // (cross-batch dedup is the property under test)
    val reversed = history.select((col("doc_id") + 4 * off).as("doc_id"),
      concat_ws(" ", reverse(Dedup.tokens(col("text")))).as("text"))
    val copies = reversed.select((col("doc_id") + off).as("doc_id"), col("text"))
    val dir = java.nio.file.Files.createTempDirectory("graft-inc-cur").toString
    reversed.coalesce(1).write.mode("append").parquet(dir)
    copies.coalesce(1).write.mode("append").parquet(dir)
    val schema = reversed.schema
    var state = day0.state
    val survivorIds = scala.collection.mutable.ArrayBuffer.empty[Long]
    var batches = 0
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
      .writeStream.foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val r = Curation.incrementalCurate(state, df, minQ, withAccounting = false)
        survivorIds ++= r.survivors.select("doc_id").collect().map(_.getLong(0))
        state = r.state
        batches += 1
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    assert(batches >= 2, s"expected multiple trigger batches, got $batches")
    // exactly ONE survivor per reversed content across all batches
    // (order-insensitive: either the reversed doc or its copy)
    val expectedContents = reversed
      .join(day0.survivors.select((col("doc_id") + 4 * off).as("doc_id")), Seq("doc_id"), "left_semi")
      .select(sha2(col("text"), 256)).collect().map(_.getString(0)).toSet
    val gotContents = survivorIds.map { id =>
      val base = if (id >= 5 * off) id - 5 * off else id - 4 * off
      base
    }
    assert(gotContents.distinct.size == gotContents.size,
      "a content survived in more than one batch — state did not fold")
    assert(survivorIds.nonEmpty && gotContents.toSet.subsetOf(
      history.select("doc_id").collect().map(_.getLong(0)).toSet))
    // the folded state covers day0 + all streaming survivors
    val stateIds = state.sets.select("doc_id").collect().map(_.getLong(0)).toSet
    val day0Ids = day0.survivors.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(stateIds == day0Ids ++ survivorIds)
    assert(expectedContents.nonEmpty) // fixture sanity
  }

  test("streaming blocklist gate: policy screen chains into the curation fold; flagged docs never enter state") {
    import graft.text.{Curation, Dedup}
    val minQ = graft.queries.DedupQueries.CurationMinQuality
    val off = graft.queries.DedupQueries.IdOffset
    val phrases = graft.queries.QualityQueries.BlockPhrases
    val history = Tables.documents(spark, sf001).select(col("doc_id"), col("text"))
    val day0 = Curation.curateSketch(history, minQ, withAccounting = false)
    // two delta files of otherwise-survivable NEW content (reversed /
    // sorted token orders — distinct from history and from each other
    // at trigram grain); docs with even BASE id carry a banned phrase
    // and must be dropped by the screen, not by dedup (their clean
    // variant never exists anywhere)
    def poisonEven(base: org.apache.spark.sql.Column, text: org.apache.spark.sql.Column,
        phrase: String) =
      when(base % 2 === 0, concat(lit(phrase + " "), text)).otherwise(text)
    val file1 = history.select((col("doc_id") + 4 * off).as("doc_id"),
      poisonEven(col("doc_id"),
        concat_ws(" ", reverse(Dedup.tokens(col("text")))), "hash join").as("text"))
    val file2 = history.select((col("doc_id") + 6 * off).as("doc_id"),
      poisonEven(col("doc_id"),
        concat_ws(" ", sort_array(Dedup.tokens(col("text")))), "slow scan").as("text"))
    val dir = Files.createTempDirectory("graft-blk-cur").toString
    val schema = file1.schema
    var state = day0.state
    val byBatch = scala.collection.mutable.ArrayBuffer.empty[Set[Long]]
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
      .writeStream.foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val r = Curation.screenedIncrementalCurate(state, df, phrases, minQ,
          withAccounting = false)
        byBatch += r.survivors.select("doc_id").collect().map(_.getLong(0)).toSet
        state = r.state
        ()
      }.start()
    try {
      file1.coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
      file2.coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()
    assert(byBatch.size == 2, s"expected 2 trigger batches, got ${byBatch.size}")
    val survivors = byBatch.flatten.toSet
    assert(survivors.nonEmpty)
    // (a) the policy gate held: only odd-base (clean) ids survive
    assert(survivors.forall(id => id % 2 == 1), "a flagged doc survived the screen")
    // (b) flagged docs never entered the folded state
    val stateIds = state.sets.select("doc_id").collect().map(_.getLong(0)).toSet
    val day0Ids = day0.survivors.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(stateIds == day0Ids ++ survivors)
    // (c) replay equivalence: the stream fold == the sequential batch
    // twin over the same files in trigger order
    val r1 = Curation.screenedIncrementalCurate(day0.state, file1, phrases,
      minQ, withAccounting = false)
    val r2 = Curation.screenedIncrementalCurate(r1.state, file2, phrases,
      minQ, withAccounting = false)
    assert(byBatch(0) == r1.survivors.select("doc_id").collect().map(_.getLong(0)).toSet)
    assert(byBatch(1) == r2.survivors.select("doc_id").collect().map(_.getLong(0)).toSet)
    // fixture sanity: both files actually carried flagged docs
    assert(graft.text.Blocklist.screen(file1.unionByName(file2),
      "doc_id", "text", phrases).filter(!col("keep")).count() > 0)
  }

  test("train-arrival streaming containment: batches screen against the frozen probe and fold slicing-independently") {
    import graft.text.{Curation, Dedup}
    // frozen eval probe: synthetic benchmark docs over a NOVEL
    // vocabulary, so only deliberate embeddings can clear containment
    // and the assertions are exact
    val probe = (1 to 6).map(p =>
      (1000L + p, (1 to 12).map(t => s"bench${p}t$t").mkString(" ")))
      .toDF("doc_id", "text").localCheckpoint(true)
    val history = Tables.documents(spark, sf001)
      .filter(col("doc_id") % 2 === 0).select(col("doc_id"), col("text"))
    val index0 = Dedup.literalShingleFrame(history, 3, "train_id")
      .localCheckpoint(true)
    // batch files: clean new train docs (reversed / sorted token
    // orders) plus EMBEDDING hosts — probe docs spliced inside novel
    // filler, one per probe doc, split across the two batches
    def host(p: Int, id: Long) =
      (id, s"lead${id}a lead${id}b lead${id}c " +
        (1 to 12).map(t => s"bench${p}t$t").mkString(" ") +
        s" tail${id}a tail${id}b")
    val off = graft.queries.DedupQueries.IdOffset
    val clean1 = history.select((col("doc_id") + 4 * off).as("doc_id"),
      concat_ws(" ", reverse(Dedup.tokens(col("text")))).as("text"))
    val file1 = clean1.unionByName(
      Seq(host(1, 4 * off - 1), host(2, 4 * off - 2), host(3, 4 * off - 3))
        .toDF("doc_id", "text"))
    val clean2 = history.select((col("doc_id") + 6 * off).as("doc_id"),
      concat_ws(" ", sort_array(Dedup.tokens(col("text")))).as("text"))
    val file2 = clean2.unionByName(
      Seq(host(4, 6 * off - 1), host(5, 6 * off - 2), host(6, 6 * off - 3))
        .toDF("doc_id", "text"))
    val dir = Files.createTempDirectory("graft-train-contain").toString
    val schema = file1.schema
    var state = index0
    val verdictsByBatch = scala.collection.mutable.ArrayBuffer.empty[Set[(Long, Long)]]
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
      .writeStream.foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val (v, next) = Curation.screenedTrainShingleFold(state, df, probe)
        verdictsByBatch += v.select("eval_id", "train_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        state = next.localCheckpoint(true)
        ()
      }.start()
    try {
      file1.coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
      file2.coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()
    assert(verdictsByBatch.size == 2, s"expected 2 batches, got ${verdictsByBatch.size}")
    // (a) every planted embedding flagged WITH its probe source, and
    // nothing else (novel probe vocabulary -> no accidental flags);
    // batch 2's plants prove the probe stays frozen across the fold
    assert(verdictsByBatch(0) ==
      Set((1001L, 4 * off - 1), (1002L, 4 * off - 2), (1003L, 4 * off - 3)))
    assert(verdictsByBatch(1) ==
      Set((1004L, 6 * off - 1), (1005L, 6 * off - 2), (1006L, 6 * off - 3)))
    // (b) flagged hosts never entered the folded index; clean docs did
    val stateIds = state.select("train_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(verdictsByBatch.flatten.forall { case (_, t) => !stateIds.contains(t) })
    // (c) slicing independence: the folded index equals the ONE-SHOT
    // fold over the concatenated delta, as a set
    val (_, oneShot) = Curation.screenedTrainShingleFold(
      index0, file1.unionByName(file2), probe)
    assert(state.exceptAll(oneShot).count() == 0L &&
      oneShot.exceptAll(state).count() == 0L)
    // (d) the folded index serves: a later eval release screened
    // against it flags a clean-doc embedding... the probe docs
    // themselves are NOT in the index (their hosts were dropped), so
    // screening the probe against the folded index finds nothing
    assert(Dedup.containmentPairsFromIndex(probe, state).count() == 0L)
  }

  test("incremental curation crash recovery: restart from persisted state + checkpoint resumes identically") {
    // The claim a 100 TB continuous-ingest operator actually relies
    // on: kill the stream after batch N, start a NEW query from the
    // same checkpoint, reload SketchState from parquet, and batch N+1
    // produces EXACTLY what an uninterrupted run would have. State is
    // versioned by batchId so a replayed batch overwrites its own
    // version (idempotent commit, the foreachBatch exactly-once
    // recipe) instead of double-folding.
    import graft.text.{Curation, Dedup}
    val minQ = graft.queries.DedupQueries.CurationMinQuality
    val off = graft.queries.DedupQueries.IdOffset
    val history = Tables.documents(spark, sf001).select(col("doc_id"), col("text"))
    val day0 = Curation.curateSketch(history, minQ, withAccounting = false)

    // batch 0: reversed docs (genuinely new content — must survive);
    // batch 1: verbatim copies of batch 0 at higher ids — every copy
    // must die against batch 0's folded state ACROSS the restart
    val reversed = history.select((col("doc_id") + 4 * off).as("doc_id"),
      concat_ws(" ", reverse(Dedup.tokens(col("text")))).as("text"))
    val copies = reversed.select((col("doc_id") + off).as("doc_id"), col("text"))

    val inDir = Files.createTempDirectory("graft-crash-in").toString
    val ckpt = Files.createTempDirectory("graft-crash-ckpt").toString
    val stateRoot = Files.createTempDirectory("graft-crash-state").toString
    def writeState(st: Curation.SketchState, v: Long): Unit = {
      st.digests.write.mode("overwrite").parquet(s"$stateRoot/v$v/digests")
      st.bands.write.mode("overwrite").parquet(s"$stateRoot/v$v/bands")
      st.sets.write.mode("overwrite").parquet(s"$stateRoot/v$v/sets")
    }
    def latestStateVersion: Long =
      new java.io.File(stateRoot).listFiles().map(_.getName.drop(1).toLong).max
    def readState(v: Long): Curation.SketchState = Curation.SketchState(
      spark.read.parquet(s"$stateRoot/v$v/digests"),
      spark.read.parquet(s"$stateRoot/v$v/bands"),
      spark.read.parquet(s"$stateRoot/v$v/sets"))
    writeState(day0.state, 0L)

    val outByBatch = scala.collection.mutable.Map.empty[Long, Set[Long]]
    val schema = reversed.schema
    def startQuery() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, batchId: Long) =>
        // reload from DISK every trigger — nothing in-memory carries
        // over, so the restarted process exercises the same path
        val st = readState(latestStateVersion)
        val r = Curation.incrementalCurate(st, df, minQ, withAccounting = false)
        writeState(r.state, batchId + 1)
        outByBatch(batchId) =
          r.survivors.select("doc_id").collect().map(_.getLong(0)).toSet
        ()
      }.start()

    reversed.coalesce(1).write.mode("append").parquet(inDir)
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop() // CRASH after batch 0

    copies.coalesce(1).write.mode("append").parquet(inDir)
    val q2 = startQuery() // fresh query object, same checkpoint + state dir
    try q2.processAllAvailable() finally q2.stop()

    // the checkpoint must have skipped batch 0's file on restart
    assert(outByBatch.keySet == Set(0L, 1L), s"batches: ${outByBatch.keySet}")

    // twin: uninterrupted in-memory fold, no parquet, no restart
    val r1 = Curation.incrementalCurate(day0.state, reversed, minQ, withAccounting = false)
    val r2 = Curation.incrementalCurate(r1.state, copies, minQ, withAccounting = false)
    val want1 = r1.survivors.select("doc_id").collect().map(_.getLong(0)).toSet
    val want2 = r2.survivors.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(want1.nonEmpty) // fixture sanity: new content survives
    assert(outByBatch(0L) == want1)
    assert(outByBatch(1L) == want2)
    // every batch-1 verbatim copy died against the reloaded state
    assert(outByBatch(1L).intersect(want1.map(_ + off)).isEmpty)
    // final persisted state covers exactly the uninterrupted run's state
    val finalState = readState(latestStateVersion)
    assert(finalState.sets.select("doc_id").collect().map(_.getLong(0)).toSet ==
      r2.state.sets.select("doc_id").collect().map(_.getLong(0)).toSet)
    assert(finalState.digests.count() == r2.state.digests.count())
  }

  test("watermark drops nothing when all data is within horizon (single batch)") {
    val stream = Streaming.windowedCounts(
      Streaming.eventsStream(spark, streamDir), watermark = "1 minutes")
    val q = stream.writeStream
      .format("memory").queryName("win_wm").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val total = spark.table("win_wm").agg(sum("n")).head().getLong(0)
    assert(total == Tables.events(spark, sf001).count())
  }

  test("incremental ingest: second batch of files updates windowed aggregate state") {
    import java.nio.file.{Files => JFiles}
    val dir = JFiles.createTempDirectory("graft-incremental")
    val events = Tables.events(spark, sf001)
    // batch 1: first half by event_id; batch 2: second half
    events.filter(col("event_id") < 500)
      .write.mode("overwrite").parquet(dir.resolve("b1").toString)
    // stream over a glob dir: copy batch 1 in, start, then add batch 2
    val streamDir = JFiles.createTempDirectory("graft-incr-stream")
    def copyParquet(sub: String): Unit =
      JFiles.list(dir.resolve(sub)).forEach { p =>
        if (p.toString.endsWith(".parquet"))
          JFiles.copy(p, streamDir.resolve(s"$sub-${p.getFileName}"))
      }
    copyParquet("b1")
    // the stream reads micros timestamps (already converted by the
    // batch write above) — plain schema, no nanos conversion needed
    val stream = spark.readStream.schema(events.schema)
      .parquet(streamDir.toString)
    val agg = Streaming.windowedCounts(stream)
    val q = agg.writeStream.format("memory").queryName("incr")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val afterB1 = spark.table("incr").agg(sum("n")).head().getLong(0)
      assert(afterB1 == 500)
      events.filter(col("event_id") >= 500)
        .write.mode("overwrite").parquet(dir.resolve("b2").toString)
      copyParquet("b2")
      q.processAllAvailable()
      val afterB2 = spark.table("incr").agg(sum("n")).head().getLong(0)
      assert(afterB2 == events.count(), "state must absorb the second batch")
    } finally q.stop()
  }

  test("sessionization: late cross-trigger event never moves session_end backward") {
    import java.nio.file.{Files => JFiles}
    import java.sql.Timestamp
    import spark.implicits._
    val dir = JFiles.createTempDirectory("graft-late")
    def write(sub: String, rows: Seq[Streaming.Event]): Unit =
      rows.toDS().write.parquet(dir.resolve(sub).toString)
    def ts(s: String) = Timestamp.valueOf(s)
    // trigger 1: events at 10:00; trigger 2: a LATE 9:58 event plus 10:04
    write("b1", Seq(Streaming.Event(1L, ts("2024-01-01 10:00:00"), 7L, "view", 1.0)))
    val streamDir = JFiles.createTempDirectory("graft-late-stream")
    // copy to a temp name, then atomically rename into the watched dir:
    // the running query polls continuously, so a plain copy can expose
    // a half-visible logical batch split across micro-batches
    def copy(sub: String): Unit =
      JFiles.list(dir.resolve(sub)).forEach { p =>
        if (p.toString.endsWith(".parquet")) {
          val tmp = streamDir.resolve(s".tmp-$sub-${p.getFileName}")
          JFiles.copy(p, tmp)
          JFiles.move(tmp, streamDir.resolve(s"$sub-${p.getFileName}"),
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        }
      }
    copy("b1")
    val events = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[Streaming.Event]].schema)
      .parquet(streamDir.toString).as[Streaming.Event]
    val q = Streaming.sessionize(events, gapMinutes = 5)
      .writeStream.format("memory").queryName("late_sessions")
      .outputMode("update").start()
    try {
      q.processAllAvailable()
      write("b2", Seq(
        Streaming.Event(2L, ts("2024-01-01 09:58:00"), 7L, "view", 1.0),
        Streaming.Event(3L, ts("2024-01-01 10:04:00"), 7L, "view", 1.0)))
      copy("b2")
      q.processAllAvailable()
      // 9:58 extends the 10:00 session backward; 10:04 is within gap of
      // 10:00 (NOT of 9:58) — one continuous session of 3 events. The
      // two b2 part files may straddle micro-batches (the source polls
      // continuously), so intermediate 2-event emissions can precede
      // the final form in the update-mode sink — assert on the
      // max-n_events emission, which is the final merged session under
      // every interleaving, and that no emission ever ends later.
      val s = spark.table("late_sessions")
        .orderBy(org.apache.spark.sql.functions.col("n_events").desc)
        .head()
      assert(s.getInt(3) == 3, s"expected one 3-event session, got $s")
      assert(s.getTimestamp(1) == ts("2024-01-01 09:58:00"))
      assert(s.getTimestamp(2) == ts("2024-01-01 10:04:00"))
      val maxEnd = spark.table("late_sessions")
        .agg(org.apache.spark.sql.functions.max("session_end")).head().getTimestamp(0)
      assert(maxEnd == ts("2024-01-01 10:04:00"),
        s"no emission may end after the true session end, got $maxEnd")
    } finally q.stop()
  }

  test("sessionization replay equivalence: multi-trigger streaming == batch, ALL sessions") {
    // Feed the whole sf0.001 events fixture in three ts-ordered trigger
    // batches and accumulate every update-mode emission. In-order feeding
    // means a session's start never moves once created, so (user, start)
    // identifies a session and its LAST emission (max n_events) is its
    // final form — the full set must equal the batch twin's output,
    // session for session (not just the last session per user, which the
    // spec above already pins).
    import java.nio.file.{Files => JFiles}
    import spark.implicits._
    val all = Tables.events(spark, sf001)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Streaming.Event].collect().sortBy(_.ts.getTime)
    val chunks = all.grouped((all.length + 2) / 3).toSeq
    val dir = JFiles.createTempDirectory("graft-replay")
    val streamDir = JFiles.createTempDirectory("graft-replay-stream")
    val events = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[Streaming.Event]].schema)
      .parquet(streamDir.toString).as[Streaming.Event]
    val q = Streaming.sessionizeAll(events, gapMinutes = 30)
      .writeStream.format("memory").queryName("replay_sessions")
      .outputMode("update").start()
    try {
      chunks.zipWithIndex.foreach { case (chunk, i) =>
        chunk.toSeq.toDS().write.parquet(dir.resolve(s"b$i").toString)
        JFiles.list(dir.resolve(s"b$i")).forEach { p =>
          if (p.toString.endsWith(".parquet"))
            JFiles.copy(p, streamDir.resolve(s"b$i-${p.getFileName}"))
        }
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = spark.table("replay_sessions").collect()
      .groupBy(r => (r.getLong(0), r.getTimestamp(1)))
      .map { case (_, rows) => rows.maxBy(_.getInt(3)) }
      .map(r => (r.getLong(0), r.getTimestamp(1)) ->
        ((r.getTimestamp(2), r.getInt(3).toLong, r.getDouble(4))))
      .toMap
    val batch = Streaming.sessionizeBatch(Tables.events(spark, sf001), gapMinutes = 30)
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(3)) ->
        ((r.getTimestamp(4), r.getLong(2), r.getDouble(5))))
      .toMap
    assert(streamed.keySet == batch.keySet,
      s"session sets differ: ${streamed.keySet.size} streamed vs ${batch.keySet.size} batch")
    streamed.foreach { case (k, (end, n, sumV)) =>
      val (bEnd, bN, bSum) = batch(k)
      assert(end == bEnd && n == bN, s"session $k: ($end,$n) vs ($bEnd,$bN)")
      assert(math.abs(sumV - bSum) < 1e-6, s"session $k sum: $sumV vs $bSum")
    }
  }

  /** File-source feeder: write each trigger's events as parquet, copy
    * into the watched dir, processAllAvailable — one batch per call. */
  private final class Feeder {
    import java.nio.file.{Files => JFiles}
    private val src = JFiles.createTempDirectory("graft-feed-src")
    val watchDir: String = JFiles.createTempDirectory("graft-feed").toString
    private var n = 0
    def feed(q: org.apache.spark.sql.streaming.StreamingQuery,
        rows: Seq[Streaming.Event]): Unit = {
      import spark.implicits._
      n += 1
      rows.toDS().write.parquet(Paths.get(src.toString, s"b$n").toString)
      JFiles.list(src.resolve(s"b$n")).forEach { p =>
        if (p.toString.endsWith(".parquet"))
          JFiles.copy(p, Paths.get(watchDir, s"b$n-${p.getFileName}"))
      }
      q.processAllAvailable()
    }
  }

  private def eventStream(dir: String) = spark.readStream
    .schema(implicitly[org.apache.spark.sql.Encoder[Streaming.Event]].schema)
    .parquet(dir).as[Streaming.Event](
      implicitly[org.apache.spark.sql.Encoder[Streaming.Event]])

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("session merge helpers: a late bridge event fuses two stored sessions") {
    // stored: [10:00,10:01] n2 and [10:20,10:21] n2 (gap 15 apart > 15?
    // 10:20-10:01 = 19 min > 15 → separate); a bridge event at 10:10
    // is within 15 min of BOTH — all three must fuse into one session
    val gapMs = 15L * 60000L
    val stored = List(
      Streaming.UserSession(7L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:01:00"), 2, 2.0),
      Streaming.UserSession(7L, ts("2024-01-01 10:20:00"), ts("2024-01-01 10:21:00"), 2, 2.0))
    val bridge = Streaming.gapSessions(7L,
      Seq(Streaming.Event(9L, ts("2024-01-01 10:10:00"), 7L, "view", 5.0)), gapMs)
    val merged = Streaming.mergeByGap(stored ::: bridge, gapMs)
    assert(merged.length == 1)
    assert(merged.head.session_start == ts("2024-01-01 10:00:00"))
    assert(merged.head.session_end == ts("2024-01-01 10:21:00"))
    assert(merged.head.n_events == 5)
    assert(math.abs(merged.head.sum_value - 9.0) < 1e-9)
  }

  test("session_window-native stream: out-of-order + duplicate replay across 4 triggers == batch twin") {
    import spark.implicits._
    // gap 15 min, watermark 10 min. Adversarial schedule:
    //  t1: user 7 at 10:00 & 10:05 (with an in-batch duplicate of id 1);
    //      user 8 at 10:03
    //  t2: LATE 10:02 for user 7 (within horizon: wm after t1 = 9:55),
    //      a cross-trigger re-delivery of id 1 (10:00 ≥ wm → passes the
    //      late filter, must die in dedup state), and 10:30 for user 7
    //      (25 min > gap ⇒ second session)
    //  t3: late 10:06 for user 8 (wm after t2 = 10:20... 10:06 < wm ⇒
    //      DROPPED as late — asserted absent), 10:32 for user 8
    //  t4: watermark-advancing flush event (user 999) at 12:00 ⇒ wm
    //      11:50 seals every real session ⇒ append emits them all
    val gap = 15L
    def ev(id: Long, t: String, u: Long, v: Double) =
      Streaming.Event(id, ts(t), u, "view", v)
    val t1 = Seq(ev(1, "2024-01-01 10:00:00", 7, 1.0),
      ev(1, "2024-01-01 10:00:00", 7, 1.0), // in-batch duplicate
      ev(2, "2024-01-01 10:05:00", 7, 2.0),
      ev(3, "2024-01-01 10:03:00", 8, 3.0))
    val t2 = Seq(ev(4, "2024-01-01 10:02:00", 7, 4.0), // late, in horizon
      ev(1, "2024-01-01 10:00:00", 7, 1.0),            // re-delivery
      ev(5, "2024-01-01 10:30:00", 7, 5.0))            // new session
    val t3 = Seq(ev(6, "2024-01-01 10:06:00", 8, 6.0), // behind wm: dropped
      ev(7, "2024-01-01 10:32:00", 8, 7.0))
    val t4 = Seq(ev(999, "2024-01-01 12:00:00", 999, 0.0)) // flush
    val feeder = new Feeder
    val q = Streaming.sessionWindowStream(
        eventStream(feeder.watchDir).toDF(), gapMinutes = gap,
        watermark = "10 minutes")
      .writeStream.format("memory").queryName("swn_sessions")
      .outputMode("append").start()
    try Seq(t1, t2, t3, t4).foreach(feeder.feed(q, _)) finally q.stop()
    val got = spark.table("swn_sessions")
      .filter(col("user_id") =!= 999L).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3), r.getDouble(4))).toSet
    // batch twin: the same NATIVE session_window aggregation over the
    // surviving event set (duplicates deduped by id; event 6 dropped by
    // the watermark — the documented bounded-state trade)
    // all re-deliveries are identical case-class instances ⇒ one
    // .distinct dedups them exactly as the id-keyed stream state does
    val survivors = (t1 ++ t2 ++ t3).distinct.filterNot(_.event_id == 6)
    val want = survivors.toDS().toDF()
      .groupBy(col("user_id"), session_window(col("ts"), s"$gap minutes"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("user_id"), col("session_window.start"),
        col("session_window.end"), col("n_events"), col("sum_value"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3), r.getDouble(4))).toSet
    assert(got == want, s"streamed:\n  ${got.mkString("\n  ")}\nbatch:\n  ${want.mkString("\n  ")}")
    // structural spot checks: user 7's first session fused the late
    // 10:02 into [10:00, 10:05+gap) with 3 distinct events (duplicate
    // re-delivery did NOT inflate the count)
    val u7first = got.filter(s => s._1 == 7L && s._2 == ts("2024-01-01 10:00:00"))
    assert(u7first.size == 1 && u7first.head._4 == 3L, s"user 7 first session: $u7first")
    assert(got.count(_._1 == 7L) == 2, "user 7 must have exactly 2 sessions")
    assert(!got.exists(s => s._1 == 8L && s._4 > 1L &&
      s._2 == ts("2024-01-01 10:03:00") && s._5 == 9.0),
      "event 6 behind the watermark must not reach user 8's session")
  }

  test("sessionizeAll: a late event beyond the gap opens its own session, never rewrites the open one") {
    val feeder = new Feeder
    val q = Streaming.sessionizeAll(eventStream(feeder.watchDir),
        gapMinutes = 5, watermark = "36500 days")
      .writeStream.format("memory").queryName("late_own_session")
      .outputMode("update").start()
    try {
      feeder.feed(q, Seq(Streaming.Event(1L, ts("2024-01-01 10:00:00"), 7L, "view", 1.0)))
      // 20 min BEFORE the open session's start (> 5 min gap): must come
      // out as its own closed-interval session, not a start rewrite
      feeder.feed(q, Seq(Streaming.Event(2L, ts("2024-01-01 09:40:00"), 7L, "view", 1.0)))
    } finally q.stop()
    val got = spark.table("late_own_session").collect()
      .map(r => (r.getTimestamp(1), r.getTimestamp(2), r.getInt(3))).toSet
    assert(got == Set(
      (ts("2024-01-01 10:00:00"), ts("2024-01-01 10:00:00"), 1),
      (ts("2024-01-01 09:40:00"), ts("2024-01-01 09:40:00"), 1)),
      s"late event must not rewrite the open session: $got")
  }

  test("sessionizeAll out-of-order replay: shuffled triggers compact to the batch sessions") {
    import spark.implicits._
    val all = Tables.events(spark, sf001)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Streaming.Event].collect().toVector
    val shuffled = new scala.util.Random(42).shuffle(all)
    val feeder = new Feeder
    // huge watermark delay: nothing is late-dropped or evicted, so the
    // arbitrary arrival order exercises pure merge logic
    val q = Streaming.sessionizeAll(eventStream(feeder.watchDir),
        gapMinutes = 30, watermark = "36500 days")
      .writeStream.format("memory").queryName("shuffled_sessions")
      .outputMode("update").start()
    try shuffled.grouped((shuffled.length + 3) / 4)
      .foreach(chunk => feeder.feed(q, chunk))
    finally q.stop()
    // compact update-mode emissions: merging only grows a session, so an
    // emission is superseded by any same-user emission that contains its
    // interval with more events (the documented downstream contract)
    val rows = spark.table("shuffled_sessions").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime,
        r.getTimestamp(2).getTime, r.getInt(3), r.getDouble(4))).distinct
    val finals = rows.groupBy(_._1).values.flatMap { es =>
      es.filterNot(e => es.exists(f =>
        f._2 <= e._2 && f._3 >= e._3 && f._4 > e._4))
    }.toVector
    val streamedKeys = finals.map(f => (f._1, f._2, f._3, f._4.toLong)).toSet
    val streamedSums = finals.map(f => (f._1, f._2) -> f._5).toMap
    val batch = Streaming.sessionizeBatch(Tables.events(spark, sf001), gapMinutes = 30)
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(3).getTime,
        r.getTimestamp(4).getTime, r.getLong(2), r.getDouble(5)))
    assert(streamedKeys == batch.map(b => (b._1, b._2, b._3, b._4)).toSet,
      s"${streamedKeys.size} compacted streaming sessions vs ${batch.length} batch")
    batch.foreach { b =>
      // double addition order differs between merge order and batch sum
      assert(math.abs(streamedSums((b._1, b._2)) - b._5) < 1e-6)
    }
  }

  test("sessionizeAll event-time eviction: an idle session emits its closure record") {
    val feeder = new Feeder
    val q = Streaming.sessionizeAll(eventStream(feeder.watchDir),
        gapMinutes = 5, watermark = "1 minute")
      .writeStream.format("memory").queryName("evict_sessions")
      .outputMode("update").start()
    try {
      feeder.feed(q, Seq(Streaming.Event(1L, ts("2024-01-01 10:00:00"), 7L, "view", 1.0)))
      // other-user traffic pushes the watermark far past 10:05 (= user
      // 7's session_end + gap); the next trigger must evict user 7's
      // idle session via EventTimeTimeout, re-emitting its final form
      feeder.feed(q, Seq(Streaming.Event(2L, ts("2024-01-01 12:00:00"), 99L, "view", 1.0)))
      feeder.feed(q, Seq(Streaming.Event(3L, ts("2024-01-01 12:01:00"), 99L, "view", 1.0)))
    } finally q.stop()
    val user7 = spark.table("evict_sessions")
      .filter(col("user_id") === 7L).collect()
    assert(user7.length == 2,
      s"expected open emission + closure record, got ${user7.toSeq}")
    user7.foreach { r =>
      assert(r.getTimestamp(1) == ts("2024-01-01 10:00:00"))
      assert(r.getTimestamp(2) == ts("2024-01-01 10:00:00"))
      assert(r.getInt(3) == 1)
    }
  }

  test("sessionize event-time eviction: idle user's state evicts, emitting the final session") {
    val feeder = new Feeder
    val q = Streaming.sessionize(eventStream(feeder.watchDir),
        gapMinutes = 5, watermark = "1 minute")
      .writeStream.format("memory").queryName("evict_map_sessions")
      .outputMode("update").start()
    try {
      feeder.feed(q, Seq(Streaming.Event(1L, ts("2024-01-01 10:00:00"), 7L, "view", 1.0)))
      feeder.feed(q, Seq(Streaming.Event(2L, ts("2024-01-01 12:00:00"), 99L, "view", 1.0)))
      feeder.feed(q, Seq(Streaming.Event(3L, ts("2024-01-01 12:01:00"), 99L, "view", 1.0)))
    } finally q.stop()
    val user7 = spark.table("evict_map_sessions")
      .filter(col("user_id") === 7L).collect()
    assert(user7.length == 2,
      s"expected trigger-1 emission + timeout emission, got ${user7.toSeq}")
    user7.foreach(r => assert(r.getInt(3) == 1 &&
      r.getTimestamp(1) == ts("2024-01-01 10:00:00")))
  }

  test("stream-stream attribution join emits exactly the batch pair set") {
    import java.nio.file.{Files => JFiles}
    val ev = Tables.events(spark, sf001)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
    val clicksB = ev.filter(col("event_type") === "click")
    val purchB = ev.filter(col("event_type") === "purchase")
    val cDir = JFiles.createTempDirectory("graft-attr-clicks")
    val pDir = JFiles.createTempDirectory("graft-attr-purch")
    clicksB.write.mode("overwrite").parquet(cDir.toString)
    purchB.write.mode("overwrite").parquet(pDir.toString)
    val q = Streaming.attributionPairs(
        spark.readStream.schema(clicksB.schema).parquet(cDir.toString),
        spark.readStream.schema(purchB.schema).parquet(pDir.toString))
      .writeStream.format("memory").queryName("attr_pairs")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("attr_pairs").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // the SAME transform over the batch frames (watermarks are no-ops)
    val batch = Streaming.attributionPairs(clicksB, purchB).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch.nonEmpty, "fixture must produce attribution pairs")
    assert(streamed == batch,
      s"${streamed.size} streamed pairs vs ${batch.size} batch pairs")
  }

  test("stream-stream interval match emits exactly the batch IntervalJoin pair set") {
    import java.nio.file.{Files => JFiles}
    val ev = Tables.events(spark, sf001)
      .select(col("event_id"), col("event_type"), col("ts"))
    val incB = ev.filter(col("event_type") === "error")
    val pDir = JFiles.createTempDirectory("graft-iv-probe")
    val iDir = JFiles.createTempDirectory("graft-iv-inc")
    ev.write.mode("overwrite").parquet(pDir.toString)
    incB.write.mode("overwrite").parquet(iDir.toString)
    val q = Streaming.intervalMatches(
        spark.readStream.schema(ev.schema).parquet(pDir.toString),
        spark.readStream.schema(incB.schema).parquet(iDir.toString))
      .writeStream.format("memory").queryName("iv_pairs")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("iv_pairs").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // same transform over the batch frames (watermarks are no-ops)
    val batch = Streaming.intervalMatches(ev, incB).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // and the batch operator itself, its own exploded-bucket plan
    val opPairs = graft.ops.IntervalJoin.overlap(
        ev.select(col("event_id"), unix_micros(col("ts")).as("t_us")),
        "t_us",
        incB.select(col("event_id").as("incident_id"),
          unix_micros(col("ts")).as("start_us"),
          (unix_micros(col("ts")) + lit(600000000L)).as("end_us")),
        "start_us", "end_us", Nil, bucketWidth = 600000000L)
      .select(col("incident_id"), col("event_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(opPairs.nonEmpty, "fixture must produce interval matches")
    assert(streamed == batch,
      s"${streamed.size} streamed pairs vs ${batch.size} batch-transform pairs")
    assert(streamed == opPairs,
      s"${streamed.size} streamed pairs vs ${opPairs.size} IntervalJoin pairs")
  }

  test("streaming PSI counts: finalize(accumulated state) == the batch PSI frame") {
    import java.nio.file.{Files => JFiles}
    val ev = Tables.events(spark, sf001)
      .select(col("event_id"), col("ts"), col("event_type"), col("value"))
    val dir = JFiles.createTempDirectory("graft-psi-stream")
    // two trigger batches so the counts state actually folds
    val Array(b1, b2) = ev.randomSplit(Array(0.5, 0.5), seed = 7L)
    b1.write.mode("overwrite").parquet(dir.resolve("b1").toString)
    b2.write.mode("overwrite").parquet(dir.resolve("b2").toString)
    val q = Streaming.psiCounts(
        spark.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1).parquet(dir.toString + "/*"))
      .writeStream.format("memory").queryName("psi_counts")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = graft.queries.AnalyticsQueries
      .psiFinalize(spark.table("psi_counts")).collect().map(_.toString)
    val batch = graft.queries.AnalyticsQueries
      .qPsiDrift(spark, sf001).collect().map(_.toString)
    assert(batch.nonEmpty && streamed.toSeq == batch.toSeq,
      s"${streamed.length} streamed rows vs ${batch.length} batch rows")
  }

  test("streaming DP counts: finalize(accumulated state) == the batch release bit-for-bit") {
    import java.nio.file.{Files => JFiles}
    val ev = Tables.events(spark, sf001).select(col("ts"), col("event_type"))
    val dir = JFiles.createTempDirectory("graft-dp-stream")
    // two trigger batches: a (type, day) cell split across triggers
    // must fold its counts; the noise must NOT depend on the split
    val Array(b1, b2) = ev.randomSplit(Array(0.5, 0.5), seed = 13L)
    b1.write.mode("overwrite").parquet(dir.resolve("b1").toString)
    b2.write.mode("overwrite").parquet(dir.resolve("b2").toString)
    val q = Streaming.dpCountsState(
        spark.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1).parquet(dir.toString + "/*"))
      .writeStream.format("memory").queryName("dp_counts")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = Streaming.dpCountsFinalize(spark.table("dp_counts"))
      .collect().map(_.toString)
    val batch = graft.queries.ExtraQueries.qDpCounts(spark, sf001)
      .collect().map(_.toString)
    assert(batch.nonEmpty && streamed.toSeq == batch.toSeq,
      s"${streamed.length} streamed rows vs ${batch.length} batch rows")
  }

  test("streaming embedding drift: finalize(folded state) == the batch PSI frame bit-for-bit") {
    import java.nio.file.{Files => JFiles}
    // the embedding "stream": corpus vectors tagged with their source
    // materialize BEFORE randomSplit: the join's row order is not
    // deterministic across re-executions, and randomSplit re-runs its
    // parent per split — an un-pinned order can land a row in both
    // splits or neither (observed as an intermittent full-suite
    // failure; the sibling specs split raw table scans, which are
    // order-stable)
    val emb = Tables.embeddings(spark, sf001)
      .select(col("vec_id"), col("embedding"))
      .join(Tables.documents(spark, sf001)
        .select(col("doc_id").as("vec_id"), col("source")), Seq("vec_id"))
      .select(col("source"), col("embedding"))
      .localCheckpoint(true)
    val dir = JFiles.createTempDirectory("graft-drift-stream")
    // two trigger batches: a (source, bin) cell split across triggers
    // must fold its counts; the frozen centroid must NOT depend on
    // trigger boundaries
    val Array(b1, b2) = emb.randomSplit(Array(0.5, 0.5), seed = 17L)
    b1.write.mode("overwrite").parquet(dir.resolve("b1").toString)
    b2.write.mode("overwrite").parquet(dir.resolve("b2").toString)
    val (cvec, ref) = graft.queries.SimilarityQueries
      .driftReference(spark, sf001)
    val q = Streaming.embDriftCounts(
        spark.readStream.schema(emb.schema)
          .option("maxFilesPerTrigger", 1).parquet(dir.toString + "/*"),
        cvec)
      .writeStream.format("memory").queryName("emb_drift")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = Streaming
      .embDriftFinalize(spark.table("emb_drift"), ref)
      .collect().map(_.toString)
    val batch = graft.queries.SimilarityQueries
      .qEmbeddingDriftPsi(spark, sf001).collect().map(_.toString)
    assert(batch.nonEmpty && streamed.toSeq == batch.toSeq,
      s"${streamed.length} streamed rows vs ${batch.length} batch rows")
  }

  test("streaming expectations: finalize(folded counts) == the batch report bit-for-bit") {
    import java.nio.file.{Files => JFiles}
    val ev = Tables.events(spark, sf001)
      .select(col("ts"), col("user_id"), col("event_type"), col("value"))
    val dir = JFiles.createTempDirectory("graft-expect-stream")
    val Array(b1, b2) = ev.randomSplit(Array(0.5, 0.5), seed = 23L)
    b1.write.mode("overwrite").parquet(dir.resolve("b1").toString)
    b2.write.mode("overwrite").parquet(dir.resolve("b2").toString)
    val q = Streaming.expectationCounts(
        spark.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1).parquet(dir.toString + "/*"))
      .writeStream.format("memory").queryName("expect_counts")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = Streaming.expectationsFinalize(spark.table("expect_counts"))
      .collect().map(_.toString)
    val batch = graft.queries.QualityQueries
      .qExpectationsEvents(spark, sf001).collect().map(_.toString)
    assert(batch.nonEmpty && streamed.toSeq == batch.toSeq,
      s"${streamed.length} streamed rows vs ${batch.length} batch rows")
    // both verdict paths exercised: the 25%-budget row passes on the
    // ~20% unknown-type stream, the 10%-budget twin fails
    val verdicts = graft.queries.QualityQueries
      .qExpectationsEvents(spark, sf001)
      .collect().map(r => r.getString(0) -> r.getBoolean(3)).toMap
    assert(verdicts("known_type_budget25") && !verdicts("known_type_budget10"))
  }

  test("streaming expectations Unique face: exact rows bit-for-bit, sketch row within 5% of batch exact, both budgets verdict") {
    import java.nio.file.{Files => JFiles}
    val ev = Tables.events(spark, sf001)
      .select(col("ts"), col("user_id"), col("event_type"), col("value"))
    val dir = JFiles.createTempDirectory("graft-expect-uniq-stream")
    // two trigger batches: the HLL register state must FOLD across
    // triggers (register-wise max), not overwrite
    val Array(b1, b2) = ev.randomSplit(Array(0.5, 0.5), seed = 29L)
    b1.write.mode("overwrite").parquet(dir.resolve("b1").toString)
    b2.write.mode("overwrite").parquet(dir.resolve("b2").toString)
    val q = Streaming.expectationCountsLive(
        spark.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1).parquet(dir.toString + "/*"))
      .writeStream.format("memory").queryName("expect_counts_live")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val live = Streaming.expectationsFinalizeLive(
      spark.table("expect_counts_live")).collect()
    // the exact count-backed rows must equal the batch report verbatim
    val batch = graft.queries.QualityQueries
      .qExpectationsEvents(spark, sf001).collect().map(_.toString).toSet
    val exactRows = live.filterNot(_.getString(0).startsWith("unique_user"))
      .map(_.toString).toSet
    assert(batch.nonEmpty && exactRows == batch,
      s"exact rows drifted: $exactRows vs $batch")
    // the Unique rows: violation within 5% (relative, on the distinct
    // estimate) of the exact batch 1 − countDistinct/nonNull
    val exact = {
      val r = ev.agg(
        org.apache.spark.sql.functions.count(col("user_id")).as("nn"),
        org.apache.spark.sql.functions.countDistinct(col("user_id")).as("d"))
        .head()
      1.0 - r.getLong(1).toDouble / r.getLong(0)
    }
    val uniq = live.filter(_.getString(0).startsWith("unique_user"))
    assert(uniq.length == 2)
    uniq.foreach { r =>
      val v = r.getDouble(1)
      assert(math.abs(v - exact) <= 0.05 * (1.0 - exact) + 0.05 * exact,
        s"${r.getString(0)}: sketch violation $v vs exact $exact")
    }
    // both verdict paths: 99% budget passes on the ~0.985 stream's
    // violation, 50% budget fails
    val verdicts = uniq.map(r => r.getString(0) -> r.getBoolean(3)).toMap
    assert(verdicts("unique_user_budget99") && !verdicts("unique_user_budget50"),
      s"verdicts: $verdicts")
  }

  test("streaming forecast backtest: finalize(folded day state) == the batch frame bit-for-bit") {
    import java.nio.file.{Files => JFiles}
    val ev = Tables.events(spark, sf001).select(col("ts"), col("value"))
    val dir = JFiles.createTempDirectory("graft-forecast-stream")
    // two trigger batches: a day's cents split across triggers must
    // fold into one exact sum before the finalize sees it
    val Array(b1, b2) = ev.randomSplit(Array(0.5, 0.5), seed = 19L)
    b1.write.mode("overwrite").parquet(dir.resolve("b1").toString)
    b2.write.mode("overwrite").parquet(dir.resolve("b2").toString)
    val q = Streaming.forecastDailyState(
        spark.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1).parquet(dir.toString + "/*"))
      .writeStream.format("memory").queryName("forecast_daily")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = Streaming.forecastFinalize(spark.table("forecast_daily"))
      .collect().map(_.toString)
    val batch = graft.queries.AnalyticsQueries
      .qForecastBacktest(spark, sf001).collect().map(_.toString)
    assert(batch.nonEmpty && streamed.toSeq == batch.toSeq,
      s"${streamed.length} streamed rows vs ${batch.length} batch rows")
  }

  test("streaming drift finalize: mass in a bin the frozen reference never saw enters the grid loudly") {
    import spark.implicits._
    // frozen reference saw only bin 5; the live batch puts half its
    // mass in bin 0 — the unseen bin must appear with n_ref = 0 and a
    // strongly positive psi term, not silently drop (a drifted batch
    // concentrated in unseen bins is the loudest possible signal)
    val state = Seq(("s1", 0, 50L), ("s1", 5, 50L))
      .toDF("source", "bin", "n_cur")
    val out = Streaming.embDriftFinalize(state, Seq((5, 100L)))
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(3),
        r.getDouble(6))).sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(0, 5), s"grid bins: ${out.toSeq}")
    val bin0 = out.head
    assert(bin0._2 == 0L && bin0._3 == 50L, s"unseen bin row: $bin0")
    assert(bin0._4 > 1.0, s"unseen-bin psi term should be loud: $bin0")
  }

  test("streaming WAU sketches: finalize(folded day state) matches exact WAU within HLL error") {
    import java.nio.file.{Files => JFiles}
    val ev = Tables.events(spark, sf001).select(col("ts"), col("user_id"))
    val dir = JFiles.createTempDirectory("graft-wau-stream")
    // two trigger batches so per-day sketch state actually folds —
    // a day split across batches must merge, not overwrite
    val Array(b1, b2) = ev.randomSplit(Array(0.5, 0.5), seed = 11L)
    b1.write.mode("overwrite").parquet(dir.resolve("b1").toString)
    b2.write.mode("overwrite").parquet(dir.resolve("b2").toString)
    val q = Streaming.wauDaySketches(
        spark.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1).parquet(dir.toString + "/*"))
      .writeStream.format("memory").queryName("wau_sketches")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val est = Streaming.wauFinalize(spark.table("wau_sketches"))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val exact = graft.queries.AnalyticsQueries
      .qRollingActiveUsers(spark, sf001)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(exact.nonEmpty && est.keySet == exact.keySet,
      s"day grids differ: ${est.size} est days vs ${exact.size} exact")
    // HLL default accuracy is ~1.6% rsd (lgK 12); gate at a 5% band
    // with an absolute floor for small counts. Empty-window days must
    // agree exactly at 0 (the dense-grid discipline on both faces).
    exact.foreach { case (day, ex) =>
      val e = est(day)
      if (ex == 0L) assert(e == 0L, s"$day: est $e on an empty window")
      else assert(math.abs(e - ex) <= math.max(3.0, 0.05 * ex),
        s"$day: est $e vs exact $ex outside the sketch error band")
    }
  }

  test("streaming dedup: re-delivered events dropped across trigger batches") {
    import java.nio.file.{Files => JFiles}
    val dir = JFiles.createTempDirectory("graft-dedup-stream")
    val events = Tables.events(spark, sf001).limit(200)
    // batch 1: events as-is; batch 2: HALF of them re-delivered
    events.write.mode("overwrite").parquet(dir.resolve("b1").toString)
    // the rewritten parquet carries proper micros timestamps — read it
    // with its own schema (eventsStream is for the harness nanos layout)
    val stream = Streaming.dedupEvents(
      spark.readStream.schema(events.schema).parquet(dir.resolve("b1").toString))
    val q = stream.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // re-deliver: copy the same parquet files back in under new names
      JFiles.list(dir.resolve("b1")).forEach { p =>
        if (p.toString.endsWith(".parquet"))
          JFiles.copy(p, dir.resolve("b1").resolve(s"redelivered-${p.getFileName}"))
      }
      q.processAllAvailable()
      val out = spark.table("dedup_out")
      assert(out.count() == 200, "every event exactly once despite re-delivery")
      assert(out.select("event_id").distinct().count() == 200)
    } finally q.stop()
  }

  test("sessionization: per-user sessions via mapGroupsWithState (streaming)") {
    import spark.implicits._
    val events = Streaming.eventsStream(spark, streamDir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Streaming.Event]
    val sessions = Streaming.sessionize(events, gapMinutes = 120)
    val q = sessions.writeStream
      .format("memory").queryName("sessions").outputMode("update").start()
    try q.processAllAvailable() finally q.stop()
    val out = spark.table("sessions").collect()
    assert(out.nonEmpty)
    // one row per user (last session), session bounds ordered
    val byUser = out.groupBy(_.getLong(0))
    byUser.foreach { case (_, rows) =>
      rows.foreach { r =>
        assert(!r.getTimestamp(1).after(r.getTimestamp(2)))
        assert(r.getInt(3) >= 1)
      }
    }
    val nUsers = Tables.events(spark, sf001).select("user_id").distinct().count()
    assert(byUser.size.toLong == nUsers)

    // stream == batch: the final streaming state per user is exactly
    // the batch twin's LAST session (same gap rule, same data)
    val batchLast = Streaming.sessionizeBatch(Tables.events(spark, sf001), gapMinutes = 120)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("session_id").desc)))
      .filter(col("rn") === 1)
      .collect()
      .map(r => r.getLong(0) -> ((r.getTimestamp(3), r.getTimestamp(4), r.getLong(2), r.getDouble(5))))
      .toMap
    out.foreach { r =>
      val (start, end, n, sumV) = batchLast(r.getLong(0))
      assert(r.getTimestamp(1) == start && r.getTimestamp(2) == end)
      assert(r.getInt(3).toLong == n)
      assert(math.abs(r.getDouble(4) - sumV) < 1e-6)
    }
  }

  test("streaming SCD2 maintenance: foreachBatch folds change batches into the snapshot") {
    // Continuous dimension maintenance — the streaming twin of
    // q_scd2_merge: change batches arrive as files, each carries its
    // own change_date, and foreachBatch folds them into the SCD2
    // snapshot with Scd2.merge. Batches touch DISJOINT keys so the
    // final snapshot is independent of trigger order (same
    // order-insensitivity discipline as the incremental-curation
    // test above).
    import spark.implicits._
    var snapshot = Seq(
      (1L, "AUTO", 10.0, "2020-01-01"),
      (2L, "AUTO", 20.0, "2020-01-01"),
      (3L, "BIKE", 30.0, "2020-01-01"))
      .toDF("key", "segment", "acctbal", "ef")
      .select(col("key"), col("segment"), col("acctbal"),
        to_date(col("ef")).as("effective_from"),
        lit(null).cast("date").as("effective_to"), lit(true).as("is_current"))
      .localCheckpoint()

    val dir = Files.createTempDirectory("graft-scd2-stream").toString
    // batch A: key 1 changes; batch B: key 2 changes + key 9 inserts
    Seq((1L, "AUTO", 11.0, "2024-06-01"))
      .toDF("key", "segment", "acctbal", "change_date")
      .coalesce(1).write.mode("append").parquet(dir)
    Seq((2L, "CAR", 20.0, "2024-07-01"), (9L, "NEW", 0.0, "2024-07-01"))
      .toDF("key", "segment", "acctbal", "change_date")
      .coalesce(1).write.mode("append").parquet(dir)

    var batches = 0
    val schema = spark.read.parquet(dir).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
      .writeStream.foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!df.isEmpty) {
          // asOf rides WITH the batch (each file is one day's changes)
          val asOf = df.select(max(col("change_date"))).head().getString(0)
          snapshot = graft.ops.Scd2.merge(snapshot,
            df.select(col("key"), col("segment"), col("acctbal")),
            "key", Seq("segment", "acctbal"), to_date(lit(asOf)))
            .localCheckpoint() // truncate lineage across folds
          batches += 1
        }
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    assert(batches >= 2, s"expected one trigger per file, got $batches")

    // exactly one current row per live key
    val current = snapshot.filter(col("is_current")).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(current.keySet == Set(1L, 2L, 3L, 9L))
    assert(current(1L).getDouble(2) == 11.0
      && current(1L).getDate(3).toString == "2024-06-01")
    assert(current(2L).getString(1) == "CAR"
      && current(2L).getDate(3).toString == "2024-07-01")
    assert(current(3L).getDate(3).toString == "2020-01-01", "untouched key")
    assert(current(9L).getDate(3).toString == "2024-07-01", "inserted key")
    // closed history: exactly the two changed keys, closed at their
    // own batch's date
    val closed = snapshot.filter(!col("is_current")).collect()
      .map(r => r.getLong(0) -> r.getDate(4).toString).toMap
    assert(closed == Map(1L -> "2024-06-01", 2L -> "2024-07-01"))
    // and the fold equals the sequential batch replay (disjoint keys
    // make the order irrelevant)
    val replay = graft.ops.Scd2.merge(
      graft.ops.Scd2.merge(
        Seq((1L, "AUTO", 10.0, "2020-01-01"), (2L, "AUTO", 20.0, "2020-01-01"),
          (3L, "BIKE", 30.0, "2020-01-01"))
          .toDF("key", "segment", "acctbal", "ef")
          .select(col("key"), col("segment"), col("acctbal"),
            to_date(col("ef")).as("effective_from"),
            lit(null).cast("date").as("effective_to"), lit(true).as("is_current")),
        Seq((1L, "AUTO", 11.0)).toDF("key", "segment", "acctbal"),
        "key", Seq("segment", "acctbal"), to_date(lit("2024-06-01"))),
      Seq((2L, "CAR", 20.0), (9L, "NEW", 0.0)).toDF("key", "segment", "acctbal"),
      "key", Seq("segment", "acctbal"), to_date(lit("2024-07-01")))
    assert(snapshot.exceptAll(replay).isEmpty && replay.exceptAll(snapshot).isEmpty)
  }

  test("streaming heavy hitters: foreachBatch folds approx_top_k sketch state across triggers") {
    // Continuous-ingest twin of q_heavy_hitters_incremental: each
    // trigger batch accumulates its own frequent-items sketch, and
    // the state is the COMBINE of the running sketch with the batch
    // sketch — the associativity the incremental query exercises once
    // is here exercised across three folds. With maxItemsTracked far
    // above the vocabulary, the final estimate must EQUAL the exact
    // counts of everything ingested.
    import spark.implicits._
    var state = Seq.empty[String].toDF("term")
      .agg(expr("approx_top_k_accumulate(term, 1000)").as("sk"))
      .localCheckpoint()

    val dir = Files.createTempDirectory("graft-hh-stream").toString
    val batches = Seq(
      Seq("a", "a", "b", "c"),
      Seq("a", "b", "b", "d", "d"),
      Seq("c", "c", "c", "a"))
    batches.foreach { b =>
      b.toDF("term").coalesce(1).write.mode("append").parquet(dir)
    }
    var triggers = 0
    val schema = spark.read.parquet(dir).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
      .writeStream.foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!df.isEmpty) {
          state = state.unionByName(
            df.agg(expr("approx_top_k_accumulate(term, 1000)").as("sk")))
            .agg(expr("approx_top_k_combine(sk, 1000)").as("sk"))
            .localCheckpoint()
          triggers += 1
        }
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    assert(triggers >= 3, s"expected one trigger per file, got $triggers")

    val got = state
      .select(explode(expr("approx_top_k_estimate(sk, 10)")).as("e"))
      .select(col("e.item"), col("e.count"))
      .collect().map(r => r.getString(0) ->
        r.getAs[Number](1).longValue()).toMap
    val exact = batches.flatten.groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    assert(got == exact, s"sketch-folded counts $got != exact $exact")
  }

  test("streaming CDC: foreachBatch folds OUT-OF-ORDER change batches, stragglers lose") {
    // Continuous upsert maintenance — the streaming twin of
    // q_cdc_apply, and the adversarial case the SCD2 test's
    // disjoint-key batches sidestep: here the SAME keys are touched
    // across triggers and a later trigger carries an OLDER version
    // (network straggler). Cdc.foldVersioned's union-recollapse state
    // is order-insensitive, so the final state must equal the
    // one-shot collapse of the whole log regardless of which trigger
    // carried what.
    import spark.implicits._
    var state = Seq((1L, "u", 10.0, 0L), (2L, "u", 20.0, 0L))
      .toDF("k", "op", "bal", "seq").localCheckpoint()

    val dir = Files.createTempDirectory("graft-cdc-stream").toString
    // trigger A: key1→v3, key2 deleted @v4
    Seq((1L, "u", 30.0, 3L), (2L, "d", 0.0, 4L))
      .toDF("k", "op", "bal", "seq").coalesce(1).write.mode("append").parquet(dir)
    // trigger B (later wall-clock, OLDER versions): straggling
    // key1→v2 must lose to v3; straggling key2 upsert @v1 must NOT
    // resurrect the deleted row; key5 inserts
    Seq((1L, "u", 99.0, 2L), (2L, "u", 77.0, 1L), (5L, "u", 5.0, 1L))
      .toDF("k", "op", "bal", "seq").coalesce(1).write.mode("append").parquet(dir)

    var batches = 0
    val schema = spark.read.parquet(dir).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
      .writeStream.foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!df.isEmpty) {
          state = graft.ops.Cdc.foldVersioned(state, df,
            "k", "op", Seq("seq"), Seq("bal")).localCheckpoint()
          batches += 1
        }
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    assert(batches >= 2, s"expected one trigger per file, got $batches")

    val got = state.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3))).toSet
    assert(got == Set((1L, "u", 30.0, 3L), (2L, "d", 0.0, 4L), (5L, "u", 5.0, 1L)),
      s"state after out-of-order folds: $got")
    // reader view: the deleted key is invisible, stragglers never won
    val live = graft.ops.Cdc.live(state, "op").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(live == Map(1L -> 30.0, 5L -> 5.0))
  }

  test("streaming rolling anomaly replay: multi-trigger ring-buffer state == batch twin, bit-exact") {
    // Feed the whole sf0.001 events fixture in three ts-ordered trigger
    // batches (one file each, so the in-order contract holds across
    // micro-batches) and require EXACT equality with the hash-green
    // batch twin: the operator's integer-cents spelling makes stream
    // == batch a bit-for-bit claim, not a tolerance claim.
    import java.nio.file.{Files => JFiles}
    val all = Tables.events(spark, sf001)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Streaming.Event].collect().sortBy(e => (e.ts.getTime, e.event_id))
    // rows SHUFFLED within each trigger batch (seeded): the operator
    // must re-establish (ts, event_id) order inside every micro-batch;
    // only the CROSS-batch order is the contract
    val rnd = new scala.util.Random(13)
    val chunks = all.grouped((all.length + 2) / 3).toSeq
      .map(c => rnd.shuffle(c.toSeq))
    val dir = JFiles.createTempDirectory("graft-anomaly")
    val watch = JFiles.createTempDirectory("graft-anomaly-stream")
    val events = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[Streaming.Event]].schema)
      .parquet(watch.toString).as[Streaming.Event]
    val q = Streaming.anomalyScores(events)
      .writeStream.format("memory").queryName("anomaly_scores")
      .outputMode("append").start()
    try {
      chunks.zipWithIndex.foreach { case (chunk, i) =>
        chunk.toSeq.toDS().coalesce(1).write.parquet(dir.resolve(s"b$i").toString)
        JFiles.list(dir.resolve(s"b$i")).forEach { p =>
          if (p.toString.endsWith(".parquet"))
            JFiles.copy(p, watch.resolve(s"b$i-${p.getFileName}"))
        }
        q.processAllAvailable()
      }
    } finally q.stop()
    // the batch twin emits (event_id, user_id, value, base_mean,
    // base_sd, z) — same field order as AnomalyScore, so Row.toString
    // comparison is a bitwise claim on every double
    val got = spark.table("anomaly_scores").orderBy(col("event_id"))
      .collect().map(_.toString)
    val want = graft.queries.AnalyticsQueries.qRollingAnomaly(spark, sf001)
      .collect().map(_.toString)
    assert(got.length == want.length && got.nonEmpty)
    got.zip(want).foreach { case (g, w) => assert(g == w, s"$g != $w") }
  }

  test("streaming ewma replay: ring-buffer state == batch twin, bit-exact") {
    // same harness as the anomaly replay: three ts-ordered trigger
    // batches, rows shuffled within each batch
    import java.nio.file.{Files => JFiles}
    val all = Tables.events(spark, sf001)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Streaming.Event].collect().sortBy(e => (e.ts.getTime, e.event_id))
    val rnd = new scala.util.Random(29)
    val chunks = all.grouped((all.length + 2) / 3).toSeq
      .map(c => rnd.shuffle(c.toSeq))
    val dir = JFiles.createTempDirectory("graft-ewma")
    val watch = JFiles.createTempDirectory("graft-ewma-stream")
    val events = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[Streaming.Event]].schema)
      .parquet(watch.toString).as[Streaming.Event]
    val q = Streaming.ewmaSmooth(events)
      .writeStream.format("memory").queryName("ewma_scores")
      .outputMode("append").start()
    try {
      chunks.zipWithIndex.foreach { case (chunk, i) =>
        chunk.toSeq.toDS().coalesce(1).write.parquet(dir.resolve(s"b$i").toString)
        JFiles.list(dir.resolve(s"b$i")).forEach { p =>
          if (p.toString.endsWith(".parquet"))
            JFiles.copy(p, watch.resolve(s"b$i-${p.getFileName}"))
        }
        q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.table("ewma_scores").orderBy(col("event_id"))
      .collect().map(_.toString)
    val want = graft.queries.AnalyticsQueries.qEwmaSmooth(spark, sf001)
      .collect().map(_.toString)
    assert(got.length == want.length && got.nonEmpty)
    got.zip(want).foreach { case (g, w) => assert(g == w, s"$g != $w") }
  }

  test("streaming level-shift replay: delayed-emission ring state == batch twin minus each user's unresolved tail, bit-exact") {
    // same harness: three trigger batches in cross-batch ts order,
    // rows shuffled within each batch
    import java.nio.file.{Files => JFiles}
    val all = Tables.events(spark, sf001)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Streaming.Event].collect().sortBy(e => (e.ts.getTime, e.event_id))
    val rnd = new scala.util.Random(41)
    val chunks = all.grouped((all.length + 2) / 3).toSeq
      .map(c => rnd.shuffle(c.toSeq))
    val dir = JFiles.createTempDirectory("graft-lshift")
    val watch = JFiles.createTempDirectory("graft-lshift-stream")
    val events = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[Streaming.Event]].schema)
      .parquet(watch.toString).as[Streaming.Event]
    val q = Streaming.levelShiftScores(events)
      .writeStream.format("memory").queryName("lshift_scores")
      .outputMode("append").start()
    try {
      chunks.zipWithIndex.foreach { case (chunk, i) =>
        chunk.toSeq.toDS().coalesce(1).write.parquet(dir.resolve(s"b$i").toString)
        JFiles.list(dir.resolve(s"b$i")).forEach { p =>
          if (p.toString.endsWith(".parquet"))
            JFiles.copy(p, watch.resolve(s"b$i-${p.getFileName}"))
        }
        q.processAllAvailable()
      }
    } finally q.stop()
    // the stream emits a row exactly when its 8-row lead frame
    // completes, so each user's last 7 events stay pending — the
    // expected set is the batch twin minus those tails (and on those
    // tails the twin's mean_lead is NULL by the same frame logic)
    val pending = all.groupBy(_.user_id).values
      .flatMap(_.sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
        .takeRight(7).map(_.event_id)).toSet
    val batch = graft.queries.AnalyticsQueries.qLevelShift(spark, sf001).collect()
    batch.filter(r => pending.contains(r.getLong(0)))
      .foreach(r => assert(r.isNullAt(4), s"tail row with full lead? $r"))
    val want = batch.filterNot(r => pending.contains(r.getLong(0))).map(_.toString)
    val got = spark.table("lshift_scores").orderBy(col("event_id"))
      .collect().map(_.toString)
    assert(got.length == want.length && got.nonEmpty,
      s"${got.length} streamed vs ${want.length} resolvable batch rows")
    got.zip(want).foreach { case (g, w) => assert(g == w, s"$g != $w") }
  }
}
