package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.EventOps
import graft.operators.EventOps.Ev

/** Structured Streaming paths: watermarked windowed aggregation and
  * stateful sessionization (flatMapGroupsWithState) across micro-batches. */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Expected attribution per purchase, INCLUDING the µs gap to the last
    * touch. The hashed s22 surface carries ids only (the driver's ns→µs
    * read could shift each endpoint by ±1 µs), so the gap's correctness
    * lives here: a direct batch-window recomputation both streaming
    * attribution tests compare against. */
  private def attrExpected(sf: String)
      : Map[Long, (Option[Long], Option[Long], Option[Long])] = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("tus", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val touchId = when(col("event_type").isin("click", "view"), col("event_id"))
    val touchTus = when(col("event_type").isin("click", "view"), col("tus"))
    graft.core.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("ts div 1000").as("tus"))
      .withColumn("lt_id", last(touchId, ignoreNulls = true).over(w))
      .withColumn("lt_tus", last(touchTus, ignoreNulls = true).over(w))
      .withColumn("ft_id", first(touchId, ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("lt_id"), col("ft_id"),
        (col("tus") - col("lt_tus")).as("gap_us"))
      .collect()
      .map { r =>
        def opt(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
        r.getLong(0) -> ((opt(1), opt(2), opt(3)))
      }.toMap
  }

  test("watermarked tumbling-window aggregation over a memory stream") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Long, Long, Double)]
    val windowed = ms.toDF().toDF("event_id", "ts_us", "value")
      .withColumn("tts", timestamp_micros(col("ts_us")))
      .withWatermark("tts", "1 hour")
      .groupBy(window(col("tts"), "1 hour"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
    val q = windowed.writeStream.format("memory").queryName("win_agg")
      .outputMode("complete").start()
    try {
      val h = 3600L * 1000000L // 1 hour in micros
      ms.addData((0L, 10L * h + 1L, 1.0), (1L, 10L * h + 2L, 2.0),
        (2L, 11L * h + 1L, 4.0))
      q.processAllAvailable()
      val got = spark.table("win_agg")
        .select(col("n"), col("v")).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(got === Set((2L, 3.0), (1L, 4.0)))
    } finally q.stop()
  }

  test("watermarked STREAM-STREAM interval join matches the batch theta join") {
    // the two-stream case none of the other faces cover: clicks joined to
    // the same user's purchases within the following hour, both sides
    // watermarked so Spark can bound the join state. Parity vs the batch
    // theta join on identical data, split across two micro-batches.
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val evs = graft.core.Tables.events(spark, TestSpark.sf)
      .select(col("user_id"), expr("ts div 1000").as("tus"),
        col("event_id"), col("event_type"))
      .filter(col("event_type").isin("click", "purchase"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(e => (e._2, e._3))
    val clicks = evs.filter(_._4 == "click")
    val purchases = evs.filter(_._4 == "purchase")
    val msC = MemoryStream[(Long, Long, Long, String)]
    val msP = MemoryStream[(Long, Long, Long, String)]
    def side(ms: MemoryStream[(Long, Long, Long, String)], tag: String) =
      ms.toDF().toDF(s"${tag}_user", s"${tag}_tus", s"${tag}_id", s"${tag}_type")
        .withColumn(s"${tag}_tts", timestamp_micros(col(s"${tag}_tus")))
        .withWatermark(s"${tag}_tts", "2 hours")
    val joined = side(msC, "c").join(side(msP, "p"),
      expr("""c_user = p_user AND
              p_tts >= c_tts AND p_tts <= c_tts + interval 1 hour"""))
      .select(col("c_id"), col("p_id"))
    val q = joined.writeStream.format("memory").queryName("ssj")
      .outputMode("append").start()
    try {
      val (c1, c2) = clicks.splitAt(clicks.length / 2)
      val (p1, p2) = purchases.splitAt(purchases.length / 2)
      msC.addData(c1.toSeq); msP.addData(p1.toSeq); q.processAllAvailable()
      msC.addData(c2.toSeq); msP.addData(p2.toSeq); q.processAllAvailable()
      val got = spark.table("ssj").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val h = 3600L * 1000000L
      val batch = for {
        c <- clicks; p <- purchases
        if c._1 == p._1 && p._2 >= c._2 && p._2 <= c._2 + h
      } yield (c._3, p._3)
      assert(got === batch.toSet)
      assert(got.nonEmpty, "fixture must produce at least one join pair")
    } finally q.stop()
  }

  test("file-source streaming over the events table matches the batch result") {
    // file-source streams need a directory; stage the table into one
    val dir = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.sf}/events.parquet"),
      dir.resolve("part-0.parquet"))
    val batch = spark.read.parquet(dir.toString)
    val expected = batch.groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val stream = spark.readStream.schema(batch.schema)
      .parquet(dir.toString)
      .groupBy("event_type").count()
    val q = stream.writeStream.format("memory").queryName("ev_stream")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("ev_stream").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === expected)
    } finally q.stop()
  }

  test("stream-static broadcast enrichment matches the batch segment rollup (s06)") {
    // the streaming face of s06: a static dimension joins every
    // micro-batch through the same broadcast plan the batch query gets —
    // at cluster scale the stream is unbounded while the dim stays a
    // broadcast, exactly the batch join geometry
    val dir = java.nio.file.Files.createTempDirectory("events_enrich")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.sf}/events.parquet"),
      dir.resolve("part-0.parquet"))
    val batchEv = spark.read.parquet(dir.toString)
    val cust = broadcast(core.Tables.customer(spark, TestSpark.sf)
      .select(col("c_custkey"), col("c_mktsegment")))
    def rollup(ev: org.apache.spark.sql.DataFrame) =
      ev.join(cust, col("user_id") === col("c_custkey"))
        .groupBy("c_mktsegment", "event_type")
        .agg(count(lit(1)).as("n"))
    val expected = rollup(batchEv).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val q = rollup(spark.readStream.schema(batchEv.schema).parquet(dir.toString))
      .writeStream.format("memory").queryName("ev_enrich")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("ev_enrich").collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(got === expected)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("streaming exact dedup: watermarked dropDuplicates keeps one copy per content hash") {
    // the streaming face of t01_exact_dedup: documents arrive as a stream,
    // duplicates (same content hash) are dropped across micro-batches
    // within the watermark horizon
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Long, Long, String)]
    val deduped = ms.toDF().toDF("doc_id", "ts_us", "text")
      .withColumn("tts", timestamp_micros(col("ts_us")))
      .withColumn("text_hash", md5(col("text")))
      .withWatermark("tts", "1 hour")
      .dropDuplicates("text_hash")
    val q = deduped.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      ms.addData((0L, 1000L, "alpha"), (1L, 2000L, "beta"),
        (2L, 3000L, "alpha")) // in-batch duplicate
      q.processAllAvailable()
      ms.addData((3L, 4000L, "beta"), (4L, 5000L, "gamma")) // cross-batch dup
      q.processAllAvailable()
      val kept = spark.table("dedup_stream").select("text").collect()
        .map(_.getString(0)).sorted
      assert(kept === Array("alpha", "beta", "gamma"))
    } finally q.stop()
  }

  test("built-in session_window equals the gap-session operator's spans") {
    // Spark's native session_window (usable batch AND streaming) merges
    // events within the gap exactly like EventOps.gapSessions' LAG
    // formulation — per-user session (start, end, count) sets must match.
    import graft.operators.EventOps
    val gapUs = 1800L * 1000000L
    val ev = graft.core.Tables.events(spark, TestSpark.sf)
      .select(col("user_id"), col("event_id"), expr("ts div 1000").as("tus"))
    val native = ev
      .withColumn("tts", timestamp_micros(col("tus")))
      .groupBy(col("user_id"), session_window(col("tts"), "30 minutes"))
      .agg(count(lit(1)).as("n"), min("tus").as("t0"), max("tus").as("t1"))
      .select("user_id", "n", "t0", "t1").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val ours = EventOps.gapSessions(
        ev.withColumnRenamed("tus", "ts"), gapUs)
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n"), min("ts").as("t0"), max("ts").as("t1"))
      .select("user_id", "n", "t0", "t1").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(native === ours)
  }

  test("keyed state survives a checkpointed query RESTART") {
    // the recovery contract a production ingest depends on: stop the
    // attribution stream mid-history, start a NEW query from the same
    // checkpoint, and the per-user (first, last) touch state must carry —
    // the post-restart purchases credit the same touches the batch
    // window computes over the full history.
    import spark.implicits._
    import graft.operators.EventOps
    import graft.operators.EventOps.{TypedEv, AttrOut}
    implicit val ctx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val evs = graft.core.Tables.events(spark, TestSpark.sf)
      .select(col("user_id"), expr("ts div 1000").as("tus"),
        col("event_id"), col("event_type"))
      .collect()
      .map(r => TypedEv(r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
      .sortBy(e => (e.tus, e.eventId))
    val (first, second) = evs.splitAt(evs.length / 2)
    val out = java.nio.file.Files.createTempDirectory("graft_attr_out").toString
    val ms = MemoryStream[TypedEv]
    // the memory sink cannot recover from a checkpoint; the FILE sink can
    // — which is also the realistic production shape (stream -> parquet)
    def start() = EventOps.streamingAttribution(ms.toDS())
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    val q1 = start()
    try { ms.addData(first.toSeq); q1.processAllAvailable() }
    finally q1.stop()
    val q2 = start() // NEW query, same checkpoint: state must restore
    try {
      ms.addData(second.toSeq); q2.processAllAvailable()
      val got = spark.read.parquet(out).as[AttrOut].collect()
        .map(a => a.eventId -> ((a.ltId, a.ftId, a.gapUs))).toMap
      assert(got === attrExpected(TestSpark.sf))
    } finally q2.stop()
  }

  test("streaming BDA binner matches the batch mapper across micro-batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    import graft.operators.{Bda, EventOps}
    import graft.operators.EventOps.BdaRow
    val cfg = Bda.Config(
      decorrelation = 0.175, maxLm = math.Pi / 2,
      maxChanFreq = Bda.C / 10.0, timeBinSecs = 2.5,
      maxUvwDist = 10.0, chanTol = 0.95, nchan = 4, fracBw = 0.2)
    // two cross baselines with drifting uvw + one auto baseline, split
    // across micro-batches mid-bin so keyed state must carry the open bin
    val rows = Seq(
      BdaRow(0L, 0L, 1L, 0.0, 1.0, 0.0, 0.0, 0.0),
      BdaRow(1L, 0L, 1L, 1.0, 1.0, 1.0, 0.0, 0.0),
      BdaRow(2L, 0L, 1L, 2.0, 1.0, 2.0, 0.0, 0.0), // decorr close
      BdaRow(3L, 0L, 1L, 3.0, 1.0, 2.5, 0.0, 0.0),
      BdaRow(4L, 2L, 2L, 0.0, 1.0, 0.0, 0.0, 0.0), // auto: never closes
      BdaRow(5L, 2L, 2L, 500.0, 1.0, 0.0, 0.0, 0.0),
      BdaRow(6L, 1L, 3L, 0.0, 1.0, 0.0, 0.0, 0.0),
      BdaRow(7L, 1L, 3L, 1.0, 0.2, 0.0, 0.0, 0.0), // dt=1.6 <= 2.5 stays
      BdaRow(8L, 1L, 3L, 3.0, 1.0, 0.0, 0.0, 0.0)) // dt=4.0 > 2.5 closes
    val batch = Bda.mapper(rows.toDF().withColumnRenamed("rowId", "row_id"), cfg)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val ms = MemoryStream[BdaRow]
    val q = EventOps.streamingBdaBins(ms.toDS(), cfg)
      .writeStream.format("memory").queryName("bda_stream")
      .outputMode("append").start()
    try {
      ms.addData(rows.take(5): _*) // split mid-bin on (0,1) and (2,2)
      q.processAllAvailable()
      ms.addData(rows.drop(5): _*)
      q.processAllAvailable()
      val got = spark.table("bda_stream").collect()
        .map(r => r.getLong(0) -> r.getLong(3)).toMap
      assert(got === batch,
        s"streaming bins diverge from the batch mapper: $got vs $batch")
    } finally q.stop()
  }

  test("streaming time_and_channel averaging: the flag-consensus windowed agg matches batch (A7 streaming face)") {
    // the reference's time+channel averaging as a LIVE ingest face: MS
    // samples arrive as an event-time stream, the time-bin axis is a
    // watermarked tumbling window, and the two-tier flag consensus
    // (unflagged samples win; an all-flagged bin averages its flagged
    // samples and stays flagged — time_and_channel_avg.py:75-120) is the
    // SAME single conditional aggregation the a12 batch oracle proves,
    // emitted in append mode as windows close. Split mid-window across
    // micro-batches so windowed state must carry partial bins.
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    import graft.AvgSample
    def at(sec: Long) = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(sec))
    // two baselines x 4 chans x 2 time-bins; baseline (0,2) chan-bin 0 is
    // ENTIRELY flagged in window 0 (consensus fallback branch)
    val rows = for {
      t <- 0L until 8L
      (a1, a2) <- Seq((0L, 1L), (0L, 2L))
      c <- 0L until 4L
    } yield AvgSample(at(t), a1, a2, c,
      ((t * 5 + c * 3 + a2) % 17 - 8) / 16.0,
      ((t * 7 + c * 5 + a2) % 13 - 6) / 16.0,
      ((t + c) % 4 + 1) / 4.0,
      flg = (a2 == 2L && c < 2 && t < 4) || ((t + c) % 11 == 0))

    def consensus(df: org.apache.spark.sql.DataFrame,
                  winCol: org.apache.spark.sql.Column) = {
      df.groupBy(winCol.as("win"), col("ant1"), col("ant2"),
          (col("chan") / 2).cast("long").as("out_chan"))
        .agg(
          sum(when(!col("flg"), 1L).otherwise(0L)).as("n_ok"),
          count(lit(1)).as("n_all"),
          sum(when(!col("flg"), col("w"))).as("w_u"),
          sum(when(col("flg"), col("w"))).as("w_f"),
          sum(when(!col("flg"), col("w") * col("vre"))).as("re_u"),
          sum(when(col("flg"), col("w") * col("vre"))).as("re_f"))
        .select(col("win"), col("ant1"), col("ant2"), col("out_chan"),
          when(col("n_ok") > 0, col("n_ok")).otherwise(col("n_all")).as("n_used"),
          (col("n_ok") === 0).as("oflag"),
          (when(col("n_ok") > 0, col("re_u")).otherwise(col("re_f")) /
            when(col("n_ok") > 0, col("w_u")).otherwise(col("w_f"))).as("ore"))
    }
    val batch = consensus(rows.toDF(),
        (unix_timestamp(col("ts")) / 4).cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ->
        (r.getLong(4), r.getBoolean(5), r.getDouble(6))).toMap

    val ms = MemoryStream[AvgSample]
    val streamed = consensus(
      ms.toDS().toDF().withWatermark("ts", "2 seconds"),
      window(col("ts"), "4 seconds"))
      .select((unix_timestamp(col("win.start")) / 4).cast("long").as("wk"),
        col("ant1"), col("ant2"), col("out_chan"),
        col("n_used"), col("oflag"), col("ore"))
    val q = streamed.writeStream.format("memory").queryName("tc_avg")
      .outputMode("append").start()
    try {
      val (b1, b2) = rows.partition(_.ts.getTime < 2000) // mid-window split
      ms.addData(b1: _*)
      q.processAllAvailable()
      ms.addData(b2: _*)
      q.processAllAvailable()
      // advance the watermark past the last window so it flushes
      ms.addData(AvgSample(at(100L), 9L, 9L, 0L, 0.0, 0.0, 1.0, flg = false))
      q.processAllAvailable()
      val got = spark.table("tc_avg").collect()
        .filter(_.getLong(1) != 9L)
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ->
          (r.getLong(4), r.getBoolean(5), r.getDouble(6))).toMap
      assert(got === batch,
        s"streaming consensus diverges: ${got.size} vs ${batch.size} groups")
    } finally q.stop()
  }

  test("streaming FULL-CORR time_and_channel averaging matches batch (a18's shape live)") {
    // the a18 (corr, corr)-shaped averaging as an ingest face: corr is a
    // bounded dimension, so the tuple-of-vis intrinsics become corr in
    // the aggregation KEY — append-mode streaming allows exactly one
    // aggregation, so the array re-assembly stays a downstream batch
    // step; the numbers (per-element two-tier flag consensus, weighted
    // sums) are a18's. Mid-window micro-batch split exercises carried
    // partial state per (bl, chan-bin, corr) cell.
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    def at(sec: Long) = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(sec))
    val rows = for {
      t <- 0L until 8L
      (a1, a2) <- Seq((0L, 1L), (0L, 2L))
      c <- 0L until 4L
      k <- 0L until 4L // 4 correlations
    } yield AvgSampleC(at(t), a1, a2, c, k,
      ((t * 5 + c * 3 + k * 7 + a2) % 17 - 8) / 16.0,
      ((t + c + k) % 4 + 1) / 4.0,
      // corr 3 of baseline (0,2) chan-bin 0 fully flagged in window 0:
      // the per-element consensus fallback fires for ONE corr cell only
      flg = (a2 == 2L && k == 3L && c < 2 && t < 4) ||
        ((t + c + k) % 13 == 0))

    def consensus(df: org.apache.spark.sql.DataFrame,
                  winCol: org.apache.spark.sql.Column) =
      df.groupBy(winCol.as("win"), col("ant1"), col("ant2"),
          (col("chan") / 2).cast("long").as("out_chan"), col("corr"))
        .agg(
          sum(when(!col("flg"), 1L).otherwise(0L)).as("n_ok"),
          count(lit(1)).as("n_all"),
          sum(when(!col("flg"), col("w"))).as("w_u"),
          sum(when(col("flg"), col("w"))).as("w_f"),
          sum(when(!col("flg"), col("w") * col("vre"))).as("re_u"),
          sum(when(col("flg"), col("w") * col("vre"))).as("re_f"))
        .select(col("win"), col("ant1"), col("ant2"), col("out_chan"),
          col("corr"),
          (col("n_ok") === 0).as("oflag"),
          (when(col("n_ok") > 0, col("re_u")).otherwise(col("re_f")) /
            when(col("n_ok") > 0, col("w_u")).otherwise(col("w_f"))).as("ore"))

    val batch = consensus(rows.toDF(),
        (unix_timestamp(col("ts")) / 4).cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)) -> (r.getBoolean(5), r.getDouble(6))).toMap
    // the designed fallback cell is present and flagged
    assert(batch.exists { case ((_, _, a2, oc, k), (of, _)) =>
      a2 == 2L && oc == 0L && k == 3L && of })

    val ms = MemoryStream[AvgSampleC]
    val streamed = consensus(
      ms.toDS().toDF().withWatermark("ts", "2 seconds"),
      window(col("ts"), "4 seconds"))
      .select((unix_timestamp(col("win.start")) / 4).cast("long").as("wk"),
        col("ant1"), col("ant2"), col("out_chan"), col("corr"),
        col("oflag"), col("ore"))
    val q = streamed.writeStream.format("memory").queryName("tc_avg_fc")
      .outputMode("append").start()
    try {
      val (b1, b2) = rows.partition(_.ts.getTime < 2000)
      ms.addData(b1: _*)
      q.processAllAvailable()
      ms.addData(b2: _*)
      q.processAllAvailable()
      ms.addData(AvgSampleC(at(100L), 9L, 9L, 0L, 0L, 0.0, 1.0, flg = false))
      q.processAllAvailable()
      val got = spark.table("tc_avg_fc").collect()
        .filter(_.getLong(1) != 9L)
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4)) -> (r.getBoolean(5), r.getDouble(6))).toMap
      assert(got === batch,
        s"full-corr streaming consensus diverges: ${got.size} vs ${batch.size}")
    } finally q.stop()
  }

  test("stateful sessions survive across micro-batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val gap = 100L
    val ms = MemoryStream[Ev]
    val q = EventOps.streamingSessions(ms.toDS(), gap)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // batch 1: user 7 opens a session (not yet emitted)
      ms.addData(Ev(7L, 0L, 1.0), Ev(7L, 50L, 2.0))
      q.processAllAvailable()
      assert(spark.table("sessions").count() === 0)
      // batch 2: gap of 1000 > 100 closes it; new session opens
      ms.addData(Ev(7L, 1050L, 4.0))
      q.processAllAvailable()
      val done = spark.table("sessions").as[EventOps.SessionOut].collect()
      assert(done.toSeq === Seq(EventOps.SessionOut(7L, 0L, 50L, 2L, 3.0)))
    } finally q.stop()
  }

  test("streaming as-of enrichment matches the batch union-sort join across batches") {
    import spark.implicits._
    import graft.operators.AsOfJoin
    import graft.operators.AsOfJoin.{AsOfEvent, AsOfMatch}
    implicit val ctx = spark.sqlContext
    // rights (state changes) and lefts interleaved on two keys
    val rights = Seq((1L, 10L, 100L), (1L, 50L, 105L), (2L, 5L, 200L))
    val lefts = Seq((1L, 5L, 900L), (1L, 20L, 901L), (1L, 60L, 902L),
      (2L, 4L, 903L), (2L, 5L, 904L))
    // batch expectation through the production asOf operator
    val batch = AsOfJoin.asOf(
      lefts.toDF("key", "tus", "id"),
      rights.toDF("key", "tus", "payload"),
      "key", "tus", Map("payload" -> "matched"))
      .collect().map(r => r.getLong(2) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    val ms = MemoryStream[AsOfEvent]
    val q = AsOfJoin.streamingAsOf(ms.toDS())
      .writeStream.format("memory").queryName("asof_stream")
      .outputMode("append").start()
    try {
      // split by event time at ts 30 — key 1's open state must carry over
      def ev(rows: Seq[(Long, Long, Long)], right: Boolean) =
        rows.map(r => AsOfEvent(r._1, r._2, right, if (right) 0L else r._3,
          if (right) r._3 else 0L))
      ms.addData(ev(rights.filter(_._2 < 30), right = true) ++
        ev(lefts.filter(_._2 < 30), right = false))
      q.processAllAvailable()
      ms.addData(ev(rights.filter(_._2 >= 30), right = true) ++
        ev(lefts.filter(_._2 >= 30), right = false))
      q.processAllAvailable()
      val got = spark.table("asof_stream").as[AsOfMatch].collect()
        .map(m => m.id -> m.matched).toMap
      assert(got === batch)
    } finally q.stop()
  }

  test("the KMV typed aggregate runs under Structured Streaming with batch parity") {
    // custom TypedImperativeAggregates must serialize their buffers
    // through the streaming state store; prove kmv_minhash survives
    // multi-batch accumulation and matches the batch bottom-8
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    graft.expr.GraftFunctions.register(spark)
    val vals = (1L to 300L).map(i => (i % 3, (i * 7919) % 997))
    val expect = vals.groupBy(_._1).map { case (g, vs) =>
      g -> vs.map(_._2).distinct.sorted.take(8)
    }
    val ms = MemoryStream[(Long, Long)]
    val q = ms.toDF().toDF("g", "v")
      .groupBy("g").agg(expr("kmv_minhash(v, 8)").as("arr"))
      .writeStream.format("memory").queryName("kmv_stream")
      .outputMode("complete").start()
    try {
      val (a, b) = vals.splitAt(150)
      ms.addData(a); q.processAllAvailable()
      ms.addData(b); q.processAllAvailable()
      val got = spark.table("kmv_stream").collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(got === expect)
    } finally q.stop()
  }

  test("HLL registers accumulate under streaming with batch parity (s16)") {
    // s16's scale claim is that register-wise MAX merges shards and
    // STREAMS for free; prove the (type, idx) → max(rho) registers
    // accumulated over micro-batches equal the batch registers for the
    // same rows (same Lehmer chain + trailing-zero CASE as the query).
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val rhoCase = (1 to 20)
      .map(k => s"WHEN h2 % ${1L << k} = ${1L << (k - 1)} THEN $k")
      .mkString("CASE ", " ", " ELSE 21 END")
    def regs(df: org.apache.spark.sql.DataFrame) = df
      .select(col("g"),
        (((col("v") % 2147483647L) * 48271) % 2147483647L).as("h1"))
      .select(col("g"), (col("h1") % 16).as("idx"),
        ((col("h1") * 16807) % 2147483647L).as("h2"))
      .select(col("g"), col("idx"), expr(rhoCase).as("rho"))
      .groupBy("g", "idx").agg(max(col("rho")).as("mrho"))
    val vals = (1L to 400L).map(i => (i % 2, (i * 104729) % 99991))
    val expect = regs(vals.toDF("g", "v")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val ms = MemoryStream[(Long, Long)]
    val q = regs(ms.toDF().toDF("g", "v"))
      .writeStream.format("memory").queryName("hll_stream")
      .outputMode("complete").start()
    try {
      val (a, b) = vals.splitAt(200)
      ms.addData(a); q.processAllAvailable()
      ms.addData(b); q.processAllAvailable()
      val got = spark.table("hll_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
      assert(got === expect)
    } finally q.stop()
  }

  test("histogram quantile sketch accumulates under streaming with batch parity (s17)") {
    // s17's scale claim is that the (type, bin) counts are mergeable
    // bounded state — across shards AND streams. Feed values through a
    // memory stream in two micro-batches; the complete-mode counts must
    // equal the batch histogram, and the CDF inversion on the streamed
    // counts must select the same quantile bins.
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    def hist(df: org.apache.spark.sql.DataFrame) = df
      .select(col("t"), least(lit(255L), greatest(lit(0L),
        floor(col("v") / 2d).cast("long"))).as("bin"))
      .groupBy("t", "bin").agg(count(lit(1)).as("c"))
    val vals = (1L to 500L).map(i => (i % 3, (i * 197 % 1000).toDouble / 2))
    val expect = hist(vals.toDF("t", "v")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val ms = MemoryStream[(Long, Double)]
    val q = hist(ms.toDF().toDF("t", "v"))
      .writeStream.format("memory").queryName("qsk_stream")
      .outputMode("complete").start()
    try {
      val (a, b) = vals.splitAt(250)
      ms.addData(a); q.processAllAvailable()
      ms.addData(b); q.processAllAvailable()
      val got = spark.table("qsk_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got === expect)
      // CDF inversion over the streamed registers picks the same p90 bin
      // as over the batch histogram (per type)
      def p90(bins: Map[(Long, Long), Long], t: Long): Long = {
        val h = bins.collect { case ((`t`, b), c) => b -> c }.toSeq.sortBy(_._1)
        val n = h.map(_._2).sum
        val k = (9 * n + 9) / 10
        h.scanLeft(((-1L), 0L)) { case ((_, cum), (b, c)) => (b, cum + c) }
          .collectFirst { case (b, cum) if cum >= k => b }.get
      }
      for (t <- 0L to 2L) assert(p90(got, t) === p90(expect, t))
    } finally q.stop()
  }

  test("count-min counters accumulate under streaming with batch parity (s18/s21)") {
    // The CMS scale claim is that the 4×256 counter matrix is mergeable
    // bounded state across shards AND streams: counters ADD. Feed ids
    // through a memory stream in two micro-batches; the complete-mode
    // counter matrix must equal the batch rollup, and the point query
    // (min over rows) must give the same estimate for every probe key.
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    def cms(df: org.apache.spark.sql.DataFrame) = df
      .crossJoin(broadcast(spark.range(0, 4).select(col("id").as("r"))))
      .select(col("r"),
        (((col("uid") + 1) * (lit(48271L) + col("r") * 1009L)) %
          2147483647L % 256).as("c"))
      .groupBy("r", "c").agg(count(lit(1)).as("cnt"))
    val ids = (1L to 600L).map(i => (i * 7919) % 37) // skewed key space
    val expect = cms(ids.toDF("uid")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val ms = MemoryStream[Long]
    val q = cms(ms.toDF().toDF("uid"))
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode("complete").start()
    try {
      val (a, b) = ids.splitAt(300)
      ms.addData(a); q.processAllAvailable()
      ms.addData(b); q.processAllAvailable()
      val got = spark.table("cms_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got === expect)
      // the point query over the streamed counters = batch estimate
      def est(m: Map[(Long, Long), Long], uid: Long): Long =
        (0L to 3L).map(r => m.getOrElse(
          (r, ((uid + 1) * (48271L + r * 1009L)) % 2147483647L % 256), 0L)).min
      for (uid <- 0L until 37L) assert(est(got, uid) === est(expect, uid))
    } finally q.stop()
  }

  test("streaming centroid maintenance matches the batch e03 aggregation") {
    // feed the sf0.001 embeddings through a memory stream in TWO
    // micro-batches; after the last batch, each label's most recent
    // emitted centroid must equal the batch average over the full table
    // (exact integer sums make this independent of batch boundaries)
    import spark.implicits._
    import graft.operators.StreamingMl
    import graft.operators.StreamingMl.VecIn
    implicit val ctx = spark.sqlContext
    val rows = spark.read.parquet(s"${TestSpark.sf}/embeddings.parquet")
      .select(col("vec_id"), col("label"), expr(
        "transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1e6) AS BIGINT))")
        .as("qv"))
      .collect()
      .map(r => (r.getLong(0), VecIn(r.getInt(1), r.getSeq[Long](2))))
      .sortBy(_._1)
    val (first, second) = rows.map(_._2).splitAt(rows.length / 2)
    val ms = MemoryStream[VecIn]
    val q = StreamingMl.streamingCentroids(ms.toDS())
      .writeStream.format("memory").queryName("cents")
      .outputMode("update").start()
    try {
      ms.addData(first.toSeq); q.processAllAvailable()
      ms.addData(second.toSeq); q.processAllAvailable()
      // last update per label wins
      val got = spark.table("cents").as[StreamingMl.CentOut].collect()
        .groupBy(_.label).map { case (l, outs) =>
          l -> outs.maxBy(_.n)
        }
      val batch = spark.createDataset(rows.map(_._2).toSeq)
        .select(col("label"), posexplode(col("qv")))
        .groupBy("label", "pos")
        .agg(avg(col("col").cast("double")).as("c"), count(lit(1)).as("n"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
      for ((label, pos, c, n) <- batch) {
        val o = got(label)
        assert(o.n === n, s"label $label count")
        assert(o.centroidQ(pos) === c, s"label $label pos $pos centroid")
      }
    } finally q.stop()
  }

  test("streaming sequence packing matches the t20 batch layout") {
    // feed the documents table through two micro-batches split mid-shard;
    // every doc's (pack_id, pack_offset, n_chunks) must equal the t20
    // batch window-cumsum layout — exact integer state makes the result
    // independent of the batch boundary
    import spark.implicits._
    import graft.operators.StreamingMl
    import graft.operators.StreamingMl.{DocIn, PackOut}
    implicit val ctx = spark.sqlContext
    val docs = spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
      .select(col("doc_id"), col("source"),
        expr("doc_id div 8192").as("shard"),
        (length(col("text")) -
          length(expr("replace(text, ' ', '')")) + 1).cast("long").as("n_tok"))
      .collect()
      .map(r => DocIn(r.getString(1), r.getLong(2), r.getLong(0), r.getLong(3)))
      .sortBy(_.docId)
    val (first, second) = docs.splitAt(docs.length / 2)
    val ms = MemoryStream[DocIn]
    val q = StreamingMl.streamingPacking(ms.toDS())
      .writeStream.format("memory").queryName("packs")
      .outputMode("append").start()
    try {
      ms.addData(first.toSeq); q.processAllAvailable()
      ms.addData(second.toSeq); q.processAllAvailable()
      val got = spark.table("packs").as[PackOut].collect()
        .map(p => p.docId -> p).toMap
      val batch = graft.SparkEntry.queries("t20_seq_packing")(spark, TestSpark.sf)
        .collect()
      assert(got.size === batch.length)
      for (r <- batch) {
        val o = got(r.getAs[Long]("doc_id"))
        assert(o.packId === r.getAs[Long]("pack_id"), s"doc ${o.docId} pack")
        assert(o.packOffset === r.getAs[Long]("pack_offset"),
          s"doc ${o.docId} offset")
        assert(o.nChunks === r.getAs[Long]("n_chunks"), s"doc ${o.docId} span")
      }
    } finally q.stop()
  }

  test("streaming Markov transitions match the s15 batch pair counts") {
    // feed the events table through two micro-batches split mid-stream;
    // the emitted (prev, next) pair counts must equal the batch LAG scan
    // regardless of where the split lands (per-user last-type state)
    import spark.implicits._
    import graft.operators.EventOps
    import graft.operators.EventOps.{TypedEv, TransOut}
    implicit val ctx = spark.sqlContext
    val evs = graft.core.Tables.events(spark, TestSpark.sf)
      .select(col("user_id"), expr("ts div 1000").as("tus"),
        col("event_id"), col("event_type"))
      .collect()
      .map(r => TypedEv(r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
      .sortBy(e => (e.tus, e.eventId))
    val (first, second) = evs.splitAt(evs.length / 2)
    val ms = MemoryStream[TypedEv]
    val q = EventOps.streamingTransitions(ms.toDS())
      .writeStream.format("memory").queryName("trans")
      .outputMode("append").start()
    try {
      ms.addData(first.toSeq); q.processAllAvailable()
      ms.addData(second.toSeq); q.processAllAvailable()
      val got = spark.table("trans").as[TransOut].collect()
        .groupBy(t => (t.prevType, t.eventType)).view.mapValues(_.length.toLong).toMap
      val batch = graft.SparkEntry.queries("s15_markov_transitions")(
          spark, TestSpark.sf).collect()
        .map(r => (r.getAs[String]("prev_type"), r.getAs[String]("event_type")) ->
          r.getAs[Long]("n")).toMap
      assert(got === batch)
    } finally q.stop()
  }

  test("streaming attribution matches the s22 batch window across batches") {
    // per-user (first, last, last_tus) keyed state: purchases must credit
    // the same first/last touch the batch FIRST/LAST_VALUE window finds,
    // wherever the micro-batch split lands
    import spark.implicits._
    import graft.operators.EventOps
    import graft.operators.EventOps.{TypedEv, AttrOut}
    implicit val ctx = spark.sqlContext
    val evs = graft.core.Tables.events(spark, TestSpark.sf)
      .select(col("user_id"), expr("ts div 1000").as("tus"),
        col("event_id"), col("event_type"))
      .collect()
      .map(r => TypedEv(r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
      .sortBy(e => (e.tus, e.eventId))
    val (first, second) = evs.splitAt(evs.length / 2)
    val ms = MemoryStream[TypedEv]
    val q = EventOps.streamingAttribution(ms.toDS())
      .writeStream.format("memory").queryName("attr")
      .outputMode("append").start()
    try {
      ms.addData(first.toSeq); q.processAllAvailable()
      ms.addData(second.toSeq); q.processAllAvailable()
      val got = spark.table("attr").as[AttrOut].collect()
        .map(a => a.eventId -> ((a.ltId, a.ftId, a.gapUs))).toMap
      assert(got === attrExpected(TestSpark.sf))
    } finally q.stop()
  }

  test("streaming incremental dedup matches the t50 batch verdicts across batches") {
    // base snapshot ingested first (building the band/fingerprint index),
    // delta docs streamed after with the split landing mid-delta: every
    // delta doc's (base_exact, n_band_hits) must equal the batch t50
    // verdict, and base docs must emit nothing
    import spark.implicits._
    import graft.operators.StreamingMl
    import graft.operators.StreamingMl.{SnapDoc, BandHit, OwnerHit}
    implicit val ctx = spark.sqlContext
    val docs = graft.core.Tables.documents(spark, TestSpark.sf)
    val splitId = (docs.agg(max(col("doc_id"))).head.getLong(0) + 1) / 2
    val sig = docs
      .select(col("doc_id"), md5(col("text")).as("fp"),
        split(col("text"), " ").as("tk"))
      .filter(size(col("tk")) >= 3)
      .select(col("doc_id"), col("fp"), explode(expr(
        "transform(sequence(1, size(tk) - 2), i -> concat_ws(' ', slice(tk, i, 3)))"))
        .as("tok"))
      .groupBy("doc_id", "fp").agg(
        min(md5(concat(lit("a"), col("tok")))).as("h1"),
        min(md5(concat(lit("b"), col("tok")))).as("h2"))
      .collect()
      .map(r => SnapDoc(r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(0) < splitId))
      .sortBy(_.docId)
    val (first, second) = sig.splitAt(sig.length * 3 / 4) // mid-delta split
    val msB = MemoryStream[SnapDoc]
    val msE = MemoryStream[SnapDoc]
    val qb = StreamingMl.streamingBandHits(msB.toDS())
      .writeStream.format("memory").queryName("t50_band")
      .outputMode("append").start()
    val qe = StreamingMl.streamingExactOwner(msE.toDS())
      .writeStream.format("memory").queryName("t50_owner")
      .outputMode("append").start()
    try {
      msB.addData(first.toSeq); msE.addData(first.toSeq)
      qb.processAllAvailable(); qe.processAllAvailable()
      msB.addData(second.toSeq); msE.addData(second.toSeq)
      qb.processAllAvailable(); qe.processAllAvailable()
      val bands = spark.table("t50_band").as[BandHit].collect()
        .map(b => b.docId -> b.nBandHits).toMap
      val owners = spark.table("t50_owner").as[OwnerHit].collect()
        .map(o => o.docId -> o.baseExact).toMap
      val batch = graft.SparkEntry.queries("t50_incremental_dedup")(
          spark, TestSpark.sf).collect()
        .map { r =>
          r.getLong(0) -> ((if (r.isNullAt(1)) None else Some(r.getLong(1)),
            r.getLong(3)))
        }.toMap
      assert(bands.keySet === batch.keySet, "delta doc sets diverge")
      for ((id, (ex, nb)) <- batch) {
        assert(owners(id) === ex, s"doc $id exact owner")
        assert(bands(id) === nb, s"doc $id band hits")
      }
    } finally { qb.stop(); qe.stop() }
  }

  test("streaming chunk dedup matches the t28 batch keep rule") {
    // feed the t28 chunk fingerprints through two micro-batches in
    // (doc_id, chunk_idx) order — dedup-on-ingest must keep exactly the
    // batch min-owner set and count every copy, wherever the batch
    // boundary lands (per-fingerprint counter state survives the split)
    import spark.implicits._
    import graft.operators.StreamingMl
    import graft.operators.StreamingMl.{ChunkIn, DedupOut}
    implicit val ctx = spark.sqlContext
    val batch = graft.SparkEntry.queries("t28_chunk_dedup")(spark, TestSpark.sf)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_idx")) ->
        (r.getAs[Long]("fp"), r.getAs[Long]("n_copies"), r.getAs[Boolean]("keep")))
      .toMap
    val arrivals = batch.toSeq.sortBy(_._1)
      .map { case ((d, c), (fp, _, _)) => ChunkIn(d, c, fp) }
    val (first, second) = arrivals.splitAt(arrivals.length / 2)
    val ms = MemoryStream[ChunkIn]
    val q = StreamingMl.streamingDedup(ms.toDS())
      .writeStream.format("memory").queryName("chunk_dedup")
      .outputMode("append").start()
    try {
      ms.addData(first); q.processAllAvailable()
      ms.addData(second); q.processAllAvailable()
      val got = spark.table("chunk_dedup").as[DedupOut].collect()
      assert(got.length === batch.size)
      got.foreach { o =>
        val (fp, _, keep) = batch((o.docId, o.chunkIdx))
        assert(o.fp === fp)
        assert(o.keep === keep,
          s"keep mismatch at (${o.docId}, ${o.chunkIdx})")
      }
      // the per-fingerprint counters must agree with the batch copy counts
      val lastSeen = got.groupBy(_.fp).view.mapValues(_.map(_.nSeen).max).toMap
      batch.foreach { case (_, (fp, nCopies, _)) =>
        assert(lastSeen(fp) === nCopies, s"copy count mismatch for fp $fp")
      }
    } finally q.stop()
  }

  test("streaming ingest (filter -> dedup -> pack) matches the t25 batch pipeline") {
    // the full ingest path as ONE streaming query with two chained
    // stateful operators; fed the corpus in doc order over three
    // micro-batches, the emitted pack layout must equal the batch t25
    // result row for row, wherever the batch boundaries land
    import spark.implicits._
    import graft.operators.StreamingMl
    import graft.operators.StreamingMl.{IngestDoc, PackOut}
    implicit val ctx = spark.sqlContext
    val batch = graft.SparkEntry.queries("t25_pipeline_pack")(spark, TestSpark.sf)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("source"), r.getAs[Long]("n_tok"),
         r.getAs[Long]("pack_id"), r.getAs[Long]("pack_offset"),
         r.getAs[Long]("n_chunks")))
      .toMap
    val docs = core.Tables.documents(spark, TestSpark.sf)
      .select("doc_id", "source", "text").collect()
      .map(r => IngestDoc(r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_.docId)
    val thirds = docs.grouped(math.max(1, docs.length / 3 + 1)).toSeq
    val ms = MemoryStream[IngestDoc]
    val q = StreamingMl.streamingIngest(ms.toDS())
      .writeStream.format("memory").queryName("ingest")
      .outputMode("append").start()
    try {
      thirds.foreach { b => ms.addData(b.toSeq); q.processAllAvailable() }
      val got = spark.table("ingest").as[PackOut].collect()
      assert(got.length === batch.size,
        s"survivor count ${got.length} != batch ${batch.size}")
      got.foreach { o =>
        val (src, nTok, packId, off, nChunks) = batch(o.docId)
        assert(o.source === src && o.nTok === nTok && o.packId === packId &&
          o.packOffset === off && o.nChunks === nChunks,
          s"pack layout mismatch at doc ${o.docId}")
      }
    } finally q.stop()
  }

  test("streaming IVF ingest: micro-batch verdicts match the batch twin and SemDedup.prune") {
    // the e04/e16 index's INGEST face: vectors arrive in cid order over
    // three micro-batches; each is assigned to its coarse cell (the SAME
    // argmin code as the batch nearest_centroid expression) and flagged
    // for SemDeDup prune against the cell's earlier members. Wherever
    // the batch boundaries land, the emitted verdicts must equal (a) the
    // batch twin (ivfIngestBatch — the e20 oracle surface) and (b) the
    // declarative SemDedup.prune greedy rule, bit for bit incl. max_cos.
    import spark.implicits._
    import graft.operators.{SemDedup, StreamingMl}
    import graft.operators.StreamingMl.{IvfIn, IvfOut}
    import org.apache.spark.sql.functions._
    implicit val ctx = spark.sqlContext
    graft.expr.GraftFunctions.register(spark)
    val corpus = spark.read.parquet(s"${TestSpark.sf}/embeddings.parquet")
      .select(col("vec_id").as("cid"),
        expr("qquant(embedding, 1e6)").as("qv"))
    val seeds: Array[(Long, Array[Long])] =
      corpus.filter(col("cid") < 8).collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)
    val tau = 45e-2
    val vecs = corpus.collect()
      .map(r => IvfIn(r.getLong(0), r.getSeq[Long](1)))
      .sortBy(_.cid)
    val thirds = vecs.grouped(math.max(1, vecs.length / 3 + 1)).toSeq
    val ms = MemoryStream[IvfIn]
    val q = StreamingMl.streamingIvfIngest(ms.toDS(), seeds, tau)
      .writeStream.format("memory").queryName("ivf_ingest")
      .outputMode("append").start()
    try {
      thirds.foreach { b => ms.addData(b.toSeq); q.processAllAvailable() }
      val got = spark.table("ivf_ingest").as[IvfOut].collect()
        .map(o => o.cid -> o).toMap
      val twin = StreamingMl.ivfIngestBatch(corpus.as[IvfIn], seeds, tau)
        .collect().map(o => o.cid -> o).toMap
      assert(got.size === vecs.length && twin.size === vecs.length)
      vecs.foreach { v =>
        assert(got(v.cid) === twin(v.cid), s"stream/batch twin at ${v.cid}")
      }
      // and against the declarative batch operator (the t29 surface)
      val prune = SemDedup.prune(
          corpus.withColumn("n2", expr("qdot(qv, qv)")),
          SemDedup.seedsOf(corpus, 8), lit(tau))
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
      vecs.foreach { v =>
        val o = got(v.cid)
        val (cell, nNear, pruned, maxCos) = prune(v.cid)
        assert(o.cell === cell && o.nNear === nNear && o.pruned === pruned,
          s"verdict mismatch vs prune at ${v.cid}")
        assert(o.maxCos === maxCos, s"max_cos mismatch at ${v.cid}")
      }
    } finally q.stop()
  }

  test("two-level streaming IVF ingest: initial-state fine seeds, parity with the batch twin and the e21 rule") {
    // the beyond-broadcast ingest face (round-10): tasks close over ONLY
    // the √k coarse seeds; fine seeds arrive as per-coarse-cell INITIAL
    // STATE. Across three micro-batch splits the emitted verdicts must
    // equal the cogroup batch twin (the e21 oracle surface) row for row,
    // and every fine assignment must obey the two-level rule (nearest
    // fine among the row's coarse cell's seeds, ties to the lower id).
    import spark.implicits._
    import graft.operators.StreamingMl
    import graft.operators.StreamingMl.{IvfIn, Ivf2Out}
    import org.apache.spark.sql.functions._
    implicit val ctx = spark.sqlContext
    graft.expr.GraftFunctions.register(spark)
    val corpus = spark.read.parquet(s"${TestSpark.sf}/embeddings.parquet")
      .select(col("vec_id").as("cid"),
        expr("qquant(embedding, 1e6)").as("qv"))
    val coarse: Array[(Long, Array[Long])] =
      corpus.filter(col("cid") < 4).collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)
    val fine = corpus.filter(col("cid") < 24).as[IvfIn]
    val tau = 45e-2
    val vecs = corpus.collect()
      .map(r => IvfIn(r.getLong(0), r.getSeq[Long](1)))
      .sortBy(_.cid)
    val thirds = vecs.grouped(math.max(1, vecs.length / 3 + 1)).toSeq
    val ms = MemoryStream[IvfIn]
    val q = StreamingMl.streamingIvfIngestTwoLevel(ms.toDS(), coarse, fine, tau)
      .writeStream.format("memory").queryName("ivf2_ingest")
      .outputMode("append").start()
    try {
      thirds.foreach { b => ms.addData(b.toSeq); q.processAllAvailable() }
      val got = spark.table("ivf2_ingest").as[Ivf2Out].collect()
        .map(o => o.cid -> o).toMap
      val twin = StreamingMl.ivf2IngestBatch(corpus.as[IvfIn], coarse,
          fine, tau).collect().map(o => o.cid -> o).toMap
      assert(got.size === vecs.length && twin.size === vecs.length)
      vecs.foreach { v =>
        assert(got(v.cid) === twin(v.cid), s"stream/batch twin at ${v.cid}")
      }
      // structural: the fine winner really lives in the row's coarse cell
      val fineCells = graft.operators.SemDedup.assign(
          corpus.filter(col("cid") < 24).select(col("cid"), col("qv")),
          corpus.filter(col("cid") < 4).select(col("cid").as("k"), col("qv")))
        .select(col("cid"), col("k")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      got.values.foreach { o =>
        assert(fineCells(o.fine) === o.cell,
          s"fine ${o.fine} not in coarse cell ${o.cell} (cid ${o.cid})")
      }
    } finally q.stop()
  }

  test("out-of-order delivery: loud violation counter, arrival-order verdicts (round-10)") {
    // the r9 "silent arrival-order assumption" finding: a batch delivered
    // out of order must (a) bump StreamingMl.orderViolations and (b) keep
    // verdicts DETERMINISTIC for the order actually delivered —
    // first-ARRIVAL-wins, not first-id-wins. Ordered input keeps the
    // counter at zero (and batch parity, proven by the other cases).
    import spark.implicits._
    import graft.operators.StreamingMl
    import graft.operators.StreamingMl.{ChunkIn, DedupOut}
    implicit val ctx = spark.sqlContext
    val viol = StreamingMl.orderViolations(spark)
    val v0 = viol.value
    val ms = MemoryStream[ChunkIn]
    val q = StreamingMl.streamingDedup(ms.toDS())
      .writeStream.format("memory").queryName("ooo_dedup")
      .outputMode("append").start()
    try {
      // batch 1: docs 10 and 11 share fp 7 — doc 10 keeps
      ms.addData(Seq(ChunkIn(10L, 0L, 7L), ChunkIn(11L, 0L, 7L)))
      q.processAllAvailable()
      assert(viol.value === v0, "ordered delivery must not count")
      // batch 2 arrives LATE: doc 5 (same fp) regresses below maxDoc=11
      ms.addData(Seq(ChunkIn(5L, 0L, 7L)))
      q.processAllAvailable()
      assert(viol.value === v0 + 1, "late arrival must be counted loudly")
      val got = spark.table("ooo_dedup").as[DedupOut].collect()
        .map(o => o.docId -> o).toMap
      // first-ARRIVAL-wins: 10 kept; 11 and the late 5 are dups
      assert(got(10L).keep && got(10L).nSeen === 1L)
      assert(!got(11L).keep && got(11L).nSeen === 2L)
      assert(!got(5L).keep && got(5L).nSeen === 3L)
    } finally q.stop()
  }

  test("reordered dedup: disorder INSIDE the horizon is corrected — " +
      "verdicts bit-identical to ordered delivery, zero violations") {
    import spark.implicits._
    import graft.operators.StreamingMl
    import graft.operators.StreamingMl.{TsChunkIn, TsDedupOut}
    implicit val ctx = spark.sqlContext
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    val r1 = TsChunkIn(1L, 0L, 1L, ts(100000L))
    val r2 = TsChunkIn(2L, 0L, 1L, ts(200000L))
    val r3 = TsChunkIn(3L, 0L, 1L, ts(300000L))
    // fp-99 sentinels only advance the GLOBAL watermark so buffered fp-1
    // verdicts drain via event-time timeouts (watermark updates become
    // visible one batch later — hence a run of them)
    val sent = (1 to 3).map(i => TsChunkIn(90L + i, 0L, 99L,
      ts(1000000L + i * 100000L)))
    def run(name: String, batches: Seq[Seq[TsChunkIn]])
        : Map[(Long, Long), TsDedupOut] = {
      val ms = MemoryStream[TsChunkIn]
      val q = StreamingMl.streamingDedupReordered(ms.toDS(), "150 seconds")
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        batches.foreach { b => ms.addData(b); q.processAllAvailable() }
        spark.table(name).as[TsDedupOut].collect()
          .filter(_.fp === 1L).map(o => (o.docId, o.chunkIdx) -> o).toMap
      } finally q.stop()
    }
    val viol = StreamingMl.orderViolations(spark)
    val v0 = viol.value
    val ordered = run("rd_ordered",
      Seq(Seq(r1), Seq(r2), Seq(r3)) ++ sent.map(Seq(_)))
    assert(ordered.size === 3)
    assert(ordered((1L, 0L)).keep && ordered((1L, 0L)).nSeen === 1L)
    assert(!ordered((2L, 0L)).keep && ordered((2L, 0L)).nSeen === 2L)
    assert(!ordered((3L, 0L)).keep && ordered((3L, 0L)).nSeen === 3L)
    assert(ordered.values.forall(!_.late))
    // the SAME rows, r1 delivered a batch LATE but inside the 150 s
    // horizon (watermark at its arrival = 50 s < its 100 s event time)
    val shuffled = run("rd_shuffled",
      Seq(Seq(r2), Seq(r1, r3)) ++ sent.map(Seq(_)))
    assert(shuffled === ordered,
      "in-horizon disorder must yield bit-identical verdicts")
    assert(viol.value === v0,
      "in-horizon disorder is CORRECTED, never counted")
  }

  test("reordered dedup: ANY in-horizon delivery order yields the " +
      "ordered verdicts (seeded random permutations)") {
    import spark.implicits._
    import graft.operators.StreamingMl
    import graft.operators.StreamingMl.{TsChunkIn, TsDedupOut}
    implicit val ctx = spark.sqlContext
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    // two fingerprints, interleaved event times, all inside one horizon
    val rows = (0 until 8).map(i =>
      TsChunkIn(i.toLong, 0L, 1L + i % 2, ts(100000L + i * 100000L)))
    val sent = (1 to 3).map(i =>
      TsChunkIn(90L + i, 0L, 99L, ts(5000000L + i * 1000000L)))
    def run(name: String, batches: Seq[Seq[TsChunkIn]])
        : Map[(Long, Long), (Long, Boolean, Boolean)] = {
      val ms = MemoryStream[TsChunkIn]
      val q = StreamingMl
        .streamingDedupReordered(ms.toDS(), "1000 seconds")
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        batches.foreach { b => ms.addData(b); q.processAllAvailable() }
        spark.table(name).as[TsDedupOut].collect().filter(_.fp < 99L)
          .map(o => (o.fp, o.docId) -> ((o.nSeen, o.keep, o.late))).toMap
      } finally q.stop()
    }
    val viol = StreamingMl.orderViolations(spark)
    val v0 = viol.value
    val ordered = run("rdp_ordered", rows.map(Seq(_)) ++ sent.map(Seq(_)))
    assert(ordered.size === 8)
    val rnd = new scala.util.Random(11)
    (1 to 4).foreach { trial =>
      val shuffled = rnd.shuffle(rows)
      // random batch boundaries over the random order
      val cuts = Seq(rnd.nextInt(7) + 1, rnd.nextInt(7) + 1).sorted
      val batches = Seq(shuffled.slice(0, cuts(0)),
        shuffled.slice(cuts(0), cuts(1)), shuffled.slice(cuts(1), 8))
        .filter(_.nonEmpty)
      val got = run(s"rdp_t$trial", batches ++ sent.map(Seq(_)))
      assert(got === ordered, s"trial $trial order ${shuffled.map(_.docId)}")
    }
    assert(viol.value === v0, "in-horizon permutations must not count")
  }

  test("reordered packing: in-horizon disorder yields the ordered " +
      "layout; a straggler appends at the tail and is counted") {
    import spark.implicits._
    import graft.operators.StreamingMl
    import graft.operators.StreamingMl.{TsDocIn, TsPackOut}
    implicit val ctx = spark.sqlContext
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    val toks = Seq(5L, 7L, 9L, 20L, 3L, 6L)
    val docs = toks.zipWithIndex.map { case (t, i) =>
      TsDocIn("web", 0L, i.toLong, t, ts(100000L + i * 100000L)) }
    val sent = (1 to 3).map(i =>
      TsDocIn("snt", 9L, 90L + i, 1L, ts(5000000L + i * 1000000L)))
    // the batch t20 rule: head-to-tail cumsum in doc (= event-time) order
    val cap = 16L
    val expect = toks.scanLeft(0L)(_ + _).zip(toks).zipWithIndex.map {
      case ((start, t), i) => i.toLong ->
        ((start / cap, start % cap, (start + t - 1) / cap - start / cap + 1))
    }.toMap
    def run(name: String, batches: Seq[Seq[TsDocIn]])
        : Map[Long, (Long, Long, Long, Boolean)] = {
      val ms = MemoryStream[TsDocIn]
      val q = StreamingMl
        .streamingPackingReordered(ms.toDS(), cap, "150 seconds")
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        batches.foreach { b => ms.addData(b); q.processAllAvailable() }
        spark.table(name).as[TsPackOut].collect().filter(_.source == "web")
          .map(o => o.docId ->
            ((o.packId, o.packOffset, o.nChunks, o.late))).toMap
      } finally q.stop()
    }
    val viol = StreamingMl.orderViolations(spark)
    val v0 = viol.value
    // disorder inside the 150 s horizon: d1 delivered after d2, d4
    // after d5 — layout must still be the ordered cumsum
    val got = run("rp_shuffled", Seq(
      Seq(docs(0)), Seq(docs(2), docs(1)), Seq(docs(3)),
      Seq(docs(5), docs(4))) ++ sent.map(Seq(_)))
    assert(got.size === 6)
    expect.foreach { case (id, (p, off, nc)) =>
      assert(got(id) === ((p, off, nc, false)), s"doc $id layout")
    }
    assert(viol.value === v0, "in-horizon disorder is corrected")
    // straggler: a doc with ts far behind the sealed frontier appends
    // at the CURRENT tail (after all 50 packed tokens), flagged + counted
    val ms2 = MemoryStream[TsDocIn]
    val q2 = StreamingMl
      .streamingPackingReordered(ms2.toDS(), cap, "150 seconds")
      .writeStream.format("memory").queryName("rp_late")
      .outputMode("append").start()
    try {
      docs.foreach { d => ms2.addData(Seq(d)); q2.processAllAvailable() }
      sent.foreach { s0 => ms2.addData(Seq(s0)); q2.processAllAvailable() }
      val vPre = viol.value
      ms2.addData(Seq(TsDocIn("web", 0L, 99L, 4L, ts(90000L))))
      q2.processAllAvailable()
      val out = spark.table("rp_late").as[TsPackOut].collect()
        .filter(_.source == "web").map(o => o.docId -> o).toMap
      if (out.contains(99L)) {
        assert(viol.value === vPre + 1, "straggler must be counted")
        val o = out(99L)
        val total = toks.sum // 50 — the straggler starts at the tail
        assert(o.late && o.packId === total / cap &&
          o.packOffset === total % cap)
      } else {
        val dropped = Option(q2.lastProgress).toSeq
          .flatMap(_.stateOperators).map(_.numRowsDroppedByWatermark).sum
        assert(dropped >= 1, "straggler neither emitted nor engine-dropped")
      }
      expect.foreach { case (id, (p, off, nc)) =>
        assert(out(id).packId === p && out(id).packOffset === off &&
          out(id).nChunks === nc, s"sealed layout for doc $id must hold")
      }
    } finally q2.stop()
  }

  test("reordered dedup: a straggler OUTSIDE the horizon is counted, " +
      "never the keeper") {
    import spark.implicits._
    import graft.operators.StreamingMl
    import graft.operators.StreamingMl.{TsChunkIn, TsDedupOut}
    implicit val ctx = spark.sqlContext
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    val viol = StreamingMl.orderViolations(spark)
    val ms = MemoryStream[TsChunkIn]
    val q = StreamingMl.streamingDedupReordered(ms.toDS(), "150 seconds")
      .writeStream.format("memory").queryName("rd_late")
      .outputMode("append").start()
    try {
      ms.addData(Seq(TsChunkIn(1L, 0L, 1L, ts(100000L))))
      q.processAllAvailable()
      // advance the watermark far past fp-1's buffered row so it seals
      (1 to 3).foreach { i =>
        ms.addData(Seq(TsChunkIn(90L + i, 0L, 99L, ts(1000000L + i * 1000L))))
        q.processAllAvailable()
      }
      val sealedRows = spark.table("rd_late").as[TsDedupOut].collect()
        .filter(_.fp === 1L)
      assert(sealedRows.length === 1 && sealedRows.head.keep,
        s"fp-1 row must have sealed before the straggler: ${sealedRows.toSeq}")
      val v0 = viol.value
      val dropped0 = Option(q.lastProgress).toSeq
        .flatMap(_.stateOperators).map(_.numRowsDroppedByWatermark).sum
      // straggler: event time 90 s, far behind the ~850 s watermark
      ms.addData(Seq(TsChunkIn(0L, 0L, 1L, ts(90000L))))
      q.processAllAvailable()
      val got = spark.table("rd_late").as[TsDedupOut].collect()
        .filter(_.fp === 1L).map(o => o.docId -> o).toMap
      val droppedNow = Option(q.lastProgress).toSeq
        .flatMap(_.stateOperators).map(_.numRowsDroppedByWatermark).sum
      // the straggler is COUNTED exactly once — either by the operator's
      // own late path (reached the function: flagged, folded, never the
      // keeper) or by the engine's watermark filter (standard Structured
      // Streaming drop, visible in the progress metrics); both are loud
      info(s"straggler path: emitted=${got.contains(0L)} " +
        s"engineDropped=${droppedNow - dropped0} " +
        s"violations=${viol.value - v0}")
      if (got.contains(0L)) {
        assert(viol.value === v0 + 1, "straggler must hit orderViolations")
        assert(got(0L).late && !got(0L).keep && got(0L).nSeen === 2L)
      } else {
        assert(droppedNow === dropped0 + 1,
          s"straggler neither emitted nor in numRowsDroppedByWatermark " +
            s"($dropped0 -> $droppedNow, viol ${v0} -> ${viol.value})")
      }
      assert(got(1L).keep, "the sealed keeper must not change")
    } finally q.stop()
  }

  test("reordered attribution: ordered delivery through the reorder face " +
      "matches the batch s22 window over the real events") {
    import spark.implicits._
    import graft.operators.EventOps
    import graft.operators.EventOps.{TsTypedEv, TsAttrOut}
    implicit val ctx = spark.sqlContext
    val evs = graft.core.Tables.events(spark, TestSpark.sf)
      .select(col("user_id"), expr("ts div 1000").as("tus"),
        col("event_id"), col("event_type"), expr("ts div 1000000").as("tms"))
      .collect()
      .map(r => TsTypedEv(r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), new java.sql.Timestamp(r.getLong(4))))
      .sortBy(e => (e.tus, e.eventId))
    val maxMs = evs.map(_.ts.getTime).max
    val sent = (1 to 3).map(i => TsTypedEv(999999L, 0L, 900000L + i, "noop",
      new java.sql.Timestamp(maxMs + i * 100000L)))
    val viol = graft.operators.StreamingMl.orderViolations(spark)
    val v0 = viol.value
    val ms = MemoryStream[TsTypedEv]
    val q = EventOps.streamingAttributionReordered(ms.toDS(), "10 seconds")
      .writeStream.format("memory").queryName("attr_ro")
      .outputMode("append").start()
    try {
      val (first, second) = evs.splitAt(evs.length / 2)
      ms.addData(first.toSeq); q.processAllAvailable()
      ms.addData(second.toSeq); q.processAllAvailable()
      sent.foreach { s0 => ms.addData(Seq(s0)); q.processAllAvailable() }
      val rows = spark.table("attr_ro").as[TsAttrOut].collect()
      val got = rows.map(a => a.eventId -> ((a.ltId, a.ftId, a.gapUs))).toMap
      assert(got === attrExpected(TestSpark.sf))
      assert(rows.forall(!_.late))
      assert(viol.value === v0, "ordered delivery must not count")
    } finally q.stop()
  }

  test("reordered attribution: ANY in-horizon delivery order yields the " +
      "ordered credits; stragglers counted, sealed credits hold") {
    import spark.implicits._
    import graft.operators.EventOps
    import graft.operators.EventOps.{TsTypedEv, TsAttrOut}
    implicit val ctx = spark.sqlContext
    def ev(id: Long, typ: String, sec: Long) = TsTypedEv(1L, sec * 1000000L,
      id, typ, new java.sql.Timestamp(sec * 1000L))
    val rows = Seq(
      ev(1, "view", 100), ev(2, "click", 200), ev(3, "purchase", 300),
      ev(4, "click", 400), ev(5, "purchase", 500), ev(6, "view", 600),
      ev(7, "purchase", 700))
    val sent = (1 to 3).map(i => TsTypedEv(99L, 0L, 90L + i, "noop",
      new java.sql.Timestamp(100000000L + i * 1000000L)))
    def run(name: String, batches: Seq[Seq[TsTypedEv]], horizon: String)
        : Map[Long, (Option[Long], Option[Long], Option[Long], Boolean)] = {
      val ms = MemoryStream[TsTypedEv]
      val q = EventOps.streamingAttributionReordered(ms.toDS(), horizon)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        batches.foreach { b => ms.addData(b); q.processAllAvailable() }
        spark.table(name).as[TsAttrOut].collect()
          .map(a => a.eventId -> ((a.ltId, a.ftId, a.gapUs, a.late))).toMap
      } finally q.stop()
    }
    val viol = graft.operators.StreamingMl.orderViolations(spark)
    val v0 = viol.value
    val ordered =
      run("ra_ordered", rows.map(Seq(_)) ++ sent.map(Seq(_)), "1000 seconds")
    // the batch s22 window credits, hand-derived
    assert(ordered === Map(
      3L -> ((Some(2L), Some(1L), Some(100000000L), false)),
      5L -> ((Some(4L), Some(1L), Some(100000000L), false)),
      7L -> ((Some(6L), Some(1L), Some(100000000L), false))))
    val rnd = new scala.util.Random(7)
    (1 to 4).foreach { trial =>
      val shuffled = rnd.shuffle(rows)
      val cuts = Seq(rnd.nextInt(6) + 1, rnd.nextInt(6) + 1).sorted
      val batches = Seq(shuffled.slice(0, cuts(0)),
        shuffled.slice(cuts(0), cuts(1)), shuffled.slice(cuts(1), 7))
        .filter(_.nonEmpty)
      val got = run(s"ra_t$trial", batches ++ sent.map(Seq(_)),
        "1000 seconds")
      assert(got === ordered,
        s"trial $trial order ${shuffled.map(_.eventId)}")
    }
    assert(viol.value === v0, "in-horizon permutations must not count")
    // stragglers OUTSIDE the horizon: a late touch updates state forward
    // only; a late purchase credits the state as of its arrival — sealed
    // purchases keep their emitted credit either way
    val ms2 = MemoryStream[TsTypedEv]
    val q2 = EventOps.streamingAttributionReordered(ms2.toDS(), "150 seconds")
      .writeStream.format("memory").queryName("ra_late")
      .outputMode("append").start()
    try {
      rows.foreach { r => ms2.addData(Seq(r)); q2.processAllAvailable() }
      sent.foreach { s0 => ms2.addData(Seq(s0)); q2.processAllAvailable() }
      val vPre = viol.value
      ms2.addData(Seq(ev(8, "click", 120), ev(9, "purchase", 130)))
      q2.processAllAvailable()
      val out = spark.table("ra_late").as[TsAttrOut].collect()
        .map(a => a.eventId -> a).toMap
      if (out.contains(9L)) {
        // operator-path straggler: counted, flagged, credited at arrival
        assert(viol.value === vPre + 2, "both stragglers must be counted")
        val o = out(9L)
        assert(o.late && o.ltId === Some(8L) && o.ftId === Some(1L) &&
          o.gapUs === Some(10000000L))
      } else {
        val dropped = Option(q2.lastProgress).toSeq
          .flatMap(_.stateOperators).map(_.numRowsDroppedByWatermark).sum
        assert(dropped >= 2, "stragglers neither emitted nor engine-dropped")
      }
      // the sealed purchases' credits are immutable under the backfill
      Seq(3L, 5L, 7L).foreach { id =>
        assert(out(id).ltId === ordered(id)._1 &&
          out(id).ftId === ordered(id)._2 && !out(id).late, s"purchase $id")
      }
    } finally q2.stop()
  }

  test("reordered transitions: in-horizon disorder yields the batch s15 " +
      "pair multiset; ordered real-events delivery matches the oracle face") {
    import spark.implicits._
    import graft.operators.EventOps
    import graft.operators.EventOps.{TsTypedEv, TsTransOut}
    implicit val ctx = spark.sqlContext
    // real events through the reorder face, ordered: must equal the s15
    // batch LAG pair counts (the registry oracle face)
    val evs = graft.core.Tables.events(spark, TestSpark.sf)
      .select(col("user_id"), expr("ts div 1000").as("tus"),
        col("event_id"), col("event_type"), expr("ts div 1000000").as("tms"))
      .collect()
      .map(r => TsTypedEv(r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), new java.sql.Timestamp(r.getLong(4))))
      .sortBy(e => (e.tus, e.eventId))
    val maxMs = evs.map(_.ts.getTime).max
    val sent = (1 to 3).map(i => TsTypedEv(999999L, 0L, 910000L + i, "noop",
      new java.sql.Timestamp(maxMs + i * 100000L)))
    def run(name: String, batches: Seq[Seq[TsTypedEv]], horizon: String)
        : Map[(String, String), Long] = {
      val ms = MemoryStream[TsTypedEv]
      val q = EventOps.streamingTransitionsReordered(ms.toDS(), horizon)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        batches.foreach { b => ms.addData(b); q.processAllAvailable() }
        spark.table(name).as[TsTransOut].collect()
          .filter(t => t.prevType != "noop" && t.eventType != "noop")
          .groupBy(t => (t.prevType, t.eventType))
          .view.mapValues(_.length.toLong).toMap
      } finally q.stop()
    }
    val viol = graft.operators.StreamingMl.orderViolations(spark)
    val v0 = viol.value
    val (first, second) = evs.splitAt(evs.length / 2)
    val got = run("tr_ro", Seq(first.toSeq, second.toSeq) ++ sent.map(Seq(_)),
      "10 seconds")
    val batch = graft.SparkEntry.queries("s15_markov_transitions")(
        spark, TestSpark.sf).collect()
      .map(r => (r.getAs[String]("prev_type"), r.getAs[String]("event_type")) ->
        r.getAs[Long]("n")).toMap
    assert(got === batch)
    assert(viol.value === v0)
    // synthetic chain: ANY in-horizon permutation yields the ordered pairs
    def ev(id: Long, typ: String, sec: Long) = TsTypedEv(1L, sec * 1000000L,
      id, typ, new java.sql.Timestamp(sec * 1000L))
    val chain = Seq(ev(1, "a", 100), ev(2, "b", 200), ev(3, "a", 300),
      ev(4, "c", 400), ev(5, "b", 500))
    val chainSent = (1 to 3).map(i => TsTypedEv(99L, 0L, 90L + i, "noop",
      new java.sql.Timestamp(100000000L + i * 1000000L)))
    val ordered = run("tr_ord", chain.map(Seq(_)) ++ chainSent.map(Seq(_)),
      "1000 seconds")
    assert(ordered === Map(("a", "b") -> 1L, ("b", "a") -> 1L,
      ("a", "c") -> 1L, ("c", "b") -> 1L))
    val rnd = new scala.util.Random(13)
    (1 to 3).foreach { trial =>
      val shuffled = rnd.shuffle(chain)
      val cut = rnd.nextInt(4) + 1
      val got2 = run(s"tr_t$trial",
        Seq(shuffled.take(cut), shuffled.drop(cut)) ++ chainSent.map(Seq(_)),
        "1000 seconds")
      assert(got2 === ordered, s"trial $trial ${shuffled.map(_.eventId)}")
    }
    assert(viol.value === v0, "in-horizon permutations must not count")
  }

  test("reordered IVF ingest: in-horizon disorder yields the batch e20 " +
      "verdicts bit for bit; a straggler is counted and never un-prunes") {
    import spark.implicits._
    import graft.operators.StreamingMl
    import graft.operators.StreamingMl.{IvfIn, TsIvfIn, TsIvfOut}
    import org.apache.spark.sql.functions._
    implicit val ctx = spark.sqlContext
    graft.expr.GraftFunctions.register(spark)
    val corpus = spark.read.parquet(s"${TestSpark.sf}/embeddings.parquet")
      .select(col("vec_id").as("cid"),
        expr("qquant(embedding, 1e6)").as("qv"))
    val seeds: Array[(Long, Array[Long])] =
      corpus.filter(col("cid") < 8).collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)
    val tau = 45e-2
    // event time follows cid order: vector cid has ts = 100s + cid*100s
    val vecs = corpus.collect()
      .map(r => TsIvfIn(r.getLong(0), r.getSeq[Long](1),
        new java.sql.Timestamp(100000L + r.getLong(0) * 100000L)))
      .sortBy(_.cid)
    val maxMs = vecs.map(_.ts.getTime).max
    val sent = (1 to 3).map(i => TsIvfIn(-1000L - i, vecs.head.qv,
      new java.sql.Timestamp(maxMs + 100000000L + i * 1000000L)))
    def run(name: String, batches: Seq[Seq[TsIvfIn]])
        : Map[Long, (Long, Long, Boolean, Option[Double], Boolean)] = {
      val ms = MemoryStream[TsIvfIn]
      val q = StreamingMl
        .streamingIvfIngestReordered(ms.toDS(), seeds, tau, "150 seconds")
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        batches.foreach { b => ms.addData(b); q.processAllAvailable() }
        spark.table(name).as[TsIvfOut].collect().filter(_.cid >= 0)
          .map(o => o.cid -> ((o.cell, o.nNear, o.pruned, o.maxCos, o.late)))
          .toMap
      } finally q.stop()
    }
    val viol = StreamingMl.orderViolations(spark)
    val v0 = viol.value
    val twin = StreamingMl.ivfIngestBatch(
        corpus.as[IvfIn], seeds, tau)
      .collect().map(o => o.cid -> o).toMap
    // disorder INSIDE the horizon: adjacent pairs swapped across batches
    val swapped = vecs.grouped(2).flatMap(_.reverse).toSeq
    val batches = swapped.grouped(math.max(1, swapped.length / 4 + 1)).toSeq
    val got = run("ivf_ro", batches ++ sent.map(Seq(_)))
    assert(got.size === vecs.length)
    vecs.foreach { v =>
      val t = twin(v.cid)
      assert(got(v.cid) === ((t.cell, t.nNear, t.pruned, t.maxCos, false)),
        s"verdict vs batch twin at ${v.cid}")
    }
    assert(viol.value === v0, "in-horizon disorder is corrected")
    // straggler far outside the horizon: counted (or engine-dropped),
    // flagged late, and sealed verdicts hold
    val ms2 = MemoryStream[TsIvfIn]
    val q2 = StreamingMl
      .streamingIvfIngestReordered(ms2.toDS(), seeds, tau, "150 seconds")
      .writeStream.format("memory").queryName("ivf_ro_late")
      .outputMode("append").start()
    try {
      vecs.grouped(64).foreach { b => ms2.addData(b.toSeq); q2.processAllAvailable() }
      sent.foreach { s0 => ms2.addData(Seq(s0)); q2.processAllAvailable() }
      val vPre = viol.value
      val stale = TsIvfIn(900000L, vecs.head.qv,
        new java.sql.Timestamp(90000L))
      ms2.addData(Seq(stale)); q2.processAllAvailable()
      val out = spark.table("ivf_ro_late").as[TsIvfOut].collect()
        .map(o => o.cid -> o).toMap
      if (out.contains(900000L)) {
        assert(viol.value === vPre + 1)
        assert(out(900000L).late)
        // a copy of vec 0 folded LAST: prunes against the full index,
        // never un-prunes anything already emitted
        assert(out(900000L).pruned)
      } else {
        val dropped = Option(q2.lastProgress).toSeq
          .flatMap(_.stateOperators).map(_.numRowsDroppedByWatermark).sum
        assert(dropped >= 1, "straggler neither emitted nor engine-dropped")
      }
      vecs.take(8).foreach { v =>
        val t = twin(v.cid)
        assert(out(v.cid).pruned === t.pruned && out(v.cid).nNear === t.nNear,
          s"sealed verdict at ${v.cid}")
      }
    } finally q2.stop()
  }
}

/** Flattened MS sample for the A7 streaming-face test (package level so
  * spark.implicits can derive its encoder). */
case class AvgSample(ts: java.sql.Timestamp, ant1: Long, ant2: Long,
                     chan: Long, vre: Double, vim: Double, w: Double,
                     flg: Boolean)

case class AvgSampleC(ts: java.sql.Timestamp, ant1: Long, ant2: Long,
                      chan: Long, corr: Long, vre: Double, w: Double,
                      flg: Boolean)
