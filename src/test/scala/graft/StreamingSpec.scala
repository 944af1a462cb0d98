package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.kg.KgPipeline

/** Structured Streaming ingest: the extraction expression under a
  * watermarked windowed aggregation, driven by a MemoryStream. */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(minute: Int) = new Timestamp(1735689600000L + minute * 60000L)

  test("streaming concept counts: windowed, watermarked, tool turns dropped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Int, String, String, Option[String], Timestamp)]
    val transcripts = input
      .toDF()
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")

    val counts = graft.streaming.StreamingIngest
      .conceptCountsStream(spark, transcripts, KgPipeline.defaultConcepts)

    val query = counts.writeStream
      .format("memory")
      .queryName("concept_counts_stream")
      .outputMode(OutputMode.Update)
      .start()
    try {
      input.addData(
        ("c1", 0, "user", "the table scan and the hash join", None, ts(0)),
        ("c1", 1, "tool", "spark spark spark", Some("search"), ts(0)), // dropped
        ("c2", 0, "assistant", "a window and another window", None, ts(1))
      )
      query.processAllAvailable()
      val got = spark
        .table("concept_counts_stream")
        .select("concept_id", "n_mentions")
        .collect()
        .map(r => r.getString(0) -> r.getLong(1))
        .toMap
      assert(got("Q10") == 1) // table scan
      assert(got("Q11") == 1) // hash join
      assert(got("Q14") == 1) // window concept: present once in c2's turn (edge grain)
      assert(!got.contains("Q15")) // tool turn dropped
    } finally query.stop()
  }

  test("streaming mention edges: stateless append transform") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Int, String, String, Option[String], Timestamp)]
    val transcripts = input.toDF().toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val edges = graft.streaming.StreamingIngest
      .mentionEdgesStream(spark, transcripts, KgPipeline.defaultConcepts)
    val query = edges.writeStream
      .format("memory")
      .queryName("edges_stream")
      .outputMode(OutputMode.Append)
      .start()
    try {
      input.addData(("c9", 3, "user", "sort table then sort", None, ts(0)))
      query.processAllAvailable()
      val got = spark.table("edges_stream").collect().map(r => (r.getString(0), r.getString(2)))
      // negative label "sort table" kills the first sort; the bare sort survives
      assert(got.toSeq == Seq(("c9_3", "Q13")))
    } finally query.stop()
  }

  test("streaming sessionization: native session windows close at the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Timestamp)]
    val events = input.toDF().toDF("user_id", "ts")
    val sessions = graft.streaming.StreamingIngest
      .sessionCountsStream(spark, events, gap = "30 minutes", watermarkDelay = "10 minutes")
    val query = sessions.writeStream
      .format("memory")
      .queryName("sessions_stream")
      .outputMode(OutputMode.Append)
      .start()
    try {
      // user u1: burst at t0..t0+10m (one session), burst at t0+2h..+2h5m
      // (second session); u2 event far in the future advances the watermark
      // past both sessions' ends so append mode emits them
      input.addData(("u1", ts(0)), ("u1", ts(10)), ("u1", ts(120)), ("u1", ts(125)))
      query.processAllAvailable()
      input.addData(("u2", ts(600)))
      query.processAllAvailable()
      val got = spark
        .table("sessions_stream")
        .collect()
        .map(r => (r.getString(0), r.getLong(3)))
        .toSeq
        .sorted
      assert(got == Seq(("u1", 2L), ("u1", 2L)), s"got $got")
    } finally query.stop()
  }

  test("streaming HLL registers: batch parity after each batch, replays absorbed") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Int, String, String, Option[String], Timestamp)]
    val transcripts = input.toDF().toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val regs = graft.streaming.StreamingIngest.hllRegistersStream(transcripts, m = 64)
    val query = regs.writeStream
      .format("memory")
      .queryName("hll_stream")
      .outputMode(OutputMode.Complete)
      .start()
    try {
      def batchRegs(texts: Seq[String]) =
        graft.data.Sketches
          .hllRegisters(texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"), m = 64)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1)))
          .toMap
      def streamRegs() = spark
        .table("hll_stream")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .toMap

      val t1 = Seq("alpha beta gamma delta", "beta gamma epsilon zeta")
      input.addData(t1.zipWithIndex.map { case (t, i) => ("c1", i, "user", t, None: Option[String], ts(i)) }: _*)
      query.processAllAvailable()
      assert(streamRegs() === batchRegs(t1), "prefix parity after batch 1")

      // second micro-batch extends the stream; a verbatim REPLAY of batch 1
      // rides along and must not change any register (MAX is idempotent)
      val t2 = Seq("eta theta iota kappa lambda")
      input.addData((t1 ++ t2).zipWithIndex.map { case (t, i) =>
        ("c2", i, "user", t, None: Option[String], ts(10 + i))
      }: _*)
      query.processAllAvailable()
      assert(streamRegs() === batchRegs(t1 ++ t2), "prefix parity incl. replayed rows")
    } finally query.stop()
  }

  test("streaming CMS counters: batch parity after each batch, point estimates one-sided") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Int, String, String, Option[String], Timestamp)]
    val transcripts = input.toDF().toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val counters = graft.streaming.StreamingIngest.cmsCountersStream(transcripts, w = 64, d = 3)
    val query = counters.writeStream
      .format("memory")
      .queryName("cms_stream")
      .outputMode(OutputMode.Complete)
      .start()
    try {
      def batchCms(texts: Seq[String]) =
        graft.data.Sketches
          .cmsCounters(texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"), w = 64, d = 3)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
          .toSet
      def streamCms() = spark
        .table("cms_stream")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet

      val t1 = Seq("alpha beta gamma alpha", "beta gamma delta epsilon")
      input.addData(t1.zipWithIndex.map { case (t, i) => ("c1", i, "user", t, None: Option[String], ts(i)) }: _*)
      query.processAllAvailable()
      assert(streamCms() === batchCms(t1), "prefix parity after batch 1")

      // second micro-batch: the counter table must now equal the batch
      // sketch of EVERYTHING seen — SUM state accumulates, it does not
      // absorb duplicates the way the HLL/MG MAX states do (documented)
      val t2 = Seq("alpha zeta eta theta", "alpha beta")
      input.addData(t2.zipWithIndex.map { case (t, i) => ("c2", i, "user", t, None: Option[String], ts(10 + i)) }: _*)
      query.processAllAvailable()
      assert(streamCms() === batchCms(t1 ++ t2), "prefix parity after batch 2")

      // the live counter table answers point queries with the batch
      // guarantee: never below the true stream count
      val est = (tok: String) =>
        graft.data.Sketches.cmsEstimate(streamCms().toSeq, w = 64, d = 3, tok)
      assert(est("alpha") >= 4L)
      assert(est("beta") >= 3L)
      assert(est("theta") >= 1L)
    } finally query.stop()
  }

  test("streaming KMV bottom-k: batch parity after each batch, replays absorbed") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Int, String, String, Option[String], Timestamp)]
    val transcripts = input.toDF().toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val k = 16
    val sketch = graft.streaming.StreamingIngest.kmvStream(transcripts, k)
    val query = sketch.writeStream
      .format("memory")
      .queryName("kmv_stream")
      .outputMode(OutputMode.Complete)
      .start()
    try {
      def batchKmv(texts: Seq[String]): Seq[Long] =
        graft.data.Sketches
          .kmvBottomKOf(
            texts.flatMap(_.split("\\s+")).filter(_.nonEmpty).toDF("tok"),
            k)
          .collect()
          .map(_.getLong(0))
          .toSeq
          .sorted
      def streamKmv(): Seq[Long] =
        spark.table("kmv_stream").collect()(0).getSeq[Long](0).toSeq

      // > k distinct tokens so the buffer genuinely evicts
      val t1 = (0 until 30).map(i => s"tok_$i other_$i")
      input.addData(t1.zipWithIndex.map { case (t, i) => ("c1", i, "user", t, None: Option[String], ts(i)) }: _*)
      query.processAllAvailable()
      assert(streamKmv() === batchKmv(t1), "prefix parity after batch 1")
      assert(streamKmv().size == k)

      // second batch includes REPLAYED rows — bottom-k is min-like, so the
      // state must equal the batch sketch of the distinct union
      val t2 = t1.take(5) ++ (30 until 45).map(i => s"tok_$i")
      input.addData(t2.zipWithIndex.map { case (t, i) => ("c2", i, "user", t, None: Option[String], ts(100 + i)) }: _*)
      query.processAllAvailable()
      assert(streamKmv() === batchKmv(t1 ++ t2), "prefix parity incl. replayed rows")

      // the live sketch answers the distinct-count estimate with the batch
      // estimator (same hash domain, same arithmetic)
      val est = graft.data.Sketches.kmvEstimate(streamKmv(), k)
      val truth = (t1 ++ t2).flatMap(_.split("\\s+")).filter(_.nonEmpty).distinct.size
      assert(est > truth * 0.3 && est < truth * 3.0, s"estimate $est vs truth $truth")
    } finally query.stop()
  }

  test("streaming MG summaries: bounded state, superset + undercount bound after each batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Int, String, String, Option[String], Timestamp)]
    val transcripts = input.toDF().toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val k = 8
    val groups = 4
    val summaries = graft.streaming.StreamingIngest.mgSummariesStream(transcripts, k, groups)
    val query = summaries.writeStream
      .format("memory")
      .queryName("mg_stream")
      .outputMode(OutputMode.Complete)
      .start()
    try {
      // skewed token stream: token_i frequency ~ 1/(i+1), far more than
      // groups*k distinct tokens so the summaries genuinely compact
      // irregular whitespace (leading / double / trailing spaces) must NOT
      // produce "" candidates or inflate any group's mass n
      def texts(round: Int): Seq[String] =
        (0 until 50).map(i => " " + (0 until 200).filter(j => j % (i + 1) == round % (i + 1)).map(j => s"tok_$j").mkString("  ") + " ")
      val seen = scala.collection.mutable.ArrayBuffer.empty[String]
      for (round <- 0 until 2) {
        val t = texts(round)
        input.addData(t.zipWithIndex.map { case (x, i) => ("c", round * 100 + i, "user", x, None: Option[String], ts(i)) }: _*)
        query.processAllAvailable()
        seen ++= t
        val truth = seen.flatMap(_.split(" ")).filter(_.nonEmpty)
          .groupBy(identity).view.mapValues(_.size.toLong).toMap
        val grpMap = {
          import org.apache.spark.sql.functions.{lit, pmod, xxhash64}
          truth.keys.toSeq.toDF("tok")
            .select($"tok", pmod(xxhash64($"tok"), lit(groups)).as("g"))
            .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        }
        def grp(tok: String): Long = grpMap(tok)
        val rows = spark.table("mg_stream").collect()
        assert(rows.length <= groups)
        rows.foreach { r =>
          val g = r.getLong(0)
          val summary = r.getMap[String, Long](1)
          val nG = r.getLong(2)
          assert(summary.size <= k)
          // per-group totals add up to the group's true token mass
          val truthG = truth.filter { case (tok, _) => grp(tok) == g }
          assert(nG == truthG.values.sum)
          // superset: every token above n_g/(k+1) of ITS group's mass survives
          val mustSurvive = truthG.filter(_._2 > nG / (k + 1)).keySet
          assert((mustSurvive -- summary.keySet).isEmpty, s"group $g missing ${mustSurvive -- summary.keySet}")
          // undercount bound holds across micro-batch merges
          summary.foreach { case (tok, est) =>
            assert(est <= truthG(tok) && est >= truthG(tok) - nG / (k + 1), s"group $g token $tok")
          }
        }
      }
    } finally query.stop()
  }

  test("stateful incremental edges: at-least-once replays emit no duplicates (streaming MERGE)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Int, String, String, Option[String], Timestamp)]
    val transcripts = input.toDF().toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val edges = graft.streaming.StreamingIngest
      .incrementalMentionEdges(spark, transcripts, KgPipeline.defaultConcepts)
    val query = edges.writeStream
      .format("memory")
      .queryName("incr_edges_stream")
      .outputMode(OutputMode.Append)
      .start()
    try {
      input.addData(
        ("s1", 0, "user", "the table scan is slow", None, ts(0)),
        ("s1", 1, "assistant", "use a hash join", None, ts(1))
      )
      query.processAllAvailable()
      // replay turn 0 verbatim (at-least-once upstream), plus a genuinely new
      // conversation and a new turn in s1
      input.addData(
        ("s1", 0, "user", "the table scan is slow", None, ts(0)), // duplicate
        ("s1", 2, "user", "the table scan again", None, ts(2)), // new turn, same concept
        ("s2", 0, "user", "a window function", None, ts(2))
      )
      query.processAllAvailable()
      val got = spark
        .table("incr_edges_stream")
        .collect()
        .map(r => (r.getString(0), r.getString(2)))
        .toSeq
      assert(got.size == got.distinct.size, s"duplicate edges emitted: $got")
      assert(
        got.toSet == Set(("s1_0", "Q10"), ("s1_1", "Q11"), ("s1_2", "Q10"), ("s2_0", "Q14")),
        s"got $got"
      )
      // advance the watermark far past the 10-minute state retention: the
      // per-conversation state times out and is dropped...
      input.addData(("s3", 0, "user", "the data stream", None, ts(60)))
      query.processAllAvailable()
      // ...and a post-expiry replay arrives LATE (behind the watermark), so
      // the watermark filter drops it — the no-duplicate contract holds even
      // after state expiry
      input.addData(("s1", 0, "user", "the table scan is slow", None, ts(0)))
      query.processAllAvailable()
      val got2 = spark
        .table("incr_edges_stream")
        .collect()
        .map(r => (r.getString(0), r.getString(2)))
        .toSeq
      assert(got2.size == got2.distinct.size, s"duplicate edges after expiry: $got2")
      assert(got2.toSet == got.toSet + (("s3_0", "Q16")), s"got $got2")
    } finally query.stop()
  }

  test("stateful incremental edges: kill + restart from checkpoint recovers dedup state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft_stream_ckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_stream_out").toString
    val input = MemoryStream[(String, Int, String, String, Option[String], Timestamp)]
    val transcripts = input.toDF().toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    def edges = graft.streaming.StreamingIngest
      .incrementalMentionEdges(spark, transcripts, KgPipeline.defaultConcepts)
    // parquet sink: checkpoint-recoverable AND exactly-once (the memory sink
    // supports neither), so the whole output across both incarnations must
    // stay duplicate-free
    def start() = edges.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append)
      .start()
    def emitted(): Seq[(String, String)] =
      spark.read.parquet(outDir).collect().map(r => (r.getAs[String]("subj"), r.getAs[String]("obj"))).toSeq

    // first incarnation: emit edges for two turns, then die
    val q1 = start()
    try {
      input.addData(
        ("r1", 0, "user", "the table scan is slow", None, ts(0)),
        ("r1", 1, "assistant", "use a hash join", None, ts(1)))
      q1.processAllAvailable()
      assert(emitted().toSet == Set(("r1_0", "Q10"), ("r1_1", "Q11")), s"got ${emitted()}")
    } finally q1.stop()

    // second incarnation from the SAME checkpoint: a verbatim replay of turn
    // 0 (at-least-once upstream redelivery across the restart) must emit NO
    // duplicate — only possible if the SeenEdges state store was recovered
    val q2 = start()
    try {
      input.addData(
        ("r1", 0, "user", "the table scan is slow", None, ts(0)), // replay
        ("r1", 2, "user", "the table scan again", None, ts(2))) // genuinely new
      q2.processAllAvailable()
      val got2 = emitted()
      assert(got2.size == got2.distinct.size, s"duplicates after restart: $got2")
      assert(got2.toSet == Set(("r1_0", "Q10"), ("r1_1", "Q11"), ("r1_2", "Q10")),
        s"expected exactly the old edges plus the new one, got $got2")
    } finally q2.stop()
  }

  test("transformWithState incremental edges: MapState point-lookup dedup (Spark 4.1 TWS)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // TWS requires the RocksDB state-store provider; scope the conf to this
    // query and restore the default afterwards
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(
      providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[(String, Int, String, String, Option[String], Timestamp)]
    val transcripts = input.toDF().toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val edges = graft.streaming.StreamingIngest
      .incrementalMentionEdgesTws(spark, transcripts, KgPipeline.defaultConcepts)
    val query = edges.writeStream
      .format("memory")
      .queryName("tws_edges_stream")
      .outputMode(OutputMode.Append)
      .start()
    try {
      input.addData(
        ("t1", 0, "user", "the table scan is slow", None, ts(0)),
        ("t1", 1, "assistant", "use a hash join", None, ts(1))
      )
      query.processAllAvailable()
      input.addData(
        ("t1", 0, "user", "the table scan is slow", None, ts(0)), // replay
        ("t1", 2, "user", "the table scan again", None, ts(2)),
        ("t2", 0, "user", "a window function", None, ts(2))
      )
      query.processAllAvailable()
      val got = spark.table("tws_edges_stream").collect().map(r => (r.getString(0), r.getString(2))).toSeq
      assert(got.size == got.distinct.size, s"duplicate edges emitted: $got")
      assert(
        got.toSet == Set(("t1_0", "Q10"), ("t1_1", "Q11"), ("t1_2", "Q10"), ("t2_0", "Q14")),
        s"got $got")
      // expiry: advance the watermark far past retention, then a late replay
      // is dropped by the watermark filter (same contract as the FMGWS twin)
      input.addData(("t3", 0, "user", "the data stream", None, ts(60)))
      query.processAllAvailable()
      input.addData(("t1", 0, "user", "the table scan is slow", None, ts(0)))
      query.processAllAvailable()
      val got2 = spark.table("tws_edges_stream").collect().map(r => (r.getString(0), r.getString(2))).toSeq
      assert(got2.size == got2.distinct.size, s"post-expiry duplicates: $got2")
      assert(got2.toSet == got.toSet + (("t3_0", "Q16")), s"got $got2")
    } finally {
      query.stop()
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None    => spark.conf.unset(providerKey)
      }
    }
  }
}
