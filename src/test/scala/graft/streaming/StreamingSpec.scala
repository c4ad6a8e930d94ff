package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{functions => F}
import org.scalatest.matchers.should.Matchers
import org.scalatest.wordspec.AnyWordSpec

import graft.SparkSpec

case class SInner(bal: Double, seg: String)
case class SOuter(id: Long, info: SInner)
case class Ev(ts: Timestamp, user: String, v: Double)
case class UserCount(user: String, n: Long)

/** Proof that the engine transfers to Structured Streaming (SURVEY.md §1:
  * "projections are stateless, so it transfers verbatim" — the Kafka
  * Connect per-message use case the reference was built for), plus the
  * stream-native operators a pipeline needs: watermarked windowed
  * aggregation and arbitrary stateful processing.
  */
class StreamingSpec extends AnyWordSpec with Matchers with SparkSpec {

  "GraftSql projection" should {
    "apply unchanged to a streaming DataFrame (flatten + nested path)" in {
      import graft.sql.GraftSql.implicits._
      import spark.implicits._
      implicit val ctx = spark.sqlContext

      val input = MemoryStream[SOuter]
      val out = input.toDF().sql("SELECT id, info.bal as bal")
      out.isStreaming shouldBe true

      val q = out.writeStream.format("memory").queryName("proj_stream")
        .outputMode(OutputMode.Append()).start()
      try {
        input.addData(SOuter(1, SInner(10.5, "A")), SOuter(2, SInner(-3.0, "B")))
        q.processAllAvailable()
        val rows = spark.table("proj_stream").as[(Long, Double)]
          .collect().sortBy(_._1)
        rows.toSeq shouldBe Seq((1L, 10.5), (2L, -3.0))
      } finally q.stop()
    }

    "apply withstructure mode to a stream" in {
      import graft.sql.GraftSql.implicits._
      import spark.implicits._
      implicit val ctx = spark.sqlContext

      val input = MemoryStream[SOuter]
      val out = input.toDF().sql("SELECT id, info.seg FROM t withstructure")
      out.schema.fieldNames.toSeq shouldBe Seq("id", "info")

      val q = out.writeStream.format("memory").queryName("ws_stream")
        .outputMode(OutputMode.Append()).start()
      try {
        input.addData(SOuter(7, SInner(1.0, "X")))
        q.processAllAvailable()
        val r = spark.table("ws_stream").collect().head
        r.getLong(0) shouldBe 7
        r.getStruct(1).fieldIndex("seg") shouldBe 0
        r.getStruct(1).getString(0) shouldBe "X"
      } finally q.stop()
    }
  }

  "file streaming source" should {
    "stream a parquet directory through a GraftSql projection" in {
      import graft.sql.GraftSql.implicits._
      import spark.implicits._
      val dir = graft.operators.Catalog.tempDir("graft_stream")
      val batch1 = Seq(SOuter(1, SInner(1.5, "A")), SOuter(2, SInner(2.5, "B")))
      batch1.toDF().write.mode("append").parquet(dir)

      val stream = spark.readStream
        .schema(batch1.toDF().schema)
        .parquet(dir)
        .sql("SELECT id, info.seg as seg")
      val q = stream.writeStream.format("memory").queryName("file_stream")
        .outputMode(OutputMode.Append()).start()
      try {
        q.processAllAvailable()
        // a second file arrives; the stream picks it up incrementally
        Seq(SOuter(3, SInner(3.5, "C"))).toDF().write.mode("append").parquet(dir)
        q.processAllAvailable()
        val rows = spark.table("file_stream").as[(Long, String)]
          .collect().sortBy(_._1)
        rows.toSeq shouldBe Seq((1L, "A"), (2L, "B"), (3L, "C"))
      } finally q.stop()
    }
  }

  "streaming aggregation" should {
    "run a watermarked tumbling-window count" in {
      import spark.implicits._
      implicit val ctx = spark.sqlContext

      val input = MemoryStream[Ev]
      val agg = input.toDF()
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window(F.col("ts"), "5 minutes"), F.col("user"))
        .agg(F.count(F.lit(1)).as("n"), F.round(F.sum("v"), 2).as("total"))

      val q = agg.writeStream.format("memory").queryName("win_stream")
        .outputMode(OutputMode.Complete()).start()
      try {
        def t(min: Int) = new Timestamp(1700000000000L + min * 60000L)
        input.addData(Ev(t(0), "u1", 1.0), Ev(t(1), "u1", 2.0),
          Ev(t(6), "u1", 4.0), Ev(t(2), "u2", 8.0))
        q.processAllAvailable()
        val rows = spark.table("win_stream")
          .select("user", "n", "total").as[(String, Long, Double)]
          .collect().sortBy(r => (r._1, r._2))
        rows.toSeq should contain theSameElementsAs
          Seq(("u1", 2L, 3.0), ("u1", 1L, 4.0), ("u2", 1L, 8.0))
      } finally q.stop()
    }

    "deduplicate a stream with a watermark (streaming llm_dedup_exact)" in {
      import spark.implicits._
      implicit val ctx = spark.sqlContext

      val input = MemoryStream[Ev]
      val deduped = input.toDF()
        .withWatermark("ts", "1 hour")
        .dropDuplicates("user", "ts") // content key; state bounded by watermark
      val q = deduped.writeStream.format("memory").queryName("dedup_stream")
        .outputMode(OutputMode.Append()).start()
      try {
        def t(min: Int) = new Timestamp(1700000000000L + min * 60000L)
        input.addData(Ev(t(0), "u1", 1.0), Ev(t(0), "u1", 99.0), // dup key
          Ev(t(1), "u1", 2.0))
        q.processAllAvailable()
        input.addData(Ev(t(0), "u1", 5.0)) // dup arriving in a later batch
        q.processAllAvailable()
        spark.table("dedup_stream").count() shouldBe 2
      } finally q.stop()
    }

    "join two streams on key + event-time interval (watermarked)" in {
      import spark.implicits._
      implicit val ctx = spark.sqlContext

      // the ad-tech shape: impressions joined to clicks that happen within
      // 10 minutes AFTER the impression; both sides watermarked so join
      // state is bounded and evictable — the only stream-stream join plan
      // that survives unbounded input.
      val imps = MemoryStream[Ev]
      val clicks = MemoryStream[Ev]
      val i = imps.toDF().withWatermark("ts", "20 minutes")
        .select(F.col("user"), F.col("ts").as("imp_ts"), F.col("v").as("imp_v"))
      val c = clicks.toDF().withWatermark("ts", "20 minutes")
        .select(F.col("user").as("cuser"), F.col("ts").as("click_ts"))
      val joined = i.join(c,
        F.col("user") === F.col("cuser") &&
          F.col("click_ts") >= F.col("imp_ts") &&
          F.col("click_ts") <= F.col("imp_ts") + F.expr("INTERVAL 10 MINUTES"))

      val q = joined.writeStream.format("memory").queryName("ss_join")
        .outputMode(OutputMode.Append()).start()
      try {
        def t(min: Int) = new Timestamp(1700000000000L + min * 60000L)
        imps.addData(Ev(t(0), "u1", 1.0), Ev(t(0), "u2", 2.0))
        clicks.addData(Ev(t(5), "u1", 0.0), // within window → joins
          Ev(t(40), "u2", 0.0)) // 40 min later → outside window
        q.processAllAvailable()
        val rows = spark.table("ss_join").select("user").as[String].collect()
        rows.toSeq shouldBe Seq("u1")
      } finally q.stop()
    }

    "enrich a stream with a static dimension (stream-static broadcast join)" in {
      import spark.implicits._
      implicit val ctx = spark.sqlContext

      val dim = Seq(("u1", "gold"), ("u2", "basic")).toDF("user", "tier")
      val input = MemoryStream[Ev]
      val enriched = input.toDF().join(F.broadcast(dim), Seq("user"))
        .select("user", "tier", "v")

      val q = enriched.writeStream.format("memory").queryName("enrich_stream")
        .outputMode(OutputMode.Append()).start()
      try {
        def t(min: Int) = new Timestamp(1700000000000L + min * 60000L)
        input.addData(Ev(t(0), "u1", 1.0), Ev(t(1), "u3", 9.0)) // u3: no dim row
        q.processAllAvailable()
        val rows = spark.table("enrich_stream")
          .select("user", "tier").as[(String, String)].collect()
        rows.toSeq shouldBe Seq(("u1", "gold"))
      } finally q.stop()
    }

    "close gap-based sessions via flatMapGroupsWithState" in {
      import spark.implicits._
      implicit val ctx = spark.sqlContext

      // per-user session state (start, last, n); a >=30-minute gap closes
      // the running session and emits its summary — the custom-state
      // analogue of the q_session_window gate.
      val input = MemoryStream[Ev]
      val sessions = input.toDS()
        .groupByKey(_.user)
        .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout) {
          (user: String, evs: Iterator[Ev], state: GroupState[(Long, Long, Long)]) =>
            var out = List.empty[(String, Long, Long)] // (user, n, minutes)
            var cur = state.getOption
            evs.toSeq.sortBy(_.ts.getTime).foreach { e =>
              val ts = e.ts.getTime
              cur match {
                case Some((start, last, n)) if ts - last >= 30 * 60000L =>
                  out ::= ((user, n, (last - start) / 60000L))
                  cur = Some((ts, ts, 1L))
                case Some((start, _, n)) => cur = Some((start, ts, n + 1))
                case None => cur = Some((ts, ts, 1L))
              }
            }
            cur.foreach(state.update)
            out.reverseIterator
        }

      val q = sessions.writeStream.format("memory").queryName("fmgws_stream")
        .outputMode(OutputMode.Update()).start()
      try {
        def t(min: Int) = new Timestamp(1700000000000L + min * 60000L)
        input.addData(Ev(t(0), "u1", 1.0), Ev(t(5), "u1", 1.0), Ev(t(9), "u1", 1.0))
        q.processAllAvailable()
        // 45-minute gap → first session (3 events, 9 minutes) closes
        input.addData(Ev(t(54), "u1", 1.0))
        q.processAllAvailable()
        val closed = spark.table("fmgws_stream").as[(String, Long, Long)].collect()
        closed.toSeq shouldBe Seq(("u1", 3L, 9L))
      } finally q.stop()
    }

    "run arbitrary stateful processing via mapGroupsWithState" in {
      import spark.implicits._
      implicit val ctx = spark.sqlContext

      val input = MemoryStream[Ev]
      val counts = input.toDS()
        .groupByKey(_.user)
        .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
          (user: String, evs: Iterator[Ev], state: GroupState[Long]) =>
            val n = state.getOption.getOrElse(0L) + evs.size
            state.update(n)
            UserCount(user, n)
        }

      val q = counts.writeStream.format("memory").queryName("state_stream")
        .outputMode(OutputMode.Update()).start()
      try {
        def t(min: Int) = new Timestamp(1700000000000L + min * 60000L)
        input.addData(Ev(t(0), "u1", 1.0), Ev(t(1), "u1", 1.0))
        q.processAllAvailable()
        input.addData(Ev(t(2), "u1", 1.0))
        q.processAllAvailable()
        // state accumulated across micro-batches: 2 then 3
        val ns = spark.table("state_stream").as[UserCount]
          .collect().filter(_.user == "u1").map(_.n).sorted
        ns.toSeq shouldBe Seq(2L, 3L)
      } finally q.stop()
    }
  }
}
