package graft.operators

import org.apache.spark.sql.{SparkSession, functions => F}

/** One closed session emitted by q_stream_sessions' custom state handler. */
case class StreamSession(user_id: Long, session_idx: Int, start_us: Long,
    end_us: Long, n_events: Long)

/** One per-user profile emitted by q_stream_tws's StatefulProcessor. */
case class TwsProfile(user_id: Long, n_events: Long, value_m: Long,
    first_us: Long, last_us: Long, type_counts: String)

/** `transformWithState` processor (the Spark-4 arbitrary-state API that
  * supersedes flatMapGroupsWithState): typed state cells — a ValueState
  * aggregate (n, Σmillis, first_us, last_us), a MapState of per-event-type
  * counts, and a ValueState tracking the one live event-time timer so it
  * can be deleted/re-registered as later events arrive. Every merge is
  * order-independent (counts/sums/min/max), and NOTHING is emitted until
  * the timer fires (watermark past last-event + 30 min), so the output is
  * independent of micro-batch splits and equals the batch GROUP BY — the
  * oracle-exactness contract shared with q_stream_sessions.
  */
class TwsProfileProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, (Long, Long, Long, String, java.sql.Timestamp), TwsProfile] {
  import org.apache.spark.sql.Encoders
  import org.apache.spark.sql.streaming.{MapState, OutputMode, TTLConfig,
    TimeMode, TimerValues, ValueState}

  private val gapMs = 30L * 60000L
  @transient private var agg: ValueState[(Long, Long, Long, Long)] = _
  @transient private var types: MapState[String, Long] = _
  @transient private var timerAt: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    agg = getHandle.getValueState("agg",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
        Encoders.scalaLong, Encoders.scalaLong), TTLConfig.NONE)
    types = getHandle.getMapState("types",
      Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
    timerAt = getHandle.getValueState("timerAt",
      Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: Long,
      rows: Iterator[(Long, Long, Long, String, java.sql.Timestamp)],
      tv: TimerValues): Iterator[TwsProfile] = {
    var (n, sm, f, l) =
      if (agg.exists()) agg.get() else (0L, 0L, Long.MaxValue, Long.MinValue)
    rows.foreach { case (_, us, m, et, _) =>
      n += 1; sm += m
      if (us < f) f = us
      if (us > l) l = us
      types.updateValue(et,
        (if (types.containsKey(et)) types.getValue(et) else 0L) + 1L)
    }
    agg.update((n, sm, f, l))
    val expiry = l / 1000L + gapMs
    if (!timerAt.exists() || timerAt.get() != expiry) {
      if (timerAt.exists()) getHandle.deleteTimer(timerAt.get())
      getHandle.registerTimer(expiry)
      timerAt.update(expiry)
    }
    Iterator.empty
  }

  override def handleExpiredTimer(key: Long, tv: TimerValues,
      info: org.apache.spark.sql.streaming.ExpiredTimerInfo)
      : Iterator[TwsProfile] = {
    val (n, sm, f, l) = agg.get()
    val tc = types.iterator().toSeq.sortBy(_._1)
      .map { case (et, c) => s"$et:$c" }.mkString(",")
    agg.clear(); types.clear(); timerAt.clear()
    Iterator.single(TwsProfile(key, n, sm, f, l, tc))
  }
}

/** Oracle gates for the text-format sources (CSV, JSON lines) and the
  * stream-stream join — the most common real-user entry points that were
  * previously covered unit-only (SourceSinkSpec / StreamingSpec).
  *
  * The CSV/JSON gates write the documents table through the format and
  * read it back with an EXPLICIT schema (type inference is banned at
  * scale: a schema-inference pass reads the whole dataset twice), then
  * aggregate with a content fingerprint (sum of 48-bit md5 prefixes over
  * `text`) so any value corruption in the round trip — quoting, escaping,
  * charset, type coercion — breaks the driver hash. The oracle aggregates
  * the parquet original: the format round trip must be value-invisible.
  */
object SourceGates extends Catalog {

  /** Per-lang aggregate whose columns pin both values and types:
    * row multiset (n_docs), numeric fidelity (chars), string fidelity to
    * the exact byte (text_fp — order-independent sum of per-doc 48-bit
    * md5 prefixes; even 10^4 docs per group stays below 2^62).
    */
  private def contentAgg(df: org.apache.spark.sql.DataFrame) =
    df.groupBy("lang")
      .agg(F.count(F.lit(1)).as("n_docs"),
        F.sum(F.col("n_chars")).as("chars"),
        F.sum(F.conv(F.substring(F.md5(F.col("text")), 1, 12), 16, 10)
          .cast("long")).as("text_fp"))
      .orderBy("lang")

  private val contentAggSql =
    """SELECT lang, count(*) AS n_docs,
              CAST(sum(n_chars) AS BIGINT) AS chars,
              CAST(sum(CAST('0x' || substring(md5(text), 1, 12) AS BIGINT))
                AS BIGINT) AS text_fp
       FROM documents GROUP BY lang ORDER BY lang"""

  val queries: Map[String, Q] = Map(

    // parquet → csv (header, RFC-4180 quote-doubling) → explicit-schema
    // read → fingerprint aggregate. escape = quote gives the standard
    // "" doubling on write AND read, so a future corpus with embedded
    // quotes still round-trips.
    "q_csv_roundtrip" -> ((s, dir) => {
      val tmp = tempDir("graft_gate_csv")
      val docs = table(s, dir, "documents")
      docs.write.mode("overwrite")
        .option("header", "true").option("escape", "\"")
        .csv(tmp)
      contentAgg(
        s.read.schema(docs.schema)
          .option("header", "true").option("escape", "\"")
          // a quoted RFC-4180 field may contain embedded newlines; the
          // writer quotes them, so the reader must not split records on
          // raw \n (multiLine costs file-level parallelism — at scale
          // you ban newlines upstream instead, but a correctness gate
          // must read what the writer can legally produce)
          .option("multiLine", "true")
          .csv(tmp))
    }),

    // parquet → JSON lines → explicit-schema read → fingerprint
    // aggregate. JSON is schemaless on disk; the explicit read schema is
    // what keeps doc_id/n_chars LONG instead of inferred widths.
    "q_json_lines" -> ((s, dir) => {
      val tmp = tempDir("graft_gate_json")
      val docs = table(s, dir, "documents")
      docs.write.mode("overwrite").json(tmp)
      contentAgg(s.read.schema(docs.schema).json(tmp))
    }),

    // STREAM-STREAM INTERVAL JOIN under the oracle: clicks and purchases
    // arrive as two file streams (3 micro-batches each), inner-joined on
    // user with purchase within 6 hours after the click, rows appended to
    // the graft-avro sink as they match. Inner stream-stream joins emit
    // eagerly (no window close needed — no sentinel), and the 90-day
    // watermarks exceed the data span so state eviction can never drop a
    // late match: the emitted multiset must equal the batch join exactly.
    // Timestamps are emitted as epoch micros (BIGINT) — no cross-engine
    // timestamp rendering in the compare; event_id pairs make the ORDER BY
    // unique.
    "q_stream_join" -> ((s, dir) => {
      // the watermark-advance no-data batch is load-bearing for state
      // cleanup determinism; pin the default so a config drift cannot
      // silently change emission
      AvroGates.pinNoDataBatches(s)
      val srcL = tempDir("graft_gate_sj_clicks")
      val srcR = tempDir("graft_gate_sj_purch")
      val out = tempDir("graft_gate_sj_out")
      val ckpt = tempDir("graft_gate_sj_ckpt")
      val ev = table(s, dir, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
      // the no-dropped-matches guarantee rests on span < watermark delay
      // (state eviction could otherwise discard a joinable row); fail
      // loudly if the testdata ever outgrows it, like the sibling gates
      val mm = ev.agg(F.min("ts"), F.max("ts")).head()
      require(mm.getTimestamp(1).getTime - mm.getTimestamp(0).getTime <
          90L * 86400L * 1000L,
        s"events span exceeds the 90-day watermark: " +
          s"${mm.getTimestamp(0)} .. ${mm.getTimestamp(1)}")
      ev.filter(F.col("event_type") === "click")
        .repartition(3, F.col("event_id"))
        .write.mode("overwrite").parquet(srcL)
      ev.filter(F.col("event_type") === "purchase")
        .repartition(3, F.col("event_id"))
        .write.mode("overwrite").parquet(srcR)
      val clicks = s.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1").parquet(srcL)
        .withWatermark("ts", "90 days")
        .select(F.col("event_id").as("click_id"), F.col("ts").as("cts"),
          F.col("user_id"),
          F.floor(F.col("value") * 1000).cast("long").as("click_m"))
      val purchases = s.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1").parquet(srcR)
        .withWatermark("ts", "90 days")
        .select(F.col("event_id").as("purchase_id"), F.col("ts").as("pts"),
          F.col("user_id").as("p_user"),
          F.floor(F.col("value") * 1000).cast("long").as("purchase_m"))
      val joined = clicks.join(purchases,
          F.col("user_id") === F.col("p_user") &&
            F.col("pts") >= F.col("cts") &&
            F.col("pts") <= F.col("cts") + F.expr("INTERVAL 6 HOURS"))
        .select(F.col("click_id"), F.col("purchase_id"), F.col("user_id"),
          F.unix_micros(F.col("cts")).as("cts_us"),
          F.unix_micros(F.col("pts")).as("pts_us"),
          F.col("click_m"), F.col("purchase_m"))
      // stream-stream joins allocate FOUR state stores per shuffle
      // partition per micro-batch (left/right keyed + key-with-index) —
      // see AvroGates.withStateParallelism for why 4, not 32
      AvroGates.withStateParallelism(s, 4) {
        val q = joined.writeStream.format("graft-avro")
          .option("checkpointLocation", ckpt)
          .outputMode("append").start(out)
        try q.processAllAvailable() finally q.stop()
      }
      s.read.format("graft-avro").load(out)
        .orderBy("click_id", "purchase_id")
    }),

    // STREAM-STREAM LEFT OUTER interval join under the oracle — the
    // subtle half of stream joins: matched rows emit eagerly, but an
    // UNMATCHED click may only emit (null-padded) once the watermark
    // proves no purchase can still arrive inside its 6-hour window, so
    // sentinels go to BOTH streams (the global watermark is the min
    // across sources). Null join columns are coalesced to -1 on both
    // sides of the compare: Spark orders nulls first, DuckDB last, so a
    // nullable ORDER BY column would break the row-ordered driver hash.
    "q_stream_join_outer" -> ((s, dir) => {
      AvroGates.pinNoDataBatches(s)
      val srcL = tempDir("graft_gate_sjo_clicks")
      val srcR = tempDir("graft_gate_sjo_purch")
      val out = tempDir("graft_gate_sjo_out")
      val ckpt = tempDir("graft_gate_sjo_ckpt")
      val ev = table(s, dir, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
      val mm = ev.agg(F.min("ts"), F.max("ts")).head()
      require(mm.getTimestamp(1).getTime - mm.getTimestamp(0).getTime <
          90L * 86400L * 1000L,
        s"events span exceeds the 90-day watermark: " +
          s"${mm.getTimestamp(0)} .. ${mm.getTimestamp(1)}")
      ev.filter(F.col("event_type") === "click")
        .repartition(3, F.col("event_id"))
        .write.mode("overwrite").parquet(srcL)
      ev.filter(F.col("event_type") === "purchase")
        .repartition(3, F.col("event_id"))
        .write.mode("overwrite").parquet(srcR)
      val clicks = s.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1").parquet(srcL)
        .withWatermark("ts", "90 days")
        .select(F.col("event_id").as("click_id"), F.col("ts").as("cts"),
          F.col("user_id"),
          F.floor(F.col("value") * 1000).cast("long").as("click_m"))
      val purchases = s.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1").parquet(srcR)
        .withWatermark("ts", "90 days")
        .select(F.col("event_id").as("purchase_id"), F.col("ts").as("pts"),
          F.col("user_id").as("p_user"),
          F.floor(F.col("value") * 1000).cast("long").as("purchase_m"))
      val joined = clicks.join(purchases,
          F.col("user_id") === F.col("p_user") &&
            F.col("pts") >= F.col("cts") &&
            F.col("pts") <= F.col("cts") + F.expr("INTERVAL 6 HOURS"),
          "leftOuter")
        .select(F.col("click_id"),
          F.coalesce(F.col("purchase_id"), F.lit(-1L)).as("purchase_id"),
          F.col("user_id"),
          F.unix_micros(F.col("cts")).as("cts_us"),
          F.coalesce(F.unix_micros(F.col("pts")), F.lit(-1L)).as("pts_us"),
          F.col("click_m"),
          F.coalesce(F.col("purchase_m"), F.lit(-1L)).as("purchase_m"))
      AvroGates.withStateParallelism(s, 4) {
        val q = joined.writeStream.format("graft-avro")
          .option("checkpointLocation", ckpt)
          .outputMode("append").start(out)
        try {
          q.processAllAvailable()
          // advance BOTH watermarks past maxTs + 6h (sentinel − 90d =
          // maxTs + 9d) so every unmatched click's window provably closes
          import s.implicits._
          val sentinel = new java.sql.Timestamp(
            mm.getTimestamp(1).getTime + 99L * 86400L * 1000L)
          Seq((-1L, sentinel, -1L, "zz", 0.0))
            .toDF("event_id", "ts", "user_id", "event_type", "value")
            .write.mode("append").parquet(srcL)
          Seq((-2L, sentinel, -1L, "zz", 0.0))
            .toDF("event_id", "ts", "user_id", "event_type", "value")
            .write.mode("append").parquet(srcR)
          q.processAllAvailable()
        } finally q.stop()
      }
      s.read.format("graft-avro").load(out)
        // the click-side sentinel is held in state (its own window never
        // closes before the query stops) — filtered defensively
        .filter(F.col("click_id") =!= -1)
        .orderBy("click_id", "purchase_id")
    }),

    // CUSTOM STATE under the oracle: gap-based sessionization (30-minute
    // idle gap) via flatMapGroupsWithState with an EVENT-TIME timeout.
    // Per-user state is the event-time list; NOTHING is emitted until the
    // group's timeout fires (watermark past last-event + gap), at which
    // point the full sorted list sessionizes in one pass — emission is
    // therefore independent of how events split across micro-batches, and
    // the result equals the batch definition exactly (this is the
    // streaming twin of the q_session_window batch gate: same 9549
    // sessions at sf0.01). The sentinel advances the watermark past every
    // real timeout; its own group can never time out and is filtered
    // defensively. State note for 100 TB: the full-list state is what
    // makes arrival order irrelevant; its size is events-per-user-per-
    // session-horizon, and a production variant bounds it by folding
    // closed prefixes incrementally once the watermark passes them.
    "q_stream_sessions" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
      import s.implicits._
      AvroGates.pinNoDataBatches(s)
      val src = tempDir("graft_gate_ssess_src")
      val out = tempDir("graft_gate_ssess_out")
      val ckpt = tempDir("graft_gate_ssess_ckpt")
      val ev = table(s, dir, "events").select("ts", "user_id")
      ev.repartition(3, F.col("user_id")).write.mode("overwrite").parquet(src)
      val gapUs = 1800000000L // 30 min in micros (exact integers only)
      val handler = (user: Long,
          rows: Iterator[(Long, Long, java.sql.Timestamp)],
          state: GroupState[Seq[Long]]) =>
        if (state.hasTimedOut) {
          val ts = state.get.sorted
          state.remove()
          var out = List.empty[StreamSession]
          var idx = 0; var start = 0L; var last = 0L; var n = 0L
          ts.foreach { t =>
            if (n == 0 || t - last > gapUs) {
              if (n > 0) out ::= StreamSession(user, idx, start, last, n)
              idx += 1; start = t; n = 0
            }
            last = t; n += 1
          }
          if (n > 0) out ::= StreamSession(user, idx, start, last, n)
          out.reverseIterator
        } else {
          val cur = state.getOption.getOrElse(Seq.empty) ++ rows.map(_._2)
          state.update(cur)
          // fire once the watermark passes the last event plus the gap
          state.setTimeoutTimestamp(cur.max / 1000L + 30L * 60000L)
          Iterator.empty[StreamSession]
        }
      val sessions = s.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
        .withWatermark("ts", "90 days")
        // the watermarked event-time column must SURVIVE to the stateful
        // operator (event-time timeout is rejected otherwise) — carry it
        // alongside the exact-integer micros the handler actually uses
        .select(F.col("user_id"), F.unix_micros(F.col("ts")).as("ts_us"),
          F.col("ts"))
        .as[(Long, Long, java.sql.Timestamp)]
        .groupByKey(_._1)
        .flatMapGroupsWithState(OutputMode.Append(),
          GroupStateTimeout.EventTimeTimeout())(handler)
      def start() = sessions.writeStream.format("graft-avro")
        .option("checkpointLocation", ckpt)
        .outputMode("append").start(out)
      // RocksDB provider + a mid-stream kill: the per-user event lists
      // (CUSTOM flatMapGroupsWithState state) exist only in RocksDB and
      // its checkpoint changelog when the kill lands — the restart must
      // recover them from there or sessions split/vanish, which the
      // oracle catches per (user, session_idx). At 100 TB per-user state
      // cannot live on-heap; this is the provider that spills.
      AvroGates.withStateParallelism(s, 4) {
       AvroGates.withRocksDbStateStore(s) {
        val q1 = start()
        try {
          val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
          while (Option(q1.lastProgress).forall(_.numInputRows == 0) &&
              q1.isActive && System.nanoTime() < deadline)
            Thread.sleep(25)
        } finally q1.stop() // kill: session state lives ONLY in RocksDB
        val q2 = start()
        try {
          q2.processAllAvailable()
          val mm = ev.agg(F.min("ts"), F.max("ts")).head()
          val (minTs, maxTs) = (mm.getTimestamp(0), mm.getTimestamp(1))
          require(maxTs.getTime - minTs.getTime < 90L * 86400L * 1000L,
            s"events span exceeds the 90-day watermark: $minTs .. $maxTs")
          // watermark lands at sentinel - 90d = maxTs + 9d, past every
          // real last-event + 30min timeout
          val sentinel = new java.sql.Timestamp(
            maxTs.getTime + 99L * 86400L * 1000L)
          Seq((sentinel, -1L)).toDF("ts", "user_id")
            .write.mode("append").parquet(src)
          q2.processAllAvailable()
        } finally q2.stop()
       }
      }
      s.read.format("graft-avro").load(out)
        .filter(F.col("user_id") =!= -1)
        .orderBy("user_id", "session_idx")
    }),

    // transformWithState (the Spark-4 arbitrary-state API, RocksDB-only):
    // per-user profile — event count, exact-integer value sum, first/last
    // event micros, and per-type counts from a MapState — emitted solely
    // by event-time TIMERS (watermark past last event + 30 min), so
    // micro-batch splits are invisible and the stream equals the batch
    // GROUP BY. A mid-stream kill lands while the profiles exist only in
    // the TWS state format inside RocksDB + its changelog; the restart
    // must recover ValueState, MapState AND the registered timers, or
    // counts drop / timers never fire — the oracle catches both.
    "q_stream_tws" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
      import s.implicits._
      AvroGates.pinNoDataBatches(s)
      val src = tempDir("graft_gate_tws_src")
      val out = tempDir("graft_gate_tws_out")
      val ckpt = tempDir("graft_gate_tws_ckpt")
      val ev = table(s, dir, "events")
        .select("ts", "user_id", "event_type", "value")
      ev.repartition(3, F.col("user_id")).write.mode("overwrite").parquet(src)
      val profiles = s.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
        .withWatermark("ts", "90 days")
        // exact integers for the handler; the watermarked ts column must
        // survive to the stateful operator (event-time mode requires it)
        .select(F.col("user_id"), F.unix_micros(F.col("ts")).as("ts_us"),
          F.floor(F.col("value") * 1000).cast("long").as("m"),
          F.col("event_type"), F.col("ts"))
        .as[(Long, Long, Long, String, java.sql.Timestamp)]
        .groupByKey(_._1)
        .transformWithState(new TwsProfileProcessor,
          TimeMode.EventTime(), OutputMode.Append())
      def start() = profiles.writeStream.format("graft-avro")
        .option("checkpointLocation", ckpt)
        .outputMode("append").start(out)
      AvroGates.withStateParallelism(s, 4) {
       AvroGates.withRocksDbStateStore(s) {
        val q1 = start()
        try {
          val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
          while (Option(q1.lastProgress).forall(_.numInputRows == 0) &&
              q1.isActive && System.nanoTime() < deadline)
            Thread.sleep(25)
        } finally q1.stop() // kill: profile state + timers live ONLY in RocksDB
        val q2 = start()
        try {
          q2.processAllAvailable()
          val mm = ev.agg(F.min("ts"), F.max("ts")).head()
          val (minTs, maxTs) = (mm.getTimestamp(0), mm.getTimestamp(1))
          require(maxTs.getTime - minTs.getTime < 90L * 86400L * 1000L,
            s"events span exceeds the 90-day watermark: $minTs .. $maxTs")
          // watermark lands at sentinel - 90d = maxTs + 9d, past every
          // real last-event + 30min timer
          val sentinel = new java.sql.Timestamp(
            maxTs.getTime + 99L * 86400L * 1000L)
          Seq((sentinel, -1L, "zz", 0.0))
            .toDF("ts", "user_id", "event_type", "value")
            .write.mode("append").parquet(src)
          q2.processAllAvailable()
        } finally q2.stop()
       }
      }
      s.read.format("graft-avro").load(out)
        .filter(F.col("user_id") =!= -1)
        .orderBy("user_id")
    })
  )

  val oracles: Map[String, String] = Map(
    "q_csv_roundtrip" -> contentAggSql,
    "q_json_lines" -> contentAggSql,
    "q_stream_join" ->
      """SELECT c.event_id AS click_id, p.event_id AS purchase_id,
                c.user_id,
                epoch_ns(c.ts) // 1000 AS cts_us,
                epoch_ns(p.ts) // 1000 AS pts_us,
                CAST(floor(c.value * 1000) AS BIGINT) AS click_m,
                CAST(floor(p.value * 1000) AS BIGINT) AS purchase_m
         FROM events c JOIN events p
           ON c.user_id = p.user_id
          AND c.event_type = 'click' AND p.event_type = 'purchase'
          AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 6 HOUR
         ORDER BY click_id, purchase_id""",
    "q_stream_join_outer" ->
      """SELECT c.event_id AS click_id,
                COALESCE(p.event_id, -1) AS purchase_id,
                c.user_id,
                epoch_ns(c.ts) // 1000 AS cts_us,
                COALESCE(epoch_ns(p.ts) // 1000, -1) AS pts_us,
                CAST(floor(c.value * 1000) AS BIGINT) AS click_m,
                COALESCE(CAST(floor(p.value * 1000) AS BIGINT), -1)
                  AS purchase_m
         FROM events c LEFT JOIN events p
           ON c.user_id = p.user_id AND p.event_type = 'purchase'
          AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 6 HOUR
         WHERE c.event_type = 'click'
         ORDER BY click_id, purchase_id""",
    "q_stream_sessions" ->
      """WITH e AS (
           SELECT user_id, epoch_ns(ts) // 1000 AS ts_us FROM events),
         o AS (
           SELECT user_id, ts_us,
                  CASE WHEN lag(ts_us) OVER w IS NULL
                         OR ts_us - lag(ts_us) OVER w > 1800000000
                       THEN 1 ELSE 0 END AS brk
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)),
         s AS (
           SELECT user_id, ts_us,
                  CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts_us
                    ROWS UNBOUNDED PRECEDING) AS INT) AS session_idx
           FROM o)
         SELECT user_id, session_idx,
                min(ts_us) AS start_us, max(ts_us) AS end_us,
                count(*) AS n_events
         FROM s GROUP BY user_id, session_idx
         ORDER BY user_id, session_idx""",
    // the batch definition the timer-gated stream must reproduce: plain
    // per-user GROUP BY plus an ordered per-type count roll-up string
    "q_stream_tws" ->
      """WITH t AS (
           SELECT user_id, event_type, count(*) AS c
           FROM events GROUP BY user_id, event_type),
         tc AS (
           SELECT user_id,
                  string_agg(event_type || ':' || c, ',' ORDER BY event_type)
                    AS type_counts
           FROM t GROUP BY user_id)
         SELECT e.user_id,
                count(*) AS n_events,
                CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT)
                  AS value_m,
                min(epoch_ns(ts) // 1000) AS first_us,
                max(epoch_ns(ts) // 1000) AS last_us,
                tc.type_counts
         FROM events e JOIN tc ON tc.user_id = e.user_id
         GROUP BY e.user_id, tc.type_counts
         ORDER BY e.user_id"""
  )
}
