package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sources.Tables

/** Driver-graded queries that EXECUTE the Structured Streaming surface —
  * not batch twins, the real `readStream → transform → writeStream` path,
  * drained to completion with `Trigger.AvailableNow` and returned as the
  * sink's final table so the DuckDB oracle can hash-compare it like any
  * other graded query. This is the externally-audited complement to
  * StreamingSpec: a spec proves stream ≡ batch in-JVM; these two entries
  * put the streaming result itself through the driver's correctness gate.
  *
  * Determinism note: both results are micro-batch-partitioning-independent
  * by construction — the admission gate is a stateless stream-static anti
  * join (each row's verdict depends only on the static corpus), and the
  * upsert sink's last-writer-wins merge is associative across batches
  * (LWW(LWW(a), b) = LWW(a ∪ b) under the total (us, event_id) order) —
  * so the graded output is stable however the file source batches the
  * input.
  */
object StreamingGraded {

  /** Start-and-drain a STATEFUL streaming query with the shuffle width
    * right-sized for the drained volume. A stateful operator materializes
    * `shuffle.partitions` state-store instances per store (several stores
    * for an outer join), each committing checkpoint files every batch —
    * at the batch session's width of 32 that is pure fixed overhead for a
    * bounded drain (the stream-stream join spent ~6 of its 8 s there).
    * The conf is a per-query knob because streaming queries PIN the
    * width into their checkpoint at first start: at 100 TB/day this is
    * sized UP per query for state volume, independent of the batch
    * width — which is exactly how it is exercised here, just downward.
    * Restored before returning, so the graded read-back and every other
    * registry query still plan at the session's width. */
  private def drainStateful(s: SparkSession)(
      start: => org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    val old = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    try start.awaitTermination()
    finally s.conf.set("spark.sql.shuffle.partitions", old)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // The streaming admission gate (dd_incremental's arrival-time form at
    // the exact-identity level): the doc_id % 5 == 0 increment arrives as
    // a file stream and is anti-joined per micro-batch against the static
    // corpus's hash set. At scale the static side is a stored hash index
    // partitioned by hash — the join shuffles batch-by-hash, never
    // batch × corpus (see StreamingOps.admitAgainstCorpus).
    "dd_admit_stream" -> ((s, d) => {
      val incoming = Tables.tableStream(s, d, "documents")
        .filter(col("doc_id") % 5 === 0)
      val corpus = Tables.documents(s, d).filter(col("doc_id") % 5 =!= 0)
      val admitted = StreamingOps.admitAgainstCorpus(incoming, corpus)
        .select(col("doc_id"), col("text_hash"))
      val sink = "dd_admit_stream_sink"
      val q = admitted.writeStream.format("memory").queryName(sink)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.table(sink).orderBy("doc_id")
    }),

    // I4 promoted to the oracle gate: a WATERMARKED tumbling aggregate in
    // append mode — the real late-data semantics, not a batch twin. The
    // emitted set is deterministic under AvailableNow: the watermark ends
    // at max(ts) − 1 h regardless of how the file source batches, append
    // mode emits exactly the windows whose END ≤ that final watermark
    // (inclusive is safe: an event AT the watermark belongs to the NEXT
    // window), and the trailing still-open windows are correctly withheld.
    // The oracle mirrors that frontier arithmetic — this grades the
    // window-eviction contract itself, the thing I4's spec could only
    // assert in-JVM. At scale this exact plan runs continuously with
    // bounded state: the watermark is what lets a 100-TB/day feed drop
    // closed-window state instead of holding every hour ever seen.
    "i4_watermark_stream" -> ((s, d) => {
      val agg = Tables.tableStream(s, d, "events")
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(
          date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
          col("event_type"), col("n"))
      val sink = "i4_watermark_sink"
      drainStateful(s) {
        agg.writeStream.format("memory").queryName(sink)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
      }
      s.table(sink).orderBy("hour_start", "event_type")
    }),

    // The hardest streaming operator promoted to the gate: the left-outer
    // STREAM-STREAM interval join (clicks ⋈ purchases within 30 min,
    // 10-min watermarks both sides). Deterministic under AvailableNow by
    // the same frontier argument as i4, applied twice: (1) matches are
    // never missed — a left row's state evicts only when the global
    // watermark (the MIN of both sides' frontiers — the min-watermark
    // gotcha) has passed its entire join window, at which point no
    // qualifying right row can still arrive; (2) the null rows are exactly
    // the unmatched clicks whose window end sits behind that final global
    // watermark — later clicks are withheld as "maybe matched later".
    // The oracle mirrors both halves. At 100 TB this is the operator that
    // joins two unbounded feeds in bounded state — the watermark bound IS
    // the memory bound.
    "i14_stream_join" -> ((s, d) => {
      val joined = StreamingOps.clickToPurchaseLeftJoin(
        Tables.tableStream(s, d, "events"))
      val sink = "i14_stream_join_sink"
      drainStateful(s) {
        joined.writeStream.format("memory").queryName(sink)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
      }
      s.table(sink)
        .select(col("click_id"), col("user_id"),
          expr("unix_micros(click_ts)").as("click_us"),
          col("purchase_id"),
          expr("unix_micros(purchase_ts)").as("purchase_us"))
        .orderBy(col("click_id"), coalesce(col("purchase_id"), lit(-1L)))
    }),

    // The versioned-table upsert sink (L15 / i7's production form) driven
    // end-to-end: the event feed streams through foreachBatch into a
    // `_VERSION`-pointered parquet table, and the graded result is the
    // PUBLISHED snapshot read back through the pointer. Equals i7's
    // target ∪ delta merge because last-writer-wins is associative across
    // the cutoff split.
    "i7b_upsert_stream" -> ((s, d) => {
      val tmp = java.nio.file.Files.createTempDirectory("i7b_upsert").toString
      val ev = Tables.tableStream(s, d, "events")
        .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
      StreamingOps.runUpsertSinkToParquet(s, ev, s"$tmp/ckpt", s"$tmp/table")
      StreamingOps.currentUpsertTable(s, s"$tmp/table")
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("event_type").as("last_type"), col("us").as("last_us"))
        .orderBy("user_id")
    })
  )

  val oracle: Map[String, String] = Map(

    // the same composed plan, batch-declared: increment anti-joined
    // against the corpus hash set on the j1 normalized text hash
    "dd_admit_stream" ->
      """SELECT doc_id, md5(lower(trim(text))) AS text_hash
         FROM documents
         WHERE doc_id % 5 = 0
           AND md5(lower(trim(text))) NOT IN (
             SELECT md5(lower(trim(text))) FROM documents WHERE doc_id % 5 <> 0)
         ORDER BY doc_id""",

    // the emitted-window frontier: every hour window whose end is at or
    // before the final watermark (max event time − 1 h), and no other
    "i4_watermark_stream" ->
      """WITH g AS (
           SELECT date_trunc('hour', ts) AS hs, event_type, count(*) AS n
           FROM events GROUP BY 1, 2)
         SELECT strftime(hs, '%Y-%m-%d %H:%M:%S') AS hour_start, event_type, n
         FROM g
         WHERE hs + INTERVAL 1 HOUR <= (SELECT max(ts) - INTERVAL 1 HOUR FROM events)
         ORDER BY hour_start, event_type""",

    // matches = the plain interval join; nulls = unmatched clicks whose
    // join window closed behind the final global (min-of-sides) watermark
    "i14_stream_join" ->
      """WITH clicks AS (
           SELECT event_id AS click_id, user_id, ts AS click_ts
           FROM events WHERE event_type = 'click'),
         purchases AS (
           SELECT event_id AS purchase_id, user_id AS p_user, ts AS purchase_ts
           FROM events WHERE event_type = 'purchase'),
         wm AS (
           SELECT least((SELECT max(click_ts) FROM clicks),
                        (SELECT max(purchase_ts) FROM purchases))
                  - INTERVAL 10 MINUTE AS w),
         matched AS (
           SELECT c.click_id, c.user_id, epoch_us(c.click_ts) AS click_us,
                  p.purchase_id, epoch_us(p.purchase_ts) AS purchase_us
           FROM clicks c JOIN purchases p
             ON c.user_id = p.p_user
            AND p.purchase_ts BETWEEN c.click_ts
                                  AND c.click_ts + INTERVAL 30 MINUTE),
         unmatched AS (
           SELECT c.click_id, c.user_id, epoch_us(c.click_ts) AS click_us,
                  CAST(NULL AS BIGINT) AS purchase_id,
                  CAST(NULL AS BIGINT) AS purchase_us
           FROM clicks c
           WHERE c.click_ts + INTERVAL 30 MINUTE < (SELECT w FROM wm)
             AND NOT EXISTS (
               SELECT 1 FROM purchases p
               WHERE p.p_user = c.user_id
                 AND p.purchase_ts BETWEEN c.click_ts
                                       AND c.click_ts + INTERVAL 30 MINUTE))
         SELECT * FROM (SELECT * FROM matched UNION ALL SELECT * FROM unmatched)
         ORDER BY click_id, coalesce(purchase_id, -1)""",

    // global last-writer-wins per user — what the published snapshot
    // must equal after the full feed drains through the sink
    "i7b_upsert_stream" ->
      """SELECT user_id, event_id AS last_event_id, event_type AS last_type,
                epoch_us(ts) AS last_us
         FROM events
         QUALIFY row_number() OVER (PARTITION BY user_id
                                    ORDER BY epoch_us(ts) DESC, event_id DESC) = 1
         ORDER BY user_id"""
  )
}
