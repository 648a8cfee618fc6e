package graft.queries

import graft.{GQ, Tables}
import graft.operators.Multimodal
import graft.streaming.Streaming
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing + the streaming operator surface exercised in
  * batch mode (Structured Streaming's unified API: `window()` etc. evaluate
  * identically over a bounded DataFrame, so the driver's batch harness can
  * verify the same expressions the streaming path uses). */
object MultimodalQueries {

  val queries: Seq[GQ] = Seq(
    // Binary media column + metadata struct; oracle checks the real part
    // (byte-level schema plumbing), codecs are stubbed by design.
    GQ("m01_media_meta",
      (s, dir) => {
        val d = Tables.table(s, dir, "documents")
          .withColumn("media", encode(col("text"), "utf-8"))
        Multimodal.withMediaMeta(d, "media", "text/plain")
          .select(col("doc_id"), col("media_meta.mime").as("mime"),
            col("media_meta.n_bytes").as("n_bytes"))
      },
      Some("""SELECT doc_id, 'text/plain' AS mime,
        CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        FROM documents""")),

    // Partition-batched feature extraction (stub codec → rows-only check;
    // the Spark-side execution shape is what's under test).
    GQ("m02_media_features",
      (s, dir) => {
        val d = Tables.table(s, dir, "documents")
          .withColumn("media", encode(col("text"), "utf-8"))
        Multimodal.extractFeatures(d, "media", dim = 16)
          .select(col("doc_id"), size(col("features")).as("dim"),
            element_at(col("features"), 1).as("f0"))
      },
      None),

    // Streaming windowed aggregation evaluated on the bounded events table.
    GQ("s01_tumbling_window",
      (s, dir) => Streaming.windowedCounts(
        Tables.events(s, dir), "ts", "1 hour")
        .select(col("window.start").as("win_start"), col("event_type"), col("n")),
      Some("""SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS win_start,
        event_type, COUNT(*) AS n
        FROM events GROUP BY 1, 2""")),

    GQ("s02_sliding_window",
      (s, dir) => Streaming.windowedCounts(
        Tables.events(s, dir), "ts", "2 hours", slide = Some("1 hour"))
        .select(col("window.start").as("win_start"), col("event_type"), col("n")),
      // each event lands in two 2h windows at 1h slide
      Some("""WITH shifted AS (
          SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h, 0 AS back FROM events
          UNION ALL
          SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)), 1 FROM events)
        SELECT CAST(h - back * INTERVAL 1 HOUR AS TIMESTAMP) AS win_start,
          event_type, COUNT(*) AS n
        FROM shifted GROUP BY 1, 2"""))
  )
}
