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

    // Partition-batched feature extraction. The stub codec is a
    // deterministic double left-fold over content bytes (cast to float at
    // the end), so DuckDB replays f0 exactly: text is ASCII, hence byte i of
    // encode(text) == ascii(char i+1), and residue class i % 16 == 0 feeds
    // feature 0 in order.
    GQ("m02_media_features",
      (s, dir) => {
        val d = Tables.table(s, dir, "documents")
          .withColumn("media", encode(col("text"), "utf-8"))
        Multimodal.extractFeatures(d, "media", dim = 16)
          .select(col("doc_id"), size(col("features")).as("dim"),
            element_at(col("features"), 1).as("f0"))
      },
      Some("""SELECT doc_id, 16 AS dim,
        CAST(list_reduce(
          list_prepend(CAST(0.0 AS DOUBLE),
            list_transform(range(0, (octet_length(encode(text)) + 15) // 16),
              j -> ascii(substr(text, 16 * j + 1, 1)) / 255.0)),
          (a, b) -> a + b) AS FLOAT) AS f0
        FROM documents""")),

    // The full multimodal training-data flow: bytes → (stub) decode to a
    // feature vector → embedding-cosine near-dup pairs. The oracle replays
    // the ENTIRE pipeline — per-residue-class byte folds (float-cast like
    // the stub), then the same left-fold dot/norm cosine — so the
    // composition is hash-verified end to end, not just per stage.
    // Exact all-pairs is the verification shape; at corpus scale compose
    // extractFeatures with Similarity.lshTopK instead (e02's bucketed plan
    // over the same feature column).
    GQ("m03_media_neardup",
      (s, dir) => {
        val d = Tables.table(s, dir, "documents")
          .withColumn("media", encode(col("text"), "utf-8"))
        val feats = Multimodal.extractFeatures(d, "media", dim = 8)
          .select(col("doc_id"), col("features"))
        graft.operators.Similarity.cosineNearDupPairs(feats,
          threshold = 0.9999, idCol = "doc_id", vecCol = "features")
      },
      Some("""WITH f AS (SELECT doc_id,
          list_transform(range(0, 8), j ->
            CAST(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
              list_transform(range(0, (octet_length(encode(text)) - CAST(j AS INTEGER) + 7) // 8),
                k -> ascii(substr(text, 8 * CAST(k AS INTEGER) + CAST(j AS INTEGER) + 1, 1)) / 255.0)),
              (a, b) -> a + b) AS FLOAT)) AS feat
          FROM documents),
        d AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
          list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
            list_transform(range(1, 9), i -> CAST(a.feat[i] AS DOUBLE) * CAST(b.feat[i] AS DOUBLE))),
            (x, y) -> x + y)
          / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
              list_transform(range(1, 9), i -> CAST(a.feat[i] AS DOUBLE) * CAST(a.feat[i] AS DOUBLE))),
              (x, y) -> x + y))
           * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
              list_transform(range(1, 9), i -> CAST(b.feat[i] AS DOUBLE) * CAST(b.feat[i] AS DOUBLE))),
              (x, y) -> x + y))) AS sim
          FROM f a JOIN f b ON a.doc_id < b.doc_id)
        SELECT a_id, b_id, sim FROM d WHERE sim >= 0.9999""")),

    // Video keyframe near-dup: sample a "keyframe" every 32 payload bytes,
    // fingerprint each frame (stub: PolyHash — the perceptual-hash slot),
    // report pairs sharing >= 2 distinct fingerprints. At sf0.01 the gate is
    // non-vacuous in both directions: 24 pairs pass, a 1-shared-frame pair
    // is rejected. The oracle replays frame offsets, the byte-prefix rolling
    // hash, the hot-fingerprint cap, and the pair count exactly. Like
    // m02/m03, the replay leans on the corpus being ASCII (byte offsets ==
    // char offsets); on multibyte text the OPERATOR is fine but this
    // char-indexed SQL replay would diverge.
    GQ("m04_keyframe_dedup",
      (s, dir) => Multimodal.keyframeDedup(
        Tables.table(s, dir, "documents")
          .withColumn("media", encode(col("text"), "utf-8")),
        idCol = "doc_id", binCol = "media",
        frameBytes = 32, minShared = 2, maxDocFreq = 50),
      Some("""WITH f AS (SELECT doc_id,
            substr(text, CAST(32 * u.i + 1 AS INTEGER), 32) AS frame
          FROM documents,
          UNNEST(range(0, GREATEST(len(text) // 32, 1))) AS u(i)),
        fp AS (SELECT DISTINCT doc_id,
            CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(regexp_extract_all('kf|' || frame, '.'),
                c -> CAST(ascii(c) AS BIGINT))),
              (h, b) -> (h * 257 + b) % 1000000007) AS BIGINT) AS fpv
          FROM f),
        cap AS (SELECT fpv FROM fp GROUP BY fpv HAVING COUNT(*) <= 50),
        p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id
              FROM fp a JOIN fp b ON a.fpv = b.fpv AND a.doc_id < b.doc_id
              JOIN cap ON cap.fpv = a.fpv)
        SELECT a_id, b_id, COUNT(*) AS n_shared
        FROM p GROUP BY 1, 2 HAVING COUNT(*) >= 2""")),

    // Audio-style silence trim: per-frame energy (stub byte-code sum in
    // the RMS slot) with frames under the threshold dropped — the frame
    // explode, energy fold, and trim all evaluate scan-local; only the
    // per-media regroup shuffles. Oracle replays frame offsets and the
    // exact byte-code fold. Threshold 2900 splits real frames from
    // space-heavy/short ones at sf0.01 (4171 kept of 4419). Same ASCII
    // precondition as m02/m03/m04: the char-indexed replay only matches
    // byte-offset frames on single-byte text.
    GQ("m05_silence_trim",
      (s, dir) => Multimodal.silenceTrim(
        Tables.table(s, dir, "documents")
          .withColumn("media", encode(col("text"), "utf-8")),
        idCol = "doc_id", binCol = "media",
        frameBytes = 32, minEnergy = 2900L),
      Some("""WITH f AS (SELECT doc_id,
            substr(text, CAST(32 * u.i + 1 AS INTEGER), 32) AS fr
          FROM documents,
          UNNEST(range(0, GREATEST(len(text) // 32, 1))) AS u(i)),
        e AS (SELECT doc_id,
            CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(regexp_extract_all(fr, '.'),
                c -> CAST(ascii(c) AS BIGINT))),
              (a, b) -> a + b) AS BIGINT) AS energy
          FROM f)
        SELECT doc_id, COUNT(*) AS n_frames,
          CAST(COUNT(*) FILTER (energy >= 2900) AS BIGINT) AS n_kept
        FROM e GROUP BY doc_id""")),

    // Video scene-cut detection: a cut wherever consecutive frames' energy
    // (m05's stub byte-code sum in the perceptual-feature slot) jumps by
    // more than 200 — the shot-boundary heuristic keyframe selection
    // starts from. One window (per media, by frame offset) over the
    // scan-local frame explode; media payloads bound the partition, so no
    // skew hatch needed. minDelta=200 yields cuts in 157/196/2101 rows at
    // sf0.001/0.01/0.1 — non-vacuous at every verification scale. Oracle
    // replays frame offsets, the energy fold, and the lag. Same ASCII
    // precondition as m02-m05 (byte offsets == char offsets in the replay).
    GQ("m06_scene_cuts",
      (s, dir) => Multimodal.sceneCuts(
        Tables.table(s, dir, "documents")
          .withColumn("media", encode(col("text"), "utf-8")),
        idCol = "doc_id", binCol = "media",
        frameBytes = 32, minDelta = 200L),
      Some("""WITH f AS (SELECT doc_id, CAST(32 * u.i AS BIGINT) AS off,
            substr(text, CAST(32 * u.i + 1 AS INTEGER), 32) AS fr
          FROM documents,
          UNNEST(range(0, GREATEST(len(text) // 32, 1))) AS u(i)),
        e AS (SELECT doc_id, off,
            CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(regexp_extract_all(fr, '.'),
                c -> CAST(ascii(c) AS BIGINT))),
              (a, b) -> a + b) AS BIGINT) AS energy
          FROM f),
        l AS (SELECT doc_id, off, energy,
            LAG(energy) OVER (PARTITION BY doc_id ORDER BY off) AS prev
          FROM e)
        SELECT doc_id, off AS cut_offset, energy - prev AS delta
        FROM l WHERE prev IS NOT NULL AND ABS(energy - prev) > 200""")),

    // Watermarked stream-stream interval join, batch-verified: the EXACT
    // expression Streaming.streamStreamJoin runs live (watermarks are
    // no-ops on a bounded input, the join predicate is identical) — each
    // click matched to the same user's purchases in the following 15
    // minutes. At scale both sides shuffle once on user_id and the range
    // predicate bounds streaming state; in batch it's a plain shuffle join.
    GQ("s04_stream_join",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val clicks = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts").as("click_ts"),
            col("event_id").as("click_id"))
        val buys = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts").as("buy_ts"),
            col("event_id").as("buy_id"))
        Streaming.streamStreamJoin(clicks, buys,
          leftTs = "click_ts", rightTs = "buy_ts", key = "user_id",
          maxDelay = "15 minutes")
          .select("user_id", "click_id", "buy_id")
      },
      Some("""SELECT c.user_id, c.event_id AS click_id, p.event_id AS buy_id
        FROM events c JOIN events p
          ON c.user_id = p.user_id
         AND c.event_type = 'click' AND p.event_type = 'purchase'
         AND CAST(p.ts AS TIMESTAMP) >= CAST(c.ts AS TIMESTAMP)
         AND CAST(p.ts AS TIMESTAMP) <=
             CAST(c.ts AS TIMESTAMP) + INTERVAL 15 MINUTE""")),

    // The OUTER form of s04 — the conversion-funnel shape: every click,
    // matched to following-15-minute purchases OR null-padded when none
    // arrived. In a live stream Spark holds the click in state until the
    // watermark proves no purchase can still match, then emits the
    // unmatched row (why both sides watermark and the predicate is
    // time-bounded — unbounded outer state would never discharge); on
    // bounded input the watermark is a no-op and the result equals this
    // plain batch LEFT join, which is the contract being verified.
    GQ("s05_stream_outer_join",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val clicks = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts").as("click_ts"),
            col("event_id").as("click_id"))
        val buys = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts").as("buy_ts"),
            col("event_id").as("buy_id"))
        Streaming.streamStreamJoin(clicks, buys,
          leftTs = "click_ts", rightTs = "buy_ts", key = "user_id",
          maxDelay = "15 minutes", joinType = "left_outer")
          .select("user_id", "click_id", "buy_id")
      },
      Some("""SELECT c.user_id, c.event_id AS click_id, p.event_id AS buy_id
        FROM (SELECT * FROM events WHERE event_type = 'click') c
        LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
          ON c.user_id = p.user_id
         AND CAST(p.ts AS TIMESTAMP) >= CAST(c.ts AS TIMESTAMP)
         AND CAST(p.ts AS TIMESTAMP) <=
             CAST(c.ts AS TIMESTAMP) + INTERVAL 15 MINUTE""")),

    // The FULL-outer form completing s04/s05 — both funnel gaps at once:
    // clicks with no purchase (left null-pad, s05's signal) AND purchases
    // with no preceding click in the window (right null-pad — the
    // attribution-gap rows a funnel audit needs). In a live stream each
    // side's row is held until the watermark proves no match can arrive,
    // then emitted null-padded — the case where the per-side key
    // resolution matters most (the key must coalesce across sides or
    // right-unmatched rows carry a null key; StreamingSpec pins the live
    // both-sided discharge). On bounded input the watermark is a no-op
    // and the result equals this plain batch FULL join, the verified
    // contract.
    GQ("s06_stream_full_outer_join",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val clicks = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts").as("click_ts"),
            col("event_id").as("click_id"))
        val buys = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts").as("buy_ts"),
            col("event_id").as("buy_id"))
        Streaming.streamStreamJoin(clicks, buys,
          leftTs = "click_ts", rightTs = "buy_ts", key = "user_id",
          maxDelay = "15 minutes", joinType = "full_outer")
          .select("user_id", "click_id", "buy_id")
      },
      Some("""SELECT COALESCE(c.user_id, p.user_id) AS user_id,
          c.event_id AS click_id, p.event_id AS buy_id
        FROM (SELECT * FROM events WHERE event_type = 'click') c
        FULL JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
          ON c.user_id = p.user_id
         AND CAST(p.ts AS TIMESTAMP) >= CAST(c.ts AS TIMESTAMP)
         AND CAST(p.ts AS TIMESTAMP) <=
             CAST(c.ts AS TIMESTAMP) + INTERVAL 15 MINUTE""")),

    // Streaming windowed aggregation evaluated on the bounded events table.
    GQ("s01_tumbling_window",
      (s, dir) => Streaming.windowedCounts(
        Tables.events(s, dir), "ts", "1 hour")
        .select(col("window.start").as("win_start"), col("event_type"), col("n")),
      Some("""SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS win_start,
        event_type, COUNT(*) AS n
        FROM events GROUP BY 1, 2""")),

    GQ("s03_session_window", // gap-based session_window, batch-verified
      (s, dir) => Streaming.sessionCounts(Tables.events(s, dir), "ts", gap = "30 minutes")
        .select(col("session_window.start").as("sess_start"),
          col("user_id"), col("n_events")),
      // oracle: gaps-and-islands with the session_window boundary rule
      // (a gap of exactly the window length starts a new session)
      Some("""WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS tsm FROM events),
        m AS (SELECT user_id, tsm,
                CASE WHEN LAG(tsm, 1) OVER w IS NULL
                          OR epoch_us(tsm) - epoch_us(LAG(tsm, 1) OVER w) >= 1800 * 1000000
                     THEN 1 ELSE 0 END AS new_sess
              FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsm, event_id)),
        sess AS (SELECT user_id, tsm,
                   SUM(new_sess) OVER (PARTITION BY user_id ORDER BY tsm
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
                 FROM m)
        SELECT MIN(tsm) AS sess_start, user_id, COUNT(*) AS n_events
        FROM sess GROUP BY user_id, sid""")),

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
