package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed keep/drop curation verdict (d38's semantics, factored out
  * so the SAME expression tree serves the batch query and the streaming
  * ingest gate): every quality signal — length, TTR-based quality,
  * duplicate-bigram repetition, stopword lang-ID vs the stored lang
  * column — evaluated in ONE scan-local pass, first failing rule wins as
  * the per-doc audit reason. All signals are the exact d03/d04/d05/d15
  * formulations, so the verdict is bit-replayable against the DuckDB
  * oracle.
  *
  * Zero shuffles, zero joins, zero state: the 100 TB shape is a pure map
  * over the corpus — which is also why [[graft.streaming.Streaming
  * .curationGateStream]] can apply this to an unbounded stream unchanged
  * (stateless narrow ops need no watermark and accrue nothing across
  * micro-batches).
  */
object Curation {

  def gate(
      docs: DataFrame,
      idCol: String = "doc_id",
      langCol: String = "lang",
      textCol: String = "text"
  ): DataFrame = {
    val gated = docs
      .select(col(idCol).as("doc_id"), col(langCol).as("lang"),
        words(col(textCol)).as("ws"))
      .select(col("doc_id"), col("lang"), col("ws"),
        size(col("ws")).as("n_words"),
        size(array_distinct(col("ws"))).as("n_distinct"),
        shingles(col("ws"), 2).as("bg"),
        stopwordHits(col("ws"), EnStop).as("en"),
        stopwordHits(col("ws"), EsStop).as("es"),
        stopwordHits(col("ws"), DeStop).as("de"))
      .select(col("doc_id"), col("lang"), col("n_words"),
        ((col("n_distinct").cast("double") / nullif(col("n_words"), lit(0))
          * lit(0.5)) +
          (least(col("n_words").cast("double") / lit(20.0), lit(1.0))
            * lit(0.5))).as("quality"),
        (lit(1.0) - size(array_distinct(col("bg"))).cast("double")
          / nullif(size(col("bg")), lit(0))).as("dup_bigram_ratio"),
        when(col("en") >= col("es") && col("en") >= col("de"), "en")
          .when(col("es") >= col("de"), "es").otherwise("de")
          .as("detected_lang"))
    val reason = when(col("quality") < 0.62, "low_quality")
      .when(col("n_words") < 15, "too_short")
      .when(col("dup_bigram_ratio") > 0.12, "repetitive")
      .when(col("detected_lang") =!= col("lang"), "lang_mismatch")
      .otherwise("ok")
    gated.select(col("doc_id"), col("n_words"), col("quality"),
      col("dup_bigram_ratio"), col("detected_lang"),
      reason.as("reason"), (reason === "ok").as("keep"))
  }
}
