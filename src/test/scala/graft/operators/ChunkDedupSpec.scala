package graft.operators

import graft.SparkSpec

class ChunkDedupSpec extends SparkSpec {
  import spark.implicits._

  // chunkWords = 2 keeps fixtures readable: "a b c d" → chunks ["a b", "c d"]
  private def run(docs: Seq[(Long, String)]) =
    Dedup.crossDocChunkDedup(docs.toDF("doc_id", "text"), chunkWords = 2)
      .orderBy("doc_id")
      .select("doc_id", "n_chunks", "n_kept", "kept_text")
      .as[(Long, Long, Long, Option[String])].collect().toSeq

  test("a chunk shared across documents survives only in the smallest (doc, pos)") {
    val out = run(Seq(
      (1L, "alpha beta gamma delta"),  // chunks: "alpha beta", "gamma delta"
      (2L, "alpha beta unique words"), // "alpha beta" duplicated → cut here
      (3L, "gamma delta")              // duplicated → cut here
    ))
    assert(out == Seq(
      (1L, 2L, 2L, Some("alpha beta gamma delta")),
      (2L, 2L, 1L, Some("unique words")),
      (3L, 1L, 0L, None)))
  }

  test("within-document repeats dedup too, and the earlier position wins") {
    val out = run(Seq((1L, "x y x y z")))
    // chunks: "x y"@0, "x y"@1, "z"@2 → position 0 keeps, 1 cut
    assert(out == Seq((1L, 3L, 2L, Some("x y z"))))
  }

  test("the final partial chunk participates like any other") {
    val out = run(Seq(
      (1L, "p q r"),   // chunks "p q", "r"
      (2L, "r")        // partial chunk "r" collides with doc 1's tail
    ))
    assert(out == Seq(
      (1L, 2L, 2L, Some("p q r")),
      (2L, 1L, 0L, None)))
  }

  test("zero-word documents yield no output row (stated contract)") {
    val out = run(Seq((1L, "   "), (2L, "solo words")))
    assert(out == Seq((2L, 1L, 1L, Some("solo words"))))
  }

  test("reassembly preserves original chunk order regardless of shuffle") {
    val text = (0 until 40).map(i => s"w$i").mkString(" ")
    val out = run(Seq((1L, text)))
    assert(out == Seq((1L, 20L, 20L, Some(text))))
  }
}
