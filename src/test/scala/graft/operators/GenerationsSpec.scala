package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The naming-overflow hardening (r16 advisor findings): fixed-width
  * zero-padding is a formatting convention, not a bound — generation and
  * batch sequences past their padding must stay visible to readers and
  * truthful to replay probes, or a published store silently vanishes /
  * a committed batch silently duplicates. */
class GenerationsSpec extends SparkSpec {
  import spark.implicits._

  test("generation dirs match past 7 digits and order numerically") {
    val dir = java.nio.file.Files.createTempDirectory("graft-genwidth").toString
    // lexicographically "gen-10000000" < "gen-9999999" — a string sort
    // would resolve the SUPERSEDED generation as current, and the 7-char
    // fixed regex would not match the new name at all (the published
    // store invisible to every reader)
    new java.io.File(s"$dir/gen-9999999").mkdirs()
    new java.io.File(s"$dir/gen-10000000").mkdirs()
    new java.io.File(s"$dir/.gen-10000001.inprogress").mkdirs() // staging: never listed
    new java.io.File(s"$dir/notagen").mkdirs()
    val names = Generations.dirs(spark, dir)
      .map(d => d.substring(d.lastIndexOf('/') + 1))
    assert(names == Seq("gen-9999999", "gen-10000000"))
    assert(Generations.current(spark, dir, "test store")
      .endsWith("gen-10000000"))
  }

  test("a ClosureStore batch sequence past its 6-digit padding keeps replay protection") {
    val dir = java.nio.file.Files.createTempDirectory("graft-batchwidth").toString
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "a b c d e f g h")).toDF("doc_id", "text")
    ClosureStore.build(docs, Seq(1L).toDF("doc_id"), dir)
    ClosureStore.advance(
      Seq((3L, "a b c d e f g h")).toDF("doc_id", "text"),
      Seq.empty[Long].toDF("doc_id"), dir, "day1")
    // simulate the millionth commit: the sequence prefix outgrows %06d —
    // a fixed 7-char drop would parse the batch id as "-day1"-ish garbage,
    // batchIngested would deny the committed batch, and a replay would
    // duplicate its postings silently
    val gen = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("gen-")).map(_.getPath).sorted.last
    val committed = new java.io.File(s"$gen/batches").listFiles().head
    assert(committed.getName == "000000-day1")
    assert(committed.renameTo(new java.io.File(s"$gen/batches/1000000-day1")))
    assert(ClosureStore.batchIngested(spark, dir, "day1"))
    intercept[IllegalStateException] {
      ClosureStore.advance(
        Seq((3L, "a b c d e f g h")).toDF("doc_id", "text"),
        Seq.empty[Long].toDF("doc_id"), dir, "day1")
    }
    // the wide-named batch still composes into reads: doc 3's postings
    // are served, so the closure reaches it from the seed
    assert(ClosureStore.storedClosure(spark, dir)
      .select("node").as[Long].collect().toSet == Set(1L, 2L, 3L))
  }
}
