package graft.operators

import graft.SparkSpec

class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  test("diff classifies added/removed/changed/unchanged") {
    val v1 = Seq((1L, "aa"), (2L, "bb"), (3L, "cc")).toDF("doc_id", "text")
    val v2 = Seq((2L, "bb"), (3L, "cc EDITED"), (4L, "dd")).toDF("doc_id", "text")
    val out = Snapshot.diff(v1, v2).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("diff of a snapshot against itself is all unchanged") {
    val v = Seq((1L, "x"), (2L, "y")).toDF("doc_id", "text")
    assert(Snapshot.diff(v, v).collect().forall(_.getString(1) == "unchanged"))
  }
}
