package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("2-cycle is the fixed point: both nodes hold exactly 1.0 forever") {
    val edges = Seq((1L, 2L, 1L), (2L, 1L, 1L)).toDF("src", "dst", "w")
    val out = ranks(Graph.pageRank(edges, iterations = 6))
    assert(out == Map(1L -> 1000000L, 2L -> 1000000L))
  }

  test("star graph: hand-computed integer recurrence, two rounds") {
    // A(1)->B(2), C(3)->B(2); B dangling.
    val edges = Seq((1L, 2L, 1L), (3L, 2L, 1L)).toDF("src", "dst", "w")
    // round 1: B = 150000 + 850000*(1e6+1e6) DIV 1e6 = 1850000; A=C=150000
    val r1 = ranks(Graph.pageRank(edges, iterations = 1))
    assert(r1 == Map(1L -> 150000L, 2L -> 1850000L, 3L -> 150000L))
    // round 2: B = 150000 + 850000*(150000+150000) DIV 1e6 = 405000
    val r2 = ranks(Graph.pageRank(edges, iterations = 2))
    assert(r2 == Map(1L -> 150000L, 2L -> 405000L, 3L -> 150000L))
  }

  test("weights split contribution by integral division of out-weight") {
    // A->B w=3, A->C w=1: wout=4, contrib B=(1e6*3) DIV 4, C=(1e6*1) DIV 4
    val edges = Seq((1L, 2L, 3L), (1L, 3L, 1L)).toDF("src", "dst", "w")
    val r1 = ranks(Graph.pageRank(edges, iterations = 1))
    assert(r1(2L) == 150000L + 850000L * 750000L / 1000000L) // 787500
    assert(r1(3L) == 150000L + 850000L * 250000L / 1000000L) // 362500
    assert(r1(1L) == 150000L)
  }

  test("parallel duplicate edges combine into their weight sum") {
    val dup = Seq((1L, 2L, 1L), (1L, 2L, 2L), (1L, 3L, 1L)).toDF("src", "dst", "w")
    val merged = Seq((1L, 2L, 3L), (1L, 3L, 1L)).toDF("src", "dst", "w")
    assert(ranks(Graph.pageRank(dup, iterations = 3)) ==
      ranks(Graph.pageRank(merged, iterations = 3)))
  }

  test("deterministic across partitionings; durable checkpoint mode agrees") {
    val edges = (1L to 300L).map(i => (i % 37, (i * 7) % 37, 1L + i % 3))
      .toDF("src", "dst", "w")
    val a = ranks(Graph.pageRank(edges, iterations = 6))
    val b = ranks(Graph.pageRank(edges.repartition(13), iterations = 6))
    assert(a == b)
    val dir = java.nio.file.Files.createTempDirectory("graft-pr-spec").toString
    val c = ranks(Graph.pageRank(edges, iterations = 6, checkpointDir = Some(dir)))
    assert(a == c)
  }

  test("empty edge list yields an empty ranking") {
    val empty = Seq.empty[(Long, Long, Long)].toDF("src", "dst", "w")
    assert(Graph.pageRank(empty, iterations = 3).isEmpty)
  }
}
