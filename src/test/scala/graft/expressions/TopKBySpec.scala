package graft.expressions

import graft.SparkSpec
import graft.expressions.TopKBy.topkBy
import org.apache.spark.sql.functions._

class TopKBySpec extends SparkSpec {
  import spark.implicits._

  // many partitions so partial aggregation, serialization and merge all run
  private val rows = {
    val rnd = new scala.util.Random(41)
    (0 until 5000).map { i =>
      (i % 7L, rnd.nextInt(1000).toLong, i.toLong)
    }
  }.toDF("grp", "score", "row_id").repartition(16)

  test("topk_by matches the window top-k on every group") {
    val viaAgg = rows.groupBy("grp")
      .agg(topkBy(struct(col("score"), col("row_id")), col("row_id"), 3).as("top"))
      .select(col("grp"), expr("transform(top, s -> s.payload)").as("ids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    val viaWindow = graft.operators.TopK.perGroup(
      rows, Seq("grp"), Seq(col("score").desc, col("row_id").desc), k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (g, rs) =>
        g -> rs.sortBy(t => (-t._2, -t._3)).map(_._3).toVector }
    assert(viaAgg == viaWindow)
  }

  test("topk_by composes with other aggregates in ONE aggregation pass") {
    val out = rows.groupBy("grp").agg(
      count(lit(1)).as("n"),
      sum(col("score")).as("total"),
      topkBy(col("score") * 1000000L + col("row_id"), col("row_id"), 2).as("top"))
    val plan = out.queryExecution.executedPlan.toString
    // one logical aggregation → exactly one shuffle of its own (the other
    // Exchange in the plan is the fixture's repartition), no window, no
    // join, and the heap aggregate runs PARTIAL map-side like count/sum
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("Join"), plan)
    assert(plan.linesIterator.count(_.contains("ENSURE_REQUIREMENTS")) == 1, plan)
    assert(plan.contains("partial_topk_by"), plan)
    val got = out.collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getSeq[org.apache.spark.sql.Row](3).length)).toMap
    assert(got.keySet == (0L until 7L).toSet)
    got.values.foreach { case (n, topLen) =>
      assert(n > 600 && topLen == 2)
    }
  }

  test("topk_by keeps groups smaller than k intact and ignores null ordinals") {
    val small = Seq(
      (1L, Some(10L), 100L), (1L, None, 101L),
      (2L, Some(5L), 200L), (2L, Some(7L), 201L), (2L, Some(6L), 202L)
    ).toDF("grp", "score", "row_id")
    val got = small.groupBy("grp")
      .agg(topkBy(col("score"), col("row_id"), 2).as("top"))
      .select(col("grp"), expr("transform(top, s -> s.payload)").as("ids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    assert(got(1L) == Vector(100L), "null-score row must not count")
    assert(got(2L) == Vector(201L, 202L))
  }

  test("topk_by ties on ord break by larger payload, deterministically") {
    val tied = Seq((1L, 9L, 5L), (1L, 9L, 8L), (1L, 9L, 2L), (1L, 1L, 99L))
      .toDF("grp", "score", "row_id").repartition(4)
    val got = tied.groupBy("grp")
      .agg(topkBy(col("score"), col("row_id"), 2).as("top"))
      .select(expr("transform(top, s -> s.payload)")).as[Seq[Long]].head()
    assert(got == Seq(8L, 5L))
  }

  test("topk_by is SQL-reachable and validates arity/k") {
    rows.createOrReplaceTempView("tk_rows")
    val got = spark.sql("""
      SELECT grp, transform(topk_by(score, row_id, 1), s -> s.payload)[0] AS best
      FROM tk_rows GROUP BY grp""").collect()
    assert(got.length == 7)
    val e = intercept[Exception] {
      spark.sql("SELECT topk_by(score, row_id) FROM tk_rows").collect()
    }
    assert(e.getMessage.contains("topk_by"), e.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("SELECT topk_by(score, row_id, 0) FROM tk_rows").collect()
    }
    assert(e2.getMessage.toLowerCase.contains("k must be"), e2.getMessage)
  }

  test("topk_by works on string payloads and struct ordinals") {
    val df = Seq((1L, 3L, "c"), (1L, 5L, "a"), (1L, 5L, "b"), (1L, 1L, "z"))
      .toDF("grp", "score", "name").repartition(3)
    val got = df.groupBy("grp")
      .agg(topkBy(struct(col("score"), col("name")), col("name"), 3).as("top"))
      .select(expr("transform(top, s -> s.payload)")).as[Seq[String]].head()
    assert(got == Seq("b", "a", "c"))
  }
}
