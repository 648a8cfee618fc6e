package graft

import graft.functions.TextFunctions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad: microbenchmark of text expression pieces. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(10).count()

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet").cache()
    time("cache scan")(docs.count())
    time("scan again")(docs.count())

    time("split only")(
      docs.select(size(split(col("text"), " ")).as("n")).agg(sum("n")).count())
    time("words (split+filter)")(
      docs.select(size(words(col("text"))).as("n")).agg(sum("n")).count())
    val ws = docs.select(col("doc_id"), words(col("text")).as("ws")).cache()
    time("materialize ws cache")(ws.count())
    time("shingles from cached ws")(
      ws.select(size(shingles(col("ws"), 3)).as("n")).agg(sum("n")).count())
    time("shingles+distinct from cached ws")(
      ws.select(size(array_distinct(shingles(col("ws"), 3))).as("n")).agg(sum("n")).count())
    time("transform elemat only")(
      ws.select(size(transform(sequence(lit(1), size(col("ws")) - 2),
        i => element_at(col("ws"), i))).as("n")).agg(sum("n")).count())
    time("transform concat3")(
      ws.select(size(transform(sequence(lit(1), size(col("ws")) - 2),
        i => concat_ws(" ", element_at(col("ws"), i), element_at(col("ws"), i + 1),
          element_at(col("ws"), i + 2)))).as("n")).agg(sum("n")).count())
    time("xxhash of shingles")(
      ws.select(aggregate(transform(shingles(col("ws"), 3), s => xxhash64(s)),
        lit(0L), (a, b) => a + b).as("n")).agg(sum("n")).count())
    spark.stop()
  }
}
