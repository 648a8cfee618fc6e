package graft

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale smoke: run the LSH/dedup/ANN paths on a synthetic corpus 1–2
  * orders of magnitude beyond the bench testdata (via the DataSourceV2
  * generator) and report wall-clock, to demonstrate the shuffle-bounded
  * plans hold as data grows. Usage: runMain graft.ScaleSmoke [rows]
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0).toLong else 200000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions).master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scale] $label: $n%d rows in ${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    val docs = spark.read.format("graft.sources.v2.SyntheticDocs")
      .option("rows", rows.toString).option("partitions", cpus)
      .option("seed", "7").load()
      .withColumnRenamed("id", "doc_id")
    time(s"exact dedup over $rows docs")(Dedup.exact(docs).count())
    time(s"minhash LSH pairs over $rows docs")(
      Dedup.minhashPairs(docs, numHashes = 8, bands = 4, threshold = 0.8).count())
    time(s"simhash pairs over $rows docs")(
      Dedup.simhashPairs(docs, maxHamming = 3, chunks = 4).count())
    spark.stop()
  }
}
