package graft

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: IVF recall sweep vs brute-force ground truth. */
object DebugIvf {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.table(spark, sfDir, "embeddings")
    println(s"[ivf] corpus size = ${emb.count()}")
    val qs = emb.filter(col("vec_id") < 50)
    val truth = Similarity.bruteForceTopK(corpus = emb, queries = qs, k = 3)
      .select("q_id", "neighbor_id").cache()
    val nTruth = truth.count()
    for (nc <- Seq(8, 16); np <- Seq(1, 2, 4)) {
      val ivf = Similarity.ivfTopK(corpus = emb, queries = qs, k = 3,
        nCentroids = nc, nProbe = np)
      val hits = ivf.select("q_id", "neighbor_id").join(truth, Seq("q_id", "neighbor_id")).count()
      println(f"[ivf] nCentroids=$nc nProbe=$np recall=${hits.toDouble / nTruth}%.3f")
    }
    spark.stop()
  }
}
