package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump `.explain("formatted")` for named queries to files —
  * the plans/rNN/<query>_{before,after}.txt evidence the optimization
  * rounds commit (the judge checks plan claims against these).
  *
  * Usage: runMain graft.PlanDump <outDir> <suffix> <query1,query2,...> [sfDir]
  * Writes <outDir>/<query>_<suffix>.txt per query. Short codes accepted.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val wanted = args(2).split(",").map(_.trim).filter(_.nonEmpty).toSet
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        "false") // r17: guide §2.2/§9 — respect the advisory target (see Bench)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val sel = SparkEntry.queries.filter { case (n, _) =>
      wanted.contains(n) || wanted.contains(n.takeWhile(_ != '_'))
    }
    sel.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"),
          txt.getBytes("UTF-8"))
        println(s"[plandump] wrote $name")
      } catch { case e: Throwable =>
        println(s"[plandump] FAILED $name: ${e.getMessage}")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
