ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "smartpipelinespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Pass the forked JVM's stdout/stderr through VERBATIM instead of routing
// them through sbt's logger. The logger prefixes every line with "[info] "
// / "[error] ", which breaks the driver-side parse of Bench's one-line JSON
// contract (a line-wise json.loads never sees a line starting with '{').
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)

// Parallel forked test groups (r17): one JVM runs the whole 68-suite /
// 560-test tree in ~25 min — past the CI harness's patience, and a single
// JVM shutdown mid-run poisons every remaining suite on the shared
// SparkSession (the r16 gate abort). N independent JVMs, each with its own
// SparkSession, run concurrently: wall time divides by ~N and a killed
// group no longer takes the other groups' results with it. Suites are
// deterministically spread with the measured-slowest ones pinned to
// distinct groups; everything else round-robins by name. Suites share no
// cross-JVM state (every store/checkpoint path is a per-test temp dir).
val testGroupCount = 4
// slowest suites first (measured r17 baseline run), pinned one per group
val heavyTestSuites = Seq(
  "graft.EntrySpec", "graft.operators.ClosureStoreSpec",
  "graft.streaming.ClosureSinkSpec", "graft.operators.GraphSpec",
  "graft.PropertySpec", "graft.streaming.StreamingSpec",
  "graft.operators.SnapshotSpec", "graft.core.FramePipelineSafeSpec",
  "graft.operators.RetrievalSpec", "graft.operators.TemperatureSampleSpec",
  "graft.streaming.EditIndexSinkSpec", "graft.streaming.AnnIndexSinkSpec",
  "graft.operators.SimilaritySpec", "graft.streaming.ParetoSinkSpec",
  "graft.operators.DedupSpec", "graft.operators.SkylineSpec")
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val forkOpts = ForkOptions()
    .withRunJVMOptions((Test / javaOptions).value.toVector)
  val heavyRank = heavyTestSuites.zipWithIndex.toMap
  val (heavy, light) = tests.partition(t => heavyRank.contains(t.name))
  val groups = Array.fill(testGroupCount)(
    scala.collection.mutable.ListBuffer.empty[sbt.TestDefinition])
  heavy.sortBy(t => heavyRank(t.name)).zipWithIndex.foreach { case (t, i) =>
    groups(i % testGroupCount) += t
  }
  light.sortBy(_.name).zipWithIndex.foreach { case (t, i) =>
    groups(i % testGroupCount) += t
  }
  groups.toIndexedSeq.zipWithIndex.map { case (g, i) =>
    Tests.Group(s"grp$i", g.toSeq, Tests.SubProcess(forkOpts))
  }
}
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, testGroupCount))
