package graft.sources.v2

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 connector — the engine's analog of the reference's
  * arbitrary pull-based `Source.pop()` (reference stage.py:119-146): a
  * custom generator exposed as a first-class Spark table, so Catalyst
  * plans over it like any scan (pruning, pushdown at the boundary, AQE).
  *
  * Generates deterministic synthetic documents: `rows` rows split over
  * `partitions` input partitions; each partition regenerates its slice
  * from (seed, partition index) alone — no driver-side state ships to
  * executors, so it scales to any cluster and replays identically on task
  * retry (exactly-once semantics under Spark's execution model).
  *
  * Usage:
  * {{{
  * spark.read.format("graft.sources.v2.SyntheticDocs")
  *   .option("rows", "100000").option("partitions", "8").option("seed", "42")
  *   .load()  // schema: id BIGINT, text STRING
  * }}}
  */
class SyntheticDocs extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticDocs.schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SyntheticDocsTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("partitions", "4").toInt,
      properties.getOrDefault("seed", "42").toLong)
}

object SyntheticDocs {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("text", StringType, nullable = false)))
  val vocab: Array[String] = Array(
    "spark", "scan", "join", "sort", "merge", "hash", "filter", "window",
    "group", "query", "row", "batch", "stream", "table", "data", "key")
}

private class SyntheticDocsTable(rows: Long, partitions: Int, seed: Long)
    extends Table with SupportsRead {
  override def name(): String = s"synthetic_docs($rows)"
  override def schema(): StructType = SyntheticDocs.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = SyntheticDocs.schema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] = {
        val per = (rows + partitions - 1) / partitions
        (0 until partitions).map { p =>
          val start = p * per
          val end = math.min(start + per, rows)
          SyntheticDocsPartition(start, end, seed + p): InputPartition
        }.filter(p => p.asInstanceOf[SyntheticDocsPartition].start
          < p.asInstanceOf[SyntheticDocsPartition].end).toArray
      }
      override def createReaderFactory(): PartitionReaderFactory =
        SyntheticDocsReaderFactory
    }
}

private case class SyntheticDocsPartition(start: Long, end: Long, seed: Long)
    extends InputPartition

private object SyntheticDocsReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SyntheticDocsPartition]
    new PartitionReader[InternalRow] {
      private val rnd = new scala.util.Random(p.seed)
      private var cur = p.start - 1
      override def next(): Boolean = { cur += 1; cur < p.end }
      override def get(): InternalRow = {
        val nWords = 8 + rnd.nextInt(8)
        val text = Seq.fill(nWords)(
          SyntheticDocs.vocab(rnd.nextInt(SyntheticDocs.vocab.length))).mkString(" ")
        InternalRow(cur, UTF8String.fromString(text))
      }
      override def close(): Unit = ()
    }
  }
}
