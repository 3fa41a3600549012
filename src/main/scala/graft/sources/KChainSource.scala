package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 provider for the reference's synthetic graph family:
  * `k` disjoint chains of `k` nodes (ids `1..k²`), each chain tail
  * pointing at the dangling sink node 0
  * (pageRank_v2.java:32-43 — the topology the reference's golden file
  * and EMR runs use, k=3 and k=1000).
  *
  * ```
  * spark.read.format("kchain").option("k", 1000)
  *   .option("numPartitions", 64).load()   // → (src LONG, dst LONG)
  * ```
  *
  * The generator is partition-parallel over CHAIN ranges (each input
  * partition owns whole chains, so a chain's edges never straddle
  * readers): k=10⁶ → 10¹² edges stream out of 10⁴ partitions without
  * any driver-side materialization — the scale path that a driver-side
  * CSV fixture generator cannot take.
  */
class KChainSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "kchain"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KChainSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val k = Option(properties.get("k")).map(_.toLong).getOrElse(
      throw new IllegalArgumentException("kchain source requires option 'k'"))
    require(k >= 1, s"k must be >= 1, got $k")
    val parts = Option(properties.get("numpartitions")).orElse(
      Option(properties.get("numPartitions"))).map(_.toInt).getOrElse(4)
    new KChainTable(k, math.max(1, parts))
  }
}

object KChainSource {
  val schema: StructType = StructType(Seq(
    StructField("src", LongType, nullable = false),
    StructField("dst", LongType, nullable = false)))
}

private class KChainTable(k: Long, parts: Int) extends Table with SupportsRead {
  override def name(): String = s"kchain(k=$k)"
  override def schema(): StructType = KChainSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = KChainSource.schema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] = {
        // whole chains per partition: partition p owns chains
        // [p*step+1, min((p+1)*step, k)]
        val n = math.min(parts.toLong, k).toInt
        val step = (k + n - 1) / n
        (0 until n).iterator
          .map(p => KChainPartition(p * step + 1, math.min((p + 1L) * step, k), k))
          .filter(ip => ip.chainFrom <= ip.chainTo)
          .toArray[InputPartition]
      }
      override def createReaderFactory(): PartitionReaderFactory =
        (partition: InputPartition) =>
          new KChainReader(partition.asInstanceOf[KChainPartition])
    }
}

/** Chains `chainFrom..chainTo` (1-based) of a k-chain graph. */
private case class KChainPartition(chainFrom: Long, chainTo: Long, k: Long)
  extends InputPartition

/** Emits the k edges of each owned chain: head h=(c−1)·k+1,
  * h→h+1→…→c·k→0 — identical edge set to `GraphIO.kChainEdges`.
  */
private class KChainReader(p: KChainPartition)
    extends PartitionReader[InternalRow] {
  private var chain = p.chainFrom
  private var pos = 0L // 0..k-1 within the chain
  private val row = new GenericInternalRow(2)

  override def next(): Boolean = {
    if (chain > p.chainTo) return false
    val head = (chain - 1) * p.k + 1
    val src = head + pos
    row.setLong(0, src)
    row.setLong(1, if (pos == p.k - 1) 0L else src + 1)
    pos += 1
    if (pos == p.k) { pos = 0L; chain += 1 }
    true
  }
  override def get(): InternalRow = row
  override def close(): Unit = ()
}
