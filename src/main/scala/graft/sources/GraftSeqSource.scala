package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Custom DataSource V2 connector (`spark.read.format("graftseq")`):
  * a deterministic synthetic table — the connector surface itself is
  * the point (TableProvider → Table → ScanBuilder → Batch →
  * InputPartition → PartitionReader), exercised end-to-end by q286 and
  * asserted structurally in DsV2Spec:
  *
  *  - **schema inference**: `(id BIGINT, bucket BIGINT, tok STRING)`
  *    where bucket = md5_mod(id, 97) (the repo's native hash — same
  *    bits as the portable SQL chain, so DuckDB replays the table from
  *    `range()`) and tok = 't' || id % 50;
  *  - **partition planning**: `slices` evenly split id-ranges, each an
  *    `InputPartition` serving rows independently — the multi-executor
  *    scan shape (readers never coordinate; a 1000-executor cluster
  *    gets 1000 independent range readers);
  *  - **column pruning**: implements SupportsPushDownRequiredColumns;
  *    the reader materializes ONLY the pruned columns (a query touching
  *    `bucket, tok` never pays the `id` column — DsV2Spec asserts the
  *    scan's readSchema shrank).
  *
  * Options: `rows` (total row count, required), `slices` (input
  * partitions, default 4). Registered under the short name "graftseq"
  * via META-INF/services (DataSourceRegister).
  */
class GraftSeqProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graftseq"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftSeqTable.fullSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val rows = Option(properties.get("rows"))
      .getOrElse(throw new IllegalArgumentException("graftseq requires option 'rows'"))
      .toLong
    val slices = Option(properties.get("slices")).map(_.toInt).getOrElse(4)
    require(rows >= 0, s"rows must be >= 0, got $rows")
    require(slices >= 1, s"slices must be >= 1, got $slices")
    new GraftSeqTable(rows, slices)
  }
}

object GraftSeqTable {
  val fullSchema: StructType = new StructType()
    .add("id", LongType, nullable = false)
    .add("bucket", LongType, nullable = false)
    .add("tok", StringType, nullable = false)
}

class GraftSeqTable(rows: Long, slices: Int) extends Table with SupportsRead {
  override def name(): String = s"graftseq(rows=$rows, slices=$slices)"
  override def schema(): StructType = GraftSeqTable.fullSchema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftSeqScanBuilder(rows, slices)
}

class GraftSeqScanBuilder(rows: Long, slices: Int)
  extends ScanBuilder with SupportsPushDownRequiredColumns {

  private var required: StructType = GraftSeqTable.fullSchema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new GraftSeqScan(rows, slices, required)
}

class GraftSeqScan(rows: Long, slices: Int, required: StructType)
  extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftSeqScan(rows=$rows, slices=$slices, cols=${required.fieldNames.mkString(",")})"

  override def planInputPartitions(): Array[InputPartition] = {
    // even id-range split; the last slice absorbs the remainder
    val per = math.max(1L, rows / slices)
    (0 until slices).flatMap { i =>
      val start = i.toLong * per
      val end = if (i == slices - 1) rows else math.min(rows, start + per)
      if (start < end || (rows == 0 && i == 0)) Some(GraftSeqPartition(start, end))
      else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftSeqReaderFactory(required.fieldNames)
}

case class GraftSeqPartition(start: Long, end: Long) extends InputPartition

/** Serializable factory shipped to executors; builds rows holding ONLY
  * the pruned columns, in the pruned order. */
class GraftSeqReaderFactory(cols: Array[String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftSeqPartition]
    new PartitionReader[InternalRow] {
      private var cur = p.start - 1
      override def next(): Boolean = { cur += 1; cur < p.end }
      override def get(): InternalRow = {
        val vals: Array[Any] = cols.map {
          case "id" => cur
          case "bucket" =>
            graft.functions.Md5Mod.hash(cur.toString.getBytes("UTF-8"), 97L)
          case "tok" => UTF8String.fromString("t" + (cur % 50))
          case other => throw new IllegalArgumentException(s"unknown column $other")
        }
        new GenericInternalRow(vals)
      }
      override def close(): Unit = ()
    }
  }
}
