package graft.sources

import java.util.{Map => JMap, OptionalLong}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{MetadataColumn, SupportsMetadataColumns, SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, Literal, NamedReference, SortDirection, SortOrder, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, Count, CountStar, Max, Min, Sum}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownLimit, SupportsPushDownOffset, SupportsPushDownRequiredColumns, SupportsPushDownTopN, SupportsReportPartitioning, SupportsReportStatistics, SupportsRuntimeV2Filtering}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Custom DataSource V2 connector (`spark.read.format("graftseq")`):
  * a deterministic synthetic table — the connector surface itself is
  * the point (TableProvider → Table → ScanBuilder → Batch →
  * InputPartition → PartitionReader), exercised end-to-end by q286/q290
  * and asserted structurally in DsV2Spec:
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
  *    scan's readSchema shrank);
  *  - **filter pushdown**: implements SupportsPushDownFilters; range
  *    predicates on `id` (`>,>=,<,<=,=`) narrow the planned id-range so
  *    whole InputPartitions are never created — the partition-pruning
  *    shape (a 100 TB scan with `id >= X` skips the files/splits below
  *    X instead of reading-then-filtering them). Accepted filters are
  *    enforced EXACTLY by the range, so they are not re-evaluated
  *    post-scan; anything else (e.g. a `tok` predicate) is returned to
  *    Spark as a residual and evaluated after the scan.
  *  - **aggregate pushdown**: implements SupportsPushDownAggregates
  *    with COMPLETE pushdown of global count/count(col)/min(id)/
  *    max(id)/sum(id) — the scan answers from range metadata in one
  *    closed-form row, zero rows generated (q305, asserted in
  *    DsV2Spec: no aggregate exec in the plan, 1 input partition);
  *  - **limit pushdown**: implements SupportsPushDownLimit; LIMIT n
  *    truncates the planned range to [lo, lo+n) after filter
  *    narrowing, so a `filter.limit(n)` plans exactly n rows (q306).
  *  - **offset pushdown**: implements SupportsPushDownOffset; OFFSET o
  *    advances the planned range head to lo+o, so a paginated
  *    `filter.offset(o).limit(n)` plans exactly the n-row page window
  *    [lo+o, lo+o+n) — keyset pagination that never reads the skipped
  *    prefix (q324).
  *  - **top-N pushdown**: implements SupportsPushDownTopN for a single
  *    sort on `id`: ORDER BY id LIMIT n plans [lo, lo+n), ORDER BY id
  *    DESC LIMIT n plans [hi−n, hi) — the "newest n rows" query plans
  *    n rows instead of sorting the table (q311). Pushdown stays
  *    PARTIAL per the interface default: Spark's own TakeOrdered still
  *    runs above, over exactly the n planned rows.
  *  - **reported statistics**: implements SupportsReportStatistics
  *    (numRows = planned span, sizeInBytes = span × pruned row width),
  *    so Catalyst's join planning sees the post-pushdown size and
  *    auto-broadcasts a narrowed graftseq side with NO hint — the
  *    stats flow a real connector must feed the optimizer (q312).
  *  - **runtime filtering**: implements SupportsRuntimeV2Filtering on
  *    `id`; when a join's build side finishes, Spark hands the scan the
  *    observed join-key IN-set and the scan re-narrows its range BEFORE
  *    planning partitions — DPP-shaped partition pruning driven by
  *    runtime data, the mechanism that keeps a 100 TB fact scan from
  *    reading slices no dim row can match (q313, DsV2Spec asserts the
  *    executed scan's runtime range collapsed).
  *
  *  - **reported partitioning / storage-partitioned joins**: with
  *    option keyed=true the schema gains `grp = id div ceil(rows/
  *    slices)` and the scan implements SupportsReportPartitioning,
  *    declaring KeyGroupedPartitioning on `grp` with one
  *    InputPartition per grp value (HasPartitionKey). Under
  *    spark.sql.sources.v2.bucketing two co-keyed scans join with
  *    ZERO exchange (q350; DsV2Spec asserts the exchange-free plan) —
  *    the Iceberg/Hive-bucketing mechanism for joining co-bucketed
  *    100 TB tables shuffle-free. Keyed mode refuses aggregate
  *    pushdown and runtime filtering: both could change the planned
  *    partition count/values AFTER the partitioning was reported.
  *  - **streaming read**: implements MICRO_BATCH_READ via an
  *    admission-controlled MicroBatchStream (`rowsPerBatch` ids per
  *    trigger through ReadLimit.maxRows, offsets = bare id positions);
  *    Trigger.AvailableNow drains the range in deterministic batches
  *    and kill-and-resume replans from the checkpointed offset (q325,
  *    DsV2Spec asserts batch count and exactly-once totals).
  *
  * Options: `rows` (total row count, required), `slices` (input
  * partitions, default 4), `rowsPerBatch` (streaming admission cap,
  * default `rows`). Registered under the short name "graftseq" via
  * META-INF/services (DataSourceRegister).
  */
class GraftSeqProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graftseq"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    if (options.getBoolean("keyed", false)) GraftSeqTable.keyedSchema
    else GraftSeqTable.fullSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val rows = GraftSeqTable.parseLong(properties, "rows")
    val keyed = Option(properties.get("keyed")).exists(_.trim.equalsIgnoreCase("true"))
    val slices = Option(properties.get("slices"))
      .map(_ => GraftSeqTable.parseLong(properties, "slices").toInt).getOrElse(4)
    val rowsPerBatch = Option(properties.get("rowsPerBatch"))
      .map(_ => GraftSeqTable.parseLong(properties, "rowsPerBatch"))
      .getOrElse(math.max(rows, 1L)) // default: whole range in one batch (>=1 even for an empty table)
    require(rows >= 0, s"rows must be >= 0, got $rows")
    require(slices >= 1, s"slices must be >= 1, got $slices")
    require(rowsPerBatch >= 1, s"rowsPerBatch must be >= 1, got $rowsPerBatch")
    new GraftSeqTable(rows, slices, rowsPerBatch, keyed)
  }
}

object GraftSeqTable {
  val fullSchema: StructType = new StructType()
    .add("id", LongType, nullable = false)
    .add("bucket", LongType, nullable = false)
    .add("tok", StringType, nullable = false)

  /** keyed=true adds `grp = id div ceil(rows/slices)` — the slice
    * index as a VALUE column, which is what lets the scan report
    * KeyGroupedPartitioning over it (storage-partitioned joins). */
  val keyedSchema: StructType = fullSchema.add("grp", LongType, nullable = false)

  /** Parse a required numeric option, naming the option in BOTH the
    * missing and the malformed case (a bare NumberFormatException from
    * `"12x".toLong` names neither the option nor the value). */
  def parseLong(properties: JMap[String, String], name: String): Long = {
    val raw = Option(properties.get(name)).getOrElse(
      throw new IllegalArgumentException(s"graftseq requires option '$name'"))
    try raw.trim.toLong catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"graftseq option '$name' must be an integer, got '$raw'")
    }
  }
}

class GraftSeqTable(rows: Long, slices: Int, rowsPerBatch: Long,
    keyed: Boolean = false) extends Table with SupportsRead
  with SupportsMetadataColumns {
  def this(rows: Long, slices: Int, rowsPerBatch: Long) = this(rows, slices, rowsPerBatch, false)
  def this(rows: Long, slices: Int) = this(rows, slices, rows)
  override def name(): String = s"graftseq(rows=$rows, slices=$slices)"
  override def schema(): StructType =
    if (keyed) GraftSeqTable.keyedSchema else GraftSeqTable.fullSchema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftSeqScanBuilder(rows, slices, rowsPerBatch, keyed)

  /** SupportsMetadataColumns — the read-side DSv2 surface for HIDDEN
    * per-row provenance (`SELECT id, _slice FROM t` works; `SELECT *`
    * never includes it): `_slice` is the ordinal of the InputPartition
    * that served the row — the graftseq spelling of `_metadata.file_
    * path`/`_partition` on a file/bucketed source, the column a skew
    * audit or a reader-placement debug query joins on. Served only when
    * the analyzer adds it to the pruned schema (DsV2Spec asserts absence
    * otherwise); in keyed mode it equals `grp` (one partition per key).
    */
  override def metadataColumns(): Array[MetadataColumn] = Array(
    new MetadataColumn {
      override def name(): String = "_slice"
      override def dataType(): org.apache.spark.sql.types.DataType = LongType
      override def isNullable: Boolean = false
      override def comment(): String =
        "ordinal of the InputPartition that served the row"
    })
}

class GraftSeqScanBuilder(rows: Long, slices: Int, rowsPerBatch: Long,
    keyed: Boolean = false)
  extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters
  with SupportsPushDownAggregates with SupportsPushDownLimit with SupportsPushDownTopN
  with SupportsPushDownOffset {

  def this(rows: Long, slices: Int, rowsPerBatch: Long) = this(rows, slices, rowsPerBatch, false)
  def this(rows: Long, slices: Int) = this(rows, slices, rows, false)

  private var required: StructType =
    if (keyed) GraftSeqTable.keyedSchema else GraftSeqTable.fullSchema
  private var lo: Long = 0L            // narrowed id-range [lo, hi)
  private var hi: Long = rows
  private var accepted: Array[Filter] = Array.empty
  private var aggFuncs: Option[Seq[String]] = None

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** COMPLETE aggregate pushdown for global (ungrouped) count(*) /
    * count(col) / min(id) / max(id) / sum(id): every one is closed-form
    * over the (filter-narrowed) id-range [lo, hi), so the "scan" is a
    * single metadata-only row — zero rows generated, zero rows read.
    * This is the 100 TB `SELECT count(*) WHERE id >= X` shape: range
    * metadata answers it without touching data, like parquet footer
    * counts or an Iceberg manifest. Grouped or non-translatable
    * aggregations are refused and Spark evaluates them normally.
    */
  private def translateAgg(aggregation: Aggregation): Option[Seq[String]] = {
    if (aggregation.groupByExpressions.nonEmpty) return None
    def isCol(e: org.apache.spark.sql.connector.expressions.Expression, name: String): Boolean = e match {
      case nr: NamedReference => nr.fieldNames.length == 1 && nr.fieldNames()(0) == name
      case _ => false
    }
    def isAnyCol(e: org.apache.spark.sql.connector.expressions.Expression): Boolean = e match {
      case nr: NamedReference => nr.fieldNames.length == 1 &&
        GraftSeqTable.fullSchema.fieldNames.contains(nr.fieldNames()(0))
      case _ => false
    }
    val fs = aggregation.aggregateExpressions.toSeq.map {
      case _: CountStar => Some("count")
      // count(col) == count(*): every column is non-null by schema
      case c: Count if !c.isDistinct && isAnyCol(c.column) => Some("count")
      case m: Min if isCol(m.column, "id") => Some("min")
      case m: Max if isCol(m.column, "id") => Some("max")
      case su: Sum if !su.isDistinct && isCol(su.column, "id") => Some("sum")
      case _ => None
    }
    if (fs.forall(_.isDefined)) Some(fs.map(_.get)) else None
  }

  /** LIMIT pushdown: truncate the planned range to [lo, lo+limit) so
    * pruned rows are never planned (Spark runs filter pushdown first,
    * so the limit applies to the already-narrowed range — the order
    * V2ScanRelationPushDown guarantees). The sequence source emits ids
    * in range order, so the truncated range IS the limit's row set and
    * the result stays deterministic; Spark still applies its own
    * GlobalLimit above (the interface contract — pushdown is an
    * optimization, not a correctness transfer).
    */
  override def pushLimit(limit: Int): Boolean = {
    hi = math.min(hi, math.max(0L, lo) + limit)
    true
  }

  /** OFFSET pushdown: advance the planned range head by `offset` rows —
    * the source emits ids in range order, so skipping the first o rows
    * IS advancing lo (the 100 TB pagination shape: page k of a keyset
    * scan plans only its own rows, never reads-then-drops the prefix).
    * Unlike limit/top-N there is NO partial mode in the interface:
    * returning true promises the scan itself drops exactly `offset`
    * rows and Spark removes its Offset operator. Composes with the
    * pushed limit: Spark pushes LIMIT(l+o) first, then OFFSET(o), so
    * the final range is the exact [lo+o, lo+o+l) page window.
    */
  override def pushOffset(offset: Int): Boolean = {
    lo = math.min(hi, math.max(0L, lo) + offset)
    true
  }

  /** Top-N pushdown for a single sort on `id`: the source emits ids in
    * range order, so the top-n under `id ASC` is the range head and
    * under `id DESC` the range tail — truncate the planned range to
    * exactly those n rows. Multi-key or non-`id` sorts are refused
    * (Spark sorts normally). Pushdown is PARTIAL (isPartiallyPushed
    * default true): Spark's TakeOrdered still runs above — over the n
    * planned rows instead of the whole range — which also re-orders
    * the DESC case's ascending reader output.
    */
  /** Both limit and top-N pushdowns are PARTIAL: Spark keeps its own
    * GlobalLimit/TakeOrdered above the truncated scan (disambiguates
    * the default inherited from both pushdown traits). */
  override def isPartiallyPushed(): Boolean = true

  override def pushTopN(orders: Array[SortOrder], limit: Int): Boolean = {
    if (orders.length != 1) return false
    orders(0).expression match {
      case nr: NamedReference
          if nr.fieldNames.length == 1 && nr.fieldNames()(0) == "id" =>
        val l = math.max(0L, lo)
        val h = math.max(l, hi)
        if (orders(0).direction == SortDirection.ASCENDING) hi = math.min(h, l + limit)
        else lo = math.max(l, h - limit)
        true
      case _ => false
    }
  }

  // keyed mode refuses aggregate pushdown: the metadata-row scan has no
  // per-key partitions, so it cannot honor the reported
  // KeyGroupedPartitioning contract (partition count/value identity)
  override def supportCompletePushDown(aggregation: Aggregation): Boolean =
    !keyed && translateAgg(aggregation).isDefined

  override def pushAggregation(aggregation: Aggregation): Boolean =
    if (keyed) false
    else translateAgg(aggregation) match {
      case some @ Some(_) => aggFuncs = some; true
      case None => false
    }

  /** Accept exactly the filters the id-range enforces COMPLETELY (so
    * Spark must not re-evaluate them): range/equality predicates on
    * `id` with a literal long, plus vacuous IsNotNull on the non-null
    * columns. Everything else is a residual for Spark. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, residual) = filters.partition {
      case GreaterThan("id", v: Long)        => lo = math.max(lo, v + 1); true
      case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v); true
      case LessThan("id", v: Long)           => hi = math.min(hi, v); true
      case LessThanOrEqual("id", v: Long)    => hi = math.min(hi, v + 1); true
      case EqualTo("id", v: Long)            => lo = math.max(lo, v); hi = math.min(hi, v + 1); true
      case IsNotNull(c) => GraftSeqTable.fullSchema.fieldNames.contains(c) // all non-null
      case _ => false
    }
    accepted = ok
    residual
  }

  override def pushedFilters(): Array[Filter] = accepted

  override def build(): Scan = aggFuncs match {
    case Some(fs) =>
      new GraftSeqAggScan(math.max(0L, lo), math.max(math.max(0L, lo), hi), fs, accepted)
    case None =>
      new GraftSeqScan(rows, slices, required, math.max(0L, lo), math.max(lo, hi),
        accepted, rowsPerBatch, keyed)
  }
}

/** Completely-pushed-down aggregate "scan": one partition, one row,
  * every value computed in closed form from the id-range — count =
  * hi−lo, min = lo, max = hi−1, sum = (lo + hi − 1)·(hi − lo)/2 (exact
  * in Long at any plausible range). Empty range → count 0, NULL
  * min/max/sum, matching Spark's global-aggregate semantics.
  */
class GraftSeqAggScan(lo: Long, hi: Long, funcs: Seq[String],
    val pushed: Array[Filter]) extends Scan with Batch {

  override def readSchema(): StructType =
    funcs.zipWithIndex.foldLeft(new StructType()) { case (st, (f, i)) =>
      st.add(s"agg_$i", LongType, nullable = f != "count")
    }
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftSeqAggScan(range=[$lo,$hi), aggPushed=[${funcs.mkString(",")}], " +
      s"pushedFilters=[${pushed.mkString(",")}])"

  override def planInputPartitions(): Array[InputPartition] =
    Array(GraftSeqPartition(lo, hi))

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftSeqAggReaderFactory(funcs.toArray)
}

class GraftSeqAggReaderFactory(funcs: Array[String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftSeqPartition]
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = { val r = !emitted; emitted = true; r }
      override def get(): InternalRow = {
        val span = p.end - p.start
        val vals: Array[Any] = funcs.map {
          case "count" => span
          case "min" => if (span > 0) p.start else null
          case "max" => if (span > 0) p.end - 1 else null
          case "sum" =>
            // (start + end - 1) * span / 2: one of the factors is even,
            // so divide it BEFORE multiplying to stay overflow-safe
            if (span > 0) {
              val a = p.start + p.end - 1
              if (span % 2 == 0) a * (span / 2) else (a / 2) * span
            } else null
        }
        new GenericInternalRow(vals)
      }
      override def close(): Unit = ()
    }
  }
}

class GraftSeqScan(rows: Long, slices: Int, required: StructType,
    lo: Long, hi: Long, val pushed: Array[Filter], rowsPerBatch: Long,
    keyed: Boolean = false)
  extends Scan with Batch with SupportsReportStatistics with SupportsRuntimeV2Filtering
  with SupportsReportPartitioning {

  def this(rows: Long, slices: Int, required: StructType,
      lo: Long, hi: Long, pushed: Array[Filter]) =
    this(rows, slices, required, lo, hi, pushed, rows, false)
  def this(rows: Long, slices: Int, required: StructType) =
    this(rows, slices, required, 0L, rows, Array.empty, rows)

  /** keyed grid: ceil(rows/slices)-wide stripes of the ORIGINAL table,
    * so a row's grp column (id div sliceSize) equals its partition's
    * reported key at any pushed-down narrowing. */
  private val sliceSize: Long = math.max(1L, (rows + slices - 1) / slices.toLong)

  private def keyedPartitions: Array[InputPartition] =
    (0 until slices).flatMap { g =>
      val start = math.max(rlo, g.toLong * sliceSize)
      val end = math.min(rhi, math.min(rows, (g.toLong + 1) * sliceSize))
      if (start < end) Some(KeyedGraftSeqPartition(start, end, g.toLong)) else None
    }.toArray

  /** Storage-partitioned-join surface: in keyed mode the scan DECLARES
    * its output is value-grouped on `grp` (one InputPartition per grp
    * value, each carrying its key via HasPartitionKey), so under
    * spark.sql.sources.v2.bucketing.enabled Spark plans joins and
    * aggregations keyed on `grp` WITHOUT a shuffle on this side — the
    * Iceberg/Hive-bucketing mechanism that makes two 100 TB co-bucketed
    * tables joinable with zero exchange. Non-keyed scans report
    * UnknownPartitioning (the default Spark assumes anyway). */
  override def outputPartitioning(): Partitioning =
    if (keyed) {
      val parts = keyedPartitions
      // empty pushed-down range: planInputPartitions serves one plain
      // (key-less) empty partition, so report the matching key-less
      // 1-partition contract instead of a KeyGroupedPartitioning whose
      // count (0) disagrees with the planned partitions (ADVICE r9)
      if (parts.isEmpty) new UnknownPartitioning(1)
      else new KeyGroupedPartitioning(
        Array(Expressions.identity("grp")), parts.length)
    } else new UnknownPartitioning(math.max(1, slices))

  /** Streaming read surface: the same deterministic id-range served as
    * admission-controlled microbatches (q325; recovery + batch-count
    * assertions in DsV2Spec). */
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GraftSeqMicroBatchStream(math.max(0L, lo), math.max(lo, hi), slices,
      rowsPerBatch, required)

  // Runtime-filtered range [rlo, rhi) — starts at the compile-time
  // pushed range; SupportsRuntimeV2Filtering.filter narrows it AFTER
  // the join's build side has executed but BEFORE partitions are
  // planned (BatchScanExec.filteredPartitions re-invokes
  // planInputPartitions post-filter).
  @volatile private var rlo: Long = lo
  @volatile private var rhi: Long = hi

  /** The effective range after any runtime filtering (spec hook). */
  def runtimeRange: (Long, Long) = (rlo, rhi)

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftSeqScan(rows=$rows, slices=$slices, range=[$lo,$hi), " +
      s"cols=${required.fieldNames.mkString(",")}, pushed=[${pushed.mkString(",")}])"

  /** Post-pushdown size estimate: numRows = planned span, sizeInBytes =
    * span × the PRUNED row width (8 B per long column, 24 B per string).
    * This is what lets Catalyst auto-broadcast a narrowed graftseq side
    * with no hint — the join planner compares exactly these bytes
    * against autoBroadcastJoinThreshold.
    */
  override def estimateStatistics(): Statistics = {
    val span = math.max(0L, hi - lo)
    val width = required.fields.map(f =>
      if (f.dataType == LongType) 8L else 24L).sum.max(1L)
    new Statistics {
      override def sizeInBytes(): OptionalLong = OptionalLong.of(span * width)
      override def numRows(): OptionalLong = OptionalLong.of(span)
    }
  }

  // keyed mode opts out of runtime filtering: a post-planning range
  // narrowing could drop key groups AFTER outputPartitioning was
  // consulted, breaking the partition-count/value contract
  override def filterAttributes(): Array[NamedReference] =
    if (keyed) Array.empty else Array(Expressions.column("id"))

  /** Runtime (DPP-shaped) filtering: Spark hands over the join-key
    * values observed on the broadcast side as `id IN (v...)`; contract
    * the planned range to the values' [min, max] envelope. The envelope
    * (not the exact set) keeps partitions contiguous ranges; rows
    * inside it that miss the IN-set are dropped by the join itself —
    * runtime filtering is an optimization, never a correctness
    * transfer. An empty IN-set (no build rows) collapses the range to
    * empty. Non-IN predicates are ignored (same contract).
    */
  override def filter(predicates: Array[Predicate]): Unit =
    predicates.foreach { p =>
      if (p.name() == "IN") {
        val vals: Array[Long] = p.children().collect {
          case l: Literal[_] if l.value().isInstanceOf[java.lang.Long] =>
            l.value().asInstanceOf[java.lang.Long].longValue()
        }
        if (vals.isEmpty) { rhi = rlo }
        else {
          rlo = math.max(rlo, vals.min)
          rhi = math.min(rhi, vals.max + 1)
        }
      }
    }

  override def planInputPartitions(): Array[InputPartition] = {
    if (keyed) {
      val parts = keyedPartitions
      return if (parts.isEmpty) Array(GraftSeqPartition(rlo, rlo)) else parts
    }
    // even split of the PUSHED-DOWN and runtime-filtered range
    // [rlo, rhi) — filters narrow the range BEFORE partitions exist, so
    // pruned slices are never planned; the last slice absorbs the
    // remainder
    val lo = rlo
    val hi = rhi
    val span = math.max(0L, hi - lo)
    if (span == 0L) return Array(GraftSeqPartition(lo, lo))
    val per = math.max(1L, span / slices)
    (0 until slices).flatMap { i =>
      val start = lo + i.toLong * per
      val end = if (i == slices - 1) hi else math.min(hi, start + per)
      if (start < end) Some(GraftSeqPartition(start, end, i.toLong)) else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftSeqReaderFactory(required.fieldNames, sliceSize)
}

/** `slice` = the partition's planning ordinal, served as the `_slice`
  * metadata column when requested (−1 on paths that never surface it:
  * the agg-pushdown metadata row and empty-range placeholders). */
case class GraftSeqPartition(start: Long, end: Long, slice: Long = -1L)
  extends InputPartition

/** A value-keyed partition: one grp stripe, reporting its key so Spark
  * can group co-partitioned scans (storage-partitioned joins). */
case class KeyedGraftSeqPartition(start: Long, end: Long, grp: Long)
  extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](grp))
}

/** Watermark-free streaming offset: the next unread id. JSON form is
  * the bare number, so checkpointed offsets are human-readable and a
  * resume replans from exactly the committed position. */
case class GraftSeqOffset(pos: Long) extends Offset {
  override def json(): String = pos.toString
}

/** Admission-controlled microbatch stream over the id-range [lo, hi):
  * each trigger admits at most `rowsPerBatch` ids (ReadLimit.maxRows —
  * the default read limit, so Trigger.AvailableNow's wrapper drains
  * the range in ceil(span/rowsPerBatch) DETERMINISTIC batches rather
  * than one giant catch-up batch), plans the admitted sub-range as
  * `slices` independent InputPartitions (the same multi-executor shape
  * as the batch scan), and advances the offset to the batch end.
  * Offsets serialize as the bare position, so kill-and-resume replans
  * from the checkpointed id — exactly-once by construction because the
  * rows ARE the ids. This is the Kafka-shaped source contract
  * (initial/latest/deserialize offsets, per-batch partition planning,
  * commit) exercised without a broker.
  */
class GraftSeqMicroBatchStream(lo: Long, hi: Long, slices: Int,
    rowsPerBatch: Long, required: StructType)
  extends MicroBatchStream with SupportsTriggerAvailableNow {

  override def initialOffset(): Offset = GraftSeqOffset(lo)

  /** Trigger.AvailableNow contract (without this Spark falls back to
    * ONE catch-up batch, defeating the admission control): capture the
    * availability bound when the trigger starts. The range end is
    * already fixed at hi, so the capture is a no-op — latestOffset
    * never reports past it. */
  override def prepareForTriggerAvailableNow(): Unit = ()

  override def deserializeOffset(json: String): Offset =
    GraftSeqOffset(json.trim.toLong)

  override def getDefaultReadLimit: ReadLimit = {
    val capped = math.min(rowsPerBatch, Int.MaxValue.toLong).toInt
    ReadLimit.maxRows(capped)
  }

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val pos = start.asInstanceOf[GraftSeqOffset].pos
    limit match {
      case mr: ReadMaxRows => GraftSeqOffset(math.min(hi, pos + mr.maxRows()))
      case _ => GraftSeqOffset(hi) // allAvailable and anything else: drain
    }
  }

  /** Deprecated no-admission-control path — SupportsAdmissionControl
    * guarantees Spark calls the 2-arg form instead. */
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "graftseq reports offsets through latestOffset(start, limit)")

  override def reportLatestOffset(): Offset = GraftSeqOffset(hi)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftSeqOffset].pos
    val e = end.asInstanceOf[GraftSeqOffset].pos
    val span = math.max(0L, e - s)
    if (span == 0L) return Array.empty
    val per = math.max(1L, span / slices)
    (0 until slices).flatMap { i =>
      val from = s + i.toLong * per
      val to = if (i == slices - 1) e else math.min(e, from + per)
      if (from < to) Some(GraftSeqPartition(from, to, i.toLong)) else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftSeqReaderFactory(required.fieldNames)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Serializable factory shipped to executors; builds rows holding ONLY
  * the pruned columns, in the pruned order. Column extractors are
  * resolved ONCE per reader (not string-matched per row), and each
  * reader reuses a single values buffer — get() is two or three direct
  * function calls per row, no per-row closure or Array allocation. */
class GraftSeqReaderFactory(cols: Array[String], sliceSize: Long = 1L)
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val (pStart, pEnd, pSlice) = partition match {
      case GraftSeqPartition(s0, e0, sl) => (s0, e0, sl)
      case KeyedGraftSeqPartition(s0, e0, g) => (s0, e0, g)
      case other => throw new IllegalArgumentException(s"unexpected partition $other")
    }
    new PartitionReader[InternalRow] {
      private var cur = pStart - 1
      private val extractors: Array[Long => Any] = cols.map {
        case "id" => (id: Long) => id
        case "bucket" => (id: Long) =>
          graft.functions.Md5Mod.hash(id.toString.getBytes("UTF-8"), 97L)
        case "tok" => (id: Long) => UTF8String.fromString("t" + (id % 50))
        case "grp" => (id: Long) => id / sliceSize
        case "_slice" => (_: Long) => pSlice // partition-level metadata column
        case other => throw new IllegalArgumentException(s"unknown column $other")
      }
      private val buf = new Array[Any](extractors.length)

      override def next(): Boolean = { cur += 1; cur < pEnd }
      override def get(): InternalRow = {
        var i = 0
        while (i < extractors.length) { buf(i) = extractors(i)(cur); i += 1 }
        // GenericInternalRow aliases the passed array; operators upstream
        // copy the row if they retain it (Spark's own row-reuse contract),
        // so reusing `buf` per reader is safe and allocation-free bar the
        // row wrapper itself.
        new GenericInternalRow(buf)
      }
      override def close(): Unit = ()
    }
  }
}
