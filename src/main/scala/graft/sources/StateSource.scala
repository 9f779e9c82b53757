package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{
  Batch,
  InputPartition,
  PartitionReader,
  PartitionReaderFactory,
  Scan,
  ScanBuilder,
  SupportsPushDownFilters,
  SupportsPushDownRequiredColumns,
}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.{
  EqualTo,
  Filter,
  GreaterThan,
  GreaterThanOrEqual,
  LessThan,
  LessThanOrEqual,
}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector modeling the reference's OneFS entity scans
  * (SURVEY.md §2.1 S3: enumerate users/groups/zones via REST,
  * onefs.py:1343-1359) as a first-class Spark table: deterministic
  * synthetic cluster-state rows, split into `slices` parallel partitions
  * the way a real connector splits a REST scan across resume-token
  * ranges.
  *
  * Demonstrates the full V2 pushdown contract:
  *  - `SupportsPushDownFilters`: comparison predicates on `id` narrow the
  *    generated range at the SOURCE (the analog of a REST query filter) —
  *    a pushed `id >= x` means those rows are never materialized, not
  *    filtered after the fact;
  *  - `SupportsPushDownRequiredColumns`: unprojected columns are never
  *    built (no string allocation for pruned columns).
  *
  * Row semantics (deterministic, seedless): name = "u"+id,
  * zone = "z"+(id % 5), kind = user|group|proxy by id % 3.
  *
  * Usage: `spark.read.format("graft.sources.StateSource")
  *   .option("rows", n).option("slices", p).load()`
  */
class StateSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = StateSource.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String],
  ): Table = new StateTable(new CaseInsensitiveStringMap(properties))
}

object StateSource {
  val schema: StructType = StructType(
    Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = false),
      StructField("zone", StringType, nullable = false),
      StructField("kind", StringType, nullable = false),
    ),
  )

  private[sources] def kindOf(id: Long): String = (id % 3) match {
    case 0 => "user"
    case 1 => "group"
    case _ => "proxy"
  }
}

class StateTable(options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  override def name(): String = "graft_state"
  override def schema(): StructType = StateSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder = {
    val rows = Option(options.get("rows")).map(_.toLong).getOrElse(1000L)
    val slices = Option(options.get("slices")).map(_.toInt).getOrElse(4)
    val batchRows = Option(options.get("batchRows")).map(_.toLong).getOrElse(rows)
    new StateScanBuilder(rows, slices, batchRows)
  }
}

/** Builder accumulating pushdown state: [lo, hi) row-id range + pruned
  * columns. Only conjunctive top-level comparisons on `id` are consumed;
  * everything else is returned to Spark as a post-scan filter.
  */
class StateScanBuilder(rows: Long, slices: Int, batchRows: Long = Long.MaxValue)
    extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private[graft] var lo: Long = 0L
  private[graft] var hi: Long = rows // exclusive
  private var accepted: Array[Filter] = Array.empty
  private var required: StructType = StateSource.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // v+1 must saturate, not wrap: a consumed filter is never re-applied
    // by Spark, so an overflowed bound would silently drop every row
    def incr(v: Long): Long = if (v == Long.MaxValue) v else v + 1
    val (pushed, residual) = filters.partition {
      case EqualTo("id", _: Long) => true
      case GreaterThan("id", _: Long) => true
      case GreaterThanOrEqual("id", _: Long) => true
      case LessThan("id", _: Long) => true
      case LessThanOrEqual("id", _: Long) => true
      case _ => false
    }
    pushed.foreach {
      case EqualTo("id", v: Long) =>
        lo = math.max(lo, v); if (v != Long.MaxValue) hi = math.min(hi, v + 1)
      case GreaterThan("id", v: Long) => lo = math.max(lo, incr(v))
      case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v)
      case LessThan("id", v: Long) => hi = math.min(hi, v)
      case LessThanOrEqual("id", v: Long) => if (v != Long.MaxValue) hi = math.min(hi, v + 1)
      case _ =>
    }
    accepted = pushed
    residual
  }

  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new StateScan(lo, math.max(lo, hi), slices, required, batchRows)
}

final case class StateRange(lo: Long, hi: Long) extends InputPartition

class StateScan(lo: Long, hi: Long, slices: Int, required: StructType, batchRows: Long = Long.MaxValue)
    extends Scan
    with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new StateMicroBatchStream(lo, hi, slices, required, math.max(1L, batchRows))

  override def description(): String =
    s"graft_state [lo=$lo, hi=$hi, slices=$slices, columns=${required.fieldNames.mkString(",")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    val n = hi - lo
    if (n <= 0) Array.empty
    else {
      val per = math.max(1L, (n + slices - 1) / slices)
      (lo until hi by per).map(s => StateRange(s, math.min(s + per, hi))).toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new StateReaderFactory(required)
}

/** Offset = exclusive upper id bound already emitted. */
final case class StateOffset(v: Long) extends Offset {
  override def json(): String = v.toString
}

/** Micro-batch stream over the same deterministic state rows: each batch
  * advances the offset watermark by `batchRows` ids until the table is
  * exhausted — the resume-token-paged REST scan as a streaming source.
  * Paging happens in `latestOffset` (the source ADMITS only one page per
  * batch); `planInputPartitions` always covers exactly [start, end), so
  * the checkpointed offset range and the emitted rows agree — capping
  * inside planInputPartitions instead would checkpoint offsets that were
  * never read (silent data loss on the paged tail). Batches split into
  * `slices` partitions exactly like the batch scan. On recovery the page
  * cursor is re-seeded from the checkpointed offsets (deserializeOffset),
  * so a restart resumes at the committed watermark instead of re-emitting
  * committed pages.
  */
class StateMicroBatchStream(
    lo: Long,
    hi: Long,
    slices: Int,
    required: StructType,
    batchRows: Long,
) extends MicroBatchStream {

  private var cursor = lo

  override def initialOffset(): Offset = StateOffset(lo)

  override def latestOffset(): Offset = {
    cursor = math.min(hi, cursor + batchRows)
    StateOffset(cursor)
  }

  /** Recovery path: checkpointed offsets flow through here before any new
    * batch is planned — advancing the cursor to the recovered watermark
    * prevents latestOffset from regressing below the committed offset and
    * re-emitting already-committed rows after a restart.
    */
  override def deserializeOffset(json: String): Offset = {
    val v = json.toLong
    cursor = math.max(cursor, v)
    StateOffset(v)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[StateOffset].v
    val e = end.asInstanceOf[StateOffset].v
    cursor = math.max(cursor, e)
    if (e <= s) Array.empty
    else {
      val per = math.max(1L, (e - s + slices - 1) / slices)
      (s until e by per).map(p => StateRange(p, math.min(p + per, e))).toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new StateReaderFactory(required)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

class StateReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val r = partition.asInstanceOf[StateRange]
    new PartitionReader[InternalRow] {
      private var cur = r.lo - 1
      // column generators resolved once per reader, not per row
      private val gens: Array[Long => Any] = required.fieldNames.map {
        case "id" => (id: Long) => id
        case "name" => (id: Long) => UTF8String.fromString("u" + id)
        case "zone" => (id: Long) => UTF8String.fromString("z" + (id % 5))
        case "kind" => (id: Long) => UTF8String.fromString(StateSource.kindOf(id))
        case other => throw new IllegalArgumentException(s"unknown column $other")
      }

      override def next(): Boolean = { cur += 1; cur < r.hi }
      override def get(): InternalRow = new GenericInternalRow(gens.map(g => g(cur)))
      override def close(): Unit = ()
    }
  }
}
