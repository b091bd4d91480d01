package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 STREAMING source (MicroBatchStream) — the change-feed
  * shape of the reference's polling ingests, done as a first-class
  * Spark source instead of a rerun batch script: the driver tracks a
  * monotonically increasing row offset, each trigger admits at most
  * `rowsPerTrigger` new rows (a deliberate ingest-rate cap, the
  * knob the reference's sleep-loops approximate), and every
  * microbatch's row range splits into `partitionsPerBatch`
  * InputPartitions read in parallel on executors.
  *
  * Offsets are plain longs serialized as JSON — restart-safe: Spark
  * persists them in the checkpoint log and hands the last committed
  * one back, and because rows are a pure function of their index the
  * replayed batch is byte-identical (exactly-once with a
  * deterministic source + idempotent sink).
  *
  * The feed itself is a deterministic generator (zero-egress
  * container); a real connector would page a change-feed API here —
  * everything above the row generator is the production shape.
  *
  * Usage:
  *   spark.readStream.format("graft.sources.FeedSource")
  *     .option("totalRows", 350).option("rowsPerTrigger", 100).load()
  */
class FeedSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FeedSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new FeedTable(
      opts.getOrDefault("totalRows", "1000").toLong,
      opts.getOrDefault("rowsPerTrigger", "100").toLong,
      opts.getOrDefault("partitionsPerBatch", "4").toInt)
  }
}

object FeedSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("amount", DoubleType, nullable = false)))

  /** 2024-01-01T00:00:00Z + id minutes, in epoch micros. */
  def tsOf(id: Long): Long = 1704067200000000L + id * 60L * 1000000L
  def kindOf(id: Long): String = if (id % 3 == 0) "credit" else "debit"
  def amountOf(id: Long): Double = ((id * 2654435761L) % 100000L) / 100.0
}

private class FeedTable(totalRows: Long, rowsPerTrigger: Long,
    partitionsPerBatch: Int) extends Table with SupportsRead {
  override def name(): String = s"feed($totalRows)"
  override def schema(): StructType = FeedSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = FeedSource.schema
        override def toMicroBatchStream(loc: String): MicroBatchStream =
          new FeedStream(totalRows, rowsPerTrigger, partitionsPerBatch)
      }
    }
}

/** Offset = count of rows admitted so far (exclusive upper bound). */
private case class FeedOffset(rows: Long) extends Offset {
  override def json(): String = rows.toString
}

private class FeedStream(totalRows: Long, rowsPerTrigger: Long,
    partitionsPerBatch: Int) extends MicroBatchStream {

  override def initialOffset(): Offset = FeedOffset(0L)

  /** Admission control: each trigger advances by at most
    * rowsPerTrigger — processAllAvailable drains the feed in
    * ceil(totalRows / rowsPerTrigger) deterministic microbatches.
    * The high-water mark moves in planInputPartitions (called exactly
    * once per executed batch, with its final end offset) rather than
    * in commit(): the engine's is-there-new-data probe can race a
    * late commit callback and would then see the feed as drained one
    * batch early.
    */
  override def latestOffset(): Offset =
    FeedOffset(math.min(lastPlanned + rowsPerTrigger, totalRows))

  @volatile private var lastPlanned: Long = 0L
  override def commit(end: Offset): Unit = ()

  /** Restart path: Spark hands back checkpointed offsets through
    * here before asking for new data — the high-water mark must jump
    * to the restored offset, or latestOffset() would regress below
    * the committed position and REPLAY already-delivered rows (the
    * exactly-once contract breaks exactly on restart, the case it
    * exists for).
    */
  override def deserializeOffset(json: String): Offset = {
    val rows = json.toLong
    if (rows > lastPlanned) lastPlanned = rows
    FeedOffset(rows)
  }

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val lo = start.asInstanceOf[FeedOffset].rows
    val hi = end.asInstanceOf[FeedOffset].rows
    lastPlanned = math.max(lastPlanned, hi)
    val n = math.max(1, partitionsPerBatch)
    // contiguous index ranges, last partition takes the remainder
    val step = math.max(1L, (hi - lo + n - 1) / n)
    (lo until hi by step).map(a =>
      FeedRange(a, math.min(a + step, hi)): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition)
          : PartitionReader[InternalRow] = {
        val r = p.asInstanceOf[FeedRange]
        new PartitionReader[InternalRow] {
          private var i = r.lo - 1
          override def next(): Boolean = { i += 1; i < r.hi }
          override def get(): InternalRow =
            InternalRow(i, FeedSource.tsOf(i),
              UTF8String.fromString(FeedSource.kindOf(i)),
              FeedSource.amountOf(i))
          override def close(): Unit = ()
        }
      }
    }

  override def stop(): Unit = ()
}

private case class FeedRange(lo: Long, hi: Long) extends InputPartition
