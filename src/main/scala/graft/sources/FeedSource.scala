package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadAllAvailable, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
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
    partitionsPerBatch: Int)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  override def initialOffset(): Offset = FeedOffset(0L)

  /** Trigger.AvailableNow contract: without this trait the engine
    * passes ReadAllAvailable and the whole feed lands in ONE batch,
    * bypassing the admission cap; with it, the engine pins the drain
    * target here and then runs normal getDefaultReadLimit-capped
    * microbatches until the target is reached. The feed's end is
    * already a constant (totalRows), so there is nothing to snapshot.
    */
  override def prepareForTriggerAvailableNow(): Unit = ()

  /** Admission control through the API built for it
    * (SupportsAdmissionControl): the engine passes each trigger's
    * START offset plus the active ReadLimit, so the source is
    * STATELESS — no hand-rolled high-water mark, no call-order
    * assumptions, nothing to restore on restart (the start offset IS
    * the checkpointed position). ReadMaxRows caps a normal trigger;
    * Trigger.Once/AvailableNow ask with ReadAllAvailable and get the
    * whole remaining feed (a plain latestOffset() cap would silently
    * truncate those triggers to one batch).
    */
  override def getDefaultReadLimit: ReadLimit =
    ReadLimit.maxRows(rowsPerTrigger)

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[FeedOffset].rows
    def admit(l: ReadLimit): Long = l match {
      case m: ReadMaxRows => m.maxRows()
      case _: ReadAllAvailable => totalRows
      // composite limits (e.g. Trigger.ProcessingTime with both
      // minRowsPerTrigger and maxRows set): the max-rows child is the
      // admission CAP — honor the tightest one present
      case c: org.apache.spark.sql.connector.read.streaming.CompositeReadLimit =>
        val caps = c.getReadLimits.toSeq
          .collect { case m: ReadMaxRows => m.maxRows() }
        if (caps.isEmpty) rowsPerTrigger else caps.min
      // unknown/future limit kinds: advance conservatively by the
      // configured trigger cap instead of silently delivering the
      // whole remaining feed (min-rows-only limits also land here —
      // the cap still satisfies any minimum the engine would enforce
      // by skipping the batch)
      case _ => rowsPerTrigger
    }
    FeedOffset(math.min(from + admit(limit), totalRows))
  }

  /** Only the admission-control form is used once
    * SupportsAdmissionControl is implemented; keep the legacy
    * entry point total-returning so any caller still drains safely.
    */
  override def latestOffset(): Offset = FeedOffset(totalRows)

  override def reportLatestOffset(): Offset = FeedOffset(totalRows)

  override def commit(end: Offset): Unit = ()

  override def deserializeOffset(json: String): Offset =
    FeedOffset(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val lo = start.asInstanceOf[FeedOffset].rows
    val hi = end.asInstanceOf[FeedOffset].rows
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
