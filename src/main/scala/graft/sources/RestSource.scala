package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 implementation of the reference's paginated REST
  * source shape (SURVEY.md §2.1 S4-S5: OAuth'd GETs following
  * `nextPageToken`, `buisness_profile_etl/main.py:285-314,403-436`).
  *
  * Each page is one `InputPartition`, so pages are fetched in parallel
  * across executors — the scale answer to the reference's sequential
  * page loop. The HTTP fetch is stubbed with a deterministic generator
  * (zero-egress container); a real connector would issue the GET inside
  * `PartitionReader.next` and keep the token→page mapping here.
  * Column pruning is pushed into the reader
  * (`SupportsPushDownRequiredColumns`).
  *
  * Usage:
  *   spark.read.format("graft.sources.RestSource")
  *     .option("pages", 20).option("pageSize", 500).load()
  */
class RestSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RestSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new RestTable(
      opts.getOrDefault("pages", "8").toInt,
      opts.getOrDefault("pageSize", "100").toInt)
  }
}

object RestSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("page", IntegerType, nullable = false),
    StructField("status", StringType, nullable = false),
    StructField("score", DoubleType, nullable = false)))

  /** Deterministic fake payload — the stand-in for one decoded REST
    * record. Pure function of id so tests and the DuckDB oracle can
    * reproduce it: v = (id*1103515245 + 12345) mod 1000.
    */
  def valueOf(id: Long): Long = (id * 1103515245L + 12345L) % 1000L
}

private class RestTable(pages: Int, pageSize: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graft_rest(pages=$pages,pageSize=$pageSize)"
  override def schema(): StructType = RestSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RestScanBuilder(pages, pageSize)
}

private class RestScanBuilder(pages: Int, pageSize: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = RestSource.schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new RestScan(pages, pageSize, required)
}

private class RestScan(pages: Int, pageSize: Int, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    (0 until pages).map(p => RestPage(p, pageSize): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new RestReaderFactory(required)
}

private case class RestPage(page: Int, pageSize: Int) extends InputPartition

private class RestReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val rp = p.asInstanceOf[RestPage]
    new PartitionReader[InternalRow] {
      // A real connector would GET the page here (token = fn(page)).
      private var i = -1
      override def next(): Boolean = { i += 1; i < rp.pageSize }
      override def get(): InternalRow = {
        val id = rp.page.toLong * rp.pageSize + i
        val v = RestSource.valueOf(id)
        val full = Map[String, Any](
          "id" -> id,
          "page" -> rp.page,
          "status" -> UTF8String.fromString(if (v % 5 == 0) "inactive" else "active"),
          "score" -> v / 10.0)
        InternalRow.fromSeq(required.fields.map(f => full(f.name)).toSeq)
      }
      override def close(): Unit = ()
    }
  }
}
