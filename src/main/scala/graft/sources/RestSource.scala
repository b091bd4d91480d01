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
  * Pagination is TOKEN-CHAINED, like the real API: the page count is
  * server-side state the client never sees; `planInputPartitions`
  * discovers the pages by following `nextPageToken` until the server
  * stops returning one (the reference's `while nextPageToken`
  * loop, `main.py:301-308`). The token walk is a sequential
  * metadata-only exchange on the Spark driver — inherent to token
  * pagination, and cheap because it carries no page bodies — while the
  * page BODIES are fetched in parallel across executors, one
  * `InputPartition` per discovered token: the scale answer to the
  * reference fetching every body inside that same sequential loop.
  *
  * The HTTP fetch is stubbed by `FakeRestServer` (deterministic,
  * zero-egress container); a real connector would issue the GETs in
  * `nextToken` (page metadata) and `PartitionReader.next` (body).
  * Column pruning is pushed into the reader
  * (`SupportsPushDownRequiredColumns`).
  *
  * Usage:
  *   spark.read.format("graft.sources.RestSource")
  *     .option("pages", 20).option("pageSize", 500).load()
  * (`pages`/`pageSize` configure the FAKE SERVER's remote state; the
  * scan itself only ever sees tokens.)
  */
class RestSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RestSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new RestTable(new FakeRestServer(
      opts.getOrDefault("pages", "8").toInt,
      opts.getOrDefault("pageSize", "100").toInt))
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

/** Deterministic stand-in for the remote endpoint's pagination +
  * auth protocol. Page tokens are opaque to the scan (an embedded
  * page ordinal plus a hash suffix, the shape real APIs use); only
  * the server can mint the next one or decode one into a page of
  * records.
  *
  * Auth models the reference's OAuth refresh flow
  * (`buisness_profile_etl/main.py:116-138`): a LONG-LIVED refresh
  * token is exchanged for a SHORT-LIVED access token that expires
  * after `accessTtlPages` page fetches. Distributed shape: the
  * refresh credential ships with the (serializable) server handle to
  * every task; each executor exchanges for the access token
  * GENERATION its page needs (memoized per JVM — see
  * `RestAuthCache`), so tokens are minted where they're used and
  * never stream driver→executor per request.
  */
private[sources] class FakeRestServer(pages: Int, pageSize: Int)
    extends Serializable {

  /** The long-lived credential (config/secret-store in real life). */
  val refreshToken: String = "rt-graft-fake"

  /** Pages one access token is valid for before it "expires". */
  val accessTtlPages: Int = 4

  /** POST /oauth/token — exchange refresh token for the access token
    * of `generation` (deterministic; a real server returns a random
    * bearer + expiry and the client derives the generation from it).
    */
  def exchangeToken(refresh: String, generation: Int): String = {
    require(refresh == refreshToken, "invalid refresh token")
    f"at-$generation%04d-${(generation * 40503L) & 0xFFFFL}%04x"
  }

  /** Server-side check: the presented access token must be the live
    * generation for the requested page (expired → the client must
    * re-exchange, the reference's `if expired: refresh()` branch).
    */
  def validateAccess(accessToken: String, page: Int): Boolean =
    accessToken == exchangeToken(refreshToken, page / accessTtlPages)
  /** GET /records — the first page's token, or None for an empty
    * collection (the reference's first call without a pageToken).
    */
  def firstToken: Option[String] =
    if (pages > 0) Some(tokenOf(0)) else None

  /** The `nextPageToken` field of page `token`'s response: the
    * following page's token, or None when this page is the last —
    * exhaustion ends the discovery walk.
    */
  def nextToken(token: String): Option[String] = {
    val p = pageIndexOf(token) + 1
    if (p < pages) Some(tokenOf(p)) else None
  }

  /** Decode a token back to its page ordinal (server-side secret). */
  def pageIndexOf(token: String): Int = token.slice(4, 12).toInt

  private def tokenOf(p: Int): String =
    f"tok-$p%08d-${(p * 2654435761L) & 0xFFFFFFL}%06x"

  def sizeOfPage: Int = pageSize
}

private class RestTable(server: FakeRestServer)
    extends Table with SupportsRead {
  override def name(): String = s"graft_rest(pageSize=${server.sizeOfPage})"
  override def schema(): StructType = RestSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RestScanBuilder(server)
}

private class RestScanBuilder(server: FakeRestServer)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = RestSource.schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new RestScan(server, required)
}

private class RestScan(server: FakeRestServer, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    // the nextPageToken discovery walk: page count is unknown until
    // the server stops minting tokens
    Iterator.iterate(server.firstToken)(_.flatMap(server.nextToken))
      .takeWhile(_.isDefined)
      .map(t => RestPage(t.get, server.sizeOfPage): InputPartition)
      .toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new RestReaderFactory(server, required)
}

/** One discovered page: the reader fetches BY TOKEN, like the API. */
private case class RestPage(token: String, pageSize: Int)
    extends InputPartition

/** Per-JVM (≈ per-executor) access-token memo: one exchange per token
  * generation per executor, however many page tasks run there — the
  * distributed analog of the reference's "refresh only when expired".
  * Exposed per-sources for the spec's exchange-count assertion.
  */
private[sources] object RestAuthCache {
  // keyed by (credential, generation), not generation alone: the cache
  // is JVM-global, so two concurrent reads against servers with
  // DIFFERENT refresh tokens must never cross-serve each other's
  // access tokens — generation ordinals collide across servers
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), String]
  val exchanges = new java.util.concurrent.atomic.AtomicInteger(0)
  def accessTokenFor(server: FakeRestServer, page: Int): String = {
    val gen = page / server.accessTtlPages
    cache.computeIfAbsent((server.refreshToken, gen), _ => {
      exchanges.incrementAndGet()
      server.exchangeToken(server.refreshToken, gen)
    })
  }
  def reset(): Unit = { cache.clear(); exchanges.set(0) }
}

private class RestReaderFactory(server: FakeRestServer,
    required: StructType) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val rp = p.asInstanceOf[RestPage]
    val page = server.pageIndexOf(rp.token)
    // authenticate the fetch: exchange (or reuse) the generation's
    // access token, and the server must accept it for this page
    require(server.validateAccess(
      RestAuthCache.accessTokenFor(server, page), page),
      s"stale access token for page $page")
    new PartitionReader[InternalRow] {
      // A real connector would GET the page body here, by rp.token +
      // the bearer token above.
      private var i = -1
      override def next(): Boolean = { i += 1; i < rp.pageSize }
      override def get(): InternalRow = {
        val id = page.toLong * rp.pageSize + i
        val v = RestSource.valueOf(id)
        val full = Map[String, Any](
          "id" -> id,
          "page" -> page,
          "status" -> UTF8String.fromString(if (v % 5 == 0) "inactive" else "active"),
          "score" -> v / 10.0)
        InternalRow.fromSeq(required.fields.map(f => full(f.name)).toSeq)
      }
      override def close(): Unit = ()
    }
  }
}
