package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import graft.engine.QueryDef
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for the reference's paginated-REST backfill
  * (SURVEY S3, ref `airflow/dags/ingest_binance_last_3_days.py:37-46,
  * 105-133`). `ops.bronze.Backfill.paginatedScan` models the same scan as
  * a driver-built page grid flat-mapped through a fetcher; THIS is the
  * engine-grade form — the page grid as a first-class Spark table:
  *
  *   - one page (symbol × day window) per `InputPartition`: 1000 symbols
  *     × 72 windows become 72k independent tasks the scheduler spreads
  *     over the cluster, with locality-free placement (each page is a
  *     remote fetch);
  *   - **filter pushdown prunes pages**: `WHERE symbol = 'BTCUSDT' AND
  *     day_offset >= 1` removes the non-matching pages from the plan
  *     before any task launches — the REST analog of partition pruning
  *     (the pushed filters are page-constant, so handled filters need no
  *     re-evaluation; anything else stays a Spark-side residual);
  *   - **column pruning reaches the reader**: `SELECT trade_id` makes
  *     each reader emit 1-field rows (for a real REST source: a narrower
  *     response projection).
  *
  * The fetch itself is the same deterministic stub as Backfill (offline
  * sandbox, no egress): trade_id = |hash(symbol)| % 1000 · 10⁵ +
  * day · 10³ + i, price = 100 + day + i/2 — restated in the oracle so the
  * whole connector path is hash-compared.
  */
class PagesDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-pages"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PagesSource.Schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new PagesTable(PagesSource.optionsOf(properties.asScala.toMap))
}

object PagesSource {
  val Schema: StructType = StructType(Seq(
    StructField("symbol", StringType, nullable = false),
    StructField("day_offset", IntegerType, nullable = false),
    StructField("trade_id", LongType, nullable = false),
    StructField("price", DoubleType, nullable = false)))

  final case class Options(symbols: Seq[String], days: Int, pageSize: Int)

  def optionsOf(props: Map[String, String]): Options = {
    val m = props.map { case (k, v) => k.toLowerCase -> v }
    Options(
      symbols = m.getOrElse("symbols", "BTCUSDT,ETHUSDT").split(",").map(_.trim).toSeq,
      days = m.getOrElse("days", "3").toInt,
      pageSize = m.getOrElse("pagesize", "5").toInt)
  }

  /** The deterministic stub fetch — same arithmetic as
    * `Backfill.fetchPage` so both scan forms agree row-for-row. */
  def pageRows(symbol: String, dayOffset: Int, pageSize: Int): Seq[(Long, Double)] =
    (0 until pageSize).map { i =>
      (symbol.hashCode.toLong.abs % 1000 * 100000L + dayOffset * 1000L + i,
        100.0 + dayOffset + i * 0.5)
    }

  /** s21: the DSv2 connector read with a pushed page-pruning predicate.
    * The plan's BatchScan lists the pushed filters and the surviving
    * page count (SourcesSpec asserts 3 of 6 pages remain and that no
    * Spark-side Filter node survives). */
  def dsv2Pages(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("graft-pages").load()
      .filter(col("symbol") === "BTCUSDT" && col("day_offset") >= 1)
      .orderBy("day_offset", "trade_id")

  val dsv2PagesOracle: String =
    """WITH pages AS (
      |  SELECT d.day_offset, p.i
      |  FROM (VALUES (1), (2)) d(day_offset)
      |  CROSS JOIN (VALUES (0), (1), (2), (3), (4)) p(i)
      |)
      |SELECT 'BTCUSDT' AS symbol, day_offset,
      |       CAST(58300000 + day_offset * 1000 + i AS BIGINT) AS trade_id,
      |       100.0 + day_offset + i * 0.5 AS price
      |FROM pages ORDER BY day_offset, trade_id""".stripMargin

  def queries: Seq[QueryDef] = Seq(
    QueryDef.sql("s21_dsv2_pages", dsv2PagesOracle)(dsv2Pages))
}

class PagesTable(opts: PagesSource.Options) extends Table with SupportsRead {
  override def name(): String =
    s"graft_pages(${opts.symbols.mkString("|")}, days=${opts.days})"
  override def schema(): StructType = PagesSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PagesScanBuilder(opts)
}

class PagesScanBuilder(opts: PagesSource.Options)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = PagesSource.Schema

  /** A filter is page-prunable iff it references only the page-constant
    * columns (symbol, day_offset) through a comparison this source can
    * evaluate per page. Handled filters are exactly satisfied by pruning
    * — they are NOT returned as residuals. */
  private def evalOn(symbol: String, day: Int)(f: Filter): Boolean = f match {
    case EqualTo(a, v: String) if a.equalsIgnoreCase("symbol") => symbol == v
    case In(a, vs) if a.equalsIgnoreCase("symbol") => vs.contains(symbol)
    case EqualTo(a, v) if a.equalsIgnoreCase("day_offset") =>
      day == v.asInstanceOf[Number].intValue
    case In(a, vs) if a.equalsIgnoreCase("day_offset") =>
      vs.exists(v => v.asInstanceOf[Number].intValue == day)
    case GreaterThan(a, v) if a.equalsIgnoreCase("day_offset") =>
      day > v.asInstanceOf[Number].intValue
    case GreaterThanOrEqual(a, v) if a.equalsIgnoreCase("day_offset") =>
      day >= v.asInstanceOf[Number].intValue
    case LessThan(a, v) if a.equalsIgnoreCase("day_offset") =>
      day < v.asInstanceOf[Number].intValue
    case LessThanOrEqual(a, v) if a.equalsIgnoreCase("day_offset") =>
      day <= v.asInstanceOf[Number].intValue
    case IsNotNull(a)
        if a.equalsIgnoreCase("symbol") || a.equalsIgnoreCase("day_offset") =>
      true // source emits no NULLs
    case _ => false
  }

  /** Structural classification (never value-probed): a filter is pushed
    * iff `evalOn` has a case for it with a value of the right type. */
  private def prunable(f: Filter): Boolean = f match {
    case EqualTo(a, _: String) => a.equalsIgnoreCase("symbol")
    case In(a, _) => a.equalsIgnoreCase("symbol") || a.equalsIgnoreCase("day_offset")
    case EqualTo(a, v) =>
      a.equalsIgnoreCase("day_offset") && v.isInstanceOf[Number]
    case GreaterThan(a, v) =>
      a.equalsIgnoreCase("day_offset") && v.isInstanceOf[Number]
    case GreaterThanOrEqual(a, v) =>
      a.equalsIgnoreCase("day_offset") && v.isInstanceOf[Number]
    case LessThan(a, v) =>
      a.equalsIgnoreCase("day_offset") && v.isInstanceOf[Number]
    case LessThanOrEqual(a, v) =>
      a.equalsIgnoreCase("day_offset") && v.isInstanceOf[Number]
    case IsNotNull(a) =>
      a.equalsIgnoreCase("symbol") || a.equalsIgnoreCase("day_offset")
    case _ => false
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, residual) = filters.partition(prunable)
    pushed = ok
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = {
    val pages = for {
      s <- opts.symbols
      d <- 0 until opts.days
      if pushed.forall(evalOn(s, d))
    } yield PagePartition(s, d, opts.pageSize)
    new PagesScan(pages.toArray, required, pushed)
  }
}

final case class PagePartition(symbol: String, dayOffset: Int, pageSize: Int)
  extends InputPartition

class PagesScan(pages: Array[PagePartition], required: StructType, pushed: Array[Filter])
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"PagesScan pages=${pages.length} " +
      s"pushed=[${pushed.mkString(", ")}] columns=[${required.fieldNames.mkString(",")}]"
  override def planInputPartitions(): Array[InputPartition] =
    pages.asInstanceOf[Array[InputPartition]]
  override def createReaderFactory(): PartitionReaderFactory =
    new PagesReaderFactory(required)
}

class PagesReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[PagePartition]
    new PartitionReader[InternalRow] {
      private val rows = PagesSource.pageRows(p.symbol, p.dayOffset, p.pageSize).iterator
      private var cur: InternalRow = _
      override def next(): Boolean = {
        if (!rows.hasNext) return false
        val (tradeId, price) = rows.next()
        cur = InternalRow.fromSeq(required.fieldNames.toSeq.map {
          case "symbol" => UTF8String.fromString(p.symbol)
          case "day_offset" => p.dayOffset
          case "trade_id" => tradeId
          case "price" => price
        })
        true
      }
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
  }
}
