package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import graft.engine.QueryDef
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expression, NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, Count, CountStar, Max, Min, Sum}
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

  /** s22: AGGREGATE pushdown through the same connector
    * (`SupportsPushDownAggregates`) — the REST analog of server-side
    * aggregation. The scan itself returns one pre-aggregated row per
    * surviving page (count/sum/min/max over the page, group columns
    * first), and Spark's final aggregate merges pages into groups:
    * COUNT arrives as a partial long that the rewritten plan SUMs,
    * so the exchange carries #pages rows, never #records. Composes
    * with s21's filter pushdown — the pruned pages (day_offset = 0)
    * are never fetched, let alone aggregated. At 72k pages × 1000
    * rows, the driver-visible data drops 1000×: this is the shape
    * that turns a backfill aggregation from "re-download the lake"
    * into "one request per page". */
  def dsv2AggPushdown(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("graft-pages").load()
      .filter(col("day_offset") >= 1)
      .groupBy("symbol")
      .agg(
        count(lit(1)).as("n"),
        sum("price").as("sum_price"),
        min("trade_id").as("min_id"),
        max("trade_id").as("max_id"))
      .orderBy("symbol")

  /** Restates the stub fetch per symbol: base = |javahash(sym)| % 1000
    * · 10⁵ (BTCUSDT → 58300000, ETHUSDT → 6500000), days {1,2} survive
    * the pushed filter, 5 rows per page. */
  val dsv2AggPushdownOracle: String =
    """WITH pages AS (
      |  SELECT s.symbol, s.base, d.day_offset, p.i
      |  FROM (VALUES ('BTCUSDT', 58300000), ('ETHUSDT', 6500000)) s(symbol, base)
      |  CROSS JOIN (VALUES (1), (2)) d(day_offset)
      |  CROSS JOIN (VALUES (0), (1), (2), (3), (4)) p(i)
      |)
      |SELECT symbol, count(*) AS n,
      |       sum(100.0 + day_offset + i * 0.5) AS sum_price,
      |       CAST(min(base + day_offset * 1000 + i) AS BIGINT) AS min_id,
      |       CAST(max(base + day_offset * 1000 + i) AS BIGINT) AS max_id
      |FROM pages GROUP BY symbol ORDER BY symbol""".stripMargin

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
    QueryDef.sql("s21_dsv2_pages", dsv2PagesOracle)(dsv2Pages),
    QueryDef.sql("s22_dsv2_agg_pushdown", dsv2AggPushdownOracle)(dsv2AggPushdown))
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
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = PagesSource.Schema
  private var pushedAgg: Option[Aggregation] = None

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

  /** Partial-aggregation pushdown (`supportCompletePushDown` stays
    * false): each page returns its own count/min/max/sum and Spark's
    * rewritten final aggregate merges them (COUNT partials get SUMmed).
    * Accepted iff every group key is a bare page-constant column and
    * every aggregate is a non-distinct count/min/max/sum over a bare
    * column — anything else is declined and Spark aggregates the raw
    * scan as before. */
  override def pushAggregation(aggregation: Aggregation): Boolean = {
    import org.apache.spark.sql.connector.expressions.aggregate._
    val groupOk = aggregation.groupByExpressions.forall(e =>
      PagesAggScan.fieldName(e).exists(n =>
        n.equalsIgnoreCase("symbol") || n.equalsIgnoreCase("day_offset")))
    val aggsOk = aggregation.aggregateExpressions.nonEmpty &&
      aggregation.aggregateExpressions.forall {
        case _: CountStar => true
        case c: Count => !c.isDistinct && PagesAggScan.fieldName(c.column).isDefined
        case m: Min => PagesAggScan.fieldName(m.column).isDefined
        case m: Max => PagesAggScan.fieldName(m.column).isDefined
        case s: Sum => !s.isDistinct && PagesAggScan.fieldName(s.column).isDefined
        case _ => false
      }
    if (groupOk && aggsOk) { pushedAgg = Some(aggregation); true } else false
  }

  override def build(): Scan = {
    val pages = for {
      s <- opts.symbols
      d <- 0 until opts.days
      if pushed.forall(evalOn(s, d))
    } yield PagePartition(s, d, opts.pageSize)
    pushedAgg match {
      case Some(a) => new PagesAggScan(pages.toArray, a, pushed)
      case None => new PagesScan(pages.toArray, required, pushed)
    }
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

object PagesAggScan {
  /** Bare single-part column reference, else None (declines pushdown). */
  def fieldName(e: Expression): Option[String] = e match {
    case f: NamedReference if f.fieldNames.length == 1 => Some(f.fieldNames()(0).toLowerCase)
    case _ => None
  }

  /** Scan output field for one aggregate: partial COUNT crosses as
    * long; SUM over an integral column widens to long (matching
    * Spark's Sum result type); MIN/MAX keep the column type. */
  def aggField(f: org.apache.spark.sql.connector.expressions.aggregate.AggregateFunc): StructField =
    f match {
      case _: CountStar => StructField("count_star", LongType, nullable = false)
      case c: Count => StructField(s"count_${fieldName(c.column).get}", LongType, nullable = false)
      case m: Min => StructField(s"min_${fieldName(m.column).get}", colType(fieldName(m.column).get))
      case m: Max => StructField(s"max_${fieldName(m.column).get}", colType(fieldName(m.column).get))
      case s: Sum =>
        val n = fieldName(s.column).get
        StructField(s"sum_$n", colType(n) match {
          case IntegerType | LongType => LongType
          case t => t
        })
      case other => throw new IllegalStateException(s"unpushable aggregate $other")
    }

  private def colType(name: String): DataType =
    PagesSource.Schema(PagesSource.Schema.fieldIndex(name)).dataType
}

/** The aggregated form of [[PagesScan]]: one output row PER PAGE with
  * the group columns first and the per-page partial aggregates after
  * (the column order `V2ScanRelationPushDown` maps positionally). */
class PagesAggScan(pages: Array[PagePartition], agg: Aggregation, pushed: Array[Filter])
    extends Scan with Batch {
  private val schema: StructType = StructType(
    agg.groupByExpressions.map { e =>
      val n = PagesAggScan.fieldName(e).get
      PagesSource.Schema(PagesSource.Schema.fieldIndex(n))
    } ++ agg.aggregateExpressions.map(PagesAggScan.aggField))
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"PagesAggScan pages=${pages.length} pushedAggs=[${agg.aggregateExpressions.mkString(", ")}] " +
      s"groupBy=[${agg.groupByExpressions.mkString(", ")}] pushed=[${pushed.mkString(", ")}]"
  override def planInputPartitions(): Array[InputPartition] =
    // a GLOBAL aggregate must yield a row even when every page is
    // pruned (count=0, null extremes) — SQL global-agg semantics; the
    // zero-size page below produces exactly that identity row
    if (pages.isEmpty && agg.groupByExpressions.isEmpty)
      Array(PagePartition("", 0, 0))
    else pages.asInstanceOf[Array[InputPartition]]
  override def createReaderFactory(): PartitionReaderFactory =
    new PagesAggReaderFactory(agg)
}

class PagesAggReaderFactory(agg: Aggregation) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[PagePartition]
    new PartitionReader[InternalRow] {
      private var done = false
      override def next(): Boolean = if (done) false else { done = true; true }
      override def get(): InternalRow = {
        val rows = PagesSource.pageRows(p.symbol, p.dayOffset, p.pageSize)
        def colVals(name: String): Seq[Any] = name match {
          case "symbol" => Seq.fill(rows.size)(p.symbol)
          case "day_offset" => Seq.fill(rows.size)(p.dayOffset)
          case "trade_id" => rows.map(_._1)
          case "price" => rows.map(_._2)
        }
        // type-native extremes: funneling Int/Long through Double would
        // silently corrupt magnitudes >= 2^53 — this is a general
        // connector, not a fixture-sized one
        def extreme(vs: Seq[Any], isMin: Boolean): Any = vs.head match {
          case _: Int =>
            val xs = vs.map(_.asInstanceOf[Int]); if (isMin) xs.min else xs.max
          case _: Long =>
            val xs = vs.map(_.asInstanceOf[Long]); if (isMin) xs.min else xs.max
          case _: Double =>
            val xs = vs.map(_.asInstanceOf[Double]); if (isMin) xs.min else xs.max
          case _: String =>
            val ss = vs.map(_.asInstanceOf[String])
            UTF8String.fromString(if (isMin) ss.min else ss.max)
        }
        val groupVals: Seq[Any] = agg.groupByExpressions.toSeq.map { e =>
          PagesAggScan.fieldName(e).get match {
            case "symbol" => UTF8String.fromString(p.symbol)
            case "day_offset" => p.dayOffset
          }
        }
        val aggVals: Seq[Any] = agg.aggregateExpressions.toSeq.map {
          case _: CountStar => rows.size.toLong
          case _: Count => rows.size.toLong // source emits no NULLs
          case m: Min if rows.nonEmpty =>
            extreme(colVals(PagesAggScan.fieldName(m.column).get), isMin = true)
          case m: Max if rows.nonEmpty =>
            extreme(colVals(PagesAggScan.fieldName(m.column).get), isMin = false)
          case s: Sum if rows.nonEmpty =>
            colVals(PagesAggScan.fieldName(s.column).get) match {
              case vs if vs.head.isInstanceOf[Int] => vs.map(_.asInstanceOf[Int].toLong).sum
              case vs if vs.head.isInstanceOf[Long] => vs.map(_.asInstanceOf[Long]).sum
              case vs => vs.map(_.asInstanceOf[Double]).sum
            }
          case _: Min | _: Max | _: Sum => null // empty identity page
          case other => throw new IllegalStateException(s"unpushable aggregate $other")
        }
        InternalRow.fromSeq(groupVals ++ aggVals)
      }
      override def close(): Unit = ()
    }
  }
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
