package graft.io.v2

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import scala.jdk.CollectionConverters._

/** DataSource V2 stand-in for the BigQuery transport — the shape the
  * reference reads through its REST pagination
  * (`/root/reference/megalista_dataflow/data_sources/big_query/
  * big_query_data_source.py:33,67-71`: 20 000-row pages appended to one
  * in-memory list). Here the same surface is a proper Spark connector:
  *
  *  - rows arrive as JSONL (every BQ value stringly-typed, like the
  *    reference's dict rows; the engine's schema cast runs downstream);
  *  - each 20 000-row PAGE is an `InputPartition`, so pages scan in
  *    parallel across executors instead of appending into one worker;
  *  - column pruning and the sargable filter set (=, IS NOT NULL, <, <=,
  *    >, >=) push INTO the scan (`SupportsPushDownRequiredColumns` /
  *    `SupportsPushDownFilters`) — the explain-visible dual of a real
  *    warehouse connector's slot-side projection and row filtering.
  *
  * Registered as `graft-bq` (service file), so the pipeline's `bqFormat`
  * seam routes BigQuery-typed sources through it with no other change.
  */
class BqStubSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-bq"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val src = scala.io.Source.fromFile(options.get("path"), "UTF-8")
    try src.getLines().find(_.trim.nonEmpty) match {
      case Some(line) =>
        val fields = new ObjectMapper().readTree(line).fieldNames().asScala.toSeq
        StructType(fields.map(StructField(_, StringType)))
      case None => StructType(Nil)
    } finally src.close()
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new BqStubTable(schema, properties.get("path"),
      Option(properties.get("pageSize")).map(_.toInt).getOrElse(20000))
}

final class BqStubTable(tableSchema: StructType, path: String, pageSize: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graft-bq:$path"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new BqStubScanBuilder(tableSchema, path, pageSize)
}

final class BqStubScanBuilder(tableSchema: StructType, path: String, pageSize: Int)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {
  private var required: StructType = tableSchema
  private var pushed: Array[Filter] = Array.empty

  private def sargable(f: Filter): Boolean = f match {
    case _: EqualTo | _: IsNotNull | _: GreaterThan | _: GreaterThanOrEqual |
         _: LessThan | _: LessThanOrEqual => true
    case _ => false
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supp, residual) = filters.partition(sargable)
    pushed = supp
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new BqStubScan(required, pushed, path, pageSize)
}

final class BqStubScan(required: StructType, pushed: Array[Filter],
    path: String, pageSize: Int) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-bq PushedFilters: ${pushed.mkString("[", ", ", "]")}, " +
      s"ReadSchema: ${required.catalogString}"

  override def planInputPartitions(): Array[InputPartition] = {
    // the page count is the BQ job metadata lookup of the stub: one
    // driver-side line count, then one InputPartition per 20 000-row page
    val src = scala.io.Source.fromFile(path, "UTF-8")
    val n = try src.getLines().count(_.trim.nonEmpty) finally src.close()
    val pages = math.max(1L, (n + pageSize - 1L) / pageSize)
    (0L until pages).map(p =>
      BqStubPage(path, p * pageSize, math.min((p + 1) * pageSize, n))
        : InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new BqStubReaderFactory(required, pushed)
}

final case class BqStubPage(path: String, start: Long, end: Long)
    extends InputPartition

final class BqStubReaderFactory(required: StructType, pushed: Array[Filter])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val page = partition.asInstanceOf[BqStubPage]
    new PartitionReader[InternalRow] {
      private val src = scala.io.Source.fromFile(page.path, "UTF-8")
      private val mapper = new ObjectMapper()
      private val it = src.getLines().filter(_.trim.nonEmpty)
        .slice(page.start.toInt, page.end.toInt)
      private var current: InternalRow = _

      private def fieldMap(line: String): Map[String, String] = {
        val node = mapper.readTree(line)
        node.fieldNames().asScala.map { f =>
          val v = node.get(f)
          f -> (if (v.isNull) null else v.asText())
        }.toMap
      }

      private def passes(row: Map[String, String]): Boolean = pushed.forall {
        case EqualTo(a, v)            => row.get(a).flatMap(Option(_)).contains(v.toString)
        case IsNotNull(a)             => row.get(a).flatMap(Option(_)).isDefined
        case GreaterThan(a, v)        => row.get(a).flatMap(Option(_)).exists(_ > v.toString)
        case GreaterThanOrEqual(a, v) => row.get(a).flatMap(Option(_)).exists(_ >= v.toString)
        case LessThan(a, v)           => row.get(a).flatMap(Option(_)).exists(_ < v.toString)
        case LessThanOrEqual(a, v)    => row.get(a).flatMap(Option(_)).exists(_ <= v.toString)
        case _                        => true
      }

      override def next(): Boolean = {
        current = null
        while (current == null && it.hasNext) {
          val row = fieldMap(it.next())
          if (passes(row)) {
            val vals = required.fields.map { f =>
              row.get(f.name).flatMap(Option(_))
                .map(UTF8String.fromString(_): Any).orNull
            }
            current = InternalRow.fromSeq(vals.toSeq)
          }
        }
        current != null
      }
      override def get(): InternalRow = current
      override def close(): Unit = src.close()
    }
  }
}
