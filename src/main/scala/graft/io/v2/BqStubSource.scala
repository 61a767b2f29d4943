package graft.io.v2

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import scala.jdk.CollectionConverters._

/** File layout shared by the read and write sides: a "table" is either a
  * single JSONL file or a DIRECTORY of `*.json` chunk files (what the
  * write side produces), concatenated in file-name order.
  */
private[v2] object BqStubLayout {
  def files(path: String): Seq[java.io.File] = {
    val f = new java.io.File(path)
    if (f.isDirectory)
      f.listFiles().filter(_.getName.endsWith(".json")).sortBy(_.getName).toSeq
    else Seq(f)
  }

  /** All non-blank lines of the table, in deterministic order. */
  def lines(path: String): Iterator[String] =
    files(path).iterator.flatMap { f =>
      // small files read eagerly so the Source closes deterministically
      val src = scala.io.Source.fromFile(f, "UTF-8")
      try src.getLines().filter(_.trim.nonEmpty).toList
      finally src.close()
    }

  /** (file path, non-blank line count) per chunk file — the plan-time
    * snapshot the page partitions are pinned to.
    */
  def fileCounts(path: String): Seq[(String, Long)] =
    files(path).map { f =>
      val src = scala.io.Source.fromFile(f, "UTF-8")
      try f.getPath -> src.getLines().count(_.trim.nonEmpty).toLong
      finally src.close()
    }
}

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

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    BqStubLayout.lines(options.get("path")).buffered.headOption match {
      case Some(line) =>
        val fields = new ObjectMapper().readTree(line).fieldNames().asScala.toSeq
        StructType(fields.map(StructField(_, StringType)))
      case None => StructType(Nil)
    }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    // Spark hands getTable the case-SENSITIVE map while inferSchema saw a
    // case-insensitive one — re-wrap so option("PATH", ...) behaves the
    // same in both halves
    val opts = new CaseInsensitiveStringMap(properties)
    // the stub speaks the BQ row-dict shape: every column stringly-typed
    // (reader emits UTF8String, writer reads it back) — a user schema
    // with other types would be silently reinterpreted, so reject it
    require(schema.fields.forall(_.dataType == StringType),
      s"graft-bq columns are all STRING (BQ row-dict shape); got ${schema.catalogString}")
    new BqStubTable(schema, opts.get("path"),
      Option(opts.get("pageSize")).map(_.toInt).getOrElse(20000))
  }
}

final class BqStubTable(tableSchema: StructType, path: String, pageSize: Int)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft-bq:$path"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new BqStubScanBuilder(tableSchema, path, pageSize)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new BqStubWriteBuilder(info.schema(), path, pageSize)
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
    // the per-file line counts are the BQ job metadata lookup of the stub
    // — ONE driver pass. Pages are pinned to (file, line-range) SPANS
    // captured here, so (1) each reader opens only its own files instead
    // of re-reading every preceding chunk, and (2) chunk files appended
    // CONCURRENTLY by another job (the write side's designed use) cannot
    // shift positions mid-scan and duplicate/drop rows — they are simply
    // invisible to this scan, like a BQ job's snapshot.
    val counts = BqStubLayout.fileCounts(path)
    val n = counts.map(_._2).sum
    val pages = math.max(1L, (n + pageSize - 1L) / pageSize)
    (0L until pages).map { p =>
      val start = p * pageSize
      val end = math.min((p + 1) * pageSize, n)
      var cum = 0L
      val spans = Seq.newBuilder[(String, Long, Long)]
      counts.foreach { case (f, c) =>
        val from = math.max(start - cum, 0L)
        val until = math.min(end - cum, c)
        if (from < until) spans += ((f, from, until))
        cum += c
      }
      BqStubPage(spans.result()): InputPartition
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new BqStubReaderFactory(required, pushed)
}

/** One 20 000-row page as plan-time-pinned (file, from, until) spans. */
final case class BqStubPage(spans: Seq[(String, Long, Long)])
    extends InputPartition

final class BqStubReaderFactory(required: StructType, pushed: Array[Filter])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val page = partition.asInstanceOf[BqStubPage]
    new PartitionReader[InternalRow] {
      private val mapper = new ObjectMapper()
      private val spanIt = page.spans.iterator
      private var src: scala.io.Source = _
      private var lineIt: Iterator[String] = Iterator.empty
      private var current: InternalRow = _

      // streams each span lazily from ITS file only — no preceding-chunk
      // re-reads, no whole-file materialization
      private def advanceSpan(): Boolean = {
        if (src != null) { src.close(); src = null }
        if (!spanIt.hasNext) false
        else {
          val (f, from, until) = spanIt.next()
          src = scala.io.Source.fromFile(f, "UTF-8")
          lineIt = src.getLines().filter(_.trim.nonEmpty)
            .slice(from.toInt, until.toInt)
          true
        }
      }

      private def fieldMap(line: String): Map[String, String] = {
        val node = mapper.readTree(line)
        node.fieldNames().asScala.map { f =>
          val v = node.get(f)
          // asText() on an object/array node returns "" — nested JSON
          // values must keep their JSON text, not silently blank out
          f -> (if (v.isNull) null
                else if (v.isValueNode) v.asText()
                else v.toString)
        }.toMap
      }

      // range comparisons in UTF8String (UTF-8 byte = code-point) order —
      // Spark's StringType ordering. Java String compares UTF-16 code
      // units, which disagrees above the BMP; pushed filters are trusted
      // as fully applied, so a mismatch would silently drop/keep rows.
      private def cmp(a: String, b: String): Int =
        UTF8String.fromString(a).compareTo(UTF8String.fromString(b))

      private def passes(row: Map[String, String]): Boolean = pushed.forall {
        case EqualTo(a, v)            => row.get(a).flatMap(Option(_)).contains(v.toString)
        case IsNotNull(a)             => row.get(a).flatMap(Option(_)).isDefined
        case GreaterThan(a, v)        => row.get(a).flatMap(Option(_)).exists(cmp(_, v.toString) > 0)
        case GreaterThanOrEqual(a, v) => row.get(a).flatMap(Option(_)).exists(cmp(_, v.toString) >= 0)
        case LessThan(a, v)           => row.get(a).flatMap(Option(_)).exists(cmp(_, v.toString) < 0)
        case LessThanOrEqual(a, v)    => row.get(a).flatMap(Option(_)).exists(cmp(_, v.toString) <= 0)
        case _                        => true
      }

      override def next(): Boolean = {
        current = null
        while (current == null) {
          if (lineIt.hasNext) {
            val row = fieldMap(lineIt.next())
            if (passes(row)) {
              val vals = required.fields.map { f =>
                row.get(f.name).flatMap(Option(_))
                  .map(UTF8String.fromString(_): Any).orNull
              }
              current = InternalRow.fromSeq(vals.toSeq)
            }
          } else if (!advanceSpan()) return false
        }
        true
      }
      override def get(): InternalRow = current
      override def close(): Unit = if (src != null) src.close()
    }
  }
}

/** Append-only write: the reference inserts the `_uploaded` writeback in
  * 20 000-row chunks (`big_query_data_source.py:162-166`); here every task
  * streams its rows into `part-<partition>-<chunk>.json` files of at most
  * `pageSize` rows under the table directory. Values render stringly (the
  * BQ row-dict shape); commit is a no-op — chunk files are final as
  * written, the same at-least-once contract the reference's insert loop
  * has (dedup is the anti-join's job, not the writer's).
  */
final class BqStubWriteBuilder(schema: StructType, path: String, pageSize: Int)
    extends WriteBuilder {
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new BqStubBatchWrite(schema, path, pageSize)
  }
}

final class BqStubBatchWrite(schema: StructType, path: String, pageSize: Int)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    new java.io.File(path).mkdirs()
    new BqStubWriterFactory(schema, path, pageSize)
  }
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

final class BqStubWriterFactory(schema: StructType, path: String, pageSize: Int)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private var chunk = 0
      private var inChunk = 0
      // BufferedWriter, NOT PrintWriter: PrintWriter swallows IOExceptions
      // behind a checkError() flag nobody reads — a full disk would
      // truncate the chunk while the write job reports success
      private var out: java.io.BufferedWriter = _

      // unique per WRITER so appends from different jobs never collide on
      // chunk names (append semantics: files accumulate, nothing replaced)
      private val writerId = java.util.UUID.randomUUID().toString.take(8)

      private def roll(): Unit = {
        if (out != null) out.close()
        val f = new java.io.File(path,
          f"part-$partitionId%05d-$writerId-$chunk%05d.json")
        out = new java.io.BufferedWriter(
          new java.io.OutputStreamWriter(new java.io.FileOutputStream(f),
            java.nio.charset.StandardCharsets.UTF_8))
        chunk += 1; inChunk = 0
      }

      override def write(row: InternalRow): Unit = {
        if (out == null || inChunk >= pageSize) roll()
        // render through the shared JSON model (one escaping
        // implementation, graft.sink.Json) instead of a third copy
        val obj = graft.sink.JObj(schema.fields.indices.map { i =>
          schema.fields(i).name ->
            (if (row.isNullAt(i)) graft.sink.JNull
             else graft.sink.JStr(row.getUTF8String(i).toString): graft.sink.JVal)
        })
        out.write(obj.render); out.write("\n")
        inChunk += 1
      }
      override def commit(): WriterCommitMessage = {
        if (out != null) out.close()
        new WriterCommitMessage {}
      }
      override def abort(): Unit = if (out != null) out.close()
      override def close(): Unit = if (out != null) out.close()
    }
}
