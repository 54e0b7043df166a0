package graft.sources

import java.io.ByteArrayOutputStream
import java.util.OptionalLong

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A from-scratch DataSource V2 JSONL source with REAL scan pushdown —
  * the machinery Spark's own file sources get from `FileFormat`, built on
  * the public connector API so the engine's ingest path is first-class:
  *
  *  - **Byte-range splits** ([[JsonlPartition]]): each file is cut into
  *    `splitSize` ranges planned as independent input partitions — the
  *    property that makes a 100 TB JSONL drop readable by 1000 executors
  *    without any coordinator pass. Line ownership uses the classic
  *    text-split protocol (a reader at offset > 0 discards through the
  *    first newline — those bytes belong to the previous split, which
  *    reads one line PAST its nominal end): every line is read exactly
  *    once whatever the boundaries, pinned adversarially in
  *    DataSourceV2Spec at 1 KB splits.
  *  - **Column pruning** ([[SupportsPushDownRequiredColumns]]): only the
  *    required fields are materialized out of each parsed line — a
  *    `count(*)` over a text corpus never allocates a single string.
  *  - **Filter pushdown** ([[SupportsPushDownFilters]]): comparison and
  *    null-check predicates on long/string fields are evaluated on the
  *    parsed tree BEFORE row materialization and REMOVED from the query
  *    plan (the source is exact for accepted filters; everything else is
  *    returned as a residual for Spark to evaluate). The scan's
  *    `description()` exports `PushedFilters`/`ReadSchema` so PlanSpec
  *    asserts the pushdown from the plan string, same as parquet.
  *  - **Statistics** ([[SupportsReportStatistics]]): total byte size from
  *    the file listing, so the optimizer can size joins against the scan.
  *
  * Text JSON is parsed with Jackson (Spark's own JSON dependency — no new
  * libraries), one `readTree` per line. The source registers as
  * `graft-jsonl` via DataSourceRegister (META-INF/services), reads any
  * Hadoop-visible path, and takes the schema externally (the production
  * shape: the catalog pins the schema, no inference pass over the lake) or
  * infers long/double/boolean/string field types from a bounded prefix of
  * the first file when the caller omits it. */
class JsonlV2 extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-jsonl"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    JsonlV2.inferFromPrefix(JsonlV2.pathOf(options))

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new JsonlTable(JsonlV2.pathOf(opts), schema,
      opts.getLong("splitSize", 4L * 1024 * 1024))
  }
}

private[graft] object JsonlV2 {
  def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty, "graft-jsonl: a path is required")
    p
  }

  def mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** List the data files under `path` (a file or a directory), skipping
    * hidden/metadata names the same way FileIndex does. */
  def listFiles(path: String): Seq[(String, Long)] = {
    val fs = FileSystem.get(new java.net.URI(path).normalize() match {
      case u if u.getScheme == null => new java.net.URI(s"file:$path")
      case u                        => u
    }, new Configuration())
    val root = new Path(path)
    val st = fs.getFileStatus(root)
    val files =
      if (st.isDirectory) fs.listStatus(root).toSeq
      else Seq(st)
    files
      .filter(f => f.isFile && f.getLen > 0)
      .map(f => f.getPath.toString -> f.getLen)
      .filterNot { case (p, _) =>
        val name = p.substring(p.lastIndexOf('/') + 1)
        name.startsWith("_") || name.startsWith(".")
      }
      .sortBy(_._1)
  }

  /** Footer-style per-file statistics as the commit wrote them. */
  case class FileStats(rows: Long, ranges: Map[String, (Long, Long)])

  /** Stats from every `_stats-*.json` sidecar: file name → (row count,
    * long-field → (min, max)). Missing sidecars (files written by other
    * tools) simply have no entry — such files are never skipped and veto
    * metadata-only aggregation. */
  def loadStats(path: String): Map[String, FileStats] = {
    val root = new Path(path)
    val fs = FileSystem.get(root.toUri, new Configuration())
    if (!fs.exists(root) || !fs.getFileStatus(root).isDirectory) return Map.empty
    fs.listStatus(root)
      .filter(s => s.isFile && s.getPath.getName.startsWith("_stats-"))
      .flatMap { st =>
        val in = fs.open(st.getPath)
        val tree = try mapper.readTree(in) finally in.close()
        tree.fields().asScala.map { e =>
          val rows = Option(e.getValue.get("_rows")).map(_.longValue).getOrElse(0L)
          val ranges = e.getValue.fields().asScala
            .filter(_.getValue.isArray)
            .map(f => f.getKey ->
              (f.getValue.get(0).longValue, f.getValue.get(1).longValue))
            .toMap
          e.getKey -> FileStats(rows, ranges)
        }.toList
      }.toMap
  }

  private def asLong(v: Any): Option[Long] = v match {
    case l: java.lang.Long    => Some(l.longValue)
    case i: java.lang.Integer => Some(i.longValue)
    case _                    => None
  }

  /** Can ANY row of a file with these per-field ranges satisfy all pushed
    * filters? Conservative: unknown fields/shapes never prune. The pushed
    * comparisons are null-rejecting, and ranges cover exactly the non-null
    * values, so skipping on an excluded range is exact. */
  def mayMatch(pushed: Array[Filter], stats: FileStats): Boolean = {
    val ranges = stats.ranges
    def one(f: Filter): Boolean = f match {
      case EqualTo(a, v) => (ranges.get(a), asLong(v)) match {
        case (Some((lo, hi)), Some(x)) => x >= lo && x <= hi
        case _                         => true
      }
      case GreaterThan(a, v) => (ranges.get(a), asLong(v)) match {
        case (Some((_, hi)), Some(x)) => hi > x
        case _                        => true
      }
      case GreaterThanOrEqual(a, v) => (ranges.get(a), asLong(v)) match {
        case (Some((_, hi)), Some(x)) => hi >= x
        case _                        => true
      }
      case LessThan(a, v) => (ranges.get(a), asLong(v)) match {
        case (Some((lo, _)), Some(x)) => lo < x
        case _                        => true
      }
      case LessThanOrEqual(a, v) => (ranges.get(a), asLong(v)) match {
        case (Some((lo, _)), Some(x)) => lo <= x
        case _                        => true
      }
      case In(a, vs) => ranges.get(a) match {
        case Some((lo, hi)) =>
          vs.exists(v => asLong(v).forall(x => x >= lo && x <= hi))
        case None => true
      }
      case And(l, r) => one(l) && one(r)
      case Or(l, r)  => one(l) || one(r)
      case _         => true
    }
    pushed.forall(one)
  }

  /** Bounded-prefix schema inference: long ⊂ double for numerics, boolean,
    * everything else string; fields in first-seen order; a field that is
    * integral in one line and fractional in another widens to double. */
  def inferFromPrefix(path: String, maxLines: Int = 100): StructType = {
    import com.fasterxml.jackson.databind.JsonNode
    val files = listFiles(path)
    require(files.nonEmpty, s"graft-jsonl: no data files under $path")
    val fs = FileSystem.get(new java.net.URI(files.head._1), new Configuration())
    val in = fs.open(new Path(files.head._1))
    val order = mutable.LinkedHashMap.empty[String, DataType]
    try {
      val m = mapper
      val reader = new CountingLineReader(in, 0L)
      var read = 0
      var line = reader.readLine()
      while (line != null && read < maxLines) {
        if (line.exists(!_.isWhitespace)) {
          val tree = m.readTree(line)
          tree.fields().asScala.foreach { e =>
            val (k, v: JsonNode) = (e.getKey, e.getValue)
            val t: Option[DataType] =
              if (v.isNull) None
              else if (v.isIntegralNumber) Some(LongType)
              else if (v.isNumber) Some(DoubleType)
              else if (v.isBoolean) Some(BooleanType)
              else Some(StringType)
            t.foreach { dt =>
              order.get(k) match {
                case None             => order(k) = dt
                case Some(LongType) if dt == DoubleType => order(k) = DoubleType
                case Some(prev) if prev != dt && !(prev == DoubleType && dt == LongType) =>
                  order(k) = StringType
                case _ => ()
              }
            }
          }
          read += 1
        }
        line = reader.readLine()
      }
    } finally in.close()
    StructType(order.toSeq.map { case (k, t) => StructField(k, t, nullable = true) })
  }
}

private[sources] class JsonlTable(path: String, schemaArg: StructType, splitSize: Long)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft-jsonl `$path`"
  override def schema(): StructType = schemaArg
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.STREAMING_WRITE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new JsonlScanBuilder(path, schemaArg, splitSize)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new JsonlWriteBuilder(path, info.schema())
}

private[sources] class JsonlScanBuilder(path: String, full: StructType, splitSize: Long)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownLimit
    with SupportsPushDownAggregates {

  private var required: StructType = full
  private var pushed: Array[Filter] = Array.empty
  private var limit: Int = -1
  private var aggResult: Option[(Seq[Option[Long]], String)] = None

  /** METADATA-ONLY aggregation: a global (no GROUP BY, no residual
    * filters) COUNT(*) / MIN(longCol) / MAX(longCol) is answered entirely
    * from the `_stats-*` sidecars — zero data bytes read, the same trick
    * parquet footers enable — PROVIDED every data file is stats-covered
    * (a file written by another tool vetoes the rewrite; correctness
    * before cleverness). Complete pushdown: the scan emits the one final
    * row. The spec proves no data is read by corrupting every data file
    * and re-running the aggregate. */
  private def tryMetadataAgg(agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Option[(Seq[Option[Long]], String)] = {
    import org.apache.spark.sql.connector.expressions.aggregate.{CountStar, Max, Min}
    import org.apache.spark.sql.connector.expressions.NamedReference
    if (agg.groupByExpressions.nonEmpty || pushed.nonEmpty || limit >= 0) return None
    val files = JsonlV2.listFiles(path)
    val stats = JsonlV2.loadStats(path)
    val covered = files.map { case (f, _) =>
      stats.get(f.substring(f.lastIndexOf('/') + 1))
    }
    if (files.isEmpty || covered.exists(_.isEmpty)) return None
    val fileStats = covered.flatten
    def longField(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
      e match {
        case nr: NamedReference if nr.fieldNames.length == 1 &&
          full.fields.exists(f => f.name == nr.fieldNames()(0) && f.dataType == LongType) =>
          Some(nr.fieldNames()(0))
        case _ => None
      }
    val vals: Seq[Option[Option[Long]]] = agg.aggregateExpressions.toSeq.map {
      case _: CountStar => Some(Some(fileStats.map(_.rows).sum))
      case m: Min => longField(m.column).map { f =>
        val mins = fileStats.flatMap(_.ranges.get(f)).map(_._1)
        if (mins.isEmpty) None else Some(mins.min)
      }
      case m: Max => longField(m.column).map { f =>
        val maxs = fileStats.flatMap(_.ranges.get(f)).map(_._2)
        if (maxs.isEmpty) None else Some(maxs.max)
      }
      case _ => None
    }
    if (vals.exists(_.isEmpty)) None
    else Some((vals.map(_.get), agg.aggregateExpressions.mkString(", ")))
  }

  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    tryMetadataAgg(agg).isDefined

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    aggResult = tryMetadataAgg(agg)
    aggResult.isDefined
  }

  /** PARTIAL limit push: each partition reader stops after `limit`
    * surviving rows (post-pushed-filters), Spark keeps the global Limit —
    * a `df.limit(k)` over 100 TB touches at most k rows per split instead
    * of every line. */
  override def pushLimit(l: Int): Boolean = { limit = l; false }

  /** A filter is accepted iff this source evaluates it EXACTLY: top-level
    * long/string field, comparison/null-check shape. Accepted filters are
    * removed from the query plan — correctness rides on the reader's
    * evaluation, which DataSourceV2Spec pins against the post-scan plan. */
  private def acceptable(f: Filter): Boolean = {
    def typed(att: String) = full.fields.find(_.name == att).map(_.dataType)
    def cmpOk(att: String, v: Any): Boolean = (typed(att), v) match {
      case (Some(LongType), _: java.lang.Long)    => true
      case (Some(LongType), _: java.lang.Integer) => true
      case (Some(StringType), _: String)          => true
      case _                                      => false
    }
    f match {
      case EqualTo(a, v)            => cmpOk(a, v)
      case GreaterThan(a, v)        => cmpOk(a, v)
      case GreaterThanOrEqual(a, v) => cmpOk(a, v)
      case LessThan(a, v)           => cmpOk(a, v)
      case LessThanOrEqual(a, v)    => cmpOk(a, v)
      case IsNotNull(a)             => typed(a).isDefined
      case IsNull(a)                => typed(a).isDefined
      case StringStartsWith(a, _)   => typed(a).contains(StringType)
      case And(l, r)                => acceptable(l) && acceptable(r)
      case _                        => false
    }
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, residual) = filters.partition(acceptable)
    pushed = ok
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = aggResult match {
    case Some((values, desc)) => new JsonlAggScan(values, desc)
    case None                 => new JsonlScan(path, required, pushed, splitSize, limit)
  }
}

/** The one-row scan a metadata-answered aggregate plans to. */
private[sources] class JsonlAggScan(values: Seq[Option[Long]], desc: String)
    extends Scan with Batch {
  override def readSchema(): StructType =
    StructType(values.indices.map(i => StructField(s"agg_$i", LongType)))
  override def description(): String = s"GraftJsonl MetadataAgg: [$desc]"
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    Array(JsonlAggPartition(values))
  override def createReaderFactory(): PartitionReaderFactory =
    new JsonlAggReaderFactory()
}

private[sources] case class JsonlAggPartition(values: Seq[Option[Long]])
    extends InputPartition

private[sources] class JsonlAggReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val vals = p.asInstanceOf[JsonlAggPartition].values
      private var done = false
      override def next(): Boolean = if (done) false else { done = true; true }
      override def get(): InternalRow = new GenericInternalRow(
        vals.map(_.map(java.lang.Long.valueOf).orNull).toArray[Any])
      override def close(): Unit = ()
    }
}

private[sources] class JsonlScan(
    path: String, required: StructType, pushed: Array[Filter], splitSize: Long,
    limit: Int = -1)
    extends Scan with Batch with SupportsReportStatistics
    with SupportsRuntimeFiltering {

  private lazy val files = JsonlV2.listFiles(path)
  private lazy val stats = JsonlV2.loadStats(path)

  /** Join-driven runtime filters (the DPP shape): Spark materializes the
    * build side, turns its join keys into an IN filter, and hands it here
    * BEFORE partitions are planned — whole files prune against the same
    * sidecar ranges the static pushdown uses. */
  private var runtime: Array[Filter] = Array.empty

  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    stats.values.flatMap(_.ranges.keys).toSet
      // Spark resolves these against the scan OUTPUT — only advertise
      // stats fields that survived column pruning
      .intersect(required.fields.map(_.name).toSet)
      .toArray.map(org.apache.spark.sql.connector.expressions.Expressions.column)

  override def filter(filters: Array[Filter]): Unit = { runtime = filters }

  /** Files whose footer-style sidecar ranges exclude every pushed OR
    * runtime comparison are skipped WHOLE at planning time — the min/max
    * layout game parquet plays, on text. */
  private def keptFiles = files.filter { case (f, _) =>
    val name = f.substring(f.lastIndexOf('/') + 1)
    stats.get(name).forall(JsonlV2.mayMatch(pushed ++ runtime, _))
  }

  override def readSchema(): StructType = required

  override def description(): String =
    s"GraftJsonl PushedFilters: [${pushed.mkString(", ")}], " +
      s"ReadSchema: ${required.catalogString}" +
      (if (limit >= 0) s", PushedLimit: $limit" else "") +
      s", StatsSkippedFiles: ${files.size - keptFiles.size}/${files.size}"

  override def toBatch: Batch = this

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new JsonlMicroBatchStream(path, required, pushed, splitSize)

  override def planInputPartitions(): Array[InputPartition] =
    keptFiles.flatMap { case (f, len) =>
      (0L until len by splitSize).map { start =>
        JsonlPartition(f, start, math.min(splitSize, len - start))
      }
    }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new JsonlReaderFactory(required, pushed, limit)

  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): OptionalLong =
      OptionalLong.of(files.map(_._2).sum)
    override def numRows(): OptionalLong = OptionalLong.empty()
  }
}

private[sources] case class JsonlPartition(file: String, start: Long, length: Long)
    extends InputPartition

/** Micro-batch face of the same scan: the offset is the count of data
  * files in the lexicographically-sorted listing — the append-only
  * log-drop contract (new files sort after consumed ones; producers write
  * `wave-000…`, `wave-001…`). Each trigger consumes exactly the files
  * that appeared since the last committed offset, planned as the SAME
  * byte-range splits the batch scan uses, through the SAME pushdown
  * (pruned schema + accepted filters ride along in the reader factory).
  * StreamingSpec proves stream ≡ batch over a 3-wave staged drop. */
private[sources] case class JsonlOffset(files: Int)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = s"""{"files":$files}"""
}

private[sources] class JsonlMicroBatchStream(
    path: String, required: StructType, pushed: Array[Filter], splitSize: Long)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset

  private def listing = JsonlV2.listFiles(path)

  override def initialOffset(): Offset = JsonlOffset(0)
  override def latestOffset(): Offset = JsonlOffset(listing.size)
  override def deserializeOffset(json: String): Offset =
    JsonlOffset("""\d+""".r.findFirstIn(json).map(_.toInt).getOrElse(0))

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[JsonlOffset].files
    val to = end.asInstanceOf[JsonlOffset].files
    val snapshot = listing
    require(snapshot.size >= to,
      s"graft-jsonl stream: listing shrank below committed offset $to — " +
        "the source requires an append-only drop directory")
    snapshot.slice(from, to).flatMap { case (f, len) =>
      (0L until len by splitSize).map { s0 =>
        JsonlPartition(f, s0, math.min(splitSize, len - s0))
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new JsonlReaderFactory(required, pushed)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[sources] class JsonlReaderFactory(
    required: StructType, pushed: Array[Filter], limit: Int = -1)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new JsonlPartitionReader(p.asInstanceOf[JsonlPartition], required, pushed, limit)
}

/** Reads the lines owned by one byte-range split, parses each with
  * Jackson, evaluates the pushed filters on the parse tree, and
  * materializes ONLY the required fields into the output row. */
private[sources] class JsonlPartitionReader(
    part: JsonlPartition, required: StructType, pushed: Array[Filter],
    limit: Int = -1)
    extends PartitionReader[InternalRow] {

  private var emitted = 0L

  private val mapper = JsonlV2.mapper
  private val in = {
    val fs = FileSystem.get(
      new java.net.URI(part.file), new Configuration())
    val s = fs.open(new Path(part.file))
    s.seek(part.start)
    s
  }
  private val reader = new CountingLineReader(in, part.start)
  // a reader not at the file head discards through the first newline:
  // those bytes are the tail of a line the previous split owns
  if (part.start != 0L) reader.skipToNextLine()
  private val end = part.start + part.length

  private var row: InternalRow = _

  private def fieldValue(tree: com.fasterxml.jackson.databind.JsonNode,
      name: String, dt: DataType): Any = {
    val n = tree.get(name)
    if (n == null || n.isNull) null
    else dt match {
      case LongType    => if (n.isNumber) java.lang.Long.valueOf(n.longValue) else null
      case DoubleType  => if (n.isNumber) java.lang.Double.valueOf(n.doubleValue) else null
      case BooleanType => if (n.isBoolean) java.lang.Boolean.valueOf(n.booleanValue) else null
      case StringType  => UTF8String.fromString(if (n.isTextual) n.textValue else n.toString)
      case other => throw new UnsupportedOperationException(
        s"graft-jsonl: unsupported read type $other for field $name")
    }
  }

  /** Evaluate one accepted filter against the parse tree. `compare` only
    * ever sees (Long, Long) or (String, String) — pushFilters rejected
    * everything else. */
  private def eval(f: Filter, tree: com.fasterxml.jackson.databind.JsonNode): Boolean = {
    def raw(att: String): Any = {
      val n = tree.get(att)
      if (n == null || n.isNull) null
      else if (n.isNumber) java.lang.Long.valueOf(n.longValue)
      else if (n.isTextual) n.textValue
      else n.toString
    }
    def cmp(att: String, v: Any)(sign: Int => Boolean): Boolean = raw(att) match {
      case null         => false
      case l: java.lang.Long =>
        val r = v match {
          case i: java.lang.Integer => i.longValue
          case l2: java.lang.Long   => l2.longValue
          case _                    => return false
        }
        sign(java.lang.Long.compare(l, r))
      case s: String => v match {
        case vs: String => sign(s.compareTo(vs))
        case _          => false
      }
      case _ => false
    }
    f match {
      case EqualTo(a, v)            => cmp(a, v)(_ == 0)
      case GreaterThan(a, v)        => cmp(a, v)(_ > 0)
      case GreaterThanOrEqual(a, v) => cmp(a, v)(_ >= 0)
      case LessThan(a, v)           => cmp(a, v)(_ < 0)
      case LessThanOrEqual(a, v)    => cmp(a, v)(_ <= 0)
      case IsNotNull(a)             => raw(a) != null
      case IsNull(a)                => raw(a) == null
      case StringStartsWith(a, p) => raw(a) match {
        case s: String => s.startsWith(p)
        case _         => false
      }
      case And(l, r) => eval(l, tree) && eval(r, tree)
      case other => throw new IllegalStateException(
        s"graft-jsonl: unpushable filter reached the reader: $other")
    }
  }

  override def next(): Boolean = {
    if (limit >= 0 && emitted >= limit) return false
    // a line is ours iff it STARTS at offset <= end — reading one line
    // past the nominal boundary pairs with the next split's skip
    while (reader.position <= end) {
      val line = reader.readLine()
      if (line == null) return false
      if (line.exists(!_.isWhitespace)) {
        val tree = mapper.readTree(line)
        if (pushed.forall(eval(_, tree))) {
          row =
            if (required.isEmpty) InternalRow.empty
            else new GenericInternalRow(
              required.fields.map(f => fieldValue(tree, f.name, f.dataType)))
          emitted += 1
          return true
        }
      }
    }
    false
  }

  override def get(): InternalRow = row
  override def close(): Unit = in.close()
}

/** Write face: a full V2 batch-write commit protocol. Each task writer
  * streams its rows as JSON lines into an UNDERSCORE-PREFIXED temp file in
  * the target directory — readers skip `_` names, so uncommitted and
  * aborted data is structurally invisible. Task commit returns the temp
  * path; the DRIVER's [[BatchWrite.commit]] renames every winning temp to
  * `part-<partition>-<writeId>.jsonl` (and first clears old data when the
  * builder was truncated, i.e. SaveMode.Overwrite). Speculative or retried
  * attempts each write their own temp and only the attempt the commit
  * coordinator admits is renamed; [[BatchWrite.abort]] and each writer's
  * own abort delete the rest. The writeId in the final names makes APPEND
  * collision-free across writes. O(tasks) driver renames — the same
  * commit shape as Hadoop FileOutputCommitter v2, with the rename fan-out
  * on files not directories. */
private[sources] class JsonlWriteBuilder(path: String, schema: StructType)
    extends WriteBuilder with SupportsTruncate {
  private var truncateFirst = false
  override def truncate(): WriteBuilder = { truncateFirst = true; this }
  override def build(): Write = new Write {
    override def description(): String =
      s"GraftJsonl write `$path` truncate=$truncateFirst"
    override def toBatch: BatchWrite =
      new JsonlBatchWrite(path, schema, truncateFirst)
    override def toStreaming
        : org.apache.spark.sql.connector.write.streaming.StreamingWrite =
      new JsonlStreamingWrite(path, schema)
  }
}

private[graft] case class JsonlCommitMessage(
    tmpPath: String, partitionId: Int, rows: Long,
    mins: Map[String, Long] = Map.empty,
    maxs: Map[String, Long] = Map.empty) extends WriterCommitMessage

private[sources] class JsonlBatchWrite(
    path: String, schema: StructType, truncateFirst: Boolean) extends BatchWrite {

  private val writeId = java.util.UUID.randomUUID().toString

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new JsonlWriterFactory(path, schema, writeId)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val root = new Path(path)
    val fs = FileSystem.get(root.toUri, new Configuration())
    if (truncateFirst && fs.exists(root)) {
      fs.listStatus(root).foreach { st =>
        val n = st.getPath.getName
        // old data files AND old stats sidecars go; in-flight temps stay
        if (st.isFile && ((!n.startsWith("_") && !n.startsWith(".")) ||
          n.startsWith("_stats-"))) fs.delete(st.getPath, false)
      }
    }
    JsonlCommit.publish(fs, root, writeId, messages)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    JsonlCommit.dropTemps(
      FileSystem.get(new Path(path).toUri, new Configuration()), messages)
}

/** The publish half every commit shares: rename winning temps to
  * `part-<pid>-<tag>.jsonl` and write the `_stats-<tag>.json` sidecar
  * (row counts + per-long-field min/max) for the renamed files. */
private[sources] object JsonlCommit {
  def publish(fs: FileSystem, root: Path, tag: String,
      messages: Array[WriterCommitMessage]): Unit = {
    val stats = mutable.LinkedHashMap.empty[String, (Long, Map[String, Long], Map[String, Long])]
    messages.foreach {
      case JsonlCommitMessage(tmp, pid, rows, mins, maxs) if rows > 0 =>
        val target = new Path(root, f"part-$pid%05d-$tag.jsonl")
        require(fs.rename(new Path(tmp), target),
          s"graft-jsonl: commit rename $tmp -> $target failed")
        stats(target.getName) = (rows, mins, maxs)
      case JsonlCommitMessage(tmp, _, _, _, _) =>
        fs.delete(new Path(tmp), false) // empty writer: no part file
      case other => throw new IllegalStateException(s"foreign commit message $other")
    }
    // parquet-footer-style sidecar: `_`-prefixed → invisible to the data
    // listing. Row counts + per-long-field min/max let the scan SKIP whole
    // files against pushed comparisons and answer global COUNT/MIN/MAX
    // queries from metadata alone (see JsonlScan / JsonlAggScan)
    if (stats.nonEmpty) {
      val out: java.io.OutputStream =
        fs.create(new Path(root, s"_stats-$tag.json"), true)
      val gen = new com.fasterxml.jackson.core.JsonFactory().createGenerator(out)
      gen.writeStartObject()
      stats.foreach { case (file, (rows, mins, maxs)) =>
        gen.writeObjectFieldStart(file)
        gen.writeNumberField("_rows", rows)
        mins.keys.foreach { f =>
          gen.writeArrayFieldStart(f)
          gen.writeNumber(mins(f)); gen.writeNumber(maxs(f))
          gen.writeEndArray()
        }
        gen.writeEndObject()
      }
      gen.writeEndObject()
      gen.close(); out.close()
    }
  }

  def dropTemps(fs: FileSystem, messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case JsonlCommitMessage(tmp, _, _, _, _) if tmp != null =>
        try fs.delete(new Path(tmp), false) catch { case _: java.io.IOException => () }
      case _ => ()
    }
}

/** Streaming sink face: each epoch publishes through the SAME rename
  * protocol with an `e<epochId>` tag, then drops an `_epoch-<id>` marker.
  * Structured Streaming replays an epoch after a failure/restart — the
  * marker makes the replayed commit a no-op (temps dropped, nothing
  * re-published), so the sink is exactly-once per epoch however many
  * times the batch retries. One streaming query owns a directory (the
  * marker namespace is per-directory by design). */
private[graft] class JsonlStreamingWrite(path: String, schema: StructType)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {

  private val writeId = java.util.UUID.randomUUID().toString

  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory =
    new JsonlStreamingWriterFactory(path, schema, writeId)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val root = new Path(path)
    val fs = FileSystem.get(root.toUri, new Configuration())
    val marker = new Path(root, s"_epoch-$epochId.json")
    if (fs.exists(marker)) {
      JsonlCommit.dropTemps(fs, messages) // replayed epoch: already published
    } else {
      JsonlCommit.publish(fs, root, s"e$epochId-$writeId", messages)
      fs.create(marker, true).close()
    }
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val fs = FileSystem.get(new Path(path).toUri, new Configuration())
    JsonlCommit.dropTemps(fs, messages)
  }
}

private[sources] class JsonlStreamingWriterFactory(
    path: String, schema: StructType, writeId: String)
    extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long)
      : DataWriter[InternalRow] =
    new JsonlDataWriter(path, schema, s"e$epochId-$writeId", partitionId, taskId)
}

private[sources] class JsonlWriterFactory(
    path: String, schema: StructType, writeId: String) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new JsonlDataWriter(path, schema, writeId, partitionId, taskId)
}

private[sources] class JsonlDataWriter(
    path: String, schema: StructType, writeId: String, partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {

  private val tmp = new Path(path, s"_tmp-$writeId-$partitionId-$taskId.jsonl")
  private val fs = FileSystem.get(tmp.toUri, new Configuration())
  private var out: java.io.OutputStream = _
  private var gen: com.fasterxml.jackson.core.JsonGenerator = _
  private var rows = 0L
  // footer-style stats: running min/max per LONG field (nulls ignored)
  private val longFields = schema.fields.zipWithIndex
    .collect { case (f, i) if f.dataType == LongType => (f.name, i) }
  private val mins = mutable.HashMap.empty[String, Long]
  private val maxs = mutable.HashMap.empty[String, Long]

  override def write(row: InternalRow): Unit = {
    if (gen == null) {
      out = fs.create(tmp, true)
      gen = new com.fasterxml.jackson.core.JsonFactory().createGenerator(out)
      gen.setRootValueSeparator(new com.fasterxml.jackson.core.io.SerializedString("\n"))
    }
    gen.writeStartObject()
    var i = 0
    while (i < schema.length) {
      val f = schema.fields(i)
      if (row.isNullAt(i)) gen.writeNullField(f.name)
      else f.dataType match {
        case LongType    => gen.writeNumberField(f.name, row.getLong(i))
        case IntegerType => gen.writeNumberField(f.name, row.getInt(i))
        case DoubleType  => gen.writeNumberField(f.name, row.getDouble(i))
        case BooleanType => gen.writeBooleanField(f.name, row.getBoolean(i))
        case StringType  => gen.writeStringField(f.name, row.getUTF8String(i).toString)
        case other => throw new UnsupportedOperationException(
          s"graft-jsonl: unsupported write type $other for field ${f.name}")
      }
      i += 1
    }
    gen.writeEndObject()
    longFields.foreach { case (name, i) =>
      if (!row.isNullAt(i)) {
        val v = row.getLong(i)
        mins.updateWith(name)(o => Some(o.fold(v)(math.min(_, v))))
        maxs.updateWith(name)(o => Some(o.fold(v)(math.max(_, v))))
      }
    }
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    close()
    JsonlCommitMessage(tmp.toString, partitionId, rows, mins.toMap, maxs.toMap)
  }

  override def abort(): Unit = {
    close()
    try fs.delete(tmp, false) catch { case _: java.io.IOException => () }
  }

  override def close(): Unit = {
    if (gen != null) { gen.close(); gen = null }
    if (out != null) { out.close(); out = null }
  }
}

/** Byte-exact line reader over an InputStream: counts consumed bytes so
  * split ownership is decided in BYTE offsets (UTF-8 multibyte sequences
  * never contain 0x0A, so scanning for '\n' at the byte level is exact).
  * Handles \n and \r\n; a trailing unterminated line is returned. */
private[sources] class CountingLineReader(in: java.io.InputStream, startPos: Long) {
  private val buffered = new java.io.BufferedInputStream(in, 1 << 16)
  var position: Long = startPos

  def skipToNextLine(): Unit = {
    var b = buffered.read()
    while (b != -1 && b != '\n') { position += 1; b = buffered.read() }
    if (b != -1) position += 1
  }

  /** Next line as UTF-8 (terminator excluded), or null at EOF. */
  def readLine(): String = {
    val out = new ByteArrayOutputStream(256)
    var b = buffered.read()
    if (b == -1) return null
    while (b != -1 && b != '\n') {
      out.write(b); position += 1; b = buffered.read()
    }
    if (b != -1) position += 1
    val bytes = out.toByteArray
    val len = if (bytes.nonEmpty && bytes(bytes.length - 1) == '\r') bytes.length - 1
      else bytes.length
    new String(bytes, 0, len, java.nio.charset.StandardCharsets.UTF_8)
  }
}
