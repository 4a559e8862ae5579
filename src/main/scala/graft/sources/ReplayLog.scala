package graft.sources

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `graft-replay` — a Kafka-shaped DataSource V2 micro-batch source that
  * replays a line-delimited envelope log with REAL offset semantics
  * (reference analog: the mock stream processor,
  * stream/streamtest/streamtest.go:64-82, which replays fixture messages
  * through the same handler contract as the Kafka consumer).
  *
  * No Kafka broker exists in this environment; this source closes that
  * gap with the same *shape* instead of a same-process shortcut:
  *
  *  - the log file is the topic: one JSON envelope per line, line number
  *    = partition offset (a fixture-array file converts via
  *    [[ReplayLog.toLog]]);
  *  - the emitted schema is raw `(offset BIGINT, value STRING)` — decode
  *    happens DOWNSTREAM with `from_json(envelopeSchema)`, exactly where
  *    it happens on the Kafka path (B3), never inside the source;
  *  - `maxOffsetsPerTrigger` bounds each micro-batch through Spark's
  *    admission-control API ([[SupportsAdmissionControl]]) — the same
  *    backpressure surface the Kafka source uses (E5), not a
  *    reimplementation;
  *  - progress is tracked by the engine's checkpoint via [[ReplayOffset]],
  *    so a restarted query resumes at the committed offset and re-reads
  *    nothing (at-least-once handoff to the idempotent store, E1);
  *  - a batch (`spark.read`) face reads the whole log once, for replay
  *    jobs and tests.
  *
  * Scale notes: each input partition re-opens the file and skips to its
  * range — O(file) per partition open, acceptable for the replay-log role
  * (fixtures, incident replays, backfill rehearsals), not a data-plane
  * parquet path — those go through the columnar envelope twins
  * ([[Fixtures.loadParquet]]). Paths are local-FS (the fixture contract);
  * an object-store log would swap the opener for the Hadoop FS API, the
  * offset/admission logic unchanged.
  */
object ReplayLog {

  val ShortName = "graft-replay"

  val schema: StructType = StructType(Seq(
    StructField("offset", LongType, nullable = false),
    StructField("value", StringType, nullable = false)))

  /** Convert a multi-line JSON-array fixture file (FIXTURES.md §1) into a
    * line-delimited replay log: one compact JSON envelope per line, array
    * order = offset order.
    */
  def toLog(spark: org.apache.spark.sql.SparkSession, fixturePath: String,
      logPath: String): Unit = {
    import org.apache.spark.sql.functions._
    val lines = Fixtures.loadJson(spark, fixturePath)
      .orderBy(col("offset"))
      .select(to_json(struct(col("key"), col("value"), col("metadata"))))
      .collect().map(_.getString(0))
    java.nio.file.Files.write(java.nio.file.Paths.get(logPath),
      String.join("\n", lines: _*).getBytes("UTF-8"))
  }

  /** Write an in-memory envelope frame (`key`, `value`, `metadata`) as a
    * replay log; row order (as given) becomes offset order. Driver-side
    * by design: callers pass BOUNDED frames (test fixtures, the
    * q_stream_fold_state key grid) — a production log is written by the
    * upstream bus, not this helper.
    */
  def frameToLog(envelopes: org.apache.spark.sql.DataFrame, logPath: String): Unit = {
    import org.apache.spark.sql.functions._
    val lines = envelopes
      .select(to_json(struct(col("key"), col("value"), col("metadata"))))
      .collect().map(_.getString(0))
    java.nio.file.Files.write(java.nio.file.Paths.get(logPath),
      String.join("\n", lines: _*).getBytes("UTF-8")): Unit
  }

  private[sources] def countLines(path: String): Long = {
    val s = java.nio.file.Files.lines(java.nio.file.Paths.get(path))
    try s.count() finally s.close()
  }
}

/** Registered via META-INF/services so `format("graft-replay")` resolves. */
class ReplayLogProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = ReplayLog.ShortName
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ReplayLog.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ReplayLogTable(new CaseInsensitiveStringMap(properties))
}

class ReplayLogTable(options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  private val path = Option(options.get("path")).getOrElse(
    throw new IllegalArgumentException("graft-replay requires option 'path'"))

  override def name(): String = s"${ReplayLog.ShortName}:$path"
  override def schema(): StructType = ReplayLog.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new ReplayLogScan(path, opts)
    }
}

class ReplayLogScan(path: String, options: CaseInsensitiveStringMap) extends Scan
  with org.apache.spark.sql.connector.read.SupportsReportStatistics {
  private val minPartitions = options.getInt("minPartitions", 1)
  private val maxPerTrigger: Option[Long] =
    Option(options.get("maxOffsetsPerTrigger")).map(_.toLong)

  override def readSchema(): StructType = ReplayLog.schema
  override def description(): String = s"ReplayLogScan($path)"

  /** Real file size — without it a DSv2 relation costs at the default
    * estimate and a small replay log joined against a corpus can never
    * auto-broadcast.
    */
  override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics = {
    val len = try java.nio.file.Files.size(java.nio.file.Paths.get(path))
    catch { case _: java.io.IOException => 0L }
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong = java.util.OptionalLong.of(len)
      override def numRows(): java.util.OptionalLong = java.util.OptionalLong.empty()
    }
  }

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      ReplayLogScan.slices(path, 0L, ReplayLog.countLines(path), minPartitions)
    override def createReaderFactory(): PartitionReaderFactory =
      new ReplayLogReaderFactory
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new ReplayLogMicroBatchStream(path, minPartitions, maxPerTrigger)
}

object ReplayLogScan {
  /** Split [from, until) into at most n contiguous slices. */
  def slices(path: String, from: Long, until: Long, n: Int): Array[InputPartition] = {
    val total = math.max(until - from, 0L)
    if (total == 0) return Array.empty
    val k = math.min(n.toLong, total).toInt
    val step = (total + k - 1) / k
    (0 until k).map { i =>
      val a = from + i * step
      ReplayLogPartition(path, a, math.min(a + step, until)): InputPartition
    }.toArray
  }
}

/** Offset = number of log lines fully processed (exclusive upper bound). */
case class ReplayOffset(lines: Long) extends Offset {
  override def json(): String = lines.toString
}

class ReplayLogMicroBatchStream(path: String, minPartitions: Int,
    maxPerTrigger: Option[Long])
  extends MicroBatchStream with SupportsAdmissionControl {

  override def initialOffset(): Offset = ReplayOffset(0L)

  override def deserializeOffset(json: String): Offset =
    ReplayOffset(json.trim.toLong)

  override def getDefaultReadLimit: ReadLimit =
    maxPerTrigger.map(n => ReadLimit.maxRows(n)).getOrElse(ReadLimit.allAvailable())

  /** Admission control: advance at most `limit` rows past `start` — the
    * engine calls this instead of the unlimited [[latestOffset()]] when
    * the source declares a read limit.
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val avail = ReplayLog.countLines(path)
    val from = start.asInstanceOf[ReplayOffset].lines
    // Trigger.AvailableNow wraps the configured maxRows in a
    // CompositeReadLimit — unwrap it (as the Kafka source does) so the
    // rate bound survives composition instead of falling through to
    // all-available.
    def maxRowsOf(l: ReadLimit): Option[Long] = l match {
      case rl: org.apache.spark.sql.connector.read.streaming.ReadMaxRows =>
        Some(rl.maxRows())
      case c: org.apache.spark.sql.connector.read.streaming.CompositeReadLimit =>
        c.getReadLimits.flatMap(maxRowsOf(_)).minOption
      case _ => None
    }
    maxRowsOf(limit) match {
      case Some(n) => ReplayOffset(math.min(avail, from + n))
      case None => ReplayOffset(avail)
    }
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead of this method")

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    ReplayLogScan.slices(path, start.asInstanceOf[ReplayOffset].lines,
      end.asInstanceOf[ReplayOffset].lines, minPartitions)

  override def createReaderFactory(): PartitionReaderFactory =
    new ReplayLogReaderFactory

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

case class ReplayLogPartition(path: String, from: Long, until: Long)
  extends InputPartition

class ReplayLogReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ReplayLogPartition]
    new PartitionReader[InternalRow] {
      private val reader = new java.io.BufferedReader(new java.io.InputStreamReader(
        new java.io.FileInputStream(p.path), "UTF-8"))
      private var pos = 0L
      // skip to the slice start; the slice bounds came from the same file,
      // but the file may have GROWN since planning — never shrunk (logs are
      // append-only by contract), so skipping cannot run off the end
      while (pos < p.from && reader.readLine() != null) pos += 1
      private var current: String = _

      override def next(): Boolean = {
        if (pos >= p.until) return false
        current = reader.readLine()
        if (current == null) return false
        pos += 1
        true
      }

      override def get(): InternalRow =
        InternalRow(pos - 1, UTF8String.fromString(current))

      override def close(): Unit = reader.close()
    }
  }
}
