package graft.ext

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.QueryDef

/** Apache Iceberg metadata walk — the OTHER open table format (spec:
  * iceberg.apache.org/spec). Where Delta (H89) rides JSON commits,
  * Iceberg rides a METADATA TREE: `version-hint.text` →
  * `vN.metadata.json` (format-version, snapshots, current-snapshot-id)
  * → a per-snapshot MANIFEST LIST (Avro OCF, one record per manifest
  * with added/existing/deleted counts) → MANIFEST files (Avro OCF, one
  * entry per data file with status EXISTING=0 / ADDED=1 / DELETED=2) →
  * parquet data files. A scan of snapshot S reads S's manifest list and
  * keeps every entry whose status is not DELETED.
  *
  * The composition is the point: manifests are written by the REAL
  * Avro library (DataFileWriter, deflate) and read back by OUR
  * hand-rolled OCF walk (H78), the metadata JSON by OUR strict JSON
  * parser (H88), the data files by Spark over OUR parquet writer's
  * files (H81) — every layer of the tree crosses an independent
  * implementation. The reader is STRICT: format-version gated, the
  * embedded Avro writer schema's field order VERIFIED against the
  * spec shape before decoding, the manifest list's declared
  * added/existing/deleted counts VERIFIED against the entries actually
  * decoded, and a missing manifest/metadata file fails loudly.
  *
  * Scale shape: like Delta, planning touches only the KB-scale
  * metadata tree (manifest lists exist precisely so planners can prune
  * manifests without opening them); the data scan reads exactly the
  * live files.
  */
object Iceberg {

  private val DocsPerFile = 50L

  final case class ManifestFile(path: String, length: Long, specId: Int,
      content: Int, sequenceNumber: Long, added: Int, existing: Int, deleted: Int)
  final case class ManifestEntry(status: Int, snapshotId: Long,
      filePath: String, fileFormat: String, recordCount: Long, fileSize: Long)

  private val ManifestListSchema =
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string"},
      |{"name":"manifest_length","type":"long"},
      |{"name":"partition_spec_id","type":"int"},
      |{"name":"content","type":"int"},
      |{"name":"sequence_number","type":"long"},
      |{"name":"added_files_count","type":"int"},
      |{"name":"existing_files_count","type":"int"},
      |{"name":"deleted_files_count","type":"int"}]}""".stripMargin
  private val ManifestSchema =
    """{"type":"record","name":"manifest_entry","fields":[
      |{"name":"status","type":"int"},
      |{"name":"snapshot_id","type":"long"},
      |{"name":"data_file","type":{"type":"record","name":"data_file","fields":[
      |{"name":"file_path","type":"string"},
      |{"name":"file_format","type":"string"},
      |{"name":"record_count","type":"long"},
      |{"name":"file_size_in_bytes","type":"long"}]}}]}""".stripMargin

  // ---- write (REAL Avro library — the independent producer) -------------------

  private def writeAvro(schemaJson: String, rows: Seq[Map[String, Any]]): Array[Byte] = {
    import org.apache.avro.{Schema => ASchema}
    import org.apache.avro.file.{CodecFactory, DataFileWriter}
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val schema = new ASchema.Parser().parse(schemaJson)
    val out = new java.io.ByteArrayOutputStream()
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.setCodec(CodecFactory.deflateCodec(6))
    w.create(schema, out)
    def rec(s: ASchema, m: Map[String, Any]): GenericRecord = {
      val r = new GenericData.Record(s)
      s.getFields.forEach { f =>
        m(f.name()) match {
          case sub: Map[String @unchecked, Any @unchecked] => r.put(f.name(), rec(f.schema(), sub))
          case v => r.put(f.name(), v)
        }
      }
      r
    }
    rows.foreach(m => w.append(rec(schema, m)))
    w.close()
    out.toByteArray
  }

  // ---- read (OUR hand-rolled walks) -------------------------------------------

  /** Field-order gate: the embedded writer schema must carry exactly the
    * expected top-level field names in order.
    */
  private def checkSchema(docId: Long, schemaJson: String, expected: Seq[String]): Unit = {
    val names = Safetensors.parseJson(docId, schemaJson, 0L) match {
      case o: Safetensors.JObj => o.get("fields") match {
        case Some(Safetensors.JArr(fs)) => fs.map {
          case f: Safetensors.JObj => f.get("name") match {
            case Some(Safetensors.JStr(n)) => n
            case _ => throw new IllegalArgumentException(s"doc $docId: avro schema field with no name")
          }
          case _ => throw new IllegalArgumentException(s"doc $docId: avro schema fields entry is not an object")
        }
        case _ => throw new IllegalArgumentException(s"doc $docId: avro schema has no fields array")
      }
      case _ => throw new IllegalArgumentException(s"doc $docId: avro schema is not an object")
    }
    require(names == expected.toVector,
      s"doc $docId: manifest schema fields $names do not match the spec shape $expected")
  }

  def readManifestList(docId: Long, b: Array[Byte]): Vector[ManifestFile] =
    AvroCodec.parseOcfBy(docId, b) { schema =>
      checkSchema(docId, schema, Seq("manifest_path", "manifest_length",
        "partition_spec_id", "content", "sequence_number",
        "added_files_count", "existing_files_count", "deleted_files_count"))
      r => ManifestFile(r.readString(), r.readVarLong(), r.readVarLong().toInt,
        r.readVarLong().toInt, r.readVarLong(), r.readVarLong().toInt,
        r.readVarLong().toInt, r.readVarLong().toInt)
    }.docs

  def readManifest(docId: Long, b: Array[Byte]): Vector[ManifestEntry] =
    AvroCodec.parseOcfBy(docId, b) { schema =>
      checkSchema(docId, schema, Seq("status", "snapshot_id", "data_file"))
      r => ManifestEntry(r.readVarLong().toInt, r.readVarLong(),
        r.readString(), r.readString(), r.readVarLong(), r.readVarLong())
    }.docs

  // ---- build: a two-snapshot table --------------------------------------------

  /** Build the table at `dir`. fid = doc_id div DocsPerFile.
    *  - snapshot 1 (seq 1): manifest m1 ADDs every even fid
    *  - snapshot 2 (seq 2): m1 rewritten (fid % 4 == 2 → DELETED, rest
    *    EXISTING) + manifest m2 ADDing every odd fid
    * Live at snapshot 2 = every fid with fid % 4 != 2.
    */
  def buildTable(spark: SparkSession, docs: DataFrame, dir: String): Unit = {
    import spark.implicits._
    Files.createDirectories(Paths.get(dir, "metadata"))
    Files.createDirectories(Paths.get(dir, "data"))
    val files = docs
      .select(col("doc_id"), col("text"))
      .transform(DecodeStage.spread(expr(s"doc_id div $DocsPerFile")))
      .groupBy(expr(s"doc_id div $DocsPerFile").as("fid"))
      .agg(sort_array(collect_list(struct(col("doc_id").as("_1"),
        col("text").as("_2")))).as("rows"))
      .as[(Long, Seq[(Long, String)])]
      .map { case (fid, rows) =>
        val bytes = ParquetLite.write(rows.map { case (id, t) => (id, t.getBytes(UTF_8)) })
        val path = f"data/part-$fid%05d.parquet"
        Files.write(Paths.get(dir, path), bytes)
        (fid, path, bytes.length.toLong, rows.size.toLong)
      }
      .collect().sortBy(_._1)

    def entry(status: Int, snapshotId: Long, f: (Long, String, Long, Long)): Map[String, Any] =
      Map("status" -> Integer.valueOf(status), "snapshot_id" -> java.lang.Long.valueOf(snapshotId),
        "data_file" -> Map(
          "file_path" -> f._2, "file_format" -> "PARQUET",
          "record_count" -> java.lang.Long.valueOf(f._4),
          "file_size_in_bytes" -> java.lang.Long.valueOf(f._3)))

    val evens = files.filter(_._1 % 2 == 0)
    val odds = files.filter(_._1 % 2 == 1)
    val dead = evens.filter(_._1 % 4 == 2)

    val m1 = writeAvro(ManifestSchema, evens.map(entry(1, 1L, _)).toSeq)
    Files.write(Paths.get(dir, "metadata/m1-snap1.avro"), m1)
    val m1b = writeAvro(ManifestSchema, evens.map { f =>
      if (f._1 % 4 == 2) entry(2, 2L, f) else entry(0, 1L, f)
    }.toSeq)
    Files.write(Paths.get(dir, "metadata/m1-snap2.avro"), m1b)
    val m2 = writeAvro(ManifestSchema, odds.map(entry(1, 2L, _)).toSeq)
    Files.write(Paths.get(dir, "metadata/m2-snap2.avro"), m2)

    def mf(path: String, bytes: Array[Byte], seq: Long, added: Int, existing: Int,
        deleted: Int): Map[String, Any] =
      Map("manifest_path" -> path, "manifest_length" -> java.lang.Long.valueOf(bytes.length.toLong),
        "partition_spec_id" -> Integer.valueOf(0), "content" -> Integer.valueOf(0),
        "sequence_number" -> java.lang.Long.valueOf(seq),
        "added_files_count" -> Integer.valueOf(added),
        "existing_files_count" -> Integer.valueOf(existing),
        "deleted_files_count" -> Integer.valueOf(deleted))

    val snap1 = writeAvro(ManifestListSchema,
      Seq(mf("metadata/m1-snap1.avro", m1, 1L, evens.length, 0, 0)))
    Files.write(Paths.get(dir, "metadata/snap-1.avro"), snap1)
    val snap2 = writeAvro(ManifestListSchema, Seq(
      mf("metadata/m1-snap2.avro", m1b, 2L, 0, evens.length - dead.length, dead.length),
      mf("metadata/m2-snap2.avro", m2, 2L, odds.length, 0, 0)))
    Files.write(Paths.get(dir, "metadata/snap-2.avro"), snap2)

    val metadataJson =
      s"""{"format-version":2,"table-uuid":"graft-iceberg","location":"$dir",
         |"current-snapshot-id":2,"snapshots":[
         |{"snapshot-id":1,"sequence-number":1,"manifest-list":"metadata/snap-1.avro"},
         |{"snapshot-id":2,"sequence-number":2,"manifest-list":"metadata/snap-2.avro"}]}""".stripMargin
    Files.write(Paths.get(dir, "metadata/v2.metadata.json"), metadataJson.getBytes(UTF_8))
    Files.write(Paths.get(dir, "metadata/version-hint.text"), "2".getBytes(UTF_8))
  }

  // ---- the operator: snapshot resolution --------------------------------------

  /** Resolve a snapshot (current one when `snapshotId` is None): the
    * version hint, the metadata JSON, the manifest list, every manifest
    * — counts verified — and return (snapshotId, manifest count, live
    * entries).
    */
  def planScan(dir: String, snapshotId: Option[Long] = None): (Long, Int, Vector[ManifestEntry]) = {
    val hintPath = Paths.get(dir, "metadata/version-hint.text")
    require(Files.exists(hintPath), s"iceberg table at $dir has no version-hint.text")
    val hint = Files.readString(hintPath, UTF_8).trim
    require(hint.nonEmpty && hint.forall(_.isDigit), s"version hint '$hint' is not a version number")
    val metaPath = Paths.get(dir, s"metadata/v$hint.metadata.json")
    require(Files.exists(metaPath), s"metadata file v$hint.metadata.json named by the hint is missing")
    val meta = Safetensors.parseJson(0L, Files.readString(metaPath, UTF_8), 0L) match {
      case o: Safetensors.JObj => o
      case _ => throw new IllegalArgumentException(s"metadata v$hint is not a JSON object")
    }
    meta.get("format-version") match {
      case Some(Safetensors.JNum(v)) if v == 1L || v == 2L =>
      case Some(Safetensors.JNum(v)) => throw new IllegalArgumentException(
        s"iceberg format-version $v unsupported (this reader implements 1-2)")
      case _ => throw new IllegalArgumentException("metadata carries no integer format-version")
    }
    val wanted = snapshotId.getOrElse(meta.get("current-snapshot-id") match {
      case Some(Safetensors.JNum(v)) => v
      case _ => throw new IllegalArgumentException("metadata carries no current-snapshot-id")
    })
    val manifestList = meta.get("snapshots") match {
      case Some(Safetensors.JArr(snaps)) =>
        snaps.collectFirst {
          case s: Safetensors.JObj if s.get("snapshot-id").contains(Safetensors.JNum(wanted)) =>
            s.get("manifest-list") match {
              case Some(Safetensors.JStr(p)) => p
              case _ => throw new IllegalArgumentException(s"snapshot $wanted has no manifest-list")
            }
        }.getOrElse(throw new IllegalArgumentException(
          s"snapshot $wanted not present in metadata v$hint"))
      case _ => throw new IllegalArgumentException("metadata carries no snapshots array")
    }
    val mlPath = Paths.get(dir, manifestList)
    require(Files.exists(mlPath), s"manifest list $manifestList is missing")
    val manifests = readManifestList(wanted, Files.readAllBytes(mlPath))
    val live = Vector.newBuilder[ManifestEntry]
    manifests.foreach { m =>
      val mPath = Paths.get(dir, m.path)
      require(Files.exists(mPath), s"manifest ${m.path} named by the manifest list is missing")
      val bytes = Files.readAllBytes(mPath)
      require(bytes.length.toLong == m.length,
        s"manifest ${m.path} is ${bytes.length} bytes, manifest list declares ${m.length}")
      val entries = readManifest(wanted, bytes)
      val counts = (entries.count(_.status == 1), entries.count(_.status == 0),
        entries.count(_.status == 2))
      require(counts == ((m.added, m.existing, m.deleted)),
        s"manifest ${m.path}: decoded (added,existing,deleted)=$counts, " +
          s"manifest list declares (${m.added},${m.existing},${m.deleted})")
      live ++= entries.filter(_.status != 2)
    }
    (wanted, manifests.size, live.result())
  }

  // ---- the oracle-gated query --------------------------------------------------

  /** Build the table, plan the current snapshot, scan exactly the live
    * files — one row per live document, the whole two-snapshot history
    * closed-form arithmetic for the oracle.
    */
  val q_iceberg_snapshot: QueryDef = QueryDef(
    s"""SELECT doc_id,
       |  md5(text) AS text_md5,
       |  'data/part-' || lpad(CAST(doc_id // $DocsPerFile AS VARCHAR), 5, '0') || '.parquet' AS path,
       |  CAST(doc_id // $DocsPerFile AS BIGINT) AS file_id,
       |  CAST(2 AS BIGINT) AS snapshot_id,
       |  CAST(2 AS BIGINT) AS n_manifests,
       |  CAST(50 AS BIGINT) AS record_count
       |FROM documents
       |WHERE (doc_id // $DocsPerFile) % 4 <> 2
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    val out = s"${sys.props.getOrElse("java.io.tmpdir", "/tmp")}/graft_iceberg_${java.util.UUID.randomUUID()}"
    buildTable(s, Tables.documents(s, dir), out)
    val (snapId, nManifests, live) = planScan(out)
    val paths = live.map(_.filePath).sorted
    if (paths.isEmpty)
      // an empty table snapshots to an empty frame, not a scan of no files
      Seq.empty[(Long, String, String, Long, Long, Long, Long)]
        .toDF("doc_id", "text_md5", "path", "file_id", "snapshot_id",
          "n_manifests", "record_count")
    else {
      // manifest-declared record counts, joined broadcast (KB-scale frame)
      val counts = live.map(e => (e.filePath, e.recordCount)).toDF("path", "record_count")
      // schema pinned (iceberg metadata declares it; the files are ours):
      // no footer-inference pass over the live file set (guide §6)
      s.read.schema("doc_id BIGINT, text STRING")
        .parquet(paths.map(p => s"$out/$p"): _*)
        .withColumn("path", regexp_extract(input_file_name(), "data/part-\\d{5}\\.parquet", 0))
        .join(broadcast(counts), "path")
        .select(col("doc_id"),
          md5(col("text")).as("text_md5"),
          col("path"),
          expr(s"doc_id div $DocsPerFile").as("file_id"),
          lit(snapId).as("snapshot_id"),
          lit(nManifests.toLong).as("n_manifests"),
          col("record_count"))
        .orderBy(col("doc_id"))
    }
  }

  val all: Map[String, QueryDef] = Map("q_iceberg_snapshot" -> q_iceberg_snapshot)
}
