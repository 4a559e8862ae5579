package graft.ext

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.functions._
import graft.Tables
import graft.queries.QueryDef

/** POSIX ustar TAR — the WebDataset container: multimodal training
  * shards ship as tar files whose entries group into samples by
  * basename (`<key>.txt`, `<key>.cls`, `<key>.jpg`, …), read
  * sequentially at training time. Both halves real and byte-exact: the
  * encoder writes full ustar headers (100-byte name, octal mode/size/
  * mtime fields, the space-seeded checksum, magic `ustar`+version,
  * 512-byte content padding, two zero trailer blocks); the parser walks
  * 512-byte blocks, VERIFIES every header checksum, decodes the octal
  * size field strictly, extracts entries and groups them into
  * WebDataset samples. Truncation, a corrupt checksum, a non-octal size
  * digit, bad magic, or a malformed trailer each fail LOUDLY with the
  * byte offset (the MediaDecoder contract) — a tar reader that guesses
  * desynchronizes on the next header and silently mis-frames every
  * entry after it.
  *
  * [[q_tar_shard]] gates the whole path: 8 documents per shard, two
  * entries per sample (`<doc_id>.txt` = text, `<doc_id>.cls` = lang),
  * parsed back to (entry census, text length, payload md5, class label,
  * and the .txt entry's DATA byte offset inside the shard — the
  * 512-block arithmetic recomputed closed-form by the oracle as a
  * running sum, the same index math a WebDataset random-access reader
  * does).
  *
  * Scale shape: one bounded per-group aggregation + one mapPartitions
  * encode+parse pass, zero further shuffles — embarrassingly parallel
  * over shards, exactly how WebDataset corpora are processed.
  */
object Tar {

  /** One parsed entry: name, payload, and where its DATA starts. */
  final case class Entry(name: String, payload: Array[Byte], dataOffset: Long)

  private val Block = 512

  // ---- encode -----------------------------------------------------------------

  private def octal(v: Long, width: Int): Array[Byte] = {
    // ustar numeric field: zero-padded octal, NUL terminator
    val s = java.lang.Long.toOctalString(v)
    require(s.length < width, s"value $v overflows $width-byte octal field")
    (("0" * (width - 1 - s.length)) + s + "\u0000").getBytes(UTF_8)
  }

  /** Encode entries as a ustar archive (header + padded content each,
    * two zero blocks at the end).
    */
  def encodeTar(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = ArrayBuffer.empty[Byte]
    entries.foreach { case (name, payload) =>
      val nameB = name.getBytes(UTF_8)
      require(nameB.length <= 100, s"name '$name' exceeds 100 bytes")
      val h = new Array[Byte](Block)
      System.arraycopy(nameB, 0, h, 0, nameB.length)
      System.arraycopy(octal(420, 8), 0, h, 100, 8) // mode 0644
      System.arraycopy(octal(0, 8), 0, h, 108, 8) // uid
      System.arraycopy(octal(0, 8), 0, h, 116, 8) // gid
      System.arraycopy(octal(payload.length.toLong, 12), 0, h, 124, 12)
      System.arraycopy(octal(0, 12), 0, h, 136, 12) // mtime
      java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum seeded spaces
      h(156) = '0' // typeflag: regular file
      System.arraycopy("ustar\u000000".getBytes(UTF_8), 0, h, 257, 8)
      var sum = 0L
      h.foreach(b => sum += (b & 0xff))
      // checksum: 6 octal digits, NUL, space
      val cs = java.lang.Long.toOctalString(sum)
      val csB = (("0" * (6 - cs.length)) + cs + "\u0000 ").getBytes(UTF_8)
      System.arraycopy(csB, 0, h, 148, 8)
      out ++= h
      out ++= payload
      val pad = (Block - payload.length % Block) % Block
      out ++= new Array[Byte](pad)
    }
    out ++= new Array[Byte](2 * Block)
    out.toArray
  }

  // ---- decode -----------------------------------------------------------------

  /** Walk + verify + extract. */
  def parseTar(docId: Long, b: Array[Byte]): Vector[Entry] = {
    def fail(off: Long, why: String): Nothing = throw new IllegalArgumentException(
      s"doc $docId: TAR parse at byte $off: $why")
    val entries = Vector.newBuilder[Entry]
    var pos = 0
    var done = false
    while (!done) {
      if (pos + Block > b.length) fail(pos.toLong, "truncated header block")
      if (b.slice(pos, pos + Block).forall(_ == 0)) {
        // first zero block: the trailer must be two zero blocks
        if (pos + 2 * Block > b.length ||
          !b.slice(pos + Block, pos + 2 * Block).forall(_ == 0))
          fail(pos.toLong, "trailer is not two zero blocks")
        // real writers (GNU tar) pad to a blocking factor past the two-
        // block trailer — any further bytes must be zeros, nothing else
        var q = pos + 2 * Block
        while (q < b.length) {
          if (b(q) != 0) fail(q.toLong, "non-zero bytes after the tar trailer")
          q += 1
        }
        done = true
      } else {
        val at = pos.toLong
        val magic = new String(b, pos + 257, 5, UTF_8)
        if (magic != "ustar") fail(at + 257, s"bad magic '$magic'")
        // checksum: recompute with the field as spaces, compare strictly
        var sum = 0L
        var i = 0
        while (i < Block) {
          sum += (if (i >= 148 && i < 156) ' '.toInt else b(pos + i) & 0xff)
          i += 1
        }
        def octalField(off: Int, width: Int): Long = {
          var v = 0L
          var j = off
          val end = off + width
          while (j < end && b(pos + j) != 0 && b(pos + j) != ' ') {
            val c = b(pos + j)
            if (c < '0' || c > '7') fail(at + j, s"non-octal digit '${c.toChar}'")
            v = v * 8 + (c - '0')
            j += 1
          }
          v
        }
        if (octalField(148, 8) != sum) fail(at + 148, "header checksum mismatch")
        val nameEnd = (0 until 100).find(j => b(pos + j) == 0).getOrElse(100)
        val name = new String(b, pos, nameEnd, UTF_8)
        if (name.isEmpty) fail(at, "empty entry name")
        val size = octalField(124, 12)
        if (size > Int.MaxValue) fail(at + 124, s"entry size $size unsupported")
        val tf = b(pos + 156)
        if (tf != '0' && tf != 0) fail(at + 156, s"typeflag '${tf.toChar}' unsupported")
        val dataAt = pos + Block
        if (size > b.length.toLong - dataAt) fail(at, s"entry data of $size bytes truncated")
        val payload = java.util.Arrays.copyOfRange(b, dataAt, dataAt + size.toInt)
        entries += Entry(name, payload, dataAt.toLong)
        val padded = ((size + Block - 1) / Block * Block).toInt
        pos = dataAt + padded
      }
    }
    entries.result()
  }

  // ---- the oracle-gated round-trip query ---------------------------------------

  private val PerShard = 8

  /** Documents → WebDataset shards (two entries per sample) → real
    * parse back, grouped into samples by basename. The `txt_offset`
    * column is the random-access index math: header blocks + padded
    * content of everything before it, recomputed by the oracle as a
    * running sum of exact 512-block sizes.
    */
  val q_tar_shard: QueryDef = QueryDef(
    s"""WITH d AS (SELECT doc_id, doc_id // $PerShard AS shard, text, lang,
       |    octet_length(encode(text)) AS plen,
       |    octet_length(encode(lang)) AS clen
       |  FROM documents),
       |z AS (SELECT *,
       |    $Block + ((plen + ${Block - 1}) // $Block) * $Block
       |      + $Block + ((clen + ${Block - 1}) // $Block) * $Block AS sample_bytes
       |  FROM d)
       |SELECT doc_id, CAST(shard AS BIGINT) AS shard,
       |  CAST(count(*) OVER (PARTITION BY shard) * 2 AS BIGINT) AS n_entries,
       |  CAST(plen AS BIGINT) AS txt_len,
       |  md5(text) AS txt_md5,
       |  lang AS cls,
       |  CAST(coalesce(sum(sample_bytes) OVER (PARTITION BY shard ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + $Block AS BIGINT) AS txt_offset
       |FROM z
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text"), col("lang"))
      .transform(DecodeStage.spread(expr(s"doc_id div $PerShard")))
      .groupBy(expr(s"doc_id div $PerShard").as("shard"))
      .agg(sort_array(collect_list(struct(col("doc_id").as("_1"),
        col("text").as("_2"), col("lang").as("_3")))).as("docs"))
      .as[(Long, Seq[(Long, String, String)])]
      .mapPartitions { it =>
        val md = MessageDigest.getInstance("MD5")
        it.flatMap { case (shard, docs) =>
          // WebDataset sample layout: .txt first, then .cls, per doc key
          val entries = docs.flatMap { case (id, text, lang) =>
            Seq((s"$id.txt", text.getBytes(UTF_8)), (s"$id.cls", lang.getBytes(UTF_8)))
          }
          val parsed = parseTar(shard, encodeTar(entries))
          // group into samples by basename — the WebDataset read contract
          val samples = parsed.groupBy(_.name.takeWhile(_ != '.')).map {
            case (key, es) => key.toLong -> es.map(e =>
              e.name.dropWhile(_ != '.') -> e).toMap
          }
          samples.toSeq.sortBy(_._1).map { case (id, parts) =>
            val txt = parts(".txt")
            val cls = parts(".cls")
            md.reset()
            val hex = md.digest(txt.payload).map("%02x".format(_)).mkString
            (id, shard, parsed.size.toLong, txt.payload.length.toLong, hex,
              new String(cls.payload, UTF_8), txt.dataOffset)
          }
        }
      }
      .toDF("doc_id", "shard", "n_entries", "txt_len", "txt_md5", "cls",
        "txt_offset")
      .orderBy(col("doc_id"))
  }

  val all: Map[String, QueryDef] = Map("q_tar_shard" -> q_tar_shard)
}
