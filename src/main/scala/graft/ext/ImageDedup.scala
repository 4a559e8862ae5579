package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.queries.QueryDef

/** Image near-duplicate detection over PERCEPTUAL hashes — the
  * multimodal twin of the MinHash-LSH text-dedup family (SURVEY.md §2
  * H2/H3), running on the REAL codec path end-to-end: each user's event
  * stream becomes a grayscale pixel grid, the grid goes through the real
  * PNG encode + ImageIO decode ([[Multimodal.encodePng]] /
  * `decodeImagePixels`), the decoded image is resized to the canonical
  * 8×8 by the real nearest-neighbor kernel ([[Multimodal.resizeNearest]]),
  * and the classic difference hash (dHash: bit = right pixel brighter
  * than left, 7×8 = 56 bits) is packed into a BIGINT. Near-dups are then
  * found EXACTLY like text LSH: 8 bands × 7 bits, candidates = pairs
  * sharing any band value (equi-join, never all-pairs), verified by
  * Hamming distance ≤ 14 (`bit_count(xor)`).
  *
  * The synthesized corpus plants real near-dup structure: users sharing
  * `user_id % 4` draw from the same base pattern, individually perturbed
  * by value-derived brightness spikes (measured on the testdata:
  * same-cluster Hamming median ≈ 5, cross-cluster ≈ 35, banding recall
  * ≈ 0.9 of threshold-true pairs — the documented LSH tradeoff, and the
  * oracle replays the same banding so the gate is exact).
  *
  * Scale shape: hashing is one bounded per-user aggregation + one
  * `mapPartitions` codec pass; the band join is hash-partitioned on
  * (band, value) exactly like the MinHash band join — at 100 TB the
  * candidate set is bucket-local, AQE-skew-splittable, and a viral
  * bucket is boundable by the same chain-cap pattern as ext/Dedup.
  */
object ImageDedup {

  private val GridW = 8
  private val MaxRows = 6
  private val HashBits = 56 // 7 comparisons x 8 resized rows
  private val Bands = 8
  private val BandBits = 7
  private val MaxHamming = 14

  /** Brightness formula shared by both engines (all integer, 0..190):
    * cluster base = (((user_id%4)*3 + rn)*5 % 11) * 12, plus a 70-point
    * spike when the value-derived roll hits 0 (p = 1/8).
    */
  private val BrightSql =
    """(((user_id % 4) * 3 + rn) * 5 % 11) * 12
      | + CASE WHEN ((CAST(floor(value*100) AS BIGINT) % 8) + 8) % 8 = 0
      |        THEN 70 ELSE 0 END""".stripMargin.replace("\n", "")

  /** Oracle CTEs ending in `dh` = (user_id, dhash): the relational
    * recomputation of the codec-path hash — PNG is lossless and the
    * nearest-neighbor resize selects src row (y*ht)//8, so the oracle
    * reads the SAME brightness values the decoded image carries.
    */
  private val HashSql =
    s"""e AS (SELECT user_id, rn, $BrightSql AS v FROM (
       |    SELECT user_id, value,
       |      row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
       |    FROM events)),
       |g AS (SELECT user_id, LEAST(count(*) // $GridW, $MaxRows) AS ht
       |  FROM e GROUP BY user_id HAVING count(*) >= $GridW),
       |bits AS (SELECT g.user_id, y.y * 7 + x.x AS bit,
       |    r.v > l.v AS setb
       |  FROM g,
       |    (SELECT unnest(range(0, 8)) AS y) y,
       |    (SELECT unnest(range(0, 7)) AS x) x,
       |    e l, e r
       |  WHERE l.user_id = g.user_id
       |    AND l.rn = ((y.y * g.ht) // 8) * $GridW + x.x + 1
       |    AND r.user_id = g.user_id
       |    AND r.rn = ((y.y * g.ht) // 8) * $GridW + x.x + 2),
       |dh AS (SELECT user_id,
       |    CAST(coalesce(sum(CASE WHEN setb THEN 1::BIGINT << bit ELSE 0 END), 0) AS BIGINT) AS dhash
       |  FROM bits GROUP BY user_id)""".stripMargin

  /** The real-codec hash frame: (user_id, dhash). One bounded per-user
    * aggregation (events are user-keyed), one mapPartitions
    * encode→decode→resize→hash pass, zero further shuffles.
    */
  private[ext] def hashesReal(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val perRow = GridW
    Tables.events(s, dir)
      .select(col("user_id"), col("value"), col("ts"), col("event_id"))
      .transform(DecodeStage.spread(col("user_id")))
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("ts"), col("event_id"), col("value"))))
        .as("evs"))
      .filter(size(col("evs")) >= perRow)
      .select(col("user_id"),
        expr(s"transform(slice(evs, 1, least((size(evs) div $perRow) * $perRow, " +
          s"${perRow * MaxRows})), e -> e.value)").as("vals"))
      .as[(Long, Seq[Double])]
      .mapPartitions { it =>
        val dec = new Multimodal.MediaDecoder()
        it.map { case (uid, vals) =>
          val px = vals.zipWithIndex.map { case (value, i) =>
            val rn = i + 1L
            val spike =
              if (math.floorMod(math.floor(value * 100).toLong, 8L) == 0L) 70 else 0
            val v = (((uid % 4) * 3 + rn) * 5 % 11 * 12 + spike).toInt
            (v, v, v)
          }
          val ht = px.size / GridW
          val (w, h, argb) = dec.decodeImagePixels(Multimodal.MediaDoc(
            uid, "image/png", Multimodal.encodePng(GridW, ht, px)))
          val out = Multimodal.resizeNearest(w, h, argb, 8, 8)
          var hash = 0L
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 7) {
              if ((out(y * 8 + x + 1) & 0xff) > (out(y * 8 + x) & 0xff))
                hash |= 1L << (y * 7 + x)
              x += 1
            }
            y += 1
          }
          (uid, hash)
        }
      }
      .toDF("user_id", "dhash")
  }

  /** Per-image 56-bit dHash through the full real pipeline — the
    * fingerprint face (debuggability + the building block the pairs
    * query shares with the oracle).
    */
  val q_image_dhash: QueryDef = QueryDef(
    s"""WITH $HashSql
       |SELECT user_id, dhash FROM dh ORDER BY user_id""".stripMargin) { (s, dir) =>
    hashesReal(s, dir).orderBy(col("user_id"))
  }

  /** Banded near-dup pairs: 8×7-bit bands → equi-join candidates →
    * Hamming-verified. The image twin of `q_minhash_lsh_pairs`.
    */
  val q_image_dhash_pairs: QueryDef = QueryDef(
    s"""WITH $HashSql,
       |bands AS (SELECT user_id, dhash, b.b AS band,
       |    (dhash >> (b.b * $BandBits)) & ${(1 << BandBits) - 1} AS bv
       |  FROM dh, (SELECT unnest(range(0, $Bands)) AS b) b),
       |cand AS (SELECT DISTINCT a.user_id AS user_a, a.dhash AS ha,
       |    c.user_id AS user_b, c.dhash AS hb
       |  FROM bands a JOIN bands c
       |    ON a.band = c.band AND a.bv = c.bv AND a.user_id < c.user_id)
       |SELECT user_a, user_b,
       |  CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
       |FROM cand WHERE bit_count(xor(ha, hb)) <= $MaxHamming
       |ORDER BY user_a, user_b""".stripMargin) { (s, dir) =>
    // the codec pass is the dominant cost and feeds BOTH sides of the
    // band self-join — checkpoint it once (the Dedup band-join pattern)
    // so Spark cannot re-run the PNG encode/decode lineage per side
    val dh = hashesReal(s, dir).localCheckpoint(true)
    val bands = dh.select(col("user_id"), col("dhash"),
      explode(array((0 until Bands).map { b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col("dhash"), b * BandBits)
            .bitwiseAND(lit((1L << BandBits) - 1)).as("bv"))
      }: _*)).as("bnd"))
      .select(col("user_id"), col("dhash"),
        col("bnd.band").as("band"), col("bnd.bv").as("bv"))
    val a = bands.select(col("band"), col("bv"),
      col("user_id").as("user_a"), col("dhash").as("ha"))
    val c = bands.select(col("band"), col("bv"),
      col("user_id").as("user_b"), col("dhash").as("hb"))
    a.join(c, Seq("band", "bv"))
      .filter(col("user_a") < col("user_b"))
      .select(col("user_a"), col("ha"), col("user_b"), col("hb"))
      .distinct()
      .withColumn("hamming",
        expr("bit_count(ha ^ hb)").cast("long"))
      .filter(col("hamming") <= MaxHamming)
      .select(col("user_a"), col("user_b"), col("hamming"))
      .orderBy(col("user_a"), col("user_b"))
  }

  val all: Map[String, QueryDef] = Map(
    "q_image_dhash" -> q_image_dhash,
    "q_image_dhash_pairs" -> q_image_dhash_pairs)
}
