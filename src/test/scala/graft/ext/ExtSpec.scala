package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.SparkSpec

/** Unit coverage for the LLM-pipeline extension operators (the DuckDB
  * oracle gate covers full-output equality; these pin the semantics that
  * the oracle can't see — guards, determinism, scale-shape invariants).
  */
class ExtSpec extends AnyFunSuite with SparkSpec with Matchers {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("shingles/charNgrams guard short inputs (no descending sequence)") {
    val df = Seq("a b", "a b c d e f", "ab").toDF("text")
      .select(
        TextAnalysis.shingles(TextAnalysis.tokens(col("text")), 5).as("sh"),
        TextAnalysis.charNgrams(col("text"), 3).as("g"))
    val rows = df.collect()
    rows(0).getSeq[String](0) shouldBe empty // 2 tokens < 5
    rows(1).getSeq[String](0) shouldBe Seq("a b c d e", "b c d e f")
    rows(2).getSeq[String](1) shouldBe empty // 2 chars < 3
  }

  test("hash60 matches the JVM md5 the oracle contract specifies") {
    // CAST('0x' || substr(md5('7|abc'), 1, 15) AS BIGINT)
    val expect = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest("7|abc".getBytes("UTF-8")).map("%02x".format(_)).mkString
        .substring(0, 15), 16)
    val got = Seq("abc").toDF("s")
      .select(TextAnalysis.hash60(col("s"), 7)).collect()(0).getLong(0)
    got shouldBe expect
  }

  test("minhash over a shingle set is NULL on empty, order-insensitive otherwise") {
    val mh = array_min(transform(col("sh"), s => TextAnalysis.hash60(s, 0)))
    val rows = Seq(Seq.empty[String], Seq("x", "y"), Seq("y", "x")).toDF("sh")
      .select(mh.as("mh")).collect()
    rows(0).isNullAt(0) shouldBe true
    rows(1).getLong(0) shouldBe rows(2).getLong(0) // set semantics: order-free
  }

  test("LSH pairs are verified near-dups: J >= 0.5 by integer counts") {
    val pairs = Dedup.q_minhash_lsh_pairs.fn(spark, sf).collect()
    pairs should not be empty
    pairs.foreach { r =>
      val (inter, uni) = (r.getAs[Int]("inter"), r.getAs[Int]("uni"))
      inter * 2 should be >= uni
      r.getAs[Long]("doc_a") should be < r.getAs[Long]("doc_b")
    }
  }

  test("simhash of near-identical docs is close in hamming distance") {
    val fp = Dedup.q_simhash.fn(spark, sf)
    val pair = Dedup.q_minhash_lsh_pairs.fn(spark, sf).limit(1).collect()(0)
    val h = fp.filter(col("doc_id").isin(pair.getAs[Long]("doc_a"), pair.getAs[Long]("doc_b")))
      .collect().map(_.getAs[Long]("simhash"))
    java.lang.Long.bitCount(h(0) ^ h(1)) should be <= 6 // of 16 bits
  }

  test("brute-force cosine top-k: k rows per query, ranked, |cos| <= 1") {
    val rows = Similarity.q_similarity_topk.fn(spark, sf).collect()
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (_, g) =>
      g.map(_.getAs[Int]("rnk")).sorted shouldBe (1 to g.length)
      g.length should be <= 3
    }
    rows.foreach(r => math.abs(r.getAs[Double]("cosine")) should be <= 1.0)
  }

  test("ANN results are a subset-quality approximation of brute force") {
    val exact = Similarity.q_similarity_topk.fn(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    val ann = Similarity.q_similarity_ann.fn(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    // same-bucket neighbors that brute force also ranked top-3 must agree;
    // recall is approximate by design, but SOME overlap is expected on
    // clustered embeddings
    (exact intersect ann) should not be empty
  }

  test("sketch aggregates stay within tolerance of exact answers") {
    val approx = ExtQueries.sketchStatsRaw(spark, sf).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("approx_distinct_docs"), r.getAs[Long]("approx_median_chars"))).toMap
    val exact = graft.Tables.documents(spark, sf)
      .groupBy(col("source"))
      .agg(countDistinct(col("text")).as("d"),
        expr("percentile(n_chars, 0.5)").as("m"))
      .collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("d"), r.getAs[Double]("m"))).toMap
    approx.keySet shouldBe exact.keySet
    for ((src, (ad, am)) <- approx) {
      val (ed, em) = exact(src)
      // Spark's HLL++ has no sparse low-cardinality mode, so error on
      // these testdata-sized groups runs above the configured rsd — gate
      // at 10% (the rsd bound re-tightens as groups grow toward scale)
      math.abs(ad - ed).toDouble / ed should be <= 0.10
      // GK summary with accuracy 1000 on these group sizes is near-exact;
      // allow a loose band so testdata regeneration can't flake the suite
      math.abs(am - em) / em should be <= 0.10
    }
    // the DECLARED query folds the same bound into oracle-checkable
    // booleans — all must read true or the driver's hash gate fails
    val gated = ExtQueries.q_sketch_stats.fn(spark, sf).collect()
    gated.length shouldBe approx.size
    gated.foreach { r =>
      r.getAs[Boolean]("hll_within_10pct") shouldBe true
      r.getAs[Boolean]("gk_within_10pct") shouldBe true
    }
  }

  test("int8-quantized top-k agrees with the float baseline on most entries") {
    def topSet(q: graft.queries.QueryDef) = q.fn(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    val f = topSet(Similarity.q_similarity_topk)
    val q8 = topSet(Similarity.q_similarity_topk_q8)
    q8.size shouldBe f.size
    // int8 on unit vectors perturbs each component by <= 1/254 of the
    // norm — neighbor sets stay mostly intact; pin a conservative floor
    (f.intersect(q8).size.toDouble / f.size) should be >= 0.6
  }

  test("semdedup drop rule: dropped iff a smaller-id same-cell neighbor above tau") {
    val rows = Similarity.q_semdedup.fn(spark, sf).collect()
    rows.length should be > 0
    val cellOf = rows.map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cell")).toMap
    rows.foreach { r =>
      val dropped = r.getAs[Boolean]("dropped")
      dropped shouldBe (r.getAs[Long]("n_dups") > 0)
      if (dropped) {
        val keep = r.getAs[Long]("keep_id")
        keep should be < r.getAs[Long]("vec_id") // survivor has the smaller id
        cellOf(keep) shouldBe r.getAs[Long]("cell") // and shares the cell
      } else r.isNullAt(r.fieldIndex("keep_id")) shouldBe true
    }
    // the corpus must exercise BOTH branches or the test is vacuous
    rows.count(_.getAs[Boolean]("dropped")) should be > 0
    rows.count(!_.getAs[Boolean]("dropped")) should be > 0
  }

  test("k-means IVF centroids beat the first-nlist stand-in on recall@3") {
    // fair queries: vectors that are NOT centroid seeds on either scheme
    // (the old stand-in's 0.93 recall on vec_id<5 queries was an artifact:
    // those queries WERE cells, so "their" cell collected exactly their
    // neighbors). 20 non-seed queries, recall vs brute-force top-3, on the
    // 500-vector corpus (sf0.001's ~200 vectors are recall-noise-dominated
    // at 16 cells)
    val e = Similarity.embFrame(spark, "/root/testdata/sf0.01")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val q = e.filter(col("vec_id") >= 100 && col("vec_id") < 120)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))

    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("query_id"), col("vec_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force = search with nprobe covering every cell of a 1-cell index
    import org.apache.spark.sql.expressions.Window
    val truth = pairs(e.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("cos", graft.functions.DotProduct(col("qv"), col("v")) / (col("qn") * col("nrm")))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))))
      .filter(col("rnk") <= 3))

    def recall(cents: org.apache.spark.sql.DataFrame): Double =
      (pairs(Similarity.ivfSearch(e, cents, q)) & truth).size.toDouble / truth.size
    val seed = recall(Similarity.ivfCentroidsSeed(e))
    val kmeans = recall(Similarity.ivfCentroidsKmeans(e))
    e.unpersist()
    withClue(s"kmeans=$kmeans seed=$seed: ") { kmeans should be >= seed }
    kmeans should be > 0.2 // sanity: meaningfully above nprobe/nlist noise
  }

  test("exploded-aggregation signatures ≡ per-k HOF minhash projections (bandRowsOf)") {
    // bandRowsOf now computes all 16 components in one exploded pass; it
    // must emit exactly the band rows of the per-component HOF form,
    // including dropping empty-shingle docs (null bkey never joins, and
    // both forms yield null components there)
    val docs = Dedup.wordShingleDocs(
      graft.Tables.documents(spark, "/root/testdata/sf0.001")
        .select(col("doc_id"), col("text")).limit(200)
        .unionByName(Seq((9999L, "ab")).toDF("doc_id", "text"))) // shingle-less doc
      .persist()
    val got = Dedup.bandRowsOf(docs, bands = 8, r = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    // reference: the round-3 per-k array_min(transform(...)) formulation
    val exp = {
      import org.apache.spark.sql.functions.{array_min, transform => tf}
      val sig = docs.select(col("doc_id") +: (0 until 16).map(k =>
        array_min(tf(col("hs"), h => Dedup.mhExpr(h, k))).as(s"mh$k")): _*)
      sig.select(col("doc_id"), explode(array((0 until 8).map(b => struct(
          lit(b).as("band"),
          (0 until 2).map(i => col(s"mh${2 * b + i}").cast("string"))
            .reduce((x, y) => concat(x, lit("|"), y)).as("bkey"))): _*)).as("bk"))
        .select(col("doc_id"), col("bk.band"), col("bk.bkey"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    }
    docs.unpersist()
    got shouldBe exp
    // the shingle-less doc's band keys are null on both forms — a null
    // bkey never equi-joins, so it can't produce candidates
    got.filter(_._1 == 9999L).foreach(_._3 shouldBe null)
  }

  test("giant-bucket cap: components survive a band-colliding min-doc_id outlier") {
    // The adversarial case the chain design exists for: a dissimilar doc
    // that LSH-collides into a viral bucket AND holds the bucket's min
    // doc_id. A star cap would hub every pair on it, every verification
    // edge would fail (J ~ 0.03), and the whole family would disconnect.
    // The chain sorts by full signature, so the outlier sits at one end,
    // loses its single chain edge at verification, and drops out — and
    // capped components equal uncapped components exactly.
    val cand = spark.range(1, 2000).select(col("id").as("h"),
        Dedup.mhExpr(col("h"), 0).as("m0"), Dedup.mhExpr(col("h"), 1).as("m1"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val hSet = cand.take(60)
    val (m00, m01) = (hSet.map(_._2).min, hSet.map(_._3).min)
    // band-0 argmin elements of H: a subset containing them (and nothing
    // smaller) shares H's band-0 signature by construction
    val (a0, a1) = (hSet.minBy(_._2)._1, hSet.minBy(_._3)._1)
    // tails that can never steal band 0's minima — the family provably
    // shares one bucket whatever the other bands do
    val tails = cand.drop(60).collect {
      case (h, x0, x1) if x0 > m00 && x1 > m01 => h }.take(100)
    tails.length shouldBe 100
    val hIds = hSet.map(_._1).toSeq
    val family = tails.zipWithIndex
      .map { case (t, i) => (100L + i, hIds :+ t) }.toSeq
    val outlier = (1L, Seq(a0, a1)) // min doc_id; J vs family = 2/61
    val docs = (family :+ outlier).toDF("doc_id", "hs")
      .repartition(8).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    def components(pairs: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      Components.connectedComponents(pairs, "doc_a", "doc_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val plain = Dedup.lshJaccardPairs(docs, bands = 8, r = 2)
      .select("doc_a", "doc_b").localCheckpoint(true)
    spark.conf.set("spark.graft.dedup.bandBucketCap", "10")
    val capped = try Dedup.lshJaccardPairs(docs, bands = 8, r = 2)
        .select("doc_a", "doc_b").localCheckpoint(true)
      finally spark.conf.unset("spark.graft.dedup.bandBucketCap")

    // the outlier really was a candidate (band collision planted) ...
    Dedup.candidatePairs(docs, 8, 2).filter(col("doc_a") === 1L).count() should be > 0L
    // ... and verification drops it on BOTH paths
    plain.filter(col("doc_a") === 1L || col("doc_b") === 1L).count() shouldBe 0L
    capped.filter(col("doc_a") === 1L || col("doc_b") === 1L).count() shouldBe 0L
    // uncapped: the 100-doc family is one clique-connected component
    val ccPlain = components(plain)
    ccPlain.map(_._1) shouldBe family.map(_._1).toSet
    ccPlain.map(_._2).toSet shouldBe Set(100L)
    // the contract: capped components == uncapped components, adversary included
    components(capped) shouldBe ccPlain
    docs.unpersist()
  }

  test("multi-probe ANN strictly improves recall over single-probe") {
    // hamming-1 probing recovers neighbors that fell just across one
    // hyperplane; with the equi-join shape intact (probes explode on the
    // broadcast query side only). Fair queries on the 500-vector corpus.
    val dir = "/root/testdata/sf0.01"
    val planes = Similarity.planesFor(graft.Tables.embeddings(spark, dir).count())
    val e = Similarity.embFrame(spark, dir)
      .withColumn("bucket", Similarity.bucketOf(col("v"), planes))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val q = e.filter(col("vec_id") >= 100 && col("vec_id") < 120)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"), col("bucket"))

    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("query_id"), col("vec_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    import org.apache.spark.sql.expressions.Window
    val truth = pairs(e.crossJoin(broadcast(q.drop("bucket")))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("cos", graft.functions.DotProduct(col("qv"), col("v")) / (col("qn") * col("nrm")))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))))
      .filter(col("rnk") <= 3))

    val single = (pairs(Similarity.annSearch(e, q, planes, multiProbe = false)) & truth).size
    val multi = (pairs(Similarity.annSearch(e, q, planes, multiProbe = true)) & truth).size
    e.unpersist()
    withClue(s"multi=$multi single=$single of ${truth.size}: ") { multi should be > single }
  }

  test("LSH plane count (and so bucket count) grows with the corpus") {
    // sizing rule: buckets ≈ n / targetBucketSize, so per-bucket join work
    // stays ~target² instead of (n/2^planes)² with planes frozen
    Similarity.planesFor(2000) shouldBe 4 // the testdata default
    Similarity.planesFor(2000000) shouldBe 14
    Similarity.planesFor(2000000000L) should be <= 24 // clamped
    Similarity.planesFor(10) shouldBe 1 // never zero planes
    // and the wired bucketing actually spreads: more planes → more buckets
    val e = graft.Tables.embeddings(spark, sf).select(col("embedding"))
    val b4 = e.select(Similarity.bucketOf(col("embedding"), 4)).distinct().count()
    val b8 = e.select(Similarity.bucketOf(col("embedding"), 8)).distinct().count()
    b8 should be > b4
    b4 should be <= 16L
  }

  test("fake media decoder is deterministic and bounded") {
    val dec = new Multimodal.MediaDecoder()
    val d = Multimodal.MediaDoc(1L, "text/plain", "hello".getBytes("UTF-8"))
    val f1 = dec.decode(d)
    val f2 = dec.decode(d) // same decoder instance reused — md.reset() works
    f1 shouldBe f2
    f1.width should (be >= 16 and be <= 655)
    f1.height should (be >= 16 and be <= 495)
    f1.n_frames should (be >= 1 and be <= 30)
  }

  test("frame sampling emits every 2nd frame, bounded by n_frames") {
    val feats = Multimodal.decodeFeatures(Multimodal.mediaDocs(spark, sf))
      .collect().map(f => f.doc_id -> f.n_frames).toMap
    val frames = Multimodal.q_frame_sample.fn(spark, sf).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    frames.foreach { case (id, g) =>
      g.length shouldBe (feats(id) + 1) / 2
      g.map(_.getAs[Int]("frame_id")).foreach(f => f % 2 shouldBe 0)
    }
  }

  test("pack_chunks: per-shard offsets tile the token stream exactly") {
    val rows = ExtQueries.q_pack_chunks.fn(spark, sf).collect()
    rows should not be empty
    // within each shard, in doc_id order, each doc starts where the
    // previous ended: start = pack_seq*256 + pack_offset, end = start+n
    rows.groupBy(_.getAs[Long]("shard")).foreach { case (_, g) =>
      var expectStart = 0L
      g.sortBy(_.getAs[Long]("doc_id")).foreach { r =>
        val n = r.getAs[Long]("n_tokens")
        val start = r.getAs[Long]("pack_seq") * 256 + r.getAs[Long]("pack_offset")
        start shouldBe expectStart
        // n_splits = boundaries crossed by [start, start+n)
        r.getAs[Long]("n_splits") shouldBe (start + n - 1) / 256 - start / 256
        expectStart = start + n
      }
    }
    // the shard key spreads: more than one shard in use
    rows.map(_.getAs[Long]("shard")).distinct.length should be > 1
  }

  test("boilerplate_strip: kept tokens preserve order; stripped set is high-DF") {
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val n = docs.size
    val df = docs.values.flatMap(_.split(" ").distinct).groupBy(identity)
      .map { case (t, g) => t -> g.size }
    val common = df.filter { case (_, c) => c * 50 >= 39 * n }.keySet
    common should not be empty // threshold actually strips on this corpus
    val out = ExtQueries.q_boilerplate_strip.fn(spark, sf).collect()
    out.length shouldBe n
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val expect = docs(id).split(" ").filterNot(common).mkString(" ")
      r.getAs[String]("stripped_text") shouldBe expect
      r.getAs[Long]("n_tokens_after") shouldBe
        (if (expect.isEmpty) 0L else expect.split(" ").length.toLong)
    }
  }

  test("redact masks emails/IPs/phones and counts per pattern; clean text unchanged") {
    val rows = Seq(
      "mail me at alice.smith+x@corp.example.com or bob@ex.io today",
      "server 10.1.255.7 answered, backup at 192.168.0.1",
      "call +1 (415) 555-0199 now",
      "nothing sensitive here").toDF("text")
      .select(
        TextAnalysis.redact(col("text")).as("clean"),
        TextAnalysis.redactionCounts(col("text")).as("n"))
      .collect()
    rows(0).getAs[String]("clean") shouldBe "mail me at <EMAIL> or <EMAIL> today"
    rows(0).getAs[org.apache.spark.sql.Row]("n").getInt(0) shouldBe 2
    rows(1).getAs[String]("clean") shouldBe "server <IP> answered, backup at <IP>"
    rows(1).getAs[org.apache.spark.sql.Row]("n").getInt(1) shouldBe 2
    rows(2).getAs[String]("clean") shouldBe "call <PHONE> now"
    rows(3).getAs[String]("clean") shouldBe "nothing sensitive here"
  }

  test("chunk_overlap: stride tiling covers every token; overlaps are exact") {
    val chunks = ExtQueries.q_chunk_overlap.fn(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("start_tok"),
        r.getAs[Long]("n_tok"), r.getAs[String]("chunk_text")))
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1)).toMap
    chunks.groupBy(_._1).foreach { case (id, cs) =>
      val w = docs(id)
      val sorted = cs.sortBy(_._2)
      // first chunk starts at 1; every token is covered by some chunk
      sorted.head._2 shouldBe 1L
      val covered = sorted.flatMap(c => c._2 until (c._2 + c._3)).toSet
      covered shouldBe (1L to w.length.toLong).toSet
      // chunk text is exactly the token slice; length bounded by CHUNK
      sorted.foreach { case (_, s, n, t) =>
        n should be <= 64L
        t shouldBe w.slice((s - 1).toInt, (s - 1 + n).toInt).mkString(" ")
      }
      // adjacent regular chunks overlap by exactly CHUNK - STRIDE when full
      sorted.sliding(2).foreach {
        case Array((_, s1, n1, _), (_, s2, _, _)) =>
          s2 - s1 shouldBe 48L
          if (n1 == 64L) (s1 + n1 - s2) shouldBe 16L
        case _ => ()
      }
    }
    chunks.length should be > docs.size // corpus docs are longer than one stride
  }

  test("count-min estimates never undercount and overestimate within eps*N") {
    val rows = ExtQueries.q_countmin_freq.fn(spark, sf).collect()
      .map(r => (r.getAs[Long]("exact"), r.getAs[Long]("est")))
    rows.length should be > 10
    rows.foreach { case (exact, est) => est should be >= exact } // CM invariant
    val n = rows.map(_._1).sum
    // classic bound: overestimate <= (e / w) * N with prob 1 - (1/2)^d;
    // assert the MEAN is comfortably inside (all-rows bound is probabilistic)
    val meanOver = rows.map { case (ex, es) => es - ex }.sum.toDouble / rows.length
    meanOver should be <= (math.E / 256.0) * n
  }

  test("lm_score ranks a corpus-typical doc above an all-rare-bigram doc") {
    // semantic sanity on the real corpus: the doc whose bigrams are the
    // corpus's most common should outscore the doc with the rarest. The
    // oracle gate proves cross-engine equality; this pins the DIRECTION.
    val rows = ExtQueries.q_lm_score.fn(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("lm_score"))
    rows.length should be > 100
    val scores = rows.map(_._2)
    scores.max should be > scores.min // discriminates at all
    all(scores) should be >= 0L
    all(scores) should be <= 1000000L // avg probability can't exceed 1
  }

  test("repeated_spans finds exactly the cross-doc shared 10-token spans") {
    val rows = ExtQueries.q_repeated_spans.fn(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_spans"), r.getAs[Long]("n_shared_occ"),
          r.getAs[Long]("n_shared_kinds")))).toMap
    // every doc appears exactly once, shared counts bounded by totals
    rows.keySet shouldBe graft.Tables.documents(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    rows.values.foreach { case (n, occ, kinds) =>
      occ should be <= n
      kinds should be <= occ
    }
    // the sf0.001 corpus plants near-dup docs — long shared runs exist
    rows.values.map(_._2).sum should be > 0L
    // driver-side reference on a small slice: recompute shared spans for
    // the 40 lowest docs against the WHOLE corpus via brute force
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def spans(t: String): Seq[String] = {
      val w = t.split(" ", -1)
      if (w.length < 10) Seq.empty else w.sliding(10).map(_.mkString(" ")).toSeq
    }
    val bySpan = scala.collection.mutable.Map[String, scala.collection.mutable.Set[Long]]()
    for ((id, t) <- docs; sp <- spans(t).distinct)
      bySpan.getOrElseUpdate(sp, scala.collection.mutable.Set()) += id
    for (id <- docs.keys.toSeq.sorted.take(40)) {
      val ss = spans(docs(id))
      val sharedOcc = ss.count(sp => bySpan(sp).size >= 2)
      val sharedKinds = ss.distinct.count(sp => bySpan(sp).size >= 2)
      rows(id) shouldBe ((ss.length.toLong, sharedOcc.toLong, sharedKinds.toLong))
    }
  }

  test("epoch_shuffle: per-shard positions tile 1..n; epochs permute differently") {
    val out = ExtQueries.q_epoch_shuffle.fn(spark, sf).collect()
    val nDocs = out.map(_.getLong(1)).distinct.length
    out.length shouldBe nDocs * 2 // every doc appears once per epoch
    // within each (epoch, shard): contiguous positions 1..n
    out.groupBy(r => (r.getInt(0), r.getLong(2))).foreach { case (_, rows) =>
      rows.map(_.getLong(3)).sorted shouldBe (1L to rows.length).toSeq
    }
    // epochs produce genuinely different permutations: the (shard, pos)
    // assignment of at least one doc differs between epoch 0 and 1
    val byEpoch = out.groupBy(_.getInt(0)).map { case (e, rows) =>
      e -> rows.map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3))).toMap
    }
    byEpoch(0) should not equal byEpoch(1)
    // deterministic: a fresh plan replays the identical assignment
    val again = ExtQueries.q_epoch_shuffle.fn(spark, sf).collect()
    again.map(_.toString).toSeq shouldBe out.map(_.toString).toSeq
  }

  test("phone pattern keeps numeric non-PII intact (ADVICE r4 over-redaction)") {
    // phone-shaped structures mask; timestamps, versions, IDs, and loose
    // number sequences pass through untouched
    val cases = Seq(
      // positives
      "+41 22 0042 0017" -> "<PHONE>",
      "(415) 555-0199" -> "<PHONE>",
      "555-123-4567" -> "<PHONE>",
      "555.123.4567" -> "<PHONE>",
      // negatives the old any-digit-run pattern over-masked
      "2024-01-15 10.30" -> "2024-01-15 10.30",
      "meet at 10.30 or 11.45" -> "meet at 10.30 or 11.45",
      "version 1.2.3-rc4" -> "version 1.2.3-rc4",
      "order id 123456789012345" -> "order id 123456789012345",
      "scores 12 34 56 78 90 12" -> "scores 12 34 56 78 90 12")
    val got = cases.map(_._1).toDF("text")
      .select(TextAnalysis.redact(col("text"))).collect().map(_.getString(0))
    got.toSeq shouldBe cases.map(_._2)
  }

  test("q_redact plants exactly one email/ip/phone per row and masks all three") {
    val rows = ExtQueries.q_redact.fn(spark, sf).limit(50).collect()
    rows.length should be > 0
    rows.foreach { r =>
      r.getAs[Int]("n_email") shouldBe 1
      r.getAs[Int]("n_ip") shouldBe 1
      r.getAs[Int]("n_phone") shouldBe 1
      val t = r.getAs[String]("redacted")
      t should include("<EMAIL>")
      t should include("<IP>")
      t should include("<PHONE>")
      // the planted decoys survive
      t should include("10.30 on 2024-01-15 build 1.2.")
      t should include("ticket ")
    }
  }

  test("dedup_apply keeps exactly the canonical + unpaired docs") {
    val comp = Dedup.q_dedup_components.fn(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("is_canonical")))
    val dropped = comp.filter(_._2 == 0).map(_._1).toSet
    dropped should not be empty // the sf0.001 corpus has planted near-dups
    val all = graft.Tables.documents(spark, sf).select("doc_id").collect()
      .map(_.getAs[Long]("doc_id")).toSet
    val kept = Dedup.q_dedup_apply.fn(spark, sf).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    kept shouldBe (all -- dropped)
  }

  test("source_overlap: ordered pairs, counts bounded by per-source totals") {
    val rows = ExtQueries.q_source_overlap.fn(spark, sf).collect()
    rows should not be empty
    rows.foreach { r =>
      r.getAs[String]("source_a") should be < r.getAs[String]("source_b")
      r.getAs[Long]("n_common") should be <=
        math.min(r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
      r.getAs[Long]("n_common") should be > 0L
    }
    // symmetric dedup: each unordered pair appears exactly once
    val keys = rows.map(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b")))
    keys.distinct.length shouldBe keys.length
  }

  test("mix_epochs: full epochs for every doc, at most one partial epoch") {
    val rows = ExtQueries.q_mix_epochs.fn(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Long]("epoch")))
    rows should not be empty
    val byDoc = rows.groupBy(_._1)
    // every doc's epochs are contiguous from 0 (full epochs + optional final)
    byDoc.values.foreach { es =>
      es.map(_._3).sorted shouldBe (0L until es.length.toLong)
    }
    // within one source, doc repeat counts differ by at most 1 (the
    // fractional final epoch keeps a deterministic subset)
    byDoc.toSeq.map { case (_, es) => (es.head._2, es.length) }
      .groupBy(_._1).values.foreach { counts =>
        val ns = counts.map(_._2)
        (ns.max - ns.min) should be <= 1
      }
  }

  test("fused ShingleHashes is byte-identical to the composed distinct+md5 form") {
    import org.apache.spark.sql.functions._
    // real corpus plus hand-built edge cases: under 3 tokens, interior
    // empty tokens (double spaces survive concat_ws), duplicate shingles,
    // exactly 3 tokens
    val edge = Seq(
      (900001L, ""), (900002L, "one"), (900003L, "one two"),
      (900004L, "a b c"), (900005L, "a  b  c d"),
      (900006L, "x y z x y z x y z"), (900007L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text")
      .unionByName(edge)
    // null text: the fused form's declared contract is the EMPTY hash set
    // (ADVICE r7 — drop-in for the `when(...).otherwise(array())` guard
    // the composed call sites carried); coalesce normalizes the composed
    // side's null so the element compare can run
    val composed = docs
      .select(col("doc_id"), coalesce(array_distinct(
        TextAnalysis.shingles(TextAnalysis.tokens(col("text")), 3)),
        array().cast("array<string>")).as("fs"))
      .select(col("doc_id"), transform(col("fs"),
        x => graft.functions.Md5PrefixLong(x, 15)).as("hs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val fused = Dedup.wordShingleDocs(docs)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    fused.keySet shouldBe composed.keySet
    // element AND first-occurrence-order identical, per doc
    fused.foreach { case (id, hs) => withClue(s"doc $id: ") {
      hs shouldBe composed(id)
    }}
  }

  test("fused CharGramHashes is byte-identical to the composed distinct+md5 form") {
    import org.apache.spark.sql.functions._
    val edge = Seq(
      (910001L, ""), (910002L, "abc"), (910003L, "abcd"), (910004L, "abcde"),
      (910005L, "aaaaaaaa"), (910006L, "ab cd ef gh"),
      (910007L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text")
      .unionByName(edge)
    // coalesce: composed charNgrams yields NULL under 5 chars (and for
    // null text) where the fused form's declared contract is [] —
    // downstream-equivalent (explode emits nothing for both), normalized
    // here so the element compare can run
    val composed = docs
      .select(col("doc_id"),
        coalesce(TextAnalysis.charNgrams(col("text"), 5),
          array().cast("array<string>")).as("fs"))
      .select(col("doc_id"), transform(col("fs"),
        x => graft.functions.Md5PrefixLong(x, 15)).as("hs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val fused = docs
      .select(col("doc_id"), graft.functions.CharGramHashes(col("text"), 5).as("hs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    fused.keySet shouldBe composed.keySet
    fused.foreach { case (id, hs) => withClue(s"doc $id: ") {
      hs shouldBe composed(id)
    }}
  }
}
