package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.{SparkSpec, Tables}

/** Structural invariants of the CurationQueries wave — properties the
  * DuckDB hash gate can't articulate (it proves equality, not meaning):
  * Bloom one-sidedness, NTILE balance, session monotonicity, containment
  * bounds, component consistency with the edge set.
  */
class CurationSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val sf = "/root/testdata/sf0.001"

  test("sessionize: ordinals are 1..max dense per user and never decrease in time") {
    val rows = CurationQueries.q_sessionize.fn(spark, sf)
      .join(Tables.events(spark, sf).select(col("event_id"), col("ts")), "event_id")
      .select(col("user_id"), col("session_seq"), col("ts").cast("long").as("sec"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    rows.groupBy(_._1).foreach { case (_, es) =>
      val byTime = es.sortBy(_._3).map(_._2)
      // non-decreasing along the user's timeline, dense from 1
      byTime.zip(byTime.tail).foreach { case (a, b) => b should be >= a }
      byTime.min shouldBe 1L
      es.map(_._2).distinct.sorted shouldBe (1L to es.map(_._2).max)
    }
  }

  test("quantile_bins: NTILE populations within a type differ by at most 1; ranges ordered") {
    val rows = CurationQueries.q_quantile_bins.fn(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    rows.groupBy(_._1).foreach { case (_, bins) =>
      val ns = bins.map(_._3)
      (ns.max - ns.min) should be <= 1L
      // bin value ranges are non-overlapping and ordered by bin id
      val ordered = bins.sortBy(_._2)
      ordered.zip(ordered.tail).foreach { case (lo, hi) =>
        lo._5 should be <= hi._4 // prev bin's hi <= next bin's lo
      }
    }
  }

  test("entity_match: pairs share the blocking key and respect the distance gate") {
    val rows = CurationQueries.q_entity_match.fn(spark, sf).collect()
    rows should not be empty
    rows.foreach { r =>
      val (a, b, blk, d) = (r.getString(0), r.getString(1), r.getString(2), r.getLong(3))
      a should be < b
      a.split(' ').last shouldBe blk
      b.split(' ').last shouldBe blk
      d should be <= 3L
      d should be >= 1L // a < b means they differ
    }
  }

  test("graph_cc: edge endpoints always share a component; labels are component minima") {
    val cc = CurationQueries.q_graph_cc.fn(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val edges = CoreQueries.coPurchaseEdges(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    edges.foreach { case (a, b) => cc(a) shouldBe cc(b) }
    cc.groupBy(_._2).foreach { case (lbl, members) =>
      lbl shouldBe members.keys.min
    }
  }

  test("label_prop: communities refine connected components") {
    val cc = CurationQueries.q_graph_cc.fn(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lp = CurationQueries.q_label_prop.fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    lp.length shouldBe cc.size
    // a community label is itself a vertex, and it must live in the same
    // component as every member (labels only travel along edges)
    lp.foreach { case (part, community) => cc(community) shouldBe cc(part) }
    // refinement: at least as many communities as components
    lp.map(_._2).distinct.length should be >= cc.values.toSeq.distinct.length
  }

  test("bm25: top-20 is positive-scored, descending, and every scored doc holds a query term") {
    val rows = CurationQueries.q_bm25_rational.fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    rows.length should be <= 20
    rows should not be empty
    rows.foreach { case (_, hits, score) =>
      hits should be >= 1L
      score should be > 0L
    }
    rows.map(_._3).zip(rows.map(_._3).tail).foreach { case (a, b) => a should be >= b }
  }

  test("bloom_semijoin: no false negatives (bloom hits >= true hits, every true-hit doc flagged)") {
    val bloom = graft.ext.ExtQueries.q_bloom_semijoin.fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    bloom.foreach { case (_, nb, nt) => nb should be >= nt }
    // every doc the EXACT decontamination pass hits must appear with
    // n_true_hits > 0 — the one-sided-error guarantee
    val exact = graft.ext.ExtQueries.q_decontaminate.fn(spark, sf)
      .select(col("doc_id"), col("n_hits")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val flagged = bloom.map(t => t._1 -> t._3).toMap
    exact.foreach { case (doc, hits) =>
      flagged.getOrElse(doc, 0L) shouldBe hits
    }
  }

  test("containment: inter bounded by set sizes and the 0.9-of-smaller gate holds") {
    val rows = graft.ext.Dedup.q_minhash_containment.fn(spark, sf)
      .collect().map(r => (r.getInt(2).toLong, r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6)))
    rows.foreach { case (inter, sa, sb, ca, cb) =>
      inter should be <= math.min(sa, sb)
      inter * 10 should be >= 9 * math.min(sa, sb)
      ca shouldBe inter * 1000000 / sa
      cb shouldBe inter * 1000000 / sb
    }
  }

  test("dup_span_ratio: ppm bounded; every near-dup-paired doc shows shared text") {
    val rows = graft.ext.Dedup.q_dup_span_ratio.fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    rows should not be empty
    rows.foreach { case (_, nSh, nDup, ppm) =>
      nDup should be <= nSh
      ppm shouldBe nDup * 1000000 / nSh
    }
    val ratio = rows.map(t => t._1 -> t._4).toMap
    // a doc in a verified Jaccard>=0.5 pair shares >= inter shingles with
    // its partner, so its dup ratio is necessarily positive (vacuous if
    // the tiny corpus produces no verified pairs)
    graft.ext.Dedup.q_minhash_lsh_pairs.fn(spark, sf)
      .select(col("doc_a"), col("doc_b")).collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1)))
      .foreach { d => ratio(d) should be > 0L }
  }
}
