package graft.plans

import org.apache.spark.SparkException
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Session-level plan guardrails — the library's PlanInvariantSpec checks
  * productionized as a Catalyst extension (`SparkSessionExtensions`), so a
  * pipeline can refuse scale-killer plans at PLAN time instead of
  * discovering them as a 10-hour straggler stage at 100 TB.
  *
  * Flagged shapes (the two that are never survivable on unbounded data):
  *  - a join with NO condition where BOTH sides can be large — the n×m
  *    cartesian. Exempt: sides the planner can PROVE small (`maxRows` ≤
  *    [[Guardrails.SmallSide]]: scalar aggregates, limits, tiny ranges,
  *    local relations) — the deliberate one-row-broadcast pattern the
  *    engine's own queries use for ppm denominators — and joins where a
  *    side carries an EXPLICIT `broadcast()` hint: the hint is the
  *    caller's assertion of smallness (Spark will try to materialize
  *    that side on every executor regardless, so the cartesian blowup is
  *    already bounded by what the broadcast itself can hold).
  *  - a window function with an EMPTY partition spec over a possibly
  *    large child — every row shuffles to one reducer and sorts there.
  *    (Dimension-bounded frames — a per-day carry, a vocab rank — are
  *    unprovable to the planner; either collect the bounded dimension
  *    under a loud `require` and prefix-scan it driver-side, re-entering
  *    as a provably-small local relation — how the engine's own
  *    concurrency curve does it — or run those pipelines in `warn`.)
  *
  * Modes via the `spark.graft.guardrails` session conf, settable per
  * query at runtime: `warn` (default — log and continue; the engine's
  * own catalog plans clean, so internal queries never pay it), `off`
  * (the opt-out, zero behavior change), `fail` (raise at plan time with
  * the violation named). The rule only inspects — it never rewrites the
  * plan.
  *
  * Registered by [[GraftExtensions]]; [[graft.GraftSession]] wires it
  * into every builder, and `spark.sql.extensions=graft.plans.GraftExtensions`
  * does the same for sessions built elsewhere.
  */
object Guardrails {

  val ConfKey = "spark.graft.guardrails"

  /** A side whose planner-proven row bound is at or under this is never a
    * cartesian risk: scalar aggregates (maxRows = 1), small limits, tiny
    * literal ranges.
    */
  val SmallSide = 1000L

  private[plans] def provablySmall(p: LogicalPlan): Boolean =
    p.maxRows.exists(_ <= SmallSide)

  /** An explicit broadcast() hint on either side is the caller's own
    * smallness assertion (and Spark bounds that side by what a broadcast
    * can physically hold) — not the accidental-cartesian shape.
    */
  private def explicitlyBroadcast(j: Join): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical.BROADCAST
    j.hint.leftHint.exists(_.strategy.contains(BROADCAST)) ||
      j.hint.rightHint.exists(_.strategy.contains(BROADCAST))
  }

  private[plans] case class GuardrailRule() extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = {
      val mode = conf.getConfString(ConfKey, "warn")
      if (mode != "off") {
        plan.foreach {
          case j: Join if j.condition.isEmpty
              && !provablySmall(j.left) && !provablySmall(j.right)
              && !explicitlyBroadcast(j) =>
            report(mode, "unbounded cross join (no join condition, neither side " +
              s"provably <= $SmallSide rows): n*m pairs at scale. Add an equi " +
              "condition, broadcast a provably small side, or pre-aggregate.")
          case w: Window if w.partitionSpec.isEmpty && !provablySmall(w.child) =>
            report(mode, "window without partitionBy over a possibly large input: " +
              "one reducer sorts every row at scale. Partition the window, or use " +
              "a bounded aggregate (TopKOrdered) / two-level prefix scheme.")
          case _ =>
        }
      }
      plan
    }

    private def report(mode: String, msg: String): Unit =
      if (mode == "fail") throw new SparkException(s"[graft.guardrails] $msg")
      else logWarning(s"[graft.guardrails] $msg")
  }
}

/** `spark.sql.extensions` entry point: the guardrail rule plus SQL
  * registration of the library's native codegen expressions, so a pure
  * `spark.sql(...)` caller (no Scala imports) gets the same operators the
  * DataFrame API exposes:
  *
  *  - `graft_dot(array<float>, array<float>) -> double` — fused dot product
  *  - `graft_int_dot(array<int>, array<int>) -> bigint` — integer dot
  *  - `graft_md5_prefix_long(string, nibbles_lit) -> bigint` — 4·n-bit
  *    md5-prefix hash, the dedup/LSH key primitive
  *  - `graft_shingle_hashes(toks, n_lit) -> array<bigint>` — distinct
  *    60-bit md5-prefix hashes of the n-token windows (the dedup/LSH
  *    shingle primitive, fused)
  *  - `graft_topk_ordered(score, id, k_lit) -> array<struct<score,id>>` —
  *    bounded top-k aggregate under (score DESC, id ASC)
  *
  * Static arguments (`nibbles`, `k`) must be integer literals — they
  * parameterize the expression instance itself, exactly like the literal
  * arguments of builtin `approx_count_distinct`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new SparkException(
      s"$fn: $arg must be an INTEGER literal, got $other")
  }

  private def arity(fn: String, es: Seq[Expression], n: Int): Unit =
    if (es.size != n) throw new SparkException(
      s"$fn expects $n arguments, got ${es.size}")

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      /* arguments */ "", /* examples */ "", /* note */ "", /* group */ "",
      /* since */ "", /* deprecated */ "", /* source */ "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => Guardrails.GuardrailRule())
    ext.injectFunction((FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - dot product of two float arrays"),
      (es: Seq[Expression]) => {
        arity("graft_dot", es, 2); graft.functions.DotProduct(es(0), es(1))
      }))
    ext.injectFunction((FunctionIdentifier("graft_int_dot"),
      info("graft_int_dot", "graft_int_dot(a, b) - dot product of two int arrays"),
      (es: Seq[Expression]) => {
        arity("graft_int_dot", es, 2); graft.functions.IntDot(es(0), es(1))
      }))
    ext.injectFunction((FunctionIdentifier("graft_md5_prefix_long"),
      info("graft_md5_prefix_long",
        "graft_md5_prefix_long(s, nibbles) - first `nibbles` hex chars of md5(s) as bigint"),
      (es: Seq[Expression]) => {
        arity("graft_md5_prefix_long", es, 2)
        graft.functions.Md5PrefixLong(es(0),
          intLit(es(1), "graft_md5_prefix_long", "nibbles"))
      }))
    ext.injectFunction((FunctionIdentifier("graft_shingle_hashes"),
      info("graft_shingle_hashes",
        "graft_shingle_hashes(toks, n) - distinct 60-bit md5-prefix hashes of the n-token windows"),
      (es: Seq[Expression]) => {
        arity("graft_shingle_hashes", es, 2)
        graft.functions.ShingleHashes(es(0),
          intLit(es(1), "graft_shingle_hashes", "n"))
      }))
    ext.injectFunction((FunctionIdentifier("graft_url_normalize"),
      info("graft_url_normalize",
        "graft_url_normalize(url) - RFC 3986 syntax normalization; NULL if not an absolute URL"),
      (es: Seq[Expression]) => {
        arity("graft_url_normalize", es, 1); graft.functions.UrlNormalize(es(0))
      }))
    ext.injectFunction((FunctionIdentifier("graft_nfc"),
      info("graft_nfc", "graft_nfc(s) - Unicode NFC normalization"),
      (es: Seq[Expression]) => {
        arity("graft_nfc", es, 1); graft.functions.NfcNormalize(es(0))
      }))
    ext.injectFunction((FunctionIdentifier("graft_strip_accents"),
      info("graft_strip_accents",
        "graft_strip_accents(s) - NFD decomposition with combining marks removed"),
      (es: Seq[Expression]) => {
        arity("graft_strip_accents", es, 1); graft.functions.StripAccents(es(0))
      }))
    ext.injectFunction((FunctionIdentifier("graft_topk_ordered"),
      info("graft_topk_ordered",
        "graft_topk_ordered(score, id, k) - top-k (score DESC, id ASC) as array<struct>"),
      (es: Seq[Expression]) => {
        arity("graft_topk_ordered", es, 3)
        graft.functions.TopKOrdered(es(0), es(1),
          intLit(es(2), "graft_topk_ordered", "k"))
      }))
  }
}
