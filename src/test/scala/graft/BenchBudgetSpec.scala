package graft

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.scalatest.funsuite.AnyFunSuite

/**
 * Per-query bench regression gate: the latest `BENCH_DETAIL.json` must
 * stay within the budgets checked into `BENCH_BUDGET.json` (derived from
 * a clean run by `tools/make_bench_budget.py`, 3× headroom + 1 s floor).
 *
 * This catches what the plan-shape pins in ScaleSpec cannot: a
 * constant-factor blowup that leaves the plan intact (e.g. an expression
 * falling out of codegen, a cache() dropped from a reused intermediate).
 *
 * Runs whose `loadavg_start` exceeds the budget file's threshold are
 * SKIPPED (assume), not failed — rounds 2–4 showed machine contention
 * produces 10–80× swings on an unchanged binary; a gate that cannot tell
 * load from regression would train everyone to ignore it.
 *
 * loadavg alone is a lagging 1-minute average and has missed contention
 * twice (r5: a run started right after a heavy verify read 1.86 while
 * `distinct_rows` ran 18× its clean time). So the gate is additionally
 * CANARY-NORMALIZED: the budget file carries `canary_sec` thresholds for
 * trivial fixed-shape queries (distinct_rows/tpch_q6/h2o_q1); if any
 * canary's best iteration exceeds its threshold, the machine — not the
 * engine — is slow, and the gate skips regardless of loadavg.
 *
 * Queries present in the detail but not yet in the budget (newly added)
 * pass with an info note — they get budgets when the budget file is next
 * re-derived from a clean run.
 */
class BenchBudgetSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  private def parse(path: String): Option[JsonNode] = {
    val f = new java.io.File(path)
    if (f.isFile) Some(mapper.readTree(f)) else None
  }

  test("latest bench detail within per-query budgets (load-guarded)") {
    val budgetOpt = parse("BENCH_BUDGET.json")
    val detailOpt = parse("BENCH_DETAIL.json")
    assume(budgetOpt.isDefined,
      "no BENCH_BUDGET.json — derive one with tools/make_bench_budget.py")
    assume(detailOpt.isDefined, "no BENCH_DETAIL.json — run graft.Bench first")
    val budget = budgetOpt.get
    val detail = detailOpt.get

    val maxLoad = Option(budget.get("max_loadavg_for_gate")).map(_.asDouble).getOrElse(2.0)
    val load = Option(detail.get("loadavg_start")).map(_.asDouble).getOrElse(99.0)
    assume(load <= maxLoad,
      f"detail run contended (loadavg_start $load%.2f > $maxLoad%.1f) — not gateable")

    val budgets = budget.get("budget_sec")
    val times = detail.get("times")
    assert(budgets != null && times != null, "malformed budget/detail JSON")

    // Canary check: a trivial query running far over its clean time means
    // the detail run was contended even if loadavg looked fine.
    Option(budget.get("canary_sec")).foreach { canaries =>
      val slow = canaries.properties().asScala.flatMap { c =>
        Option(times.get(c.getKey)).flatMap { t =>
          val best = t.elements().asScala.map(_.asDouble).min
          if (best > c.getValue.asDouble)
            Some(f"${c.getKey}: $best%.2fs > canary ${c.getValue.asDouble}%.2fs")
          else None
        }
      }.toSeq
      assume(slow.isEmpty,
        s"detail run contended (canary queries slow) — not gateable:\n  ${slow.mkString("\n  ")}")
    }

    val unbudgeted = scala.collection.mutable.ListBuffer.empty[String]
    val over = times.properties().asScala.flatMap { e =>
      val name = e.getKey
      // min over iterations — same statistic the budget was derived from
      val best = e.getValue.elements().asScala.map(_.asDouble).min
      budgets.get(name) match {
        case null => unbudgeted += name; None
        case b if best > b.asDouble =>
          Some(f"$name: $best%.2fs > budget ${b.asDouble}%.2fs")
        case _ => None
      }
    }.toSeq
    if (unbudgeted.nonEmpty)
      info(s"no budget yet (new queries): ${unbudgeted.mkString(", ")}")
    assert(over.isEmpty,
      s"bench regression beyond budget (3x clean-run headroom):\n  ${over.mkString("\n  ")}")
  }
}
