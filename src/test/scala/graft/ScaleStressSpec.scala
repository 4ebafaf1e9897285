package graft

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/**
 * Gate on the 10× empirical scaling artifact (`BENCH_SCALE.json`, written
 * by `graft.ScaleStress`): no heavy query may scale ~quadratically with
 * the data (ratio ≥ copies² with a 0.5 s noise floor — see ScaleStress).
 * Skips when the artifact hasn't been generated; regenerate with
 * `tools/run.sh graft.ScaleStress 10` after changing a heavy operator.
 */
class ScaleStressSpec extends AnyFunSuite {

  test("10x scale run shows no quadratic query (artifact-gated)") {
    val f = new java.io.File("BENCH_SCALE.json")
    assume(f.isFile, "no BENCH_SCALE.json — run tools/run.sh graft.ScaleStress")
    val root = new ObjectMapper().readTree(f)
    val suspects = root.get("suspect_quadratic").elements().asScala.map(_.asText).toSeq
    assert(suspects.isEmpty,
      s"queries scaling ~quadratically at ${root.get("copies")}x: ${suspects.mkString(", ")}")
    // sanity: the artifact actually measured something
    assert(root.get("queries").size() >= 10)
  }

  test("skew stress: user_id-keyed queries stay bounded when one user owns half the events") {
    val f = new java.io.File("BENCH_SCALE.json")
    assume(f.isFile, "no BENCH_SCALE.json — run tools/run.sh graft.ScaleStress")
    val root = new ObjectMapper().readTree(f)
    assume(root.has("skew"), "artifact predates the skew harness — regenerate")
    val skew = root.get("skew")
    val suspects = skew.get("suspect_skew").elements().asScala.map(_.asText).toSeq
    assert(suspects.isEmpty,
      s"queries blowing past ${skew.get("threshold")}x under key skew: ${suspects.mkString(", ")}")
    assert(skew.get("queries").size() >= 2)
  }

  test("Iceberg planning cost scales ~linearly in the live-file count") {
    val f = new java.io.File("BENCH_SCALE.json")
    assume(f.isFile, "no BENCH_SCALE.json — run tools/run.sh graft.ScaleStress")
    val root = new ObjectMapper().readTree(f)
    assume(root.has("iceberg_planning"),
      "artifact predates the planning harness — regenerate")
    val p = root.get("iceberg_planning")
    assert(!p.get("suspect").asBoolean,
      s"planning a ${p.get("files_large")}-file table took " +
        s"${p.get("ratio")}x the ${p.get("files_small")}-file time " +
        s"(threshold ${p.get("threshold")}x for 10x files)")
  }
}
