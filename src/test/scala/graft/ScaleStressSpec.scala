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

  test("LSH mega-bucket guard: 1000 exact copies stay linear in distinct texts") {
    val spark = TestSpark.spark
    import spark.implicits._
    import graft.operators.Dedup
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val near = base + " today"
    val other = "completely different content about spark engines and data processing"
    val docs = ((1 to 1000).map(i => (i.toLong, base)) ++
      Seq((2001L, near), (2002L, other))).toDF("doc_id", "text")

    // the collapse: 3 distinct texts → the LSH/verify pipeline sees 3 rows,
    // so candidate generation is bounded by distinct-text pairs, not the
    // 1000-deep duplicate group
    val reps = Dedup.collapseExact(docs, "doc_id", "text")
    assert(reps.count() == 3)
    val sh = Dedup.shingles(reps, "id", "txt")
    val collapsedCands = Dedup.lshCandidates(Dedup.minhashBandKeys(sh, 6, 3))
    assert(collapsedCands.count() <= 3,
      "collapsed candidates must be bounded by distinct-text pairs")

    // without the collapse the duplicate group floods one bucket per band;
    // the opt-in cap drops exactly those buckets, and the audit surface
    // reports them (loud, never silent)
    val rawKeys = Dedup.minhashBandKeys(Dedup.shingles(docs, "doc_id", "text"), 6, 3)
    val oversize = Dedup.lshOversizeBuckets(rawKeys, 100).collect()
    assert(oversize.length == 6, s"expected the dup group's 6 band buckets, got ${oversize.mkString(",")}")
    assert(oversize.forall(_.getLong(2) >= 1000L))
    assert(Dedup.lshCandidates(rawKeys, maxBucket = 100).count() <= 3)

    // end-to-end semantics preserved: every intra-group pair at jac = 1.0
    // plus the near-dup fanned out to all 1000 members
    val pairs = Dedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val intra = pairs.filter(p => p._1 <= 1000 && p._2 <= 1000)
    assert(intra.length == 1000 * 999 / 2 && intra.forall(_._3 == 1.0))
    val crossNear = pairs.filter(_._2 == 2001L)
    assert(crossNear.length == 1000 && crossNear.forall(_._3 > 0.89))
    assert(!pairs.exists(p => p._1 == 2002L || p._2 == 2002L))
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

  test("changelog diff cost is bounded by affected files, not table files") {
    val f = new java.io.File("BENCH_SCALE.json")
    assume(f.isFile, "no BENCH_SCALE.json — run tools/run.sh graft.ScaleStress")
    val root = new ObjectMapper().readTree(f)
    assume(root.has("iceberg_changelog"),
      "artifact predates the changelog harness — regenerate")
    val c = root.get("iceberg_changelog")
    assert(!c.get("suspect").asBoolean,
      s"changelog over a one-partition delete on a " +
        s"${c.get("files_large")}-file table took ${c.get("ratio")}x the " +
        s"${c.get("files_small")}-file time (threshold " +
        s"${c.get("threshold")}x — candidate selection must keep the " +
        "diff bounded by AFFECTED files)")
  }

  test("v3 DV delete cost stays row-bound as the file count grows") {
    val f = new java.io.File("BENCH_SCALE.json")
    assume(f.isFile, "no BENCH_SCALE.json — run tools/run.sh graft.ScaleStress")
    val root = new ObjectMapper().readTree(f)
    assume(root.has("dv_delete"),
      "artifact predates the DV-delete harness — regenerate")
    val d = root.get("dv_delete")
    assert(!d.get("suspect").asBoolean,
      s"a keyed DELETE (deletion vectors) over ${d.get("files_large")} " +
        s"files took ${d.get("ratio")}x the ${d.get("files_small")}-file " +
        s"time (threshold ${d.get("threshold")}x for 10x files — the " +
        "per-file bitmap build and manifest rebuild must stay O(files), " +
        "the scan row-bound)")
  }

  test("v3 lineage read cost stays O(files) above a row-bound scan") {
    val f = new java.io.File("BENCH_SCALE.json")
    assume(f.isFile, "no BENCH_SCALE.json — run tools/run.sh graft.ScaleStress")
    val root = new ObjectMapper().readTree(f)
    assume(root.has("lineage_read"),
      "artifact predates the lineage-read harness — regenerate")
    val l = root.get("lineage_read")
    assert(!l.get("suspect").asBoolean,
      s"readWithRowId over ${l.get("files_large")} files took " +
        s"${l.get("ratio")}x the ${l.get("files_small")}-file time " +
        s"(threshold ${l.get("threshold")}x for 10x files — the per-file " +
        "broadcast map and materialized/derived coalesce must stay " +
        "O(files), the scan row-bound)")
  }

  test("connected components alternation count stays logarithmic in path length") {
    val f = new java.io.File("BENCH_SCALE.json")
    assume(f.isFile, "no BENCH_SCALE.json — run tools/run.sh graft.ScaleStress")
    val root = new ObjectMapper().readTree(f)
    assume(root.has("cc_path"),
      "artifact predates the cc-path harness — regenerate")
    val c = root.get("cc_path")
    assert(!c.get("suspect").asBoolean,
      s"connectedComponents took ${c.get("rounds_large")} large/small-star " +
        s"alternations on a ${c.get("nodes_large")}-node path vs " +
        s"${c.get("rounds_small")} on ${c.get("nodes_small")} nodes " +
        s"(slack ${c.get("round_slack")} — 10x the diameter must add " +
        "only ~log(10) alternations, the Kiveris bound)")
  }

  test("semantic dedup scales linearly when k grows with the corpus") {
    val f = new java.io.File("BENCH_SCALE.json")
    assume(f.isFile, "no BENCH_SCALE.json — run tools/run.sh graft.ScaleStress")
    val root = new ObjectMapper().readTree(f)
    assume(root.has("semantic_dedup"),
      "artifact predates the semantic-dedup harness — regenerate")
    val s = root.get("semantic_dedup")
    assert(!s.get("suspect").asBoolean,
      s"semanticDedup at 10x rows with k=${s.get("k_large")} took " +
        s"${s.get("ratio")}x the k=${s.get("k_small")} baseline " +
        s"(threshold ${s.get("threshold")}x — constant cell size must " +
        "keep the in-cell pairwise work linear in the corpus)")
  }

  test("Iceberg write cost stays data-bound as the partition count grows") {
    val f = new java.io.File("BENCH_SCALE.json")
    assume(f.isFile, "no BENCH_SCALE.json — run tools/run.sh graft.ScaleStress")
    val root = new ObjectMapper().readTree(f)
    assume(root.has("iceberg_write"),
      "artifact predates the write harness — regenerate")
    val w = root.get("iceberg_write")
    assert(!w.get("suspect").asBoolean,
      s"writing the same rows into ${w.get("parts_large")} partitions took " +
        s"${w.get("ratio")}x the ${w.get("parts_small")}-partition time " +
        s"(threshold ${w.get("threshold")}x for 10x files — the commit " +
        "must stay O(files) serialization, the data job row-bound)")
  }

  test("all_files cost grows ~linearly in distinct manifests, not " +
      "O(snapshots x manifests)") {
    val f = new java.io.File("BENCH_SCALE.json")
    assume(f.isFile, "no BENCH_SCALE.json — run tools/run.sh graft.ScaleStress")
    val root = new ObjectMapper().readTree(f)
    assume(root.has("iceberg_all_files"),
      "artifact predates the all_files harness — regenerate")
    val a = root.get("iceberg_all_files")
    assert(!a.get("suspect").asBoolean,
      s"all_files over ${a.get("manifests_large")} manifests took " +
        s"${a.get("ratio")}x the ${a.get("manifests_small")}-manifest time " +
        s"(threshold ${a.get("threshold")}x — distinct manifests must " +
        "parse once, distributed)")
  }

  test("mixDomains skew cutover keeps a 90%-dominant group in budget") {
    val f = new java.io.File("BENCH_SCALE.json")
    assume(f.isFile, "no BENCH_SCALE.json — run tools/run.sh graft.ScaleStress")
    val root = new ObjectMapper().readTree(f)
    assume(root.has("mix_skew"),
      "artifact predates the mix-skew harness — regenerate")
    val m = root.get("mix_skew")
    assert(!m.get("suspect").asBoolean,
      s"mixDomains with the skew cutover took ${m.get("ratio")}x its " +
        s"balanced-grouping time on a 90%-dominant corpus (threshold " +
        s"${m.get("threshold")}x — the hash pre-cut must keep the window " +
        s"input ~2x the keep budget; plain path for reference: " +
        s"${m.get("plain_skew_sec")}s vs cutover ${m.get("cut_skew_sec")}s)")
  }

  test("mixDomainsByTokens skew cutover keeps a 90%-dominant group in budget") {
    val f = new java.io.File("BENCH_SCALE.json")
    assume(f.isFile, "no BENCH_SCALE.json — run tools/run.sh graft.ScaleStress")
    val root = new ObjectMapper().readTree(f)
    assume(root.has("mix_tokens_skew"),
      "artifact predates the token-mix-skew harness — regenerate")
    val m = root.get("mix_tokens_skew")
    assert(!m.get("suspect").asBoolean,
      s"mixDomainsByTokens with the skew cutover took ${m.get("ratio")}x " +
        s"its balanced-grouping time on a 90%-dominant corpus (threshold " +
        s"${m.get("threshold")}x — the token-mass hash pre-cut must bound " +
        s"the window input; plain path for reference: " +
        s"${m.get("plain_skew_sec")}s vs cutover ${m.get("cut_skew_sec")}s)")
  }

  test("packShuffled hash-span parts stay balanced under id clustering") {
    val f = new java.io.File("BENCH_SCALE.json")
    assume(f.isFile, "no BENCH_SCALE.json — run tools/run.sh graft.ScaleStress")
    val root = new ObjectMapper().readTree(f)
    assume(root.has("pack_skew"),
      "artifact predates the pack-skew harness — regenerate")
    val p = root.get("pack_skew")
    assert(!p.get("suspect").asBoolean,
      s"packShuffled on id-clustered rows took ${p.get("ratio")}x its " +
        s"id-spread time (threshold ${p.get("threshold")}x — the md5 " +
        s"hash spans must be blind to the id distribution; for context, " +
        s"packOffsets' single-window path on the same clustered corpus " +
        s"ran ${p.get("offsets_clustered_sec")}s vs packShuffled " +
        s"${p.get("shuffled_clustered_sec")}s — at this corpus size the " +
        s"id-range degradation is not yet the bottleneck)")
  }
}
