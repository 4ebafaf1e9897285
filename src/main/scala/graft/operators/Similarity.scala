package graft.operators

import scala.jdk.CollectionConverters._

import graft.functions.VecDot
import org.apache.spark.sql.{Column, DataFrame, GraftShim}
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (`array<float>`).
 *
 *  - Brute-force cosine top-k: broadcast the (small) query set against the
 *    full corpus — one pass, no shuffle of the big side; the per-pair dot
 *    product is a sequential `aggregate` fold over the array, which keeps
 *    the reduction order deterministic (bit-identical across engines).
 *  - Sign-LSH bucketed ANN: bucket on the sign pattern of the leading
 *    dimensions (an axis-aligned random-hyperplane family); candidates are
 *    generated only within a query's bucket, then refined exactly. At
 *    100 TB the bucket join shuffles each side once on an 8-bit key — the
 *    brute-force path stays as the small-query-set tool, the LSH path is
 *    the scale path (more planes ⇒ smaller buckets).
 */
object Similarity {

  /** Native codegen dot product (see [[graft.functions.VecDot]]) — built
    * directly as a Catalyst expression, so operators work on any session
    * without the function-registry parity layer. */
  private def vdot(a: Column, b: Column): Column =
    GraftShim.column(VecDot(GraftShim.expression(a), GraftShim.expression(b)))

  /** Native exact-integer folds over BIGINT micro-vectors (see
    * [[graft.functions.LongVecFold]]) — same NULL/length semantics as
    * the `aggregate(zip_with(...))` forms they replace. */
  private def vdotLong(a: Column, b: Column): Column =
    GraftShim.column(graft.functions.VecDotLong(
      GraftShim.expression(a), GraftShim.expression(b)))

  private def vl2Long(a: Column, b: Column): Column =
    GraftShim.column(graft.functions.VecL2Long(
      GraftShim.expression(a), GraftShim.expression(b)))

  /** (id, v: array<double>, norm2) projection of an embeddings table. */
  private def prep(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb.select(col(idCol).as("id"),
        expr(s"transform($vecCol, x -> CAST(x AS DOUBLE))").as("v"))
      .withColumn("norm2", vdot(col("v"), col("v")))

  private def dotExpr = vdot(col("qv"), col("v"))

  /** Exact cosine top-k of each query id against the whole corpus. */
  def cosineTopK(emb: DataFrame, idCol: String, vecCol: String,
                 queryPred: org.apache.spark.sql.Column, k: Int): DataFrame = {
    val all = prep(emb, idCol, vecCol)
    val q = all.filter(queryPred)
      .select(col("id").as("qid"), col("v").as("qv"), col("norm2").as("qnorm2"))
    val scored = broadcast(q).join(all, col("qid") =!= col("id"))
      .select(col("qid"), col("id").as("nid"),
        (dotExpr / (sqrt(col("qnorm2")) * sqrt(col("norm2")))).as("cos"))
    topK(scored, k)
  }

  /** Sign-LSH bucket id over the first `planes` dimensions. */
  private def bucketExpr(planes: Int) =
    (0 until planes).map(i =>
      when(element_at(col("v"), i + 1) >= 0, lit(1 << i)).otherwise(lit(0)))
      .reduce(_ + _)

  /** ANN: candidates restricted to the query's sign-LSH bucket, refined by
    * exact cosine. Trades recall for a bucket-local join. */
  def annSignLsh(emb: DataFrame, idCol: String, vecCol: String,
                 queryPred: org.apache.spark.sql.Column, k: Int,
                 planes: Int = 8): DataFrame = {
    val all = prep(emb, idCol, vecCol).withColumn("bkt", bucketExpr(planes))
    val q = all.filter(queryPred)
      .select(col("id").as("qid"), col("v").as("qv"),
        col("norm2").as("qnorm2"), col("bkt"))
    val scored = broadcast(q).join(all, Seq("bkt"))
      .filter(col("qid") =!= col("id"))
      .select(col("qid"), col("id").as("nid"),
        (dotExpr / (sqrt(col("qnorm2")) * sqrt(col("norm2")))).as("cos"))
    topK(scored, k)
  }

  /**
   * Deterministic IVF codebook: the corpus vectors with the `nCells`
   * smallest ids act as seed centroids (the init step of k-means||,
   * without the iterative refinement — fully SQL-expressible, so the
   * whole IVF path is oracle-checkable). Output: (cell, cv, cnorm2).
   * Production builds this ONCE, persists it, and passes it to
   * `ivfTopK` — the index build is out of the per-query path.
   */
  def buildIvfCentroids(emb: DataFrame, idCol: String, vecCol: String,
                        nCells: Int): DataFrame =
    // norm2 > 0: an all-zero seed would make every cell score 0/0 (NaN),
    // and Spark vs DuckDB NaN ordering diverges — zero vectors can't be
    // centroids (mirrored in the embed_ivf_topk oracle CTE).
    prep(emb, idCol, vecCol).filter(col("norm2") > 0).orderBy("id")
      .limit(nCells)
      .select(col("id").as("cell"), col("v").as("cv"),
        col("norm2").as("cnorm2"))

  /** Cell assignment entirely map-side: the centroid table is collapsed
    * to ONE row holding an array of (cell, cv, cnorm2) structs, broadcast,
    * and each corpus row computes its argmax-cosine cell with a single
    * fold over that array — no shuffle, no `corpus × nCells` explosion.
    * Ties break to the lowest cell id (strict `>` against the ascending
    * sort_array order). */
  private def assignCells(all: DataFrame, centroids: DataFrame): DataFrame = {
    val centArr = centroids.agg(
      sort_array(collect_list(struct(col("cell"), col("cv"), col("cnorm2"))))
        .as("cents"))
    val scoredCells = transform(col("cents"), c => struct(
      c.getField("cell").as("cell"),
      (vdot(col("v"), c.getField("cv")) / sqrt(c.getField("cnorm2")))
        .as("score")))
    val best = aggregate(
      scoredCells,
      struct(lit(-1L).as("cell"), lit(Double.NegativeInfinity).as("score")),
      (acc, s) => when(s.getField("score") > acc.getField("score"), s)
        .otherwise(acc))
    all.crossJoin(broadcast(centArr))
      .withColumn("cell", best.getField("cell"))
      .drop("cents")
  }

  /** Query-side multi-probe assignment: each row gets its `nprobe`
    * highest-scoring cells (score desc, ties to the lowest cell — the
    * nprobe=1 slice is exactly [[assignCells]]' argmax). Same map-side
    * shape: one broadcast centroid array, sort + slice + explode per row.
    * Output grain: one row per (input row, probed cell). */
  private def assignQueryCells(rows: DataFrame, centroids: DataFrame,
                               nprobe: Int): DataFrame = {
    require(nprobe > 0, s"nprobe must be positive, got $nprobe")
    val centArr = centroids.agg(
      sort_array(collect_list(struct(col("cell"), col("cv"), col("cnorm2"))))
        .as("cents"))
    // negated score first so ascending sort_array = score desc, cell asc
    val scoredCells = transform(col("cents"), c => struct(
      (-(vdot(col("v"), c.getField("cv")) / sqrt(c.getField("cnorm2"))))
        .as("negscore"),
      c.getField("cell").as("cell")))
    rows.crossJoin(broadcast(centArr))
      .withColumn("__probe", explode(slice(sort_array(scoredCells), 1, nprobe)))
      .withColumn("cell", col("__probe.cell"))
      .drop("cents", "__probe")
  }

  /**
   * IVF (inverted-file) ANN over a PREBUILT centroid table: each corpus
   * row is assigned to its nearest cell (map-side, see `assignCells`),
   * each query probes its `nprobe` nearest cells, candidates are refined
   * by exact cosine. Search is one hash-partitioned join on the cell id — the same
   * scale shape as the sign-LSH path but with a data-adaptive partitioning
   * (tighter cells ⇒ better recall per probe).
   */
  def ivfTopK(emb: DataFrame, idCol: String, vecCol: String,
              queryPred: org.apache.spark.sql.Column, k: Int,
              centroids: DataFrame, nprobe: Int = 1): DataFrame = {
    val all = prep(emb, idCol, vecCol)
    val assigned = assignCells(all, centroids)
    // a corpus row lives in exactly ONE cell, and a query's probed cells
    // are distinct — so no candidate ever appears twice (no dedup pass)
    val q = assignQueryCells(all.filter(queryPred), centroids, nprobe)
      .select(col("id").as("qid"), col("v").as("qv"),
        col("norm2").as("qnorm2"), col("cell"))
    val scored = broadcast(q).join(assigned, Seq("cell"))
      .filter(col("qid") =!= col("id"))
      .select(col("qid"), col("id").as("nid"),
        (dotExpr / (sqrt(col("qnorm2")) * sqrt(col("norm2")))).as("cos"))
    topK(scored, k)
  }

  /**
   * Distributed Lloyd k-means codebook TRAINER — upgrades the seed-scan
   * codebook ([[buildIvfCentroids]]) to a data-adaptive one, the index
   * build step a production IVF runs offline.
   *
   * Engineered for exact cross-engine replay (the repo's integer idiom):
   * vectors are quantized to integer MICRO-units
   * (`round(x * 1e6) as BIGINT`), so every distance is an exact BIGINT
   * (order-independent — no float summation-order divergence), seeds are
   * the k vectors with the smallest `md5(id)` (portable hash, no RNG),
   * ties break to the lowest cell, and centroid updates use truncating
   * integer division (Scala `/` == DuckDB `//`). Every iteration is:
   * map-side assignment against a BROADCAST centroid array (one fold per
   * row — no corpus×k join), then one (cell, dim)-grain aggregation whose
   * k×d result is collected to the driver (tiny by construction — this is
   * the standard iterative-ML driver loop, aggregates only, never rows).
   *
   * Returns one row per non-empty cell of the final assignment:
   * (cell, n_vecs, sum_ids, centroid_l1).
   */
  def kmeansCodebook(emb: DataFrame, idCol: String, vecCol: String,
                     k: Int, iters: Int): DataFrame = {
    import org.apache.spark.sql.{Row, types => T}
    val spark = emb.sparkSession
    val (cents, stats) = trainKmeans(emb, idCol, vecCol, k, iters)
    // stats were collected DURING the final iteration (k aggregate rows),
    // so no distributed job re-runs when the caller materializes this
    val rows = stats.toSeq.sortBy(_._1).map { case (cell, (n, sumIds)) =>
      Row(cell, n, sumIds, cents(cell.toInt).map(math.abs).sum)
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](rows.asJava),
      T.StructType(Seq(
        T.StructField("cell", T.LongType, nullable = false),
        T.StructField("n_vecs", T.LongType, nullable = false),
        T.StructField("sum_ids", T.LongType, nullable = false),
        T.StructField("centroid_l1", T.LongType, nullable = false))))
  }

  /** Bridge a TRAINED codebook into the IVF search path: the final
    * centroids in the (cell, cv, cnorm2) shape [[ivfTopK]] consumes
    * (micro-units scaled back — exact, /1e6 on integers). Zero-norm
    * centroids are dropped (same NaN guard as the seed builder). */
  def kmeansCentroidTable(emb: DataFrame, idCol: String, vecCol: String,
                          k: Int, iters: Int): DataFrame = {
    import org.apache.spark.sql.{Row, types => T}
    val spark = emb.sparkSession
    val (cents, _) = trainKmeans(emb, idCol, vecCol, k, iters)
    val rows = cents.zipWithIndex.collect {
      case (cv, i) if cv.exists(_ != 0L) =>
        val v = cv.map(_.toDouble / 1e6)
        Row(i.toLong, v, v.map(x => x * x).sum)
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](rows.asJava),
      T.StructType(Seq(
        T.StructField("cell", T.LongType, nullable = false),
        T.StructField("cv", T.ArrayType(T.DoubleType, containsNull = false), nullable = false),
        T.StructField("cnorm2", T.DoubleType, nullable = false))))
  }

  /** Final centroids only — the PQ per-subspace trainer's view of
    * [[trainKmeans]]. */
  private def trainKmeansOn(emb: DataFrame, idCol: String, vecCol: String,
                            k: Int, iters: Int): IndexedSeq[IndexedSeq[Long]] =
    trainKmeans(emb, idCol, vecCol, k, iters)._1

  /** The Lloyd loop shared by [[kmeansCodebook]] and
    * [[kmeansCentroidTable]]: returns the final quantized centroids plus
    * the final iteration's per-cell (n_vecs, sum_ids) — collected inside
    * the loop while the quantized input is still cached, so callers
    * never re-run the assignment after the cache is dropped. */
  private def trainKmeans(emb: DataFrame, idCol: String, vecCol: String,
                          k: Int, iters: Int)
      : (IndexedSeq[IndexedSeq[Long]], Map[Long, (Long, Long)]) = {
    require(k > 0 && iters > 0)
    val q = emb.select(col(idCol).cast("long").as("id"),
        expr(s"transform($vecCol, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT))")
          .as("qv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var cents: IndexedSeq[IndexedSeq[Long]] = q
        .withColumn("h", md5(col("id").cast("string")))
        .orderBy("h", "id").limit(k)
        .select("qv").collect()
        .map(_.getSeq[Long](0).toIndexedSeq).toIndexedSeq
      require(cents.size == k, s"corpus smaller than k=$k")
      var stats: Map[Long, (Long, Long)] = Map.empty
      for (_ <- 1 to iters) {
        val assigned = assignKmeansCells(q, cents)
        val sums: Map[(Long, Int), Long] = assigned
          .select(col("cell"), posexplode(col("qv")).as(Seq("pos", "v")))
          .groupBy("cell", "pos").agg(sum("v").as("s"))
          .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
        stats = assigned.groupBy("cell")
          .agg(count(lit(1)).as("n"), sum("id").as("sum_ids")).collect()
          .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
        cents = cents.zipWithIndex.map { case (old, i) =>
          stats.get(i.toLong) match {
            // truncating integer division — matches the oracle's `//`
            case Some((n, _)) => old.indices.map(p => sums((i.toLong, p)) / n)
            case None         => old // empty cell keeps its centroid
          }
        }
      }
      (cents, stats)
    } finally q.unpersist()
  }

  /** One seed-centroid assignment pass, for plan inspection in tests —
    * the kmeansCodebook OUTPUT plan is a LocalTableScan (stats are
    * collected during training), so the scale-shape pin must look at the
    * per-iteration assignment job this returns. */
  private[graft] def kmeansAssignmentForPlan(emb: DataFrame, idCol: String,
                                             vecCol: String, k: Int): DataFrame = {
    val q = emb.select(col(idCol).cast("long").as("id"),
      expr(s"transform($vecCol, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT))")
        .as("qv"))
    val seeds = q.withColumn("h", md5(col("id").cast("string")))
      .orderBy("h", "id").limit(k)
      .select("qv").collect().map(_.getSeq[Long](0).toIndexedSeq).toIndexedSeq
    assignKmeansCells(q, seeds)
  }

  /** Map-side nearest-centroid assignment over quantized vectors: the
    * exact BIGINT L2 argmin (ties to the lowest cell) as ONE native
    * expression over the centroid table held as a flat literal —
    * [[graft.functions.PqEncode]] with a single subspace. r20: the old
    * broadcast-struct-array HOF fold evaluated interpreted
    * (corpus × k × d closure calls — the dominant per-row cost of
    * semantic dedup and every Lloyd iteration); `strict` keeps the exact
    * zip_with degenerate-length semantics, so results are bit-identical.
    * Pure projection — no centroid join in the plan at all. */
  private def assignKmeansCells(q: DataFrame,
                                cents: IndexedSeq[IndexedSeq[Long]]): DataFrame = {
    val d = cents.head.size
    require(cents.forall(_.size == d), "ragged centroid table")
    val flat = new Array[Long](cents.size * d)
    for (c <- cents.indices; i <- 0 until d) flat(c * d + i) = cents(c)(i)
    q.withColumn("cell", element_at(
      GraftShim.column(graft.functions.PqEncode(
        GraftShim.expression(col("qv")), flat, 1, d, cents.size,
        strict = true)), 1))
  }

  /** SemDeDup-style SEMANTIC deduplication (cluster-then-prune, after
    * the published SemDeDup recipe): assign every embedding to a
    * k-means cell — the exact-integer idiom shared with
    * [[kmeansCodebook]], so the whole path replays in SQL — then,
    * WITHIN each cell only, mark an item as a semantic duplicate when
    * its cosine similarity to ANY smaller-id item of the same cell
    * reaches `threshold` (keep-lowest-id). Scale shape: the assignment
    * is one map-side pass against broadcast centroids; the pair check
    * is ONE self-join shuffled on the cell key, so pairwise work is
    * bounded by the largest cell — never corpus-all-pairs — and grows
    * linearly with corpus size at fixed k-proportional cell sizes.
    * `iters = 0` assigns against the deterministic md5-seed codebook
    * with no Lloyd updates (fully SQL-replayable at any k);
    * `iters > 0` trains first. Zero-norm vectors are never duplicates
    * (cosine undefined). Returns (id, cell, dropped) — callers filter
    * `!dropped` for the surviving corpus. */
  def semanticDedup(emb: DataFrame, idCol: String, vecCol: String,
                    k: Int, iters: Int, threshold: Double): DataFrame = {
    require(k > 0 && iters >= 0)
    val q = emb.select(col(idCol).cast("long").as("id"),
      expr(s"transform($vecCol, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT))")
        .as("qv"))
    val cents: IndexedSeq[IndexedSeq[Long]] =
      if (iters == 0) {
        val seeds = q.withColumn("h", md5(col("id").cast("string")))
          .orderBy("h", "id").limit(k)
          .select("qv").collect().map(_.getSeq[Long](0).toIndexedSeq).toIndexedSeq
        require(seeds.size == k, s"corpus smaller than k=$k")
        seeds
      } else trainKmeans(emb, idCol, vecCol, k, iters)._1
    // persist the assignment: BOTH sides of the in-cell self-join (and
    // the final flag projection) reference it — without the persist each
    // reference re-runs the assignment pass (the unionByName
    // double-compute lesson, generalized)
    val assigned = assignKmeansCells(q, cents)
      .withColumn("n2", vdotLong(col("qv"), col("qv")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = assigned.select(col("cell").as("a_cell"), col("id").as("a_id"),
      col("qv").as("a_qv"), col("n2").as("a_n2"))
    val b = assigned.select(col("cell").as("b_cell"), col("id").as("b_id"),
      col("qv").as("b_qv"), col("n2").as("b_n2"))
    // exact BIGINT dot over the quantized vectors (native codegen fold,
    // r20 — the zip_with form ran interpreted per candidate pair); the
    // cosine itself is double, but both engines derive it from identical
    // integers so the threshold compare is bit-stable cross-engine
    val cos = vdotLong(col("a_qv"), col("b_qv")).cast("double") /
      (sqrt(col("a_n2").cast("double")) * sqrt(col("b_n2").cast("double")))
    val dropIds = a.join(b,
        col("a_cell") === col("b_cell") && col("a_id") < col("b_id") &&
          col("a_n2") > 0L && col("b_n2") > 0L && cos >= threshold,
        "inner")
      .select(col("b_id").as("id")).distinct()
      .withColumn("__gf_dup", lit(1))
    assigned.select("id", "cell")
      .join(dropIds, Seq("id"), "left")
      .select(col("id"), col("cell"), col("__gf_dup").isNotNull.as("dropped"))
  }

  /** Convenience: build the deterministic seed codebook inline (cheap,
    * non-iterative — a top-`nCells` scan, not a KMeans fit). */
  def ivfTopK(emb: DataFrame, idCol: String, vecCol: String,
              queryPred: org.apache.spark.sql.Column, k: Int,
              nCells: Int): DataFrame =
    ivfTopK(emb, idCol, vecCol, queryPred, k,
      buildIvfCentroids(emb, idCol, vecCol, nCells))

  private def topK(scored: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("qid"), col("nid"), round(col("cos"), 4).as("cos"))
  }

  /** Embedding-cosine near-duplicate detection: candidate pairs are
    * generated ONLY within sign-LSH buckets (both sides shuffle once on
    * the bucket key — no all-pairs), refined by exact cosine, and the
    * global top-N most-similar pairs are reported. For a dedup sweep the
    * caller filters `cos >= threshold` instead of taking top-N. */
  def bucketNearPairs(emb: DataFrame, idCol: String, vecCol: String,
                      planes: Int, topN: Int): DataFrame = {
    val all = prep(emb, idCol, vecCol).withColumn("bkt", bucketExpr(planes))
    val a = all.select(col("bkt"), col("id").as("a_id"), col("v").as("qv"),
      col("norm2").as("qnorm2"))
    val b = all.select(col("bkt"), col("id").as("b_id"), col("v"),
      col("norm2"))
    val scored = a.join(b, Seq("bkt")).filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        (dotExpr / (sqrt(col("qnorm2")) * sqrt(col("norm2")))).as("cos"))
    // Global top-N as orderBy+limit: Spark plans TakeOrderedAndProject
    // (per-partition top-N, driver merge of N×partitions rows) — NOT a
    // single-partition window funnel. Plan-asserted in ScaleSpec.
    scored.orderBy(col("cos").desc, col("a_id"), col("b_id")).limit(topN)
      .select(col("a_id"), col("b_id"), round(col("cos"), 4).as("cos"))
  }

  /** Cost side of the IVF recall/cost tradeoff: the mean number of
    * candidates a single-probe query scans (same-cell corpus rows,
    * excluding self). Read together with [[recallAtK]] — a codebook with
    * degenerate giant cells posts high recall only because each probe
    * re-scans most of the corpus. */
  def ivfCandidateStats(emb: DataFrame, idCol: String, vecCol: String,
                        queryPred: org.apache.spark.sql.Column,
                        centroids: DataFrame, nprobe: Int = 1): DataFrame = {
    val all = prep(emb, idCol, vecCol)
    val assigned = assignCells(all, centroids)
    val cellSizes = assigned.groupBy("cell").agg(count(lit(1)).as("n_cell"))
    // per query: total corpus rows across its probed cells, minus self
    // (the query's own cell is always among its probes)
    assignQueryCells(all.filter(queryPred), centroids, nprobe)
      .join(cellSizes, Seq("cell"))
      .groupBy("id").agg((sum("n_cell") - 1).as("cand"))
      .agg(round(avg(col("cand").cast("double")), 6).as("avg_candidates"))
  }

  /** recall@k of the ANN result against the exact result, averaged over
    * queries (self-check harness for the LSH path). */
  // ---- product quantization (PQ) -------------------------------------

  /**
   * Product-quantization ADC search (after Jégou et al.'s PQ recipe):
   * vectors split into `m` subspaces; each subspace gets a `ksub`-entry
   * codebook; the corpus is ENCODED to m small codes per vector —
   * `m·log2(ksub)` bits instead of `d` floats, the memory lever that
   * keeps a 100 TB embedding corpus's index RAM-resident — and a query
   * scores a vector by summing per-subspace distances looked up in its
   * per-query table (asymmetric distance computation: the query side
   * stays exact, only the corpus side is quantized).
   *
   * Exact-integer engineering (the repo's replay idiom): micro-quantized
   * BIGINT vectors, codebooks seeded from the `ksub` lowest-md5(id)
   * corpus vectors (shared seed set across subspaces; no RNG), strict
   * `<` folds so code ties take the lowest index, BIGINT squared-L2
   * everywhere — the whole path replays bit-identically in SQL.
   *
   * Scale shape: encoding is ONE map-side projection against broadcast
   * codebook literals (no join); the search is the brute-ADC form —
   * queries broadcast against the encoded corpus, each pair costing m
   * array lookups instead of a d-dim dot. The production composition
   * IVF-then-PQ (probe cells, ADC within) follows by feeding
   * [[ivfTopK]]'s candidate set through the same encoded frame.
   *
   * Returns (qid, nid, adist) — approximate squared L2 in micro²-units,
   * ascending = most similar — for the top `k` per query.
   */
  /** (id, qv) micro-quantized BIGINT projection — the PQ family's
    * shared input frame. */
  private def microVecs(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb.select(col(idCol).cast("long").as("id"),
      expr(s"transform($vecCol, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT))")
        .as("qv"))

  /** The PQ building blocks over a seed codebook: the encode column
    * (`codes`: m codes as one array), the per-query flattened LUT
    * column (`lutf`: m·ksub distances), and the ADC sum. Seeds come
    * from the `ksub` lowest-md5(id) corpus vectors (shared seed set
    * across subspaces; deterministic, no RNG). Encode and LUT are the
    * native [[graft.functions.PqEncode]]/[[graft.functions.PqLut]]
    * expressions (r20: the HOF forms evaluated interpreted — m·ksub·ds
    * closure calls per corpus row — and dominated every PQ query). */
  private final case class PqParts(seeds: IndexedSeq[IndexedSeq[Long]],
                                   codesCol: Column,
                                   lutCol: Column,
                                   adist: Column)

  private def pqParts(q: DataFrame, m: Int, ksub: Int): PqParts = {
    require(m > 0 && ksub > 0)
    val seeds: IndexedSeq[IndexedSeq[Long]] = q
      .withColumn("h", md5(col("id").cast("string")))
      .orderBy("h", "id").limit(ksub)
      .select("qv").collect()
      .map(_.getSeq[Long](0).toIndexedSeq).toIndexedSeq
    require(seeds.size == ksub, s"corpus smaller than ksub=$ksub")
    // r19: the dimension comes off the seed rows this collect already
    // fetched — the seeded PQ paths used to pay a separate 1-row
    // dimension-probe job per query construction (guide §1.2 job count)
    val d = seeds.head.size
    require(d % m == 0, s"dimension $d not divisible by m=$m subspaces")
    val ds = d / m
    pqPartsFromCodebooks(seeds,
      (0 until m).map(j => seeds.map(_.slice(j * ds, j * ds + ds))), m, ds,
      ksub)
  }

  /** The PQ column machinery over EXPLICIT per-subspace codebooks
    * (`cbs(j)(c)` = codeword c of subspace j) — shared by the seeded
    * and the TRAINED forms. */
  private def pqPartsFromCodebooks(seeds: IndexedSeq[IndexedSeq[Long]],
                                   cbs: Seq[IndexedSeq[IndexedSeq[Long]]],
                                   m: Int, ds: Int, ksub: Int): PqParts = {
    // flat long[] reference object shipped once per task inside the
    // native expressions: cb((j*ksub + c)*ds + i)
    val flat = new Array[Long](m * ksub * ds)
    for (j <- 0 until m; c <- 0 until ksub; i <- 0 until ds)
      flat((j * ksub + c) * ds + i) = cbs(j)(c)(i)
    // ENCODE: per subspace, argmin over the codebook (ties -> lowest)
    val codesCol = GraftShim.column(graft.functions.PqEncode(
      GraftShim.expression(col("qv")), flat, m, ds, ksub)).as("codes")
    val lutCol = GraftShim.column(graft.functions.PqLut(
      GraftShim.expression(col("qv")), flat, m, ds, ksub)).as("lutf")
    // the ADC sum stays a plain codegen expression: m flat-LUT lookups
    // (1-based entry j*ksub + code + 1) — identical values to the old
    // per-subspace element_at(lut_j, c_j + 1)
    val adist = pqAdcSum(col("lutf"), j => element_at(col("codes"), j + 1),
      m, ksub)
    PqParts(seeds, codesCol, lutCol, adist)
  }

  /** Σ_j lutf[j·ksub + code_j + 1] — the ADC distance over the
    * flattened LUT; `codeOf(j)` supplies subspace j's code column. */
  private def pqAdcSum(lutf: Column, codeOf: Int => Column,
                       m: Int, ksub: Int): Column =
    (0 until m)
      .map(j => element_at(lutf, codeOf(j).cast("int") + lit(j * ksub + 1)))
      .reduce(_ + _)

  private def pqTopKSelect(scored: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("qid").orderBy(col("adist"), col("nid"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("qid"), col("nid"), col("adist"))
  }

  /** TRAINED per-subspace codebooks: one Lloyd run per subspace over
    * the corpus SUBVECTORS (the shared exact-integer trainer — micro
    * quantization, md5 seeds, truncating-division updates), so each
    * 4-dim subquantizer adapts to its own marginal distribution — the
    * real PQ index build. m·iters driver iterations, each an
    * aggregates-only job (the standard iterative-ML loop; never rows to
    * the driver). */
  private def pqTrainedParts(emb: DataFrame, idCol: String, vecCol: String,
                             d: Int, m: Int, ksub: Int,
                             iters: Int): PqParts = {
    require(m > 0 && ksub > 0 && iters > 0)
    require(d % m == 0, s"dimension $d not divisible by m=$m subspaces")
    val ds = d / m
    val cbs = (0 until m).map { j =>
      val sub = emb.select(col(idCol).as("__pq_id"),
        expr(s"slice($vecCol, ${j * ds + 1}, $ds)").as("__pq_sub"))
      trainKmeansOn(sub, "__pq_id", "__pq_sub", ksub, iters)
    }
    pqPartsFromCodebooks(IndexedSeq.empty, cbs, m, ds, ksub)
  }

  /** [[pqTopK]] with TRAINED codebooks ([[pqTrainedParts]]). */
  def pqTopKTrained(emb: DataFrame, idCol: String, vecCol: String,
                    queryPred: org.apache.spark.sql.Column, k: Int,
                    m: Int, ksub: Int, iters: Int): DataFrame = {
    require(k > 0)
    val q = microVecs(emb, idCol, vecCol)
    val d = emb.select(size(col(vecCol)).as("d")).head.getInt(0)
    val pq = pqTrainedParts(emb, idCol, vecCol, d, m, ksub, iters)
    val encoded = q.select(col("id"), pq.codesCol)
    val queries = q.filter(queryPred)
      .select(col("id").as("qid"), pq.lutCol)
    pqTopKSelect(
      broadcast(queries).join(encoded, col("qid") =!= col("id"))
        .select(col("qid"), col("id").as("nid"), pq.adist.as("adist")), k)
  }

  def pqTopK(emb: DataFrame, idCol: String, vecCol: String,
             queryPred: org.apache.spark.sql.Column, k: Int,
             m: Int, ksub: Int): DataFrame = {
    require(k > 0)
    val q = microVecs(emb, idCol, vecCol)
    val pq = pqParts(q, m, ksub)
    val encoded = q.select(col("id"), pq.codesCol)
    val queries = q.filter(queryPred)
      .select(col("id").as("qid"), pq.lutCol)
    pqTopKSelect(
      broadcast(queries).join(encoded, col("qid") =!= col("id"))
        .select(col("qid"), col("id").as("nid"), pq.adist.as("adist")), k)
  }

  /**
   * IVF + PQ — the production composition for web-scale ANN: a coarse
   * IVF quantizer restricts each query to its `nprobe` most-promising
   * cells (candidate REDUCTION — the corpus side shuffles once on the
   * cell key at index-build time and a probe touches `nprobe/nCells` of
   * the data), and WITHIN those cells scoring is PQ-ADC over the
   * compressed codes (memory reduction — candidates cost m lookups, no
   * full vector is fetched). This is the FAISS `IVFx,PQy` shape; both
   * stages are the deterministic seed-codebook forms, so the whole path
   * replays in SQL. Returns (qid, nid, adist), top `k` per query.
   */
  def ivfPqTopK(emb: DataFrame, idCol: String, vecCol: String,
                queryPred: org.apache.spark.sql.Column, k: Int,
                nCells: Int, nprobe: Int, m: Int, ksub: Int): DataFrame = {
    require(k > 0)
    val all = prep(emb, idCol, vecCol)
    val cents = buildIvfCentroids(emb, idCol, vecCol, nCells)
    val assigned = assignCells(all, cents).select(col("id"), col("cell"))
    val q = microVecs(emb, idCol, vecCol)
    val pq = pqParts(q, m, ksub)
    val encoded = q.select(col("id"), pq.codesCol)
      .join(assigned, Seq("id"))
    val qprobes = assignQueryCells(all.filter(queryPred), cents, nprobe)
      .select(col("id").as("qid"), col("cell"))
    val queries = q.filter(queryPred)
      .select(col("id").as("qid"), pq.lutCol)
      .join(qprobes, Seq("qid"))
    // (queries × nprobe) rows broadcast; the encoded corpus streams
    // through one hash join on the cell key — an item matches at most
    // once (it lives in exactly one cell)
    pqTopKSelect(
      encoded.join(broadcast(queries), Seq("cell"))
        .filter(col("qid") =!= col("id"))
        .select(col("qid"), col("id").as("nid"), pq.adist.as("adist")), k)
  }

  /** [[ivfPqTopK]] with TRAINED PQ codebooks ([[pqTrainedParts]]) inside
    * the cells — the full `IVFx,PQy(trained)` index build. The coarse
    * IVF quantizer DEFAULTS to the deterministic seed form (keeping the
    * PQ-training comparison the spec pins clean — which cells are
    * probed stays fixed); `coarseIters > 0` opts into a Lloyd-trained
    * coarse codebook too ([[kmeansCentroidTable]] — the
    * `IVFx(trained),PQy(trained)` build): tighter cells raise recall
    * per probe, at the cost of `coarseIters` extra aggregate-only
    * training passes at index-build time. */
  def ivfPqTopKTrained(emb: DataFrame, idCol: String, vecCol: String,
                       queryPred: org.apache.spark.sql.Column, k: Int,
                       nCells: Int, nprobe: Int, m: Int, ksub: Int,
                       iters: Int, coarseIters: Int = 0): DataFrame = {
    require(k > 0)
    require(coarseIters >= 0, "coarseIters must be non-negative")
    val all = prep(emb, idCol, vecCol)
    val cents =
      if (coarseIters == 0) buildIvfCentroids(emb, idCol, vecCol, nCells)
      else kmeansCentroidTable(emb, idCol, vecCol, nCells, coarseIters)
    val assigned = assignCells(all, cents).select(col("id"), col("cell"))
    val q = microVecs(emb, idCol, vecCol)
    val d = emb.select(size(col(vecCol)).as("d")).head.getInt(0)
    val pq = pqTrainedParts(emb, idCol, vecCol, d, m, ksub, iters)
    val encoded = q.select(col("id"), pq.codesCol)
      .join(assigned, Seq("id"))
    val qprobes = assignQueryCells(all.filter(queryPred), cents, nprobe)
      .select(col("id").as("qid"), col("cell"))
    val queries = q.filter(queryPred)
      .select(col("id").as("qid"), pq.lutCol)
      .join(qprobes, Seq("qid"))
    pqTopKSelect(
      encoded.join(broadcast(queries), Seq("cell"))
        .filter(col("qid") =!= col("id"))
        .select(col("qid"), col("id").as("nid"), pq.adist.as("adist")), k)
  }

  /**
   * PQ search with EXACT RE-RANK — the production two-stage shape: the
   * quantized index shortlists `shortlist` candidates per query by ADC
   * (cheap, RAM-resident codes), then ONLY those rows' full vectors are
   * fetched and re-scored exactly; quantization error affects which
   * rows make the shortlist, never the final ordering. At 100 TB the
   * full-vector fetch touches `queries × shortlist` rows instead of the
   * corpus — the re-rank side broadcasts while the corpus streams
   * through one hash join. Distances are exact squared L2 over the
   * micro-quantized vectors (BIGINT — replayable).
   *
   * Returns (qid, nid, d2) for the top `k` per query, ascending d2.
   */
  def pqRerankTopK(emb: DataFrame, idCol: String, vecCol: String,
                   queryPred: org.apache.spark.sql.Column, k: Int,
                   m: Int, ksub: Int, shortlist: Int): DataFrame = {
    require(shortlist >= k, "shortlist must be at least k")
    exactRerank(emb, idCol, vecCol, queryPred, k,
      pqTopK(emb, idCol, vecCol, queryPred, shortlist, m, ksub))
  }

  /** [[pqRerankTopK]] with TRAINED codebooks for the shortlist stage. */
  def pqRerankTopKTrained(emb: DataFrame, idCol: String, vecCol: String,
                          queryPred: org.apache.spark.sql.Column, k: Int,
                          m: Int, ksub: Int, shortlist: Int,
                          iters: Int): DataFrame = {
    require(shortlist >= k, "shortlist must be at least k")
    exactRerank(emb, idCol, vecCol, queryPred, k,
      pqTopKTrained(emb, idCol, vecCol, queryPred, shortlist, m, ksub, iters))
  }

  /** The exact second stage both rerank forms share: fetch ONLY the
    * shortlisted rows' full vectors and score them exactly (squared L2
    * over the micro-quantized vectors — replayable BIGINTs). */
  private def exactRerank(emb: DataFrame, idCol: String, vecCol: String,
                          queryPred: org.apache.spark.sql.Column, k: Int,
                          shortWithScores: DataFrame): DataFrame = {
    val short = shortWithScores.select("qid", "nid")
    val q = microVecs(emb, idCol, vecCol)
    val queries = q.filter(queryPred)
      .select(col("id").as("qid"), col("qv").as("qqv"))
    val corpus = q.select(col("id").as("nid"), col("qv").as("nv"))
    // (queries × shortlist) rows — tiny; broadcast against the corpus
    val withQ = short.join(broadcast(queries), Seq("qid"))
    val scored = corpus.join(broadcast(withQ), Seq("nid"))
      .select(col("qid"), col("nid"),
        vl2Long(col("qqv"), col("nv")).as("d2"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("qid").orderBy(col("d2"), col("nid"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("qid"), col("nid"), col("d2"))
  }

  /**
   * PQ ANN as a STREAM-SAFE enrichment: the corpus is PQ-encoded once
   * and its (id, codes) rows — m small codes per vector, the
   * RAM-resident form — are collapsed into ONE broadcast array; each
   * incoming query row computes its LUTs and folds the code array to
   * its top-k map-side. No shuffle, no window, no stateful op — pure
   * projections over a broadcast, so the SAME operator runs on a batch
   * frame or an append-mode stream (the serving-path shape: index in
   * RAM, queries arriving). Scale note: one executor holds all codes —
   * 16 bytes/vector means ~60 GB per billion vectors; past that, shard
   * the corpus into several broadcast arrays and merge the per-shard
   * top-k (same fold). Arithmetic is identical to [[pqTopK]] (exact
   * BIGINT ADC, self-matches excluded), so results are bit-equal.
   */
  def pqAnnEnrich(queries: DataFrame, idCol: String, vecCol: String,
                  corpus: DataFrame, corpusIdCol: String,
                  corpusVecCol: String, k: Int, m: Int,
                  ksub: Int): DataFrame = {
    require(k > 0)
    val cq = microVecs(corpus, corpusIdCol, corpusVecCol)
    enrichWithParts(queries, idCol, vecCol, cq, pqParts(cq, m, ksub), k,
      m, ksub)
  }

  /** [[pqAnnEnrich]] with TRAINED codebooks ([[pqTrainedParts]]) — the
    * serving-path form of the trained index: train + encode once from
    * the corpus, fold per query row; bit-equal to [[pqTopKTrained]]
    * (same arithmetic, same ordering). */
  def pqAnnEnrichTrained(queries: DataFrame, idCol: String, vecCol: String,
                         corpus: DataFrame, corpusIdCol: String,
                         corpusVecCol: String, k: Int, m: Int,
                         ksub: Int, iters: Int): DataFrame = {
    require(k > 0)
    val cq = microVecs(corpus, corpusIdCol, corpusVecCol)
    val d = corpus.select(size(col(corpusVecCol)).as("d")).head.getInt(0)
    enrichWithParts(queries, idCol, vecCol, cq,
      pqTrainedParts(corpus, corpusIdCol, corpusVecCol, d, m, ksub, iters),
      k, m, ksub)
  }

  /** The broadcast-fold body both enrich forms share. */
  private def enrichWithParts(queries: DataFrame, idCol: String,
                              vecCol: String, cq: DataFrame, pq: PqParts,
                              k: Int, m: Int, ksub: Int): DataFrame = {
    // ONE row holding every (id, codes) struct — the broadcast index
    val encodedArr = cq.select(col("id"), pq.codesCol)
      .select(struct(col("id"), col("codes")).as("e"))
      .agg(sort_array(collect_list(col("e"))).as("corpus"))
    val q = queries.select(col(idCol).cast("long").as("id"),
      expr(s"transform($vecCol, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT))")
        .as("qv"))
    val withLuts = q.select(col("id").as("qid"), pq.lutCol)
      .crossJoin(broadcast(encodedArr))
    // score every corpus entry with m lookups, sort, keep k — one fold
    // per query row; (adist, nid) struct order makes sort_array rank by
    // distance then id, exactly pqTopK's ordering
    val scored = transform(col("corpus"), c => struct(
      pqAdcSum(col("lutf"), j => element_at(c.getField("codes"), j + 1),
        m, ksub).as("adist"),
      c.getField("id").as("nid")))
    val kept = filter(scored, s => s.getField("nid") =!= col("qid"))
    withLuts
      .withColumn("__top", slice(sort_array(kept), 1, k))
      .select(col("qid"), posexplode(col("__top")).as(Seq("__rank", "s")))
      .select(col("qid"), col("s").getField("nid").as("nid"),
        col("s").getField("adist").as("adist"))
  }

  /**
   * SQ8 scalar-quantized ANN — the FAISS `ScalarQuantizer(QT_8bit)`
   * shape and the cheapest compressed index: each dimension is affinely
   * quantized to an 8-bit code against per-dimension corpus [min, max]
   * bounds. Training is ONE map-side-combined aggregate collecting 2·d
   * longs (vs PQ's Lloyd loop); the index is 1 byte/dimension (4×
   * smaller than float32). Scoring is asymmetric like PQ-ADC: the query
   * keeps its exact micro-quantized vector and each candidate is
   * reconstructed from its codes — all arithmetic stays in exact
   * integers (units of micro·255: `code = ((x-mn)·255) div rng`,
   * `dist = Σ ((x_q-mn)·255 - code·rng)²`), so the whole pipeline
   * replays bit-for-bit in SQL. Degenerate dimensions (mx == mn) code
   * to 0 and reconstruct exactly.
   *
   * 100-TB shape: bounds agg → 2·d longs on the driver → broadcast
   * literals; encoding is a shuffle-free per-row projection; queries
   * broadcast against the streamed coded corpus (same join shape as
   * [[pqTopK]]). Overflow bound: |micro·255| ≤ 2.6e8 for unit-scale
   * inputs, so a 64-dim squared sum stays ≤ ~1.7e19/4 « Long.Max.
   *
   * Returns (qid, nid, adist) — approximate squared L2 in (micro·255)²
   * units — for the top `k` per query, ascending.
   */
  /** The SQ8 column machinery: per-dimension corpus [min, max] bounds
    * from ONE aggregate (the whole "training"), then two projections of
    * a `qv` micro-vector column — `scaled` (the reconstructed candidate
    * in (micro·255) units: `code·rng` where
    * `code = ((x-mn)·255) div rng`, the pmod exact-integer idiom —
    * operands non-negative so truncation == floor, the double division
    * exact at ≤ ~5e8 « 2^53) and `qadj` (the exact query side,
    * `(x-mn)·255`). Asymmetric distance = Σ (qadj - scaled)². */
  private final case class Sq8Parts(scaled: Column, qadj: Column)

  private def sq8Parts(q: DataFrame, d: Int): Sq8Parts = {
    val boundsRow = q.select((0 until d).flatMap(i => Seq(
      min(element_at(col("qv"), i + 1)).as(s"mn$i"),
      max(element_at(col("qv"), i + 1)).as(s"mx$i"))): _*).head
    val mn: IndexedSeq[Long] = (0 until d).map(i => boundsRow.getLong(2 * i))
    val rng: IndexedSeq[Long] =
      (0 until d).map(i => boundsRow.getLong(2 * i + 1) - boundsRow.getLong(2 * i))
    val mnLit = typedLit(mn)
    val rngLit = typedLit(rng)
    val codes = zip_with(
      zip_with(col("qv"), mnLit, (x, m) => (x - m) * lit(255L)),
      rngLit,
      (s, r) => when(r === 0L, lit(0L))
        .otherwise(((s - pmod(s, r)) / r).cast("long")))
    Sq8Parts(
      scaled = zip_with(codes, rngLit, (c, r) => c * r),
      qadj = zip_with(col("qv"), mnLit, (x, m) => (x - m) * lit(255L)))
  }

  def sq8TopK(emb: DataFrame, idCol: String, vecCol: String,
              queryPred: org.apache.spark.sql.Column, k: Int): DataFrame = {
    require(k > 0)
    val q = microVecs(emb, idCol, vecCol)
    val d = emb.select(size(col(vecCol)).as("d")).head.getInt(0)
    val parts = sq8Parts(q, d)
    val encoded = q.select(col("id"), parts.scaled.as("scaled"))
    val queries = q.filter(queryPred)
      .select(col("id").as("qid"), parts.qadj.as("qadj"))
    pqTopKSelect(
      broadcast(queries).join(encoded, col("qid") =!= col("id"))
        .select(col("qid"), col("id").as("nid"),
          vl2Long(col("qadj"), col("scaled")).as("adist")), k)
  }

  /**
   * SQ8 ANN as a STREAM-SAFE enrichment — the serving-path twin of
   * [[sq8TopK]], shaped like [[pqAnnEnrich]]: the corpus is quantized
   * once and collapsed into ONE broadcast array of (id, scaled) rows;
   * each incoming query row computes its exact side and folds the array
   * to its top-k map-side — pure projections over a broadcast, so the
   * SAME operator runs on a batch frame or an append-mode stream.
   * Arithmetic is identical to sq8TopK (exact BIGINTs, self-matches
   * excluded), so results are bit-equal. Scale note: one executor holds
   * all scaled codes — 8·d bytes/vector; past RAM, shard the corpus
   * into several broadcast arrays and merge the per-shard top-k.
   */
  def sq8AnnEnrich(queries: DataFrame, idCol: String, vecCol: String,
                   corpus: DataFrame, corpusIdCol: String,
                   corpusVecCol: String, k: Int): DataFrame = {
    require(k > 0)
    val cq = microVecs(corpus, corpusIdCol, corpusVecCol)
    val d = corpus.select(size(col(corpusVecCol)).as("d")).head.getInt(0)
    val parts = sq8Parts(cq, d)
    val encodedArr = cq
      .select(struct(col("id"), parts.scaled.as("scaled")).as("e"))
      .agg(sort_array(collect_list(col("e"))).as("corpus"))
    val q = queries.select(col(idCol).cast("long").as("id"),
      expr(s"transform($vecCol, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT))")
        .as("qv"))
    val withQ = q.select(col("id").as("qid"), parts.qadj.as("qadj"))
      .crossJoin(broadcast(encodedArr))
    val scored = transform(col("corpus"), c => struct(
      aggregate(zip_with(col("qadj"), c.getField("scaled"),
          (a, b) => (a - b) * (a - b)),
        lit(0L), (acc, x) => acc + x).as("adist"),
      c.getField("id").as("nid")))
    val kept = filter(scored, s => s.getField("nid") =!= col("qid"))
    withQ
      .withColumn("__top", slice(sort_array(kept), 1, k))
      .select(col("qid"), posexplode(col("__top")).as(Seq("__rank", "s")))
      .select(col("qid"), col("s").getField("nid").as("nid"),
        col("s").getField("adist").as("adist"))
  }

  /** Two-stage SQ8 search: SQ8 shortlist, exact re-rank — the same
    * production shape as [[pqRerankTopK]] with the cheaper index. */
  def sq8RerankTopK(emb: DataFrame, idCol: String, vecCol: String,
                    queryPred: org.apache.spark.sql.Column, k: Int,
                    shortlist: Int): DataFrame = {
    require(shortlist >= k, "shortlist must be at least k")
    exactRerank(emb, idCol, vecCol, queryPred, k,
      sq8TopK(emb, idCol, vecCol, queryPred, shortlist))
  }

  /**
   * BINARY QUANTIZATION codes — the third member of the quantization
   * family (PQ, SQ8, BQ): one SIGN BIT per dimension, packed into
   * ceil(d/32) 32-bit words (32-bit ints keep both engines clear of the
   * BIGINT sign bit; XOR/bit_count are sign-agnostic so bit 31 of an
   * int is safe). 64-dim float vectors compress 256 bytes → 8: the
   * cheapest index FAISS ships, and the distance (Hamming = number of
   * differing signs) is pure integer bit arithmetic — exact
   * cross-engine by construction. Word w, bit b covers dimension
   * 32·w + b; set iff x > 0 (zeros code as 0 — the sign convention the
   * oracle replays as `x > 0`).
   */
  private def bqCodes(vec: Column, d: Int): Column = {
    val nWords = (d + 31) / 32
    val words = (0 until nWords).map { w =>
      val bits = math.min(32, d - w * 32)
      (0 until bits).foldLeft(lit(0)) { (acc, b) =>
        acc.bitwiseOR(
          when(element_at(vec, w * 32 + b + 1) > lit(0f),
            lit(1 << b)).otherwise(lit(0)))
      }
    }
    array(words: _*)
  }

  /**
   * Hamming top-k over binary-quantized vectors: queries (selected by
   * `queryPred`) broadcast against the packed corpus codes, distance =
   * one XOR + popcount fold over the word arrays (64 dims = 2 ints per
   * row), ties broken on neighbor id. Returns (qid, nid, hdist). The
   * production first stage of a two-stage search — see
   * [[bqRerankTopK]]; at 10⁹ vectors the code table is 8 GB where the
   * floats are 256 GB, which is the point.
   */
  def bqTopK(emb: DataFrame, idCol: String, vecCol: String,
             queryPred: org.apache.spark.sql.Column, k: Int): DataFrame = {
    require(k > 0)
    val d = emb.select(size(col(vecCol)).as("d")).head.getInt(0)
    val coded = emb.select(col(idCol).cast("long").as("id"),
      bqCodes(col(vecCol), d).as("code"))
    val queries = coded.filter(queryPred)
      .select(col("id").as("qid"), col("code").as("qcode"))
    // GOTCHA: Spark's bit_count SIGN-EXTENDS an int argument to long
    // before counting — a negative 32-bit XOR word would gain 32
    // phantom high bits. Mask to the unsigned 32-bit value first.
    val scored = broadcast(queries).join(coded, col("qid") =!= col("id"))
      .select(col("qid"), col("id").as("nid"),
        aggregate(zip_with(col("qcode"), col("code"),
            (a, b) => bit_count(a.bitwiseXOR(b).cast("long")
              .bitwiseAND(lit(0xFFFFFFFFL)))),
          lit(0L), (acc, x) => acc + x).as("hdist"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("qid").orderBy(col("hdist"), col("nid"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("qid"), col("nid"), col("hdist"))
  }

  /**
   * BQ ANN as a STREAM-SAFE enrichment — the broadcast-fold serving
   * twin of [[bqTopK]] ([[sq8AnnEnrich]]'s shape on the cheapest
   * index): the corpus is sign-packed ONCE and collapsed into one
   * broadcast array of (id, code) rows; each incoming query row packs
   * its own code and folds the array to its top-k map-side — pure
   * projections over a broadcast, so the SAME operator runs on a batch
   * frame or an append-mode stream, bit-equal to bqTopK (identical
   * masked XOR/popcount, same (hdist, nid) tie-break via the struct
   * sort). Scale note: one executor holds all codes — 4·ceil(d/32)
   * bytes/vector, ~1 GB per 10⁹ 64-dim vectors, the RAM-resident-index
   * point of BQ; past that, shard the corpus array and merge
   * per-shard top-k. */
  def bqAnnEnrich(queries: DataFrame, idCol: String, vecCol: String,
                  corpus: DataFrame, corpusIdCol: String,
                  corpusVecCol: String, k: Int): DataFrame = {
    require(k > 0)
    val d = corpus.select(size(col(corpusVecCol)).as("d")).head.getInt(0)
    val codedArr = corpus
      .select(struct(col(corpusIdCol).cast("long").as("id"),
        bqCodes(col(corpusVecCol), d).as("code")).as("e"))
      .agg(sort_array(collect_list(col("e"))).as("corpus"))
    val withQ = queries.select(col(idCol).cast("long").as("qid"),
        bqCodes(col(vecCol), d).as("qcode"))
      .crossJoin(broadcast(codedArr))
    val scored = transform(col("corpus"), c => struct(
      aggregate(zip_with(col("qcode"), c.getField("code"),
          (a, b) => bit_count(a.bitwiseXOR(b).cast("long")
            .bitwiseAND(lit(0xFFFFFFFFL)))),
        lit(0L), (acc, x) => acc + x).as("hdist"),
      c.getField("id").as("nid")))
    val kept = filter(scored, s => s.getField("nid") =!= col("qid"))
    withQ
      .withColumn("__top", slice(sort_array(kept), 1, k))
      .select(col("qid"), posexplode(col("__top")).as(Seq("__rank", "s")))
      .select(col("qid"), col("s").getField("nid").as("nid"),
        col("s").getField("hdist").as("hdist"))
  }

  /** Two-stage BQ search: Hamming shortlist, exact micro-integer L2
    * re-rank to the final k — the standard recall-recovery shape
    * ([[sq8RerankTopK]]'s twin on the cheaper index). */
  def bqRerankTopK(emb: DataFrame, idCol: String, vecCol: String,
                   queryPred: org.apache.spark.sql.Column, k: Int,
                   shortlist: Int): DataFrame = {
    require(shortlist >= k, "shortlist must be at least k")
    exactRerank(emb, idCol, vecCol, queryPred, k,
      bqTopK(emb, idCol, vecCol, queryPred, shortlist))
  }

  /**
   * MATRYOSHKA (prefix-dimension) two-stage search — the MRL serving
   * shape (Kusupati et al. 2022): embeddings trained with matryoshka
   * representation learning rank usefully under their first m
   * dimensions, so stage 1 scans only the m-dim PREFIX (exact
   * micro-integer L2 — m/d of the flat-scan cost, the dimensionality
   * analog of the SQ8/BQ code shrink) and stage 2 re-ranks the
   * shortlist at full dimension. Both stages are the exact-integer
   * envelope, so the whole search is SQL-replayable. When
   * `prefixDims = d`, stage 1 IS the exact search and the result is
   * invariant to the shortlist size (spec-pinned). */
  def matryoshkaTopK(emb: DataFrame, idCol: String, vecCol: String,
                     queryPred: org.apache.spark.sql.Column, k: Int,
                     prefixDims: Int, shortlist: Int): DataFrame = {
    require(k > 0 && shortlist >= k, "need k >= 1 and shortlist >= k")
    require(prefixDims >= 1, "prefixDims must be >= 1")
    val q = microVecs(emb, idCol, vecCol)
    val pre = q.select(col("id"), expr(s"slice(qv, 1, $prefixDims)").as("pv"))
    val queries = pre.filter(queryPred)
      .select(col("id").as("qid"), col("pv").as("qpv"))
    val scored = broadcast(queries).join(pre, col("qid") =!= col("id"))
      .select(col("qid"), col("id").as("nid"),
        aggregate(zip_with(col("qpv"), col("pv"), (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, x) => acc + x).as("adist"))
    exactRerank(emb, idCol, vecCol, queryPred, k, pqTopKSelect(scored, shortlist))
  }

  /**
   * Exact cosine RANGE search (FAISS `range_search` parity): every
   * corpus row whose cosine with the query is ≥ `minCos` — the
   * radius-based companion of [[cosineTopK]] (dedup wants "everything
   * closer than t", not a fixed k). Brute-force baseline: queries
   * broadcast, corpus streams through one map-side join — linear in
   * corpus size; the bucketed scale path is [[bucketNearPairs]].
   * Self-matches excluded. Returns (qid, nid, cos), cos as a
   * deterministic double (the sequential-fold dot both engines
   * reproduce).
   */
  def cosineRangeSearch(emb: DataFrame, idCol: String, vecCol: String,
                        queryPred: org.apache.spark.sql.Column,
                        minCos: Double): DataFrame = {
    val all = prep(emb, idCol, vecCol)
    val queries = all.filter(queryPred)
      .select(col("id").as("qid"), col("v").as("qv"),
        col("norm2").as("qnorm2"))
    broadcast(queries).join(all, col("qid") =!= col("id"))
      .filter(col("norm2") > 0 && col("qnorm2") > 0)
      .select(col("qid"), col("id").as("nid"),
        // EXACTLY cosineTopK's expression (sqrt(a)*sqrt(b), not
        // sqrt(a*b)) so thresholding and the oracle replay agree
        // bit-for-bit on the double
        (dotExpr / (sqrt(col("qnorm2")) * sqrt(col("norm2")))).as("cos"))
      .filter(col("cos") >= minCos)
      .select(col("qid"), col("nid"), round(col("cos"), 4).as("cos"))
  }

  def recallAtK(ann: DataFrame, exact: DataFrame): DataFrame = {
    val hits = ann.select(col("qid"), col("nid"))
      .join(exact.select(col("qid"), col("nid")), Seq("qid", "nid"))
      .groupBy("qid").agg(count(lit(1)).as("n_hit"))
    val totals = exact.groupBy("qid").agg(count(lit(1)).as("n_exact"))
    totals.join(hits, Seq("qid"), "left")
      .select(col("qid"),
        (coalesce(col("n_hit"), lit(0)).cast("double") / col("n_exact")).as("recall"))
      .agg(round(avg(col("recall")), 6).as("avg_recall"),
        count(lit(1)).as("n_queries"))
  }
}
