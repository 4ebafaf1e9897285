package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Curation

/** Semantics of the corpus-curation operators on hand-built frames (the
  * cur_* registry queries pin each against a DuckDB replay at sf0.01;
  * these cover edge semantics and the scale-shape plan assertions). */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("contaminationHits: only train docs sharing an eval shingle, distinct-counted") {
    import spark.implicits._
    val docs = Seq(
      (0L, "the quick brown fox jumps"),          // eval (id % 2 == 0 -> eval here)
      (1L, "the quick brown fox sleeps deeply"),  // train: shares 2 shingles
      (3L, "completely different text entirely"), // train: no overlap
      (5L, "quick brown fox jumps high")          // train: shares 2 shingles
    ).toDF("id", "text")
    val out = Curation.contaminationHits(docs, "id", "text",
      isEval = col("id") % 2 === 0, n = 3)
    val got = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // eval shingles: {the quick brown, quick brown fox, brown fox jumps}
    assert(got == Map(1L -> 2L, 5L -> 2L)) // doc 3 absent entirely
    // the eval side must be broadcast (tiny vs a 100 TB train corpus)
    assert(out.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
  }

  test("decontaminateSpans: islands merge, excision, full contamination, clean docs") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b c d e"),            // eval
      (1L, "x a b c d y z"),        // train: windows [a b c](2), [b c d](3) -> island [2,5]
      (3L, "a b c d e"),            // train: exact eval copy -> fully contaminated
      (5L, "p q r s t u")           // train: clean
    ).toDF("id", "text")
    val out = Curation.decontaminateSpans(docs, "id", "text",
      isEval = col("id") % 2 === 0, k = 3)
    val got = out.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1).toSeq
    assert(got === Seq(
      (1L, 7L, 4L, "x y z"),
      (3L, 5L, 5L, ""),
      (5L, 6L, 0L, "p q r s t u")))
    // the eval fingerprint set must broadcast
    assert(out.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
  }

  test("chunkFixed: overlap, short tail chunk, content hash") {
    import spark.implicits._
    // 10 tokens, chunkSize 4, stride 2 -> starts 0,2,4,6,8; last is short
    val docs = Seq((7L, "a b c d e f g h i j")).toDF("id", "text")
    val out = Curation.chunkFixed(docs, "id", "text", chunkSize = 4, stride = 2)
      .orderBy("chunk_idx").collect()
    assert(out.map(_.getInt(1)).toSeq == Seq(0, 1, 2, 3, 4))
    assert(out.map(_.getInt(2)).toSeq == Seq(4, 4, 4, 4, 2)) // tail = "i j"
    // chunk 1 covers tokens c d e f
    val expect = spark.sql("SELECT md5('c d e f')").collect()(0).getString(0)
    assert(out(1).getString(3) == expect)
  }

  test("chunkFixed: empty-token docs dropped, stride validated") {
    import spark.implicits._
    val docs = Seq((1L, "x")).toDF("id", "text")
    assert(Curation.chunkFixed(docs, "id", "text", 4, 2).count() == 1)
    intercept[IllegalArgumentException] {
      Curation.chunkFixed(docs, "id", "text", 4, 0)
    }
  }

  test("packOffsets: two-phase prefix sum equals the naive global cumsum") {
    import spark.implicits._
    // ids deliberately sparse/unsorted; partRange 4 forces several parts
    val docs = Seq(
      (9L, "a b c"), (2L, "x y z w v"), (14L, "q"), (0L, "m n"),
      (5L, "p q r s"), (11L, "t u")
    ).toDF("id", "text")
    val out = Curation.packOffsets(docs, "id", "text",
        binTokens = 4L, partRange = 4L)
      .orderBy("id").collect()
    // id order: 0(2) 2(5) 5(4) 9(3) 11(2) 14(1); exclusive prefix sums:
    val expOff = Seq(0L, 2L, 7L, 11L, 14L, 16L)
    assert(out.map(_.getAs[Long]("offset")).toSeq == expOff)
    // doc id=2: offset 2, 5 tokens -> occupies [2,6] -> bins 0..1, spans 2
    val d2 = out(1)
    assert(d2.getAs[Long]("bin") == 0L && d2.getAs[Long]("bin_end") == 1L
      && d2.getAs[Long]("spans") == 2L)
    // single-token doc at offset 16 -> bin 4, spans 1
    val d14 = out(5)
    assert(d14.getAs[Long]("bin") == 4L && d14.getAs[Long]("spans") == 1L)
  }

  test("packShuffled: hash-span two-phase sum equals the naive global " +
      "shuffle-order cumsum; salts draw independent layouts") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // (id, copy) rows with multiple copies per doc and varied lengths;
    // partSpan 2^55 forces up to 32 hash-span parts over 46 rows
    val docs = (0L until 20L).flatMap { i =>
      (0L to i % 3).map(c => (i, c, ("w " * (1 + (i % 5).toInt)).trim))
    }.toDF("id", "copy", "text")
    val out = Curation.packShuffled(docs, "id", "copy", "text",
      binTokens = 8L, partSpan = 1L << 55)
    val got = out.select("id", "copy", "offset").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // naive replay: ONE global window over the same 60-bit order key
    val hk = expr("CAST(conv(substring(md5(concat('ep_', CAST(id AS STRING)," +
      " '_', CAST(copy AS STRING))), 1, 15), 16, 10) AS BIGINT)")
    val naive = docs.select(col("id"), col("copy"),
        size(split(lower(col("text")), " ")).cast("long").as("n_toks"),
        hk.as("hk"))
      .withColumn("off", coalesce(
        sum(col("n_toks")).over(Window.orderBy("hk", "id", "copy")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Long]("off"))
      .toMap
    assert(got === naive)
    // copies of one doc scatter: doc 17's three copies are not adjacent
    // in the layout (the whole point vs packOffsets' id order)
    val offs17 = (0L to 2L).map(c => naive((17L, c))).sorted
    assert(offs17.sliding(2).exists(p => p(1) - p(0) > 3),
      s"doc 17 copies adjacent: $offs17")
    // a different salt draws a different layout
    val other = Curation.packShuffled(docs, "id", "copy", "text",
      binTokens = 8L, salt = "ep2", partSpan = 1L << 55)
      .select("id", "copy", "offset").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(other !== got)
    // NULL copy raises (silent three-valued hash decisions forbidden)
    val withNull = docs.withColumn("copy",
      when(col("id") === 7L, lit(null)).otherwise(col("copy")))
    val e = intercept[Exception] {
      Curation.packShuffled(withNull, "id", "copy", "text", 8L).collect()
    }
    assert(e.getMessage.contains("NULL copy"), e.getMessage)
  }

  test("packShuffled family equals a driver-side replay on random " +
      "corpora (property)") {
    import spark.implicits._
    // permanence insurance for the hash-span two-phase sum: placement
    // must match a pure-Scala replay on arbitrary shapes — random ids,
    // random copies, zero-token rows, random bin sizes and part spans
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String) = md.digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    Seq(5, 23, 77).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val rows = (0 until 40 + rnd.nextInt(60)).map { k =>
        (rnd.nextInt(1000).toLong, (k % 4).toLong, rnd.nextInt(5).toLong)
      }.distinctBy(r => (r._1, r._2))
      val binT = 1L + rnd.nextInt(16)
      val span = 1L << (40 + rnd.nextInt(20))
      val got = Curation.packShuffledByCount(rows.toDF("id", "copy", "n"),
          "id", "copy", "n", binT, partSpan = span)
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getAs[Long]("n_toks"), r.getAs[Long]("offset"),
            r.getAs[Long]("bin"), r.getAs[Long]("bin_end"))).toMap
      val ordered = rows.sortBy { case (i, c, _) =>
        (BigInt(md5hex(s"ep_${i}_$c").take(15), 16).toLong, i, c) }
      val offs = ordered.scanLeft(0L)((acc, r) => acc + r._3).init
      val want = ordered.zip(offs).map { case ((i, c, n), o) =>
        (i, c) -> (n, o, o / binT, math.max(o, o + n - 1) / binT) }.toMap
      assert(got === want, s"seed $seed diverged from the replay " +
        s"(binT=$binT, span=$span)")
    }
  }

  test("packShuffledByCount: bit-equal to packShuffled on whitespace " +
      "counts; zero rows occupy nothing; bad counts raise") {
    import spark.implicits._
    val docs = (0L until 15L).map(i =>
      (i, i % 2, ("t " * (1 + (i % 4).toInt)).trim)).toDF("id", "copy", "text")
    val withN = docs.withColumn("n",
      size(split(lower(col("text")), " ")).cast("long"))
    val a = Curation.packShuffled(docs, "id", "copy", "text", 4L,
      partSpan = 1L << 55).orderBy("id", "copy").collect().toSeq
    val b = Curation.packShuffledByCount(withN, "id", "copy", "n", 4L,
      partSpan = 1L << 55).orderBy("id", "copy").collect().toSeq
    assert(a === b)
    // a zero-count row keeps a placement row but shifts no offsets
    val withZero = withN.withColumn("n",
      when(col("id") === 3L, 0L).otherwise(col("n")))
    val z = Curation.packShuffledByCount(withZero, "id", "copy", "n", 4L,
      partSpan = 1L << 55)
    val zRows = z.collect().map(r => (r.getLong(0), r.getLong(1)) ->
      (r.getAs[Long]("n_toks"), r.getAs[Long]("bin"),
        r.getAs[Long]("bin_end"))).toMap
    assert(zRows((3L, 1L))._1 === 0L)
    assert(zRows((3L, 1L))._2 === zRows((3L, 1L))._3) // spans one bin
    assert(z.agg(sum("n_toks")).head.getLong(0) ===
      withN.filter(col("id") =!= 3L).agg(sum("n")).head.getLong(0))
    val e = intercept[Exception] {
      Curation.packShuffledByCount(
        withN.withColumn("n", col("n") - 10L), "id", "copy", "n", 4L)
        .collect()
    }
    assert(e.getMessage.contains("token counts"), e.getMessage)
    // fractional counts must RAISE, never cast-truncate (3.7 -> 3)
    val ef = intercept[Exception] {
      Curation.packShuffledByCount(
        withN.withColumn("n", col("n") + lit(0.7)), "id", "copy", "n", 4L)
        .collect()
    }
    assert(ef.getMessage.contains("integral"), ef.getMessage)
    // NULL counts raise with a READABLE diagnostic (not a null message)
    val en = intercept[Exception] {
      Curation.packShuffledByCount(
        withN.withColumn("n",
          when(col("id") === 2L, lit(null)).otherwise(col("n"))),
        "id", "copy", "n", 4L).collect()
    }
    assert(en.getMessage.contains("token counts") &&
      en.getMessage.contains("NULL"), en.getMessage)
  }

  test("packShuffledBins: every non-final bin holds exactly binTokens " +
      "tokens and the content hashes match a pure-Scala replay") {
    import spark.implicits._
    val docs = (0L until 20L).flatMap { i =>
      (0L to i % 3).map(c => (i, c, ("w" + i + " ") * (1 + (i % 5).toInt)))
    }.map(t => (t._1, t._2, t._3.trim)).toDF("id", "copy", "text")
    val bins = Curation.packShuffledBins(docs, "id", "copy", "text",
        binTokens = 8L, partSpan = 1L << 55)
      .orderBy("bin").collect()
    val totalToks = docs.select(
      sum(size(split(lower(col("text")), " ")))).head.getLong(0)
    assert(bins.map(_.getAs[Long]("n_toks")).sum === totalToks)
    assert(bins.map(_.getAs[Long]("bin")).toSeq ===
      (0L until bins.length.toLong))
    bins.init.foreach(b =>
      assert(b.getAs[Long]("n_toks") === 8L, s"short non-final bin $b"))
    // pure-Scala replay: rebuild the global shuffled token stream from
    // the same 60-bit hash order, cut it every 8 tokens, md5 each bin
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String) = md.digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val ordered = docs.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2).toLowerCase))
      .sortBy { case (i, c, _) =>
        (BigInt(md5hex(s"ep_${i}_$c").take(15), 16).toLong, i, c) }
    val stream = ordered.flatMap(_._3.split(" "))
    val want = stream.grouped(8).map(g => md5hex(g.mkString(" "))).toSeq
    assert(bins.map(_.getAs[String]("bin_md5")).toSeq === want)
  }

  test("multi-epoch packShuffled: bit-equal replay, per-salt layouts " +
      "independent, every epoch covers each doc exactly copies(doc) times") {
    import spark.implicits._
    val docs = (0L until 300L).map { i =>
      (i, (("w" + i + " ") * (1 + (i % 7).toInt)).trim,
        1500000L + (i % 3) * 700000L)
    }.toDF("id", "text", "wm")
    val epoch = Curation.upsampleByWeight(docs, "id", "wm")
    // the epoching draw is salt-independent ACROSS epochs when the
    // trainer holds the upsample salt fixed — copies(doc) is the
    // per-epoch coverage contract
    val copies = epoch.groupBy("id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def layout(salt: String) =
      Curation.packShuffled(epoch, "id", "copy", "text", binTokens = 16L,
          salt = salt, partSpan = 1L << 55)
        .collect()
        .map(r => ((r.getAs[Long]("id"), r.getAs[Long]("copy")),
          r.getAs[Long]("offset")))
    val l1 = layout("ep1")
    // identical under replay: the layout is a pure function of
    // (corpus, salt) — a resumed trainer re-derives the same bins
    assert(l1.sortBy(_._1).toSeq === layout("ep1").sortBy(_._1).toSeq)
    val l2 = layout("ep2")
    // coverage: each epoch places exactly the upsampled multiset — each
    // (id, copy) once, so each doc appears exactly copies(doc) times
    for (l <- Seq(l1, l2)) {
      assert(l.map(_._1).distinct.length === l.length)
      assert(l.map(_._1._1).groupBy(identity).view
        .mapValues(_.size.toLong).toMap === copies)
    }
    // independence: a fresh salt draws an unrelated shuffle — Spearman
    // rank correlation between the two epochs' global orders is near
    // zero (deterministic given the fixed salts, so safe to pin)
    val r1 = l1.sortBy(_._2).map(_._1).zipWithIndex.toMap
    val r2 = l2.sortBy(_._2).map(_._1).zipWithIndex.toMap
    val n = r1.size.toDouble
    val d2 = r1.map { case (k, a) =>
      val d = (a - r2(k)).toDouble; d * d }.sum
    val rho = 1.0 - 6.0 * d2 / (n * (n * n - 1))
    assert(math.abs(rho) < 0.2, s"epoch orders correlated: rho=$rho")
  }

  test("packShuffledBinsSegs: segment-grain streams replay exactly; " +
      "zero-segment rows occupy no bin; NULL segment arrays raise") {
    import spark.implicits._
    val docs = Seq(
      (0L, 0L, Seq("a", "b", "c")),
      (1L, 0L, Seq.empty[String]), // zero-token doc: placement only
      (2L, 0L, Seq("d", "e", "f", "g", "h")),
      (2L, 1L, Seq("d2", "e2")),
      (3L, 0L, Seq("i")),
      (4L, 0L, Seq("j", "k", "l", "m", "n", "o", "p"))
    ).toDF("id", "copy", "segs")
    val bins = Curation.packShuffledBinsSegs(docs, "id", "copy", "segs",
        binTokens = 4L, partSpan = 1L << 55)
      .orderBy("bin").collect()
    assert(bins.map(_.getAs[Long]("n_toks")).sum === 18L)
    assert(bins.map(_.getAs[Long]("bin")).toSeq ===
      (0L until bins.length.toLong))
    bins.init.foreach(b =>
      assert(b.getAs[Long]("n_toks") === 4L, s"short non-final bin $b"))
    // pure-Scala replay: hash order, global stream, cut every 4 tokens
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String) = md.digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val ordered = docs.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[String](2)))
      .sortBy { case (i, c, _) =>
        (BigInt(md5hex(s"ep_${i}_$c").take(15), 16).toLong, i, c) }
    val stream = ordered.flatMap(_._3)
    val want = stream.grouped(4).map(g => md5hex(g.mkString(" "))).toSeq
    assert(bins.map(_.getAs[String]("bin_md5")).toSeq === want)
    // n_frags counts only non-empty fragments: replay by intersecting
    // each doc's token interval with each bin's interval
    val offsets = ordered.scanLeft(0L)(_ + _._3.size).init
    val wantFrags = bins.indices.map { b =>
      ordered.zip(offsets).count { case ((_, _, s), off) =>
        s.nonEmpty && off < (b + 1) * 4L && off + s.size > b * 4L }.toLong
    }
    assert(bins.map(_.getAs[Long]("n_frags")).toSeq === wantFrags)
    // NULL segment arrays raise loudly
    val en = intercept[Exception] {
      Curation.packShuffledBinsSegs(
        docs.withColumn("segs",
          when(col("id") === 2L, lit(null)).otherwise(col("segs"))),
        "id", "copy", "segs", 4L).collect()
    }
    assert(en.getMessage.contains("NULL"), en.getMessage)
  }

  test("packShuffledBinsSegs randomized sweep: every (corpus, binTokens, " +
      "salt) draw matches the pure-Scala replay exactly (seed 47)") {
    import spark.implicits._
    val rnd = new scala.util.Random(47)
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String) = md.digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    for (trial <- 1 to 5) {
      val nDocs = 20 + rnd.nextInt(60)
      val binTokens = 3L + rnd.nextInt(14)
      val salt = s"fz$trial"
      // segment lengths 0..9 — zero-length rows land in every trial
      val rows = (0L until nDocs.toLong).map { i =>
        val copies = 1 + rnd.nextInt(2)
        (i, rnd.nextInt(copies).toLong,
          Seq.tabulate(rnd.nextInt(10))(j => s"t${i}_$j"))
      }.distinct
      val docs = rows.toDF("id", "copy", "segs")
      val got = Curation.packShuffledBinsSegs(docs, "id", "copy", "segs",
          binTokens, salt = salt, partSpan = 1L << 55)
        .orderBy("bin").collect()
        .map(r => (r.getAs[Long]("bin"), r.getAs[Long]("n_frags"),
          r.getAs[Long]("n_toks"), r.getAs[String]("bin_md5")))
      // replay: hash order, global stream, cut every binTokens
      val ordered = rows.sortBy { case (i, c, _) =>
        (BigInt(md5hex(s"${salt}_${i}_$c").take(15), 16).toLong, i, c) }
      val stream = ordered.flatMap(_._3)
      val offsets = ordered.scanLeft(0L)(_ + _._3.size).init
      val want = stream.grouped(binTokens.toInt).zipWithIndex.map {
        case (g, b) =>
          val frags = ordered.zip(offsets).count { case ((_, _, s), off) =>
            s.nonEmpty && off < (b + 1) * binTokens &&
              off + s.size > b * binTokens }
          (b.toLong, frags.toLong, g.size.toLong, md5hex(g.mkString(" ")))
      }.toSeq
      assert(got.toSeq === want,
        s"trial $trial (nDocs=$nDocs, binTokens=$binTokens) diverged")
    }
  }

  test("piiRedact masks email/ip/phone; piiCount counts matches") {
    import spark.implicits._
    val df = Seq(
      ("mail a.b+c@ex-ample.co.uk then 192.168.0.1 then 555-123-4567 end", 1, 1, 1),
      ("no pii here at all", 0, 0, 0),
      ("two mails x@y.io and z@w.ai", 2, 0, 0)
    ).toDF("t", "ne", "ni", "np")
    val out = df.select(
      Curation.piiRedact(col("t")).as("red"),
      Curation.piiCount(col("t"), Curation.EmailRe).as("ce"),
      Curation.piiCount(col("t"), Curation.Ipv4Re).as("ci"),
      Curation.piiCount(col("t"), Curation.PhoneRe).as("cp"),
      col("ne"), col("ni"), col("np")).collect()
    assert(out(0).getString(0) == "mail <EMAIL> then <IP> then <PHONE> end")
    assert(out(1).getString(0) == "no pii here at all")
    out.foreach { r =>
      assert(r.getInt(1) == r.getInt(4) && r.getInt(2) == r.getInt(5)
        && r.getInt(3) == r.getInt(6), r.toString)
    }
  }

  test("repetitionStats: dup-word and top-gram fractions, flag thresholds") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spam spam spam spam spam spam spam spam spam spam"), // all dup
      (2L, "a b c d e f g h i j") // all distinct, longest 2-gram 3/19 chars
    ).toDF("id", "text")
    val out = Curation.repetitionStats(docs, "id", "text")
      .orderBy("id").collect()
    val d1 = out(0)
    assert(d1.getAs[Double]("dup_word_frac") == 0.9) // 1 - 1/10
    // "spam spam" 2-gram appears 9x, 9*9/49 chars > 0.2 -> flagged
    assert(d1.getAs[Boolean]("flagged"))
    val d2 = out(1)
    assert(d2.getAs[Double]("dup_word_frac") == 0.0)
    assert(!d2.getAs[Boolean]("flagged"))
  }

  test("domainFilter: blocklisted hosts dropped via broadcast anti-join") {
    import spark.implicits._
    val docs = Seq(
      (1L, "https://bad.example.com/a/b"),
      (2L, "https://good.example.com/c"),
      (3L, "http://bad.example.com/x?y=1"),
      (4L, "https://also-good.io/")
    ).toDF("id", "url")
    val out = Curation.domainFilter(docs, "url", Seq("bad.example.com"))
    val kept = out.orderBy("id").collect()
    assert(kept.map(_.getLong(1)).toSeq == Seq(2L, 4L))
    assert(kept.map(_.getAs[String]("host")).toSeq ==
      Seq("good.example.com", "also-good.io"))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"))
  }

  test("mixDomains: exact bottleneck-capped per-group counts, deterministic") {
    import spark.implicits._
    // a: 30 rows, b: 10, c: 50 (unweighted -> dropped)
    val docs = ((0L until 30L).map(i => ("a", i)) ++
        (100L until 110L).map(i => ("b", i)) ++
        (200L until 250L).map(i => ("c", i))).toDF("g", "id")
    // W = 4; T = min(30*4/3, 10*4/1) = min(40, 40) = 40
    // keep: a = 40*3/4 = 30 (all of it), b = 40*1/4 = 10 (all of it)
    val out = Curation.mixDomains(docs, "g", "id", Map("a" -> 3, "b" -> 1))
    val counts = out.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("a" -> 30L, "b" -> 10L))
    // tighter bottleneck: b caps the total. W = 6; T = min(30*6/5,
    // 10*6/1) = min(36, 60) = 36 -> a keeps 30, b keeps 6
    val out2 = Curation.mixDomains(docs, "g", "id", Map("a" -> 5, "b" -> 1))
    val c2 = out2.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(c2 == Map("a" -> 30L, "b" -> 6L))
    // deterministic selection: same rows on a rerun, regardless of
    // partitioning (hash-of-id rank, not rand())
    val pick1 = out2.filter(col("g") === "b").select("id").collect()
      .map(_.getLong(0)).sorted.toSeq
    val pick2 = Curation.mixDomains(docs.repartition(7), "g", "id",
        Map("a" -> 5, "b" -> 1))
      .filter(col("g") === "b").select("id").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(pick1 == pick2 && pick1.size == 6)
  }

  test("mixDomains skew cutover: BIT-IDENTICAL rows, dominant group pre-cut") {
    import spark.implicits._
    // one dominant group (90% of rows) + two small ones
    val docs = ((0L until 9000L).map(i => ("big", i)) ++
        (10000L until 10500L).map(i => ("s1", i)) ++
        (20000L until 20500L).map(i => ("s2", i))).toDF("g", "id")
    val weights = Map("big" -> 2, "s1" -> 1, "s2" -> 1)
    val plain = Curation.mixDomains(docs, "g", "id", weights)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // the cutover path must select EXACTLY the same rows (the hash cut
    // sits strictly above the rank boundary by construction)
    val cut = Curation.mixDomains(docs, "g", "id", weights,
      skewCutover = Some(1000L))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(cut === plain)
    // ...and deterministically so under repartitioning
    val cut2 = Curation.mixDomains(docs.repartition(13), "g", "id", weights,
      skewCutover = Some(1000L))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(cut2 === plain)
    // the mixture itself: T = min(9000*4/2, 500*4/1) = 2000 →
    // big keeps 1000, s1/s2 keep 500 each
    val counts = cut.groupBy(_._1).view.mapValues(_.size).toMap
    assert(counts == Map("big" -> 1000, "s1" -> 500, "s2" -> 500))
  }

  test("mixDomainsByTokens: budget met or minimally crossed, deterministic") {
    import spark.implicits._
    // a: 10 docs x 10 tokens (100 total), b: 4 docs x 5 tokens (20 total)
    val docs = ((0L until 10L).map(i => ("a", i, Seq.fill(10)("w").mkString(" "))) ++
        (100L until 104L).map(i => ("b", i, Seq.fill(5)("w").mkString(" "))))
      .toDF("g", "id", "text")
    // W = 5; T = min(100*5/4, 20*5/1) = min(125, 100) = 100
    // budgets: a = 100*4/5 = 80 tokens, b = 100*1/5 = 20 tokens
    val out = Curation.mixDomainsByTokens(docs, "g", "id", "text",
      Map("a" -> 4, "b" -> 1))
    val toks = out.withColumn("t", size(split(col("text"), " ")))
      .groupBy("g").agg(sum("t").as("tok")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // 10-token docs tile the 80-token budget exactly; b keeps all 20
    assert(toks == Map("a" -> 80L, "b" -> 20L))
    // a budget that does not tile: the boundary doc is INCLUDED
    // (exclusive prefix < budget), so the kept mass minimally overshoots
    val out2 = Curation.mixDomainsByTokens(docs, "g", "id", "text",
      Map("a" -> 3, "b" -> 1))
    // W = 4; T = min(100*4/3, 20*4/1) = min(133, 80) = 80
    // budgets: a = 80*3/4 = 60 (tiles), b = 80*1/4 = 20 (all)
    val toks2 = out2.withColumn("t", size(split(col("text"), " ")))
      .groupBy("g").agg(sum("t").as("tok")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(toks2 == Map("a" -> 60L, "b" -> 20L))
  }

  test("mixDomainsByTokens skew cutover: BIT-IDENTICAL rows, dominant " +
      "group pre-cut") {
    import spark.implicits._
    // one dominant group (~90% of the token mass, variable doc lengths —
    // the cut must hold under non-uniform per-doc token counts) + two
    // small groups
    val docs = ((0L until 9000L).map(i =>
        ("big", i, Seq.fill((i % 7 + 1).toInt)("w").mkString(" "))) ++
        (10000L until 10500L).map(i =>
          ("s1", i, Seq.fill((i % 5 + 1).toInt)("w").mkString(" "))) ++
        (20000L until 20500L).map(i =>
          ("s2", i, Seq.fill((i % 3 + 1).toInt)("w").mkString(" "))))
      .toDF("g", "id", "text")
    val weights = Map("big" -> 2, "s1" -> 1, "s2" -> 1)
    val plain = Curation.mixDomainsByTokens(docs, "g", "id", "text", weights)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // the cutover path must select EXACTLY the same rows; the exact
    // underflow guard must stay silent (survivor mass covers the budget)
    val cut = Curation.mixDomainsByTokens(docs, "g", "id", "text", weights,
      skewCutover = Some(1000L))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(cut === plain)
    // ...and deterministically so under repartitioning, at the
    // strictest setting (every group cut)
    val cut2 = Curation.mixDomainsByTokens(docs.repartition(13), "g", "id",
        "text", weights, skewCutover = Some(1L))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(cut2 === plain)
    // sanity: the mixture actually trims the dominant group
    val kept = plain.count(_._1 == "big")
    assert(kept > 0 && kept < 9000)
  }

  test("resampleByWeight: extremes, monotonicity, rate, salt independence") {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    val n = 4000
    val docs = (0L until n.toLong).map(i => (i, s"d$i")).toDF("id", "t")
    def kept(wMicro: Long, salt: String = "rs"): Set[Long] =
      Curation.resampleByWeight(
          docs.withColumn("w", lit(wMicro)), "id", "w", salt)
        .select("id").collect().map(_.getLong(0)).toSet
    // probability extremes are exact, not approximate
    assert(kept(0L).isEmpty)
    assert(kept(1000000L).size === n)
    // per-row monotonicity: a higher weight keeps a SUPERSET (same hash,
    // higher threshold) — the property that makes weight sweeps coherent
    val k3 = kept(300000L); val k6 = kept(600000L)
    assert(k3.subsetOf(k6))
    // empirical rate within ±4 sigma of the binomial expectation
    def inBand(got: Int, p: Double): Unit = {
      val mu = n * p; val s4 = 4 * math.sqrt(n * p * (1 - p))
      assert(math.abs(got - mu) <= s4, s"rate $got vs $mu +- $s4")
    }
    inBand(k3.size, 0.3); inBand(k6.size, 0.6)
    // a new salt draws an INDEPENDENT sample: overlap near p^2, and
    // the decision is reproducible (same salt twice = same set)
    val k6b = kept(600000L, salt = "other")
    inBand((k6 & k6b).size, 0.36)
    assert(kept(600000L) === k6)
    // out-of-range weights fail loudly, never silently clamp
    val e = intercept[Exception](kept(1000001L))
    assert(e.getMessage.contains("weight_micro must be"), e.getMessage)
    // a FRACTIONAL weight (a 0..1 probability where micro units are
    // expected) raises instead of cast-truncating to 0 and silently
    // dropping the corpus
    val e2 = intercept[Exception] {
      Curation.resampleByWeight(
          docs.withColumn("w", lit(0.85)), "id", "w")
        .count()
    }
    assert(e2.getMessage.contains("integral micro-unit"), e2.getMessage)
  }

  test("upsampleByWeight: mass, monotonicity, resample degeneration, guards") {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    val n = 4000
    val docs = (0L until n.toLong).map(i => (i, s"d$i")).toDF("id", "t")
    def copies(wMicro: Long, salt: String = "us"): Map[Long, Long] =
      Curation.upsampleByWeight(
          docs.withColumn("w", lit(wMicro)), "id", "w", salt)
        .groupBy("id").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // whole weights are exact replication, copy indexes 0..k-1
    assert(copies(2000000L).values.toSet === Set(2L))
    val idx = Curation.upsampleByWeight(
        docs.withColumn("w", lit(3000000L)), "id", "w")
      .groupBy("id")
      .agg(org.apache.spark.sql.functions.collect_set("copy").as("c"))
      .head().getAs[Seq[Long]]("c").toSet
    assert(idx === Set(0L, 1L, 2L))
    // expected mass: 2.5e6 micro -> ~2.5 copies per doc (±4 sigma)
    val m25 = copies(2500000L)
    assert(m25.values.forall(c => c == 2L || c == 3L))
    val total = m25.values.sum.toDouble
    assert(math.abs(total - 2.5 * n) <= 4 * math.sqrt(n * 0.25),
      s"mass $total vs ${2.5 * n}")
    // per-row monotone in the weight — a raise never removes a copy
    val lo = copies(1900000L); val hi = copies(2100000L)
    assert(lo.keySet.forall(k => lo(k) <= hi(k)))
    // below 1e6 it IS resampleByWeight (same salt, same hash draw)
    val up = copies(600000L, salt = "z1").keySet
    val rs = Curation.resampleByWeight(
        docs.withColumn("w", lit(600000L)), "id", "w", salt = "z1")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(up === rs)
    // guards: fractional and absurd weights raise, copy column refused
    val e = intercept[Exception](copies(1000000000001L))
    assert(e.getMessage.contains("micro-unit"), e.getMessage)
    val e2 = intercept[Exception] {
      Curation.upsampleByWeight(
        docs.withColumn("w", lit(1.5)), "id", "w").count()
    }
    assert(e2.getMessage.contains("integral micro-unit"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException](
      Curation.upsampleByWeight(
        docs.withColumn("w", lit(1L)).withColumn("copy", lit(1)),
        "id", "w"))
    assert(e3.getMessage.contains("copy"), e3.getMessage)
  }

  test("splitByHash: stability under growth, rates, loud weight check") {
    import spark.implicits._
    val fr = Seq("train" -> 800000L, "val" -> 100000L, "test" -> 100000L)
    def splits(n: Int): Map[Long, String] =
      Curation.splitByHash(
          (0L until n.toLong).map(i => (i, s"d$i")).toDF("id", "t"), "id", fr)
        .select("id", "split").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    // THE property: a row's split never moves when the corpus grows —
    // the small corpus's assignments are a restriction of the large one
    val s1 = splits(500); val s4 = splits(4000)
    assert(s1.forall { case (id, l) => s4(id) == l })
    // every label lands, rates within ±4 sigma of the weights
    val n = 4000
    def inBand(got: Int, p: Double): Unit = {
      val mu = n * p; val band = 4 * math.sqrt(n * p * (1 - p))
      assert(math.abs(got - mu) <= band, s"rate $got vs $mu +- $band")
    }
    inBand(s4.values.count(_ == "train"), 0.8)
    inBand(s4.values.count(_ == "val"), 0.1)
    inBand(s4.values.count(_ == "test"), 0.1)
    // weights that don't sum to 1e6 are refused at construction
    val e = intercept[IllegalArgumentException](
      Curation.splitByHash(Seq((1L, "x")).toDF("id", "t"), "id",
        Seq("a" -> 500000L, "b" -> 400000L)))
    assert(e.getMessage.contains("sum to 1000000"), e.getMessage)
  }

  test("lineDedup: cross-doc keep-first, within-doc dupes, order kept") {
    import spark.implicits._
    // 2-token lines. doc 1: [a b][c d][a b] — its OWN later dup drops.
    // doc 2: [c d][e f] — "c d" already seen in doc 1 -> drops.
    val docs = Seq((1L, "a b c d a b"), (2L, "c d e f")).toDF("id", "text")
    val out = Curation.lineDedup(docs, "id", "text", lineTokens = 2)
      .orderBy("id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getString(3))).toSeq === Seq(
      (1L, 3L, 2L, "a b c d"),
      (2L, 2L, 1L, "e f")))
    // determinism under different partitioning
    val out2 = Curation.lineDedup(docs.repartition(5), "id", "text", 2)
      .orderBy("id").collect().map(_.getString(3)).toSeq
    assert(out2 === Seq("a b c d", "e f"))
  }

  test("hashedBigramScore: bounded weights, <2-token docs absent") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta gamma"), (2L, "single"), (3L, ""))
      .toDF("id", "text")
    val out = graft.operators.TextAnalysis
      .hashedBigramScore(docs, "id", "text", buckets = 16, seed = "t")
      .collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L)) // docs 2, 3 absent
    val r = out.head
    assert(r.getLong(1) == 2L) // alpha_beta, beta_gamma
    assert(math.abs(r.getLong(2)) <= 2000L) // each weight in [-1000, 1000]
  }

  test("canonicalizeUrl: edge cases the fixture corpus can't synthesize") {
    import spark.implicits._
    val cases = Seq(
      // dangling '&' repair keys on the FIRST separator, not the last
      ("https://a.com/p?utm_source=x&id=1&x=2", "https://a.com/p?id=1&x=2"),
      // all params tracking -> query gone entirely
      ("https://a.com/p?utm_a=1&gclid=2", "https://a.com/p"),
      // path case preserved; only scheme://host lowercases
      ("HTTPS://A.COM/CaseSensitive/Path", "https://a.com/CaseSensitive/Path"),
      // default port dropped only for the matching scheme
      ("https://a.com:443/p", "https://a.com/p"),
      ("http://a.com:80/p", "http://a.com/p"),
      ("https://a.com:8443/p", "https://a.com:8443/p"),
      ("http://a.com:8080/p", "http://a.com:8080/p"),
      // bare host with default port and nothing after it
      ("https://a.com:443", "https://a.com"),
      // fragment-only junk; no query at all
      ("https://a.com/p#section", "https://a.com/p"),
      // utm value containing '#'-free special chars
      ("https://a.com/p?utm_source=a%20b&q=1", "https://a.com/p?q=1"),
      // no scheme at all: prefix extract misses, string passes through
      ("not a url", "not a url"))
    val got = cases.map(_._1).toDF("url")
      .select(Curation.canonicalizeUrl(col("url")))
      .collect().map(_.getString(0)).toSeq
    got.zip(cases).foreach { case (g, (in, want)) =>
      assert(g === want, s"input: $in") }
  }

  test("packOffsets skew guard: a part over maxPartRows raises and names " +
      "packShuffled; packShuffled packs the same clustered ids fine") {
    import spark.implicits._
    import graft.operators.Curation
    // every id inside ONE default 2^20 id-range part — the raw-crawl
    // clustered shape the r18 pack_skew block measures
    val docs = (1L to 50L).map(i => (i, "a b c")).toDF("id", "text")
    val e = intercept[Exception](
      Curation.packOffsets(docs, "id", "text", binTokens = 8L,
        maxPartRows = 10L).collect())
    assert(e.getMessage.contains("packShuffled"), e.getMessage)
    // the default cap (2^27) is far above any sane per-part bound at
    // test scale — the guard is inert on healthy inputs
    assert(Curation.packOffsets(docs, "id", "text", 8L).count() === 50L)
    // hash-span parts are uniform by construction: the SAME clustered
    // ids pack under packShuffled with a 10-row-per-part economy intact
    val shuffled = Curation.packShuffled(
      docs.withColumn("cp", org.apache.spark.sql.functions.lit(0L)),
      "id", "cp", "text", binTokens = 8L, partSpan = 1L << 55)
    assert(shuffled.count() === 50L)
  }

  test("bloom filter: zero false negatives, fold ≡ join probe, guards") {
    import spark.implicits._
    val bits = 4096L; val k = 4; val seed = "bt"
    val members = (0L until 200L).map(i => s"member_$i").toDF("key")
    val filt = Curation.bloomBuild(members, "key", bits, k, seed)
    filt.cache()
    // word values are 32-bit masks — the sign bit is never touched
    assert(filt.filter(col("word") < 0L || col("word") >= (1L << 32))
      .count() === 0L)
    val probes = (0L until 500L).map(i => s"member_$i").toDF("key")
    val probed = Curation.bloomProbe(probes, "key", filt, bits, k, seed)
    // no false negatives: every built member must hit
    assert(probed.join(members, "key").filter(!col("bloom_hit"))
      .count() === 0L)
    // fold twin is bit-equal to the join form on every probed key
    val bf = Curation.collectBloom(filt, bits, k, seed)
    val fold = probes.select(col("key"),
      Curation.bloomMaybeContains(col("key"), bf).as("fh"))
    assert(probed.join(fold, "key").filter(col("bloom_hit") =!= col("fh"))
      .count() === 0L)
    // at this load (800 of 4096 bits) SOME non-member must miss — the
    // filter is not saturated into all-true
    assert(probed.filter(!col("bloom_hit")).count() > 0L)
    filt.unpersist()
    // guards: NULL key raises loudly; bad parameters refuse
    val nullKey = Seq((1L, null: String)).toDF("id", "key")
    val err = intercept[Exception](
      Curation.bloomBuild(nullKey, "key", bits, k, seed).collect())
    assert(err.getMessage.contains("NULL key"), err.getMessage)
    intercept[IllegalArgumentException](
      Curation.bloomBuild(members, "key", 100L, k, seed)) // not mult of 32
    intercept[IllegalArgumentException](
      Curation.bloomBuild(members, "key", bits, 17, seed)) // k too high
    intercept[IllegalArgumentException](
      Curation.collectBloom(filt, 1L << 29, k, seed)) // collect cap
  }

  test("bloom filter persistence: save/load round-trip is bit-equal; " +
      "empty load raises") {
    import spark.implicits._
    val bits = 2048L; val k = 3; val seed = "pers"
    val keys = (0L until 100L).map(i => s"k_$i").toDF("key")
    val bf = Curation.collectBloom(
      Curation.bloomBuild(keys, "key", bits, k, seed), bits, k, seed)
    val dir = s"/tmp/graft_bloom_persist_${java.util.UUID.randomUUID()}"
    try {
      Curation.saveBloom(spark, bf, dir)
      val loaded = Curation.loadBloom(spark, dir)
      assert(loaded === bf)
      // probing the loaded filter is bit-equal on members AND non-members
      val probes = (0L until 200L).map(i => s"k_$i").toDF("key")
      val a = probes.select(col("key"),
        Curation.bloomMaybeContains(col("key"), bf).as("h")).collect()
        .map(r => r.getString(0) -> r.getBoolean(1)).toMap
      val b = probes.select(col("key"),
        Curation.bloomMaybeContains(col("key"), loaded).as("h")).collect()
        .map(r => r.getString(0) -> r.getBoolean(1)).toMap
      assert(a === b)
      // an empty save carries no parameter stamps — load refuses loudly
      val emptyDir = s"/tmp/graft_bloom_empty_${java.util.UUID.randomUUID()}"
      Curation.saveBloom(spark,
        Curation.BloomFilter(Map.empty, bits, k, seed), emptyDir)
      val e = intercept[IllegalArgumentException](
        Curation.loadBloom(spark, emptyDir))
      assert(e.getMessage.contains("no rows"), e.getMessage)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("mergeBloom ≡ build over the union; bloomStats saturation; guards") {
    import spark.implicits._
    val bits = 2048L; val k = 3; val seed = "mg"
    val a = (0L until 80L).map(i => s"a_$i").toDF("key")
    val b = (0L until 80L).map(i => s"b_$i").toDF("key")
    def bf(df: org.apache.spark.sql.DataFrame) = Curation.collectBloom(
      Curation.bloomBuild(df, "key", bits, k, seed), bits, k, seed)
    val merged = Curation.mergeBloom(bf(a), bf(b))
    val whole = bf(a.unionByName(b))
    assert(merged === whole) // OR of ORs — exact, not approximate
    intercept[IllegalArgumentException](Curation.mergeBloom(bf(a),
      Curation.BloomFilter(Map.empty, bits, k, "other")))
    // stats: fill matches a scala popcount of the words; estimate sane
    val filt = Curation.bloomBuild(a, "key", bits, k, seed)
    val st = Curation.bloomStats(filt, bits, k).collect()(0)
    val setBits = bf(a).words.values.map(java.lang.Long.bitCount(_).toLong).sum
    assert(st.getAs[Long]("n_set_bits") === setBits)
    assert(st.getAs[Long]("fill_micro") === setBits * 1000000L / bits)
    val est = st.getAs[Double]("fp_rate_est")
    assert(est > 0.0 && est < 1.0)
  }

  test("bloom filter: false positives possible at high load, one-sided") {
    import spark.implicits._
    // saturate a tiny filter so false positives provably occur — and
    // verify the gate errs ONLY toward over-dropping (a non-member can
    // hit, a member can never miss)
    val bits = 64L; val k = 2; val seed = "sat"
    val members = (0L until 40L).map(i => s"m_$i").toDF("key")
    val filt = Curation.bloomBuild(members, "key", bits, k, seed)
    val nonMembers = (0L until 40L).map(i => s"x_$i").toDF("key")
    val fp = Curation.bloomProbe(nonMembers, "key", filt, bits, k, seed)
      .filter(col("bloom_hit")).count()
    assert(fp > 0L, "expected false positives on a saturated 64-bit filter")
    val fn = Curation.bloomProbe(members, "key", filt, bits, k, seed)
      .filter(!col("bloom_hit")).count()
    assert(fn === 0L)
  }

  test("corpusReport: exact nearest-rank percentiles, dup fraction, guards") {
    import spark.implicits._
    val docs = Seq(
      (1L, "g1", "a"),
      (2L, "g1", "a b"),
      (3L, "g1", "a b c"),
      (4L, "g1", "a b c d"),
      (5L, "g1", "a b"),   // duplicate text of doc 2
      (6L, "g2", "x y z")
    ).toDF("id", "grp", "text")
    val out = Curation.corpusReport(docs, "id", "text", Seq("grp"))
      .collect().map(r => r.getString(0) -> r).toMap
    val g1 = out("g1")
    // counts sorted: 1,2,2,3,4 — p50 rank (5·50+99)//100 = 3 → 2;
    // p95 rank (5·95+99)//100 = 5 → 4
    assert(g1.getAs[Long]("n_docs") === 5L)
    assert(g1.getAs[Long]("n_tokens") === 12L)
    assert(g1.getAs[Long]("tok_min") === 1L)
    assert(g1.getAs[Long]("tok_p50") === 2L)
    assert(g1.getAs[Long]("tok_p95") === 4L)
    assert(g1.getAs[Long]("tok_max") === 4L)
    assert(g1.getAs[Long]("mean_tok_micro") === 2400000L)
    assert(g1.getAs[Long]("n_distinct_texts") === 4L)
    assert(g1.getAs[Long]("dup_frac_micro") === 200000L)
    // singleton group: both percentile ranks resolve to the one row
    val g2 = out("g2")
    assert(g2.getAs[Long]("tok_p50") === 3L && g2.getAs[Long]("tok_p95") === 3L)
    assert(g2.getAs[Long]("dup_frac_micro") === 0L)
    intercept[IllegalArgumentException](
      Curation.corpusReport(docs, "id", "text", Nil))
  }

  test("expectations: mixed verdicts, one-pass row checks, guards") {
    import spark.implicits._
    import graft.operators.Expectations
    val df = Seq(
      (1L, "a", 10.0, "ok"),
      (2L, "b", -5.0, "ok"),   // range violation
      (2L, "c", 20.0, "bad"),  // dup id, set violation
      (4L, null, 30.0, "ok")   // null name
    ).toDF("id", "name", "score", "status")
    val dim = Seq(1L, 2L).toDF("id") // 4 is a dangling FK
    val out = Expectations.validate(df, Seq(
      Expectations.NotNull("name_nn", "name"),
      Expectations.InRange("score_rng", "score", lit(0.0), lit(25.0)),
      Expectations.Matches("status_re", "status", "^[a-z]+$"),
      Expectations.InSet("status_set", "status", Seq("ok")),
      Expectations.Unique("id_uniq", Seq("id")),
      Expectations.RefIntegrity("id_fk", Seq("id"), dim, Seq("id"))))
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(out("name_nn") === (("not_null", 4L, 1L, false)))
    assert(out("score_rng") === (("in_range", 4L, 2L, false))) // -5, 30
    assert(out("status_re") === (("matches", 4L, 0L, true)))
    assert(out("status_set") === (("in_set", 4L, 1L, false)))
    assert(out("id_uniq") === (("unique", 4L, 1L, false)))
    assert(out("id_fk") === (("ref_integrity", 4L, 1L, false)))
    // guards
    intercept[IllegalArgumentException](Expectations.validate(df, Nil))
    intercept[IllegalArgumentException](Expectations.validate(df, Seq(
      Expectations.NotNull("x", "name"), Expectations.NotNull("x", "status"))))
    intercept[IllegalArgumentException](Expectations.validate(df, Seq(
      Expectations.RefIntegrity("bad", Seq("id", "name"), dim, Seq("id")))))
    // NULL FK components are SKIPPED (SQL FK semantics), not violations
    val withNullKey = Seq((Some(1L), "a"), (None: Option[Long], "b"))
      .toDF("id", "name")
    val fk = Expectations.validate(withNullKey, Seq(
      Expectations.RefIntegrity("fk", Seq("id"), dim, Seq("id"))))
      .collect()(0)
    assert(fk.getLong(2) === 1L && fk.getLong(3) === 0L) // 1 evaluated, 0 bad
  }
}
