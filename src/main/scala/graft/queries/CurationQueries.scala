package graft.queries

import Registry._
import graft.operators.Curation
import org.apache.spark.sql.functions._

/**
 * Corpus-curation queries over the `documents` table, exercising every
 * operator in [[graft.operators.Curation]]: benchmark decontamination,
 * fixed-token chunking, sequence packing (two-phase distributed prefix
 * sum), PII redaction, Gopher-style repetition stats, and domain
 * blocklist filtering. Each query carries a bit-exact DuckDB oracle that
 * replays the algorithm independently (the packing oracle deliberately
 * uses the NAIVE single-window prefix sum — proving the two-phase
 * distributed form computes the identical answer).
 *
 * PII / URL inputs are constructed deterministically from testdata
 * columns (the corpus itself contains no emails/IPs/URLs), identically
 * on both engines, so the regex/parse paths are genuinely exercised.
 */
object CurationQueries {

  // ---- benchmark decontamination -------------------------------------

  /** Eval set = every 17th doc; hits = distinct 3-gram shingles a train
    * doc shares with ANY eval doc. The eval shingle set is broadcast. */
  private val decontaminateOracle =
    """WITH toks AS (
      |  SELECT doc_id AS id, string_split(lower(text), ' ') AS w FROM documents
      |),
      |shi AS (
      |  SELECT id, w, unnest(generate_series(1, len(w) - 2)) AS i FROM toks WHERE len(w) >= 3
      |),
      |sh AS (
      |  SELECT DISTINCT id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS sh FROM shi
      |),
      |evalsh AS (SELECT DISTINCT sh FROM sh WHERE id % 17 = 0),
      |trainsh AS (SELECT id, sh FROM sh WHERE id % 17 <> 0)
      |SELECT t.id AS id, COUNT(*) AS n_hits
      |FROM trainsh t JOIN evalsh e ON t.sh = e.sh
      |GROUP BY t.id ORDER BY id""".stripMargin

  val curDecontaminate = dfQ("cur_decontaminate", decontaminateOracle) { (s, _) =>
    Curation.contaminationHits(s.table("documents"), "doc_id", "text",
        isEval = col("doc_id") % 17 === 0, n = 3)
      .orderBy("id")
  }

  /** SPAN-grain decontamination ([[Curation.decontaminateSpans]]): the
    * same eval split (every 17th doc), but contaminated 3-token windows
    * are MERGED into islands per train doc, counted, and excised — the
    * oracle replays fingerprints, the broadcast semi-join, the
    * gaps-and-islands merge and the reassembly. */
  val curDecontaminateSpans = dfQ("cur_decontaminate_spans",
    """WITH t0 AS (SELECT doc_id AS id, string_split(lower(text), ' ') AS w
      |            FROM documents),
      |ev AS (SELECT DISTINCT md5(array_to_string(t.w[i.i:i.i+2], ' ')) AS h
      |       FROM t0 t CROSS JOIN LATERAL
      |         (SELECT unnest(generate_series(1, len(t.w) - 2)) AS i) i
      |       WHERE t.id % 17 = 0),
      |t AS (SELECT * FROM t0 WHERE id % 17 <> 0),
      |wins AS (
      |  SELECT t.id, i.i AS pos,
      |         md5(array_to_string(t.w[i.i:i.i+2], ' ')) AS h
      |  FROM t CROSS JOIN LATERAL
      |    (SELECT unnest(generate_series(1, len(t.w) - 2)) AS i) i
      |),
      |iv AS (SELECT w.id, w.pos AS s, w.pos + 2 AS e
      |       FROM wins w JOIN ev USING (h)),
      |mrg AS (SELECT id, s, e,
      |          MAX(e) OVER (PARTITION BY id ORDER BY s, e
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
      |        FROM iv),
      |isl AS (SELECT id, g, MIN(s) AS s, MAX(e) AS e FROM (
      |          SELECT id, s, e,
      |            SUM(CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END)
      |              OVER (PARTITION BY id ORDER BY s, e
      |                ROWS UNBOUNDED PRECEDING) AS g
      |          FROM mrg) GROUP BY id, g),
      |toksq AS (SELECT t.id, i.i AS pos, t.w[i.i] AS tok
      |          FROM t CROSS JOIN LATERAL
      |            (SELECT unnest(generate_series(1, len(t.w))) AS i) i),
      |kept AS (SELECT k.id, k.pos, k.tok FROM toksq k
      |         WHERE NOT EXISTS (SELECT 1 FROM isl
      |           WHERE isl.id = k.id AND k.pos BETWEEN isl.s AND isl.e)),
      |res AS (SELECT id, string_agg(tok, ' ' ORDER BY pos) AS txt
      |        FROM kept GROUP BY id),
      |agg AS (SELECT id, CAST(SUM(e - s + 1) AS BIGINT) AS n_contam
      |        FROM isl GROUP BY id)
      |SELECT t.id AS doc_id, CAST(len(t.w) AS BIGINT) AS n_toks,
      |  COALESCE(agg.n_contam, CAST(0 AS BIGINT)) AS n_contam_toks,
      |  COALESCE(res.txt, '') AS text_clean
      |FROM t LEFT JOIN agg ON agg.id = t.id LEFT JOIN res ON res.id = t.id
      |ORDER BY doc_id""".stripMargin) { (s, _) =>
    Curation.decontaminateSpans(s.table("documents"), "doc_id", "text",
        isEval = col("doc_id") % 17 === 0, k = 3)
      .select(col("id").as("doc_id"), col("n_toks"), col("n_contam_toks"),
        col("text_clean"))
      .orderBy("doc_id")
  }

  // ---- fixed-token chunking -------------------------------------------

  /** 16-token chunks every 8 tokens (overlapping); hash pins content. */
  private val chunkOracle =
    """WITH toks AS (
      |  SELECT doc_id AS id, string_split(lower(text), ' ') AS w FROM documents
      |),
      |u AS (
      |  SELECT id, w, unnest(generate_series(0, len(w) - 1, 8)) AS s
      |  FROM toks WHERE len(w) > 0
      |)
      |SELECT id, CAST(s // 8 AS INT) AS chunk_idx,
      |  CAST(len(list_slice(w, s + 1, s + 16)) AS INT) AS n_toks,
      |  md5(array_to_string(list_slice(w, s + 1, s + 16), ' ')) AS chunk_hash
      |FROM u ORDER BY id, chunk_idx""".stripMargin

  val curChunk = dfQ("cur_chunk", chunkOracle) { (s, _) =>
    Curation.chunkFixed(s.table("documents"), "doc_id", "text",
        chunkSize = 16, stride = 8)
      .orderBy("id", "chunk_idx")
  }

  // ---- sequence packing ----------------------------------------------

  /** partRange=32 forces many parts at sf0.01 so phase 1 (per-part
    * exclusive cumsum) + phase 2 (within-part window) both do real work;
    * the oracle is the naive GLOBAL window sum the two-phase form must
    * reproduce exactly. `offset` is renamed: reserved word in DuckDB. */
  private val packOracle =
    """WITH t AS (
      |  SELECT CAST(doc_id AS BIGINT) AS id,
      |    CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_toks
      |  FROM documents
      |),
      |o AS (
      |  SELECT id, n_toks,
      |    CAST(COALESCE(SUM(n_toks) OVER (ORDER BY id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_offset
      |  FROM t
      |)
      |SELECT id, n_toks, tok_offset,
      |  tok_offset // 256 AS bin,
      |  GREATEST(tok_offset, tok_offset + n_toks - 1) // 256 AS bin_end,
      |  GREATEST(tok_offset, tok_offset + n_toks - 1) // 256 - tok_offset // 256 + 1 AS spans
      |FROM o ORDER BY id""".stripMargin

  val curPack = dfQ("cur_pack", packOracle) { (s, _) =>
    Curation.packOffsets(s.table("documents"), "doc_id", "text",
        binTokens = 256L, partRange = 32L)
      .withColumnRenamed("offset", "tok_offset")
      .orderBy("id")
  }

  // ---- PII redaction --------------------------------------------------

  /** Deterministic PII synthesis appended to each doc's text: one email,
    * one IPv4, one phone, all derived from (source, doc_id) identically
    * in both engines — then redact + per-pattern counts. The regexes are
    * embedded RAW: DuckDB string literals are standard-SQL (backslash is
    * literal), so `\b`/`\d` pass through to RE2 unmodified. */
  private val piiOracle =
    s"""WITH p AS (
       |  SELECT doc_id,
       |    text || ' contact ' || source || '@ex' || CAST(doc_id % 7 AS VARCHAR)
       |      || '.com via 10.0.' || CAST(doc_id % 256 AS VARCHAR)
       |      || '.1 or 555-123-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
       |  FROM documents
       |)
       |SELECT doc_id,
       |  md5(regexp_replace(regexp_replace(regexp_replace(t,
       |    '${Curation.EmailRe}', '<EMAIL>', 'g'),
       |    '${Curation.Ipv4Re}', '<IP>', 'g'),
       |    '${Curation.PhoneRe}', '<PHONE>', 'g')) AS red_md5,
       |  CAST(len(regexp_extract_all(t, '${Curation.EmailRe}')) AS BIGINT) AS n_email,
       |  CAST(len(regexp_extract_all(t, '${Curation.Ipv4Re}')) AS BIGINT) AS n_ip,
       |  CAST(len(regexp_extract_all(t, '${Curation.PhoneRe}')) AS BIGINT) AS n_phone
       |FROM p ORDER BY doc_id""".stripMargin

  val curPii = dfQ("cur_pii", piiOracle) { (s, _) =>
    val t = concat(col("text"), lit(" contact "), col("source"), lit("@ex"),
      pmod(col("doc_id"), lit(7)).cast("string"), lit(".com via 10.0."),
      pmod(col("doc_id"), lit(256)).cast("string"), lit(".1 or 555-123-"),
      lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"))
    s.table("documents").select(
        col("doc_id"),
        md5(Curation.piiRedact(t)).as("red_md5"),
        Curation.piiCount(t, Curation.EmailRe).cast("bigint").as("n_email"),
        Curation.piiCount(t, Curation.Ipv4Re).cast("bigint").as("n_ip"),
        Curation.piiCount(t, Curation.PhoneRe).cast("bigint").as("n_phone"))
      .orderBy("doc_id")
  }

  // ---- repetition stats ----------------------------------------------

  /** Gopher-style repetition flags; oracle replays token + 2-gram mass
    * math (flag thresholds applied to the UNROUNDED fractions, matching
    * the operator). */
  private val repetitionOracle =
    """WITH toks AS (
      |  SELECT doc_id AS id, string_split(lower(text), ' ') AS w,
      |    CAST(LENGTH(text) AS DOUBLE) AS n_chars
      |  FROM documents
      |),
      |word AS (
      |  SELECT id, CAST(len(w) AS BIGINT) AS n_toks,
      |    1.0 - CAST(len(list_distinct(w)) AS DOUBLE) / len(w) AS dwf, n_chars
      |  FROM toks
      |),
      |grams AS (
      |  SELECT id, n_chars, w[i] || ' ' || w[i+1] AS g
      |  FROM (SELECT id, n_chars, w, unnest(generate_series(1, len(w) - 1)) AS i
      |        FROM toks WHERE len(w) >= 2)
      |),
      |top AS (
      |  SELECT id, MAX(cnt * CAST(LENGTH(g) AS DOUBLE) / n_chars) AS tgf
      |  FROM (SELECT id, n_chars, g, COUNT(*) AS cnt FROM grams GROUP BY id, n_chars, g) c
      |  GROUP BY id
      |)
      |SELECT w.id AS id, w.n_toks AS n_toks,
      |  ROUND(w.dwf, 6) AS dup_word_frac,
      |  ROUND(COALESCE(t.tgf, 0.0), 6) AS top_gram_frac,
      |  (w.dwf > 0.9 OR COALESCE(t.tgf, 0.0) > 0.2) AS flagged
      |FROM word w LEFT JOIN top t ON t.id = w.id ORDER BY id""".stripMargin

  val curRepetition = dfQ("cur_repetition", repetitionOracle) { (s, _) =>
    Curation.repetitionStats(s.table("documents"), "doc_id", "text")
      .orderBy("id")
  }

  // ---- domain blocklist filtering ------------------------------------

  /** Deterministic URL synthesis from (source, doc_id); blocklist drops
    * three hosts via broadcast anti-join; DuckDB extracts the host with
    * string ops (no parse_url there). */
  private val blockedHosts = Seq(
    "src0.0.example.com", "src1.2.example.com", "src3.4.example.com")

  private val domainOracle =
    s"""WITH u AS (
       |  SELECT doc_id,
       |    'https://' || source || '.' || CAST(doc_id % 5 AS VARCHAR)
       |      || '.example.com/p/' || CAST(doc_id AS VARCHAR) AS url
       |  FROM documents
       |),
       |h AS (SELECT doc_id, string_split(url, '/')[3] AS host FROM u)
       |SELECT doc_id, host FROM h
       |WHERE host NOT IN (${blockedHosts.map(b => s"'$b'").mkString(", ")})
       |ORDER BY doc_id""".stripMargin

  val curDomainFilter = dfQ("cur_domain_filter", domainOracle) { (s, _) =>
    val withUrl = s.table("documents").select(
      col("doc_id"),
      concat(lit("https://"), col("source"), lit("."),
        pmod(col("doc_id"), lit(5)).cast("string"),
        lit(".example.com/p/"), col("doc_id").cast("string")).as("url"))
    Curation.domainFilter(withUrl, "url", blockedHosts)
      .select(col("doc_id"), col("host"))
      .orderBy("doc_id")
  }

  /** URL canonicalization ([[Curation.canonicalizeUrl]]): four messy
    * variants per doc — uppercase scheme/host + default port + tracking
    * params + fragment; a mid-query tracking param leaving a dangling
    * '&'; an fbclid-only query; an already-clean URL — all normalized
    * to one canonical form per page. The oracle replays every rewrite
    * step in DuckDB (RE2 — the op deliberately avoids lookahead, and
    * backreferences are `\1` there vs Spark's `$1`). The final count
    * per canonical URL proves the dedup-by-canonical-URL use. */
  val curUrlCanon = dfQ("cur_url_canon",
    """WITH u AS (
      |  SELECT doc_id,
      |    CASE CAST(doc_id % 4 AS INT)
      |      WHEN 0 THEN 'HTTPS://Site' || CAST((doc_id // 4) % 7 AS VARCHAR)
      |        || '.Example.com:443/P/' || CAST(doc_id // 4 AS VARCHAR)
      |        || '?utm_source=x&id=7#frag'
      |      WHEN 1 THEN 'http://site' || CAST((doc_id // 4) % 7 AS VARCHAR)
      |        || '.example.com:80/P/' || CAST(doc_id // 4 AS VARCHAR)
      |        || '?utm_campaign=z&id=7&gclid=g'
      |      WHEN 2 THEN 'https://site' || CAST((doc_id // 4) % 7 AS VARCHAR)
      |        || '.example.com/P/' || CAST(doc_id // 4 AS VARCHAR)
      |        || '?fbclid=abc&id=7'
      |      ELSE 'https://site' || CAST((doc_id // 4) % 7 AS VARCHAR)
      |        || '.example.com/P/' || CAST(doc_id // 4 AS VARCHAR) || '?id=7'
      |    END AS url FROM documents),
      |s1 AS (SELECT doc_id, regexp_replace(url, '#.*$', '') AS u FROM u),
      |s2 AS (SELECT doc_id, regexp_replace(u,
      |         '[?&](utm_[A-Za-z0-9_]+|fbclid|gclid)=[^&#]*', '', 'g') AS u
      |       FROM s1),
      |s3 AS (SELECT doc_id, regexp_replace(
      |         regexp_replace(u, '^([^?&]*)&', '\1?'), '[?&]$', '') AS u
      |       FROM s2),
      |s4 AS (SELECT doc_id, u,
      |         regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', 0) AS p
      |       FROM s3),
      |s5 AS (SELECT doc_id, lower(p) || substr(u, len(p) + 1) AS u FROM s4),
      |canon AS (SELECT doc_id, regexp_replace(regexp_replace(u,
      |    '^(https://[^/:?#]+):443([/?#].*)?$', '\1\2'),
      |    '^(http://[^/:?#]+):80([/?#].*)?$', '\1\2') AS canon
      |  FROM s5)
      |SELECT canon, CAST(COUNT(*) AS BIGINT) AS n_variants
      |FROM canon GROUP BY canon ORDER BY canon""".stripMargin,
    bench = false) { (s, _) =>
    import org.apache.spark.sql.functions._
    val url = concat(
      when(pmod(col("doc_id"), lit(4)) === 0, concat(
        lit("HTTPS://Site"), pmod(expr("doc_id div 4"), lit(7)).cast("string"),
        lit(".Example.com:443/P/"), expr("doc_id div 4").cast("string"),
        lit("?utm_source=x&id=7#frag")))
      .when(pmod(col("doc_id"), lit(4)) === 1, concat(
        lit("http://site"), pmod(expr("doc_id div 4"), lit(7)).cast("string"),
        lit(".example.com:80/P/"), expr("doc_id div 4").cast("string"),
        lit("?utm_campaign=z&id=7&gclid=g")))
      .when(pmod(col("doc_id"), lit(4)) === 2, concat(
        lit("https://site"), pmod(expr("doc_id div 4"), lit(7)).cast("string"),
        lit(".example.com/P/"), expr("doc_id div 4").cast("string"),
        lit("?fbclid=abc&id=7")))
      .otherwise(concat(
        lit("https://site"), pmod(expr("doc_id div 4"), lit(7)).cast("string"),
        lit(".example.com/P/"), expr("doc_id div 4").cast("string"),
        lit("?id=7"))))
    s.table("documents")
      .select(Curation.canonicalizeUrl(url).as("canon"))
      .groupBy("canon").agg(count(lit(1)).as("n_variants"))
      .orderBy("canon")
  }

  /** Domain-weighted mixture oracle: the exact integer spec of
    * [[Curation.mixDomains]] replayed in SQL — weights en:5 de:2 fr:2
    * es:1 (zh unweighted → excluded), `T = min_g floor(n_g·10/w_g)`,
    * each group keeps its `floor(T·w_g/10)` lowest-(md5(id), id) rows.
    * DuckDB `//` and Spark `div` both truncate; all values positive. */
  private val mixOracle =
    """WITH w(lang, wt) AS (VALUES ('en', 5), ('de', 2), ('fr', 2), ('es', 1)),
      |c AS (SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n, wt
      |      FROM documents d JOIN w ON d.lang = w.lang GROUP BY d.lang, wt),
      |t AS (SELECT MIN(n * 10 // wt) AS tt FROM c),
      |k AS (SELECT lang, (tt * wt) // 10 AS keep FROM c, t),
      |r AS (SELECT d.lang, d.doc_id,
      |        ROW_NUMBER() OVER (PARTITION BY d.lang
      |          ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id) AS rn
      |      FROM documents d JOIN w ON d.lang = w.lang)
      |SELECT r.lang AS lang, r.doc_id FROM r JOIN k ON r.lang = k.lang
      |WHERE rn <= keep
      |ORDER BY 1, 2""".stripMargin

  val curMixDomains = dfQ("cur_mix_domains", mixOracle) { (s, _) =>
    Curation.mixDomains(s.table("documents"), "lang", "doc_id",
        Map("en" -> 5, "de" -> 2, "fr" -> 2, "es" -> 1))
      .select("lang", "doc_id")
      .orderBy("lang", "doc_id")
  }

  /** The SKEW-CUTOVER path of [[Curation.mixDomains]] against the SAME
    * oracle: the md5-prefix pre-cut is bit-identical to the full rank by
    * construction (the cut sits strictly above the rank boundary), so
    * the plain-path SQL replay stays the exact spec. `skewCutover = 1`
    * forces the cut on EVERY group — the strictest setting. */
  val curMixSkew = dfQ("cur_mix_skew", mixOracle, bench = false) { (s, _) =>
    Curation.mixDomains(s.table("documents"), "lang", "doc_id",
        Map("en" -> 5, "de" -> 2, "fr" -> 2, "es" -> 1),
        skewCutover = Some(1L))
      .select("lang", "doc_id")
      .orderBy("lang", "doc_id")
  }

  /** Line-grain dedup oracle: [[Curation.lineDedup]] at 8-token lines
    * replayed exactly — fixed-token lines, corpus-wide keep-first by
    * (id, line_idx), per-doc reassembly hashed (md5('') when a doc
    * keeps nothing, matching Spark's empty array_join). */
  private val lineDedupOracle =
    """WITH t AS (SELECT doc_id AS id, string_split(text, ' ') AS w
      |           FROM documents),
      |l AS (
      |  SELECT id, i.i AS line_idx,
      |    array_to_string(w[(i.i * 8 + 1):(i.i * 8 + 8)], ' ') AS line
      |  FROM t CROSS JOIN LATERAL
      |    (SELECT unnest(generate_series(0,
      |       CAST((len(t.w) + 7) // 8 AS INT) - 1)) AS i) i
      |),
      |r AS (SELECT id, line_idx, line,
      |        ROW_NUMBER() OVER (PARTITION BY line ORDER BY id, line_idx) AS rn
      |      FROM l)
      |SELECT id AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_lines,
      |  CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  md5(COALESCE(string_agg(CASE WHEN rn = 1 THEN line END, ' '
      |    ORDER BY line_idx), '')) AS kept_hash
      |FROM r GROUP BY id ORDER BY doc_id""".stripMargin

  val curLineDedup = dfQ("cur_line_dedup", lineDedupOracle) { (s, _) =>
    Curation.lineDedup(s.table("documents"), "doc_id", "text", lineTokens = 8)
      .select(col("id").as("doc_id"), col("n_lines"), col("n_kept"),
        md5(col("text")).as("kept_hash"))
      .orderBy("doc_id")
  }

  /** Token-budget mixture oracle: [[Curation.mixDomainsByTokens]]
    * replayed — per-group token totals, bottleneck-capped budget,
    * keep-while-exclusive-prefix-sum-under-budget on the md5 rank. */
  private val mixTokensOracle =
    """WITH w(lang, wt) AS (VALUES ('en', 5), ('de', 2), ('fr', 2), ('es', 1)),
      |d2 AS (SELECT lang, doc_id,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      |       FROM documents),
      |c AS (SELECT d2.lang, CAST(SUM(n_tok) AS BIGINT) AS n, wt
      |      FROM d2 JOIN w ON d2.lang = w.lang GROUP BY d2.lang, wt),
      |t AS (SELECT MIN(n * 10 // wt) AS tt FROM c),
      |k AS (SELECT lang, (tt * wt) // 10 AS budget FROM c, t),
      |r AS (SELECT d2.lang, d2.doc_id, d2.n_tok,
      |        COALESCE(SUM(n_tok) OVER (PARTITION BY d2.lang
      |          ORDER BY md5(CAST(d2.doc_id AS VARCHAR)), d2.doc_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
      |      FROM d2 JOIN w ON d2.lang = w.lang)
      |SELECT r.lang AS lang, r.doc_id, r.n_tok
      |FROM r JOIN k ON r.lang = k.lang
      |WHERE cum < budget
      |ORDER BY 1, 2""".stripMargin

  val curMixTokens = dfQ("cur_mix_tokens", mixTokensOracle,
      bench = false) { (s, _) =>
    Curation.mixDomainsByTokens(s.table("documents"), "lang", "doc_id",
        "text", Map("en" -> 5, "de" -> 2, "fr" -> 2, "es" -> 1))
      .select(col("lang"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .orderBy("lang", "doc_id")
  }

  /** The SKEW-CUTOVER path of [[Curation.mixDomainsByTokens]] against
    * the SAME oracle as the plain path: the md5-prefix pre-cut is
    * bit-identical by construction (the cut sits strictly above the
    * token-budget boundary) and its exact underflow guard raises rather
    * than shrinking the mixture. `skewCutover = 1` forces the cut on
    * EVERY group — the strictest setting. */
  val curMixTokensSkew = dfQ("cur_mix_tokens_skew", mixTokensOracle,
      bench = false) { (s, _) =>
    Curation.mixDomainsByTokens(s.table("documents"), "lang", "doc_id",
        "text", Map("en" -> 5, "de" -> 2, "fr" -> 2, "es" -> 1),
        skewCutover = Some(1L))
      .select(col("lang"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .orderBy("lang", "doc_id")
  }

  /** End-to-end curation composition: line-grain dedup → keep docs that
    * retained at least half their lines → domain-weighted mixture over
    * the survivors. Every stage is exact-integer/deterministic, so the
    * whole pipeline replays as ONE SQL statement — the "a training run
    * could consume this" proof for the composed path, not just the
    * stages. */
  private val curateMixOracle =
    """WITH t AS (SELECT doc_id AS id, string_split(text, ' ') AS w
      |           FROM documents),
      |l AS (
      |  SELECT id, i.i AS line_idx,
      |    array_to_string(w[(i.i * 8 + 1):(i.i * 8 + 8)], ' ') AS line
      |  FROM t CROSS JOIN LATERAL
      |    (SELECT unnest(generate_series(0,
      |       CAST((len(t.w) + 7) // 8 AS INT) - 1)) AS i) i
      |),
      |r AS (SELECT id, line_idx, line,
      |        ROW_NUMBER() OVER (PARTITION BY line ORDER BY id, line_idx) AS rn
      |      FROM l),
      |dd AS (SELECT id AS doc_id,
      |         CAST(COUNT(*) AS BIGINT) AS n_lines,
      |         CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
      |       FROM r GROUP BY id),
      |surv AS (
      |  SELECT d.doc_id, d.lang, dd.n_kept
      |  FROM dd JOIN documents d ON d.doc_id = dd.doc_id
      |  WHERE dd.n_kept * 2 >= dd.n_lines
      |),
      |w2(lang, wt) AS (VALUES ('en', 5), ('de', 2), ('fr', 2), ('es', 1)),
      |c2 AS (SELECT s.lang, CAST(COUNT(*) AS BIGINT) AS n, wt
      |       FROM surv s JOIN w2 ON s.lang = w2.lang GROUP BY s.lang, wt),
      |t2 AS (SELECT MIN(n * 10 // wt) AS tt FROM c2),
      |k2 AS (SELECT lang, (tt * wt) // 10 AS keep FROM c2, t2),
      |rk AS (SELECT s.lang, s.doc_id, s.n_kept,
      |         ROW_NUMBER() OVER (PARTITION BY s.lang
      |           ORDER BY md5(CAST(s.doc_id AS VARCHAR)), s.doc_id) AS rn
      |       FROM surv s JOIN w2 ON s.lang = w2.lang)
      |SELECT rk.lang AS lang, rk.doc_id, rk.n_kept
      |FROM rk JOIN k2 ON rk.lang = k2.lang
      |WHERE rn <= keep
      |ORDER BY 1, 2""".stripMargin

  val pipeCurateMix = dfQ("pipe_curate_mix", curateMixOracle,
      bench = false) { (s, _) =>
    val ld = Curation.lineDedup(s.table("documents"), "doc_id", "text",
        lineTokens = 8)
      .filter(col("n_kept") * 2 >= col("n_lines"))
      .select(col("id").as("doc_id"), col("n_kept"))
    val withLang = ld.join(
      s.table("documents").select("doc_id", "lang"), Seq("doc_id"))
    Curation.mixDomains(withLang, "lang", "doc_id",
        Map("en" -> 5, "de" -> 2, "fr" -> 2, "es" -> 1))
      .select("lang", "doc_id", "n_kept")
      .orderBy("lang", "doc_id")
  }

  /** Deterministic importance resampling ([[Curation.resampleByWeight]]):
    * per-row keep ⟺ 40-bit md5 prefix falls below the row's micro-unit
    * weight fraction of the hash space — the oracle replays the exact
    * cross-multiplication (`hash40·10^6 < w·2^40`, both under 2^61, no
    * overflow in either engine). Weights sweep 0..1,000,000 in 100k
    * steps via `(doc_id·37) mod 11`, so the never-keep and always-keep
    * extremes are both exercised. */
  private val resampleOracle =
    """WITH w AS (
      |  SELECT doc_id,
      |    CAST((doc_id * 37 % 11) * 100000 AS BIGINT) AS weight_micro
      |  FROM documents)
      |SELECT doc_id, weight_micro FROM w
      |WHERE CAST('0x' || substring(md5('rs_' || CAST(doc_id AS VARCHAR)), 1, 10)
      |        AS BIGINT) * 1000000 < weight_micro * 1099511627776
      |ORDER BY doc_id""".stripMargin

  val curResampleWeight = dfQ("cur_resample_weight", resampleOracle,
    bench = false) { (s, _) =>
    val weighted = s.table("documents")
      .select(col("doc_id"),
        (pmod(col("doc_id") * 37, lit(11)) * 100000L).cast("long")
          .as("weight_micro"))
    Curation.resampleByWeight(weighted, "doc_id", "weight_micro")
      .orderBy("doc_id")
  }

  /** Deterministic hash split ([[Curation.splitByHash]]): 80/10/10
    * train/val/test by the 40-bit md5 interval walk; the oracle replays
    * the cumulative cross-multiplications and aggregates per (lang,
    * split) so every row's assignment participates in the hash. */
  private val splitOracle =
    """WITH h AS (
      |  SELECT doc_id, lang,
      |    CAST('0x' || substring(md5('split_' || CAST(doc_id AS VARCHAR)), 1, 10)
      |      AS BIGINT) AS hv
      |  FROM documents),
      |lab AS (
      |  SELECT doc_id, lang,
      |    CASE WHEN hv * 1000000 < 800000 * 1099511627776 THEN 'train'
      |         WHEN hv * 1000000 < 900000 * 1099511627776 THEN 'val'
      |         ELSE 'test' END AS split
      |  FROM h)
      |SELECT lang, split, CAST(COUNT(*) AS BIGINT) AS n,
      |  MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
      |FROM lab GROUP BY lang, split
      |ORDER BY lang, split""".stripMargin

  val curSplitHash = dfQ("cur_split_hash", splitOracle,
    bench = false) { (s, _) =>
    Curation.splitByHash(s.table("documents").select("doc_id", "lang"),
        "doc_id",
        Seq("train" -> 800000L, "val" -> 100000L, "test" -> 100000L))
      .groupBy("lang", "split")
      .agg(count(lit(1)).as("n"), min("doc_id").as("min_id"),
        max("doc_id").as("max_id"))
      .orderBy("lang", "split")
  }

  /** Deterministic importance UPSAMPLING ([[Curation.upsampleByWeight]]):
    * per-lang epoch weights (en 2.5×, de 1.0×, others 0.4×) — whole
    * copies by integer division, the fractional copy by the shared
    * resample hash threshold; the oracle replays division, draw and the
    * 0-based copy explode row for row. */
  val curUpsampleWeight = dfQ("cur_upsample_weight",
    """WITH w AS (SELECT doc_id, lang,
      |    CASE WHEN lang = 'en' THEN 2500000
      |         WHEN lang = 'de' THEN 1000000 ELSE 400000 END AS wm
      |  FROM documents),
      |cp AS (SELECT doc_id, lang,
      |    wm // 1000000 + CASE WHEN
      |      CAST('0x' || substring(md5('us_' || CAST(doc_id AS VARCHAR)), 1, 10)
      |        AS BIGINT) * 1000000 < (wm % 1000000) * 1099511627776
      |      THEN 1 ELSE 0 END AS copies
      |  FROM w),
      |ex AS (SELECT doc_id, lang,
      |    unnest(generate_series(0, copies - 1)) AS cp_i
      |  FROM cp WHERE copies > 0)
      |SELECT doc_id, lang, CAST(cp_i AS BIGINT) AS copy
      |FROM ex ORDER BY doc_id, copy""".stripMargin, bench = false) { (s, _) =>
    val w = s.table("documents").select(col("doc_id"), col("lang"),
      when(col("lang") === "en", 2500000L)
        .when(col("lang") === "de", 1000000L)
        .otherwise(400000L).as("wm"))
    Curation.upsampleByWeight(w, "doc_id", "wm")
      .select("doc_id", "lang", "copy").orderBy("doc_id", "copy")
  }

  /** The full curation tail as ONE composition: Gopher quality gate →
    * length-proportional importance resampling → deterministic
    * train/val split → per-(lang, split) accounting. Every stage is the
    * exact-integer primitive its own entry pins; the value of THIS
    * entry is the composition replayed end-to-end in one SQL oracle
    * (each stage's survivors feed the next stage's hash decisions). */
  private val gateResampleSplitOracle =
    """WITH t AS (
      |  SELECT doc_id, lang, string_split(lower(text), ' ') AS w
      |  FROM documents),
      |m AS (
      |  SELECT doc_id, lang, CAST(len(w) AS BIGINT) AS n_words,
      |    CAST(list_sum(list_transform(w, x -> len(x))) AS BIGINT) AS n_chars,
      |    CAST(len(list_intersect(list_distinct(w),
      |      ['the','a','of','and','to','in','is','it'])) AS BIGINT) AS n_stop,
      |    CAST(len(list_filter(w, x -> regexp_matches(x, '[a-zA-Z]')))
      |      AS BIGINT) AS n_alpha,
      |    CAST(len(list_filter(w, x -> x <> ''
      |      AND NOT regexp_matches(x, '[a-zA-Z0-9]'))) AS BIGINT) AS n_sym
      |  FROM t),
      |kept AS (
      |  SELECT doc_id, lang,
      |    LEAST(1000000, n_words * 15000) AS wm
      |  FROM m
      |  WHERE n_words >= 30 AND n_words <= 90
      |    AND n_chars >= 4 * n_words AND n_chars <= 10 * n_words
      |    AND n_stop >= 2 AND n_alpha * 5 >= n_words * 4
      |    AND n_sym * 10 <= n_words),
      |sampled AS (
      |  SELECT doc_id, lang FROM kept
      |  WHERE CAST('0x' || substring(md5('rs_' || CAST(doc_id AS VARCHAR)), 1, 10)
      |          AS BIGINT) * 1000000 < wm * 1099511627776),
      |lab AS (
      |  SELECT doc_id, lang,
      |    CASE WHEN CAST('0x' || substring(md5('split_' || CAST(doc_id AS VARCHAR)), 1, 10)
      |            AS BIGINT) * 1000000 < 900000 * 1099511627776
      |         THEN 'train' ELSE 'val' END AS split
      |  FROM sampled)
      |SELECT lang, split, CAST(COUNT(*) AS BIGINT) AS n,
      |  MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
      |FROM lab GROUP BY lang, split
      |ORDER BY lang, split""".stripMargin

  val pipeGateResampleSplit = dfQ("pipe_gate_resample_split",
    gateResampleSplitOracle, bench = false) { (s, _) =>
    import graft.operators.TextAnalysis
    val flags = TextAnalysis.gopherQualityFlags(s.table("documents"),
      "doc_id", "text", minWords = 30, maxWords = 90,
      minMeanLen = 4, maxMeanLen = 10, minStopwords = 2)
    val kept = flags.filter(col("keep") === 1)
      .select(col("id").as("doc_id"),
        least(lit(1000000L), col("n_words") * 15000L).as("wm"))
      .join(s.table("documents").select("doc_id", "lang"), Seq("doc_id"))
    val sampled = Curation.resampleByWeight(kept, "doc_id", "wm")
    Curation.splitByHash(sampled, "doc_id",
        Seq("train" -> 900000L, "val" -> 100000L))
      .groupBy("lang", "split")
      .agg(count(lit(1)).as("n"), min("doc_id").as("min_id"),
        max("doc_id").as("max_id"))
      .orderBy("lang", "split")
  }

  /** Epoch-SHUFFLED packing ([[Curation.packShuffled]]): the same
    * concat-and-split layout as cur_pack, but over the deterministic
    * md5(salt, id, copy) shuffle order — the oracle replays the naive
    * GLOBAL window sum ordered by (hash, id, copy) that the hash-span
    * two-phase form must reproduce exactly. `copy` varies per row
    * (doc_id mod 3) so it genuinely participates in the hash. Output is
    * ordered by tok_offset — the shuffle order itself is the compared
    * surface (offsets are strictly increasing: every doc counts >= 1
    * token, so the order tie-break never reaches the compare). */
  private val packShuffledOracle =
    """WITH t AS (
      |  SELECT CAST(doc_id AS BIGINT) AS id,
      |    CAST(doc_id % 3 AS BIGINT) AS cp,
      |    CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_toks,
      |    CAST('0x' || substring(md5('ep_' || CAST(doc_id AS VARCHAR) || '_'
      |      || CAST(doc_id % 3 AS VARCHAR)), 1, 15) AS BIGINT) AS hk
      |  FROM documents),
      |o AS (
      |  SELECT id, cp, n_toks,
      |    CAST(COALESCE(SUM(n_toks) OVER (ORDER BY hk, id, cp
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |      AS tok_offset
      |  FROM t)
      |SELECT id, cp AS copy, n_toks, tok_offset,
      |  tok_offset // 256 AS bin,
      |  GREATEST(tok_offset, tok_offset + n_toks - 1) // 256 AS bin_end,
      |  GREATEST(tok_offset, tok_offset + n_toks - 1) // 256
      |    - tok_offset // 256 + 1 AS spans
      |FROM o ORDER BY tok_offset""".stripMargin

  val curPackShuffled = dfQ("cur_pack_shuffled", packShuffledOracle,
    bench = false) { (s, _) =>
    Curation.packShuffled(
        s.table("documents").withColumn("cp", pmod(col("doc_id"), lit(3L))),
        "doc_id", "cp", "text", binTokens = 256L, partSpan = 1L << 55)
      .withColumnRenamed("offset", "tok_offset")
      .orderBy("tok_offset")
  }

  /** Materialized training bins ([[Curation.packShuffledBins]]): the
    * shuffled layout cut into actual per-bin token streams — fragments
    * at bin boundaries, reassembled in global offset order, content
    * pinned by md5 of the full stream (the strongest possible check:
    * one missing/duplicated/misordered token anywhere flips the hash).
    * The oracle replays the naive window layout, the boundary slice
    * arithmetic, and the ordered reassembly via string_agg. */
  private val packBinsOracle =
    """WITH t AS (
      |  SELECT CAST(doc_id AS BIGINT) AS id,
      |    CAST(doc_id % 3 AS BIGINT) AS cp,
      |    string_split(lower(text), ' ') AS w,
      |    CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_toks,
      |    CAST('0x' || substring(md5('ep_' || CAST(doc_id AS VARCHAR) || '_'
      |      || CAST(doc_id % 3 AS VARCHAR)), 1, 15) AS BIGINT) AS hk
      |  FROM documents),
      |lay AS (
      |  SELECT id, w, n_toks,
      |    CAST(COALESCE(SUM(n_toks) OVER (ORDER BY hk, id, cp
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |      AS toff
      |  FROM t),
      |ex AS (
      |  SELECT id, w, n_toks, toff,
      |    unnest(generate_series(toff // 256,
      |      GREATEST(toff, toff + n_toks - 1) // 256)) AS b
      |  FROM lay),
      |fr AS (
      |  SELECT b AS bin,
      |    GREATEST(toff, b * 256) AS gpos,
      |    list_slice(w, GREATEST(0, b * 256 - toff) + 1,
      |      LEAST(n_toks, (b + 1) * 256 - toff)) AS frag
      |  FROM ex)
      |SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_frags,
      |  CAST(SUM(len(frag)) AS BIGINT) AS n_toks,
      |  md5(string_agg(array_to_string(frag, ' '), ' ' ORDER BY gpos))
      |    AS bin_md5
      |FROM fr GROUP BY bin ORDER BY bin""".stripMargin

  val curPackBins = dfQ("cur_pack_bins", packBinsOracle,
    bench = false) { (s, _) =>
    Curation.packShuffledBins(
        s.table("documents").withColumn("cp", pmod(col("doc_id"), lit(3L))),
        "doc_id", "cp", "text", binTokens = 256L, partSpan = 1L << 55)
      .orderBy("bin")
  }

  /** The full TRAINING-EPOCH ASSEMBLY tail as ONE composition:
    * deterministic 90/10 split → per-source epoch weights (2.5x / 1.5x /
    * 0.7x — whole copies AND both fractional directions exercised) →
    * [[Curation.upsampleByWeight]] epoching → [[Curation.packShuffled]]
    * into 512-token bins → per-bin accounting (docs, tokens, bin-
    * straddlers). Every stage is the exact-integer primitive its own
    * entry pins; THIS entry pins the composition — each stage's
    * survivors/copies feed the next stage's hash decisions, ending in
    * the physical training-bin layout a dataloader would consume. */
  private val epochAssemblyOracle =
    """WITH lab AS (
      |  SELECT doc_id, text, source FROM documents
      |  WHERE CAST('0x' || substring(md5('split_' || CAST(doc_id AS VARCHAR)), 1, 10)
      |      AS BIGINT) * 1000000 < 900000 * 1099511627776),
      |w AS (
      |  SELECT doc_id, text,
      |    CASE WHEN source IN ('src0', 'src1') THEN 2500000
      |         WHEN source = 'src2' THEN 1500000 ELSE 700000 END AS wm
      |  FROM lab),
      |cp AS (
      |  SELECT doc_id, text,
      |    wm // 1000000 + CASE WHEN
      |      CAST('0x' || substring(md5('us_' || CAST(doc_id AS VARCHAR)), 1, 10)
      |        AS BIGINT) * 1000000 < (wm % 1000000) * 1099511627776
      |      THEN 1 ELSE 0 END AS copies
      |  FROM w),
      |ex AS (
      |  SELECT doc_id, text, unnest(generate_series(0, copies - 1)) AS cp_i
      |  FROM cp WHERE copies > 0),
      |t AS (
      |  SELECT CAST(doc_id AS BIGINT) AS id, CAST(cp_i AS BIGINT) AS cp_i,
      |    CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_toks,
      |    CAST('0x' || substring(md5('ep_' || CAST(doc_id AS VARCHAR) || '_'
      |      || CAST(cp_i AS VARCHAR)), 1, 15) AS BIGINT) AS hk
      |  FROM ex),
      |o AS (
      |  SELECT id, n_toks,
      |    CAST(COALESCE(SUM(n_toks) OVER (ORDER BY hk, id, cp_i
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |      AS tok_offset
      |  FROM t)
      |SELECT tok_offset // 512 AS bin,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n_toks) AS BIGINT) AS toks,
      |  CAST(SUM(CASE WHEN GREATEST(tok_offset, tok_offset + n_toks - 1) // 512
      |    > tok_offset // 512 THEN 1 ELSE 0 END) AS BIGINT) AS n_straddle,
      |  MIN(id) AS min_id
      |FROM o GROUP BY bin ORDER BY bin""".stripMargin

  val pipeEpochAssembly = dfQ("pipe_epoch_assembly", epochAssemblyOracle,
    bench = false) { (s, _) =>
    val docs = s.table("documents").select("doc_id", "text", "source")
    val train = Curation.splitByHash(docs, "doc_id",
        Seq("train" -> 900000L, "val" -> 100000L))
      .filter(col("split") === "train")
    val weighted = train.withColumn("wm",
      when(col("source").isin("src0", "src1"), 2500000L)
        .when(col("source") === "src2", 1500000L)
        .otherwise(700000L))
    val epoch = Curation.upsampleByWeight(weighted, "doc_id", "wm")
    Curation.packShuffled(epoch, "doc_id", "copy", "text",
        binTokens = 512L, partSpan = 1L << 55)
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_toks").as("toks"),
        sum(when(col("spans") > 1, 1L).otherwise(0L)).as("n_straddle"),
        min("id").as("min_id"))
      .orderBy("bin")
  }

  // ---- Bloom-filter decontamination gate --------------------------------

  /** Bloom-gated decontamination ([[Curation.bloomBuild]]/[[Curation
    * .bloomProbe]]): eval docs' (every 17th) 8-token window fingerprints
    * build a 16384-bit / 5-hash Bloom filter; every train window probes
    * it. Per train doc: window count, bloom-flagged count, TRUE-hit count
    * (exact membership, so the oracle pins the false-positive behavior
    * too — a flagged-but-clean window is a REPLAYED false positive, not
    * noise), and the doc-grain drop verdict. The oracle rebuilds the
    * filter from the same double-hashed positions with `bit_or` and
    * replays every probe — bit-for-bit, including which words collide. */
  /** The Bloom decontamination CTE chain over `documents` (eval = every
    * 17th doc; 8-token windows; 16384-bit / 5-hash filter, seed 'bl'):
    * ends at `wins(id, h)` (every doc's window fingerprints) and
    * `pr(h, bloom_hit)` (per distinct TRAIN fingerprint, the replayed
    * probe verdict) plus `ev(h)` (exact eval membership). Shared by
    * cur_bloom_gate and pipe_bloom_mix so the replays cannot drift. */
  private val bloomChainCtes =
    """t0 AS (SELECT doc_id AS id, string_split(lower(text), ' ') AS w
      |            FROM documents),
      |wins AS (
      |  SELECT id, md5(array_to_string(w[i.i:i.i+7], ' ')) AS h
      |  FROM t0 CROSS JOIN LATERAL
      |    (SELECT unnest(generate_series(1, len(w) - 7)) AS i) i
      |  WHERE len(w) >= 8),
      |ev AS (SELECT DISTINCT h FROM wins WHERE id % 17 = 0),
      |epp AS (
      |  SELECT (CAST('0x' || substr(md5('bl_' || h), 1, 13) AS BIGINT)
      |        + i * CAST('0x' || substr(md5('bl_' || h), 14, 13) AS BIGINT))
      |        % 16384 AS p
      |  FROM (SELECT h, unnest(generate_series(0, 4)) AS i FROM ev)),
      |filt AS (SELECT p // 32 AS word_idx,
      |                bit_or(CAST(1 AS BIGINT) << CAST(p % 32 AS INT)) AS word
      |         FROM epp GROUP BY 1),
      |tk AS (SELECT DISTINCT h FROM wins WHERE id % 17 <> 0),
      |tpp AS (
      |  SELECT h, (CAST('0x' || substr(md5('bl_' || h), 1, 13) AS BIGINT)
      |           + i * CAST('0x' || substr(md5('bl_' || h), 14, 13) AS BIGINT))
      |           % 16384 AS p
      |  FROM (SELECT h, unnest(generate_series(0, 4)) AS i FROM tk)),
      |pr AS (
      |  SELECT t.h,
      |    (SUM(CASE WHEN f.word IS NOT NULL AND (f.word & t.m) = t.m
      |         THEN 1 ELSE 0 END) = 5) AS bloom_hit
      |  FROM (SELECT h, p // 32 AS word_idx,
      |               CAST(1 AS BIGINT) << CAST(p % 32 AS INT) AS m FROM tpp) t
      |  LEFT JOIN filt f USING (word_idx)
      |  GROUP BY t.h)""".stripMargin

  private val bloomGateOracle =
    "WITH " + bloomChainCtes + """
      |SELECT w.id AS doc_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_wins,
      |  CAST(SUM(CASE WHEN pr.bloom_hit THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_bloom_hits,
      |  CAST(SUM(CASE WHEN e2.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_true_hits,
      |  (SUM(CASE WHEN pr.bloom_hit THEN 1 ELSE 0 END) > 0) AS dropped
      |FROM wins w
      |JOIN pr ON pr.h = w.h
      |LEFT JOIN ev e2 ON e2.h = w.h
      |WHERE w.id % 17 <> 0
      |GROUP BY w.id
      |ORDER BY doc_id""".stripMargin

  val curBloomGate = dfQ("cur_bloom_gate", bloomGateOracle) { (s, _) =>
    val docs = s.table("documents")
    val isEval = col("doc_id") % 17 === 0
    val bits = 16384L; val k = 5; val seed = "bl"
    // r19: the eval fingerprint set feeds the filter build AND the
    // true-hit join — persisted (it is distinct-fingerprint-scale,
    // tiny, and one consumer is a broadcast build).
    // r20 (§2): ONE pass over the train window stream. The old shape
    // probed the DISTINCT fingerprints and joined the verdicts back to
    // the occurrence stream — the window-md5 explode chain evaluated
    // twice (probe distinct + accounting join) and the plan carried 4
    // exchanges. Now the stream collapses once to (id, h, nw)
    // multiplicities; the k-position probe explodes THAT frame against
    // the broadcast filter and re-aggregates on the SAME (id, h) keys —
    // partitioning is preserved through the broadcast join, so no new
    // exchange — and the doc-grain accounting is one more narrow
    // aggregate. 4 exchanges -> 2, window chain evaluated once. (The
    // per-row fold form and the occurrence-scale cache were both A/B'd
    // slower in r19 — this is the third shape, measured faster.)
    val evalFp = Curation.evalFingerprints(docs.filter(isEval), "doc_id",
      "text", k = 8)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val filt = Curation.bloomBuild(evalFp, "h", bits, k, seed)
    val occ = docs.filter(!isEval)
      .select(col("doc_id").cast("long").as("id"),
        explode(Curation.windowFingerprintArray(col("text"), 8)).as("h"))
      .groupBy("id", "h").agg(count(lit(1)).as("nw"))
    val verdicts = occ
      .select(col("id"), col("h"), col("nw"),
        explode(Curation.bloomPositions(col("h"), bits, k, seed)).as("p"))
      .select(col("id"), col("h"), col("nw"),
        Curation.bloomWordIdx(col("p")).as("word_idx"),
        Curation.bloomMask(col("p")).as("m"))
      .join(broadcast(filt), Seq("word_idx"), "left")
      .groupBy("id", "h")
      .agg(min(col("nw")).as("nw"),
        (sum(when(col("word").isNotNull &&
            (col("word").bitwiseAND(col("m")) === col("m")), 1L)
          .otherwise(0L)) === lit(k.toLong)).as("bloom_hit"))
    verdicts
      .join(broadcast(evalFp.select(col("h"), lit(1L).as("t"))),
        Seq("h"), "left")
      .groupBy("id")
      .agg(sum(col("nw")).as("n_wins"),
        sum(when(col("bloom_hit"), col("nw")).otherwise(0L)).as("n_bloom_hits"),
        sum(when(col("t").isNotNull, col("nw")).otherwise(0L)).as("n_true_hits"))
      .select(col("id").as("doc_id"), col("n_wins"), col("n_bloom_hits"),
        col("n_true_hits"), (col("n_bloom_hits") > 0).as("dropped"))
      .orderBy("doc_id")
  }

  /** Bloom gate → exact mixture COMPOSITION: the bloom-flagged docs drop
    * doc-grain (any maybe-member window), the survivors mix per language
    * under [[Curation.mixDomains]]' exact integer spec — the gate's
    * false positives (replayed, not modeled) change which rows exist
    * when the mixture's bottleneck and rank decisions run, so the whole
    * chain is in the compared surface. */
  private val bloomMixOracle =
    "WITH " + bloomChainCtes + """,
      |flag AS (SELECT DISTINCT w.id FROM wins w JOIN pr ON pr.h = w.h
      |         WHERE w.id % 17 <> 0 AND pr.bloom_hit),
      |kept AS (SELECT d.lang, CAST(d.doc_id AS BIGINT) AS doc_id
      |         FROM documents d
      |         WHERE d.doc_id % 17 <> 0 AND NOT EXISTS
      |           (SELECT 1 FROM flag WHERE flag.id = d.doc_id)),
      |mw(lang, wt) AS (VALUES ('en', 5), ('de', 2), ('fr', 2), ('es', 1)),
      |c AS (SELECT k.lang, CAST(COUNT(*) AS BIGINT) AS n, wt
      |      FROM kept k JOIN mw ON k.lang = mw.lang GROUP BY k.lang, wt),
      |t AS (SELECT MIN(n * 10 // wt) AS tt FROM c),
      |kp AS (SELECT lang, (tt * wt) // 10 AS keep FROM c, t),
      |r AS (SELECT k.lang, k.doc_id,
      |        ROW_NUMBER() OVER (PARTITION BY k.lang
      |          ORDER BY md5(CAST(k.doc_id AS VARCHAR)), k.doc_id) AS rn
      |      FROM kept k JOIN mw ON k.lang = mw.lang)
      |SELECT r.lang AS lang, r.doc_id FROM r JOIN kp ON r.lang = kp.lang
      |WHERE rn <= keep
      |ORDER BY 1, 2""".stripMargin

  val pipeBloomMix = dfQ("pipe_bloom_mix", bloomMixOracle,
    bench = false) { (s, _) =>
    val docs = s.table("documents")
    val isEval = col("doc_id") % 17 === 0
    val bits = 16384L; val k = 5; val seed = "bl"
    val evalFp = Curation.evalFingerprints(docs.filter(isEval), "doc_id",
      "text", k = 8)
    val filt = Curation.bloomBuild(evalFp, "h", bits, k, seed)
    val trainW = docs.filter(!isEval)
      .select(col("doc_id").cast("long").as("id"),
        explode(Curation.windowFingerprintArray(col("text"), 8)).as("h"))
    val flagged = trainW
      .join(Curation.bloomProbe(trainW, "h", filt, bits, k, seed), Seq("h"))
      .filter(col("bloom_hit"))
      .select(col("id").as("doc_id")).distinct()
    val kept = docs.filter(!isEval)
      .select(col("doc_id").cast("long").as("doc_id"), col("lang"))
      .join(flagged, Seq("doc_id"), "left_anti")
    Curation.mixDomains(kept, "lang", "doc_id",
        Map("en" -> 5, "de" -> 2, "fr" -> 2, "es" -> 1))
      .select("lang", "doc_id")
      .orderBy("lang", "doc_id")
  }

  /** Corpus datasheet ([[Curation.corpusReport]]): per (lang, source)
    * exact totals, nearest-rank p50/p95 token counts over the pinned
    * (count, id) total order, exact micro mean and duplicate-text
    * fraction. The oracle replays the rank arithmetic — value at rank
    * `(p·n + 99) // 100` — bit-for-bit. */
  private val corpusReportOracle =
    """WITH b AS (
      |  SELECT lang, source, CAST(doc_id AS BIGINT) AS id,
      |    CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS nt,
      |    md5(lower(regexp_replace(text, ' +', ' ', 'g'))) AS fp
      |  FROM documents),
      |r AS (
      |  SELECT *,
      |    ROW_NUMBER() OVER (PARTITION BY lang, source ORDER BY nt, id) AS rn,
      |    COUNT(*) OVER (PARTITION BY lang, source) AS cnt
      |  FROM b)
      |SELECT lang, source,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(nt) AS BIGINT) AS n_tokens,
      |  MIN(nt) AS tok_min,
      |  MAX(CASE WHEN rn = (cnt * 50 + 99) // 100 THEN nt END) AS tok_p50,
      |  MAX(CASE WHEN rn = (cnt * 95 + 99) // 100 THEN nt END) AS tok_p95,
      |  MAX(nt) AS tok_max,
      |  CAST((SUM(nt) * 1000000) // COUNT(*) AS BIGINT) AS mean_tok_micro,
      |  CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_distinct_texts,
      |  CAST(((COUNT(*) - COUNT(DISTINCT fp)) * 1000000) // COUNT(*)
      |    AS BIGINT) AS dup_frac_micro
      |FROM r GROUP BY lang, source ORDER BY lang, source""".stripMargin

  val curCorpusReport = dfQ("cur_corpus_report", corpusReportOracle) { (s, _) =>
    Curation.corpusReport(s.table("documents"), "doc_id", "text",
        Seq("lang", "source"))
      .orderBy("lang", "source")
  }

  // ---- declarative data-quality expectations ---------------------------

  /** [[graft.operators.Expectations]] over `orders` (+ `customer` as the
    * FK dimension): the mixed pass/fail verdict table — four row-grain
    * checks fused into ONE aggregate pass, uniqueness via the key-tuple
    * distinct, referential integrity via one anti-join. The range /
    * domain / custkey-unique checks FAIL by construction (non-zero
    * violation counts in the compared surface), so the oracle pins real
    * violation arithmetic, not six zeros. `check` is a reserved word in
    * DuckDB — the output column is `check_name`. */
  private val expectationsOracle =
    """WITH r AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_nn,
      |    CAST(SUM(CASE WHEN o_totalprice IS NULL OR
      |      NOT (o_totalprice >= 0 AND o_totalprice <= 100000)
      |      THEN 1 ELSE 0 END) AS BIGINT) AS v_rng,
      |    CAST(SUM(CASE WHEN o_orderpriority IS NULL OR
      |      NOT regexp_matches(o_orderpriority, '^[1-5]-[A-Z ]+$')
      |      THEN 1 ELSE 0 END) AS BIGINT) AS v_re,
      |    CAST(SUM(CASE WHEN o_orderstatus IS NULL OR
      |      o_orderstatus NOT IN ('O', 'F')
      |      THEN 1 ELSE 0 END) AS BIGINT) AS v_set
      |  FROM orders),
      |u1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(COUNT(*) - (SELECT COUNT(*) FROM
      |    (SELECT DISTINCT o_orderkey FROM orders)) AS BIGINT) AS v
      |  FROM orders),
      |u2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(COUNT(*) - (SELECT COUNT(*) FROM
      |    (SELECT DISTINCT o_custkey FROM orders)) AS BIGINT) AS v
      |  FROM orders),
      |fk AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v
      |  FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
      |    ON o.o_custkey = c.c_custkey
      |  WHERE o.o_custkey IS NOT NULL)
      |SELECT * FROM (
      |  SELECT 'custkey_not_null' AS check_name, 'not_null' AS kind,
      |    n AS n_rows, v_nn AS n_violations, v_nn = 0 AS pass FROM r
      |  UNION ALL
      |  SELECT 'totalprice_range', 'in_range', n, v_rng, v_rng = 0 FROM r
      |  UNION ALL
      |  SELECT 'orderpriority_format', 'matches', n, v_re, v_re = 0 FROM r
      |  UNION ALL
      |  SELECT 'orderstatus_domain', 'in_set', n, v_set, v_set = 0 FROM r
      |  UNION ALL
      |  SELECT 'orderkey_unique', 'unique', n, v, v = 0 FROM u1
      |  UNION ALL
      |  SELECT 'custkey_unique', 'unique', n, v, v = 0 FROM u2
      |  UNION ALL
      |  SELECT 'custkey_fk', 'ref_integrity', n, v, v = 0 FROM fk)
      |ORDER BY check_name""".stripMargin

  val curExpectations = dfQ("cur_expectations", expectationsOracle,
    bench = false) { (s, _) =>
    import graft.operators.Expectations
    val orders = s.table("orders")
    Expectations.validate(orders, Seq(
        Expectations.NotNull("custkey_not_null", "o_custkey"),
        Expectations.InRange("totalprice_range", "o_totalprice",
          lit(0.0), lit(100000.0)),
        Expectations.Matches("orderpriority_format", "o_orderpriority",
          "^[1-5]-[A-Z ]+$"),
        Expectations.InSet("orderstatus_domain", "o_orderstatus",
          Seq("O", "F")),
        Expectations.Unique("orderkey_unique", Seq("o_orderkey")),
        Expectations.Unique("custkey_unique", Seq("o_custkey")),
        Expectations.RefIntegrity("custkey_fk", Seq("o_custkey"),
          s.table("customer"), Seq("c_custkey"))))
      .select(col("check").as("check_name"), col("kind"), col("n_rows"),
        col("n_violations"), col("pass"))
      .orderBy("check_name")
  }

  val all: Seq[Q] = Seq(
    curDecontaminate, curDecontaminateSpans, curChunk, curPack, curPii, curRepetition,
    curDomainFilter, curUrlCanon, curMixDomains, curMixSkew, curMixTokens,
    curMixTokensSkew, curLineDedup, curResampleWeight, curUpsampleWeight,
    curSplitHash, curPackShuffled, curPackBins, curBloomGate, curExpectations,
    curCorpusReport,
    pipeCurateMix, pipeGateResampleSplit, pipeEpochAssembly, pipeBloomMix)
}
