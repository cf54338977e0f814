package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.filter.MetadataFilterDsl
import graft.operators.{BM25, Dedup, Expansion, Graph, Knn}

/** Text-quality and normalization rows (quality_*, text_*, PII, boilerplate).
  *
  * One family slice of the [[SparkEntry]] driver contract (split in
  * r15 so per-round diffs stay reviewable): `queries` entries and
  * their DuckDB `oracle` SQL live side by side; [[SparkEntry]]
  * aggregates the families. Shared fixtures: [[EntryFixtures]];
  * shared oracle CTE builders: [[OracleCtes]]. The determinism
  * rules (DECIMAL money, 6-decimal score rounding before ranking,
  * id tie-breaks, explicit ORDER BY under LIMIT) are documented
  * once on [[SparkEntry]]. */
private[graft] object EntryText {
  import EntryFixtures._
  import OracleCtes._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ----- text analysis (training-data pipeline) -----
    "text_metrics" -> ((s, dir) => {
      import graft.functions.TextFunctions._
      Tables.documents(s, dir).select(
        col("doc_id"),
        wordCount(col("text")).as("n_words"),
        approxBpeTokenCount(col("text")).as("n_tokens_est"),
        qualityScore(col("text")).as("quality"))
        .orderBy("doc_id").limit(200)
    }),

    "text_lang_fp" -> ((s, dir) => {
      import graft.functions.TextFunctions._
      Tables.documents(s, dir).select(
        col("doc_id"),
        langId(col("text")).as("lang_pred"),
        fingerprint(col("text")).as("fp"))
        .orderBy("doc_id").limit(200)
    }),

    // Canonical text normalization (NFC + control strip + whitespace
    // canonicalization — the pass crawled text gets before any byte-
    // comparing operator). The ASCII corpus would make NFC a no-op, so
    // a suffix with a decomposed accent, a BEL control, tab runs and
    // blank-line spam is appended in BOTH engines — every normalization
    // arm fires on every row. NfcNormalize is a codegen'd Catalyst
    // expression: the whole pipeline fuses into one projection.
    "text_normalize" -> ((s, dir) => {
      import graft.functions.TextFunctions._
      // "cafe" + combining acute (decomposed e-acute), BEL between x
      // and y, tab before z, blank-line and space spam around it all
      val suffix = "\n\n\n  cafe\u0301  x\u0007y\tz  "
      Tables.documents(s, dir).select(
        col("doc_id"),
        normalizeText(concat(col("text"), lit(suffix))).as("text_norm"))
        .orderBy("doc_id").limit(200)
    }),

    // HTML → text extraction (the layer between a WARC crawl's raw
    // payloads and every text operator). A deterministic page is built
    // around each document's text — entity-bearing title, style/script/
    // comment noise (the script body contains a bare '<' that would
    // break naive tag-stripping), block structure, links — then
    // title/body/links are extracted. Pure zero-shuffle regexp_replace
    // chain; the oracle SQL is GENERATED from the same stage lists
    // (HtmlFunctions.htmlToTextSql), so engines cannot drift silently.
    "text_html_extract" -> ((s, dir) => {
      import graft.functions.HtmlFunctions._
      val html = concat(
        lit("<html><head><title> Doc "), col("doc_id"),
        lit(" &amp; notes </title><style>p { color: red }</style></head>"),
        lit("<body><!-- nav bar --><h1>Doc "), col("doc_id"),
        lit("</h1><p>"), col("text"),
        lit("</p><script>var x = 1 < 2;</script>"),
        lit("<a href=\"https://example.com/a?b=1\">A</a> &lt;end&gt;</body></html>"))
      Tables.documents(s, dir).select(
        col("doc_id"),
        htmlTitle(html).as("title"),
        htmlToText(html).as("body_text"),
        // joined, not array-typed: the driver compare sorts column
        // values, and array cells defeat the hash path
        concat_ws("|", htmlLinks(html)).as("links"))
        .orderBy("doc_id").limit(200)
    }),

    // URL canonicalization + registered-domain extraction (the layer
    // between a WARC crawl and URL-dedup / domain-mixing). Three URL
    // shapes constructed deterministically per doc_id: case/port/www/
    // tracking-param/fragment junk, a two-level ccTLD suffix, and a
    // deep subdomain with a trailing slash — every canonicalization arm
    // fires. Pure zero-shuffle projection.
    "url_canonical" -> ((s, dir) => {
      import graft.functions.UrlFunctions._
      val url = when(col("doc_id") % 3 === 0,
          concat(lit("HTTPS://WWW."), col("source"), lit(".Example.COM:443/Path/"),
            col("doc_id"), lit("/?utm_source=feed&b=2&a=1#sec")))
        .when(col("doc_id") % 3 === 1,
          // non-default port: kept in the canonical URL, stripped from
          // the registered domain (the r6 ADVICE port-fragmentation fix)
          concat(lit("http://"), col("source"), lit(".co.uk:8080/path?z=9&y=8")))
        .otherwise(concat(lit("https://sub."), col("source"), lit(".example.com/a/b/")))
      Tables.documents(s, dir).select(
          col("doc_id"),
          canonicalizeUrl(url).as("url_canon"),
          urlDomain(url).as("domain"))
        .orderBy("doc_id").limit(300)
    }),

    // ----- corpus cleaning (pretraining-data pipeline) -----
    // Gopher document-quality rules: zero-shuffle per-row projection.
    "quality_gopher" -> ((s, dir) => {
      graft.operators.CorpusClean.gopherFlags(
          Tables.documents(s, dir), "doc_id", "text", minWords = 50)
        .orderBy("doc_id").limit(500)
    }),

    // The CCNet deployment shape of the LM scorer: model trained on the
    // even-id half of the corpus, odd-id half scored under it — unseen
    // bigrams exercise the Laplace backoff (model-miss → ln(1/(ctx+37)),
    // context-miss → ln(1/37)), the path quality_lm can't reach.
    "quality_lm_apply" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val model = graft.operators.CorpusClean.lmModel(
        docs.filter(col("doc_id") % 2 === 0), "doc_id", "text")
      graft.operators.CorpusClean.lmScoreWith(model,
          docs.filter(col("doc_id") % 2 === 1), "doc_id", "text")
        .orderBy("doc_id").limit(500)
    }),

    // Trainable Naive Bayes document classifier (the GPT-3/CCNet
    // quality-classifier shape, closed-form so train AND apply are
    // oracle-checked): fit on the even-id half predicting lang, argmax
    // posterior on the held-out odd-id half.
    "quality_nb" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val model = graft.operators.TextClassifier.train(
        docs.filter(col("doc_id") % 2 === 0), "lang", "text")
      graft.operators.TextClassifier.predict(
          docs.filter(col("doc_id") % 2 === 1), model, "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    // Gopher's within-document repetition rules (duplicate lines, top
    // 2-gram coverage, duplicated 5-gram coverage) — the companion to
    // quality_gopher's length/symbol/stopword subset. Every rollup is
    // doc-keyed with map-side combine.
    "quality_repetition" -> ((s, dir) => {
      graft.operators.CorpusClean.repetitionFlags(
          Tables.documents(s, dir), "doc_id", "text")
        .orderBy("doc_id").limit(500)
    }),

    // C4's line-level cleaning rules (Raffel et al. 2020 §2.2) over the
    // deterministically linified corpus: terminal-punctuation + word
    // count + blocklist per line, block-phrase / brace / min-kept-lines
    // per doc. Blocklists use corpus vocabulary ("dup" lines, the
    // "slow slow" phrase) so both rule arms fire on real data. Pure
    // zero-shuffle projection.
    "quality_c4" -> ((s, dir) => {
      graft.operators.CorpusClean.c4LineFlags(
          Tables.documents(s, dir)
            .select(col("doc_id"), linified(col("text")).as("text")),
          "doc_id", "text",
          minLineWords = 5, minKeptLines = 3,
          lineBlocklist = Seq("dup"), docBlockPhrases = Seq("slow slow"))
        .orderBy("doc_id").limit(500)
    }),

    // Char-bigram LM quality score (CCNet's perplexity filter without
    // the external model): corpus-trained Laplace-smoothed bigram
    // conditionals, each doc scored by mean ln p over its bigram
    // occurrences. Model fits in KBs and broadcasts; the doc-side
    // shuffle is capped at 37^2 rows/doc by map-side combine.
    "quality_lm" -> ((s, dir) => {
      graft.operators.CorpusClean.lmScore(
          Tables.documents(s, dir), "doc_id", "text")
        .orderBy("doc_id").limit(500)
    }),

    // CCNet's selection stage: head/middle/tail terciles of the LM
    // score per language (thresholds broadcast, assignment map-side).
    "quality_ppl_buckets" -> ((s, dir) => {
      graft.operators.CorpusClean.perplexityBuckets(
          Tables.documents(s, dir), "doc_id", "text", "lang")
        .orderBy("doc_id")
    }),

    // Cross-document repeated 5-grams -> per-doc boilerplate coverage
    // (Lee et al. 2021). One groupBy on the gram + a broadcast join of
    // the (small, head-of-distribution) repeated set back to docs.
    "boilerplate_ngrams" -> ((s, dir) => {
      graft.operators.CorpusClean.boilerplateCoverage(
          Tables.documents(s, dir), "doc_id", "text", n = 5, minDocs = 2)
        .orderBy("doc_id").limit(500)
    }),

    // PII redaction: the payload is derived deterministically from event
    // keys so the regex parity (email/phone/IPv4, Java regex vs RE2) is
    // actually exercised — the raw synthetic tables contain no PII.
    "pii_scrub" -> ((s, dir) => {
      val ev = Tables.eventsWithTs(s, dir)
        .filter(col("event_id") < 2000)
        .select(col("event_id"), col("user_id"))
      val payload = concat(
        lit("user"), col("user_id"), lit("@example.com said hi from 10.0."),
        col("user_id") % 256, lit("."), col("event_id") % 256,
        lit(" call 555-"),
        lpad((col("event_id") % 1000).cast("string"), 3, "0"), lit("-0199"))
      graft.operators.CorpusClean.piiScrub(
          ev.withColumn("payload", payload), "payload", keep = Seq("event_id"))
        .orderBy("event_id").limit(1000)
    }),
  )

  def oracle: Map[String, String] = Map(

    "text_metrics" ->
      """WITH base AS (
        |  SELECT doc_id, text,
        |         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                     t -> length(t) > 1) AS toks,
        |         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                     t -> length(t) > 0) AS words0,
        |         greatest(length(text), 1)::DOUBLE AS len
        |  FROM documents),
        |m AS (
        |  SELECT doc_id,
        |         len(list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0)) AS n_words,
        |         CAST(coalesce(list_sum(list_transform(words0,
        |             w -> CAST(ceil(length(w) / 4.0) AS BIGINT))), 0)
        |           + length(regexp_replace(lower(text), '[a-z0-9\s]', '', 'g')) AS BIGINT) AS n_tokens_est,
        |         (length(lower(text)) - length(regexp_replace(lower(text), '[a-z]', '', 'g'))) / len AS alpha,
        |         (length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))) / len AS digits,
        |         (length(text) - length(regexp_replace(text, '[\s]', '', 'g'))) / len AS spaces,
        |         greatest(len(toks), 1)::DOUBLE AS ntok,
        |         len(list_filter(toks, t -> t IN %STOP%))::DOUBLE AS stophits,
        |         coalesce(list_sum(list_transform(toks, t -> length(t))), 0)::DOUBLE AS toklen
        |  FROM base)
        |SELECT doc_id, n_words, n_tokens_est,
        |       round(least(1.0,
        |         alpha * 0.4 + (1.0 - digits) * 0.1 + (stophits / ntok) * 0.2 +
        |         (CASE WHEN toklen / ntok >= 3 AND toklen / ntok <= 10 THEN 1.0 ELSE 0.5 END) * 0.15 +
        |         (CASE WHEN spaces >= 0.05 AND spaces <= 0.4 THEN 1.0 ELSE 0.5 END) * 0.15), 6) AS quality
        |FROM m
        |ORDER BY doc_id
        |LIMIT 200""".stripMargin.replace("%STOP%", stopList),

    "text_lang_fp" ->
      """WITH base AS (
        |  SELECT doc_id, text,
        |         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                     t -> length(t) > 1) AS toks
        |  FROM documents),
        |h AS (
        |  SELECT doc_id,
        |         len(list_filter(toks, t -> t IN ('der','die','das','und','ist','nicht','ein','mit','auf','von'))) AS h_de,
        |         len(list_filter(toks, t -> t IN ('the','and','of','to','in','is','was','for','on','with'))) AS h_en,
        |         len(list_filter(toks, t -> t IN ('el','la','de','que','y','en','los','del','las','un'))) AS h_es,
        |         len(list_filter(toks, t -> t IN ('le','la','les','et','est','des','un','une','du','dans'))) AS h_fr,
        |         md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        |  FROM base)
        |SELECT doc_id,
        |       CASE WHEN greatest(h_de, h_en, h_es, h_fr) > 0 AND h_de = greatest(h_de, h_en, h_es, h_fr) THEN 'de'
        |            WHEN greatest(h_de, h_en, h_es, h_fr) > 0 AND h_en = greatest(h_de, h_en, h_es, h_fr) THEN 'en'
        |            WHEN greatest(h_de, h_en, h_es, h_fr) > 0 AND h_es = greatest(h_de, h_en, h_es, h_fr) THEN 'es'
        |            WHEN greatest(h_de, h_en, h_es, h_fr) > 0 AND h_fr = greatest(h_de, h_en, h_es, h_fr) THEN 'fr'
        |            ELSE 'und' END AS lang_pred,
        |       fp
        |FROM h
        |ORDER BY doc_id
        |LIMIT 200""".stripMargin,

    // The same normalization pipeline in DuckDB: nfc_normalize + the
    // identical RE2/Java-compatible replaces in the same order. The
    // suffix (decomposed accent / BEL / tabs / blank-line spam) is
    // rebuilt from chr() calls so the oracle JSON stays control-free.
    "text_normalize" ->
      """SELECT doc_id,
        |       trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |         nfc_normalize(text || chr(10) || chr(10) || chr(10) ||
        |                       '  cafe' || chr(769) || '  x' || chr(7) || 'y' ||
        |                       chr(9) || 'z  '),
        |         '[\x00-\x08\x0B-\x1F\x7F]', '', 'g'),
        |         '[ \t]+', ' ', 'g'),
        |         '[ ]*\n[ ]*', chr(10), 'g'),
        |         '\n{3,}', chr(10) || chr(10), 'g')) AS text_norm
        |FROM documents
        |ORDER BY doc_id
        |LIMIT 200""".stripMargin,

    // The extraction chain in SQL is generated from HtmlFunctions'
    // stage lists (same patterns, same order, same replacements — chr()
    // for the newline so the oracle JSON stays control-free).
    "text_html_extract" ->
      s"""WITH h AS (
         |  SELECT doc_id,
         |    '<html><head><title> Doc ' || doc_id || ' &amp; notes </title><style>p { color: red }</style></head>' ||
         |    '<body><!-- nav bar --><h1>Doc ' || doc_id || '</h1><p>' || text ||
         |    '</p><script>var x = 1 < 2;</script>' ||
         |    '<a href="https://example.com/a?b=1">A</a> &lt;end&gt;</body></html>' AS html
         |  FROM documents)
         |SELECT doc_id,
         |       ${graft.functions.HtmlFunctions.htmlTitleSql("html")} AS title,
         |       ${graft.functions.HtmlFunctions.htmlToTextSql("html")} AS body_text,
         |       array_to_string(regexp_extract_all(html, '(?i)href\\s*=\\s*"([^"]*)"', 1), '|') AS links
         |FROM h
         |ORDER BY doc_id
         |LIMIT 200""".stripMargin,

    // The same URL pipeline in SQL: identical RE2/Java-compatible part
    // regexes, list_filter/list_sort for the query params, negative
    // label indexing for the registered domain.
    "url_canonical" ->
      s"""WITH u AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 3 = 0 THEN 'HTTPS://WWW.' || source || '.Example.COM:443/Path/' || doc_id || '/?utm_source=feed&b=2&a=1#sec'
         |         WHEN doc_id % 3 = 1 THEN 'http://' || source || '.co.uk:8080/path?z=9&y=8'
         |         ELSE 'https://sub.' || source || '.example.com/a/b/' END AS url
         |  FROM documents),
         |parts AS (
         |  SELECT doc_id,
         |    lower(regexp_extract(url, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)) AS scheme,
         |    regexp_replace(regexp_replace(
         |      lower(regexp_extract(trim(url), '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1)),
         |      ':(80|443)$$', ''), '^www\\.', '') AS host,
         |    regexp_replace(regexp_extract(trim(url),
         |      '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)', 1), '/+$$', '') AS path,
         |    array_to_string(list_sort(list_filter(
         |      string_split(regexp_extract(url, '\\?([^#]*)', 1), '&'),
         |      p -> length(p) > 0 AND NOT regexp_matches(p,
         |        '^(utm_[a-z0-9]+|fbclid|gclid|msclkid|ref|mc_cid|mc_eid)='))), '&') AS q
         |  FROM u),
         |canon AS (
         |  SELECT doc_id,
         |    CASE WHEN length(scheme) = 0 THEN ''
         |         ELSE scheme || '://' || host || path ||
         |              CASE WHEN length(q) > 0 THEN '?' || q ELSE '' END END AS url_canon,
         |    string_split(regexp_replace(host, ':[0-9]+$$', ''), '.') AS labels
         |  FROM parts)
         |SELECT doc_id, url_canon,
         |  CASE WHEN len(labels) <= 1 THEN array_to_string(labels, '.')
         |       WHEN len(labels) >= 3 AND (labels[-2] || '.' || labels[-1]) IN %SUFFIX%
         |         THEN labels[-3] || '.' || labels[-2] || '.' || labels[-1]
         |       ELSE labels[-2] || '.' || labels[-1] END AS domain
         |FROM canon
         |ORDER BY doc_id
         |LIMIT 300""".stripMargin
        .replace("%SUFFIX%", sqlList(graft.functions.UrlFunctions.TwoLevelSuffixes)),

    // Ratios are rounded to 6 decimals BEFORE threshold comparison in
    // both engines (CorpusClean.gopherFlags does the same), so boolean
    // rule outcomes cannot diverge on FP boundaries.
    "quality_gopher" ->
      """WITH base AS (
        |  SELECT doc_id, text,
        |         list_filter(string_split_regex(text, '\s+'), w -> length(w) > 0) AS ws,
        |         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                     t -> length(t) > 1) AS toks
        |  FROM documents),
        |m AS (
        |  SELECT doc_id,
        |         CAST(len(ws) AS BIGINT) AS n_words,
        |         round(coalesce(list_sum(list_transform(ws, w -> length(w))), 0)::DOUBLE
        |               / greatest(len(ws), 1)::DOUBLE, 6) AS mean_word_len,
        |         round(len(list_filter(ws, w -> regexp_matches(w, '[a-zA-Z]')))::DOUBLE
        |               / greatest(len(ws), 1)::DOUBLE, 6) AS alpha_word_ratio,
        |         round(((length(text) - length(regexp_replace(text, '[#]', '', 'g')))
        |                + CAST((length(text) - length(replace(text, '...', ''))) / 3 AS BIGINT))::DOUBLE
        |               / greatest(len(ws), 1)::DOUBLE, 6) AS symbol_ratio,
        |         CAST(len(list_filter(toks, t -> t IN %STOP%)) AS BIGINT) AS stop_hits
        |  FROM base)
        |SELECT doc_id, n_words, mean_word_len, alpha_word_ratio, symbol_ratio, stop_hits,
        |       (n_words >= 50 AND n_words <= 100000) AS pass_word_count,
        |       (mean_word_len >= 3.0 AND mean_word_len <= 10.0) AS pass_word_len,
        |       (alpha_word_ratio >= 0.8) AS pass_alpha,
        |       (symbol_ratio <= 0.1) AS pass_symbol,
        |       (stop_hits >= 2) AS pass_stops,
        |       (n_words >= 50 AND n_words <= 100000
        |        AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
        |        AND alpha_word_ratio >= 0.8 AND symbol_ratio <= 0.1
        |        AND stop_hits >= 2) AS passes
        |FROM m
        |ORDER BY doc_id
        |LIMIT 500""".stripMargin.replace("%STOP%", stopList),

    // Train on even ids, score odd ids; COALESCE arms replay
    // lmScoreWith's backoff exactly (model-miss then context-miss).
    "quality_lm_apply" ->
      """WITH nt AS (
        |  SELECT doc_id,
        |         trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS t
        |  FROM documents),
        |dg AS (
        |  SELECT doc_id, bg, count(*) AS n FROM (
        |    SELECT doc_id,
        |           unnest(list_transform(generate_series(1, greatest(length(t) - 1, 0)),
        |                                 i -> substr(t, i, 2))) AS bg
        |    FROM nt) GROUP BY 1, 2),
        |tr AS (SELECT bg, sum(n) AS cnt FROM dg WHERE doc_id % 2 = 0 GROUP BY 1),
        |cc AS (SELECT substr(bg, 1, 1) AS c0, sum(cnt) AS ctx FROM tr GROUP BY 1),
        |lp AS (
        |  SELECT bg, ln((cnt + 1.0) / (ctx + 37.0)) AS lp
        |  FROM tr JOIN cc ON substr(tr.bg, 1, 1) = cc.c0)
        |SELECT d.doc_id, CAST(sum(n) AS BIGINT) AS n_bigrams,
        |       round(sum(n * COALESCE(lp.lp,
        |               ln(1.0 / (COALESCE(cc2.ctx, 0) + 37.0)))) / sum(n), 6) AS avg_logp
        |FROM dg d
        |LEFT JOIN lp USING (bg)
        |LEFT JOIN cc cc2 ON substr(d.bg, 1, 1) = cc2.c0
        |WHERE d.doc_id % 2 = 1
        |GROUP BY 1
        |ORDER BY doc_id
        |LIMIT 500""".stripMargin,

    // Multinomial NB, Laplace-smoothed over V+1 slots; a (term, class)
    // pair with no count row smooths to the same value as the unseen
    // slot, so the LEFT JOIN's null arm is exactly log_zero.
    "quality_nb" ->
      """WITH tt AS (
        |  SELECT lang AS cls,
        |         unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                            t -> length(t) > 1)) AS term
        |  FROM documents WHERE doc_id % 2 = 0),
        |nct AS (SELECT cls, term, count(*) AS n FROM tt GROUP BY 1, 2),
        |v AS (SELECT count(DISTINCT term) AS v FROM nct),
        |nc AS (SELECT cls, sum(n) AS n_tot FROM nct GROUP BY 1),
        |tlp AS (
        |  SELECT cls, term, ln((n + 1.0) / (n_tot + 1.0 * (v + 1))) AS log_theta
        |  FROM nct JOIN nc USING (cls) CROSS JOIN v),
        |dc AS (SELECT lang AS cls, count(*) AS n_docs
        |       FROM documents WHERE doc_id % 2 = 0 GROUP BY 1),
        |tot AS (SELECT sum(n_docs) AS total FROM dc),
        |cs AS (
        |  SELECT cls, ln(n_docs::DOUBLE / total) AS log_prior,
        |         ln(1.0 / (n_tot + 1.0 * (v + 1))) AS log_zero
        |  FROM dc CROSS JOIN tot JOIN nc USING (cls) CROSS JOIN v),
        |test AS (
        |  SELECT doc_id AS id,
        |         unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                            t -> length(t) > 1)) AS term
        |  FROM documents WHERE doc_id % 2 = 1),
        |dtf AS (SELECT id, term, count(*) AS tf FROM test GROUP BY 1, 2),
        |dtot AS (SELECT id, sum(tf) AS ttf FROM dtf GROUP BY 1),
        |m AS (SELECT id, cls, sum(tf * log_theta) AS s, sum(tf) AS mtf
        |      FROM dtf JOIN tlp USING (term) GROUP BY 1, 2),
        |sc AS (
        |  SELECT dtot.id, cs.cls,
        |         round(cs.log_prior + coalesce(m.s, 0) +
        |               (dtot.ttf - coalesce(m.mtf, 0)) * cs.log_zero, 6) AS score
        |  FROM dtot CROSS JOIN cs
        |  LEFT JOIN m ON m.id = dtot.id AND m.cls = cs.cls)
        |SELECT id AS doc_id, cls AS pred, score
        |FROM sc
        |QUALIFY row_number() OVER (PARTITION BY id ORDER BY score DESC, cls) = 1
        |ORDER BY doc_id""".stripMargin,

    // Ratios rounded to 6 before threshold booleans (house style); the
    // top-2-gram tie breaks (count desc, gram asc) in both engines.
    "quality_repetition" ->
      """WITH base AS (
        |  SELECT doc_id, CAST(length(text) AS BIGINT) AS total_chars FROM documents),
        |lo AS (
        |  SELECT doc_id, trim(l) AS line
        |  FROM (SELECT doc_id, unnest(string_split(text, chr(10))) AS l FROM documents)
        |  WHERE length(trim(l)) > 0),
        |lc AS (SELECT doc_id, line, count(*) AS c FROM lo GROUP BY 1, 2),
        |ls AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_lines,
        |         CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup_occ,
        |         CAST(sum(c * length(line)) AS BIGINT) AS line_chars,
        |         CAST(sum(CASE WHEN c > 1 THEN c * length(line) ELSE 0 END) AS BIGINT) AS dup_line_chars
        |  FROM lc GROUP BY 1),
        |tk AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                             t -> length(t) > 1) AS toks
        |  FROM documents),
        |g2c AS (
        |  SELECT doc_id, g, count(*) AS c FROM (
        |    SELECT doc_id, unnest(list_transform(generate_series(1, greatest(len(toks) - 1, 0)),
        |                                         i -> toks[i] || ' ' || toks[i+1])) AS g
        |    FROM tk) GROUP BY 1, 2),
        |t2 AS (
        |  SELECT doc_id, g AS top_2gram, c * length(g) AS top2_chars
        |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY c DESC, g DESC) AS rn
        |        FROM g2c)
        |  WHERE rn = 1),
        |g5c AS (
        |  SELECT doc_id, g, count(*) AS c FROM (
        |    SELECT doc_id, unnest(list_transform(generate_series(1, greatest(len(toks) - 4, 0)),
        |                                         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |                                              || ' ' || toks[i+3] || ' ' || toks[i+4])) AS g
        |    FROM tk) GROUP BY 1, 2),
        |d5 AS (
        |  SELECT doc_id, CAST(sum(CASE WHEN c > 1 THEN c * length(g) ELSE 0 END) AS BIGINT) AS dup5_chars
        |  FROM g5c GROUP BY 1),
        |m AS (
        |  SELECT b.doc_id,
        |         COALESCE(n_lines, 0) AS n_lines,
        |         round(COALESCE(dup_occ, 0)::DOUBLE / greatest(COALESCE(n_lines, 0), 1), 6) AS dup_line_frac,
        |         round(COALESCE(dup_line_chars, 0)::DOUBLE / greatest(COALESCE(line_chars, 0), 1), 6) AS dup_line_char_frac,
        |         COALESCE(top_2gram, '') AS top_2gram,
        |         round(least(COALESCE(top2_chars, 0)::DOUBLE / greatest(total_chars, 1), 1.0), 6) AS top_2gram_char_frac,
        |         round(least(COALESCE(dup5_chars, 0)::DOUBLE / greatest(total_chars, 1), 1.0), 6) AS dup_5gram_char_frac
        |  FROM base b
        |  LEFT JOIN ls USING (doc_id)
        |  LEFT JOIN t2 USING (doc_id)
        |  LEFT JOIN d5 USING (doc_id))
        |SELECT doc_id, n_lines, dup_line_frac, dup_line_char_frac, top_2gram,
        |       top_2gram_char_frac, dup_5gram_char_frac,
        |       (dup_line_frac <= 0.30) AS pass_dup_line,
        |       (dup_line_char_frac <= 0.20) AS pass_dup_line_char,
        |       (top_2gram_char_frac <= 0.20) AS pass_top_2gram,
        |       (dup_5gram_char_frac <= 0.15) AS pass_dup_5gram,
        |       (dup_line_frac <= 0.30 AND dup_line_char_frac <= 0.20
        |        AND top_2gram_char_frac <= 0.20 AND dup_5gram_char_frac <= 0.15) AS passes
        |FROM m
        |ORDER BY doc_id
        |LIMIT 500""".stripMargin,

    // C4 line rules over the linified corpus; every rule is a
    // substring/regex test, so flags and the rebuilt text_clean are
    // byte-exactly reproducible.
    "quality_c4" ->
      s"""WITH $linifiedCtes,
         |fl AS (
         |  SELECT doc_id, lines,
         |         list_filter(lines, l -> regexp_matches(trim(l), '[.!?"]$$')
         |           AND len(list_filter(string_split_regex(l, '\\s+'), w -> length(w) > 0)) >= 5
         |           AND NOT contains(lower(l), 'dup')) AS kept,
         |         array_to_string(lines, chr(10)) AS text2
         |  FROM lnf)
         |SELECT doc_id,
         |       CAST(len(lines) AS BIGINT) AS n_lines,
         |       CAST(len(kept) AS BIGINT) AS n_kept_lines,
         |       coalesce(array_to_string(kept, chr(10)), '') AS text_clean,
         |       contains(lower(text2), 'slow slow') AS has_block_phrase,
         |       contains(text2, '{') AS has_brace,
         |       NOT contains(lower(text2), 'slow slow') AND NOT contains(text2, '{')
         |         AND len(kept) >= 3 AS keep_doc
         |FROM fl
         |ORDER BY doc_id
         |LIMIT 500""".stripMargin,

    // Sum order inside a doc's rollup is engine-dependent, so avg_logp
    // rounds to 6 (error ~1e-14 at these magnitudes); ln itself matches
    // within that rounding (same stance as the BM25 idf oracles).
    "quality_lm" ->
      """WITH nt AS (
        |  SELECT doc_id,
        |         trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS t
        |  FROM documents),
        |g AS (
        |  SELECT doc_id,
        |         unnest(list_transform(generate_series(1, greatest(length(t) - 1, 0)),
        |                               i -> substr(t, i, 2))) AS bg
        |  FROM nt),
        |dg AS (SELECT doc_id, bg, count(*) AS n FROM g GROUP BY 1, 2),
        |gc AS (SELECT bg, sum(n) AS cnt FROM dg GROUP BY 1),
        |cc AS (SELECT substr(bg, 1, 1) AS c0, sum(cnt) AS ctx FROM gc GROUP BY 1),
        |lp AS (
        |  SELECT bg, ln((cnt + 1.0) / (ctx + 37.0)) AS lp
        |  FROM gc JOIN cc ON substr(gc.bg, 1, 1) = cc.c0)
        |SELECT dg.doc_id, CAST(sum(n) AS BIGINT) AS n_bigrams,
        |       round(sum(n * lp.lp) / sum(n), 6) AS avg_logp
        |FROM dg JOIN lp USING (bg)
        |GROUP BY 1
        |ORDER BY doc_id
        |LIMIT 500""".stripMargin,

    // The quality_lm scoring CTE + per-language tercile thresholds
    // (quantile_cont == Spark's interpolated percentile, the
    // q_percentiles-pinned parity), both rounded to 6 before the
    // bucket CASE.
    "quality_ppl_buckets" ->
      """WITH nt AS (
        |  SELECT doc_id, lang,
        |         trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS t
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, lang,
        |         unnest(list_transform(generate_series(1, greatest(length(t) - 1, 0)),
        |                               i -> substr(t, i, 2))) AS bg
        |  FROM nt),
        |dg AS (SELECT doc_id, lang, bg, count(*) AS n FROM g GROUP BY 1, 2, 3),
        |gc AS (SELECT bg, sum(n) AS cnt FROM dg GROUP BY 1),
        |cc AS (SELECT substr(bg, 1, 1) AS c0, sum(cnt) AS ctx FROM gc GROUP BY 1),
        |lp AS (
        |  SELECT bg, ln((cnt + 1.0) / (ctx + 37.0)) AS lp
        |  FROM gc JOIN cc ON substr(gc.bg, 1, 1) = cc.c0),
        |sc AS (
        |  SELECT dg.doc_id, dg.lang,
        |         round(sum(n * lp.lp) / sum(n), 6) AS avg_logp
        |  FROM dg JOIN lp USING (bg)
        |  GROUP BY 1, 2),
        |thr AS (
        |  SELECT lang, round(quantile_cont(avg_logp, 1.0/3.0), 6) AS t1,
        |         round(quantile_cont(avg_logp, 2.0/3.0), 6) AS t2
        |  FROM sc GROUP BY 1)
        |SELECT sc.doc_id, sc.lang, sc.avg_logp,
        |       CASE WHEN sc.avg_logp > thr.t2 THEN 'head'
        |            WHEN sc.avg_logp > thr.t1 THEN 'middle'
        |            ELSE 'tail' END AS bucket
        |FROM sc JOIN thr USING (lang)
        |ORDER BY doc_id""".stripMargin,

    "boilerplate_ngrams" ->
      """WITH tk AS (
        |  SELECT doc_id AS id,
        |         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                     t -> length(t) > 1) AS toks
        |  FROM documents),
        |g AS (
        |  SELECT DISTINCT id,
        |         unnest(list_transform(generate_series(1, greatest(len(toks) - 4, 0)),
        |                               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |                                    || ' ' || toks[i+3] || ' ' || toks[i+4])) AS s
        |  FROM tk),
        |rep AS (SELECT s FROM g GROUP BY s HAVING count(DISTINCT id) >= 2),
        |per AS (
        |  SELECT g.id, count(*) AS n_grams,
        |         CAST(sum(CASE WHEN r.s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_repeated
        |  FROM g LEFT JOIN rep r ON g.s = r.s
        |  GROUP BY g.id)
        |SELECT d.doc_id,
        |       coalesce(p.n_grams, 0) AS n_grams,
        |       coalesce(p.n_repeated, 0) AS n_repeated,
        |       round(coalesce(p.n_repeated, 0)::DOUBLE
        |             / greatest(coalesce(p.n_grams, 0), 1)::DOUBLE, 6) AS coverage
        |FROM documents d LEFT JOIN per p ON d.doc_id = p.id
        |ORDER BY doc_id
        |LIMIT 500""".stripMargin,

    // Email scrub runs before phone/IP in BOTH engines (emails contain
    // dots and digits) — the staged CTEs mirror CorpusClean.piiScrub's
    // expression nesting exactly.
    "pii_scrub" ->
      """WITH src AS (
        |  SELECT event_id,
        |         'user' || CAST(user_id AS VARCHAR) || '@example.com said hi from 10.0.'
        |           || CAST(user_id % 256 AS VARCHAR) || '.' || CAST(event_id % 256 AS VARCHAR)
        |           || ' call 555-' || lpad(CAST(event_id % 1000 AS VARCHAR), 3, '0') || '-0199' AS payload
        |  FROM events WHERE event_id < 2000),
        |s1 AS (
        |  SELECT event_id,
        |         CAST(len(regexp_extract_all(payload, '%EMAIL%')) AS BIGINT) AS n_emails,
        |         regexp_replace(payload, '%EMAIL%', '[EMAIL]', 'g') AS p1
        |  FROM src),
        |s2 AS (
        |  SELECT event_id, n_emails,
        |         CAST(len(regexp_extract_all(p1, '%PHONE%')) AS BIGINT) AS n_phones,
        |         regexp_replace(p1, '%PHONE%', '[PHONE]', 'g') AS p2
        |  FROM s1)
        |SELECT event_id, n_emails, n_phones,
        |       CAST(len(regexp_extract_all(p2, '%IP%')) AS BIGINT) AS n_ips,
        |       regexp_replace(p2, '%IP%', '[IP]', 'g') AS redacted
        |FROM s2
        |ORDER BY event_id
        |LIMIT 1000"""
        .stripMargin
        .replace("%EMAIL%", graft.operators.CorpusClean.EmailRegex)
        .replace("%PHONE%", graft.operators.CorpusClean.PhoneRegex)
        .replace("%IP%", graft.operators.CorpusClean.Ipv4Regex),
  )
}
