package graft.llm

import org.apache.spark.sql.functions._
import graft.queries.{GQ, QueryDefs}
import QueryDefs._

/** Text-analysis operators for LLM training-data pipelines (SURVEY §2 C):
  * exact dedup, token counting, quality scoring, language-ID heuristic,
  * document fingerprinting. All are per-row, shuffle-free computations
  * (the scale-friendly shape: no explode, no groupBy except where the
  * semantics demand one), expressed with codegen'd builtins only.
  */
object TextOps {

  private val Stop = Seq("the", "a", "of", "and", "to", "in", "is", "for", "on", "with")
  private val StopSql = Stop.map(w => s"'$w'").mkString("(", ", ", ")")

  // Marker word sets for the language-ID heuristic. The synthetic corpus
  // shares one vocabulary, so accuracy vs the `lang` label is incidental —
  // the operator contract is a deterministic n-gram/stopword classifier.
  private val Markers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "nicht"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "es" -> Seq("el", "los", "las", "y", "que"),
    "en" -> Seq("the", "a", "is", "and", "of"))

  val queries: Seq[GQ] = Seq(
    // C1 ---------------------------------------------------------------
    GQ("dedup_exact", (s, d) => {
      import s.implicits._
      table(s, d, "documents")
        .withColumn("h", md5(concat_ws(" ", tokens($"text"))))
        .groupBy($"h")
        .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
        .orderBy($"h")
    }, Some("""
      SELECT h, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies FROM (
        SELECT doc_id, md5(array_to_string(regexp_extract_all(lower(text), '[a-z0-9]+'), ' ')) AS h
        FROM documents)
      GROUP BY h ORDER BY h""")),

    // C7 ---------------------------------------------------------------
    GQ("text_tokens", (s, d) => {
      import s.implicits._
      table(s, d, "documents")
        .withColumn("t", tokens($"text"))
        .select(
          $"doc_id",
          length($"text").cast("long").as("n_chars_measured"),
          size($"t").cast("long").as("n_words"),
          size(regexp_extract_all($"text", lit("[a-zA-Z']+|[0-9]|[^a-zA-Z0-9\\s]"), lit(0))).cast("long").as("n_bpeish"),
          ceil(length($"text") / lit(4.0)).cast("long").as("n_est_bpe"))
        .orderBy($"doc_id")
    }, Some("""
      SELECT doc_id,
        CAST(length(text) AS BIGINT) AS n_chars_measured,
        CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS n_words,
        CAST(len(regexp_extract_all(text, '[a-zA-Z'']+|[0-9]|[^a-zA-Z0-9\s]')) AS BIGINT) AS n_bpeish,
        CAST(ceil(length(text)/4.0) AS BIGINT) AS n_est_bpe
      FROM documents ORDER BY doc_id"""), bench = true),

    // C8 ---------------------------------------------------------------
    GQ("text_quality", (s, d) => {
      import s.implicits._
      val stopArr = array(Stop.map(lit): _*)
      table(s, d, "documents")
        .withColumn("t", tokens($"text"))
        .withColumn("n_tok", greatest(size($"t"), lit(1)).cast("double"))
        .withColumn("punct_ratio",
          size(regexp_extract_all($"text", lit("[.,;:!?]"), lit(0))).cast("double") / greatest(length($"text"), lit(1)).cast("double"))
        .withColumn("digit_ratio",
          size(regexp_extract_all($"text", lit("[0-9]"), lit(0))).cast("double") / greatest(length($"text"), lit(1)).cast("double"))
        .withColumn("stop_ratio",
          size(filter($"t", x => array_contains(stopArr, x))).cast("double") / $"n_tok")
        .withColumn("distinct_ratio", size(array_distinct($"t")).cast("double") / $"n_tok")
        .withColumn("quality_score",
          $"stop_ratio" * lit(0.4) + $"distinct_ratio" * lit(0.3) +
            (lit(1.0) - $"punct_ratio") * lit(0.2) + (lit(1.0) - $"digit_ratio") * lit(0.1))
        .select($"doc_id", $"punct_ratio", $"digit_ratio", $"stop_ratio",
          $"distinct_ratio", $"quality_score")
        .orderBy($"doc_id")
    }, Some(s"""
      SELECT doc_id, punct_ratio, digit_ratio, stop_ratio, distinct_ratio,
        stop_ratio*0.4 + distinct_ratio*0.3 + (1.0-punct_ratio)*0.2 + (1.0-digit_ratio)*0.1 AS quality_score
      FROM (
        SELECT doc_id,
          CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) / CAST(greatest(length(text), 1) AS DOUBLE) AS punct_ratio,
          CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE) / CAST(greatest(length(text), 1) AS DOUBLE) AS digit_ratio,
          CAST(len(list_filter(t, x -> x IN $StopSql)) AS DOUBLE) / CAST(greatest(len(t), 1) AS DOUBLE) AS stop_ratio,
          CAST(len(list_distinct(t)) AS DOUBLE) / CAST(greatest(len(t), 1) AS DOUBLE) AS distinct_ratio
        FROM (SELECT doc_id, text, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents))
      ORDER BY doc_id""")),

    // C9 ---------------------------------------------------------------
    GQ("text_langid", (s, d) => {
      import s.implicits._
      var df = table(s, d, "documents").withColumn("t", tokens($"text"))
      for ((lg, ws) <- Markers) {
        val arr = array(ws.map(lit): _*)
        df = df.withColumn(s"s_$lg", size(filter($"t", x => array_contains(arr, x))).cast("long"))
      }
      df = df.withColumn("pred_lang",
        when($"s_de" > $"s_en" && $"s_de" >= $"s_fr" && $"s_de" >= $"s_es", "de")
          .when($"s_fr" > $"s_en" && $"s_fr" >= $"s_es", "fr")
          .when($"s_es" > $"s_en", "es")
          .when($"s_en" > 0, "en")
          .otherwise("unknown"))
      df.groupBy($"lang", $"pred_lang")
        .agg(count(lit(1)).as("n"))
        .orderBy($"lang", $"pred_lang")
    }, {
      def hits(lg: String) = {
        val set = Markers.toMap.apply(lg).map(w => s"'$w'").mkString("(", ", ", ")")
        s"CAST(len(list_filter(t, x -> x IN $set)) AS BIGINT)"
      }
      Some(s"""
      SELECT lang, pred_lang, COUNT(*) AS n FROM (
        SELECT lang,
          CASE WHEN s_de > s_en AND s_de >= s_fr AND s_de >= s_es THEN 'de'
               WHEN s_fr > s_en AND s_fr >= s_es THEN 'fr'
               WHEN s_es > s_en THEN 'es'
               WHEN s_en > 0 THEN 'en'
               ELSE 'unknown' END AS pred_lang
        FROM (
          SELECT lang, ${hits("de")} AS s_de, ${hits("fr")} AS s_fr,
            ${hits("es")} AS s_es, ${hits("en")} AS s_en
          FROM (SELECT lang, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents)))
      GROUP BY lang, pred_lang ORDER BY lang, pred_lang""")
    }),

    // C13 --------------------------------------------------------------
    GQ("text_length_histogram", (s, d) => {
      import s.implicits._
      table(s, d, "documents")
        .withColumn("bucket", (floor(length($"text") / lit(100)) * 100).cast("long"))
        .groupBy($"source", $"bucket")
        .agg(count(lit(1)).as("n_docs"),
          sum(size(tokens($"text"))).cast("long").as("total_words"))
        .orderBy($"source", $"bucket")
    }, Some("""
      SELECT source, CAST(floor(length(text)/100)*100 AS BIGINT) AS bucket,
        COUNT(*) AS n_docs,
        CAST(SUM(len(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS BIGINT) AS total_words
      FROM documents GROUP BY source, CAST(floor(length(text)/100)*100 AS BIGINT)
      ORDER BY source, bucket""")),

    // C15 --------------------------------------------------------------
    // Deterministic stratified sampling: a per-source keep rate applied
    // through an md5-derived uniform on doc_id, so any engine (and any
    // rerun) selects the identical training subset. Per-row, shuffle-free
    // — the scale shape for building training mixes.
    GQ("sample_stratified", (s, d) => {
      import s.implicits._
      // rate by source suffix: src{k} keeps (1 + k%4)/4 of its docs
      val rate = (substring($"source", 4, 10).cast("int") % 4 + 1) / lit(4.0)
      val u = (conv(substring(md5($"doc_id".cast("string")), 1, 15), 16, 10)
        .cast("long") % 1000000L) / lit(1000000.0)
      table(s, d, "documents")
        .withColumn("rate", rate)
        .filter(u < $"rate")
        .select($"doc_id", $"source", $"rate")
        .orderBy($"doc_id")
    }, Some("""
      SELECT doc_id, source, (CAST(substr(source, 4) AS INTEGER) % 4 + 1)/4.0 AS rate
      FROM documents
      WHERE (CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 1000000)/1000000.0
            < (CAST(substr(source, 4) AS INTEGER) % 4 + 1)/4.0
      ORDER BY doc_id""")),

    // C16 --------------------------------------------------------------
    // PII scrubbing: email/phone redaction. The corpus is synthetic, so a
    // deterministic contact line is appended first to genuinely exercise
    // the replacements; output is the scrubbed hash + a replacement
    // count, per row, shuffle-free.
    GQ("text_pii_scrub", (s, d) => {
      import s.implicits._
      val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val phoneRe = "\\+?[0-9][0-9()., -]{7,}[0-9]"
      val withPii = concat($"text", lit(" contact: user"), $"doc_id",
        lit("@example.com or +1 (555) 123-"), lpad(($"doc_id" % 10000).cast("string"), 4, "0"))
      table(s, d, "documents")
        .withColumn("raw", withPii)
        .withColumn("scrubbed",
          regexp_replace(regexp_replace($"raw", emailRe, "<EMAIL>"), phoneRe, "<PHONE>"))
        .select(
          $"doc_id",
          md5($"scrubbed").as("scrubbed_md5"),
          (size(regexp_extract_all($"raw", lit(emailRe), lit(0))) +
            size(regexp_extract_all($"raw", lit(phoneRe), lit(0)))).cast("long").as("n_redacted"))
        .orderBy($"doc_id")
    }, Some("""
      SELECT doc_id, md5(regexp_replace(regexp_replace(raw,
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
          '\+?[0-9][0-9()., -]{7,}[0-9]', '<PHONE>', 'g')) AS scrubbed_md5,
        CAST(len(regexp_extract_all(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
          + len(regexp_extract_all(raw, '\+?[0-9][0-9()., -]{7,}[0-9]')) AS BIGINT) AS n_redacted
      FROM (SELECT doc_id,
              text || ' contact: user' || doc_id || '@example.com or +1 (555) 123-' ||
              lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS raw
            FROM documents)
      ORDER BY doc_id""")),

    // C10 --------------------------------------------------------------
    // Winnowing-style fingerprint: 4 lexicographically-smallest md5s of
    // char 8-grams over the normalized text. Identical hex both engines.
    GQ("text_fingerprint", (s, d) => {
      import s.implicits._
      table(s, d, "documents")
        .withColumn("nt", concat_ws(" ", tokens($"text")))
        .withColumn("grams",
          transform(sequence(lit(1), greatest(length($"nt") - 7, lit(1))),
            i => $"nt".substr(i, lit(8))))
        .withColumn("fp", concat_ws("", slice(array_sort(transform($"grams", g => md5(g))), 1, 4)))
        .select($"doc_id", $"fp", length($"nt").cast("long").as("n_norm_chars"))
        .orderBy($"doc_id")
    }, Some("""
      SELECT doc_id,
        array_to_string(list_slice(list_sort(list_transform(grams, g -> md5(g))), 1, 4), '') AS fp,
        CAST(length(nt) AS BIGINT) AS n_norm_chars
      FROM (
        SELECT doc_id, nt,
          list_transform(generate_series(1, greatest(length(nt)-7, 1)), i -> substr(nt, CAST(i AS INTEGER), 8)) AS grams
        FROM (SELECT doc_id, array_to_string(regexp_extract_all(lower(text), '[a-z0-9]+'), ' ') AS nt
              FROM documents))
      ORDER BY doc_id""")),

    // C22 --------------------------------------------------------------
    // Gopher-style repetition signals (Rae et al. 2021 §A1.1, token-level
    // variants): duplicate-word fraction, and per n∈{2,3} the fraction of
    // n-grams belonging to the single most frequent n-gram and to any
    // repeated n-gram. High values flag boilerplate/spam for filtering.
    // Scale shape: word-level metrics are per-row (array_distinct, no
    // shuffle); n-gram multiplicities go explode → two-level groupBy,
    // where partial aggregation absorbs the explode before the shuffle
    // and the per-doc frame is O(docs), not O(grams). All ratios are
    // exact-int divisions -> bit-identical doubles in both engines.
    GQ("text_repetition", (s, d) => {
      import s.implicits._
      def grams(n: Int) = transform(
        sequence(lit(1), size($"t") - (n - 1)),
        i => concat_ws(" ", (0 until n).map(k =>
          element_at($"t", i + lit(k))): _*))
      val base = table(s, d, "documents")
        .withColumn("t", tokens($"text"))
        .select($"doc_id", $"t",
          size($"t").cast("long").as("n_tok"),
          size(array_distinct($"t")).cast("long").as("n_dist"))
      def gagg(n: Int, p: String) = base.filter(size($"t") >= n)
        .select($"doc_id", explode(grams(n)).as("g"))
        .groupBy($"doc_id", $"g").agg(count(lit(1)).as("c"))
        .groupBy($"doc_id").agg(
          sum($"c").as(s"${p}_n"),
          max($"c").as(s"${p}_top"),
          coalesce(sum(when($"c" > 1, $"c")), lit(0L)).as(s"${p}_dup"))
      def frac(num: org.apache.spark.sql.Column, den: org.apache.spark.sql.Column) =
        coalesce(num, lit(0L)).cast("double") /
          greatest(coalesce(den, lit(0L)), lit(1L)).cast("double")
      base.drop("t")
        .join(gagg(2, "g2"), Seq("doc_id"), "left")
        .join(gagg(3, "g3"), Seq("doc_id"), "left")
        .select($"doc_id",
          frac($"n_tok" - $"n_dist", $"n_tok").as("dup_word_frac"),
          frac($"g2_top", $"g2_n").as("top_2gram_frac"),
          frac($"g2_dup", $"g2_n").as("dup_2gram_frac"),
          frac($"g3_top", $"g3_n").as("top_3gram_frac"),
          frac($"g3_dup", $"g3_n").as("dup_3gram_frac"))
        .orderBy($"doc_id")
    }, Some("""
      WITH tok AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
      base AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tok,
                 CAST(len(list_distinct(t)) AS BIGINT) AS n_dist, t FROM tok),
      g2 AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(t)-1),
               i -> t[i] || ' ' || t[i+1])) AS g FROM base WHERE len(t) >= 2),
      c2 AS (SELECT doc_id, g, COUNT(*) AS c FROM g2 GROUP BY doc_id, g),
      a2 AS (SELECT doc_id, SUM(c) AS g2_n, MAX(c) AS g2_top,
               COALESCE(SUM(c) FILTER (WHERE c > 1), 0) AS g2_dup FROM c2 GROUP BY doc_id),
      g3 AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(t)-2),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g FROM base WHERE len(t) >= 3),
      c3 AS (SELECT doc_id, g, COUNT(*) AS c FROM g3 GROUP BY doc_id, g),
      a3 AS (SELECT doc_id, SUM(c) AS g3_n, MAX(c) AS g3_top,
               COALESCE(SUM(c) FILTER (WHERE c > 1), 0) AS g3_dup FROM c3 GROUP BY doc_id)
      SELECT b.doc_id,
        CAST(b.n_tok - b.n_dist AS DOUBLE) / CAST(greatest(b.n_tok, 1) AS DOUBLE) AS dup_word_frac,
        CAST(COALESCE(a2.g2_top, 0) AS DOUBLE) / CAST(greatest(COALESCE(a2.g2_n, 0), 1) AS DOUBLE) AS top_2gram_frac,
        CAST(COALESCE(a2.g2_dup, 0) AS DOUBLE) / CAST(greatest(COALESCE(a2.g2_n, 0), 1) AS DOUBLE) AS dup_2gram_frac,
        CAST(COALESCE(a3.g3_top, 0) AS DOUBLE) / CAST(greatest(COALESCE(a3.g3_n, 0), 1) AS DOUBLE) AS top_3gram_frac,
        CAST(COALESCE(a3.g3_dup, 0) AS DOUBLE) / CAST(greatest(COALESCE(a3.g3_n, 0), 1) AS DOUBLE) AS dup_3gram_frac
      FROM base b LEFT JOIN a2 ON b.doc_id = a2.doc_id LEFT JOIN a3 ON b.doc_id = a3.doc_id
      ORDER BY b.doc_id""")),

    // C26 ---------------------------------------------------------------
    // Composite quality gate: the keep/drop verdict a curation pipeline
    // applies before training — C4/Gopher-style thresholds over token
    // count, repetition, mean word length, stopword density and digit
    // density, fused into one per-row projection (no joins, no shuffles;
    // mean word length from a second regex count, not a per-token fold).
    GQ("quality_gate", (s, d) => {
      import s.implicits._
      val stopArr = array(Stop.map(lit): _*)
      table(s, d, "documents")
        .withColumn("t", tokens($"text"))
        .withColumn("n_tok", size($"t").cast("long"))
        .withColumn("n_tok_d", greatest(size($"t"), lit(1)).cast("double"))
        .withColumn("dup_word_frac",
          lit(1.0) - size(array_distinct($"t")).cast("double") / $"n_tok_d")
        .withColumn("mean_word_len",
          size(regexp_extract_all($"text", lit("[a-zA-Z0-9]"), lit(0))).cast("double") / $"n_tok_d")
        .withColumn("stop_ratio",
          size(filter($"t", x => array_contains(stopArr, x))).cast("double") / $"n_tok_d")
        .withColumn("digit_ratio",
          size(regexp_extract_all($"text", lit("[0-9]"), lit(0))).cast("double") /
            greatest(length($"text"), lit(1)).cast("double"))
        .withColumn("keep",
          $"n_tok".between(50L, 100000L) && $"dup_word_frac" <= 0.7 &&
            $"mean_word_len".between(3.0, 10.0) && $"stop_ratio" >= 0.02 &&
            $"digit_ratio" <= 0.2)
        .select($"doc_id", $"n_tok", $"dup_word_frac", $"mean_word_len",
          $"stop_ratio", $"digit_ratio", $"keep")
        .orderBy($"doc_id")
    }, Some(s"""
      WITH m AS (
        SELECT doc_id,
          CAST(len(t) AS BIGINT) AS n_tok,
          1.0 - CAST(len(list_distinct(t)) AS DOUBLE) / CAST(greatest(len(t), 1) AS DOUBLE) AS dup_word_frac,
          CAST(len(regexp_extract_all(text, '[a-zA-Z0-9]')) AS DOUBLE) / CAST(greatest(len(t), 1) AS DOUBLE) AS mean_word_len,
          CAST(len(list_filter(t, x -> x IN $StopSql)) AS DOUBLE) / CAST(greatest(len(t), 1) AS DOUBLE) AS stop_ratio,
          CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE) / CAST(greatest(length(text), 1) AS DOUBLE) AS digit_ratio
        FROM (SELECT doc_id, text, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents))
      SELECT doc_id, n_tok, dup_word_frac, mean_word_len, stop_ratio, digit_ratio,
        (n_tok BETWEEN 50 AND 100000) AND dup_word_frac <= 0.7
          AND (mean_word_len BETWEEN 3.0 AND 10.0) AND stop_ratio >= 0.02
          AND digit_ratio <= 0.2 AS keep
      FROM m ORDER BY doc_id""")),

    // C29 ---------------------------------------------------------------
    // Deterministic holdout split: train/valid/test assignment from an
    // md5 coin on the doc id (98/1/1) — reproducible across runs,
    // engines and shard layouts, which is what makes eval sets stable as
    // the corpus grows; per-row projection, shuffle-free.
    GQ("split_holdout", (s, d) => {
      import s.implicits._
      val coin = conv(substring(md5(concat(lit("holdout:"), $"doc_id".cast("string"))), 1, 8), 16, 10)
        .cast("long") % 100L
      table(s, d, "documents")
        .withColumn("split",
          when(coin < 98, "train").when(coin < 99, "valid").otherwise("test"))
        .select($"doc_id", $"split")
        .orderBy($"doc_id")
    }, Some("""
      SELECT doc_id,
        CASE WHEN coin < 98 THEN 'train' WHEN coin < 99 THEN 'valid' ELSE 'test' END AS split
      FROM (
        SELECT doc_id,
          CAST(('0x' || substr(md5('holdout:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS coin
        FROM documents)
      ORDER BY doc_id""")),

    // C35 ---------------------------------------------------------------
    // Rare-token ratio: corpus-global token frequencies joined back onto
    // each document's tokens; a high fraction of sub-threshold tokens
    // flags OCR noise / mojibake / junk for the quality gate. 100 TB
    // shape: one explode (shuffle-free Generate) -> one groupBy(token)
    // shuffle for the vocabulary -> one shuffle-hash join back on token
    // (vocabulary >> broadcast threshold at corpus scale; Zipf head-heavy
    // token keys arrive pre-combined by the partial aggregate). Counts
    // stay integer; the single ratio division is one IEEE op on both
    // engines.
    GQ("text_rare_ratio", (s, d) => {
      import s.implicits._
      val tok = table(s, d, "documents")
        .select($"doc_id", explode(tokens($"text")).as("token"))
      val vocab = tok.groupBy($"token").agg(count(lit(1)).as("c"))
      tok.join(vocab, "token")
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_tokens"),
             sum(when($"c" < 5, 1L).otherwise(0L)).as("n_rare"))
        .filter(pmod($"doc_id", lit(20)) === 0)
        .withColumn("rare_ratio",
          $"n_rare".cast("double") / $"n_tokens".cast("double"))
        .orderBy($"doc_id")
    }, Some("""
      WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
                   FROM documents),
      vocab AS (SELECT token, COUNT(*) AS c FROM tok GROUP BY token),
      per AS (SELECT doc_id, COUNT(*) AS n_tokens,
                CAST(SUM(CASE WHEN c < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare
              FROM tok JOIN vocab USING (token) GROUP BY doc_id)
      SELECT doc_id, n_tokens, n_rare,
        CAST(n_rare AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS rare_ratio
      FROM per WHERE doc_id % 20 = 0 ORDER BY doc_id""")),

    // C45 ---------------------------------------------------------------
    // Prefix dedup: crawl pipelines drop documents sharing the same
    // leading content (boilerplate headers, mirrored articles with
    // differing tails) that exact-hash dedup misses. Fingerprint = md5 of
    // the first 16 tokens; keeper = smallest doc_id per fingerprint.
    // Scale shape: the fingerprint is per-row map work, the group table
    // is one partial-agg shuffle on the 16-byte key, and the verdict
    // join back is keyed on the same fingerprint — id-sized rows only,
    // never the text.
    GQ("dedup_prefix", (s, d) => {
      import s.implicits._
      val fp = table(s, d, "documents")
        .withColumn("pfx", md5(concat_ws(" ", slice(tokens($"text"), 1, 16))))
        .select($"doc_id", $"pfx")
      val groups = fp.groupBy($"pfx")
        .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      fp.join(groups, "pfx")
        .select($"doc_id",
          ($"doc_id" === $"keep_id").as("keep"),
          when($"doc_id" === $"keep_id", lit(null).cast("long"))
            .otherwise($"keep_id").as("dup_of"))
        .orderBy($"doc_id")
    }, Some("""
      WITH fp AS (
        SELECT doc_id,
          md5(array_to_string(regexp_extract_all(lower(text), '[a-z0-9]+')[1:16], ' ')) AS pfx
        FROM documents),
      g AS (SELECT pfx, MIN(doc_id) AS keep_id FROM fp GROUP BY pfx)
      SELECT fp.doc_id, fp.doc_id = g.keep_id AS keep,
        CASE WHEN fp.doc_id = g.keep_id THEN NULL ELSE g.keep_id END AS dup_of
      FROM fp JOIN g USING (pfx)
      ORDER BY fp.doc_id""")),

    // C46 ---------------------------------------------------------------
    // Exact quality deciles WITHOUT a global sort: a per-row integer
    // quality score (lexical diversity + stopword density, both as exact
    // integer-division ratios) is reduced to a score-grained histogram
    // (bounded at 2001 rows regardless of corpus size), the cumulative
    // distribution and VALUE-BASED decile boundaries come from a window
    // over that tiny histogram, and documents pick up their decile by a
    // broadcast join on the score. Equal scores always share a decile,
    // so the split is deterministic at any parallelism — the property
    // ntile() (row-order tie-splitting over one giant sorted partition)
    // cannot give at 100 TB.
    GQ("quality_deciles", (s, d) => {
      import s.implicits._
      val stopArr = array(Stop.map(lit): _*)
      val scored = table(s, d, "documents")
        .withColumn("t", tokens($"text"))
        .withColumn("n_tok", greatest(size($"t"), lit(1)).cast("long"))
        .withColumn("n_dist", size(array_distinct($"t")).cast("long"))
        .withColumn("n_stop",
          size(filter($"t", x => array_contains(stopArr, x))).cast("long"))
        .withColumn("score",
          expr("n_dist * 1000 div n_tok") + expr("n_stop * 1000 div n_tok"))
        .select($"doc_id", $"score")
      val hist = scored.groupBy($"score").agg(count(lit(1)).as("c"))
      val W = org.apache.spark.sql.expressions.Window
      val w = W.orderBy($"score").rowsBetween(W.unboundedPreceding, W.currentRow)
      val total = hist.agg(sum($"c")).head().getLong(0)
      val deciles = hist
        .withColumn("cum", sum($"c").over(w))
        .withColumn("decile", expr(s"(cum * 10 + ${total - 1}) div ${total}L"))
        .select($"score", $"decile")
      scored.join(broadcast(deciles), "score")
        .groupBy($"decile")
        .agg(count(lit(1)).as("n_docs"),
          min($"score").as("min_score"), max($"score").as("max_score"))
        .orderBy($"decile")
    }, Some(s"""
      WITH scored AS (
        SELECT doc_id,
          CAST(len(list_distinct(t)) * 1000 // greatest(len(t), 1) AS BIGINT) +
          CAST(len(list_filter(t, x -> x IN $StopSql)) * 1000 // greatest(len(t), 1) AS BIGINT) AS score
        FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
              FROM documents)),
      hist AS (SELECT score, COUNT(*) AS c FROM scored GROUP BY score),
      tot AS (SELECT SUM(c) AS total FROM hist),
      dec AS (SELECT score,
          CAST((SUM(c) OVER (ORDER BY score ROWS UNBOUNDED PRECEDING) * 10
            + total - 1) // total AS BIGINT) AS decile
        FROM hist, tot)
      SELECT decile, COUNT(*) AS n_docs,
        MIN(score) AS min_score, MAX(score) AS max_score
      FROM scored JOIN dec USING (score)
      GROUP BY decile ORDER BY decile""")),

    // C50 ---------------------------------------------------------------
    // The composed curation pipeline — quality gate → LSH near-dup drop
    // → deterministic holdout split → per-(lang, split) corpus report —
    // run as ONE declarative plan. This is the flagship shape: each
    // stage is the same logic as its standalone operator (C26's gate,
    // C2's band join, C29's md5 coin), and because the whole pipeline
    // is one DataFrame expression Catalyst fuses the gate into the scan,
    // the band join ships only (doc_id, band, key) triples for DOCS THAT
    // SURVIVED the gate, and the final aggregate is language-grained.
    // At 100 TB nothing here materializes between stages.
    GQ("curate_pipeline", (s, d) => {
      import s.implicits._
      val stopArr = array(Stop.map(lit): _*)
      val base = table(s, d, "documents")
        .withColumn("t", tokens($"text"))
        .withColumn("n_tok", size($"t").cast("long"))
        .withColumn("n_tok_d", greatest(size($"t"), lit(1)).cast("double"))
        .withColumn("dup_word_frac",
          lit(1.0) - size(array_distinct($"t")).cast("double") / $"n_tok_d")
        .withColumn("mean_word_len",
          size(regexp_extract_all($"text", lit("[a-zA-Z0-9]"), lit(0))).cast("double") / $"n_tok_d")
        .withColumn("stop_ratio",
          size(filter($"t", x => array_contains(stopArr, x))).cast("double") / $"n_tok_d")
        .withColumn("digit_ratio",
          size(regexp_extract_all($"text", lit("[0-9]"), lit(0))).cast("double") /
            greatest(length($"text"), lit(1)).cast("double"))
        .withColumn("keep",
          $"n_tok".between(50L, 100000L) && $"dup_word_frac" <= 0.7 &&
            $"mean_word_len".between(3.0, 10.0) && $"stop_ratio" >= 0.02 &&
            $"digit_ratio" <= 0.2)
      val kept = base.filter($"keep").select($"doc_id", $"lang", $"n_tok", $"text")
      val bands = Dedup.bandKeys(kept)
      // "has a smaller-id band collision" == "is not the minimum of some
      // band group": the former band self-join emitted k²/2 rows out of a
      // band key shared by k docs (the degenerate-band-key quadratic the
      // dedup family collapsed in r19) AND recomputed the whole quality-
      // metrics + signature pass once per join side; the window-min is
      // one shuffle of (doc_id, b, bkey) rows and one bands pass, with
      // identical semantics (∃ smaller id in group ⟺ group min < id).
      val wBand = org.apache.spark.sql.expressions.Window.partitionBy($"b", $"bkey")
      val dups = bands
        .withColumn("m", min($"doc_id").over(wBand))
        .filter($"doc_id" > $"m")
        .select($"doc_id").distinct()
      val survivors = kept.join(dups, Seq("doc_id"), "left_anti")
      val coin = conv(substring(md5(concat(lit("holdout:"), $"doc_id".cast("string"))), 1, 8), 16, 10)
        .cast("long") % 100L
      survivors
        .withColumn("split",
          when(coin < 98, "train").when(coin < 99, "valid").otherwise("test"))
        .groupBy($"lang", $"split")
        .agg(count(lit(1)).as("n_docs"), sum($"n_tok").as("n_tokens"))
        .orderBy($"lang", $"split")
    }, Some(s"""
      WITH m AS (
        SELECT doc_id, lang, text,
          CAST(len(t) AS BIGINT) AS n_tok,
          1.0 - CAST(len(list_distinct(t)) AS DOUBLE) / CAST(greatest(len(t), 1) AS DOUBLE) AS dup_word_frac,
          CAST(len(regexp_extract_all(text, '[a-zA-Z0-9]')) AS DOUBLE) / CAST(greatest(len(t), 1) AS DOUBLE) AS mean_word_len,
          CAST(len(list_filter(t, x -> x IN $StopSql)) AS DOUBLE) / CAST(greatest(len(t), 1) AS DOUBLE) AS stop_ratio,
          CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE) / CAST(greatest(length(text), 1) AS DOUBLE) AS digit_ratio
        FROM (SELECT doc_id, lang, text,
                regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents)),
      kept AS (
        SELECT doc_id, lang, n_tok FROM m
        WHERE (n_tok BETWEEN 50 AND 100000) AND dup_word_frac <= 0.7
          AND (mean_word_len BETWEEN 3.0 AND 10.0) AND stop_ratio >= 0.02
          AND digit_ratio <= 0.2),
      ${Dedup.duckBandsCte},
      dups AS (
        SELECT DISTINCT a.doc_id FROM bands a
        JOIN bands c ON a.b = c.b AND a.bkey = c.bkey AND c.doc_id < a.doc_id
        WHERE a.doc_id IN (SELECT doc_id FROM kept)
          AND c.doc_id IN (SELECT doc_id FROM kept)),
      surv AS (
        SELECT k.*,
          CAST(('0x' || substr(md5('holdout:' || CAST(k.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS coin
        FROM kept k WHERE k.doc_id NOT IN (SELECT doc_id FROM dups))
      SELECT lang,
        CASE WHEN coin < 98 THEN 'train' WHEN coin < 99 THEN 'valid' ELSE 'test' END AS split,
        COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens
      FROM surv GROUP BY 1, 2 ORDER BY lang, split"""), bench = true)
  )
}
