package graft.llm

import org.apache.spark.sql.functions._
import graft.queries.{GQ, QueryDefs}
import QueryDefs._

/** Corpus-curation operators for LLM training pipelines (SURVEY §2 C,
  * round 3): n-gram heavy hitters, eval-set decontamination, TF-IDF
  * keyword extraction, corpus composition stats, incremental dedup.
  * Shapes are the 100 TB ones: per-row token work stays shuffle-free,
  * aggregations partial-combine on uniform keys (n-grams, md5 hashes),
  * joins carry ids/hashes only, and top-k is TakeOrdered, never a full
  * sort. Determinism follows SURVEY §4: counts and integer-scaled scores
  * only — no float accumulation orders to diverge from the oracle.
  */
object Corpus {

  /** Rounds the bpe_encode oracle trains: past the old 16-merge cap to
    * pin the grown-alphabet regime, small enough that the unrolled
    * DuckDB replay (one count+rewrite CTE pair per round) stays cheap.
    * Declared BEFORE `queries` — the GQ list captures it at object init.
    */
  private[llm] val BpeEncodeK = 24

  /** Word 5-gram shingles of a token array (caller filters size >= 5). */
  private def grams5(t: org.apache.spark.sql.Column) =
    array_distinct(transform(sequence(lit(1), size(t) - 4), i =>
      concat_ws(" ", element_at(t, i), element_at(t, i + 1), element_at(t, i + 2),
        element_at(t, i + 3), element_at(t, i + 4))))

  val queries: Seq[GQ] = Seq(
    // C17 ---------------------------------------------------------------
    // Global top-20 word trigrams: the "what is my corpus made of" heavy-
    // hitters report. Partial aggregation absorbs the explode before the
    // shuffle; the final top-k is TakeOrdered over (count, ngram) — no
    // global sort at any scale.
    GQ("ngram_topk", (s, d) => {
      import s.implicits._
      table(s, d, "documents")
        .withColumn("t", tokens($"text"))
        .filter(size($"t") >= 3)
        .select(explode(transform(sequence(lit(1), size($"t") - 2), i =>
          concat_ws(" ", element_at($"t", i), element_at($"t", i + 1),
            element_at($"t", i + 2)))).as("ngram"))
        .groupBy($"ngram").agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"ngram")
        .limit(20)
    }, Some("""
      WITH t AS (SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
      g AS (SELECT unnest(list_transform(generate_series(1, len(t)-2),
              i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS ngram
            FROM t WHERE len(t) >= 3)
      SELECT ngram, COUNT(*) AS n FROM g GROUP BY ngram
      ORDER BY n DESC, ngram LIMIT 20""")),

    // C18 ---------------------------------------------------------------
    // Eval-set decontamination: training docs sharing any word 5-gram
    // with the held-out set (source 'src0' stands in for the eval set),
    // with the overlap size per doc. The join key is the shingle itself
    // (uniform), only (doc_id, gram) pairs shuffle, and AQE broadcasts
    // the eval side when it is small — the standard contamination sweep.
    GQ("decontaminate", (s, d) => {
      import s.implicits._
      val grams = table(s, d, "documents")
        .withColumn("t", tokens($"text"))
        .filter(size($"t") >= 5)
        .select($"doc_id", $"source", explode(grams5($"t")).as("g"))
      val evalG = grams.filter($"source" === "src0").select($"g").distinct()
      grams.filter($"source" =!= "src0")
        .join(evalG, Seq("g"))
        .groupBy($"doc_id").agg(count(lit(1)).as("n_shared"))
        .orderBy($"doc_id")
    }, Some("""
      WITH t AS (SELECT doc_id, source, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
                 FROM documents),
      g AS (SELECT doc_id, source,
              unnest(list_distinct(list_transform(generate_series(1, len(t)-4),
                i -> t[i]||' '||t[i+1]||' '||t[i+2]||' '||t[i+3]||' '||t[i+4]))) AS g
            FROM t WHERE len(t) >= 5),
      e AS (SELECT DISTINCT g FROM g WHERE source = 'src0')
      SELECT doc_id, COUNT(*) AS n_shared
      FROM (SELECT doc_id, g FROM g WHERE source <> 'src0') tr JOIN e USING (g)
      GROUP BY doc_id ORDER BY doc_id""")),

    // C61 ---------------------------------------------------------------
    // Contamination SEVERITY — the inverse direction of C18: C18 flags
    // which TRAIN docs leak eval n-grams; this reports, per EVAL doc,
    // what fraction of its distinct 5-grams exist anywhere in train —
    // the coverage number that decides whether an eval item is
    // compromised (a 2% overlap is boilerplate; 80% means the answer is
    // memorizable). Same gram-keyed semi-join shape as C18 — only
    // (doc_id, gram) pairs shuffle, the verdict join is id-sized, no
    // all-pairs anywhere.
    GQ("contamination_severity", (s, d) => {
      import s.implicits._
      val grams = table(s, d, "documents")
        .withColumn("t", tokens($"text"))
        .filter(size($"t") >= 5)
        .select($"doc_id", $"source", explode(grams5($"t")).as("g"))
      val trainG = grams.filter($"source" =!= "src0").select($"g").distinct()
      val evalG = grams.filter($"source" === "src0")
      val found = evalG.join(trainG, Seq("g"), "left_semi")
        .groupBy($"doc_id").agg(count(lit(1)).as("n_found"))
      evalG.groupBy($"doc_id").agg(count(lit(1)).as("n_grams"))
        .join(found, Seq("doc_id"))
        .withColumn("coverage",
          $"n_found".cast("double") / $"n_grams".cast("double"))
        .select($"doc_id", $"n_grams", $"n_found", $"coverage")
        .orderBy($"coverage".desc, $"doc_id")
        .limit(100)
    }, Some("""
      WITH t AS (SELECT doc_id, source, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
                 FROM documents),
      g AS (SELECT doc_id, source,
              unnest(list_distinct(list_transform(generate_series(1, len(t)-4),
                i -> t[i]||' '||t[i+1]||' '||t[i+2]||' '||t[i+3]||' '||t[i+4]))) AS g
            FROM t WHERE len(t) >= 5),
      tr AS (SELECT DISTINCT g FROM g WHERE source <> 'src0'),
      ev AS (SELECT doc_id, g FROM g WHERE source = 'src0'),
      f AS (SELECT doc_id, COUNT(*) AS n_found
            FROM ev WHERE g IN (SELECT g FROM tr) GROUP BY doc_id),
      n AS (SELECT doc_id, COUNT(*) AS n_grams FROM ev GROUP BY doc_id)
      SELECT n.doc_id, n_grams, n_found,
        CAST(n_found AS DOUBLE) / CAST(n_grams AS DOUBLE) AS coverage
      FROM n JOIN f ON n.doc_id = f.doc_id
      ORDER BY coverage DESC, n.doc_id LIMIT 100""")),

    // C19 ---------------------------------------------------------------
    // Per-document top-3 keywords by TF-IDF. The idf is integer-scaled
    // (floor(N*1000/df)) so scores are exact BIGINTs — engine-identical
    // ordering with (score, term) tie-breaks, per the §4 determinism
    // rules. tf/df are two partial-combined aggregations on uniform keys;
    // the final window partitions by doc_id.
    GQ("tfidf_topterms", (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val docs = table(s, d, "documents")
      val tok = docs.select($"doc_id", explode(tokens($"text")).as("term"))
      val tf = tok.groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
      val df = tok.groupBy($"term").agg(countDistinct($"doc_id").as("df"))
      val n = docs.agg(count(lit(1)).as("n_total"))
      val sc = tf.join(df, Seq("term")).crossJoin(broadcast(n))
        .select($"doc_id", $"term",
          ($"tf" * floor($"n_total" * lit(1000.0) / $"df").cast("long")).as("score"))
      val w = Window.partitionBy($"doc_id").orderBy($"score".desc, $"term")
      sc.withColumn("rk", row_number().over(w).cast("long"))
        .filter($"rk" <= 3)
        .select($"doc_id", $"term", $"score", $"rk")
        .orderBy($"doc_id", $"rk")
    }, Some("""
      WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
                   FROM documents),
      tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
      df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
      n AS (SELECT COUNT(*) AS n_total FROM documents),
      sc AS (SELECT doc_id, term, tf * CAST(floor(n_total*1000.0/df) AS BIGINT) AS score
             FROM tf JOIN df USING (term) CROSS JOIN n)
      SELECT doc_id, term, score, rk FROM (
        SELECT doc_id, term, score,
          row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rk
        FROM sc)
      WHERE rk <= 3 ORDER BY doc_id, rk""")),

    // C20 ---------------------------------------------------------------
    // Corpus composition report: docs / chars / exact-unique docs per
    // (source, lang) cell — the mix table a training run is planned from.
    // One partial-combined aggregation on a bounded key space.
    GQ("corpus_stats", (s, d) => {
      import s.implicits._
      table(s, d, "documents")
        .groupBy($"source", $"lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum($"n_chars").as("total_chars"),
          countDistinct(md5($"text")).as("n_unique"),
          (sum($"n_chars").cast("double") / count(lit(1))).as("avg_chars"))
        .orderBy($"source", $"lang")
    }, Some("""
      SELECT source, lang, COUNT(*) AS n_docs,
        CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        COUNT(DISTINCT md5(text)) AS n_unique,
        CAST(CAST(SUM(n_chars) AS BIGINT) AS DOUBLE) / COUNT(*) AS avg_chars
      FROM documents GROUP BY source, lang ORDER BY source, lang""")),

    // C21 ---------------------------------------------------------------
    // Incremental ingestion dedup: keep only the docs of an incoming
    // batch (source 'src1' stands in) whose normalized-text hash is
    // absent from the existing corpus — a hash anti-join, the shape that
    // admits a new crawl slice into a 100 TB corpus without a full-table
    // rewrite.
    GQ("dedup_incremental", (s, d) => {
      import s.implicits._
      val docs = table(s, d, "documents")
        .withColumn("h", md5(concat_ws(" ", tokens($"text"))))
      val corpus = docs.filter($"source" =!= "src1").select($"h").distinct()
      docs.filter($"source" === "src1")
        .join(corpus, Seq("h"), "left_anti")
        .select($"doc_id", $"h")
        .orderBy($"doc_id")
    }, Some("""
      WITH d AS (SELECT doc_id, source,
          md5(array_to_string(regexp_extract_all(lower(text), '[a-z0-9]+'), ' ')) AS h
        FROM documents)
      SELECT doc_id, h FROM d
      WHERE source = 'src1'
        AND h NOT IN (SELECT h FROM d WHERE source <> 'src1')
      ORDER BY doc_id""")),

    // C23 ---------------------------------------------------------------
    // Temperature-style mixture sampling: big sources are downsampled by
    // an inverse-sqrt keep rate (min(1, sqrt(1000/n)) — the flattening a
    // data-mixture schedule applies so head domains don't drown the
    // tail), with the same deterministic md5 coin as sample_stratified.
    // The rate is a closed-form per-source function of its count — no
    // cross-source float accumulation, so both engines agree bit-exactly.
    // One tiny groupBy for counts, broadcast back; the scan stays one
    // pass at any corpus size.
    GQ("sample_mixture", (s, d) => {
      import s.implicits._
      val docs = table(s, d, "documents")
      val rates = docs.groupBy($"source")
        .agg(count(lit(1)).as("n"))
        .withColumn("rate", least(lit(1.0), sqrt(lit(1000.0) / $"n".cast("double"))))
      val u = (conv(substring(md5($"doc_id".cast("string")), 1, 15), 16, 10)
        .cast("long") % 1000000L) / lit(1000000.0)
      docs.join(broadcast(rates), "source")
        .filter(u < $"rate")
        .groupBy($"source", $"n", $"rate")
        .agg(count(lit(1)).as("kept"))
        .select($"source", $"n", $"rate", $"kept")
        .orderBy($"source")
    }, Some("""
      WITH c AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
      r AS (SELECT source, n, least(1.0, sqrt(1000.0 / CAST(n AS DOUBLE))) AS rate FROM c)
      SELECT d.source, r.n, r.rate, COUNT(*) AS kept
      FROM documents d JOIN r ON d.source = r.source
      WHERE (CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 1000000)/1000000.0 < r.rate
      GROUP BY d.source, r.n, r.rate
      ORDER BY d.source""")),

    // C24 ---------------------------------------------------------------
    // Sequence packing (concat-and-chunk): documents are concatenated in
    // doc_id order per source and chunked into 4096-token context
    // windows; a bin is the window a document STARTS in. The running sum
    // is a partitioned window over integers — deterministic, and at
    // 100 TB each source's cumsum is its own partition of the shuffle.
    // Output is the per-window packing report (docs, tokens, fill).
    GQ("pack_contexts", (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"source").orderBy($"doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      table(s, d, "documents")
        .withColumn("n_tok", size(tokens($"text")).cast("long"))
        .withColumn("cum", sum($"n_tok").over(w))
        .withColumn("bin", floor(($"cum" - $"n_tok") / lit(4096L)).cast("long"))
        .groupBy($"source", $"bin")
        .agg(count(lit(1)).as("n_docs"), sum($"n_tok").as("n_tokens"))
        .withColumn("fill", $"n_tokens".cast("double") / lit(4096.0))
        .select($"source", $"bin", $"n_docs", $"n_tokens", $"fill")
        .orderBy($"source", $"bin")
    }, Some("""
      WITH t AS (SELECT doc_id, source,
          CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS n_tok
        FROM documents),
      c AS (SELECT source, doc_id, n_tok,
          SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
            ROWS UNBOUNDED PRECEDING) AS cum FROM t)
      SELECT source, CAST((cum - n_tok) // 4096 AS BIGINT) AS bin,
        COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
        CAST(SUM(n_tok) AS DOUBLE) / 4096.0 AS fill
      FROM c GROUP BY source, bin
      ORDER BY source, bin""")),

    // C25 ---------------------------------------------------------------
    // Substring-level duplication signal (the ExactSubstr idea of Lee et
    // al. 2021, "Deduplicating Training Data Makes Language Models
    // Better", scaled to word-8-grams): per doc, how many of its 8-gram
    // spans appear in at least one OTHER document. Doc frequency is one
    // gram-keyed partial-combined aggregation; only duplicated grams
    // (df >= 2) come back to the flag join, and rows in flight carry
    // (doc_id, gram) only — no text shuffles, no all-pairs work.
    GQ("dedup_spans", (s, d) => {
      import s.implicits._
      def gram8(t: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column) =
        concat_ws(" ", (0 until 8).map(k => element_at(t, i + lit(k))): _*)
      val grams = table(s, d, "documents")
        .withColumn("t", tokens($"text"))
        .filter(size($"t") >= 8)
        .select($"doc_id",
          explode(transform(sequence(lit(1), size($"t") - 7), i => gram8($"t", i))).as("g"))
      val dup = grams.distinct()
        .groupBy($"g").agg(count(lit(1)).as("df"))
        .filter($"df" >= 2).select($"g")
      val base = table(s, d, "documents")
        .withColumn("t", tokens($"text"))
        .select($"doc_id", greatest(size($"t") - 7, lit(0)).cast("long").as("n_grams"))
      val flagged = grams.join(dup, "g")
        .groupBy($"doc_id").agg(count(lit(1)).as("n_dup_grams"))
      base.join(flagged, Seq("doc_id"), "left")
        .select($"doc_id", $"n_grams",
          coalesce($"n_dup_grams", lit(0L)).as("n_dup_grams"),
          (coalesce($"n_dup_grams", lit(0L)).cast("double") /
            greatest($"n_grams", lit(1L)).cast("double")).as("dup_frac"))
        .orderBy($"doc_id")
    }, {
      val parts = (0 until 8).map(k => s"t[i+$k]").mkString("||' '||")
      Some(s"""
      WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
      gr AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(t)-7),
               i -> $parts)) AS g
             FROM toks WHERE len(t) >= 8),
      df AS (SELECT g FROM (SELECT g, count(DISTINCT doc_id) AS df FROM gr GROUP BY g) WHERE df >= 2),
      fl AS (SELECT doc_id, count(*) AS n_dup_grams FROM gr JOIN df USING (g) GROUP BY doc_id),
      base AS (SELECT doc_id, CAST(greatest(len(t)-7, 0) AS BIGINT) AS n_grams FROM toks)
      SELECT b.doc_id, n_grams,
        CAST(coalesce(n_dup_grams, 0) AS BIGINT) AS n_dup_grams,
        CAST(coalesce(n_dup_grams, 0) AS DOUBLE) / CAST(greatest(n_grams, 1) AS DOUBLE) AS dup_frac
      FROM base b LEFT JOIN fl USING (doc_id) ORDER BY doc_id""")
    }),

    // C30 ---------------------------------------------------------------
    // BM25 retrieval (Robertson-Sparck Jones, k1=1.2 b=0.75) for a fixed
    // query over the corpus, top-20 docs. All score inputs stay INTEGER
    // until one final division per (doc, term): with k1=6/5, b=3/4 and
    // avgdl = S/N (S = corpus token count), the per-term score reduces to
    //   idf_s * 22 * tf * S  /  (10*S*tf + 3*S + 9*dl*N)
    // — int64 on both engines (idf_s is the integer-scaled
    // reciprocal-df idf; ln() differs across libms so it stays out).
    // Per-doc summation is a FIXED-ORDER sum of the (<= 3) per-term
    // scores via conditional aggregates, so float order is identical.
    // The term->doc inverted shape is a gram-keyed aggregation + one
    // broadcast of the 3-term stats — no per-query scan at 100 TB.
    GQ("bm25_topk", (s, d) => {
      import s.implicits._
      val terms = Seq("spark", "join", "stream")
      val docs = table(s, d, "documents")
      val tok = docs.select($"doc_id", explode(tokens($"text")).as("term"))
      val dl = tok.groupBy($"doc_id").agg(count(lit(1)).as("dl"))
      val corpus = dl.agg(count(lit(1)).as("n_docs"), sum($"dl").as("s_tokens"))
      val tf = tok.filter($"term".isin(terms: _*))
        .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
      val df = tf.groupBy($"term").agg(count(lit(1)).as("df"))
      val scored = tf.join(broadcast(df), Seq("term"))
        .join(dl, Seq("doc_id")).crossJoin(broadcast(corpus))
        .withColumn("idf_s", floor($"n_docs" * lit(1000.0) / $"df").cast("long"))
        .withColumn("sc",
          ($"idf_s" * lit(22L) * $"tf" * $"s_tokens").cast("double") /
            (lit(10L) * $"s_tokens" * $"tf" + lit(3L) * $"s_tokens" +
              lit(9L) * $"dl" * $"n_docs").cast("double"))
      scored.groupBy($"doc_id")
        .agg((coalesce(max(when($"term" === "spark", $"sc")), lit(0.0)) +
          coalesce(max(when($"term" === "join", $"sc")), lit(0.0)) +
          coalesce(max(when($"term" === "stream", $"sc")), lit(0.0))).as("score"))
        .orderBy($"score".desc, $"doc_id")
        .limit(20)
    }, Some("""
      WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
                   FROM documents),
      dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY 1),
      corpus AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                        CAST(SUM(dl) AS BIGINT) AS s_tokens FROM dl),
      tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok
             WHERE term IN ('spark', 'join', 'stream') GROUP BY 1, 2),
      df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
      sc AS (SELECT t.doc_id, t.term,
          CAST(CAST(floor(n_docs*1000.0/df) AS BIGINT) * 22 * t.tf * s_tokens AS DOUBLE) /
          CAST(10*s_tokens*t.tf + 3*s_tokens + 9*l.dl*n_docs AS DOUBLE) AS sc
        FROM tf t JOIN df USING (term) JOIN dl l ON t.doc_id = l.doc_id CROSS JOIN corpus)
      SELECT doc_id,
        coalesce(MAX(CASE WHEN term='spark' THEN sc END), 0.0) +
        coalesce(MAX(CASE WHEN term='join' THEN sc END), 0.0) +
        coalesce(MAX(CASE WHEN term='stream' THEN sc END), 0.0) AS score
      FROM sc GROUP BY doc_id
      ORDER BY score DESC, doc_id LIMIT 20""")),

    // C33 ---------------------------------------------------------------
    // Sliding-window chunking: split each document into 48-token windows
    // with stride 32 (16-token overlap) — the long-document -> training-
    // context preparation step. Entirely per-row array expressions
    // (sequence/slice), explode feeds the output directly: shuffle-free
    // at any scale; each chunk carries an md5 content hash so chunk
    // boundaries and contents are verified exactly, not just counted.
    GQ("chunk_windows", (s, d) => {
      import s.implicits._
      table(s, d, "documents")
        .withColumn("t", tokens($"text"))
        .filter(size($"t") >= 1)
        .select($"doc_id", $"t", size($"t").cast("long").as("n_tok"),
          explode(sequence(lit(1), size($"t"), lit(32))).as("start"))
        .select($"doc_id", expr("(start - 1) div 32").cast("long").as("chunk_id"),
          least(lit(48L), $"n_tok" - $"start" + 1).as("chunk_tokens"),
          md5(concat_ws(" ", slice($"t", $"start", lit(48)))).as("chunk_hash"))
        .orderBy($"doc_id", $"chunk_id")
    }, Some("""
      WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
                 FROM documents),
      c AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tok, t,
              unnest(generate_series(1, len(t), 32)) AS start
            FROM t WHERE len(t) >= 1)
      SELECT doc_id, CAST((start - 1) // 32 AS BIGINT) AS chunk_id,
        least(48, n_tok - start + 1) AS chunk_tokens,
        md5(array_to_string(t[start:start+47], ' ')) AS chunk_hash
      FROM c ORDER BY doc_id, chunk_id""")),

    // C42 ---------------------------------------------------------------
    // Hybrid retrieval: lexical + vector relevance fused by reciprocal-
    // rank fusion (RRF, Cormack et al. 2009) — the retrieval shape RAG
    // and data-curation pipelines actually run, where neither leg alone
    // ranks well. Queries are the first 8 documents (doc_id ≡ vec_id in
    // the corpus). The LEXICAL leg scores a candidate by the sum of
    // integer-scaled IDFs of the distinct terms it shares with the query
    // (exact integer arithmetic — no float accumulation order to
    // diverge); the VECTOR leg is exact cosine over the embeddings. Each
    // leg keeps only its top-20 per query via the bounded partial-agg
    // top-k (map tasks ship ≤ 20 pairs per query — no per-query sort,
    // no one-reducer bottleneck), the fused list is top-5 by
    // rrf = 1/(60+r_lex) + 1/(60+r_vec), absent legs contributing 0.
    // Scale shape: the term join is keyed on term with the 8-query term
    // set broadcast (candidate fan-out bounded by NQ × docs-sharing-a-
    // term; production would additionally drop low-IDF terms), the
    // cosine leg broadcasts 8 query vectors through one candidate pass,
    // and the fusion join carries (q_id, c_id, rank) triples only.
    GQ("hybrid_retrieval", (s, d) => {
      import s.implicits._
      val NQ = 8
      val docs = table(s, d, "documents")
      val tok = docs.select($"doc_id",
        explode(array_distinct(tokens($"text"))).as("term"))
      val corpus = docs.agg(count(lit(1)).as("n_docs"))
      val qtok = tok.filter($"doc_id" < NQ).select($"doc_id".as("q_id"), $"term")
      // document frequencies are needed ONLY for the query-term set:
      // semi-restrict the full token stream by the broadcast query
      // terms BEFORE the df aggregation, so the shuffle carries the
      // query-term rows alone (not the whole vocabulary), and the tiny
      // result broadcasts into the candidate join — the vocab-sized
      // shuffle the full dfreq required is gone entirely
      val qdf = tok.join(broadcast(qtok.select($"term").distinct()), Seq("term"))
        .groupBy($"term").agg(count(lit(1)).as("df"))
      val lex = tok.join(broadcast(qtok), Seq("term"))
        .filter($"doc_id" =!= $"q_id")
        .join(broadcast(qdf), Seq("term"))
        .crossJoin(broadcast(corpus))
        .withColumn("idf_s", floor($"n_docs" * lit(1000.0) / $"df").cast("long"))
        .groupBy($"q_id", $"doc_id").agg(sum($"idf_s").as("lex"))
      val lexRank = lex.groupBy($"q_id")
        .agg(graft.functions.TopKExpressions
          .topKByScore($"lex".cast("double"), $"doc_id", 20).as("top"))
        .select($"q_id", posexplode($"top"))
        .select($"q_id", ($"pos" + 1).as("rl"), $"col.id".as("c_id"))
      val v = table(s, d, "embeddings")
        .withColumn("e", toDoubleArr($"embedding"))
        .withColumn("nrm", sqrt(dotD($"e", $"e")))
        .select($"vec_id", $"e", $"nrm")
      val q = v.filter($"vec_id" < NQ)
        .select($"vec_id".as("q_id"), $"e".as("qe"), $"nrm".as("qn"))
      val vecRank = v.join(broadcast(q), $"vec_id" =!= $"q_id")
        .withColumn("cos", dotD($"e", $"qe") / ($"nrm" * $"qn"))
        .groupBy($"q_id")
        .agg(graft.functions.TopKExpressions
          .topKByScore($"cos", $"vec_id", 20).as("top"))
        .select($"q_id", posexplode($"top"))
        .select($"q_id", ($"pos" + 1).as("rv"), $"col.id".as("c_id"))
      lexRank.join(vecRank, Seq("q_id", "c_id"), "full_outer")
        .withColumn("rrf",
          coalesce(lit(1.0) / (lit(60.0) + $"rl".cast("double")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(60.0) + $"rv".cast("double")), lit(0.0)))
        .groupBy($"q_id")
        .agg(graft.functions.TopKExpressions
          .topKByScore($"rrf", $"c_id", 5).as("top"))
        .select($"q_id", posexplode($"top"))
        .select($"q_id", ($"pos" + 1).cast("long").as("rank"),
          $"col.id".as("c_id"), $"col.score".as("rrf"))
        .orderBy($"q_id", $"rank")
    }, Some("""
      WITH tok AS (SELECT doc_id,
              unnest(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS term
            FROM documents),
      corpus AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
      dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tok GROUP BY 1),
      lex AS (SELECT q.doc_id AS q_id, c.doc_id AS c_id,
            CAST(SUM(CAST(floor(n_docs*1000.0/df) AS BIGINT)) AS BIGINT) AS lex
          FROM tok q JOIN tok c USING (term) JOIN dfreq USING (term) CROSS JOIN corpus
          WHERE q.doc_id < 8 AND c.doc_id != q.doc_id
          GROUP BY 1, 2),
      lr AS (SELECT q_id, c_id, rl FROM (
            SELECT q_id, c_id, ROW_NUMBER() OVER (PARTITION BY q_id
              ORDER BY CAST(lex AS DOUBLE) DESC, c_id) AS rl FROM lex)
          WHERE rl <= 20),
      nn AS (SELECT vec_id, e,
            sqrt(list_reduce(list_transform(generate_series(1, 64),
              i -> e[i]*e[i]), (x, y) -> x + y)) AS nrm
          FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)),
      vr AS (SELECT q_id, c_id, rv FROM (
            SELECT q.vec_id AS q_id, c.vec_id AS c_id,
              ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
                (list_reduce(list_transform(generate_series(1, 64),
                   i -> c.e[i]*q.e[i]), (x, y) -> x + y) / (c.nrm * q.nrm)) DESC,
                c.vec_id) AS rv
            FROM nn q, nn c WHERE q.vec_id < 8 AND c.vec_id != q.vec_id)
          WHERE rv <= 20),
      f AS (SELECT coalesce(lr.q_id, vr.q_id) AS q_id,
              coalesce(lr.c_id, vr.c_id) AS c_id,
              coalesce(1.0/(60.0 + rl), 0.0) + coalesce(1.0/(60.0 + rv), 0.0) AS rrf
            FROM lr FULL OUTER JOIN vr ON lr.q_id = vr.q_id AND lr.c_id = vr.c_id)
      SELECT q_id, CAST(rn AS BIGINT) AS rank, c_id, rrf FROM (
        SELECT q_id, c_id, rrf, ROW_NUMBER() OVER (PARTITION BY q_id
          ORDER BY rrf DESC, c_id) AS rn FROM f)
      WHERE rn <= 5 ORDER BY q_id, rank""")),

    // C43 ---------------------------------------------------------------
    // LM-surprisal quality filter (the CCNet / Wenzek et al. 2020 shape:
    // score every document under a corpus language model, drop the
    // high-perplexity tail). The model is a bigram LM estimated from the
    // corpus itself; a bigram instance (w1,w2)'s surprisal is the scaled
    // inverse conditional probability c(w1·)/c(w1,w2) — a monotone stand-in
    // for -log P(w2|w1) that stays in exact integer arithmetic (one
    // integer division per DISTINCT bigram, no cross-libm `ln`, no float
    // accumulation order to diverge from the oracle). A document's score
    // is the mean surprisal of its bigram instances; the report is the 50
    // most-surprising documents — the slice a curation pipeline would
    // route to the drop/review bucket. 100 TB shape: one explode
    // (shuffle-free Generate) -> one groupBy(bigram) for the counts (Zipf
    // head keys pre-combined by the partial aggregate) -> the context
    // total c(w1·) derived from the vocabulary-sized count table, NOT
    // from a second instance-level pass -> one shuffle-hash join of
    // instances back on the bigram key -> per-doc partial-agg sums ->
    // TakeOrdered(50), never a global sort. The 1e9 scale keeps
    // c1*1e9 < 2^63 up to ~1e9 occurrences of a single context word;
    // beyond that, drop the scale a decade per three orders of corpus
    // growth.
    GQ("surprisal_filter", (s, d) => {
      import s.implicits._
      val bg = table(s, d, "documents")
        .withColumn("t", tokens($"text"))
        .filter(size($"t") >= 2)
        .select($"doc_id", explode(transform(sequence(lit(1), size($"t") - 1), i =>
          concat_ws(" ", element_at($"t", i), element_at($"t", i + 1)))).as("bg"))
      val c2 = bg.groupBy($"bg").agg(count(lit(1)).as("c2"))
      val cnt = c2.withColumn("w1", split($"bg", " ").getItem(0))
        .withColumn("c1", sum($"c2").over(
          org.apache.spark.sql.expressions.Window.partitionBy($"w1")))
        .select($"bg", expr("c1 * 1000000000 div c2").as("s"))
      bg.join(cnt, Seq("bg"))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_bigrams"), sum($"s").as("surprisal_sum"))
        .withColumn("avg_surprisal",
          $"surprisal_sum".cast("double") / $"n_bigrams".cast("double"))
        .orderBy($"avg_surprisal".desc, $"doc_id")
        .limit(50)
    }, Some("""
      WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
                 FROM documents),
      bg AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(t)-1),
                i -> t[i] || ' ' || t[i+1])) AS bg
             FROM t WHERE len(t) >= 2),
      c2 AS (SELECT bg, CAST(COUNT(*) AS BIGINT) AS c2 FROM bg GROUP BY bg),
      cnt AS (SELECT bg,
            CAST(SUM(c2) OVER (PARTITION BY split_part(bg, ' ', 1)) AS BIGINT)
              * 1000000000 // c2 AS s
          FROM c2),
      per AS (SELECT doc_id, COUNT(*) AS n_bigrams, CAST(SUM(s) AS BIGINT) AS surprisal_sum
              FROM bg JOIN cnt USING (bg) GROUP BY doc_id)
      SELECT doc_id, n_bigrams, surprisal_sum,
        CAST(surprisal_sum AS DOUBLE) / CAST(n_bigrams AS DOUBLE) AS avg_surprisal
      FROM per ORDER BY avg_surprisal DESC, doc_id LIMIT 50""")),

    // C44 ---------------------------------------------------------------
    // DSIR-style data selection (Xie et al. 2023, "Data Selection for
    // Language Models via Importance Resampling"): score raw documents by
    // how target-like their HASHED unigram features are, select the top
    // slice. Features are md5-bucketed tokens (128 buckets — the same
    // engine-portable md5 coin as split_holdout, so Spark and the oracle
    // bucket identically); the target distribution is the English slice
    // standing in for "high-quality reference corpus". A bucket's weight
    // is the integer-scaled target share tgt/tot (the linear-domain
    // importance ratio — exact integers, no cross-libm log), a document
    // scores the mean bucket weight over its token instances, and the
    // report is the 100 most target-like documents. 100 TB shape:
    // bucketing is map-only per token; the bucket table is FIXED-SIZE
    // (128 rows regardless of corpus size) and broadcast — the only
    // shuffles are the bucket-count partial agg and the per-doc sum, both
    // absorbed map-side; top-k is TakeOrdered, never a global sort.
    GQ("dsir_select", (s, d) => {
      import s.implicits._
      val tok = table(s, d, "documents")
        .select($"doc_id", $"lang", explode(tokens($"text")).as("token"))
        .withColumn("b",
          conv(substring(md5($"token"), 1, 8), 16, 10).cast("long") % 128)
      val buckets = tok.groupBy($"b").agg(
          count(lit(1)).as("tot"),
          sum(when($"lang" === "en", 1L).otherwise(0L)).as("tgt"))
        .select($"b", expr("tgt * 1000000 div tot").as("w"))
      tok.join(broadcast(buckets), Seq("b"))
        .groupBy($"doc_id", $"lang")
        .agg(count(lit(1)).as("n_tokens"), sum($"w").as("w_sum"))
        .withColumn("avg_w", $"w_sum".cast("double") / $"n_tokens".cast("double"))
        .orderBy($"avg_w".desc, $"doc_id")
        .limit(100)
    }, Some("""
      WITH tok AS (SELECT doc_id, lang,
              unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
            FROM documents),
      tb AS (SELECT doc_id, lang,
              CAST(('0x' || substr(md5(token), 1, 8)) AS BIGINT) % 128 AS b
             FROM tok),
      bw AS (SELECT b,
              CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
                * 1000000 // CAST(COUNT(*) AS BIGINT) AS w
             FROM tb GROUP BY b),
      per AS (SELECT doc_id, lang, COUNT(*) AS n_tokens, CAST(SUM(w) AS BIGINT) AS w_sum
              FROM tb JOIN bw USING (b) GROUP BY doc_id, lang)
      SELECT doc_id, lang, n_tokens, w_sum,
        CAST(w_sum AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS avg_w
      FROM per ORDER BY avg_w DESC, doc_id LIMIT 100""")),

    // C51 ---------------------------------------------------------------
    // Deterministic stratified sampling: per-stratum (source) keep rates
    // applied via a salted content hash — the reproducible "take p% of
    // each domain" primitive every curation run needs (rerunning the
    // pipeline, or running it on different cluster sizes, must select
    // the SAME documents; rand() cannot). The hash is md5 of the doc id,
    // so membership is a pure per-row predicate: fully pushed into the
    // scan, no shuffle until the per-stratum report aggregation. Rates
    // vary by stratum (50–810 per-mille derived from the source id) to
    // prove per-stratum thresholds, not one global Bernoulli.
    GQ("sample_stratum_report", (s, d) => {
      import s.implicits._
      val docs = table(s, d, "documents")
        .withColumn("rate_pm",
          (lit(50L) + lit(40L) * (substring($"source", 4, 10).cast("long") % 20)))
        .withColumn("h",
          conv(substring(md5($"doc_id".cast("string")), 1, 8), 16, 10)
            .cast("long") % 1000)
      docs.groupBy($"source").agg(
          count(lit(1)).as("n_docs"),
          sum(when($"h" < $"rate_pm", 1L).otherwise(0L)).as("n_kept"),
          sum(when($"h" < $"rate_pm", $"n_chars").otherwise(0L)).as("kept_chars"),
          min(when($"h" < $"rate_pm", $"doc_id")).as("first_kept"),
          max(when($"h" < $"rate_pm", $"doc_id")).as("last_kept"))
        .orderBy($"source")
    }, Some("""
      WITH h AS (SELECT source, doc_id, n_chars,
              50 + 40 * (CAST(substr(source, 4) AS BIGINT) % 20) AS rate_pm,
              CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000 AS h
            FROM documents)
      SELECT source, COUNT(*) AS n_docs,
        CAST(SUM(CASE WHEN h < rate_pm THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        CAST(SUM(CASE WHEN h < rate_pm THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars,
        MIN(CASE WHEN h < rate_pm THEN doc_id END) AS first_kept,
        MAX(CASE WHEN h < rate_pm THEN doc_id END) AS last_kept
      FROM h GROUP BY source ORDER BY source""")),

    // C52 ---------------------------------------------------------------
    // Domain-mixture reweighting at temperature τ=0.5 (the sqrt-share
    // sampling of the public multilingual-pretraining recipes: up-weight
    // small domains, down-weight dominant ones): per source compute the
    // natural token share, the τ-tempered target share, and the
    // per-domain sampling boost the loader applies. Determinism rule:
    // the τ-share NORMALIZER is a sum of floor(1e9·sqrt(share))
    // INTEGERS, not doubles — double addition is order-sensitive and
    // a 1000-executor run must produce the byte-identical mixture.
    // One groupBy(source) shuffle of (count,sum) partials; the totals
    // attach via broadcast of one row.
    GQ("mix_weights", (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      // after the one groupBy(source) pass the frame is #sources rows;
      // the corpus total and the tau-share normalizer attach via
      // degenerate whole-frame windows (INTEGER sums — order-free) so
      // the expensive tokenization scan runs ONCE, not once per scalar
      val all = Window.partitionBy(lit(1))
      table(s, d, "documents")
        .withColumn("n_tok", size(tokens($"text")).cast("long"))
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"), sum($"n_tok").as("n_tokens"))
        .withColumn("tot", sum($"n_tokens").over(all))
        .withColumn("nat_share", $"n_tokens".cast("double") / $"tot".cast("double"))
        .withColumn("s_i", floor(sqrt($"nat_share") * lit(1e9)).cast("long"))
        .withColumn("s_sum", sum($"s_i").over(all))
        .withColumn("tgt_share", $"s_i".cast("double") / $"s_sum".cast("double"))
        .withColumn("boost", $"tgt_share" / $"nat_share")
        .select($"source", $"n_docs", $"n_tokens", $"nat_share",
          $"tgt_share", $"boost")
        .orderBy($"source")
    }, Some("""
      WITH per AS (SELECT source, COUNT(*) AS n_docs,
              CAST(SUM(len(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS BIGINT) AS n_tokens
            FROM documents GROUP BY source),
      tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot FROM per),
      sc AS (SELECT source, n_docs, n_tokens,
              CAST(n_tokens AS DOUBLE) / CAST(tot AS DOUBLE) AS nat_share,
              CAST(floor(sqrt(CAST(n_tokens AS DOUBLE) / CAST(tot AS DOUBLE)) * 1e9) AS BIGINT) AS s_i
            FROM per CROSS JOIN tot),
      nrm AS (SELECT CAST(SUM(s_i) AS BIGINT) AS s_sum FROM sc)
      SELECT source, n_docs, n_tokens, nat_share,
        CAST(s_i AS DOUBLE) / CAST(s_sum AS DOUBLE) AS tgt_share,
        (CAST(s_i AS DOUBLE) / CAST(s_sum AS DOUBLE)) / nat_share AS boost
      FROM sc CROSS JOIN nrm ORDER BY source""")),

    // C53 ---------------------------------------------------------------
    // Distinct-count sketch: per-event-type user cardinality via the
    // custom HLL TypedImperativeAggregate (graft.functions.HllSketchAgg)
    // next to the exact countDistinct. The sketch partial-aggregates —
    // one 256-byte register array per map task per group crosses the
    // shuffle, vs countDistinct's shuffle of every distinct value — the
    // shape that makes per-key cardinality viable at 100 TB. Every bit
    // of the sketch derives from the cross-engine md5 hash and the
    // estimate uses only IEEE-deterministic ops, so DuckDB replicates
    // it EXACTLY (validated bit-identical: registers, sums, estimate).
    GQ("distinct_sketch", (s, d) => {
      import s.implicits._
      QueryDefs.events(s, d)
        .groupBy($"event_type")
        .agg(graft.functions.SketchExpressions.hllSketch($"user_id").as("h"),
          countDistinct($"user_id").as("n_exact"))
        .select($"event_type", $"h.estimate".as("hll_estimate"),
          $"h.n_empty_regs".as("n_empty_regs"), $"n_exact")
        .orderBy($"event_type")
    }, Some("""
      WITH h AS (SELECT event_type,
              CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
            FROM events),
      r AS (SELECT event_type, h >> 52 AS reg,
              h & ((CAST(1 AS BIGINT) << 52) - 1) AS w FROM h),
      m AS (SELECT event_type, reg,
              MAX(CASE WHEN w = 0 THEN 53 ELSE 53 - length(bin(w)) END) AS rho
            FROM r GROUP BY 1, 2),
      s AS (SELECT event_type,
              CAST(SUM(CAST(1 AS BIGINT) << (53 - rho)) AS BIGINT)
                + (256 - COUNT(*)) * (CAST(1 AS BIGINT) << 53) AS S,
              CAST(256 - COUNT(*) AS BIGINT) AS V
            FROM m GROUP BY 1),
      x AS (SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
            FROM events GROUP BY 1)
      SELECT s.event_type,
        CAST(0.7213 AS DOUBLE)/(CAST(1.0 AS DOUBLE) + CAST(1.079 AS DOUBLE)/CAST(256.0 AS DOUBLE))
          * 65536.0 * 9007199254740992.0 / CAST(S AS DOUBLE) AS hll_estimate,
        V AS n_empty_regs, n_exact
      FROM s JOIN x ON s.event_type = x.event_type
      ORDER BY s.event_type""")),

    // C55 ---------------------------------------------------------------
    // ExactSubstr-style byte-level span dedup (the Lee et al. verbatim-
    // overlap family; C25's word shingles miss duplicates that differ in
    // whitespace/punctuation): Rabin–Karp rolling hash over UTF-8 bytes,
    // 48-byte windows sampled every 8 bytes — ONE O(n) pass per doc via
    // graft.functions.RollingHashWindows, never O(n·w). The dedup is
    // gram-keyed like C25: window fingerprints partial-agg to document
    // frequencies (only (doc_id,off,h) triples shuffle), fingerprints
    // shared by ≥2 docs survive, and an id-sized join back scores each
    // doc's duplicated-span coverage. NO all-pairs stage at any step;
    // the report is the 100 most duplicated documents.
    GQ("dedup_substr", (s, d) => {
      import s.implicits._
      val wins = table(s, d, "documents")
        .select($"doc_id",
          explode(org.apache.spark.sql.GraftShims.column(
            graft.functions.RollingHashWindows(
              org.apache.spark.sql.GraftShims.expression($"text"), 48, 8)))
            .as("w"))
        .select($"doc_id", $"w.h".as("h"))
      val dupFps = wins.groupBy($"h")
        .agg(countDistinct($"doc_id").as("n_docs"))
        .filter($"n_docs" >= 2)
        .select($"h", $"n_docs")
      val perDoc = wins.groupBy($"doc_id").agg(count(lit(1)).as("n_wins"))
      val dupPerDoc = wins.join(dupFps, Seq("h"))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_dup_wins"),
          countDistinct($"h").as("n_dup_fps"))
      perDoc.join(dupPerDoc, Seq("doc_id"))
        .withColumn("dup_ratio",
          $"n_dup_wins".cast("double") / $"n_wins".cast("double"))
        .select($"doc_id", $"n_wins", $"n_dup_wins", $"n_dup_fps", $"dup_ratio")
        .orderBy($"dup_ratio".desc, $"doc_id")
        .limit(100)
    }, Some("""
      WITH w0 AS (
        SELECT doc_id, text,
          unnest(range(1, length(text) - 46, 8)) AS o
        FROM documents),
      w AS (
        SELECT doc_id,
          list_reduce(
            list_transform(range(0, 48),
              i -> CAST(ord(substr(text, CAST(o + i AS INTEGER), 1)) AS BIGINT)),
            (acc, b) -> (acc * 256 + b) % 1000000000039) AS h
        FROM w0),
      dup AS (SELECT h FROM w GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
      per AS (SELECT doc_id, COUNT(*) AS n_wins FROM w GROUP BY doc_id),
      dpd AS (SELECT doc_id, COUNT(*) AS n_dup_wins, COUNT(DISTINCT h) AS n_dup_fps
              FROM w JOIN dup USING (h) GROUP BY doc_id)
      SELECT doc_id, n_wins, n_dup_wins, n_dup_fps,
        CAST(n_dup_wins AS DOUBLE) / CAST(n_wins AS DOUBLE) AS dup_ratio
      FROM per JOIN dpd USING (doc_id)
      ORDER BY dup_ratio DESC, doc_id LIMIT 100""")),

    // C57 ---------------------------------------------------------------
    // BPE tokenizer-training prep: global adjacent-character-pair
    // frequencies over the [a-z0-9] word alphabet — the statistic that
    // decides the first BPE merge (Sennrich et al. 2016; merges never
    // cross word boundaries). Scale shape: CharPairVector counts a
    // document's pairs into a 1296-cell vector in one pass, and
    // LongVectorSumAgg ships ONE such vector per map task — corpus-wide
    // pair counts WITHOUT exploding ~every character through a groupBy
    // (at 100 TB the explode IS the job). The (k -> pair) decode is a
    // broadcast over the single result row; report = top-50 pairs.
    GQ("bpe_pair_counts", (s, d) => {
      import s.implicits._
      val pv = org.apache.spark.sql.GraftShims.column(
        graft.functions.CharPairVector(
          org.apache.spark.sql.GraftShims.expression($"text")))
      val one = table(s, d, "documents").select(pv.as("pv"))
        .agg(graft.functions.LongVectorSumAgg($"pv", 1296).as("v"))
      val pairs = (0 until 1296)
        .map(k => (k, graft.functions.CharPairVector.pairOf(k)))
        .toDF("k", "pair")
      one.select(posexplode($"v").as(Seq("k", "n")))
        .join(broadcast(pairs), Seq("k"))
        .filter($"n" > 0)
        .select($"pair", $"n")
        .orderBy($"n".desc, $"pair")
        .limit(50)
    }, Some("""
      WITH w AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
                 FROM documents),
      i AS (SELECT w, unnest(range(1, length(w))) AS i FROM w),
      p AS (SELECT substring(w, CAST(i AS INTEGER), 2) AS pair FROM i),
      c AS (SELECT pair, COUNT(*) AS n FROM p GROUP BY pair)
      SELECT pair, n FROM c ORDER BY n DESC, pair LIMIT 50""")),

    // C59 ---------------------------------------------------------------
    // The CUT side of ExactSubstr dedup (Lee et al. REMOVE the verbatim
    // spans, not just flag them): C55's duplicated windows are merged
    // into maximal per-document byte islands (classic gaps-and-islands
    // over the stride grid — overlapping/adjacent windows coalesce), and
    // the report gives each document's removable byte count and kept
    // ratio — everything the downstream cutter needs, without shipping
    // text anywhere. Scale: the only per-doc window function runs over
    // that document's DUP spans (bounded by doc length / stride), after
    // the same no-all-pairs fingerprint pipeline as C55; text leaves the
    // scan once, as lengths.
    GQ("dedup_substr_cut", (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val docs = table(s, d, "documents")
      val wins = docs
        .select($"doc_id",
          explode(org.apache.spark.sql.GraftShims.column(
            graft.functions.RollingHashWindows(
              org.apache.spark.sql.GraftShims.expression($"text"), 48, 8)))
            .as("w"))
        .select($"doc_id", $"w.off".as("off"), $"w.h".as("h"))
      val dupH = wins.groupBy($"h")
        .agg(countDistinct($"doc_id").as("nd")).filter($"nd" >= 2).select($"h")
      val spans = wins.join(dupH, Seq("h"))
        .select($"doc_id", $"off", ($"off" + 47).as("e"))
      val byOff = Window.partitionBy($"doc_id").orderBy($"off")
      val marked = spans
        .withColumn("prev_max",
          max($"e").over(byOff.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("new_island",
          when($"prev_max".isNull || $"off" > $"prev_max" + 1, 1L).otherwise(0L))
        .withColumn("island",
          sum($"new_island").over(byOff.rowsBetween(Window.unboundedPreceding, 0)))
      marked.groupBy($"doc_id", $"island")
        .agg(min($"off").as("s0"), max($"e").as("e0"))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_islands"),
          sum($"e0" - $"s0" + 1).as("removed_bytes"))
        .join(docs.select($"doc_id", length($"text").cast("long").as("total_bytes")),
          Seq("doc_id"))
        .withColumn("kept_ratio",
          ($"total_bytes" - $"removed_bytes").cast("double")
            / $"total_bytes".cast("double"))
        .select($"doc_id", $"n_islands", $"removed_bytes", $"total_bytes",
          $"kept_ratio")
        .orderBy($"removed_bytes".desc, $"doc_id")
        .limit(100)
    }, Some("""
      WITH w0 AS (
        SELECT doc_id, text,
          unnest(range(1, length(text) - 46, 8)) AS o
        FROM documents),
      w AS (
        SELECT doc_id, o AS off,
          list_reduce(
            list_transform(range(0, 48),
              i -> CAST(ord(substr(text, CAST(o + i AS INTEGER), 1)) AS BIGINT)),
            (acc, b) -> (acc * 256 + b) % 1000000000039) AS h
        FROM w0),
      dup AS (SELECT h FROM w GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
      sp AS (SELECT doc_id, off, off + 47 AS e FROM w JOIN dup USING (h)),
      m AS (SELECT doc_id, off, e,
              MAX(e) OVER (PARTITION BY doc_id ORDER BY off
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
            FROM sp),
      isl AS (SELECT doc_id, off, e,
              SUM(CASE WHEN prev_max IS NULL OR off > prev_max + 1 THEN 1 ELSE 0 END)
                OVER (PARTITION BY doc_id ORDER BY off
                  ROWS UNBOUNDED PRECEDING) AS island
            FROM m),
      g AS (SELECT doc_id, island, MIN(off) AS s0, MAX(e) AS e0
            FROM isl GROUP BY 1, 2),
      r AS (SELECT doc_id, COUNT(*) AS n_islands,
              CAST(SUM(e0 - s0 + 1) AS BIGINT) AS removed_bytes
            FROM g GROUP BY 1)
      SELECT r.doc_id, r.n_islands, r.removed_bytes,
        CAST(length(t.text) AS BIGINT) AS total_bytes,
        CAST(length(t.text) - r.removed_bytes AS DOUBLE)
          / CAST(length(t.text) AS DOUBLE) AS kept_ratio
      FROM r JOIN documents t ON r.doc_id = t.doc_id
      ORDER BY removed_bytes DESC, r.doc_id LIMIT 100""")),

    // C64 ---------------------------------------------------------------
    // BPE ENCODE — the TRUE iterative tokenizer-training loop (Sennrich
    // et al. 2016): K = 24 rounds of count → pick THE top pair → merge →
    // RECOUNT, because each merge changes the pair distribution (after
    // 'ab'→'A', the corpus 'ababab' offers 'AA' — a pair round-1 counts
    // never saw; a single-pass top-K gets this wrong, pinned by
    // BpeTrainingSuite). Merges never cross word boundaries; the
    // replacement symbols chr(0xC0+r) grow the alphabet to 36+K, and later
    // merges may contain earlier symbols. Each training round is ONE
    // map-only [[BpePairVector]] pass + a (36+r)²-cell LongVectorSumAgg —
    // the merge table stays an O(K) driver MODEL ARTIFACT, never
    // corpus-sized. Encoding applies the merges SEQUENTIALLY, each as
    // one non-overlapping left-to-right `replace(word, pair, symbol)` —
    // the exact greedy semantics both Spark's and DuckDB's `replace`
    // share, so the oracle replays BOTH the training rounds (K unrolled
    // count/argmax/rewrite CTE pairs) and the encode (recursive CTE, one
    // step per merge rank) verbatim. The encode itself stays pure
    // per-row string expressions (one codegen'd projection; no shuffle,
    // no UDF, no explode: the per-doc token count folds inside
    // `aggregate(transform(words, chain), ...)`).
    GQ("bpe_encode", (s, d) => {
      import s.implicits._
      // learn: K iterative rounds over the (cached) corpus; each round
      // picks the top pair by (count desc, pair asc) — ties broken
      // identically in the oracle's ORDER BY n DESC, pair LIMIT 1.
      // K = 24 exercises the past-16-merges regime (r17: the merge
      // alphabet is the 64-char 0xC0..0xFF block, no 16-cap)
      val docs = table(s, d, "documents").select($"doc_id", $"text").persist()
      val merges: Seq[String] = Corpus.bpeLearn(docs, Corpus.BpeEncodeK)
      // apply: merge r rewrites its pair to symbol chr(0xC0+r)
      // ('À'..., disjoint from the [a-z0-9] word alphabet)
      def chain(w: org.apache.spark.sql.Column) =
        merges.zipWithIndex.foldLeft(w) { case (c, (p, i)) =>
          call_function("replace", c, lit(p),
            lit(graft.functions.BpePairVector.mergeSymbol(i).toString))
        }
      val words = regexp_extract_all(lower($"text"), lit("[a-z0-9]+"), lit(0))
      val res = docs
        .select($"doc_id", words.as("ws"))
        .select($"doc_id",
          aggregate($"ws", lit(0L), (a, x) => a + length(x)).as("n_chars"),
          aggregate(transform($"ws", chain(_)), lit(0L),
            (a, x) => a + length(x)).as("n_tokens"))
        .withColumn("compression",
          when($"n_tokens" > 0,
            $"n_chars".cast("double") / $"n_tokens".cast("double")))
        .orderBy($"doc_id")
      docs.unpersist()
      res
    }, Some(Corpus.bpeReplayOracle)),

    // C68 ---------------------------------------------------------------
    // PRODUCTION-VOCAB BPE — the scale path past C64's per-round corpus
    // pass. C64 recounts the WHOLE corpus once per merge (K passes: the
    // honest cost of the dense-vector formulation, fine at K<=1024,
    // hopeless at a 32k vocab). The published fast trainer (Sennrich's
    // own learn_bpe, SentencePiece, HF tokenizers) never does that: it
    // aggregates the corpus ONCE into a word-frequency DICT — training
    // on (word, n) is exactly training on the word multiset — and runs
    // the merge loop over the dict with INCREMENTAL pair-count updates
    // (only words containing the merged pair change). Here: the dict is
    // the one corpus-sized operation (map-combined groupBy on uniform
    // word keys — the corpus_stats shuffle shape), frequency-truncated
    // by minFreq (the standard rare-word cutoff that bounds it at any
    // corpus size) and hard-capped by spark.graft.bpe.maxDictWords with
    // a loud refusal (the A82 bounded-driver contract); the trainer is
    // a lazy-deletion max-heap over packed int-symbol pairs, O(affected
    // words) per merge; encode is [[graft.functions.BpeTokenCount]] —
    // the real greedy rank-based merge loop as one map-only expression
    // with the O(K) merge table riding the plan as a model artifact.
    // Symbol ids are codepoints (merge r -> 192+r), so for K<=1024 the
    // tie-break (count desc, (id1,id2) asc) IS C64's pair-string order
    // and the two trainers are the same algorithm — pinned by sharing
    // C64's replay oracle verbatim at K=24: a trainer drift, a dict
    // aggregation bug, or an encode inequivalence all hash-mismatch.
    // BpeSparseSuite trains K=4096 to pin the past-any-char-block
    // regime (valid merge chains, round-trip detokenization,
    // monotone compression).
    GQ("bpe_sparse_encode", (s, d) => {
      import s.implicits._
      val docs = table(s, d, "documents").select($"doc_id", $"text")
      val merges = Corpus.bpeLearnSparse(docs, Corpus.BpeEncodeK)
      val cnt = org.apache.spark.sql.GraftShims.column(
        graft.functions.BpeTokenCount(
          org.apache.spark.sql.GraftShims.expression($"text"), merges))
      docs.select($"doc_id",
          aggregate(tokens($"text"), lit(0L), (a, x) => a + length(x)).as("n_chars"),
          cnt.as("n_tokens"))
        .withColumn("compression",
          when($"n_tokens" > 0,
            $"n_chars".cast("double") / $"n_tokens".cast("double")))
        .orderBy($"doc_id")
    }, Some(Corpus.bpeReplayOracle))
  )

  /** The C64/C68 shared DuckDB replay: K unrolled iterative training
    * rounds (m<r> = top pair of corpus state w<r> by count desc, pair
    * asc; w<r+1> merges it to chr(192+r)) + the recursive-CTE encode.
    * Every w<r> is referenced twice (count + rewrite) — MATERIALIZED
    * keeps the chain linear. BOTH trainers must reproduce this replay
    * exactly; sharing one oracle is the equivalence pin.
    */
  private[llm] lazy val bpeReplayOracle: String = {
    val learnCtes = (0 until BpeEncodeK).map { r =>
      val sym = graft.functions.BpePairVector.mergeSymbol(r)
      s"""m$r AS MATERIALIZED (SELECT pair FROM (
            SELECT substring(w, CAST(i AS INTEGER), 2) AS pair, COUNT(*) AS n
            FROM (SELECT w, unnest(range(1, length(w))) AS i FROM w$r)
            GROUP BY 1 ORDER BY n DESC, pair LIMIT 1)),
      w${r + 1} AS MATERIALIZED (SELECT replace(w, COALESCE((SELECT pair FROM m$r), chr(1)), '$sym') AS w FROM w$r)"""
    }.mkString(",\n      ")
    val mergeTable = (0 until BpeEncodeK)
      .map(r => s"SELECT $r AS r, pair FROM m$r").mkString(" UNION ALL ")
    s"""
      WITH w0 AS MATERIALIZED (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
                 FROM documents),
      $learnCtes,
      m AS ($mergeTable),
      nm AS (SELECT COUNT(*) AS k FROM m),
      dw AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
             FROM documents),
      enc AS (
        WITH RECURSIVE e AS (
          SELECT doc_id, w, length(w) AS c0, 0 AS r FROM dw
          UNION ALL
          SELECT e.doc_id, replace(e.w, m.pair, chr(192 + e.r)), e.c0, e.r + 1
          FROM e JOIN m ON m.r = e.r)
        SELECT doc_id, c0, length(w) AS ct FROM e
        WHERE r = (SELECT k FROM nm)),
      agg AS (SELECT doc_id, CAST(SUM(c0) AS BIGINT) AS n_chars,
                CAST(SUM(ct) AS BIGINT) AS n_tokens
              FROM enc GROUP BY doc_id)
      SELECT d.doc_id,
        COALESCE(a.n_chars, 0) AS n_chars,
        COALESCE(a.n_tokens, 0) AS n_tokens,
        CASE WHEN COALESCE(a.n_tokens, 0) > 0
             THEN CAST(a.n_chars AS DOUBLE) / CAST(a.n_tokens AS DOUBLE)
        END AS compression
      FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
      ORDER BY d.doc_id"""
  }

  /** Iterative BPE training (the C64 learn loop): K rounds of recount →
    * take THE top pair → merge, each round one [[graft.functions
    * .BpePairVector]] map pass over `docs` reduced by a (36+r)²-cell
    * LongVectorSumAgg — the merge table is an O(K) driver model
    * artifact; the corpus is never collected. Stops early if the corpus
    * runs out of pairs.
    */
  private[llm] def bpeLearn(docs: org.apache.spark.sql.DataFrame, k: Int): Seq[String] = {
    // merge symbols are the contiguous BMP block from 0xC0 — single
    // chars with identical replace/length semantics in Spark and DuckDB
    // at ANY index (both count codepoints); K is capped by the dense
    // pair-count vector's buffer size, not the block width
    require(k <= graft.functions.BpePairVector.MaxK,
      s"bpeLearn supports at most ${graft.functions.BpePairVector.MaxK} " +
        s"merges, got $k")
    val s = docs.sparkSession
    import s.implicits._
    var merges = Vector.empty[String]
    var r = 0
    var exhausted = false
    while (r < k && !exhausted) {
      // the pair vector GROWS with the merge chain: round r counts over
      // the (36+r)-symbol alphabet, so merged-symbol pairs stay indexable
      // at any K up to the block size
      val pv = org.apache.spark.sql.GraftShims.column(
        graft.functions.BpePairVector(
          org.apache.spark.sql.GraftShims.expression(col("text")), merges))
      val nm = merges.length
      val top = docs.select(pv.as("pv"))
        .agg(graft.functions.LongVectorSumAgg($"pv",
          graft.functions.BpePairVector.cellsFor(nm)).as("v"))
        .select(posexplode($"v").as(Seq("k", "n")))
        .filter($"n" > 0).select($"k", $"n").collect()
        .map(row => (graft.functions.BpePairVector.pairOf(row.getInt(0), nm),
          row.getLong(1)))
        .sortBy { case (p, n) => (-n, p) }.headOption
      top match {
        case Some((p, _)) => merges = merges :+ p
        case None => exhausted = true
      }
      r += 1
    }
    merges
  }

  /** Production-vocab BPE training (the C68 learn loop): one corpus-sized
    * map-combined groupBy reduces the corpus to a (word, n) frequency
    * dict — training on the dict is EXACTLY training on the word
    * multiset — then the published incremental trainer runs over it:
    * pair counts keyed by packed int-symbol pairs, a lazy-deletion
    * max-heap picking each round's top pair by (count desc, (id1,id2)
    * asc) — identical to [[bpeLearn]]'s pair-string tie-break because
    * symbol ids ARE codepoints ([[graft.functions.BpeCoder]]) — and
    * per-merge updates touching only the words that contain the merged
    * pair (tracked in per-pair BitSets). O(dict + total merge work),
    * independent of K's corpus passes; no cap on K.
    *
    * Driver-bound contract (A82 pattern): the dict is frequency-
    * truncated by `minFreq` (the standard rare-word cutoff — at corpus
    * scale the dict is sublinear and a threshold bounds it outright)
    * and hard-capped by `spark.graft.bpe.maxDictWords` (default 4M,
    * ~a few hundred MB of driver state at typical word lengths) with a
    * loud refusal telling the caller to raise minFreq; the collect is
    * LIMIT-bounded so an over-cap dict never materializes.
    */
  private[llm] def bpeLearnSparse(docs: org.apache.spark.sql.DataFrame, k: Int,
      minFreq: Long = 1L): Seq[(Int, Int)] = {
    val s = docs.sparkSession
    import s.implicits._
    val maxDict = s.conf.get("spark.graft.bpe.maxDictWords", "4000000").toInt
    // order-stable probe: the limit is applied to a (freq desc, word)
    // sorted dict, so near-cap corpora behave reproducibly — the rows a
    // plan change could swap in or out of the collected window are
    // pinned, not whichever partitions answered first. The sort is
    // dict-sized (post-aggregation), not corpus-sized.
    val dict = docs
      .select(explode(graft.queries.QueryDefs.tokens(col("text"))).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("n"))
      .filter($"n" >= minFreq)
      .orderBy($"n".desc, $"w")
      .limit(maxDict + 1)
      .as[(String, Long)].collect()
    require(dict.length <= maxDict,
      s"bpeLearnSparse: distinct-word dict exceeds " +
        s"spark.graft.bpe.maxDictWords=$maxDict at minFreq=$minFreq — " +
        "raise minFreq (the rare-word cutoff) or the cap")

    val nW = dict.length
    val words = new Array[Array[Int]](nW)
    val freqs = new Array[Long](nW)
    var i = 0
    while (i < nW) {
      val w = dict(i)._1
      val cps = new Array[Int](w.length)
      var j = 0
      while (j < w.length) { cps(j) = w.charAt(j); j += 1 }
      words(i) = cps
      freqs(i) = dict(i)._2
      i += 1
    }

    // initial pair stats: count = sum of word freqs over every adjacent
    // position (overlapping positions count separately, exactly as the
    // dense vector and the oracle's per-position substring count do);
    // members(p) = word indexes containing p
    val counts = new scala.collection.mutable.LongMap[Long]()
    val members = new scala.collection.mutable.LongMap[java.util.BitSet]()
    i = 0
    while (i < nW) {
      val arr = words(i)
      val f = freqs(i)
      var j = 0
      while (j + 1 < arr.length) {
        val key = graft.functions.BpeCoder.pack(arr(j), arr(j + 1))
        counts(key) = counts.getOrElse(key, 0L) + f
        members.getOrElseUpdate(key, new java.util.BitSet(nW)).set(i)
        j += 1
      }
      i += 1
    }

    // lazy-deletion heap: every count UPDATE pushes a fresh (count, pair)
    // entry; popped entries are valid only if they match the live count
    val heap = new java.util.PriorityQueue[(Long, Long)](
      math.max(16, counts.size),
      new java.util.Comparator[(Long, Long)] {
        def compare(x: (Long, Long), y: (Long, Long)): Int = {
          val c = java.lang.Long.compare(y._1, x._1) // count desc
          if (c != 0) c else java.lang.Long.compare(x._2, y._2) // pair asc
        }
      })
    counts.foreach { case (key, n) => heap.add((n, key)) }

    def pairKeys(arr: Array[Int]): Array[Long] = {
      if (arr.length < 2) return Array.emptyLongArray
      val out = new Array[Long](arr.length - 1)
      var j = 0
      while (j + 1 < arr.length) {
        out(j) = graft.functions.BpeCoder.pack(arr(j), arr(j + 1))
        j += 1
      }
      out
    }

    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var r = 0
    var exhausted = false
    while (r < k && !exhausted) {
      var top: (Long, Long) = null
      while (top == null && !heap.isEmpty) {
        val e = heap.poll()
        if (e._1 > 0L && counts.getOrElse(e._2, 0L) == e._1) top = e
      }
      if (top == null) exhausted = true
      else {
        val key = top._2
        val a = graft.functions.BpeCoder.unpackA(key)
        val b = graft.functions.BpeCoder.unpackB(key)
        val nid = graft.functions.BpeCoder.MergeBase + r
        merges += ((a, b))
        // exhaustive LTR merge removes EVERY occurrence of (a,b) in every
        // member word (the minted symbol is fresh, so no new (a,b) can
        // form); deltas below zero the pair's count out of the maps
        val mem = members.getOrElse(key, new java.util.BitSet())
          .clone().asInstanceOf[java.util.BitSet]
        val touched = new scala.collection.mutable.LongMap[Long]()
        var wi = mem.nextSetBit(0)
        while (wi >= 0) {
          val old = words(wi)
          val f = freqs(wi)
          val nw = mergePairLtr(old, a, b, nid)
          val oldKeys = pairKeys(old)
          val newKeys = pairKeys(nw)
          var j = 0
          while (j < oldKeys.length) {
            touched(oldKeys(j)) = touched.getOrElse(oldKeys(j), 0L) - f; j += 1
          }
          j = 0
          while (j < newKeys.length) {
            touched(newKeys(j)) = touched.getOrElse(newKeys(j), 0L) + f; j += 1
          }
          val oldSet = oldKeys.toSet
          val newSet = newKeys.toSet
          oldSet.diff(newSet).foreach(pk => members.get(pk).foreach(_.clear(wi)))
          newSet.diff(oldSet).foreach(pk =>
            members.getOrElseUpdate(pk, new java.util.BitSet(nW)).set(wi))
          words(wi) = nw
          wi = mem.nextSetBit(wi + 1)
        }
        touched.foreach { case (pk, delta) =>
          if (delta != 0L) {
            val nn = counts.getOrElse(pk, 0L) + delta
            if (nn <= 0L) { counts.remove(pk); members.remove(pk) }
            else { counts(pk) = nn; heap.add((nn, pk)) }
          }
        }
      }
      r += 1
    }
    merges.toSeq
  }

  /** One exhaustive left-to-right non-overlapping rewrite of (a,b) -> nid
    * — the int-array twin of `String.replace` on a 2-char pair.
    */
  private def mergePairLtr(arr: Array[Int], a: Int, b: Int, nid: Int): Array[Int] = {
    val out = new Array[Int](arr.length)
    var o = 0
    var i = 0
    while (i < arr.length) {
      if (i + 1 < arr.length && arr(i) == a && arr(i + 1) == b) {
        out(o) = nid; o += 1; i += 2
      } else { out(o) = arr(i); o += 1; i += 1 }
    }
    java.util.Arrays.copyOf(out, o)
  }
}
