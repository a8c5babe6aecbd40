package graft.operators

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.{QueryDef, Scratch, Tables}
import graft.functions.TextFns._
import graft.functions.{Hashing, TextKernels, TextStat}
import graft.warehouse.VersionedParquet

/** Text analysis for the training-data pipeline tier (builder prompt:
  * lang-ID, quality scoring, token counting, fingerprinting), over the
  * `documents` table. Every op is a composition of codegen'd built-ins
  * with an exact DuckDB mirror — these scale linearly (narrow, no
  * shuffle until the final aggregate).
  */
object TextOps {

  /** Shared DuckDB token expression (mirrors TextFns.tokens). */
  private val TOKS =
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x != '')"

  /** Bucket count for the stored postings layout. Fixed at publish
    * time — probes recompute the same `hash(term) % N` with the same
    * Murmur3, so a literal term names exactly one directory. */
  private[graft] val PostingBuckets = 1024

  /** The bucket a term's postings live in: Spark's deterministic
    * Murmur3 `hash` folded into [0, PostingBuckets). */
  private[graft] def termBucket(term: Column): Column =
    pmod(hash(term), lit(PostingBuckets))

  /** Build (once per session) the STORED positional inverted index for
    * q107: `(doc_id, pos, term)` postings published PARTITIONED BY
    * `term_bucket = hash(term) % 1024` through the versioned table
    * format, with the raw term kept as a data column. At 100 TB this is
    * the layout a phrase/proximity store needs: the probe hashes its
    * literal terms to their buckets, so the scan reads exactly one
    * directory per probed term (PartitionFilters) and filters to the
    * term within — the Lucene shard model. Partitioning by the RAW term
    * (the earlier layout) would mint one directory per distinct term:
    * unbounded partition cardinality (10⁷–10⁸ dirs at corpus scale —
    * object stores and metastores die long before that) and already the
    * dominant publish cost at sf0.1. Bucketing bounds the layout at
    * 1024 directories by construction while keeping the same pruning
    * win; the within-bucket term filter is a pushed parquet predicate
    * over a vocabulary/1024 slice. The bucket column is integral, so
    * partition-value type inference is type-stable and needs no
    * pinning (the raw-term layout had to pin inference off so a
    * numeric token like "42" couldn't flip the column type). */
  private[graft] def postingsRoot(s: SparkSession, d: String): String = {
    val root = Scratch.dir(s,
      "q107-postings-" + Integer.toHexString(d.hashCode))
    if (VersionedParquet.currentVersion(s, root).isEmpty) {
      val post = Tables.documents(s, d).select(col("doc_id"),
        posexplode(tokens(col("text"))).as(Seq("pos", "term")))
        .withColumn("term_bucket", termBucket(col("term")))
        // cluster by bucket BEFORE the partitioned write: without this,
        // every write task emits a file into every bucket directory
        // (tasks × buckets small files); clustered, each bucket
        // directory gets one file
        .repartition(col("term_bucket"))
      VersionedParquet.publish(post, root,
        partitionCols = Seq("term_bucket"))
    }
    root
  }

  val queries: Seq[QueryDef] = Seq(

    // ── Quality scoring: length/punct/stopword ratios + bucket ────────────
    QueryDef("q30_text_quality",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val toks = tokens(col("text"))
        // Counting via the native single-pass kernel (TextKernels) — the
        // regex formulations these replace are what the DuckDB oracle
        // still states; TextKernelSpec proves them equivalent.
        val nTokens = TextStat(col("text"), TextKernels.TokenRuns)
        val nAlnum = TextStat(col("text"), TextKernels.AlnumLower)
        val punct = TextStat(col("text"), TextKernels.Punct)
        val stopHits = hitCount(toks, stopwords("en"))
        // NULLIF guards: on a zero-token / empty-text document Spark's x/0
        // yields NULL but DuckDB's IEEE float division yields inf/NaN —
        // nullif on BOTH sides makes the engines agree on NULL.
        docs.select(
            col("doc_id"),
            nTokens.as("n_tokens"),
            (nAlnum.cast("double") / nullif(length(col("text")), lit(0)))
              .as("alnum_ratio"),
            (punct.cast("double") / nullif(length(col("text")), lit(0)))
              .as("punct_ratio"),
            (stopHits.cast("double") / nullif(nTokens, lit(0)))
              .as("stopword_ratio"))
          .withColumn("quality_bucket",
            when(col("n_tokens") < 10, "too_short")
              .when(col("punct_ratio") > 0.1, "punct_heavy")
              .when(col("stopword_ratio") > 0.3, "stopword_heavy")
              .otherwise("ok"))
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS (
             |  SELECT doc_id, text, $TOKS AS toks FROM documents)
             |SELECT doc_id,
             |       CAST(len(toks) AS INT) AS n_tokens,
             |       CAST(length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'))
             |            AS DOUBLE) / nullif(length(text), 0) AS alnum_ratio,
             |       CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g'))
             |            AS DOUBLE) / nullif(length(text), 0) AS punct_ratio,
             |       CAST(len(list_filter(toks, t -> t IN
             |              ('the','a','of','and','to','in','is','that')))
             |            AS DOUBLE) / nullif(len(toks), 0) AS stopword_ratio,
             |       CASE WHEN len(toks) < 10 THEN 'too_short'
             |            WHEN CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]',
             |                   '', 'g')) AS DOUBLE) / length(text) > 0.1
             |              THEN 'punct_heavy'
             |            WHEN CAST(len(list_filter(toks, t -> t IN
             |                   ('the','a','of','and','to','in','is','that')))
             |                   AS DOUBLE) / len(toks) > 0.3
             |              THEN 'stopword_heavy'
             |            ELSE 'ok' END AS quality_bucket
             |FROM t
             |ORDER BY doc_id""".stripMargin)),

    // ── Language ID: stopword-dictionary scoring, deterministic argmax ────
    QueryDef("q31_lang_id",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val toks = tokens(col("text"))
        val scored = docs.select(col("doc_id"), col("lang").as("labeled_lang"),
          hitCount(toks, stopwords("en")).as("en_hits"),
          hitCount(toks, stopwords("de")).as("de_hits"),
          hitCount(toks, stopwords("fr")).as("fr_hits"),
          hitCount(toks, stopwords("es")).as("es_hits"))
        // argmax with a fixed tie order (en > de > fr > es), 0 → unknown
        val best = greatest(col("en_hits"), col("de_hits"), col("fr_hits"), col("es_hits"))
        scored.withColumn("detected_lang",
            when(best === 0, "unknown")
              .when(col("en_hits") === best, "en")
              .when(col("de_hits") === best, "de")
              .when(col("fr_hits") === best, "fr")
              .otherwise("es"))
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id, lang, $TOKS AS toks FROM documents),
             |h AS (
             |  SELECT doc_id, lang AS labeled_lang,
             |    CAST(len(list_filter(toks, t -> t IN
             |      ('the','a','of','and','to','in','is','that'))) AS INT) AS en_hits,
             |    CAST(len(list_filter(toks, t -> t IN
             |      ('der','die','das','und','ist','von','nicht','ein'))) AS INT) AS de_hits,
             |    CAST(len(list_filter(toks, t -> t IN
             |      ('le','les','et','des','une','dans','pour','est'))) AS INT) AS fr_hits,
             |    CAST(len(list_filter(toks, t -> t IN
             |      ('el','los','de','que','y','en','por','para'))) AS INT) AS es_hits
             |  FROM t)
             |SELECT *,
             |  CASE WHEN greatest(en_hits, de_hits, fr_hits, es_hits) = 0
             |         THEN 'unknown'
             |       WHEN en_hits = greatest(en_hits, de_hits, fr_hits, es_hits)
             |         THEN 'en'
             |       WHEN de_hits = greatest(en_hits, de_hits, fr_hits, es_hits)
             |         THEN 'de'
             |       WHEN fr_hits = greatest(en_hits, de_hits, fr_hits, es_hits)
             |         THEN 'fr'
             |       ELSE 'es' END AS detected_lang
             |FROM h
             |ORDER BY doc_id""".stripMargin)),

    // ── Token counting: whitespace words + BPE-ish regex pieces ───────────
    QueryDef("q32_token_count",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          TextStat(col("text"), TextKernels.TokenRuns).as("n_words"),
          // BPE-ish: letter runs, digit runs, or single non-space symbols
          TextStat(col("text"), TextKernels.BpePieces).as("n_pieces"),
          (length(col("text")).cast("double") /
            nullif(TextStat(col("text"), TextKernels.TokenRuns), lit(0)))
            .as("chars_per_word"))
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id,
             |       CAST(len($TOKS) AS INT) AS n_words,
             |       CAST(len(regexp_extract_all(text,
             |              '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS INT)
             |         AS n_pieces,
             |       CAST(length(text) AS DOUBLE) / nullif(len($TOKS), 0)
             |         AS chars_per_word
             |FROM documents
             |ORDER BY doc_id""".stripMargin)),

    // ── Fingerprinting: word-set md5 → duplicate-group detection ──────────
    QueryDef("q33_fingerprint",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"), wordSetFingerprint(tokens(col("text"))).as("fp"))
        .groupBy("fp")
        .agg(count(lit(1)).as("n_docs"), min("doc_id").as("keep_doc_id"))
        .filter(col("n_docs") > 1)
        .orderBy("fp"),
      Some(s"""SELECT md5(array_to_string(list_sort(list_distinct($TOKS)), ' '))
             |         AS fp,
             |       count(*) AS n_docs,
             |       min(doc_id) AS keep_doc_id
             |FROM documents
             |GROUP BY 1
             |HAVING count(*) > 1
             |ORDER BY fp""".stripMargin)),

    // ── TF-IDF: corpus-weighted top terms per document ────────────────────
    // Three linear aggregations (term frequency, document length,
    // document frequency) + one broadcast scalar (corpus size), joined
    // and windowed for per-doc top-3. Everything shuffles on bounded
    // keys (doc_id / term); the df frame is term-cardinality — at 100 TB
    // it shuffle-joins (a term dictionary outgrows broadcast), which is
    // the plan below already.
    QueryDef("q53_tfidf",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val toks = docs.select(col("doc_id"),
          explode(tokens(col("text"))).as("term"))
        val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        // document length = sum of its term frequencies — a window over
        // the (already aggregated, much smaller) tf frame instead of a
        // second explode+aggregate scan of the corpus
        val withLen = tf.withColumn("n_toks",
          sum("tf").over(Window.partitionBy("doc_id")))
        val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
        val n = docs.agg(count(lit(1)).as("n_docs"))
        val w = Window.partitionBy("doc_id")
          .orderBy(col("tfidf_raw").desc, col("term").asc)
        withLen.join(dfreq, "term")
          .crossJoin(broadcast(n))
          .withColumn("tfidf_raw",
            col("tf").cast("double") / col("n_toks")
              * log(col("n_docs").cast("double") / col("df")))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 3)
          .select(col("doc_id"), col("rank"), col("term"),
            round(col("tfidf_raw"), 6).as("tfidf"))
          .orderBy("doc_id", "rank")
      },
      Some(s"""WITH toks AS (
             |  SELECT doc_id, unnest($TOKS) AS term FROM documents),
             |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
             |       GROUP BY 1, 2),
             |dl AS (SELECT doc_id, count(*) AS n_toks FROM toks GROUP BY 1),
             |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
             |n AS (SELECT count(*) AS n_docs FROM documents),
             |scored AS (
             |  SELECT tf.doc_id, tf.term,
             |         CAST(tf.tf AS DOUBLE) / dl.n_toks
             |           * ln(CAST(n.n_docs AS DOUBLE) / dfreq.df) AS tfidf_raw
             |  FROM tf JOIN dl USING (doc_id) JOIN dfreq USING (term)
             |       CROSS JOIN n),
             |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
             |        ORDER BY tfidf_raw DESC, term ASC) AS rk FROM scored)
             |SELECT doc_id, CAST(rk AS INT) AS rank, term,
             |       round(tfidf_raw, 6) AS tfidf
             |FROM r WHERE rk <= 3
             |ORDER BY doc_id, rank""".stripMargin)),

    // ── Bigram language-model scoring: corpus-trained fluency signal ──────
    // Train add-one-smoothed bigram probabilities per language over the
    // whole corpus (counts are exact integer aggregates), then score
    // every document by its average bigram log-probability — the
    // perplexity-style quality signal curation pipelines use to rank
    // text. Training and scoring are the same three shuffles (bigram
    // counts, head counts, vocab) joined back to the bigram stream;
    // log/division run on identical rationals in both engines, and the
    // per-doc average rounds at 6 (ulp drift from summation order is
    // ~1e-13, far below the grain).
    QueryDef("q63_bigram_lm",
      (s, d) => {
        val docs = Tables.documents(s, d)
        // NOTE (r16 optimization round): a map-side rewrite of the
        // bigram formation (transform over the token array, the q237
        // shape, + one pinned repartition exchange) was measured and
        // REVERTED — steady-state serve 1.31 s → 1.51 s at sf0.1.
        // Higher-order-function lambdas run interpreted (no codegen),
        // confirming the shingle pipeline's earlier 13× finding; the
        // LEAD window's one exchange + sorts are codegen'd end to end
        // and win here.
        val toks = docs.select(col("doc_id"), col("lang"),
          posexplode(tokens(col("text"))))
        val w = Window.partitionBy("doc_id").orderBy("pos")
        val bg = toks.withColumn("w2", lead("col", 1).over(w))
          .filter(col("w2").isNotNull)
          .select(col("doc_id"), col("lang"), col("col").as("w1"), col("w2"))
        val c12 = bg.groupBy("lang", "w1", "w2").agg(count(lit(1)).as("c12"))
        val c1 = bg.groupBy("lang", "w1").agg(count(lit(1)).as("c1"))
        val vocab = bg.select("lang", "w2").distinct()
          .groupBy("lang").agg(count(lit(1)).as("v"))
        bg.join(c12, Seq("lang", "w1", "w2"))
          .join(c1, Seq("lang", "w1"))
          .join(broadcast(vocab), Seq("lang"))
          .withColumn("logp",
            log((col("c12") + 1).cast("double") / (col("c1") + col("v"))))
          .groupBy("doc_id", "lang")
          .agg(count(lit(1)).as("n_bigrams"),
            round(avg(col("logp")), 6).as("avg_logp"))
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id, lang, $TOKS AS toks FROM documents),
             |idx AS (
             |  SELECT doc_id, lang, toks, unnest(range(1, len(toks))) AS i
             |  FROM t),
             |bg AS (
             |  SELECT doc_id, lang, toks[i] AS w1, toks[i + 1] AS w2
             |  FROM idx),
             |c12 AS (SELECT lang, w1, w2, count(*) AS c12 FROM bg
             |        GROUP BY 1, 2, 3),
             |c1 AS (SELECT lang, w1, count(*) AS c1 FROM bg GROUP BY 1, 2),
             |vocab AS (SELECT lang, count(DISTINCT w2) AS v FROM bg GROUP BY 1)
             |SELECT bg.doc_id, bg.lang,
             |       count(*) AS n_bigrams,
             |       round(avg(ln(CAST(c12.c12 + 1 AS DOUBLE) / (c1.c1 + vocab.v))), 6)
             |         AS avg_logp
             |FROM bg JOIN c12 USING (lang, w1, w2)
             |        JOIN c1 USING (lang, w1)
             |        JOIN vocab USING (lang)
             |GROUP BY bg.doc_id, bg.lang
             |ORDER BY bg.doc_id""".stripMargin)),

    // ── Repetition signals: duplicated-n-gram fractions per document ──────
    // The Gopher-style repetition filters (Rae et al. 2021, §A1.1):
    // fraction of the doc's bigram instances taken by its single most
    // frequent bigram, and fraction of trigram instances whose trigram
    // occurs more than once. High values flag boilerplate/spam that
    // near-dup (cross-doc) dedup cannot see because the repetition is
    // INSIDE one document. Shape: one explode + two bounded-key
    // aggregations per n — narrow until the per-(doc, gram) shuffle,
    // which is linear in token count; no window over raw text, no
    // self-join. Only docs with >= 3 tokens (both grams defined) appear.
    QueryDef("q67_repetition",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(col("doc_id"), posexplode(tokens(col("text"))))
        val w = Window.partitionBy("doc_id").orderBy("pos")
        // Both gram sizes ride ONE scan + ONE window pass + ONE shuffle:
        // each token row emits its bigram and trigram (null at the doc
        // tail) tagged with n, so the per-(doc, n, gram) count is a
        // single aggregation — not one explode/window/shuffle pipeline
        // per gram size.
        val grams = toks
          .withColumn("t1", lead("col", 1).over(w))
          .withColumn("t2", lead("col", 2).over(w))
          .select(col("doc_id"), explode(array(
            struct(lit(2).as("n"), when(col("t1").isNotNull,
              concat_ws(" ", col("col"), col("t1"))).as("g")),
            struct(lit(3).as("n"), when(col("t2").isNotNull,
              concat_ws(" ", col("col"), col("t1"), col("t2"))).as("g"))))
            .as("x"))
          .filter(col("x.g").isNotNull)
          .groupBy(col("doc_id"), col("x.n").as("n"), col("x.g").as("g"))
          .agg(count(lit(1)).as("c"))
        val stats = grams.groupBy("doc_id")
          .agg(sum(when(col("n") === 2, col("c"))).as("n_bg"),
            max(when(col("n") === 2, col("c"))).as("top_bg"),
            sum(when(col("n") === 3, col("c"))).as("n_tg"),
            sum(when(col("n") === 3 && col("c") > 1, col("c"))
              .otherwise(lit(0))).as("dup_tg"))
        stats.filter(col("n_tg").isNotNull)
          .select(col("doc_id"),
            round(col("top_bg") / col("n_bg"), 6).as("top_bigram_frac"),
            round(col("dup_tg") / col("n_tg"), 6).as("dup_trigram_frac"),
            (col("top_bg") / col("n_bg") > 0.18 ||
              col("dup_tg") / col("n_tg") > 0.5).cast("int").as("repetitive"))
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id, $TOKS AS toks FROM documents),
             |bgrams AS (
             |  SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS g
             |  FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i
             |        FROM t)),
             |bstat AS (
             |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bg,
             |         max(c) AS top_bg
             |  FROM (SELECT doc_id, g, count(*) AS c FROM bgrams GROUP BY 1, 2)
             |  GROUP BY 1),
             |tgrams AS (
             |  SELECT doc_id, toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] AS g
             |  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 1)) AS i
             |        FROM t)),
             |tstat AS (
             |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tg,
             |         CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
             |           AS dup_tg
             |  FROM (SELECT doc_id, g, count(*) AS c FROM tgrams GROUP BY 1, 2)
             |  GROUP BY 1)
             |SELECT doc_id,
             |       round(top_bg / CAST(n_bg AS DOUBLE), 6) AS top_bigram_frac,
             |       round(dup_tg / CAST(n_tg AS DOUBLE), 6) AS dup_trigram_frac,
             |       CAST(top_bg / CAST(n_bg AS DOUBLE) > 0.18
             |            OR dup_tg / CAST(n_tg AS DOUBLE) > 0.5 AS INT)
             |         AS repetitive
             |FROM bstat JOIN tstat USING (doc_id)
             |ORDER BY doc_id""".stripMargin)),

    // ── BM25 retrieval scoring: rank documents for a fixed term query ─────
    // The retrieval-grade upgrade of q53's TF-IDF: Robertson/Lucene BM25
    // with k1=1.2, b=0.75 and the +1-inside-log idf (always positive).
    // The scale shape is the part that matters: term frequencies are
    // computed ONLY for the query's terms (the filter lands before the
    // aggregation, so the tf shuffle carries 3 terms, not the corpus
    // dictionary), doc lengths are one linear agg, and the per-term df
    // and corpus stats are broadcast scalars. Every fractional literal
    // is CAST AS DOUBLE in the oracle (DuckDB decimal-literal trap).
    QueryDef("q81_bm25",
      (s, d) => {
        val qTerms = Seq("join", "vector", "filter")
        val k1 = 1.2
        val b = 0.75
        val docs = Tables.documents(s, d)
        val toks = docs.select(col("doc_id"),
          explode(tokens(col("text"))).as("term"))
        val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
        val stats = dl.agg(sum("dl").as("sum_dl"),
          count(lit(1)).as("n_docs"))
        val tf = toks.filter(col("term").isin(qTerms: _*))
          .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
        tf.join(broadcast(dfreq), "term")
          .join(dl, "doc_id")
          .crossJoin(broadcast(stats))
          .withColumn("avgdl",
            col("sum_dl").cast("double") / col("n_docs"))
          .withColumn("idf",
            log((col("n_docs") - col("df") + lit(0.5))
              / (col("df") + lit(0.5)) + lit(1.0)))
          .withColumn("contrib",
            col("idf") * (col("tf") * lit(k1 + 1))
              / (col("tf") + lit(k1) *
                (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_terms_hit"),
            round(sum("contrib"), 6).as("bm25"))
          .orderBy(col("bm25").desc, col("doc_id"))
          .limit(10)
      },
      Some(s"""WITH toks AS (
             |  SELECT doc_id, unnest($TOKS) AS term FROM documents),
             |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
             |stats AS (SELECT CAST(sum(dl) AS BIGINT) AS sum_dl,
             |                 count(*) AS n_docs FROM dl),
             |tf AS (
             |  SELECT doc_id, term, count(*) AS tf FROM toks
             |  WHERE term IN ('join', 'vector', 'filter')
             |  GROUP BY 1, 2),
             |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
             |scored AS (
             |  SELECT tf.doc_id,
             |         ln((stats.n_docs - dfreq.df + CAST(0.5 AS DOUBLE))
             |            / (dfreq.df + CAST(0.5 AS DOUBLE))
             |            + CAST(1 AS DOUBLE))
             |           * (tf.tf * CAST(2.2 AS DOUBLE))
             |           / (tf.tf + CAST(1.2 AS DOUBLE)
             |              * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE)
             |                 * dl.dl
             |                 / (CAST(stats.sum_dl AS DOUBLE) / stats.n_docs)))
             |           AS contrib
             |  FROM tf JOIN dl USING (doc_id)
             |       JOIN dfreq USING (term)
             |       CROSS JOIN stats)
             |SELECT doc_id, count(*) AS n_terms_hit,
             |       round(CAST(sum(contrib) AS DOUBLE), 6) AS bm25
             |FROM scored
             |GROUP BY doc_id
             |ORDER BY bm25 DESC, doc_id
             |LIMIT 10""".stripMargin)),

    // ── Phrase search over the stored positional inverted index ──────────
    // Exact-phrase retrieval ("sort merge" as adjacent tokens): the
    // postings table from postingsRoot is read back with each phrase
    // term's BUCKET as a partition predicate — exactly one directory
    // per probed term is scanned (PlanSpec asserts the pruning) — plus
    // the term equality pushed into the bucket's parquet. Adjacency is
    // an equi-join on (doc_id, pos) after shifting the second term's
    // positions left by one. Generalizes to k-word phrases as a k-way
    // chain on the same key. The join carries only the two terms'
    // postings, never the corpus; the shingle/lead formulation (q35's
    // ground) would rescan every document instead.
    QueryDef("q107_phrase_search",
      (s, d) => {
        val post = VersionedParquet.read(s, postingsRoot(s, d))
        val p0 = post
          .filter(col("term_bucket") === termBucket(lit("sort")) &&
            col("term") === "sort")
          .select(col("doc_id"), col("pos"))
        val p1 = post
          .filter(col("term_bucket") === termBucket(lit("merge")) &&
            col("term") === "merge")
          .select(col("doc_id"), (col("pos") - 1).as("pos"))
        p0.join(p1, Seq("doc_id", "pos"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_hits"), min("pos").as("first_pos"))
          .orderBy("doc_id")
      },
      Some(s"""WITH toks AS (SELECT doc_id, $TOKS AS ts FROM documents),
             |pos AS (
             |  SELECT doc_id, CAST(i - 1 AS INT) AS pos, ts[i] AS term
             |  FROM (SELECT doc_id, ts,
             |               unnest(range(1, len(ts) + 1)) AS i
             |        FROM toks)),
             |p0 AS (SELECT doc_id, pos FROM pos WHERE term = 'sort'),
             |p1 AS (SELECT doc_id, pos - 1 AS pos FROM pos
             |       WHERE term = 'merge')
             |SELECT doc_id, count(*) AS n_hits,
             |       CAST(min(pos) AS INT) AS first_pos
             |FROM p0 JOIN p1 USING (doc_id, pos)
             |GROUP BY doc_id
             |ORDER BY doc_id""".stripMargin)),

    // ── Vocabulary coverage (Zipf head mass) per language ────────────────
    // The tokenizer-budget question: what share of the corpus' token
    // occurrences do the top-100 words cover? Drives vocab-size and
    // OOV-rate decisions before training a tokenizer (q109's input).
    // Rank ties at the head boundary break on the word itself, and
    // coverage is integer parts-per-million (million-scaled div), so
    // no float reaches the output. Scale: token counts partial-agg to
    // vocabulary cardinality before the one (lang, word) shuffle; the
    // head selection is a window over the vocab-sized count frame,
    // never the corpus.
    QueryDef("q127_vocab_coverage",
      (s, d) => {
        val counts = Tables.documents(s, d)
          .select(col("lang"),
            explode(tokens(col("text"))).as("word"))
          .groupBy("lang", "word").agg(count(lit(1)).as("n"))
        val w = Window.partitionBy("lang")
          .orderBy(col("n").desc, col("word"))
        counts
          .withColumn("rk", row_number().over(w))
          .groupBy("lang")
          .agg(sum("n").cast("long").as("n_tokens"),
            count(lit(1)).as("n_vocab"),
            sum(when(col("rk") <= 100, col("n")).otherwise(lit(0L)))
              .cast("long").as("head_tokens"))
          .withColumn("coverage_ppm",
            expr("head_tokens * 1000000 div n_tokens"))
          .orderBy("lang")
      },
      Some(s"""WITH counts AS (
             |  SELECT lang, word, count(*) AS n FROM (
             |    SELECT lang, unnest($TOKS) AS word FROM documents)
             |  GROUP BY lang, word),
             |ranked AS (
             |  SELECT lang, n,
             |         row_number() OVER (PARTITION BY lang
             |                            ORDER BY n DESC, word) AS rk
             |  FROM counts)
             |SELECT lang,
             |       CAST(sum(n) AS BIGINT) AS n_tokens,
             |       count(*) AS n_vocab,
             |       CAST(sum(CASE WHEN rk <= 100 THEN n ELSE 0 END)
             |         AS BIGINT) AS head_tokens,
             |       CAST(sum(CASE WHEN rk <= 100 THEN n ELSE 0 END)
             |         * 1000000 // sum(n) AS BIGINT) AS coverage_ppm
             |FROM ranked
             |GROUP BY lang
             |ORDER BY lang""".stripMargin)),

    // ── Incremental positional-index maintenance via the change feed ─────
    // Completes the index-maintenance set for TEXT (q162 = PQ codes,
    // q168 = LSH bands, q178 = cluster assignments): the stored
    // positional inverted index (q107's term-bucketed layout)
    // advances from its corpus table's own CDF. Inserted docs tokenize
    // as an O(changes) batch appended onto the index's delta tier
    // (postings are doc-local, so incremental == rebuild EXACTLY);
    // deleted docs land as TOMBSTONES the probe anti-joins out — the
    // Lucene delete model: postings are never rewritten, compaction
    // folds tombstones later. The probe still partition-prunes to its
    // two terms' buckets (base dirs) + the O(changes) delta tail,
    // where the same bucket+term predicate is an ordinary pushed
    // filter. The oracle runs the phrase search over the replayed
    // FINAL corpus, so a feed-missed insert, a ghost posting from a
    // deleted doc, or bulk-vs-incremental tokenization drift all
    // break the hash.
    QueryDef("q192_text_index_maintenance",
      (s, d) => {
        val (idx, tomb) = maintainedPostings(s, d)
        val post = VersionedParquet.read(s, idx)
        val dead = VersionedParquet.read(s, tomb)
        val nTomb = dead.count()
        val p0 = post
          .filter(col("term_bucket") === termBucket(lit("sort")) &&
            col("term") === "sort")
          .select(col("doc_id"), col("pos"))
        val p1 = post
          .filter(col("term_bucket") === termBucket(lit("merge")) &&
            col("term") === "merge")
          .select(col("doc_id"), (col("pos") - 1).as("pos"))
        p0.join(p1, Seq("doc_id", "pos"))
          .join(dead, Seq("doc_id"), "left_anti")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_hits"), min("pos").as("first_pos"))
          .withColumn("n_tombstones", lit(nTomb))
          .orderBy("doc_id")
      },
      Some(s"""WITH corpus AS (
             |  SELECT doc_id, text FROM documents
             |  WHERE (doc_id % 4 <> 0 OR doc_id % 3 = 0)
             |    AND doc_id % 7 <> 0),
             |toks AS (SELECT doc_id, $TOKS AS ts FROM corpus),
             |pos AS (
             |  SELECT doc_id, CAST(i - 1 AS INT) AS pos, ts[i] AS term
             |  FROM (SELECT doc_id, ts,
             |               unnest(range(1, len(ts) + 1)) AS i
             |        FROM toks)),
             |p0 AS (SELECT doc_id, pos FROM pos WHERE term = 'sort'),
             |p1 AS (SELECT doc_id, pos - 1 AS pos FROM pos
             |       WHERE term = 'merge'),
             |tomb AS (SELECT count(*) AS n FROM documents
             |         WHERE (doc_id % 4 <> 0 OR doc_id % 3 = 0)
             |           AND doc_id % 7 = 0)
             |SELECT doc_id, count(*) AS n_hits,
             |       CAST(min(pos) AS INT) AS first_pos,
             |       (SELECT n FROM tomb) AS n_tombstones
             |FROM p0 JOIN p1 USING (doc_id, pos)
             |GROUP BY doc_id
             |ORDER BY doc_id""".stripMargin)),

    // ── Benchmark decontamination (n-gram overlap removal) ───────────────
    // The canonical pre-training hygiene step: any training doc sharing
    // an n-gram with the EVAL/benchmark set is contaminated and must be
    // dropped, or the benchmark is leaked into the weights. Benchmark =
    // the doc_id % 97 slice (standing in for MMLU/GSM-8K etc.);
    // production runs use n = 8-13 — n = 3 here because the synthetic
    // vocabulary is ~40 words (at real vocab sizes the same plan runs
    // unchanged, only the literal moves). Scale shape: the benchmark
    // gram set is SMALL BY NATURE (benchmarks are ~10⁵ rows however big
    // the corpus is), so it broadcasts and the corpus gram stream
    // filters against it map-side — one corpus scan, and the only
    // shuffle carries the MATCHES (tiny), grouped per doc with
    // countDistinct. The naive corpus⋈corpus gram self-join never
    // happens.
    QueryDef("q213_decontamination",
      (s, d) => {
        // grams come off the session-cached shingle frame (DedupOps —
        // one row per (doc, DISTINCT 3-gram), exactly this query's
        // gram unit) instead of a private tokenize+shingle+explode
        // pipeline: the corpus is shingled once per session, not once
        // per consumer (r16 optimization, guide §1.2; the q35/q36/q37
        // sharing discipline applied to the decontamination family)
        val grams = DedupOps.shingleHashes(s, d)
          .select(col("doc_id"), col("shingle").as("g"))
        val bench = grams.filter(col("doc_id") % 97 === 0)
          .select("g").distinct()
        grams.filter(col("doc_id") % 97 =!= 0)
          .join(broadcast(bench), "g")
          .groupBy("doc_id")
          .agg(countDistinct(col("g")).as("n_leaked_ngrams"))
          .orderBy("doc_id")
      },
      Some(s"""WITH toks AS (SELECT doc_id, $TOKS AS ts FROM documents),
             |grams AS (
             |  SELECT DISTINCT doc_id,
             |         list_aggregate(ts[i:i+2], 'string_agg', ' ') AS g
             |  FROM (SELECT doc_id, ts, unnest(range(1, len(ts) - 1)) AS i
             |        FROM toks)),
             |bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0)
             |SELECT g.doc_id, count(DISTINCT g.g) AS n_leaked_ngrams
             |FROM grams g JOIN bench b USING (g)
             |WHERE g.doc_id % 97 <> 0
             |GROUP BY 1
             |ORDER BY doc_id""".stripMargin)),

    // ── PII detection + redaction (regex scan, both engines' regex) ──────
    // The compliance pass every corpus release runs: find emails /
    // phone numbers / SSN-shaped ids, count them per class, and measure
    // the redacted text. The synthetic corpus carries no PII, so the
    // query INJECTS it deterministically inline (doc_id-derived, the
    // identical expression on both engines) — circular for the values,
    // but the detection machinery is the real thing exercised through
    // TWO independent regex engines (Java's and DuckDB's RE2): a
    // pattern-semantics mismatch, a missed global replace, or a
    // redaction-length drift breaks the hash. Single corpus scan,
    // per-source aggregate — nothing shuffles but the source-cardinality
    // cells.
    QueryDef("q214_pii_redaction",
      (s, d) => {
        val email = "[a-z0-9.]+@[a-z0-9.]+\\.[a-z]+"
        val phone = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
        val ssn = "[0-9]{3}-[0-9]{2}-[0-9]{4}"
        val last4 = lpad((col("doc_id") % 10000).cast("string"), 4, "0")
        val pii = concat(col("text"),
          when(col("doc_id") % 13 === 0,
            concat(lit(" contact u"), col("doc_id").cast("string"),
              lit("@mail.example.com"))).otherwise(lit("")),
          when(col("doc_id") % 17 === 0,
            concat(lit(" call 415-555-"), last4)).otherwise(lit("")),
          when(col("doc_id") % 19 === 0,
            concat(lit(" ssn 078-05-"), last4)).otherwise(lit("")))
        val redacted = regexp_replace(regexp_replace(regexp_replace(
          pii, lit(email), lit("<EMAIL>")),
          lit(ssn), lit("<SSN>")),
          lit(phone), lit("<PHONE>"))
        Tables.documents(s, d)
          .select(col("source"), col("doc_id"), pii.as("pii"),
            redacted.as("red"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(regexp_count(col("pii"), lit(email)) > 0, 1L)
              .otherwise(0L)).as("n_email_docs"),
            sum(when(regexp_count(col("pii"), lit(phone)) > 0, 1L)
              .otherwise(0L)).as("n_phone_docs"),
            sum(when(regexp_count(col("pii"), lit(ssn)) > 0, 1L)
              .otherwise(0L)).as("n_ssn_docs"),
            sum(regexp_count(col("pii"), lit(email)) +
              regexp_count(col("pii"), lit(phone)) +
              regexp_count(col("pii"), lit(ssn))).cast("long")
              .as("n_hits"),
            sum(length(col("red"))).cast("long").as("redacted_chars"))
          .orderBy("source")
      },
      Some("""WITH pii AS (
             |  SELECT source, doc_id,
             |         text ||
             |         CASE WHEN doc_id % 13 = 0 THEN ' contact u' ||
             |           CAST(doc_id AS VARCHAR) || '@mail.example.com'
             |           ELSE '' END ||
             |         CASE WHEN doc_id % 17 = 0 THEN ' call 415-555-' ||
             |           lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
             |           ELSE '' END ||
             |         CASE WHEN doc_id % 19 = 0 THEN ' ssn 078-05-' ||
             |           lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
             |           ELSE '' END AS p
             |  FROM documents),
             |scanned AS (
             |  SELECT source,
             |         len(regexp_extract_all(p,
             |           '[a-z0-9.]+@[a-z0-9.]+\.[a-z]+')) AS ne,
             |         len(regexp_extract_all(p,
             |           '[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS np,
             |         len(regexp_extract_all(p,
             |           '[0-9]{3}-[0-9]{2}-[0-9]{4}')) AS ns,
             |         length(regexp_replace(regexp_replace(regexp_replace(
             |           p, '[a-z0-9.]+@[a-z0-9.]+\.[a-z]+', '<EMAIL>',
             |             'g'),
             |           '[0-9]{3}-[0-9]{2}-[0-9]{4}', '<SSN>', 'g'),
             |           '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g'))
             |           AS red_len
             |  FROM pii)
             |SELECT source, count(*) AS n_docs,
             |       CAST(sum(CASE WHEN ne > 0 THEN 1 ELSE 0 END) AS BIGINT)
             |         AS n_email_docs,
             |       CAST(sum(CASE WHEN np > 0 THEN 1 ELSE 0 END) AS BIGINT)
             |         AS n_phone_docs,
             |       CAST(sum(CASE WHEN ns > 0 THEN 1 ELSE 0 END) AS BIGINT)
             |         AS n_ssn_docs,
             |       CAST(sum(ne + np + ns) AS BIGINT) AS n_hits,
             |       CAST(sum(red_len) AS BIGINT) AS redacted_chars
             |FROM scanned
             |GROUP BY 1
             |ORDER BY source""".stripMargin)),

    // ── Repetition filtering (Gopher-style quality rules) ────────────────
    // The Rae et al. (Gopher) repetition heuristics at token
    // granularity: a doc is LOW QUALITY when its duplicate-token mass
    // or its most-frequent-bigram share breaches thresholds (tuned to
    // this corpus's medians; the rule set, not the constants, is the
    // operator). All integer ppm — no float reaches the output. Scale:
    // the bigram count is the wordcount shape (map-side combine into
    // (doc, gram) cells), the per-doc fold is cell-bounded, and the
    // final aggregate is flag×lang-cardinality.
    QueryDef("q215_repetition_filter",
      (s, d) => {
        val toks = tokens(col("text"))
        val base = Tables.documents(s, d)
          .select(col("doc_id"), col("lang"), toks.as("ts"))
          .filter(size(col("ts")) > 1)
        val tokStats = base.select(col("doc_id"), col("lang"),
          (size(col("ts")).cast("long") * 1000000L -
            size(array_distinct(col("ts"))).cast("long") * 1000000L)
            .as("dup_mass"),
          size(col("ts")).cast("long").as("n_tok"))
          .withColumn("dup_ppm",
            expr("dup_mass div n_tok")) // exact ⌊⌋, matches oracle '//'
        val bigrams = base.select(col("doc_id"),
          explode(transform(sequence(lit(0), size(col("ts")) - 2),
            i => concat_ws(" ", slice(col("ts"), i + 1, lit(2)))))
            .as("g"))
          .groupBy("doc_id", "g").agg(count(lit(1)).as("cnt"))
          .groupBy("doc_id")
          .agg(max(col("cnt")).as("top_cnt"),
            sum(col("cnt")).as("n_bg"))
          .withColumn("bg_ppm",
            expr("top_cnt * 1000000 div n_bg"))
        tokStats.join(bigrams, "doc_id")
          .withColumn("flagged",
            (col("dup_ppm") > 550000L || col("bg_ppm") > 50000L)
              .cast("int"))
          .groupBy("lang", "flagged")
          .agg(count(lit(1)).as("n_docs"),
            expr("sum(dup_ppm) div count(1)").as("avg_dup_ppm"),
            expr("sum(bg_ppm) div count(1)").as("avg_bg_ppm"))
          .orderBy("lang", "flagged")
      },
      Some(s"""WITH toks AS (
             |  SELECT doc_id, lang, $TOKS AS ts FROM documents),
             |base AS (SELECT * FROM toks WHERE len(ts) > 1),
             |tokstats AS (
             |  SELECT doc_id, lang,
             |         (len(ts) * 1000000 - len(list_distinct(ts)) *
             |          1000000) // len(ts) AS dup_ppm
             |  FROM base),
             |bg AS (
             |  SELECT doc_id, list_aggregate(ts[i:i+1], 'string_agg',
             |         ' ') AS g
             |  FROM (SELECT doc_id, ts, unnest(range(1, len(ts))) AS i
             |        FROM base)),
             |cells AS (SELECT doc_id, g, count(*) AS cnt FROM bg
             |          GROUP BY 1, 2),
             |tops AS (SELECT doc_id, max(cnt) * 1000000 // sum(cnt)
             |                  AS bg_ppm
             |         FROM cells GROUP BY 1),
             |flags AS (
             |  SELECT lang,
             |         CASE WHEN dup_ppm > 550000 OR bg_ppm > 50000
             |              THEN 1 ELSE 0 END AS flagged,
             |         dup_ppm, bg_ppm
             |  FROM tokstats JOIN tops USING (doc_id))
             |SELECT lang, flagged, count(*) AS n_docs,
             |       CAST(sum(dup_ppm) // count(*) AS BIGINT)
             |         AS avg_dup_ppm,
             |       CAST(sum(bg_ppm) // count(*) AS BIGINT)
             |         AS avg_bg_ppm
             |FROM flags
             |GROUP BY 1, 2
             |ORDER BY lang, flagged""".stripMargin)),

    // ── Per-domain caps + blocklist (C4/RefinedWeb curation rule) ────────
    // Web corpora are dominated by a few hot domains; the standard fix
    // caps documents per domain and drops blocklisted domains outright.
    // Here `source` stands in for the domain: src0/src7 are
    // blocklisted, every other source keeps its top 30 docs by a
    // deterministic quality key (n_chars DESC, doc_id ASC — a total
    // order, so the cap is reproducible run to run). Scale shape: ONE
    // window partitioned by source (domain cardinality bounds the
    // shuffle key space; no global sort), then the per-source
    // aggregate over source-cardinality cells.
    QueryDef("q217_domain_caps",
      (s, d) => {
        val w = Window.partitionBy("source")
          .orderBy(col("n_chars").desc, col("doc_id"))
        Tables.documents(s, d)
          .filter(!col("source").isin("src0", "src7"))
          .withColumn("rk", row_number().over(w))
          .groupBy("source")
          .agg(sum(when(col("rk") <= 30, 1L).otherwise(0L))
              .cast("long").as("n_kept"),
            sum(when(col("rk") > 30, 1L).otherwise(0L))
              .cast("long").as("n_dropped_cap"),
            sum(when(col("rk") <= 30, col("n_chars")).otherwise(0L))
              .cast("long").as("chars_kept"))
          .orderBy("source")
      },
      Some("""WITH ranked AS (
             |  SELECT source, n_chars,
             |         row_number() OVER (PARTITION BY source
             |           ORDER BY n_chars DESC, doc_id) AS rk
             |  FROM documents
             |  WHERE source NOT IN ('src0', 'src7'))
             |SELECT source,
             |       CAST(sum(CASE WHEN rk <= 30 THEN 1 ELSE 0 END)
             |         AS BIGINT) AS n_kept,
             |       CAST(sum(CASE WHEN rk > 30 THEN 1 ELSE 0 END)
             |         AS BIGINT) AS n_dropped_cap,
             |       CAST(sum(CASE WHEN rk <= 30 THEN n_chars ELSE 0 END)
             |         AS BIGINT) AS chars_kept
             |FROM ranked
             |GROUP BY 1
             |ORDER BY source""".stripMargin)),

    // ── DSIR-style hashed n-gram importance weighting ────────────────────
    // Data Selection via Importance Resampling (Xie et al. 2023):
    // score each corpus doc by how target-like its hashed n-gram
    // profile is, select the top slice for training. Features are
    // 2-gram md5 hashes folded into 4096 buckets; the target profile
    // is the benchmark slice (doc_id % 97, q213's). The published
    // method scores Σ log(p_target/p_corpus); here the per-bucket
    // log-ratio is replaced by the integer ratio t_b·10⁶ div q_b —
    // monotone in the same direction and EXACT across engines (libm
    // log differs in final ulps between DuckDB and the JVM; a ranking
    // gate cannot float). The plumbing — hashed features, two bounded
    // histograms, per-doc fold, top-k selection — is the method.
    // Scale: both histograms are ≤4096-cell aggregates (the target
    // one broadcast), the corpus is touched once, and the per-doc
    // score folds map-side.
    QueryDef("q218_dsir_importance",
      (s, d) => {
        val toks = tokens(col("text"))
        val grams = Tables.documents(s, d)
          .select(col("doc_id"),
            explode(transform(sequence(lit(0), size(toks) - 2),
              i => concat_ws(" ", slice(toks, i + 1, lit(2)))))
              .as("g"))
          .withColumn("b",
            pmod(graft.functions.Hashing.md5Long60(col("g")), lit(4096)))
        // corpus and target histograms in ONE gram pass (they were two
        // separate full tokenize+hash scans; r16 optimization, guide
        // §1.2): a conditional count per ≤4096-bucket cell, keeping
        // only buckets the target populates — exactly the rows the old
        // corpus⋈target inner join kept
        val ratio = grams.groupBy("b")
          .agg(count(lit(1)).as("q_b"),
            count(when(col("doc_id") % 97 === 0, 1)).as("t_b"))
          .filter(col("t_b") > 0)
          .select(col("b"),
            expr("t_b * 1000000 div q_b").as("r_ppm"))
        grams.filter(col("doc_id") % 97 =!= 0)
          .join(broadcast(ratio), Seq("b"))
          .groupBy("doc_id")
          .agg(sum(col("r_ppm")).cast("long").as("score"),
            count(lit(1)).as("n_scored_grams"))
          .orderBy(col("score").desc, col("doc_id"))
          .limit(20)
      },
      Some(s"""WITH toks AS (SELECT doc_id, $TOKS AS ts FROM documents),
             |grams AS (
             |  SELECT doc_id,
             |         list_aggregate(ts[i:i+1], 'string_agg', ' ') AS g
             |  FROM (SELECT doc_id, ts, unnest(range(1, len(ts))) AS i
             |        FROM toks)),
             |bk AS (SELECT doc_id,
             |              ${Hashing.md5Long60Sql("g")} % 4096 AS b
             |       FROM grams),
             |corpus AS (SELECT b, count(*) AS q_b FROM bk GROUP BY 1),
             |target AS (SELECT b, count(*) AS t_b FROM bk
             |           WHERE doc_id % 97 = 0 GROUP BY 1),
             |ratio AS (SELECT b, t_b * 1000000 // q_b AS r_ppm
             |          FROM corpus JOIN target USING (b))
             |SELECT doc_id, CAST(sum(r_ppm) AS BIGINT) AS score,
             |       count(*) AS n_scored_grams
             |FROM bk JOIN ratio USING (b)
             |WHERE doc_id % 97 <> 0
             |GROUP BY 1
             |ORDER BY score DESC, doc_id
             |LIMIT 20""".stripMargin)),

    // ── Incremental decontamination off a STORED corpus gram index ───────
    // q213 re-derives corpus grams per run; at 100 TB that rescan per
    // benchmark update is the cost that kills the nightly contamination
    // check. The production shape: index the corpus' gram hashes ONCE
    // (a stored (h, doc_id) table — built once per session here, the
    // q107/q162/q168/q178/q192 stored-index discipline), then every
    // benchmark REVISION probes the index with just ITS grams — the
    // benchmark arrives in two tranches (the %97 slice, then the %89
    // slice as the "new eval suite"), each probe an equi-join of the
    // broadcast tranche gram set against the index, no document
    // re-tokenized after the build. The two probes' match sets union
    // and the result must equal the FULL recompute over the final
    // benchmark — which is exactly what the oracle computes, so the
    // hash equality IS the incremental==rebuild proof.
    QueryDef("q222_incremental_decontamination",
      (s, d) => {
        val idx = s.read.parquet(gramIndexPath(s, d))
        // benchmark tranches read off the session-cached shingle frame
        // (h60 IS md5-60 of the gram — the same value this query
        // hashed itself before; r16 optimization, guide §1.2)
        def benchGrams(m: Int) =
          DedupOps.shingleHashes(s, d).filter(col("doc_id") % m === 0)
            .select(col("h60").as("h")).distinct()
        val probe0 = idx.join(broadcast(benchGrams(97)), Seq("h"))
        val probe1 = idx.join(broadcast(benchGrams(89)), Seq("h"))
        probe0.unionByName(probe1)
          .filter(col("doc_id") % 97 =!= 0 && col("doc_id") % 89 =!= 0)
          .groupBy("doc_id")
          .agg(countDistinct(col("g")).as("n_leaked_ngrams"))
          .orderBy("doc_id")
      },
      Some(s"""WITH toks AS (SELECT doc_id, $TOKS AS ts FROM documents),
             |grams AS (
             |  SELECT DISTINCT doc_id,
             |         list_aggregate(ts[i:i+2], 'string_agg', ' ') AS g
             |  FROM (SELECT doc_id, ts, unnest(range(1, len(ts) - 1)) AS i
             |        FROM toks)),
             |bench AS (SELECT DISTINCT g FROM grams
             |          WHERE doc_id % 97 = 0 OR doc_id % 89 = 0)
             |SELECT g.doc_id, count(DISTINCT g.g) AS n_leaked_ngrams
             |FROM grams g JOIN bench b USING (g)
             |WHERE g.doc_id % 97 <> 0 AND g.doc_id % 89 <> 0
             |GROUP BY 1
             |ORDER BY doc_id""".stripMargin)),

    // ── Streaming decontamination: quarantine-on-ingest ──────────────────
    // Documents ARRIVE continuously (three insert tranches of a
    // versioned corpus table, one micro-batch per version); any doc
    // sharing a 3-gram with the benchmark set never reaches the
    // training silver — it lands quarantined with its leak count,
    // both sides exactly-once by the batch-marker rule (quarantine
    // commits first, so a crash window can never leak a contaminated
    // doc into silver). The join-shaped gate runExpectations' row-
    // local predicates cannot express: per batch, grams explode and
    // semi-join the BROADCAST benchmark gram hashes — O(batch grams),
    // corpus never rescanned. The oracle replays the final split from
    // raw documents: a doc on the wrong side, double-applied, or
    // dropped breaks counts or id-sums; silver_versions = 3 pins
    // one-commit-per-batch.
    QueryDef("q223_streaming_decontamination",
      (s, d) => s.read.parquet(deconStreamPath(s, d))
        .orderBy("side", "tranche"),
      Some(s"""WITH toks AS (SELECT doc_id, $TOKS AS ts FROM documents),
             |grams AS (
             |  SELECT DISTINCT doc_id,
             |         list_aggregate(ts[i:i+2], 'string_agg', ' ') AS g
             |  FROM (SELECT doc_id, ts, unnest(range(1, len(ts) - 1)) AS i
             |        FROM toks)),
             |bench AS (SELECT DISTINCT g FROM grams
             |          WHERE doc_id % 97 = 0 OR doc_id % 89 = 0),
             |corpus AS (SELECT DISTINCT doc_id FROM documents
             |           WHERE doc_id % 97 <> 0 AND doc_id % 89 <> 0),
             |contam AS (
             |  SELECT DISTINCT g.doc_id FROM grams g
             |  JOIN bench b USING (g) JOIN corpus c USING (doc_id)),
             |tagged AS (
             |  SELECT c.doc_id,
             |         CASE WHEN ct.doc_id IS NOT NULL
             |              THEN 'quarantined' ELSE 'clean' END AS side
             |  FROM corpus c LEFT JOIN contam ct USING (doc_id))
             |SELECT side, doc_id % 3 AS tranche, count(*) AS n_docs,
             |       CAST(sum(doc_id) AS BIGINT) AS sum_doc_id,
             |       3 AS silver_versions
             |FROM tagged
             |GROUP BY 1, 2
             |ORDER BY side, tranche""".stripMargin)),

    // ── CCNet-style per-language perplexity buckets ──────────────────────
    // CCNet's triage (Wenzek et al. 2020): score each document with a
    // PER-LANGUAGE LM, rank within its language, and split into
    // head / middle / tail tertiles — head feeds training, tail is
    // dropped, middle is borderline. The LM here is the in-corpus
    // bigram model (q63's), and the published log-perplexity is
    // replaced by the integer predictability score Σ(c_ab·10⁶ div
    // c_a) div n — monotone the same direction and EXACT across
    // engines (libm log differs in final ulps; a ranking/bucketing
    // gate cannot float). Tertile assignment is exact integer rank
    // arithmetic ((3·(rk−1)) div n, the q119 equidepth discipline) —
    // no percentile approximation. Scale: bigram counts are
    // gram-volume aggregates with map-side combine; the per-doc fold
    // joins each bigram to per-language count frames on (lang, gram)
    // keys; the rank window partitions by language (bounded
    // cardinality, never a global sort).
    QueryDef("q237_ccnet_perplexity_buckets",
      (s, d) => {
        val toks = tokens(col("text"))
        val base = Tables.documents(s, d)
          .select(col("doc_id"), col("lang"), toks.as("ts"))
          .filter(size(col("ts")) > 1)
        val bi = base.select(col("doc_id"), col("lang"),
          explode(transform(sequence(lit(0), size(col("ts")) - 2),
            i => struct(element_at(col("ts"), i + 1).as("a"),
              element_at(col("ts"), i + 2).as("b")))).as("p"))
          .select(col("doc_id"), col("lang"),
            col("p.a").as("a"), col("p.b").as("b"))
        val biCnt = bi.groupBy("lang", "a", "b")
          .agg(count(lit(1)).as("c_ab"))
        val uniCnt = bi.groupBy("lang", "a")
          .agg(count(lit(1)).as("c_a"))
        val scored = bi.join(biCnt, Seq("lang", "a", "b"))
          .join(uniCnt, Seq("lang", "a"))
          .groupBy("doc_id", "lang")
          .agg(expr("sum(c_ab * 1000000 div c_a) div count(1)")
              .as("doc_ppm"),
            count(lit(1)).as("n_bigrams"))
        val rkW = Window.partitionBy("lang")
          .orderBy(col("doc_ppm").desc, col("doc_id"))
        scored
          .withColumn("rk", row_number().over(rkW))
          .withColumn("nd",
            count(lit(1)).over(Window.partitionBy("lang")))
          .withColumn("bucket", expr("(3 * (rk - 1)) div nd"))
          .groupBy("lang", "bucket")
          .agg(count(lit(1)).as("n_docs"),
            expr("sum(doc_ppm) div count(1)").as("avg_ppm"),
            sum("n_bigrams").cast("long").as("n_bigrams"))
          .orderBy("lang", "bucket")
      },
      Some(s"""WITH toks AS (SELECT doc_id, lang, $TOKS AS ts
             |             FROM documents),
             |base AS (SELECT * FROM toks WHERE len(ts) > 1),
             |bi AS (
             |  SELECT doc_id, lang, ts[i] AS a, ts[i + 1] AS b
             |  FROM (SELECT doc_id, lang, ts,
             |               unnest(range(1, len(ts))) AS i
             |        FROM base)),
             |bic AS (SELECT lang, a, b, count(*) AS c_ab
             |        FROM bi GROUP BY 1, 2, 3),
             |unic AS (SELECT lang, a, count(*) AS c_a
             |         FROM bi GROUP BY 1, 2),
             |scored AS (
             |  SELECT doc_id, lang,
             |         CAST(sum(c_ab * 1000000 // c_a) // count(*)
             |           AS BIGINT) AS doc_ppm,
             |         count(*) AS n_bigrams
             |  FROM bi JOIN bic USING (lang, a, b)
             |          JOIN unic USING (lang, a)
             |  GROUP BY 1, 2),
             |ranked AS (
             |  SELECT *,
             |         row_number() OVER (PARTITION BY lang
             |           ORDER BY doc_ppm DESC, doc_id) AS rk,
             |         count(*) OVER (PARTITION BY lang) AS nd
             |  FROM scored)
             |SELECT lang,
             |       CAST((3 * (rk - 1)) // nd AS BIGINT) AS bucket,
             |       count(*) AS n_docs,
             |       CAST(sum(doc_ppm) // count(*) AS BIGINT) AS avg_ppm,
             |       CAST(sum(n_bigrams) AS BIGINT) AS n_bigrams
             |FROM ranked
             |GROUP BY 1, 2
             |ORDER BY lang, bucket""".stripMargin)),

    // ── Unicode normalization (NFC + control strip) ──────────────────────
    // The ftfy-lite ingestion-cleaning stage: NFC canonical
    // composition (so byte-identical text dedups byte-identically)
    // plus a C0/C1 control strip keeping \n and \t — run as the
    // native codegen'd [[graft.functions.TextNormalize]] kernel with
    // an ASCII fast path that returns clean input untouched. The
    // fixture INJECTS a decomposed accent (e + U+0301) and a BEL into
    // every document, so the gate is non-vacuous: per lang it pins
    // the normalized length sum, the raw-minus-normalized delta
    // (composition must save exactly the combining mark, the strip
    // exactly the BEL), and the count of docs whose normalized text
    // now ends in the COMPOSED é. DuckDB's nfc_normalize implements
    // the same Unicode tables, which is what lets the oracle state
    // the op declaratively.
    QueryDef("q274_text_normalize",
      (s, d) => {
        val raw = concat(col("text"), lit("e\u0301\u0007"))
        Tables.documents(s, d)
          .select(col("lang"), raw.as("raw"),
            graft.functions.TextNormalize(raw).as("norm"))
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(length(col("norm"))).cast("long").as("sum_len_norm"),
            sum(length(col("raw")) - length(col("norm")))
              .cast("long").as("sum_delta"),
            sum(when(col("norm").endsWith("\u00e9"), 1L)
              .otherwise(0L)).cast("long").as("n_composed"))
          .orderBy("lang")
      },
      Some("""WITH raw AS (
             |  SELECT lang, text || 'e' || chr(769) || chr(7) AS raw
             |  FROM documents),
             |n AS (
             |  SELECT lang, raw,
             |         regexp_replace(nfc_normalize(raw),
             |           '[\x00-\x08\x0B-\x1F\x7F-\x9F]', '', 'g')
             |           AS norm
             |  FROM raw)
             |SELECT lang, count(*) AS n_docs,
             |       CAST(sum(length(norm)) AS BIGINT) AS sum_len_norm,
             |       CAST(sum(length(raw) - length(norm)) AS BIGINT)
             |         AS sum_delta,
             |       CAST(sum(CASE WHEN norm LIKE '%' || chr(233)
             |                THEN 1 ELSE 0 END) AS BIGINT) AS n_composed
             |FROM n
             |GROUP BY 1
             |ORDER BY lang""".stripMargin))
  )

  /** q223 builder: the training corpus (docs outside both benchmark
    * slices) lands as a versioned table in three insert tranches
    * (doc_id % 3), streams through [[graft.streaming.DeconStream]]
    * against the %97∪%89 benchmark gram hashes (one micro-batch per
    * table version via maxVersionsPerTrigger), and the gate reads
    * both sides back. Once per session. */
  private def deconStreamPath(s: SparkSession, d: String): String = {
    import graft.warehouse.{AtomicParquet, VersionedParquet}
    val corpus = Scratch.dir(s, "q223-corpus")
    val silver = Scratch.dir(s, "q223-silver")
    val quar = Scratch.dir(s, "q223-quarantine")
    val ckpt = Scratch.dir(s, "q223-ckpt")
    val out = Scratch.dir(s, "q223-out")
    if (VersionedParquet.currentVersion(s, corpus).isEmpty) {
      val docs = Tables.documents(s, d)
        .filter(col("doc_id") % 97 =!= 0 && col("doc_id") % 89 =!= 0)
        .select("doc_id", "text", "lang", "source")
      // persisted: the benchmark gram-hash set is broadcast into EVERY
      // micro-batch of all three stream runs — without the persist each
      // broadcast re-derived it (~6× per fixture; r16 optimization,
      // guide §1.2). Small by nature (benchmark slices only); read off
      // the session-cached shingle frame (h60 == md5-60 of the gram).
      val bench = DedupOps.shingleHashes(s, d)
        .filter(col("doc_id") % 97 === 0 || col("doc_id") % 89 === 0)
        .select(col("h60").as("h")).distinct()
        .persist()
      // three ingest rounds, each its own stream RUN off the shared
      // checkpoint — the restart-resume path is what production runs
      // nightly, and it forces one gated micro-batch per tranche
      def drain(): Unit = {
        val q = graft.streaming.DeconStream.run(
          s.readStream.format("graft")
            .option("startingVersion", "0")
            .load(corpus),
          silver, quar, ckpt, bench)
        q.awaitTermination()
      }
      VersionedParquet.publish(docs.filter(col("doc_id") % 3 === 0),
        corpus, keepVersions = 10)
      drain()
      VersionedParquet.append(s, corpus,
        docs.filter(col("doc_id") % 3 === 1), keepVersions = 10)
      drain()
      VersionedParquet.append(s, corpus,
        docs.filter(col("doc_id") % 3 === 2), keepVersions = 10)
      drain()
      val sv = VersionedParquet.read(s, silver)
        .select(col("doc_id"), lit("clean").as("side"))
      val qv = VersionedParquet.read(s, quar)
        .select(col("doc_id"), lit("quarantined").as("side"))
      val res = sv.unionByName(qv)
        .groupBy(col("side"), (col("doc_id") % 3).cast("long").as("tranche"))
        .agg(count(lit(1)).as("n_docs"),
          sum("doc_id").cast("long").as("sum_doc_id"))
        .withColumn("silver_versions",
          lit(VersionedParquet.versions(s, silver).length))
      AtomicParquet.overwrite(res, out)
      bench.unpersist(blocking = false)
    }
    out
  }

  /** q222's stored corpus gram index: one (h = md5-60(gram), doc_id,
    * g) row per distinct (doc, 3-gram), built once per session — the
    * one-time cost every later benchmark probe amortizes. The raw
    * gram rides along so probe matches can count DISTINCT leaked
    * grams without re-deriving them. */
  private def gramIndexPath(s: SparkSession, d: String): String = {
    val out = Scratch.dir(s, "q222-gram-index")
    if (!new java.io.File(out, "_SUCCESS").exists()) {
      // the stored index is exactly the session-cached shingle frame's
      // (h60, doc_id, shingle) projection — build it from the cache
      // instead of re-running tokenize+shingle+md5 over the corpus
      // (r16 optimization, guide §1.2)
      val grams = DedupOps.shingleHashes(s, d)
        .select(col("h60").as("h"), col("doc_id"),
          col("shingle").as("g"))
      graft.warehouse.AtomicParquet.overwrite(grams, out)
    }
    out
  }

  /** q192 lifecycle: corpus table (v0 = doc_id % 4 ≠ 0 → append the
    * %3-divisible quarter → delete doc_id % 7 = 0), postings index
    * built on v0 and maintained per feed step (insert batch appended,
    * deletes as tombstones). Once per session. Returns (index root,
    * tombstone root). */
  private def maintainedPostings(s: SparkSession,
                                 d: String): (String, String) = {
    val docs = Scratch.dir(s, "q192-docs")
    val idx = Scratch.dir(s, "q192-postings")
    val tomb = Scratch.dir(s, "q192-tombstones")
    if (VersionedParquet.currentVersion(s, docs).isEmpty) {
      val all = Tables.documents(s, d).select("doc_id", "text")
      VersionedParquet.publish(all.filter(col("doc_id") % 4 =!= 0),
        docs, keepVersions = 10)
      VersionedParquet.append(s, docs,
        all.filter(col("doc_id") % 4 === 0 && col("doc_id") % 3 === 0),
        keepVersions = 10)
      VersionedParquet.delete(s, docs, col("doc_id") % 7 === 0,
        keepVersions = 10)
      def postingsOf(df: org.apache.spark.sql.DataFrame) =
        df.select(col("doc_id"),
          posexplode(tokens(col("text"))).as(Seq("pos", "term")))
          .withColumn("term_bucket", termBucket(col("term")))
          .repartition(col("term_bucket"))
      VersionedParquet.publish(
        postingsOf(VersionedParquet.read(s, docs, Some(0L))), idx,
        partitionCols = Seq("term_bucket"), keepVersions = 10)
      val ins = VersionedParquet.changes(s, docs, 0, 1)
        .filter(col("_change_type") === "insert")
        .select("doc_id", "text")
      VersionedParquet.append(s, idx, postingsOf(ins),
        keepVersions = 10)
      val del = VersionedParquet.changes(s, docs, 1, 2)
        .filter(col("_change_type") === "delete")
        .select("doc_id").distinct()
      VersionedParquet.publish(del, tomb, keepVersions = 10)
    }
    (idx, tomb)
  }
}
