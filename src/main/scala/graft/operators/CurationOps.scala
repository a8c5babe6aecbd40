package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns._
import graft.functions.{TextKernels, TextStat}
import graft.sources.{QueryDef, Tables}

/** Corpus-curation operators: PII-pattern masking and the end-to-end
  * keep/drop decision pipeline — the composition a training-data run
  * actually executes, built entirely from the tiers below it (text
  * quality kernels, near-dup connected components).
  */
object CurationOps {

  /** Cross-engine regexes (no backrefs/lookaround, ASCII classes — the
    * Java-regex/RE2 common subset, so Spark and DuckDB transform
    * byte-identically). URLs mask FIRST: a URL may carry userinfo that
    * would otherwise half-match the email pattern. */
  private val EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val URL = "https?://[^\\s]+"

  /** Shared DuckDB token expression (mirrors TextFns.tokens). */
  private val TOKS =
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x != '')"

  /** Feature-hash width, round count, and step scale for the q245
    * batch perceptron. Declared BEFORE `queries`: the oracle SQL string
    * interpolates them eagerly at object init. */
  private val PERC_F = 64
  private val PERC_ROUNDS = 8
  private val PERC_STEP = 1000L

  /** One unrolled perceptron round as oracle CTEs: margins against the
    * prior weights, the mean-normalized geometrically-damped per-bucket
    * update over the misclassified set (y·margin ≤ 0 — margin-zero rows
    * update, matching round 1 where all weights are zero), and the new
    * weight vector. Step k divides by 2^(k-1): full-batch lr=1 provably
    * oscillates (the update's token mass swamps the prior weights — the
    * round-10 experiment log), geometric decay converges and then
    * freezes. `//` on signed BIGINT truncates toward zero in DuckDB,
    * matching JVM `/` on Long — no floor-vs-trunc hazard. */
  private def percRound(k: Int): String =
    s"""m$k AS MATERIALIZED (
       |  SELECT f.doc_id, f.y, sum(f.cnt * w.w) AS margin
       |  FROM f JOIN w${k - 1} w USING (bucket) GROUP BY 1, 2),
       |n$k AS (
       |  SELECT count(*) AS n FROM m$k WHERE y * margin <= 0),
       |u$k AS (
       |  SELECT f.bucket, sum(f.y * f.cnt) AS s
       |  FROM f JOIN m$k m ON m.doc_id = f.doc_id
       |  WHERE m.y * m.margin <= 0 GROUP BY 1),
       |w$k AS MATERIALIZED (
       |  SELECT w.bucket,
       |         w.w + coalesce((u.s * $PERC_STEP)
       |                 // (greatest(n.n, 1) * ${1L << (k - 1)}), 0) AS w
       |  FROM w${k - 1} w LEFT JOIN u$k u USING (bucket), n$k n)""".stripMargin

  val queries: Seq[QueryDef] = Seq(

    // ── PII masking: emails/URLs → placeholders, with audit counts ────────
    // Narrow, codegen-adjacent (regex eval per row, no shuffle until the
    // sort); md5 of the masked text proves the two engines produced the
    // SAME bytes, not just the same counts.
    QueryDef("q57_text_mask",
      (s, d) => {
        // n_urls counts on raw text; n_emails counts on the URL-masked
        // text — each audit count equals the number of placeholders its
        // stage actually inserted (an email inside a URL's userinfo is
        // consumed by the URL mask and must not be double-reported).
        val urlMasked = regexp_replace(col("text"), URL, "<URL>")
        val masked = regexp_replace(urlMasked, EMAIL, "<EMAIL>")
        Tables.documents(s, d).select(
            col("doc_id"),
            regexp_count(col("text"), lit(URL)).as("n_urls"),
            regexp_count(urlMasked, lit(EMAIL)).as("n_emails"),
            length(masked).as("masked_len"),
            md5(masked).as("masked_md5"))
          .orderBy("doc_id")
      },
      Some(s"""WITH u AS (
             |  SELECT doc_id, text,
             |         regexp_replace(text, '$URL', '<URL>', 'g') AS url_masked
             |  FROM documents)
             |SELECT doc_id,
             |       CAST(len(regexp_extract_all(text, '$URL')) AS INT)
             |         AS n_urls,
             |       CAST(len(regexp_extract_all(url_masked, '$EMAIL')) AS INT)
             |         AS n_emails,
             |       CAST(length(regexp_replace(url_masked, '$EMAIL',
             |                                  '<EMAIL>', 'g')) AS INT)
             |         AS masked_len,
             |       md5(regexp_replace(url_masked, '$EMAIL', '<EMAIL>', 'g'))
             |         AS masked_md5
             |FROM u
             |ORDER BY doc_id""".stripMargin)),

    // ── Fuzzy string-similarity join: blocked edit distance ───────────────
    // Conforming dirty catalog strings ("hot gear" vs "red gear") needs
    // a similarity join, and all-pairs Levenshtein is quadratic — the
    // scalable shape blocks on a cheap equality key first (here the
    // type noun, i.e. the last token) so the O(n·m) DP runs only inside
    // blocks. Both engines implement classic unweighted Levenshtein, so
    // the distances compare exactly.
    QueryDef("q65_fuzzy_join",
      (s, d) => {
        val names = Tables.part(s, d).select("p_name").distinct()
          .withColumn("block", element_at(split(col("p_name"), " "), -1))
        val a = names.select(col("block"), col("p_name").as("name_a"))
        val b = names.select(col("block"), col("p_name").as("name_b"))
        a.join(b, Seq("block"))
          .filter(col("name_a") < col("name_b"))
          .select(col("name_a"), col("name_b"),
            levenshtein(col("name_a"), col("name_b")).as("edit_dist"))
          .filter(col("edit_dist") <= 4)
          .orderBy("name_a", "name_b")
      },
      Some("""WITH names AS (
             |  SELECT DISTINCT p_name,
             |         string_split(p_name, ' ')[-1] AS block
             |  FROM part)
             |SELECT a.p_name AS name_a, b.p_name AS name_b,
             |       CAST(levenshtein(a.p_name, b.p_name) AS INT) AS edit_dist
             |FROM names a JOIN names b
             |  ON a.block = b.block AND a.p_name < b.p_name
             |WHERE levenshtein(a.p_name, b.p_name) <= 4
             |ORDER BY name_a, name_b""".stripMargin)),

    // ── End-to-end curation: dedup + quality → keep decision per doc ──────
    // Precedence is dedup-first (a non-representative member of a
    // near-dup component drops as 'dup' regardless of quality; the
    // representative is the component-min id and then faces the quality
    // gates). The per-language summary is what a curation run reports.
    QueryDef("q58_curation_pipeline",
      (s, d) => {
        val comp = DedupOps.components(s, d)
        val nTok = TextStat(col("text"), TextKernels.TokenRuns)
        val punctRatio = TextStat(col("text"), TextKernels.Punct).cast("double") /
          nullif(length(col("text")), lit(0))
        val stopRatio = hitCount(tokens(col("text")), stopwords("en"))
          .cast("double") / nullif(nTok, lit(0))
        Tables.documents(s, d)
          .join(comp, Seq("doc_id"), "left")
          .withColumn("decision",
            when(col("group_id").isNotNull && col("group_id") =!= col("doc_id"),
              "dup")
              .when(nTok < 10, "quality")
              .when(punctRatio > 0.1, "quality")
              .when(stopRatio > 0.3, "quality")
              .otherwise("kept"))
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            count(when(col("decision") === "kept", 1)).as("n_kept"),
            count(when(col("decision") === "dup", 1)).as("n_dropped_dup"),
            count(when(col("decision") === "quality", 1))
              .as("n_dropped_quality"))
          .orderBy("lang")
      },
      Some(s"""WITH RECURSIVE ${DedupOps.COMPONENT_CTES},
             |scored AS (
             |  SELECT doc_id, lang, len(toks) AS n_toks,
             |         CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '',
             |                'g')) AS DOUBLE) / nullif(length(text), 0)
             |           AS punct_ratio,
             |         CAST(len(list_filter(toks, t -> t IN
             |                ('the','a','of','and','to','in','is','that')))
             |              AS DOUBLE) / nullif(len(toks), 0) AS stop_ratio
             |  FROM (SELECT d.doc_id, d.lang, d.text, t.toks
             |        FROM documents d JOIN t ON t.doc_id = d.doc_id)),
             |decided AS (
             |  SELECT s.lang,
             |         CASE WHEN c.group_id IS NOT NULL AND c.group_id != s.doc_id
             |                THEN 'dup'
             |              WHEN s.n_toks < 10 THEN 'quality'
             |              WHEN s.punct_ratio > 0.1 THEN 'quality'
             |              WHEN s.stop_ratio > 0.3 THEN 'quality'
             |              ELSE 'kept' END AS decision
             |  FROM scored s LEFT JOIN comp c ON c.id = s.doc_id)
             |SELECT lang, count(*) AS n_docs,
             |       count(*) FILTER (WHERE decision = 'kept') AS n_kept,
             |       count(*) FILTER (WHERE decision = 'dup') AS n_dropped_dup,
             |       count(*) FILTER (WHERE decision = 'quality')
             |         AS n_dropped_quality
             |FROM decided GROUP BY lang ORDER BY lang""".stripMargin)),

    // ── Sequence packing: fill fixed token budgets with whole docs ────────
    // Training runs consume fixed-length sequences (e.g. 2048 tokens);
    // packing assigns each document to the sequence where its starting
    // offset lands (prefix-sum of token counts within a language,
    // doc_id order — deterministic under retries, no RNG). One window
    // cumsum + one bounded-key aggregate; the window partitions by
    // lang, so no single-partition stage. A doc longer than the budget
    // keeps its start bin and overflows into the next bins' offsets —
    // fill > 1 marks exactly those bins (a real packer would split the
    // doc; offset-chunking keeps the op deterministic and join-free).
    QueryDef("q69_seq_packing",
      (s, d) => {
        val budget = 2048L
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("lang"),
            size(tokens(col("text"))).cast("long").as("n_toks"))
        val w = Window.partitionBy("lang").orderBy("doc_id")
        docs.withColumn("cum", sum("n_toks").over(w))
          .withColumn("seq_id",
            call_function("div", col("cum") - col("n_toks"), lit(budget)))
          .groupBy("lang", "seq_id")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_toks").as("seq_tokens"),
            min("doc_id").as("first_doc"),
            max("doc_id").as("last_doc"))
          .withColumn("fill",
            round(col("seq_tokens") / lit(budget.toDouble), 4))
          .orderBy("lang", "seq_id")
      },
      Some(s"""WITH t AS (
             |  SELECT doc_id, lang, len($TOKS) AS n_toks FROM documents),
             |c AS (
             |  SELECT doc_id, lang, n_toks,
             |         sum(n_toks) OVER (PARTITION BY lang ORDER BY doc_id)
             |           AS cum
             |  FROM t)
             |SELECT lang, CAST((cum - n_toks) // 2048 AS BIGINT) AS seq_id,
             |       count(*) AS n_docs,
             |       CAST(sum(n_toks) AS BIGINT) AS seq_tokens,
             |       min(doc_id) AS first_doc,
             |       max(doc_id) AS last_doc,
             |       round(CAST(sum(n_toks) AS BIGINT) / 2048.0, 4) AS fill
             |FROM c
             |GROUP BY 1, 2
             |ORDER BY lang, seq_id""".stripMargin)),

    // ── Chunk planning: sliding-window split cost for embedding/RAG ───────
    // Retrieval pipelines split documents into fixed windows with
    // overlap before embedding; the capacity question is how many
    // chunks a corpus becomes and how much of the embedding budget is
    // overhead. For window W=128, stride S=96 (32-token overlap):
    //   n_chunks = 1 + ceil(max(0, n - W) / S)
    //   duplicated = 32·(n_chunks - 1)   (overlap re-embedded)
    //   padding = n_chunks·W - n - duplicated   (last-window slack)
    // Pure per-row integer arithmetic (ceil via the add-then-int-divide
    // identity — both engines exact) + one bounded-key aggregate; no
    // shuffle touches text.
    QueryDef("q76_chunk_plan",
      (s, d) => {
        val W = 128L; val S = 96L; val overlap = W - S
        val n = size(tokens(col("text"))).cast("long")
        val nChunks = lit(1L) + call_function("div",
          greatest(n - W, lit(0L)) + (S - 1), lit(S))
        val dup = lit(overlap) * (nChunks - 1)
        Tables.documents(s, d)
          .select(col("lang"), n.as("n_toks"), nChunks.as("n_chunks"),
            dup.as("dup_toks"),
            (nChunks * W - n - dup).as("pad_toks"))
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_toks").as("n_tokens"),
            sum("n_chunks").as("n_chunks"),
            sum("dup_toks").as("dup_tokens"),
            sum("pad_toks").as("pad_tokens"),
            round((sum("dup_toks") + sum("pad_toks")).cast("double") /
              (sum("n_chunks") * W), 6).as("overhead_frac"))
          .orderBy("lang")
      },
      Some(s"""WITH t AS (
             |  SELECT lang, len($TOKS) AS n FROM documents),
             |c AS (
             |  SELECT lang, n,
             |         1 + (greatest(n - 128, 0) + 95) // 96 AS n_chunks
             |  FROM t),
             |p AS (
             |  SELECT lang, n, n_chunks,
             |         32 * (n_chunks - 1) AS dup_toks,
             |         n_chunks * 128 - n - 32 * (n_chunks - 1) AS pad_toks
             |  FROM c)
             |SELECT lang, count(*) AS n_docs,
             |       CAST(sum(n) AS BIGINT) AS n_tokens,
             |       CAST(sum(n_chunks) AS BIGINT) AS n_chunks,
             |       CAST(sum(dup_toks) AS BIGINT) AS dup_tokens,
             |       CAST(sum(pad_toks) AS BIGINT) AS pad_tokens,
             |       round((CAST(sum(dup_toks) AS BIGINT)
             |              + CAST(sum(pad_toks) AS BIGINT))
             |             / (CAST(sum(n_chunks) AS BIGINT) * 128.0), 6)
             |         AS overhead_frac
             |FROM p
             |GROUP BY lang
             |ORDER BY lang""".stripMargin)),

    // ── Chunk MATERIALIZATION: the RAG ingestion op itself ───────────────
    // q76 costs the split; this one PRODUCES the chunk rows a
    // retrieval pipeline embeds: per doc, overlapping token windows
    // (W=64, stride S=48) with the chunk index, its token count, and
    // the md5 of the joined chunk text — content-exact, so a window
    // that is one token off, a dropped last chunk, or a wrong overlap
    // breaks the hash against DuckDB's 1-based list slicing. One
    // generate per doc (sequence + explode), no shuffle until the
    // ORDER BY: at 100 TB this is a pure map-side expansion whose
    // output partitioning follows the input.
    QueryDef("q275_chunk_materialize",
      (s, d) => {
        val W = 64; val S = 48
        val nChunks = (lit(1L) + call_function("div",
          greatest(size(col("toks")).cast("long") - W, lit(0L)) +
            (S - 1), lit(S.toLong))).cast("int")
        Tables.documents(s, d)
          .select(col("doc_id"), tokens(col("text")).as("toks"))
          .withColumn("ci", explode(sequence(lit(0), nChunks - 1)))
          .select(col("doc_id"), col("ci").as("chunk_idx"),
            slice(col("toks"), col("ci") * S + 1, lit(W)).as("w"))
          .select(col("doc_id"), col("chunk_idx"),
            size(col("w")).as("n_toks"),
            md5(array_join(col("w"), " ")).as("chunk_md5"))
          .orderBy("doc_id", "chunk_idx")
      },
      Some(s"""WITH t AS (
             |  SELECT doc_id, $TOKS AS toks FROM documents),
             |c AS (
             |  SELECT doc_id, toks,
             |         1 + (greatest(len(toks) - 64, 0) + 47) // 48
             |           AS nc
             |  FROM t),
             |e AS (
             |  SELECT doc_id, toks, unnest(range(nc)) AS ci FROM c),
             |w AS (
             |  SELECT doc_id, ci AS chunk_idx,
             |         toks[ci * 48 + 1 : ci * 48 + 64] AS w
             |  FROM e)
             |SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
             |       CAST(len(w) AS INT) AS n_toks,
             |       md5(array_to_string(w, ' ')) AS chunk_md5
             |FROM w
             |ORDER BY doc_id, chunk_idx""".stripMargin)),

    // ── Hashed linear quality classifier (fastText-style inference) ───────
    // The quality-model scoring pass of a curation run: tokens hash
    // into F=64 feature buckets (feature hashing — Weinberger et al.
    // 2009), the bucket counts dot a weight vector, the score decides
    // keep/drop. Weights here are md5-derived so the DuckDB oracle
    // recomputes them exactly; production swaps in trained weights as a
    // broadcast table without touching the plan shape.
    //
    // Determinism: the dot product stays in INTEGER space (cnt × int
    // weight, summed) and divides once at the end — integer sums are
    // order-independent, so the score is bit-identical across engines
    // and partitionings (a double-accumulating formulation would hash-
    // mismatch on reduction order).
    //
    // 100 TB shape: explode → one (doc_id, bucket)-keyed shuffle with
    // map-side combine; the 64-row weight table broadcasts; nothing
    // else moves. F scales to millions of buckets without a new shuffle.
    QueryDef("q93_quality_classifier",
      (s, d) => {
        val F = 64
        val toks = Tables.documents(s, d)
          .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
        val counts = toks
          .select(col("doc_id"),
            pmod(graft.functions.Hashing.md5Long60(col("tok")), lit(F))
              .as("bucket"))
          .groupBy("doc_id", "bucket").agg(count(lit(1)).as("cnt"))
        val weights = s.range(F).select(col("id").as("bucket"),
          (pmod(graft.functions.Hashing.md5Long60(
            concat(lit("qw_"), col("id"))), lit(2001)) - 1000).as("wi"))
        val scored = counts.join(broadcast(weights), "bucket")
          .groupBy("doc_id")
          .agg(sum(col("cnt") * col("wi")).as("num"),
            sum("cnt").as("n"))
        val score = col("num").cast("double") / (lit(1000.0) * col("n"))
        scored.select(col("doc_id"), col("n").cast("int").as("n_tokens"),
            score.as("score"),
            when(score > 0.05, "keep").otherwise("drop").as("label"))
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS (
             |  SELECT doc_id, unnest($TOKS) AS tok FROM documents),
             |b AS (
             |  SELECT doc_id,
             |         ${graft.functions.Hashing.md5Long60Sql("tok")} % 64
             |           AS bucket
             |  FROM t),
             |c AS (SELECT doc_id, bucket, count(*) AS cnt FROM b GROUP BY 1, 2),
             |w AS (
             |  SELECT r.r AS bucket,
             |         ${graft.functions.Hashing.md5Long60Sql("'qw_' || r.r")}
             |           % 2001 - 1000 AS wi
             |  FROM range(0, 64) r(r)),
             |s AS (
             |  SELECT doc_id, sum(cnt * wi) AS num, sum(cnt) AS n
             |  FROM c JOIN w USING (bucket) GROUP BY 1)
             |SELECT doc_id, CAST(n AS INT) AS n_tokens,
             |       CAST(num AS DOUBLE) / (1000.0 * n) AS score,
             |       CASE WHEN CAST(num AS DOUBLE) / (1000.0 * n) > 0.05
             |            THEN 'keep' ELSE 'drop' END AS label
             |FROM s
             |ORDER BY doc_id""".stripMargin)),

    // q183 — row provenance (the training-data audit trail). Every
    // curated row stays traceable to its PHYSICAL origin — (source
    // file, row position) from Spark's `_metadata` hidden columns,
    // zero storage cost (parquet scan metadata, no ids minted, no
    // joins) — so "which file and offset did this training document
    // come from" is answerable after arbitrary filtering. The ledger
    // aggregates per (file, lang): kept count, position range, and
    // SUM of positions + doc_ids — the sums bind EVERY kept row's
    // provenance exactly. The oracle derives the expected physical
    // positions from the testdata invariant that documents.parquet is
    // one file written in doc_id order (verified via DuckDB
    // file_row_number == doc_id at every SF), so a Spark row_index
    // that drifts from the true file position ANYWHERE breaks the
    // hash — the engine cannot cheat because its side reads only
    // `_metadata`, never doc_id, for the position columns.
    // At 100 TB this is a narrow projection folded into the scan —
    // `_metadata` is per-row scan state, the aggregate is
    // group-by-file (file-count cardinality), no extra pass.
    QueryDef("q183_row_provenance",
      (s, d) => {
        val docs = Tables(s, d, "documents")
        docs.select(col("doc_id"), col("lang"), col("n_chars"),
            regexp_extract(col("_metadata.file_path"),
              "([^/]+)$", 1).as("src_file"),
            col("_metadata.row_index").as("src_pos"))
          .filter(col("n_chars") >= 300 &&
            col("lang").isin("en", "de", "fr"))
          .groupBy("src_file", "lang")
          .agg(count(lit(1)).as("n_kept"),
            min(col("src_pos")).as("min_pos"),
            max(col("src_pos")).as("max_pos"),
            sum(col("src_pos")).cast("long").as("sum_pos"),
            sum(col("doc_id")).cast("long").as("sum_doc_id"))
          .orderBy("src_file", "lang")
      },
      Some("""SELECT 'documents.parquet' AS src_file,
             |       lang, count(*) AS n_kept,
             |       min(doc_id) AS min_pos,
             |       max(doc_id) AS max_pos,
             |       CAST(sum(doc_id) AS BIGINT) AS sum_pos,
             |       CAST(sum(doc_id) AS BIGINT) AS sum_doc_id
             |FROM documents
             |WHERE n_chars >= 300 AND lang IN ('en', 'de', 'fr')
             |GROUP BY 1, 2
             |ORDER BY src_file, lang""".stripMargin)),

    // ── The release: curate → split → publish → stats → manifest ─────────
    // q58 DECIDES; this SHIPS. The kept set (same quality + near-dup-
    // component rules, the oracle replays them verbatim) gets a
    // deterministic hash split, publishes as a split-partitioned
    // versioned table, ANALYZEs itself, and exports an external-reader
    // manifest — the complete release artifact a training run consumes.
    // The DATA CARD is the gate: per (split, lang) doc/token counts
    // read back FROM THE RELEASE (not the pipeline's intermediate
    // state), drop accounting, the release version, stats freshness,
    // and a manifest-completeness probe (rows readable through NOTHING
    // but the manifest's file list == rows released). A release that
    // leaked a dropped doc, split nondeterministically, shipped stale
    // stats, or exported a torn manifest breaks the hash.
    QueryDef("q200_release_pipeline",
      (s, d) => s.read.parquet(releasePath(s, d)).orderBy("split", "lang"),
      Some(s"""WITH RECURSIVE ${DedupOps.COMPONENT_CTES},
             |scored AS (
             |  SELECT doc_id, lang, len(toks) AS n_toks,
             |         CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '',
             |                'g')) AS DOUBLE) / nullif(length(text), 0)
             |           AS punct_ratio,
             |         CAST(len(list_filter(toks, t -> t IN
             |                ('the','a','of','and','to','in','is','that')))
             |              AS DOUBLE) / nullif(len(toks), 0) AS stop_ratio
             |  FROM (SELECT d.doc_id, d.lang, d.text, t.toks
             |        FROM documents d JOIN t ON t.doc_id = d.doc_id)),
             |decided AS (
             |  SELECT s.doc_id, s.lang, s.n_toks,
             |         CASE WHEN c.group_id IS NOT NULL AND c.group_id != s.doc_id
             |                THEN 'dup'
             |              WHEN s.n_toks < 10 THEN 'quality'
             |              WHEN s.punct_ratio > 0.1 THEN 'quality'
             |              WHEN s.stop_ratio > 0.3 THEN 'quality'
             |              ELSE 'kept' END AS decision
             |  FROM scored s LEFT JOIN comp c ON c.id = s.doc_id),
             |kept AS (
             |  SELECT doc_id, lang, n_toks,
             |         CASE WHEN ${graft.functions.Hashing
                  .md5Long60Sql("'split_' || doc_id")} % 10 = 0
             |              THEN 'val' ELSE 'train' END AS split
             |  FROM decided WHERE decision = 'kept')
             |SELECT split, lang, count(*) AS n_docs,
             |       CAST(sum(n_toks) AS BIGINT) AS sum_tokens,
             |       (SELECT count(*) FROM decided WHERE decision = 'dup')
             |         AS n_dropped_dup,
             |       (SELECT count(*) FROM decided
             |        WHERE decision = 'quality') AS n_dropped_quality,
             |       0 AS release_version, 1 AS stats_fresh,
             |       1 AS manifest_complete
             |FROM kept
             |GROUP BY 1, 2
             |ORDER BY split, lang""".stripMargin)),

    // ── Trained classifier: distributed full-batch perceptron distill ────
    // q93 scores with a FIXED weight table; this TRAINS one — the
    // teacher-distillation pattern of production corpus curation (an
    // expensive teacher labels a corpus once; a hashed linear student is
    // trained on those labels and scores everything cheaply thereafter,
    // e.g. the FineWeb-Edu / fastText quality-classifier recipe). The
    // teacher here is a deterministic rule over raw token counts
    // (data+table mass vs query+scan mass) so the oracle can replay it;
    // the student sees ONLY md5-hashed bucket counts (F=64, collisions
    // and all) and must recover the separator by batch perceptron:
    // per round every misclassified doc contributes y·x, the batch
    // update is mean-normalized and geometrically damped (step k scales
    // by STEP/2^(k-1) — full-batch lr=1 provably oscillates between the
    // two class-mass poles; the decayed step converges to ~92% student
    // agreement and then freezes).
    //
    // Per round: exactly two key-partitioned aggregates — doc margins
    // via a broadcast-weight join, then the per-bucket update over the
    // misclassified set. The F-row weight vector is the only driver
    // state (the bounded-metadata discipline of the k-means centroids).
    //
    // Determinism: counts, weights, margins, updates all in INTEGER
    // space (order-independent sums); signed update division truncates
    // toward zero in BOTH engines (DuckDB `//` == JVM `/` on Long). The
    // oracle re-trains from scratch as unrolled CTEs — a drifted update,
    // wrong margin-0 handling, or a float anywhere breaks the hash.
    //
    // 100 TB shape: the feature frame is built once (one explode + one
    // (doc,bucket) map-side-combined shuffle) and persisted; each round
    // adds one broadcast join + two aggregates — O(rounds) passes over
    // token-scale data, no all-pairs, no driver data rows. The
    // mean-normalized step keeps weights ~STEP-scale regardless of
    // corpus size, so margins stay far inside Long at any SF.
    QueryDef("q245_trained_classifier",
      (s, d) => {
        val toksCol = tokens(col("text"))
        val teacherPos = size(filter(toksCol,
          t => t === "data" || t === "table"))
        val teacherNeg = size(filter(toksCol,
          t => t === "query" || t === "scan"))
        val feat = Tables.documents(s, d)
          .select(col("doc_id"),
            when(teacherPos > teacherNeg, 1L).otherwise(-1L).as("y"),
            explode(toksCol).as("tok"))
          .select(col("doc_id"), col("y"),
            pmod(graft.functions.Hashing.md5Long60(col("tok")),
              lit(PERC_F.toLong)).as("bucket"))
          .groupBy("doc_id", "y", "bucket").agg(count(lit(1)).as("cnt"))
          .persist()
        def wDf(w: Map[Long, Long]) = {
          import s.implicits._
          broadcast(w.toSeq.sorted.toDF("bucket", "w"))
        }
        var w: Map[Long, Long] =
          (0L until PERC_F.toLong).map(_ -> 0L).toMap
        for (round <- 1 to PERC_ROUNDS) {
          val mis = feat.join(wDf(w), "bucket")
            .groupBy("doc_id", "y")
            .agg(sum(col("cnt") * col("w")).as("margin"))
            .filter(col("y") * col("margin") <= 0)
            .select("doc_id")
            .persist()
          val nMis = math.max(mis.count(), 1L)
          val upd = feat.join(mis, "doc_id")
            .groupBy("bucket").agg(sum(col("y") * col("cnt")).as("s"))
            .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
          mis.unpersist()
          val denom = nMis * (1L << (round - 1))
          w = w.map { case (b, cur) =>
            b -> (cur + upd.getOrElse(b, 0L) * PERC_STEP / denom)
          }
        }
        val fin = wDf(w)
        val met = feat.join(fin, "bucket")
          .groupBy("doc_id", "y")
          .agg(sum(col("cnt") * col("w")).as("margin"))
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("y") * col("margin") > 0, 1L).otherwise(0L))
              .as("n_correct"))
        fin.select(col("bucket"), col("w").as("weight"))
          .crossJoin(broadcast(met))
          .withColumn("acc_ppm",
            expr("(n_correct * 1000000) div n_docs"))
          .orderBy("bucket")
      },
      Some(s"""WITH lab AS (
             |  SELECT doc_id,
             |         CASE WHEN len(list_filter(toks,
             |                    x -> x IN ('data', 'table')))
             |            > len(list_filter(toks,
             |                    x -> x IN ('query', 'scan')))
             |           THEN 1 ELSE -1 END AS y,
             |         toks
             |  FROM (SELECT doc_id, $TOKS AS toks FROM documents)),
             |t AS (SELECT doc_id, y, unnest(toks) AS tok FROM lab),
             |f AS MATERIALIZED (
             |  SELECT doc_id, y,
             |         ${graft.functions.Hashing.md5Long60Sql("tok")}
             |           % $PERC_F AS bucket,
             |         count(*) AS cnt
             |  FROM t GROUP BY 1, 2, 3),
             |w0 AS MATERIALIZED (
             |  SELECT r.r AS bucket, CAST(0 AS BIGINT) AS w
             |  FROM range(0, $PERC_F) r(r)),
             |${(1 to PERC_ROUNDS).map(percRound).mkString(",\n")},
             |sc AS (
             |  SELECT f.doc_id, f.y, sum(f.cnt * w.w) AS margin
             |  FROM f JOIN w$PERC_ROUNDS w USING (bucket) GROUP BY 1, 2),
             |met AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
             |         CAST(sum(CASE WHEN y * margin > 0 THEN 1 ELSE 0 END)
             |              AS BIGINT) AS n_correct
             |  FROM sc)
             |SELECT w.bucket, CAST(w.w AS BIGINT) AS weight,
             |       met.n_docs, met.n_correct,
             |       (met.n_correct * 1000000) // met.n_docs AS acc_ppm
             |FROM w$PERC_ROUNDS w, met
             |ORDER BY bucket""".stripMargin))
  )

  /** q200 builder: decide (q58's rules) → split → publish → ANALYZE →
    * manifest → data card read from the release. Once per session. */
  private def releasePath(s: org.apache.spark.sql.SparkSession,
                          d: String): String = {
    import graft.functions.Hashing
    import graft.warehouse.{Analyze, AtomicParquet, VersionedParquet}
    val root = graft.sources.Scratch.dir(s, "q200-release")
    val outPath = graft.sources.Scratch.dir(s, "q200-out")
    if (VersionedParquet.currentVersion(s, root).isEmpty) {
      val comp = DedupOps.components(s, d)
      val nTok = TextStat(col("text"), TextKernels.TokenRuns)
      val punctRatio = TextStat(col("text"), TextKernels.Punct)
        .cast("double") / nullif(length(col("text")), lit(0))
      val stopRatio = hitCount(tokens(col("text")), stopwords("en"))
        .cast("double") / nullif(nTok, lit(0))
      val decided = Tables.documents(s, d)
        .join(comp, Seq("doc_id"), "left")
        .withColumn("n_toks", nTok)
        .withColumn("decision",
          when(col("group_id").isNotNull &&
              col("group_id") =!= col("doc_id"), "dup")
            .when(col("n_toks") < 10, "quality")
            .when(punctRatio > 0.1, "quality")
            .when(stopRatio > 0.3, "quality")
            .otherwise("kept"))
        .cache()
      val drops = decided.groupBy("decision").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val kept = decided.filter(col("decision") === "kept")
        .withColumn("split",
          when(pmod(Hashing.md5Long60(
            concat(lit("split_"), col("doc_id").cast("string"))),
            lit(10)) === 0, "val").otherwise("train"))
        .select("doc_id", "lang", "split", "n_toks")
      VersionedParquet.publish(kept.repartition(col("split")), root,
        partitionCols = Seq("split"), keepVersions = 10)
      Analyze.table(s, root)
      val statsFresh = Analyze.stats(s, root)
        .exists(_._1 == VersionedParquet.currentVersion(s, root).get)
      val manifest = VersionedParquet.generateManifest(s, root,
        partitionCols = Seq("split"))
      val viaManifest = s.read.parquet(
        VersionedParquet.readManifest(s, manifest): _*).count()
      val nKept = VersionedParquet.read(s, root).count()
      val card = VersionedParquet.read(s, root)
        .groupBy("split", "lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_toks")).cast("long").as("sum_tokens"))
        .withColumn("n_dropped_dup", lit(drops.getOrElse("dup", 0L)))
        .withColumn("n_dropped_quality",
          lit(drops.getOrElse("quality", 0L)))
        .withColumn("release_version",
          lit(VersionedParquet.currentVersion(s, root).get.toInt))
        .withColumn("stats_fresh", lit(if (statsFresh) 1 else 0))
        .withColumn("manifest_complete",
          lit(if (viaManifest == nKept) 1 else 0))
      decided.unpersist()
      AtomicParquet.overwrite(card, outPath)
    }
    outPath
  }
}
