package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Hashing
import graft.functions.TextFns.tokens
import graft.sources.{QueryDef, Tables}

/** Deterministic sampling for training-data curation. rand()-based
  * sampling is nondeterministic across retries/partitionings — a task
  * retry silently changes the sample, which poisons reproducibility and
  * makes cross-engine verification impossible. Hashing a stable key
  * gives the same statistical guarantees (md5 is uniform) while being
  * exactly reproducible anywhere, including in the DuckDB oracle.
  */
object SampleOps {

  private val PER_STRATUM = 20

  /** Shared DuckDB token expression (mirrors TextFns.tokens). */
  private val TOKS =
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x != '')"

  val queries: Seq[QueryDef] = Seq(

    // ── Fixed-size per-stratum sample (deterministic "reservoir") ─────────
    // Rank docs per language by a salted hash of the doc id and keep the
    // first 20 — a uniform without-replacement sample per stratum, stable
    // under any execution order. The per-stratum window is one reducer
    // per stratum; at 100 TB prepend a hash-threshold prefilter
    // (h % M < k) sized so expected survivors per stratum >> n, which
    // bounds the window input to ~k·strata rows without changing the
    // result (the top-n by hash survive any threshold that keeps >= n).
    QueryDef("q52_stratified_sample",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val w = Window.partitionBy("lang")
          .orderBy(col("hv").asc, col("doc_id").asc)
        docs.select(col("lang"), col("doc_id"),
            Hashing.md5Long60(
              concat(lit("sample_"), col("doc_id").cast("string"))).as("hv"))
          .withColumn("sample_rank", row_number().over(w))
          .filter(col("sample_rank") <= PER_STRATUM)
          .select("lang", "doc_id", "sample_rank")
          .orderBy("lang", "sample_rank")
      },
      Some(s"""WITH h AS (
             |  SELECT lang, doc_id,
             |         ${Hashing.md5Long60Sql("'sample_' || doc_id")} AS hv
             |  FROM documents),
             |r AS (
             |  SELECT lang, doc_id,
             |         row_number() OVER (PARTITION BY lang
             |                            ORDER BY hv ASC, doc_id ASC) AS rn
             |  FROM h)
             |SELECT lang, doc_id, CAST(rn AS INT) AS sample_rank
             |FROM r WHERE rn <= $PER_STRATUM
             |ORDER BY lang, sample_rank""".stripMargin)),

    // ── Weighted (importance) sampling: P(keep) ∝ document length ─────────
    // Curation often oversamples long/high-value documents. Keep doc iff
    // hash-uniform u < rate · weight / max-weight — deterministic
    // Poisson-style sampling, exactly reproducible across engines and
    // retries. The max-weight normalizer is a broadcast scalar (one
    // tiny aggregate); everything else is a narrow per-row predicate.
    QueryDef("q66_weighted_sample",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val maxChars = docs.agg(max("n_chars").as("max_chars"))
        // u in [0, 1): the 60-bit hash scaled down; target rate 0.2
        val u = Hashing.md5Long60(
          concat(lit("wsample_"), col("doc_id").cast("string")))
          .cast("double") / lit(1152921504606846976.0) // 2^60
        docs.crossJoin(broadcast(maxChars))
          .filter(u < lit(0.2) * col("n_chars").cast("double") / col("max_chars"))
          .groupBy("lang")
          .agg(count(lit(1)).as("n_sampled"),
            sum("n_chars").as("sampled_chars"),
            min("doc_id").as("first_doc"))
          .orderBy("lang")
      },
      Some(s"""WITH mc AS (SELECT max(n_chars) AS max_chars FROM documents),
             |kept AS (
             |  SELECT d.lang, d.doc_id, d.n_chars
             |  FROM documents d CROSS JOIN mc
             |  WHERE CAST(${Hashing.md5Long60Sql("'wsample_' || doc_id")}
             |             AS DOUBLE) / 1152921504606846976.0
             |        < 0.2 * CAST(d.n_chars AS DOUBLE) / mc.max_chars)
             |SELECT lang, count(*) AS n_sampled,
             |       CAST(sum(n_chars) AS BIGINT) AS sampled_chars,
             |       min(doc_id) AS first_doc
             |FROM kept GROUP BY lang
             |ORDER BY lang""".stripMargin)),

    // ── Domain-mix rebalancing: per-(source, lang) sampling weights ───────
    // Training mixes are specified as token shares per domain; given a
    // target (uniform here — the operator parameterizes on any target
    // vector), the per-group sampling weight is target_share /
    // actual_share, capped at 1 (upsampling is a repeat policy, not a
    // filter). Shape: one group-by over the corpus, then grand-total
    // windows over the GROUP frame (cardinality = #domains × #langs,
    // trivially small at any corpus scale — the W8 pattern applied
    // post-aggregation, never over raw rows).
    QueryDef("q72_domain_mix",
      (s, d) => {
        val g = Tables.documents(s, d)
          .select(col("source"), col("lang"),
            size(tokens(col("text"))).cast("long").as("n_toks"))
          .groupBy("source", "lang")
          .agg(count(lit(1)).as("n_docs"), sum("n_toks").as("n_tokens"))
        val w = Window.partitionBy()
        g.withColumn("share",
            col("n_tokens").cast("double") / sum("n_tokens").over(w))
          .withColumn("mix_weight",
            (lit(1.0) / count(lit(1)).over(w)) / col("share"))
          .select(col("source"), col("lang"), col("n_docs"), col("n_tokens"),
            round(col("share"), 6).as("token_share"),
            round(col("mix_weight"), 6).as("mix_weight"),
            round(col("n_docs") * least(lit(1.0), col("mix_weight")), 2)
              .as("expected_docs_kept"))
          .orderBy("source", "lang")
      },
      Some(s"""WITH g AS (
             |  SELECT source, lang, count(*) AS n_docs,
             |         CAST(sum(len($TOKS)) AS BIGINT) AS n_tokens
             |  FROM documents
             |  GROUP BY 1, 2),
             |shared AS (
             |  SELECT *,
             |         CAST(n_tokens AS DOUBLE)
             |           / CAST(sum(n_tokens) OVER () AS DOUBLE) AS share,
             |         (CAST(1 AS DOUBLE) / count(*) OVER ()) AS target
             |  FROM g)
             |SELECT source, lang, n_docs, n_tokens,
             |       round(share, 6) AS token_share,
             |       round(target / share, 6) AS mix_weight,
             |       round(n_docs * least(CAST(1 AS DOUBLE), target / share), 2)
             |         AS expected_docs_kept
             |FROM shared
             |ORDER BY source, lang""".stripMargin)),

    // ── Deterministic train/valid/test corpus split (98/1/1) ──────────────
    // The split must be a pure function of the document identity: a
    // rand() split changes on every retry and can leak a doc across
    // splits between runs — hash-bucketing the id is the reproducible
    // form (and trivially consistent across engines, so held-out sets
    // match wherever they're materialized). Narrow per-row hash, one
    // bounded-key aggregate; at 100 TB the same expression IS the
    // partition predicate for writing the three corpora.
    QueryDef("q73_corpus_split",
      (s, d) => {
        val bucket = pmod(
          Hashing.md5Long60(concat(lit("split_"), col("doc_id"))), lit(100L))
        Tables.documents(s, d)
          .select(col("lang"),
            when(bucket < 98, "train").when(bucket < 99, "valid")
              .otherwise("test").as("split"),
            size(tokens(col("text"))).cast("long").as("n_toks"))
          .groupBy("lang", "split")
          .agg(count(lit(1)).as("n_docs"), sum("n_toks").as("n_tokens"))
          .orderBy("lang", "split")
      },
      Some(s"""WITH b AS (
             |  SELECT lang,
             |         CASE WHEN ${Hashing.md5Long60Sql("'split_' || doc_id")}
             |                   % 100 < 98 THEN 'train'
             |              WHEN ${Hashing.md5Long60Sql("'split_' || doc_id")}
             |                   % 100 < 99 THEN 'valid'
             |              ELSE 'test' END AS split,
             |         len($TOKS) AS n_toks
             |  FROM documents)
             |SELECT lang, split, count(*) AS n_docs,
             |       CAST(sum(n_toks) AS BIGINT) AS n_tokens
             |FROM b
             |GROUP BY 1, 2
             |ORDER BY lang, split""".stripMargin)),

    // ── Leakage-guarded corpus split (cluster-aware) ─────────────────────
    // q73's hash split is a pure function of the DOCUMENT id — two
    // near-duplicates can land in train and test, leaking eval content
    // into training (the classic contamination bug a q68-style check
    // then has to catch after the fact). The guard: the split key is
    // the document's DEDUP COMPONENT id (q54's connected components;
    // singletons key by their own id), so every member of a near-dup
    // cluster lands in the SAME split by construction — no post-hoc
    // decontamination pass. Shape at 100 TB: the components come from
    // the banded candidate join (never all-pairs), the split adds one
    // left join against the component frame (group-cardinality) and
    // zero extra shuffles beyond q73. The oracle recomputes the
    // closure recursively and re-derives the same keyed split, so a
    // dropped singleton, a component that leaks across splits, or a
    // bucket-formula drift all break the hash.
    QueryDef("q164_leakage_guarded_split",
      (s, d) => {
        val docs = Tables.documents(s, d).select("doc_id", "lang")
        val comp = DedupOps.components(s, d)
        val keyed = docs.join(comp, Seq("doc_id"), "left")
          .withColumn("split_key",
            coalesce(col("group_id"), col("doc_id")))
        val bucket = pmod(
          Hashing.md5Long60(concat(lit("split_"), col("split_key"))),
          lit(100L))
        keyed
          .select(col("lang"), col("split_key"),
            when(bucket < 98, "train").when(bucket < 99, "valid")
              .otherwise("test").as("split"))
          .groupBy("lang", "split")
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(col("split_key")).as("n_groups"))
          .orderBy("lang", "split")
      },
      Some(s"""WITH RECURSIVE ${DedupOps.COMPONENT_CTES},
             |keyed AS (
             |  SELECT d.doc_id, d.lang,
             |         COALESCE(c.group_id, d.doc_id) AS split_key
             |  FROM documents d LEFT JOIN comp c ON c.id = d.doc_id),
             |b AS (
             |  SELECT lang, split_key,
             |         CASE WHEN ${Hashing.md5Long60Sql(
                         "'split_' || split_key")} % 100 < 98
             |                THEN 'train'
             |              WHEN ${Hashing.md5Long60Sql(
                         "'split_' || split_key")} % 100 < 99
             |                THEN 'valid'
             |              ELSE 'test' END AS split
             |  FROM keyed)
             |SELECT lang, split, count(*) AS n_docs,
             |       count(DISTINCT split_key) AS n_groups
             |FROM b
             |GROUP BY 1, 2
             |ORDER BY lang, split""".stripMargin)),

    // ── Temperature-reweighted corpus mix (α-smoothed, materialized) ──────
    // The standard pretraining mixing rule: sample domain i with share
    // ∝ n_i^α (α = 1/2 here) — between natural proportions (α = 1,
    // head domains dominate) and uniform (α = 0, tail domains repeat
    // too often). q72 reports target weights; this one DECIDES, per
    // document: keep iff hash-uniform(doc_id) < p_i where
    // p_i = min(1, share_i · T / n_i) and T is the half-corpus budget.
    // Every input to the decision is exact: weights quantize to
    // integers (round(√n · 10⁶)) so the grand totals are integer sums,
    // and p_i is a fixed dag of correctly-rounded double ops both
    // engines evaluate identically — the keep set hash-matches DuckDB
    // document-for-document, the reproducibility a curation pipeline
    // needs across reruns AND engines. Shape at 100 TB: one group-by
    // for the domain counts (domain-cardinality frame, broadcast
    // back), then a narrow per-row predicate — no shuffle beyond the
    // final small aggregate.
    QueryDef("q173_temperature_mix",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val grp = docs.groupBy("source")
          .agg(count(lit(1)).as("n_docs"))
          .withColumn("w",
            round(sqrt(col("n_docs").cast("double")) * 1e6).cast("long"))
        val tot = grp.agg(sum("w").as("w_total"),
          sum("n_docs").as("n_total"))
        val probs = grp.crossJoin(broadcast(tot))
          .withColumn("p_keep", least(lit(1.0),
            (col("w").cast("double") *
              (col("n_total").cast("double") * lit(0.5))) /
              (col("w_total").cast("double") *
                col("n_docs").cast("double"))))
          .select("source", "n_docs", "p_keep")
        val u = Hashing.md5Long60(
          concat(lit("tmix_"), col("doc_id").cast("string")))
          .cast("double") / lit(1152921504606846976.0) // 2^60
        docs.join(broadcast(probs), "source")
          .filter(u < col("p_keep"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_kept"),
            sum("n_chars").cast("long").as("kept_chars"),
            min("doc_id").as("first_doc"))
          .join(probs, "source")
          .select(col("source"), col("n_docs"), col("n_kept"),
            round(col("p_keep"), 6).as("p_keep_r"),
            col("kept_chars"), col("first_doc"))
          .orderBy("source")
      },
      Some(s"""WITH g AS (
             |  SELECT source, count(*) AS n_docs,
             |         CAST(round(sqrt(CAST(count(*) AS DOUBLE)) * 1000000.0)
             |              AS BIGINT) AS w
             |  FROM documents GROUP BY 1),
             |tot AS (
             |  SELECT CAST(sum(w) AS BIGINT) AS w_total,
             |         CAST(sum(n_docs) AS BIGINT) AS n_total FROM g),
             |probs AS (
             |  SELECT g.source, g.n_docs,
             |         least(CAST(1 AS DOUBLE),
             |           (CAST(g.w AS DOUBLE)
             |              * (CAST(t.n_total AS DOUBLE) * 0.5))
             |           / (CAST(t.w_total AS DOUBLE)
             |              * CAST(g.n_docs AS DOUBLE))) AS p_keep
             |  FROM g CROSS JOIN tot t),
             |kept AS (
             |  SELECT d.source, d.doc_id, d.n_chars
             |  FROM documents d JOIN probs p ON p.source = d.source
             |  WHERE CAST(${Hashing.md5Long60Sql("'tmix_' || doc_id")}
             |             AS DOUBLE) / 1152921504606846976.0 < p.p_keep)
             |SELECT p.source, p.n_docs,
             |       count(*) AS n_kept,
             |       round(p.p_keep, 6) AS p_keep_r,
             |       CAST(sum(k.n_chars) AS BIGINT) AS kept_chars,
             |       min(k.doc_id) AS first_doc
             |FROM kept k JOIN probs p ON p.source = k.source
             |GROUP BY 1, 2, 4
             |ORDER BY p.source""".stripMargin)),

    // ── Token-budget epoch planning (data-constrained mixing math) ───────
    // The planning step BEFORE any mix executes: given a training
    // token budget and per-source weights, how many tokens does each
    // source owe, and how many EPOCHS of its available data is that?
    // Sources needing > 4 epochs get flagged (the data-constrained
    // scaling rule of thumb — Muennighoff et al. 2023: returns decay
    // past ~4 repeats) and their excess demand is visible for
    // re-weighting. All fixed-point integer arithmetic (milli-epochs,
    // ppm weights) so both engines agree exactly. Scale: ONE pass
    // over the corpus for per-source token counts (map-side combine
    // to source cardinality), then the plan math runs on the
    // source-cardinality frame — at 100 TB the expensive part is the
    // count, which is the minimum any planner must pay.
    QueryDef("q219_epoch_budget",
      (s, d) => {
        val budget = 2000000L // total training-token budget
        val toks = tokens(col("text"))
        val avail = Tables.documents(s, d)
          .groupBy("source")
          .agg(sum(size(toks)).cast("long").as("avail_tokens"),
            count(lit(1)).as("n_docs"))
        // weights ∝ sqrt(available) in ppm of the weight total — the
        // q173 temperature rule reused as the DEMAND side
        val w = avail.withColumn("w",
          round(sqrt(col("avail_tokens").cast("double")) * 1e6)
            .cast("long"))
        val tot = w.agg(sum("w").as("w_total"))
        w.crossJoin(broadcast(tot))
          // exact integer floor div (the q226/q228 discipline): w ≈
          // sqrt(avail)·10⁶, so w·budget can pass 2^53 at larger
          // corpora and Column '/' (double div + trunc) would diverge
          // from the oracle's integer '//' — 'div' never floats
          .withColumn("alloc_tokens",
            expr(s"w * ${budget}L div w_total"))
          .withColumn("milli_epochs",
            expr("alloc_tokens * 1000 div avail_tokens"))
          .withColumn("over_budget",
            (col("milli_epochs") > 4000L).cast("int"))
          .withColumn("excess_tokens",
            greatest(lit(0L),
              (col("alloc_tokens") -
                col("avail_tokens") * 4L).cast("long")))
          .select("source", "n_docs", "avail_tokens", "alloc_tokens",
            "milli_epochs", "over_budget", "excess_tokens")
          .orderBy("source")
      },
      Some(s"""WITH avail AS (
             |  SELECT source,
             |         CAST(sum(len($TOKS)) AS BIGINT) AS avail_tokens,
             |         count(*) AS n_docs
             |  FROM documents GROUP BY 1),
             |w AS (
             |  SELECT *, CAST(round(sqrt(CAST(avail_tokens AS DOUBLE))
             |                       * 1000000.0) AS BIGINT) AS w
             |  FROM avail),
             |tot AS (SELECT CAST(sum(w) AS BIGINT) AS w_total FROM w),
             |plan AS (
             |  SELECT source, n_docs, avail_tokens,
             |         w * 2000000 // w_total AS alloc_tokens
             |  FROM w CROSS JOIN tot)
             |SELECT source, n_docs, avail_tokens,
             |       CAST(alloc_tokens AS BIGINT) AS alloc_tokens,
             |       CAST(alloc_tokens * 1000 // avail_tokens AS BIGINT)
             |         AS milli_epochs,
             |       CASE WHEN alloc_tokens * 1000 // avail_tokens > 4000
             |            THEN 1 ELSE 0 END AS over_budget,
             |       CAST(greatest(0, alloc_tokens - avail_tokens * 4)
             |         AS BIGINT) AS excess_tokens
             |FROM plan
             |ORDER BY source""".stripMargin)),

    // ── Deterministic, seekable epoch shuffle (the data-loader order) ────
    // Training runs need a GLOBAL per-epoch shuffle that is (a)
    // deterministic under task retries and re-runs (rand() is
    // neither), (b) different every epoch, and (c) SEEKABLE — resume
    // at step S must reproduce positions [S, n) without replaying
    // [0, S). Position = rank of md5(seed:epoch:doc_id) — a pure
    // function of (seed, epoch, id), so any worker recomputes any
    // slice independently; the oracle recomputes the identical order.
    // The gate pins: sum(pos) == n(n+1)/2 per epoch (a true
    // permutation, no dup/hole), an ORDER-SENSITIVE checksum
    // Σ pos·(doc_id mod 1000003) (epochs must differ: same docs,
    // different order → different checksum — which the two epochs'
    // rows exhibit), and the tail checksum from pos > n/2 (the
    // resume slice, recomputed independently of the head). Scale:
    // ranking is one sort per epoch over (hash, id) — the shuffle a
    // data loader pays once per epoch, nothing quadratic; the seek
    // path is a filter on the computed rank, no state.
    QueryDef("q238_epoch_shuffle",
      (s, d) => {
        val seed = 42
        val epochs = Seq(0, 1)
        val docs = Tables.documents(s, d).select("doc_id")
        // position via the SCALE-tier global rank (range-partitioned
        // sort + per-partition index arithmetic — SurrogateKey's
        // zipIndexed, proven key-identical to ROW_NUMBER), never a
        // single-partition window over the corpus
        val perEpoch = epochs.map { e =>
          val hashed = docs.withColumn("h",
            Hashing.md5Long60(concat(lit(s"$seed:$e:"), col("doc_id"))))
          graft.functions.SurrogateKey
            .zipIndexed(hashed, "pos", Seq(col("h"), col("doc_id")))
            .withColumn("epoch", lit(e)).drop("h")
        }.reduce(_ unionByName _)
        perEpoch
          .withColumn("term",
            col("pos") * (col("doc_id") % 1000003L))
          .withColumn("n",
            count(lit(1)).over(Window.partitionBy("epoch")))
          .groupBy("epoch")
          .agg(count(lit(1)).as("n_docs"),
            sum("pos").cast("long").as("sum_pos"),
            sum("term").cast("long").as("ord_checksum"),
            sum(when(col("pos") * 2 > col("n"), col("term"))
              .otherwise(0L)).cast("long").as("tail_checksum"))
          .orderBy("epoch")
      },
      Some(s"""WITH e AS (SELECT unnest([0, 1]) AS epoch),
             |ord AS (
             |  SELECT epoch, doc_id,
             |         CAST(row_number() OVER (PARTITION BY epoch
             |           ORDER BY ${Hashing.md5Long60Sql(
               "'42:' || epoch || ':' || doc_id")}, doc_id)
             |           AS BIGINT) AS pos,
             |         count(*) OVER (PARTITION BY epoch) AS n
             |  FROM documents CROSS JOIN e),
             |terms AS (
             |  SELECT epoch, pos, n,
             |         pos * (doc_id % 1000003) AS term
             |  FROM ord)
             |SELECT epoch, count(*) AS n_docs,
             |       CAST(sum(pos) AS BIGINT) AS sum_pos,
             |       CAST(sum(term) AS BIGINT) AS ord_checksum,
             |       CAST(sum(CASE WHEN pos * 2 > n THEN term
             |                     ELSE 0 END) AS BIGINT)
             |         AS tail_checksum
             |FROM terms
             |GROUP BY 1
             |ORDER BY epoch""".stripMargin)),

    // ── Bootstrap confidence interval: one pass, B resample replicas ──────
    // "The corpus mean is X" is half an answer at 100 TB — the other
    // half is the uncertainty, and the classical bootstrap (resample N
    // rows B times) is unrunnable at scale. The POISSON BOOTSTRAP
    // (Chamandy et al., Google 2012) gets the same intervals in ONE
    // pass: each row enters replicate b with an independent small
    // random weight of mean 1 — here Binomial(8, 1/8) built from
    // seven-bit slices of the row×replicate hash, so the weights are
    // deterministic, exactly replayable, and integer. Shape: explode
    // B=32 weighted copies → one (replicate)-keyed combine (map-side
    // partials collapse each partition to B cells); the replicate
    // means' order statistics give the percentile CI. Everything
    // integer (milli-cents means via `div`), so the oracle re-derives
    // every weight, every replicate mean, and the interval exactly.
    QueryDef("q251_bootstrap_ci",
      (s, d) => {
        val B = 32
        val cents = round(col("o_totalprice") * 100).cast("long")
        val o = Tables.orders(s, d)
          .select(col("o_orderkey").as("k"), cents.as("cents"))
        val rep = o.select(col("k"), col("cents"),
          explode(typedlit((0L until B.toLong).toSeq)).as("b"))
        val h = Hashing.md5Long60(
          concat(lit("boot_"), col("b"), lit("_"), col("k")))
        // Binomial(8, 1/8): eight 7-bit trials, each succeeds on < 16/128
        val w = (0 until 8).map(j =>
            when(shiftright(h, 7 * j).bitwiseAND(lit(127L)) < 16, 1L)
              .otherwise(0L))
          .reduce(_ + _)
        // collected ONCE (32 rows): the replicate means feed the CI
        // order statistics AND the returned frame — as a LOCAL
        // relation, so the one-pass B=32 combine (the expensive leg)
        // runs exactly once per invocation and nothing stays
        // persisted. (r16 used persist() here but never unpersisted —
        // the 32-row cache pinned executor storage for the rest of a
        // 289-query session; r17, guide §5 "unpersist when done".)
        val repRows = rep
          .select(col("b"), (w * col("cents")).as("wc"), w.as("wn"))
          .groupBy("b")
          .agg(sum("wc").as("sum_wc"), sum("wn").as("n_eff"))
          .withColumn("mean_milli",
            expr("(sum_wc * 1000) div n_eff"))
          .select("b", "n_eff", "mean_milli").collect()
        val ci = repRows.map(_.getLong(2)).sorted
        // percentile CI on the 32 order statistics: ranks 1 and 30
        // (0-indexed) ≈ the 2.5th / 97.5th percentiles
        val point = o.agg(
          expr("(sum(cents) * 1000) div count(*)").as("pm"),
          count(lit(1)).as("n")).head
        import s.implicits._
        repRows.toSeq
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
          .toDF("b", "n_eff", "mean_milli")
          .withColumn("point_mean_milli", lit(point.getLong(0)))
          .withColumn("n_rows", lit(point.getLong(1)))
          .withColumn("ci_lo_milli", lit(ci(1)))
          .withColumn("ci_hi_milli", lit(ci(30)))
          .orderBy("b")
      },
      Some(s"""WITH o AS (
             |  SELECT o_orderkey AS k,
             |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
             |  FROM orders),
             |rep AS (
             |  SELECT k, cents, b.b,
             |         ${Hashing.md5Long60Sql(
                "'boot_' || b.b || '_' || k")} AS h
             |  FROM o CROSS JOIN (SELECT unnest(range(32)) AS b) b),
             |w AS MATERIALIZED (
             |  SELECT b, cents,
             |         ${(0 until 8).map(j =>
                s"(CASE WHEN ((h >> ${7 * j}) & 127) < 16 " +
                  "THEN 1 ELSE 0 END)").mkString(" + ")} AS w
             |  FROM rep),
             |reps AS MATERIALIZED (
             |  SELECT b, CAST(sum(w * cents) AS BIGINT) AS sum_wc,
             |         CAST(sum(w) AS BIGINT) AS n_eff
             |  FROM w GROUP BY 1),
             |m AS MATERIALIZED (
             |  SELECT b, n_eff, (sum_wc * 1000) // n_eff AS mean_milli
             |  FROM reps),
             |ranked AS (
             |  SELECT mean_milli,
             |         row_number() OVER (ORDER BY mean_milli) AS r
             |  FROM m),
             |ci AS (
             |  SELECT max(CASE WHEN r = 2 THEN mean_milli END) AS lo,
             |         max(CASE WHEN r = 31 THEN mean_milli END) AS hi
             |  FROM ranked),
             |pt AS (
             |  SELECT (CAST(sum(cents) AS BIGINT) * 1000) // count(*)
             |           AS pm,
             |         count(*) AS n FROM o)
             |SELECT m.b, m.n_eff, m.mean_milli,
             |       pt.pm AS point_mean_milli, pt.n AS n_rows,
             |       ci.lo AS ci_lo_milli, ci.hi AS ci_hi_milli
             |FROM m, ci, pt
             |ORDER BY b""".stripMargin))
  )
}
