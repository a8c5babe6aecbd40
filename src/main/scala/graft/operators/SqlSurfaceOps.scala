package graft.operators

import org.apache.spark.sql.functions.col

import graft.plans.GraftFunctions
import graft.sources.{QueryDef, Tables}

/** The SQL surface exercised end-to-end in the correctness gate: the
  * query text goes through `spark.sql(...)` against the injected graft
  * functions ([[graft.plans.GraftExtensions]]) — proving a SQL-only
  * client (thrift server, notebook SQL cell) gets the same native
  * codegen kernels and the same answers as the DataFrame API.
  *
  * The reference's entire user surface is SQL (every script under
  * reference scripts/analysis/ is a plain query), so "a user of the
  * reference could switch" requires this path to be first-class, not
  * just the Scala API.
  */
object SqlSurfaceOps {

  val queries: Seq[QueryDef] = Seq(
    // ── Text kernels through spark.sql ────────────────────────────────────
    // Same counting semantics as q30/q32 (the oracle states the regex
    // formulations TextKernelSpec proves equivalent); what's new under
    // test is the resolution path: SQL string → FunctionRegistry →
    // TextStat expression → whole-stage codegen.
    QueryDef("q89_sql_text_stats",
      (s, d) => {
        GraftFunctions.register(s)
        Tables.documents(s, d).select("doc_id", "text")
          .createOrReplaceTempView("graft_sql_documents")
        s.sql("""SELECT doc_id,
                |       graft_token_count(text) AS n_tokens,
                |       graft_alnum_count(text) AS n_alnum,
                |       graft_punct_count(text) AS n_punct,
                |       graft_bpe_count(text)   AS n_pieces
                |FROM graft_sql_documents
                |ORDER BY doc_id""".stripMargin)
      },
      Some("""SELECT doc_id,
             |  CAST(len(list_filter(string_split_regex(lower(text),
             |    '[^a-z0-9]+'), t -> t != '')) AS INT) AS n_tokens,
             |  CAST(length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'))
             |    AS INT) AS n_alnum,
             |  CAST(length(regexp_replace(text, '[a-zA-Z0-9\s]', '', 'g'))
             |    AS INT) AS n_punct,
             |  CAST(len(regexp_extract_all(text,
             |    '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS INT) AS n_pieces
             |FROM documents
             |ORDER BY doc_id""".stripMargin)),

    // ── Vector kernel through spark.sql ───────────────────────────────────
    // graft_vector_dot in a SQL self-join: each vector's dot with the
    // corpus centroid-of-first-8 (tiny broadcast side built in SQL too).
    // Summation order is ascending-index in both engines, so the double
    // sums hash-match without rounding.
    QueryDef("q90_sql_vector_dot",
      (s, d) => {
        GraftFunctions.register(s)
        Tables.embeddings(s, d).select("vec_id", "embedding")
          .createOrReplaceTempView("graft_sql_embeddings")
        s.sql("""SELECT vec_id,
                |       graft_vector_dot(embedding, embedding) AS norm_sq
                |FROM graft_sql_embeddings
                |WHERE vec_id % 50 = 0
                |ORDER BY vec_id""".stripMargin)
      },
      Some("""SELECT vec_id,
             |       list_sum(list_transform(range(1, 65),
             |         i -> CAST(embedding[i] AS DOUBLE)
             |              * CAST(embedding[i] AS DOUBLE))) AS norm_sq
             |FROM embeddings
             |WHERE vec_id % 50 = 0
             |ORDER BY vec_id""".stripMargin)),

    // ── Textbook SQL auto-accelerated by the rewrite rules ────────────────
    // The query text below names NO graft function — it is the plain
    // regex/aggregate formulation any SQL user would write. register()
    // installs TextStatRewrite/VectorDotRewrite on the live session
    // (spark.experimental.extraOptimizations), so the plan that runs is
    // the kernel plan (GraftExtensionsSpec asserts the rewrite; this
    // row proves VALUES are unchanged under it, in the gate).
    QueryDef("q96_sql_rewritten",
      (s, d) => {
        GraftFunctions.register(s)
        Tables.documents(s, d).select("doc_id", "text")
          .createOrReplaceTempView("graft_sql_documents")
        s.sql("""SELECT doc_id,
                |  length(regexp_replace(lower(text), '[^a-z0-9]', '')) AS n_alnum,
                |  length(regexp_replace(text, '[a-zA-Z0-9\\s]', '')) AS n_punct,
                |  regexp_count(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]') AS n_pieces
                |FROM graft_sql_documents
                |ORDER BY doc_id""".stripMargin)
      },
      Some("""SELECT doc_id,
             |  CAST(length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'))
             |    AS INT) AS n_alnum,
             |  CAST(length(regexp_replace(text, '[a-zA-Z0-9\s]', '', 'g'))
             |    AS INT) AS n_punct,
             |  CAST(len(regexp_extract_all(text,
             |    '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS INT) AS n_pieces
             |FROM documents
             |ORDER BY doc_id""".stripMargin))
  )
}
