"""Full-text relevance scoring over the documents table: BM25 ranked
retrieval and per-document TF-IDF keyword extraction — the retrieval /
keyword layer of a corpus pipeline (and of RAG indexing).

Engine-neutrality rules used throughout (see functions/numeric.py):
- ln() differs between Java's Math.log and DuckDB's libm in the last
  ulp (~8% of arguments empirically), so every ln result is cast to
  DECIMAL(20,6) immediately — identical HALF_UP rounding both sides —
  before any further arithmetic.
- multi-term score sums go through DECIMAL (order-independent), never
  a raw double SUM.
- counts (tf, df, dl, N) are integers, exact in both engines.

Scale shape: the only shuffles are the (doc, term) tf aggregate and
the final top-k (TakeOrdered, no global sort materialization). df and
the corpus stats reduce to term-cardinality / single-row relations and
broadcast. At 100 TB the explode→filter keeps ONLY query terms, so
the tf shuffle carries |query_terms| rows per doc at most.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from uber_data_pipeline_spark.functions.text import TOKENS_DUCK, TOKENS_SPARK

BM25_K1 = 1.2
BM25_B = 0.75
BM25_QUERY_TERMS = ("spark", "table", "merge", "window")
BM25_TOPK = 20
TFIDF_TERMS_PER_DOC = 3
TFIDF_MIN_DF = 2

# ln rounded in decimal: round(double, k) itself diverges between the
# engines on .5 boundaries; double -> DECIMAL cast is HALF_UP in both.
_LN6 = "CAST(CAST(ln({x}) AS decimal(20,6)) AS double)"


def bm25_scores(
    docs: DataFrame,
    query_terms: tuple[str, ...] = BM25_QUERY_TERMS,
    k: int = BM25_TOPK,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Top-k documents for ``query_terms`` by BM25 (Robertson et al.):

        score(d) = sum over matched terms of
            idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))
        idf(t)   = ln((N - df + 0.5) / (df + 0.5) + 1)

    Pipeline: one narrow pass computes per-doc length; the exploded
    token stream is filtered to the query terms BEFORE the tf
    aggregate (so the shuffle is bounded by |terms| rows per doc); df
    and (N, avgdl) reduce to tiny broadcast relations. Per-term scores
    are rounded to decimal(20,9) and decimal-summed — order-free."""
    terms_sql = ", ".join(f"'{t}'" for t in query_terms)
    lens = docs.selectExpr("doc_id", f"size({TOKENS_SPARK}) AS dl")
    stats = lens.selectExpr(
        "count(*) AS n_docs",
        # ints -> double division: deterministic in both engines
        "CAST(sum(dl) AS double) / count(*) AS avgdl",
    )
    tf = (
        docs.selectExpr("doc_id", f"explode({TOKENS_SPARK}) AS token")
        .filter(F.expr(f"token IN ({terms_sql})"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("token").agg(F.count("*").alias("df"))
    idf = df.crossJoin(F.broadcast(stats.select("n_docs"))).selectExpr(
        "token",
        _LN6.format(x="(n_docs - df + 0.5) / (df + 0.5) + 1") + " AS idf",
    )
    term_scores = (
        tf.join(F.broadcast(idf), "token")
        .join(lens, "doc_id")
        .crossJoin(F.broadcast(stats.select("avgdl")))
        .selectExpr(
            "doc_id",
            f"CAST(idf * (tf * ({k1} + 1.0)) / "
            f"(tf + {k1} * (1.0 - {b} + {b} * dl / avgdl)) "
            "AS decimal(20,9)) AS term_score",
        )
    )
    return (
        term_scores.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_terms_matched"),
            F.round(F.sum("term_score"), 6).cast("double").alias("bm25"),
        )
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(k)
    )


def sql_bm25(
    query_terms: tuple[str, ...] = BM25_QUERY_TERMS,
    k: int = BM25_TOPK,
    k1: float = BM25_K1,
    b: float = BM25_B,
    tokens: str = "string_split(text, ' ')",
) -> str:
    """The DuckDB twin of :func:`bm25_scores` (same column names)."""
    terms_sql = ", ".join(f"'{t}'" for t in query_terms)
    ln6 = "CAST(CAST(ln({x}) AS DECIMAL(20,6)) AS DOUBLE)"
    return f"""
        WITH lens AS (
            SELECT doc_id, CAST(len({tokens}) AS INT) AS dl FROM documents
        ), stats AS (
            SELECT COUNT(*) AS n_docs,
                   CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
            FROM lens
        ), tf AS (
            SELECT doc_id, t.token, COUNT(*) AS tf
            FROM (SELECT doc_id, {tokens} AS tokens FROM documents),
                 unnest(tokens) AS t(token)
            WHERE t.token IN ({terms_sql})
            GROUP BY 1, 2
        ), df AS (
            SELECT token, COUNT(*) AS df FROM tf GROUP BY 1
        ), idf AS (
            SELECT token,
                   {ln6.format(x="(s.n_docs - df + 0.5) / (df + 0.5) + 1")} AS idf
            FROM df, stats s
        ), term_scores AS (
            SELECT tf.doc_id,
                   CAST(idf * (tf * ({k1} + 1.0)) /
                        (tf + {k1} * (1.0 - {b} + {b} * dl / avgdl))
                        AS DECIMAL(20,9)) AS term_score
            FROM tf
            JOIN idf USING (token)
            JOIN lens USING (doc_id)
            CROSS JOIN stats
        )
        SELECT doc_id,
               COUNT(*) AS n_terms_matched,
               CAST(ROUND(SUM(term_score), 6) AS DOUBLE) AS bm25
        FROM term_scores
        GROUP BY doc_id
        ORDER BY bm25 DESC, doc_id ASC
        LIMIT {k}
    """


def tfidf_top_terms(
    docs: DataFrame,
    terms_per_doc: int = TFIDF_TERMS_PER_DOC,
    min_df: int = TFIDF_MIN_DF,
) -> DataFrame:
    """Top TF-IDF terms per document (keyword extraction):
    tfidf = tf * ln(N / df), ranked per doc, rank <= ``terms_per_doc``
    (ties broken by token asc; tfidf compared AFTER decimal rounding
    so rank boundaries are engine-identical).

    ``min_df`` drops hapax noise. One (doc, token) tf aggregate, one
    token df aggregate (broadcast back), one per-doc rank window —
    partitioned by doc_id, never global."""
    toks = docs.selectExpr("doc_id", f"explode({TOKENS_SPARK}) AS token")
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df = tf.groupBy("token").agg(F.count("*").alias("df")).filter(
        F.col("df") >= min_df
    )
    n_docs = docs.selectExpr("count(*) AS n_docs")
    scored = (
        tf.join(F.broadcast(df), "token")
        .crossJoin(F.broadcast(n_docs))
        .selectExpr(
            "doc_id",
            "token",
            "tf",
            "df",
            "CAST(CAST(tf * " + _LN6.format(x="CAST(n_docs AS double) / df")
            + " AS decimal(20,6)) AS double) AS tfidf",
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf"), F.asc("token")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= terms_per_doc)
        .select("doc_id", "token", "tf", "df", "tfidf", "rank")
    )


def sql_tfidf(
    terms_per_doc: int = TFIDF_TERMS_PER_DOC,
    min_df: int = TFIDF_MIN_DF,
    tokens: str = "string_split(text, ' ')",
) -> str:
    """DuckDB twin of :func:`tfidf_top_terms`."""
    ln6 = "CAST(CAST(ln({x}) AS DECIMAL(20,6)) AS DOUBLE)"
    return f"""
        WITH tf AS (
            SELECT doc_id, t.token, COUNT(*) AS tf
            FROM (SELECT doc_id, {tokens} AS tokens FROM documents),
                 unnest(tokens) AS t(token)
            GROUP BY 1, 2
        ), df AS (
            SELECT token, COUNT(*) AS df FROM tf GROUP BY 1
            HAVING COUNT(*) >= {min_df}
        ), nd AS (SELECT COUNT(*) AS n_docs FROM documents),
        scored AS (
            SELECT doc_id, token, tf, df,
                   CAST(CAST(tf * {ln6.format(x="CAST(n_docs AS DOUBLE) / df")}
                        AS DECIMAL(20,6)) AS DOUBLE) AS tfidf
            FROM tf JOIN df USING (token), nd
        ), ranked AS (
            SELECT doc_id, token, tf, df, tfidf,
                   CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                        ORDER BY tfidf DESC, token ASC) AS INT) AS rank
            FROM scored
        )
        SELECT doc_id, token, tf, df, tfidf, rank
        FROM ranked WHERE rank <= {terms_per_doc}
    """


# ------------------------------------------------------- inverted index

INDEX_MIN_DF = 2
INDEX_POSTING_HEAD = 5


def inverted_index(
    docs: DataFrame,
    min_df: int = INDEX_MIN_DF,
    head: int = INDEX_POSTING_HEAD,
) -> DataFrame:
    """Build the term dictionary + posting-list heads of an inverted
    index: per token its document frequency, total term frequency, and
    the top-`head` posting entries by (tf desc, doc_id) — the
    retrieval index a BM25 searcher probes.

    Scale shape: the (token, doc) tf aggregate partial-combines
    map-side on the exploded tokens; the posting-head selection is a
    per-token top-k over ALREADY count-reduced rows (rank window keyed
    by token, k rows survive per token), so memory per reducer is
    bounded by df, never raw occurrences; the dictionary aggregate
    reduces to vocab-cardinality rows. Posting heads serialize as a
    comma-joined string so the result frame is flat-typed (the full
    postings would shard by (token, bucket) at 100 TB)."""
    toks = docs.selectExpr("doc_id", f"explode({TOKENS_SPARK}) AS token")
    tf = toks.groupBy("token", "doc_id").agg(F.count("*").alias("tf"))
    dictionary = tf.groupBy("token").agg(
        F.count("*").alias("df"),
        F.sum("tf").alias("total_tf"),
    )
    w = Window.partitionBy("token").orderBy(F.desc("tf"), F.asc("doc_id"))
    heads = (
        tf.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= head)
        .groupBy("token")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("rn"), F.col("doc_id")))
                    ),
                    lambda x: x.doc_id.cast("string"),
                ),
            ).alias("top_docs")
        )
    )
    return (
        dictionary.filter(F.col("df") >= min_df)
        .join(heads, "token")
        .select("token", "df", "total_tf", "top_docs")
    )


def sql_inverted_index(
    min_df: int = INDEX_MIN_DF, head: int = INDEX_POSTING_HEAD
) -> str:
    """DuckDB twin of :func:`inverted_index`."""
    return f"""
        WITH toks AS (
            SELECT doc_id, t.token
            FROM (SELECT doc_id, {TOKENS_DUCK} AS tokens FROM documents),
                 unnest(tokens) AS t(token)
        ), tf AS (
            SELECT token, doc_id, COUNT(*) AS tf FROM toks GROUP BY 1, 2
        ), dict AS (
            SELECT token, COUNT(*) AS df, CAST(SUM(tf) AS BIGINT) AS total_tf
            FROM tf GROUP BY 1
        ), ranked AS (
            SELECT token, doc_id, tf, ROW_NUMBER() OVER (
                PARTITION BY token ORDER BY tf DESC, doc_id) AS rn
            FROM tf
        ), heads AS (
            SELECT token,
                   string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY rn)
                       AS top_docs
            FROM ranked WHERE rn <= {head}
            GROUP BY 1
        )
        SELECT token, df, total_tf, top_docs
        FROM dict JOIN heads USING (token)
        WHERE df >= {min_df}
    """


# ---- hybrid lexical + vector retrieval (RRF) --------------------------

RRF_C = 60
HYBRID_TOPK = 10
HYBRID_CAND_K = 20
HYBRID_QUERY_VEC = 42
_RRF_UNIT = 1_000_000_000_000  # integer RRF: 1e12 DIV (c + rank)


def vector_topk(emb: DataFrame, query_vec_id: int, k: int) -> DataFrame:
    """Top-k vectors by cosine to one query vector (query-by-example):
    the 1-row query embedding broadcasts onto the corpus scan — the
    brute-force baseline shape; swap the scan for the IVF/SRP
    candidate set at corpus scale (operators/similarity.py), the
    ranking epilogue is identical."""
    from uber_data_pipeline_spark.functions.vectors import cosine_spark

    q = emb.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qv")
    )
    return (
        emb.filter(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(q))
        .selectExpr(
            "vec_id", f"{cosine_spark('embedding', 'qv')} AS cosine"
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def hybrid_rrf_search(
    docs: DataFrame,
    emb: DataFrame,
    query_vec_id: int = HYBRID_QUERY_VEC,
    cand_k: int = HYBRID_CAND_K,
    topk: int = HYBRID_TOPK,
    c: int = RRF_C,
) -> DataFrame:
    """Hybrid retrieval by reciprocal-rank fusion: the BM25 lexical
    ranking and the vector (cosine) ranking each nominate their
    top-``cand_k``; fused score = sum over rankings present of
    1e12 DIV (c + rank) — the standard RRF with the division kept in
    EXACT INTEGER micro-units so the fused order (and the oracle
    hash) is engine-stable. vec_id == doc_id row-for-row in the
    testdata lake (one embedding per document).

    Scale shape: both rankings end in TakeOrdered(cand_k); ranks are
    row_numbers over those LIMIT-bounded 20-row relations (not the
    corpus); the fusion is a tiny full-outer join. The expensive
    parts — BM25's bounded term shuffle, the ANN candidate scan —
    keep their own documented plans."""
    from pyspark.sql import Window

    lex = bm25_scores(docs, k=cand_k).select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("bm25"), F.asc("doc_id")))
        .alias("lex_rank"),
    )
    vec = vector_topk(emb, query_vec_id, cand_k).select(
        F.col("vec_id").alias("doc_id"),
        F.row_number()
        .over(Window.orderBy(F.desc("cosine"), F.asc("vec_id")))
        .alias("vec_rank"),
    )
    return (
        lex.join(vec, "doc_id", "full_outer")
        .selectExpr(
            "doc_id",
            "lex_rank",
            "vec_rank",
            f"coalesce({_RRF_UNIT} DIV ({c} + lex_rank), 0) "
            f"+ coalesce({_RRF_UNIT} DIV ({c} + vec_rank), 0) AS rrf_score",
        )
        .orderBy(F.desc("rrf_score"), F.asc("doc_id"))
        .limit(topk)
    )


def sql_hybrid_rrf(
    query_vec_id: int = HYBRID_QUERY_VEC,
    cand_k: int = HYBRID_CAND_K,
    topk: int = HYBRID_TOPK,
    c: int = RRF_C,
) -> str:
    """DuckDB twin of :func:`hybrid_rrf_search`."""
    from uber_data_pipeline_spark.functions.vectors import cosine_duck

    return f"""
        WITH lex AS (
            SELECT doc_id,
                   ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS lex_rank
            FROM ({sql_bm25(k=cand_k)})
        ), vq AS (
            SELECT embedding AS qv FROM embeddings
            WHERE vec_id = {query_vec_id}
        ), vec AS (
            SELECT vec_id AS doc_id,
                   ROW_NUMBER() OVER (ORDER BY cosine DESC, vec_id)
                       AS vec_rank
            FROM (
                SELECT vec_id,
                       {cosine_duck('embedding', 'qv')} AS cosine
                FROM embeddings, vq
                WHERE vec_id != {query_vec_id}
                ORDER BY cosine DESC, vec_id
                LIMIT {cand_k}
            )
        )
        SELECT COALESCE(lex.doc_id, vec.doc_id) AS doc_id,
               lex_rank, vec_rank,
               COALESCE({_RRF_UNIT} // ({c} + lex_rank), 0)
               + COALESCE({_RRF_UNIT} // ({c} + vec_rank), 0) AS rrf_score
        FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id
        ORDER BY rrf_score DESC, doc_id
        LIMIT {topk}
    """
