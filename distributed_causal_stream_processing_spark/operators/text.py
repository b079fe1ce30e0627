"""Text-analysis operators for training-data pipelines (SURVEY §2.10 +
brief extras: language-ID, quality scoring, token counting, document
fingerprinting).

Everything is built-in-expression only (split / explode / filter /
regexp / md5 — JVM-side, codegen'd; no Python UDFs). At 100 TB:
tokenize-and-aggregate pipelines are embarrassingly parallel; the only
shuffles are the final small aggregations (per-word counts, per-lang
stats).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

from distributed_causal_stream_processing_spark.functions.hashing import hex_u32_sql
from distributed_causal_stream_processing_spark.io import load
from distributed_causal_stream_processing_spark.plans.registry import query

# Tiny deterministic per-language marker lists for the heuristic
# language-ID scorer. The fixture vocabulary is English-ish; the oracle
# checks the *mechanism* (token-overlap scoring + argmax with a
# deterministic alphabetical tie-break), not linguistic accuracy.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "und", "nicht"),
    "en": ("the", "a", "and", "of"),
    "es": ("el", "la", "los", "que"),
    "fr": ("le", "la", "les", "des"),
    "zh": ("zhe", "shi", "bu", "le"),
}
STOPWORDS = ("the", "a", "and", "of")


@query(
    "q_text_wordcount",
    oracle="""
    SELECT word, CAST(count(*) AS BIGINT) AS n,
           CAST(row_number() OVER (ORDER BY count(*) DESC, word ASC) AS BIGINT) AS rnk
    FROM (
        SELECT unnest(string_split(lower(text), ' ')) AS word
        FROM documents
    )
    GROUP BY word
    ORDER BY n DESC, word ASC
    LIMIT 20
    """,
)
def q_text_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic wordcount: tokenize → explode → count → top 20."""
    d = load(spark, sf_dir, "documents")
    counts = (
        d.select(F.explode(F.split(F.lower("text"), " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # top-20 FIRST via TakeOrderedAndProject (k rows per partition at
    # any scale), THEN rank the 20 survivors — the rank window's input
    # is bounded at k rows, never the vocabulary (the naive
    # rank-then-limit form windows the full vocab in one task)
    w = W.orderBy(F.desc("n"), F.asc("word"))
    return (
        counts.orderBy(F.desc("n"), F.asc("word"))
        .limit(20)
        .select("word", "n", F.row_number().over(w).cast("bigint").alias("rnk"))
    )


@query(
    "q_text_stats",
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           floor(avg(n_chars) * 100) / 100 AS avg_chars,
           CAST(min(length(text)) AS BIGINT) AS min_len,
           CAST(max(length(text)) AS BIGINT) AS max_len,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources
    FROM documents
    GROUP BY lang
    """,
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus stats."""
    d = load(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.floor(F.avg("n_chars") * 100) / 100).alias("avg_chars"),
        F.min(F.length("text")).cast("bigint").alias("min_len"),
        F.max(F.length("text")).cast("bigint").alias("max_len"),
        F.countDistinct("source").alias("n_sources"),
    )


_STOP_IN = ", ".join(f"'{s}'" for s in STOPWORDS)


def floor6(x):
    """floor4's 6-dp sibling — same tie-free rationale for the
    rational ratios quantized at 6 dp (review find, round 9: dyadic
    shares like 9/128 = 0.0703125 land exactly on the 6-dp half-grid,
    where Spark HALF_UPs and DuckDB rints)."""
    return F.floor(x * 1000000) / 1000000


def floor4(x):
    """Tie-free 4-dp quantization by floor-scaling. round(x, 4) is the
    cross-engine killer on this formula's value domain: token counts
    like 16/32 make dyadic ratios that land EXACTLY on the 4-dp
    half-grid (e.g. 0.72925), where Spark HALF_UPs and DuckDB rints —
    SURVEY §7.4. floor of the identical double product cannot tie."""
    return F.floor(x * 10000) / 10000


def with_quality_score(d: DataFrame) -> DataFrame:
    """Append the quality-signal columns to any DataFrame with a
    ``text`` column — pure stateless column expressions, so the same
    code runs over a batch scan or a readStream (used by the streaming
    quality-filter pipeline in tests/test_streaming.py)."""
    toks = F.split("text", " ")
    n_tokens = F.size(toks).cast("double")
    n_distinct = F.size(F.array_distinct(toks)).cast("double")
    n_letters = F.length(F.regexp_replace("text", " ", "")).cast("double")
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).cast("double")
    quality = (
        0.4 * (n_distinct / n_tokens)
        + 0.3 * F.least(n_tokens / 100.0, F.lit(1.0))
        + 0.3 * (1.0 - n_stop / n_tokens)
    )
    return (
        d.withColumn("n_tokens", n_tokens.cast("bigint"))
        .withColumn("distinct_ratio", floor4(n_distinct / n_tokens))
        .withColumn("avg_token_len", floor4(n_letters / n_tokens))
        .withColumn("stopword_ratio", floor4(n_stop / n_tokens))
        .withColumn("quality_score", floor4(quality))
    )


@query(
    "q_text_quality",
    oracle=f"""
    WITH feat AS (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tokens,
               CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) AS n_distinct,
               CAST(length(replace(text, ' ', '')) AS DOUBLE) AS n_letters,
               CAST(len(list_filter(string_split(text, ' '),
                                    t -> t IN ({_STOP_IN}))) AS DOUBLE) AS n_stop
        FROM documents
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           floor((n_distinct / n_tokens) * 10000) / 10000 AS distinct_ratio,
           floor((n_letters / n_tokens) * 10000) / 10000 AS avg_token_len,
           floor((n_stop / n_tokens) * 10000) / 10000 AS stopword_ratio,
           floor((0.4 * (n_distinct / n_tokens)
                  + 0.3 * least(n_tokens / 100.0, 1.0)
                  + 0.3 * (1.0 - n_stop / n_tokens)) * 10000) / 10000
               AS quality_score
    FROM feat
    """,
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality score: length + lexical diversity + stopword mix.

    The standard cheap pre-filter stage of a training-data pipeline —
    pure column expressions, linear scan, no shuffle at all.
    """
    return with_quality_score(load(spark, sf_dir, "documents")).select(
        "doc_id",
        "n_tokens",
        "distinct_ratio",
        "avg_token_len",
        "stopword_ratio",
        "quality_score",
    )


def _lang_score_sql(markers: tuple[str, ...]) -> str:
    in_list = ", ".join(f"'{m}'" for m in markers)
    return f"len(list_filter(string_split(text, ' '), t -> t IN ({in_list})))"


_LANG_SCORES = ", ".join(
    f"{_lang_score_sql(m)} AS s_{lang}" for lang, m in sorted(LANG_MARKERS.items())
)
_LANG_MAX = "greatest(" + ", ".join(f"s_{la}" for la in sorted(LANG_MARKERS)) + ")"
_LANG_PICK = (
    "CASE "
    + " ".join(f"WHEN s_{la} = m THEN '{la}'" for la in sorted(LANG_MARKERS))
    + " END"
)


@query(
    "q_text_langid",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, lang, {_LANG_SCORES} FROM documents
    ),
    m AS (SELECT *, {_LANG_MAX} AS m FROM scored)
    SELECT doc_id, lang AS labeled_lang, {_LANG_PICK} AS predicted_lang,
           CAST(m AS BIGINT) AS marker_hits
    FROM m
    """,
)
def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language-ID: marker-token overlap, argmax with
    alphabetical tie-break. Linear scan, no shuffle."""
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")

    def marker_filter(markers):
        # closure, not a default arg: a 2-arg lambda would make F.filter
        # pass the element *index* as the second argument
        return lambda t: t.isin(*markers)

    scores = {
        lang: F.size(F.filter(toks, marker_filter(markers)))
        for lang, markers in sorted(LANG_MARKERS.items())
    }
    m = F.greatest(*scores.values())
    expr = None
    for lang in sorted(LANG_MARKERS):
        cond = scores[lang] == m
        expr = F.when(cond, lang) if expr is None else expr.when(cond, lang)
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        expr.alias("predicted_lang"),
        m.cast("bigint").alias("marker_hits"),
    )


@query(
    "q_text_tokens",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
           CAST(len(regexp_extract_all(text, '[a-z]{1,4}', 0)) AS BIGINT) AS n_subwords,
           CAST(ceil(length(replace(text, ' ', '')) / 4.0) AS BIGINT) AS est_bpe_tokens
    FROM documents
    """,
)
def q_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens, BPE-ish greedy ≤4-char
    subword chunks (regex), and a chars/4 estimator."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("n_ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit("[a-z]{1,4}"), 0))
        .cast("bigint")
        .alias("n_subwords"),
        F.ceil(F.length(F.regexp_replace("text", " ", "")) / 4.0)
        .cast("bigint")
        .alias("est_bpe_tokens"),
    )


@query(
    "q_text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
               AS vocab_fp,
           substring(md5(text), 1, 8) AS content_fp8
    FROM documents
    """,
)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints: order-insensitive vocabulary fingerprint
    (sorted distinct tokens → md5) + short exact-content fingerprint.
    The vocab fingerprint buckets bag-of-words duplicates that exact
    md5 misses — a cheap dedup key between exact and MinHash."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5(F.array_join(F.sort_array(F.array_distinct(F.split("text", " "))), " ")).alias(
            "vocab_fp"
        ),
        F.substring(F.md5("text"), 1, 8).alias("content_fp8"),
    )




@query(
    "q_pipeline_training_data",
    oracle=f"""
    WITH feat AS (
        SELECT doc_id, lang, text,
               CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tokens,
               CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                   AS n_distinct,
               CAST(len(list_filter(string_split(text, ' '),
                                    t -> t IN ({_STOP_IN}))) AS DOUBLE) AS n_stop
        FROM documents
    ),
    scored AS (
        SELECT *,
               floor((0.4 * (n_distinct / n_tokens)
                      + 0.3 * least(n_tokens / 100.0, 1.0)
                      + 0.3 * (1.0 - n_stop / n_tokens)) * 10000) / 10000
                   AS quality_score
        FROM feat
    ),
    kept AS (
        SELECT * FROM scored WHERE quality_score >= 0.5 AND n_tokens >= 20
    ),
    deduped AS (
        SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM kept
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CAST(n_tokens AS BIGINT)) AS BIGINT) AS total_tokens,
           floor(avg(quality_score) * 10000) / 10000 AS avg_quality
    FROM deduped WHERE rn = 1
    GROUP BY lang
    """,
)
def q_pipeline_training_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data pipeline: quality-filter → exact dedup →
    per-language corpus stats, composed from the same primitives the
    standalone operators use — one declarative plan, so Catalyst fuses
    the scan/filter/score into a single stage and the only shuffles are
    the dedup hash partition and the final tiny aggregation. At 100 TB
    this is the shape of a real corpus build; swap the exact-dedup
    stage for the MinHash rep (q_minhash_lsh) for near-dup semantics.
    """
    d = load(spark, sf_dir, "documents")
    # the canonical scorer (with_quality_score) — ONE copy of the
    # load-bearing formula, shared with q_text_quality and the
    # streaming quality filter (review find, round 9: an inline copy
    # here could silently drift from the standalone operators)
    scored = with_quality_score(d).select(
        "doc_id", "lang", "text", "n_tokens", "quality_score"
    )
    kept = scored.filter((F.col("quality_score") >= 0.5) & (F.col("n_tokens") >= 20))
    wd = W.partitionBy(F.md5("text")).orderBy("doc_id")
    deduped = kept.withColumn("rn", F.row_number().over(wd)).filter(F.col("rn") == 1)
    return deduped.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("n_tokens").cast("bigint")).alias("total_tokens"),
        floor4(F.avg("quality_score")).alias("avg_quality"),
    )


@query(
    "q_text_tfidf",
    oracle="""
    WITH docs AS (
        SELECT doc_id, string_split(text, ' ') AS toks
        FROM documents WHERE doc_id < 100
    ),
    terms AS (
        SELECT doc_id, unnest(toks) AS tok, len(toks) AS doc_len FROM docs
    ),
    tf AS (
        SELECT doc_id, tok, doc_len, count(*) AS n
        FROM terms GROUP BY doc_id, tok, doc_len
    ),
    df AS (
        SELECT tok, count(DISTINCT doc_id) AS df FROM terms GROUP BY tok
    ),
    n AS (SELECT count(*) AS n_docs FROM docs),
    scored AS (
        SELECT tf.doc_id, tf.tok,
               round((CAST(tf.n AS DOUBLE) / tf.doc_len)
                     * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
        FROM tf JOIN df USING (tok) CROSS JOIN n
    )
    SELECT doc_id, tok, tfidf,
           CAST(rn AS BIGINT) AS rnk
    FROM (
        SELECT *, row_number() OVER (
                   PARTITION BY doc_id ORDER BY tfidf DESC, tok) AS rn
        FROM scored
    )
    WHERE rn <= 3
    """,
)
def q_text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by TF-IDF (doc_id<100
    slice). tf = term count / doc length; idf = ln(N / df).

    Scale: two hash-aggregations (term counts per doc; document
    frequency per term) and one join on the term key — the classic
    inverted-index build. The corpus size N is a 1-row broadcast, and
    scores are rounded to 6 dp BEFORE ranking so the top-3 cutoff is
    decided on identical numbers in both engines (unrounded float
    ordering across engines is not stable under reassociation).
    """
    d = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 100)
        .select("doc_id", F.split("text", " ").alias("toks"))
    )
    terms = d.select("doc_id", F.size("toks").alias("doc_len"), F.explode("toks").alias("tok"))
    tf = terms.groupBy("doc_id", "tok", "doc_len").agg(F.count(F.lit(1)).alias("n"))
    dfreq = terms.groupBy("tok").agg(F.count_distinct("doc_id").alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "tok")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "tok",
            F.round(
                (F.col("n").cast("double") / F.col("doc_len"))
                * F.log(F.col("n_docs").cast("double") / F.col("df")),
                6,
            ).alias("tfidf"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("tok"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "tok", "tfidf", "rnk")
    )


# Deterministic hash-based sampling: the sample membership is a pure
# function of doc_id (md5-derived u32 mod 10), so both engines — and
# any two cluster runs — select the exact same rows. This is the
# reproducible-training-subset primitive; seeded rand() sampling is
# engine-specific and non-portable.
_SAMPLE_BUCKET = "(" + hex_u32_sql("md5(concat('smp', doc_id))") + ") % 10"

_SHUFFLE_KEY = hex_u32_sql("md5(concat('shuf42-', doc_id))")


@query(
    "q_shuffle_deterministic",
    oracle=f"""
    SELECT doc_id,
           CAST(({_SHUFFLE_KEY}) AS BIGINT) AS shuffle_key,
           CAST(({_SHUFFLE_KEY}) % 8 AS BIGINT) AS shard
    FROM documents
    ORDER BY shuffle_key, doc_id
    """,
)
def q_shuffle_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded reproducible global shuffle: the epoch-shuffle primitive
    of a training-data pipeline. Each document gets a pure-function
    shuffle key (md5-derived u32 of seed+doc_id — same cross-engine
    idiom as q_sample_hash) and a shard id; ordering by the key is a
    deterministic permutation that every engine, run, and cluster
    layout reproduces exactly — unlike rand(seed), whose draws depend
    on partitioning.

    Scale: the key is row-local (no shuffle to compute); the global
    sort is Spark's range-partitioned sort — sampled boundaries, then
    each partition sorts independently, no single-node bottleneck —
    and a writer would emit one file per shard with rows already
    key-ordered (partitionBy(shard) on the sink side). New epochs are
    a seed change, not a data move."""
    return (
        load(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.expr(_SHUFFLE_KEY).cast("bigint").alias("shuffle_key"),
            (F.expr(_SHUFFLE_KEY) % 8).cast("bigint").alias("shard"),
        )
        .orderBy("shuffle_key", "doc_id")
    )


@query(
    "q_sample_hash",
    oracle=f"""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE {_SAMPLE_BUCKET} = 0
    """,
)
def q_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% document sample by hash bucket (see above).

    Scale: a pure row-local predicate — no shuffle, no state, fully
    codegen'd, trivially parallel at any corpus size; stratify by
    combining with any partition column. The SQL text is shared
    verbatim with the DuckDB oracle (functions/hashing.py).
    """
    return (
        load(spark, sf_dir, "documents")
        .filter(F.expr(f"{_SAMPLE_BUCKET} = 0"))
        .select("doc_id", "lang", "n_chars")
    )


_STRAT_BUCKET = "(" + hex_u32_sql("md5(concat('strat', doc_id))") + ") % 100"
_STRAT_RATE = (
    "CASE WHEN lang = 'en' THEN 25 WHEN lang = 'zh' THEN 60 ELSE 90 END"
)


@query(
    "q_sample_stratified",
    oracle=f"""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE {_STRAT_BUCKET} < {_STRAT_RATE}
    """,
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling: per-language keep rates
    (downsample the dominant 'en' to 25%, keep rarer languages at
    60-90%) — the corpus-rebalancing step of a training-data pipeline.
    The keep decision is a pure function of doc_id, so the sample is
    reproducible across runs, engines, and partitionings — unlike
    ``df.sample``, whose output depends on partition layout.

    Scale: row-local predicate, no shuffle, fully codegen'd; the CASE
    rate table extends to any stratum column without a join against a
    rates dim (and if rates come from data, it becomes a broadcast
    join against a per-stratum count agg).
    """
    return (
        load(spark, sf_dir, "documents")
        .filter(F.expr(f"{_STRAT_BUCKET} < {_STRAT_RATE}"))
        .select("doc_id", "lang", "n_chars")
    )


@query(
    "q_text_collocations",
    oracle="""
    WITH docs AS (
        SELECT doc_id, string_split(text, ' ') AS s
        FROM documents WHERE doc_id < 200 AND len(string_split(text, ' ')) >= 2
    ),
    bigrams AS (
        SELECT unnest(list_transform(range(1, len(s)),
                      i -> s[i] || ' ' || s[i+1])) AS bg
        FROM docs
    ),
    unigrams AS (
        SELECT unnest(s) AS tok FROM docs
    ),
    bc AS (SELECT bg, count(*) AS n12 FROM bigrams GROUP BY bg),
    uc AS (SELECT tok, count(*) AS n FROM unigrams GROUP BY tok),
    tot AS (
        SELECT (SELECT count(*) FROM bigrams) AS nb,
               (SELECT count(*) FROM unigrams) AS nu
    ),
    scored AS (
        SELECT bc.bg,
               CAST(bc.n12 AS BIGINT) AS n12,
               round(ln((CAST(bc.n12 AS DOUBLE) / tot.nb)
                        / ((CAST(u1.n AS DOUBLE) / tot.nu)
                           * (CAST(u2.n AS DOUBLE) / tot.nu))), 6) AS pmi
        FROM bc
        JOIN uc u1 ON u1.tok = string_split(bc.bg, ' ')[1]
        JOIN uc u2 ON u2.tok = string_split(bc.bg, ' ')[2]
        CROSS JOIN tot
        WHERE bc.n12 >= 5
    )
    SELECT bg, n12, pmi,
           CAST(row_number() OVER (ORDER BY pmi DESC, bg) AS BIGINT) AS rnk
    FROM scored
    ORDER BY pmi DESC, bg
    LIMIT 20
    """,
)
def q_text_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 collocations (bigrams) by pointwise mutual information,
    doc_id<200 slice, min count 5 — the corpus-analysis primitive for
    multi-word expression mining.

    Scale: bigrams come from posexplode + a per-doc lead window (NOT
    explode(transform(...)) — see q_dedup_ngram_jaccard's pushdown
    trap); then two hash-aggs (bigram / unigram counts), a join of
    bigram counts against the unigram table on each side's token, and
    the two corpus totals as a 1-row broadcast. PMI is rounded to 6 dp
    before ranking so the cross-engine top-20 cutoff is stable.
    """
    d = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 200)
        .select("doc_id", F.split("text", " ").alias("toks"))
        .filter(F.size("toks") >= 2)
    )
    tok = d.select("doc_id", F.posexplode("toks").alias("pos", "tok"))
    wl = W.partitionBy("doc_id").orderBy("pos")
    big = tok.withColumn("nxt", F.lead("tok").over(wl)).filter(F.col("nxt").isNotNull())
    bc = (
        big.select(F.concat_ws(" ", "tok", "nxt").alias("bg"), "tok", "nxt")
        .groupBy("bg", "tok", "nxt")
        .agg(F.count(F.lit(1)).alias("n12"))
    )
    uc = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    tot = big.agg(F.count(F.lit(1)).alias("nb")).crossJoin(
        tok.agg(F.count(F.lit(1)).alias("nu"))
    )
    u1 = uc.select(F.col("tok").alias("t1"), F.col("n").alias("n1"))
    u2 = uc.select(F.col("tok").alias("t2"), F.col("n").alias("n2"))
    scored = (
        bc.filter(F.col("n12") >= 5)
        .join(u1, F.col("tok") == F.col("t1"))
        .join(u2, F.col("nxt") == F.col("t2"))
        .crossJoin(F.broadcast(tot))
        .select(
            "bg",
            F.col("n12").cast("bigint").alias("n12"),
            F.round(
                F.log(
                    (F.col("n12").cast("double") / F.col("nb"))
                    / (
                        (F.col("n1").cast("double") / F.col("nu"))
                        * (F.col("n2").cast("double") / F.col("nu"))
                    )
                ),
                6,
            ).alias("pmi"),
        )
    )
    # top-20 via TakeOrderedAndProject FIRST, then rank the bounded
    # survivors — the rank-filter form relied on the WindowGroupLimit
    # rewrite, which (measured) does not fire for this plan shape, so
    # the naive form windowed the full scored-bigram table in one task
    w = W.orderBy(F.desc("pmi"), F.asc("bg"))
    return (
        scored.orderBy(F.desc("pmi"), F.asc("bg"))
        .limit(20)
        .withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .orderBy("rnk")
    )


@query(
    "q_text_repetition",
    oracle="""
    WITH w AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    c AS (SELECT doc_id, tok, count(*) AS n FROM w GROUP BY doc_id, tok)
    SELECT doc_id,
           CAST(sum(n) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_distinct,
           floor((1.0 - count(*) / CAST(sum(n) AS DOUBLE)) * 1000000)
               / 1000000 AS dup_ratio,
           floor(max(n) / CAST(sum(n) AS DOUBLE) * 1000000)
               / 1000000 AS top_share
    FROM c GROUP BY doc_id
    """,
)
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition signals (the Gopher-rule family):
    duplicate-word ratio and most-frequent-word share per document.

    Two hash aggregations — (doc_id, tok) counts, then per-doc rollup —
    both with map-side partial combine; at 100 TB this is one shuffle
    keyed by (doc_id, tok) and one by doc_id, no windows, no Python."""
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    per_tok = tok.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("n"))
    total = F.sum("n").cast("double")
    return per_tok.groupBy("doc_id").agg(
        F.sum("n").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        floor6(F.lit(1.0) - F.count(F.lit(1)) / total).alias("dup_ratio"),
        floor6(F.max("n") / total).alias("top_share"),
    )


@query(
    "q_text_repetition_ngram",
    oracle="""
    WITH t AS (
        SELECT doc_id, len(text) AS nchars, string_split(text, ' ') AS s
        FROM documents WHERE len(string_split(text, ' ')) >= 5
    ),
    g2 AS (
        SELECT doc_id, nchars,
               unnest(list_transform(range(1, len(s)),
                   i -> s[i] || ' ' || s[i+1])) AS gram
        FROM t
    ),
    c2 AS (SELECT doc_id, nchars, gram, count(*) AS n
           FROM g2 GROUP BY 1, 2, 3),
    top2 AS (
        SELECT doc_id,
               floor(n * len(gram) / CAST(nchars AS DOUBLE) * 1000000)
                   / 1000000 AS top2_share
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY doc_id ORDER BY n DESC, gram DESC) AS rn
              FROM c2)
        WHERE rn = 1
    ),
    g5 AS (
        SELECT doc_id, nchars,
               unnest(list_transform(range(1, len(s) - 3),
                   i -> s[i] || ' ' || s[i+1] || ' ' || s[i+2] || ' '
                        || s[i+3] || ' ' || s[i+4])) AS gram
        FROM t
    ),
    c5 AS (SELECT doc_id, nchars, gram, count(*) AS n
           FROM g5 GROUP BY 1, 2, 3),
    d5 AS (
        SELECT doc_id,
               floor(coalesce(sum(CASE WHEN n > 1 THEN n * len(gram) END), 0)
                     / CAST(max(nchars) AS DOUBLE) * 1000000)
                   / 1000000 AS dup5_share
        FROM c5 GROUP BY doc_id
    )
    SELECT t2.doc_id, t2.top2_share, d5.dup5_share,
           (t2.top2_share > 0.2 OR d5.dup5_share > 0.15) AS repetitive
    FROM top2 t2 JOIN d5 USING (doc_id)
    """,
)
def q_text_repetition_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Char-weighted n-gram repetition — the other half of the
    published repetition-filter family (Rae et al. 2021 §A1.1)
    beside q_text_repetition's word-level ratios: per document, the
    fraction of CHARACTERS covered by the most frequent word-bigram
    (top2_share) and by all duplicated word-5-grams (dup5_share,
    occurrences × gram length — boilerplate headers and repeated
    paragraphs dominate this one while barely moving the word-level
    dup ratio), plus the filter verdict at the family's usual
    thresholds (0.2 / 0.15). Ties for the top bigram break
    deterministically on (count, gram) so both engines pick the same
    winner.

    Scale shape: shingles come from posexplode + window lead (never
    explode(transform(...)) — one array element per row through the
    shuffle), then two hash aggregations per n — (doc, gram) counts
    and the per-doc rollup — all map-side combinable; no corpus-sized
    window, no Python."""
    d = (
        load(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.length("text").alias("nchars"),
            F.split("text", " ").alias("s"),
        )
        .filter(F.size("s") >= 5)
    )
    pos = d.select("doc_id", "nchars", F.posexplode("s").alias("i", "t0"))
    w = W.partitionBy("doc_id").orderBy("i")
    leads = pos.select(
        "doc_id",
        "nchars",
        "t0",
        *[F.lead("t0", k).over(w).alias(f"t{k}") for k in range(1, 5)],
    )
    g2 = leads.filter(F.col("t1").isNotNull()).select(
        "doc_id", "nchars", F.concat_ws(" ", "t0", "t1").alias("gram")
    )
    c2 = g2.groupBy("doc_id", "nchars", "gram").agg(F.count(F.lit(1)).alias("n"))
    top2 = (
        c2.groupBy("doc_id", "nchars")
        .agg(F.max(F.struct("n", "gram")).alias("tg"))
        .select(
            "doc_id",
            floor6(
                F.col("tg.n") * F.length("tg.gram") / F.col("nchars").cast("double")
            ).alias("top2_share"),
        )
    )
    g5 = leads.filter(F.col("t4").isNotNull()).select(
        "doc_id",
        "nchars",
        F.concat_ws(" ", "t0", "t1", "t2", "t3", "t4").alias("gram"),
    )
    c5 = g5.groupBy("doc_id", "nchars", "gram").agg(F.count(F.lit(1)).alias("n"))
    d5 = c5.groupBy("doc_id").agg(
        floor6(
            F.coalesce(
                F.sum(
                    F.when(F.col("n") > 1, F.col("n") * F.length("gram"))
                ),
                F.lit(0),
            )
            / F.max("nchars").cast("double")
        ).alias("dup5_share")
    )
    return top2.join(d5, ["doc_id"]).select(
        "doc_id",
        "top2_share",
        "dup5_share",
        ((F.col("top2_share") > 0.2) | (F.col("dup5_share") > 0.15)).alias(
            "repetitive"
        ),
    )


@query(
    "q_text_decontaminate",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS s FROM documents
        WHERE len(string_split(text, ' ')) >= 3
    ),
    grams AS (
        SELECT doc_id,
               list_distinct(list_transform(range(1, len(s) - 1),
                   i -> s[i] || ' ' || s[i+1] || ' ' || s[i+2])) AS g
        FROM toks
    ),
    bench AS (SELECT DISTINCT unnest(g) AS gram FROM grams WHERE doc_id % 97 = 0),
    corpus AS (SELECT doc_id, unnest(g) AS gram FROM grams WHERE doc_id % 97 <> 0)
    SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_shared
    FROM corpus c JOIN bench b USING (gram)
    GROUP BY c.doc_id
    """,
)
def q_text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    word-n-gram with a held-out benchmark set (docs with doc_id % 97
    == 0 stand in for the benchmark; n=3 tuned to the fixture's tiny
    vocabulary — real pipelines use 8-13-gram overlap, same plan).

    The scale shape is the point: benchmark n-grams are a SMALL
    distinct set (benchmarks are MBs, corpora are TBs), so they
    broadcast; the corpus side streams through a broadcast-hash
    semi-ish join keyed on the gram — no shuffle of the corpus and
    never an all-pairs product. Shingles use posexplode + window lead
    (not explode(transform(...)) — see q_dedup_ngram_jaccard)."""
    d = (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.split("text", " ").alias("toks"))
        .filter(F.size("toks") >= 3)
    )
    tok = d.select(
        "doc_id", F.size("toks").alias("len"), F.posexplode("toks").alias("pos", "tok")
    )
    wl = W.partitionBy("doc_id").orderBy("pos")
    grams = (
        tok.select(
            "doc_id",
            "pos",
            "len",
            F.concat_ws(
                " ", "tok", F.lead("tok", 1).over(wl), F.lead("tok", 2).over(wl)
            ).alias("gram"),
        )
        .filter(F.col("pos") <= F.col("len") - 3)
        .select("doc_id", "gram")
        .distinct()
    )
    bench = (
        grams.filter(F.col("doc_id") % 97 == 0).select("gram").distinct()
    )
    corpus = grams.filter(F.col("doc_id") % 97 != 0)
    return (
        corpus.join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
    )


@query(
    "q_text_chunk",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS s FROM documents
    )
    SELECT doc_id,
           CAST(start // 24 AS INTEGER) AS chunk_no,
           array_to_string(s[start + 1 : start + 32], ' ') AS chunk_text,
           CAST(least(32, len(s) - start) AS INTEGER) AS n_tokens
    FROM toks, LATERAL (SELECT unnest(range(0, len(s), 24)) AS start)
    WHERE start < len(s)
    """,
)
def q_text_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping document chunking (size 32, stride 24 → 8-token
    overlap): the pre-embedding step of a training pipeline, one output
    row per (doc, chunk).

    Plan shape: chunk START positions are generated per doc with
    sequence() and exploded, then each chunk is an O(size) array slice
    of the doc's token array — no window, no shuffle at all (the whole
    operator is scan → generate → project), and output size is
    len/stride per doc regardless of overlap."""
    return chunk_documents(load(spark, sf_dir, "documents"))


def chunk_documents(d: DataFrame, size: int = 32, stride: int = 24) -> DataFrame:
    """Overlapping chunker over any DataFrame with (doc_id, text) —
    stateless column expressions, so it runs identically over a batch
    scan or a readStream (see the streaming-ingest test)."""
    toks = d.select("doc_id", F.split("text", " ").alias("s"))
    starts = F.sequence(F.lit(0), F.size("s") - 1, F.lit(stride))
    return (
        toks.select("doc_id", "s", F.explode(starts).alias("start"))
        .select(
            "doc_id",
            (F.col("start") / stride).cast("int").alias("chunk_no"),
            F.array_join(F.slice("s", F.col("start") + 1, size), " ").alias(
                "chunk_text"
            ),
            F.least(F.lit(size), F.size("s") - F.col("start"))
            .cast("int")
            .alias("n_tokens"),
        )
    )


@query(
    "q_text_logprob",
    oracle="""
    WITH w AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    freq AS (SELECT tok, count(*) AS c FROM w GROUP BY tok),
    tot AS (SELECT count(*) AS t FROM w)
    SELECT doc_id,
           round(avg(-ln(c / CAST(t AS DOUBLE))), 6) AS avg_neg_logprob,
           CAST(count(*) AS BIGINT) AS n_tokens
    FROM w JOIN freq USING (tok) CROSS JOIN tot
    GROUP BY doc_id
    """,
)
def q_text_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram negative log-probability per document — the cheap
    perplexity proxy quality filters use (high = rare-token-heavy /
    off-distribution text; the corpus itself is the language model).

    Scale shape: the unigram table is vocabulary-sized — tiny relative
    to any corpus — so it BROADCASTS to the exploded token stream; the
    only corpus-sized shuffles are the freq hash-agg and the per-doc
    rollup, both with map-side partial combine (same plan family as
    TF-IDF)."""
    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    tot = toks.agg(F.count(F.lit(1)).alias("t"))
    return (
        toks.join(F.broadcast(freq), "tok")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.round(
                F.avg(-F.log(F.col("c") / F.col("t").cast("double"))), 6
            ).alias("avg_neg_logprob"),
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        )
    )


_SPLIT_BUCKET = "(" + hex_u32_sql("md5(concat('split', doc_id))") + ") % 100"
_SPLIT_EXPR = (
    f"CASE WHEN {_SPLIT_BUCKET} < 80 THEN 'train' "
    f"WHEN {_SPLIT_BUCKET} < 90 THEN 'val' ELSE 'test' END"
)


@query(
    "q_split_train_val_test",
    oracle=f"""
    SELECT {_SPLIT_EXPR} AS split, lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY split, lang
    """,
)
def q_split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split audit by language.

    The split is a pure function of doc_id (salted md5 bucket — the
    same cross-engine hashing as q_sample_hash), so membership is
    stable under any repartitioning, re-run, or engine: the property
    that keeps eval sets leak-free as the corpus is rebuilt. The audit
    itself is one partial-agg hash aggregation."""
    return (
        load(spark, sf_dir, "documents")
        .groupBy(F.expr(_SPLIT_EXPR).alias("split"), "lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


# PII patterns valid in BOTH Java regex (Spark) and RE2 (DuckDB) — no
# backreferences, no lookaround, ASCII classes only.
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\d{3}-\d{3}-\d{4}"
_PII_IP = r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"

# The fixture corpus contains no natural PII, so the query injects a
# deterministic header (email always; phone on doc_id%3==0; IP on
# doc_id%5==0) and then scrubs it — the redaction MECHANISM is what's
# under test, and counts/hashes are nonzero and cross-checked.
_PII_RAW_SQL = """
    concat('contact user', CAST(doc_id AS VARCHAR), '@example.com ',
           CASE WHEN doc_id % 3 = 0
                THEN concat('call 555-', lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0'), '-0199 ')
                ELSE '' END,
           CASE WHEN doc_id % 5 = 0 THEN 'from 192.168.0.1 ' ELSE '' END,
           text)
"""


@query(
    "q_text_pii_redact",
    oracle=f"""
    WITH raw AS (SELECT doc_id, {_PII_RAW_SQL} AS raw FROM documents)
    SELECT doc_id,
           CAST(len(regexp_extract_all(raw, '{_PII_EMAIL}')) AS BIGINT) AS n_email,
           CAST(len(regexp_extract_all(raw, '{_PII_PHONE}')) AS BIGINT) AS n_phone,
           CAST(len(regexp_extract_all(raw, '{_PII_IP}')) AS BIGINT) AS n_ip,
           md5(regexp_replace(regexp_replace(regexp_replace(raw,
               '{_PII_EMAIL}', '[EMAIL]', 'g'),
               '{_PII_PHONE}', '[PHONE]', 'g'),
               '{_PII_IP}', '[IP]', 'g')) AS clean_hash
    FROM raw
    """,
)
def q_text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction: count and scrub emails / phone numbers / IPv4s
    per document; emit the counts (audit trail) and an md5 of the
    scrubbed text (value-checked bit-for-bit against the oracle's
    redaction, so the replacement itself — not just the counts — is
    verified cross-engine).

    Scale shape: pure per-row JVM regexp expressions — embarrassingly
    parallel, zero shuffles, codegen'd; the patterns are shared Java/RE2
    syntax so the exact same scrub runs on any engine. Real pipelines
    swap in their compliance pattern pack; the plan is unchanged."""
    d = load(spark, sf_dir, "documents")
    raw = d.select(
        "doc_id",
        F.expr(
            _PII_RAW_SQL.replace("VARCHAR", "STRING")  # Spark's cast name
        ).alias("raw"),
    )
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("raw"), F.lit(_PII_EMAIL), F.lit("[EMAIL]")),
            F.lit(_PII_PHONE),
            F.lit("[PHONE]"),
        ),
        F.lit(_PII_IP),
        F.lit("[IP]"),
    )
    return raw.select(
        "doc_id",
        F.regexp_count("raw", F.lit(_PII_EMAIL)).cast("bigint").alias("n_email"),
        F.regexp_count("raw", F.lit(_PII_PHONE)).cast("bigint").alias("n_phone"),
        F.regexp_count("raw", F.lit(_PII_IP)).cast("bigint").alias("n_ip"),
        F.md5(clean).alias("clean_hash"),
    )


@query(
    "q_mix_weights",
    oracle="""
    WITH c AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
    t AS (SELECT sum(n_docs) AS total, count(*) AS n_langs FROM c)
    SELECT lang,
           CAST(n_docs AS BIGINT) AS n_docs,
           floor(n_docs / CAST(total AS DOUBLE) * 1000000)
               / 1000000 AS actual_share,
           floor((1.0 / n_langs) / (n_docs / CAST(total AS DOUBLE)) * 1000000)
               / 1000000 AS weight
    FROM c CROSS JOIN t
    """,
)
def q_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture reweighting: per-language sampling weight that
    moves the corpus from its ACTUAL mix to a TARGET mix (uniform here;
    the fixture's lang skew — en ≈ 44% — makes the weights non-trivial:
    en downsamples ≈ 0.46×, the rest upsample). weight > 1 → upsample,
    < 1 → downsample; multiplying each doc's sampling probability by its
    group's weight yields the target mixture in expectation. Any target
    table (lang, target_share) drops in the same way.

    Scale shape: one partial-agg groupBy over the corpus, then the
    group-count table (domains, not documents — tiny) joins back as a
    broadcast one-row cross of totals. No corpus-sized second pass."""
    d = load(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    totals = counts.agg(
        F.sum("n_docs").alias("total"), F.count(F.lit(1)).alias("n_langs")
    )
    share = F.col("n_docs") / F.col("total").cast("double")
    return counts.crossJoin(F.broadcast(totals)).select(
        "lang",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        floor6(share).alias("actual_share"),
        floor6((F.lit(1.0) / F.col("n_langs")) / share).alias("weight"),
    )


PACK_CAPACITY = 64  # tokens per packed context window


def pack_greedy(
    df: DataFrame, group_col: str, order_col: str, size_col: str, capacity: int
) -> DataFrame:
    """Greedy sequence packing as a reusable API: within each
    ``group_col`` group, rows in ``order_col`` order accumulate into
    packs of at most ``capacity`` total ``size_col``; a row that would
    overflow starts a new pack (an oversized row gets its own). Output
    = input columns + ``pack_id`` (1-based per group).

    The running-sum-with-reset is NOT a window function (the reset
    makes it non-associative), so this is a genuine applyInPandas
    stateful scan per group — exactly the class of operator SURVEY
    §4.3 reserves for the Python path. Hypothesis-tested against a
    brute-force fold in tests/test_properties.py."""
    import pandas as pd

    def pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(order_col).reset_index(drop=True)
        pack_ids = []
        pack_id, acc = 0, capacity + 1  # first row always opens pack 1
        for t in pdf[size_col]:
            if acc + t > capacity:
                pack_id += 1
                acc = t
            else:
                acc += t
            pack_ids.append(pack_id)
        pdf["pack_id"] = pd.array(pack_ids, dtype="int32")
        return pdf

    out_schema = T.StructType(list(df.schema) + [T.StructField("pack_id", T.IntegerType())])
    return df.groupBy(group_col).applyInPandas(pack, out_schema)


@query(
    "q_pack_sequences",
    oracle=f"""
    WITH RECURSIVE ord AS (
        SELECT lang, doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
               row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
        FROM documents
    ),
    pack AS (
        SELECT lang, doc_id, n_tok, rn, 1 AS pack_id, n_tok AS acc
        FROM ord WHERE rn = 1
        UNION ALL
        SELECT o.lang, o.doc_id, o.n_tok, o.rn,
               CASE WHEN p.acc + o.n_tok > {PACK_CAPACITY}
                    THEN p.pack_id + 1 ELSE p.pack_id END,
               CASE WHEN p.acc + o.n_tok > {PACK_CAPACITY}
                    THEN o.n_tok ELSE p.acc + o.n_tok END
        FROM pack p JOIN ord o ON o.lang = p.lang AND o.rn = p.rn + 1
    )
    SELECT lang, doc_id, n_tok, CAST(pack_id AS INTEGER) AS pack_id FROM pack
    """,
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: greedily pack documents (ordered by doc_id)
    into fixed token-budget context windows of PACK_CAPACITY=64 tokens
    per language — the step that turns a filtered corpus into training
    rows (see pack_greedy for the fold semantics and Python-path
    rationale). The DuckDB oracle replays the same fold as a recursive
    CTE, giving the full per-document assignment a value-hash check.
    Scale shape: parallelism = the group key; production packs per
    (shard, lang) with shard = a hash bucket, so groups stay
    executor-sized and the fold never leaves one task. Only the text's
    token COUNT (not the text) crosses the shuffle."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "lang",
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tok"),
    )
    return pack_greedy(toks, "lang", "doc_id", "n_tok", PACK_CAPACITY)


HH_SUPPORT = 0.005  # report tokens with share >= 0.5% of all tokens
HH_K = int(1 / HH_SUPPORT)  # Misra-Gries counter budget per partition


def mg_merge(counters, batch_counts, k: int):
    """One Misra-Gries merge step: add a batch's value counts into the
    sketch, then — if more than ``k`` counters survive — subtract the
    (k+1)-th largest count from ALL counters and drop the non-positive.

    Every prune reduces >= k+1 counters by cut, so the cuts charged
    against any one item total < N_p/(k+1) <= support*N_p — a partition
    heavy hitter always survives (the classic deletion bound). The
    round-8 variant ("drop <= cut, keep survivors UNCHANGED") broke the
    bound: survivors never paid for prunes, so a true heavy hitter
    arriving interleaved with k persistent high-count tokens was
    re-added and re-dropped every batch, losing its whole count each
    time (review find, round 9 — unit- and property-tested against a
    plain Counter in test_properties, including that adversarial
    batching)."""
    counters = counters.add(batch_counts, fill_value=0)
    if len(counters) > k:
        cut = counters.nlargest(k + 1).iloc[-1]
        counters = counters - cut
        counters = counters[counters > 0]
    return counters


def heavy_hitters_exact(toks: DataFrame, support: float) -> DataFrame:
    """Exact heavy hitters over a one-column (``tok``) DataFrame via
    the distributed two-phase algorithm: per-partition Misra-Gries
    sketch (budget 1/support) nominates candidates, one broadcast
    exact-count pass verifies. Returns (tok, n, total) for tokens with
    n >= support * total. The MG phase cannot miss a true heavy hitter
    under ANY partitioning (pigeonhole + the sketch's deletion bound) —
    hypothesis-tested against a plain Counter in test_properties."""
    import pandas as pd

    k = int(1 / support)

    def mg_sketch(batches):
        counters = pd.Series(dtype="int64")
        for pdf in batches:
            counters = mg_merge(counters, pdf["tok"].value_counts(), k)
        yield pd.DataFrame({"tok": counters.index.astype(str)})

    cands = toks.mapInPandas(mg_sketch, "tok string").distinct()
    total = toks.agg(F.count(F.lit(1)).alias("total"))
    return (
        toks.join(F.broadcast(cands), "tok")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("n") >= support * F.col("total"))
    )


@query(
    "q_text_heavy_hitters",
    oracle=f"""
    WITH w AS (
        SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents
    ),
    c AS (SELECT tok, count(*) AS n FROM w GROUP BY tok),
    t AS (SELECT count(*) AS total FROM w)
    SELECT tok, CAST(n AS BIGINT) AS n,
           floor(n / CAST(total AS DOUBLE) * 1000000) / 1000000 AS share
    FROM c CROSS JOIN t
    WHERE n >= {HH_SUPPORT} * total
    """,
)
def q_text_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters (tokens with >= 0.5% corpus share) by the
    distributed two-phase algorithm: a per-partition MISRA-GRIES
    sketch (counter budget 1/s) nominates candidates, then ONE exact
    counting pass over just the candidates verifies. The sketch can
    never miss a true heavy hitter (pigeonhole: global share >= s
    implies partition share >= s somewhere, and MG(1/s) retains every
    such item), so the final output is EXACT and partition-layout
    independent — which is why a plain exact-count oracle can
    value-check a sketch-based plan.

    Scale shape: phase 1 streams each partition through a bounded
    (1/s)-counter summary — no shuffle, output O(P/s) rows; phase 2
    broadcasts the candidate set and exact-counts only matching tokens
    (one partial-agg shuffle of the survivors). The full token
    multiset is never globally aggregated — at 100 TB that is the
    difference between shuffling ~vocabulary rows per partition and
    shuffling every token. (Logic lives in heavy_hitters_exact, the
    reusable API; this query binds it to the documents table.)"""
    d = load(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split(F.lower("text"), " ")).alias("tok"))
    return heavy_hitters_exact(toks, HH_SUPPORT).select(
        "tok",
        F.col("n").cast("bigint").alias("n"),
        floor6(F.col("n") / F.col("total").cast("double")).alias("share"),
    )


@query(
    "q_text_quality_retention",
    oracle=f"""
    WITH feat AS (
        SELECT doc_id, lang,
               floor((0.4 * (len(list_distinct(string_split(text, ' ')))
                             / CAST(len(string_split(text, ' ')) AS DOUBLE))
                      + 0.3 * least(len(string_split(text, ' ')) / 100.0, 1.0)
                      + 0.3 * (1.0 - len(list_filter(string_split(text, ' '),
                                         t -> t IN ({_STOP_IN})))
                                     / CAST(len(string_split(text, ' ')) AS DOUBLE)))
                     * 10000) / 10000 AS quality_score
        FROM documents
    )
    SELECT doc_id, lang, quality_score,
           CAST(ntile(10) OVER (PARTITION BY lang
                                ORDER BY quality_score DESC, doc_id) AS INTEGER)
               AS decile,
           ntile(10) OVER (PARTITION BY lang
                           ORDER BY quality_score DESC, doc_id) <= 2 AS kept
    FROM feat
    """,
)
def q_text_quality_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive quality retention: keep the TOP 20% of documents PER
    LANGUAGE by quality score (decile <= 2), rather than one global
    threshold — fixed-retention pruning is what keeps a multilingual
    corpus balanced when per-language score distributions differ
    (a global cut would empty low-scoring languages). Ties break on
    doc_id so the decile boundary is deterministic cross-engine.

    Scale shape: one window (ntile) partitioned by lang ordered by
    score. Per-language partitions can be row_number-skew-prone if one
    language dominates; the production mitigation is two-pass — an
    approx-quantile sketch per lang broadcasts the score threshold,
    and a stateless filter applies it (same shape as q_mix_weights) —
    this exact-decile form is the reference semantics the sketch form
    is judged against."""
    scored = with_quality_score(load(spark, sf_dir, "documents")).select(
        "doc_id", "lang", "quality_score"
    )
    w = W.partitionBy("lang").orderBy(F.desc("quality_score"), F.asc("doc_id"))
    return scored.select(
        "doc_id",
        "lang",
        "quality_score",
        F.ntile(10).over(w).cast("int").alias("decile"),
        (F.ntile(10).over(w) <= 2).alias("kept"),
    )


@query(
    "q_text_bigram_logprob",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS s FROM documents
        WHERE len(string_split(text, ' ')) >= 2
    ),
    big AS (
        SELECT doc_id, s[i] AS prev, s[i+1] AS tok
        FROM toks, LATERAL (SELECT unnest(range(1, len(s))) AS i)
    ),
    bc AS (SELECT prev, tok, count(*) AS c2 FROM big GROUP BY prev, tok),
    uc AS (SELECT prev, count(*) AS c1 FROM big GROUP BY prev)
    SELECT b.doc_id,
           round(avg(-ln(bc.c2 / CAST(uc.c1 AS DOUBLE))), 6) AS avg_neg_logprob,
           CAST(count(*) AS BIGINT) AS n_bigrams
    FROM big b
    JOIN bc ON b.prev = bc.prev AND b.tok = bc.tok
    JOIN uc ON b.prev = uc.prev
    GROUP BY b.doc_id
    """,
)
def q_text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM quality proxy: per-document average -ln P(tok | prev)
    with the corpus itself as the model — the conditional upgrade of
    q_text_logprob's unigram score (repetitive or formulaic text
    scores low surprise; rare transitions score high). Documents
    shorter than 2 tokens have no bigrams and drop out, as in any LM
    scorer.

    Scale shape: the bigram stream is posexplode + window lead (one
    shuffle on doc_id, same shingle idiom as decontaminate); the
    bigram and prev-count model tables are vocabulary-sized and
    BROADCAST back to the stream; final rollup is one doc_id-keyed
    hash agg. Model tables ship MBs while the corpus streams — the
    n-gram-LM scoring layout at any scale."""
    d = (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.split("text", " ").alias("s"))
        .filter(F.size("s") >= 2)
    )
    tok = d.select("doc_id", F.posexplode("s").alias("pos", "tok"))
    wl = W.partitionBy("doc_id").orderBy("pos")
    big = (
        tok.select(
            "doc_id",
            F.col("tok").alias("prev"),
            F.lead("tok", 1).over(wl).alias("tok"),
        )
        .filter(F.col("tok").isNotNull())
    )
    bc = big.groupBy("prev", "tok").agg(F.count(F.lit(1)).alias("c2"))
    uc = big.groupBy("prev").agg(F.count(F.lit(1)).alias("c1"))
    return (
        big.join(F.broadcast(bc), ["prev", "tok"])
        .join(F.broadcast(uc), "prev")
        .groupBy("doc_id")
        .agg(
            F.round(F.avg(-F.log(F.col("c2") / F.col("c1").cast("double"))), 6).alias(
                "avg_neg_logprob"
            ),
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        )
    )


_WRS_U = "((" + hex_u32_sql("md5(concat('wrs', doc_id))") + ") + 1) / 4294967296.0"
# Efraimidis–Spirakis priority: maximizing u^(1/w) == maximizing
# ln(u)/w (ln u ≤ 0, heavier w pulls the key toward 0) — the log form
# avoids pow(), whose libm last-ulp behavior differs across engines.
# NULLIF guards w=0 (a zero-length doc must mean "never sampled", and
# Spark 4's ANSI mode would otherwise hard-error the division); the
# NULL priority sorts last under DESC on both engines, i.e. after
# every real candidate — latent on these fixtures (min n_chars 44)
# but load-bearing on real corpora (ADVICE r05).
_WRS_KEY = f"(ln({_WRS_U}) / nullif(n_chars, 0))"


@query(
    "q_sample_weighted",
    oracle=f"""
    SELECT doc_id, lang, n_chars, rnk
    FROM (
        SELECT doc_id, lang, n_chars,
               CAST(row_number() OVER (ORDER BY {_WRS_KEY} DESC, doc_id)
                    AS BIGINT) AS rnk
        FROM documents
    )
    WHERE rnk <= 100
    """,
)
def q_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis):
    the 100 documents with the largest deterministic priority
    ln(u)/w, u = md5-derived uniform per doc, w = n_chars — inclusion
    probability proportional to length, the size-biased draw a token
    -budgeted training mix actually wants (sampling DOCUMENTS
    uniformly undersamples long ones per token).

    Scale: the priority is row-local (no shuffle to compute) and the
    selection is a top-k — TakeOrderedAndProject, k rows per
    partition, never a global sort. Epochs/reseeds are a salt change.
    The md5-uniform is identical in both engines (functions/hashing
    idiom), so unlike rand(seed) the draw is reproducible across
    engines, runs, and cluster layouts, and the oracle checks the
    exact sample membership and order."""
    top = (
        load(spark, sf_dir, "documents")
        .select(
            "doc_id",
            "lang",
            "n_chars",
            F.expr(_WRS_KEY).alias("_key"),
        )
        .orderBy(F.desc("_key"), F.asc("doc_id"))
        .limit(100)  # TakeOrderedAndProject — k per partition, no global sort
    )
    # ranking the 100 survivors is a single-partition window over k rows
    return top.withColumn(
        "rnk",
        F.row_number().over(W.orderBy(F.desc("_key"), F.asc("doc_id"))).cast("bigint"),
    ).select("doc_id", "lang", "n_chars", "rnk")
