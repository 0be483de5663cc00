"""Text-analysis operators for training-data pipelines (SURVEY §2.3 X4):
language ID, quality scoring, token counting, document fingerprinting — all
whole-stage-codegen built-ins (no Python in the hot path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from otlp2parquet_spark.extensions.dedup import (
    SQL_NORM,
    SQL_QUALITY_FEAT,
    SQL_QUALITY_PASSES,
    gram3_expr,
    normalized_text,
    quality_feature_exprs,
    token_count_expr,
    with_tokens,
)
from otlp2parquet_spark.queries.registry import T, query
from otlp2parquet_spark.queries.relational import quant4
from otlp2parquet_spark.session import spread

# Tiny per-language stopword marker sets (public common words). On synthetic
# corpora this mostly detects English; the operator shape (per-language hit
# scoring + argmax) is the real deliverable.
LANG_MARKERS = {
    "en": ("the", "and", "of", "to", "a"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "la", "los", "que", "de"),
}

# BPE-ish pre-tokenizer: word pieces OR single non-space symbols (the classic
# GPT-2-style pre-split regex family, simplified to RE2-safe constructs).
BPE_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"

# LM-scorer model routing: the smoothed model is the distinct n-gram TYPE
# table, which grows roughly with corpus token count (the salted scale rows
# measure the trigram table at ~2M rows for a 100x sf0.1 corpus) — so a
# STATIC F.broadcast() of it is a driver/executor OOM at web scale, not a
# slow plan. Route on the MEASURED model row count instead (the
# _semantic_k / qc_shards_for discipline: parameters derive from the corpus,
# never from a constant): broadcast below the threshold, plain equi-join
# above it — AQE still promotes a runtime-small side, so the over-threshold
# route costs nothing when the measurement was conservative. The count is
# nearly free: every caller localCheckpoints the model anyway, so counting
# just materializes work the scoring join was about to do. Threshold sized
# in rows at the measured ~120 B/row of the enriched type tables: 500k rows
# is ~60 MB serialized — past the point where per-executor broadcast copies
# beat ONE shuffle of the already-type-collapsed model. (Production
# KenLM-style pipelines additionally prune singleton tails; that changes
# the model's values, so it stays out of scope for an oracle-matched op.)
LM_BROADCAST_MAX_MODEL_ROWS = 500_000


def lm_model_route(model: DataFrame, n_rows: int | None = None) -> DataFrame:
    """Broadcast the materialized LM model frame iff its measured row count
    (``n_rows`` when the caller already knows it) fits
    LM_BROADCAST_MAX_MODEL_ROWS; otherwise PIN a sort-merge join.

    Every registry caller now measures ONCE and passes n_rows (r10 verdict
    ask #2: ngram/kn/kn3 count at model build, the frozen deploy path at
    lm_read_model) — the internal count() is the conservative fallback for
    ad-hoc callers, not a per-invocation job on any shipped path.

    The over-threshold route is a merge HINT, not a plain unhinted join,
    because the corpus side of the scoring join is an exploded n-gram frame
    whose static size estimate is meaningless: Catalyst propagates the
    (tiny, compressed) documents-scan size through Generate, so the planner
    sees the CORPUS as the small side — measured at the salted 100x sf0.1
    replica, the un-hinted kn3 join planned BroadcastHashJoin BuildLeft on
    the corpus trigrams and aborted with an over-8GB broadcast. Pinning SMJ
    trades away AQE's runtime promotion on this one join, but a model the
    measurement already proved >500k rows is past wanting a broadcast
    anyway, and SMJ is the estimator-proof shape."""
    if (model.count() if n_rows is None else n_rows) <= LM_BROADCAST_MAX_MODEL_ROWS:
        return F.broadcast(model)
    return model.hint("merge")


def _marker_hits(tokens, words) -> F.Column:
    """One-pass marker count (the oracle's list_contains form): markers are
    distinct, so a single isin filter equals the per-word count sum — and
    `tokens` must be a MATERIALIZED column, never an inline tokenize
    expression (lambda bodies defeat subexpression elimination)."""
    return F.size(F.filter(tokens, lambda t: t.isin(*words)))


@query(
    "x4_text_stats",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lang, n_chars, string_split({SQL_NORM.format(c='text')}, ' ') AS toks, text
      FROM documents
    )
    SELECT doc_id, lang,
           len(toks) AS n_tokens,
           length(text) AS n_chars_measured,
           len(list_distinct(toks)) AS n_unique,
           FLOOR(CAST(list_aggregate(list_transform(toks, t -> length(t)), 'sum') AS DOUBLE) / len(toks) * 10000.0 + 0.5) / 10000.0 AS avg_tok_len,
           FLOOR(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) * 10000.0 + 0.5) / 10000.0 AS ttr,
           len(regexp_extract_all(text, '{BPE_RE}')) AS n_bpe_pieces
    FROM tok
    ORDER BY doc_id
    """,
    tags=("X4", "F1", "F4"),
)
def x4_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token/char counts, type-token ratio, average token length,
    and BPE-ish piece count — the standard quality-filter feature set."""
    d = spread(T(spark, sf_dir, "documents"))
    toks = F.split(normalized_text(F.col("text")), " ")
    total_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("long")),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    return d.select(
        "doc_id",
        "lang",
        F.size(toks).alias("n_tokens"),
        F.length("text").alias("n_chars_measured"),
        F.size(F.array_distinct(toks)).alias("n_unique"),
        # quant4: integer-ratio 4-dp quantization, engine-stable on exact
        # .5 ties where double ROUND diverges (see quant4)
        quant4(total_len.cast("double") / F.size(toks)).alias("avg_tok_len"),
        quant4(F.size(F.array_distinct(toks)).cast("double") / F.size(toks)).alias("ttr"),
        F.size(F.regexp_extract_all("text", F.lit(BPE_RE), 0)).alias("n_bpe_pieces"),
    ).orderBy("doc_id")


@query(
    "x4_top_terms",
    oracle=f"""
    WITH tok AS (
      SELECT unnest(string_split({SQL_NORM.format(c='text')}, ' ')) AS term
      FROM documents
    )
    SELECT term, COUNT(*) AS freq
    FROM tok
    WHERE length(term) > 0
    GROUP BY term
    ORDER BY freq DESC, term
    LIMIT 25
    """,
    tags=("X4", "A1", "O2"),
)
def x4_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus term frequency top-25: explode -> two-phase count (map-side
    partial agg absorbs the token explosion before the shuffle)."""
    d = spread(T(spark, sf_dir, "documents"))
    return (
        d.select(F.explode(F.split(normalized_text(F.col("text")), " ")).alias("term"))
        .filter(F.length("term") > 0)
        .groupBy("term")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), F.asc("term"))
        .limit(25)
    )


def _sql_marker_hits(lang: str) -> str:
    terms = ", ".join(f"'{w}'" for w in LANG_MARKERS[lang])
    return f"len(list_filter(toks, t -> list_contains([{terms}], t)))"


@query(
    "x4_langid",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lang, string_split({SQL_NORM.format(c='text')}, ' ') AS toks
      FROM documents
    ), scores AS (
      SELECT doc_id, lang,
             {_sql_marker_hits('en')} AS s_en,
             {_sql_marker_hits('de')} AS s_de,
             {_sql_marker_hits('fr')} AS s_fr,
             {_sql_marker_hits('es')} AS s_es
      FROM tok
    )
    SELECT doc_id, lang AS lang_label,
           CASE WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
                WHEN s_en >= greatest(s_de, s_fr, s_es) THEN 'en'
                WHEN s_de >= greatest(s_fr, s_es) THEN 'de'
                WHEN s_fr >= s_es THEN 'fr'
                ELSE 'es' END AS lang_guess,
           s_en, s_de, s_fr, s_es
    FROM scores
    ORDER BY doc_id
    """,
    tags=("X4",),
)
def x4_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: per-language stopword-marker hit counts with a
    deterministic argmax (ties resolve en>de>fr>es; zero hits -> 'und')."""
    d = spread(T(spark, sf_dir, "documents"))
    toks = F.col("toks")
    scores = with_tokens(d, ("doc_id", "lang")).select(
        "doc_id",
        F.col("lang").alias("lang_label"),
        _marker_hits(toks, LANG_MARKERS["en"]).alias("s_en"),
        _marker_hits(toks, LANG_MARKERS["de"]).alias("s_de"),
        _marker_hits(toks, LANG_MARKERS["fr"]).alias("s_fr"),
        _marker_hits(toks, LANG_MARKERS["es"]).alias("s_es"),
    )
    best = F.greatest("s_en", "s_de", "s_fr", "s_es")
    guess = (
        F.when(best == 0, "und")
        .when(F.col("s_en") >= F.greatest("s_de", "s_fr", "s_es"), "en")
        .when(F.col("s_de") >= F.greatest("s_fr", "s_es"), "de")
        .when(F.col("s_fr") >= F.col("s_es"), "fr")
        .otherwise("es")
    )
    return scores.select(
        "doc_id", "lang_label", guess.alias("lang_guess"), "s_en", "s_de", "s_fr", "s_es"
    ).orderBy("doc_id")


@query(
    "x4_quality_score",
    oracle=f"""
    WITH feat AS (
      {SQL_QUALITY_FEAT}
    )
    SELECT doc_id, n_chars_m, n_tokens,
           FLOOR(CAST(n_punct AS DOUBLE) / n_chars_m * 10000.0 + 0.5) / 10000.0 AS punct_ratio,
           FLOOR(CAST(n_stop AS DOUBLE) / n_tokens * 10000.0 + 0.5) / 10000.0 AS stopword_ratio,
           {SQL_QUALITY_PASSES} AS passes_quality
    FROM feat
    ORDER BY doc_id
    """,
    tags=("X4", "P4"),
)
def x4_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality gate: length / punctuation-ratio / stopword-ratio features and
    a boolean filter decision — the canonical pre-training quality filter.
    The features and gate are the shared quality_feature_exprs /
    SQL_QUALITY_FEAT pair (dedup.py), which x2_cluster_keeper's
    survivorship priority also consumes — one definition per engine."""
    d = spread(T(spark, sf_dir, "documents"))
    q = quality_feature_exprs()
    return d.select(
        "doc_id",
        q["n_chars"].alias("n_chars_m"),
        q["n_tokens"].alias("n_tokens"),
        quant4(q["punct_ratio"]).alias("punct_ratio"),
        quant4(q["n_stop"].cast("double") / q["n_tokens"]).alias("stopword_ratio"),
        q["passes"].alias("passes_quality"),
    ).orderBy("doc_id")


@query(
    "x4_fingerprint",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, string_split({SQL_NORM.format(c='text')}, ' ') AS toks
      FROM documents
    ), grams AS (
      SELECT doc_id, toks[g.i] || ' ' || toks[g.i + 1] || ' ' || toks[g.i + 2] AS gram
      FROM tok, LATERAL (SELECT unnest(range(1, len(toks) - 1)) AS i) g
    )
    SELECT doc_id, MIN(md5(gram)) AS fingerprint
    FROM grams
    GROUP BY doc_id
    ORDER BY doc_id
    """,
    tags=("X4", "X2", "F6"),
)
def x4_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: min-hash over rolling word trigrams (winnowing
    with window = whole doc) — a single stable 128-bit id per document that
    survives token reordering-free edits.

    Shape: materialized tokens -> explode grams -> codegen md5 -> two-phase
    MIN agg. The earlier HOF form (array_min over a transform referencing an
    inline token expression) re-ran the full tokenize chain for every
    getItem inside the lambda — Spark disables common-subexpression
    elimination in lambda bodies — costing ~60s at sf0.1 vs ~1s for this
    plan."""
    d = spread(T(spark, sf_dir, "documents"))
    grams = (
        with_tokens(d)
        .select("doc_id", F.explode(gram3_expr(F.col("toks"))).alias("gram"))
        .filter(F.length("gram") > 0)
    )
    return (
        grams.groupBy("doc_id")
        .agg(F.min(F.md5(F.col("gram").cast("binary"))).alias("fingerprint"))
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# x4_ngram_lm_score — bigram language-model quality scoring

_LM_Q4 = "FLOOR({x} * 10000.0 + 0.5) / 10000.0"


_LM_SQL = f"""
    WITH tok AS (
      SELECT doc_id, source,
             list_filter(string_split({SQL_NORM.format(c='text')}, ' '),
                         t -> length(t) > 0) AS toks
      FROM documents
    ), bi AS (
      SELECT doc_id, source, toks[g.i] AS w1, toks[g.i] || ' ' || toks[g.i + 1] AS bg
      FROM tok, LATERAL (SELECT unnest(range(1, len(toks))) AS i) g
      WHERE len(toks) >= 2
    ), bg_counts AS (
      SELECT source, bg, COUNT(*) AS c_bg FROM bi GROUP BY source, bg
    ), w1_counts AS (
      SELECT source, w1, COUNT(*) AS c_w1 FROM bi GROUP BY source, w1
    ), vocab AS (
      SELECT source, COUNT(DISTINCT w1) AS v FROM bi GROUP BY source
    ), scored AS (
      SELECT b.doc_id, b.source,
             ln(CAST(c.c_bg + 1 AS DOUBLE) / (u.c_w1 + v.v)) AS lp
      FROM bi b
      JOIN bg_counts c ON c.source = b.source AND c.bg = b.bg
      JOIN w1_counts u ON u.source = b.source AND u.w1 = b.w1
      JOIN vocab v ON v.source = b.source
    )
    SELECT doc_id, source, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           {_LM_Q4.format(x='CAST(SUM(CAST(lp AS DECIMAL(38,18))) AS DOUBLE) / COUNT(*)')}
             AS avg_logprob
    FROM scored
    GROUP BY doc_id, source
    ORDER BY doc_id
    """


@query(
    "x4_ngram_lm_score",
    oracle=_LM_SQL,
    tags=("X4", "A1", "J1", "F3"),
)
def x4_ngram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM fluency scoring: each document's average log-probability
    under an add-one-smoothed bigram model of its OWN source — the
    KenLM-style perplexity filter of a training-data pipeline (docs far
    below their source's typical score are boilerplate/garbled).

    Scale shape: the bigram MODEL is vocabulary²-bounded, not corpus-sized
    — so it is aggregated once (two-phase groupBy whose map-side combine
    collapses each partition to its distinct bigrams before the shuffle)
    and then joined back over the streaming corpus via lm_model_route:
    BROADCAST while the measured model row count fits
    LM_BROADCAST_MAX_MODEL_ROWS (the scoring join then moves zero corpus
    bytes), plain shuffle equi-join on (source, bg) once the corpus-grown
    type table outgrows what executors can replicate — so the operator
    absorbs 100x by adding machines instead of OOMing the broadcast. The
    only corpus-sized shuffle either way is the per-doc aggregate, which
    partial-aggregates to (doc, decimal-sum, count) rows map-side. (The
    original always-equi-join formulation checkpointed and re-shuffled the
    full exploded bigram frame twice; at 10x data the wall factor dropped
    ~4.2x -> ~1.3x with the small-model broadcast form — the route keeps
    that win where it is safe.) Determinism across engines: ln() inputs are identical
    rationals, and the per-doc sum runs in DECIMAL(38,18) — exact integer
    arithmetic, so accumulation order cannot change the result."""
    d = spread(T(spark, sf_dir, "documents"))
    tok_df = with_tokens(d, ("doc_id", "source"))
    n = F.size("toks")
    # when()-guard instead of a pre-explode filter: explode(NULL) emits no
    # rows, so this equals filter(n >= 2) + explode — without handing the
    # optimizer a pushable predicate that would re-inline the tokenizer
    # below with_tokens' projection (r12, guide §2.3/§4: with_tokens no
    # longer shuffles, so the projection is the only tokenize barrier)
    bi = (
        tok_df.select(
            "doc_id",
            "source",
            F.explode(
                F.when(
                    n >= 2,
                    F.transform(
                        F.sequence(F.lit(0), n - 2),
                        lambda i: F.struct(
                            F.col("toks")[i].alias("w1"),
                            F.concat_ws(
                                " ", F.col("toks")[i], F.col("toks")[i + 1]
                            ).alias("bg"),
                        ),
                    ),
                )
            ).alias("g"),
        )
        .select("doc_id", "source", F.col("g.w1").alias("w1"), F.col("g.bg").alias("bg"))
    )
    # (source, bg) determines w1 (the bigram's first token), so the prefix
    # count c_w1 is a window SUM over the vocabulary-sized bg_counts frame —
    # not a second aggregate over (and join against) the corpus-sized bigram
    # frame. Same for vocab. Net: ONE bigram-sized shuffle join instead of
    # two, and all count arithmetic happens on the small side.
    from pyspark.sql import Window as _W

    bg_counts = bi.groupBy("source", "w1", "bg").agg(F.count("*").alias("c_bg"))
    bg_enriched = bg_counts.withColumn(
        "c_w1", F.sum("c_bg").over(_W.partitionBy("source", "w1"))
    ).localCheckpoint(eager=False)  # model materializes once, then broadcasts
    # ONE measurement job (r10 verdict ask #2): the per-source aggregate
    # collected here materializes the model checkpoint, yields the route
    # count lm_model_route would otherwise re-measure, AND collapses the
    # per-source vocab to a driver-side literal frame — so the scoring job
    # joins a local relation instead of re-aggregating the model. Sources
    # are a bounded set (single-digit rows at any corpus size), so the
    # collect is constant-size.
    stats = (
        bg_enriched.groupBy("source")
        .agg(F.countDistinct("w1").alias("v"), F.count("*").alias("nm"))
        .collect()
    )
    n_model = sum(int(r["nm"]) for r in stats)
    vocab = spark.createDataFrame(
        [(r["source"], int(r["v"])) for r in stats], "source string, v long"
    )
    # lp computed on the MODEL side before the corpus join (the r11
    # domain-fit trick): ln() once per distinct (source,bg) type, and the
    # routed side narrows to (source, bg, lp)
    lp = F.log((F.col("c_bg") + 1).cast("double") / (F.col("c_w1") + F.col("v")))
    model_lp = (
        bg_enriched.drop("w1")
        .join(F.broadcast(vocab), "source")
        .select("source", "bg", lp.alias("lp"))
    )
    scored = (
        bi.drop("w1")
        .join(lm_model_route(model_lp, n_rows=n_model), ["source", "bg"])
        .select("doc_id", "source", "lp")
    )
    avg_lp = (
        F.sum(F.col("lp").cast("decimal(38,18)")).cast("double") / F.count("*")
    )
    return (
        scored.groupBy("doc_id", "source")
        .agg(
            F.count("*").alias("n_bigrams"),
            (F.floor(avg_lp * 10000.0 + 0.5) / 10000.0).alias("avg_logprob"),
        )
        .orderBy("doc_id")
    )



# ---------------------------------------------------------------------------
# x4_domain_fit_score — domain-distinctiveness by excess log-likelihood

_DFIT_Q = "CAST(SUM(CAST({lp} AS DECIMAL(38,18))) AS DOUBLE) / COUNT(*)"

_DFIT_SQL = f"""
    WITH tok AS (
      SELECT doc_id, source,
             list_filter(string_split({SQL_NORM.format(c='text')}, ' '),
                         t -> length(t) > 0) AS toks
      FROM documents
    ), bi AS (
      SELECT doc_id, source, toks[g.i] AS w1, toks[g.i] || ' ' || toks[g.i + 1] AS bg
      FROM tok, LATERAL (SELECT unnest(range(1, len(toks))) AS i) g
      WHERE len(toks) >= 2
    ), s_bg AS (
      SELECT source, bg, COUNT(*) AS c_bg FROM bi GROUP BY source, bg
    ), s_w1 AS (
      SELECT source, w1, COUNT(*) AS c_w1 FROM bi GROUP BY source, w1
    ), s_v AS (
      SELECT source, COUNT(DISTINCT w1) AS v FROM bi GROUP BY source
    ), g_bg AS (
      SELECT bg, COUNT(*) AS g_bg FROM bi GROUP BY bg
    ), g_w1 AS (
      SELECT w1, COUNT(*) AS g_w1 FROM bi GROUP BY w1
    ), g_v AS (
      SELECT COUNT(DISTINCT w1) AS vg FROM bi
    ), scored AS (
      SELECT b.doc_id, b.source,
             ln(CAST(s.c_bg + 1 AS DOUBLE) / (u.c_w1 + v.v)) AS lp_src,
             ln(CAST(g.g_bg + 1 AS DOUBLE) / (w.g_w1 + gv.vg)) AS lp_glb
      FROM bi b
      JOIN s_bg s ON s.source = b.source AND s.bg = b.bg
      JOIN s_w1 u ON u.source = b.source AND u.w1 = b.w1
      JOIN s_v v ON v.source = b.source
      JOIN g_bg g ON g.bg = b.bg
      JOIN g_w1 w ON w.w1 = b.w1
      CROSS JOIN g_v gv
    )
    SELECT doc_id, source, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           {{q_src}} AS src_avg_lp,
           {{q_glb}} AS glb_avg_lp,
           {{q_fit}} AS domain_fit
    FROM scored
    GROUP BY doc_id, source
    ORDER BY doc_id
    """.format(
    q_src=_LM_Q4.format(x=_DFIT_Q.format(lp="lp_src")),
    q_glb=_LM_Q4.format(x=_DFIT_Q.format(lp="lp_glb")),
    q_fit=_LM_Q4.format(
        x=f"({_DFIT_Q.format(lp='lp_src')} - {_DFIT_Q.format(lp='lp_glb')})"
    ),
)


@query(
    "x4_domain_fit_score",
    oracle=_DFIT_SQL,
    tags=("X4", "X6", "A1", "J1", "F3"),
)
def x4_domain_fit_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-distinctiveness scoring by EXCESS log-likelihood: each doc's
    average bigram log-prob under its own SOURCE's add-one model minus
    under the GLOBAL (all-sources-pooled) model — the data-selection
    signal of the DSIR/DoReMi family (Xie et al. 2023) in its
    cheap-proxy-LM form (CCNet uses the same excess-vs-reference shape
    for quality): docs with high domain_fit are what make their domain a
    domain (keep for domain-balance targets), docs near zero are generic,
    and strongly negative docs are likely mis-sourced or boilerplate.

    Scale shape — the model-CONTRACTION discipline (the kn3 lesson): the
    global model is NOT a second corpus aggregation; it is the source
    model's contraction (SUM over sources of the vocabulary²-bounded
    count table), so the corpus is tokenized and shuffled ONCE, and all
    global statistics are aggregates/windows over the model frame. Both
    scoring joins ride lm_model_route on measured counts (the global
    table's distinct-bg count routes its own join); per-source vocab
    collapses to a literal frame in the same ONE measurement job the
    route count needs (the x4_ngram_lm_score r11 shape). Determinism:
    identical integer counts feed identical ln/divide expressions; per-doc
    sums accumulate in DECIMAL(38,18); domain_fit subtracts the two raw
    averages BEFORE its single 4-dp quantization, so shuffle order can
    never reach any output."""
    from pyspark.sql import Window as _W

    d = spread(T(spark, sf_dir, "documents"))
    tok_df = with_tokens(d, ("doc_id", "source"))
    n = F.size("toks")
    # when()-guard instead of a pre-explode filter: explode(NULL) emits no
    # rows, so this equals filter(n >= 2) + explode — without handing the
    # optimizer a pushable predicate that would re-inline the tokenizer
    # below with_tokens' projection (r12, guide §2.3/§4: with_tokens no
    # longer shuffles, so the projection is the only tokenize barrier)
    bi = (
        tok_df.select(
            "doc_id",
            "source",
            F.explode(
                F.when(
                    n >= 2,
                    F.transform(
                        F.sequence(F.lit(0), n - 2),
                        lambda i: F.struct(
                            F.col("toks")[i].alias("w1"),
                            F.concat_ws(
                                " ", F.col("toks")[i], F.col("toks")[i + 1]
                            ).alias("bg"),
                        ),
                    ),
                )
            ).alias("g"),
        )
        .select("doc_id", "source", F.col("g.w1").alias("w1"), F.col("g.bg").alias("bg"))
    )
    bg_counts = bi.groupBy("source", "w1", "bg").agg(F.count("*").alias("c_bg"))
    src = bg_counts.withColumn(
        "c_w1", F.sum("c_bg").over(_W.partitionBy("source", "w1"))
    ).localCheckpoint(eager=False)
    # global model = contraction of the source model: zero corpus traffic
    gbl = src.groupBy("w1", "bg").agg(F.sum("c_bg").alias("g_bg")).withColumn(
        "g_w1", F.sum("g_bg").over(_W.partitionBy("w1"))
    )
    # ONE measurement job per model frame: per-source stats (route count +
    # vocab literals) over the materialized checkpoint, then the global
    # scalars (pooled vocab + distinct-bg route count) over the same
    # checkpointed rows
    stats = (
        src.groupBy("source")
        .agg(F.countDistinct("w1").alias("v"), F.count("*").alias("nm"))
        .collect()
    )
    n_src = sum(int(r["nm"]) for r in stats)
    vocab = spark.createDataFrame(
        [(r["source"], int(r["v"])) for r in stats], "source string, v long"
    )
    g_row = src.agg(
        F.countDistinct("w1").alias("vg"), F.countDistinct("bg").alias("ng")
    ).first()
    v_g, n_gbl = int(g_row["vg"]), int(g_row["ng"])

    # log-probs are functions of MODEL rows alone, so compute them on the
    # model side BEFORE the corpus joins: ln() runs once per distinct
    # (source,bg) / (bg) type instead of once per corpus occurrence, and
    # the joined/broadcast sides narrow to (keys, one double). Identical
    # rationals feed identical expressions, so values (and the oracle
    # hash) are unchanged — only where the work happens moves.
    src_lp = src.join(F.broadcast(vocab), "source").select(
        "source",
        "bg",
        F.log(
            (F.col("c_bg") + 1).cast("double") / (F.col("c_w1") + F.col("v"))
        ).alias("lp_src"),
    )
    gbl_lp = gbl.select(
        "bg",
        F.log(
            (F.col("g_bg") + 1).cast("double") / (F.col("g_w1") + F.lit(v_g))
        ).alias("lp_glb"),
    )
    scored = (
        bi.drop("w1")
        .join(lm_model_route(src_lp, n_rows=n_src), ["source", "bg"])
        .join(lm_model_route(gbl_lp, n_rows=n_gbl), ["bg"])
        .select("doc_id", "source", "lp_src", "lp_glb")
    )
    from otlp2parquet_spark.queries.relational import quant4

    davg = lambda c: (  # noqa: E731
        F.sum(F.col(c).cast("decimal(38,18)")).cast("double") / F.count("*")
    )
    return (
        scored.groupBy("doc_id", "source")
        .agg(
            F.count("*").alias("n_bigrams"),
            quant4(davg("lp_src")).alias("src_avg_lp"),
            quant4(davg("lp_glb")).alias("glb_avg_lp"),
            quant4(davg("lp_src") - davg("lp_glb")).alias("domain_fit"),
        )
        .orderBy("doc_id")
    )

# ---------------------------------------------------------------------------
# x4_kn_lm_score — interpolated Kneser-Ney bigram scoring

_KN_SQL = f"""
    WITH tok AS (
      SELECT doc_id, source,
             list_filter(string_split({SQL_NORM.format(c='text')}, ' '),
                         t -> length(t) > 0) AS toks
      FROM documents
    ), bi AS (
      SELECT doc_id, source, toks[g.i] AS w1, toks[g.i + 1] AS w2
      FROM tok, LATERAL (SELECT unnest(range(1, len(toks))) AS i) g
      WHERE len(toks) >= 2
    ), model AS (
      SELECT source, w1, w2, COUNT(*) AS c_bg FROM bi GROUP BY source, w1, w2
    ), enriched AS (
      SELECT source, w1, w2, c_bg,
             SUM(c_bg) OVER (PARTITION BY source, w1) AS c_w1,
             COUNT(*) OVER (PARTITION BY source, w1) AS n1_fwd,
             COUNT(*) OVER (PARTITION BY source, w2) AS n1_bwd,
             COUNT(*) OVER (PARTITION BY source) AS n1_total
      FROM model
    ), scored AS (
      SELECT b.doc_id, b.source,
             ln((GREATEST(CAST(e.c_bg AS DOUBLE) - 0.75, 0.0)
                 + (0.75 * e.n1_fwd)
                   * (CAST(e.n1_bwd AS DOUBLE) / e.n1_total))
                / CAST(e.c_w1 AS DOUBLE)) AS lp
      FROM bi b
      JOIN enriched e ON e.source = b.source AND e.w1 = b.w1 AND e.w2 = b.w2
    )
    SELECT doc_id, source, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           {_LM_Q4.format(x='CAST(SUM(CAST(lp AS DECIMAL(38,18))) AS DOUBLE) / COUNT(*)')}
             AS kn_avg_logprob
    FROM scored
    GROUP BY doc_id, source
    ORDER BY doc_id
    """


@query(
    "x4_kn_lm_score",
    oracle=_KN_SQL,
    tags=("X4", "A1", "J1", "F3"),
)
def x4_kn_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram scoring (Kneser & Ney 1995; Chen &
    Goodman 1999, both public): the smoothing the CCNet-class quality
    filters actually ship, upgrading x4_ngram_lm_score's add-one model.
    P(w2|w1) = (max(c(w1,w2)-D, 0) + D * N1+(w1*) * Pcont(w2)) / c(w1)
    with D = 0.75 and Pcont(w2) = N1+(*w2)/N1+(**) — the continuation
    probability that makes KN discount frequent-but-unproductive words
    ("francisco" follows only "san") instead of raw-frequency smoothing.

    Scale shape (same contract as x4_ngram_lm_score): the MODEL is
    vocabulary²-bounded — the corpus collapses to distinct (source,w1,w2)
    counts via one map-side-combined shuffle, and every KN statistic
    (prefix total c_w1, forward type count N1+(w1*), continuation count
    N1+(*w2), type total N1+(**)) is a window over that MODEL frame, so
    the continuation counts cost zero corpus traffic. The enriched model
    joins back over the corpus bigrams via lm_model_route (broadcast while
    its measured row count fits LM_BROADCAST_MAX_MODEL_ROWS, shuffle
    equi-join once the corpus-grown type table outgrows it); the only
    corpus-sized shuffle is the per-doc aggregate, partial-aggregated
    map-side.
    Determinism: both engines evaluate the identical parenthesized IEEE
    expression on identical integer counts, and the per-doc sum runs in
    DECIMAL(38,18) before one 4-dp quantization — accumulation order
    cannot reach the result."""
    d = spread(T(spark, sf_dir, "documents"))
    tok_df = with_tokens(d, ("doc_id", "source"))
    n = F.size("toks")
    # when()-guard, not a pre-explode filter: keeps the tokenizer from
    # being re-inlined below with_tokens' projection (see x4_ngram_lm_score)
    bi = (
        tok_df.select(
            "doc_id",
            "source",
            F.explode(
                F.when(
                    n >= 2,
                    F.transform(
                        F.sequence(F.lit(0), n - 2),
                        lambda i: F.struct(
                            F.col("toks")[i].alias("w1"),
                            F.col("toks")[i + 1].alias("w2"),
                        ),
                    ),
                )
            ).alias("g"),
        )
        .select("doc_id", "source", F.col("g.w1").alias("w1"), F.col("g.w2").alias("w2"))
    )
    from pyspark.sql import Window as _W

    model = bi.groupBy("source", "w1", "w2").agg(F.count("*").alias("c_bg"))
    one = F.count(F.lit(1))
    enriched = (
        model.withColumn("c_w1", F.sum("c_bg").over(_W.partitionBy("source", "w1")))
        .withColumn("n1_fwd", one.over(_W.partitionBy("source", "w1")))
        .withColumn("n1_bwd", one.over(_W.partitionBy("source", "w2")))
        .withColumn("n1_total", one.over(_W.partitionBy("source")))
        .localCheckpoint(eager=False)  # model materializes once, then broadcasts
    )
    # measured ONCE here (the kn3/t18 discipline, r10 verdict ask #2) and
    # threaded into the route instead of lm_model_route re-counting
    n_model = enriched.count()
    # identical parenthesization to the oracle's lp expression (see there);
    # computed on the MODEL side before the corpus join (the r11
    # domain-fit trick): ln() runs once per distinct type, not once per
    # corpus occurrence, and the routed side narrows to (keys, one double)
    lp = F.log(
        (
            F.greatest(F.col("c_bg").cast("double") - 0.75, F.lit(0.0))
            + (F.lit(0.75) * F.col("n1_fwd"))
            * (F.col("n1_bwd").cast("double") / F.col("n1_total"))
        )
        / F.col("c_w1").cast("double")
    )
    model_lp = enriched.select("source", "w1", "w2", lp.alias("lp"))
    scored = bi.join(
        lm_model_route(model_lp, n_rows=n_model), ["source", "w1", "w2"]
    ).select("doc_id", "source", "lp")
    avg_lp = (
        F.sum(F.col("lp").cast("decimal(38,18)")).cast("double") / F.count("*")
    )
    return (
        scored.groupBy("doc_id", "source")
        .agg(
            F.count("*").alias("n_bigrams"),
            (F.floor(avg_lp * 10000.0 + 0.5) / 10000.0).alias("kn_avg_logprob"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# x4_kn3_lm_score — interpolated Kneser-Ney TRIGRAM scoring (full backoff)

_KN3_SQL = f"""
    WITH tok AS (
      SELECT doc_id, source,
             list_filter(string_split({SQL_NORM.format(c='text')}, ' '),
                         t -> length(t) > 0) AS toks
      FROM documents
    ), tri AS (
      SELECT doc_id, source,
             toks[g.i] AS w1, toks[g.i + 1] AS w2, toks[g.i + 2] AS w3
      FROM tok, LATERAL (SELECT unnest(range(1, len(toks) - 1)) AS i) g
      WHERE len(toks) >= 3
    ), t3 AS (
      SELECT source, w1, w2, w3, COUNT(*) AS c123
      FROM tri GROUP BY source, w1, w2, w3
    ), t3e AS (
      SELECT source, w1, w2, w3, c123,
             SUM(c123) OVER (PARTITION BY source, w1, w2) AS c12,
             COUNT(*) OVER (PARTITION BY source, w1, w2) AS n1f12
      FROM t3
    ), m23 AS (
      SELECT source, w2, w3, COUNT(*) AS n1b23
      FROM t3 GROUP BY source, w2, w3
    ), m23e AS (
      SELECT source, w2, w3, n1b23,
             SUM(n1b23) OVER (PARTITION BY source, w2) AS nmid_w2,
             COUNT(*) OVER (PARTITION BY source, w2) AS nf_w2,
             COUNT(*) OVER (PARTITION BY source, w3) AS n1b3,
             COUNT(*) OVER (PARTITION BY source) AS ntot
      FROM m23
    ), model AS (
      SELECT e.source, e.w1, e.w2, e.w3, e.c123, e.c12, e.n1f12,
             m.n1b23, m.nmid_w2, m.nf_w2, m.n1b3, m.ntot
      FROM t3e e JOIN m23e m
        ON m.source = e.source AND m.w2 = e.w2 AND m.w3 = e.w3
    ), scored AS (
      SELECT t.doc_id, t.source,
             ln((GREATEST(CAST(mo.c123 AS DOUBLE) - 0.75, 0.0)
                 + (0.75 * mo.n1f12)
                   * ((GREATEST(CAST(mo.n1b23 AS DOUBLE) - 0.75, 0.0)
                       + (0.75 * mo.nf_w2)
                         * (CAST(mo.n1b3 AS DOUBLE) / mo.ntot))
                      / CAST(mo.nmid_w2 AS DOUBLE)))
                / CAST(mo.c12 AS DOUBLE)) AS lp
      FROM tri t
      JOIN model mo ON mo.source = t.source AND mo.w1 = t.w1
                   AND mo.w2 = t.w2 AND mo.w3 = t.w3
    )
    SELECT doc_id, source, CAST(COUNT(*) AS BIGINT) AS n_trigrams,
           {_LM_Q4.format(x='CAST(SUM(CAST(lp AS DECIMAL(38,18))) AS DOUBLE) / COUNT(*)')}
             AS kn3_avg_logprob
    FROM scored
    GROUP BY doc_id, source
    ORDER BY doc_id
    """


@query(
    "x4_kn3_lm_score",
    oracle=_KN3_SQL,
    tags=("X4", "A1", "J1", "F3"),
)
def x4_kn3_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney TRIGRAM scoring with the full backoff
    recursion (Chen & Goodman 1999 §4.1.6 — the construction KN is named
    for, which x4_kn_lm_score's single bigram level cannot show):
      P3(w3|w1w2) = (max(c123-D,0) + D*N1+(w1w2*)*P2(w3|w2)) / c(w1w2)
      P2(w3|w2)   = (max(N1+(*w2w3)-D,0) + D*N1+(w2*)*P1(w3)) / N1+(*w2*)
      P1(w3)      = N1+(*w3) / N1+(**)
    with D = 0.75. The middle and bottom layers use TYPE (continuation)
    counts, not raw frequencies — all derived here from the trigram type
    table (a deliberate, documented estimator choice: boundary bigrams
    with no preceding token contribute no type; both engines share it).

    Scale shape: ONE corpus-sized shuffle total (the trigram count); every
    other statistic is a window or aggregate over the vocab³-bounded type
    table and its (w2,w3) contraction, joined model-side before ONE
    lm_model_route join back over the corpus trigrams (broadcast while the
    measured type-table rows fit LM_BROADCAST_MAX_MODEL_ROWS — the trigram
    table is the family's fastest-growing model, ~2M rows at a 100x sf0.1
    corpus, so it is the first to take the shuffle route). The per-doc aggregate
    partial-aggregates map-side. Determinism: nested identical IEEE
    parenthesization over exact integer counts, DECIMAL(38,18) per-doc
    accumulation, one 4-dp quantization."""
    d = spread(T(spark, sf_dir, "documents"))
    tok_df = with_tokens(d, ("doc_id", "source"))
    n = F.size("toks")
    # when()-guard, not a pre-explode filter (see x4_ngram_lm_score)
    tri = (
        tok_df.select(
            "doc_id",
            "source",
            F.explode(
                F.when(
                    n >= 3,
                    F.transform(
                        F.sequence(F.lit(0), n - 3),
                        lambda i: F.struct(
                            F.col("toks")[i].alias("w1"),
                            F.col("toks")[i + 1].alias("w2"),
                            F.col("toks")[i + 2].alias("w3"),
                        ),
                    ),
                )
            ).alias("g"),
        )
        .select("doc_id", "source", "g.w1", "g.w2", "g.w3")
    )
    from pyspark.sql import Window as _W

    one = F.count(F.lit(1))
    # materialize + count the trigram type table ONCE: the construction
    # join below is 1:1 on (source,w2,w3) (every t3 row matches exactly one
    # m23e row), so this count IS the model row count — one measurement
    # routes both joins
    t3 = (
        tri.groupBy("source", "w1", "w2", "w3")
        .agg(F.count("*").alias("c123"))
        .localCheckpoint(eager=False)
    )
    n_model = t3.count()
    t3e = t3.withColumn(
        "c12", F.sum("c123").over(_W.partitionBy("source", "w1", "w2"))
    ).withColumn("n1f12", one.over(_W.partitionBy("source", "w1", "w2")))
    m23 = t3.groupBy("source", "w2", "w3").agg(F.count("*").alias("n1b23"))
    m23e = (
        m23.withColumn("nmid_w2", F.sum("n1b23").over(_W.partitionBy("source", "w2")))
        .withColumn("nf_w2", one.over(_W.partitionBy("source", "w2")))
        .withColumn("n1b3", one.over(_W.partitionBy("source", "w3")))
        .withColumn("ntot", one.over(_W.partitionBy("source")))
    )
    # the construction join is model-vs-model sized on BOTH sides, so it
    # rides the same measured route: broadcast the (≤ t3-sized) contraction
    # below the threshold, pinned SMJ above it — an aggregate over the
    # exploded corpus inherits the same meaningless size estimate that made
    # the un-hinted scoring join broadcast the corpus (see lm_model_route)
    model = t3e.join(
        lm_model_route(m23e, n_rows=n_model), ["source", "w2", "w3"]
    )
    # identical nested parenthesization to the oracle's lp (see there)
    p1 = F.col("n1b3").cast("double") / F.col("ntot")
    p2 = (
        F.greatest(F.col("n1b23").cast("double") - 0.75, F.lit(0.0))
        + (F.lit(0.75) * F.col("nf_w2")) * p1
    ) / F.col("nmid_w2").cast("double")
    p3 = (
        F.greatest(F.col("c123").cast("double") - 0.75, F.lit(0.0))
        + (F.lit(0.75) * F.col("n1f12")) * p2
    ) / F.col("c12").cast("double")
    # lp computed on the MODEL side before the corpus join (the r11
    # domain-fit trick): the full backoff recursion evaluates once per
    # distinct trigram type, and the routed side narrows to (keys, lp)
    model_lp = model.select("source", "w1", "w2", "w3", F.log(p3).alias("lp"))
    scored = tri.join(
        lm_model_route(model_lp, n_rows=n_model), ["source", "w1", "w2", "w3"]
    ).select("doc_id", "source", "lp")
    avg_lp = (
        F.sum(F.col("lp").cast("decimal(38,18)")).cast("double") / F.count("*")
    )
    return (
        scored.groupBy("doc_id", "source")
        .agg(
            F.count("*").alias("n_trigrams"),
            (F.floor(avg_lp * 10000.0 + 0.5) / 10000.0).alias("kn3_avg_logprob"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# T18 frozen-LM deploy kernel: train an add-one bigram LM once, FREEZE it,
# score any corpus against the frozen counts — the CCNet production loop
# (train KenLM offline, score at ingest). Shared by the batch twin
# (streaming/batch_twins.py t18_lm_score_frozen) and the live lane
# (streaming/pipeline.py lmscore_stream), so the scoring expression exists
# exactly once. Unlike x4_ngram_lm_score (which models each doc's OWN
# corpus), the frozen form must score OOV events totally: unseen bigram ->
# c_bg=0 (the +1 smoothing handles it), unseen prefix word -> c_w1=0,
# unseen source -> v=1, all via COALESCE so both engines stay identical.


def lm_doc_bigrams(docs: DataFrame) -> DataFrame:
    """(doc_id, source, w1, w2) bigram stream — the one tokenization both
    training and scoring run (the hh_token_stream discipline)."""
    tok_df = with_tokens(docs, ("doc_id", "source"))
    n = F.size("toks")
    # when()-guard, not a pre-explode filter (see x4_ngram_lm_score)
    return (
        tok_df.select(
            "doc_id",
            "source",
            F.explode(
                F.when(
                    n >= 2,
                    F.transform(
                        F.sequence(F.lit(0), n - 2),
                        lambda i: F.struct(
                            F.col("toks")[i].alias("w1"),
                            F.col("toks")[i + 1].alias("w2"),
                        ),
                    ),
                )
            ).alias("g"),
        )
        .select("doc_id", "source", "g.w1", "g.w2")
    )


def lm_model_frames(
    train_docs: DataFrame,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(model, prefix, vocab) count frames from a training corpus: distinct
    (source,w1,w2) bigram counts, per-(source,w1) prefix totals, per-source
    distinct-prefix vocab — the entire artifact is type-table-bounded. The
    model is localCheckpoint-ed so prefix/vocab (and the caller's routing
    count) derive from ONE materialized corpus pass, never three."""
    bi = lm_doc_bigrams(train_docs)
    model = (
        bi.groupBy("source", "w1", "w2")
        .agg(F.count("*").alias("c_bg"))
        .localCheckpoint(eager=False)
    )
    prefix = model.groupBy("source", "w1").agg(F.sum("c_bg").alias("c_w1"))
    vocab = prefix.groupBy("source").agg(F.count("*").alias("v"))
    return model, prefix, vocab


def lm_score_frozen(
    docs: DataFrame,
    model: DataFrame,
    prefix: DataFrame,
    vocab: DataFrame,
    n_model: int,
    n_prefix: int | None = None,
) -> DataFrame:
    """Score `docs` against a FROZEN add-one bigram model:
    lp = ln((c_bg+1) / (c_w1+v)) with the OOV coalesces above; per-doc
    DECIMAL(38,18) accumulation and one 4-dp quantization (the
    x4_ngram_lm_score exactness discipline). The two type-table joins ride
    lm_model_route on caller-measured counts: the prefix frame (distinct
    (source,w1) — strictly <= model rows) routes on its OWN n_prefix when
    the caller measured it (lm_read_model returns both from one aggregate
    job), so an over-threshold model no longer forgoes a likely-safe
    broadcast of the smaller prefix side (the r10 ADVICE item);
    n_prefix=None conservatively falls back to n_model. vocab is one row
    per source and always broadcasts.
    Output: (doc_id, source, n_bigrams, lm_score)."""
    bi = lm_doc_bigrams(docs)
    scored = (
        bi.join(lm_model_route(model, n_rows=n_model), ["source", "w1", "w2"], "left")
        .join(
            lm_model_route(
                prefix, n_rows=n_model if n_prefix is None else n_prefix
            ),
            ["source", "w1"],
            "left",
        )
        .join(F.broadcast(vocab), ["source"], "left")
        .select(
            "doc_id",
            "source",
            F.log(
                (F.coalesce(F.col("c_bg"), F.lit(0)) + 1).cast("double")
                / (
                    F.coalesce(F.col("c_w1"), F.lit(0))
                    + F.coalesce(F.col("v"), F.lit(1))
                )
            ).alias("lp"),
        )
    )
    avg_lp = (
        F.sum(F.col("lp").cast("decimal(38,18)")).cast("double") / F.count("*")
    )
    # NO trailing orderBy: the streaming deploy path calls this per
    # micro-batch and a global sort would add a range-partition exchange to
    # every ingest batch for ordering the epoch sink doesn't need — the
    # batch twin applies its own orderBy for the oracle compare (the
    # hll_reg_buckets convention)
    return scored.groupBy("doc_id", "source").agg(
        F.count("*").alias("n_bigrams"),
        (F.floor(avg_lp * 10000.0 + 0.5) / 10000.0).alias("lm_score"),
    )


def lm_write_model(train_docs: DataFrame, artifact_dir: str) -> None:
    """Persist the frozen model as three parquet tables under
    artifact_dir/{model,prefix,vocab} — the qc_write_model/T12 frozen-
    artifact discipline applied to the LM family."""
    import os

    model, prefix, vocab = lm_model_frames(train_docs)
    model.write.mode("overwrite").parquet(os.path.join(artifact_dir, "model"))
    prefix.write.mode("overwrite").parquet(os.path.join(artifact_dir, "prefix"))
    vocab.write.mode("overwrite").parquet(os.path.join(artifact_dir, "vocab"))


LM_MODEL_SCHEMA = "source string, w1 string, w2 string, c_bg long"
LM_PREFIX_SCHEMA = "source string, w1 string, c_w1 long"
LM_VOCAB_SCHEMA = "source string, v long"


def lm_read_model(
    spark: SparkSession, artifact_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame, int, int]:
    """Read the frozen artifact back; the returned n_model and n_prefix
    (measured ONCE — one aggregate job over the model, since the prefix
    row count is by construction its distinct-(source,w1) count — not per
    batch) drive lm_model_route for every scoring call.

    Schemas are EXPLICIT (the decontam_read_benchset discipline): a model
    trained on a degenerate corpus (every doc <2 tokens) persists rowless
    parquet dirs (_SUCCESS only), where schema inference would raise at
    scoring startup instead of scoring every doc as all-OOV."""
    import os

    model = spark.read.schema(LM_MODEL_SCHEMA).parquet(
        os.path.join(artifact_dir, "model")
    )
    prefix = spark.read.schema(LM_PREFIX_SCHEMA).parquet(
        os.path.join(artifact_dir, "prefix")
    )
    vocab = spark.read.schema(LM_VOCAB_SCHEMA).parquet(
        os.path.join(artifact_dir, "vocab")
    )
    counts = model.agg(
        F.count("*").alias("nm"),
        F.countDistinct(F.struct("source", "w1")).alias("np"),
    ).first()
    return model, prefix, vocab, int(counts["nm"]), int(counts["np"])


# ---------------------------------------------------------------------------
# x4_pii_scrub — PII detection + redaction (emails / IPv4 / phone-shaped)

# Patterns restricted to the RE2-compatible subset (no lookaround, no
# backreferences) so Spark's Java regex engine and DuckDB's RE2 agree
# character-for-character — the same constraint normalized_text lives under.
_PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PII_IPV4 = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
_PII_PHONE = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"

# The driver corpus carries no PII, so the fixture lane injects synthetic
# identifiers deterministically from doc_id (the x5 synthesis pattern:
# both engines derive the identical input from the same formula, then the
# operator under test — the regex scrub — runs for real on both sides).
_PII_SQL_TEXT = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'"
    " || CASE WHEN doc_id % 3 = 0 THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR)"
    "          || '.0.' || CAST(doc_id % 100 AS VARCHAR) ELSE '' END"
    " || CASE WHEN doc_id % 7 = 0 THEN ' call 555-' || CAST(100 + doc_id % 900 AS VARCHAR)"
    "          || '-' || CAST(1000 + doc_id % 9000 AS VARCHAR) ELSE '' END"
)


@query(
    "x4_pii_scrub",
    oracle=f"""
    WITH pii AS (
      SELECT doc_id, {_PII_SQL_TEXT} AS t
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{_PII_EMAIL}')) AS BIGINT) AS n_email,
           CAST(len(regexp_extract_all(t, '{_PII_IPV4}')) AS BIGINT) AS n_ipv4,
           CAST(len(regexp_extract_all(t, '{_PII_PHONE}')) AS BIGINT) AS n_phone,
           md5(regexp_replace(regexp_replace(regexp_replace(t,
                 '{_PII_EMAIL}', '<EMAIL>', 'g'),
                 '{_PII_IPV4}', '<IP>', 'g'),
                 '{_PII_PHONE}', '<PHONE>', 'g')) AS scrubbed_md5,
           CAST(length(regexp_replace(regexp_replace(regexp_replace(t,
                 '{_PII_EMAIL}', '<EMAIL>', 'g'),
                 '{_PII_IPV4}', '<IP>', 'g'),
                 '{_PII_PHONE}', '<PHONE>', 'g')) AS BIGINT) AS scrubbed_len
    FROM pii
    ORDER BY doc_id
    """,
    tags=("X4", "P3", "F1"),
)
def x4_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing — the redaction pass every pretraining pipeline runs
    before release: detect and replace email / IPv4 / phone-shaped spans,
    reporting per-doc match counts plus an md5 of the scrubbed text (so
    the oracle pins the EXACT redacted output, not just the counts; a
    regex-dialect divergence between engines breaks the hash).

    The corpus carries no organic PII, so identifiers are injected
    deterministically from doc_id (the x5 fixture pattern) — the scrub
    itself runs for real, on both engines, over identical inputs.

    Scale shape: map-only — three regexp_replace passes fused into one
    projection over the scan; no shuffle, no UDF. At 100 TB this is the
    cheapest operator class there is (the regex engine is the only cost,
    same as normalized_text)."""
    d = spread(T(spark, sf_dir, "documents"))
    t = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit(" from 10."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit(".0."),
                (F.col("doc_id") % 100).cast("string"),
            ),
        ).otherwise(""),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.lit(" call 555-"),
                (F.lit(100) + F.col("doc_id") % 900).cast("string"),
                F.lit("-"),
                (F.lit(1000) + F.col("doc_id") % 9000).cast("string"),
            ),
        ).otherwise(""),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, _PII_EMAIL, "<EMAIL>"), _PII_IPV4, "<IP>"
        ),
        _PII_PHONE,
        "<PHONE>",
    )
    return d.select(
        "doc_id",
        F.regexp_count(t, F.lit(_PII_EMAIL)).alias("n_email"),
        F.regexp_count(t, F.lit(_PII_IPV4)).alias("n_ipv4"),
        F.regexp_count(t, F.lit(_PII_PHONE)).alias("n_phone"),
        F.md5(scrubbed.cast("binary")).alias("scrubbed_md5"),
        F.length(scrubbed).alias("scrubbed_len"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# x4_pretoken_count — BPE-style pretokenization counting

# GPT-2-style pretokenizer, restricted to the RE2-compatible subset (the
# original pattern's trailing-space lookahead and \p classes are not
# available in DuckDB's RE2): a pretoken is an optional leading space plus
# a letter run, digit run, or punctuation run; whitespace runs stand alone.
# This is the unit BPE merges operate on — counting them estimates subword
# token budgets ~linearly (unlike whitespace words, which undercount
# digits/punctuation-heavy text).
_PRETOKEN_RE = " ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 \\t\\r\\n]+|[ \\t\\r\\n]+"


@query(
    "x4_pretoken_count",
    oracle=f"""
    WITH c AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(text, '{_PRETOKEN_RE}')) AS BIGINT)
               AS n_pretokens,
             CAST(len(list_filter(string_split({SQL_NORM.format(c='text')}, ' '),
                                  t -> length(t) > 0)) AS BIGINT) AS n_words
      FROM documents
    )
    SELECT doc_id, n_pretokens, n_words,
           CASE WHEN n_words = 0 THEN NULL
                ELSE FLOOR(CAST(n_pretokens AS DOUBLE) / n_words * 10000.0
                           + 0.5) / 10000.0
           END AS subword_ratio
    FROM c
    ORDER BY doc_id
    """,
    tags=("X4", "P3", "F1"),
)
def x4_pretoken_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-style pretoken counting — the token-budget estimator pretraining
    pipelines run before any real tokenizer exists for the corpus: count
    GPT-2-shaped pretokens (space-prefixed letter/digit/punct runs, the
    units BPE merges operate on) next to whitespace words, and the
    subword expansion ratio between them. Both engines run the identical
    RE2-compatible pattern, so the count is oracle-matched, not
    approximated.

    Scale shape: map-only — one regexp_extract_all per row, no shuffle;
    the same cost class as normalized_text."""
    d = spread(T(spark, sf_dir, "documents"))
    n_pre = F.size(F.regexp_extract_all("text", F.lit(_PRETOKEN_RE), 0)).cast("long")
    n_words = token_count_expr(F.col("text")).cast("long")
    return d.select(
        "doc_id",
        n_pre.alias("n_pretokens"),
        n_words.alias("n_words"),
        F.when(n_words == 0, F.lit(None).cast("double"))
        .otherwise(quant4(n_pre.cast("double") / n_words))
        .alias("subword_ratio"),
        # no global sort: the compare is order-insensitive, and a range-
        # partitioned ORDER BY would re-execute the regex chain for its
        # sampling pass (the map-only rule from x6_hash_sample)
    ).sortWithinPartitions("doc_id")


# ---------------------------------------------------------------------------
# x4_bpe_train — distributed BPE merge training (the capstone over
# x4_pretoken_count): learn the first N merge rules of a byte-pair-encoding
# tokenizer from the corpus itself.

_BPE_ROUNDS = 10


def _apply_merge_expr(tokens_col, a: str, b: str):
    """Left-to-right, non-overlapping application of ONE merge rule (a,b) ->
    a+b over a symbol array — the exact greedy semantics of Sennrich-style
    BPE — as a pure Catalyst fold (F.aggregate), so the per-round rewrite is
    map-only JVM work with the pair as broadcast literals.

    Fold state: (out, carry). carry holds the last unmerged symbol; when
    (carry, next) == (a, b) the merged symbol goes straight to out and carry
    resets, so a merged token never re-merges within the same round
    ("aaaa" + (a,a) -> [aa, aa], not [aaa, a])."""
    merged = a + b
    acc0 = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("carry"),
    )

    def step(acc, s):
        return (
            F.when(acc.carry.isNull(), F.struct(acc.out.alias("out"), s.alias("carry")))
            .when(
                (acc.carry == F.lit(a)) & (s == F.lit(b)),
                F.struct(
                    F.concat(acc.out, F.array(F.lit(merged))).alias("out"),
                    F.lit(None).cast("string").alias("carry"),
                ),
            )
            .otherwise(
                F.struct(
                    F.concat(acc.out, F.array(acc.carry)).alias("out"),
                    s.alias("carry"),
                )
            )
        )

    def finish(acc):
        return F.when(acc.carry.isNull(), acc.out).otherwise(
            F.concat(acc.out, F.array(acc.carry))
        )

    return F.aggregate(tokens_col, acc0, step, finish)


def bpe_train(docs: DataFrame, rounds: int = _BPE_ROUNDS) -> list[tuple]:
    merges, _vocab = bpe_train_vocab(docs, rounds)
    return merges


def bpe_train_vocab(
    docs: DataFrame, rounds: int = _BPE_ROUNDS
) -> tuple[list[tuple], DataFrame]:
    """Learn `rounds` BPE merges over the documents' text column.

    Returns [(round, left, right, merged, pair_count, corpus_tokens), ...]
    where corpus_tokens is the total symbol count across the corpus AFTER
    applying that round's merge (the per-round compression ledger).

    Scale shape — the part that matters at 100 TB:
    - ONE corpus-sized shuffle total: pretokenize (the x4_pretoken_count
      regex) -> explode -> groupBy(pretoken) with map-side partial
      aggregation. Everything after runs on the VOCAB table (distinct
      pretokens + frequencies), which grows sublinearly with the corpus —
      this is why classic BPE trainers fold duplicates first.
    - Each merge round is: adjacent-pair explode + weighted groupBy over
      the vocab table (small shuffle), a 1-row driver collect (the argmax
      pair, deterministic tie-break count desc / left asc / right asc),
      then a map-only Catalyst fold applying the merge with the pair as
      broadcast literals. No Python in any per-row path.
    - The evolving vocab is localCheckpoint'ed per round: 10 rounds of
      nested F.aggregate folds would otherwise stack into one plan that
      re-executes the whole chain per round's pair-count job.

    Determinism: integer frequencies, lexicographic tie-breaks, and
    single-merge-per-round semantics make the merge list a pure function
    of the corpus — the pytest gate replays a pure-Python reference BPE
    and asserts bit-identical output (the T10 model-replay pattern;
    iterative argmax is not SQL-expressible, so this op is rows-only for
    the driver).

    Returns (merges, vocab): vocab is the post-merge symbol table
    (pretoken, tokens, freq) — the trained tokenizer itself, consumed by
    x4_bpe_encode to tokenize the corpus without re-deriving anything."""
    vocab = (
        docs.select(
            F.explode(
                F.regexp_extract_all("text", F.lit(_PRETOKEN_RE), 0)
            ).alias("pretoken")
        )
        .groupBy("pretoken")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(
            "pretoken",
            F.filter(F.split("pretoken", ""), lambda c: F.length(c) > 0).alias(
                "tokens"
            ),
            "freq",
        )
        .localCheckpoint()
    )
    out: list[tuple] = []
    for rnd in range(1, rounds + 1):
        n = F.size("tokens")
        pairs = (
            vocab.filter(n >= 2)
            .select(
                "freq",
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), n - 1),
                        lambda i: F.struct(
                            F.element_at(F.col("tokens"), i).alias("l"),
                            F.element_at(F.col("tokens"), i + 1).alias("r"),
                        ),
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").alias("cnt"))
        )
        top = pairs.orderBy(F.desc("cnt"), F.asc("l"), F.asc("r")).limit(1).collect()
        if not top:
            break
        a, b, cnt = top[0].l, top[0].r, int(top[0].cnt)
        vocab = vocab.select(
            "pretoken", _apply_merge_expr(F.col("tokens"), a, b).alias("tokens"), "freq"
        ).localCheckpoint()
        corpus_tokens = int(
            vocab.agg(F.sum(F.size("tokens") * F.col("freq"))).collect()[0][0]
        )
        out.append((rnd, a, b, a + b, cnt, corpus_tokens))
    return out, vocab


@query(
    "x4_bpe_train",
    oracle=None,  # iterative argmax: rows-only + pure-Python replay gate
    tags=("X4", "A1"),
)
def x4_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 10 learned BPE merge rules over the documents corpus, with the
    per-round pair count and post-merge corpus token count (see bpe_train
    for the dataflow and the 100-TB argument)."""
    merges = bpe_train(spread(T(spark, sf_dir, "documents")))
    return spark.createDataFrame(
        merges,
        "round int, left string, right string, merged string, "
        "pair_count long, corpus_tokens long",
    )


@query(
    "x4_bpe_encode",
    oracle=None,  # tokenizer derives from iterative training: rows-only +
    # pure-Python replay gate (tests/test_bpe_train.py)
    tags=("X4", "J1", "A1"),
)
def x4_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize the corpus with the learned BPE merges — the op a training
    pipeline runs after x4_bpe_train: per document, the pretoken count,
    pre-merge symbol count, post-merge BPE token count, and the achieved
    compression ratio.

    Scale shape: training already folded the corpus into the distinct-
    pretoken vocab and REWROTE it through every merge round, so the
    trained tokenizer IS the final vocab table (pretoken -> symbol array)
    — encoding never re-applies a merge. The corpus then makes one
    pretoken-explode pass joined against the vocab on pretoken (merge
    hint: the vocab is sublinear but corpus-dependent, so it must not be
    STATICALLY broadcast — AQE promotes it at runtime when measured small,
    the scale-bug-#1 discipline; AQE skew-join handles hot pretokens like
    ' the') and one groupBy(doc_id). No Python in any per-row path.

    Compression is quantized by integer math (floor(x*1e4+0.5)/1e4) like
    every float output; NULL for documents with no pretokens."""
    docs = spread(T(spark, sf_dir, "documents"))
    _merges, vocab = bpe_train_vocab(docs)
    enc = vocab.select("pretoken", F.size("tokens").alias("n_bpe"))
    # explode_outer keeps no-pretoken documents as one NULL-pretoken row, so
    # ONE corpus scan feeds the whole op (no doc_id membership re-scan); the
    # NULL never matches the vocab join and aggregates to zero counts
    pre = docs.select(
        "doc_id",
        F.explode_outer(
            F.regexp_extract_all("text", F.lit(_PRETOKEN_RE), 0)
        ).alias("pretoken"),
    )
    return (
        pre.join(enc.hint("merge"), "pretoken", "left")
        .groupBy("doc_id")
        .agg(
            F.count("pretoken").alias("n_pretokens"),
            F.coalesce(F.sum(F.length("pretoken")), F.lit(0)).alias("n_symbols"),
            F.coalesce(F.sum("n_bpe"), F.lit(0)).alias("n_bpe_tokens"),
        )
        .select(
            "doc_id",
            "n_pretokens",
            "n_symbols",
            "n_bpe_tokens",
            F.when(
                F.col("n_bpe_tokens") > 0,
                F.floor(
                    F.col("n_symbols") / F.col("n_bpe_tokens") * 10000.0 + 0.5
                )
                / 10000.0,
            ).alias("compression"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Passage chunking (training-data prep: fixed token windows with overlap)

CHUNK_WINDOW = 32  # tokens per chunk
CHUNK_STRIDE = 24  # window start step (overlap = WINDOW - STRIDE = 8 tokens)


@query(
    "x4_chunk_passages",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, string_split({SQL_NORM.format(c='text')}, ' ') AS toks
      FROM documents
    ),
    st AS (
      SELECT doc_id, toks, len(toks) AS n,
             unnest(generate_series(0, len(toks) - 1, {CHUNK_STRIDE})) AS s
      FROM tok
      WHERE len(toks) > 0
    )
    SELECT doc_id,
           CAST(s // {CHUNK_STRIDE} AS BIGINT) AS chunk_id,
           CAST(s AS BIGINT) AS chunk_start,
           CAST(least({CHUNK_WINDOW}, n - s) AS BIGINT) AS chunk_len,
           array_to_string(toks[s + 1 : s + {CHUNK_WINDOW}], ' ') AS chunk_text,
           md5(array_to_string(toks[s + 1 : s + {CHUNK_WINDOW}], ' ')) AS chunk_md5
    FROM st
    ORDER BY doc_id, chunk_id
    """,
    tags=("X4", "X6", "F1"),
)
def x4_chunk_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size overlapping token-window chunking — the passage splitter a
    RAG / pretraining pipeline runs before embedding or packing. 32-token
    windows advancing by 24 (8-token overlap), last window short.

    Scale shape: pure map-only — tokenize, build the start list with
    `sequence` (length n/STRIDE, tiny), posexplode, slice. No shuffle except
    the display ORDER BY; output rows ~ n_tokens/STRIDE per doc, each carrying
    one window of text. The chunk_md5 column is what downstream exact-dedup
    joins on, so chunk identity survives without re-reading chunk_text."""
    d = spread(T(spark, sf_dir, "documents"))
    toks_df = (
        d.select("doc_id", F.split(normalized_text(F.col("text")), " ").alias("toks"))
        .withColumn("n", F.size("toks"))
        .filter(F.col("n") > 0)
    )
    exploded = toks_df.select(
        "doc_id",
        "toks",
        "n",
        F.posexplode(
            F.sequence(F.lit(0), F.col("n") - F.lit(1), F.lit(CHUNK_STRIDE))
        ).alias("chunk_id", "s"),
    )
    chunk_text = F.array_join(F.slice("toks", F.col("s") + 1, CHUNK_WINDOW), " ")
    return exploded.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.col("s").cast("long").alias("chunk_start"),
        F.least(F.lit(CHUNK_WINDOW), F.col("n") - F.col("s")).cast("long").alias("chunk_len"),
        chunk_text.alias("chunk_text"),
        F.md5(chunk_text).alias("chunk_md5"),
    ).orderBy("doc_id", "chunk_id")


# ---------------------------------------------------------------------------
# x4_collocation_pmi — corpus collocations by pointwise-mutual-information lift

# Minimum pair evidence before a bigram is eligible (the classic PMI
# low-count-explosion guard: a pair seen once has huge PMI and no signal).
PMI_MIN_PAIR = 5
PMI_TOPK = 50

# Shared lift expression (documented here once): PMI without the log —
# lift = p(w1 w2) / (p(w1) p(w2)) = (c12 * T * T) / (B * c1 * c2). Exact
# integer counts all the way to ONE float division chain, identical
# operation order in both engines, so the unrounded sort key is
# bit-deterministic cross-engine (no ln(), whose libm rounding is not
# pinned by IEEE-754 the way * and / are).
_SQL_LIFT = (
    "(CAST(pair_count AS DOUBLE) * CAST(t_uni AS DOUBLE) * CAST(t_uni AS DOUBLE))"
    " / (CAST(t_big AS DOUBLE) * CAST(u1.c AS DOUBLE) * CAST(u2.c AS DOUBLE))"
)


@query(
    "x4_collocation_pmi",
    oracle=f"""
    WITH tok AS (
      SELECT list_filter(string_split({SQL_NORM.format(c='text')}, ' '),
                         t -> length(t) > 0) AS toks
      FROM documents
    ), uni AS (
      SELECT unnest(toks) AS term FROM tok
    ), uc AS (
      SELECT term, COUNT(*) AS c FROM uni GROUP BY term
    ), big AS (
      SELECT unnest(list_transform(range(1, len(toks)),
                                   i -> [toks[i], toks[i + 1]])) AS pair
      FROM tok WHERE len(toks) >= 2
    ), bc AS (
      SELECT pair[1] AS w1, pair[2] AS w2, COUNT(*) AS pair_count
      FROM big GROUP BY 1, 2
    ), tot AS (
      SELECT (SELECT SUM(c) FROM uc) AS t_uni,
             (SELECT SUM(pair_count) FROM bc) AS t_big
    )
    SELECT w1, w2, pair_count,
           FLOOR({_SQL_LIFT} * 10000.0 + 0.5) / 10000.0 AS pmi_lift
    FROM bc
    JOIN uc u1 ON bc.w1 = u1.term
    JOIN uc u2 ON bc.w2 = u2.term
    CROSS JOIN tot
    WHERE pair_count >= {PMI_MIN_PAIR}
    ORDER BY {_SQL_LIFT} DESC, w1, w2
    LIMIT {PMI_TOPK}
    """,
    tags=("X4", "A1", "J5", "O2"),
)
def x4_collocation_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{PMI_TOPK} bigram collocations by PMI lift — the phrase-mining /
    tokenizer-vocabulary-seeding pass a pretraining pipeline runs to find
    multi-word units worth keeping intact ("new york", "machine learning").

    Scale shape: ONE corpus scan and ONE corpus-sized shuffle. Each document
    explodes into unigram AND bigram gram rows in the same pass (tagged
    structs from one concat), and the single (kind, w1, w2) groupBy count is
    map-side combined, so the shuffle carries vocabulary-sized partials, not
    token instances. Everything downstream — unigram probability joins (both
    broadcast: vocab << corpus), the two scalar totals, the top-k — runs on
    the vocab table, which is localCheckpoint'ed once so the corpus pass
    never re-executes across the four consuming branches. At 100 TB the cost
    is the token explode + one combined shuffle; vocab size is
    corpus-independent (Heaps-law sublinear).

    Determinism: exact integer counts; the only float math is the final lift
    division chain, identical op-for-op in both engines (see _SQL_LIFT);
    quant4 applied to the OUTPUT only, sort key stays unrounded with a
    (w1, w2) tiebreaker at the LIMIT boundary.
    """
    d = spread(T(spark, sf_dir, "documents"))
    toks = F.filter(
        F.split(normalized_text(F.col("text")), " "), lambda t: F.length(t) > 0
    )
    docs = d.select(toks.alias("toks"))
    pair_len = F.greatest(F.size("toks") - 1, F.lit(0))
    grams = docs.select(
        F.explode(
            F.concat(
                F.transform(
                    "toks",
                    lambda t: F.struct(
                        F.lit("u").alias("kind"), t.alias("w1"), F.lit("").alias("w2")
                    ),
                ),
                F.zip_with(
                    F.slice("toks", F.lit(1), pair_len),
                    F.slice("toks", F.lit(2), pair_len),
                    lambda a, b: F.struct(
                        F.lit("b").alias("kind"), a.alias("w1"), b.alias("w2")
                    ),
                ),
            )
        ).alias("g")
    ).select("g.kind", "g.w1", "g.w2")
    counts = (
        grams.groupBy("kind", "w1", "w2")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=False)  # vocab-sized; corpus pass runs ONCE
    )
    uc = counts.filter(F.col("kind") == "u").select(F.col("w1").alias("term"), "c")
    bc = counts.filter(F.col("kind") == "b").select(
        "w1", "w2", F.col("c").alias("pair_count")
    )
    tot = counts.groupBy().agg(
        F.sum(F.when(F.col("kind") == "u", F.col("c"))).alias("t_uni"),
        F.sum(F.when(F.col("kind") == "b", F.col("c"))).alias("t_big"),
    )
    lift = (
        F.col("pair_count").cast("double")
        * F.col("t_uni").cast("double")
        * F.col("t_uni").cast("double")
    ) / (
        F.col("t_big").cast("double")
        * F.col("c1").cast("double")
        * F.col("c2").cast("double")
    )
    return (
        bc.filter(F.col("pair_count") >= PMI_MIN_PAIR)
        .join(
            F.broadcast(uc.select(F.col("term").alias("w1"), F.col("c").alias("c1"))),
            "w1",
        )
        .join(
            F.broadcast(uc.select(F.col("term").alias("w2"), F.col("c").alias("c2"))),
            "w2",
        )
        .crossJoin(F.broadcast(tot))
        .withColumn("lift", lift)
        .orderBy(F.desc("lift"), "w1", "w2")
        .limit(PMI_TOPK)
        .select("w1", "w2", "pair_count", quant4(F.col("lift")).alias("pmi_lift"))
    )


@query(
    "x4_repetition_score",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, string_split({SQL_NORM.format(c='text')}, ' ') AS toks
      FROM documents
    ), stats AS (
      SELECT doc_id, len(toks) AS n, len(list_distinct(toks)) AS nd,
             CASE WHEN len(toks) >= 2
                  THEN len(list_filter(range(1, len(toks)),
                                       i -> toks[i] = toks[i + 1]))
                  ELSE 0 END AS n_imm
      FROM tok
    ), bg AS (
      SELECT doc_id, toks[g.i] || ' ' || toks[g.i + 1] AS b
      FROM tok, LATERAL (SELECT unnest(range(1, len(toks))) AS i) g
    ), bgc AS (
      SELECT doc_id, b, COUNT(*) AS c FROM bg GROUP BY doc_id, b
    ), bga AS (
      SELECT doc_id, MAX(c) AS topc, SUM(c) AS total FROM bgc GROUP BY doc_id
    )
    SELECT s.doc_id, s.n AS n_tokens,
           FLOOR((1.0 - CAST(nd AS DOUBLE) / n) * 10000.0 + 0.5) / 10000.0
             AS dup_token_frac,
           FLOOR(CAST(n_imm AS DOUBLE) / GREATEST(n - 1, 1) * 10000.0 + 0.5)
             / 10000.0 AS imm_repeat_frac,
           FLOOR(COALESCE(CAST(topc AS DOUBLE) / total, 0.0) * 10000.0 + 0.5)
             / 10000.0 AS top_bigram_share,
           (CAST(n_imm AS DOUBLE) / GREATEST(n - 1, 1) > 0.07
            OR COALESCE(CAST(topc AS DOUBLE) / total, 0.0) > 0.07)
             AS is_repetitive
    FROM stats s LEFT JOIN bga ON s.doc_id = bga.doc_id
    ORDER BY s.doc_id
    """,
    tags=("X4", "A1", "W6"),
)
def x4_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition filter (the MassiveText/Gopher repetition
    rules, adapted to token granularity): duplicate-token fraction,
    immediate-repeat fraction ("batch batch batch"), and the share of all
    bigrams taken by the single most frequent bigram — degenerate generated
    or boilerplate text scores high on all three long before a dedup pass
    can see it, so this runs inside the quality gate, not after dedup.

    Thresholds (>0.07 on immediate repeats or top-bigram share ~ p90 of the
    fixture) are exact-integer-ratio comparisons: both engines compute the
    same single IEEE division, so the boolean is cross-engine stable, and
    the surfaced ratios are quant4-quantized for the hash match.

    Scale shape: the scalar features are one map-only pass of codegen HOFs
    over the materialized token array; the top-bigram mode needs true
    per-(doc, bigram) counts, which is ONE corpus shuffle keyed
    (doc_id, bigram) followed by a doc_id-keyed rollup — an O(n^2)-per-doc
    HOF mode would be map-only but explodes on 1k-token production docs,
    so the shuffle form is the 100 TB choice. The token pass is
    localCheckpointed: two plan branches (scalars, bigrams) consume it."""
    d = spread(T(spark, sf_dir, "documents"))
    base = with_tokens(d).localCheckpoint(eager=False)
    toks = F.col("toks")
    n = F.size(toks)
    imm_hits = F.size(
        F.filter(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.element_at(toks, i) == F.element_at(toks, i + 1),
        )
    )
    stats = base.select(
        "doc_id",
        n.alias("n"),
        F.size(F.array_distinct(toks)).alias("nd"),
        F.when(n >= 2, imm_hits).otherwise(F.lit(0)).alias("n_imm"),
    )
    bigram = F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.concat_ws(
            " ", F.element_at(toks, i), F.element_at(toks, i + 1)
        ),
    )
    bga = (
        base.select("doc_id", F.explode(F.when(n >= 2, bigram)).alias("b"))
        .groupBy("doc_id", "b")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("topc"), F.sum("c").alias("total"))
    )
    imm_frac = F.col("n_imm").cast("double") / F.greatest(F.col("n") - 1, F.lit(1))
    top_share = F.coalesce(
        F.col("topc").cast("double") / F.col("total"), F.lit(0.0)
    )
    return (
        stats.join(bga, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n").alias("n_tokens"),
            quant4(F.lit(1.0) - F.col("nd").cast("double") / F.col("n")).alias(
                "dup_token_frac"
            ),
            quant4(imm_frac).alias("imm_repeat_frac"),
            quant4(top_share).alias("top_bigram_share"),
            ((imm_frac > 0.07) | (top_share > 0.07)).alias("is_repetitive"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# x4_perplexity_buckets — CCNet-style head/middle/tail quality split


@query(
    "x4_perplexity_buckets",
    oracle=f"""
    WITH lm AS ({_LM_SQL}
    ), th AS (
      SELECT quantile_cont(avg_logprob, [1.0/3, 2.0/3]) AS q FROM lm
    )
    SELECT doc_id, source, avg_logprob,
           CASE WHEN avg_logprob > q[2] THEN 'head'
                WHEN avg_logprob > q[1] THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM lm, th
    ORDER BY doc_id
    """,
    tags=("X4", "A9", "P4"),
)
def x4_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): split the
    corpus into head / middle / tail terciles of the bigram-LM fluency
    score — the standard quality-stratification step before mixing (train
    mostly on head, sample middle, drop or down-weight tail).

    Scale shape: the scored frame is x4_ngram_lm_score's (size-routed
    model join, one corpus shuffle); the two tercile thresholds are ONE exact
    percentile aggregate collapsing to a single broadcast row — no global
    sort, no single-partition window (the rank-free way to cut a corpus at
    global quantiles; contrast x6_curriculum, which needs every rank). The
    threshold comparison inputs are the already-quant4-quantized scores,
    identical rationals in both engines, and a9 proved the
    percentile == quantile_cont interpolation pairing — so the bucket
    label is hash-matched, not tolerance-gated."""
    # NO materialization barrier (r13): both consumers (the percentile
    # aggregate and the final bucket select) branch ABOVE the scorer's
    # per-doc aggregate exchange, which AQE reuses across plan branches —
    # the corpus tokenize+score pass runs ONCE either way (measured: 17
    # jobs / 45 stages / 402 tasks with and without a localCheckpoint
    # here; best-of-3 2.75 s -> 1.82 s, cold 5.2 -> 2.1, after dropping
    # it). Only the skinny per-doc final aggregate recomputes per branch.
    scored = x4_ngram_lm_score(spark, sf_dir)
    th = scored.agg(
        F.percentile("avg_logprob", F.lit(1.0 / 3)).alias("q1"),
        F.percentile("avg_logprob", F.lit(2.0 / 3)).alias("q2"),
    )
    return (
        scored.crossJoin(F.broadcast(th))
        .select(
            "doc_id",
            "source",
            "avg_logprob",
            F.when(F.col("avg_logprob") > F.col("q2"), F.lit("head"))
            .when(F.col("avg_logprob") > F.col("q1"), F.lit("middle"))
            .otherwise(F.lit("tail"))
            .alias("bucket"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# x4_quality_classifier — distributed fastText-style quality classifier
# trained by iterative parameter mixing (McDonald, Hall & Mann 2010,
# "Distributed Training Strategies for the Structured Perceptron")

_QC_B = 1024  # hashed-unigram feature buckets (+1 bias slot at index B)
_QC_ROUNDS = 5
_QC_SHARDS = 8  # MINIMUM shard count — the anchor-fixture regime: IPM's
# result depends on the sharding, so reproducibility requires the count be
# a deterministic function of the corpus (qc_shards_for), never of the
# cluster; corpora small enough that 8 shards already bound the per-shard
# sequential epoch keep the historical pinned 8, so every replay /
# equivalence gate stays bit-identical
_QC_DOCS_PER_SHARD = 2500  # per-shard sequential-epoch budget: within a
# round each shard is an inherently serial Python loop over its docs, so
# this constant is the training-time critical path — corpus growth beyond
# it is absorbed by MORE shards (more cores), not longer loops (the
# _semantic_k corpus-derived-parameter medicine applied to IPM sharding)
_QC_STOP = ("the", "a", "and", "of", "to")  # the x4_quality_score stop set


def qc_shards_for(n_docs: int) -> int:
    """Corpus-derived IPM shard count: ceil(n / _QC_DOCS_PER_SHARD),
    floored at the historical _QC_SHARDS so anchor fixtures (< 20k docs)
    train bit-identically to every prior round. Deterministic in the
    corpus alone — two clusters of different sizes derive the same count
    and therefore the same model (the kmeans-init class of determinism);
    persisted artifacts stamp the count (qc_write_model meta) so replays
    and audits key on it."""
    return max(_QC_SHARDS, -(-int(n_docs) // _QC_DOCS_PER_SHARD))


def _qc_features(docs: DataFrame, shards: int = _QC_SHARDS) -> DataFrame:
    """Per-doc integer feature frame for the quality classifier:
    (doc_id, y, shard, bks, cnts) — hashed-unigram count arrays sorted by
    bucket id, plus the C4/Gopher stopword-density label
    y = [10 * stopword_count >= n_tokens] (the real quality-filter rule the
    classifier distills; it is linear in count space, so the concept is
    learnable by construction). One tokenize pass, one (doc,bucket) count
    shuffle, one doc-keyed array assembly — all map-side combined.

    Tokenless docs survive as EMPTY feature arrays (explode_outer + null-
    bucket filter): a plain explode would silently drop them from both
    training and scoring, diverging from the pure-Python reference, which
    keeps every doc (such a doc scores z = bias with y = 1, since
    10*0 >= 0)."""
    tok = with_tokens(docs, ("doc_id",))
    # NULL text tokenizes to a NULL array; coalesce to EMPTY so such docs
    # ride the tokenless path (y = 1, z = bias) instead of labeling y NULL
    # — a NULL y reaches the training kernel as NaN and kills the epoch
    # task (r11 review-adjacent finding, caught by the funnel's NULL-text
    # regression test). Scoped HERE, not in with_tokens: the oracle-matched
    # text ops need Spark and DuckDB to agree that NULL text stays NULL.
    toks = F.filter(
        F.coalesce(F.col("toks"), F.array().cast("array<string>")),
        lambda t: F.length(t) > 0,
    )
    stop_arr = F.array(*[F.lit(s) for s in _QC_STOP])
    base = tok.select(
        "doc_id",
        F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))).alias(
            "n_stop"
        ),
        F.size(toks).alias("n_tok"),
        F.explode_outer(toks).alias("t"),
    )
    bt = base.select(
        "doc_id",
        (10 * F.col("n_stop") >= F.col("n_tok")).cast("int").alias("y"),
        (
            F.conv(F.substring(F.md5(F.col("t")), 1, 8), 16, 10).cast("long")
            % _QC_B
        ).alias("bk"),  # NULL for the explode_outer sentinel row
    )
    bc = F.filter(
        F.array_sort(F.collect_list(F.struct(F.col("bk"), F.col("cnt")))),
        lambda x: x["bk"].isNotNull(),
    )
    return (
        bt.groupBy("doc_id", "y", "bk")
        .agg(F.count("*").alias("cnt"))
        .groupBy("doc_id", "y")
        .agg(bc.alias("bc"))
        .select(
            "doc_id",
            "y",
            (F.col("doc_id") % shards).cast("int").alias("shard"),
            F.col("bc.bk").alias("bks"),
            F.col("bc.cnt").alias("cnts"),
        )
    )


def _qc_trunc_div(a: int, b: int) -> int:
    """Truncation-toward-zero integer division — ONE definition shared by
    the Spark kernel and the pure-Python reference replay, so weight
    mixing is bit-identical (Python's // floors, which differs on
    negatives)."""
    q = abs(int(a)) // b
    return q if a >= 0 else -q


def quality_classifier_train(
    feat: DataFrame, rounds: int = _QC_ROUNDS, shards: int = _QC_SHARDS
):
    """Distributed averaged-mixing perceptron (McDonald et al. 2010 IPM):
    each round, every shard runs ONE sequential perceptron epoch locally
    (docs in doc_id order) starting from the mixed weights, then the
    driver mixes the shard weight vectors by truncated mean. Returns the
    final mixed weight list (len B+1; index B = bias).

    Everything is exact int64 — counts, scores, updates, truncated-mean
    mixing — so training is deterministic and replayable bit-for-bit by
    a pure-Python reference (tests/test_quality_classifier.py), the
    x4_bpe_train discipline applied to model training.

    Scale shape: the feature frame shuffles ONCE to shards; each round is
    one applyInPandas pass (per-shard state = one (B+1) int64 vector) and
    a SHARDS x (B+1) driver mix — bounded driver traffic, corpus never
    leaves the executors. IPM's convergence-vs-parallelism tradeoff is
    the published one: callers derive the shard count from the corpus
    size (qc_shards_for) so the per-shard sequential epoch stays bounded
    at _QC_DOCS_PER_SHARD docs and training absorbs corpus growth by
    adding shards; the count is a pure function of n_docs, so the model
    stays deterministic and replayable."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("shard", IntegerType(), False),
            StructField("w", ArrayType(LongType()), False),
        ]
    )
    # pre-shuffle ONCE onto the shard key and cache THAT: the cached plan's
    # partitioning satisfies every round's applyInPandas clustering
    # requirement, so the per-round exchange is elided — R rounds cost ONE
    # corpus shuffle instead of R (visible in the executed plan: rounds > 1
    # show no Exchange above the InMemoryTableScan). RANGE partitioning
    # into exactly `shards` partitions (r12, guide §2.5 "synthetic
    # partitioning keys with too few distinct values"): murmur3 over the
    # dense ids 0..shards-1 collides badly — measured: ids 0..7 into 8
    # partitions land in only 5 distinct buckets, so one task ran THREE
    # sequential epochs and the round wall tripled; the old
    # repartition(col) into the default 32 still collided 8 -> 7. Range
    # boundaries over a handful of dense ints are a bijection, so every
    # round's wall is ONE epoch. Partitioning never reaches the result:
    # training groups by shard logically and the mix is over all shards.
    feat = feat.repartitionByRange(shards, F.col("shard")).persist()
    try:
        w = [0] * (_QC_B + 1)
        for _ in range(rounds):
            w0 = np.asarray(w, dtype=np.int64)

            def epoch(pdf: pd.DataFrame) -> pd.DataFrame:
                lw = w0.copy()
                pdf = pdf.sort_values("doc_id")  # arrival order is arbitrary
                for bks, cnts, y in zip(pdf["bks"], pdf["cnts"], pdf["y"]):
                    b = np.asarray(bks, dtype=np.int64)
                    c = np.asarray(cnts, dtype=np.int64)
                    z = int((lw[b] * c).sum()) + int(lw[_QC_B])
                    pred = 1 if z >= 0 else 0
                    if pred != y:
                        s = int(y) - pred
                        lw[b] += s * c
                        lw[_QC_B] += s
                return pd.DataFrame(
                    {"shard": [int(pdf["shard"].iloc[0])], "w": [lw.tolist()]}
                )

            rows = (
                feat.groupBy("shard").applyInPandas(epoch, out_schema).collect()
            )  # bounded: SHARDS rows of B+1 ints
            acc = [0] * (_QC_B + 1)
            for r in rows:
                for i, v in enumerate(r.w):
                    acc[i] += v
            # empty shards (possible on tiny fixtures) contribute w0: mix
            # over the FULL pinned shard count so the result is independent
            # of which shards happened to hold docs
            for _ in range(shards - len(rows)):
                for i in range(_QC_B + 1):
                    acc[i] += w[i]
            w = [_qc_trunc_div(acc[i], shards) for i in range(_QC_B + 1)]
        return w
    finally:
        feat.unpersist()


@query(
    "x4_quality_classifier",
    oracle=None,  # iterative distributed training: rows-only + bit-identical
    # pure-Python IPM replay + planted-concept recovery gates
    # (tests/test_quality_classifier.py)
    tags=("X4", "U2", "A1"),
)
def x4_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned quality filter: train a fastText-style linear classifier
    over hashed-unigram counts to distill the C4/Gopher stopword-density
    quality rule, then score every document — the "quality classifier"
    stage of a pretraining pipeline (DCLM/FineWeb-Edu train exactly this
    shape: cheap linear model over hashed bags, applied corpus-wide).

    Trained on the doc_id % 5 != 0 split by distributed iterative
    parameter mixing (see quality_classifier_train); scoring is one
    map-only pass: the (B+1)-int weight vector joins the exploded count
    frame as a broadcast, z is an exact integer dot product, pred = z >= 0.
    Output: (doc_id, y, is_train, z, pred) — all integers, deterministic
    bit-for-bit across runs, engines and partitionings."""
    d = spread(T(spark, sf_dir, "documents"))
    # corpus-derived shard count (parquet count() is row-group-metadata
    # only — no data scan); fixtures below 8 * _QC_DOCS_PER_SHARD docs
    # derive the historical 8, keeping every replay gate bit-identical
    shards = qc_shards_for(T(spark, sf_dir, "documents").count())
    feat = _qc_features(d, shards=shards).localCheckpoint(eager=False)
    w = quality_classifier_train(
        feat.filter(F.col("doc_id") % 5 != 0), shards=shards
    )
    return (
        qc_score(d, w, feat=feat)
        .select(
            "doc_id",
            "y",
            (F.col("doc_id") % 5 != 0).alias("is_train"),
            "z",
            "pred",
        )
        .orderBy("doc_id")
    )


def qc_score(docs: DataFrame, w: list[int], feat: DataFrame | None = None) -> DataFrame:
    """Score a documents frame with a FROZEN weight vector: the shared
    kernel of the batch registry op and the T13 streaming lane (both MUST
    score identically or the live==batch equivalence proof is vacuous).
    Map-only modulo the feature build: exploded (doc,bucket) counts join
    the broadcast (B+1)-row weight table; z is an exact integer dot
    product, pred = z >= 0. Returns (doc_id, y, z, pred). Pass a
    prebuilt (e.g. checkpointed) `feat` frame to skip re-tokenizing.

    Tokenless docs score z = bias (explode_outer keeps their sentinel row;
    the left join + null-safe sum keep them through the agg) — matching
    the pure-Python reference, which scores every doc."""
    if feat is None:
        feat = _qc_features(docs)
    wdf = F.broadcast(
        docs.sparkSession.createDataFrame(
            [(i, int(v)) for i, v in enumerate(w)], "bk long, wv long"
        )
    )
    exploded = feat.select(
        "doc_id",
        "y",
        F.explode_outer(F.arrays_zip(F.col("bks"), F.col("cnts"))).alias("e"),
    ).select(
        "doc_id", "y", F.col("e.bks").alias("bk"), F.col("e.cnts").alias("cnt")
    )
    bias = int(w[_QC_B])
    return (
        exploded.join(wdf, "bk", "left")
        .groupBy("doc_id", "y")
        .agg(
            (
                F.coalesce(F.sum(F.col("cnt") * F.col("wv")), F.lit(0)) + bias
            ).alias("z")
        )
        .select("doc_id", "y", "z", (F.col("z") >= 0).cast("int").alias("pred"))
    )


def qc_write_model(
    spark: SparkSession,
    w: list[int],
    path: str,
    shards: int = _QC_SHARDS,
    rounds: int = _QC_ROUNDS,
) -> None:
    """Persist a trained weight vector as a (bk, wv) parquet table under
    path/weights plus a one-row path/meta stamping the training
    provenance (shards, rounds) — the x3 persisted-index lifecycle
    applied to the classifier: train once offline, deploy the artifact
    to the streaming scorer (streaming/pipeline.py quality_score_stream).
    Scoring needs only the weights; the stamped shard count is what lets
    a replay/audit reproduce the training run bit-for-bit (IPM's result
    depends on the sharding)."""
    spark.createDataFrame(
        [(i, int(v)) for i, v in enumerate(w)], "bk long, wv long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/weights")
    spark.createDataFrame(
        [(int(shards), int(rounds))], "shards int, rounds int"
    ).write.mode("overwrite").parquet(f"{path}/meta")


def qc_read_model(spark: SparkSession, path: str) -> list[int]:
    """Reload a persisted weight vector; round-trips qc_write_model
    byte-identically (plain int64 rows, ordered by bucket id). Accepts
    the legacy pre-r9 flat layout (part files directly under path).
    Layout detection goes through Spark's filesystem layer (try the
    weights/ subdir, fall back to flat) so URI-schemed storage (s3a://,
    hdfs://) works the same as local paths — os.path probing would
    silently misroute those (r9 review finding)."""
    from pyspark.errors import AnalysisException

    try:
        # explicit schema: a rowless weights dir (_SUCCESS-only, crashed
        # writer) must surface as the actionable row-count error below,
        # not a schema-inference crash (the lm_read_model discipline)
        rows = (
            spark.read.schema("bk long, wv long")
            .parquet(f"{path}/weights")
            .orderBy("bk")
            .collect()
        )
    except AnalysisException:  # no weights/ subdir: legacy flat layout
        rows = (
            spark.read.schema("bk long, wv long")
            .parquet(path)
            .orderBy("bk")
            .collect()
        )
    if len(rows) != _QC_B + 1:
        # a truncated/corrupt artifact would mis-score every doc through
        # bk/weight index misalignment — fail loudly (assert would be
        # stripped under python -O)
        raise ValueError(
            f"quality model at {path} has {len(rows)} rows, "
            f"expected {_QC_B + 1}"
        )
    return [int(r.wv) for r in rows]


def qc_read_meta(spark: SparkSession, path: str) -> dict:
    """Training provenance stamped by qc_write_model; legacy flat
    artifacts (no meta table) report the historical pinned defaults.
    Probes through Spark's filesystem layer (URI-schemed storage works)."""
    from pyspark.errors import AnalysisException

    try:
        r = (
            spark.read.schema("shards int, rounds int")
            .parquet(f"{path}/meta")
            .first()
        )
    except AnalysisException:  # legacy artifact: no meta table
        return {"shards": _QC_SHARDS, "rounds": _QC_ROUNDS}
    if r is None:
        # rowless meta dir (_SUCCESS only): provenance unknowable, same
        # answer as the legacy no-meta branch — the pinned defaults
        return {"shards": _QC_SHARDS, "rounds": _QC_ROUNDS}
    return {"shards": int(r.shards), "rounds": int(r.rounds)}


# ---------------------------------------------------------------------------
# x4_heavy_hitters — sketch-pruned EXACT frequent tokens (r9)

_HH_K = 255  # per-partition candidate budget; threshold phi = 1/(K+1)


def _hh_sketch_schema():
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    return StructType(
        [
            StructField("t", StringType(), True),
            StructField("cnt", LongType(), True),
        ]
    )


def hh_token_stream(docs: DataFrame) -> DataFrame:
    """The heavy-hitter token stream — ONE definition shared by the batch
    op (x4_heavy_hitters) and the T17 streaming lane's sketch + read-side
    recount (streaming/pipeline.py), so tokenization can never drift
    between what the ingest sketch saw and what the extraction counts."""
    return with_tokens(docs).select(
        F.explode(F.filter(F.col("toks"), lambda t: F.length(t) > 0)).alias("t")
    )


def hh_partition_summaries(tok: DataFrame) -> DataFrame:
    """Pass 1 of the heavy-hitter op, split out so the pruning bound is
    independently gateable: per partition, a batched Misra-Gries summary
    with K counters — worker memory is O(K + one Arrow batch's vocab),
    NEVER partition-vocab-bounded (the r9 review finding: a plain
    value_counts accumulator grows with the distinct-token count, which
    at the op's own target regime is billions). Each Arrow batch's counts
    fold in vectorized; whenever the counter table exceeds K entries, the
    (K+1)-th largest count d is subtracted from EVERY counter and
    non-positive ones drop — the top K+1 counters each lose exactly d, so
    total mass removed >= (K+1) * sum(d) while removal <= insertion = n_p,
    giving sum(d) <= n_p/(K+1); hence est(t) >= c_p(t) - sum(d) and the
    undercount-compensated emission test (est + sum(d))*(K+1) > n_p keeps
    every true local heavy hitter. Emits <= K candidate rows per
    partition plus one t = NULL row carrying the partition's token count.
    MG summaries are MERGEABLE, which is what lets T17 persist one per
    micro-batch and still cover every global heavy hitter (two-level
    averaging: global-heavy => heavy in some epoch => heavy in some
    partition of that epoch => emitted)."""
    import pandas as pd

    def sketch(batches):
        acc = None
        n = 0
        d_total = 0
        for pdf in batches:
            n += int(len(pdf))
            vc = pdf["t"].value_counts()
            acc = vc if acc is None else acc.add(vc, fill_value=0)
            if len(acc) > _HH_K:
                d = int(acc.nlargest(_HH_K + 1).iloc[-1])
                acc = acc - d
                acc = acc[acc > 0]
                d_total += d
        ts: list = []
        cs: list = []
        if acc is not None and len(acc):
            heavy = acc[(acc + d_total) * (_HH_K + 1) > n]
            ts = [str(i) for i in heavy.index]
            cs = [None] * len(ts)
        ts.append(None)
        cs.append(n)
        yield pd.DataFrame({"t": ts, "cnt": pd.array(cs, dtype="Int64")})

    return tok.mapInPandas(sketch, schema=_hh_sketch_schema())


def _hh_candidates(tok: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(candidate-token frame, 1-row corpus-total frame) from the
    per-partition summaries — both tiny (<= K x partitions rows)."""
    part = hh_partition_summaries(tok)
    cands = part.filter(F.col("t").isNotNull()).select("t").distinct()
    total = part.filter(F.col("t").isNull()).agg(F.sum("cnt").alias("n"))
    return cands, total


@query(
    "x4_heavy_hitters",
    oracle=f"""
    WITH tok AS (
      SELECT unnest(list_filter(string_split({SQL_NORM.format(c='text')}, ' '),
                                t -> length(t) > 0)) AS t
      FROM documents
    ), tot AS (SELECT COUNT(*) AS n FROM tok)
    SELECT t AS token, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM tok, tot
    GROUP BY t, n
    HAVING COUNT(*) * {_HH_K + 1} > n
    ORDER BY cnt DESC, token
    """,
    tags=("X4", "A1", "U4"),
)
def x4_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT heavy hitters (every token with frequency > 1/(K+1) of the
    corpus, K = 255) found at sketch cost: pass 1 is a per-partition
    batched Misra-Gries summary with K counters (O(K + batch-vocab)
    worker memory — see _hh_candidates for the trim algebra) emitting the
    tokens whose undercount-compensated local estimate clears
    (est + sum(d))*(K+1) > n_p — a guaranteed superset of the local
    heavies, at most K rows per partition — plus its token count; pass 2
    recounts exactly over the candidate set alone (broadcast semi-join)
    and keeps tokens clearing the global integer test cnt*(K+1) > N.

    Coverage theorem (what the ORACLE hash actually checks): if
    c(t)*(K+1) > N then by averaging some partition has
    c_p(t)*(K+1) > n_p; there est + sum(d) >= c_p (MG undercount bound),
    so t is emitted — a sketch that drops one true heavy hitter breaks
    the hash match against DuckDB's exact HAVING. The candidate set
    varies with partitioning; the OUTPUT never does (pass 2 is exact
    arithmetic).

    Scale shape — why not one exact groupBy: at 100 TB the token vocab
    (n-grams, ids, typos) is billions of keys, so the full-vocab shuffle
    is the cost; here pass 1 is map-only (vectorized value_counts folds +
    O(K) summaries, no Python per-row loop) emitting <= K rows per
    partition, and pass 2's map-side combine only materializes candidate
    keys (<= K x partitions, broadcastable), so shuffled bytes AND worker
    memory are candidate-bounded, never vocab-bounded. Two narrow corpus
    passes by construction (allowlisted in the duplicate-scan audit). The
    corpus total N rides the SAME pass-1 summaries (t = NULL rows), not a
    third pass."""
    tok = hh_token_stream(T(spark, sf_dir, "documents"))
    cands, total = _hh_candidates(tok)
    return (
        tok.join(F.broadcast(cands), "t")
        .groupBy("t")
        .agg(F.count("*").alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * (_HH_K + 1) > F.col("n"))
        .select(F.col("t").alias("token"), "cnt")
        .orderBy(F.desc("cnt"), "token")
    )
