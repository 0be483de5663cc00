"""x4_kn_lm_score semantics, pinned independently of the DuckDB oracle:
a pure-Python interpolated-KN replay over a crafted corpus must reproduce
the operator bit-for-bit (same DECIMAL(38,18) accumulation, same 4-dp
quantization), and the continuation probability must show the property KN
exists for — a frequent word with ONE predecessor type scores below an
equally-frequent word with many predecessor types."""

from __future__ import annotations

import math
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

import pyarrow as pa
import pyarrow.parquet as pq

from otlp2parquet_spark.queries.registry import all_specs

_D = 0.75


def _kn_replay(docs: list[tuple[int, str, str]]) -> dict[int, tuple[int, float]]:
    model: Counter = Counter()
    bgs_by_doc: dict[int, tuple[str, list[tuple[str, str]]]] = {}
    for did, src, text in docs:
        toks = text.split()
        bgs = list(zip(toks, toks[1:]))
        if bgs:
            bgs_by_doc[did] = (src, bgs)
            for b in bgs:
                model[(src, *b)] += 1
    c_w1: Counter = Counter()
    n1_fwd: Counter = Counter()
    n1_bwd: Counter = Counter()
    n1_tot: Counter = Counter()
    for (src, w1, w2), c in model.items():
        c_w1[(src, w1)] += c
        n1_fwd[(src, w1)] += 1
        n1_bwd[(src, w2)] += 1
        n1_tot[src] += 1
    out = {}
    for did, (src, bgs) in bgs_by_doc.items():
        total = Decimal(0)
        for w1, w2 in bgs:
            p = (
                max(float(model[(src, w1, w2)]) - _D, 0.0)
                + (_D * n1_fwd[(src, w1)])
                * (float(n1_bwd[(src, w2)]) / n1_tot[src])
            ) / float(c_w1[(src, w1)])
            total += Decimal(math.log(p)).quantize(
                Decimal("1e-18"), rounding=ROUND_HALF_UP
            )
        avg = float(total) / len(bgs)
        out[did] = (len(bgs), math.floor(avg * 10000.0 + 0.5) / 10000.0)
    return out


# pre-normalized texts (lowercase alnum + single spaces) so the operator's
# normalization is the identity and the replay can tokenize with split()
_DOCS = [
    (1, "s", "san francisco san francisco san francisco"),
    (2, "s", "new york and old york and big york and new york"),
    (3, "s", "the city is big and the bay is cold"),
    (4, "s", "san francisco is a big city on the bay"),
    (5, "s", "york is old and the bay is not"),
    (6, "t", "totally separate source model here"),
    (7, "t", "separate source model again here again"),
]


def _write_documents(tmp_path) -> str:
    tbl = pa.table(
        {
            "doc_id": pa.array([d[0] for d in _DOCS], pa.int64()),
            "text": [d[2] for d in _DOCS],
            "lang": ["en"] * len(_DOCS),
            "source": [d[1] for d in _DOCS],
            "n_chars": pa.array([len(d[2]) for d in _DOCS], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_kn_matches_pure_python_replay(spark, tmp_path):
    sf_dir = _write_documents(tmp_path)
    got = {
        r["doc_id"]: (r["n_bigrams"], r["kn_avg_logprob"])
        for r in all_specs()["x4_kn_lm_score"].build(spark, sf_dir).collect()
    }
    assert got == _kn_replay(_DOCS)


def _kn3_replay(docs: list[tuple[int, str, str]]) -> dict[int, tuple[int, float]]:
    """Pure-Python interpolated-KN TRIGRAM replay (stats from the trigram
    type table, mirroring x4_kn3_lm_score's documented estimator)."""
    t3: Counter = Counter()
    tris_by_doc: dict[int, tuple[str, list[tuple[str, str, str]]]] = {}
    for did, src, text in docs:
        toks = text.split()
        tris = list(zip(toks, toks[1:], toks[2:]))
        if tris:
            tris_by_doc[did] = (src, tris)
            for t in tris:
                t3[(src, *t)] += 1
    c12: Counter = Counter()
    n1f12: Counter = Counter()
    m23: Counter = Counter()
    for (src, w1, w2, w3), c in t3.items():
        c12[(src, w1, w2)] += c
        n1f12[(src, w1, w2)] += 1
        m23[(src, w2, w3)] += 1
    nmid: Counter = Counter()
    nf: Counter = Counter()
    n1b3: Counter = Counter()
    ntot: Counter = Counter()
    for (src, w2, w3), nb in m23.items():
        nmid[(src, w2)] += nb
        nf[(src, w2)] += 1
        n1b3[(src, w3)] += 1
        ntot[src] += 1
    out = {}
    for did, (src, tris) in tris_by_doc.items():
        total = Decimal(0)
        for w1, w2, w3 in tris:
            p1 = float(n1b3[(src, w3)]) / ntot[src]
            p2 = (
                max(float(m23[(src, w2, w3)]) - _D, 0.0) + (_D * nf[(src, w2)]) * p1
            ) / float(nmid[(src, w2)])
            p3 = (
                max(float(t3[(src, w1, w2, w3)]) - _D, 0.0)
                + (_D * n1f12[(src, w1, w2)]) * p2
            ) / float(c12[(src, w1, w2)])
            total += Decimal(math.log(p3)).quantize(
                Decimal("1e-18"), rounding=ROUND_HALF_UP
            )
        avg = float(total) / len(tris)
        out[did] = (len(tris), math.floor(avg * 10000.0 + 0.5) / 10000.0)
    return out


def test_kn3_matches_pure_python_replay(spark, tmp_path):
    sf_dir = _write_documents(tmp_path)
    got = {
        r["doc_id"]: (r["n_trigrams"], r["kn3_avg_logprob"])
        for r in all_specs()["x4_kn3_lm_score"].build(spark, sf_dir).collect()
    }
    assert got == _kn3_replay(_DOCS)


def test_kn_continuation_discounts_single_predecessor_words(spark, tmp_path):
    # in _DOCS source "s": "francisco" occurs 4x, ALWAYS after "san";
    # "york" occurs 4x after 3 distinct predecessors (new/old/big).
    # Equal unigram frequency, so add-one smoothing can't tell them apart —
    # KN's continuation count must: N1+(*francisco)=1 < N1+(*york)=3.
    model: Counter = Counter()
    for _, src, text in _DOCS:
        if src != "s":
            continue
        toks = text.split()
        for b in zip(toks, toks[1:]):
            model[b] += 1
    n1_bwd: Counter = Counter()
    for (_, w2), _c in model.items():
        n1_bwd[w2] += 1
    assert sum(c for (w1, w2), c in model.items() if w2 == "francisco") == sum(
        c for (w1, w2), c in model.items() if w2 == "york"
    )
    assert n1_bwd["francisco"] == 1
    assert n1_bwd["york"] == 3
