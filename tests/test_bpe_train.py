"""x4_bpe_train correctness gate: the distributed trainer's merge list must
be BIT-IDENTICAL to a pure-Python reference BPE replayed over the same
corpus (the T10 model-replay pattern — iterative argmax is not
SQL-expressible, so this op is rows-only for the driver and this test IS
its oracle)."""

from __future__ import annotations

import collections
import re

import pyarrow.parquet as pq
import pytest

from otlp2parquet_spark.extensions.text import (
    _PRETOKEN_RE,
    bpe_train,
    x4_bpe_encode,
    x4_bpe_train,
)


def ref_bpe(texts, rounds: int = 10, return_words: bool = False):
    """Sennrich-style reference: fold duplicate pretokens, count overlapping
    adjacent pairs weighted by frequency, argmax with (count desc, left asc,
    right asc) tie-break, apply left-to-right non-overlapping."""
    pat = re.compile(_PRETOKEN_RE)
    vocab = collections.Counter()
    for t in texts:
        vocab.update(pat.findall(t))
    words = {w: list(w) for w in vocab}
    merges = []
    for rnd in range(1, rounds + 1):
        pairs = collections.Counter()
        for w, freq in vocab.items():
            syms = words[w]
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += freq
        if not pairs:
            break
        (a, b), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        for w, syms in words.items():
            out, carry = [], None
            for s in syms:
                if carry is None:
                    carry = s
                elif carry == a and s == b:
                    out.append(a + b)
                    carry = None
                else:
                    out.append(carry)
                    carry = s
            if carry is not None:
                out.append(carry)
            words[w] = out
        corpus_tokens = sum(freq * len(words[w]) for w, freq in vocab.items())
        merges.append((rnd, a, b, a + b, cnt, corpus_tokens))
    return (merges, words) if return_words else merges


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_bpe_train_matches_reference_replay(spark, sf_dir):
    texts = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])[
        "text"
    ].to_pylist()
    expect = ref_bpe(texts, rounds=10)
    got = [
        (r["round"], r["left"], r["right"], r["merged"], r["pair_count"], r["corpus_tokens"])
        for r in x4_bpe_train(spark, sf_dir).collect()
    ]
    assert got == expect


def test_bpe_merge_semantics_edge_cases(spark):
    """Greedy non-overlap + self-pair + early-exhaustion semantics on a
    corpus small enough to verify by hand."""
    df = spark.createDataFrame([("aaaa bb",), ("aaaa",)], "text string")
    merges = bpe_train(df, rounds=4)
    # round 1: pairs (a,a) weighted — "aaaa" appears twice (freq 2): 3 adjacent
    # (a,a) per occurrence -> 6; " bb": (space,b)=1,(b,b)=1. Top: (a,a) cnt 6.
    assert merges[0][1:5] == ("a", "a", "aa", 6)
    # non-overlap: "aaaa" -> [aa, aa]; corpus after r1: 2*2 (aaaa x2) + [" b b"->3? ]
    # " bb" pretokens: " bb" is split as " bb"? _PRETOKEN_RE: " ?[a-zA-Z]+" gives "aaaa", " bb".
    # " bb" = [' ','b','b'] -> 3 symbols; after r1 unchanged -> total 2*2+3 = 7
    assert merges[0][5] == 7
    # round 2 top pair: (aa,aa) cnt 2 beats (' ',b)=1,(b,b)=1
    assert merges[1][1:5] == ("aa", "aa", "aaaa", 2)
    rounds_run = len(merges)
    # merging continues until no pairs remain (every word one symbol), which
    # takes: r3 (' ',b) or (b,b)? tie at cnt 1 -> lexicographic: ' ' < 'b'
    assert merges[2][1:3] == (" ", "b")
    assert rounds_run == 4  # r4 merges (' b','b') -> ' bb'; then exhausted


def _ref_encode_rows(doc_rows, rounds: int = 10):
    """(doc_id, n_pretokens, n_symbols, n_bpe_tokens, compression) per doc
    by replaying the reference tokenizer over the same corpus."""
    pat = re.compile(_PRETOKEN_RE)
    _merges, words = ref_bpe([t for _i, t in doc_rows], rounds, return_words=True)
    out = []
    for doc_id, text in doc_rows:
        pts = pat.findall(text)
        n_sym = sum(len(p) for p in pts)
        n_bpe = sum(len(words[p]) for p in pts)
        comp = None
        if n_bpe:
            import math

            comp = math.floor(n_sym / n_bpe * 10000.0 + 0.5) / 10000.0
        out.append((doc_id, len(pts), n_sym, n_bpe, comp))
    return sorted(out)


def test_bpe_encode_matches_reference_replay(spark):
    sf_dir = "/root/testdata/sf0.001"
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    doc_rows = list(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    got = sorted(map(tuple, x4_bpe_encode(spark, sf_dir).collect()))
    assert got == _ref_encode_rows(doc_rows)


def test_bpe_encode_handles_empty_and_punct_docs(spark, tmp_path):
    """A doc with no pretokens (empty / all-punct text) must come back with
    zero counts and NULL compression, not vanish in the join."""
    import pyarrow as pa

    sf = str(tmp_path / "sf")
    __import__("os").makedirs(sf)
    rows = [(0, "aa aa bb"), (1, ""), (2, "!!! 123"), (3, "aa")]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        ),
        f"{sf}/documents.parquet",
    )
    got = sorted(map(tuple, x4_bpe_encode(spark, sf).collect()))
    want = _ref_encode_rows(rows)
    assert got == want
    by_id = {r[0]: r for r in got}
    assert by_id[1][1:] == (0, 0, 0, None)


def test_bpe_train_stops_when_exhausted(spark):
    df = spark.createDataFrame([("ab",)], "text string")
    merges = bpe_train(df, rounds=10)
    assert len(merges) == 1  # one merge possible, loop exits early
    assert merges[0][1:5] == ("a", "b", "ab", 1)
