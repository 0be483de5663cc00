"""x2_edit_neardup two-key blocking recall gate (r10): plant typo pairs the
single 12-char-prefix key PROVABLY misses — a corruption inside chars 1-12
moves the doc out of key-1's block, so only the second slice (chars 13-24)
can recover the candidate. Also pins the no-regression direction (key-1
pairs survive the union), pair dedup across keys, the short-doc rule (no
empty-key mega-block), and the CAP^2 fan-out bound per key."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from otlp2parquet_spark.extensions.dedup import (
    EDIT_BLOCK_KEY_LEN,
    EDIT_PREFIX_LEN,
)
from otlp2parquet_spark.queries.registry import all_specs

_BASE = "abcdefghijkl mnopqrstuvwx yz0123456789 the quiet village square"
assert len(_BASE) >= 24


def _write_docs(tmp_path, docs):
    tbl = pa.table(
        {
            "doc_id": pa.array([d for d, _ in docs], pa.int64()),
            "text": [t for _, t in docs],
            "lang": ["en"] * len(docs),
            "source": ["s"] * len(docs),
            "n_chars": pa.array([len(t) for _, t in docs], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _pairs(spark, sf_dir):
    return {
        (r.doc_a, r.doc_b): r.edit_dist
        for r in all_specs()["x2_edit_neardup"].build(spark, sf_dir).collect()
    }


def test_in_prefix_typo_recovered_by_second_key(spark, tmp_path):
    # doc 2 corrupts char 3 — INSIDE the first 12-char key, so key 1 blocks
    # the two docs apart; chars 13-24 are untouched, so key 2 must pair them
    typo = _BASE[:2] + "x" + _BASE[3:]
    assert typo[:EDIT_BLOCK_KEY_LEN] != _BASE[:EDIT_BLOCK_KEY_LEN]
    assert (
        typo[EDIT_BLOCK_KEY_LEN : 2 * EDIT_BLOCK_KEY_LEN]
        == _BASE[EDIT_BLOCK_KEY_LEN : 2 * EDIT_BLOCK_KEY_LEN]
    )
    sf = _write_docs(tmp_path, [(1, _BASE), (2, typo), (9, "unrelated content entirely")])
    pairs = _pairs(spark, sf)
    assert pairs == {(1, 2): 1}, pairs


def test_suffix_typo_still_found_by_first_key_and_deduped(spark, tmp_path):
    # doc 2 corrupts a char past BOTH keys (inside the 64-char DP window):
    # both keys produce the candidate — the union must emit the pair ONCE
    pos = 2 * EDIT_BLOCK_KEY_LEN + 6
    assert pos < EDIT_PREFIX_LEN
    typo = _BASE[:pos] + "x" + _BASE[pos + 1 :]
    sf = _write_docs(tmp_path, [(1, _BASE), (2, typo)])
    pairs = _pairs(spark, sf)
    assert pairs == {(1, 2): 1}, pairs


def test_typos_in_both_slices_stay_out_of_scope(spark, tmp_path):
    # corruptions in BOTH 12-char slices defeat both keys — the documented
    # bound (the token-level LSH lanes' job), pinned so a future key change
    # that silently widens scope shows up here
    typo = _BASE[:2] + "x" + _BASE[3:15] + "y" + _BASE[16:]
    sf = _write_docs(tmp_path, [(1, _BASE), (2, typo)])
    assert _pairs(spark, sf) == {}


def test_short_docs_lack_second_key_not_mega_block(spark, tmp_path):
    # docs shorter than 13 normalized chars have NO second key: two short
    # docs with different prefixes must NOT pair via a shared empty key
    sf = _write_docs(tmp_path, [(1, "alpha beta"), (2, "gamma delta")])
    assert _pairs(spark, sf) == {}
    # docs sharing the full first key still pair via key 1 even when the
    # typo sits past the end of the (short) second slice
    sub = tmp_path / "b"
    sub.mkdir()
    sf2 = _write_docs(sub, [(3, "alpha beta one"), (4, "alpha beta onx")])
    assert _pairs(spark, sf2) == {(3, 4): 1}


def test_oracle_matches_on_planted_corpus(spark, tmp_path):
    # the DuckDB twin must mirror the two-key union exactly, including the
    # planted in-prefix-typo pair the single-key oracle would miss
    import duckdb
    import sys

    sys.path.insert(0, "tests")
    from oracle_util import compare

    typo = _BASE[:2] + "x" + _BASE[3:]
    sf = _write_docs(tmp_path, [(1, _BASE), (2, typo), (3, _BASE + " tail")])
    spec = all_specs()["x2_edit_neardup"]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    assert not compare(spec.build(spark, sf), con, spec.oracle)


def test_early_indel_is_out_of_scope(spark, tmp_path):
    # an insertion/deletion BEFORE the second slice shifts every later
    # character, so it can defeat both substitution-oriented block keys —
    # the documented substitution-only bound of the guarantee, pinned so a
    # doc claim can't silently overreach (edit_dist would be 1, but no
    # blocking key recovers the pair)
    deleted = _BASE[:4] + _BASE[5:]  # drop char 5 (inside slice 1)
    assert deleted[:EDIT_BLOCK_KEY_LEN] != _BASE[:EDIT_BLOCK_KEY_LEN]
    assert (
        deleted[EDIT_BLOCK_KEY_LEN : 2 * EDIT_BLOCK_KEY_LEN]
        != _BASE[EDIT_BLOCK_KEY_LEN : 2 * EDIT_BLOCK_KEY_LEN]
    )
    sf = _write_docs(tmp_path, [(1, _BASE), (2, deleted)])
    assert _pairs(spark, sf) == {}
