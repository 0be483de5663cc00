"""Fuzz the binary container parsers' quarantine contract: over arbitrary
bytes AND bit-flipped/truncated valid containers, every parser must either
return a value or raise one of its DECLARED malformed-input exceptions —
any other exception class would escape the decode kernels' except clauses
and kill the whole Spark task instead of nulling one row (the D25
posture). This is exactly how the stdlib wave module's RuntimeError path
was found (round 6): wave.open on certain corrupt fmt chunks raises
RuntimeError, which (wave.Error, EOFError, ValueError) did not cover.

Driver-side only (no Spark session needed) — hundreds of examples run in
milliseconds against the same parse functions the kernels call.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave

from hypothesis import given, settings
from hypothesis import strategies as st

from otlp2parquet_spark.extensions.multimodal import (
    parse_avi_frames,
    parse_avi_meta,
    parse_png_meta,
    parse_wav_meta,
)

# the exception classes the decode kernels catch, per lane — these sets
# MUST mirror the kernels' except clauses (multimodal.py): the property
# being tested is "nothing escapes the kernel's clause"
import zlib

_WAV_OK = (wave.Error, EOFError, ValueError, RuntimeError, struct.error)
_PNG_OK = (ValueError, KeyError, zlib.error, struct.error)
_AVI_META_OK = (ValueError, struct.error)
# decode_avi_frames catches bare ValueError — parse_avi_frames uses only
# slicing + int.from_bytes, so ValueError is provably its complete set;
# the fuzz property must be exactly as strict as the kernel clause
_AVI_FRAMES_OK = (ValueError,)


def _wav_bytes(doc_id: int = 7) -> bytes:
    rate, ch, n = 16000, 2, 50
    pcm = hashlib.sha256(str(doc_id).encode()).digest()
    body = (pcm * (n * ch * 2 // len(pcm) + 1))[: n * ch * 2]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(ch)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(body)
    return buf.getvalue()


def _avi_bytes() -> bytes:
    from otlp2parquet_spark.extensions import multimodal as M

    avih = struct.pack("<10I16x", 66666, 0, 0, 0, 3, 0, 1, 0, 64, 48)
    strh = struct.pack(
        "<4s4s3I5I2HI8x", b"vids", b"\x00" * 4, 0, 0, 0, 1, 15, 0, 3, 0, 0, 0, 0
    )
    hdrl = M._avi_list(
        b"hdrl", M._avi_chunk(b"avih", avih) + M._avi_list(b"strl", M._avi_chunk(b"strh", strh))
    )
    movi = M._avi_list(
        b"movi",
        b"".join(M._avi_chunk(b"00dc", hashlib.sha256(f"7:{i}".encode()).hexdigest().encode()) for i in range(3)),
    )
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _png_bytes():
    # the REAL fixture building blocks (multimodal._png_chunk / _PNG_SIG) so
    # the fuzzed 'good' corpus cannot drift from the synthesis
    from otlp2parquet_spark.extensions import multimodal as M

    w, h = 4, 3
    raw = b"".join(b"\x00" + bytes(w) for _ in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        M._PNG_SIG
        + M._png_chunk(b"IHDR", ihdr)
        + M._png_chunk(b"IDAT", zlib.compress(raw))
        + M._png_chunk(b"IEND", b"")
    )


def _wav_parse(b: bytes):
    # the kernels' OWN parse path (header) + the feature kernel's frame read
    parse_wav_meta(b)
    with wave.open(io.BytesIO(b), "rb") as w:
        w.readframes(w.getnframes())


_mutations = st.lists(
    st.tuples(st.integers(min_value=0, max_value=10_000), st.integers(0, 255)),
    min_size=1,
    max_size=12,
)


def _mutate(good: bytes, muts, cut: int) -> bytes:
    b = bytearray(good[: max(1, cut % (len(good) + 1))])
    for pos, val in muts:
        if b:
            b[pos % len(b)] = val
    return bytes(b)


@given(data=st.binary(max_size=400))
@settings(max_examples=300, deadline=None)
def test_parsers_never_crash_on_arbitrary_bytes(data):
    for parse, ok in (
        (_wav_parse, _WAV_OK),
        (parse_png_meta, _PNG_OK),
        (parse_avi_meta, _AVI_META_OK),
        (parse_avi_frames, _AVI_FRAMES_OK),
    ):
        try:
            parse(data)
        except ok:
            pass  # declared malformed-input class: the kernel quarantines it


@given(muts=_mutations, cut=st.integers(min_value=1, max_value=10_000))
@settings(max_examples=300, deadline=None)
def test_parsers_never_crash_on_corrupted_containers(muts, cut):
    for good, parse, ok in (
        (_wav_bytes(), _wav_parse, _WAV_OK),
        (_png_bytes(), parse_png_meta, _PNG_OK),
        (_avi_bytes(), parse_avi_meta, _AVI_META_OK),
        (_avi_bytes(), parse_avi_frames, _AVI_FRAMES_OK),
    ):
        try:
            parse(_mutate(good, muts, cut))
        except ok:
            pass


def test_fixture_containers_roundtrip():
    """The synthesized fixtures must parse back to their formula values —
    anchors the fuzz suite's 'good' corpora to the real fixtures."""
    _wav_parse(_wav_bytes())
    assert parse_png_meta(_png_bytes())[:2] == (4, 3)
    assert parse_avi_meta(_avi_bytes())[:2] == (64, 48)
    assert len(parse_avi_frames(_avi_bytes())) == 3
