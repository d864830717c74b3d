"""The pluggable external-decoder seam (VERDICT r11 #7): guarded
formats (mp3 here) dispatch to a REGISTERED decoder with zero plan or
schema changes, and raise a loud registration hint when none is
present — proving a real deployment drops minimp3/pyav in without
touching engine code."""

from __future__ import annotations

import struct

import pytest

# Integration-heavy: excluded from the fast inner loop (pytest -m "not slow");
# the full suite still runs these unchanged at round close-out (SURVEY 5).
pytestmark = pytest.mark.slow

from pyspark.sql import Row

from connectors_spark.ops.multimodal import (
    decode_audio, register_external_decoder, unregister_external_decoder)


def _fake_mp3(doc_id: int) -> bytes:
    # an ID3v2 header followed by opaque payload — sniffs as audio/mpeg
    return b"ID3\x04\x00\x00\x00\x00\x00\x0a" + struct.pack("<q", doc_id)


def fake_mp3_decode(blob: bytes):
    """Deterministic stand-in decoder (module-level: ships by value
    into the mapInPandas closure like a real binding would)."""
    (did,) = struct.unpack("<q", blob[-8:])
    return 16000, 1, [did % 100, (did % 100) + 1, (did % 100) + 2]


def test_registered_decoder_dispatches(spark):
    df = spark.createDataFrame(
        [Row(doc_id=i, media=bytearray(_fake_mp3(i))) for i in range(6)])
    register_external_decoder("audio", "audio/mpeg", fake_mp3_decode)
    try:
        out = {r["doc_id"]: (r["sample_rate"], r["n_samples"],
                             r["amp_sum"])
               for r in decode_audio(df).collect()}
    finally:
        unregister_external_decoder("audio", "audio/mpeg")
    assert out == {i: (16000, 3, 3 * (i % 100) + 3) for i in range(6)}


def test_unregistered_guarded_format_raises_with_hint(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, media=bytearray(_fake_mp3(1)))])
    with pytest.raises(Exception, match="register_external_decoder"):
        decode_audio(df).collect()


def test_registration_is_snapshotted_per_plan(spark):
    # a plan built BEFORE registration must not see a later one — the
    # registry ships by value at plan-build time, deterministic under
    # task retries
    df = spark.createDataFrame(
        [Row(doc_id=2, media=bytearray(_fake_mp3(2)))])
    plan = decode_audio(df)
    register_external_decoder("audio", "audio/mpeg", fake_mp3_decode)
    try:
        with pytest.raises(Exception, match="register_external_decoder"):
            plan.collect()
        assert decode_audio(df).count() == 1
    finally:
        unregister_external_decoder("audio", "audio/mpeg")


def test_unknown_kind_refused():
    with pytest.raises(ValueError, match="unknown media kind"):
        register_external_decoder("smellovision", "x", fake_mp3_decode)
