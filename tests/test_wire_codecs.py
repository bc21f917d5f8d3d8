"""Publish wire codec unit tests: the Smile subset codec (including the
shared-string back references Jackson enables by default, which our
encoder never emits but the decoder must accept) and the compact batch
string-table format, plus a randomized cross-format equivalence sweep.
"""

from __future__ import annotations

import json
import math
import random

from atlas_spark.streaming.norm import encode_compact_batch
from atlas_spark.streaming.smile import (
    FLAG_SHARED_NAMES,
    FLAG_SHARED_VALUES,
    HEADER,
    smile_decode,
    smile_encode,
)


def test_smile_roundtrip_scalars():
    for v in [None, True, False, 0, -16, 15, 16, -17, 2**31 - 1, -(2**31), 2**40,
              0.0, -0.0, math.pi, 5e-324, 1.7e308, float("inf"), float("-inf"),
              "", "a", "x" * 32, "x" * 33, "x" * 64, "x" * 200, "héllo", "ü" * 40]:
        out = smile_decode(smile_encode(v))
        if isinstance(v, float):
            assert (math.isnan(out) and math.isnan(v)) or out == v, v
        else:
            assert out == v, v


def test_smile_roundtrip_nan():
    out = smile_decode(smile_encode(float("nan")))
    assert math.isnan(out)


def test_smile_shared_name_references():
    """Hand-built payload with the shared-names flag: repeated keys use
    0x40+ref back references (Jackson's default encoder behavior)."""
    out = bytearray(HEADER)
    out.append(FLAG_SHARED_NAMES)
    out.append(0xF8)  # [
    # {"ab": 1}
    out += bytes([0xFA, 0x80 + 1]) + b"ab" + bytes([0xC0 + 2, 0xFB])
    # {"ab": 2} with the key as shared ref #0
    out += bytes([0xFA, 0x40 + 0, 0xC0 + 4, 0xFB])
    out.append(0xF9)  # ]
    assert smile_decode(bytes(out)) == [{"ab": 1}, {"ab": 2}]


def test_smile_shared_value_references():
    """Shared STRING VALUE back refs (tokens 0x01-0x1F, ref = token-1)."""
    out = bytearray(HEADER)
    out.append(FLAG_SHARED_VALUES)
    out.append(0xF8)  # [
    out += bytes([0x40 + 2]) + b"abc"  # "abc" (tiny ascii), becomes shared #0
    out += bytes([0x01])  # back ref #0
    out.append(0xF9)  # ]
    assert smile_decode(bytes(out)) == ["abc", "abc"]


def test_smile_rejects_non_smile():
    import pytest

    with pytest.raises(ValueError, match="smile"):
        smile_decode(b'{"not": "smile"}')


def test_compact_batch_encoder_dedups_table():
    dps = [({"name": "a", "app": "w"}, 1, 1.0), ({"name": "b", "app": "w"}, 2, 2.0)]
    arr = json.loads(encode_compact_batch(dps))
    size = arr[0]
    table = arr[1 : 1 + size]
    assert len(table) == len(set(table)) == 5  # name, a, app, w, b — deduped


def _rand_payload(rng: random.Random):
    names = ["cpu", "disk", "mem", "net"]
    metrics = []
    for _ in range(rng.randint(1, 5)):
        tags = {"name": rng.choice(names)}
        for i in range(rng.randint(0, 3)):
            tags[f"t{i}"] = rng.choice(["x", "y", "zz", "wéird"])
        metrics.append(
            {
                "tags": tags,
                "timestamp": 1700000000000 + rng.randint(0, 10**7),
                "value": round(rng.uniform(-100, 100), 4),
            }
        )
    common = {"app": rng.choice(["www", "db"])} if rng.random() < 0.5 else None
    doc = {"metrics": metrics}
    if common:
        doc["tags"] = common
    return doc


def test_cross_format_equivalence_random(spark):
    """50 random payloads: the JSON, Smile, and compact decoders produce
    identical (tags, timestamp, value) rows."""
    import pyspark.sql.functions as F

    from atlas_spark.streaming.norm import (
        decode_compact_batch_payloads,
        decode_publish_payloads,
    )
    from atlas_spark.streaming.smile import decode_smile_payloads

    rng = random.Random(64_000)
    docs = [_rand_payload(rng) for _ in range(50)]

    def rows_of(df):
        return sorted(
            (tuple(sorted(r["tags"].items())), r["timestamp"], r["value"])
            for r in df.collect()
        )

    j = spark.createDataFrame([(json.dumps(d),) for d in docs], "payload string")
    via_json = rows_of(decode_publish_payloads(j))

    s = spark.createDataFrame(
        [(bytearray(smile_encode(d)),) for d in docs], "payload binary"
    )
    via_smile = rows_of(decode_smile_payloads(s))

    flat = [
        ({**d.get("tags", {}), **m["tags"]}, m["timestamp"], m["value"])
        for d in docs
        for m in d["metrics"]
    ]
    c = spark.createDataFrame(
        [(encode_compact_batch(flat),)], "payload string"
    )
    via_compact = rows_of(decode_compact_batch_payloads(c))

    assert via_json == via_smile == via_compact
    assert len(via_json) == len(flat)


def test_compact_batch_zero_datapoints(spark):
    """A zero-datapoint compact payload must not fail the job
    (sequence(1, 0) is the DESCENDING [1, 0] in Spark — unguarded it
    walks the cursor out of bounds and ANSI element_at throws): with
    drop_undecodable=True it yields no rows, with False one all-null
    reject row (the documented audit contract)."""
    import json as _json

    from atlas_spark.streaming.norm import decode_compact_batch_payloads

    empty = _json.dumps([0, 0])  # tableSize=0, nDatapoints=0
    df = spark.createDataFrame([(empty,)], "payload string")
    assert decode_compact_batch_payloads(df).count() == 0
    rows = decode_compact_batch_payloads(df, drop_undecodable=False).collect()
    assert len(rows) == 1
    assert rows[0]["tags"] is None and rows[0]["value"] is None


def test_compact_batch_corrupt_payloads_degrade(spark):
    """Corrupt counts/indexes degrade to null rows, never exceptions, and
    never unbounded work: non-numeric nDatapoints, absurdly large
    nDatapoints (clamped to payload capacity), dangling string-table
    indexes (pair dropped), and unparseable JSON."""
    import json as _json

    from atlas_spark.streaming.norm import (
        decode_compact_batch_payloads,
        encode_compact_batch,
    )

    good = encode_compact_batch([({"name": "ok"}, 5, 1.5)])
    corrupt_count = _json.dumps([2, "name", "ok", "NOPE", "-", 1, 0, 1, 5, 1.5])
    huge_count = _json.dumps([2, "name", "ok", 999999999, "-", 1, 0, 1, 5, 1.5])
    dangling_idx = _json.dumps([2, "name", "ok", 1, "-", 1, 50, 1, 5, 1.5])
    not_json = "this is not json"
    df = spark.createDataFrame(
        [(good,), (corrupt_count,), (huge_count,), (dangling_idx,), (not_json,)],
        "payload string",
    )
    rows = decode_compact_batch_payloads(df, drop_undecodable=False).collect()
    # good payload decodes normally
    assert ({"name": "ok"}, 5, 1.5) in [
        (r["tags"], r["timestamp"], r["value"]) for r in rows if r["tags"]
    ]
    # corrupt-count and not-json payloads each yield >=1 all-null row
    assert sum(1 for r in rows if r["tags"] is None and r["value"] is None) >= 2
    # dangling index: the tag pair is dropped, value survives
    assert any(r["tags"] == {} and r["value"] == 1.5 for r in rows)
    # huge count is clamped: total rows bounded by payload capacity
    assert len(rows) < 20
    # drop_undecodable=True keeps only fully-decoded rows and still runs
    assert decode_compact_batch_payloads(df).count() >= 1


def test_compact_batch_duplicate_tag_key_last_wins(spark):
    """A record whose tag list repeats the same key index (corrupt or
    adversarial) must NOT fail the micro-batch: under the default
    spark.sql.mapKeyDedupPolicy=EXCEPTION a naive map_from_entries throws
    DUPLICATE_MAP_KEY.  The decoder dedups entries last-write-wins per
    key, matching the reference's Jackson decode semantics
    (PublishPayloads.scala)."""
    import json as _json

    from atlas_spark.streaming.norm import decode_compact_batch_payloads

    # table: ["name", "a", "b"]; one record, 2 tag pairs both keyed
    # "name": (0->1) then (0->2) — last write ("b") must win
    dup = _json.dumps([3, "name", "a", "b", 1, "-", 2, 0, 1, 0, 2, 5, 1.5])
    df = spark.createDataFrame([(dup,)], "payload string")
    rows = decode_compact_batch_payloads(df).collect()
    assert len(rows) == 1
    assert rows[0]["tags"] == {"name": "b"}
    assert rows[0]["timestamp"] == 5 and rows[0]["value"] == 1.5


def test_smile_shared_name_table_resets_at_1024():
    """Jackson clears the shared-name table at 1024 entries and restarts
    indices from 0; a >1024-name document must decode back refs against
    the post-reset table, not the stale one."""
    out = bytearray(HEADER)
    out.append(FLAG_SHARED_NAMES)
    out.append(0xF8)  # [
    # 1024 distinct short-ascii keys fill the table exactly
    for i in range(1024):
        k = f"k{i:04d}"
        out += bytes([0xFA, 0x80 + len(k) - 1]) + k.encode() + bytes([0xC0, 0xFB])
    # the 1025th key triggers the reset and lands at index 0
    out += bytes([0xFA, 0x80 + 4]) + b"fresh" + bytes([0xC0, 0xFB])
    # short back ref #0 must now resolve to "fresh", not "k0000"
    out += bytes([0xFA, 0x40 + 0, 0xC0 + 2, 0xFB])
    out.append(0xF9)  # ]
    docs = smile_decode(bytes(out))
    assert docs[-1] == {"fresh": 1}


def test_smile_long_shared_value_reference():
    """Token 0xEC-0xEF: long shared STRING value back reference with a
    10-bit index ((tok & 3) << 8 | next byte)."""
    out = bytearray(HEADER)
    out.append(FLAG_SHARED_VALUES)
    out.append(0xF8)  # [
    out += bytes([0x40 + 2]) + b"abc"  # shared value #0
    out += bytes([0xEC, 0x00])  # long back ref to index 0
    out.append(0xF9)  # ]
    assert smile_decode(bytes(out)) == ["abc", "abc"]
