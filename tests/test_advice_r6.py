"""Round-6 hardening from the round-5 advisory review:

1. GIF streams truncated at a BLOCK boundary (missing 0x3B trailer, or
   cut mid-extension) must reject, not silently return partial frames.
2. ``w18_ohlc_bars``'s packed ordering key (micros-within-hour * 2^31
   + event_id) orders by (ts, event_id) iff event_id < 2^31 — assert
   the fixture generator respects the bound and that the packing is
   exact/ordered at the bound's edge.
3. ``zorder_profile``'s bucket is an integer shift, exact for z-values
   past the 53-bit double mantissa (bits up to 31).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mbai_gdb_spark.ops.multimodal import decode_payload_bytes, encode_gif, gif_frames

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# 1. GIF block-boundary truncation
# ---------------------------------------------------------------------------


def _good_gif() -> bytes:
    pal = [(0, 0, 0), (255, 255, 255), (9, 9, 9), (1, 1, 1)]
    return encode_gif(4, 3, pal, bytes(range(4)) * 3)


def test_gif_missing_trailer_rejected():
    good = _good_gif()
    assert good[-1] == 0x3B
    assert decode_payload_bytes(good) is not None
    # Drop ONLY the trailer: every block before it is intact, so the
    # demuxer loop used to exit normally with a complete-looking frame
    # list. Strict stance: the whole payload is rejected.
    assert decode_payload_bytes(good[:-1]) is None
    assert gif_frames(good[:-1]) is None


def test_gif_truncated_mid_extension_rejected():
    good = bytearray(_good_gif())
    sep = good.index(0x2C, 13)
    # Splice an extension whose sub-block claims 200 bytes but the
    # stream ends immediately — truncation inside an extension.
    trunc = bytes(good[:sep]) + b"\x21\xfe\xc8"
    assert decode_payload_bytes(trunc) is None
    assert gif_frames(trunc) is None


# ---------------------------------------------------------------------------
# 2. w18 packed ordering key bound
# ---------------------------------------------------------------------------


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="fixtures absent")
def test_w18_event_id_within_packing_bound(spark):
    from mbai_gdb_spark.io import read_table

    ev = read_table(spark, SF_DIR, "events")
    mx = ev.agg(F.max("event_id").alias("mx")).collect()[0].mx
    # The packed key micros_in_hour * 2^31 + event_id only orders by
    # (ts, event_id) while ids stay below 2^31; the fixture generator
    # allocates sequential ids, so the max is the bound to watch.
    assert mx < 2**31, mx


def test_w18_packing_orders_at_the_edge():
    mult = 2**31
    max_micros = 3_600_000_000 - 1  # largest micros-within-hour
    max_id = 2**31 - 1
    # Exactness: the largest packable key fits in int64.
    assert max_micros * mult + max_id < 2**63
    # Order: (ts, id) lexicographic == packed-scalar order at the edges.
    keys = [
        (0, 0),
        (0, max_id),
        (1, 0),  # one microsecond later beats any id in the previous µs
        (1, max_id),
        (max_micros, 0),
        (max_micros, max_id),
    ]
    packed = [m * mult + i for m, i in keys]
    assert packed == sorted(packed)
    assert sorted(keys) == [keys[packed.index(p)] for p in sorted(packed)]


# ---------------------------------------------------------------------------
# 3. zorder bucket exact past 2^53
# ---------------------------------------------------------------------------


def test_zorder_bucket_exact_for_large_z(spark):
    from mbai_gdb_spark.ops.layout import zorder_profile

    bits, shift = 31, 3
    # x = y = 2^31 - 1 interleaves to z = 2^62 - 1: far beyond the
    # double mantissa, where floor(z / 2^shift) could round-then-floor
    # into the wrong bucket. Pairs straddle a bucket boundary so a
    # mis-assignment changes the grouping, not just a label.
    big = (1 << 31) - 1
    pts = [(big, big), (big - 1, big), (big, big - 1), (0, 0), (1, 1)]
    df = spark.createDataFrame(pts, "x long, y long")
    prof = zorder_profile(df, "x", "y", bits=bits, bucket_shift=shift)
    got = {r.z_bucket: r.n_rows for r in prof.collect()}

    def morton(x, y, nb):
        z = 0
        for i in range(nb):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    expect: dict[int, int] = {}
    for x, y in pts:
        b = morton(x, y, bits) >> shift
        expect[b] = expect.get(b, 0) + 1
    assert got == expect
