"""Reference-file parity: decode the golden frame from reader_test.go:13-14
and sweep all of test_data/county.geobuf against county.geojson
(feature-for-feature: id, geom type, properties, coords ≤1e-7)."""

import json
import pathlib
import re

import numpy as np
import pytest

from geobuf_spark.codec import core

REF = pathlib.Path("/root/reference")

pytestmark = pytest.mark.skipif(not REF.exists(), reason="reference not present")


def _load_golden():
    """Parse the golden JSON feature and byte literal out of reader_test.go."""
    src = (REF / "reader_test.go").read_text()
    m = re.search(r"var feature_ss = `(.*?)`", src, re.S)
    feature = json.loads(m.group(1))
    m = re.search(r"var feature_buf = \[\]byte\{(.*?)\}", src, re.S)
    buf = bytes(int(tok, 0) for tok in m.group(1).split(","))
    return feature, buf


def test_golden_frame_decodes():
    feature, buf = _load_golden()
    feat = core.decode_feature(buf)
    assert core.GEOM_TYPES[feat.geom_type] == "LineString"
    want = np.asarray(feature["geometry"]["coordinates"], dtype=np.float64)
    got = feat.vertices()
    assert got.shape == want.shape == (274, 2)
    # The reference's own decode of this frame lands exactly here: Go
    # accumulates sv/1e7 in float64 and floors negatives (geom.go:78-90,139),
    # producing up to ~1.0000001e-7 error on these vertices (verified by
    # replaying Go's op sequence). Assert the faithful compound bound.
    assert np.abs(got - want).max() <= 2.01e-7
    # and the exact integer path reproduces the writer's quantized lattice
    # (trunc(c*1e7), geom.go:173-179) bit-for-bit — no accumulation error
    qgot = core.decode_feature(buf, quantized=True).vertices()
    assert np.array_equal(qgot, core.quantize_vec(want.reshape(-1)).reshape(-1, 2))
    # the golden frame was written by an older encoder that emitted the int
    # property as field 6 (sint64/zigzag); we decode it back to 199 — the
    # current reference reader's ReadUInt64 quirk (read_feature.go:43-44)
    # would surface 398 and is deliberately not copied (documented in core).
    assert feat.properties == {"shit": 199}


def test_golden_geometry_bytes_match_our_encoder():
    """Our packed-geometry bytes must equal the golden frame's geometry field
    byte-for-byte (delta+zigzag+varint semantics are unchanged between the
    old and current writer)."""
    feature, buf = _load_golden()
    feat = core.Feature.from_geojson("LineString", feature["geometry"]["coordinates"])
    ours = core.encode_feature(feat)

    def extract_geom_field(frame: bytes) -> bytes:
        b = np.frombuffer(frame, dtype=np.uint8)
        pos = 0
        while pos < len(b):
            tag, pos = core.decode_varint(b, pos)
            k, w = tag >> 3, tag & 7
            if w == 0:
                _, pos = core.decode_varint(b, pos)
            elif w == 2:
                ln, pos = core.decode_varint(b, pos)
                if k == 4:
                    return bytes(b[pos : pos + ln])
                pos += ln
            else:
                raise AssertionError(f"unexpected wire type {w}")
        raise AssertionError("no geometry field")

    assert extract_geom_field(ours) == extract_geom_field(buf)


def test_county_sweep():
    gj = json.loads((REF / "test_data" / "county.geojson").read_text())
    data = (REF / "test_data" / "county.geobuf").read_bytes()
    frames = list(core.read_frames(data))
    features = gj["features"]
    assert len(frames) == len(features), (len(frames), len(features))

    # county.geobuf was written by goroutine-per-feature AddFeatures
    # (convert_geojson.go:110-139) — frame order is racy; match by id.
    by_id = {f["id"]: f for f in features}
    assert len(by_id) == len(features)

    mismatches = 0
    for i, frame in enumerate(frames):
        got = core.decode_feature(frame)
        want = by_id[got.id]
        assert core.GEOM_TYPES[got.geom_type] == want["geometry"]["type"], i
        # properties: numeric values in the JSON parse as float64 in both
        # go.geojson and python json — compare with type-tolerant equality
        for k, v in want.get("properties", {}).items():
            gv = got.properties.get(k)
            if isinstance(v, float) or isinstance(gv, float):
                assert float(gv) == pytest.approx(float(v), abs=1e-9), (i, k)
            else:
                assert gv == v, (i, k)
        wantc = core.Feature.from_geojson(
            want["geometry"]["type"], want["geometry"]["coordinates"]
        ).coords
        # float path: ≤1e-7 + ulp slack — Go's decode produces the identical
        # just-over-by-ulp values (float64 accumulation of sv/1e7)
        if got.coords.shape != wantc.shape or np.abs(got.coords - wantc).max() > 1.001e-7:
            mismatches += 1
        # integer path: exact — decoded lattice ints equal trunc(c*1e7) of the
        # JSON coords bit-for-bit, proving delta/zigzag/varint parity
        qgot = core.decode_feature(frame, quantized=True)
        if not np.array_equal(qgot.coords, core.quantize_vec(wantc)):
            mismatches += 1
    assert mismatches == 0, f"{mismatches}/{len(frames)} features mismatched"
