"""Synthetic generator invariants (FIXTURES.md F1 duplicate families)."""

from __future__ import annotations

from collections import defaultdict

from dedup import imaging, synth
from dedup.config import DEFAULT
from dedup.signatures import jaccard, shingle_hashes


def test_deterministic():
    a = synth.generate(200, seed=42)
    b = synth.generate(200, seed=42)
    assert [(r["image_id"], r["bytes"], r["caption"], r["phash"]) for r in a] == [
        (r["image_id"], r["bytes"], r["caption"], r["phash"]) for r in b
    ]
    c = synth.generate(200, seed=43)
    assert [r["caption"] for r in a] != [r["caption"] for r in c]


def test_schema_shape(synth_rows):
    r = synth_rows[0]
    assert set(r) == {"image_id", "bytes", "w", "h", "fmt", "caption", "phash", "_family"}
    assert all(x["fmt"] in ("raw", "png") for x in synth_rows)
    assert all(-(1 << 63) <= x["phash"] < (1 << 63) for x in synth_rows)


def _families(rows):
    fam = defaultdict(list)
    for r in rows:
        fam[r["_family"]].append(r)
    return fam


def test_family_invariants(synth_rows):
    fam = _families(synth_rows)
    # viral: one shared caption, ~5% of rows
    viral_caps = {r["caption"] for r in fam["viral"]}
    assert len(viral_caps) == 1 and len(fam["viral"]) >= len(synth_rows) // 25

    # exact family pairs: byte-identical
    ex = fam["exact"]
    for i in range(0, len(ex) - 1, 2):
        assert ex[i]["bytes"] == ex[i + 1]["bytes"]
        assert ex[i]["caption"] == ex[i + 1]["caption"]

    # reencode: different fmt, pixel-equal, same phash
    re_ = fam["reencode"]
    for i in range(0, len(re_) - 1, 2):
        a, b = re_[i], re_[i + 1]
        assert a["fmt"] != b["fmt"]
        pa = imaging.decode_image(a["bytes"], a["fmt"], a["w"], a["h"])
        pb = imaging.decode_image(b["bytes"], b["fmt"], b["w"], b["h"])
        assert (pa == pb).all()
        assert a["phash"] == b["phash"]

    # near-image: pHash within Hamming threshold
    ni = fam["near-image"]
    for i in range(0, len(ni) - 1, 2):
        d = imaging.hamming64(ni[i]["phash"] & ((1 << 64) - 1), ni[i + 1]["phash"] & ((1 << 64) - 1))
        assert d <= DEFAULT.hamming_threshold

    # fragment: B caption is a contiguous >=20-char substring of A caption
    fr = fam["fragment"]
    for i in range(0, len(fr) - 1, 2):
        a, b = fr[i], fr[i + 1]
        assert len(b["caption"]) >= DEFAULT.substr_min_len
        assert b["caption"] in a["caption"]

    # singletons exist
    assert len(fam["singleton"]) > 0


def test_caption_edit_mostly_above_threshold(synth_rows):
    fam = _families(synth_rows)
    ce = fam["caption-edit"]
    js = []
    for i in range(0, len(ce) - 1, 2):
        js.append(
            jaccard(
                shingle_hashes(ce[i]["caption"], DEFAULT.shingle_k),
                shingle_hashes(ce[i + 1]["caption"], DEFAULT.shingle_k),
            )
        )
    # edits straddle the 0.7 boundary by design (stress the exact verify);
    # most should land above it
    assert sum(1 for j in js if j >= DEFAULT.jaccard_threshold) >= len(js) * 0.5
