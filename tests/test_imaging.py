"""Codec + pHash golden/property tests (test strategy model: SURVEY.md §5 —
parametrized golden outputs + edge cases, after
/root/reference/tests/etl/test_acronyms.py)."""

from __future__ import annotations

import numpy as np
import pytest

from dedup import imaging


@pytest.mark.parametrize("h,w", [(16, 16), (33, 47), (64, 64), (1, 1), (2, 64)])
def test_raw_roundtrip(h, w):
    rng = np.random.default_rng(h * 100 + w)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(imaging.decode_raw(imaging.encode_raw(px), w, h), px)


@pytest.mark.parametrize("h,w", [(16, 16), (33, 47), (64, 64), (1, 1), (2, 64)])
def test_png_roundtrip(h, w):
    rng = np.random.default_rng(h * 100 + w)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(imaging.decode_png(imaging.encode_png(px)), px)


def test_png_filter_decoding():
    """Decoder handles filter types 1-4 from external encoders."""
    import struct, zlib

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(5, 4, 3), dtype=np.uint8)
    # hand-encode with per-row filters [0,1,2,3,4]
    h, w = px.shape[:2]
    prev = np.zeros(w * 3, np.int32)
    lines = []
    for y, f in enumerate([0, 1, 2, 3, 4]):
        cur = px[y].reshape(-1).astype(np.int32)
        enc = np.zeros(w * 3, np.int32)
        for x in range(w * 3):
            a = cur[x - 3] if x >= 3 else 0
            b = prev[x]
            c = prev[x - 3] if x >= 3 else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            enc[x] = (cur[x] - pred) & 0xFF
        lines.append(bytes([f]) + enc.astype(np.uint8).tobytes())
        prev = cur
    from dedup.imaging import _PNG_SIG, _chunk

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    data = (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + _chunk(b"IEND", b"")
    )
    assert np.array_equal(imaging.decode_png(data), px)


def test_psnr():
    a = np.zeros((8, 8, 3), dtype=np.uint8)
    assert imaging.psnr(a, a) == float("inf")
    b = a.copy()
    b[0, 0, 0] = 10
    assert 0 < imaging.psnr(a, b) < 100
    # small additive noise keeps PSNR above the lossy gate (40 dB)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    noisy = np.clip(img.astype(np.int32) + rng.integers(-2, 3, img.shape), 0, 255).astype(np.uint8)
    assert imaging.psnr(img, noisy) >= 40.0


def test_phash_deterministic_and_robust():
    rng = np.random.default_rng(1)
    px = rng.integers(0, 256, size=(48, 32, 3), dtype=np.uint8)
    h1, h2 = imaging.phash64(px), imaging.phash64(px.copy())
    assert h1 == h2
    assert 0 <= h1 < (1 << 64)
    # single-pixel perturbation stays within the Hamming threshold
    p = px.copy()
    p[3, 3, 1] = np.clip(int(p[3, 3, 1]) + 15, 0, 255)
    assert imaging.hamming64(h1, imaging.phash64(p)) <= 6
    # unrelated image is far
    other = rng.integers(0, 256, size=(48, 32, 3), dtype=np.uint8)
    assert imaging.hamming64(h1, imaging.phash64(other)) > 6


def test_phash_signed_mapping():
    assert imaging.phash_to_signed64((1 << 63) + 5) == 5 - (1 << 63)
    assert imaging.phash_to_signed64(42) == 42
