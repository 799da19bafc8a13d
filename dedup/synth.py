"""Deterministic synthetic (image, caption) table generator — FIXTURES.md F1.

Seeded end-to-end (numpy Generator); no external data. Produces the exact
input_hint shape from BASELINE.json:
    image_id:string, bytes:binary, w:int, h:int, fmt:string,
    caption:string, phash:int64

Duplicate families injected (each intended to become one ground-truth cluster;
truth is ultimately defined by the brute-force oracle in reference_impl.py,
mirroring the reference's fixture mechanism
/root/reference/tests/test_cluster_pairs.py:30-39):

  exact            byte-identical copy (bytes + caption equal)
  reencode         same pixels, other fmt (raw <-> png); pixel-equal
  near-image       1-3 px perturbation, caption equal (pHash Hamming <= 6)
  near-image-diff  1-3 px perturbation, unrelated caption (image-path-only edge)
  caption-edit     1-2 token substitution, distinct image (MinHash-path-only)
  fragment         caption of B = contiguous >=20-char substring of caption of A
  viral            one caption shared by ~5% of rows, distinct images (skew)
  singletons       remainder; must come out cluster_id = image_id
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from . import imaging

_SUBJECTS = [
    "a red fox", "the harbor crane", "an old tram", "the mountain lake",
    "a street vendor", "the paper lantern", "a night market", "the glass bridge",
    "an orange cat", "the tide pool", "a wind turbine", "the spice stall",
    "a fishing boat", "the neon sign", "a stone archway", "the bamboo grove",
]
_VERBS = [
    "overlooks", "drifts past", "glows beside", "shadows", "frames",
    "reflects", "crosses", "guards", "follows", "circles", "faces", "hides",
]
_OBJECTS = [
    "the winter canal", "a crowded plaza", "the silent pier", "an empty station",
    "the morning fog", "a tiled rooftop", "the rusted gate", "a flooded field",
    "the lantern festival", "a gravel path", "the salt flats", "an alley garden",
]
_MODIFIERS = [
    "at dusk", "after the rain", "in pale light", "before sunrise",
    "under heavy clouds", "during the parade", "in deep summer", "near the border",
    "with distant thunder", "beside the old wall", "in drifting snow", "past midnight",
    "вечером у моста", "黄昏的小巷", "sous la pluie fine", "entre dos luces",
]


def _caption(rng: np.random.Generator, min_words: int = 4, max_words: int = 24) -> str:
    parts = [
        _SUBJECTS[rng.integers(len(_SUBJECTS))],
        _VERBS[rng.integers(len(_VERBS))],
        _OBJECTS[rng.integers(len(_OBJECTS))],
    ]
    while len(" ".join(parts).split()) < max(min_words, 4):
        parts.append(_MODIFIERS[rng.integers(len(_MODIFIERS))])
        if len(" ".join(parts).split()) >= max_words or rng.random() < 0.35:
            break
    return " ".join(parts)


def _edit_caption(rng: np.random.Generator, caption: str, n_edits: int) -> str:
    toks = caption.split()
    pool = _MODIFIERS + _OBJECTS
    for _ in range(n_edits):
        i = int(rng.integers(len(toks)))
        toks[i] = pool[int(rng.integers(len(pool)))].split()[0]
    return " ".join(toks)


def _image_sized(rng: np.random.Generator, min_px: int = 16, max_px: int = 64) -> np.ndarray:
    w = int(rng.integers(min_px, max_px + 1))
    h = int(rng.integers(min_px, max_px + 1))
    # smooth-ish random field so 1-3 px perturbations barely move the DCT;
    # 12x12 base keeps pHash bit entropy realistic (a 4x4 base collapses the
    # DCT to a handful of low-freq coefficients -> degenerate chunk buckets)
    base = rng.integers(0, 256, size=(12, 12, 3), dtype=np.uint8).astype(np.float64)
    yi = (np.arange(h) * 12) // h
    xi = (np.arange(w) * 12) // w
    img = base[yi][:, xi]
    noise = rng.integers(-12, 13, size=(h, w, 3))
    return np.clip(img + noise, 0, 255).astype(np.uint8)


def _perturb(rng: np.random.Generator, pixels: np.ndarray) -> np.ndarray:
    out = pixels.copy()
    for _ in range(int(rng.integers(1, 4))):
        y = int(rng.integers(pixels.shape[0]))
        x = int(rng.integers(pixels.shape[1]))
        c = int(rng.integers(3))
        out[y, x, c] = np.clip(int(out[y, x, c]) + int(rng.integers(-20, 21)), 0, 255)
    return out


def _row(image_id: str, pixels: np.ndarray, fmt: str, caption: str) -> dict:
    data = imaging.encode_png(pixels) if fmt == "png" else imaging.encode_raw(pixels)
    return {
        "image_id": image_id,
        "bytes": data,
        "w": pixels.shape[1],
        "h": pixels.shape[0],
        "fmt": fmt,
        "caption": caption,
        "phash": imaging.phash_to_signed64(imaging.phash64(pixels)),
        "_family": "",  # filled by caller; diagnostic only, dropped on write
    }


def generate(
    n: int, seed: int = 42, min_px: int = 16, max_px: int = 64, id_offset: int = 0
) -> list[dict]:
    """Generate n rows with injected duplicate families (ratios from FIXTURES.md)."""
    rng = np.random.default_rng(seed)
    rows: list[dict] = []
    idx = id_offset

    def nid() -> str:
        nonlocal idx
        idx += 1
        return f"img{idx - 1:010d}"

    def _image(r):
        return _image_sized(r, min_px, max_px)

    n_viral = max(3, n // 20)  # ~5% share one caption
    viral_caption = _caption(rng, min_words=8)
    for _ in range(n_viral):
        r = _row(nid(), _image(rng), "raw" if rng.random() < 0.5 else "png", viral_caption)
        r["_family"] = "viral"
        rows.append(r)

    n_families = max(1, n // 12)  # multi-member dup families
    kinds = ["exact", "reencode", "near-image", "near-image-diff", "caption-edit", "fragment"]
    for fi in range(n_families):
        kind = kinds[fi % len(kinds)]
        pixels = _image(rng)
        # long caption so fragments and edits stay above thresholds
        caption = _caption(rng, min_words=10, max_words=24)
        fmt = "raw" if rng.random() < 0.5 else "png"
        a = _row(nid(), pixels, fmt, caption)
        a["_family"] = kind
        rows.append(a)
        if kind == "exact":
            b = _row(nid(), pixels, fmt, caption)
        elif kind == "reencode":
            b = _row(nid(), pixels, "png" if fmt == "raw" else "raw", caption)
        elif kind == "near-image":
            b = _row(nid(), _perturb(rng, pixels), fmt, caption)
        elif kind == "near-image-diff":
            b = _row(nid(), _perturb(rng, pixels), fmt, _caption(rng))
        elif kind == "caption-edit":
            # heavier edits only on long captions so most pairs land above the
            # Jaccard threshold (some below, to stress the exact-verify boundary)
            n_edits = 1 if len(caption) < 90 else int(rng.integers(1, 3))
            b = _row(nid(), _image(rng), fmt, _edit_caption(rng, caption, n_edits))
        else:  # fragment: B's caption = contiguous >=20-char substring of A's
            c = caption
            if len(c) < 24:
                c = caption + " " + _caption(rng)
                a["caption"] = c
                a["phash"] = a["phash"]  # unchanged
            lo = int(rng.integers(0, max(1, len(c) - 22)))
            frag = c[lo : lo + max(20, int(rng.integers(20, min(40, len(c) - lo) + 1)))]
            b = _row(nid(), _image(rng), fmt, frag)
        b["_family"] = kind
        rows.append(b)

    while len(rows) < n:  # singletons
        r = _row(nid(), _image(rng), "raw" if rng.random() < 0.5 else "png", _caption(rng))
        r["_family"] = "singleton"
        rows.append(r)
    return rows[:n]


_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
    ]
)


def to_arrow(rows: list[dict]) -> pa.Table:
    cols = {name: [r[name] for r in rows] for name in _SCHEMA.names}
    return pa.table(cols, schema=_SCHEMA)


def write_parquet(
    path: str,
    n: int,
    seed: int = 42,
    row_group_size: int = 4096,
    min_px: int = 16,
    max_px: int = 64,
) -> str:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    # small row groups: Spark parallelizes parquet scans at row-group
    # granularity, and the bytes column makes groups heavy — one giant row
    # group would serialize the sha2(bytes) scan onto a single task
    pq.write_table(
        to_arrow(generate(n, seed, min_px, max_px)), path, row_group_size=row_group_size
    )
    return path


_CHUNK = 20000  # fixed chunk size so dataset content is worker-count-independent


def _write_chunk(args) -> str:
    d, i, n_chunk, seed, min_px, max_px = args
    rows = generate(n_chunk, seed + 9973 * i, min_px, max_px, id_offset=i * _CHUNK)
    out = os.path.join(d, f"part-{i:05d}.parquet")
    pq.write_table(to_arrow(rows), out, row_group_size=4096)
    return out


def write_parquet_dir(
    path: str,
    n: int,
    seed: int = 42,
    min_px: int = 16,
    max_px: int = 64,
    workers: int = 16,
) -> str:
    """Parallel deterministic generator: a DIRECTORY of parquet files, chunked
    at a fixed 20k rows (per-chunk seed = seed + 9973*i), so the dataset is a
    pure function of (n, seed, px range) regardless of worker count. Used for
    bench-scale inputs; tests keep the single-file serial writer."""
    import multiprocessing as mp

    os.makedirs(path, exist_ok=True)
    chunks = [
        (path, i, min(_CHUNK, n - i * _CHUNK), seed, min_px, max_px)
        for i in range((n + _CHUNK - 1) // _CHUNK)
    ]
    with mp.Pool(min(workers, len(chunks))) as pool:
        pool.map(_write_chunk, chunks)
    return path
