"""Perceptual image hash dedup: pHash robustness on real PPM payloads
and the generic banded Hamming join's equality with brute force."""

from __future__ import annotations

import random

import numpy as np
from pyspark.sql import functions as F

from nfl_data_pipeline_spark.operators.dedup import hamming_near_pairs
from nfl_data_pipeline_spark.operators.multimodal import (
    attach_media,
    image_near_dups,
    phash_ppm,
)


def _ppm(arr: np.ndarray) -> bytes:
    h, w, _ = arr.shape
    return f"P6\n{w} {h}\n255\n".encode() + arr.astype(np.uint8).tobytes()


def _image(seed: int, w: int = 24, h: int = 16) -> np.ndarray:
    """Smooth random image (low-frequency content, like a photo —
    pHash is a low-frequency signature, so pure white noise is the
    one thing it can't fingerprint)."""
    rng = np.random.default_rng(seed)
    coarse = rng.uniform(0, 255, size=(4, 4, 3))
    ys = (np.arange(h) * 4) // h
    xs = (np.arange(w) * 4) // w
    return coarse[ys][:, xs]


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & (1 << 64) - 1).count("1")


def test_phash_stability_and_discrimination():
    img = _image(1)
    base = phash_ppm(_ppm(img))
    assert phash_ppm(_ppm(img)) == base  # deterministic
    # mild pixel noise: visually identical → inside the standard ≤10
    # pHash near-dup budget (blocky synthetic content parks many AC
    # coefficients near the median, so a few borderline bits flip)
    noisy = np.clip(img + np.random.default_rng(9).normal(0, 4, img.shape), 0, 255)
    assert _ham(base, phash_ppm(_ppm(noisy))) <= 10
    # uniform brightness shift: DC-excluded median keeps it inside
    # the same ≤10 budget
    brighter = np.clip(img + 30, 0, 255)
    assert _ham(base, phash_ppm(_ppm(brighter))) <= 10
    # different images → far apart
    assert _ham(base, phash_ppm(_ppm(_image(2)))) > 16
    assert _ham(base, phash_ppm(_ppm(_image(3)))) > 16


def test_phash_resize_invariance():
    """The same scene at a different resolution hashes nearby — the
    area-mean → 32×32 → DCT pipeline is resolution-normalizing."""
    img = _image(7, w=24, h=16)
    big = img[np.repeat(np.arange(16), 2)][:, np.repeat(np.arange(24), 2)]
    assert _ham(phash_ppm(_ppm(img)), phash_ppm(_ppm(big))) <= 10


def test_image_near_dups_end_to_end(spark):
    rows = []
    for i in range(8):
        img = _image(100 + i)
        rows.append((2 * i, _ppm(img)))  # original
        noisy = np.clip(
            img + np.random.default_rng(200 + i).normal(0, 3, img.shape),
            0,
            255,
        )
        rows.append((2 * i + 1, _ppm(noisy)))  # planted near-dup
    df = attach_media(
        spark.createDataFrame(rows, "doc_id long, payload binary"),
        "payload",
        mime="image/x-portable-pixmap",
    )
    pairs = {
        (r["id_a"], r["id_b"]) for r in image_near_dups(df, max_hamming=10).collect()
    }
    planted = {(2 * i, 2 * i + 1) for i in range(8)}
    assert planted <= pairs  # every planted copy found
    assert pairs == planted  # and no unrelated image paired


def test_hamming_near_pairs_matches_bruteforce(spark):
    rng = random.Random(5)
    fps = [rng.getrandbits(64) - (1 << 63) for _ in range(60)]
    # plant close pairs: flip ≤2 random bits
    for i in range(0, 20, 2):
        flipped = fps[i] ^ (1 << rng.randrange(64)) ^ (1 << rng.randrange(64))
        fps[i + 1] = flipped - (1 << 64) if flipped >= (1 << 63) else flipped
    df = spark.createDataFrame(
        [(i, f) for i, f in enumerate(fps)], "id long, fp long"
    )
    got = sorted(
        tuple(r) for r in hamming_near_pairs(df, "id", "fp", max_hamming=2).collect()
    )
    want = sorted(
        (i, j, _ham(fps[i], fps[j]))
        for i in range(len(fps))
        for j in range(i + 1, len(fps))
        if _ham(fps[i], fps[j]) <= 2
    )
    assert got == want


def test_rich_image_generator_diversity_and_robustness():
    """operators/mediasynth.rich_image (VERDICT r7 #5): the r5 4×4
    blocky generator parks ~80% of distinct images inside another's
    hamming-10 radius (the kept-count decay in the gate studies); the
    rich generator must keep distinct images apart while a noisy copy
    stays inside the near-dup budget."""
    import numpy as np

    from nfl_data_pipeline_spark.operators.mediasynth import (
        ppm_bytes,
        rich_image,
    )

    hashes = [phash_ppm(ppm_bytes(rich_image(i))) for i in range(300)]
    assert len(set(hashes)) == 300
    # distinct images are far apart...
    cross = [_ham(hashes[i], hashes[i + 1]) for i in range(0, 298, 2)]
    assert min(cross) > 10
    # ...while σ=3 noisy copies stay within the ≤10 budget
    for i in range(20):
        img = rich_image(i)
        noisy = np.clip(
            img + np.random.default_rng(900 + i).normal(0, 3, img.shape),
            0,
            255,
        )
        assert _ham(
            phash_ppm(ppm_bytes(img)), phash_ppm(ppm_bytes(noisy))
        ) <= 10
