"""Stage-level profile of the pipeline-image-curate-real card walk
(round 11). The r10 vectorization took the entropy coder out of the
profile; this tool attributes the REMAINING per-card wall so the next
cut is chosen from numbers, not guesses.

Stages per card (walk_tiers on render_compress_card(i)):
  render   — md5-noise pixel stream + minipng.encode_png (zlib level 9)
  decode   — minipng.decode_png per tier attempt
  resize   — minipng.resize_nearest (vectorized)
  jpeg     — minijpeg.encode_jpeg (DCT einsum + vectorized scan)

Usage: python tools/bench_card_profile.py [--cards 0,1,2,3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ai_knowledge_etl_spark.multimodal import images as IM
from ai_knowledge_etl_spark.multimodal import minijpeg, minipng


def profile_card(i: int) -> dict[str, float]:
    t = {}
    t0 = time.time()
    raw = IM.render_compress_card(i)
    t["render"] = time.time() - t0
    if raw[:8] != minipng.MAGIC:
        return t
    t["decode"] = t["resize"] = t["jpeg"] = 0.0
    for tier in (800, 640, 480, 400):
        t1 = time.time()
        w, h, rgb = minipng.decode_png(raw)
        rgb = bytes(rgb)
        t["decode"] += time.time() - t1
        t1 = time.time()
        if w > tier:
            w2, h2, rgb2 = minipng.resize_nearest(w, h, rgb, tier)
            rgb2 = bytes(rgb2)
        else:
            w2, h2, rgb2 = w, h, rgb
        t["resize"] += time.time() - t1
        t1 = time.time()
        best = minijpeg.encode_jpeg(w2, h2, rgb2, quality=80)
        t["jpeg"] += time.time() - t1
        if len(best) <= 100_000:
            break
    return t


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cards", default="0,1,2,3,4,5,6,7,8,9")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    cards = [int(c) for c in args.cards.split(",")]
    # warm numpy/zlib
    profile_card(cards[0])
    agg: dict[str, float] = {}
    for rep in range(args.reps):
        tot = {}
        for i in cards:
            for k, v in profile_card(i).items():
                tot[k] = tot.get(k, 0.0) + v
        print(f"rep {rep}: " + " ".join(f"{k}={v:.3f}s" for k, v in sorted(tot.items())))
        for k, v in tot.items():
            agg[k] = min(agg.get(k, v), v)
    print("min-of-reps: " + " ".join(f"{k}={v:.3f}s" for k, v in sorted(agg.items())))
    print(f"total(min): {sum(agg.values()):.3f}s over {len(cards)} cards")


if __name__ == "__main__":
    main()
