"""Byte-level BPE learner scale probe (VERDICT r12 #6 "done"
criterion): the |vocab| driver-collect bound must hold when the
symbols are raw UTF-8 BYTES (hex-chunked, unit=2) instead of [a-z]
characters — more initial symbols per word (multi-byte chars split),
a 256-symbol base alphabet, and merges crossing character boundaries.

Vocabulary: deterministic syllable composition over a mixed
ascii/2-byte-UTF-8 syllable set (é ü ño ße ...), Zipf-ish counts —
no RNG state beyond a fixed seed, no Spark: the cluster side of the
entry is ONE word-count aggregation (same contract as text_bpe_encode,
measured in the r10 BPE probe); this probe measures the in-process
learn loop that runs on the collected vocabulary.

Usage: python scripts/bpe_byte_vocab_probe.py [n_words k ...]
       (default 196000 with k=100,1000,5000; --smoke = 16000 k=200)
"""

from __future__ import annotations

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyblazing_spark.plans.llm import _bpe_learn_inprocess  # noqa: E402

SYLLABLES = (
    "ab", "cd", "ef", "gh", "ij", "kl", "mn", "op", "qr", "st", "uv",
    "wx", "yz", "é", "ü", "ño", "ße", "th", "er", "on", "an", "re",
    "he", "in", "ed", "nd",
)


def build_vocab(n_words: int) -> list[tuple[str, int]]:
    rng = random.Random(13)
    words: set[str] = set()
    while len(words) < n_words:
        words.add(
            "".join(rng.choices(SYLLABLES, k=rng.randint(2, 6)))
        )
    return [
        (w.encode("utf-8").hex().upper(), rng.randint(1, 1000))
        for w in sorted(words)
    ]


def main() -> int:
    args = [a for a in sys.argv[1:]]
    smoke = "--smoke" in args
    args = [a for a in args if a != "--smoke"]
    if smoke:
        n_words, ks = 16_000, (200,)
    else:
        n_words = int(args[0]) if args else 196_000
        ks = tuple(int(a) for a in args[1:]) or (100, 1000, 5000)

    rows = build_vocab(n_words)
    total_bytes = sum(len(h) for h, _ in rows) // 2
    print(
        f"vocab: {len(rows):,} words, {total_bytes:,} total bytes, "
        f"driver footprint ~{(total_bytes * 2 + 8 * len(rows)) / 1e6:.0f} MB"
    )
    prev = None
    for k in ks:
        t0 = time.time()
        merges = _bpe_learn_inprocess(rows, k, unit=2)
        dt = time.time() - t0
        marginal = "" if prev is None else (
            f" (+{dt - prev[1]:.0f}s for +{k - prev[0]} merges — "
            f"heap amortization)"
        )
        print(f"k={k}: {len(merges)} merges in {dt:.1f}s{marginal}")
        prev = (k, dt)
    print("PROBE OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
