"""Unigram-LM learner scale probe — the vocab-bound honesty check the
BPE heap learner got in round 11 (SCALE.md: 196k-word Zipf vocab): the
fixture corpus has only 31 distinct lowercase words, so fixtures cannot
measure the driver-side costs that actually bound the design at 100 TB:

1. seed inventory + integer cost quantization (O(|vocab| x len x maxp)
   substring counting);
2. EM forward-backward per iteration (same asymptotic, float lattice);
3. Viterbi segmentation throughput over the distinct vocabulary (what
   the mapInArrow kernel pays per executor core).

Vocabulary: deterministic Zipf — word i is the base-26 letter encoding
of i (3..12 chars), count ~ N/(i+1)^1.1. No RNG, no Spark: this probe
measures the PYTHON side; the cluster side is one word-count
aggregation (measured in the BPE probe, identical here).

Usage: python scripts/unigram_vocab_probe.py [sizes...]   (default
16000 64000 196000; --smoke = 4000 16000, ~seconds)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyblazing_spark.operators.unigram import (  # noqa: E402
    em_train,
    quantized_costs,
    seed_pieces,
    viterbi_int,
)


def word(i: int) -> str:
    s = ""
    n = i + 26**2  # >= 3 chars
    while n:
        s += chr(ord("a") + n % 26)
        n //= 26
    return s[:12]


def vocab(n: int) -> list[tuple[str, int]]:
    return [(word(i), max(1, int(n / (i + 1) ** 1.1))) for i in range(n)]


def main() -> int:
    smoke = "--smoke" in sys.argv
    pos = [int(a) for a in sys.argv[1:] if not a.startswith("--")]
    sizes = pos or ([4_000, 16_000] if smoke else [16_000, 64_000, 196_000])
    base = None
    for n in sizes:
        wc = vocab(n)
        t0 = time.time()
        freqs, total = seed_pieces(wc)
        costs = quantized_costs(freqs, total)
        t_seed = time.time() - t0
        t0 = time.time()
        _logp, lls = em_train(wc, n_iters=2)
        t_em = (time.time() - t0) / 2
        t0 = time.time()
        for w, _ in wc:
            viterbi_int(w, costs)
        t_vit = time.time() - t0
        chars = sum(len(w) for w, _ in wc)
        row = (t_seed, t_em, t_vit)
        if base is None:
            base = (n, chars, row)
        bn, bc, br = base
        print(
            f"|vocab|={n:>7,} chars={chars:>9,}: pieces={len(costs):>7,} "
            f"seed+costs={t_seed:6.1f}s em/iter={t_em:6.1f}s "
            f"viterbi={t_vit:6.1f}s ({chars / bc:.1f}x chars -> "
            f"{row[0] / br[0]:.1f}x/{row[1] / br[1]:.1f}x/{row[2] / br[2]:.1f}x; "
            f"ll0={lls[0]:.3e})"
        )
    print(
        "cost tracks TOTAL VOCAB CHARACTERS (every stage is a per-word "
        "lattice of O(len x maxp) cells) — the documented driver bound; "
        "the cluster side stays one word-count job."
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
