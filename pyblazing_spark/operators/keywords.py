"""Multi-keyword corpus tagging via a broadcast Aho-Corasick automaton.

The pattern a training-data pipeline hits constantly: tag every
document against a dictionary of terms (contamination markers, unsafe
phrases, licensing strings, PII keywords) in ONE pass over the text.
k separate ``instr``/regex passes cost O(k x corpus); the Aho-Corasick
automaton (public classic: Aho & Corasick 1975) matches ALL k patterns
simultaneously in O(corpus + matches), independent of dictionary size —
the same reason FlashText-style taggers replace regex alternations at
corpus scale.

Spark shape: the automaton is built once driver-side from the (small)
dictionary and rides the task closure into an Arrow-batched
``mapInArrow`` kernel (Arrow, not pandas: pandas would deliver a
nullable int64 doc-id column as float64 and lose exactness above
2^53) — the corpus is scanned exactly once, nothing
text-shaped ever shuffles (the kernel emits (doc, keyword, count)
rows, dictionary-bounded per doc), and the per-keyword rollup is a
map-side-combinable aggregation on tiny rows. At a production 100k-term
dictionary the automaton is a few MB — an explicit ``broadcast()``
instead of the closure, same shape.

Semantics: counts EVERY occurrence of every keyword, including
occurrences overlapping a different keyword's match ("an" inside
"scan" counts for both). Keywords that self-overlap (a proper border,
e.g. "aa") are matched correctly too — only the SQL replace-trick
oracle in the catalog entry needs border-free keywords, because
``replace`` counts non-overlapping occurrences.
"""

from __future__ import annotations

from collections import deque
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_automaton(keywords: list[str]):
    """Aho-Corasick (goto, fail, output) tables over ``keywords``.

    Returns (goto: list[dict[ch, state]], fail: list[int],
    out: list[list[int]]) with keyword indices in ``out``; state 0 is
    the root. Pure-python dict transitions — fast enough for a scan
    kernel (the per-char cost is one dict lookup amortized), and
    trivially picklable into task closures."""
    if not keywords or any(not k for k in keywords):
        raise ValueError("keywords must be non-empty strings")
    goto: list[dict[str, int]] = [{}]
    out: list[list[int]] = [[]]
    for idx, kw in enumerate(keywords):
        s = 0
        for ch in kw:
            nxt = goto[s].get(ch)
            if nxt is None:
                goto.append({})
                out.append([])
                nxt = len(goto) - 1
                goto[s][ch] = nxt
            s = nxt
        out[s].append(idx)
    fail = [0] * len(goto)
    q: deque[int] = deque()
    for s in goto[0].values():
        q.append(s)
    while q:
        r = q.popleft()
        for ch, s in goto[r].items():
            q.append(s)
            f = fail[r]
            while f and ch not in goto[f]:
                f = fail[f]
            fail[s] = goto[f].get(ch, 0) if goto[f].get(ch, 0) != s else 0
            out[s] = out[s] + out[fail[s]]
    return goto, fail, out


def count_matches(text: str, automaton, n_keywords: int) -> list[int]:
    """Per-keyword occurrence counts of one text (all occurrences,
    overlaps included)."""
    goto, fail, out = automaton
    counts = [0] * n_keywords
    s = 0
    for ch in text:
        while s and ch not in goto[s]:
            s = fail[s]
        s = goto[s].get(ch, 0)
        if out[s]:
            for idx in out[s]:
                counts[idx] += 1
    return counts


def _border_free(kw: str) -> bool:
    """True iff no proper prefix of ``kw`` equals a suffix — such a
    keyword can never overlap itself, so non-overlapping counts
    (``str.count``) equal all-occurrence counts."""
    return all(kw[:b] != kw[-b:] for b in range(1, len(kw)))


_SMALL_DICT = 64  # crossover: below this, k C-speed scans beat one Python AC pass


def tag_keywords(
    df: DataFrame,
    keywords: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, keyword, n_matches) for every document x matched keyword.
    Zero-match (doc, keyword) pairs are NOT emitted (output is
    matches-sized); roll up and left-join from the dictionary side for
    dense per-keyword stats.

    Two kernels with IDENTICAL all-occurrence semantics (property-pinned
    in tests): small dictionaries of border-free terms use k C-speed
    ``str.count`` scans — for small k (the _SMALL_DICT=64 crossover) the interpreter-free
    scan wins by ~10x despite being O(k x corpus); everything else
    (large dictionaries, or any self-overlapping term, where
    ``str.count``'s non-overlapping semantics would undercount) takes
    the one-pass Aho-Corasick automaton, whose O(corpus + matches) is
    the FlashText-style scale path a 100k-term dictionary needs."""
    n = len(keywords)
    kws = list(keywords)
    fast = n <= _SMALL_DICT and all(_border_free(k) for k in kws)
    automaton = None if fast else build_automaton(kws)
    if fast:
        build_automaton(kws)  # validates the dictionary eagerly either way
    # NOT repartitioned before the kernel (r14: measured 0.41 s plain
    # vs 0.65 s spread at sf0.1) — the C-speed str.count fast path
    # costs less than the round-robin shuffle that spreading pays;
    # spreading belongs in front of genuinely expensive kernels only
    # (multimodal_video_frames is the positive case).
    src = df.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("text")
    )

    def scan(batches: Iterator["object"]) -> Iterator["object"]:
        # mapInArrow, not mapInPandas: pandas delivers a nullable int64
        # id column as float64, silently rounding ids above 2^53
        # (CLAUDE.md value-exact-sink rule; the Avro writer is the
        # precedent) — pyarrow keeps int64 + validity, so null-id docs
        # pass through as NULL instead of poisoning the whole column
        import pyarrow as pa

        for batch in batches:
            ids: list = []
            kw_out: list[str] = []
            cnt: list[int] = []
            for i, txt in zip(
                batch.column("id").to_pylist(),
                batch.column("text").to_pylist(),
            ):
                if txt is None:
                    continue
                if fast:
                    counts = [txt.count(k) for k in kws]
                else:
                    counts = count_matches(txt, automaton, n)
                for j, c in enumerate(counts):
                    if c:
                        ids.append(i)
                        kw_out.append(kws[j])
                        cnt.append(c)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, pa.int64()),
                    pa.array(kw_out, pa.string()),
                    pa.array(cnt, pa.int64()),
                ],
                names=["id", "keyword", "n_matches"],
            )

    return src.mapInArrow(
        scan, schema="id long, keyword string, n_matches long"
    )
