"""Incremental, batch-vectorized Levenshtein DP.

This is the engine's replacement for the reference's embedded-C++ scalar
kernels (SURVEY.md §2.8):

  - ``CalculateLevenshteinVector`` (PrefixTree.ecl:315-377) — resume the
    DP from the saved row and extend it by one edge label. We keep the
    same incremental idea (DP rows for a shared prefix are computed once
    per path and reused across the subtree, PrefixTree.ecl:321-326) but
    (a) vectorize ACROSS ALL QUERIES at once with numpy, so one trie
    visit advances every active query's DP row in a single O(n_queries *
    max_len) array op, and (b) fix the reference's latent first-call
    ``memcpy`` bug (PrefixTree.ecl:368, SURVEY.md §0 Quirk 1) by always
    carrying full-width rows.
  - ``GetMinDistance`` (PrefixTree.ecl:379-386) → ``row_mins`` — min of
    the current DP row = lower bound for branch-and-bound pruning.
  - ``GetFinalDistance`` (PrefixTree.ecl:387-394) → ``final_distances``
    — last valid DP cell = exact distance once the path spells a word.

Distances are per Unicode codepoint, not per byte as in ECL STRING
(SURVEY.md §1.3). NB: DuckDB's ``levenshtein`` counts UTF-8 BYTES
(café↔cafe = 2); the two agree on ASCII, which is all the driver's
oracle columns contain — keep non-ASCII out of oracle queries.

Vectorization note: the within-row dependency (insertion chain
``row[j] = min(cand[j], row[j-1]+1)``) is a running min of
``cand[j] - j`` — computed with ``np.minimum.accumulate`` so the whole
row update is branch-free numpy.
"""

from __future__ import annotations

import numpy as np

BIG = np.int32(1 << 20)


class QueryBatch:
    """A batch of query strings encoded for vectorized DP.

    ``codes[i, j]`` is the codepoint of query i at position j (0 beyond
    the query's length); ``lens[i]`` its length. DP rows are arrays of
    shape ``(n, max_len + 1)``; ``rows[i, j]`` = edit distance between
    the path consumed so far and ``queries[i][:j]``.
    """

    __slots__ = ("queries", "codes", "lens", "max_len", "_js", "_valid", "_padT")

    def __init__(self, queries: list[str]):
        self.queries = queries
        n = len(queries)
        self.lens = np.fromiter((len(q) for q in queries), dtype=np.int32, count=n)
        self.max_len = int(self.lens.max()) if n else 0
        self.codes = np.zeros((n, self.max_len), dtype=np.int32)
        for i, q in enumerate(queries):
            if q:
                self.codes[i, : len(q)] = np.fromiter(map(ord, q), dtype=np.int32, count=len(q))
        self._js = np.arange(self.max_len + 1, dtype=np.int32)
        # valid[i, j] == True where j <= len(queries[i])
        self._valid = self._js[None, :] <= self.lens[:, None]
        self._padT = {}  # k -> padded transposed code matrix (see codes_T_padded)

    def __len__(self) -> int:
        return len(self.queries)

    def initial_rows(self, idx: np.ndarray | None = None) -> np.ndarray:
        """Row 0 of the DP: distance(empty path, q[:j]) = j."""
        n = len(self.queries) if idx is None else len(idx)
        return np.broadcast_to(self._js, (n, self.max_len + 1)).copy()

    def row_mins(self, rows: np.ndarray, idx: np.ndarray) -> np.ndarray:
        """Min of each DP row over valid cells — the branch-and-bound
        lower bound (≡ GetMinDistance, PrefixTree.ecl:379-386)."""
        masked = np.where(self._valid[idx], rows, BIG)
        return masked.min(axis=1)

    def final_distances(self, rows: np.ndarray, idx: np.ndarray) -> np.ndarray:
        """Last valid DP cell = exact distance(path, query)
        (≡ GetFinalDistance, PrefixTree.ecl:387-394)."""
        return rows[np.arange(len(idx)), self.lens[idx]]

    def codes_T_padded(self, k: int) -> np.ndarray:
        """Transposed code matrix padded for the banded state kernel:
        row r holds query char position ``r - k`` (poison -1 outside
        [0, max_len)), so the window's char rows for path position
        ``p`` and in-label offset ``t`` are the contiguous slice
        ``[p+t : p+t+2k+1]`` — no per-char fancy gather. Rows cover
        every window the traversal can reach before pruning
        (p ≤ max_len + k); beyond-allocation steps are handled by the
        kernel's all-poison fallback. Cached per k (one traversal uses
        one k)."""
        cached = self._padT.get(k)
        if cached is None:
            n = len(self.queries)
            rows = self.max_len + 3 * k + 2
            cached = np.full((rows, n), -1, dtype=np.int32)
            if self.max_len:
                cached[k : k + self.max_len] = self.codes.T
            self._padT[k] = cached
        return cached


def extend_rows(
    batch: QueryBatch, rows: np.ndarray, idx: np.ndarray, label: str
) -> np.ndarray:
    """Advance DP rows by the characters of ``label`` (one trie edge).

    ``rows`` has shape (len(idx), max_len+1); ``idx`` selects which
    queries of ``batch`` these rows belong to. Returns new rows; does
    not mutate the input. Cost O(len(label) * len(idx) * max_len) in
    vectorized numpy — shared across every word in the subtree below
    this edge (the whole point of the trie, PrefixTree.ecl:321-326).
    """
    codes = batch.codes[idx]
    js = batch._js
    buf_a, buf_b = np.empty_like(rows), np.empty_like(rows)
    cur = rows
    for ch in label:
        c = ord(ch)
        out = buf_a if cur is not buf_a else buf_b
        # candidate[j] = min(substitute via diagonal, delete word char)
        out[:, 0] = cur[:, 0] + 1
        np.minimum(cur[:, :-1] + (codes != c), cur[:, 1:] + 1, out=out[:, 1:])
        # insertion chain row[j] = min(row[j-1]+1, candidate[j]) is a
        # running min in (candidate[j] - j) space
        out -= js
        np.minimum.accumulate(out, axis=1, out=out)
        out += js
        cur = out
    return cur if cur is not rows else rows.copy()


# ---------------------------------------------------------------------------
# banded (Ukkonen) variant — the max-distance-k traversal kernel
# ---------------------------------------------------------------------------
#
# With a distance cap k, every DP cell with |j - p| > k (p = path chars
# consumed) is provably > k: reaching q[:j] from a p-char path needs at
# least |j - p| edits. The traversal only ever asks three questions —
# "is any cell ≤ k" (branch-and-bound), "is the final cell ≤ k"
# (end-cap hit), and the cell values that are ≤ k — so carrying the
# full max_len+1 row computes ~max_len/(2k+1) × more arithmetic than
# the answers need (at k=2 over ~38-char names: 39 cells vs 5). The
# banded row stores exactly the window j ∈ [p-k, p+k]; it shifts right
# one cell per path char, so window index w maps to j = p - k + w.
# Out-of-window influence is impossible: the full recurrence reads
# (j-1, prev), (j, prev), (j-1, cur) — all within the shifted window —
# and any outside cell is > k, which the min() flow can never carry
# into a ≤ k answer. Values INSIDE the band can exceed k transiently
# (they're exact, not clamped); correctness equals the full kernel's,
# pinned by the banded-vs-full property test.


def banded_initial_rows(batch: QueryBatch, k: int, n: int) -> np.ndarray:
    """Window at p=0: j ∈ [-k, k]; cell j holds distance(ε, q[:j]) = j;
    j < 0 cells are padding (BIG)."""
    js = np.arange(-k, k + 1, dtype=np.int32)
    row = np.where(js >= 0, js, BIG).astype(np.int32)
    return np.broadcast_to(row, (n, 2 * k + 1)).copy()


def banded_row_mins(
    batch: QueryBatch, rows: np.ndarray, idx: np.ndarray, p: int, k: int
) -> np.ndarray:
    """Branch-and-bound lower bound over the valid window cells
    (0 ≤ j ≤ len(q)). Cells outside the window are > k by the band
    argument, so this min equals the full row's min whenever either
    is ≤ k — the only regime the pruning decision reads."""
    js = (p - k) + np.arange(2 * k + 1, dtype=np.int32)
    valid = (js[None, :] >= 0) & (js[None, :] <= batch.lens[idx][:, None])
    return np.where(valid, rows, BIG).min(axis=1)


def banded_final_distances(
    batch: QueryBatch, rows: np.ndarray, idx: np.ndarray, p: int, k: int
) -> np.ndarray:
    """Exact distance = cell j = len(q). Callers guarantee
    |len(q) - p| ≤ k (the end-cap length band), so the cell is in
    window."""
    w = batch.lens[idx] - (p - k)
    return rows[np.arange(len(idx)), w]


def extend_rows_banded(
    batch: QueryBatch,
    rows: np.ndarray,
    idx: np.ndarray,
    label: str,
    p: int,
    k: int,
) -> np.ndarray:
    """Banded twin of ``extend_rows``: advance the (len(idx), 2k+1)
    window rows by ``label``'s characters, where ``p`` is the path
    length BEFORE this edge. Cost O(len(label) · len(idx) · (2k+1)) —
    independent of the batch's max query length."""
    W = 2 * k + 1
    L = len(label)
    # query codepoints the whole edge needs: columns j-1 for
    # j ∈ [p+1-k, p+L+k] → [p-k, p+L+k-1]; ONE fancy-index gather per
    # edge, with out-of-range columns pre-poisoned to -1 (no codepoint
    # is negative, so they can never match — replaces a per-char mask)
    cols = np.arange(p - k, p + L + k, dtype=np.int64)
    col_ok = (cols >= 0) & (cols < batch.max_len)
    if batch.max_len:
        sub_codes = batch.codes[
            idx[:, None], np.clip(cols, 0, batch.max_len - 1)[None, :]
        ]
        if not col_ok.all():
            sub_codes = sub_codes.copy() if sub_codes.base is not None else sub_codes
            sub_codes[:, ~col_ok] = -1
    else:
        sub_codes = np.full((len(idx), len(cols)), -1, dtype=np.int32)
    js_w = np.arange(W, dtype=np.int32)
    buf_a, buf_b = np.empty_like(rows), np.empty_like(rows)
    up = np.empty_like(rows)  # scratch, reused across chars
    diag = np.empty_like(rows)
    cur = rows
    for t, ch in enumerate(label):
        c = ord(ch)
        out = buf_a if cur is not buf_a else buf_b
        # cell w at the new window is j = (p+t+1-k) + w; its query
        # char column j-1 sits at offset t + w into the gathered slice
        neq = sub_codes[:, t : t + W] != c
        # diag (j-1, prev) = cur[w]; up (j, prev) = cur[w+1] (BIG pad)
        up[:, :-1] = cur[:, 1:]
        up[:, -1] = BIG
        up += 1
        np.add(cur, neq, out=diag)
        np.minimum(diag, up, out=out)
        # j == 0 has no diag/left: distance(path, ε) = p+t+1; cells
        # j < 0 are padding
        w0 = k - (p + t + 1)
        if w0 >= 0:
            if w0 < W:
                out[:, w0] = p + t + 1
            out[:, : min(w0, W)] = BIG
        # insertion chain out[j] = min(out[j-1]+1, out[j]): running
        # min in (value - w) space (window js are unit-spaced)
        out -= js_w
        np.minimum.accumulate(out, axis=1, out=out)
        out += js_w
        cur = out
    return cur if cur is not rows else rows.copy()


# ---------------------------------------------------------------------------
# transposed banded state kernel — the r13 traversal hot loop
# ---------------------------------------------------------------------------
#
# Same Ukkonen band as above, but the window state is stored TRANSPOSED:
# shape (W, n) with W = 2k+1, so each window cell w is one contiguous
# (n,) row. The r13 profile of the both-big traversal put 80% of task
# time inside ``extend_rows_banded`` — at W=5 the (n, W) layout spends
# most of that in numpy fixed costs (``ufunc.accumulate`` machinery for
# the 5-cell insertion chain, per-edge fancy gathers, strided column
# ops). Transposed, every per-char op is a handful of contiguous-row
# ufunc calls and the insertion chain is W-1 explicit ``minimum`` calls.
# Semantics are IDENTICAL to the (n, W) kernel (property-pinned by
# test_banded_state_kernel_equals_row_kernel and the banded-vs-full
# traversal test).


def banded_initial_state(k: int, n: int) -> np.ndarray:
    """Transposed twin of ``banded_initial_rows``: (W, n) window at
    p=0; row w holds j = w - k → distance(ε, q[:j]) = j, BIG for j<0."""
    js = np.arange(-k, k + 1, dtype=np.int32)
    col = np.where(js >= 0, js, BIG).astype(np.int32)
    return np.repeat(col[:, None], max(n, 0), axis=1)


def state_row_mins(
    lens_sub: np.ndarray, state: np.ndarray, p: int, k: int
) -> np.ndarray:
    """Branch-and-bound lower bound over valid window cells (0 ≤ j ≤
    len(q)) on the transposed state — per-row masked running min, no
    (n, W) temporaries. ``lens_sub`` is ``batch.lens[idx]``."""
    W = 2 * k + 1
    out = np.full(state.shape[1], BIG, dtype=np.int32)
    for w in range(W):
        j = p - k + w
        if j < 0:
            continue
        # masked min: only cells with j <= len(q) participate
        np.minimum(out, state[w], out=out, where=lens_sub >= j)
    return out


def state_final_distances(
    lens_sub: np.ndarray, state: np.ndarray, p: int, k: int
) -> np.ndarray:
    """Exact distance = cell j = len(q); callers guarantee
    |len(q) - p| ≤ k (end-cap length band), so the cell is in window."""
    w = lens_sub - (p - k)
    return state[w, np.arange(state.shape[1])]


def extend_state_banded(
    padT_sub: np.ndarray,
    state: np.ndarray,
    label: str,
    p: int,
    k: int,
) -> np.ndarray:
    """Advance a (W, n) transposed window state by ``label``'s chars.

    ``padT_sub`` is the active queries' slice of
    ``QueryBatch.codes_T_padded(k)`` restricted to the rows this edge
    reads — ``padT[p : p + len(label) + 2k][:, idx]`` — one gather per
    edge; per char the needed (W, n) char matrix is the contiguous view
    ``padT_sub[t : t + W]``. ``p`` is the path length BEFORE the edge.
    Does not mutate ``state``; returns a fresh (W, n) array."""
    W = 2 * k + 1
    n = state.shape[1]
    buf_a = np.empty((W, n), dtype=np.int32)
    buf_b = np.empty((W, n), dtype=np.int32)
    neq = np.empty((W, n), dtype=np.int32)
    scratch = np.empty(n, dtype=np.int32)
    rows_avail = padT_sub.shape[0]
    cur = state
    for t, ch in enumerate(label):
        c = ord(ch)
        out = buf_a if cur is not buf_a else buf_b
        if t + W <= rows_avail:
            # (W, n) substitution costs: 1 where the window char differs
            np.not_equal(padT_sub[t : t + W], c, out=neq, casting="unsafe")
        else:
            # window ran past the padded matrix — every char is poison
            # (only reachable in the guaranteed-pruned p > max_len + k
            # zone; values stay exact-and-large, never ≤ k)
            neq.fill(1)
        # diag: (j-1, prev) sits at the SAME w after the window shift
        np.add(cur, neq, out=out)
        # up: (j, prev) sits at w+1; w = W-1 has no up (outside window)
        if W > 1:
            np.add(cur[1:], 1, out=neq[: W - 1])  # reuse neq as scratch
            np.minimum(out[: W - 1], neq[: W - 1], out=out[: W - 1])
        # j == 0 boundary: distance(path, ε) = p+t+1; j < 0 is padding
        w0 = k - (p + t + 1)
        if w0 >= 0:
            if w0 < W:
                out[w0] = p + t + 1
            out[: min(w0, W)] = BIG
        # insertion chain out[w] = min(out[w], out[w-1] + 1)
        for w in range(1, W):
            np.add(out[w - 1], 1, out=scratch)
            np.minimum(out[w], scratch, out=out[w])
        cur = out
    return cur if cur is not state else state.copy()


def extend_rows_multi(
    batch: QueryBatch, rows: np.ndarray, idx: np.ndarray, labels: list[str]
) -> np.ndarray:
    """Advance row i by ITS OWN edge label ``labels[i]`` — the
    heterogeneous-label twin of ``extend_rows`` for bfs mode, where one
    Arrow batch holds (query, node) pairs visiting MANY different
    nodes. One vectorized char-step advances every row still inside
    its label (per-row char codes broadcast against the query-code
    matrix), so the Python cost is O(max label length) loop iterations
    per batch instead of one ``extend_rows`` call per distinct label —
    the per-level UDF was the measured bfs bottleneck (thousands of
    tiny label groups per batch)."""
    n = len(idx)
    if n == 0:
        return rows.copy()
    lab_lens = np.fromiter((len(l) for l in labels), dtype=np.int32, count=n)
    L = int(lab_lens.max()) if n else 0
    lab_codes = np.zeros((n, L), dtype=np.int32)
    for i, lab in enumerate(labels):
        if lab:
            lab_codes[i, : len(lab)] = np.fromiter(
                map(ord, lab), dtype=np.int32, count=len(lab)
            )
    codes = batch.codes[idx]
    js = batch._js
    cur = rows.copy()
    for t in range(L):
        act = lab_lens > t
        if not act.any():
            break
        sub = cur[act]
        c = lab_codes[act, t]
        out = np.empty_like(sub)
        out[:, 0] = sub[:, 0] + 1
        np.minimum(
            sub[:, :-1] + (codes[act] != c[:, None]), sub[:, 1:] + 1, out=out[:, 1:]
        )
        out -= js
        np.minimum.accumulate(out, axis=1, out=out)
        out += js
        cur[act] = out
    return cur


def levenshtein(a: str, b: str) -> int:
    """Plain two-string Levenshtein distance (test oracle helper)."""
    batch = QueryBatch([a])
    idx = np.array([0])
    rows = extend_rows(batch, batch.initial_rows(), idx, b)
    return int(batch.final_distances(rows, idx)[0])
