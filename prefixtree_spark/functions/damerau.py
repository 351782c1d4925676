"""Unrestricted Damerau-Levenshtein distance (Lowrance-Wagner).

The reference engine is Levenshtein-only (``CalculateLevenshteinVector``,
PrefixTree.ecl:315-377); transposition-aware distance is the metric
entity resolution actually wants ("JOHN SMIHT" is one typo, not two).
This module provides the exact kernel the engine's ``metric="damerau"``
fuzzy operators rerank with.

Semantics: the UNRESTRICTED variant (a transposed pair may be edited
between its characters later in the optimal script — DL("CA","ABC")=2),
matching DuckDB's ``damerau_levenshtein`` exactly (fuzz-pinned by
test), NOT the restricted OSA variant (OSA("CA","ABC")=3) many
libraries mislabel. Distances are per Unicode codepoint; DuckDB counts
UTF-8 bytes, so oracles stay ASCII (same rule as ``levenshtein``).

Why rerank instead of a transposition-aware trie traversal: the
unrestricted DP's transposition term reads ``d[k][l]`` for k = the last
row whose character matches the current column — state that grows with
the alphabet and path, not a fixed-width row. The engine instead uses
the metric inequality  lev(a,b) <= 2 * dl(a,b)  (every transposition is
two substitutions, other ops map 1:1), so the EXISTING branch-and-bound
tree search at 2k yields a guaranteed candidate superset for DL <= k,
and this exact kernel scores only those survivors. Cost model: tree
search at 2k + O(|candidates| * |a|*|b|) rerank — bounded by the pruned
candidate count, never |left| x |right|.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T


def damerau_levenshtein(a: str, b: str) -> int:
    """Exact unrestricted Damerau-Levenshtein distance (Lowrance-
    Wagner DP, O(|a|*|b|) time, alphabet-dict row memory).

    Common prefix and suffix are stripped first — EXACT for
    unrestricted DL (an optimal script never needs to edit a matched
    flank; verified exhaustively over alphabet-3 strings to length 5
    against the untrimmed DP, plus the DuckDB fuzz pin). This is the
    rerank's big win (r12): tree-pruned candidate pairs share long
    prefixes by construction, so the O(|a|·|b|) core collapses to the
    differing span (measured 164k customer-name pairs: ~18×18 DP →
    ~4×4)."""
    # strip common prefix
    i = 0
    la, lb = len(a), len(b)
    m = min(la, lb)
    while i < m and a[i] == b[i]:
        i += 1
    # strip common suffix (never past the stripped prefix)
    j = 0
    mj = m - i
    while j < mj and a[la - 1 - j] == b[lb - 1 - j]:
        j += 1
    a = a[i : la - j]
    b = b[i : lb - j]
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    maxd = la + lb
    da: dict[str, int] = {}
    d = [[maxd] * (lb + 2) for _ in range(la + 2)]
    for i in range(la + 1):
        d[i + 1][1] = i
        d[i + 1][0] = maxd
    for j in range(lb + 1):
        d[1][j + 1] = j
        d[0][j + 1] = maxd
    for i in range(1, la + 1):
        db = 0
        ai = a[i - 1]
        row, prev = d[i + 1], d[i]
        for j in range(1, lb + 1):
            bj = b[j - 1]
            k = da.get(bj, 0)
            l = db
            if ai == bj:
                cost = 0
                db = j
            else:
                cost = 1
            row[j + 1] = min(
                prev[j] + cost,          # substitute / match
                row[j] + 1,              # insert
                prev[j + 1] + 1,         # delete
                d[k][l] + (i - k - 1) + 1 + (j - l - 1),  # transpose
            )
        da[ai] = i
    return d[la + 1][lb + 1]


_VEC_MAX_LEN = 512  # pairs with a longer side fall back to the scalar DP


def _codes(strings: list, lengths: np.ndarray, width: int, pad: int) -> np.ndarray:
    """(P, width) int32 codepoint matrix padded with ``pad``."""
    P = len(strings)
    flat = np.frombuffer(
        "".join(strings).encode("utf-32-le"), dtype=np.uint32
    ).astype(np.int32)
    off = np.zeros(P + 1, dtype=np.int64)
    np.cumsum(lengths, out=off[1:])
    M = np.full((P, width), pad, dtype=np.int32)
    cols = np.arange(width)[None, :]
    valid = cols < lengths[:, None]
    M[valid] = flat[(off[:-1, None] + cols)[valid]]
    return M


def _dl_bucket(Ac: np.ndarray, ca: np.ndarray, Bc: np.ndarray, cb: np.ndarray) -> np.ndarray:
    """Vectorized Lowrance-Wagner over one padded bucket of pairs
    (pair axis last, so every per-cell op touches one contiguous row —
    the r13 levenshtein-kernel layout lesson).

    Cells (i<=ca[p], j<=cb[p]) are exact for every pair p: the DP fills
    in increasing (i, j), so padded rows/columns only write state that
    later iterations read, never cells inside a shorter pair's core;
    per-side pad sentinels never match, and the last-match tables
    (``da``/``db``) at iteration (i, j) were written by strictly earlier
    rows/columns, which are in-core whenever (i, j) is."""
    P, m = Ac.shape
    n = Bc.shape[1]
    # compact alphabet so `da` (last row where a's char == v) is a small
    # (P, V) table instead of a dict per pair
    uniq, inv = np.unique(np.concatenate([Ac, Bc], axis=1), return_inverse=True)
    inv = inv.astype(np.int32).reshape(P, m + n)
    Ac, Bc = inv[:, :m], inv[:, m:]
    BIG = np.int32(m + n + 1)
    d = np.full((m + 2, n + 2, P), BIG, dtype=np.int32)
    d[1:, 1, :] = np.arange(m + 1, dtype=np.int32)[:, None]
    d[1, 1:, :] = np.arange(n + 1, dtype=np.int32)[:, None]
    da = np.zeros((P, len(uniq)), dtype=np.int32)
    rng = np.arange(P)
    dflat = d.reshape(-1, P)
    for i in range(1, m + 1):
        db = np.zeros(P, dtype=np.int32)
        ai = Ac[:, i - 1]
        for j in range(1, n + 1):
            bj = Bc[:, j - 1]
            k = da[rng, bj]
            l = db
            eq = ai == bj
            db = np.where(eq, np.int32(j), db)
            trans = dflat[k * (n + 2) + l, rng] + (i - k - 1) + (j - l - 1) + 1
            v = np.minimum(d[i, j] + (1 - eq), d[i + 1, j] + 1)
            np.minimum(v, d[i, j + 1] + 1, out=v)
            np.minimum(v, trans, out=v)
            d[i + 1, j + 1] = v
        da[rng, ai] = np.int32(i)
    return d[ca + 1, cb + 1, rng]


def dl_batch(a_list: list, b_list: list) -> np.ndarray:
    """Exact unrestricted DL for each (a_list[i], b_list[i]) pair,
    batch-vectorized (r13): flank trim, trivial-core dispatch and the
    DP itself all run as numpy ops over the pair axis instead of a
    Python loop per pair. Bit-identical to ``damerau_levenshtein``
    (exhaustive + fuzz pinned by test)."""
    P = len(a_list)
    out = np.zeros(P, dtype=np.int32)
    if P == 0:
        return out
    na = np.fromiter((len(s) for s in a_list), dtype=np.int64, count=P)
    nb = np.fromiter((len(s) for s in b_list), dtype=np.int64, count=P)
    long = (na > _VEC_MAX_LEN) | (nb > _VEC_MAX_LEN)
    if long.any():
        # the (P, L) trim matrices would blow up on one pathological
        # string; score the long tail with the scalar DP instead
        for p in np.flatnonzero(long):
            out[p] = damerau_levenshtein(a_list[p], b_list[p])
        keep = np.flatnonzero(~long)
        if len(keep) == 0:
            return out
        out[keep] = dl_batch(
            [a_list[p] for p in keep], [b_list[p] for p in keep]
        )
        return out
    L = int(max(na.max(), nb.max()))
    if L == 0:
        return out
    A = _codes(a_list, na, L, -1)
    B = _codes(b_list, nb, L, -2)
    # vectorized common-prefix length (pads never match; the appended
    # False column makes argmin well-defined for fully-equal rows)
    false_col = np.zeros((P, 1), dtype=bool)
    pre = np.concatenate([A == B, false_col], axis=1).argmin(axis=1)
    mlen = np.minimum(na, nb)
    # vectorized common-suffix length on right-aligned views, capped so
    # it never overlaps the stripped prefix (same rule as the scalar)
    cols = np.arange(L)[None, :]
    rows = np.arange(P)[:, None]
    ia = na[:, None] - 1 - cols
    ib = nb[:, None] - 1 - cols
    Ar = np.where(ia >= 0, A[rows, np.clip(ia, 0, L - 1)], -1)
    Br = np.where(ib >= 0, B[rows, np.clip(ib, 0, L - 1)], -2)
    suf = np.concatenate([Ar == Br, false_col], axis=1).argmin(axis=1)
    suf = np.minimum(suf, mlen - pre)
    ca = (na - pre - suf).astype(np.int32)
    cb = (nb - pre - suf).astype(np.int32)
    trivial = (ca == 0) | (cb == 0)
    out[trivial] = np.maximum(ca, cb)[trivial]
    rest = np.flatnonzero(~trivial)
    if len(rest) == 0:
        return out
    # bucket by pow2 of the max core dimension (square buckets): fewer,
    # larger buckets beat tighter shape fits — the DP step cost is numpy
    # fixed overhead on small arrays, so concentrating pairs into one
    # big bucket wins even though short cores pay padded steps (measured
    # on the exhaustive suite: 0.081 -> 0.027 s vs per-shape buckets)
    mx = np.maximum(ca[rest], cb[rest])
    key = 1 << np.ceil(np.log2(mx)).astype(np.int64)
    order = np.argsort(key, kind="stable")
    rest = rest[order]
    key = key[order]
    bounds = np.flatnonzero(np.concatenate([[True], key[1:] != key[:-1]]))
    bounds = np.append(bounds, len(rest))
    CHUNK = 8192  # bound the (m+2)(n+2)P DP state per bucket call
    for s, e in zip(bounds[:-1], bounds[1:]):
        for cs in range(s, e, CHUNK):
            idx = rest[cs : min(cs + CHUNK, e)]
            m = int(ca[idx].max())
            n = int(cb[idx].max())
            w = np.arange(m)[None, :]
            Ac = np.where(
                w < ca[idx][:, None],
                A[idx[:, None], np.clip(pre[idx][:, None] + w, 0, L - 1)],
                -1,
            )
            w = np.arange(n)[None, :]
            Bc = np.where(
                w < cb[idx][:, None],
                B[idx[:, None], np.clip(pre[idx][:, None] + w, 0, L - 1)],
                -2,
            )
            out[idx] = _dl_bucket(Ac, ca[idx], Bc, cb[idx])
    return out


def dl_pairs_udf():
    """Arrow-batched (string, string) -> int pandas UDF computing the
    exact DL per pair — the rerank kernel for ``metric="damerau"``
    operators. Batch-vectorized DP across the pair axis (``dl_batch``);
    candidate sets are tree-pruned, so the UDF sees O(candidates), not
    a cross join; work parallelizes across candidate partitions."""

    @F.pandas_udf(T.IntegerType())
    def dl(a: pd.Series, b: pd.Series) -> pd.Series:
        a_list = ["" if x is None else x for x in a]
        b_list = ["" if y is None else y for y in b]
        try:
            vals = dl_batch(a_list, b_list)
        except Exception:
            # defensive: any string utf-32 can't encode (lone
            # surrogates) scores via the scalar DP instead
            vals = [
                damerau_levenshtein(x, y) for x, y in zip(a_list, b_list)
            ]
        return pd.Series(vals, dtype="int32")

    return dl
