"""Independent TEXTBOOK BPE trainer — the oracle generator for the
``bpe_train_merges`` gate (r10 verdict #3).

Deliberately shares NO code with ``prefixtree_spark.operators.text``:
it reads the parquet through DuckDB, whitespace-tokenizes with the
same public rule (``\\S+`` runs), and runs the naive O(vocab) textbook
merge loop — pair counts recomputed FROM SCRATCH each iteration (no
incremental bookkeeping to share bugs with), best pair = highest
count, ties broken lexicographically, merges applied left-to-right
per word. The engine's incremental trainer must reproduce this merge
sequence exactly.

Usage::

    python tools/bpe_textbook_trainer.py [sf_dir] [n_merges]

Prints the merge list one per line (``rank<TAB>left<TAB>right``) and,
with ``--sql``, the ``VALUES`` oracle body to embed in
``workloads_ext.py``.
"""

from __future__ import annotations

import re
import sys


def textbook_bpe(texts, n_merges: int) -> list[tuple[str, str]]:
    vocab: dict[str, int] = {}
    for t in texts:
        if t is None:
            continue
        for tok in re.findall(r"\S+", t):
            vocab[tok] = vocab.get(tok, 0) + 1
    words = [[tuple(w), c] for w, c in vocab.items()]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, cnt in words:
            for pair in zip(syms, syms[1:]):
                counts[pair] = counts.get(pair, 0) + cnt
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        new_sym = best[0] + best[1]
        for rec in words:
            syms = rec[0]
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(new_sym)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            rec[0] = tuple(out)
    return merges


def main() -> None:
    import duckdb

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    texts = [
        r[0]
        for r in duckdb.sql(
            f"SELECT text FROM '{sf_dir}/documents.parquet'"
        ).fetchall()
    ]
    merges = textbook_bpe(texts, n_merges)
    if "--sql" in sys.argv:
        rows = ",\n      ".join(
            "({}, '{}', '{}')".format(
                i + 1, l.replace("'", "''"), r.replace("'", "''")
            )
            for i, (l, r) in enumerate(merges)
        )
        print(
            "    SELECT * FROM (VALUES\n      "
            + rows
            + "\n    ) AS t(merge_rank, left_sym, right_sym)"
        )
    else:
        for i, (left, right) in enumerate(merges):
            print(f"{i + 1}\t{left}\t{right}")


if __name__ == "__main__":
    main()
