#!/usr/bin/env python3
"""Deterministic byte-level BPE trainer for the bundled fixture merge table.

Trains on the sf0.001 documents corpus (normalized the same way the
engine's TextOps.norm does: lower, trim, collapse whitespace) and writes
the rank-ordered merge table to src/main/resources/graft/bpe/merges.tsv
(left<TAB>right per line, rank = line number). Tokens may contain
spaces (byte-level BPE has no pre-tokenizer), never tabs.

Determinism: pair counts over the whole corpus; ties broken by the
lexicographically smallest (left, right) pair; each learned merge is
fully applied (one left-to-right sweep per doc) before the next count.
Run once; the output is a frozen fixture resource — the engine and the
DuckDB oracles both read the same table, so retraining is only needed
if the merge count changes.
"""
import collections
import re
import sys

import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
N_MERGES = int(sys.argv[2]) if len(sys.argv) > 2 else 200
OUT = sys.argv[3] if len(sys.argv) > 3 else \
    "src/main/resources/graft/bpe/merges.tsv"


def norm(s: str) -> str:
    return re.sub(r"\s+", " ", s).strip().lower()


def sweep(toks, left, right):
    """One left-to-right non-overlapping merge pass (BPE application)."""
    out = []
    i = 0
    n = len(toks)
    while i < n:
        if i + 1 < n and toks[i] == left and toks[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(toks[i])
            i += 1
    return out


def main():
    con = duckdb.connect()
    texts = [t for (t,) in con.sql(
        f"SELECT text FROM '{SF_DIR}/documents.parquet' ORDER BY doc_id"
    ).fetchall()]
    docs = [list(norm(t)) for t in texts if norm(t)]
    merges = []
    for step in range(N_MERGES):
        counts = collections.Counter()
        for d in docs:
            for i in range(len(d) - 1):
                counts[(d[i], d[i + 1])] += 1
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), n = best
        if n < 2:
            break
        merges.append((left, right))
        docs = [sweep(d, left, right) for d in docs]
    with open(OUT, "w") as f:
        for left, right in merges:
            f.write(f"{left}\t{right}\n")
    print(f"wrote {len(merges)} merges to {OUT}")
    toks = sum(len(d) for d in docs)
    chars = sum(len(norm(t)) for t in texts)
    print(f"corpus: {chars} chars -> {toks} tokens "
          f"({chars / max(toks, 1):.2f} chars/token)")


if __name__ == "__main__":
    main()
