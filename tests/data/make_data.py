"""Generator for the vendored sample dataset (checked-in provenance).

The reference ships hand-curated sample data under test/ (README.md:104-183)
that we cannot vendor; this script writes a deterministic synthetic
stand-in with the same *shape class* (implicit feedback, zipf-popular
items, train/test split) so the quality-golden tests and the CLI docs work
without any external files.  Re-running it reproduces the exact bytes.

Usage: python tests/data/make_data.py [outdir]
"""

import os
import sys

import numpy as np

NUSERS, NITEMS = 600, 300
EVENTS_PER_USER = 24  # before dedup/split


def build():
    rng = np.random.default_rng(20260817)
    rows, cols = [], []
    # zipf item popularity + per-user taste locality so SLIM has signal:
    # each user draws from a popularity-weighted pool anchored at a random
    # taste center (items near the center are preferred)
    pop = 1.0 / np.arange(1, NITEMS + 1) ** 0.8
    for u in range(NUSERS):
        center = rng.integers(0, NITEMS)
        dist = np.minimum(np.abs(np.arange(NITEMS) - center),
                          NITEMS - np.abs(np.arange(NITEMS) - center))
        w = pop * np.exp(-dist / 25.0)
        w /= w.sum()
        items = rng.choice(NITEMS, size=EVENTS_PER_USER, replace=False, p=w)
        rows.extend([u] * len(items))
        cols.extend(items.tolist())
    rows = np.asarray(rows)
    cols = np.asarray(cols)
    # leave-2-out split: last 2 events per user go to test
    order = rng.permutation(len(rows))
    rows, cols = rows[order], cols[order]
    seen = {}
    test_mask = np.zeros(len(rows), bool)
    for k in range(len(rows)):
        c = seen.get(rows[k], 0)
        if c < 2:
            test_mask[k] = True
            seen[rows[k]] = c + 1
    return (rows[~test_mask], cols[~test_mask]), (rows[test_mask],
                                                  cols[test_mask])


def write_ijv(path, rows, cols):
    order = np.lexsort((cols, rows))
    with open(path, "w") as fh:
        for r, c in zip(rows[order], cols[order]):
            fh.write(f"{r} {c} 1\n")


def write_csr(path, rows, cols, nrows, ncols):
    with open(path, "w") as fh:
        for u in range(nrows):
            sel = np.sort(cols[rows == u])
            # 0-based ids, "id val" pairs (GK_CSR_FMT_CSR, numbering=0)
            fh.write(" ".join(f"{int(i)} 1" for i in sel))
            fh.write("\n")


def main(outdir):
    (tr, tc), (sr, sc) = build()
    write_ijv(os.path.join(outdir, "synth-train.ijv"), tr, tc)
    write_ijv(os.path.join(outdir, "synth-test.ijv"), sr, sc)
    write_csr(os.path.join(outdir, "synth-train.csr"), tr, tc, NUSERS, NITEMS)
    write_csr(os.path.join(outdir, "synth-test.csr"), sr, sc, NUSERS, NITEMS)
    with open(os.path.join(outdir, "l12file"), "w") as fh:
        fh.write("0.5 0.5\n1.0 1.0\n2.0 1.0\n")
    print(f"train nnz {len(tr)}  test nnz {len(sr)}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         os.path.dirname(os.path.abspath(__file__)))
