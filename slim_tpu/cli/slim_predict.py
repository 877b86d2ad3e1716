"""slim_predict: top-N prediction + evaluation.

CLI parity with src/programs/slim_predict.c: positionals
``model-file old-file [test-file] [neg-file]``; with a neg-file, all items
are scored, the list is intersected with the pos∪neg candidate set,
tie order among equal scores is randomised, and the list is truncated to
nrcmds (slim_predict.c:110-165).  Prints hr / hr_head / hr_tail / arhr.
"""

from __future__ import annotations

import sys

import numpy as np

from ..eval import determine_head_tail, evaluate_topn
from ..io.readers import read_matrix
from ..predict import densify_model, predict_topn
from .common import add_common_matrix_flags, banner, errexit_main, \
    make_parser, normalise_argv, setup_logging


def main(argv=None):
    parser = make_parser("slim_predict", "Top-N prediction with a SLIM model.")
    add_common_matrix_flags(parser)
    parser.add_argument("--nrcmds", type=int, default=10)
    parser.add_argument("--outfile", default=None)
    parser.add_argument("mdlfile")
    parser.add_argument("trnfile", help="historical (old) ratings")
    parser.add_argument("tstfile", nargs="?", default=None)
    parser.add_argument("negfile", nargs="?", default=None)
    args = parser.parse_args(normalise_argv(sys.argv[1:] if argv is None
                                            else argv))
    setup_logging(args.dbglvl)
    banner()

    model = read_matrix(args.mdlfile, fmt=args.ifmt)
    oldmat = read_matrix(args.trnfile, fmt=args.ifmt)
    tstmat = read_matrix(args.tstfile, fmt=args.ifmt) if args.tstfile else None
    negmat = read_matrix(args.negfile, fmt=args.ifmt) if args.negfile else None

    print(f"  mdlfile: {args.mdlfile}, nrows: {model.nrows}, "
          f"ncols: {model.ncols}, nnz: {model.nnz}")
    print(f"  oldfile: {args.trnfile}, nrows: {oldmat.nrows}, "
          f"ncols: {oldmat.ncols}, nnz: {oldmat.nnz}")
    if tstmat:
        print(f"  tstfile: {args.tstfile}, nrows: {tstmat.nrows}, "
              f"ncols: {tstmat.ncols}, nnz: {tstmat.nnz}")
    print(f"  binarize: {int(args.binarize)}, nrcmds: {args.nrcmds}, "
          f"dbglvl: {args.dbglvl}")
    print("\nMaking predictions...")

    if tstmat and oldmat.nrows != tstmat.nrows:
        raise SystemExit(
            "The number of rows in the old and test files do not match.")

    if args.binarize:
        oldmat = oldmat.binarize()
        if tstmat:
            tstmat = tstmat.binarize()
        if negmat:
            negmat = negmat.binarize()

    if negmat is None:
        ids, scores, counts = predict_topn(model, oldmat, nrcmds=args.nrcmds)
    else:
        # neg-file mode, fully vectorised (slim_predict.c:110-165): the
        # candidate set per user is pos(test) ∪ neg; candidates keep their
        # all-items score (history excluded) or 0; ties are randomised
        # before the descending sort; the list is truncated to
        # min(nrcmds, user's scored-item count) -- a user whose model
        # reaches no items gets zero recommendations, like the reference's
        # nrcmds = gk_min(GetTopN(...), params->nrcmds).
        from ..predict import predict_candidate_scores

        nu = oldmat.nrows
        zp = np.zeros(nu + 1, dtype=np.int64)
        t_ptr = tstmat.indptr.astype(np.int64) if tstmat else zp
        t_ind = tstmat.indices if tstmat else np.zeros(0, np.int32)
        n_ptr = negmat.indptr.astype(np.int64)
        n_ind = negmat.indices
        t_cnt = t_ptr[1:] - t_ptr[:-1]
        n_cnt = n_ptr[1:] - n_ptr[:-1]
        C = max(int((t_cnt + n_cnt).max(initial=1)), 1)
        cand = np.full((nu, C), -1, np.int32)
        rows_t = np.repeat(np.arange(nu), t_cnt)
        cand[rows_t, np.arange(len(t_ind)) - np.repeat(t_ptr[:-1], t_cnt)] \
            = t_ind
        rows_n = np.repeat(np.arange(nu), n_cnt)
        cand[rows_n, t_cnt[rows_n] + np.arange(len(n_ind))
             - np.repeat(n_ptr[:-1], n_cnt)] = n_ind
        # dedup per row (pos∪neg): sort, blank repeats
        cand = np.sort(cand, axis=1)[:, ::-1]  # desc: -1 padding last
        dup = cand[:, 1:] == cand[:, :-1]
        cand[:, 1:][dup] = -1
        ncands = (cand >= 0).sum(axis=1)

        cscores, nscored = predict_candidate_scores(model, oldmat, cand)
        # random tie order (double shuffle, slim_predict.c:148-158) =
        # stable sort by score desc with a random secondary key
        rng = np.random.default_rng(0)
        key = np.where(cand >= 0, cscores, -np.inf)
        order = np.lexsort((rng.random(cand.shape), -key), axis=-1)
        ids = np.take_along_axis(cand, order, axis=1)[:, :args.nrcmds]
        scores = np.take_along_axis(cscores, order, axis=1)[:, :args.nrcmds]
        counts = np.minimum(np.minimum(args.nrcmds, nscored),
                            ncands).astype(np.int32)
        ids[np.arange(ids.shape[1])[None, :] >= counts[:, None]] = -1
        if ids.shape[1] < args.nrcmds:
            pad = args.nrcmds - ids.shape[1]
            ids = np.pad(ids, ((0, 0), (0, pad)), constant_values=-1)
            scores = np.pad(scores, ((0, 0), (0, pad)))

    if args.outfile:
        with open(args.outfile, "w") as fh:
            for u in range(oldmat.nrows):
                fh.write(" ".join(f" {ids[u, r]} {scores[u, r]:f}"
                                  for r in range(counts[u])))
                fh.write("\n")

    if tstmat is not None:
        ncols = max(oldmat.ncols, tstmat.ncols, model.ncols)
        fmarker = determine_head_tail(oldmat, ncols)
        res = evaluate_topn(ids[:, :args.nrcmds], np.minimum(counts, args.nrcmds),
                            tstmat, fmarker)
        print(f"\nnvalid: {res.nvalid} nvalid_head: {res.nvalid_head} "
              f"nvalid_tail: {res.nvalid_tail}")
        print(f"hr: {res.hr:.4f} hr_head: {res.hr_head:.4f} "
              f"hr_tail: {res.hr_tail:.4f} arhr: {res.arhr:.4f}")
    print("-" * 66)
    return 0


if __name__ == "__main__":
    sys.exit(errexit_main(main)())
