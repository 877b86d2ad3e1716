import numpy as np

from slim_tpu.types import CSR
from slim_tpu.eval import determine_head_tail, evaluate_topn


def loop_oracle(topn_ids, topn_counts, test, fmarker,
                require_test_items=False):
    """Straightforward per-user restatement of the reference evaluation
    loops (slim_predict.c:180-235) used to validate the vectorised
    implementation."""
    nusers, N = topn_ids.shape
    hr_all = hr_head = hr_tail = arhr = 0.0
    nvalid = nvalid_head = nvalid_tail = 0
    for u in range(nusers):
        ntest = int(test.indptr[u + 1] - test.indptr[u])
        if require_test_items and ntest < 1:
            continue
        if topn_counts[u] < 0:
            continue
        nvalid += 1
        if ntest < 1:
            continue
        titems = test.indices[test.indptr[u]:test.indptr[u + 1]]
        tmark = fmarker[titems]
        nth, ntt = int(np.sum(tmark == 0)), int(np.sum(tmark == 1))
        nvalid_head += 1 if nth else 0
        nvalid_tail += 1 if ntt else 0
        baseline = float(np.sum(1.0 / (1.0 + np.arange(ntest))))
        k = int(topn_counts[u])
        recs = topn_ids[u, :k]
        hitmask = np.isin(recs, titems) & (recs >= 0)
        ranks = np.nonzero(hitmask)[0]
        if len(ranks):
            hmark = fmarker[recs[ranks]]
            nhh, nht = int(np.sum(hmark == 0)), int(np.sum(hmark == 1))
            hr_head += nhh / nth if nhh > 0 else 0.0
            hr_tail += nht / ntt if nht > 0 else 0.0
            hr_all += len(ranks) / ntest
            arhr += float(np.sum(1.0 / (1.0 + ranks))) / baseline
    return (hr_all / nvalid if nvalid else 0.0,
            hr_head / nvalid_head if nvalid_head else 0.0,
            hr_tail / nvalid_tail if nvalid_tail else 0.0,
            arhr / nvalid if nvalid else 0.0,
            nvalid, nvalid_head, nvalid_tail)


def test_vectorised_matches_loop_oracle():
    rng = np.random.default_rng(17)
    nusers, nitems, N = 80, 40, 10
    train_mask = rng.random((nusers, nitems)) < 0.2
    rows, cols = np.nonzero(train_mask)
    train = CSR.from_ijv(rows, cols, np.ones(len(rows)), nusers, nitems)
    fmarker = determine_head_tail(train)
    test_mask = (rng.random((nusers, nitems)) < 0.08) & ~train_mask
    trows, tcols = np.nonzero(test_mask)
    test = CSR.from_ijv(trows, tcols, np.ones(len(trows)), nusers, nitems)

    topn = rng.integers(0, nitems, size=(nusers, N)).astype(np.int32)
    counts = rng.integers(0, N + 1, size=nusers).astype(np.int32)
    counts[::13] = -1  # some failed predictions
    topn[np.arange(N)[None, :] >= counts[:, None]] = -1

    for req in (False, True):
        res = evaluate_topn(topn, counts, test, fmarker,
                            require_test_items=req)
        exp = loop_oracle(topn, counts, test, fmarker,
                          require_test_items=req)
        np.testing.assert_allclose(
            [res.hr, res.hr_head, res.hr_tail, res.arhr], exp[:4], rtol=1e-9)
        assert (res.nvalid, res.nvalid_head, res.nvalid_tail) == exp[4:]


def test_head_tail_split():
    # item frequencies: item0 x4, item1 x3, item2 x2, item3 x1 (nnz=10)
    rows = [0, 1, 2, 3, 0, 1, 2, 0, 1, 0]
    cols = [0, 0, 0, 0, 1, 1, 1, 2, 2, 3]
    train = CSR.from_ijv(rows, cols, np.ones(10), nrows=4, ncols=4)
    marker = determine_head_tail(train)
    # budget = 10//2 = 5: item0 (rem 5>0, head), item1 (rem 1>0, head),
    # item2 (rem -2, tail), item3 tail
    np.testing.assert_array_equal(marker, [0, 0, 1, 1])


def test_head_tail_all_head_when_one_item():
    train = CSR.from_ijv([0, 1], [0, 0], [1, 1], nrows=2, ncols=1)
    np.testing.assert_array_equal(determine_head_tail(train), [0])


def test_evaluate_hand_computed():
    # 2 users; 4 items; head = {0,1} tail = {2,3} by construction
    rows = [0, 0, 0, 1, 1, 1, 0, 1]
    cols = [0, 1, 2, 0, 1, 3, 3, 2]
    train = CSR.from_ijv(rows, cols, np.ones(8), nrows=2, ncols=4)
    fmarker = determine_head_tail(train)

    # test items: user0 -> {1, 3}; user1 -> {2}
    test = CSR.from_ijv([0, 0, 1], [1, 3, 2], np.ones(3), nrows=2, ncols=4)

    # user0 recommended [1, 2]: hits item1 at rank0 -> hr=1/2,
    #   arhr = (1/1) / (1/1 + 1/2) = 2/3
    # user1 recommended [0, 2]: hits item2 at rank1 -> hr=1/1,
    #   arhr = (1/2) / (1/1) = 1/2
    topn = np.array([[1, 2], [0, 2]], dtype=np.int32)
    counts = np.array([2, 2], dtype=np.int32)
    res = evaluate_topn(topn, counts, test, fmarker)
    assert res.nvalid == 2
    np.testing.assert_allclose(res.hr, (0.5 + 1.0) / 2)
    np.testing.assert_allclose(res.arhr, (2 / 3 + 1 / 2) / 2)

    # head/tail: user0 true head={1} tail={3}; hit head item1 -> head_hr 1/1,
    # tail 0/1. user1 true tail={2}: hit -> tail_hr 1.
    # nvalid_head=1 (only user0 has head items), nvalid_tail=2
    assert res.nvalid_head == 1 and res.nvalid_tail == 2
    np.testing.assert_allclose(res.hr_head, 1.0)
    np.testing.assert_allclose(res.hr_tail, (0.0 + 1.0) / 2)


def test_evaluate_invalid_and_empty_users():
    train = CSR.from_ijv([0, 1, 2], [0, 1, 0], np.ones(3), nrows=3, ncols=2)
    fmarker = determine_head_tail(train)
    test = CSR.from_ijv([0, 2], [1, 0], np.ones(2), nrows=3, ncols=2)
    topn = np.array([[1, -1], [0, -1], [-1, -1]], dtype=np.int32)
    counts = np.array([1, 1, -1], dtype=np.int32)  # user2 failed

    # slim_predict convention: every non-failed user is valid
    res = evaluate_topn(topn, counts, test, fmarker)
    assert res.nvalid == 2
    np.testing.assert_allclose(res.hr, (1.0 + 0.0) / 2)

    # mselect convention: users without test items are skipped
    res2 = evaluate_topn(topn, counts, test, fmarker, require_test_items=True)
    assert res2.nvalid == 1
    np.testing.assert_allclose(res2.hr, 1.0)
