import numpy as np

from slim_tpu.types import CSR
from slim_tpu.eval import determine_head_tail, evaluate_topn


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
