"""Direct property tests for ``merge_running_topk`` — the ONE shared
running top-k merge kernel behind the knn/ivf/pq scan paths (r9
consolidation, `operators/topk.py`). The downstream driver rows gate it
end-to-end; these pin its contract in isolation so a future edit can't
pass one caller's integration test while breaking another caller's
assumptions (tie policy, pad handling, asc/desc symmetry).

Contract under test (pure numpy, no Spark session needed):
given per-row running best (Q, kk) and batch candidates (Q, B>=1),
the returned (Q, kk) rows hold exactly the kk best candidates of the
concatenation by score (asc: smallest; desc: largest), where ties
straddling the kk boundary keep the SMALLEST ids (the SQL oracle's
ORDER BY score, _docid tie order), and rows with fewer than kk finite
candidates keep every finite one (inf/-1 pads are the callers'
emission-time filter, not the kernel's problem).
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from gamma_spark.operators.topk import merge_running_topk


def brute_topk(scores: np.ndarray, ids: np.ndarray, kk: int, asc: bool):
    """Reference: full (score, id) lexsort per row, first kk, finite
    only. Returns a list of sorted (score, id) tuples per row."""
    out = []
    for s_row, i_row in zip(scores, ids):
        key = s_row if asc else -s_row
        order = np.lexsort((i_row, key))[:kk]
        kept = [
            (float(s_row[j]), int(i_row[j]))
            for j in order
            if np.isfinite(s_row[j])
        ]
        out.append(sorted(kept))
    return out


def kernel_kept(out_s: np.ndarray, out_i: np.ndarray):
    return [
        sorted(
            (float(s), int(i))
            for s, i in zip(s_row, i_row)
            if np.isfinite(s)
        )
        for s_row, i_row in zip(out_s, out_i)
    ]


def run_case(cur_s, cur_i, batch_s, batch_i, kk, asc):
    got_s, got_i = merge_running_topk(
        cur_s.copy(), cur_i.copy(), batch_s.copy(), batch_i.copy(), kk, asc
    )
    assert got_s.shape == (cur_s.shape[0], kk)
    assert got_i.shape == (cur_s.shape[0], kk)
    all_s = np.concatenate([cur_s, batch_s], axis=1)
    all_i = np.concatenate([cur_i, batch_i], axis=1)
    assert kernel_kept(got_s, got_i) == brute_topk(all_s, all_i, kk, asc)


@settings(max_examples=200, deadline=None)
@given(
    q=st.integers(1, 5),
    kk=st.integers(1, 6),
    b=st.integers(1, 8),
    asc=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
    # small integer score alphabet => boundary ties are the common
    # case, not the rare one
    alphabet=st.integers(2, 4),
)
def test_matches_brute_reference(q, kk, b, asc, seed, alphabet):
    rng = np.random.default_rng(seed)
    pad = np.inf if asc else -np.inf
    # running state: a mix of real prior merges and untouched pads,
    # built the way callers build it (pads carry id -1)
    cur_s = rng.integers(0, alphabet, size=(q, kk)).astype(np.float64)
    cur_i = rng.integers(0, 50, size=(q, kk)).astype(np.int64)
    pad_mask = rng.random((q, kk)) < 0.4
    cur_s[pad_mask] = pad
    cur_i[pad_mask] = -1
    batch_s = rng.integers(0, alphabet, size=(q, b)).astype(np.float64)
    batch_i = rng.integers(0, 50, size=(q, b)).astype(np.int64)
    # callers band-filter by overwriting scores with the pad, ids kept
    bmask = rng.random((q, b)) < 0.2
    batch_s[bmask] = pad
    run_case(cur_s, cur_i, batch_s, batch_i, kk, asc)


def test_first_batch_all_pads():
    # the very first merge: running state is 100% pads
    for asc in (True, False):
        pad = np.inf if asc else -np.inf
        cur_s = np.full((2, 3), pad)
        cur_i = np.full((2, 3), -1, dtype=np.int64)
        batch_s = np.array([[1.0, 2.0], [5.0, 4.0]])
        batch_i = np.array([[10, 11], [12, 13]], dtype=np.int64)
        run_case(cur_s, cur_i, batch_s, batch_i, 3, asc)


def test_boundary_tie_keeps_smallest_ids():
    # four candidates tie at the boundary score; kk=2 must keep the two
    # smallest ids among the tied set (after any strictly-better ones)
    cur_s = np.array([[1.0, 2.0]])
    cur_i = np.array([[40, 41]], dtype=np.int64)
    batch_s = np.array([[2.0, 2.0, 2.0]])
    batch_i = np.array([[7, 3, 9]], dtype=np.int64)
    got_s, got_i = merge_running_topk(cur_s, cur_i, batch_s, batch_i, 2, True)
    assert sorted(zip(got_s[0], got_i[0])) == [(1.0, 40), (2.0, 3)]
    # descending: same candidates, now 2.0 is best; keep ids 3 and 7
    got_s, got_i = merge_running_topk(cur_s, cur_i, batch_s, batch_i, 2, False)
    assert sorted(zip(got_s[0], got_i[0])) == [(2.0, 3), (2.0, 7)]


def test_underfilled_row_keeps_every_finite():
    # kk=4 but only 2 finite candidates exist: both kept, pads fill
    cur_s = np.full((1, 4), np.inf)
    cur_i = np.full((1, 4), -1, dtype=np.int64)
    batch_s = np.array([[3.0, np.inf, 1.0]])
    batch_i = np.array([[5, 6, 7]], dtype=np.int64)
    got_s, got_i = merge_running_topk(cur_s, cur_i, batch_s, batch_i, 4, True)
    assert kernel_kept(got_s, got_i) == [[(1.0, 7), (3.0, 5)]]


def test_single_column_batch():
    # B=1 is the minimum the dual-pivot probe supports (kk+1 columns)
    cur_s = np.array([[2.0, 4.0], [1.0, 3.0]])
    cur_i = np.array([[1, 2], [3, 4]], dtype=np.int64)
    batch_s = np.array([[3.0], [0.5]])
    batch_i = np.array([[9], [8]], dtype=np.int64)
    run_case(cur_s, cur_i, batch_s, batch_i, 2, True)
