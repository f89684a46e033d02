"""Randomized differential stress test of the native scheduler.

The C++ engine accumulated refcounted prefix sharing, LRU retirement,
variable-count commits, and batch slot growth — a fuzz over random op
sequences checks the invariants no single-path test can:

1. Page conservation: free + lru + distinct-owned == num_pages, always.
2. Ownership: two running sequences only ever share a common PREFIX of
   their page tables (refcounted published pages), never interior pages.
3. cached_pages never exceeds the number of full prompt pages.
4. The engine never hands out -1 (padding) below a sequence's length.
"""

import ctypes

import numpy as np
import pytest

from flash_attention_from_scratch_tpu.serving.generate import _page_hashes
from flash_attention_from_scratch_tpu.serving.runtime import Batch, PagedEngine

NUM_PAGES, PAGE_SIZE, MAX_BATCH, MAX_PPS = 24, 64, 4, 8


def _snapshot(eng) -> Batch:
    """Non-mutating dump of the current running batch (no step())."""
    n = eng._lib.fa_engine_batch_size(eng._h)
    ids = np.zeros(n, np.int64)
    lens = np.zeros(n, np.int32)
    pages = np.zeros((n, MAX_PPS), np.int32)
    if n:
        eng._lib.fa_engine_batch(
            eng._h, ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            pages.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), MAX_PPS)
    return Batch(ids, lens, pages)


def _check_invariants(eng, batch, prompts):
    tables = batch.page_tables
    owned = set()
    for i in range(len(batch.ids)):
        npages = -(-int(batch.lengths[i]) // PAGE_SIZE)
        row = tables[i]
        assert (row[:npages] >= 0).all(), (batch.ids[i], row, batch.lengths[i])
        owned.update(int(p) for p in row if p >= 0)
    # Conservation: every page is free, retired (lru), or owned by someone.
    # Shared pages are counted once in `owned`.
    assert eng.free_pages + eng.lru_pages + len(owned) == NUM_PAGES, (
        eng.free_pages, eng.lru_pages, len(owned))
    # Sharing only as common prefixes: for every pair, the set of common
    # pages must be exactly the longest common prefix of their tables.
    n = len(batch.ids)
    for i in range(n):
        for j in range(i + 1, n):
            a = [int(p) for p in tables[i] if p >= 0]
            b = [int(p) for p in tables[j] if p >= 0]
            common = set(a) & set(b)
            lcp = 0
            while lcp < min(len(a), len(b)) and a[lcp] == b[lcp]:
                lcp += 1
            assert common == set(a[:lcp]), (a, b)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_engine_fuzz(seed):
    rng = np.random.default_rng(seed)
    eng = PagedEngine(NUM_PAGES, PAGE_SIZE, MAX_BATCH,
                      max_pages_per_seq=MAX_PPS)
    # A small pool of prompt contents so prefix sharing actually happens.
    prompt_pool = [
        [int(x) for x in rng.integers(0, 100, rng.integers(40, 300))]
        for _ in range(5)
    ]
    next_id = 0
    live = {}          # sid -> (prompt, remaining_budget)
    prefilled = set()  # sids whose prefill was "run" (publish called)

    for op_i in range(400):
        op = rng.choice(["submit", "step", "spec", "finish"],
                        p=[0.3, 0.45, 0.15, 0.1])
        if op == "submit" and len(live) < 8:
            prompt = prompt_pool[rng.integers(len(prompt_pool))]
            budget = int(rng.integers(1, 20))
            try:
                eng.add_request_cached(next_id, len(prompt), budget,
                                       _page_hashes(prompt, PAGE_SIZE))
                live[next_id] = budget
                next_id += 1
            except ValueError:
                pass  # pool-capacity rejection is legal
        elif op == "step":
            batch = eng.step()
            _check_invariants(eng, batch, prompt_pool)
            for sid in batch.ids.tolist():
                if sid not in prefilled:
                    eng.publish(sid)  # "prefill ran"
                    prefilled.add(sid)
            for sid in eng.commit():
                live.pop(sid, None)
                prefilled.discard(sid)
        elif op == "spec":
            if eng.running and eng.waiting == 0:
                batch = eng.step()
                for sid in batch.ids.tolist():
                    if sid not in prefilled:
                        eng.publish(sid)
                        prefilled.add(sid)
                k = 3
                if eng.grow_batch(k):
                    # grow allocated pages the pre-grow dump doesn't show:
                    # re-snapshot before checking conservation.
                    _check_invariants(eng, _snapshot(eng), prompt_pool)
                    for sid in list(batch.ids.tolist()):
                        n_acc = int(rng.integers(0, k))  # + the final commit
                        if eng.commit_n(sid, n_acc):
                            live.pop(sid, None)
                            prefilled.discard(sid)
                for sid in eng.commit():
                    live.pop(sid, None)
                    prefilled.discard(sid)
        elif op == "finish" and live:
            sid = int(rng.choice(list(live)))
            try:
                eng.finish(sid)
            except KeyError:
                pass
            live.pop(sid, None)
            prefilled.discard(sid)

    # Drain: everything still live must run to completion without deadlock.
    for _ in range(600):
        if eng.running == 0 and eng.waiting == 0:
            break
        batch = eng.step()
        _check_invariants(eng, batch, prompt_pool)
        for sid in batch.ids.tolist():
            if sid not in prefilled:
                eng.publish(sid)
                prefilled.add(sid)
        eng.commit()
    assert eng.running == 0 and eng.waiting == 0
    # All pages accounted for at the end: nothing leaked.
    assert eng.free_pages + eng.lru_pages == NUM_PAGES
