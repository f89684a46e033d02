"""Native paged-KV runtime tests (pure host: no TPU needed)."""

import numpy as np
import pytest

from flash_attention_from_scratch_tpu.serving.runtime import PagedEngine


def test_basic_lifecycle():
    eng = PagedEngine(num_pages=16, page_size=16, max_batch=4)
    eng.add_request(1, prompt_len=20, max_new_tokens=3)
    batch = eng.step()
    assert list(batch.ids) == [1]
    # 20 tokens + 1 about to be generated = 21 -> 2 pages of 16.
    assert batch.lengths[0] == 20
    assert (batch.page_tables[0] >= 0).sum() == 2
    assert eng.free_pages == 14

    finished = []
    for _ in range(3):
        eng.step()
        finished += eng.commit()
    assert finished == [1]
    assert eng.free_pages == 16  # everything released


def test_continuous_admission():
    eng = PagedEngine(num_pages=8, page_size=16, max_batch=8)
    # Each request needs 2 pages (17 tokens) + 1 watermark at admission.
    for i in range(5):
        eng.add_request(i, prompt_len=17, max_new_tokens=8)
    b = eng.step()
    # Pool of 8 pages admits 3 sequences (3*2=6 used, watermark blocks #4).
    assert len(b.ids) == 3
    assert eng.waiting == 2
    # As running sequences finish, the waiting ones are admitted; everything
    # drains without deadlock.
    for _ in range(40):
        b = eng.step()
        if len(b.ids) == 0 and eng.waiting == 0:
            break
        eng.commit()
    assert eng.waiting == 0
    assert eng.free_pages == 8


def test_page_table_contents_unique():
    eng = PagedEngine(num_pages=32, page_size=8, max_batch=4)
    eng.add_request(10, prompt_len=30, max_new_tokens=2)
    eng.add_request(11, prompt_len=30, max_new_tokens=2)
    b = eng.step()
    used = b.page_tables[b.page_tables >= 0]
    assert len(used) == len(set(used.tolist())), "pages double-allocated"


def test_preemption_on_exhaustion():
    # Both admitted small (1 page each + watermark in a 6-page pool), then
    # grown by decode until the pool runs dry -> youngest preempted.
    eng = PagedEngine(num_pages=6, page_size=4, max_batch=4)
    eng.add_request(1, prompt_len=4, max_new_tokens=12)
    eng.add_request(2, prompt_len=4, max_new_tokens=12)
    b = eng.step()
    assert len(b.ids) == 2  # both admitted
    saw_preempt = False
    for _ in range(80):
        eng.commit()
        b = eng.step()
        saw_preempt = saw_preempt or eng.preempt_count >= 1
        if len(b.ids) == 0 and eng.waiting == 0:
            break
    assert saw_preempt, "pool exhaustion never triggered preemption"
    assert eng.waiting == 0
    assert eng.free_pages == 6  # all pages returned


def test_reject_impossible_request():
    eng = PagedEngine(num_pages=2, page_size=4, max_batch=2)
    with pytest.raises(ValueError):  # can never fit the pool at all
        eng.add_request(1, prompt_len=100, max_new_tokens=10)
    with pytest.raises(ValueError):  # can never clear the admission watermark
        eng.add_request(2, prompt_len=4, max_new_tokens=1)
    eng2 = PagedEngine(num_pages=4, page_size=4, max_batch=2)
    eng2.add_request(3, prompt_len=4, max_new_tokens=1)
    with pytest.raises(ValueError):
        eng2.add_request(3, prompt_len=4, max_new_tokens=1)  # duplicate id


def test_reject_request_exceeding_page_table_width():
    """A sequence that would outgrow the fixed page-table width is rejected
    up front instead of silently truncating its KV addressing later."""
    eng = PagedEngine(num_pages=32, page_size=4, max_batch=2,
                      max_pages_per_seq=4)
    with pytest.raises(ValueError):
        eng.add_request(1, prompt_len=12, max_new_tokens=12)  # needs 6 pages
    eng.add_request(2, prompt_len=8, max_new_tokens=4)  # 3 pages: fine


def test_unadmittable_request_does_not_livelock_queue():
    """Regression: a request passing the old worst-case check but failing the
    admission watermark used to block the FIFO head forever."""
    eng = PagedEngine(num_pages=8, page_size=16, max_batch=4)
    with pytest.raises(ValueError):
        # pages_needed(113+1)+1 = 9 > 8: admission could never succeed.
        eng.add_request(1, prompt_len=113, max_new_tokens=1)
    # The queue stays usable for normal requests.
    eng.add_request(2, prompt_len=17, max_new_tokens=2)
    assert len(eng.step().ids) == 1
