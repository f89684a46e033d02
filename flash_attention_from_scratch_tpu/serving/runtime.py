"""ctypes bindings for the native paged-KV runtime (csrc/paged_runtime.cpp).

The native library is compiled on first use with g++ (no pybind11 in this
environment; the C ABI + ctypes replaces the reference's pybind layer,
``src/flash_attention.cu:137-150``). The .so is cached next to the source
keyed on a source hash.
"""

from __future__ import annotations

import ctypes
import dataclasses
import hashlib
import os
import subprocess
import tempfile

import numpy as np

__all__ = ["PagedEngine", "Batch"]

# Native source ships inside the package so `pip install` works; the .so is
# still built on demand and cached by source hash.
_CSRC = os.path.join(os.path.dirname(__file__), "..", "csrc")


def _build_library() -> str:
    src = os.path.abspath(os.path.join(_CSRC, "paged_runtime.cpp"))
    with open(src, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:16]
    out_dir = os.path.join(tempfile.gettempdir(), "fa_tpu_native")
    os.makedirs(out_dir, exist_ok=True)
    so = os.path.join(out_dir, f"paged_runtime_{tag}.so")
    if not os.path.exists(so):
        # Build to a unique temp path then rename: atomic against concurrent
        # first-use from multiple processes.
        tmp = f"{so}.{os.getpid()}.tmp"
        subprocess.run(
            ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", src, "-o", tmp],
            check=True, capture_output=True,
        )
        os.replace(tmp, so)
    return so


_lib = None


def _load():
    global _lib
    if _lib is None:
        _lib = ctypes.CDLL(_build_library())
        _lib.fa_engine_create.restype = ctypes.c_void_p
        _lib.fa_engine_create.argtypes = [ctypes.c_int32] * 4
        _lib.fa_engine_destroy.argtypes = [ctypes.c_void_p]
        _lib.fa_engine_add_request.restype = ctypes.c_int32
        _lib.fa_engine_add_request.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32]
        _lib.fa_engine_step.restype = ctypes.c_int32
        _lib.fa_engine_step.argtypes = [ctypes.c_void_p]
        _lib.fa_engine_commit_tokens.restype = ctypes.c_int32
        _lib.fa_engine_commit_tokens.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int32]
        _lib.fa_engine_batch_size.restype = ctypes.c_int32
        _lib.fa_engine_batch_size.argtypes = [ctypes.c_void_p]
        _lib.fa_engine_batch.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32]
        for name in ("fa_engine_free_pages", "fa_engine_waiting"):
            fn = getattr(_lib, name)
            fn.restype = ctypes.c_int32
            fn.argtypes = [ctypes.c_void_p]
        _lib.fa_engine_preempt_count.restype = ctypes.c_int64
        _lib.fa_engine_preempt_count.argtypes = [ctypes.c_void_p]
        _lib.fa_engine_finish.restype = ctypes.c_int32
        _lib.fa_engine_finish.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        _lib.fa_engine_grow_batch.restype = ctypes.c_int32
        _lib.fa_engine_grow_batch.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        _lib.fa_engine_commit_n.restype = ctypes.c_int32
        _lib.fa_engine_commit_n.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32]
        _lib.fa_engine_add_request_cached.restype = ctypes.c_int32
        _lib.fa_engine_add_request_cached.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint64), ctypes.c_int32]
        _lib.fa_engine_cached_pages.restype = ctypes.c_int32
        _lib.fa_engine_cached_pages.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        _lib.fa_engine_publish.restype = ctypes.c_int32
        _lib.fa_engine_publish.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        _lib.fa_engine_prefix_hits.restype = ctypes.c_int64
        _lib.fa_engine_prefix_hits.argtypes = [ctypes.c_void_p]
        _lib.fa_engine_lru_size.restype = ctypes.c_int32
        _lib.fa_engine_lru_size.argtypes = [ctypes.c_void_p]
    return _lib


@dataclasses.dataclass
class Batch:
    """One decode step's batch composition."""

    ids: np.ndarray          # (n,) int64 sequence ids
    lengths: np.ndarray      # (n,) int32 current total length per sequence
    page_tables: np.ndarray  # (n, max_pages_per_seq) int32, -1 padded


class PagedEngine:
    """Continuous-batching scheduler over a paged KV pool (native core)."""

    def __init__(self, num_pages: int, page_size: int, max_batch: int,
                 max_pages_per_seq: int | None = None):
        self._lib = _load()
        self.max_pages_per_seq = max_pages_per_seq or num_pages
        self._h = ctypes.c_void_p(
            self._lib.fa_engine_create(num_pages, page_size, max_batch,
                                       self.max_pages_per_seq))
        self.num_pages = num_pages
        self.page_size = page_size
        self.max_batch = max_batch

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.fa_engine_destroy(self._h)
            self._h = None

    def add_request(self, seq_id: int, prompt_len: int, max_new_tokens: int):
        rc = self._lib.fa_engine_add_request(self._h, seq_id, prompt_len,
                                             max_new_tokens)
        if rc != 0:
            raise ValueError(
                f"request {seq_id} rejected: duplicate id, or "
                f"{prompt_len}+{max_new_tokens} tokens cannot fit the pool / "
                f"the {self.max_pages_per_seq}-page per-sequence table / "
                f"the admission watermark")

    def step(self) -> Batch:
        """Admit + allocate for one decode step; returns the running batch."""
        n = self._lib.fa_engine_step(self._h)
        if n < 0:
            raise RuntimeError("scheduler deadlock: a sequence cannot grow")
        ids = np.zeros(n, np.int64)
        lens = np.zeros(n, np.int32)
        pages = np.zeros((n, self.max_pages_per_seq), np.int32)
        if n:
            self._lib.fa_engine_batch(
                self._h,
                ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                pages.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                self.max_pages_per_seq)
        return Batch(ids, lens, pages)

    def finish(self, seq_id: int):
        """Finish a sequence early (stop token / client cancel), freeing its
        pages immediately. The caller must not touch its KV afterwards."""
        if self._lib.fa_engine_finish(self._h, seq_id) != 0:
            raise KeyError(f"unknown sequence {seq_id}")

    def commit(self) -> list[int]:
        """Record one generated token per running sequence; returns finished ids."""
        cap = self.max_batch
        buf = (ctypes.c_int64 * cap)()
        n = self._lib.fa_engine_commit_tokens(self._h, buf, cap)
        return [buf[i] for i in range(min(n, cap))]

    def add_request_cached(self, seq_id: int, prompt_len: int,
                           max_new_tokens: int, hashes):
        """add_request with chained full-prompt-page content hashes: the
        engine claims the longest published prefix at admission (see
        ``cached_pages``); after prefilling the remainder, call
        ``publish``."""
        n = len(hashes)
        arr = (ctypes.c_uint64 * max(n, 1))(*[h & (2**64 - 1) for h in hashes])
        rc = self._lib.fa_engine_add_request_cached(
            self._h, seq_id, prompt_len, max_new_tokens, arr, n)
        if rc != 0:
            raise ValueError(f"request {seq_id} rejected")

    def cached_pages(self, seq_id: int) -> int:
        """Leading prompt pages served from the prefix cache at admission."""
        n = self._lib.fa_engine_cached_pages(self._h, seq_id)
        if n < 0:
            raise KeyError(f"unknown sequence {seq_id}")
        return n

    def publish(self, seq_id: int):
        """Publish a freshly prefilled sequence's full prompt pages into the
        prefix cache (call once, after the pages hold final content)."""
        if self._lib.fa_engine_publish(self._h, seq_id) != 0:
            raise KeyError(f"unknown sequence {seq_id}")

    @property
    def prefix_hits(self) -> int:
        return self._lib.fa_engine_prefix_hits(self._h)

    @property
    def lru_pages(self) -> int:
        """Retired cached pages awaiting reuse/eviction (accounting)."""
        return self._lib.fa_engine_lru_size(self._h)

    def grow_batch(self, n: int) -> bool:
        """Reserve slots for n MORE tokens per running sequence (speculative
        draft headroom). All-or-nothing and never preempts: False means the
        pool can't cover it and the caller should decode one token instead."""
        return self._lib.fa_engine_grow_batch(self._h, n) == 0

    def commit_n(self, seq_id: int, n: int) -> bool:
        """Commit n accepted tokens for one sequence; True if it finished
        (budget reached, pages freed)."""
        rc = self._lib.fa_engine_commit_n(self._h, seq_id, n)
        if rc < 0:
            raise KeyError(f"unknown/idle sequence {seq_id}")
        return rc == 1

    @property
    def running(self) -> int:
        """Number of sequences in the current batch."""
        return self._lib.fa_engine_batch_size(self._h)

    @property
    def free_pages(self) -> int:
        return self._lib.fa_engine_free_pages(self._h)

    @property
    def waiting(self) -> int:
        return self._lib.fa_engine_waiting(self._h)

    @property
    def preempt_count(self) -> int:
        return self._lib.fa_engine_preempt_count(self._h)
