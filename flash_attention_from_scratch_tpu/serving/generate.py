"""Continuous-batching generation: native scheduler + paged decode kernels.

The serving loop the reference never had (its scope ends at a single prefill
kernel): requests enter the native page allocator / scheduler
(``csrc/paged_runtime.cpp`` via ``serving.runtime.PagedEngine``); each step
admits what fits, prefills newly admitted prompts through the flash kernel,
and advances every running sequence one token through the paged decode
kernel. The decode batch is padded to a fixed ``max_batch`` so one jitted
``decode_step`` specialization serves the whole run (padding rows write
their KV to a reserved scratch page).

Token bookkeeping matches the scheduler's accounting: after ``step()`` a
sequence's ``total_len`` counts its prompt plus committed tokens; the token
generated this step writes KV at position ``total_len - 1`` — the slot
``step()`` just allocated.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.decode import (
    PagedKVCache, decode_step, greedy_token, init_cache, prefill, sample_token,
)
from ..models.llama import LlamaConfig
from .runtime import PagedEngine

__all__ = ["GenerationServer"]


def _pad_to_multiple(tokens: list[int], quantum: int = 128) -> np.ndarray:
    n = len(tokens)
    padded = n + (-n) % quantum
    out = np.zeros(padded, np.int32)
    out[:n] = tokens
    return out


@dataclasses.dataclass
class _SeqState:
    prompt: list[int]
    generated: list[int]
    prefilled: bool = False


class GenerationServer:
    """Greedy continuous-batching generation over a paged KV cache.

    ``num_pages`` is the total pool; one page is reserved as the scratch
    target for decode-batch padding rows, the rest belong to the scheduler.
    """

    def __init__(self, params, cfg: LlamaConfig, *, num_pages: int,
                 page_size: int, max_batch: int,
                 pages_per_seq: Optional[int] = None, mode: str = "dense",
                 temperature: float = 0.0, top_k: int = 0, seed: int = 0,
                 interpret: Optional[bool] = None):
        self.params = params
        self.cfg = cfg
        self.mode = mode
        self.interpret = interpret
        self.pages_per_seq = pages_per_seq or (num_pages - 1)
        self.engine = PagedEngine(num_pages - 1, page_size, max_batch,
                                  max_pages_per_seq=self.pages_per_seq)
        self.scratch_page = num_pages - 1  # never handed out by the engine
        self.max_batch = max_batch
        self.cache = init_cache(cfg, num_pages, page_size, mode)
        self.seqs: dict[int, _SeqState] = {}
        self.steps = 0
        self.decode_tokens = 0
        self.temperature = temperature
        self.top_k = top_k
        self._key = jax.random.PRNGKey(seed)

    def submit(self, seq_id: int, prompt: list[int], max_new_tokens: int):
        self.engine.add_request(seq_id, len(prompt), max_new_tokens)
        self.seqs[seq_id] = _SeqState(prompt=list(prompt), generated=[])

    def _pick(self, logits, sid: int):
        """Next-token choice: greedy at temperature 0, sampled otherwise.

        The sampling key is derived from (seq_id, position), not a global
        advancing stream, so recompute preemption replays the *same*
        trajectory when a sequence is restarted.
        """
        if self.temperature <= 0.0:
            return greedy_token(logits)
        pos = len(self.seqs[sid].generated)
        sub = jax.random.fold_in(jax.random.fold_in(self._key, sid), pos)
        return sample_token(logits, sub, self.temperature, self.top_k)

    @property
    def has_work(self) -> bool:
        return self.engine.waiting > 0 or self.engine.running > 0

    def step(self) -> list[int]:
        """One scheduler + model step; returns sequence ids finished now."""
        batch = self.engine.step()
        if len(batch.ids) == 0:
            return []
        self.steps += 1

        # Prefill newly admitted sequences — and preempted ones the scheduler
        # readmitted (recompute preemption resets them to length == prompt;
        # greedy decoding regenerates the same tokens deterministically).
        decode_rows = []
        for row, sid in enumerate(batch.ids.tolist()):
            st = self.seqs[sid]
            if st.prefilled and batch.lengths[row] == len(st.prompt):
                st.prefilled = False  # was preempted: cache pages are gone
                st.generated = []
            if not st.prefilled:
                padded = _pad_to_multiple(st.prompt)
                logits, self.cache = prefill(
                    self.params, jnp.asarray(padded)[None, :], self.cfg,
                    self.cache, jnp.asarray(batch.page_tables[row]),
                    prompt_len=len(st.prompt), interpret=self.interpret,
                )
                st.generated.append(int(self._pick(logits, sid)))
                st.prefilled = True
            else:
                decode_rows.append(row)

        if decode_rows:
            rows = np.asarray(decode_rows)
            tokens = np.array(
                [self.seqs[batch.ids[r]].generated[-1] for r in decode_rows],
                np.int32)
            lengths = batch.lengths[rows]
            tables = batch.page_tables[rows]
            # Pad to the static max_batch: padding rows decode a length-1
            # sequence whose single KV slot is the reserved scratch page.
            pad = self.max_batch - len(rows)
            if pad:
                tokens = np.concatenate([tokens, np.zeros(pad, np.int32)])
                lengths = np.concatenate([lengths, np.ones(pad, np.int32)])
                pad_tables = np.full((pad, tables.shape[1]), -1, np.int32)
                pad_tables[:, 0] = self.scratch_page
                tables = np.concatenate([tables, pad_tables], axis=0)
            logits, self.cache = decode_step(
                self.params, jnp.asarray(tokens), self.cfg, self.cache,
                jnp.asarray(lengths), jnp.asarray(tables),
                interpret=self.interpret,
            )
            for i, r in enumerate(decode_rows):
                sid = int(batch.ids[r])
                tok = int(self._pick(logits[i], sid))
                self.seqs[sid].generated.append(tok)
            self.decode_tokens += len(decode_rows)

        return self.engine.commit()

    def run(self, max_steps: int = 10_000) -> dict[int, list[int]]:
        """Drive until every submitted request finishes; returns generations."""
        for _ in range(max_steps):
            if not self.has_work:
                break
            self.step()
        else:
            raise RuntimeError(f"did not drain within {max_steps} steps")
        return {sid: st.generated for sid, st in self.seqs.items()}

    def throughput(self) -> float:
        """Decode tokens per wall-second for the run this call performs."""
        start_tokens = self.decode_tokens
        t0 = time.perf_counter()
        self.run()
        dt = time.perf_counter() - t0
        return (self.decode_tokens - start_tokens) / dt if dt > 0 else 0.0
