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
import hashlib
import math
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.decode import (
    PagedKVCache, decode_loop, decode_step, greedy_token, init_cache, prefill,
    prefill_chunked, sample_token, spec_accept_sample, verify_step,
)
from ..models.llama import LlamaConfig
from .runtime import PagedEngine

__all__ = ["GenerationServer"]


def _prompt_lookup_draft(ctx: list[int], k: int, ngram: int = 2) -> list[int]:
    """Draft up to k tokens by continuing the latest earlier occurrence of
    the context's final ``ngram`` — prompt-lookup decoding (no draft model).
    Strong on contexts with self-repetition (summaries, code, extraction);
    returns [] when the n-gram never occurred before, which costs nothing
    (the verify step then just decodes one token)."""
    if len(ctx) <= ngram:
        return []
    key = ctx[-ngram:]
    for i in range(len(ctx) - ngram - 1, -1, -1):
        if ctx[i:i + ngram] == key:
            return list(ctx[i + ngram:i + ngram + k])
    return []


def _page_hashes(prompt: list[int], page_size: int) -> list[int]:
    """Chained 64-bit content hashes of the prompt's FULL pages.

    Hash i covers tokens [0, (i+1) * page_size) (each digest feeds the
    next), so a single per-page map hit implies the whole prefix matches —
    the prefix-cache key scheme of ``fa_engine_add_request_cached``.
    """
    out: list[int] = []
    digest = b""
    for i in range(len(prompt) // page_size):
        blk = np.asarray(prompt[i * page_size:(i + 1) * page_size],
                         np.int64).tobytes()
        digest = hashlib.blake2b(digest + blk, digest_size=8).digest()
        out.append(int.from_bytes(digest, "little"))
    return out


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
    max_new: int = 0
    prefilled: bool = False
    stop: frozenset = frozenset()
    adapter: int = -1  # LoRA adapter id (-1 = base model)
    # Latency bookkeeping (wall clock): submit -> first token -> finished.
    submit_t: float = 0.0
    first_t: float = 0.0
    done_t: float = 0.0


class GenerationServer:
    """Greedy continuous-batching generation over a paged KV cache.

    ``num_pages`` is the total pool; one page is reserved as the scratch
    target for decode-batch padding rows, the rest belong to the scheduler.
    """

    def __init__(self, params, cfg: LlamaConfig, *, num_pages: int,
                 page_size: int, max_batch: int,
                 pages_per_seq: Optional[int] = None, mode: str = "dense",
                 temperature: float = 0.0, top_k: int = 0, seed: int = 0,
                 chunk: int = 1, attn_int8: bool = False, mesh=None,
                 prefill_chunk_tokens: int = 0, spec_k: int = 0,
                 prefix_cache: bool = False, lora=None,
                 interpret: Optional[bool] = None):
        self.cfg = cfg
        self.mode = mode
        if attn_int8 and mode != "int8":
            raise ValueError(
                f"attn_int8 requires an int8 KV cache; mode={mode!r}")
        self.attn_int8 = attn_int8
        self.mesh = mesh
        if mesh is not None:
            # Tensor-parallel serving: megatron param split + KV pools
            # sharded over kv-heads, matching prefill/decode_step(mesh=...).
            from ..parallel.mesh import DATA_AXIS, MODEL_AXIS, shard_params

            tp = mesh.shape.get(MODEL_AXIS, 1)
            if cfg.n_kv_heads % tp:
                raise ValueError(
                    f"tensor-parallel serving shards KV heads over "
                    f"{MODEL_AXIS}={tp}, but n_kv_heads={cfg.n_kv_heads} "
                    f"is not divisible")
            if mesh.shape.get(DATA_AXIS, 1) > 1:
                # Prefill runs one (batch=1) prompt at a time — a dp axis
                # would ask shard_map to split that batch and crash deep in
                # jit; fail here with the reason instead.
                raise ValueError(
                    f"serving mesh must have {DATA_AXIS}=1 (prefill is "
                    f"single-prompt); got {mesh.shape}")
            params = shard_params(params, mesh)
        self.params = params
        self.interpret = interpret
        self.pages_per_seq = pages_per_seq or (num_pages - 1)
        self.engine = PagedEngine(num_pages - 1, page_size, max_batch,
                                  max_pages_per_seq=self.pages_per_seq)
        self.scratch_page = num_pages - 1  # never handed out by the engine
        self.max_batch = max_batch
        self.page_size = page_size
        self.cache = init_cache(cfg, num_pages, page_size, mode)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.mesh import MODEL_AXIS

            pool = NamedSharding(mesh, P(MODEL_AXIS, None, None, None))
            sc = NamedSharding(mesh, P(MODEL_AXIS, None))
            self.cache = dataclasses.replace(
                self.cache,
                k_pages=[jax.device_put(x, pool) for x in self.cache.k_pages],
                v_pages=[jax.device_put(x, pool) for x in self.cache.v_pages],
                k_scales=[jax.device_put(x, sc) for x in self.cache.k_scales],
                v_scales=[jax.device_put(x, sc) for x in self.cache.v_scales],
            )
        self.seqs: dict[int, _SeqState] = {}
        self.steps = 0
        self.decode_tokens = 0
        self.temperature = temperature
        self.top_k = top_k
        if not 1 <= chunk <= page_size:
            # Padding rows park their chunk KV in the single scratch page,
            # so a chunk may not outgrow it.
            raise ValueError(f"chunk must be in [1, page_size]; got {chunk}")
        self.chunk = chunk
        if prefill_chunk_tokens and (prefill_chunk_tokens % 128
                                     or prefill_chunk_tokens % page_size):
            raise ValueError(
                f"prefill_chunk_tokens ({prefill_chunk_tokens}) must be a "
                f"multiple of 128 and of page_size ({page_size})")
        if prefill_chunk_tokens and mesh is not None:
            raise ValueError("prefill_chunk_tokens + mesh not supported yet "
                             "(chunked prefill is single-chip)")
        self.prefill_chunk_tokens = prefill_chunk_tokens
        if spec_k:
            if chunk > 1:
                raise ValueError("spec_k and chunk>1 are exclusive decode "
                                 "strategies")
            if not 1 <= spec_k + 1 <= page_size:
                # Padding rows park their t = spec_k + 1 tokens in the
                # single scratch page.
                raise ValueError(
                    f"spec_k must be in [1, page_size - 1]; got {spec_k}")
        self.spec_k = spec_k
        self.spec_proposed = 0  # drafted tokens offered to the verifier
        self.spec_accepted = 0  # drafted tokens accepted
        if prefix_cache and mesh is not None:
            raise ValueError("prefix_cache + mesh not supported yet "
                             "(suffix prefill is single-chip chunked)")
        self.prefix_cache = prefix_cache
        if lora is not None and (spec_k or prefill_chunk_tokens
                                 or prefix_cache or mesh is not None):
            # prefix_cache in particular routes prefill through
            # prefill_chunked, which takes no adapters — the prompt KV
            # would come from the base model (and get published as shared
            # pages), silently mismatching the adapter's decode.
            raise ValueError("multi-LoRA serving supports stepwise and "
                             "chunked decode only (no spec_k/"
                             "chunked-prefill/prefix_cache/mesh)")
        self.lora = lora
        self.n_adapters = (
            0 if lora is None else lora["layers"][0]["wq"][0].shape[0])
        # Suffix prefill runs in chunks aligned to BOTH the flash block and
        # the page size, so cached page boundaries are chunk boundaries.
        self._pc_chunk = (prefill_chunk_tokens
                          or math.lcm(128, page_size))
        self._key = jax.random.PRNGKey(seed)
        self._stopped: list[int] = []

    def submit(self, seq_id: int, prompt: list[int], max_new_tokens: int,
               stop=(), adapter: int = -1):
        """``stop``: token ids that end the sequence early (kept in the
        generation, the standard EOS convention). ``adapter``: LoRA adapter
        id for this request (-1 = base model; requires ``lora=`` at server
        construction)."""
        if adapter >= 0 and self.lora is None:
            raise ValueError("server built without lora adapters")
        if self.lora is not None and adapter >= self.n_adapters:
            # The jitted gather clamps out-of-range ids to the LAST adapter
            # — a typo would silently serve another tenant's fine-tune.
            raise ValueError(
                f"adapter {adapter} out of range (n={self.n_adapters})")
        if self.prefix_cache:
            self.engine.add_request_cached(
                seq_id, len(prompt), max_new_tokens,
                _page_hashes(prompt, self.page_size))
        else:
            self.engine.add_request(seq_id, len(prompt), max_new_tokens)
        self.seqs[seq_id] = _SeqState(prompt=list(prompt), generated=[],
                                      max_new=max_new_tokens,
                                      stop=frozenset(stop), adapter=adapter,
                                      submit_t=time.perf_counter())

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
        self._stopped = []

        # Prefill newly admitted sequences — and preempted ones the scheduler
        # readmitted (recompute preemption resets them to length == prompt;
        # greedy decoding regenerates the same tokens deterministically).
        # First tokens of all prefills come back in ONE host readback at the
        # end — a per-prefill int(pick(...)) pays a full tunnel fence each.
        decode_rows, pending = [], []
        for row, sid in enumerate(batch.ids.tolist()):
            st = self.seqs[sid]
            if st.prefilled and batch.lengths[row] == len(st.prompt):
                st.prefilled = False  # was preempted: cache pages are gone
                st.generated = []
            if not st.prefilled:
                padded = _pad_to_multiple(st.prompt)
                if self.prefix_cache:
                    # Skip fully cached chunks; their pages hold the K/V
                    # already (written by the sequence that published them).
                    chunk = self._pc_chunk
                    start = min(
                        self.engine.cached_pages(sid) * self.page_size,
                        (len(st.prompt) - 1) // chunk * chunk)
                    start -= start % chunk
                    logits, self.cache = prefill_chunked(
                        self.params, jnp.asarray(padded)[None, :], self.cfg,
                        self.cache, jnp.asarray(batch.page_tables[row]),
                        prompt_len=len(st.prompt), chunk_tokens=chunk,
                        start_tokens=start, interpret=self.interpret,
                    )
                    self.engine.publish(sid)
                elif self.prefill_chunk_tokens:
                    logits, self.cache = prefill_chunked(
                        self.params, jnp.asarray(padded)[None, :], self.cfg,
                        self.cache, jnp.asarray(batch.page_tables[row]),
                        prompt_len=len(st.prompt),
                        chunk_tokens=self.prefill_chunk_tokens,
                        interpret=self.interpret,
                    )
                else:
                    logits, self.cache = prefill(
                        self.params, jnp.asarray(padded)[None, :], self.cfg,
                        self.cache, jnp.asarray(batch.page_tables[row]),
                        prompt_len=len(st.prompt), interpret=self.interpret,
                        mesh=self.mesh, lora=self.lora,
                        adapter_ids=jnp.asarray([st.adapter], jnp.int32)
                        if self.lora is not None else None,
                    )
                pending.append((sid, self._pick(logits, sid)))
                st.prefilled = True
            else:
                decode_rows.append(row)
        if pending:
            toks = np.asarray(jnp.stack([t for _, t in pending]))
            for (sid, _), tok in zip(pending, toks):
                self._append(sid, int(tok))

        if decode_rows:
            if (self.spec_k > 0 and self.engine.waiting == 0
                    and len(decode_rows) == len(batch.ids)
                    and self.engine.grow_batch(self.spec_k)):
                return self._decode_speculative(batch, decode_rows)
            n = self._chunk_len(batch, decode_rows)
            if n > 1:
                batch = self._advance_chunk(batch, n)
                self._decode_chunk(batch, decode_rows, n)
            else:
                self._decode_one(batch, decode_rows)

        return self._finish_stamp(self._stopped + self.engine.commit())

    def _finish_stamp(self, sids: list[int]) -> list[int]:
        now = time.perf_counter()
        for sid in sids:
            self.seqs[sid].done_t = now
        return sids

    def _append(self, sid: int, tok: int) -> bool:
        """Record one generated token; finish the sequence on a stop token.

        Returns True when the sequence just stopped — its engine pages are
        freed immediately, so callers must not write further tokens or KV
        for it this step.
        """
        st = self.seqs[sid]
        st.generated.append(tok)
        if len(st.generated) == 1:
            st.first_t = time.perf_counter()
        if tok in st.stop:
            self.engine.finish(sid)
            self._stopped.append(sid)
            return True
        return False

    def _chunk_len(self, batch, decode_rows) -> int:
        """Tokens to decode this step without the batch changing under us.

        Chunking is only sound while the scheduler's batch is provably
        stable: nothing waiting to be admitted, every row already past
        prefill, nobody reaching its token budget mid-chunk, and enough
        free pages that growth cannot trigger preemption.
        """
        if (self.chunk <= 1 or self.engine.waiting > 0
                or len(decode_rows) != len(batch.ids)):
            return 1
        n = min([self.chunk] + [
            self.seqs[int(batch.ids[r])].max_new
            - len(self.seqs[int(batch.ids[r])].generated)
            for r in decode_rows])
        if n <= 1:
            return 1
        # Bound jit specializations of decode_loop (static steps): round the
        # chunk down to a power of two so tail chunks near budget ends reuse
        # {2, 4, 8, ...} executables instead of compiling every n.
        n = 1 << (n.bit_length() - 1)
        if n <= 1:
            return 1
        ps = self.page_size
        # Pages the remaining n-1 scheduler steps will allocate: step() has
        # already pre-allocated through batch.lengths + 1 (one token of
        # lookahead), so the advance steps extend coverage from lengths + 1
        # to lengths + n.
        crossings = sum(
            -(-(int(batch.lengths[r]) + n) // ps)
            - -(-(int(batch.lengths[r]) + 1) // ps)
            for r in decode_rows)
        return n if crossings <= self.engine.free_pages else 1

    def _advance_chunk(self, batch, n: int):
        """Run the scheduler forward n-1 tokens; returns the final batch.

        The final batch's page tables cover every slot the chunk writes.
        Mid-chunk commits cannot finish a sequence (``_chunk_len`` capped n
        at the smallest remaining budget) and membership cannot change
        (nothing waiting, no preemption possible), which the asserts pin.
        """
        ids0 = batch.ids.copy()
        for _ in range(n - 1):
            finished = self.engine.commit()
            assert not finished, "sequence finished mid-chunk"
            batch = self.engine.step()
            assert np.array_equal(batch.ids, ids0), "batch changed mid-chunk"
        self.steps += n - 1
        return batch

    def _gather_batch(self, batch, decode_rows, pad_length: int,
                      length_offset: int = 0):
        """Row-gather the decode batch and pad it to the static max_batch.

        Padding rows decode against the reserved scratch page starting at
        ``pad_length`` (1 = the single-token path's length-1 dummy; 0 = the
        chunked path, whose pads grow through the chunk but stay inside the
        scratch page because chunk <= page_size).
        """
        rows = np.asarray(decode_rows)
        tokens = np.array(
            [self.seqs[batch.ids[r]].generated[-1] for r in decode_rows],
            np.int32)
        lengths = batch.lengths[rows] + length_offset
        tables = batch.page_tables[rows]
        pad = self.max_batch - len(rows)
        if pad:
            tokens = np.concatenate([tokens, np.zeros(pad, np.int32)])
            lengths = np.concatenate(
                [lengths, np.full(pad, pad_length, np.int32)])
            pad_tables = np.full((pad, tables.shape[1]), -1, np.int32)
            pad_tables[:, 0] = self.scratch_page
            tables = np.concatenate([tables, pad_tables], axis=0)
        return tokens, lengths, tables, pad

    def _decode_speculative(self, batch, decode_rows) -> list[int]:
        """One verify_step scoring spec_k drafted tokens per sequence.

        Prompt-lookup drafting (no draft model): the continuation after the
        most recent earlier occurrence of the context's final bigram is
        proposed, verified in ONE multi-token forward pass, and accepted
        greedily until the first token where the model disagrees — which
        contributes the correction; a fully-accepted draft gets a bonus
        token from the last position. Every step commits >= 1 token, so
        this is never slower in steps than plain decoding. grow_batch
        already reserved the k extra slots (all-or-nothing, no preemption).
        """
        k = self.spec_k
        t = k + 1
        rows = decode_rows
        sids = [int(batch.ids[r]) for r in rows]
        drafts = []
        inputs = np.zeros((self.max_batch, t), np.int32)
        for i, sid in enumerate(sids):
            st = self.seqs[sid]
            ctx = st.prompt + st.generated
            d = _prompt_lookup_draft(ctx, k)
            drafts.append(d)
            inputs[i, 0] = ctx[-1]
            inputs[i, 1:1 + len(d)] = d
        _, lengths, tables, _ = self._gather_batch(batch, rows, pad_length=1)
        lengths = lengths + k  # the t inputs end at position lengths0 + k - 1

        logits, self.cache = verify_step(
            self.params, jnp.asarray(inputs), self.cfg, self.cache,
            jnp.asarray(lengths), jnp.asarray(tables),
            interpret=self.interpret, attn_int8=self.attn_int8,
            mesh=self.mesh,
        )
        # Acceptance fully in-graph (delta-proposal speculative sampling at
        # temperature > 0 — exactly the target distribution; greedy at 0),
        # then ONE host readback for the whole batch.
        draft_lens = np.zeros(self.max_batch, np.int32)
        for i, d in enumerate(drafts):
            draft_lens[i] = len(d)
        if self.temperature > 0.0:
            keys = jnp.stack([
                jax.random.fold_in(
                    jax.random.fold_in(self._key, sid),
                    len(self.seqs[sid].generated))
                for sid in sids] + [self._key] * (self.max_batch - len(sids)))
        else:
            # Greedy acceptance never reads the keys: skip 2*batch fold_in
            # dispatches on the hot path.
            keys = jnp.broadcast_to(self._key, (self.max_batch,
                                                *self._key.shape))
        toks_d, n_emit_d = spec_accept_sample(
            logits, jnp.asarray(inputs[:, 1:]), jnp.asarray(draft_lens),
            keys, temperature=self.temperature, top_k=self.top_k)
        toks_np = np.asarray(toks_d)
        n_emit = np.asarray(n_emit_d)

        finished: list[int] = []
        for i, sid in enumerate(sids):
            st = self.seqs[sid]
            draft = drafts[i]
            out_toks = [int(x) for x in toks_np[i, :n_emit[i]]]
            self.spec_proposed += len(draft)
            self.spec_accepted += len(out_toks) - 1
            remaining = st.max_new - len(st.generated)
            out_toks = out_toks[:remaining]
            n_commit = 0
            stopped = False
            for tok in out_toks:
                n_commit += 1
                self.decode_tokens += 1
                if self._append(sid, tok):
                    stopped = True  # _append recorded it in self._stopped
                    break
            if not stopped and self.engine.commit_n(sid, n_commit):
                finished.append(sid)  # budget reached
        return self._finish_stamp(self._stopped + finished)

    def _decode_chunk(self, batch, decode_rows, n: int):
        """One ``decode_loop`` call generating n tokens for every row."""
        # decode_loop takes the *committed* length; the scheduler has
        # already allocated all n new slots, so batch.lengths is +n.
        tokens, lengths, tables, pad = self._gather_batch(
            batch, decode_rows, pad_length=0, length_offset=-n)
        row_keys = pos0 = None
        if self.temperature > 0.0:
            sids = [int(batch.ids[r]) for r in decode_rows] + [0] * pad
            row_keys = jnp.stack(
                [jax.random.fold_in(self._key, s) for s in sids])
            pos0 = jnp.asarray(
                [len(self.seqs[s].generated) if i < len(decode_rows) else 0
                 for i, s in enumerate(sids)], jnp.int32)
        adapter_ids = None
        if self.lora is not None:
            ids = [self.seqs[int(batch.ids[r])].adapter
                   for r in decode_rows] + [-1] * pad
            adapter_ids = jnp.asarray(ids, jnp.int32)
        out, self.cache, _ = decode_loop(
            self.params, jnp.asarray(tokens), self.cfg, self.cache,
            jnp.asarray(lengths), jnp.asarray(tables), n,
            row_keys=row_keys, pos0=pos0, temperature=self.temperature,
            top_k=self.top_k, interpret=self.interpret,
            attn_int8=self.attn_int8, mesh=self.mesh,
            lora=self.lora, adapter_ids=adapter_ids,
        )
        out = np.asarray(out)
        for i, r in enumerate(decode_rows):
            sid = int(batch.ids[r])
            for t in out[i]:
                self.decode_tokens += 1
                if self._append(sid, int(t)):
                    break  # tokens past the stop are discarded

    def _decode_one(self, batch, decode_rows):
        """Single-token decode with host-side sampling (the n == 1 path)."""
        tokens, lengths, tables, pad = self._gather_batch(
            batch, decode_rows, pad_length=1)
        adapter_ids = None
        if self.lora is not None:
            ids = [self.seqs[int(batch.ids[r])].adapter
                   for r in decode_rows] + [-1] * pad
            adapter_ids = jnp.asarray(ids, jnp.int32)
        logits, self.cache = decode_step(
            self.params, jnp.asarray(tokens), self.cfg, self.cache,
            jnp.asarray(lengths), jnp.asarray(tables),
            interpret=self.interpret, attn_int8=self.attn_int8,
            mesh=self.mesh, lora=self.lora, adapter_ids=adapter_ids,
        )
        # One device->host readback for the whole batch: a per-row
        # int(pick(...)) costs a full tunnel fence per TOKEN (~200 ms/step
        # at max_batch 16 measured through the axon relay).
        sids = [int(batch.ids[r]) for r in decode_rows]
        if self.temperature <= 0.0:
            toks = np.asarray(greedy_token(logits[:len(sids)]))
        else:
            keys = jnp.stack([
                jax.random.fold_in(
                    jax.random.fold_in(self._key, sid),
                    len(self.seqs[sid].generated))
                for sid in sids])
            toks = np.asarray(jax.vmap(
                lambda lg, k: sample_token(lg, k, self.temperature, self.top_k)
            )(logits[:len(sids)], keys))
        for i, sid in enumerate(sids):
            self._append(sid, int(toks[i]))
        self.decode_tokens += len(decode_rows)

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

    def stats(self) -> dict:
        """Serving counters: one dict for dashboards/benchmark reports."""
        return {
            "steps": self.steps,
            "decode_tokens": self.decode_tokens,
            "running": self.engine.running,
            "waiting": self.engine.waiting,
            "free_pages": self.engine.free_pages,
            "preemptions": int(self.engine.preempt_count),
            "spec_proposed": self.spec_proposed,
            "spec_accepted": self.spec_accepted,
            "spec_acceptance_rate": (
                self.spec_accepted / self.spec_proposed
                if self.spec_proposed else 0.0),
            "prefix_hit_pages": (int(self.engine.prefix_hits)
                                 if self.prefix_cache else 0),
        }
