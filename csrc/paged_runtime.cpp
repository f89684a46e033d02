// Paged KV-cache allocator + continuous-batching scheduler.
//
// Native host-side runtime for the serving path (the reference's native
// layer is its C++ host dispatch, src/flash_attention.cu:34-150; here the
// TPU-native equivalent of "host code that must not be slow Python" is the
// per-step serving bookkeeping: page allocation and batch admission run
// every decode step for thousands of sequences).
//
// Exposed as a C ABI for ctypes (no pybind11 in this image). All functions
// are thread-compatible (caller serializes; the Python side holds the GIL).
//
// Model: the KV cache is a pool of fixed-size pages (page_size tokens each).
// Each sequence owns an ordered list of pages. The scheduler admits requests
// from a FIFO queue into the running batch whenever the pool can hold their
// prompt plus a reservation watermark, and preempts the *youngest* running
// sequence on exhaustion (preempted sequences re-enter the queue head and
// will re-prefill — vLLM-style recompute preemption).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <deque>
#include <unordered_map>
#include <vector>

namespace {

struct Sequence {
  int64_t id;
  int32_t prompt_len;
  int32_t max_new_tokens;
  int32_t generated;        // tokens generated so far
  std::vector<int32_t> pages;
  bool running;

  int32_t total_len() const { return prompt_len + generated; }
};

struct Engine {
  int32_t num_pages;
  int32_t page_size;
  int32_t max_batch;
  int32_t max_pages_per_seq;
  std::vector<int32_t> free_pages;          // LIFO free list
  std::unordered_map<int64_t, Sequence> seqs;
  std::deque<int64_t> waiting;              // FIFO of queued sequence ids
  std::vector<int64_t> running;             // current batch, stable order
  // step() output staging
  std::vector<int64_t> out_ids;
  std::vector<int32_t> out_page_tables;     // running.size() x max_pages_per_seq
  int64_t preempt_count = 0;

  int32_t pages_needed(int32_t tokens) const {
    return (tokens + page_size - 1) / page_size;
  }

  bool grow_to(Sequence& s, int32_t tokens) {
    int32_t need = pages_needed(tokens);
    while ((int32_t)s.pages.size() < need) {
      if (free_pages.empty()) return false;
      s.pages.push_back(free_pages.back());
      free_pages.pop_back();
    }
    return true;
  }

  void release(Sequence& s) {
    for (int32_t p : s.pages) free_pages.push_back(p);
    s.pages.clear();
  }

  void preempt_youngest() {
    if (running.empty()) return;
    int64_t victim = running.back();
    running.pop_back();
    auto& s = seqs[victim];
    release(s);
    s.generated = 0;  // recompute preemption: prompt will re-prefill
    s.running = false;
    waiting.push_front(victim);
    preempt_count++;
  }
};

}  // namespace

extern "C" {

// Create an engine managing `num_pages` KV pages of `page_size` tokens,
// batching at most `max_batch` sequences of at most `max_pages_per_seq`
// pages each (<=0 means unlimited).
void* fa_engine_create(int32_t num_pages, int32_t page_size, int32_t max_batch,
                       int32_t max_pages_per_seq) {
  auto* e = new Engine();
  e->num_pages = num_pages;
  e->page_size = page_size;
  e->max_batch = max_batch;
  e->max_pages_per_seq =
      max_pages_per_seq > 0 ? max_pages_per_seq : num_pages;
  e->free_pages.reserve(num_pages);
  for (int32_t i = num_pages - 1; i >= 0; --i) e->free_pages.push_back(i);
  return e;
}

void fa_engine_destroy(void* h) { delete static_cast<Engine*>(h); }

// Enqueue a request. Returns 0 on success, -1 if the id already exists or
// the prompt can never fit in the pool.
int32_t fa_engine_add_request(void* h, int64_t id, int32_t prompt_len,
                              int32_t max_new_tokens) {
  auto* e = static_cast<Engine*>(h);
  if (e->seqs.count(id)) return -1;
  int32_t worst = e->pages_needed(prompt_len + max_new_tokens);
  if (worst > e->num_pages) return -1;
  // The sequence's page list must fit the fixed-width page table the client
  // reads back — growing past it would silently truncate KV addressing.
  if (worst > e->max_pages_per_seq) return -1;
  // Admission (fa_engine_step) requires pages for prompt+1 tokens plus a
  // one-page watermark; a request that can never satisfy that would sit at
  // the FIFO head forever and livelock the queue.
  if (e->pages_needed(prompt_len + 1) + 1 > e->num_pages) return -1;
  Sequence s;
  s.id = id;
  s.prompt_len = prompt_len;
  s.max_new_tokens = max_new_tokens;
  s.generated = 0;
  s.running = false;
  e->seqs.emplace(id, std::move(s));
  e->waiting.push_back(id);
  return 0;
}

// One scheduling step: admit waiting sequences while capacity allows, then
// allocate pages for one new token per running sequence (preempting the
// youngest on exhaustion). Returns the number of running sequences.
// After step(), fetch the batch with fa_engine_batch().
int32_t fa_engine_step(void* h) {
  auto* e = static_cast<Engine*>(h);

  // Admission: a waiting sequence is admitted if its full prompt plus one
  // page of headroom fits right now.
  while (!e->waiting.empty() && (int32_t)e->running.size() < e->max_batch) {
    int64_t id = e->waiting.front();
    auto& s = e->seqs[id];
    int32_t need = e->pages_needed(s.total_len() + 1) + 1;  // +1 page watermark
    if ((int32_t)e->free_pages.size() < need - (int32_t)s.pages.size()) break;
    if (!e->grow_to(s, s.total_len() + 1)) break;
    s.running = true;
    e->running.push_back(id);
    e->waiting.pop_front();
  }

  // Growth: every running sequence needs room for the token this step emits.
  for (size_t i = 0; i < e->running.size();) {
    auto& s = e->seqs[e->running[i]];
    while (!e->grow_to(s, s.total_len() + 1)) {
      // Preempt the youngest *other* sequence; if we are the only one, the
      // request is stuck (cannot happen: add_request checked worst case
      // against the whole pool, and alone it owns the whole pool).
      if (e->running.size() <= 1) return -1;
      e->preempt_youngest();
      if (e->running.size() <= i) break;  // we were the victim
    }
    if (i < e->running.size() && e->running[i] == s.id) ++i;
  }
  return (int32_t)e->running.size();
}

// Record that the current step generated one token for every running
// sequence; sequences reaching max_new_tokens are finished and their pages
// freed. Returns how many finished this call. Finished ids are written to
// `finished_out` (capacity `cap`).
int32_t fa_engine_commit_tokens(void* h, int64_t* finished_out, int32_t cap) {
  auto* e = static_cast<Engine*>(h);
  int32_t n_fin = 0;
  std::vector<int64_t> still;
  still.reserve(e->running.size());
  for (int64_t id : e->running) {
    auto& s = e->seqs[id];
    s.generated += 1;
    if (s.generated >= s.max_new_tokens) {
      if (n_fin < cap) finished_out[n_fin] = id;
      n_fin++;
      e->release(s);
      e->seqs.erase(id);
    } else {
      still.push_back(id);
    }
  }
  e->running = std::move(still);
  return n_fin;
}

// Grow every running sequence's page list to cover `n` MORE tokens beyond
// what step() already allocated — the speculative-decoding slot reservation
// (k draft tokens verified in one model call). Never preempts: returns -1
// (allocating nothing) if the pool cannot cover every sequence, so callers
// can fall back to one-token decoding; 0 on success. Pages stay with their
// sequences either way — uncommitted slots are plain headroom that later
// tokens grow into.
int32_t fa_engine_grow_batch(void* h, int32_t n) {
  auto* e = static_cast<Engine*>(h);
  int32_t need = 0;
  for (int64_t id : e->running) {
    auto& s = e->seqs[id];
    int32_t want = e->pages_needed(s.total_len() + 1 + n);
    if (want > e->max_pages_per_seq) return -1;
    need += std::max(0, want - (int32_t)s.pages.size());
  }
  if (need > (int32_t)e->free_pages.size()) return -1;
  for (int64_t id : e->running) {
    auto& s = e->seqs[id];
    bool ok = e->grow_to(s, s.total_len() + 1 + n);
    (void)ok;  // cannot fail: `need` was checked against the free list
  }
  return 0;
}

// Commit `n` tokens for ONE sequence — the speculative-acceptance path
// (each row accepts a different number of draft tokens). Returns 1 if the
// sequence reached its budget and finished (pages freed), 0 if it keeps
// running, -1 if the id is unknown or not running.
int32_t fa_engine_commit_n(void* h, int64_t id, int32_t n) {
  auto* e = static_cast<Engine*>(h);
  auto it = e->seqs.find(id);
  if (it == e->seqs.end()) return -1;
  auto& s = it->second;
  if (!s.running) return -1;
  s.generated += n;
  if (s.generated >= s.max_new_tokens) {
    e->release(s);
    for (auto r = e->running.begin(); r != e->running.end(); ++r) {
      if (*r == id) { e->running.erase(r); break; }
    }
    e->seqs.erase(it);
    return 1;
  }
  return 0;
}

// Finish a sequence before its max_new_tokens budget — the stop-token /
// client-cancel path. Frees its pages immediately (they may be reallocated
// by the next step(), so the caller must not issue further KV reads or
// writes for this sequence). Returns 0, or -1 if the id is unknown.
// Waiting (not yet admitted) sequences are cancelled the same way.
int32_t fa_engine_finish(void* h, int64_t id) {
  auto* e = static_cast<Engine*>(h);
  auto it = e->seqs.find(id);
  if (it == e->seqs.end()) return -1;
  e->release(it->second);
  e->seqs.erase(it);
  for (auto r = e->running.begin(); r != e->running.end(); ++r) {
    if (*r == id) { e->running.erase(r); break; }
  }
  for (auto w = e->waiting.begin(); w != e->waiting.end(); ++w) {
    if (*w == id) { e->waiting.erase(w); break; }
  }
  return 0;
}

// Batch introspection: ids, lengths, and page tables of the running batch.
int32_t fa_engine_batch_size(void* h) {
  return (int32_t)static_cast<Engine*>(h)->running.size();
}

void fa_engine_batch(void* h, int64_t* ids_out, int32_t* lens_out,
                     int32_t* pages_out, int32_t max_pages_per_seq) {
  auto* e = static_cast<Engine*>(h);
  for (size_t i = 0; i < e->running.size(); ++i) {
    auto& s = e->seqs[e->running[i]];
    ids_out[i] = s.id;
    lens_out[i] = s.total_len();
    for (int32_t j = 0; j < max_pages_per_seq; ++j) {
      pages_out[i * max_pages_per_seq + j] =
          j < (int32_t)s.pages.size() ? s.pages[j] : -1;
    }
  }
}

int32_t fa_engine_free_pages(void* h) {
  return (int32_t)static_cast<Engine*>(h)->free_pages.size();
}

int32_t fa_engine_waiting(void* h) {
  return (int32_t)static_cast<Engine*>(h)->waiting.size();
}

int64_t fa_engine_preempt_count(void* h) {
  return static_cast<Engine*>(h)->preempt_count;
}

}  // extern "C"
