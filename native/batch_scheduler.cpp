// batch_scheduler — continuous-batching slot scheduler (C++17, C ABI).
//
// The native runtime component behind the engine's continuous batching
// (a capability extension over the single-sequence reference engine,
// mandated by BASELINE.json; the reference's only scheduling state is
// the pinned-mailbox pos of one request, common.h:50-54). Loaded by
// llama_cu_awq_tpu/engine/scheduler.py via ctypes; the Python class
// PyScheduler implements identical semantics and is the test oracle.
//
// Model: a fixed pool of KV-cache slots. Requests enter a FCFS queue
// (`bs_add`), are admitted to free slots (`bs_admit`), and advance one
// token per decode step (`bs_on_token`), finishing on EOS, on their
// max-new-tokens budget, or at the sequence-length capacity; finished
// slots return to the pool immediately (the "continuous" in continuous
// batching: admission happens between decode steps, not between
// batches).
//
// All calls are O(1)/O(batch) and allocation-free after construction so
// the scheduler never stalls the per-step host loop.
//
// Thread safety: every entry point locks one internal mutex. ctypes
// releases the GIL around native calls, so the serving front-end's
// handler threads (bs_add) genuinely race the engine thread
// (bs_on_token/bs_admit) on one Scheduler object.

#include <algorithm>
#include <cstdint>
#include <deque>
#include <mutex>
#include <vector>

namespace {

struct Request {
  int64_t id;
  int32_t prompt_len;
  int32_t max_new;  // <=0: unlimited (clamped by max_seq)
};

struct Slot {
  bool busy = false;
  Request req{};
  int32_t generated = 0;  // sampled tokens so far
};

struct Scheduler {
  int32_t max_seq;
  std::vector<Slot> slots;
  std::deque<Request> queue;
  int64_t finished = 0;
  std::mutex mu;

  explicit Scheduler(int n_slots, int max_seq_) : max_seq(max_seq_) {
    slots.resize(n_slots);
  }

  bool fits(const Request& r) const {
    // needs room for the prompt plus at least one sampled token
    return r.prompt_len >= 1 && r.prompt_len + 1 <= max_seq;
  }

  int admit(int32_t* out_slots, int64_t* out_ids, int cap) {
    int n = 0;
    for (int s = 0; s < (int)slots.size() && n < cap && !queue.empty(); s++) {
      if (slots[s].busy) continue;
      slots[s] = Slot{true, queue.front(), 0};
      queue.pop_front();
      out_slots[n] = s;
      out_ids[n] = slots[s].req.id;
      n++;
    }
    return n;
  }

  // returns 1 if the request finished with this token, 0 if running
  int on_token(int slot, bool is_eos) {
    Slot& s = slots[slot];
    if (!s.busy) return -1;
    s.generated++;
    const int32_t pos = s.req.prompt_len + s.generated;  // next write pos
    const bool budget_done =
        s.req.max_new > 0 && s.generated >= s.req.max_new;
    if (is_eos || budget_done || pos >= max_seq) {
      s.busy = false;
      finished++;
      return 1;
    }
    return 0;
  }

  int num_active() const {
    int n = 0;
    for (const auto& s : slots) n += s.busy;
    return n;
  }

  // Cancel a request wherever it lives: frees its slot (the engine
  // discards any in-flight tokens for a freed slot) or removes it from
  // the FCFS queue. Returns the slot it occupied, -2 if it was queued,
  // or -1 if unknown (already finished).
  int cancel(int64_t request_id) {
    for (int s = 0; s < (int)slots.size(); s++) {
      if (slots[s].busy && slots[s].req.id == request_id) {
        slots[s].busy = false;
        finished++;
        return s;
      }
    }
    auto it = std::find_if(queue.begin(), queue.end(),
                           [&](const Request& r) { return r.id == request_id; });
    if (it != queue.end()) {
      queue.erase(it);
      finished++;
      return -2;
    }
    return -1;
  }
};

}  // namespace

extern "C" {

void* bs_create(int n_slots, int max_seq) {
  if (n_slots <= 0 || max_seq <= 1) return nullptr;
  return new Scheduler(n_slots, max_seq);
}

void bs_destroy(void* h) { delete static_cast<Scheduler*>(h); }

// 0 = queued, -1 = rejected (cannot ever fit)
int bs_add(void* h, int64_t request_id, int prompt_len, int max_new) {
  auto* s = static_cast<Scheduler*>(h);
  std::lock_guard<std::mutex> g(s->mu);
  Request r{request_id, prompt_len, max_new};
  if (!s->fits(r)) return -1;
  s->queue.push_back(r);
  return 0;
}

int bs_admit(void* h, int32_t* out_slots, int64_t* out_ids, int cap) {
  auto* s = static_cast<Scheduler*>(h);
  std::lock_guard<std::mutex> g(s->mu);
  return s->admit(out_slots, out_ids, cap);
}

int bs_on_token(void* h, int slot, int is_eos) {
  auto* s = static_cast<Scheduler*>(h);
  std::lock_guard<std::mutex> g(s->mu);
  if (slot < 0 || slot >= (int)s->slots.size()) return -1;
  return s->on_token(slot, is_eos != 0);
}

// slot index the request occupied, -2 if it was still queued, -1 unknown
int bs_cancel(void* h, int64_t request_id) {
  auto* s = static_cast<Scheduler*>(h);
  std::lock_guard<std::mutex> g(s->mu);
  return s->cancel(request_id);
}

int bs_num_active(void* h) {
  auto* s = static_cast<Scheduler*>(h);
  std::lock_guard<std::mutex> g(s->mu);
  return s->num_active();
}

int bs_num_queued(void* h) {
  auto* s = static_cast<Scheduler*>(h);
  std::lock_guard<std::mutex> g(s->mu);
  return (int)s->queue.size();
}

int64_t bs_num_finished(void* h) {
  auto* s = static_cast<Scheduler*>(h);
  std::lock_guard<std::mutex> g(s->mu);
  return s->finished;
}

// request id occupying a slot, or -1 when free
int64_t bs_slot_request(void* h, int slot) {
  auto* s = static_cast<Scheduler*>(h);
  std::lock_guard<std::mutex> g(s->mu);
  if (slot < 0 || slot >= (int)s->slots.size() || !s->slots[slot].busy)
    return -1;
  return s->slots[slot].req.id;
}

}  // extern "C"
