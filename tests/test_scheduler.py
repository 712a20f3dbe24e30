"""Slot-scheduler tests: semantics + native/Python trace equivalence."""

import numpy as np
import pytest

from llama_cu_awq_tpu.engine.scheduler import (
    PyScheduler,
    _find_or_build_lib,
    NativeScheduler,
    make_scheduler,
)


def make_native(n_slots, max_seq):
    lib = _find_or_build_lib()
    if lib is None:
        pytest.skip("no C++ toolchain for the native scheduler")
    return NativeScheduler(n_slots, max_seq, lib)


@pytest.fixture(params=["py", "native"])
def sched_factory(request):
    if request.param == "py":
        return PyScheduler
    return make_native


def test_fcfs_admission_and_finish(sched_factory):
    s = sched_factory(2, 64)
    assert s.add(10, prompt_len=4, max_new=3)
    assert s.add(11, prompt_len=4, max_new=3)
    assert s.add(12, prompt_len=4, max_new=3)
    assert s.num_queued == 3 and s.num_active == 0

    admitted = s.admit()
    assert admitted == [(0, 10), (1, 11)]
    assert s.num_active == 2 and s.num_queued == 1
    assert s.slot_request(0) == 10 and s.slot_request(1) == 11
    assert s.admit() == []  # no free slots

    # request 10 hits EOS on its first token
    assert s.on_token(0, is_eos=True)
    assert s.num_active == 1 and s.slot_request(0) == -1
    # freed slot goes to the next queued request
    assert s.admit() == [(0, 12)]

    # request 11 runs out its 3-token budget
    assert not s.on_token(1, is_eos=False)
    assert not s.on_token(1, is_eos=False)
    assert s.on_token(1, is_eos=False)
    assert s.slot_request(1) == -1
    assert s.finished == 2


def test_seq_capacity_finish(sched_factory):
    s = sched_factory(1, 8)
    # prompt of 6 + unlimited budget: capacity ends it after 2 tokens
    assert s.add(1, prompt_len=6, max_new=0)
    s.admit()
    assert not s.on_token(0, is_eos=False)  # pos 7
    assert s.on_token(0, is_eos=False)      # pos 8 == max_seq
    assert s.num_active == 0


def test_reject_oversized_prompt(sched_factory):
    s = sched_factory(1, 8)
    assert not s.add(1, prompt_len=8, max_new=1)  # no room for a token
    assert not s.add(2, prompt_len=0, max_new=1)
    assert s.add(3, prompt_len=7, max_new=1)


def test_native_matches_python_on_random_trace(rng):
    """Drive both implementations with one random workload; every
    decision must match step for step."""
    lib = _find_or_build_lib()
    if lib is None:
        pytest.skip("no C++ toolchain for the native scheduler")
    py = PyScheduler(4, 32)
    nat = NativeScheduler(4, 32, lib)

    next_id = 0
    for _ in range(300):
        op = rng.random()
        if op < 0.3:
            plen = int(rng.integers(0, 34))
            mnew = int(rng.integers(0, 6))
            assert py.add(next_id, plen, mnew) == nat.add(next_id, plen, mnew)
            next_id += 1
        elif op < 0.5:
            assert py.admit() == nat.admit()
        else:
            slot = int(rng.integers(0, 4))
            if py.slot_request(slot) != -1:
                eos = bool(rng.random() < 0.15)
                assert py.on_token(slot, eos) == nat.on_token(slot, eos)
        assert (py.num_active, py.num_queued, py.finished) == \
               (nat.num_active, nat.num_queued, nat.finished)
        for slot in range(4):
            assert py.slot_request(slot) == nat.slot_request(slot)


def test_make_scheduler_fallback():
    s = make_scheduler(2, 16, prefer_native=False)
    assert isinstance(s, PyScheduler)


def test_cancel_semantics(sched_factory):
    s = sched_factory(1, 64)
    assert s.add(1, prompt_len=4, max_new=8)
    assert s.add(2, prompt_len=4, max_new=8)
    assert s.admit() == [(0, 1)]
    # cancel the active request -> its slot frees, next admit takes it
    assert s.cancel(1) == 0
    assert s.num_active == 0 and s.finished == 1
    assert s.admit() == [(0, 2)]
    # cancel a queued request
    assert s.add(3, prompt_len=4, max_new=8)
    assert s.cancel(3) == -2
    assert s.num_queued == 0 and s.finished == 2
    # cancel unknown / already-finished
    assert s.cancel(99) == -1
    assert s.cancel(3) == -1


def test_cancel_parity_random_trace(rng):
    lib = _find_or_build_lib()
    if lib is None:
        pytest.skip("no C++ toolchain for the native scheduler")
    py = PyScheduler(3, 24)
    nat = NativeScheduler(3, 24, lib)
    next_id = 0
    for _ in range(300):
        op = rng.random()
        if op < 0.35:
            plen = int(rng.integers(1, 12))
            assert py.add(next_id, plen, 4) == nat.add(next_id, plen, 4)
            next_id += 1
        elif op < 0.55:
            assert py.admit() == nat.admit()
        elif op < 0.75 and next_id:
            rid = int(rng.integers(0, next_id))
            assert py.cancel(rid) == nat.cancel(rid)
        else:
            slot = int(rng.integers(0, 3))
            if py.slot_request(slot) != -1:
                eos = bool(rng.random() < 0.2)
                assert py.on_token(slot, eos) == nat.on_token(slot, eos)
        assert (py.num_active, py.num_queued, py.finished) == \
               (nat.num_active, nat.num_queued, nat.finished)
