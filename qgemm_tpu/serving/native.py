"""ctypes bindings for the native C++ continuous-batching scheduler
(csrc/scheduler.cpp).

Build with ``make -C csrc`` (produces qgemm_tpu/serving/libqgemm_sched.so).
The scheduler owns all host-side serving state — request queue, slot
free-list, per-slot positions, transcripts, finish rules — behind a C ABI;
the Python engine only moves tensors. Callers check ``available()`` and
fall back to the pure-Python bookkeeping when the library isn't built.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libqgemm_sched.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    c = ctypes
    i32, i64, u8 = c.c_int32, c.c_int64, c.c_uint8
    i32p, i64p, u8p = c.POINTER(i32), c.POINTER(i64), c.POINTER(u8)
    lib.qg_sched_create.argtypes = [i32, i32]
    lib.qg_sched_create.restype = c.c_void_p
    lib.qg_sched_destroy.argtypes = [c.c_void_p]
    lib.qg_sched_submit.argtypes = [c.c_void_p, i64, i32p, i32, i32, i32]
    lib.qg_sched_submit.restype = c.c_int
    lib.qg_sched_submit_front.argtypes = [c.c_void_p, i64, i32p, i32, i32, i32]
    lib.qg_sched_submit_front.restype = c.c_int
    lib.qg_sched_next_admission.argtypes = [c.c_void_p, i64p, i32p]
    lib.qg_sched_next_admission.restype = i32
    lib.qg_sched_slot_prompt.argtypes = [c.c_void_p, i32, i32p, i32]
    lib.qg_sched_slot_prompt.restype = i32
    lib.qg_sched_admitted.argtypes = [c.c_void_p, i32, i32]
    lib.qg_sched_admitted.restype = c.c_int
    lib.qg_sched_record_step.argtypes = [c.c_void_p, i32p]
    lib.qg_sched_record_step.restype = i32
    lib.qg_sched_record_block.argtypes = [c.c_void_p, i32p, i32p, i32,
                                          i32p]
    lib.qg_sched_record_block.restype = i32
    lib.qg_sched_set_stops.argtypes = [c.c_void_p, i64, i32p, i32]
    lib.qg_sched_set_stops.restype = c.c_int
    lib.qg_sched_active_mask.argtypes = [c.c_void_p, u8p]
    lib.qg_sched_positions.argtypes = [c.c_void_p, i32p]
    for name in ("num_waiting", "num_active", "num_finished"):
        fn = getattr(lib, f"qg_sched_{name}")
        fn.argtypes = [c.c_void_p]
        fn.restype = i32
    lib.qg_sched_steps.argtypes = [c.c_void_p]
    lib.qg_sched_steps.restype = i64
    lib.qg_sched_pop_finished.argtypes = [c.c_void_p, i64p, i32p, i32]
    lib.qg_sched_pop_finished.restype = i32
    lib.qg_sched_cancel.argtypes = [c.c_void_p, i64, i32p]
    lib.qg_sched_cancel.restype = i32
    lib.qg_sched_preempt.argtypes = [c.c_void_p, i64, i32p, i32p, i32]
    lib.qg_sched_preempt.restype = i32
    lib.qg_sched_suspend_slot.argtypes = [c.c_void_p, i32]
    lib.qg_sched_suspend_slot.restype = c.c_int
    lib.qg_sched_resume_slot.argtypes = [c.c_void_p, i32]
    lib.qg_sched_resume_slot.restype = c.c_int
    lib.qg_sched_slot_request.argtypes = [c.c_void_p, i32]
    lib.qg_sched_slot_request.restype = i64
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _i32arr(a):
    a = np.ascontiguousarray(a, np.int32)
    return a, a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


class NativeScheduler:
    """Thin OO wrapper over the C ABI. Mirrors the Python engine's
    bookkeeping exactly (tests assert transcript equality between the two
    backends)."""

    def __init__(self, max_slots: int, max_seq_len: int):
        lib = _load()
        if lib is None:
            raise RuntimeError(
                "libqgemm_sched.so not built — run `make -C csrc`")
        self._lib = lib
        self._h = lib.qg_sched_create(max_slots, max_seq_len)
        if not self._h:
            raise ValueError("bad scheduler dims")
        self.max_slots = max_slots
        self.max_seq_len = max_seq_len

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.qg_sched_destroy(h)
            self._h = None

    def submit(self, req_id: int, prompt, max_new_tokens: int,
               eos_token: int | None = None, front: bool = False) -> None:
        arr, ptr = _i32arr(prompt)
        fn = (self._lib.qg_sched_submit_front if front
              else self._lib.qg_sched_submit)
        rc = fn(self._h, req_id, ptr, len(arr), max_new_tokens,
                -1 if eos_token is None else eos_token)
        if rc != 0:
            raise ValueError(
                f"request {req_id}: prompt {len(arr)} + {max_new_tokens} "
                f"exceeds max_seq_len {self.max_seq_len}")

    def set_stops(self, req_id: int, stops) -> None:
        """Attach extra stop tokens to a WAITING request (any generated
        token in the set finishes it, in addition to eos_token)."""
        arr, ptr = _i32arr(stops)
        rc = self._lib.qg_sched_set_stops(self._h, req_id, ptr, len(arr))
        if rc != 0:
            raise ValueError(f"request {req_id} not in waiting queue")

    def next_admission(self):
        """-> (slot, req_id, prompt ndarray) or None."""
        rid = ctypes.c_int64()
        plen = ctypes.c_int32()
        slot = self._lib.qg_sched_next_admission(
            self._h, ctypes.byref(rid), ctypes.byref(plen))
        if slot < 0:
            return None
        out, ptr = _i32arr(np.zeros(plen.value, np.int32))
        n = self._lib.qg_sched_slot_prompt(self._h, slot, ptr, plen.value)
        assert n == plen.value
        return slot, rid.value, out

    def admitted(self, slot: int, first_token: int) -> None:
        assert self._lib.qg_sched_admitted(self._h, slot, first_token) == 0

    def record_step(self, tokens) -> int:
        arr, ptr = _i32arr(tokens)
        assert len(arr) == self.max_slots
        return self._lib.qg_sched_record_step(self._h, ptr)

    def record_block(self, cands, produced) -> np.ndarray:
        """Speculative round: per-slot variable-length accepted blocks.
        cands [max_slots, width]; produced [max_slots]. Returns the
        per-slot count actually appended (post EOS/max_new truncation)."""
        cands = np.ascontiguousarray(cands, np.int32)
        assert cands.ndim == 2 and cands.shape[0] == self.max_slots
        carr, cptr = _i32arr(cands.reshape(-1))
        parr, pptr = _i32arr(produced)
        assert len(parr) == self.max_slots
        acc, aptr = _i32arr(np.zeros(self.max_slots, np.int32))
        self._lib.qg_sched_record_block(self._h, cptr, pptr,
                                        cands.shape[1], aptr)
        return acc

    def active_mask(self) -> np.ndarray:
        out = np.zeros(self.max_slots, np.uint8)
        self._lib.qg_sched_active_mask(
            self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        return out.astype(bool)

    def positions(self) -> np.ndarray:
        out, ptr = _i32arr(np.zeros(self.max_slots, np.int32))
        self._lib.qg_sched_positions(self._h, ptr)
        return out

    @property
    def num_waiting(self) -> int:
        return self._lib.qg_sched_num_waiting(self._h)

    @property
    def num_active(self) -> int:
        return self._lib.qg_sched_num_active(self._h)

    @property
    def num_finished(self) -> int:
        return self._lib.qg_sched_num_finished(self._h)

    @property
    def steps(self) -> int:
        return self._lib.qg_sched_steps(self._h)

    def pop_finished(self):
        """-> (req_id, generated ndarray) or None."""
        rid = ctypes.c_int64()
        out, ptr = _i32arr(np.zeros(self.max_seq_len, np.int32))
        n = self._lib.qg_sched_pop_finished(self._h, ctypes.byref(rid), ptr,
                                            self.max_seq_len)
        if n < 0:
            return None
        return rid.value, out[:n]

    def request_in_slot(self, slot: int):
        """Id of the request occupying ``slot``, or None when free."""
        rid = self._lib.qg_sched_slot_request(self._h, slot)
        return None if rid < 0 else int(rid)

    def preempt(self, req_id: int):
        """Preempt an ACTIVE request: free its slot and REMOVE it,
        returning its transcript so the engine can resubmit a continuation.
        -> (slot, generated ndarray) or None when the request is not
        active."""
        slot = ctypes.c_int32(-1)
        out, ptr = _i32arr(np.zeros(self.max_seq_len, np.int32))
        n = self._lib.qg_sched_preempt(self._h, req_id, ctypes.byref(slot),
                                       ptr, self.max_seq_len)
        if n < 0:
            return None
        return slot.value, out[:n]

    def suspend_slot(self, slot: int) -> None:
        """Drop ``slot`` from the active set without touching its request
        (overlapped-admission ticks). Pair with resume_slot."""
        assert self._lib.qg_sched_suspend_slot(self._h, slot) == 0

    def resume_slot(self, slot: int) -> None:
        # -1 (no occupant) tolerated: decode-fault recovery mid-overlap
        # may have cancelled the suspended slot already
        self._lib.qg_sched_resume_slot(self._h, slot)

    def cancel(self, req_id: int):
        """-> None (unknown/finished), or the freed slot id / -1 if the
        request was still waiting. A cancelled active request's partial
        transcript shows up in pop_finished."""
        slot = ctypes.c_int32(-1)
        rc = self._lib.qg_sched_cancel(self._h, req_id, ctypes.byref(slot))
        if rc == 0:
            return None
        return slot.value if rc == 2 else -1
