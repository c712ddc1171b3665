"""Interning — `webrender/src/intern.rs` (module doc :1-22, DataStore :154,
Interner :237).

The reference splits interned data between threads: the `Interner` lives with
the scene builder and maps keys → stable handles, emitting an `UpdateList` of
inserts/removes per transaction; the `DataStore` lives with the frame builder
and applies those deltas so templates keep stable indices across scene
rebuilds. Epoch-based GC frees entries whose keys have not been re-interned
recently.

Here the same split exists (scene-build side Interner, frame-side DataStore
fed by update lists) so downstream caches can key on stable `Handle.index`
values even though every scene rebuild re-interns its keys.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Tuple

# intern.rs:24 — entries older than this many epochs are GC'd
MAX_UNUSED_EPOCHS = 10


@dataclass(frozen=True)
class Handle:
    """intern.rs Handle: stable index + uid for staleness checks."""
    index: int
    uid: int


@dataclass
class UpdateList:
    """intern.rs UpdateList: per-transaction deltas shipped to the DataStore."""
    insertions: List[Tuple[int, int, Any]] = field(default_factory=list)
    removals: List[int] = field(default_factory=list)

    @property
    def empty(self) -> bool:
        return not self.insertions and not self.removals


class Interner:
    """Scene-thread side (intern.rs Interner :237): key → stable Handle with
    freelist index reuse and epoch GC."""

    def __init__(self):
        self._map: Dict[Any, Handle] = {}
        self._last_used: Dict[int, int] = {}   # index → epoch
        self._free: List[int] = []
        self._next_index = 0
        self._next_uid = 0
        self.epoch = 0
        self._pending = UpdateList()

    def __len__(self) -> int:
        return len(self._map)

    def intern(self, key: Any,
               data_fn: Optional[Callable[[], Any]] = None) -> Handle:
        """intern.rs intern(): return the existing handle for `key` or
        allocate one, recording an insertion with `data_fn()`'s payload."""
        handle = self._map.get(key)
        if handle is not None:
            self._last_used[handle.index] = self.epoch
            return handle
        index = self._free.pop() if self._free else self._next_index
        if index == self._next_index:
            self._next_index += 1
        handle = Handle(index, self._next_uid)
        self._next_uid += 1
        self._map[key] = handle
        self._last_used[index] = self.epoch
        data = data_fn() if data_fn is not None else key
        self._pending.insertions.append((index, handle.uid, data))
        return handle

    def end_frame_and_get_pending_updates(self) -> UpdateList:
        """intern.rs end_frame_and_get_pending_updates: GC stale entries,
        bump the epoch, and hand the delta list to the frame thread."""
        dead = [k for k, h in self._map.items()
                if self.epoch - self._last_used[h.index] > MAX_UNUSED_EPOCHS]
        for k in dead:
            h = self._map.pop(k)
            del self._last_used[h.index]
            self._free.append(h.index)
            self._pending.removals.append(h.index)
        self.epoch += 1
        out, self._pending = self._pending, UpdateList()
        return out


class DataStore:
    """Frame-thread side (intern.rs DataStore :154): dense template storage
    indexed by Handle.index, kept in sync by UpdateLists."""

    def __init__(self):
        self._data: List[Any] = []
        self._uid: List[int] = []

    def __len__(self) -> int:
        return sum(1 for u in self._uid if u >= 0)

    def apply_updates(self, updates: UpdateList) -> None:
        for index, uid, data in updates.insertions:
            while len(self._data) <= index:
                self._data.append(None)
                self._uid.append(-1)
            self._data[index] = data
            self._uid[index] = uid
        for index in updates.removals:
            self._data[index] = None
            self._uid[index] = -1

    def __getitem__(self, handle: Handle) -> Any:
        assert self._uid[handle.index] == handle.uid, "stale interner handle"
        return self._data[handle.index]
