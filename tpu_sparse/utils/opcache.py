"""Per-matrix derived-object caches with content-aware keys.

Preconditioner hierarchies, CWELL repacks, and hi/lo f64 splits are
expensive host-side derivations cached per matrix. Keying on ``id(A)``
alone goes stale when a workflow rebinds the container's arrays in place
(``A.data = new_data`` — the container object survives, its content does
not). JAX arrays are immutable, so the identity of every array *leaf*
identifies the content exactly; the key therefore includes the leaf ids,
and entries pin weak references to the container AND its leaves so a
recycled id can never alias a dead operand (ROADMAP round-2 item 7).
"""

from __future__ import annotations

import weakref
from typing import Any, Callable, Hashable, Optional

import jax


def _leaves(A) -> tuple:
    try:
        return tuple(jax.tree_util.tree_leaves(A))
    except Exception:
        return ()


def content_key(A, extra: Hashable = ()) -> tuple:
    """Cache key tracking the operand object and its array leaves."""
    return (id(A),) + tuple(id(l) for l in _leaves(A)) + (extra,)


class OperandCache:
    """Small map from (matrix content, extra opts) -> derived object."""

    def __init__(self, max_entries: int = 16):
        self._store: dict = {}
        self._max = max_entries

    def get_or_build(self, A, build: Callable[[], Any],
                     extra: Hashable = ()) -> Any:
        # drop entries whose operand died: their values may pin large
        # device buffers (e.g. sharded packs) past the matrix lifetime
        dead = [k for k, e in self._store.items() if e[0]() is None]
        for k in dead:
            del self._store[k]
        key = content_key(A, extra)
        entry = self._store.get(key)
        if entry is not None:
            anchor_ok = entry[0]() is A
            leaves_ok = all(r() is l for r, l in zip(entry[1], _leaves(A)))
            if anchor_ok and leaves_ok:
                return entry[2]
        value = build()
        if len(self._store) > self._max:
            self._store.clear()
        try:
            refs = tuple(weakref.ref(l) for l in _leaves(A))
            self._store[key] = (weakref.ref(A), refs, value)
        except TypeError:
            pass  # unweakrefable operand: rebuild next time
        return value
