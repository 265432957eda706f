"""Misc utilities (reference: utils/utils.py:16-179)."""

from __future__ import annotations

import random
import time
from typing import Dict

import jax
import numpy as np


def seed_all(seed: int) -> None:
    """Full determinism (utils/utils.py:16-24). JAX is deterministic by
    construction given PRNG keys; this seeds the host-side RNGs used for
    data order and numpy-side estimation."""
    random.seed(seed)
    np.random.seed(seed)


def count_params(params) -> int:
    return sum(int(np.prod(x.shape))
               for x in jax.tree.leaves(params) if hasattr(x, "shape"))


def count_embedding_params(params) -> int:
    emb = params.get("embeddings", {})
    return count_params(emb)


class DotDict(dict):
    """Attribute-style dict (utils/utils.py:82-103).

    >>> d = DotDict(a=1)
    >>> d.a
    1
    """

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v

    def __delattr__(self, k):
        del self[k]


class Stopwatch:
    """Wall-clock timer with start/stop accumulation
    (utils/utils.py:106-179).

    >>> s = Stopwatch()
    >>> with s:
    ...     pass
    >>> s.get_total_duration() >= 0
    True
    """

    def __init__(self):
        self._start = None
        self._total = 0.0

    def start(self):
        if self._start is None:
            self._start = time.perf_counter()
        return self

    def stop(self):
        if self._start is not None:
            self._total += time.perf_counter() - self._start
            self._start = None
        return self

    def reset(self):
        self._start, self._total = None, 0.0
        return self

    def get_total_duration(self) -> float:
        extra = (time.perf_counter() - self._start) if self._start else 0.0
        return self._total + extra

    def format(self) -> str:
        return f"Elapsed time: {self.get_total_duration():.2f} sec"

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()


def tree_size_bytes(tree) -> Dict[str, int]:
    """Total bytes per dtype — useful for int8/int4 storage accounting."""
    out: Dict[str, int] = {}
    for x in jax.tree.leaves(tree):
        if hasattr(x, "nbytes"):
            out[str(x.dtype)] = out.get(str(x.dtype), 0) + int(x.nbytes)
    return out
