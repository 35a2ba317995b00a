"""Wall-clock timing helpers (reference: utils.py:32-40 ``timing`` decorator),
extended with a JAX-aware context manager that blocks on device work so the
numbers mean something on TPU."""

from __future__ import annotations

import functools
import time

import jax

__all__ = ["timing", "Timer"]


def timing(fn):
    """Decorator printing the wall-clock time of each call."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        print(f"{fn.__name__} took {time.perf_counter() - t0:.3f} s")
        return out

    return wrapper


class Timer:
    """Context manager: ``with Timer("rollout") as t: ...`` then ``t.dt``.

    If ``block_on`` is given, waits for those device arrays before stopping
    the clock (XLA dispatch is asynchronous).
    """

    def __init__(self, name: str = "", verbose: bool = False):
        self.name = name
        self.verbose = verbose
        self.dt = None
        self._block = None

    def block_on(self, tree):
        self._block = tree
        return tree

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self._block is not None:
            jax.block_until_ready(self._block)
        self.dt = time.perf_counter() - self.t0
        if self.verbose:
            print(f"{self.name} took {self.dt:.4f} s")
        return False
