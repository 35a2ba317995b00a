"""Guards for the artifacts the round driver executes directly:
``bench.py`` (headline benchmark), ``bench_all.py`` config #1, and
``__graft_entry__`` — code drift in the library must never break them."""

import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(snippet, timeout=900):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    return subprocess.run(
        [sys.executable, "-c", snippet], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=timeout)


def test_bench_headline_runs_on_cpu():
    """bench.py at tiny shapes emits its one JSON line (the driver runs it
    on TPU; this guards the code path)."""
    r = _run(
        "import jax; jax.config.update('jax_platforms', 'cpu');\n"
        "import os; os.environ.update(BENCH_B='8', BENCH_N='12',"
        " BENCH_REPS='2', BENCH_OUTER='1')\n"
        "import bench; bench.main()")
    assert r.returncode == 0, r.stderr[-2000:]
    rec = json.loads(r.stdout.strip().splitlines()[-1])
    assert rec["unit"] == "ms" and np.isfinite(rec["value"])
    assert "vs_baseline" in rec


def test_bench_all_parity_config_runs_on_cpu():
    """bench_all.py config #1 (golden parity RMSE) must keep passing its
    gate wherever it runs."""
    r = _run(
        "import jax; jax.config.update('jax_platforms', 'cpu');\n"
        "import bench_all; bench_all.bench_parity()")
    assert r.returncode == 0, r.stderr[-2000:]
    rec = json.loads(r.stdout.strip().splitlines()[-1])
    assert rec["vs_baseline"] > 1.0, rec


def test_graft_entry_traces():
    """entry() must stay jit-traceable (the driver compile-checks it)."""
    r = _run(
        "import jax; jax.config.update('jax_platforms', 'cpu');\n"
        "import __graft_entry__ as g\n"
        "fn, args = g.entry()\n"
        "out = jax.eval_shape(fn, *args)\n"
        "print('traced', [getattr(o, 'shape', o) for o in out])")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "traced" in r.stdout
