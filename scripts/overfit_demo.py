#!/usr/bin/env python
"""Training-convergence demonstration (BASELINE config #5 intent).

The reference trainer's purpose is that the loss DECREASES and terrain
predictions approach GT (reference: monoforce/scripts/train.py:187-226).
This script demonstrates that end-to-end on the synthetic fixture sequence:
it overfits one batch from a fresh init for ``--steps`` train steps and
writes the loss curves as committed artifacts:

    docs/convergence/losses.jsonl   per-step geom/terrain/phys/total
    docs/convergence/loss_curve.png the curve figure

The modest CI gate lives in tests/test_trainer.py::test_overfit_converges
(total drops >5x in 40 steps); this artifact shows the longer trajectory.

Usage:  python scripts/overfit_demo.py [--steps 150] [--out docs/convergence]
"""

import os as _os
import sys as _sys

# make the repo root importable when run as `python scripts/x.py` (a runtime
# insert, NOT PYTHONPATH: pre-setting PYTHONPATH breaks the TPU plugin
# registration in this environment)
_REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
_sys.path.insert(0, _REPO)
_sys.path.insert(0, _os.path.join(_REPO, "tests"))

import argparse
import json
import os
import tempfile


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--out", default=os.path.join(_REPO, "docs", "convergence"))
    ap.add_argument("--cpu", action="store_true",
                    help="pin to CPU (matches the CI gate environment)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from fixtures import make_sequence, tiny_lss_cfg
    from monoforce_tpu.config import LSSConfig, PhysicsConfig
    from monoforce_tpu.datasets import ROUGH
    from monoforce_tpu.training import Trainer
    from monoforce_tpu.utils import NumpyLoader

    tmp = tempfile.mkdtemp(prefix="overfit_demo_")
    seq = make_sequence(tmp, n_frames=4)
    lss_dict = tiny_lss_cfg()
    dphys = PhysicsConfig(robot="tradr", grid_res=0.4, traj_sim_time=1.0)
    ds = ROUGH(seq, lss_cfg=lss_dict, dphys_cfg=dphys)
    loader = NumpyLoader(ds, batch_size=2, drop_last=True)
    lss_cfg = LSSConfig(data_aug_conf=lss_dict["data_aug_conf"],
                        grid_conf=lss_dict["grid_conf"],
                        soft_classes=lss_dict["soft_classes"])
    trainer = Trainer(dphys_cfg=dphys, lss_cfg=lss_cfg, lr=args.lr,
                      log_dir=os.path.join(tmp, "run"))
    batch = tuple(jnp.asarray(b) for b in next(iter(loader)))
    trainer.init_state(batch)

    os.makedirs(args.out, exist_ok=True)
    rows = []
    rng = jax.random.PRNGKey(0)
    for i in range(args.steps):
        rng, sub = jax.random.split(rng)
        trainer.state, aux = trainer.train_step(trainer.state, batch, sub)
        rows.append({"step": i, **{k: float(v) for k, v in aux.items()}})
        if i % 25 == 0 or i == args.steps - 1:
            print(f"step {i:4d}  " + "  ".join(
                f"{k}={rows[-1][k]:.4f}" for k in
                ("total", "geom", "terrain", "phys")))

    with open(os.path.join(args.out, "losses.jsonl"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 4.2))
    steps = [r["step"] for r in rows]
    for k in ("total", "geom", "terrain", "phys"):
        ax.plot(steps, [max(r[k], 1e-8) for r in rows], label=k)
    ax.set_yscale("log")
    ax.set_xlabel("train step")
    ax.set_ylabel("loss")
    ax.set_title("Overfitting the synthetic fixture batch "
                 f"(lr={args.lr:g}, {args.steps} steps)")
    ax.grid(True, alpha=0.3)
    ax.legend()
    fig.tight_layout()
    path = os.path.join(args.out, "loss_curve.png")
    fig.savefig(path, dpi=120)
    print(f"\nwrote {path}")
    first, last = rows[0], rows[-1]
    print(f"total: {first['total']:.4f} -> {last['total']:.4f} "
          f"({first['total'] / max(last['total'], 1e-9):.1f}x)")
    summary = {"steps": args.steps, "lr": args.lr,
               "first": {k: first[k] for k in ("total", "geom", "terrain", "phys")},
               "final": {k: last[k] for k in ("total", "geom", "terrain", "phys")},
               "improvement_x": first["total"] / max(last["total"], 1e-9)}
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
