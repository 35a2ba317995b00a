"""CLI end-to-end smoke: drive scripts/train.py and scripts/eval.py through
their argparse surface on the on-disk synthetic fixture (VERDICT r2 #10 —
proving the CLI contract works, not just the library API; reference:
monoforce/scripts/train.sh, eval.sh).

The scripts run in a SUBPROCESS with their real ``sys.argv``; the child pins
jax to CPU before the script body (the axon sitecustomize overrides the
JAX_PLATFORMS env var, so an env-only pin would silently grab the TPU and
contend with the suite)."""

import json
import os
import subprocess
import sys

import pytest

from fixtures import make_sequence, tiny_lss_cfg

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def cli_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_data")
    make_sequence(str(root), n_frames=4)
    from monoforce_tpu.config import LSSConfig
    lss_dict = tiny_lss_cfg()
    cfg_path = str(tmp_path_factory.mktemp("cfg") / "tiny_lss.yaml")
    LSSConfig(data_aug_conf=lss_dict["data_aug_conf"],
              grid_conf=lss_dict["grid_conf"],
              soft_classes=lss_dict["soft_classes"]).to_yaml(cfg_path)
    return str(root), cfg_path


def _run_script(script, argv, timeout=1200):
    """Run scripts/<script> with argv in a CPU-pinned child interpreter."""
    code = (
        "import sys, runpy\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        f"sys.argv = [{script!r}] + {argv!r}\n"
        f"runpy.run_path({os.path.join(REPO, 'scripts', script)!r}, "
        "run_name='__main__')\n"
    )
    return subprocess.run([sys.executable, "-c", code], cwd=REPO,
                          capture_output=True, text=True, timeout=timeout)


def test_train_cli_smoke(cli_env, tmp_path):
    data_root, cfg_path = cli_env
    log_dir = str(tmp_path / "run")
    r = _run_script("train.py", [
        "--data_dir", data_root, "--bsz", "2", "--nepochs", "1",
        "--robot", "tradr", "--traj_sim_time", "1.0", "--lr", "1e-3",
        "--lss_cfg_path", cfg_path, "--log_dir", log_dir, "--debug"])
    assert r.returncode == 0, r.stderr[-3000:]
    # metrics stream + config snapshots + best-train checkpoint all written
    metrics = os.path.join(log_dir, "metrics.jsonl")
    assert os.path.exists(metrics), os.listdir(log_dir)
    recs = [json.loads(line) for line in open(metrics)]
    assert any(r_["split"] == "train" for r_ in recs)
    assert all(k in os.listdir(log_dir) for k in
               ("dphys_cfg.yaml", "lss_cfg.yaml"))
    assert os.path.isdir(os.path.join(log_dir, "train_best"))


REF_SAMPLE = "/root/reference/monoforce/config/data_sample/marv"


@pytest.mark.skipif(not os.path.isdir(REF_SAMPLE),
                    reason="reference data sample not found")
def test_run_cli_reference_mode_smoke(tmp_path):
    """The reference run.py CLI contract (reference scripts/run.sh): raw
    --img-paths + --calibration-path + --cameras, on the REAL marv sample
    images.  Tiny final_dim keeps the CPU forward tractable."""
    import glob

    from monoforce_tpu.config import LSSConfig
    from monoforce_tpu.utils.io import read_yaml

    lss_dict = read_yaml(
        "/root/reference/monoforce/config/lss_cfg.yaml")
    lss_dict["data_aug_conf"]["final_dim"] = (32, 64)
    lss_dict["grid_conf"]["dbound"] = [0.6, 3.0, 0.2]
    cfg_path = str(tmp_path / "lss_small.yaml")
    LSSConfig(data_aug_conf=lss_dict["data_aug_conf"],
              grid_conf=lss_dict["grid_conf"]).to_yaml(cfg_path)

    cams = ["camera_left", "camera_front", "camera_right", "camera_rear"]
    img_paths = [glob.glob(os.path.join(REF_SAMPLE, "images", f"*_{c}.png"))[0]
                 for c in cams]
    out = str(tmp_path / "real_run.png")
    r = _run_script("run.py", [
        "--img-paths", *img_paths,
        "--calibration-path", os.path.join(REF_SAMPLE, "calibration"),
        "--cameras", *cams, "--lss_cfg_path", cfg_path,
        "--robot", "marv", "--n_trajs", "8", "--out", out])
    assert r.returncode == 0, r.stderr[-3000:]
    assert "best path:" in r.stdout
    assert os.path.exists(out)


def test_eval_cli_smoke(cli_env, tmp_path):
    data_root, cfg_path = cli_env
    out_dir = str(tmp_path / "eval")
    r = _run_script("eval.py", [
        "--data_dir", data_root, "--robot", "tradr",
        "--traj_sim_time", "1.0", "--bsz", "1",
        "--lss_cfg_path", cfg_path, "--out_dir", out_dir])
    assert r.returncode == 0, r.stderr[-3000:]
    losses = os.path.join(out_dir, "losses.csv")
    assert os.path.exists(losses), os.listdir(out_dir)
    lines = open(losses).read().strip().split("\n")
    assert len(lines) >= 2  # header + at least one batch row
