"""A/B the sweep-form voxel_count_views against the exact (VJP/scatter)
oracle end-to-end at fixture scale (round-3 verdict item 7).

The sweep form's station samples sit on sweep-axis planes, so per-sample
weights differ from the reference's fixed arc-length steps
(/root/reference/lib/dvgo.py:265-295, run.py:311-320) by up to sqrt(3);
the freeze mask (`density[cnt<=2]=-100`) diverges at IoU ~0.98
(tests/test_model.py). This tool confirms the divergence is inert at the
metric level: it trains the SAME fixture schedule twice — once with
DVGO_COUNT_FORM=sweep, once =exact — and compares final test PSNR.

Runs on CPU by default (no TPU needed; the tiny fixture pipeline is
~2-4 min/arm) — pass --tpu to keep the attached device.

Usage:  python tools/ab_count_views.py [--config CFG] [--tpu]
"""
import argparse
import os
import re
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_arm(form, base_cfg, tpu):
    """Run one run.py pipeline with the count form forced; return PSNR."""
    name = os.path.splitext(os.path.basename(base_cfg))[0]
    cfg_path = os.path.join("/tmp", f"ab_cnt_{name}_{form}.py")
    with open(cfg_path, "w") as f:
        f.write(
            f"_base_ = '{os.path.join(REPO, base_cfg)}'\n"
            f"expname = 'ab_cnt_{name}_{form}'\n"
            f"basedir = '/tmp/ab_cnt_logs'\n")
    env = dict(os.environ, DVGO_COUNT_FORM=form)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
    if not tpu:
        env["DVGO_FORCE_CPU"] = "1"
    cmd = [sys.executable, os.path.join(REPO, "run.py"),
           "--config", cfg_path, "--render_test", "--i_print", "1000",
           "--no_reload"]
    print(f"[ab] {form}: {' '.join(cmd)}", flush=True)
    try:
        # Bounded: a degraded tunnel can hang a --tpu arm inside a device
        # fetch forever (PERF_LOG round-4 outage note).
        out = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO,
                             env=env, timeout=3600)
    except subprocess.TimeoutExpired:
        raise SystemExit(f"[ab] {form} arm timed out after 3600 s")
    sys.stderr.write(out.stderr[-2000:] if out.returncode else "")
    m = re.findall(r"Testing psnr ([0-9.eE+\-]+|nan|inf)", out.stdout)
    if out.returncode or not m:
        print(out.stdout[-4000:])
        raise SystemExit(f"[ab] {form} arm failed (rc={out.returncode})")
    val = float(m[-1])
    if not np.isfinite(val):
        print(f"[ab] {form} arm DIVERGED: test PSNR = {val}")
    return val


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/synthetic/fixture_tiny.py")
    ap.add_argument("--tpu", action="store_true",
                    help="keep the attached accelerator (default: force CPU)")
    args = ap.parse_args()
    psnr = {}
    for form in ("sweep", "exact"):
        psnr[form] = run_arm(form, args.config, args.tpu)
        print(f"[ab] {form}: test PSNR {psnr[form]:.3f}", flush=True)
    d = psnr["sweep"] - psnr["exact"]
    print(f"[ab] RESULT config={args.config} sweep={psnr['sweep']:.3f} "
          f"exact={psnr['exact']:.3f} delta={d:+.3f} dB "
          f"({'inert' if abs(d) <= 0.2 else 'NOT inert'} at the 0.2 dB "
          f"reimplementation-drift bar)")


if __name__ == "__main__":
    main()
