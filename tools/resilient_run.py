#!/usr/bin/env python
"""Run run.py to completion across transport wedges.

The dev TPU transport intermittently wedges a device->host RPC forever
(PERF_LOG round-4 outage note; round-5 fern runs). With
``DVGO_FETCH_WATCHDOG`` set, the engine's fetchguard aborts a wedged
process with exit 17 (engine/fetchguard.py); this wrapper then

  1. waits for the device pool to reclaim the dead client's HBM grant
     (probe: a 2 GB alloc + scalar pull in a watchdogged subprocess),
  2. relaunches the same run.py command, which resumes from the newest
     checkpoint (engine/train.py numbered-ckpt scan).

Pass ``--i_weights <k>`` in the run.py args so mid-stage checkpoints
exist to resume from; each attempt then makes monotonic progress.

Usage:
    python tools/resilient_run.py [--max-restarts N] [--watchdog SECS]
        -- <run.py args...>
"""
import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXIT_WEDGED = 17

PROBE_SRC = r"""
import time
import jax, jax.numpy as jnp
from directvoxgo_tpu.engine.fetchguard import guarded
big = jnp.zeros((512, 1024, 1024), jnp.float32)  # 2 GB: grant reclaimed?
big.block_until_ready()
with guarded("probe scalar pull"):
    v = float(jnp.sum(big[:4]))
print("probe ok", v)
"""


def probe_device(watchdog, timeout=300):
    env = dict(os.environ, DVGO_FETCH_WATCHDOG=str(watchdog))
    try:
        r = subprocess.run([sys.executable, "-c", PROBE_SRC], env=env,
                           cwd=REPO, timeout=timeout,
                           stdout=subprocess.DEVNULL,
                           stderr=subprocess.DEVNULL)
        return r.returncode
    except subprocess.TimeoutExpired:
        return EXIT_WEDGED


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-restarts", type=int, default=8)
    ap.add_argument("--watchdog", type=float, default=240.0,
                    help="fetchguard seconds for the run (checkpoint/eval "
                         "pulls get 4x this; engine/fetchguard.py)")
    ap.add_argument("--probe-wait", type=float, default=900.0,
                    help="max seconds to wait for HBM reclaim + a healthy "
                         "fetch path between attempts")
    ap.add_argument("rest", nargs=argparse.REMAINDER,
                    help="-- followed by run.py arguments")
    args = ap.parse_args()
    run_args = args.rest[1:] if args.rest[:1] == ["--"] else args.rest
    if not run_args:
        ap.error("no run.py arguments given (use -- <args>)")

    env = dict(os.environ, DVGO_FETCH_WATCHDOG=str(args.watchdog))
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

    for attempt in range(args.max_restarts + 1):
        t0 = time.time()
        print(f"resilient_run: attempt {attempt + 1} "
              f"(watchdog {args.watchdog:.0f} s): run.py "
              + " ".join(run_args), flush=True)
        rc = subprocess.call(
            [sys.executable, os.path.join(REPO, "run.py")] + run_args,
            env=env, cwd=REPO)
        dt = time.time() - t0
        if rc == 0:
            print(f"resilient_run: completed in {dt:.0f} s "
                  f"on attempt {attempt + 1}", flush=True)
            return 0
        if rc != EXIT_WEDGED:
            print(f"resilient_run: run.py failed rc={rc} after {dt:.0f} s "
                  "(not a transport wedge; not retrying)", flush=True)
            return rc
        print(f"resilient_run: transport wedged after {dt:.0f} s; waiting "
              "for HBM reclaim + fetch-path recovery", flush=True)
        t_wait = time.time()
        while time.time() - t_wait < args.probe_wait:
            time.sleep(45)  # pool grant expiry is ~5-10 min
            prc = probe_device(min(args.watchdog, 120.0))
            state = {0: "healthy", EXIT_WEDGED: "still wedged"}.get(
                prc, f"alloc failed rc={prc} (HBM not reclaimed?)")
            print(f"resilient_run: probe after "
                  f"{time.time() - t_wait:.0f} s: {state}", flush=True)
            if prc == 0:
                break
        else:
            print("resilient_run: fetch path never recovered within "
                  f"{args.probe_wait:.0f} s; giving up", flush=True)
            return EXIT_WEDGED
    print(f"resilient_run: exhausted {args.max_restarts} restarts",
          flush=True)
    return EXIT_WEDGED


if __name__ == "__main__":
    sys.exit(main())
