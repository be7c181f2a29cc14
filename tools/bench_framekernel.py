#!/usr/bin/env python
"""Numerics + perf harness for the fused frame kernels (v1 vs v3).

  python tools/bench_framekernel.py check   # CPU interpret-mode numerics
  python tools/bench_framekernel.py perf    # real-TPU timing at bench shape
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_case(hi, wi, s_total, gu, gv, f_k0=12, width=128, has_mlp=True,
              rgb_mode="direct", occupancy=0.05, seed=0):
    """Synthetic slabs with a blob occupancy pattern (realistic gating)."""
    rng = np.random.default_rng(seed)
    # blob mask over [S, Gu, Gv]
    zz, uu, vv = np.meshgrid(np.linspace(-1, 1, s_total),
                             np.linspace(-1, 1, gu),
                             np.linspace(-1, 1, gv), indexing="ij")
    r2 = zz ** 2 + uu ** 2 + vv ** 2
    radius = (occupancy * 6 / np.pi) ** (1 / 3)
    mask = (r2 < radius ** 2).astype(np.float32)
    density = np.where(mask > 0, rng.normal(2.0, 1.0, mask.shape), -6.0)
    d_geo = np.concatenate([density[:, :, None, :], mask[:, :, None, :]],
                           axis=2).reshape(s_total, gu, 2 * gv)
    # v1 layout [S, F, Gu, Gv]; v3 layout [S, F*Gu, Gv]
    k0 = rng.normal(0, 0.3, (s_total, f_k0, gu, gv)).astype(np.float32)
    d_k0 = k0.astype(jnp.bfloat16)
    d_k0t = k0.reshape(s_total, f_k0 * gu, gv).astype(jnp.bfloat16)
    # v1 wants channel-major columns [S, Gu, 2Gv]: density|mask blocks
    d_geo_cm = np.concatenate([density, mask], axis=2)  # [S, Gu, 2Gv]

    dnorm = np.full((hi, wi), 1.3, np.float32) \
        + rng.normal(0, 0.01, (hi, wi)).astype(np.float32)
    dclip = dnorm * (0.8 + rng.uniform(0, 0.2, (hi, wi)).astype(np.float32))
    ur = np.linspace(-0.3 * gu, 1.3 * gu, hi).astype(np.float32)
    vr = np.linspace(-0.3 * gv, 1.3 * gv, wi).astype(np.float32)
    # v4 computes shared1 in-kernel from the view embedding; derive
    # shared1 from (vd_emb, w1b, b1) so v3 and v4 stay comparable.
    emb_dim = 27
    vd_emb = rng.normal(0, 0.5, (hi, wi, emb_dim)).astype(np.float32)
    w1b = rng.normal(0, 0.1, (emb_dim, width)).astype(np.float32)
    b1 = rng.normal(0, 0.05, (width,)).astype(np.float32)
    shared1 = (vd_emb.astype(jnp.bfloat16).astype(np.float32) @ w1b
               + b1).astype(np.float32)
    mlp = {
        "w1a": rng.normal(0, 0.3, (f_k0 - (3 if rgb_mode == "logit_plus_k0"
                                           else 0), width)).astype(np.float32),
        "w2": rng.normal(0, 0.1, (width, width)).astype(np.float32),
        "b2": rng.normal(0, 0.1, (width,)).astype(np.float32),
        "w3": rng.normal(0, 0.3, (width, 3)).astype(np.float32),
        "b3": rng.normal(0, 0.1, (3,)).astype(np.float32),
        "w1b": w1b, "b1": b1,
    }
    # scalars: op, ou, ov, inv_span, p_first, p_step, act_shift,
    # interval_scale, fast_thres, near, far, bg
    op = -40.0
    p_ref = float(s_total - 1) / 2.0  # stations at p = idx/2 (k=2)
    sc = np.array([op, -20.0, -25.0, 1.0 / (p_ref - op), 0.0, 0.5,
                   -4.6, 0.004, 1e-4, 0.1, 1e9, 1.0], np.float32)
    return dict(d_geo=jnp.asarray(d_geo_cm, jnp.bfloat16),
                d_k0=jnp.asarray(d_k0), d_k0t=jnp.asarray(d_k0t),
                shared1=jnp.asarray(shared1, jnp.bfloat16),
                dnorm=jnp.asarray(dnorm), dclip=jnp.asarray(dclip),
                ur=jnp.asarray(ur),
                vr=jnp.asarray(vr),
                mlp={k: jnp.asarray(v) for k, v in mlp.items()},
                vd_emb_cl=jnp.asarray(vd_emb.transpose(2, 0, 1),
                                      jnp.bfloat16),
                sc=jnp.asarray(sc), guv=(gu, gv), has_mlp=has_mlp,
                rgb_mode=rgb_mode)


def run_v1(case, interpret):
    from directvoxgo_tpu.ops.pallas_render import render_frame_pallas
    return render_frame_pallas(
        case["d_geo"], case["d_k0"], case["shared1"], case["dnorm"],
        case["dclip"], case["ur"], case["vr"], case["mlp"], case["sc"],
        guv=case["guv"],
        has_mlp=case["has_mlp"], rgb_mode=case["rgb_mode"],
        interpret=interpret)


def run_v3(case, interpret):
    from directvoxgo_tpu.ops.pallas_render3 import render_frame_pallas3
    rgb_cl, depth, tcum = render_frame_pallas3(
        case["d_geo"], case["d_k0t"], case["shared1"], case["dnorm"],
        case["dclip"], case["ur"], case["vr"], case["mlp"], case["sc"],
        guv=case["guv"],
        has_mlp=case["has_mlp"], rgb_mode=case["rgb_mode"],
        interpret=interpret)
    return jnp.transpose(rgb_cl, (1, 2, 0)), depth, tcum


def run_v4(case, interpret, gated=False):
    from directvoxgo_tpu.ops.pallas_render4 import render_frame_pallas4
    act = None
    if gated:
        from directvoxgo_tpu.engine.render_sweep import _tile_activity
        act = _tile_activity(case["d_geo"], case["ur"], case["vr"],
                             case["sc"], *case["guv"])
    rgb_cl, depth, tcum = render_frame_pallas4(
        case["d_geo"], case["d_k0t"],
        case["vd_emb_cl"] if case["has_mlp"] else None,
        case["dnorm"], case["dclip"], case["ur"], case["vr"],
        case["mlp"] if case["has_mlp"] else None, case["sc"],
        activity=act, guv=case["guv"], has_mlp=case["has_mlp"],
        rgb_mode=case["rgb_mode"], interpret=interpret)
    return jnp.transpose(rgb_cl, (1, 2, 0)), depth, tcum


def check():
    for rgb_mode, has_mlp in (("direct", True), ("logit_plus_k0", True),
                              ("direct", False)):
        case = make_case(128, 256, 32, 48, 40, has_mlp=has_mlp,
                         rgb_mode=rgb_mode, occupancy=0.15)
        if not has_mlp:
            case["d_k0"] = case["d_k0"][:, :3]
            case["d_k0t"] = case["d_k0"].reshape(32, 3 * 48, 40)
        a = [np.asarray(x) for x in run_v1(case, True)]
        b = [np.asarray(x) for x in run_v3(case, True)]
        c = [np.asarray(x) for x in run_v4(case, True)]
        for name, x, y in zip(("rgb", "depth", "tcum"), a, b):
            err = np.max(np.abs(x - y))
            rel = err / (np.max(np.abs(x)) + 1e-9)
            status = "OK" if rel < 2e-2 else "MISMATCH"
            log(f"{rgb_mode} mlp={has_mlp} v1-v3 {name}: maxabs={err:.5f} "
                f"rel={rel:.5f} {status}")
        # v4 is identical per-sample math on a station-major grid; it must
        # agree with v3 to float noise (scale-aware bound).
        for name, x, y in zip(("rgb", "depth", "tcum"), b, c):
            err = np.max(np.abs(x - y))
            tol = 1e-4 * max(1.0, float(np.abs(x).max()))
            status = "OK" if err < tol else "MISMATCH"
            log(f"{rgb_mode} mlp={has_mlp} v3-v4 {name}: maxabs={err:.6f} "
                f"tol={tol:.6f} {status}")


def perf():
    log("devices:", jax.devices())
    case = make_case(1024, 1024, 192, 160, 160, occupancy=0.05)
    arr_keys = [k for k, v in case.items()
                if isinstance(v, jax.Array) or k == "mlp"]
    static = {k: v for k, v in case.items() if k not in arr_keys}
    arrs = {k: case[k] for k in arr_keys}
    def run_v3_gated(case, interpret):
        from directvoxgo_tpu.engine.render_sweep import _tile_activity
        from directvoxgo_tpu.ops.pallas_render3 import render_frame_pallas3
        act = _tile_activity(case["d_geo"], case["ur"], case["vr"],
                             case["sc"], *case["guv"])
        rgb_cl, depth, tcum = render_frame_pallas3(
            case["d_geo"], case["d_k0t"], case["shared1"], case["dnorm"],
            case["dclip"], case["ur"], case["vr"], case["mlp"], case["sc"],
            activity=act, guv=case["guv"], has_mlp=case["has_mlp"],
            rgb_mode=case["rgb_mode"], interpret=interpret)
        return jnp.transpose(rgb_cl, (1, 2, 0)), depth, tcum

    def run_v3_geo_only(case, interpret):
        """Geometry warp + compositing only (no color grid, no MLP) —
        isolates the per-station color path's share of kernel time."""
        from directvoxgo_tpu.engine.render_sweep import _tile_activity
        from directvoxgo_tpu.ops.pallas_render3 import render_frame_pallas3
        act = _tile_activity(case["d_geo"], case["ur"], case["vr"],
                             case["sc"], *case["guv"])
        rgb_cl, depth, tcum = render_frame_pallas3(
            case["d_geo"], None, None, case["dnorm"], case["dclip"],
            case["ur"], case["vr"], None, case["sc"], activity=act,
            guv=case["guv"], has_mlp=False, rgb_mode="direct",
            interpret=interpret)
        return jnp.transpose(rgb_cl, (1, 2, 0)), depth, tcum

    variants = (("v3", run_v3), ("v3+gate", run_v3_gated),
                ("v4", lambda c, i: run_v4(c, i, gated=False)),
                ("v4+gate", lambda c, i: run_v4(c, i, gated=True)),
                ("v3+gate geo-only", run_v3_geo_only), ("v1", run_v1))
    if len(sys.argv) > 2:
        variants = [v for v in variants if sys.argv[2] in v[0]]
    for name, fn in variants:
        f = jax.jit(lambda a, fn=fn: fn({**a, **static}, False))
        t0 = time.time()
        out = f(arrs)
        float(out[1][0, 0])
        log(f"{name}: compile+first {time.time()-t0:.1f}s")
        best = 1e9
        for _ in range(6):
            t0 = time.time()
            out = f(arrs)
            float(out[1][0, 0])
            best = min(best, time.time() - t0)
        log(f"{name}: best {best*1e3:.1f} ms/frame-kernel")


if __name__ == "__main__":
    {"check": check, "perf": perf}[sys.argv[1]]()
