"""MaskedAdam semantics vs a numpy oracle of the CUDA kernels
(lib/cuda/adam_upd_kernel.cu:8-132)."""

import numpy as np
import jax.numpy as jnp

from directvoxgo_tpu.optim import MaskedAdam


def _oracle_adam(param, grad, m, v, step, lr, b1, b2, eps,
                 skip_zero=False, per_lr=None):
    step_size = lr * np.sqrt(1 - b2 ** step) / (1 - b1 ** step)
    m_new = b1 * m + (1 - b1) * grad
    v_new = b2 * v + (1 - b2) * grad * grad
    upd = step_size * m_new / (np.sqrt(v_new) + eps)
    if per_lr is not None:
        upd = upd * per_lr
    p_new = param - upd
    if skip_zero:
        touched = grad != 0
        p_new = np.where(touched, p_new, param)
        m_new = np.where(touched, m_new, m)
        v_new = np.where(touched, v_new, v)
    return p_new, m_new, v_new


def test_plain_adam_matches_oracle():
    rng = np.random.default_rng(0)
    p = rng.normal(size=(10,)).astype(np.float32)
    opt = MaskedAdam({"w": {"lr": 0.1}})
    params = {"w": jnp.asarray(p)}
    state = opt.init(params)
    pr, mr, vr = p.copy(), np.zeros_like(p), np.zeros_like(p)
    for step in range(1, 4):
        g = rng.normal(size=(10,)).astype(np.float32)
        params, state = opt.update(params, {"w": jnp.asarray(g)}, state)
        pr, mr, vr = _oracle_adam(pr, g, mr, vr, step, 0.1, 0.9, 0.99, 1e-8)
    np.testing.assert_allclose(np.asarray(params["w"]), pr, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(state["exp_avg"]["w"]), mr,
                               rtol=1e-4)


def test_skip_zero_grad_freezes_moments():
    """Untouched entries must keep their moments — no decay
    (adam_upd_kernel.cu:35)."""
    p = np.ones(4, np.float32)
    opt = MaskedAdam({"w": {"lr": 0.1, "skip_zero_grad": True}})
    params = {"w": jnp.asarray(p)}
    state = opt.init(params)
    g1 = np.array([1.0, 0.0, 2.0, 0.0], np.float32)
    params, state = opt.update(params, {"w": jnp.asarray(g1)}, state)
    m_after1 = np.asarray(state["exp_avg"]["w"]).copy()
    # step 2 with all-zero grads: nothing moves
    params2, state2 = opt.update(params, {"w": jnp.zeros(4)}, state)
    np.testing.assert_array_equal(np.asarray(params2["w"]),
                                  np.asarray(params["w"]))
    np.testing.assert_array_equal(np.asarray(state2["exp_avg"]["w"]),
                                  m_after1)
    # zero-grad entries never changed from init
    assert np.asarray(params["w"])[1] == 1.0
    assert np.asarray(state["exp_avg"]["w"])[1] == 0.0


def test_pervoxel_lr_scales_update():
    p = np.zeros(4, np.float32)
    count = jnp.asarray([1.0, 2.0, 4.0, 4.0])
    opt = MaskedAdam({"w": {"lr": 0.1}})
    params = {"w": jnp.asarray(p)}
    state = MaskedAdam.set_pervoxel_lr(opt.init(params), count)
    g = np.full(4, 1.0, np.float32)
    params, state = opt.update(params, {"w": jnp.asarray(g)}, state)
    upd = -np.asarray(params["w"])
    # per_lr = count/max = [0.25, 0.5, 1, 1]
    np.testing.assert_allclose(upd / upd[2], [0.25, 0.5, 1.0, 1.0],
                               rtol=1e-5)


def test_lr_decay_factor_applied_after_first_step():
    opt = MaskedAdam({"w": {"lr": 1.0}}, lr_decay_factor=0.5)
    params = {"w": jnp.zeros(1)}
    state = opt.init(params)
    g = jnp.ones(1)
    p1, state = opt.update(params, {"w": g}, state)
    d1 = -float(p1["w"][0])  # full lr
    p2, state = opt.update(params, {"w": g}, state)  # same inputs, step 2
    # step 2 uses lr*0.5 (and different bias correction); isolate via ratio of
    # step sizes: ss(t) = lr_scale * sqrt(1-b2^t)/(1-b1^t), grad/moments equal
    # here because we reset params but kept state... keep it simple: the
    # second update from the same state must be strictly smaller than 1x.
    d2 = -float(p2["w"][0])
    assert d2 < d1


def test_region_sliced_update_matches_full():
    """With skip_zero_grad and grads exactly zero outside the region, the
    region-sliced update must equal the full-grid update bit-for-bit."""
    import numpy as np
    import jax.numpy as jnp
    from directvoxgo_tpu.optim import MaskedAdam

    rng = np.random.default_rng(0)
    shape = (12, 10, 14, 3)
    offs, sizes = (2, 3, 4), (6, 5, 8)
    g = np.zeros(shape, np.float32)
    g[2:8, 3:8, 4:12] = rng.normal(size=(6, 5, 8, 3)).astype(np.float32)
    p = rng.normal(size=shape).astype(np.float32)
    m = rng.normal(size=shape).astype(np.float32) * 0.1
    v = abs(rng.normal(size=shape)).astype(np.float32) * 0.01

    opt = MaskedAdam({"k0": {"lr": 0.1, "skip_zero_grad": True}})
    params = {"k0": jnp.asarray(p)}
    grads = {"k0": jnp.asarray(g)}
    state = {"step": jnp.asarray(7, jnp.int32),
             "exp_avg": {"k0": jnp.asarray(m)},
             "exp_avg_sq": {"k0": jnp.asarray(v)},
             "per_lr": None}

    p_full, s_full = opt.update(params, grads, state)
    p_reg, s_reg = opt.update(
        params, grads, state,
        regions={"k0": (jnp.asarray(offs, jnp.int32), sizes)})
    assert np.array_equal(np.asarray(p_full["k0"]), np.asarray(p_reg["k0"]))
    for key in ("exp_avg", "exp_avg_sq"):
        assert np.array_equal(np.asarray(s_full[key]["k0"]),
                              np.asarray(s_reg[key]["k0"]))
