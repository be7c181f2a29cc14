"""End-to-end: coarse->fine training on the procedural fixture must learn the
scene (PSNR rises well above the untrained baseline), checkpoints must
round-trip, and rendering must work — the golden-file-style acceptance from
SURVEY.md §4."""

import os
import types

import numpy as np
import pytest

from directvoxgo_tpu.config import Config
from directvoxgo_tpu.data.synthetic import make_synthetic_dataset
from directvoxgo_tpu.engine import checkpoint as ckpt_lib
from directvoxgo_tpu.engine import train as train_lib
from directvoxgo_tpu.engine.render import render_viewpoints
from directvoxgo_tpu.models.dvgo import DirectVoxGO

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def tiny_cfg(basedir, n_coarse=150, n_fine=150):
    cfg = Config.fromfile(os.path.join(REPO, "configs", "default.py"))
    cfg.expname = "tiny_e2e"
    cfg.basedir = str(basedir)
    cfg.data.dataset_type = "synthetic_fixture"
    cfg.data.white_bkgd = True
    cfg.coarse_train.N_iters = n_coarse
    cfg.coarse_train.N_rand = 512
    cfg.coarse_train.lrate_density = 0.3
    cfg.fine_train.N_iters = n_fine
    cfg.fine_train.N_rand = 512
    cfg.fine_train.pg_scale = [n_fine // 2]
    cfg.coarse_model_and_render.num_voxels = 24 ** 3
    cfg.coarse_model_and_render.num_voxels_base = 24 ** 3
    cfg.fine_model_and_render.num_voxels = 32 ** 3
    cfg.fine_model_and_render.num_voxels_base = 32 ** 3
    cfg.fine_model_and_render.rgbnet_dim = 6
    cfg.fine_model_and_render.rgbnet_width = 32
    cfg.fine_model_and_render.k_density = 64
    cfg.fine_model_and_render.k_color = 32
    return cfg


def make_args(**kw):
    base = dict(seed=777, no_reload=False, no_reload_optimizer=False,
                ft_path="", i_print=50, i_weights=100000)
    base.update(kw)
    return types.SimpleNamespace(**base)


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    basedir = tmp_path_factory.mktemp("logs")
    cfg = tiny_cfg(basedir)
    data_dict = make_synthetic_dataset(n_train=10, n_val=1, n_test=2,
                                       H=40, W=40)
    args = make_args()
    train_lib.train(args, cfg, data_dict)
    return cfg, data_dict


class TestEndToEnd:
    def test_checkpoints_written(self, trained):
        cfg, _ = trained
        logdir = os.path.join(cfg.basedir, cfg.expname)
        assert os.path.isfile(os.path.join(logdir, "coarse_last.tar"))
        assert os.path.isfile(os.path.join(logdir, "fine_last.tar"))
        assert os.path.isfile(os.path.join(logdir, "config.py"))
        assert os.path.isfile(os.path.join(logdir, "args.txt"))

    def test_learned_scene_beats_untrained(self, trained):
        cfg, data_dict = trained
        ckpt = os.path.join(cfg.basedir, cfg.expname, "fine_last.tar")
        model = ckpt_lib.load_model(DirectVoxGO, ckpt)
        render_kwargs = {
            "near": data_dict["near"], "far": data_dict["far"],
            "bg": 1, "stepsize": cfg.fine_model_and_render.stepsize,
            "inverse_y": False, "render_depth": True,
        }
        i_test = data_dict["i_test"]
        rgbs, depths, stats = render_viewpoints(
            model=model,
            render_poses=data_dict["poses"][i_test],
            HW=data_dict["HW"][i_test], Ks=data_dict["Ks"][i_test],
            ndc=False, render_kwargs=render_kwargs,
            gt_imgs=[data_dict["images"][i] for i in i_test],
            chunk=2048, verbose=False)
        psnr = float(np.mean(stats["psnr"]))
        print("fixture e2e psnr:", psnr)
        # Untrained/empty renders of this fixture sit around 10-13 dB
        # (white frame vs blobs); a short training run must clearly learn.
        assert psnr > 18.0, f"fine-stage PSNR too low: {psnr}"
        # Frozen golden (PARITY, PERF_LOG.md): this exact run reproduced
        # 30.86 dB on the forced-8-CPU-device mesh (2026-08); regressions in
        # the sweep/compositing/optimizer math show up as multi-dB drops.
        assert abs(psnr - 30.86) < 2.5, (
            f"fixture PSNR drifted from frozen golden 30.86: {psnr}")
        assert rgbs.shape == (len(i_test), 40, 40, 3)
        assert np.isfinite(depths).all()

    def test_checkpoint_roundtrip_render_identical(self, trained):
        cfg, data_dict = trained
        ckpt = os.path.join(cfg.basedir, cfg.expname, "fine_last.tar")
        m1 = ckpt_lib.load_model(DirectVoxGO, ckpt)
        m2 = ckpt_lib.load_model(DirectVoxGO, ckpt)
        np.testing.assert_array_equal(np.asarray(m1.params["density"]),
                                      np.asarray(m2.params["density"]))
        rk = dict(near=data_dict["near"], far=data_dict["far"], bg=1.0,
                  stepsize=0.5)
        o = np.tile([[0.0, 0, 3.5]], (32, 1)).astype(np.float32)
        d = np.tile([[0.0, 0, -1.0]], (32, 1)).astype(np.float32)
        r1 = m1(o, d, d, **rk)["rgb_marched"]
        r2 = m2(o, d, d, **rk)["rgb_marched"]
        np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))

    def test_resume_continues_from_checkpoint(self, trained, capsys):
        cfg, data_dict = trained
        # Re-entering the fine stage with the same N_iters is a no-op resume:
        # it must load the checkpoint and skip training.
        args = make_args()
        xyz_min, xyz_max = train_lib.compute_bbox_by_cam_frustrm(
            cfg=cfg, **data_dict)
        model = train_lib.scene_rep_reconstruction(
            args=args, cfg=cfg, cfg_model=cfg.fine_model_and_render,
            cfg_train=cfg.fine_train, xyz_min=xyz_min, xyz_max=xyz_max,
            data_dict=data_dict, stage="fine",
            coarse_ckpt_path=os.path.join(cfg.basedir, cfg.expname,
                                          "coarse_last.tar"))
        out = capsys.readouterr().out
        assert "reload from" in out


def test_checkpoint_rejects_malicious_pickle(tmp_path):
    """Untrusted checkpoint paths (mask_cache_path, --ft_path) must not be
    arbitrary-code-execution vectors: the restricted unpickler only admits
    numpy plumbing."""
    import pickle

    class Evil:
        def __reduce__(self):
            return (print, ("pwned",))

    bad = tmp_path / "evil.tar"
    with open(bad, "wb") as f:
        pickle.dump({"model_kwargs": Evil()}, f)
    import pytest as _pytest
    with _pytest.raises(pickle.UnpicklingError, match="disallowed global"):
        ckpt_lib.load_checkpoint_file(str(bad))


def test_step_batch_chunks_respect_event_boundaries(tmp_path):
    """The dispatch chunker must end chunks exactly on i_print/i_weights
    steps and never cross mask-renewal/pg_scale/tv-state changes — the
    console/checkpoint cadence contract of the scanned train loop."""
    cfg = tiny_cfg(tmp_path, n_coarse=0, n_fine=0)
    cfg_train = cfg.fine_train
    cfg_train.N_iters = 3000
    cfg_train.pg_scale = [1000, 2000]
    cfg_train.tv_before = 1e9
    cfg_train.tv_after = 0
    cfg_train.tv_every = 1
    cfg_train.tv_dense_before = 1500
    cfg_train.weight_tv_density = 1e-6
    cfg_train.steps_per_dispatch = 8
    args = make_args(i_print=50, i_weights=700)

    pg_set = set(cfg_train.pg_scale)

    def tv_state_of(j):
        apply_tv = (j < cfg_train.tv_before and j > cfg_train.tv_after
                    and j % cfg_train.tv_every == 0
                    and (cfg_train.weight_tv_density > 0
                         or cfg_train.weight_tv_k0 > 0))
        return (apply_tv, j < cfg_train.tv_dense_before)

    def chunk_len(i):
        length = 1
        while length < 8:
            j = i + length
            if (j > cfg_train.N_iters or j in pg_set
                    or (j + 500) % 1000 == 0
                    or tv_state_of(j) != tv_state_of(i)
                    or (j - 1) % args.i_print == 0
                    or (j - 1) % args.i_weights == 0):
                break
            length += 1
        return length

    covered, i = [], 1
    while i <= cfg_train.N_iters:
        L = chunk_len(i)
        chunk = list(range(i, i + L))
        covered.extend(chunk)
        # no event step strictly inside the chunk (events fire at chunk
        # start; prints/ckpts at chunk end)
        for j in chunk[1:]:
            assert j not in pg_set, chunk
            assert (j + 500) % 1000 != 0, chunk
            assert tv_state_of(j) == tv_state_of(i), chunk
        for j in chunk[:-1]:
            assert j % args.i_print != 0, chunk
            assert j % args.i_weights != 0, chunk
        i += L
    # every step executed exactly once
    assert covered == list(range(1, cfg_train.N_iters + 1))
