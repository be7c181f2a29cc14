"""Dataset classes for the conditioned / multi-scene drivers.

Behavioral port of the dataset layer in lib/load_blender.py (BlenderDataset,
MultisceneBlenderDataset variants, the LR/SR pair loader with its pickle
cache) and lib/load_nsvf.py (MultisceneNSVFDataset). Plain-python iterables
over numpy arrays — no torch DataLoader machinery; the training loops index
them directly.
"""

from __future__ import annotations

import json
import os
import pickle

import numpy as np

from .load_blender import pose_spherical, render_path_spherical
from .load_data import inward_nearfar_heuristic


def _composite(image, white_bkgd):
    if image.shape[-1] == 4:
        if white_bkgd:
            return image[..., :3] * image[..., -1:] + (1.0 - image[..., -1:])
        return image[..., :3] * image[..., -1:]
    return image


def load_blender_data_lrsr(basedir, down=4, testskip=1):
    """LR/HR pair loader with a ``down_{d}.pkl`` cache
    (lib/load_blender.py:110-184)."""
    import imageio.v2 as imageio

    pkl_file = os.path.join(basedir, f"down_{down}.pkl")
    if os.path.isfile(pkl_file):
        with open(pkl_file, "rb") as f:
            ret = pickle.load(f)
        return (ret["imgs_lr"], ret["imgs_sr"], ret["poses"],
                ret["render_poses"], ret["sr_cam"], ret["lr_cam"],
                ret["i_split"])

    splits = ["train", "val", "test"]
    metas = {}
    for s in splits:
        with open(os.path.join(basedir, f"transforms_{s}.json")) as fp:
            metas[s] = json.load(fp)

    all_imgs, all_poses, counts = [], [], [0]
    for s in splits:
        meta = metas[s]
        skip = 1 if s == "train" or testskip == 0 else testskip
        imgs, poses = [], []
        for frame in meta["frames"][::skip]:
            fname = os.path.join(basedir, frame["file_path"] + ".png")
            imgs.append(imageio.imread(fname))
            poses.append(np.array(frame["transform_matrix"]))
        all_imgs.append((np.array(imgs) / 255.0).astype(np.float32))
        all_poses.append(np.array(poses).astype(np.float32))
        counts.append(counts[-1] + len(imgs))

    i_split = [np.arange(counts[i], counts[i + 1]) for i in range(3)]
    imgs_sr = np.concatenate(all_imgs, 0)
    poses = np.concatenate(all_poses, 0)
    H, W = imgs_sr[0].shape[:2]
    focal_sr = 0.5 * W / np.tan(0.5 * float(metas["train"]["camera_angle_x"]))
    render_poses = render_path_spherical()

    h, w = H // down, W // down
    focal_lr = focal_sr / float(down)
    if down > 1:
        import cv2
        imgs_lr = np.stack([
            cv2.resize(im, (w, h), interpolation=cv2.INTER_AREA)
            for im in imgs_sr], 0)
    else:
        imgs_lr = imgs_sr

    ret = dict(imgs_lr=imgs_lr, imgs_sr=imgs_sr, poses=poses,
               render_poses=render_poses, sr_cam=[H, W, focal_sr],
               lr_cam=[h, w, focal_lr], i_split=i_split)
    with open(pkl_file, "wb") as f:
        pickle.dump(ret, f)
    return (imgs_lr, imgs_sr, poses, render_poses, [H, W, focal_sr],
            [h, w, focal_lr], i_split)


class BlenderDataset:
    """Single-scene blender dataset object (lib/load_blender.py:187-274)."""

    near, far = 2.0, 6.0

    def __init__(self, basedir, split="train", testskip=1, down=1,
                 white_bkgd=True):
        import imageio.v2 as imageio
        import cv2

        with open(os.path.join(basedir, f"transforms_{split}.json")) as f:
            meta = json.load(f)
        skip = 1 if split == "train" or testskip == 0 else testskip
        imgs, poses = [], []
        for frame in meta["frames"][::skip]:
            image = imageio.imread(
                os.path.join(basedir, frame["file_path"] + ".png"))
            image = (np.array(image) / 255.0).astype(np.float32)
            if down > 1:
                image = cv2.resize(
                    image, (image.shape[1] // down, image.shape[0] // down),
                    interpolation=cv2.INTER_AREA)
            imgs.append(_composite(image, white_bkgd))
            poses.append(np.array(frame["transform_matrix"],
                                  dtype=np.float32))
        self.images = np.stack(imgs, 0)
        self.poses = np.stack(poses, 0)
        self.H, self.W = self.images.shape[1:3]
        focal = 0.5 * self.W / np.tan(0.5 * float(meta["camera_angle_x"]))
        self.K = np.array([[focal, 0, 0.5 * self.W],
                           [0, focal, 0.5 * self.H],
                           [0, 0, 1]], np.float32)
        self.render_poses = render_path_spherical()

    def __len__(self):
        return len(self.images)

    def __getitem__(self, i):
        return {"image": self.images[i], "pose": self.poses[i],
                "K": self.K, "HW": (self.H, self.W)}


class MultisceneBlenderDataset:
    """Multi-scene blender dataset; scenes are subdirectories each with
    blender-format transforms (lib/load_blender.py:277-547). ``lazy=True``
    reads images on access (the v1 dataset), ``lazy=False`` preloads
    everything into ``all_imgs [n_scene, n_views, H, W, 3]`` (the v2
    dataset used by the maintained driver)."""

    near, far = 2.0, 6.0

    def __init__(self, basedir, split="train", testskip=1, down=1,
                 white_bkgd=True, test_scenes=(), lazy=False):
        self.basedir = basedir
        self.split = split
        self.down = down
        self.white_bkgd = white_bkgd
        self.lazy = lazy
        scenes = sorted(
            d for d in os.listdir(basedir)
            if os.path.isdir(os.path.join(basedir, d))
            and os.path.isfile(os.path.join(
                basedir, d, f"transforms_{split}.json")))
        if test_scenes:
            if split == "train":
                scenes = [s for s in scenes if s not in test_scenes]
            else:
                scenes = [s for s in scenes if s in test_scenes]
        self.scenes = scenes
        self.meta = {}
        for s in scenes:
            with open(os.path.join(basedir, s,
                                   f"transforms_{split}.json")) as f:
                self.meta[s] = json.load(f)
        self.skip = 1 if split == "train" or testskip == 0 else testskip
        self.render_poses = render_path_spherical()
        if not lazy:
            self._preload()

    @property
    def n_scene(self):
        return len(self.scenes)

    def _load_frame(self, scene, frame):
        import imageio.v2 as imageio
        import cv2
        image = imageio.imread(
            os.path.join(self.basedir, scene, frame["file_path"] + ".png"))
        image = (np.array(image) / 255.0).astype(np.float32)
        if self.down > 1:
            image = cv2.resize(
                image,
                (image.shape[1] // self.down, image.shape[0] // self.down),
                interpolation=cv2.INTER_AREA)
        return _composite(image, self.white_bkgd)

    def _preload(self):
        all_imgs, all_poses, all_Ks = [], [], []
        for s in self.scenes:
            frames = self.meta[s]["frames"][::self.skip]
            imgs = np.stack([self._load_frame(s, f) for f in frames], 0)
            poses = np.stack([np.array(f["transform_matrix"], np.float32)
                              for f in frames], 0)
            H, W = imgs.shape[1:3]
            focal = 0.5 * W / np.tan(
                0.5 * float(self.meta[s]["camera_angle_x"]))
            K = np.array([[focal, 0, 0.5 * W], [0, focal, 0.5 * H],
                          [0, 0, 1]], np.float32)
            all_imgs.append(imgs)
            all_poses.append(poses)
            all_Ks.append(np.repeat(K[None], len(poses), 0))
        self.all_imgs = np.stack(all_imgs, 0)
        self.all_poses = np.stack(all_poses, 0)
        self.all_Ks = np.stack(all_Ks, 0)
        self.H, self.W = self.all_imgs.shape[2:4]

    def scene_data(self, scene_id):
        """Per-scene view bundle for the multi-scene trainers."""
        if self.lazy:
            s = self.scenes[scene_id]
            frames = self.meta[s]["frames"][::self.skip]
            imgs = np.stack([self._load_frame(s, f) for f in frames], 0)
            poses = np.stack([np.array(f["transform_matrix"], np.float32)
                              for f in frames], 0)
            H, W = imgs.shape[1:3]
            focal = 0.5 * W / np.tan(
                0.5 * float(self.meta[s]["camera_angle_x"]))
            K = np.array([[focal, 0, 0.5 * W], [0, focal, 0.5 * H],
                          [0, 0, 1]], np.float32)
            Ks = np.repeat(K[None], len(poses), 0)
        else:
            imgs = self.all_imgs[scene_id]
            poses = self.all_poses[scene_id]
            Ks = self.all_Ks[scene_id]
            H, W = self.H, self.W
        return {"images": imgs, "poses": poses[:, :3, :4], "Ks": Ks,
                "HW": np.array([[H, W]] * len(imgs)),
                "near": self.near, "far": self.far}

    def __len__(self):
        return self.n_scene

    def __getitem__(self, i):
        return self.scene_data(i)


class MultisceneNSVFDataset:
    """Multi-scene NSVF dataset with a shared inward near/far across scenes
    (lib/load_nsvf.py:81-213)."""

    def __init__(self, basedir, split="train", down=1, test_scenes=(),
                 white_bkgd=True):
        from .load_nsvf import load_nsvf_data
        scenes = sorted(
            d for d in os.listdir(basedir)
            if os.path.isdir(os.path.join(basedir, d, "rgb")))
        if test_scenes:
            if split == "train":
                scenes = [s for s in scenes if s not in test_scenes]
            else:
                scenes = [s for s in scenes if s in test_scenes]
        self.scenes = scenes
        self.split = {"train": 0, "val": 1, "test": 2}[split]
        self._data = []
        cam_os = []
        for s in scenes:
            imgs, poses, rposes, hwf, i_split = load_nsvf_data(
                os.path.join(basedir, s), down)
            idx = i_split[self.split]
            imgs = np.stack([_composite(im, white_bkgd)
                             for im in imgs[idx]], 0)
            H, W, focal = hwf
            K = np.array([[focal, 0, 0.5 * W], [0, focal, 0.5 * H],
                          [0, 0, 1]], np.float32)
            self._data.append({
                "images": imgs, "poses": poses[idx][:, :3, :4],
                "Ks": np.repeat(K[None], len(idx), 0),
                "HW": np.array([[H, W]] * len(idx)),
            })
            cam_os.append(poses[idx][:, :3, 3])
        # shared near/far over all scenes (load_nsvf.py:163-164)
        near, far = inward_nearfar_heuristic(np.concatenate(cam_os, 0))
        self.near, self.far = near, far
        for d in self._data:
            d["near"], d["far"] = near, far

    @property
    def n_scene(self):
        return len(self.scenes)

    def scene_data(self, scene_id):
        return self._data[scene_id]

    def __len__(self):
        return self.n_scene

    def __getitem__(self, i):
        return self.scene_data(i)


# Registry mirroring lib/load_blender.py:549-553.
dataset_dict = {
    "blender": BlenderDataset,
    "multiscene_blender": MultisceneBlenderDataset,
    "multiscene_nsvf": MultisceneNSVFDataset,
}
