"""CardiacUDA dataset (.nii.gz multi-view echo, Site_G / Site_R).

Re-implements the reference `Seg_Cardiac_UDA_Dataset`
(`/root/reference/datasets/cardiac_uda.py:38-286`):
  * site selection from the `infos` dict (pid -> {'dataset_name',
    'views_images', 'views_labels'}, `get_dict` `:179-189`);
  * 90/10 train split + 10% valid subsample + held-out test via python
    `random.sample` (`:59-66`);
  * single-frame mode: random frame whose mask area > 100 (`input_select`
    `:191-221`); clip mode: `clip_length` frames at a stride derived from
    `total_length` (`:99-113`);
  * per-view organ channel splits with explicit BG channel (`:128-151`);
  * `fill_mask`: contour labels -> filled masks (`contour_to_mask` `:223-246`)
    — reproduced bug-compatibly (cv2.fillPoly over raw argwhere points with
    transposed write-back) so the video-test metrics stay comparable;
  * nearest resize `spatial_size` + random/center crop `crop_size`;
  * returns channel-LAST arrays: (H, W, 1) or (T, H, W, 1) images in [0, 1],
    (H, W, P) or (T, H, W, P) masks.
"""

from __future__ import annotations

import random
from typing import Dict, List, Optional, Tuple

import numpy as np

from graphecho_tpu.data.formats import read_nifti
from graphecho_tpu.data.transforms import nearest_resize, resize_and_crop

ORGAN_NUM = {"1": 2, "2": 1, "3": 2, "4": 4}


class SegCardiacUDADataset:
    def __init__(self, infos: Dict, root: str, is_train: bool, repeat: int = 1,
                 data_list: Optional[List[str]] = None,
                 set_select: Tuple[str, ...] = ("Site_G",),
                 view_num: Tuple[str, ...] = ("2",), spatial_size: int = 328,
                 crop_size: int = 256, single_frame: bool = True,
                 total_length: int = 40, clip_length: int = 8,
                 seg_parts: bool = True, source_domain: bool = True,
                 fill_mask: bool = False, seed: Optional[int] = 7777):
        self.root = root
        self.is_train = is_train
        self.set_select = list(set_select)
        self.view_num = list(view_num)
        self.spatial_size = spatial_size
        self.crop_size = crop_size
        self.single_frame = single_frame
        self.total_length = total_length
        self.clip_length = clip_length
        self.seg_parts = seg_parts
        self.source_domain = source_domain
        self.fill_mask = fill_mask
        self.repeat = repeat
        # default seed mirrors the reference's module-level random.seed(7777)
        # (`datasets/cardiac_uda.py:35-36`): the 90/10 split below MUST be
        # identical across dataset instances (src/temporal/cyc loaders) and
        # across restarts/hosts, or held-out test videos leak into training
        self._py_rng = random.Random(seed)
        self._rng = np.random.RandomState(seed)

        self.data_dict = {
            k: {"images": v["views_images"], "masks": v["views_labels"]}
            for k, v in infos.items() if v["dataset_name"] in self.set_select
        }
        self.id_list = list(self.data_dict.keys())

        if is_train:
            self.train_list = self._py_rng.sample(
                self.id_list, int(len(self.id_list) * 0.9))
            self.valid_list = self._py_rng.sample(
                self.train_list, max(int(len(self.train_list) * 0.1), 0))
            self.test_list = list(set(self.id_list) - set(self.train_list))
            self.id_list = self.train_list
        elif data_list is not None:
            self.id_list = data_list
        self.num_data = len(self.id_list)

    def __len__(self) -> int:
        return self.num_data * self.repeat if self.is_train else self.num_data

    # ------------------------------------------------------------- selection
    def _input_select(self, images: np.ndarray, masks: np.ndarray):
        """Pick a frame/clip with enough mask area (`input_select` `:191-221`).
        images/masks arrive (H, W, T) from the NIfTI (x, y, t) layout."""
        if masks.ndim == 3:
            area = np.sum(masks, axis=(0, 1))
            candidates = np.argwhere(np.where(area > 100, 1, 0) == 1)
            if candidates.size == 0:
                return None, None, None
            select_index = int(self._py_rng.choice(list(candidates[:, 0])))
            if self.single_frame:
                return (images[:, :, select_index], masks[:, :, select_index],
                        select_index)
            r_index = self._py_rng.randint(
                0, select_index if select_index < self.clip_length - 1
                else self.clip_length - 1)
            t = images.shape[-1]
            if t < self.clip_length:
                return None, None, None
            # clamp so the window never runs past the video tail (a short
            # clip would break the static-shape collate/jit path)
            start = min(select_index - r_index, t - self.clip_length)
            end = start + self.clip_length  # full clip_length frames
            return images[:, :, start:end], masks[:, :, start:end], r_index
        if self.single_frame:
            return images, masks, 0
        tiled = np.tile(images[..., None], (1, 1, self.clip_length))
        tiled_m = np.tile(masks[..., None], (1, 1, self.clip_length))
        return tiled, tiled_m, 0

    def _clip_select(self, images: np.ndarray, masks: np.ndarray):
        """Clip sampling at derived stride (`:99-113`). Deviation: the
        reference slices `[start : start+clip_length : rate]`, yielding only
        clip_length/rate frames; we slice the intended full window so clips
        really have `clip_length` frames."""
        video_length = images.shape[-1]
        sample_rate = max(int(self.total_length / self.clip_length), 1)
        if video_length < self.clip_length:
            return None, None, None
        if video_length < self.clip_length * sample_rate:
            sample_rate = max(video_length // self.clip_length, 1)
        start = self._py_rng.randint(
            0, max(video_length - self.clip_length * sample_rate, 0))
        end = start + self.clip_length * sample_rate
        sel_i = images[:, :, start:end:sample_rate]
        sel_m = masks[:, :, start:end:sample_rate]
        mask_index = np.where(np.sum(sel_m, axis=(0, 1)) > 100, 1, 0)
        if self.fill_mask:
            sel_m = self.contour_to_mask(sel_m)
        return sel_i, sel_m, mask_index

    # ------------------------------------------------------------ mask utils
    def contour_to_mask(self, contours: np.ndarray) -> np.ndarray:
        """Bug-compatible `contour_to_mask` (`:223-246`): fillPoly over raw
        argwhere point lists, written back with swapped indices."""
        import cv2

        h, w, t = contours.shape
        all_cls = sorted(set(contours.reshape(-1).tolist()) - {0})
        out = np.zeros_like(contours, dtype=np.float64)
        n_organs = ORGAN_NUM[self.view_num[0]]
        for i in range(t):
            contour = contours[:, :, i]
            mask = np.zeros((h, w))
            for cls in range(1, n_organs + 1):
                if cls > len(all_cls):
                    break
                pts = np.argwhere(contour == all_cls[cls - 1])
                if len(pts) == 0:
                    continue
                img = np.zeros((h, w, 3), np.uint8)
                cv2.fillPoly(img, [pts.astype(np.int32)], (255, 255, 255))
                mask_xy = np.argwhere(img[:, :, 0] == 255)
                for idx in mask_xy:
                    mask[idx[1], idx[0]] = cls  # reference's transposed write
            out[:, :, i] = mask
        return out

    def _split_channels(self, masks: np.ndarray) -> np.ndarray:
        """Per-view BG+organ channel split (`:128-151`). masks: (...,) label
        map -> (..., P) float channels, BG first."""
        view = self.view_num[0]
        organs = ORGAN_NUM[view]
        if not self.seg_parts:
            return (masks > 0).astype(np.float32)[..., None]
        chans = [(masks == 0).astype(np.float32)]
        for c in range(1, organs + 1):
            chans.append((masks == c).astype(np.float32))
        return np.stack(chans, axis=-1)

    # ----------------------------------------------------------------- items
    def __getitem__(self, index: int):
        index = (index // self.repeat) % max(self.num_data, 1)
        for _attempt in range(max(self.num_data, 1)):
            pid = self.id_list[index]
            view = self.view_num[0]
            entry = self.data_dict[pid]
            img_path = entry["images"].get(view)
            mask_path = entry["masks"].get(view)
            if img_path is None or mask_path is None:
                index = self._py_rng.randint(0, self.num_data - 1)
                continue
            images = read_nifti(img_path).astype(np.float32)  # (H, W[, T])
            masks = read_nifti(mask_path).astype(np.float32)
            if self.single_frame:
                sel_i, sel_m, mask_index = self._input_select(images, masks)
            else:
                if images.ndim == 3:
                    sel_i, sel_m, mask_index = self._clip_select(images, masks)
                else:
                    sel_i, sel_m, mask_index = self._input_select(images, masks)
            if sel_i is None or (self.single_frame and np.sum(sel_m) < 100):
                index = self._py_rng.randint(0, self.num_data - 1)
                continue
            break
        else:
            raise RuntimeError("no usable sample found")

        mask_ch = self._split_channels(sel_m)

        if self.single_frame:
            img = sel_i[..., None]  # (H, W, 1)
            img, mask_ch = resize_and_crop(
                img, mask_ch, (self.spatial_size, self.spatial_size),
                (self.crop_size, self.crop_size), self.is_train, self._rng)
            return img / 255.0, mask_ch, mask_index, index

        # clip mode: (H, W, T) -> per-frame resize/crop -> (T, H, W, C)
        t = sel_i.shape[-1]
        img = nearest_resize(sel_i, (self.spatial_size, self.spatial_size))
        mk = nearest_resize(mask_ch, (self.spatial_size, self.spatial_size))
        if self.is_train:
            h, w = img.shape[:2]
            y0 = self._rng.randint(0, max(h - self.crop_size, 0) + 1)
            x0 = self._rng.randint(0, max(w - self.crop_size, 0) + 1)
        else:
            y0 = max((img.shape[0] - self.crop_size) // 2, 0)
            x0 = max((img.shape[1] - self.crop_size) // 2, 0)
        img = img[y0:y0 + self.crop_size, x0:x0 + self.crop_size]
        mk = mk[y0:y0 + self.crop_size, x0:x0 + self.crop_size]
        img = np.transpose(img, (2, 0, 1))[..., None]  # (T, H, W, 1)
        mk = np.transpose(mk, (2, 0, 1, 3))  # (T, H, W, P)
        return img / 255.0, mk, mask_index, index
