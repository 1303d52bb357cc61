"""EchoNet-Dynamic dataset (.avi videos + trace CSVs).

Re-implements the reference `Echo` (`/root/reference/datasets/echo.py:19-292`):
  * `FileList.csv` split filtering + `VolumeTracings.csv` LV trace parsing
    (`:106-152`), dropping videos with < 2 traced frames (`:149-152`);
  * cv2 AVI grayscale decode, `/255` normalization (`:164,189`);
  * trace polygon -> binary LV mask via scanline rasterization (`:243-255`,
    replacing skimage.draw.polygon);
  * clip sampling pinned at the traced ED (LargeTrace -> last traced frame) or
    ES (SmallTrace -> first) frame (`:210-224`), zero-padding short videos
    (`:204-208`), optional noise / pad augmentation (`:167-175,274-282`).

Contract notes (deliberate cleanup of reference bugs): the reference returns a
(C, L, H, W) clip that downstream code indexes inconsistently (its target
loader feeds 5-D clips into a 2-D conv). Here:
  * `single_frame=True` (default — what the CAMUS→EchoNet target loader
    actually needs) returns the traced frame: (H, W, 1) image, (H, W, 1) mask;
  * `single_frame=False` returns ((T, H, W, 1) clip, (H, W, 1) mask of the
    traced frame, mask_index, index).
"""

from __future__ import annotations

import collections
import os
from typing import List, Optional

import numpy as np

from graphecho_tpu.data.transforms import polygon_mask
from graphecho_tpu.data.video import loadvideo


class Echo:
    def __init__(self, root: str, split: str = "train",
                 target_type: str = "LargeTrace", validation: bool = True,
                 length: int = 8, period: int = 1,
                 max_length: Optional[int] = 8, grey: bool = True,
                 pad: Optional[int] = None, noise: Optional[float] = None,
                 single_frame: bool = True, seed: int = 0):
        import pandas

        self.root = root
        self.split = split.upper()
        self.target_type = target_type
        self.validation = validation
        self.length = length
        self.period = period
        self.max_length = max_length
        self.grey = grey
        self.pad = pad
        self.noise = noise
        self.single_frame = single_frame
        self._rng = np.random.RandomState(seed)

        with open(os.path.join(root, "FileList.csv")) as f:
            data = pandas.read_csv(f)
        data["Split"] = data["Split"].map(lambda x: str(x).upper())
        if self.split != "ALL":
            data = data[data["Split"] == self.split]
        self.fnames: List[str] = data["FileName"].tolist()
        # Deviation: the stock EchoNet-Dynamic FileList.csv carries
        # extension-less names while VolumeTracings keys get ".avi" appended
        # below; the reference's own normalization is commented out
        # (`datasets/echo.py:115`), so it crashes on the stock release. We
        # normalize so both CSV flavors load.
        self.fnames = [f if f.endswith(".avi") else f + ".avi"
                       for f in self.fnames]
        self.outcome = data.values.tolist()
        self.header = data.columns.tolist()

        missing = set(self.fnames) - set(os.listdir(os.path.join(root, "Videos")))
        if missing:
            raise FileNotFoundError(
                os.path.join(root, "Videos", sorted(missing)[0]))

        self.frames = collections.defaultdict(list)
        self.trace = collections.defaultdict(dict)
        with open(os.path.join(root, "VolumeTracings.csv")) as f:
            header = f.readline().strip().split(",")
            assert header == ["FileName", "X1", "Y1", "X2", "Y2", "Frame"]
            for line in f:
                filename, x1, y1, x2, y2, frame = line.strip().split(",")
                filename = filename + ".avi" if not filename.endswith(".avi") \
                    else filename
                frame = int(frame)
                if frame not in self.trace[filename]:
                    self.frames[filename].append(frame)
                    self.trace[filename][frame] = []
                self.trace[filename][frame].append(
                    (float(x1), float(y1), float(x2), float(y2)))
        for filename in self.frames:
            for frame in self.frames[filename]:
                self.trace[filename][frame] = np.asarray(
                    self.trace[filename][frame])

        keep = [len(self.frames.get(f, [])) >= 2 for f in self.fnames]
        self.fnames = [f for f, k in zip(self.fnames, keep) if k]
        self.outcome = [o for o, k in zip(self.outcome, keep) if k]
        self.num_data = len(self.fnames)

    def __len__(self) -> int:
        return len(self.fnames)

    def _traced_frame(self, key: str) -> int:
        # traces are sorted by cross-sectional area; largest (ED) is last
        frames = self.frames[key]
        return int(frames[-1] if self.target_type == "LargeTrace"
                   else frames[0])

    def _trace_mask(self, key: str, frame: int, h: int, w: int) -> np.ndarray:
        t = self.trace[key][frame]
        x1, y1, x2, y2 = t[:, 0], t[:, 1], t[:, 2], t[:, 3]
        # reference drops the first segment and walks down one side, back up
        # the other (`echo.py:248-250`)
        x = np.concatenate((x1[1:], np.flip(x2[1:])))
        y = np.concatenate((y1[1:], np.flip(y2[1:])))
        return polygon_mask(np.rint(y).astype(int), np.rint(x).astype(int),
                            (h, w))

    def __getitem__(self, index: int):
        key = self.fnames[index]
        video = loadvideo(os.path.join(self.root, "Videos", key),
                          self.grey).astype(np.float32)  # (F, H, W, C)

        if self.noise is not None:  # simulated dropout noise (`:167-175`)
            f, h, w, c = video.shape
            n = f * h * w
            ind = self._rng.choice(n, round(self.noise * n), replace=False)
            fi = ind % f
            ind //= f
            hi = ind % h
            wi = ind // h
            video[fi, hi, wi, :] = 0

        video /= 255.0
        f, h, w, c = video.shape
        length = self.length if self.length is not None else f // self.period
        if self.max_length is not None:
            length = min(length, self.max_length)
        if f < length * self.period:
            pad_frames = np.zeros((length * self.period - f, h, w, c),
                                  video.dtype)
            video = np.concatenate([video, pad_frames], axis=0)
            f = video.shape[0]

        start = self._traced_frame(key)
        mask = self._trace_mask(key, start, h, w)[..., None]

        if self.single_frame:
            frame = video[min(start, f - 1)]
            return frame, mask, 0, index

        idx = start + self.period * np.arange(length)
        idx = np.clip(idx, 0, f - 1)
        clip = video[idx]  # (T, H, W, C)

        if self.pad is not None:  # random shift augmentation (`:274-282`)
            t, h, w, c = clip.shape
            tmp = np.zeros((t, h + 2 * self.pad, w + 2 * self.pad, c),
                           clip.dtype)
            tmp[:, self.pad:-self.pad, self.pad:-self.pad] = clip
            i, j = self._rng.randint(0, 2 * self.pad, 2)
            clip = tmp[:, i:i + h, j:j + w]

        return clip, mask, 0, index
