"""Data pipeline tests: format readers, transforms, native kernels, and the
three dataset classes over synthesized fixture files."""

import os

import numpy as np
import pytest

from graphecho_tpu.data import native
from graphecho_tpu.data.camus import DataLoaderCamus
from graphecho_tpu.data.cardiac_uda import SegCardiacUDADataset
from graphecho_tpu.data.formats import read_mhd, read_nifti, write_mhd, write_nifti
from graphecho_tpu.data.loader import DataLoader, collate
from graphecho_tpu.data.transforms import (
    center_crop,
    nearest_resize,
    polygon_mask,
    resize_and_crop,
)


def test_mhd_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    arr = (rng.rand(30, 40) * 255).astype(np.uint8)
    path = str(tmp_path / "img.mhd")
    write_mhd(path, arr)
    out = read_mhd(path)
    np.testing.assert_array_equal(out, arr)

    vol = (rng.rand(5, 30, 40) * 100).astype(np.int16)
    path3 = str(tmp_path / "vol.mhd")
    write_mhd(path3, vol)
    np.testing.assert_array_equal(read_mhd(path3), vol)


def test_nifti_roundtrip(tmp_path):
    rng = np.random.RandomState(1)
    vol = (rng.rand(20, 24, 6) * 4).astype(np.int16)  # (x, y, t)
    path = str(tmp_path / "vol.nii.gz")
    write_nifti(path, vol)
    out = read_nifti(path)
    np.testing.assert_array_equal(out, vol)


def test_nearest_resize_native_matches_numpy():
    rng = np.random.RandomState(2)
    x = rng.rand(37, 53, 2).astype(np.float32)
    out = nearest_resize(x, (124, 124))
    iy = np.floor(np.arange(124) * (37 / 124)).astype(int)
    ix = np.floor(np.arange(124) * (53 / 124)).astype(int)
    np.testing.assert_array_equal(out, x[iy][:, ix])
    assert native.available()  # g++ is in the image; the kernel must build


def test_polygon_mask_basic():
    m = polygon_mask([2, 2, 8, 8], [2, 8, 8, 2], (10, 10))
    assert m[5, 5] == 1.0
    assert m[0, 0] == 0.0
    assert 20 < m.sum() < 50


def test_resize_and_crop_shared_random_crop():
    rng = np.random.RandomState(3)
    img = np.arange(20 * 20, dtype=np.float32).reshape(20, 20, 1)
    mask = img.copy()
    im2, mk2 = resize_and_crop(img, mask, (16, 16), (8, 8), train=True,
                               rng=np.random.RandomState(0))
    np.testing.assert_array_equal(im2, mk2)  # identical crop window
    assert im2.shape == (8, 8, 1)
    im3, _ = resize_and_crop(img, None, (16, 16), (8, 8), train=False)
    np.testing.assert_array_equal(im3, center_crop(nearest_resize(img, (16, 16)),
                                                   (8, 8)))


@pytest.fixture
def camus_root(tmp_path):
    rng = np.random.RandomState(4)
    for i in range(6):
        pid = f"patient{i:04d}"
        d = tmp_path / "training" / pid
        d.mkdir(parents=True)
        img = (rng.rand(60, 70) * 255).astype(np.uint8)
        gt = np.zeros((60, 70), np.uint8)
        gt[10:30, 20:40] = 1  # LV
        gt[35:50, 20:40] = 3  # LA
        write_mhd(str(d / f"{pid}_4CH_ED.mhd"), img)
        write_mhd(str(d / f"{pid}_4CH_ED_gt.mhd"), gt)
    return str(tmp_path)


def test_camus_dataset(camus_root):
    ds = DataLoaderCamus(camus_root, stage="train", img_res=(32, 32),
                         img_crop=(24, 24))
    assert len(ds) > 0
    img, masks, mask_index, index = ds[0]
    assert img.shape == (24, 24, 1)
    assert masks.shape == (24, 24, 2)
    assert img.max() <= 1.0
    assert set(np.unique(masks)) <= {0.0, 1.0}
    # splits are disjoint
    val = DataLoaderCamus(camus_root, stage="valid", img_res=(32, 32),
                          img_crop=(24, 24))
    assert not set(ds.data_list) & set(val.data_list)


def test_camus_loader_batches(camus_root):
    ds = DataLoaderCamus(camus_root, stage="train", img_res=(32, 32),
                         img_crop=(24, 24))
    loader = DataLoader(ds, batch_size=2, num_workers=2)
    batch = next(iter(loader))
    imgs, masks, mask_idx, idx = batch
    assert imgs.shape == (2, 24, 24, 1)
    assert masks.shape == (2, 24, 24, 2)


@pytest.fixture
def cardiac_infos(tmp_path):
    rng = np.random.RandomState(5)
    infos = {}
    for i in range(5):
        pid = f"p{i}"
        img = (rng.rand(48, 52, 10) * 255).astype(np.int16)  # (x, y, t)
        mask = np.zeros((48, 52, 10), np.int16)
        mask[10:30, 10:30, :] = 1
        mask[32:40, 30:40, :] = 2
        ip = str(tmp_path / f"{pid}_img.nii.gz")
        mp = str(tmp_path / f"{pid}_mask.nii.gz")
        write_nifti(ip, img)
        write_nifti(mp, mask)
        infos[pid] = {"dataset_name": "Site_G",
                      "views_images": {"1": ip}, "views_labels": {"1": mp}}
    return infos


def test_cardiac_dataset_single_frame(cardiac_infos):
    ds = SegCardiacUDADataset(cardiac_infos, root="", is_train=True,
                              view_num=("1",), spatial_size=40, crop_size=32,
                              seed=0)
    img, masks, mask_index, index = ds[0]
    assert img.shape == (32, 32, 1)
    assert masks.shape == (32, 32, 3)  # BG + LV + RV for view '1'
    # BG channel complements the organs
    np.testing.assert_allclose(masks.sum(-1), np.ones((32, 32)))


def test_cardiac_dataset_clip(cardiac_infos):
    ds = SegCardiacUDADataset(cardiac_infos, root="", is_train=True,
                              view_num=("1",), spatial_size=40, crop_size=32,
                              single_frame=False, clip_length=4,
                              total_length=8, seed=0)
    clip, masks, mask_index, index = ds[0]
    assert clip.shape == (4, 32, 32, 1)
    assert masks.shape == (4, 32, 32, 3)


def test_collate():
    out = collate([(np.zeros((2, 2)), 1), (np.ones((2, 2)), 2)])
    assert out[0].shape == (2, 2, 2)
    np.testing.assert_array_equal(out[1], [1, 2])


def test_rebatched_fixed_leading_dim():
    """rebatched() must deliver constant-shape batches (no jit retrace) from
    a cycled loader with uneven tails, without dropping or reordering rows."""
    from graphecho_tpu.data.loader import cycled, rebatched

    class Ds:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return np.full((3,), i, np.float32), np.int32(i)

    loader = DataLoader(Ds(), 4, shuffle=False, drop_last=False, num_workers=1)
    it = rebatched(cycled(loader), 4)
    seen = []
    for _ in range(6):  # 24 rows = 2.4 dataset passes
        a, idx = next(it)
        assert a.shape == (4, 3) and idx.shape == (4,)
        assert (a[:, 0] == idx).all()  # tuple elements stay row-aligned
        seen.extend(idx.tolist())
    # rows arrive in order, wrapping the dataset without loss
    assert seen == [i % 10 for i in range(24)]


def test_process_sharded_loading_disjoint_and_equal():
    """Per-host sharded loading (the DistributedSampler replacement): with a
    shared seed the hosts' index sets are disjoint, and every host gets the
    SAME number of samples/batches — unequal counts would desynchronize the
    jitted steps' collectives across hosts."""

    class Ds:
        def __len__(self):
            return 11

        def __getitem__(self, i):
            return np.int32(i)

    per_rank = []
    for r in range(3):
        loader = DataLoader(Ds(), 2, shuffle=True, seed=7, drop_last=False,
                            num_workers=1, process_index=r, process_count=3)
        assert len(loader) == 2  # identical on every rank
        got = [int(v) for batch in loader for v in np.atleast_1d(batch)]
        per_rank.append(got)
    assert [len(g) for g in per_rank] == [3, 3, 3]  # floor(11/3) each
    all_idx = [i for g in per_rank for i in g]
    assert len(set(all_idx)) == len(all_idx)  # disjoint across ranks


def test_cycled_empty_loader_raises():
    from graphecho_tpu.data.loader import cycled

    class Empty:
        def __len__(self):
            return 1

        def __getitem__(self, i):
            return np.zeros((2,), np.float32)

    loader = DataLoader(Empty(), 4, drop_last=True, num_workers=1)
    with pytest.raises(ValueError, match="no batches"):
        next(cycled(loader))


@pytest.fixture
def echo_root(tmp_path):
    import cv2
    from graphecho_tpu.data.video import savevideo

    rng = np.random.RandomState(6)
    (tmp_path / "Videos").mkdir()
    names = []
    rows = ["FileName,X1,Y1,X2,Y2,Frame"]
    for i in range(3):
        name = f"vid{i}.avi"
        vid = (rng.rand(12, 32, 32) * 255).astype(np.uint8)
        savevideo(str(tmp_path / "Videos" / name), vid)
        names.append(name)
        for frame in (2, 7):  # two traced frames (ES, ED)
            for k in range(4):
                rows.append(f"{name[:-4]},{8+k},{8+2*k},{24-k},{8+2*k},{frame}")
    with open(tmp_path / "FileList.csv", "w") as f:
        f.write("FileName,EF,EDV,ESV,Split\n")
        for i, n in enumerate(names):
            f.write(f"{n},{55.0 + i},{140.0 + i},{60.0 + i},TRAIN\n")
    with open(tmp_path / "VolumeTracings.csv", "w") as f:
        f.write("\n".join(rows))
    # external-test videos live outside the root (`echo.py:102-103`)
    ext = tmp_path / "external"
    ext.mkdir()
    vid = (rng.rand(12, 32, 32) * 255).astype(np.uint8)
    savevideo(str(ext / "ext0.avi"), vid)
    return str(tmp_path)


def test_echo_dataset(echo_root):
    from graphecho_tpu.data.echo import Echo

    ds = Echo(echo_root, split="train", single_frame=True)
    assert len(ds) == 3
    img, mask, _, idx = ds[0]
    assert img.shape[-1] == 1 and img.ndim == 3
    assert mask.shape == img.shape[:2] + (1,)
    assert img.max() <= 1.0
    assert mask.sum() > 0  # trace rasterized

    clip_ds = Echo(echo_root, split="train", single_frame=False, length=4)
    clip, mask, _, _ = clip_ds[1]
    assert clip.shape[0] == 4 and clip.shape[-1] == 1


def test_echo_target_type_list(echo_root):
    """target_type list semantics — EF/EDV/ESV outcomes, Large/SmallIndex,
    Large/SmallFrame, Filename, traces (`reference/datasets/echo.py:226-263`)."""
    from graphecho_tpu.data.echo import Echo

    ds = Echo(echo_root, split="train", single_frame=False, length=4,
              target_type=["EF", "EDV", "ESV", "LargeIndex", "SmallIndex",
                           "LargeFrame", "SmallFrame", "Filename",
                           "LargeTrace", "SmallTrace"])
    clip, target, _, idx = ds[1]
    (ef, edv, esv, li, si, lf, sf, fname, lt, st) = target
    assert (ef, edv, esv) == (56.0, 141.0, 61.0)  # row i=1 of the fixture
    assert (li, si) == (7, 2)  # traces sorted by area: ED last, ES first
    assert lf.shape == (32, 32, 1) and sf.shape == (32, 32, 1)
    assert fname == "vid1.avi"
    assert lt.shape == (32, 32, 1) and lt.sum() > 0
    assert st.shape == (32, 32, 1)
    # with a non-trace primary target the clip start falls back to the first
    # traced (ES) frame, so clip[0] is the SmallFrame (the reference instead
    # crashes on an unassigned `start` there, `echo.py:213-224`)
    np.testing.assert_allclose(sf, clip[0])

    ds_lt = Echo(echo_root, split="train", single_frame=False, length=4,
                 target_type=["LargeTrace", "LargeFrame"])
    clip_lt, (lt2, lf2), _, _ = ds_lt[1]
    np.testing.assert_allclose(lf2, clip_lt[0])  # ED-pinned clip start

    # single scalar target stays unwrapped like the reference (`:262-263`)
    ds_ef = Echo(echo_root, split="train", single_frame=False,
                 length=4, target_type="EF")
    _, t, _, _ = ds_ef[0]
    assert isinstance(t, np.float32) and t == 55.0

    # target_transform applies to the gathered target (`:264-265`)
    ds_tr = Echo(echo_root, split="train", single_frame=False, length=4,
                 target_type="EF", target_transform=lambda x: x / 100.0)
    _, t, _, _ = ds_tr[0]
    assert abs(t - 0.55) < 1e-6


def test_echo_clips(echo_root):
    """clips=N stacks N windows; clips='all' enumerates every start at train
    time (`reference/datasets/echo.py:210-212,267-272`)."""
    from graphecho_tpu.data.echo import Echo

    ds2 = Echo(echo_root, split="train", single_frame=False, length=4,
               clips=2)
    clips, _, _, _ = ds2[0]
    assert clips.shape == (2, 4, 32, 32, 1)

    ds_all = Echo(echo_root, split="train", single_frame=False, length=4,
                  validation=False, clips="all")
    clips, _, _, _ = ds_all[0]
    # 12-frame video, length 4, period 1 -> 9 possible windows
    assert clips.shape == (9, 4, 32, 32, 1)
    # consecutive windows shift by one frame
    np.testing.assert_allclose(clips[0, 1], clips[1, 0])


def test_echo_external_test(echo_root):
    """external_test split lists videos from external_test_location; scalar
    targets are 0 and traces are unavailable (`echo.py:102-103,156-157,
    257-258`)."""
    import os

    import pytest

    from graphecho_tpu.data.echo import Echo

    loc = os.path.join(echo_root, "external")
    ds = Echo(echo_root, split="external_test", single_frame=False,
              length=4, target_type="EF", external_test_location=loc)
    assert len(ds) == 1 and ds.fnames == ["ext0.avi"]
    with pytest.raises(ValueError, match="no traces"):
        ds[0]  # trace-pinned clip start requires traces

    ds_all = Echo(echo_root, split="external_test", single_frame=False,
                  length=4, validation=False, clips="all", target_type="EF",
                  external_test_location=loc)
    clips, target, _, _ = ds_all[0]
    assert clips.shape == (9, 4, 32, 32, 1)
    assert target == np.float32(0)

    with pytest.raises(ValueError, match="external_test_location"):
        Echo(echo_root, split="external_test")


def test_echo_normalized(echo_root):
    from graphecho_tpu.data.echo import Echo

    raw = Echo(echo_root, split="train", single_frame=False, length=4,
               normalized=True, mean=0.0, std=1.0)
    scaled = Echo(echo_root, split="train", single_frame=False, length=4)
    c_raw, _, _, _ = raw[0]
    c_scaled, _, _, _ = scaled[0]
    np.testing.assert_allclose(c_raw, c_scaled * 255.0, rtol=1e-5)


@pytest.fixture
def cardiac_tree(tmp_path):
    """An on-disk CardiacUDA-style tree: root/<site>/<patient>/*.nii.gz with
    `_gt` label files, for the infos.npy builder."""
    from graphecho_tpu.data.formats import write_nifti

    rng = np.random.RandomState(11)
    root = tmp_path / "cardiac"
    for site, pids in (("Site_G", ["0001", "0002"]), ("Site_R", ["0101"])):
        for pid in pids:
            pdir = root / site / pid
            pdir.mkdir(parents=True)
            for view in ("1", "4"):
                img = (rng.rand(48, 52, 10) * 255).astype(np.int16)
                mask = np.zeros((48, 52, 10), np.int16)
                mask[8:40, 8:40, :] = 1
                write_nifti(str(pdir / f"{pid}_{view}.nii.gz"), img)
                write_nifti(str(pdir / f"{pid}_{view}_gt.nii.gz"), mask)
    # an image with no label -> must warn, not crash
    write_nifti(str(root / "Site_G" / "0001" / "0001_2.nii.gz"),
                np.zeros((8, 8, 4), np.int16))
    return str(root)


def test_build_infos(cardiac_tree, tmp_path):
    from graphecho_tpu.data.infos import build_infos, main

    infos, warnings = build_infos(cardiac_tree)
    assert set(infos) == {"Site_G/0001", "Site_G/0002", "Site_R/0101"}
    entry = infos["Site_G/0001"]
    assert entry["dataset_name"] == "Site_G"
    assert set(entry["views_images"]) == {"1", "4"}
    assert set(entry["views_labels"]) == {"1", "4"}
    assert entry["views_images"]["1"].endswith("0001_1.nii.gz")
    assert entry["views_labels"]["1"].endswith("0001_1_gt.nii.gz")
    assert any("image without label" in w for w in warnings)

    # sites filter
    only_r, _ = build_infos(cardiac_tree, sites=["Site_R"])
    assert set(only_r) == {"Site_R/0101"}

    # CLI writes an npy that round-trips through the reference's own idiom
    # (`train_cardiac_uda.py:49`: np.load(...).item())
    out = str(tmp_path / "infos.npy")
    assert main(["--root", cardiac_tree, "--out", out]) == 0
    loaded = np.load(out, allow_pickle=True).item()
    assert loaded.keys() == infos.keys()

    # and the loaded dict drives the real dataset end to end
    ds = SegCardiacUDADataset(loaded, root="", is_train=True,
                              set_select=("Site_G",), view_num=("1",),
                              spatial_size=40, crop_size=32, seed=0)
    img, masks, _, _ = ds[0]
    assert img.shape == (32, 32, 1)
    assert masks.shape == (32, 32, 3)

    # an EXPLICIT empty --mask-tokens means "no stems are labels" (so nothing
    # pairs and the build reports failure); only an omitted flag falls back to
    # the defaults (r5 review: `if args.mask_tokens` swallowed the empty list)
    assert main(["--root", cardiac_tree, "--dry-run", "--mask-tokens"]) == 1
    assert main(["--root", cardiac_tree, "--dry-run"]) == 0
