"""Shared pieces of the multi-host test: a per-index-deterministic dataset,
the tiny base-UDA config, and the per-host batch builder. Imported both by
the pytest process (single-process reference run) and by the 2-process
subprocess drivers — determinism across processes is the whole point."""

import numpy as np

from graphecho_tpu.config import (
    CycleConfig,
    DataConfig,
    ExperimentConfig,
    GModuleConfig,
    ModelConfig,
    NodeSamplerConfig,
    TGCNConfig,
    TrainConfig,
)
from graphecho_tpu.data.loader import DataLoader

H = W = 32
GLOBAL_BATCH = 8

# full-branch (temporal + cyc) scenario: 2 processes x 1 device each.
# One device per host keeps every cross-device collective on the single
# {0,1} gloo communicator (pre-warmed in the driver): with >1 device per
# host, XLA:CPU creates subgroup communicators LAZILY mid-program, and on
# this 1-core box the ranks' execution skew exceeds gloo's connect timeout
# (observed: "Gloo context initialization failed: Connect timeout").
FULL_DEVICES_PER_HOST = 1
FULL_GLOBAL_BATCH = 4       # imgs_source rows, 2 per host
FULL_CLIP_BATCH = 2         # temporal clips per domain PER HOST
FULL_CLIP_LEN = 2
FULL_CYC_LEN = 8            # one whole cyc clip per host


class IndexedEchoSet:
    """Deterministic per-index samples: image seeded by the index, mask a
    rectangle whose position is a function of the index. Any host reading
    index i gets bit-identical data."""

    def __init__(self, n: int = 16, offset: int = 0):
        self.n = n
        self.offset = offset

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        rng = np.random.RandomState(10_000 + self.offset + i)
        img = (rng.rand(H, W, 1) * 0.6).astype(np.float32)
        masks = np.zeros((H, W, 2), np.float32)
        r = 4 + (i % 4) * 2
        masks[r:r + 12, r:r + 12, 1] = 1.0
        masks[..., 0] = 1.0 - masks[..., 1]
        return img, masks, 0, i


def make_cfg() -> ExperimentConfig:
    return ExperimentConfig(
        train=TrainConfig(graph_matching=True, discriminator=True,
                          temporal_graph=False, cyc_loss=False),
        data=DataConfig(img_crop=(H, W), batch_size=GLOBAL_BATCH,
                        target_batch_mult=1),
        model=ModelConfig(backbone="VGG16", in_channels=1, num_classes=2),
        # dropout=0: the global batch arrives in a different ROW ORDER on the
        # multi-host path (strided per-host shards) — every loss is
        # order-invariant except dropout masks, which are drawn per slot
        gmodule=GModuleConfig(num_classes=2, nodes_per_class=32, dropout=0.0,
                              sampler=NodeSamplerConfig(
                                  pos_budget_per_level=32)),
    )


def make_full_cfg() -> ExperimentConfig:
    """EVERY loss branch on (graph matching, discriminators, temporal graph,
    cycle) at dryrun-tiny shapes — the multi-host analogue of
    `__graft_entry__.dryrun_multichip`'s config, sized for 2 hosts x 2
    devices."""
    return ExperimentConfig(
        train=TrainConfig(graph_matching=True, discriminator=True,
                          temporal_graph=True, cyc_loss=True),
        data=DataConfig(img_crop=(H, W), batch_size=FULL_GLOBAL_BATCH,
                        target_batch_mult=1, clip_length=FULL_CLIP_LEN),
        model=ModelConfig(backbone="VGG16", in_channels=1, num_classes=2),
        gmodule=GModuleConfig(num_classes=2, nodes_per_class=16,
                              sinkhorn_iters=5, dropout=0.0,
                              sampler=NodeSamplerConfig(
                                  pos_budget_per_level=16)),
        tgcn=TGCNConfig(clip_shape=(FULL_CLIP_LEN, 4, 4),
                        pool_ratios=(8, 4, 2, 1), knn_k=4, queue_size=10,
                        cluster_method="momentum_queue"),
        cycle=CycleConfig(clip_length=FULL_CYC_LEN, target_region=4,
                          chunk_size=2, cyc_off=1),
    )


def _full_sample(global_idx: int, offset: int):
    """Deterministic (img, mask) frame for the full-branch scenario, seeded
    by the GLOBAL sample index — any host materializing index i gets
    bit-identical data."""
    rng = np.random.RandomState(40_000 + offset + global_idx)
    img = (rng.rand(H, W, 1) * 0.6).astype(np.float32)
    masks = np.zeros((H, W, 2), np.float32)
    r = 4 + (global_idx % 4) * 2
    masks[r:r + 12, r:r + 12, 1] = 1.0
    masks[..., 0] = 1.0 - masks[..., 1]
    return img, masks


def _full_clip(global_idx: int, offset: int, t: int):
    frames = [_full_sample(global_idx * 100 + j, offset) for j in range(t)]
    return (np.stack([f[0] for f in frames]),
            np.stack([f[1] for f in frames]))


def build_full_batch(process_index: int, process_count: int):
    """Per-host shard of the full-branch batch, strided by global index like
    the per-host DataLoader (host p takes rows p::P). Clip halves are
    SEPARATE source/target keys and cyc frames are one whole clip per host —
    exactly the layouts `shard_batch` + the in-jit concat compose globally
    (the loader path itself is covered by the base scenario)."""
    rows = list(range(process_index, FULL_GLOBAL_BATCH, process_count))
    imgs, masks = zip(*[_full_sample(i, 0) for i in rows])
    t_imgs, _ = zip(*[_full_sample(i, 500) for i in rows])
    batch = {"imgs_source": np.stack(imgs), "masks": np.stack(masks),
             "imgs_target": np.stack(t_imgs)}

    n_clips_global = FULL_CLIP_BATCH * process_count
    clip_rows = list(range(process_index, n_clips_global, process_count))
    s_clips = [_full_clip(i, 1000, FULL_CLIP_LEN) for i in clip_rows]
    t_clips = [_full_clip(i, 1500, FULL_CLIP_LEN) for i in clip_rows]
    batch["temp_imgs_source"] = np.stack([c[0] for c in s_clips])
    batch["temp_imgs_target"] = np.stack([c[0] for c in t_clips])
    batch["temp_masks"] = np.stack([c[1] for c in s_clips])
    batch["update_idx_source"] = np.asarray(clip_rows, np.int32)
    batch["update_idx_target"] = np.asarray(
        [(i + 3) % 10 for i in clip_rows], np.int32)

    cyc, _ = _full_clip(90_000 + process_index, 2000, FULL_CYC_LEN)
    batch["cyc_imgs"] = cyc  # (FULL_CYC_LEN, H, W, 1): one whole clip
    return batch


def assemble_global(shards):
    """The exact global layout `make_array_from_process_local_data` builds:
    process p's local rows fill its devices' row blocks in rank order."""
    return {k: np.concatenate([s[k] for s in shards], axis=0)
            for k in shards[0]}


def build_batch(process_index: int, process_count: int):
    """First batch of the per-host sharded loaders (`data/loader.py:54-81`):
    local batch = GLOBAL_BATCH // process_count rows."""
    local_bs = GLOBAL_BATCH // process_count
    src = DataLoader(IndexedEchoSet(16, offset=0), local_bs, shuffle=False,
                     num_workers=1, process_index=process_index,
                     process_count=process_count)
    tgt = DataLoader(IndexedEchoSet(16, offset=500), local_bs, shuffle=False,
                     num_workers=1, process_index=process_index,
                     process_count=process_count)
    imgs_s, masks, _, _ = next(iter(src))
    imgs_t, _, _, _ = next(iter(tgt))
    return {"imgs_source": imgs_s, "masks": masks, "imgs_target": imgs_t}
