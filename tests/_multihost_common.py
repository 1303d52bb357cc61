"""Shared pieces of the multi-host test: a per-index-deterministic dataset,
the tiny base-UDA config, and the per-host batch builder. Imported both by
the pytest process (single-process reference run) and by the 2-process
subprocess drivers — determinism across processes is the whole point."""

import numpy as np

from graphecho_tpu.config import (
    DataConfig,
    ExperimentConfig,
    GModuleConfig,
    ModelConfig,
    NodeSamplerConfig,
    TrainConfig,
)
from graphecho_tpu.data.loader import DataLoader

H = W = 32
GLOBAL_BATCH = 8


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
