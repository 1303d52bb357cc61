"""Tests for ViG graph primitives, DeepGCN, and TGCN."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from graphecho_tpu.config import TGCNConfig
from graphecho_tpu.models.tgcn import TGCN
from graphecho_tpu.models.vig import DeepGCN, MRConv, get_2d_sincos_pos_embed
from graphecho_tpu.ops.knn import (
    dense_knn,
    dilated_knn_graph,
    gather_neighbors,
    l2_normalize,
    pairwise_sq_distance,
)


def test_pairwise_distance_matches_torch():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 10, 6).astype(np.float32)
    got = np.asarray(pairwise_sq_distance(jnp.asarray(x)))
    xt = torch.from_numpy(x)
    inner = -2 * torch.matmul(xt, xt.transpose(2, 1))
    sq = torch.sum(xt * xt, dim=-1, keepdim=True)
    want = (sq + inner + sq.transpose(2, 1)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_dense_knn_matches_torch_topk():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 20, 8).astype(np.float32)
    k = 5
    got = np.asarray(dense_knn(jnp.asarray(x), k=k))
    xt = torch.from_numpy(x)
    inner = -2 * torch.matmul(xt, xt.transpose(2, 1))
    sq = torch.sum(xt * xt, dim=-1, keepdim=True)
    dist = sq + inner + sq.transpose(2, 1)
    _, want = torch.topk(-dist, k=k)
    np.testing.assert_array_equal(np.sort(got, -1), np.sort(want.numpy(), -1))


def test_knn_edges_reference_format():
    """(nn_idx, center_idx) stack-layout parity with the reference's
    dense_knn_matrix (`vig.py:299-309`): center rows repeat the row index k
    times; nn_idx equals the plain dense_knn result."""
    from graphecho_tpu.ops.knn import knn_edges_reference_format

    rng = np.random.RandomState(9)
    x = jnp.asarray(rng.randn(2, 12, 4).astype(np.float32))
    nn_idx, center = knn_edges_reference_format(x, None, k=3)
    assert nn_idx.shape == (2, 12, 3) and center.shape == (2, 12, 3)
    np.testing.assert_array_equal(np.asarray(center[0, 5]), [5, 5, 5])
    np.testing.assert_array_equal(np.asarray(center[1, 0]), [0, 0, 0])
    np.testing.assert_array_equal(np.asarray(nn_idx),
                                  np.asarray(dense_knn(x, k=3)))


def test_xy_knn_normalized():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 12, 4).astype(np.float32))
    y = jnp.asarray(rng.randn(1, 12, 4).astype(np.float32))
    idx = dilated_knn_graph(x, y, k=3, dilation=1)
    assert idx.shape == (1, 12, 3)
    assert int(idx.max()) < 12
    # dilation: k*d candidates, every d-th kept
    idx_d = dilated_knn_graph(x, y, k=3, dilation=2)
    assert idx_d.shape == (1, 12, 3)


def test_gather_neighbors():
    x = jnp.arange(24, dtype=jnp.float32).reshape(1, 6, 4)
    idx = jnp.asarray([[[0, 2], [1, 3], [5, 0], [2, 2], [4, 1], [3, 5]]])
    out = np.asarray(gather_neighbors(x, idx))
    assert out.shape == (1, 6, 2, 4)
    np.testing.assert_allclose(out[0, 0, 1], np.asarray(x)[0, 2])
    np.testing.assert_allclose(out[0, 2, 0], np.asarray(x)[0, 5])


def test_mrconv_interleave_semantics():
    """MRConv must interleave [x_c0, agg_c0, x_c1, agg_c1, ...] (vig.py:104)."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 6, 8).astype(np.float32))
    idx = dense_knn(x, k=3)
    m = MRConv(out_channels=8, act="gelu", norm=None)
    variables = m.init(jax.random.PRNGKey(0), x, idx)
    out = m.apply(variables, x, idx)
    assert out.shape == (1, 6, 8)
    # grouped conv kernel must consume 2*C channels in 4 groups
    kshape = variables["params"]["nn"]["conv_0"]["kernel"].shape
    assert kshape == (1, 16 // 4, 8)


def test_relative_pos_bicubic_matches_torch():
    """The Grapher relative_pos buffer uses torch-exact bicubic (a=-0.75,
    align_corners=False, clamped taps) — `F.interpolate` parity
    (reference `vig.py:406-412`)."""
    from graphecho_tpu.models.vig import (_torch_bicubic_matrix,
                                          get_2d_relative_pos_embed)

    for n_out, m_out in [(196, 49), (256, 64)]:
        rel = get_2d_relative_pos_embed(64, 14).astype(np.float32)
        want = F.interpolate(torch.from_numpy(rel)[None, None],
                             size=(n_out, m_out), mode="bicubic",
                             align_corners=False)[0, 0].numpy()
        wr = _torch_bicubic_matrix(n_out, rel.shape[0])
        wc = _torch_bicubic_matrix(m_out, rel.shape[1])
        np.testing.assert_allclose(wr @ rel @ wc.T, want, atol=1e-4)


def test_queue_update_duplicate_labels_sequential():
    """Duplicate update indices must compose as sequential EMA steps (the
    reference's python loop, `TGCN.py:296-302`), not a summed one-shot write."""
    cfg = TGCNConfig(input_dim=8, hidden_dim=8, clip_shape=(2, 2, 2),
                     knn_k=2, queue_size=5, cluster_method="momentum_queue")
    tgcn = TGCN(cfg)
    m = cfg.queue_momentum
    q0 = np.random.RandomState(0).rand(8, 5).astype(np.float32)
    feats = np.random.RandomState(1).rand(2, 8).astype(np.float32)
    labels = np.array([3, 3], np.int32)  # duplicate column
    out = np.asarray(tgcn._queue_update(jnp.asarray(q0), jnp.asarray(feats),
                                        jnp.asarray(labels), m))
    want = q0.copy()
    for i in range(2):  # sequential reference semantics
        want[:, 3] = want[:, 3] * m + feats[i] * (1 - m)
    np.testing.assert_allclose(out, want, rtol=1e-6)
    # untouched columns unchanged
    np.testing.assert_array_equal(out[:, :3], q0[:, :3])


def test_sincos_matches_reference_numpy():
    """Port parity for the 2D sincos embedding (vig.py:38-85)."""
    got = get_2d_sincos_pos_embed(16, 4)

    def ref_1d(embed_dim, pos):
        omega = np.arange(embed_dim // 2, dtype=np.float64)
        omega /= embed_dim / 2.0
        omega = 1.0 / 10000**omega
        pos = pos.reshape(-1)
        out = np.einsum("m,d->md", pos, omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    grid_h = np.arange(4, dtype=np.float32)
    grid_w = np.arange(4, dtype=np.float32)
    grid = np.stack(np.meshgrid(grid_w, grid_h), axis=0).reshape(2, 1, 4, 4)
    want = np.concatenate([ref_1d(8, grid[0]), ref_1d(8, grid[1])], axis=1)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_deepgcn_tiny_forward():
    model = DeepGCN(blocks=(1, 1), channels=(8, 16), k=4, n_classes=10,
                    img_size=32)
    x = jnp.zeros((2, 32, 32, 3))
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, x)
    out, _ = model.apply(variables, x, train=True, mutable=["batch_stats"],
                         rngs={"dropout": jax.random.PRNGKey(2)})
    assert out.shape == (2, 10)
    assert np.isfinite(np.asarray(out)).all()


def test_tgcn_end_to_end():
    """Canonical contract from the reference smoke block (TGCN.py:328-339),
    scaled down: clip pyramid + GModule nodes -> loss dict + updated queues."""
    cfg = TGCNConfig(input_dim=32, hidden_dim=32, clip_shape=(4, 8, 8),
                     knn_k=4, cluster_method="momentum_queue",
                     queue_size=20, pool_ratios=(8, 4, 2, 1))
    rng = np.random.RandomState(4)
    b, t = 4, 4
    clips = [jnp.asarray(rng.randn(b, t, s, s, 32).astype(np.float32))
             for s in (64, 32, 16, 8)]
    src_nodes = jnp.asarray(rng.randn(33, 32).astype(np.float32))
    tgt_nodes = jnp.asarray(rng.randn(29, 32).astype(np.float32))
    src_valid = jnp.asarray([True] * 30 + [False] * 3)
    tgt_valid = jnp.ones(29, bool)
    queues = (jnp.asarray(rng.randn(32, 20).astype(np.float32)),
              jnp.asarray(rng.randn(32, 20).astype(np.float32)))
    idx = (jnp.asarray([0, 5]), jnp.asarray([3, 7]))

    model = TGCN(cfg)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           clips, src_nodes, src_valid, tgt_nodes, tgt_valid,
                           queues, idx)
    (losses, new_queues), _ = model.apply(
        variables, clips, src_nodes, src_valid, tgt_nodes, tgt_valid,
        queues, idx, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(2)})
    assert set(losses) == {"clustering_loss", "node_dis_loss"}
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    # queue columns at update indices changed, others untouched
    dq = np.abs(np.asarray(new_queues[0]) - np.asarray(queues[0])).max(axis=0)
    assert dq[0] > 0 and dq[5] > 0
    assert dq[1] == 0 and dq[19] == 0


def test_tgcn_bf16_compute_f32_inputs():
    """Regression: under dtype=bfloat16 the lax.scan recurrence carry must be
    initialized in the CELL's output dtype, not the (f32) input clips' dtype —
    the mismatch broke every bf16 temporal recipe (scan carry type error)."""
    cfg = TGCNConfig(input_dim=16, hidden_dim=16, clip_shape=(2, 4, 4),
                     knn_k=3, cluster_method="momentum_queue", queue_size=5,
                     pool_ratios=(4, 2, 1, 1))
    rng = np.random.RandomState(6)
    clips = [jnp.asarray(rng.randn(2, 2, s, s, 16).astype(np.float32))
             for s in (16, 8, 4, 4)]
    nodes = jnp.asarray(rng.randn(10, 16).astype(np.float32))
    valid = jnp.ones(10, bool)
    queues = (jnp.zeros((16, 5)), jnp.zeros((16, 5)))
    idx = (jnp.asarray([0]), jnp.asarray([1]))
    model = TGCN(cfg, dtype=jnp.bfloat16)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           clips, nodes, valid, nodes, valid, queues, idx)
    (losses, _), _ = model.apply(
        variables, clips, nodes, valid, nodes, valid, queues, idx,
        train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(2)})
    for k, v in losses.items():
        assert np.isfinite(float(v)), k


def test_tgcn_sinkhorn_transport():
    cfg = TGCNConfig(input_dim=16, hidden_dim=16, clip_shape=(2, 4, 4),
                     knn_k=3, cluster_method=None,
                     transport_method="sinkhorn_distance",
                     pool_ratios=(4, 2, 1, 1))
    rng = np.random.RandomState(5)
    clips = [jnp.asarray(rng.randn(2, 2, s, s, 16).astype(np.float32))
             for s in (16, 8, 4, 4)]
    nodes = jnp.asarray(rng.randn(10, 16).astype(np.float32))
    valid = jnp.ones(10, bool)
    queues = (jnp.zeros((16, 5)), jnp.zeros((16, 5)))
    idx = (jnp.asarray([0]), jnp.asarray([1]))
    model = TGCN(cfg)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           clips, nodes, valid, nodes, valid, queues, idx)
    (losses, _), _ = model.apply(
        variables, clips, nodes, valid, nodes, valid, queues, idx,
        train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(2)})
    assert "sinkhorn_loss" in losses
    assert np.isfinite(float(losses["sinkhorn_loss"]))


def test_pallas_knn_interpret_matches_xla():
    """The fused kernel (interpret mode on CPU) must match the XLA path."""
    from graphecho_tpu.ops.pallas.knn_kernel import pallas_knn

    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(2, 40, 16).astype(np.float32))
    got = pallas_knn(x, k=5, normalize=True, block_q=8, interpret=True)
    want = dense_knn(l2_normalize(x), k=5)
    np.testing.assert_array_equal(np.sort(np.asarray(got), -1),
                                  np.sort(np.asarray(want), -1))

    y = jnp.asarray(rng.randn(2, 24, 16).astype(np.float32))
    got2 = pallas_knn(x, y, k=4, block_q=8, interpret=True)
    want2 = dense_knn(l2_normalize(x), l2_normalize(y), k=4)
    np.testing.assert_array_equal(np.sort(np.asarray(got2), -1),
                                  np.sort(np.asarray(want2), -1))

    rel = jnp.asarray(rng.randn(1, 40, 40).astype(np.float32)) * 0.1
    got3 = pallas_knn(x, k=5, relative_pos=rel, block_q=8, interpret=True)
    want3 = dense_knn(l2_normalize(x), k=5,
                      relative_pos=rel)
    np.testing.assert_array_equal(np.sort(np.asarray(got3), -1),
                                  np.sort(np.asarray(want3), -1))


def test_adaptive_avg_pool2d_matches_torch():
    import torch
    import torch.nn.functional as TF

    from graphecho_tpu.ops.resize import adaptive_avg_pool2d

    rng = np.random.RandomState(11)
    for (h, w), (oh, ow) in [((28, 28), (8, 8)), ((7, 7), (3, 3)),
                             ((4, 4), (8, 8)), ((16, 16), (4, 4)),
                             ((14, 7), (8, 8))]:
        x = rng.rand(2, h, w, 5).astype(np.float32)
        got = np.asarray(adaptive_avg_pool2d(jnp.asarray(x), (oh, ow)))
        want = TF.adaptive_avg_pool2d(
            torch.from_numpy(x).permute(0, 3, 1, 2), (oh, ow)
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, want, atol=1e-6, err_msg=f"{h}x{w}")
    # divisible case == fixed-window avg_pool (the reference's pooling)
    from flax.linen import avg_pool

    x = jnp.asarray(rng.rand(2, 16, 16, 5).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(adaptive_avg_pool2d(x, (4, 4))),
        np.asarray(avg_pool(x, (4, 4), (4, 4))), atol=1e-6)


def test_tgcn_camus_112_geometry():
    """The CAMUS 112² pyramid (28/14/7/4) cannot close an 8x8 grid with fixed
    r-pooling (the reference crashes); adaptive pooling makes the temporal
    branch usable there."""
    from graphecho_tpu.config import TGCNConfig
    from graphecho_tpu.models.tgcn import TGCN

    cfg = TGCNConfig(input_dim=32, hidden_dim=32, clip_shape=(2, 8, 8),
                     knn_k=4, queue_size=6, cluster_method="momentum_queue")
    rng = np.random.RandomState(12)
    clips = [jnp.asarray(rng.rand(2, 2, s, s, 32).astype(np.float32))
             for s in (28, 14, 7, 4)]
    nodes = jnp.asarray(rng.rand(10, 32).astype(np.float32))
    valid = jnp.ones(10, bool)
    queues = (jnp.asarray(rng.rand(32, 6).astype(np.float32)),
              jnp.asarray(rng.rand(32, 6).astype(np.float32)))
    idx = (jnp.asarray([0]), jnp.asarray([1]))
    tgcn = TGCN(cfg)
    variables = tgcn.init({"params": jax.random.PRNGKey(0),
                           "dropout": jax.random.PRNGKey(1)},
                          clips, nodes, valid, nodes, valid, queues, idx)
    (losses, new_queues), _ = tgcn.apply(
        variables, clips, nodes, valid, nodes, valid, queues, idx,
        train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(2)})
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
