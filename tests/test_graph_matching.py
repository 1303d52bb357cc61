"""Tests for the graph-matching stack: attention parity, affinity parity,
box/FCOS sampling, spectral clustering, and GModule end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from graphecho_tpu.config import GModuleConfig, NodeSamplerConfig
from graphecho_tpu.models import Affinity, GModule, MultiHeadAttention
from graphecho_tpu.ops.sampling import (
    NodeSet,
    compute_locations,
    fcos_labels,
    masks_to_boxes,
    sample_nodes,
)
from graphecho_tpu.ops.spectral import spectral_bipartition


# --------------------------------------------------------------- attention
def _torch_mha_v2(key, value, query, wk, bk, wv, bv, wq, bq, wf, bf, g, b):
    """Reference MultiHeadAttention v2, heads=1, no dropout
    (transformer.py:43-75) re-run in torch."""
    residual = query
    k = key @ wk.T + bk
    v = value @ wv.T + bv
    q = query @ wq.T + bq
    scale = k.shape[-1] ** -0.5
    attn = torch.softmax(q @ k.T * scale, dim=-1)
    ctx = attn @ v
    out = ctx @ wf.T + bf
    out = torch.nn.functional.layer_norm(residual + out, (out.shape[-1],), g, b)
    return out, attn


def test_mha_matches_reference_v2():
    rng = np.random.RandomState(0)
    n, c = 13, 32
    x = rng.randn(n, c).astype(np.float32)
    mha = MultiHeadAttention(model_dim=c, num_heads=1, dropout=0.0)
    variables = mha.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(x),
                         jnp.asarray(x))
    out, attn = mha.apply(variables, jnp.asarray(x), jnp.asarray(x), jnp.asarray(x))

    p = variables["params"]
    t = lambda a: torch.from_numpy(np.asarray(a))
    want_out, want_attn = _torch_mha_v2(
        t(x), t(x), t(x),
        t(p["linear_k"]["kernel"]).T, t(p["linear_k"]["bias"]),
        t(p["linear_v"]["kernel"]).T, t(p["linear_v"]["bias"]),
        t(p["linear_q"]["kernel"]).T, t(p["linear_q"]["bias"]),
        t(p["linear_final"]["kernel"]).T, t(p["linear_final"]["bias"]),
        t(p["layer_norm"]["scale"]), t(p["layer_norm"]["bias"]))
    np.testing.assert_allclose(np.asarray(out), want_out.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(attn), want_attn.numpy(), atol=2e-5)


def test_mha_key_mask():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(8, 16).astype(np.float32))
    mask = jnp.asarray([True] * 5 + [False] * 3)
    mha = MultiHeadAttention(model_dim=16, num_heads=1)
    variables = mha.init(jax.random.PRNGKey(0), x, x, x)
    _, attn = mha.apply(variables, x, x, x, key_mask=mask)
    assert np.asarray(attn)[:, 5:].max() < 1e-6


# ---------------------------------------------------------------- affinity
def test_affinity_matches_concat_mlp():
    """The split-weight fused form must equal the reference concat-expand MLP."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(7, 16).astype(np.float32))
    y = jnp.asarray(rng.randn(9, 16).astype(np.float32))
    aff = Affinity(d=16)
    variables = aff.init(jax.random.PRNGKey(0), x, y)
    got = np.asarray(aff.apply(variables, x, y))

    p = variables["params"]
    xp = np.asarray(x) @ np.asarray(p["project_sr"]["kernel"])
    yp = np.asarray(y) @ np.asarray(p["project_tg"]["kernel"])
    w1 = np.concatenate([np.asarray(p["fc1_wx"]), np.asarray(p["fc1_wy"])], 0)
    cat = np.concatenate([np.repeat(xp[:, None], 9, 1),
                          np.repeat(yp[None, :], 7, 0)], -1)
    hid = np.maximum(cat @ w1 + np.asarray(p["fc1_b"]), 0)
    want = hid @ np.asarray(p["fc2_w"]) + np.asarray(p["fc2_b"])
    np.testing.assert_allclose(got, want, atol=1e-4)


# ---------------------------------------------------------------- sampling
def test_masks_to_boxes():
    m = np.zeros((1, 10, 12, 2), np.float32)
    m[0, 2:5, 3:8, 0] = 1  # ys 2..4, xs 3..7
    boxes = np.asarray(masks_to_boxes(jnp.asarray(m)))
    np.testing.assert_allclose(boxes[0, 0], [3, 2, 7, 4])
    np.testing.assert_allclose(boxes[0, 1], [0, 0, 12, 10])  # empty -> full


def test_fcos_labels_reference_semantics():
    """Compare against a torch re-run of compute_targets_for_locations."""
    rng = np.random.RandomState(3)
    h = w = 16
    locs = compute_locations([(h, w)], [8])[0]
    boxes = jnp.asarray([[[10.0, 10.0, 90.0, 80.0], [20.0, 20.0, 60.0, 50.0]]])
    soi = (-1.0, 64.0)
    got = np.asarray(fcos_labels(locs, boxes, soi))[0]

    # torch re-run (graph_matching.py:913-959)
    xs = torch.from_numpy(np.asarray(locs[:, 0]))
    ys = torch.from_numpy(np.asarray(locs[:, 1]))
    bx = torch.tensor([[10.0, 10, 90, 80], [20, 20, 60, 50]])
    area = (bx[:, 3] - bx[:, 1]) * (bx[:, 2] - bx[:, 0])
    l = xs[:, None] - bx[:, 0][None]
    t = ys[:, None] - bx[:, 1][None]
    r = bx[:, 2][None] - xs[:, None]
    b = bx[:, 3][None] - ys[:, None]
    reg = torch.stack([l, t, r, b], dim=2)
    in_box = reg.min(dim=2)[0] > 0
    maxreg = reg.max(dim=2)[0]
    cared = (maxreg >= soi[0]) & (maxreg <= soi[1])
    a = area[None].repeat(len(xs), 1).clone()
    a[in_box == 0] = 1e8
    a[cared == 0] = 1e8
    mn, idx = a.min(dim=1)
    labels = idx.clone()
    labels[mn == 1e8] = 0
    np.testing.assert_array_equal(got, labels.numpy())


def test_sample_nodes_budgets_and_masks():
    rng = np.random.RandomState(4)
    cfg = NodeSamplerConfig(pos_budget_per_level=16)
    feats = [jnp.asarray(rng.randn(2, s, s, 8).astype(np.float32))
             for s in (16, 8, 4, 2)]
    masks = np.zeros((2, 64, 64, 2), np.float32)
    masks[:, 10:50, 10:50, 0] = 1
    masks[:, 20:40, 20:30, 1] = 1
    boxes = masks_to_boxes(jnp.asarray(masks))
    ns = sample_nodes(feats, boxes, cfg)
    n_per_level = 16 + cfg.bg_budget_per_level
    assert ns.points.shape == (4 * n_per_level, 8)
    assert ns.valid.dtype == jnp.bool_
    v = np.asarray(ns.valid)
    labs = np.asarray(ns.labels)
    assert v.any()
    assert (labs[v] >= 0).all() and (labs[v] <= 1).all()
    # padded slots are zeroed
    assert np.abs(np.asarray(ns.points)[~v]).max() == 0
    # jit-compatible with static shapes
    jitted = jax.jit(lambda f, b: sample_nodes(f, b, cfg))
    ns2 = jitted(feats, boxes)
    np.testing.assert_array_equal(np.asarray(ns2.labels), labs)


# ---------------------------------------------------------------- spectral
def test_spectral_bipartition_separates_clusters():
    rng = np.random.RandomState(5)
    a = rng.randn(12, 8).astype(np.float32) * 0.1
    b = rng.randn(10, 8).astype(np.float32) * 0.1 + 5.0
    pts = jnp.asarray(np.concatenate([a, b]))
    pad = jnp.zeros((6, 8))
    pts = jnp.concatenate([pts, pad])
    valid = jnp.asarray([True] * 22 + [False] * 6)
    assign = np.asarray(spectral_bipartition(pts, valid))
    assert (assign[:12] == assign[0]).all()
    assert (assign[12:22] == assign[12]).all()
    assert assign[0] != assign[12]
    assert (assign[22:] == -1).all()


def test_spectral_lanczos_matches_eigh():
    """The deflated-Lanczos Fiedler solver (the fast default) must produce
    the same bipartition as the exact dense eigh solve, up to label swap."""
    rng = np.random.RandomState(11)
    for trial in range(5):
        n_valid = rng.randint(12, 90)
        half = n_valid // 2
        pts = np.zeros((96, 16), np.float32)
        pts[:half] = rng.randn(half, 16) * 0.3
        pts[half:n_valid] = rng.randn(n_valid - half, 16) * 0.3 + 3.0
        pts[n_valid:] = rng.randn(96 - n_valid, 16) * 10
        valid = jnp.asarray(np.arange(96) < n_valid)
        a_l = np.asarray(spectral_bipartition(jnp.asarray(pts), valid,
                                              solver="lanczos"))
        a_e = np.asarray(spectral_bipartition(jnp.asarray(pts), valid,
                                              solver="eigh"))
        v = np.asarray(valid)
        m = (a_l[v] == a_e[v]).mean()
        assert max(m, 1 - m) > 0.95, (trial, m)
        assert (a_l[~v] == -1).all()
        # cleanly separated clusters must also report a trustworthy solve
        _, ok = spectral_bipartition(jnp.asarray(pts), valid,
                                     solver="lanczos", with_quality=True)
        assert bool(ok), trial


def test_spectral_quality_flags_near_degenerate():
    """r3 review item 5: the Lanczos Fiedler solve carries a runtime quality
    signal (Paige residual of the selected Ritz pair vs ritz_tol). Measured
    reality this pins down:

      (a) near-degenerate single-blob node sets at the production operating
          point (dense k = n/2 graph, m = 24) EXHAUST the Krylov space —
          the solve is exact-by-invariant-subspace: certified ok AND
          identical to the dense eigh bipartition;
      (b) a genuinely under-resolved solve (path-like sparse graph with a
          starved step budget — residual ~0.13 measured at m=4 vs ~0.006 at
          m=24) is FLAGGED, and the flag propagates through
          `seed_consistent_mean` so the GModule takes the plain-mean branch
          (the reference's own fallback for swallowed sklearn failures,
          graph_matching.py:544-546)."""
    from graphecho_tpu.ops.spectral import seed_consistent_mean

    rng = np.random.RandomState(3)
    # (a) ambiguous blobs: certified AND exact
    for trial in range(4):
        pts = rng.randn(80, 16).astype(np.float32)
        valid = jnp.ones((80,), bool)
        a_l, ok = spectral_bipartition(jnp.asarray(pts), valid,
                                       solver="lanczos", with_quality=True)
        assert bool(ok), trial
        a_e = np.asarray(spectral_bipartition(jnp.asarray(pts), valid,
                                              solver="eigh"))
        m = (np.asarray(a_l) == a_e).mean()
        assert max(m, 1 - m) == 1.0, (trial, m)

    # (b) hard spectrum + starved budget: flag fires...
    line = np.concatenate(
        [np.linspace(0, 1, 100)[:, None],
         0.01 * rng.randn(100, 15)], axis=1).astype(np.float32)
    valid = jnp.ones((100,), bool)
    _, ok_starved = spectral_bipartition(jnp.asarray(line), valid,
                                         solver="lanczos", k=jnp.asarray(2),
                                         with_quality=True, lanczos_steps=4)
    assert not bool(ok_starved)
    # ...and the default budget converges the same spectrum (residual
    # ~0.006 < ritz_tol) — the flag tracks solve quality, not input class
    _, ok_full = spectral_bipartition(jnp.asarray(line), valid,
                                      solver="lanczos", k=jnp.asarray(2),
                                      with_quality=True)
    assert bool(ok_full)
    # eigh path always certifies
    _, ok_eigh = spectral_bipartition(jnp.asarray(line), valid,
                                      solver="eigh", k=jnp.asarray(2),
                                      with_quality=True)
    assert bool(ok_eigh)

    # seed_consistent_mean operates at the production point (dense k = n/2):
    # there the Krylov space exhausts — even a 4-step budget is certified
    # exact (its ok bit composes `(cnt > 0) & solve_ok`, so an unconverged
    # solve would route GModule.update_seed to the plain-mean branch)
    _, ok_scm = seed_consistent_mean(jnp.asarray(line[0]),
                                     jnp.asarray(line[1:]),
                                     jnp.ones((99,), bool),
                                     solver="lanczos", lanczos_steps=4)
    assert bool(ok_scm)


def test_spectral_missed_lower_probe_detects_blind_spot():
    """r4 advisor: a start vector orthogonal to the Fiedler direction
    exhausts the Krylov space with residual 0 and certifies the WRONG
    eigenpair — the complement probe exists to catch exactly that. Build the
    scenario deterministically: replicate the solver's hash-noise start x,
    then craft a symmetric operator with eigenvalue 0 on the deflated v0,
    0.1 on a direction orthogonal to BOTH v0 and x (invisible to the primary
    solve), and 1.0 elsewhere."""
    from graphecho_tpu.ops.spectral import _fiedler_lanczos

    n = 32
    fvalid = jnp.ones((n,), jnp.float32)
    deg = jnp.ones((n,), jnp.float32)
    v0 = jnp.ones((n,), jnp.float32) / jnp.sqrt(jnp.asarray(float(n)))
    # the solver's own deterministic start (spectral.py), deflated against v0
    i = jnp.arange(n, dtype=jnp.float32)
    x = jnp.sin(i * 12.9898 + 78.233) * 43758.5453
    x = x - jnp.floor(x) - 0.5
    x = x - jnp.dot(v0, x) * v0
    x = x / jnp.linalg.norm(x)
    rng = np.random.RandomState(0)
    vf = jnp.asarray(rng.randn(n).astype(np.float32))
    vf = vf - jnp.dot(v0, vf) * v0
    vf = vf - jnp.dot(x, vf) * x
    vf = vf / jnp.linalg.norm(vf)
    lap = (jnp.eye(n, dtype=jnp.float32) - jnp.outer(v0, v0)
           - 0.9 * jnp.outer(vf, vf))  # spec: {0 on v0, 0.1 on vf, 1 else}

    fied, residual, missed = _fiedler_lanczos(lap, deg, fvalid)
    # primary space exhausts on the lambda=1 eigenspace: residual certifies...
    assert float(residual) <= 0.05
    # ...the wrong pair, and the probe is what catches it
    assert bool(missed)
    # margin wiring (r5): a margin wider than the 0.9 gap mutes the detector
    # (spectral_bipartition passes its ritz_tol here, so detector resolution
    # follows the caller's tolerance)
    *_, missed_wide = _fiedler_lanczos(lap, deg, fvalid, probe_margin=1.0)
    assert not bool(missed_wide)


# ----------------------------------------------------------------- GModule
def _toy_nodeset(rng, n, c, num_classes, n_valid):
    pts = rng.randn(n, c).astype(np.float32)
    labels = rng.randint(0, num_classes, size=n).astype(np.int32)
    valid = np.zeros(n, bool)
    valid[:n_valid] = True
    return NodeSet(points=jnp.asarray(pts * valid[:, None]),
                   labels=jnp.asarray(labels),
                   weights=jnp.asarray(valid.astype(np.float32)),
                   valid=jnp.asarray(valid))


def test_gmodule_end_to_end():
    rng = np.random.RandomState(6)
    cfg = GModuleConfig(in_channels=32, num_classes=3, nodes_per_class=16)
    gm = GModule(cfg)
    src = _toy_nodeset(rng, 64, 32, 3, 40)
    tgt = _toy_nodeset(rng, 64, 32, 3, 30)
    seeds = (jnp.asarray(rng.randn(3, 32).astype(np.float32)),
             jnp.asarray(rng.randn(3, 32).astype(np.float32)))
    variables = gm.init({"params": jax.random.PRNGKey(0),
                         "gmodule": jax.random.PRNGKey(1),
                         "dropout": jax.random.PRNGKey(2)}, src, tgt, seeds)
    losses, new_seeds, (g1, g2) = gm.apply(
        variables, src, tgt, seeds, train=True,
        rngs={"gmodule": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)})
    # reference loss-dict keys (train_camus_echo.py:222; graph_matching.py:270,341,346,350)
    assert set(losses) == {"dis_loss", "node_loss", "mat_loss_aff", "mat_loss_qu"}
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    # seeds updated for present classes
    assert not np.allclose(np.asarray(new_seeds[0]), np.asarray(seeds[0]))
    assert g1.nodes.shape == (3 * 16, 32)


def test_gmodule_few_source_nodes_gates_losses():
    rng = np.random.RandomState(7)
    cfg = GModuleConfig(in_channels=32, num_classes=3, nodes_per_class=16)
    gm = GModule(cfg)
    src = _toy_nodeset(rng, 64, 32, 3, 5)  # < 6 valid source nodes
    tgt = _toy_nodeset(rng, 64, 32, 3, 30)
    seeds = (jnp.asarray(rng.randn(3, 32).astype(np.float32)),
             jnp.asarray(rng.randn(3, 32).astype(np.float32)))
    variables = gm.init({"params": jax.random.PRNGKey(0),
                         "gmodule": jax.random.PRNGKey(1),
                         "dropout": jax.random.PRNGKey(2)}, src, tgt, seeds)
    losses, new_seeds, _ = gm.apply(
        variables, src, tgt, seeds, train=True,
        rngs={"gmodule": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)})
    for k, v in losses.items():
        assert float(v) == 0.0, k  # early-exit semantics (graph_matching.py:259-260)
    np.testing.assert_allclose(np.asarray(new_seeds[0]), np.asarray(seeds[0]))


def test_gmodule_hallucination_when_class_missing():
    rng = np.random.RandomState(8)
    cfg = GModuleConfig(in_channels=32, num_classes=3, nodes_per_class=16)
    gm = GModule(cfg)
    src = _toy_nodeset(rng, 64, 32, 3, 40)
    # target has ONLY class 0 nodes
    tgt_pts = rng.randn(64, 32).astype(np.float32)
    tgt = NodeSet(points=jnp.asarray(tgt_pts),
                  labels=jnp.zeros(64, jnp.int32),
                  weights=jnp.ones(64, jnp.float32),
                  valid=jnp.asarray([True] * 30 + [False] * 34))
    seeds = (jnp.asarray(rng.randn(3, 32).astype(np.float32)),
             jnp.asarray(rng.randn(3, 32).astype(np.float32)))
    variables = gm.init({"params": jax.random.PRNGKey(0),
                         "gmodule": jax.random.PRNGKey(1),
                         "dropout": jax.random.PRNGKey(2)}, src, tgt, seeds)
    losses, _, (g1, g2) = gm.apply(
        variables, src, tgt, seeds, train=True,
        rngs={"gmodule": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)})
    # classes 1,2 exist in source; target side must have hallucinated validity
    v2 = np.asarray(g2.valid).reshape(3, 16)
    v1 = np.asarray(g1.valid).reshape(3, 16)
    for c in (1, 2):
        if v1[c].any():
            assert v2[c].sum() == v1[c].sum()  # mirrored count
    for v in losses.values():
        assert np.isfinite(float(v))


def test_gmodule_m2m_and_global_graph():
    import dataclasses
    rng = np.random.RandomState(9)
    cfg = GModuleConfig(in_channels=32, num_classes=3, nodes_per_class=16,
                        matching_cfg="m2m", with_global_graph=True,
                        node_dis_place="intra")
    gm = GModule(cfg)
    src = _toy_nodeset(rng, 64, 32, 3, 40)
    tgt = _toy_nodeset(rng, 64, 32, 3, 30)
    seeds = (jnp.asarray(rng.randn(3, 32).astype(np.float32)),
             jnp.asarray(rng.randn(3, 32).astype(np.float32)))
    variables = gm.init({"params": jax.random.PRNGKey(0),
                         "gmodule": jax.random.PRNGKey(1),
                         "dropout": jax.random.PRNGKey(2)}, src, tgt, seeds)
    losses, _, _ = gm.apply(
        variables, src, tgt, seeds, train=True,
        rngs={"gmodule": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)})
    assert "mat_loss_aff" in losses and "dis_loss" in losses
    for k, v in losses.items():
        assert np.isfinite(float(v)), k


def test_gmodule_matching_loss_types_and_score_weight():
    """The L1/MSE matching-loss alternatives (`graph_matching.py:182-188`)
    and with_score_weight node-CE weighting (`:519-529`) are live knobs
    (VERDICT r1 item 6)."""
    import dataclasses

    rng = np.random.RandomState(10)
    base = GModuleConfig(in_channels=32, num_classes=3, nodes_per_class=16)
    src = _toy_nodeset(rng, 64, 32, 3, 40)
    # target with non-trivial confidence weights
    tgt = _toy_nodeset(rng, 64, 32, 3, 30)
    tgt = tgt._replace(weights=jnp.asarray(
        (rng.rand(64) * np.asarray(tgt.valid)).astype(np.float32)))
    seeds = (jnp.asarray(rng.randn(3, 32).astype(np.float32)),
             jnp.asarray(rng.randn(3, 32).astype(np.float32)))

    def run(cfg):
        gm = GModule(cfg)
        variables = gm.init({"params": jax.random.PRNGKey(0),
                             "gmodule": jax.random.PRNGKey(1),
                             "dropout": jax.random.PRNGKey(2)}, src, tgt, seeds)
        losses, _, _ = gm.apply(
            variables, src, tgt, seeds, train=True,
            rngs={"gmodule": jax.random.PRNGKey(3),
                  "dropout": jax.random.PRNGKey(4)})
        return {k: float(v) for k, v in losses.items()}

    fl = run(base)
    l1 = run(dataclasses.replace(base, matching_loss_type="L1"))
    mse = run(dataclasses.replace(base, matching_loss_type="MSE"))
    for d in (fl, l1, mse):
        assert np.isfinite(d["mat_loss_aff"])
    # the knob changes the loss value (same params/rngs otherwise)
    assert fl["mat_loss_aff"] != l1["mat_loss_aff"]
    assert l1["mat_loss_aff"] != mse["mat_loss_aff"]

    sw = run(dataclasses.replace(base, with_score_weight=True))
    assert np.isfinite(sw["node_loss"])
    assert sw["node_loss"] != fl["node_loss"]


def test_tgcn_gru_cells():
    from graphecho_tpu.models.tgcn_cells import (
        TGCNCell, laplacian_with_self_loop, laplacian_without_self_loop)
    import torch

    rng = np.random.RandomState(10)
    x = rng.rand(2, 6, 6).astype(np.float32)
    got = np.asarray(laplacian_with_self_loop(jnp.asarray(x)))
    # torch reference re-run (TGCN.py:11-23)
    outs = []
    for m in torch.from_numpy(x):
        m = m + torch.eye(m.size(0))
        d = m.sum(1).pow(-0.5).flatten()
        d[torch.isinf(d)] = 0.0
        dm = torch.diag(d)
        outs.append((m @ dm).T @ dm)
    want = torch.stack(outs).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)

    lap = laplacian_without_self_loop(jnp.asarray(x[0]), normalize=False)
    assert np.allclose(np.asarray(lap).sum(-1), 0, atol=1e-5)

    cell = TGCNCell(input_dim=6, hidden_dim=4)
    inputs = jnp.asarray(rng.rand(2, 6, 6).astype(np.float32))
    hidden = jnp.zeros((2, 24))
    v = cell.init(jax.random.PRNGKey(0), inputs, hidden)
    out, new_h = cell.apply(v, inputs, hidden)
    assert out.shape == (2, 24)
    np.testing.assert_allclose(np.asarray(out), np.asarray(new_h))


def test_pallas_pairwise_mlp_interpret_matches_xla():
    from graphecho_tpu.ops.pairwise_mlp import pairwise_mlp
    from graphecho_tpu.ops.pallas.pairwise_mlp_kernel import pallas_pairwise_mlp

    rng = np.random.RandomState(11)
    a = jnp.asarray(rng.randn(70, 40).astype(np.float32))
    b = jnp.asarray(rng.randn(50, 40).astype(np.float32))
    w2 = jnp.asarray(rng.randn(40).astype(np.float32))
    b2 = jnp.float32(0.2)
    got = pallas_pairwise_mlp(a, b, w2, b2, True)  # interpret mode
    want = pairwise_mlp(a, b, w2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)

    t = jnp.asarray(rng.randn(70, 50).astype(np.float32))
    gp = jax.grad(lambda *xs: jnp.sum((pallas_pairwise_mlp(*xs, True) - t) ** 2),
                  argnums=(0, 1, 2, 3))(a, b, w2, b2)
    gx = jax.grad(lambda *xs: jnp.sum((pairwise_mlp(*xs) - t) ** 2),
                  argnums=(0, 1, 2, 3))(a, b, w2, b2)
    for p, x in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(p), np.asarray(x), rtol=1e-3,
                                   atol=1e-3)
