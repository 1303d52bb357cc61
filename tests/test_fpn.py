"""Shape/behavior tests for backbones, FPN, and discriminator.

Canonical contract from the reference smoke block (`fpnseg.py:514-524`) and the
trainer configs; sizes shrunk (64x64) to keep CPU-mesh compile times sane.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphecho_tpu.models import FPN, Discriminator


@pytest.mark.parametrize("backbone", ["VGG16", "resnet"])
def test_fpn_shapes(backbone):
    model = FPN(num_classes=2, back_bone=backbone)
    x = jnp.zeros((2, 64, 64, 1))
    variables = model.init(jax.random.PRNGKey(0), x)
    (logits, feats), _ = model.apply(variables, x, train=True,
                                     mutable=["batch_stats"])
    assert logits.shape == (2, 64, 64, 2)
    # p2..p5 at strides 4/8/16/32 for both backbones at even sizes
    assert [f.shape[1] for f in feats] == [16, 8, 4, 2]
    assert all(f.shape[-1] == 256 for f in feats)


@pytest.mark.parametrize("backbone", ["VGG16", "resnet"])
def test_fpn_remat_identical(backbone):
    """`remat=True` is a memory knob, not a math knob: identical param paths
    (checkpoint compatibility) and identical forward + gradients."""
    base = FPN(num_classes=2, back_bone=backbone)
    rem = FPN(num_classes=2, back_bone=backbone, remat=True)
    x = jnp.asarray(np.random.RandomState(3).rand(2, 64, 64, 1), jnp.float32)
    variables = base.init(jax.random.PRNGKey(0), x)
    v_rem = rem.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(variables)
            == jax.tree_util.tree_structure(v_rem))

    def loss(model, variables):
        (logits, _), mut = model.apply(variables, x, train=True,
                                       mutable=["batch_stats"])
        return jnp.sum(logits ** 2), mut["batch_stats"]

    (l0, bs0), g0 = jax.value_and_grad(
        lambda p: loss(base, {**variables, "params": p}), has_aux=True)(
        variables["params"])
    (l1, bs1), g1 = jax.value_and_grad(
        lambda p: loss(rem, {**variables, "params": p}), has_aux=True)(
        variables["params"])
    np.testing.assert_allclose(np.asarray(l0), np.asarray(l1), rtol=1e-6)
    # gradients match to reduction-reorder noise: remat recomputes the
    # forward inside the backward, so XLA fuses/reduces in a different order
    # (f32, deep resnet grads span ~1e-2..1e4 within one leaf) — compare to a
    # per-leaf norm-scaled tolerance, not elementwise rtol
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        a, b = np.asarray(a), np.asarray(b)
        tol = 1e-4 * max(1.0, float(np.abs(b).max()))
        np.testing.assert_allclose(a, b, rtol=0, atol=tol)
    for a, b in zip(jax.tree_util.tree_leaves(bs0),
                    jax.tree_util.tree_leaves(bs1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_fpn_eval_deterministic_and_bn_updates():
    model = FPN(num_classes=1, back_bone="resnet")
    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    y1, _ = model.apply(variables, x, train=False)
    y2, _ = model.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2))

    _, mutated = model.apply(variables, x, train=True, mutable=["batch_stats"])
    before = variables["batch_stats"]["backbone"]["bn1"]["mean"]
    after = mutated["batch_stats"]["backbone"]["bn1"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_discriminator_loss_and_grad():
    dis = Discriminator(grad_reverse_lambda=0.02)
    rng = np.random.RandomState(2)
    f_s = jnp.asarray(rng.rand(2, 8, 8, 256), jnp.float32)
    f_t = jnp.asarray(rng.rand(2, 8, 8, 256), jnp.float32)
    variables = dis.init(jax.random.PRNGKey(0), (f_s, f_t))
    loss = dis.apply(variables, (f_s, f_t))
    assert loss.shape == ()
    assert float(loss) > 0

    grads = jax.grad(lambda feats: dis.apply(variables, feats))((f_s, f_t))
    assert np.asarray(grads[0]).std() > 0  # gradient flows through GRL


def test_discriminator_fused_apply_matches_two_pass():
    """The batched source+target tower apply must equal two separate passes
    (conv/GroupNorm are per-sample), including unequal batch sizes."""
    from graphecho_tpu.train.losses import bce_with_logits

    dis = Discriminator(grad_reverse_lambda=0.02)
    rng = np.random.RandomState(3)
    f_s = jnp.asarray(rng.rand(3, 8, 8, 256), jnp.float32)
    f_t = jnp.asarray(rng.rand(5, 8, 8, 256), jnp.float32)
    variables = dis.init(jax.random.PRNGKey(0), (f_s, f_t))
    fused = float(dis.apply(variables, (f_s, f_t)))

    logits_s = dis.apply(variables, f_s, method=lambda m, x: m._logits(x))
    logits_t = dis.apply(variables, f_t, method=lambda m, x: m._logits(x))
    want = float(bce_with_logits(logits_s, jnp.ones_like(logits_s))
                 + bce_with_logits(logits_t, jnp.zeros_like(logits_t)))
    np.testing.assert_allclose(fused, want, rtol=1e-6)
