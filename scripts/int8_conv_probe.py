"""Probe: can int8 convs reach the v5e MXU's double rate via GEMM lowering?

BENCHMARKS.md records the motivating facts: a raw int8 matmul sustains
~195 TOP/s vs ~122-137 TFLOP/s bf16 (1.6x), but XLA's int8
`conv_general_dilated` path does NOT reach double rate at the bench shapes
(int8 backbone 5.40 ms vs bf16 4.88 ms). This script measures whether
re-expressing the convs as int8 GEMMs closes the gap (VERDICT r2 next-item
#8):

  * 1x1 conv == a plain (B*H*W, Cin) @ (Cin, Cout) matmul — the dominant op
    count in the ResNet bottleneck stages;
  * 3x3 conv == "shift-and-GEMM": y = sum_{dy,dx} shift(x, dy, dx) @ W[dy,dx]
    — nine int8 matmuls with int32 accumulation, no im2col memory blowup;
  * im2col via `conv_general_dilated_patches` + one big GEMM, for contrast.

Run on the real chip:
  env PYTHONPATH=/root/.axon_site:/root/repo \
      JAX_COMPILATION_CACHE_DIR=/root/.jax_tpu_cache \
      python scripts/int8_conv_probe.py

Timing follows BENCHMARKS.md "measurement methodology": chained iterations
(each step consumes the previous output) + one reduced-scalar fetch.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

DN = ("NHWC", "HWIO", "NHWC")
ITERS = 30


def _chain_time(fn, x, iters: int = ITERS, direct: bool = False) -> float:
    """Median-of-3 chained-loop seconds/iter with a tail fetch.

    The op's output shape may differ from its input (conv Cin != Cout), so
    the chain feeds back a REDUCTION OF THE SQUARED output added to the
    input. A plain 1-element slice tap is NOT safe: XLA's algebraic
    simplifier sinks slices through dots/convs (slice-of-dot ->
    dot-of-slices), eliding almost the whole op — measured >peak-FLOPs
    anchors. A sum of y*y cannot be folded into the producing matmul/conv,
    so every output element must be materialized; the extra elementwise
    pass is small vs the op under test.
    """

    @jax.jit
    def loop(x):
        def body(i, t):
            y = fn(t)
            if direct:  # same-shape op: output IS the next input
                return y
            yf = y.astype(jnp.float32)  # cast BEFORE squaring (int8 overflow)
            tap = jnp.sum(yf * yf)
            return t + tap.astype(t.dtype)  # same shape as t

        return jnp.sum(jax.lax.fori_loop(0, iters, body, x)
                       .astype(jnp.float32))

    loop(x).block_until_ready()  # compile
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(x))  # fetch forces execution through the tunnel
        times.append((time.perf_counter() - t0) / iters)
    return sorted(times)[1]


def _rate(flops: float, sec: float) -> str:
    return f"{flops / sec / 1e12:7.1f} T/s"


# ---------------------------------------------------------------- variants
def conv_xla(x8, w8):
    """XLA's native int8 conv (the current ptq.py path)."""
    return jax.lax.conv_general_dilated(
        x8, w8, (1, 1), "SAME", dimension_numbers=DN,
        preferred_element_type=jnp.int32).astype(jnp.int8)


def conv1x1_gemm(x8, w8):
    """1x1 conv as a plain int8 GEMM."""
    b, h, w, ci = x8.shape
    co = w8.shape[-1]
    y = jax.lax.dot_general(
        x8.reshape(b * h * w, ci), w8.reshape(ci, co),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    return y.reshape(b, h, w, co).astype(jnp.int8)


def conv3x3_shift_gemm(x8, w8):
    """3x3 SAME conv as nine shifted int8 GEMMs, int32 accumulation."""
    b, h, w, ci = x8.shape
    co = w8.shape[-1]
    xp = jnp.pad(x8, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((b * h * w, co), jnp.int32)
    for dy in range(3):
        for dx in range(3):
            tap = jax.lax.dynamic_slice(
                xp, (0, dy, dx, 0), (b, h, w, ci)).reshape(b * h * w, ci)
            acc = acc + jax.lax.dot_general(
                tap, w8[dy, dx], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
    return acc.reshape(b, h, w, co).astype(jnp.int8)


def conv3x3_im2col(x8, w8):
    """3x3 SAME conv as patch-extraction + one big GEMM."""
    b, h, w, ci = x8.shape
    co = w8.shape[-1]
    patches = jax.lax.conv_general_dilated_patches(
        x8, (3, 3), (1, 1), "SAME", dimension_numbers=DN)  # (B,H,W,9*Ci)
    y = jax.lax.dot_general(
        patches.reshape(b * h * w, -1),
        jnp.moveaxis(w8, 2, 0).reshape(-1, co),  # HWIO -> I',O with I'=Ci*9
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    return y.reshape(b, h, w, co).astype(jnp.int8)


def main():
    rng = np.random.RandomState(0)
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")

    # ---- calibration anchors (8192^3 GEMM) -------------------------------
    n = 8192
    a8 = jnp.asarray(rng.randint(-127, 128, (n, n)), jnp.int8)
    abf = jnp.asarray(rng.rand(n, n), jnp.bfloat16)
    mm_flops = 2 * n ** 3

    def mm_i8(x):
        return jax.lax.dot_general(x, a8, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32
                                   ).astype(jnp.int8)

    def mm_bf(x):
        return (x @ abf).astype(jnp.bfloat16)

    t = _chain_time(mm_i8, a8, 10, direct=True)
    print(f"anchor int8 8192^3 GEMM : {t * 1e3:7.2f} ms  {_rate(mm_flops, t)}")
    t = _chain_time(mm_bf, abf, 10, direct=True)
    print(f"anchor bf16 8192^3 GEMM : {t * 1e3:7.2f} ms  {_rate(mm_flops, t)}")

    # ---- conv shapes from the bench model (ResNet-FPN 112^2, B=256) ------
    # (label, B, H, W, Cin, Cout, k)
    shapes = [
        ("res3 1x1 expand", 64, 14, 14, 256, 1024, 1),
        ("res3 1x1 reduce", 64, 14, 14, 1024, 256, 1),
        ("res3 3x3       ", 64, 14, 14, 256, 256, 3),
        ("res2 3x3       ", 64, 28, 28, 128, 128, 3),
        ("head 3x3 p2    ", 64, 28, 28, 256, 256, 3),
        ("big  1x1       ", 64, 28, 28, 512, 512, 1),
    ]
    for label, b, h, w, ci, co, k in shapes:
        x8 = jnp.asarray(rng.randint(-127, 128, (b, h, w, ci)), jnp.int8)
        w8 = jnp.asarray(rng.randint(-127, 128, (k, k, ci, co)), jnp.int8)
        xbf = x8.astype(jnp.bfloat16)
        wbf = w8.astype(jnp.bfloat16)
        flops = 2 * b * h * w * ci * co * k * k

        def conv_bf(t, w=wbf):
            return jax.lax.conv_general_dilated(
                t, w, (1, 1), "SAME", dimension_numbers=DN,
                preferred_element_type=jnp.bfloat16)

        results = []
        tb = _chain_time(conv_bf, xbf)
        results.append(("bf16 conv", tb))
        tx = _chain_time(functools.partial(conv_xla, w8=w8), x8)
        results.append(("int8 conv(XLA)", tx))
        if k == 1:
            tg = _chain_time(functools.partial(conv1x1_gemm, w8=w8), x8)
            results.append(("int8 1x1-GEMM", tg))
        else:
            tg = _chain_time(functools.partial(conv3x3_shift_gemm, w8=w8), x8)
            results.append(("int8 shift-GEMM", tg))
            ti = _chain_time(functools.partial(conv3x3_im2col, w8=w8), x8)
            results.append(("int8 im2col", ti))
        line = " | ".join(
            f"{name}: {sec * 1e6:8.1f} us {_rate(flops, sec)}"
            for name, sec in results)
        print(f"{label}: {line}")


if __name__ == "__main__":
    main()
