"""Pallas 3x3-conv probe at the sampler's dominant shape.

docs/profile_r03.md measured the dominant full-res conv (576x256
spatial, 128->128 channels, 32.6% of sampler FLOPs) at 62-65% of v5e
bf16 peak under XLA's native lowering, and every alternative XLA-level
lowering at or below that. This probe asks the remaining question: can
a hand Pallas kernel beat XLA's conv?

Formulation: implicit GEMM, 9 shifted (BH*W, C) @ (C, C2) MXU matmuls
accumulated in f32. The array layout is border-padded (Hp=H+2, Wp=W+2
with zero borders) and CLOSED under the op -- the kernel writes zeroed
borders -- so a chained timing loop needs no repad between convs. Halo
rows come from passing the same input three times with row-block index
maps offset by -1/0/+1 (Mosaic auto-pipelines all three streams; this
triples HBM input traffic -- the v2 lever if MXU efficiency shows up
well, a manual-DMA halo would cut traffic to ~1.06x).

Run on the TPU:  python scripts/pallas_conv_probe.py
Writes docs/pallas_conv_probe.json.
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", os.path.join(
                      os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

B = int(os.environ.get("BENCH_BATCH", "16"))
H, W, C = 576, 256, 128
C2 = 128
BH = 17  # (H + 2) = 578 = 34 * 17 row blocks (BH=34 OOMs the 16M
         # scoped-vmem limit on v5e: 17.5M with double buffering)
K = int(os.environ.get("CONV_STACK", "30"))
REPS = int(os.environ.get("BENCH_REPS", "5"))
DTYPE = jnp.bfloat16
PEAK_TFLOPS = 197.0
CONV_FLOPS = 2.0 * B * H * W * C * C2 * 9


def timed(fn, *args):
    """Median wall time (see conv_roofline.timed: per-rep perturbed
    input, scalar device_get fencing, floor handled by the caller)."""
    jax.device_get(fn(*args, jnp.zeros((), DTYPE)))
    ts = []
    for i in range(REPS):
        eps = jnp.asarray(1e-6 * (i + 1), DTYPE)
        t0 = time.perf_counter()
        jax.device_get(fn(*args, eps))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def _conv_kernel(xm1, x0, xp1, w, out):
    """One (BH, Wp) row block: assemble the halo window from the three
    row-block streams, run 9 shifted MXU matmuls, zero the borders."""
    nb = pl.num_programs(1)
    i = pl.program_id(1)
    window = jnp.concatenate(
        [xm1[0, BH - 1:], x0[0], xp1[0, :1]], axis=0)  # (BH+2, Wp, C)
    acc = jnp.zeros((BH * W, C2), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            sl = window[ky:ky + BH, kx:kx + W, :].reshape(BH * W, C)
            acc = acc + jnp.dot(sl, w[ky * 3 + kx],
                                preferred_element_type=jnp.float32)
    y = acc.reshape(BH, W, C2).astype(out.dtype)
    # zero column borders; zero the global row borders on the edge blocks
    zcol = jnp.zeros((BH, 1, C2), out.dtype)
    out[0] = jnp.concatenate([zcol, y, zcol], axis=1)

    @pl.when(i == 0)
    def _():
        out[0, 0:1] = jnp.zeros((1, W + 2, C2), out.dtype)

    @pl.when(i == nb - 1)
    def _():
        out[0, BH - 1:BH] = jnp.zeros((1, W + 2, C2), out.dtype)


@functools.partial(jax.jit, static_argnames=())
def conv3x3_pallas(x, w):
    """x: (B, H+2, W+2, C) zero-bordered; w: (9, C, C2).
    -> (B, H+2, W+2, C2) zero-bordered (layout closed under the op)."""
    nb = (H + 2) // BH
    blk = lambda off: pl.BlockSpec(
        (1, BH, W + 2, C),
        lambda b, i, off=off: (b, jnp.clip(i + off, 0, nb - 1), 0, 0))
    return pl.pallas_call(
        _conv_kernel,
        grid=(x.shape[0], nb),
        in_specs=[blk(-1), blk(0), blk(1),
                  pl.BlockSpec((9, C, C2), lambda b, i: (0, 0, 0))],
        out_specs=pl.BlockSpec((1, BH, W + 2, C2),
                               lambda b, i: (b, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((x.shape[0], H + 2, W + 2, C2),
                                       x.dtype),
    )(x, x, x, w)


NB2 = 32   # interior row blocks for the manual-DMA variant
BH2 = 18   # 576 interior rows = 32 * 18; block i reads padded rows
           # [18i, 18i+20) -- always in range, no clamping needed
PADW = 4   # W padding per side for the DMA variant: Mosaic requires
           # DMA slices 8-aligned on the second-minor dim, so the
           # padded width is 256 + 2*4 = 264 (zeros; conv reads cols
           # [PADW-1, PADW+W+1) so the extra zeros are inert)
WP2 = W + 2 * PADW


def _conv_dma_kernel(x_hbm, w, o_hbm, xs, ys, zrow, in_sems, out_sems):
    """Traffic-optimal halo: each step DMAs its (BH2+2)-row window from
    HBM once (~1.06x input traffic vs 3x for the 3-stream variant),
    double-buffered so step s+1's input lands while s computes."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    s = b * NB2 + i
    cur = jax.lax.rem(s, 2)
    nxt = jax.lax.rem(s + 1, 2)
    total = pl.num_programs(0) * NB2

    @pl.when(s == 0)
    def _():
        pltpu.make_async_copy(x_hbm.at[0, pl.ds(0, BH2 + 2)],
                              xs.at[0], in_sems.at[0]).start()
        zrow[:] = jnp.zeros_like(zrow)

    @pl.when(s + 1 < total)
    def _():
        last = i == NB2 - 1
        nb_ = jnp.where(last, b + 1, b)
        ni_ = jnp.where(last, 0, i + 1)
        pltpu.make_async_copy(
            x_hbm.at[nb_, pl.ds(ni_ * BH2, BH2 + 2)],
            xs.at[nxt], in_sems.at[nxt]).start()

    pltpu.make_async_copy(x_hbm.at[b, pl.ds(i * BH2, BH2 + 2)],
                          xs.at[cur], in_sems.at[cur]).wait()

    # wait for the out-DMA issued two steps ago before reusing its slot
    # (only the transfer SHAPE matters for the semaphore wait, so the
    # destination row index is clamped rather than reconstructed across
    # the b boundary)
    @pl.when(s >= 2)
    def _():
        pltpu.make_async_copy(
            ys.at[cur],
            o_hbm.at[b, pl.ds(jnp.maximum(1 + (i - 2) * BH2, 1), BH2)],
            out_sems.at[cur]).wait()

    window = xs[cur]  # (BH2+2, WP2, C)
    acc = jnp.zeros((BH2 * W, C2), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            sl = window[ky:ky + BH2,
                        PADW - 1 + kx:PADW - 1 + kx + W, :]
            acc = acc + jnp.dot(sl.reshape(BH2 * W, C), w[ky * 3 + kx],
                                preferred_element_type=jnp.float32)
    y = acc.reshape(BH2, W, C2).astype(ys.dtype)
    zcol = jnp.zeros((BH2, PADW, C2), ys.dtype)
    ys[cur] = jnp.concatenate([zcol, y, zcol], axis=1)
    pltpu.make_async_copy(
        ys.at[cur], o_hbm.at[b, pl.ds(1 + i * BH2, BH2)],
        out_sems.at[cur]).start()

    @pl.when(i == 0)
    def _():
        d = pltpu.make_async_copy(zrow, o_hbm.at[b, pl.ds(0, 1)],
                                  out_sems.at[2])
        d.start()
        d.wait()

    @pl.when(i == NB2 - 1)
    def _():
        d = pltpu.make_async_copy(zrow, o_hbm.at[b, pl.ds(H + 1, 1)],
                                  out_sems.at[2])
        d.start()
        d.wait()

    # drain: the last step waits its own out-DMA and the previous
    # step's (the s>=2 path above only ever waits DMAs from two steps
    # back, so exactly these two are still in flight at grid end)
    @pl.when(s == total - 1)
    def _():
        pltpu.make_async_copy(
            ys.at[cur], o_hbm.at[b, pl.ds(1 + i * BH2, BH2)],
            out_sems.at[cur]).wait()
        prev_i = jnp.maximum(i - 1, 0)
        pltpu.make_async_copy(
            ys.at[nxt], o_hbm.at[b, pl.ds(1 + prev_i * BH2, BH2)],
            out_sems.at[nxt]).wait()


@jax.jit
def conv3x3_pallas_dma(x, w):
    """Same contract as conv3x3_pallas, manual-DMA halo."""
    return pl.pallas_call(
        _conv_dma_kernel,
        grid=(x.shape[0], NB2),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((x.shape[0], H + 2, WP2, C2),
                                       x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, BH2 + 2, WP2, C), DTYPE),
            pltpu.VMEM((2, BH2, WP2, C2), DTYPE),
            pltpu.VMEM((1, WP2, C2), DTYPE),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )(x, w)


def main():
    print(f"devices: {jax.devices()}  B={B} shape=({H},{W},{C})->{C2} "
          f"stack={K}", flush=True)
    key = jax.random.PRNGKey(0)
    xpad = jnp.pad(jax.random.normal(key, (B, H, W, C), DTYPE) * 0.1,
                   ((0, 0), (1, 1), (1, 1), (0, 0)))
    w9 = jax.random.normal(key, (9, C, C2), DTYPE) * 0.05
    w33 = w9.reshape(3, 3, C, C2)

    # --- correctness vs the XLA conv ---
    ref = jax.lax.conv_general_dilated(
        xpad[:1].astype(jnp.float32), w33.astype(jnp.float32), (1, 1),
        "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = conv3x3_pallas(xpad[:1], w9)[:, 1:-1, 1:-1, :]
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref))
                / jnp.max(jnp.abs(ref)))
    print(f"parity vs XLA conv (bf16): rel err {err:.2e}", flush=True)
    assert err < 0.05, "pallas conv disagrees with XLA conv"
    xpad2 = jnp.pad(jax.random.normal(key, (B, H, W, C), DTYPE) * 0.1,
                    ((0, 0), (1, 1), (PADW, PADW), (0, 0)))
    xpad2 = xpad2.at[:1, 1:-1, PADW:PADW + W].set(xpad[:1, 1:-1, 1:-1])
    got2 = conv3x3_pallas_dma(xpad2[:1], w9)
    brd = float(jnp.max(jnp.abs(jnp.concatenate(
        [got2[:, :1].ravel(), got2[:, -1:].ravel(),
         got2[:, :, :PADW].ravel(), got2[:, :, -PADW:].ravel()]))))
    got2 = got2[:, 1:-1, PADW:PADW + W, :]
    err2 = float(jnp.max(jnp.abs(got2.astype(jnp.float32) - ref))
                 / jnp.max(jnp.abs(ref)))
    print(f"parity (dma variant): rel err {err2:.2e}, "
          f"border max {brd:.1e}", flush=True)
    assert err2 < 0.05 and brd == 0.0, "dma variant broken"

    @jax.jit
    def _nop(eps):
        return eps + 1.0

    floor = timed(_nop)
    print(f"dispatch floor {floor * 1e3:.1f} ms", flush=True)

    # --- chained stacks: pallas vs XLA, same logical op ---
    @jax.jit
    def pallas_stack(x, w, eps):
        def body(h, _):
            return conv3x3_pallas(h, w), None
        h, _ = jax.lax.scan(body, x + eps, None, length=K)
        return jnp.sum(h.astype(jnp.float32))

    @jax.jit
    def pallas_dma_stack(x, w, eps):
        def body(h, _):
            return conv3x3_pallas_dma(h, w), None
        h, _ = jax.lax.scan(body, x + eps, None, length=K)
        return jnp.sum(h.astype(jnp.float32))

    x = jax.random.normal(key, (B, H, W, C), DTYPE) * 0.1
    dn = jax.lax.conv_dimension_numbers(x.shape, w33.shape,
                                        ("NHWC", "HWIO", "NHWC"))

    @jax.jit
    def xla_stack(x, w, eps):
        def body(h, _):
            return jax.lax.conv_general_dilated(
                h, w, (1, 1), "SAME", dimension_numbers=dn), None
        h, _ = jax.lax.scan(body, x + eps, None, length=K)
        return jnp.sum(h.astype(jnp.float32))

    rows = []
    for name, fn, args in (("xla_native", xla_stack, (x, w33)),
                           ("pallas_9tap", pallas_stack, (xpad, w9)),
                           ("pallas_dma_halo", pallas_dma_stack,
                            (xpad2, w9))):
        per = max(timed(fn, *args) - floor, 1e-9) / K
        tf = CONV_FLOPS / per / 1e12
        rows.append({"variant": name, "ms_per_conv": round(per * 1e3, 3),
                     "tflops": round(tf, 1),
                     "pct_peak": round(100 * tf / PEAK_TFLOPS, 1)})
        print(json.dumps(rows[-1]), flush=True)

    out = {"batch": B, "shape": [H, W, C, C2], "stack": K,
           "parity_rel_err": err, "dispatch_floor_ms": round(
               floor * 1e3, 1), "rows": rows,
           "note": "pallas v1 reads each input row block 3x for the "
                   "halo (no manual DMA); traffic ~3x the optimum"}
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "pallas_conv_probe.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()
