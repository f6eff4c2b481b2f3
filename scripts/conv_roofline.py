"""Prove or break the conv roofline claim (VERDICT r2 item 2).

Round 2 measured the flagship score net at ~46 TFLOP/s (~23% of v5e bf16
peak) and bounded the secondary ops (norms <=2.9%, FIR composite already
faster than naive) -- but never isolated the dominant op: the 3x3 convs
at the two full-resolution levels ((B, 576, 256, 128) -> 128 NHWC, which
the depth ablation showed to be ~95% of a score call). This script:

  1. times the isolated dominant conv standalone (a stack of K identical
     convs so per-conv time amortizes the ~35 ms tunnel dispatch),
     reporting achieved TFLOP/s;
  2. same FLOPs as pure matmul (explicit im2col patches -> one GEMM):
     the MXU ceiling for this arithmetic;
  3. layout / algorithm variants of the conv, each mathematically
     equivalent to (1):
       - NCHW layout (dimension_numbers)
       - f32 accumulation (preferred_element_type)
       - space-to-batch on the frame axis (split H into S slabs with a
         1-row halo; convs on (B*S, H/S+2, 256, 128))
       - im2col + GEMM as an actual conv implementation
       - 1x3 + 3x1 decomposition ("separable-cost probe": NOT equivalent
         math, same-ballpark FLOPs -- probes whether narrow kernels map
         better; labelled as such)
  4. the FIR resample chain (upfirdn composite) at the level-1->2
     boundary shape, standalone;
  5. the in-model per-conv cost implied by a full score call, for the
     standalone-vs-in-model comparison VERDICT asked for.

Writes docs/conv_roofline.json + prints a table. Run on the TPU:
    python scripts/conv_roofline.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", os.path.join(
                      os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

B = int(os.environ.get("BENCH_BATCH", "16"))
H, W, C = 576, 256, 128
K = int(os.environ.get("CONV_STACK", "30"))  # convs per timed program
REPS = int(os.environ.get("BENCH_REPS", "5"))
DTYPE = jnp.bfloat16
PEAK_TFLOPS = 197.0  # v5e bf16

CONV_FLOPS = 2.0 * B * H * W * C * C * 9  # one 3x3 conv fwd


def timed(fn, *args):
    """Median wall time of ``fn(*args, eps)`` forced to completion.

    Two hazards the first version of this harness hit on the tunneled
    axon backend: (a) identical args across reps let reps 2+ return in
    ~40 us -- far below the ~35 ms dispatch floor, i.e. without touching
    the device -- so every rep perturbs the first arg with a distinct
    ``eps`` scalar; (b) ``block_until_ready`` alone proved insufficient
    to fence execution, so the result (a scalar: every timed fn reduces
    its full output, which also blocks dead-code elimination) is fetched
    to the host with ``jax.device_get``."""
    jax.device_get(fn(*args, jnp.zeros((), DTYPE)))  # warmup/compile
    ts = []
    for i in range(REPS):
        eps = jnp.asarray(1e-6 * (i + 1), DTYPE)
        t0 = time.perf_counter()
        jax.device_get(fn(*args, eps))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def report(name, sec_per_stack, flops_per_conv=CONV_FLOPS, note=""):
    per = sec_per_stack / K
    tf = flops_per_conv / per / 1e12
    row = {"variant": name, "ms_per_conv": round(per * 1e3, 3),
           "tflops": round(tf, 1),
           "pct_peak": round(100 * tf / PEAK_TFLOPS, 1), "note": note}
    print(json.dumps(row), flush=True)
    return row


def main():
    print(f"devices: {jax.devices()}  B={B} shape=({H},{W},{C}) "
          f"stack={K}", flush=True)
    rows = []
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, H, W, C), DTYPE)
    w33 = jax.random.normal(key, (3, 3, C, C), DTYPE) * 0.05

    dn_nhwc = jax.lax.conv_dimension_numbers(
        x.shape, w33.shape, ("NHWC", "HWIO", "NHWC"))

    # 1. baseline: stack of K NHWC 3x3 convs
    @jax.jit
    def conv_stack(x, w, eps):
        def body(h, _):
            h = jax.lax.conv_general_dilated(
                h, w, (1, 1), "SAME", dimension_numbers=dn_nhwc)
            return h, None
        h, _ = jax.lax.scan(body, x + eps, None, length=K)
        return jnp.sum(h.astype(jnp.float32))

    # dispatch floor: the cheapest possible jitted call over the tunnel;
    # stack times are reported with this floor subtracted
    @jax.jit
    def _nop(eps):
        return eps + 1.0

    floor = timed(_nop)
    rows.append({"variant": "dispatch_floor", "ms": round(floor * 1e3, 2),
                 "note": "empty jitted call; subtracted from stacks"})

    rows.append(report("nhwc_baseline", timed(conv_stack, x, w33) - floor))

    # 1b. f32 accumulation
    @jax.jit
    def conv_stack_f32acc(x, w, eps):
        def body(h, _):
            h = jax.lax.conv_general_dilated(
                h, w, (1, 1), "SAME", dimension_numbers=dn_nhwc,
                preferred_element_type=jnp.float32).astype(DTYPE)
            return h, None
        h, _ = jax.lax.scan(body, x + eps, None, length=K)
        return jnp.sum(h.astype(jnp.float32))

    rows.append(report("nhwc_f32_accum",
                       timed(conv_stack_f32acc, x, w33) - floor))

    # 1c. NCHW layout
    xn = jnp.transpose(x, (0, 3, 1, 2))
    wn = jnp.transpose(w33, (3, 2, 0, 1))  # OIHW
    dn_nchw = jax.lax.conv_dimension_numbers(
        xn.shape, wn.shape, ("NCHW", "OIHW", "NCHW"))

    @jax.jit
    def conv_stack_nchw(x, w, eps):
        def body(h, _):
            h = jax.lax.conv_general_dilated(
                h, w, (1, 1), "SAME", dimension_numbers=dn_nchw)
            return h, None
        h, _ = jax.lax.scan(body, x + eps, None, length=K)
        return jnp.sum(h.astype(jnp.float32))

    rows.append(report("nchw_layout", timed(conv_stack_nchw, xn, wn) - floor))

    # 2. MXU ceiling: same per-sample FLOPs as one GEMM (im2col patches
    #    prebuilt, so only the matmul is in the loop). B=4 slice keeps the
    #    9x-inflated patch array ~1.4 GB; FLOPs scaled accordingly.
    Bg = 4
    patches = jax.random.normal(key, (Bg * H * W, 9 * C), DTYPE)
    wmat = jax.random.normal(key, (9 * C, C), DTYPE) * 0.05
    gemm_flops = 2.0 * Bg * H * W * C * C * 9

    @jax.jit
    def gemm_stack(p, w, eps):
        def body(p, _):
            y = p @ w  # (BgHW, C): the full product feeds the next step
            return jnp.tile(y, (1, 9)) * 0.05, None
        p, _ = jax.lax.scan(body, p + eps, None, length=K)
        return jnp.sum(p.astype(jnp.float32))

    rows.append(report("gemm_ceiling_same_flops",
                       timed(gemm_stack, patches, wmat) - floor,
                       flops_per_conv=gemm_flops,
                       note=f"pure MXU GEMM, conv FLOPs, B={Bg}"))

    # 3. im2col conv (patch extraction in the loop; math == baseline)
    xg = x[:Bg]

    @jax.jit
    def im2col_stack(x, w, eps):
        wm = w.reshape(9 * C, C)
        x = x + eps

        def body(h, _):
            p = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)))
            cols = jnp.concatenate([
                p[:, i:i + H, j:j + W, :] for i in range(3)
                for j in range(3)], axis=-1)  # (Bg,H,W,9C)
            h = (cols.reshape(-1, 9 * C) @ wm).reshape(Bg, H, W, C)
            return h, None
        h, _ = jax.lax.scan(body, x, None, length=K)
        return jnp.sum(h.astype(jnp.float32))

    rows.append(report("im2col_gemm_conv",
                       timed(im2col_stack, xg, w33) - floor,
                       flops_per_conv=gemm_flops, note=f"B={Bg}"))

    # 4. space-to-batch on the frame axis (S slabs, 1-row halo)
    S = 4
    hs = H // S

    @jax.jit
    def s2b_stack(x, w, eps):
        x = x + eps

        def body(h, _):
            p = jnp.pad(h, ((0, 0), (1, 1), (0, 0), (0, 0)))
            slabs = jnp.stack([
                jax.lax.dynamic_slice_in_dim(p, s * hs, hs + 2, axis=1)
                for s in range(S)], 1).reshape(B * S, hs + 2, W, C)
            y = jax.lax.conv_general_dilated(
                slabs, w, (1, 1), ((0, 0), (1, 1)),
                dimension_numbers=dn_nhwc)  # valid on H halo, same on W
            return y.reshape(B, S * hs, W, C), None
        h, _ = jax.lax.scan(body, x, None, length=K)
        return jnp.sum(h.astype(jnp.float32))

    rows.append(report("space_to_batch_h4", timed(s2b_stack, x, w33) - floor))

    # 5. separable-cost probe (1x3 then 3x1; different math, ~2/3 FLOPs
    #    per conv pair -> report at its own FLOP count)
    w13 = jax.random.normal(key, (1, 3, C, C), DTYPE) * 0.05
    w31 = jax.random.normal(key, (3, 1, C, C), DTYPE) * 0.05

    @jax.jit
    def sep_stack(x, wa, wb, eps):
        x = x + eps

        def body(h, _):
            h = jax.lax.conv_general_dilated(
                h, wa, (1, 1), "SAME", dimension_numbers=dn_nhwc)
            h = jax.lax.conv_general_dilated(
                h, wb, (1, 1), "SAME", dimension_numbers=dn_nhwc)
            return h, None
        h, _ = jax.lax.scan(body, x, None, length=K)
        return jnp.sum(h.astype(jnp.float32))

    sep_flops = 2.0 * B * H * W * C * C * 6
    rows.append(report("sep_1x3_3x1_probe",
                       timed(sep_stack, x, w13, w31) - floor,
                       flops_per_conv=sep_flops,
                       note="NOT equivalent math; narrow-kernel probe"))

    # 6. FIR resample chain standalone (upfirdn composite at the
    #    level-1->2 downsample boundary)
    from ditsep_tpu.ops import upfirdn2d

    kfir = jnp.asarray([1.0, 3.0, 3.0, 1.0])
    kfir = (kfir[:, None] * kfir[None, :])
    kfir = (kfir / kfir.sum()).astype(jnp.float32)

    @jax.jit
    def fir_stack(x, eps):
        def body(h, _):
            y = upfirdn2d(h.astype(jnp.float32), kfir, down=2,
                          pad=(1, 1))
            # scalar feedback keeps the carry evolving (no hoisting) and
            # consumes the full output; the broadcast add costs one extra
            # HBM pass over h per iteration (noted)
            return h + jnp.mean(y).astype(h.dtype), None
        h, _ = jax.lax.scan(body, x + eps, None, length=K)
        return jnp.sum(h.astype(jnp.float32))

    fir_t = timed(fir_stack, x) - floor
    fir_row = {"variant": "fir_down2_chain",
               "ms_per_op": round(fir_t / K * 1e3, 3),
               "note": "upfirdn composite, down=2, (B,576,256,128); "
                       "includes one extra HBM pass for the carry update"}
    print(json.dumps(fir_row), flush=True)
    rows.append(fir_row)

    # 7. in-model per-conv cost from a full score call (nf=128 flagship)
    from ditsep_tpu.models.score_models import ScoreModelNCSNpp

    model = ScoreModelNCSNpp(num_sources=2, nf=128,
                             ch_mult=(1, 1, 2, 2, 2, 2, 2),
                             attn_resolutions=(16,), image_size=256,
                             dtype=DTYPE)
    t_len = int(8.415 * 8000)
    xt = jax.random.normal(key, (B, 2, t_len), DTYPE)
    mix = jax.random.normal(key, (B, 1, t_len), DTYPE)
    tvec = jnp.full((B,), 0.5, DTYPE)
    params = jax.jit(model.init)(key, xt, tvec, mix)
    score = jax.jit(lambda p, a, b, c, eps: jnp.sum(
        model.apply(p, a + eps, b, c).astype(jnp.float32)))
    score_t = timed(lambda eps: score(params, xt, tvec, mix, eps)) - floor
    # the two full-res levels hold 4 resblocks x 2 convs + skips ~ 10
    # convs of the dominant shape (plus up/down/pyramid); round-2 depth
    # ablation attributes ~95% of the call to them
    n_dom = 10
    in_model = {"variant": "in_model_score_call",
                "score_call_ms": round(score_t * 1e3, 1),
                "implied_ms_per_dominant_conv": round(
                    score_t * 0.95 / n_dom * 1e3, 2),
                "note": f"0.95 x call / {n_dom} dominant convs "
                        "(r2 depth ablation)"}
    print(json.dumps(in_model), flush=True)
    rows.append(in_model)

    out = {"batch": B, "shape": [H, W, C], "stack": K,
           "peak_tflops_bf16": PEAK_TFLOPS, "rows": rows}
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "conv_roofline.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()
