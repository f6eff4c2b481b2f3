"""Conv census: attribute the score call to individual convolutions.

The fixed roofline (docs/conv_roofline.json) measured the isolated
dominant conv at ~62% of v5e bf16 peak but left the in-model attribution
an estimate ("0.95 x call / 10 dominant convs"). This script removes the
estimate: it walks the jaxpr of the flagship score call, inventories
EVERY `conv_general_dilated` with its exact operand shapes, computes
per-conv FLOPs (feature groups included, so FIR depthwise convs are
counted honestly), then times each distinct conv shape-class standalone
with the forced-execution harness. Output:

  - the census: shape class, count, GFLOP share;
  - sum-of-parts conv time vs the measured full-call time -> the
    composition gap (what fusion boundaries / layout choices / non-conv
    ops cost beyond the convs themselves).

Writes docs/conv_census.json. Run on the TPU:
    python scripts/conv_census.py
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
REPS = int(os.environ.get("BENCH_REPS", "5"))
DTYPE = jnp.bfloat16
PEAK_TFLOPS = 197.0


def timed(fn, *args):
    """Median wall time, forced to completion (see conv_roofline.timed:
    per-rep perturbed input + host fetch of a scalar reduction)."""
    jax.device_get(fn(*args, jnp.zeros((), DTYPE)))
    ts = []
    for i in range(REPS):
        eps = jnp.asarray(1e-6 * (i + 1), DTYPE)
        t0 = time.perf_counter()
        jax.device_get(fn(*args, eps))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def collect_convs(jaxpr, out):
    """Recursively collect conv_general_dilated eqns (lhs/rhs shapes +
    params) from a jaxpr, descending into call/scan/cond sub-jaxprs."""
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "conv_general_dilated":
            lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
            out.append({
                "lhs": tuple(lhs.shape), "rhs": tuple(rhs.shape),
                "out": tuple(eqn.outvars[0].aval.shape),
                "strides": tuple(eqn.params["window_strides"]),
                "padding": tuple(map(tuple, eqn.params["padding"])),
                "lhs_dilation": tuple(eqn.params["lhs_dilation"]),
                "rhs_dilation": tuple(eqn.params["rhs_dilation"]),
                "dnums": eqn.params["dimension_numbers"],
                "groups": int(eqn.params["feature_group_count"]),
            })
        for v in eqn.params.values():
            if isinstance(v, jax.extend.core.ClosedJaxpr):
                collect_convs(v.jaxpr, out)
            elif isinstance(v, (tuple, list)):
                for vv in v:
                    if isinstance(vv, jax.extend.core.ClosedJaxpr):
                        collect_convs(vv.jaxpr, out)
            elif hasattr(v, "jaxpr"):  # e.g. custom_vjp closed fns
                inner = v.jaxpr
                if hasattr(inner, "eqns"):
                    collect_convs(inner, out)
                elif hasattr(inner, "jaxpr"):
                    collect_convs(inner.jaxpr, out)


def conv_flops(c):
    """2 * out_spatial_elems * batch * Cout * (Cin/groups) * kernel."""
    dn = c["dnums"]
    out_shape = c["out"]
    rhs = c["rhs"]
    k_spatial = [rhs[i] for i in dn.rhs_spec[2:]]
    cout = rhs[dn.rhs_spec[0]]
    cin_per_group = rhs[dn.rhs_spec[1]]
    batch = out_shape[dn.out_spec[0]]
    out_spatial = [out_shape[i] for i in dn.out_spec[2:]]
    return (2.0 * batch * int(np.prod(out_spatial)) * cout
            * cin_per_group * int(np.prod(k_spatial)))


def shape_key(c):
    return (c["lhs"], c["rhs"], c["strides"], c["lhs_dilation"],
            c["rhs_dilation"], c["groups"])


def main():
    from ditsep_tpu.models import ScoreModelNCSNpp

    print(f"devices: {jax.devices()}  B={B}", flush=True)
    model = ScoreModelNCSNpp(num_sources=2, nf=128,
                             ch_mult=(1, 1, 2, 2, 2, 2, 2),
                             attn_resolutions=(16,), image_size=256,
                             dtype=DTYPE)
    key = jax.random.PRNGKey(0)
    t_len = int(8.415 * 8000)
    xt = jax.random.normal(key, (B, 2, t_len), DTYPE)
    mix = jax.random.normal(key, (B, 1, t_len), DTYPE)
    tvec = jnp.full((B,), 0.5, DTYPE)
    params = jax.jit(model.init)(key, xt, tvec, mix)

    def call(p, a, b, c):
        return model.apply(p, a, b, c)

    convs = []
    collect_convs(jax.make_jaxpr(call)(params, xt, tvec, mix).jaxpr,
                  convs)

    # census by shape class
    census = {}
    for c in convs:
        k = shape_key(c)
        if k not in census:
            census[k] = {"count": 0, "flops": 0.0, "example": c}
        census[k]["count"] += 1
        census[k]["flops"] += conv_flops(c)
    total_flops = sum(v["flops"] for v in census.values())

    classes = sorted(census.values(), key=lambda v: -v["flops"])
    print(f"\n{len(convs)} convs, {len(classes)} shape classes, "
          f"{total_flops / 1e12:.3f} TFLOP total (batch {B})\n", flush=True)

    # dispatch floor over the tunnel: an empty jitted call costs ~30 ms
    # here; a class with count 1-3 timed naively would be floor-dominated
    # (the first run of this script summed class times to 3.4x the full
    # call). So each class is timed as a stack of >= MIN_STACK chained
    # convs, the floor is subtracted, and the per-conv time is scaled
    # back to the model's count.
    @jax.jit
    def _nop(eps):
        return eps + 1.0

    floor = timed(_nop)
    print(f"dispatch floor: {floor * 1e3:.1f} ms", flush=True)
    MIN_STACK = 12

    rows = []
    sum_of_parts = 0.0
    for v in classes:
        c = v["example"]
        frac = v["flops"] / total_flops
        row = {"lhs": list(c["lhs"]), "rhs": list(c["rhs"]),
               "strides": list(c["strides"]),
               "groups": c["groups"], "count": v["count"],
               "gflop_total": round(v["flops"] / 1e9, 1),
               "flop_pct": round(100 * frac, 1)}
        if frac >= 0.005:  # time classes worth >=0.5% of conv FLOPs
            n = v["count"]
            dn = c["dnums"]
            x = jax.random.normal(key, c["lhs"], DTYPE)
            w = jax.random.normal(key, c["rhs"], DTYPE) * 0.05
            chainable = c["lhs"] == c["out"]

            def make_stack(L, c=c, dn=dn, chainable=chainable):
                @jax.jit
                def stack(x, w, eps):
                    def body(h, _):
                        # ALWAYS conv the carry: feeding the fixed input
                        # lets XLA hoist the conv out of the scan (the
                        # first run of this script reported >100% of
                        # peak for every non-chainable class that way)
                        y = jax.lax.conv_general_dilated(
                            h, w, c["strides"],
                            c["padding"], lhs_dilation=c["lhs_dilation"],
                            rhs_dilation=c["rhs_dilation"],
                            dimension_numbers=dn,
                            feature_group_count=c["groups"])
                        if not chainable:
                            # fold y into an input-shaped carry so the
                            # conv stays loop-carried
                            return x * (1.0 + 1e-6 * jnp.mean(y)
                                        .astype(x.dtype)), None
                        return y, None
                    h, _ = jax.lax.scan(body, x + eps, None, length=L)
                    return jnp.sum(h.astype(jnp.float32))
                return stack

            # adaptive stack length: the ~30-40 ms dispatch floor
            # jitters by a few ms between runs, so pure compute must
            # dominate it (>= 8x) before subtraction is trustworthy
            L = max(n, MIN_STACK)
            t = timed(make_stack(L), x, w)
            if t - floor < 8 * floor:
                L = min(2000, int(np.ceil(
                    L * 8 * floor / max(t - floor, floor / 20))))
                t = timed(make_stack(L), x, w)
            per_conv = max(t - floor, 1e-9) / L
            t = per_conv * n
            row["ms_total"] = round(t * 1e3, 2)
            row["ms_per_conv"] = round(per_conv * 1e3, 3)
            row["stack_len"] = L
            row["tflops"] = round(v["flops"] / t / 1e12, 1)
            row["pct_peak"] = round(
                100 * v["flops"] / t / 1e12 / PEAK_TFLOPS, 1)
            sum_of_parts += t
        rows.append(row)
        print(json.dumps(row), flush=True)

    # the full call, same harness, floor-corrected
    score = jax.jit(lambda p, a, b, c, eps: jnp.sum(
        model.apply(p, a + eps, b, c).astype(jnp.float32)))
    call_t = max(timed(lambda eps: score(params, xt, tvec, mix, eps))
                 - floor, 1e-9)

    summary = {
        "batch": B,
        "n_convs": len(convs),
        "dispatch_floor_ms": round(floor * 1e3, 1),
        "total_conv_tflop": round(total_flops / 1e12, 3),
        "sum_of_parts_ms": round(sum_of_parts * 1e3, 1),
        "full_call_ms": round(call_t * 1e3, 1),
        "non_conv_plus_composition_ms": round(
            (call_t - sum_of_parts) * 1e3, 1),
        "conv_only_mfu_pct": round(
            100 * total_flops / sum_of_parts / 1e12 / PEAK_TFLOPS, 1)
        if sum_of_parts else None,
        "full_call_mfu_pct": round(
            100 * total_flops / call_t / 1e12 / PEAK_TFLOPS, 1),
    }
    print("\n" + json.dumps(summary), flush=True)

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "conv_census.json")
    with open(path, "w") as f:
        json.dump({"summary": summary, "classes": rows}, f, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()
