"""Sharded batched test-set evaluation.

Replaces the reference's multiprocess evaluation machinery
(reference: src/evaluate_mp.py:212-529 + src/utils/processing_pool.py):
instead of a torch.multiprocessing pool pinning one utterance at a time to
each GPU, utterances are bucketed by length into static-shape batches,
the whole batch rides one jitted PC-sampling call (sharded over the mesh
data axis when a mesh is given), and metrics run on host threads.

Output schema matches the reference artifacts exactly
(results/<...>/librimix_test.json and _summary.json) so results diff
directly against the shipped oracles.
"""
from __future__ import annotations

import json
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Dict, Optional

import jax
import numpy as np

from ditsep_tpu.data.wsj0_mix import max_collator
from ditsep_tpu.eval.metrics import compute_metrics

Array = jax.Array


def _stft_frames(L: int, n_fft: int, hop: int) -> int:
    """Frame count of the score model's STFT (canonical formula lives in
    ops/stft.py so bucketing can never drift from the model's grid)."""
    from ditsep_tpu.ops.stft import n_frames_prepadded

    return n_frames_prepadded(L, n_fft, hop)


def _bucket_lengths_frames(lengths, frame_spec, max_buckets: int):
    """Frame-block-aware bucketing: group utterances so that padding
    NEVER pushes one across a 64-frame block boundary.

    Why this matters (measured, docs/pad_dilution_r03.md): the score
    model zero-pads STFT frames to a multiple of 64 (reference:
    score_models.py:83-91), so every utterance already carries
    `64*ceil(frames/64) - frames` quiet columns through the U-Net's
    GroupNorms. Padding an utterance past its own block boundary jumps
    that quiet fraction discontinuously (e.g. 1% -> 21%), far outside
    the training condition, and separation quality falls off a cliff
    (+10 dB -> -8 dB on a trained checkpoint). Bucketing by frame block
    keeps each utterance's quiet fraction IDENTICAL to the reference's
    native-length, batch-size-1 evaluation — sample-domain zero padding
    and frame-domain zero padding are the same dilution.

    Returns ({index: padded_length}, merged_indices). Distinct padded
    lengths are capped at `max_buckets` by merging the smallest-count
    blocks upward; `merged_indices` lists the utterances whose padding
    crossed their native frame block (they lose native-equivalence, a
    measured quality cost — surfaced in the result JSON so a merged run
    is never mistaken for a native-parity one)."""
    n_fft, hop, block = frame_spec
    blocks: Dict[int, list] = {}
    for i, L in enumerate(lengths):
        b = -(-_stft_frames(L, n_fft, hop) // block)
        blocks.setdefault(b, []).append(i)
    native = {i: b for b, idxs in blocks.items() for i in idxs}
    merged: set = set()
    if len(blocks) > max_buckets:
        # merge smallest-population blocks into the next block up
        # (the largest block has nowhere to go and never merges)
        while len(blocks) > max_buckets:
            order = sorted(blocks)
            cand = min(order[:-1], key=lambda b: len(blocks[b]))
            nxt = order[order.index(cand) + 1]
            blocks[nxt] = blocks[nxt] + blocks.pop(cand)
        merged = {i for b, idxs in blocks.items()
                  for i in idxs if native[i] != b}
        print(f"[evaluate] merged {len(merged)} utterances into higher "
              f"frame blocks to respect max_buckets={max_buckets}; "
              f"their padded quiet fraction exceeds native eval "
              f"(raise --max-buckets for strict native parity)")
    out = {}
    for b, idxs in blocks.items():
        pad_len = max(lengths[i] for i in idxs)
        for i in idxs:
            out[i] = pad_len
    return out, merged


def _bucket_lengths(lengths, bucket_multiple: int, max_buckets: int):
    """Map each utterance length to a static padded length, capping the
    number of distinct padded shapes at `max_buckets` (each distinct
    (length, batch) shape costs one XLA compile; a long-tailed test set
    must not trigger dozens of multi-minute compiles). When the rounded
    lengths exceed the cap, boundaries fall on per-utterance-count
    quantiles so padding overhead stays small where the data is dense.

    Deliberately NOT data.wsj0_mix.length_buckets: that one always
    quantizes to n_buckets quantile boundaries (a training loader wants
    few shapes); eval keeps every exact rounded shape while under the
    cap, because padding past an utterance's own frame block costs
    measurable quality (docs/pad_dilution_r03.md)."""
    own = {i: -(-L // bucket_multiple) * bucket_multiple
           for i, L in enumerate(lengths)}
    rounded = sorted(set(own.values()))
    if len(rounded) > max_buckets:
        by_len = sorted(lengths)
        n = len(by_len)
        bounds = sorted({
            -(-by_len[min(n - 1, (k * n) // max_buckets - 1)]
              // bucket_multiple) * bucket_multiple
            for k in range(1, max_buckets + 1)})
        if bounds[-1] < rounded[-1]:
            bounds[-1] = rounded[-1]
        print(f"[evaluate] consolidating {len(rounded)} length buckets "
              f"-> {len(bounds)} (max_buckets={max_buckets}); padded "
              f"shapes: {bounds}")
        rounded = bounds
    import bisect

    def assign(L):
        return rounded[bisect.bisect_left(rounded, L)]

    out = {i: assign(L) for i, L in enumerate(lengths)}
    merged = {i for i in out if out[i] > own[i]}
    return out, merged


def _host_fence(est) -> None:
    """True completion fence: `block_until_ready` under-fences on
    tunneled backends (the axon runtime can return before remote
    execution finishes — the same reason bench.py reads a host scalar).
    A one-element host read is the reliable barrier; its ~tens-of-ms
    dispatch cost is negligible against multi-second sampling calls."""
    jax.block_until_ready(est)
    np.asarray(jax.numpy.ravel(est)[0])


def evaluate_dataset(
    separate_fn,
    dataset,
    *,
    fs: int = 8000,
    batch_size: int = 4,
    bucket_multiple: int = 4096,
    frame_spec: Optional[tuple] = None,
    max_buckets: int = 8,
    nfe: int = 60,
    mesh=None,
    out_dir: Optional[str] = None,
    split_name: str = "test",
    limit: Optional[int] = None,
    metric_workers: int = 4,
    seed: int = 0,
    save_samples: int = 0,
    save_figures: int = 0,
    warmup: bool = True,
    pass_lengths: bool = False,
) -> Dict:
    """Evaluate `separate_fn(key, mix (B,1,T)) -> est (B,n,T)` over a
    dataset of (mix, target) items.

    ``pass_lengths=True`` calls ``separate_fn(key, mix, lengths)`` with
    each item's true sample count — for mask_padding score models, which
    mask every item's trailing quiet region out of normalization and
    attention statistics (padding then costs nothing at any bucket
    size; see docs/pad_dilution_r03.md).

    Returns {"results": per-utterance dict, "summary": mean dict}; writes
    `<split>.json` and `<split>_summary.json` when out_dir is given
    (reference: src/evaluate_mp.py:516-529).

    Timing semantics match the reference (src/evaluate_mp.py:313-327):
    `runtime` is steady-state sampling wall-clock per utterance. Each
    bucket shape is warmed up with one untimed call before its batches
    are timed, so XLA compilation never lands in the recorded runtime
    (disable with warmup=False in compile-bound smoke tests).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_items = len(dataset) if limit is None else min(limit, len(dataset))
    # group indices into static-length buckets (capped distinct shapes);
    # frame_spec = (n_fft, hop, block) of the score model's STFT keeps
    # padding inside each utterance's own %64 frame block — REQUIRED for
    # quality parity with the reference's unpadded batch-1 eval (see
    # _bucket_lengths_frames / docs/pad_dilution_r03.md). It is OPT-IN
    # (None default) because it must match the MODEL's STFT, which this
    # function cannot see — a wrong grid silently re-creates the very
    # cliff it prevents, and it overrides bucket_multiple. cli/evaluate
    # passes the configured model's spec; do the same for waveform
    # models, and keep None (sample-domain buckets) for latent paths.
    # header-only length probe when the dataset supports it (a full
    # __getitem__ decodes mix + n_spkr sources; probing 3000 utterances
    # that way reads the whole test set twice)
    get_len = getattr(dataset, "item_length", None)
    lengths = ([get_len(i) for i in range(n_items)] if get_len
               else [dataset[i][0].shape[-1] for i in range(n_items)])
    if frame_spec is not None:
        assigned, merged_idx = _bucket_lengths_frames(lengths, frame_spec,
                                                      max_buckets)
    else:
        assigned, merged_idx = _bucket_lengths(lengths, bucket_multiple,
                                               max_buckets)
    buckets: Dict[int, list] = {}
    for i in range(n_items):
        buckets.setdefault(assigned[i], []).append(i)

    sharding = None
    n_dev = 1
    if mesh is not None:
        sharding = NamedSharding(mesh, P("data"))
        n_dev = mesh.devices.size
    # the jitted batch must split evenly over the mesh's data axis:
    # round the static batch shape up to a device-count multiple
    # (reference harness handles any utterance count, evaluate_mp.py:466)
    eff_batch = -(-batch_size // n_dev) * n_dev

    results: Dict[str, Dict] = {}
    pool = ThreadPoolExecutor(metric_workers)
    futures = {}
    key = jax.random.PRNGKey(seed)

    for blen, idxs in sorted(buckets.items()):
        warmed = not warmup
        # chunk by the effective (device-rounded) batch: the jitted shape
        # is eff_batch either way, so larger chunks are free utilization
        for start in range(0, len(idxs), eff_batch):
            chunk = idxs[start:start + eff_batch]
            items = [dataset[i] for i in chunk]
            n_real = len(items)
            while len(items) < eff_batch:  # static batch shape
                items.append(items[-1])
            # left-aligned: padding is trailing quiet, the same layout as
            # the model's own %64 frame pad (and the reference's)
            mix_b, tgt_b = max_collator(items, pad_to=blen, align="left")
            mix_j = jax.numpy.asarray(mix_b)
            if sharding is not None:
                mix_j = jax.device_put(mix_j, sharding)
            args = ()
            if pass_lengths:
                lens = jax.numpy.asarray(
                    [it[0].shape[-1] for it in items], dtype=jax.numpy.int32)
                if sharding is not None:
                    lens = jax.device_put(lens, sharding)
                args = (lens,)
            key, sub = jax.random.split(key)
            if not warmed:  # absorb XLA compile outside the timing
                _host_fence(separate_fn(sub, mix_j, *args))
                warmed = True
            t0 = time.perf_counter()
            est = separate_fn(sub, mix_j, *args)
            _host_fence(est)
            runtime = (time.perf_counter() - t0) / n_real
            est = np.asarray(est)
            for bi in range(n_real):
                i = chunk[bi]
                L = lengths[i]
                sl = slice(0, L)  # left-aligned collation
                futures[i] = pool.submit(
                    _metrics_entry, i, np.asarray(mix_b[bi][:, sl]),
                    est[bi][:, sl], np.asarray(tgt_b[bi][:, sl]), fs,
                    runtime, nfe, i in merged_idx)
                if out_dir is not None and (i < save_samples
                                            or i < save_figures):
                    _save_media(out_dir, split_name, i,
                                np.asarray(mix_b[bi][:, sl]), est[bi][:, sl],
                                np.asarray(tgt_b[bi][:, sl]), fs,
                                wavs=i < save_samples,
                                figure=i < save_figures)

    for i, fut in futures.items():
        results[str(i)] = fut.result()
    pool.shutdown()

    summary = _summarize(results)
    # surface bucket-merge dilution (docs/pad_dilution_r03.md: padding
    # past an utterance's native frame block measurably costs quality):
    # a merged run must be distinguishable from a native-parity one in
    # the artifact itself, not just in stdout
    summary["merged_utterances"] = len(merged_idx)
    if merged_idx:
        summary["merged_indices"] = sorted(int(i) for i in merged_idx
                                           if i < n_items)
    if out_dir is not None:
        out = Path(out_dir)
        out.mkdir(parents=True, exist_ok=True)
        with open(out / f"{split_name}.json", "w") as f:
            json.dump(results, f, indent=0)
        with open(out / f"{split_name}_summary.json", "w") as f:
            json.dump(summary, f, indent=2)
    return {"results": results, "summary": summary}


def _save_media(out_dir, split_name, idx, mix, est, target, fs,
                wavs=True, figure=False) -> None:
    """Per-utterance wav dumps + spectrogram figure (reference:
    src/evaluate_mp.py:100-168 save_fig/save_samples; enh{i}.wav names
    match the reference's)."""
    from ditsep_tpu.data.wsj0_mix import write_wav

    media = Path(out_dir) / f"{split_name}_media"
    media.mkdir(parents=True, exist_ok=True)
    if wavs:
        peak = max(float(np.abs(est).max()), 1e-6)
        for s in range(est.shape[0]):
            write_wav(str(media / f"{idx:04d}.enh{s}.wav"),
                      est[s] * 0.95 / peak, fs)
    if figure:
        try:
            from ditsep_tpu.viz import separation_figure
            fig = separation_figure(mix.reshape(-1), est, target, fs=fs)
            fig.savefig(str(media / f"{idx:04d}.pdf"))
            import matplotlib.pyplot as plt
            plt.close(fig)
        except Exception:
            pass  # figures must never take down an eval run


def _metrics_entry(idx, mix, est, target, fs, runtime, nfe,
                   merged_pad: bool = False) -> Dict:
    m = compute_metrics(est, target, fs=fs)
    out = {
        "batch_idx": idx,
        "si_sdr": [m["si_sdr"]],
        "si_sir": [m["si_sir"]],
        "si_sar": [m["si_sar"]],
        "pesq": m["pesq"],  # per-source list (reference schema:
        "stoi": m["stoi"],  # evaluate_mp.py:183-187 loops over sources)
        "pesq_impl": m["pesq_impl"],
        "nfe": nfe,
        "runtime": runtime,
        "len_s": target.shape[-1] / fs,
    }
    if merged_pad:
        # this utterance was padded past its native frame block to honor
        # max_buckets — its metrics are NOT native-equivalent
        out["merged_pad"] = True
    return out


def _summarize(results: Dict[str, Dict]) -> Dict:
    """Mean over utterances (reference: src/evaluate_mp.py:192-209)."""
    if not results:
        return {}
    keys = ["si_sdr", "si_sir", "si_sar", "pesq", "stoi", "nfe", "runtime",
            "len_s", "batch_idx"]
    out = {}
    for k in keys:
        vals = []
        for r in results.values():
            v = r.get(k)
            vals.append(np.nanmean(np.asarray(v, dtype=np.float64)))
        out[k] = float(np.nanmean(vals))
    out["number"] = len(results)
    # match reference key order: batch_idx first
    ordered = {"batch_idx": out.pop("batch_idx")}
    ordered.update({k: out[k] for k in
                    ["si_sdr", "si_sir", "si_sar", "pesq", "stoi", "nfe",
                     "runtime", "len_s", "number"]})
    # PESQ backend provenance is mandatory in the summary artifact too —
    # in-repo P.862 numbers must never be mistaken for ITU-PESQ ones
    impls = {r.get("pesq_impl") for r in results.values()} - {None}
    if impls:
        ordered["pesq_impl"] = sorted(impls)[0] if len(impls) == 1 \
            else sorted(impls)
    return ordered
