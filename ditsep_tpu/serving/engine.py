"""Dynamic-batching inference engine for jitted separation samplers.

Design (TPU-first):

- Static shapes only. Every dispatched batch has shape
  ``(batch_size, 1, bucket_len)`` drawn from a bounded grid: bucket
  lengths follow the score model's 64-STFT-frame blocks (identical
  padding condition to native batch-1 eval — see
  ``eval/evaluate._bucket_lengths_frames`` and docs/pad_dilution_r03.md)
  and batch sizes are powers of two up to ``max_batch`` (rounded to the
  mesh's device count when sharded). Compile count is therefore bounded
  by ``n_blocks * log2(max_batch)`` programs, each cached by XLA.
- One dispatch thread owns the device. Requests are pure host objects;
  the TPU never sees a dynamic shape or a host round-trip mid-program.
- Grouping policy: serve the bucket holding the OLDEST request; dispatch
  early when ``max_batch`` requests of that bucket are waiting, else
  after ``max_wait_ms``. Under load the engine converges to full
  batches; at low load latency is bounded by one sampler call plus
  ``max_wait_ms``.

The reference has no equivalent subsystem (its closest machinery is the
offline eval process pool, src/utils/processing_pool.py:90-166, which
pins one utterance per GPU process); this is the deployment-facing
counterpart of the sharded eval harness.
"""
from __future__ import annotations

import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np


def frame_block_padded_len(length: int, frame_spec: Tuple[int, int, int]
                           ) -> int:
    """Largest sample count whose STFT frame count stays inside the same
    ``block``-frame block as ``length`` — the engine's buckets are
    exactly the model's own %block frame pads, so bucket padding adds
    ZERO extra quiet columns through the U-Net (canonical math:
    ops/stft.py, shared with eval bucketing and the mask_padding frame
    masks)."""
    from ditsep_tpu.ops.stft import frame_block_padded_len as _impl

    n_fft, hop, block = frame_spec
    return _impl(length, n_fft, hop, block)


@dataclass
class _Request:
    audio: np.ndarray          # (T,) float32
    bucket: int                # padded length
    future: Future = field(default_factory=Future)
    t_submit: float = field(default_factory=time.perf_counter)


class BatchingEngine:
    """Groups concurrent separation requests into static-shape batches.

    Parameters
    ----------
    separate_fn:
        ``separate_fn(key, mix (B,1,T)) -> est (B, n_src, T)`` — a
        (jitted) full separation call, e.g.
        ``lambda k, y: trainer.separate(params, k, y)[0]`` under
        ``jax.jit``. With ``pass_lengths=True`` it is called as
        ``separate_fn(key, mix, lengths (B,) int32)`` for mask_padding
        score models (per-item statistics masking — padding then costs
        nothing even across frame blocks).
    frame_spec:
        ``(n_fft, hop, block)`` of the score model's STFT for
        frame-block buckets, or None to bucket by ``bucket_multiple``
        samples (latent / generic paths).
    mesh:
        optional ``jax.sharding.Mesh`` with a "data" axis; batches are
        device_put with ``P("data")`` and batch sizes are rounded up to
        the device count.
    wire_int16:
        move audio host<->device as int16 (the same 16-bit quantization
        a WAV response carries anyway; inputs are clipped to [-1, 1]).
        Halves the per-wave transfer volume — which direct measurement
        shows DOMINATES served latency on a remote-attached TPU
        (docs/serving_bench.json latent_note: 1.00 s of a 1.11 s
        concurrency-32 wave is pure audio transfer). Dequantization to
        f32 and requantization of the estimates run on device inside
        the same jitted program.
    pipeline_depth:
        max batches in flight on the device at once. JAX dispatch is
        asynchronous, so with depth >= 2 the dispatch thread uploads and
        enqueues batch k+1 while batch k still computes, and a separate
        completion thread blocks on batch k's host read — downloads
        overlap the next batch's compute instead of serializing with it
        (the dominant term on remote-attached TPUs, see wire_int16).
        Device memory cost is one extra batch of I/O buffers only: the
        runtime serializes program EXECUTION, so live compute buffers
        never double. depth=1 restores strict upload->compute->download
        serialization. Results and RNG streams are identical at any
        depth (keys are split in dispatch order).
    """

    def __init__(self, separate_fn, *, fs: int = 8000, max_batch: int = 8,
                 max_wait_ms: float = 50.0,
                 frame_spec: Optional[Tuple[int, int, int]] = (510, 128, 64),
                 bucket_multiple: int = 4096,
                 max_seconds: float = 60.0,
                 pass_lengths: bool = False,
                 mesh=None, seed: int = 0,
                 wire_int16: bool = False,
                 pipeline_depth: int = 2):
        self._fn = separate_fn
        self.wire_int16 = bool(wire_int16)
        if wire_int16:
            import jax.numpy as jnp

            # dequant/requant run on device as their OWN tiny jitted
            # programs (never fused with separate_fn under an outer
            # jit): the separator's already-compiled XLA program is
            # reused byte-identically, so enabling the int16 wire costs
            # two trivial compiles instead of recompiling the flagship
            # sampler per batch shape. Intermediates stay on device.
            _dequant = jax.jit(lambda a: a.astype(jnp.float32) / 32768.0)
            _requant = jax.jit(lambda e: jnp.round(
                jnp.clip(e, -1.0, 1.0) * 32767.0).astype(jnp.int16))

            def _wire_fn(key, y_i16, *args):
                return _requant(separate_fn(key, _dequant(y_i16), *args))

            self._fn = _wire_fn
        self.fs = int(fs)
        self.max_wait = max_wait_ms / 1e3
        self.frame_spec = frame_spec
        self.bucket_multiple = int(bucket_multiple)
        self.max_len = int(max_seconds * fs)
        self.pass_lengths = bool(pass_lengths)
        self._mesh = mesh
        self._sharding = None
        n_dev = 1
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            self._sharding = NamedSharding(mesh, P("data"))
            n_dev = mesh.devices.size
        self._n_dev = n_dev
        # allowed static batch sizes: device-count multiples on a mesh,
        # powers of two otherwise; bounded grid => bounded compiles
        sizes, b = [], n_dev
        while b < max_batch:
            sizes.append(b)
            b *= 2
        # every allowed size must shard over the data axis: round the cap
        # itself up to a device-count multiple
        sizes.append(-(-max(max_batch, n_dev) // n_dev) * n_dev)
        self.batch_sizes = sorted(set(sizes))
        self.max_batch = self.batch_sizes[-1]

        self._key = jax.random.PRNGKey(seed)
        self._pending: Dict[int, List[_Request]] = {}
        self._cv = threading.Condition()
        self._closed = False
        self._stats = {"requests": 0, "batches": 0, "batched_items": 0,
                       "padded_rows": 0, "rejected": 0}
        self._latencies: List[float] = []
        self._queue = None
        self._completion_thread = None
        self._inflight_sem = None
        self._inflight: Dict[int, List[_Request]] = {}
        if int(pipeline_depth) > 1:
            import queue

            # the semaphore is acquired BEFORE a batch is uploaded and
            # released after its host read completes, so dispatched-but-
            # unread batches are bounded by pipeline_depth exactly (a
            # bounded queue alone would admit one extra: the producer
            # would block in put() holding an already-dispatched batch)
            self._inflight_sem = threading.Semaphore(int(pipeline_depth))
            self._queue = queue.Queue()
            self._completion_thread = threading.Thread(
                target=self._completion_loop, daemon=True,
                name="ditsep-completer")
            self._completion_thread.start()
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="ditsep-batcher")
        self._thread.start()

    # ------------------------------------------------------------- public
    def bucket_of(self, length: int) -> int:
        if self.frame_spec is not None:
            return frame_block_padded_len(length, self.frame_spec)
        m = self.bucket_multiple
        return -(-length // m) * m

    def submit(self, audio: np.ndarray) -> Future:
        """Enqueue one mono utterance ((T,) or (1,T)); returns a Future
        resolving to (n_src, T) float32 trimmed to the input length."""
        audio = np.asarray(audio, dtype=np.float32)
        if audio.ndim == 2 and audio.shape[0] == 1:
            audio = audio[0]
        if audio.ndim != 1:
            raise ValueError(f"expected mono (T,) audio, got {audio.shape}")
        req = _Request(audio=audio, bucket=self.bucket_of(audio.shape[-1]))
        if audio.shape[-1] == 0 or audio.shape[-1] > self.max_len:
            with self._cv:
                self._stats["rejected"] += 1
            req.future.set_exception(ValueError(
                f"utterance length {audio.shape[-1]} outside "
                f"(0, {self.max_len}] samples"))
            return req.future
        with self._cv:
            if self._closed:
                req.future.set_exception(RuntimeError("engine closed"))
                return req.future
            self._stats["requests"] += 1
            self._pending.setdefault(req.bucket, []).append(req)
            self._cv.notify()
        return req.future

    def separate(self, audio: np.ndarray, timeout: Optional[float] = None
                 ) -> np.ndarray:
        """Synchronous convenience wrapper around :meth:`submit`."""
        return self.submit(audio).result(timeout)

    def warmup(self, lengths: Sequence[int],
               batch_sizes: Optional[Sequence[int]] = None) -> None:
        """Pre-compile (bucket, batch) programs so first requests don't
        pay XLA compilation (minutes on tunneled backends). Default:
        EVERY allowed batch size per length — a low-concurrency first
        request dispatches a small batch, which must be warm too."""
        for L in lengths:
            blen = self.bucket_of(int(L))
            for bs in (batch_sizes or self.batch_sizes):
                bs = self._round_batch(int(bs))
                mix = np.zeros((bs, 1, blen), np.float32)
                self._run(mix, np.full((bs,), blen, np.int32))

    def stats(self) -> Dict:
        with self._cv:
            s = dict(self._stats)
            lat = sorted(self._latencies)
            s["pending"] = sum(len(v) for v in self._pending.values())
        s["mean_batch_occupancy"] = (
            s["batched_items"] / s["batches"] if s["batches"] else 0.0)
        if lat:
            s["latency_p50_ms"] = 1e3 * lat[len(lat) // 2]
            s["latency_p95_ms"] = 1e3 * lat[min(len(lat) - 1,
                                                int(0.95 * len(lat)))]
        return s

    def close(self, timeout: float = 10.0) -> None:
        with self._cv:
            self._closed = True
            self._cv.notify_all()
        t0 = time.perf_counter()
        self._thread.join(timeout)
        if self._completion_thread is not None:
            self._completion_thread.join(
                max(0.1, timeout - (time.perf_counter() - t0)))
        with self._cv:
            # never-dispatched requests, plus — when the join timed out
            # because a host read wedged (tunnel stall) — any batches
            # still registered in flight: otherwise their callers would
            # block on future.result() forever after close() returns
            leftovers = list(self._pending.values())
            if (self._completion_thread is not None
                    and self._completion_thread.is_alive()):
                leftovers += list(self._inflight.values())
                self._inflight.clear()
            for reqs in leftovers:
                for r in reqs:
                    if not r.future.done():
                        r.future.set_exception(RuntimeError("engine closed"))
            self._pending.clear()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # ------------------------------------------------------------ internal
    def _round_batch(self, n: int) -> int:
        for bs in self.batch_sizes:
            if bs >= n:
                return bs
        return self.max_batch

    def _take_batch(self) -> Optional[List[_Request]]:
        """Block until a batch is due; None when closed and drained.

        Serves the bucket holding the oldest pending request; dispatches
        when that bucket has max_batch requests or its oldest request
        has waited max_wait (or the engine is closing)."""
        with self._cv:
            while True:
                if self._pending:
                    # a FULL bucket anywhere dispatches first (oldest-full
                    # wins) so one early straggler in another bucket can't
                    # head-of-line-block a ready batch — UNLESS the oldest
                    # request has already waited out max_wait, which would
                    # otherwise starve a cold bucket forever under
                    # sustained load on a hot shape (latency bound:
                    # max_wait + one sampler call)
                    oldest = lambda b: self._pending[b][0].t_submit
                    oldest_bucket = min(self._pending, key=oldest)
                    oldest_age = (time.perf_counter()
                                  - oldest(oldest_bucket))
                    full = [b for b, r in self._pending.items()
                            if len(r) >= self.max_batch]
                    bucket = (min(full, key=oldest)
                              if full and oldest_age < self.max_wait
                              else oldest_bucket)
                    reqs = self._pending[bucket]
                    age = time.perf_counter() - reqs[0].t_submit
                    if (len(reqs) >= self.max_batch or age >= self.max_wait
                            or self._closed):
                        take = reqs[:self.max_batch]
                        rest = reqs[self.max_batch:]
                        if rest:
                            self._pending[bucket] = rest
                        else:
                            del self._pending[bucket]
                        return take
                    self._cv.wait(timeout=self.max_wait - age)
                elif self._closed:
                    return None
                else:
                    self._cv.wait()

    def _dispatch(self, mix: np.ndarray, lengths: np.ndarray):
        """Upload + enqueue one batch; returns the (async) device result.
        Does NOT block on the computation — jax dispatch returns a future
        array; the host read in :meth:`_finalize` is the fence."""
        if self.wire_int16:
            mix = np.clip(mix, -1.0, 1.0)
            mix = np.round(mix * 32768.0).clip(-32768, 32767).astype(
                np.int16)
        mix_j = jax.numpy.asarray(mix)
        args = ()
        if self._sharding is not None:
            mix_j = jax.device_put(mix_j, self._sharding)
        if self.pass_lengths:
            lens = jax.numpy.asarray(lengths)
            if self._sharding is not None:
                lens = jax.device_put(lens, self._sharding)
            args = (lens,)
        with self._cv:
            self._key, sub = jax.random.split(self._key)
        return self._fn(sub, mix_j, *args)

    def _finalize(self, est) -> np.ndarray:
        # host read = true completion fence on tunneled backends
        # (see eval/evaluate._host_fence)
        est = np.asarray(est)
        if self.wire_int16:
            est = est.astype(np.float32) / 32767.0
        return est

    def _run(self, mix: np.ndarray, lengths: np.ndarray) -> np.ndarray:
        return self._finalize(self._dispatch(mix, lengths))

    def _complete(self, batch: List[_Request], bs: int, est) -> None:
        """Host-read one dispatched batch and resolve its futures."""
        try:
            est = self._finalize(est)
            now = time.perf_counter()
            with self._cv:
                self._stats["batches"] += 1
                self._stats["batched_items"] += len(batch)
                self._stats["padded_rows"] += bs - len(batch)
                self._latencies.extend(
                    now - r.t_submit for r in batch)
                del self._latencies[:-1024]
            for i, r in enumerate(batch):
                if not r.future.done():  # close() may have failed it
                    r.future.set_result(
                        np.array(est[i][:, :r.audio.shape[-1]]))
        except Exception as e:  # resolve futures, keep serving
            for r in batch:
                if not r.future.done():
                    r.future.set_exception(e)

    def _completion_loop(self) -> None:
        while True:
            item = self._queue.get()
            if item is None:
                return
            try:
                self._complete(*item)
            finally:
                with self._cv:
                    self._inflight.pop(id(item[0]), None)
                self._inflight_sem.release()

    def _loop(self) -> None:
        while True:
            batch = self._take_batch()
            if batch is None:
                if self._queue is not None:
                    self._queue.put(None)  # drain sentinel
                return
            if self._inflight_sem is not None:
                # blocks BEFORE upload when pipeline_depth batches are
                # already in flight, bounding device-side I/O buffering
                self._inflight_sem.acquire()
                with self._cv:
                    self._inflight[id(batch)] = batch
            try:
                bs = self._round_batch(len(batch))
                blen = batch[0].bucket
                mix = np.zeros((bs, 1, blen), np.float32)
                lens = np.full((bs,), blen, np.int32)
                for i, r in enumerate(batch):
                    L = r.audio.shape[-1]
                    mix[i, 0, :L] = r.audio  # trailing-quiet padding
                    lens[i] = L
                est = self._dispatch(mix, lens)
            except Exception as e:  # dispatch-time failure
                for r in batch:
                    if not r.future.done():
                        r.future.set_exception(e)
                if self._inflight_sem is not None:
                    with self._cv:
                        self._inflight.pop(id(batch), None)
                    self._inflight_sem.release()
                continue
            if self._queue is None:
                self._complete(batch, bs, est)
            else:
                self._queue.put((batch, bs, est))
