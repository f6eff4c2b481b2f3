"""Metrics logging: tensorboard (tensorboardX) + JSONL, wandb optional.

Replaces the reference's WandbLogger/TensorBoardLogger selection
(reference: src/train_diffsep.py:141-154).
"""
from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Dict, Optional


class MetricsLogger:
    """Writes scalars to a JSONL file and, when available, tensorboard.
    Set backend='wandb' to use wandb (gated on the optional package)."""

    def __init__(self, workdir: str, backend: str = "tensorboard",
                 project: Optional[str] = None, enabled: bool = True):
        # enabled=False turns every write into a no-op -- multi-host
        # training passes enabled=is_rank_zero() so N processes don't
        # interleave one shared metrics.jsonl / tb event stream
        self.enabled = enabled
        self.dir = Path(workdir)
        self._jsonl = None
        self._tb = None
        self._wandb = None
        if not enabled:
            return
        self.dir.mkdir(parents=True, exist_ok=True)
        self._jsonl = open(self.dir / "metrics.jsonl", "a")
        if backend == "tensorboard":
            try:
                from tensorboardX import SummaryWriter
                self._tb = SummaryWriter(str(self.dir / "tb"))
            except ImportError:
                pass
        elif backend == "wandb":
            try:
                import wandb
                self._wandb = wandb.init(project=project or "ditsep_tpu",
                                         dir=str(self.dir))
            except ImportError:
                pass

    def log_audio(self, tag: str, wav, step: int, fs: int = 8000) -> None:
        """Log a mono waveform demo (reference: log_audio in
        src/stable_audio_tools/training/utils.py:117-148, LDMDemoCallback
        src/ldm.py:630-726). Normalised to peak 1 for playback.

        The audio Summary proto is built directly (stdlib WAV encoding):
        tensorboardX.add_audio needs the soundfile package, absent here.
        """
        if not self.enabled:
            return
        import numpy as np
        x = np.asarray(wav, np.float32).reshape(-1)
        if x.size == 0:
            return  # nothing to log; np.max on empty raises
        # sanitize non-finite audio (diverged training) BEFORE peak
        # normalization: NaN is truthy, so `peak or 1.0` won't catch it
        # and NaN/32767 would cast to int16 garbage
        if not np.isfinite(x).all():
            x = np.nan_to_num(x, nan=0.0, posinf=1.0, neginf=-1.0)
        peak = float(np.max(np.abs(x))) or 1.0
        x = x / max(peak, 1e-8)
        if self._tb is not None:
            import io
            import wave

            buf = io.BytesIO()
            with wave.open(buf, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(fs)
                w.writeframes(
                    (np.clip(x, -1, 1) * 32767).astype("<i2").tobytes())
            from tensorboardX.proto.summary_pb2 import Summary
            audio = Summary.Audio(
                sample_rate=float(fs), num_channels=1,
                length_frames=len(x),
                encoded_audio_string=buf.getvalue(),
                content_type="audio/wav")
            self._tb._get_file_writer().add_summary(
                Summary(value=[Summary.Value(tag=tag, audio=audio)]), step)
        if self._wandb is not None:
            import wandb
            self._wandb.log({tag: wandb.Audio(x, sample_rate=fs)},
                            step=step)

    def log_figure(self, tag: str, fig, step: int) -> None:
        """Log a matplotlib figure (spectrograms, PCA clouds; reference:
        aeiou.py:18-279 media helpers). Closes the figure after writing."""
        if self._tb is not None:
            self._tb.add_figure(tag, fig, step, close=False)
        if self._wandb is not None:
            import wandb
            self._wandb.log({tag: wandb.Image(fig)}, step=step)
        try:
            import matplotlib.pyplot as plt
            plt.close(fig)
        except Exception:
            pass

    def log(self, metrics: Dict[str, float], step: int) -> None:
        if not self.enabled:
            return
        rec = {"step": int(step), "time": time.time(),
               **{k: float(v) for k, v in metrics.items()}}
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.add_scalar(k, float(v), step)
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def close(self):
        if self._jsonl is not None:
            self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
        if self._wandb is not None:
            self._wandb.finish()
