"""Evaluation: metrics and the sharded batched eval harness."""
from ditsep_tpu.eval.evaluate import evaluate_dataset
from ditsep_tpu.eval.metrics import (
    compute_metrics,
    pesq_metric,
    si_bss_eval_sources,
    stoi,
)
