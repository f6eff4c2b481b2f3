"""Artifact-level harness parity: the reference's own evaluate_process /
summarize executables (torch CPU, deps stubbed — see harness_parity_lib)
vs our eval.evaluate_dataset (the function cli/evaluate drives), same
synthetic LibriMix-layout test set, same imported weights, same noise.

This upgrades the full-pipeline waveform oracle
(tests/test_full_pipeline_parity.py) to the RESULT-ARTIFACT level: the
per-utterance JSON (si_sdr/si_sir/si_sar/pesq/stoi/nfe/len_s, the
results/.../librimix_test.json schema) and the summary means must agree
through the reference's own metric + aggregation code
(reference: src/evaluate_mp.py:171-209, 212-354, 516-529).
"""
import json
import sys
from pathlib import Path

import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, str(Path(__file__).parent))

import harness_parity_lib as lib  # noqa: E402


def _check_leg(art, tmp_path, ref_dir, our_dir):
    deltas = art["per_utterance_max_abs_delta"]
    for f, tol in lib.TOL.items():
        assert deltas[f] <= tol, (f, deltas[f], tol)
    assert all(art["exact_fields"].values()), art["exact_fields"]
    for f in ("si_sdr", "si_sir", "si_sar"):
        assert art["summary_abs_delta"][f] <= lib.TOL[f]
    assert art["summary_abs_delta"]["number_equal"]
    for side in (ref_dir, our_dir):
        d = tmp_path / side
        assert (d / "librimix_test.json").exists()
        assert (d / "librimix_test_summary.json").exists()


@pytest.mark.slow
def test_eval_harness_artifact_parity_ouve(tmp_path):
    """The reference's evaluate_ouve executable (DiffSepOU, OUVESDE,
    'ald' corrector — src/evaluate_ouve.py:257,315) vs our OUVE-config
    evaluate_dataset path."""
    import harness_parity_ext as ext

    art = ext.run_ouve_parity(str(tmp_path))
    _check_leg(art, tmp_path, "ref_out", "our_out")


@pytest.mark.slow
def test_eval_harness_artifact_parity_latent(tmp_path):
    """The reference's evaluate_latent executable (LatentDiffSep:
    VAE-encode -> latent PC -> decode, src/evaluate_latent.py:259-281)
    vs our separate_latent evaluate_dataset path (the cli/evaluate
    --latent wiring)."""
    import harness_parity_ext as ext

    art = ext.run_latent_parity(str(tmp_path))
    _check_leg(art, tmp_path, "ref_out_lat", "our_out_lat")


@pytest.mark.slow
def test_eval_harness_artifact_parity(tmp_path):
    art = lib.run_full_parity(str(tmp_path))
    deltas = art["per_utterance_max_abs_delta"]
    for f, tol in lib.TOL.items():
        assert deltas[f] <= tol, (f, deltas[f], tol)
    assert all(art["exact_fields"].values()), art["exact_fields"]
    for f in ("si_sdr", "si_sir", "si_sar"):
        assert art["summary_abs_delta"][f] <= lib.TOL[f]
    assert art["summary_abs_delta"]["number_equal"]
    # both sides actually produced the reference's file layout
    for side in ("ref_out", "our_out"):
        d = tmp_path / side
        assert (d / "librimix_test.json").exists()
        assert (d / "librimix_test_summary.json").exists()
    ref = json.load(open(tmp_path / "ref_out" / "librimix_test.json"))
    ours = json.load(open(tmp_path / "our_out" / "librimix_test.json"))
    # per-utterance schema identity (reference artifact keys, per-source
    # nesting: si_* as [[s1, s2]], pesq/stoi as [s1, s2])
    r0, o0 = ref["0"], ours["0"]
    assert set(o0) >= set(r0) - {"runtime"}
    assert len(r0["si_sdr"][0]) == len(o0["si_sdr"][0]) == 2
    assert len(r0["pesq"]) == len(o0["pesq"]) == 2
