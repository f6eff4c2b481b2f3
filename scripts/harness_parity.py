"""Generate docs/harness_parity_r05.json: artifact-level parity between
the reference's OWN evaluator executables and ours, for all THREE
families (VERDICT r3 item 1 + r4 item 3):

* evaluate_mp     (DiffSepModel, MixSDE, 'ald2')  — harness_parity_lib
* evaluate_ouve   (DiffSepOU, OUVESDE, 'ald')     — harness_parity_ext
* evaluate_latent (LatentDiffSep, encode->latent PC->decode)

Each leg runs the reference's evaluate_process + summarize on torch CPU
(deps stubbed, see the lib/ext module docstrings) and our
eval.evaluate_dataset with imported weights and matched noise, then
diffs the per-utterance result JSON field by field.

    python scripts/harness_parity.py [--out docs/harness_parity_r05.json]
"""
import argparse
import json
import sys
import tempfile
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tests"))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default=str(ROOT / "docs"
                                        / "harness_parity_r05.json"))
    p.add_argument("--families", default="mp,ouve,latent",
                   help="comma list: mp,ouve,latent")
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      str(ROOT / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    import harness_parity_ext as ext
    import harness_parity_lib as lib

    fams = {}
    wanted = args.families.split(",")
    if "mp" in wanted:
        with tempfile.TemporaryDirectory() as work:
            fams["evaluate_mp"] = lib.run_full_parity(work)
    if "ouve" in wanted:
        with tempfile.TemporaryDirectory() as work:
            fams["evaluate_ouve"] = ext.run_ouve_parity(work)
    if "latent" in wanted:
        with tempfile.TemporaryDirectory() as work:
            fams["evaluate_latent"] = ext.run_latent_parity(work)

    art = {"families": fams,
           "pass": bool(all(f["pass"] for f in fams.values()))}
    with open(args.out, "w") as f:
        json.dump(art, f, indent=1)
        f.write("\n")
    print(json.dumps(
        {name: {"pass": f["pass"], **f["per_utterance_max_abs_delta"]}
         for name, f in fams.items()} | {"pass": art["pass"]}, indent=1))
    print("wrote", args.out)


if __name__ == "__main__":
    main()
