"""Generate docs/harness_parity_r04.json: artifact-level parity between
the reference's own evaluation harness executable and ours (VERDICT r3
item 1). See tests/harness_parity_lib.py for what runs and what is
stubbed.

    python scripts/harness_parity.py [--out docs/harness_parity_r04.json]
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
                                        / "harness_parity_r04.json"))
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      str(ROOT / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    import harness_parity_lib as lib

    with tempfile.TemporaryDirectory() as work:
        art = lib.run_full_parity(work)
    with open(args.out, "w") as f:
        json.dump(art, f, indent=1)
    print(json.dumps({"pass": art["pass"],
                      **art["per_utterance_max_abs_delta"]}, indent=1))
    print("wrote", args.out)


if __name__ == "__main__":
    main()
