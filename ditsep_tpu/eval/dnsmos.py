"""Merge DNSMOS CSV scores into evaluation results JSON.

Re-design of the reference tool (reference: src/evaluate/
merge_dnsmos.py:12-160): DNSMOS is computed externally (Microsoft's ONNX
models) over the separated wavs; this joins its per-file CSV back into the
per-utterance results JSON and refreshes the summary.
"""
from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Dict, Optional


def merge_dnsmos(results_json: str, dnsmos_csv: str,
                 out_json: Optional[str] = None,
                 filename_index_re: str = r"(\d+)") -> Dict:
    """Join DNSMOS columns (OVRL/SIG/BAK) into results keyed by utterance
    index parsed from the CSV's filename column."""
    import csv

    with open(results_json) as f:
        results = json.load(f)

    scores: Dict[str, Dict[str, list]] = {}
    with open(dnsmos_csv) as f:
        for row in csv.DictReader(f):
            fname = row.get("filename") or row.get("file") or ""
            m = re.search(filename_index_re, Path(fname).stem)
            if not m:
                continue
            idx = str(int(m.group(1)))
            entry = scores.setdefault(
                idx, {"dnsmos_ovrl": [], "dnsmos_sig": [],
                      "dnsmos_bak": []})
            for src, dst in [("OVRL", "dnsmos_ovrl"), ("SIG", "dnsmos_sig"),
                             ("BAK", "dnsmos_bak")]:
                if src in row and row[src] != "":
                    entry[dst].append(float(row[src]))

    for idx, entry in scores.items():
        if idx in results:
            for k, v in entry.items():
                if v:
                    results[idx][k] = v

    out = out_json or results_json
    with open(out, "w") as f:
        json.dump(results, f, indent=0)
    return results
