#!/usr/bin/env python
"""Degradation-severity sweep over trained denoise artifacts (VERDICT r4
item 4: the photo/synthetic denoise gates were measured at ONE operating
point — the training severity; this sweep re-evaluates the same artifacts
at the bracketing presets so the gate conclusion carries a dose-response
curve, not a scalar).

Eval-only: points at a finished denoise_quality_experiment workdir and runs
the real eval CLI per (arm, severity) with the fixed-seed protocol —
severities come from data/degrade.DENOISE_SEVERITIES (light / default /
heavy scale the gauss var, ISO intensity, and JPEG quality ranges together).

Usage: python scripts/denoise_severity_sweep.py --workdir /tmp/dq_w
       [--severities light,heavy] [--int8_arms W,N]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path
import sys

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def run(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--workdir", type=str, required=True,
                        help="a finished denoise_quality_experiment workdir "
                             "(its *.isr artifacts and val_images.json)")
    parser.add_argument("--severities", type=str, default="light,heavy",
                        help="comma-set; 'default' is already in the "
                             "experiment's own results.json")
    parser.add_argument("--int8_arms", type=str, default="",
                        help="comma-set of arm prefixes also evaluated "
                             "through the int8 PTQ path")
    parser.add_argument("--out", type=str, default=None,
                        help="output JSON (default WORKDIR/severity_sweep"
                             ".json)")
    opt = parser.parse_args(argv)

    from image_super_resolution_tpu.cli.evaluate import main as ev

    ws = Path(opt.workdir)
    artifacts = sorted(ws.glob("*.isr"))
    if not artifacts:
        raise SystemExit(f"no .isr artifacts under {ws}")
    int8_prefixes = {a.strip().upper() for a in opt.int8_arms.split(",")
                     if a.strip()}

    results: dict = {}
    for sev in [s.strip() for s in opt.severities.split(",") if s.strip()]:
        for art in artifacts:
            tag = art.stem
            ev_args = ["--model", str(art), "--denoise_eval",
                       "--severity", sev,
                       "--val_json", str(ws / "val_images.json"),
                       "--shape", "192", "--batch_size", "2"]
            print(f"--- {tag} @ {sev} ---")
            results[f"{tag}@{sev}"] = ev(ev_args)
            if tag[0] in int8_prefixes:
                print(f"--- {tag} @ {sev} (int8) ---")
                results[f"{tag}@{sev}_int8"] = ev([*ev_args, "--int8"])

    out = Path(opt.out) if opt.out else ws / "severity_sweep.json"
    out.write_text(json.dumps(results, indent=2))
    print(json.dumps(results, indent=2))
    return results


if __name__ == "__main__":
    run()
