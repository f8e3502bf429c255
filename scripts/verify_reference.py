#!/usr/bin/env python
"""Reference-mount readiness probe (VERDICT r2, task 9).

``/root/reference`` was an EMPTY mount through rounds 1–3; every
``ref:`` citation and the handful of [VERIFY] markers (M6 DP constants,
C5 weight-law constants, DBA sampling law) are pinned on the PUBLIC
upstream surface and must be reconciled the moment the mount holds the
actual tree. This script:

- exits 0 quietly when the mount is still empty (safe to run every
  round);
- otherwise runs SURVEY.md §"Re-verification recipe" (the pinned greps
  that locate every §2-cited operator), prints the results, diffs the
  canonical golden kernel values against upstream's own test constants
  where they are greppable, and exits non-zero if any pinned symbol is
  MISSING — the signal that §2 must be updated before trusting the
  correctness story.

Read-only with respect to the mount; never writes outside stdout.
"""

from __future__ import annotations

import math
import os
import re
import subprocess
import sys

REF = "/root/reference"

# (path glob relative to the mount, regex, what it pins)
PINS = [
    ("dtaidistance/dtw.py", r"def distance\b", "K1 dtw.distance"),
    ("dtaidistance/dtw.py", r"def distance_fast", "K2 distance_fast"),
    ("dtaidistance/dtw.py", r"def distance_matrix", "M1 distance_matrix"),
    ("dtaidistance/dtw.py", r"def lb_keogh", "K3 lb_keogh"),
    ("dtaidistance/dtw.py", r"def ub_euclidean", "K4 ub_euclidean"),
    ("dtaidistance/dtw.py", r"def warping_paths", "P1 warping_paths"),
    ("dtaidistance/dtw.py", r"def best_path", "P2 best_path"),
    ("dtaidistance/dtw.py", r"def warp\b", "P4 warp"),
    ("dtaidistance/dtw.py", r"use_pruning", "K11 PrunedDTW flag"),
    ("dtaidistance/dtw.py", r"psi", "K9 psi relaxation"),
    ("dtaidistance/dtw_barycenter.py", r"def dba(_loop)?\b", "A1 DBA"),
    ("dtaidistance/dtw_barycenter.py", r"nb_prob_samples",
     "A1 nb_prob_samples signature"),
    ("dtaidistance/ed.py", r"def distance", "K6 ed.distance"),
    ("dtaidistance/dtw_ndim.py", r"def distance", "K7 ndim distance"),
    ("dtaidistance/preprocessing.py", r"def smoothing", "S2 smoothing"),
    ("dtaidistance/preprocessing.py", r"def differencing",
     "S1 differencing"),
    ("dtaidistance/alignment.py", r"def needleman_wunsch",
     "P6 needleman_wunsch"),
    ("dtaidistance/similarity.py", r"def distance_to_similarity",
     "M7 distance_to_similarity"),
    ("dtaidistance/dtw_weighted.py", r"def compute_weights_using_dt",
     "C5 weight learning"),
    ("dtaidistance/subsequence/dtw.py", r"def subsequence_alignment",
     "M4 subsequence_alignment"),
    ("dtaidistance/subsequence/dtw.py", r"local_concurrences",
     "M6 local_concurrences"),
]

# [VERIFY]-gated spots in THIS repo that must be reconciled by hand
RECONCILE = [
    ("dtaidistance_spark/kernels.py", "M6 local_concurrences DP constants "
     "(gamma/tau/delta/delta_factor defaults + recurrence)"),
    ("dtaidistance_spark/kernels.py", "C5 dtw_weighted (n,4) rectifier "
     "column convention"),
    ("dtaidistance_spark/weightlearn.py", "C5 split->weight law "
     "(slope = 1 + gain/parent_entropy is this repo's documented choice)"),
    ("dtaidistance_spark/kernels.py", "A1 nb_prob_samples deterministic "
     "farthest-first substitution vs upstream's random sampling law"),
    ("dtaidistance_spark/clustering/hierarchical.py", "C2 merge-hook "
     "argument convention"),
]


def mount_population() -> list[str]:
    if not os.path.isdir(REF):
        return []
    out = []
    for root, _dirs, files in os.walk(REF):
        for f in files:
            out.append(os.path.join(root, f))
        if len(out) > 50_000:
            break
    return out


def grep(path: str, pattern: str) -> list[str]:
    try:
        with open(path, encoding="utf-8", errors="replace") as fh:
            return [
                f"{i}:{line.rstrip()}"
                for i, line in enumerate(fh, 1)
                if re.search(pattern, line)
            ]
    except OSError:
        return []


def golden_values_ok() -> bool:
    """The FIXTURES.md G1 canonical pair must hold in OUR kernels and —
    when upstream tests are present — appear in their test constants."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from dtaidistance_spark import kernels as K

    s1 = [0.0, 0, 1, 2, 1, 0, 1, 0, 0]
    s2 = [0.0, 1, 2, 0, 0, 0, 0, 0, 0]
    ours = K.dtw_distance(s1, s2)
    ok = abs(ours - math.sqrt(2)) < 1e-12
    print(f"G1 canonical dtw([0,0,1,2,1,0,1,0,0],[0,1,2,0,...]) = {ours} "
          f"(sqrt(2) expected): {'OK' if ok else 'MISMATCH'}")
    tests = os.path.join(REF, "tests", "test_dtw.py")
    if os.path.exists(tests):
        hits = grep(tests, r"1\.4142|sqrt\(2\)|\[0, 0, 1, 2, 1, 0, 1, 0, 0\]")
        print(f"upstream tests/test_dtw.py golden-constant hits: {len(hits)}")
        for h in hits[:5]:
            print("   ", h)
    return ok


def main() -> int:
    files = mount_population()
    if not files:
        print(f"{REF}: EMPTY mount — nothing to reconcile (exit 0). "
              f"Re-run this script when it is populated.")
        return 0

    print(f"{REF}: {len(files)} files — running the SURVEY.md recipe\n")
    subprocess.run(
        "find . -name '*.py' -not -path './docs/*' | xargs wc -l | sort -n"
        " | tail -25",
        shell=True, cwd=REF, check=False,
    )
    print()
    missing = []
    for rel, pattern, label in PINS:
        path = os.path.join(REF, rel)
        hits = grep(path, pattern)
        status = f"{len(hits)} hit(s)" if hits else "MISSING"
        print(f"[{'ok' if hits else '!!'}] {label:42s} {rel} :: {status}")
        for h in hits[:2]:
            print("      ", h[:110])
        if not hits:
            missing.append(label)

    print()
    golden = golden_values_ok()

    print("\nManual reconciliation checklist ([VERIFY] markers in-repo):")
    for path, what in RECONCILE:
        print(f"  - {path}: {what}")

    if missing:
        print(f"\n{len(missing)} pinned symbol(s) MISSING from the mount: "
              f"{missing}")
        print("Update SURVEY.md §2 before trusting correctness claims.")
        return 1
    if not golden:
        return 2
    print("\nAll pinned symbols located; run the per-file diff review next.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
