"""Round close-out: run every gate, regenerate the evidence artifacts,
and REFUSE to finish with a dirty tree.

Three rounds in a row ended with BENCH_FULL.json / SCALING.md / PLANS.md
modified-but-uncommitted, which silently weakens the next round's
regression tripwires (bench.py diffs `git show HEAD:BENCH_FULL.json`).
This script is the mechanical fix: it runs the correctness gates first
(fail fast — never record evidence for a red tree), regenerates the
scale-evidence artifacts and the bench record, then commits everything
and verifies `git status` is clean.

Usage:
    python tools/closeout.py            # gates + artifacts + commit
    python tools/closeout.py --no-slow  # skip scaling_probe/scale_stress
                                        # (they re-run ~40 queries at 3 SFs
                                        # + a 10x synthetic; ~30-60 min)
    python tools/closeout.py --dry-run  # run everything, skip the commit
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# artifacts a close-out commit must carry if they changed
ARTIFACTS = [
    "BENCH_FULL.json",
    "BASELINE.md",
    "SCALING.md",
    "PLANS.md",
    "PROGRESS.md",
]

# driver-written round records that may appear after a judge run; staging
# them is fine, anything ELSE untracked must abort the commit
ROUND_RECORD_GLOBS = [
    "BENCH_r*.json",
    "CORRECTNESS_r*.json",
    "VERDICT.md",
    "ADVICE.md",
    "LEAKCHECK.json",
    "COPYCHECK.json",
    "PROGRESS.jsonl",
]


def run(cmd: list[str], name: str) -> None:
    print(f"== {name}: {' '.join(cmd)}", flush=True)
    r = subprocess.run(cmd, cwd=REPO)
    if r.returncode != 0:
        print(f"closeout ABORTED: {name} exited {r.returncode}", file=sys.stderr)
        sys.exit(r.returncode)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-slow", action="store_true", help="skip scaling_probe/scale_stress")
    ap.add_argument("--dry-run", action="store_true", help="run gates + artifacts, no commit")
    args = ap.parse_args()

    py = sys.executable

    # 1. correctness gates — a red tree records no evidence
    run([py, "tools/check_oracle.py"], "oracle gate")
    run([py, "-m", "pytest", "tests/", "-q"], "pytest gate")

    # 2. scale-evidence artifacts
    if not args.no_slow:
        run([py, "tools/scaling_probe.py"], "scaling probe (SCALING.md)")
        run([py, "tools/scale_stress.py"], "10x stress (SCALING.md appendix)")
    run([py, "tools/plan_audit.py"], "plan audit (PLANS.md)")

    # 3. bench record (refreshes BENCH_FULL.json, then the prose table)
    run([py, "bench.py"], "bench")
    run([py, "tools/baseline_md.py"], "baseline table (BASELINE.md)")

    # 4. commit ONLY the expected artifacts + driver round records —
    # `git add -A` once swept stray scratch files into an evidence
    # commit; any unexpected path now ABORTS with a listing instead.
    import fnmatch

    status = subprocess.run(
        ["git", "status", "--porcelain"], cwd=REPO, capture_output=True, text=True
    ).stdout
    if not status.strip():
        print("closeout: tree already clean, nothing to commit")
        return
    expected = []
    unexpected = []
    # NOTE: do not strip() the whole porcelain output before splitting —
    # that eats the first line's leading status-column space and shifts
    # the path slice by one (r10: ' M BASELINE.md' parsed as 'ASELINE.md'
    # and aborted a clean close). Slice each intact line instead.
    for line in status.splitlines():
        if not line.strip():
            continue
        path = line[3:].strip().strip('"')
        ok = path in ARTIFACTS or any(
            fnmatch.fnmatch(path, g) for g in ROUND_RECORD_GLOBS
        )
        (expected if ok else unexpected).append(path)
    if unexpected:
        print(
            "closeout ABORTED: unexpected dirty/untracked paths (commit or "
            "remove them first; evidence commits carry only known "
            "artifacts):\n  " + "\n  ".join(unexpected),
            file=sys.stderr,
        )
        sys.exit(1)
    if args.dry_run:
        print("closeout --dry-run: tree dirty, would commit:\n" + status)
        sys.exit(1)
    subprocess.run(["git", "add", "--"] + expected, cwd=REPO, check=True)
    subprocess.run(
        ["git", "commit", "-m", "Round close-out: refresh bench/scaling/plan evidence artifacts"],
        cwd=REPO,
        check=True,
    )
    status = subprocess.run(
        ["git", "status", "--porcelain"], cwd=REPO, capture_output=True, text=True
    ).stdout.strip()
    if status:
        print("closeout FAILED: tree still dirty after commit:\n" + status, file=sys.stderr)
        sys.exit(1)
    print("closeout: gates green, artifacts committed, tree clean")


if __name__ == "__main__":
    main()
