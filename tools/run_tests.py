"""Sharded pytest runner: the full suite in a fraction of the wall
time, with zero new dependencies (pytest-xdist is not in this
environment and installs are off-limits).

Why: the serial suite crossed 26 minutes at r10 (1557 tests) and
grows ~40 tests/round — long enough to start getting skipped in
practice, which is how regressions slip. Spark tests are mostly
I/O-and-JVM-bound at local[8], so N concurrent pytest processes on a
32-CPU host scale nearly linearly.

How: one worker pool, work-stealing queue of test FILES (a file is
the isolation unit — each subprocess gets its own session-scoped
Spark fixture, tmp warehouse, and checkpoint dirs, so nothing is
shared across workers). Files are dispatched longest-first using the
durations recorded by the previous run (tools/test_durations.json,
refreshed on every run), which keeps the tail short. Failure output
is replayed verbatim at the end; exit code is nonzero if any file
fails — same contract as `pytest tests/ -q`.

Usage:
    python tools/run_tests.py            # -j auto (cpus // 8, max 6)
    python tools/run_tests.py -j 4       # explicit worker count
    python tools/run_tests.py tests/test_cdc.py ...   # subset
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import queue
import re
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DUR_PATH = os.path.join(REPO, "tools", "test_durations.json")
SUMMARY_RE = re.compile(
    r"(?:(\d+) failed)?(?:, )?(?:(\d+) passed)?(?:, )?(?:(\d+) skipped)?"
)


def run_file(path: str) -> dict:
    t0 = time.monotonic()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", path, "-q", "--tb=short",
         "-p", "no:cacheprovider"],
        capture_output=True,
        text=True,
        cwd=REPO,
    )
    dur = time.monotonic() - t0
    out = proc.stdout + proc.stderr
    failed = passed = skipped = 0
    # last pytest summary line, e.g. "3 failed, 40 passed, 2 skipped in 12.3s"
    for line in reversed(out.splitlines()):
        m = re.search(r"in \d+(\.\d+)?s", line)
        if m and ("passed" in line or "failed" in line or "skipped" in line
                  or "error" in line):
            for n, word in re.findall(r"(\d+) (\w+)", line):
                if word == "failed":
                    failed = int(n)
                elif word == "passed":
                    passed = int(n)
                elif word == "skipped":
                    skipped = int(n)
            break
    return {
        "file": path,
        "rc": proc.returncode,
        "dur": dur,
        "failed": failed,
        "passed": passed,
        "skipped": skipped,
        "output": out,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("files", nargs="*", help="test files (default: tests/test_*.py)")
    ap.add_argument("-j", type=int, default=0, help="workers (default cpus//8, max 6)")
    args = ap.parse_args()
    files = args.files or sorted(glob.glob(os.path.join(REPO, "tests", "test_*.py")))
    files = [os.path.relpath(f, REPO) for f in files]
    jobs = args.j or max(2, min(6, (os.cpu_count() or 8) // 8))

    try:
        with open(DUR_PATH) as fh:
            prev = json.load(fh)
    except (OSError, ValueError):
        prev = {}
    # longest-first keeps the tail from being one giant straggler file
    files.sort(key=lambda f: -prev.get(f, 60.0))

    q: queue.Queue[str] = queue.Queue()
    for f in files:
        q.put(f)
    results: list[dict] = []
    lock = threading.Lock()

    def worker() -> None:
        while True:
            try:
                path = q.get_nowait()
            except queue.Empty:
                return
            res = run_file(path)
            with lock:
                results.append(res)
                state = "FAIL" if res["rc"] else (
                    "pass" if res["failed"] == 0 else "FAIL")
                print(
                    f"[{len(results):2d}/{len(files)}] {state} {path} "
                    f"({res['passed']}p/{res['failed']}f/{res['skipped']}s, "
                    f"{res['dur']:.1f}s)",
                    flush=True,
                )

    t0 = time.monotonic()
    threads = [threading.Thread(target=worker) for _ in range(jobs)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.monotonic() - t0

    # Merge into the existing duration map rather than replacing it: a
    # subset run (e.g. `run_tests.py tests/test_cdc.py`) must not discard
    # every other file's recorded duration, or longest-first scheduling
    # degrades on the next full run.
    prev: dict = {}
    try:
        with open(DUR_PATH) as fh:
            prev = json.load(fh)
    except (OSError, ValueError):
        prev = {}
    prev.update({r["file"]: round(r["dur"], 1) for r in results})
    with open(DUR_PATH, "w") as fh:
        json.dump(prev, fh, indent=0, sort_keys=True)

    bad = [r for r in results if r["rc"] != 0]
    # pytest exit code 5 = no tests collected — treat as failure too
    for r in bad:
        print(f"\n=== FAILURE OUTPUT: {r['file']} (rc={r['rc']}) ===")
        print(r["output"][-8000:])
    tp = sum(r["passed"] for r in results)
    tf = sum(r["failed"] for r in results)
    ts = sum(r["skipped"] for r in results)
    core = sum(r["dur"] for r in results)
    print(
        f"\nTOTAL: {tp} passed, {tf} failed, {ts} skipped across "
        f"{len(results)} files | wall {wall:.0f}s (serial-equivalent "
        f"{core:.0f}s, {jobs} workers)"
    )
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
