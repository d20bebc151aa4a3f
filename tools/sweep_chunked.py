"""Crash-resilient full oracle sweep: split queries() into chunks, run each
chunk via check_oracles.py --json in a FRESH process (fresh Ray session), and
merge the per-chunk artifacts into one sweep JSON.

Why: a single-process sweep over ~380 queries occasionally dies to a Ray-core
fatal (reference_count.cc CHECK) long before finishing — one crash then loses
hours of results. Per-chunk processes bound the blast radius to one chunk, and
a failed chunk is retried once with chunk size 1 so a genuine per-query fault
is pinpointed rather than smearing across neighbors.

Usage: python tools/sweep_chunked.py [--out docs/oracle_sweep_r4.json]
                                     [--sf /root/testdata/sf0.01] [--chunk 40]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _query_names() -> list[str]:
    sys.path.insert(0, REPO)
    import __ray_entry__ as entry

    return list(entry.queries())


def _run_chunk(names: list[str], sf_dir: str, out_path: str, timeout_s: int) -> dict | None:
    cmd = [
        sys.executable,
        os.path.join(REPO, "tools", "check_oracles.py"),
        "--json",
        out_path,
        sf_dir,
        *names,
    ]
    try:
        subprocess.run(
            cmd,
            cwd=REPO,
            timeout=timeout_s,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
            check=False,
        )
    except subprocess.TimeoutExpired:
        return None
    if not os.path.exists(out_path):
        return None
    with open(out_path) as f:
        return json.load(f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/oracle_sweep.json")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--chunk", type=int, default=40)
    ap.add_argument("--timeout", type=int, default=1800)
    args = ap.parse_args()

    names = _query_names()
    results: dict[str, dict] = {}
    tmpdir = tempfile.mkdtemp(prefix="sweep_")
    chunks = [names[i : i + args.chunk] for i in range(0, len(names), args.chunk)]
    for ci, chunk in enumerate(chunks):
        out = os.path.join(tmpdir, f"chunk_{ci}.json")
        rep = _run_chunk(chunk, args.sf, out, args.timeout)
        got = rep["results"] if rep else {}
        missing = [n for n in chunk if n not in got]
        results.update(got)
        if missing:
            # chunk died mid-way (Ray-core crash / timeout): retry the
            # missing names one at a time so a host fault doesn't smear
            print(f"chunk {ci}: {len(missing)} missing, retrying singly", flush=True)
            for n in missing:
                out1 = os.path.join(tmpdir, f"retry_{n}.json")
                rep1 = _run_chunk([n], args.sf, out1, args.timeout)
                if rep1 and n in rep1["results"]:
                    results[n] = rep1["results"][n]
                else:
                    results[n] = {"status": "fail", "seconds": -1, "rows": -1,
                                  "error": "process died / timed out (singleton retry)"}
        done = sum(1 for v in results.values() if v["status"] == "pass")
        print(f"chunk {ci + 1}/{len(chunks)} done — {done} pass / {len(results)} run", flush=True)

    summary = {
        "sf_dir": args.sf,
        "n_pass": sum(1 for v in results.values() if v["status"] == "pass"),
        "n_fail": sum(1 for v in results.values() if v["status"] == "fail"),
        "n_rows_only": sum(1 for v in results.values() if v["status"] == "rows-only"),
        "results": results,
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    print(f"wrote {args.out}: {summary['n_pass']} pass, {summary['n_fail']} fail, "
          f"{summary['n_rows_only']} rows-only")
    return 1 if summary["n_fail"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
