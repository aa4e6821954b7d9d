#!/usr/bin/env python3
"""Same-host bench A/B against a baseline commit (VERDICT r10 #8).

Usage: python3 tools/bench_ab.py <baseline-commit> [--sf DIR] [--runs N]
       [--set core|ext|both]

The host-vs-code question recurs every round: a bench total moved, and
the verdict needs to know whether the CODE changed speed or the HOST
did. This settles it with one command: the baseline commit is checked
out into a throwaway git worktree, compiled there, and then full bench
runs ALTERNATE between HEAD's build and the baseline's build (A B A B …)
inside one host window — so any load drift hits both sides — and the
per-metric minima and their ratio are printed as the attribution table.

Interleaving is at run granularity (each side is the stock
`graft.Bench` JVM): the bench's own min-of-passes already absorbs
intra-run stalls; what the alternation adds is protection against the
window-scale load drift that made r10's +13% ambiguous. Ratios within
~±5% mean "the host"; a one-sided persistent gap means "the code".

Output: a table per metric (total, total_ext) with HEAD min, BASE min,
ratio, plus the per-query ratios whose |log-ratio| is largest. Also
writes bench_ab.json next to the repo root for the round record.
"""
import json, os, subprocess, sys, time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def sh(cmd, cwd, env=None, check=True):
    e = dict(os.environ)
    if env:
        e.update(env)
    p = subprocess.run(cmd, cwd=cwd, env=e, stdout=subprocess.PIPE,
                       stderr=subprocess.STDOUT, text=True)
    if check and p.returncode != 0:
        sys.exit(f"FAILED ({p.returncode}): {' '.join(cmd)}\n{p.stdout[-4000:]}")
    return p.stdout


def bench_once(cwd, sf):
    # bench_out.json is a TRACKED round record (graft.Bench writes it in
    # cwd): snapshot and restore it so an A/B run — possibly at a
    # non-protocol SF — can never leave wrong-scale numbers in the tree
    # for a later `git add -A` to commit (this happened once; the r10
    # sf0.1 record was briefly replaced by an sf0.01 validation run).
    out = os.path.join(cwd, "bench_out.json")
    prior = open(out).read() if os.path.exists(out) else None
    try:
        if prior is not None:
            os.remove(out)
        sh(["sbt", "-batch", "runMain graft.Bench"], cwd,
           env={"SPARK_GRAFT_SF_DIR": sf,
                "SPARK_GRAFT_CPUS": os.environ.get("SPARK_GRAFT_CPUS", "32")})
        lines = [json.loads(l) for l in open(out) if l.strip()]
        return {rec["metric"]: rec for rec in lines}
    finally:
        if prior is not None:
            with open(out, "w") as f:
                f.write(prior)
        elif os.path.exists(out):
            os.remove(out)


def main():
    args = sys.argv[1:]
    if not args:
        sys.exit(__doc__)
    commit = args[0]
    sf = "/root/testdata/sf0.1"
    runs = 2
    which = "both"
    i = 1
    while i < len(args):
        if args[i] == "--sf":
            sf = args[i + 1]; i += 2
        elif args[i] == "--runs":
            runs = int(args[i + 1]); i += 2
        elif args[i] == "--set":
            which = args[i + 1]; i += 2
        else:
            sys.exit(f"unknown arg {args[i]}")
    full = sh(["git", "rev-parse", commit], REPO).strip()
    wt = f"/tmp/graft-ab-{full[:12]}"
    if not os.path.isdir(wt):
        sh(["git", "worktree", "add", "--detach", wt, full], REPO)
    print(f"[ab] baseline {full[:12]} in {wt}; compiling both trees", flush=True)
    sh(["sbt", "-batch", "compile"], REPO)
    sh(["sbt", "-batch", "compile"], wt)

    sides = {"HEAD": REPO, "BASE": wt}
    results = {"HEAD": [], "BASE": []}
    order = ["HEAD", "BASE"]
    for r in range(runs):
        for side in order:
            t0 = time.time()
            rec = bench_once(sides[side], sf)
            results[side].append(rec)
            tot = {m: round(v["value"], 2) for m, v in rec.items()}
            print(f"[ab] run {r + 1}/{runs} {side}: {tot} "
                  f"(wall {time.time() - t0:.0f}s, load {rec.get('total', {}).get('load', '')})",
                  flush=True)
        order.reverse()  # ABBA ordering: strips linear load drift

    metrics = ["total"] if which == "core" else (
        ["total_ext"] if which == "ext" else ["total", "total_ext"])
    table = {}
    for m in metrics:
        hs = [rec[m]["value"] for rec in results["HEAD"] if m in rec]
        bs = [rec[m]["value"] for rec in results["BASE"] if m in rec]
        if not hs or not bs:
            # An old baseline may predate a metric (total_ext arrived in
            # round 6) — report and keep going rather than crash after
            # an hour of bench runs.
            print(f"[ab] {m}: missing from "
                  f"{'HEAD' if not hs else 'BASE'} records — skipped")
            table[m] = {"head_min": None, "base_min": None,
                        "ratio_head_over_base": None, "top_movers": []}
            continue
        h = min(hs)
        b = min(bs)
        # Per-query minima across runs, then the largest movers.
        hq, bq = {}, {}
        for rec in results["HEAD"]:
            for q, v in rec.get(m, {}).get("queries", {}).items():
                if v >= 0:
                    hq[q] = min(hq.get(q, 1e18), v)
        for rec in results["BASE"]:
            for q, v in rec.get(m, {}).get("queries", {}).items():
                if v >= 0:
                    bq[q] = min(bq.get(q, 1e18), v)
        movers = sorted(
            ((q, hq[q], bq[q]) for q in hq if q in bq and max(hq[q], bq[q]) > 0.05),
            key=lambda t: -abs(__import__("math").log((t[1] + 1e-9) / (t[2] + 1e-9))))[:8]
        table[m] = {"head_min": h, "base_min": b,
                    "ratio_head_over_base": round(h / b, 4) if b > 0 else None,
                    "top_movers": [
                        {"query": q, "head": round(a, 3), "base": round(c, 3),
                         "ratio": round(a / c, 3) if c > 0 else None}
                        for q, a, c in movers]}
        print(f"\n[ab] {m}: HEAD {h:.2f}s vs BASE {b:.2f}s  "
              f"ratio {h / b:.3f}" if b > 0 else f"[ab] {m}: BASE failed")
        for mv in table[m]["top_movers"]:
            print(f"  {mv['query']:<24} HEAD {mv['head']:<8} BASE {mv['base']:<8} "
                  f"x{mv['ratio']}")
    rec = {"baseline": full, "sf": sf, "runs": runs, "table": table,
           "wall": int(time.time() * 1000)}
    with open(os.path.join(REPO, "bench_ab.json"), "w") as f:
        json.dump(rec, f, indent=1)
    print(f"\n[ab] wrote bench_ab.json", flush=True)


if __name__ == "__main__":
    main()
