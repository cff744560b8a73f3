#!/usr/bin/env python3
"""Rebuild BENCH_SCALING.md from two Bench JSON artifacts.

Usage: scaling_report.py <bench_sf01.json> <bench_sf1.json> [out.md]

The artifacts come from `graft.Bench` (SPARK_GRAFT_BENCH_OUT) at two scale
points; see BENCH_SCALING.md for the data-derivation methodology.
"""
import json
import statistics
import sys


def main() -> None:
    a = json.load(open(sys.argv[1]))
    b = json.load(open(sys.argv[2]))
    out = sys.argv[3] if len(sys.argv) > 3 else "BENCH_SCALING.md"
    # only queries present AND ok at both scale points are comparable —
    # an errored query's partial time would fabricate a bogus ratio
    common = sorted(set(a["queries"]) & set(b["queries"]))
    skipped = [k for k in common
               if a.get("status", {}).get(k, "ok") != "ok"
               or b.get("status", {}).get(k, "ok") != "ok"]
    if skipped:
        print(f"WARNING: skipping errored queries: {skipped}", file=sys.stderr)
    only_one = set(a["queries"]) ^ set(b["queries"])
    if only_one:
        print(f"WARNING: queries present at one scale only: {sorted(only_one)}",
              file=sys.stderr)
    rows = sorted(
        ((b["queries"][k] / max(a["queries"][k], 1e-9),
          a["queries"][k], b["queries"][k], k)
         for k in common if k not in skipped),
        reverse=True)
    if not rows:
        sys.exit("no comparable queries between the two artifacts")
    ratios = [r for r, _, _, _ in rows]
    flagged = [k for r, _, _, k in rows if r > 20]
    def first_runs(d):
        # first_value (Bench-emitted) is authoritative; fall back to
        # summing the first entry of each query's runs array
        if "first_value" in d:
            return d["first_value"]
        return (sum(r[0] for r in d["runs"].values())
                if "runs" in d else d["value"])

    hdr = f"""# BENCH_SCALING — measured sf0.1 → sf1 (10× data)

Two full `graft.Bench` runs on identical code, same machine, `local[32]`,
back-to-back. Per-query timing is best-of-{a.get('reps', 1)} (single-shot
timings carry multi-second JIT/scheduler jitter; `runs` in the JSON keeps
every rep's wall time). The sf1 data is `tools/ScaleData`'s 10× derivation of
`/root/testdata/sf0.1` (per-copy key-shifted TPC-H worlds, dims fixed;
token-suffixed document copies so near-dup pair counts scale linearly;
sign-flipped embedding copies preserving within-copy geometry exactly;
events keep their time range = 10× event rate). Raw artifacts committed
beside this file: `bench_scaling_sf01.json`, `bench_scaling_sf1.json`
(regenerate with `runMain graft.tools.ScaleData /root/testdata/sf0.1
.bench/sf1 10`, two Bench runs, then `scripts/scaling_report.py`).

## Headline

- **First-run total (one-time session-memo builds INCLUDED):
  {first_runs(a):.1f} s → {first_runs(b):.1f} s =
  {first_runs(b)/first_runs(a):.2f}× for 10× data** — the honest
  scaling headline: memoized families' shared-stage builds grow with the
  data and a best-of aggregate would hide them (rep 2 is a memo hit).
- Best-of-{a.get('reps', 1)} total (steady-state, jitter-stripped):
  {a['value']:.1f} s → {b['value']:.1f} s = {b['value']/a['value']:.2f}×
  ({len(rows)} queries, {a['errors']}+{b['errors']} errors).
- **Median per-query ratio {statistics.median(ratios):.2f}×; worst {max(ratios):.1f}×.** Expected
  row-count factor is ~10× for nearly every query (facts scale 10×, dims
  fixed); the flag bar — worse than ~2× the row-count factor, i.e. >20× —
  is breached by **{len(flagged) or 'zero'} queries**{(': ' + ', '.join(flagged)) if flagged else ''}.
- Sub-linear totals are the design working as intended: broadcast dims
  stay broadcast, map-side partial aggregation collapses before every
  shuffle, LSH/df-cap/cell bounds keep candidate generation linear, and
  fixed per-query overheads (plan analysis, job scheduling, small sorts)
  amortize.

## Notable scalers

"""
    notable = "".join(
        f"- `{k}` {r:.1f}× ({t0:.2f} → {t1:.2f} s)\n"
        for r, t0, t1, k in rows[:6])
    table = ("\n## Full table (sorted by ratio)\n\n"
             "| query | sf0.1 s | sf1 s | ratio |\n| --- | --- | --- | --- |\n"
             + "".join(f"| `{k}` | {t0:.2f} | {t1:.2f} | {r:.1f}× |\n"
                       for r, t0, t1, k in rows))
    open(out, "w").write(hdr + notable + table)
    print(f"{out}: total {a['value']:.1f} -> {b['value']:.1f} "
          f"({b['value']/a['value']:.2f}x), median {statistics.median(ratios):.2f}x, "
          f"worst {max(ratios):.1f}x, flagged {flagged}")


if __name__ == "__main__":
    main()
