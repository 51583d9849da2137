#!/usr/bin/env python3
"""Append bands for queries new to bench_baseline.json from the latest
bench_full.json (existing bands are never touched — refresh those only from
a quiet-host run by copying the whole file). Prints what it adds."""
import json, sys

base_path = "src/test/resources/bench_baseline.json"
run_path = "bench_full.json"
base = json.load(open(base_path))
run = json.load(open(run_path))
new = {k: v for k, v in run["queries"].items() if k not in base["queries"]}
if not new:
    print("no new queries")
    sys.exit(0)
# The lap that carries a new query is often NOT quiet-host-comparable to the
# committed baseline. Deflate new bands by the median cur/base ratio over the
# shared queries (never inflate: a faster-than-baseline lap keeps raw values),
# so the appended bands are on the same quiet-host scale as the rest.
shared = sorted(run["queries"][k] / base["queries"][k]
                for k in run["queries"] if k in base["queries"])
factor = max(1.0, shared[len(shared) // 2]) if shared else 1.0
if factor > 1.0:
    print(f"host factor {factor:.2f} (median over {len(shared)} shared bands) — deflating new bands")
for k, v in sorted(new.items()):
    print(f"add band {k}: {v:.3f} -> {v / factor:.3f}")
    base["queries"][k] = round(v / factor, 4)
base["n_ok"] = len(base["queries"])
# keep the headline total equal to the sum of its bands — the parser
# ignores it, but a stale total misleads anyone reading the file
base["value"] = round(sum(base["queries"].values()), 4)
with open(base_path, "w") as f:
    json.dump(base, f, separators=(",", ":"))
    f.write("\n")
print(f"baseline now {len(base['queries'])} bands")
