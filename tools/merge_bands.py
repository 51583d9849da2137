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
for k, v in sorted(new.items()):
    print(f"add band {k}: {v:.3f}")
    base["queries"][k] = round(v, 4)
base["n_ok"] = len(base["queries"])
# keep the headline total equal to the sum of its bands — the parser
# ignores it, but a stale total misleads anyone reading the file
base["value"] = round(sum(base["queries"].values()), 4)
with open(base_path, "w") as f:
    json.dump(base, f, separators=(",", ":"))
    f.write("\n")
print(f"baseline now {len(base['queries'])} bands")
