#!/usr/bin/env python3
"""One-shot r17 baseline re-freeze for the optimization round's improved
entries: any entry whose median improved >= 25% in BOTH clean r17
optimization sweeps (mid + final) gets its frozen baseline replaced by the
per-entry MIN of the two sweep medians (the r16 re-freeze convention).
Entries that did not clearly improve keep their existing frozen medians —
re-freezing those would only loosen or noise-chase the gate."""
import json, sys

repo = "/root/repo"
base = json.load(open(f"{repo}/bench_baseline.json"))
mid = json.load(open("/tmp/bench_r17_mid.json"))
fin = json.load(open("/tmp/bench_r17_final.json"))
assert mid["failed"] == [] and fin["failed"] == [], "sweeps must be clean"

changed = []
for k, old in list(base["queries"].items()):
    m, f = mid["queries"].get(k), fin["queries"].get(k)
    if m is None or f is None:
        continue
    if m <= 0.75 * old and f <= 0.75 * old:
        base["queries"][k] = round(min(m, f), 4)
        changed.append((k, old, base["queries"][k]))

base["_provenance"] = base.get("_provenance", "") + (
    " | r17 OPTIMIZATION re-freeze: entries sped up >=25% in BOTH clean r17 "
    "opt sweeps (mid 442.3s + final, sf0.1, 3 runs, failed=[]) re-frozen to "
    "the per-entry MIN of the two sweep medians, so the drift gate tracks "
    "the optimized code (the old frozen medians would let a multi-x "
    "regression of an optimized entry pass unflagged); all other entries "
    "keep their existing frozen medians.")
json.dump(base, open(f"{repo}/bench_baseline.json", "w"), indent=1)
print(f"re-froze {len(changed)} entries:")
for k, o, n in sorted(changed, key=lambda t: t[1] - t[2], reverse=True):
    print(f"  {o:8.3f} -> {n:7.3f}  {k}")
