import sys, os, inspect
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from powertrainstreaming_spark.plans.registry import all_defs

rows = []
for name, qd in all_defs().items():
    fn = qd.fn
    mod = fn.__module__.replace("powertrainstreaming_spark.", "")
    line = inspect.getsourcelines(fn)[1]
    oracle = "SQL hash" if qd.oracle else "rows-only"
    rows.append((qd.tier, name, f"{mod.replace('.','/')}.py:{line}", oracle))

rows.sort(key=lambda r: (r[0], r[1]))
out = ["# Operator inventory",
       "",
       "Every registered query, its tier (SURVEY.md §2), implementation site,",
       "and driver-check mode.  Generated from `plans/registry.py` — the",
       "registry is the source of truth; regenerate with",
       "`python docs/gen_operators.py`.",
       "",
       "| Tier | Query key | Implementation | Check |",
       "|---|---|---|---|"]
for tier, name, where, oracle in rows:
    out.append(f"| {tier} | `{name}` | `powertrainstreaming_spark/{where}` | {oracle} |")
out.append("")
out.append(f"Total: {len(rows)} queries "
           f"({sum(1 for r in rows if r[3]=='SQL hash')} SQL-hash-checked, "
           f"{sum(1 for r in rows if r[3]=='rows-only')} rows-only).")
print("\n".join(out))
