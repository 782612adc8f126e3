#!/bin/bash
# On-chip A/B of the Pallas fused-traverse kernel vs the default XLA
# search path (VERDICT r3 missing #5): two bench.py runs back to back on
# the live chip, results recorded to PALLAS_AB.json at the repo root.
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
echo "== default (XLA) path =="
LZT_PALLAS=0 timeout 400 python bench.py | tee /tmp/bench_xla.json
echo "== pallas traverse path =="
LZT_PALLAS=1 timeout 400 python bench.py | tee /tmp/bench_pallas.json
python - <<'EOF'
import json
out = {}
for name, path in [("xla", "/tmp/bench_xla.json"), ("pallas", "/tmp/bench_pallas.json")]:
    try:
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line.startswith("{"):
                    out[name] = json.loads(line)
                    break
    except FileNotFoundError:
        out[name] = None
if out.get("xla") and out.get("pallas"):
    out["pallas_over_xla"] = round(out["pallas"]["value"] / out["xla"]["value"], 4)
with open("PALLAS_AB.json", "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out))
EOF
