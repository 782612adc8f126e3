#!/bin/bash
# On-chip A/B of the Pallas fused-traverse kernel vs the default XLA
# search path (VERDICT r3 missing #5): two bench.py runs back to back on
# the live chip, results recorded to PALLAS_AB.json at the repo root.
# A freshly-killed predecessor can hold the chip briefly -> retry a
# 0-valued (watchdog-emitted) measurement once after a cooldown.
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
sleep 15  # let any just-killed TPU process release the chip

run_bench() {  # run_bench <pallas_flag> <outfile>
  for attempt in 1 2; do
    LZT_PALLAS=$1 timeout 420 python bench.py > "$2" 2> "$2.err"
    if python -c "
import json,sys
try:
    v=[json.loads(l) for l in open('$2') if l.strip().startswith('{')][0]['value']
except Exception:
    sys.exit(1)
sys.exit(0 if v > 0 else 1)"; then return 0; fi
    echo "attempt $attempt of LZT_PALLAS=$1 yielded no measurement; retrying" >&2
    sleep 30
  done
  return 1
}

echo "== default (XLA) path =="
run_bench 0 /tmp/bench_xla.json; cat /tmp/bench_xla.json
echo "== pallas traverse path =="
run_bench 1 /tmp/bench_pallas.json; cat /tmp/bench_pallas.json; tail -5 /tmp/bench_pallas.json.err >&2
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
if out.get("xla") and out.get("pallas") and out["xla"]["value"] and out["pallas"]["value"]:
    out["pallas_over_xla"] = round(out["pallas"]["value"] / out["xla"]["value"], 4)
with open("PALLAS_AB.json", "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out))
EOF
