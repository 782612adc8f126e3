#!/usr/bin/env python
"""Summarize evaluator curves from train.jsonl logs: first/best/last eval return per run."""
import json, sys, glob, os

def summarize(path):
    evs = []
    for line in open(path):
        try: r = json.loads(line)
        except Exception: continue
        for k in r:
            if k.endswith("eval_mean_return"):
                evs.append((r.get("step", 0), k, r[k]))
    return evs

for pat in sys.argv[1:]:
    for f in sorted(glob.glob(pat)):
        evs = summarize(f)
        name = os.path.relpath(f, "/root/repo")
        if not evs:
            print(f"{name}: no evals"); continue
        keys = sorted({k for _, k, _ in evs})
        for k in keys:
            sub = [(s, v) for s, kk, v in evs if kk == k]
            best = max(sub, key=lambda x: x[1])
            tag = "" if len(keys) == 1 else f" [{k}]"
            print(f"{name}{tag}: n={len(sub)} first={sub[0][1]:.2f}@{sub[0][0]} best={best[1]:.2f}@{best[0]} last={sub[-1][1]:.2f}@{sub[-1][0]}")
