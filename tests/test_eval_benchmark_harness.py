"""zoo/eval_benchmark.py harness (reference zoo/eval_benchmark.py):
check-only scoring of recorded exp dirs against per-case thresholds."""
import importlib.util
import json
import os

import pytest

pytestmark = pytest.mark.unittest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load():
    spec = importlib.util.spec_from_file_location(
        "eval_benchmark", os.path.join(REPO, "zoo", "eval_benchmark.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_best_eval_return_reads_jsonl(tmp_path):
    m = _load()
    exp = tmp_path / "exp" / "log"
    exp.mkdir(parents=True)
    rows = [
        {"step": 0, "evaluator/eval_mean_return": -10.0},
        {"step": 100, "evaluator/eval_mean_return": 5.0},
        {"step": 200, "evaluator/eval_mean_return": 2.0},
        {"step": 300, "collector/collect_mean_return": 99.0},  # not eval
    ]
    with open(exp / "train.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    rel = os.path.relpath(tmp_path / "exp", REPO)
    assert m.best_eval_return(rel) == 5.0
    assert m.best_eval_return("does/not/exist") is None


def test_case_table_paths_exist():
    m = _load()
    for name, (config, _exp, thr) in m.CASES.items():
        assert os.path.exists(os.path.join(REPO, config)), f"{name}: {config}"
        assert isinstance(thr, float)
