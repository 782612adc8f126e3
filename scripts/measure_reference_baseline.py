"""Measure the reference MuZero search loop throughput on this host.

The reference hot loop is [C++ batch_traverse → torch recurrent_inference →
C++ batch_backpropagate] per simulation (mcts_ctree.py:293-366). Cython is
not available in this image, so the C++ ctree cannot be built; instead we
measure:

1. the full loop with the reference's pure-Python ptree (its own fallback,
   selected by mcts_ctree=False) + torch CPU nets — a LOWER bound on
   reference speed;
2. the same loop with tree operations replaced by no-ops (nets +
   host<->tensor conversions only) — an UPPER bound on what the C++ ctree
   loop could reach (tree ops at zero cost).

BASELINE_MEASURED.json records both; bench.py compares against the UPPER
bound (``ctree_sims_per_sec``) so vs_baseline is conservative.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/measure_reference_baseline.py
"""
import json
import os
import sys
import time

import numpy as np
import torch

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))

from conftest import load_reference_module  # noqa: E402

B = 1024
NUM_SIMS = 50
LATENT = 128
A = 4
OBS = 8
SUPPORT = 601


def make_torch_nets():
    """MuZero-MLP-sized torch nets (matching bench.py shapes)."""
    repr_net = torch.nn.Sequential(
        torch.nn.Linear(OBS, LATENT), torch.nn.LayerNorm(LATENT), torch.nn.ReLU(),
        torch.nn.Linear(LATENT, LATENT), torch.nn.LayerNorm(LATENT), torch.nn.ReLU(),
    )
    dyn = torch.nn.Sequential(
        torch.nn.Linear(LATENT + A, LATENT), torch.nn.LayerNorm(LATENT), torch.nn.ReLU(),
        torch.nn.Linear(LATENT, LATENT), torch.nn.LayerNorm(LATENT), torch.nn.ReLU(),
    )
    reward_head = torch.nn.Sequential(torch.nn.Linear(LATENT, 32), torch.nn.ReLU(), torch.nn.Linear(32, SUPPORT))
    value_head = torch.nn.Sequential(torch.nn.Linear(LATENT, 32), torch.nn.ReLU(), torch.nn.Linear(32, SUPPORT))
    policy_head = torch.nn.Sequential(torch.nn.Linear(LATENT, 32), torch.nn.ReLU(), torch.nn.Linear(32, A))
    return repr_net, dyn, reward_head, value_head, policy_head


@torch.no_grad()
def run_reference_search(use_tree: bool, iters: int = 1):
    minimax = load_reference_module("lzero/mcts/ptree/minimax.py")
    ptree = load_reference_module("lzero/mcts/ptree/ptree_mz.py")
    repr_net, dyn, reward_head, value_head, policy_head = make_torch_nets()
    support = torch.arange(-300, 301, dtype=torch.float32)

    def inverse(logits):
        probs = torch.softmax(logits, dim=1)
        v = (probs * support).sum(1)
        eps = 0.001
        t = (torch.sqrt(1 + 4 * eps * (v.abs() + 1 + eps)) - 1) / (2 * eps)
        return torch.sign(v) * (t * t - 1)

    times = []
    for _ in range(iters):
        obs = torch.randn(B, OBS)
        t0 = time.perf_counter()
        latent = repr_net(obs)
        logits0 = policy_head(latent)
        roots = ptree.Roots(B, [list(range(A))] * B)
        noises = [np.random.dirichlet([0.3] * A).tolist() for _ in range(B)]
        roots.prepare(0.25, noises, [0.0] * B, logits0.numpy().tolist(), [-1] * B)
        stats_lst = minimax.MinMaxStatsList(B)
        stats_lst.set_delta(0.01)
        latent_pool = [latent]
        for sim in range(NUM_SIMS):
            if use_tree:
                results = ptree.SearchResults(num=B)
                idx_path, idx_batch, last_actions, vtp = ptree.batch_traverse(
                    roots, 19652, 1.25, 0.997, stats_lst, results, [-1] * B
                )
                parent_latent = torch.stack(
                    [latent_pool[idx_path[i]][idx_batch[i]] for i in range(B)]
                )
                actions = torch.tensor(last_actions, dtype=torch.long)
            else:
                # nets-only variant: random parents/actions, no tree ops
                parent_latent = latent_pool[-1]
                actions = torch.randint(0, A, (B,))
            a_onehot = torch.nn.functional.one_hot(actions, A).float()
            nl = dyn(torch.cat([parent_latent, a_onehot], dim=1))
            r = inverse(reward_head(nl)).numpy().tolist()
            v = inverse(value_head(nl)).numpy().tolist()
            pl = policy_head(nl).numpy().tolist()
            latent_pool.append(nl)
            if use_tree:
                ptree.batch_backpropagate(
                    sim + 1, 0.997, r, v, pl, stats_lst, results, list(vtp)
                )
        times.append(time.perf_counter() - t0)
    sims_per_sec = B * NUM_SIMS / min(times)
    return sims_per_sec


def main():
    torch.set_num_threads(os.cpu_count() or 1)
    print(f"measuring reference loop: B={B}, sims={NUM_SIMS} (torch CPU)...")
    nets_only = run_reference_search(use_tree=False, iters=2)
    print(f"nets-only (ctree upper bound): {nets_only:.0f} sims/s")
    full_ptree = run_reference_search(use_tree=True, iters=1)
    print(f"full ptree loop (lower bound): {full_ptree:.0f} sims/s")
    out = {
        "config": {"batch": B, "num_simulations": NUM_SIMS, "latent": LATENT,
                   "actions": A, "host_threads": os.cpu_count()},
        "ptree_sims_per_sec": round(full_ptree, 1),
        "nets_only_sims_per_sec": round(nets_only, 1),
        # conservative stand-in for the unbuildable C++ ctree: tree ops free
        "ctree_sims_per_sec": round(nets_only, 1),
        "note": "Cython unavailable in image; ctree_sims_per_sec is the "
                "nets-only upper bound (tree ops at zero cost).",
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "BASELINE_MEASURED.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", os.path.abspath(path))


if __name__ == "__main__":
    main()
