"""SCALING_r03.json: N-chip efficiency model with the load-balance bound
quantified per benchmark (VERDICT r2 #7).

Round-2's model was bandwidth-only ("bounded by load balance" hand-wave).
This round quantifies both missing terms:

* **Load-balance skew.** In the SPMD design every device owns one robot's
  contiguous pose block and processes that block's rows + owned edges every
  step, so per-step time ∝ max_k work_k and the balance efficiency is
  mean(work)/max(work). Work is modeled as the kernel's lane cost:
  a·poses_k (state rows) + b·edges_k (chain/diag lane passes + one-hot slot
  share), with (a, b) = (1, 1) pose-lane equivalents — edges dominate the
  kernel's edge passes and poses the manifold algebra, both full-lane row
  ops, so lane counts are the right unit.
* **Collective latency.** The separator all_gather pays a per-hop latency
  term: t_lat(N) = (N−1)·τ with τ = 1 µs/hop charged pessimistically
  (ICI hop latencies are sub-µs; DCN ~10 µs — both rows reported).

eff(N) = t_comp_mean / (t_comp_mean·skew + V/BW + t_lat(N)), with
t_comp_mean = measured single-chip step time / skew-of-the-measured-config.

Merges into SCALING_r03.json; the round-2 measured anchors (real-chip SPMD
step, CPU virtual-mesh caveats) are copied over unchanged.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from dpgo_ros_tpu.utils.hostenv import ensure_cpu_devices

ensure_cpu_devices(1)

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np

from dpgo_ros_tpu.io.datasets import load_g2o_dataset, load_tunnels
from dpgo_ros_tpu.models.problem import LiftedProblem

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(HERE, "SCALING_r03.json")
R02 = os.path.join(HERE, "SCALING_r02.json")

# the five BASELINE.json benchmark partitions
BENCHES = [
    ("tinyGrid3D", 2, "g2o"),
    ("smallGrid3D", 2, "g2o"),
    ("cubicle", 2, "g2o"),
    ("sphere2500", 5, "g2o"),
    ("parking-garage", 5, "g2o"),
    ("torus3D", 5, "g2o"),
    ("tunnels", 8, "csv"),
]

TAU_ICI = 1e-6  # pessimistic per-hop latency, ICI
TAU_DCN = 10e-6  # per-hop latency, DCN
SEP_BYTES_PER_POSE = 80  # r=5 lifted pose, fp32: 5x4 floats


def skew_for(data):
    prob = LiftedProblem.from_data(data, r=5)
    R = prob.num_robots
    src = np.asarray(prob.edges.src)
    msk = np.asarray(prob.edges.mask) > 0
    offs = np.asarray(prob.offsets)
    poses = np.asarray(prob.num_poses, np.float64)
    owner = np.searchsorted(offs, src[msk], side="right") - 1
    edges = np.bincount(owner, minlength=R).astype(np.float64)
    work = poses + edges
    # separator poses: endpoints of cross-block edges
    dst = np.asarray(prob.edges.dst)[msk]
    downer = np.searchsorted(offs, dst, side="right") - 1
    cross = owner != downer
    seps = np.unique(
        np.concatenate([src[msk][cross], dst[cross]])
    ).size
    return {
        "num_robots": R,
        "poses": poses.astype(int).tolist(),
        "edges_owned": edges.astype(int).tolist(),
        "work_skew_max_over_mean": float(work.max() / work.mean()),
        "separator_poses": int(seps),
        "allgather_bytes_per_step": int(seps * SEP_BYTES_PER_POSE),
    }


def main():
    out = {}
    if os.path.exists(R02):
        with open(R02) as f:
            r02 = json.load(f)
        out["measured_anchors_r02"] = {
            k: r02[k]
            for k in ("tpu_single_chip", "caveats")
            if k in r02
        }

    t_step = 3.42e-3  # measured single-chip SPMD step (SCALING_r02)
    rows = {}
    for name, R, kind in BENCHES:
        data = (
            load_tunnels() if kind == "csv"
            else load_g2o_dataset(name, num_robots=R)
        )
        sk = skew_for(data)
        if kind == "g2o":
            # the remedy: work-balanced contiguous cuts (--partition_balance
            # work) — same classification rules, different cut points
            skb = skew_for(
                load_g2o_dataset(name, num_robots=R, balance="work")
            )
            sk["work_skew_balanced"] = skb["work_skew_max_over_mean"]
            sk["poses_balanced"] = skb["poses"]
        skew = sk["work_skew_max_over_mean"]
        V = sk["allgather_bytes_per_step"]
        # balanced per-chip compute if the measured 1-chip step were split
        # over R chips: t_comp_mean = t_step / R (same total work)
        t_mean = t_step / R
        eff = {}
        for label, bw, tau in (
            ("ici_25GBps", 25e9, TAU_ICI),
            ("ici_100GBps", 100e9, TAU_ICI),
            ("dcn_5GBps", 5e9, TAU_DCN),
        ):
            t_comm = V / bw + (R - 1) * tau
            eff[label] = t_mean / (t_mean * skew + t_comm)
            if "work_skew_balanced" in sk:
                eff[label + "_workbalanced"] = t_mean / (
                    t_mean * sk["work_skew_balanced"] + t_comm
                )
        rows[f"{name}_{R}robot"] = {**sk, "efficiency": eff}
        print(
            f"{name}@{R}: skew {skew:.3f}, sep {sk['separator_poses']}, "
            f"eff {eff}",
            flush=True,
        )

    out["model"] = (
        "eff(N) = t_mean / (t_mean*skew + V/BW + (N-1)*tau); "
        "t_mean = measured 1-chip step / N; skew = max_k(poses_k + "
        "edges_k) / mean_k; tau = 1us/hop ICI, 10us/hop DCN "
        "(pessimistic); V = full separator set per step (upper bound)."
    )
    out["benchmarks"] = rows
    out["reading"] = (
        "The interconnect terms stay negligible at demo scale (V <= "
        "130 KB, t_comm <= tens of us vs ms-scale compute); the binding "
        "constraint is LOAD BALANCE, now quantified per benchmark. With "
        "the reference's equal-pose-count partition, parking-garage@5 "
        "(work skew 1.73 -> eff 0.57) misses the BASELINE >=70% target "
        "and tunnels@8 (skew 1.29 -> 0.76) barely clears it; the "
        "work-balanced contiguous partitioner (--partition_balance work, "
        "io/partition.py) restores every g2o benchmark above 0.9 "
        "(tunnels' per-robot CSV split is fixed by the dataset)."
    )
    with open(OUT, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
