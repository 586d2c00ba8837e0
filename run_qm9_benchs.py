#!/usr/bin/env python
"""Reproduce the QM9 results table: 7 models x 13 properties x N seeds.

Capability-parity with the reference's run_qm9_benchs.py (·:1-73): forks
`train.py --run-test MODEL QM9` per (model, property, seed), scrapes MAE /
error-ratio, prints a LaTeX-ish table. Full sweep is ~8 days of compute.

Usage:
    python run_qm9_benchs.py [options] LOG_TARGET_DIR
"""

import argparse
import os
import re
import subprocess
import sys

import numpy as np

MODEL_TYPES = ["GGNN", "RGCN", "RGAT", "RGIN",
               "GNN-Edge-MLP0", "GNN-Edge-MLP1", "GNN_FiLM"]
TASKS = ["mu", "alpha", "HOMO", "LUMO", "gap", "R2", "ZPVE",
         "U0", "U", "H", "G", "Cv", "Omega"]

TEST_RES_RE = re.compile(
    r"^Metrics: MAEs: \d+:([0-9.]+) \| Error Ratios: \d+:([0-9.]+)"
)
TIME_RE = re.compile(r"^Training took (\d+)s")


def run(args):
    target_dir = args.LOG_TARGET_DIR
    os.makedirs(target_dir, exist_ok=True)
    print("Starting QM9 experiments, will write logfiles for runs into %s."
          % target_dir)
    num_seeds = int(args.num_runs)
    results = {}
    for model in MODEL_TYPES:
        results[model] = [{"test_errors": [], "times": []} for _ in TASKS]
        for task_id in range(len(TASKS)):
            for seed in range(1, 1 + num_seeds):
                logfile = os.path.join(
                    target_dir, "%s_task%i_seed%i.txt" % (model, task_id, seed)
                )
                cmd = [sys.executable, "train.py", "--run-test", model, "QM9",
                       "--model-param-overrides", '{"random_seed": %i}' % seed,
                       "--task-param-overrides", '{"task_ids": [%i]}' % task_id]
                if args.data_path:
                    cmd += ["--data-path", args.data_path]
                with open(logfile, "w") as log_fh:
                    subprocess.check_call(cmd, stdout=log_fh, stderr=log_fh)
                with open(logfile, "r") as log_fh:
                    for line in log_fh.readlines():
                        time_match = TIME_RE.search(line)
                        res_match = TEST_RES_RE.search(line)
                        if time_match is not None:
                            results[model][task_id]["times"].append(
                                int(time_match.groups()[0])
                            )
                        elif res_match is not None:
                            results[model][task_id]["test_errors"].append(
                                float(res_match.groups()[1])
                            )

    row_fmt_string = "%7s " + "&% 35s " * len(MODEL_TYPES) + "\\\\"
    print(row_fmt_string % tuple([""] + MODEL_TYPES))
    for task_id, task in enumerate(TASKS):
        model_results = []
        for model in MODEL_TYPES:
            err = np.mean(results[model][task_id]["test_errors"])
            std = np.std(results[model][task_id]["test_errors"])
            time_in_min = np.mean(results[model][task_id]["times"]) / 60
            model_results.append(
                "%.2f & ($\\pm %.2f$; $%.1f$min)" % (err, std, time_in_min)
            )
        print(row_fmt_string % tuple([task] + model_results))


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("LOG_TARGET_DIR")
    parser.add_argument("--num-runs", default=5)
    parser.add_argument("--data-path", default=None)
    run(parser.parse_args())
