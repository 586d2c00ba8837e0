#!/usr/bin/env python
"""Reproduce the PPI results table: 7 models x N seeds, scraped from logs.

Capability-parity with the reference's run_ppi_benchs.py (·:1-67): forks
`train.py --quiet --run-test MODEL PPI` per (model, seed), regex-scrapes
`Metrics: Avg MicroF1:` and `Training took <s>s` from the logs, prints a
mean +/- std ASCII table.

Usage:
    python run_ppi_benchs.py [options] LOG_TARGET_DIR
"""

import argparse
import os
import re
import subprocess
import sys

import numpy as np

MODEL_TYPES = ["GGNN", "RGCN", "RGAT", "RGIN",
               "GNN-Edge-MLP0", "GNN-Edge-MLP1", "GNN_FiLM"]

TEST_RES_RE = re.compile(r"^Metrics: Avg MicroF1: (0.\d+)")
TIME_RE = re.compile(r"^Training took (\d+)s")


def run(args):
    target_dir = args.LOG_TARGET_DIR
    os.makedirs(target_dir, exist_ok=True)
    print("Starting PPI experiments, will write logfiles for runs into %s."
          % target_dir)
    num_seeds = int(args.num_runs)
    print("| %- 13s | %- 17s | %- 10s |" % ("Model", "Avg. MicroF1", "Avg. Time"))
    print("|" + "-" * 15 + "|" + "-" * 19 + "|" + "-" * 12 + "|")
    models = args.models.split(",") if args.models else MODEL_TYPES
    for model in models:
        model_f1s, model_times = [], []
        for seed in range(1, 1 + num_seeds):
            logfile = os.path.join(target_dir, "%s_seed%i.txt" % (model.lower(), seed))
            overrides = {"random_seed": seed}
            if args.extra_model_overrides:
                import json as json_mod

                overrides.update(json_mod.loads(args.extra_model_overrides))
            cmd = [sys.executable, "train.py", "--quiet", "--run-test",
                   model, "PPI",
                   "--model-param-overrides", __import__("json").dumps(overrides)]
            if args.data_path:
                cmd += ["--data-path", args.data_path]
            with open(logfile, "w") as log_fh:
                subprocess.check_call(cmd, stdout=log_fh, stderr=log_fh)
            with open(logfile, "r") as log_fh:
                for line in log_fh.readlines():
                    time_match = TIME_RE.search(line)
                    res_match = TEST_RES_RE.search(line)
                    if time_match is not None:
                        model_times.append(int(time_match.groups()[0]))
                    elif res_match is not None:
                        model_f1s.append(float(res_match.groups()[0]))
        print("| %- 13s | %.3f (+/- %.3f) |     % 4.1f |"
              % (model, np.mean(model_f1s), np.std(model_f1s),
                 np.mean(model_times)))


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("LOG_TARGET_DIR")
    parser.add_argument("--num-runs", default=10)
    parser.add_argument("--data-path", default=None,
                        help="Optional PPI data directory forwarded to train.py.")
    parser.add_argument("--models", default=None,
                        help="Comma-separated subset of models to run "
                             "(extension; default = the reference's full list).")
    parser.add_argument("--extra-model-overrides", default=None,
                        help="Extra JSON model-param overrides merged into "
                             "every run (extension; e.g. for smoke tests).")
    run(parser.parse_args())
