#!/usr/bin/env python
"""Reproduce the VarMisuse results table: 7 models x N seeds, including the
unseen-project "TestOnly" generalization split.

Capability-parity with the reference's run_varmisuse_benchs.py (·:1-96):
per (model, seed), one `train.py --quiet --run-test MODEL VarMisuse`
subprocess produces the valid/test accuracies plus the saved pickle path;
a follow-up `test.py` subprocess re-evaluates that pickle on the held-out
projects fold (`graphs-testonly`, reorg_varmisuse_data.sh:10) for the
TestOnly column.

Usage:
    python run_varmisuse_benchs.py [options] LOG_TARGET_DIR
"""

import argparse
import os
import re
import sys

from tf_gnn_samples_tpu.utils.bench_runner import (
    Trial, execute, mean_std, model_subset, train_argv,
)

SCRAPE_TRAIN = {
    "test_acc": re.compile(r"^Metrics: Accuracy: (0.\d+)"),
    "valid_acc": re.compile(r"Best validation results: Accuracy: (0.\d+)"),
    "pickle": re.compile(r"^Loading model from file (.+)\."),
}
SCRAPE_EVAL = {"testonly_acc": re.compile(r"^Metrics: Accuracy: (0.\d+)")}


def main(args):
    models = model_subset(args.models)
    columns = {m: {"valid": [], "test": [], "testonly": []} for m in models}
    for model in models:
        for seed in range(1, 1 + int(args.num_runs)):
            stem = os.path.join(
                args.LOG_TARGET_DIR, "%s_seed%i" % (model.lower(), seed)
            )
            train_trial = Trial(
                argv=train_argv(model, "VarMisuse", seed=seed,
                                data_path=args.data_path,
                                result_dir=os.path.join(
                                    args.LOG_TARGET_DIR, "models")),
                logfile=stem + ".txt",
                scrape=SCRAPE_TRAIN,
                tag=(model, seed),
            )
            (outcome,) = execute(
                [train_trial],
                "Running %s / seed %i." % (model, seed),
            )
            columns[model]["valid"] += outcome.floats("valid_acc")
            columns[model]["test"] += outcome.floats("test_acc")

            saved = outcome.last("pickle")
            if saved is None:
                raise RuntimeError(
                    "Run log %s has no saved-model line." % train_trial.logfile
                )
            eval_trial = Trial(
                argv=[sys.executable, "test.py", "--quiet",
                      "--result-dir",
                      os.path.join(args.LOG_TARGET_DIR, "models"),
                      saved, args.testonly_path],
                logfile=stem + "-testonly.txt",
                scrape=SCRAPE_EVAL,
                tag=(model, seed, "testonly"),
            )
            columns[model]["testonly"] += eval_trial.run().floats(
                "testonly_acc"
            )

    print("| %- 14s | %- 17s | %- 17s | %- 17s |"
          % ("Model", "Valid Acc", "Test Acc", "TestOnly Acc"))
    print("|" + "-" * 16 + "|" + "-" * 19 + "|" + "-" * 19 + "|" + "-" * 19 + "|")
    for model in models:
        cells = []
        for fold in ("valid", "test", "testonly"):
            m, s = mean_std(columns[model][fold])
            cells.append("%.3f (+/- %.3f)" % (m, s))
        print("| %- 14s | %s | %s | %s |" % (model, *cells))


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("LOG_TARGET_DIR")
    parser.add_argument("--num-runs", default=5)
    parser.add_argument("--data-path", default=None)
    parser.add_argument("--testonly-path",
                        default="data/varmisuse/graphs-testonly")
    parser.add_argument("--models", default=None,
                        help="Comma-separated subset of models to run "
                             "(extension; default = the reference's full list).")
    main(parser.parse_args())
