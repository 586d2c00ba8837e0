#!/usr/bin/env python
"""Train a GNN model on a task.

Capability-parity with the reference's train.py (reference train.py:1-105):
4-level parameter merge (class defaults -> registry extras ->
default_hypers/{TASK}_{MODEL}.json -> CLI JSON overrides), data loaded once
and shared across a (possibly list-valued) random_seed sweep, per-run log
files whose format the bench scripts regex, and optional --run-test.

Usage:
    python train.py [options] MODEL_NAME TASK_NAME
"""

import argparse
import json
import os
import pdb
import subprocess
import sys
import time
import traceback

if os.environ.get("TFGNN_FORCE_PLATFORM"):
    # Honored before any JAX backend initialization. Needed because this
    # environment's TPU plugin overrides the standard JAX_PLATFORMS env
    # var; used by subprocess harnesses (tests, bench scripts) to pin CPU.
    import jax as _jax

    _jax.config.update("jax_platforms", os.environ["TFGNN_FORCE_PLATFORM"])

from tf_gnn_samples_tpu.utils.registry import name_to_model_class, name_to_task_class
from test import test

HYPERS_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "tf_gnn_samples_tpu", "default_hypers"
)


def get_train_args(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("MODEL_NAME", help="GGNN|RGCN|RGAT|RGIN|GNN-Edge-MLP|RGDCN|GNN-FiLM")
    parser.add_argument("TASK_NAME", help="QM9|PPI|Cora|Citeseer|Pubmed|VarMisuse")
    parser.add_argument("--data-path", default=None)
    parser.add_argument("--result-dir", default="trained_models")
    parser.add_argument("--run-test", action="store_true")
    parser.add_argument("--model-param-overrides", default=None)
    parser.add_argument("--task-param-overrides", default=None)
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--tensorboard", default=None, help="Dump metric JSONL files to DIR.")
    parser.add_argument("--profile-dir", default=None,
                        help="Capture a jax.profiler trace of training to DIR.")
    parser.add_argument("--resume", default=None, metavar="STATE_PICKLE",
                        help="Resume from a full training-state checkpoint "
                             "(written when checkpoint_every_n_epochs is set).")
    parser.add_argument("--azure-info", default="azure_auth.json",
                        help="dpu_utils-style auth JSON for azure:// data "
                             "paths (downloaded to a local cache up front; "
                             "needs the azure-storage-blob package).")
    parser.add_argument("--coordinator", default=None, metavar="HOST:PORT",
                        help="Multi-host training: jax.distributed "
                             "coordinator address (process 0's). All hosts "
                             "run the same command with their own "
                             "--host-id; see parallel/multihost.py.")
    parser.add_argument("--num-hosts", type=int, default=None,
                        help="Multi-host training: total process count.")
    parser.add_argument("--host-id", type=int, default=None,
                        help="Multi-host training: this process's id.")
    parser.add_argument("--debug", action="store_true")
    return parser.parse_args(argv)


def run(args):
    if args.coordinator or args.num_hosts or os.environ.get(
            "GRAFT_COORDINATOR"):
        # Must run before any JAX backend use; afterwards jax.devices()
        # is GLOBAL across hosts (DP axis over DCN, GP within a host over
        # ICI — parallel/multihost.make_hybrid_mesh).
        from tf_gnn_samples_tpu.parallel.multihost import initialize

        initialize(args.coordinator, args.num_hosts, args.host_id)

    model_cls, additional_model_params = name_to_model_class(args.MODEL_NAME)
    task_cls, additional_task_params = name_to_task_class(args.TASK_NAME)

    # 4-level parameter merge (reference train.py:38-59):
    task_params = task_cls.default_params()
    task_params.update(additional_task_params)
    model_params = model_cls.default_params()
    model_params.update(additional_model_params)

    hypers_file = os.path.join(
        HYPERS_DIR, "%s_%s.json" % (task_cls.name(), model_cls.name(model_params))
    )
    if os.path.exists(hypers_file):
        print("Loading task/model-specific default parameters from %s." % hypers_file)
        with open(hypers_file, "rt") as f:
            default_task_model_hypers = json.load(f)
        task_params.update(default_task_model_hypers["task_params"])
        model_params.update(default_task_model_hypers["model_params"])

    task_params.update(json.loads(args.task_param_overrides or "{}"))
    model_params.update(json.loads(args.model_param_overrides or "{}"))

    result_dir = args.result_dir
    os.makedirs(result_dir, exist_ok=True)
    task = task_cls(task_params)
    data_path = args.data_path or task.default_data_path()
    # azure:// paths localize to a cache dir up front (reference
    # train.py:61-72 upgrades paths through RichPath.create instead).
    from tf_gnn_samples_tpu.utils.paths import localize_path

    data_path = localize_path(data_path, args.azure_info)
    task.load_data(data_path)

    random_seeds = model_params["random_seed"]
    if not isinstance(random_seeds, list):
        random_seeds = [random_seeds]

    for random_seed in random_seeds:
        model_params["random_seed"] = random_seed
        run_id = "_".join([
            task_cls.name(),
            model_cls.name(model_params),
            time.strftime("%Y-%m-%d-%H-%M-%S"),
            str(os.getpid()),
        ])

        model = model_cls(dict(model_params), task, run_id, result_dir)
        model.log_line("Run %s starting." % run_id)
        model.log_line(" Using the following task params: %s" % json.dumps(task_params))
        model.log_line(" Using the following model params: %s" % json.dumps(model_params))

        if sys.stdin.isatty():
            # Best-effort git tag of the run (reference train.py:88-94 via
            # dpu_utils.git_tag_run).
            try:
                sha = subprocess.check_output(
                    ["git", "rev-parse", "HEAD"], text=True,
                    stderr=subprocess.DEVNULL,
                ).strip()
                subprocess.check_call(
                    ["git", "tag", run_id],
                    stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
                )
                model.log_line(" git tagged as %s" % sha)
            except Exception:
                print(" Tried tagging run in git, but failed.")

        model.initialize_model()
        from tf_gnn_samples_tpu.utils.profiling import trace_if

        with trace_if(args.profile_dir):
            model.train(quiet=args.quiet, tf_summary_path=args.tensorboard,
                        resume_from=args.resume)

        if args.run_test:
            test(model.best_model_file, data_path, result_dir,
                 quiet=args.quiet, run_id=run_id)


if __name__ == "__main__":
    cli_args = get_train_args()
    try:
        run(cli_args)
    except Exception:
        if cli_args.debug:
            traceback.print_exc()
            pdb.post_mortem()
        else:
            raise
