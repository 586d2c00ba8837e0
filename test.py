#!/usr/bin/env python
"""Evaluate a trained model snapshot.

Capability-parity with the reference's test.py (reference test.py:1-46):
restores the pickle snapshot, doubles `max_nodes_in_batch` for evaluation
(test.py:27), and runs model.test on the given or default data path.

Usage:
    python test.py [options] STORED_MODEL_PATH [DATA_PATH]
"""

import argparse
import json
import os
import pdb
import traceback
from typing import Optional

if os.environ.get("TFGNN_FORCE_PLATFORM"):
    # See train.py: pins the JAX platform before backend init.
    import jax as _jax

    _jax.config.update("jax_platforms", os.environ["TFGNN_FORCE_PLATFORM"])

from tf_gnn_samples_tpu.utils.registry import restore


def test(model_path: str, test_data_path: Optional[str], result_dir: str,
         quiet: bool = False, run_id: str = None):
    model = restore(model_path, result_dir, run_id)
    # Larger batches are fine without training state (reference test.py:27).
    model.params["max_nodes_in_batch"] = 2 * model.params["max_nodes_in_batch"]
    test_data_path = test_data_path or model.task.default_data_path()
    model.log_line(" Using the following task params: %s" % json.dumps(model.task.params))
    model.log_line(" Using the following model params: %s" % json.dumps(model.params))
    model.test(test_data_path, quiet=quiet)


def run(args):
    from tf_gnn_samples_tpu.utils.paths import localize_path

    data_path = args.DATA_PATH
    if data_path is not None:
        data_path = localize_path(data_path, args.azure_info)
    test(args.STORED_MODEL_PATH, data_path, args.result_dir, quiet=args.quiet)


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("STORED_MODEL_PATH")
    parser.add_argument("DATA_PATH", nargs="?", default=None)
    parser.add_argument("--result-dir", default="trained_models")
    parser.add_argument("--azure-info", default="azure_auth.json",
                        help="dpu_utils-style auth JSON for azure:// data "
                             "paths (downloaded to a local cache up front; "
                             "needs the azure-storage-blob package).")
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--debug", action="store_true")
    cli_args = parser.parse_args()
    try:
        run(cli_args)
    except Exception:
        if cli_args.debug:
            traceback.print_exc()
            pdb.post_mortem()
        else:
            raise
