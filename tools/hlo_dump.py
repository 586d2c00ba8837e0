"""Dump optimized HLO of one family's train step; summarize big fusions."""
import json, os, sys, tempfile, re
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench as B

def main():
    import jax
    from tf_gnn_samples_tpu.tasks.base import DataFold
    from tf_gnn_samples_tpu.utils.registry import name_to_model_class

    model_name = sys.argv[1] if len(sys.argv) > 1 else "GNN-FiLM"
    data_dir = tempfile.mkdtemp(prefix="ppi_hlo_")
    B.make_synthetic_ppi(data_dir)
    hypers_file = B.FAMILY_HYPERS[model_name]
    tuned = {}
    if hypers_file:
        with open(os.path.join("tf_gnn_samples_tpu", "default_hypers", hypers_file)) as f:
            tuned = json.load(f)
    task = B._load_ppi_task(data_dir, tuned.get("task_params"))
    model_cls, extra = name_to_model_class(model_name)
    params = model_cls.default_params()
    params.update(tuned.get("model_params", {}))
    params.update(extra)
    params.update({"random_seed": 0, "cache_batches_on_device": True})
    model = model_cls(params, task, "hlo", tempfile.mkdtemp(prefix="hlo_"))
    data = task._loaded_data[DataFold.TRAIN]
    model._run_epoch("w1", data, DataFold.TRAIN, quiet=True)
    b = model._batch_cache[DataFold.TRAIN][0]
    rng = jax.random.PRNGKey(0)
    if model._jitted_train_step is None:
        fns = model._make_train_step()
    lowered = model._jitted_train_step.lower(model.model_params_tree, model.opt_state, rng, b)
    txt = lowered.compile().as_text()
    with open("/tmp/hlo_%s.txt" % model_name, "w") as f:
        f.write(txt)
    print("wrote /tmp/hlo_%s.txt (%d lines)" % (model_name, txt.count("\n")))

if __name__ == "__main__":
    main()
