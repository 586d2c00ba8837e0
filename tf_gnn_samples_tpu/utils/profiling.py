"""Profiling hooks.

The reference has no profiler (SURVEY.md §5: TensorBoard scalar summaries
only). TPU-native equivalent: `jax.profiler` traces viewable in
TensorBoard/XProf, plus the per-epoch graphs/nodes/edges-per-sec counters
already emitted by the training loop (runtime/model.py log format).

Usage:
    python train.py RGCN QM9 --profile-dir /tmp/trace ...
or programmatically:

    with trace_if(profile_dir):
        model.train(...)
"""

import contextlib

import jax


@contextlib.contextmanager
def trace_if(profile_dir=None):
    """jax.profiler trace context when a directory is given; no-op else."""
    if not profile_dir:
        yield
        return
    with jax.profiler.trace(profile_dir):
        yield


@contextlib.contextmanager
def annotate(name: str):
    """Named region in the profiler timeline (TraceAnnotation)."""
    with jax.profiler.TraceAnnotation(name):
        yield
