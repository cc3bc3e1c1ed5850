"""Profiling hookup (SURVEY.md §5 tracing: the analog of the reference's
GGML_VK_PERF_LOGGER / eval-callback observation tooling).

Wraps jax.profiler tracing behind one env var / context manager:
  TPULLAMA_PROFILE=/tmp/trace  ->  tools (cli, bench, server) write an
  XPlane trace viewable in TensorBoard / Perfetto.

Graph-node observation (the ggml_backend_sched_eval_callback analog) is
the forward's collect_imatrix / collect_hidden hooks (models/llama.py);
per-op timing inside jit comes from the profiler trace, since XLA fuses
ops and per-op host timers would be fiction.
"""

from __future__ import annotations

import contextlib
import os


@contextlib.contextmanager
def maybe_profile(trace_dir: str | None = None):
    """Profile the enclosed block when a trace dir is given (argument or
    TPULLAMA_PROFILE env). No-op otherwise."""
    trace_dir = trace_dir or os.environ.get("TPULLAMA_PROFILE")
    if not trace_dir:
        yield None
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield trace_dir
    import sys

    print(f"[profile] wrote jax trace to {trace_dir} "
          f"(tensorboard --logdir {trace_dir})", file=sys.stderr)


def annotate(name: str):
    """Named-scope annotation for a region inside traced code
    (jax.named_scope; shows up in the profiler timeline)."""
    import jax

    return jax.named_scope(name)
