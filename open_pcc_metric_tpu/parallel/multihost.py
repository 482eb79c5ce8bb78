"""Multi-host (DCN) sweep utilities.

The reference is strictly single-process (SURVEY §3.5). Scaling a metric
sweep beyond one TPU host needs no first-party transport: frames are
embarrassingly parallel, so hosts coordinate through ``jax.distributed``
(control plane) and write disjoint journal shards (data plane) — XLA
collectives over ICI handle everything inside each host's slice.

Typical use on an N-host slice:

    from open_pcc_metric_tpu.parallel import multihost
    multihost.init()                      # jax.distributed.initialize()
    mine = multihost.shard_items(items)   # this host's frames
    run_sweep(mine, journal_path=multihost.shard_path("out.jsonl"))

Journals merge by concatenation (each record is self-describing JSONL).
"""
from __future__ import annotations

import os
import typing


def init(**kwargs) -> None:
    """Initialise jax.distributed (no-op when single-process).

    The already-initialised check must not touch the JAX backends:
    ``jax.process_count()`` initialises them, after which
    ``jax.distributed.initialize`` always raises and a multi-host run would
    silently degrade to N standalone hosts all processing every item. Inspect
    the distributed client state directly instead.
    """
    import jax

    try:
        from jax._src import distributed

        if distributed.global_state.client is not None:
            return  # already initialised
    except (ImportError, AttributeError):
        pass  # private API moved: fall through and let initialize() decide
    try:
        jax.distributed.initialize(**kwargs)
    except (ValueError, RuntimeError) as e:
        # No coordinator configured (single-process run): run standalone.
        from ..utils.logging import get_logger

        get_logger().debug("jax.distributed not initialised (%s); standalone", e)


def process_index() -> int:
    import jax

    return jax.process_index()


def process_count() -> int:
    import jax

    return jax.process_count()


def shard_items(items: typing.Sequence, index: typing.Optional[int] = None,
                count: typing.Optional[int] = None) -> list:
    """Round-robin split of sweep items across hosts (deterministic)."""
    i = process_index() if index is None else index
    c = process_count() if count is None else count
    return [item for j, item in enumerate(items) if j % c == i]


def shard_path(path: str, index: typing.Optional[int] = None) -> str:
    """Per-host journal path: out.jsonl -> out.h<k>.jsonl."""
    i = process_index() if index is None else index
    root, ext = os.path.splitext(path)
    return f"{root}.h{i}{ext}"


def merge_journals(path: str, count: typing.Optional[int] = None) -> str:
    """Concatenate per-host journal shards into the base path."""
    c = process_count() if count is None else count
    with open(path, "w") as out:
        for i in range(c):
            p = shard_path(path, i)
            if os.path.exists(p):
                with open(p) as f:
                    out.write(f.read())
    return path
