"""Persistent XLA compilation cache setup.

Compiles in this environment go through a remote service with a cold start
of minutes per executable; a persistent cache turns later processes'
compiles into local disk reads. Setting ``JAX_COMPILATION_CACHE_DIR`` in
user code is NOT sufficient here: the platform's sitecustomize imports JAX
at interpreter start, so the environment variable is read before any
script-level ``os.environ`` assignment runs and the cache silently never
materialises (observed: an 800k QP sweep re-paid ~2 minutes of compiles in
every fresh process). ``jax.config.update`` works at any time.
"""
from __future__ import annotations

import os
import typing


def ladder_lookup(memo: dict, key, base, retry: int = 64):
    """Memoised escalation rung with periodic base-rung retry.

    A plain dict memo only ever ratchets up: one pathological pair would
    permanently pin the expensive rung for every later same-shaped pair in
    the process (ADVICE r2). Every ``retry`` uses of an escalated rung the
    cheap base rung is retried once; if it still overflows, the caller's
    ladder re-escalates and ``ladder_store`` restarts the clock.
    """
    ent = memo.get(key)
    if ent is None:
        return base
    rung, uses = ent
    if rung != base and uses >= retry:
        # Restart the clock NOW: if the base retry fails and the caller
        # re-climbs to the same rung, ladder_store must not immediately
        # re-trigger another base retry (that would re-run the failing
        # base on every subsequent evaluation).
        memo[key] = (rung, 0)
        return base
    return rung


def next_rung(cap: int, ft: int, max_cap: int, max_ft: int):
    """Budget-first certificate escalation.

    Widening the fallback-tile budget (ft) is cheap — the tier passes are
    count-gated and seeded, so certified tiles' extra slots are clamped
    index-map no-ops — while widening the stage-1 cap multiplies the whole
    refinement. Dense giant clouds (2M bench, b->a direction) fail the
    certificate with 400+ over-cap tiles whose tier widths would certify
    fine: escalate ft x4 first, and only then cap x4. (A jump-to-max-ft
    variant was considered to bound rung waste when the overflow is
    width-caused — which ft cannot fix — but it lands the COMMON dense-2M
    case on ft=nta, whose all-tile gather + clamped tier steps cost more
    than the graduated rung; x4 wastes at most ~3 one-time-per-shape
    evaluations in the rare width-failure case, each memoised away.)
    """
    if ft < max_ft:
        return cap, min(ft * 4, max_ft)
    return min(cap * 4, max_cap), ft


def ladder_store(memo: dict, key, rung) -> None:
    """Record the rung that certified; count repeat uses for ladder_lookup."""
    ent = memo.get(key)
    if ent is not None and ent[0] == rung:
        memo[key] = (rung, ent[1] + 1)
    else:
        memo[key] = (rung, 0)


def enable_compile_cache(
    directory: typing.Optional[str] = None,
) -> str:
    """Point JAX's persistent compilation cache at ``directory``.

    Defaults to ``$JAX_COMPILATION_CACHE_DIR`` or ``<repo>/.jax_cache``.
    Safe to call repeatedly; returns the directory in effect.

    CPU backends are excluded: XLA:CPU AOT executables bake in the compile
    host's machine features, and loading an entry produced on a different
    host warns "could lead to execution errors such as SIGILL" — observed
    as a real mid-suite SEGFAULT when the test run (forced-CPU) loaded
    cache entries written on an earlier host. CPU compiles are seconds
    anyway; only the tunnelled remote TPU compiles (minutes) need the
    cache.
    """
    import jax

    if jax.default_backend() == "cpu":
        return ""
    if directory is None:
        directory = os.environ.get("JAX_COMPILATION_CACHE_DIR") or os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache")
    os.makedirs(directory, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", directory)
    # Store anything that took real compile time; tiny programs stay out.
    try:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except AttributeError:  # renamed/absent in some jax versions
        pass
    return directory
