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


def enable_compile_cache(
    directory: typing.Optional[str] = None,
) -> str:
    """Point JAX's persistent compilation cache at ``directory``.

    Defaults to ``$JAX_COMPILATION_CACHE_DIR`` or ``<repo>/.jax_cache``.
    Safe to call repeatedly; returns the directory in effect.
    """
    import jax

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
