"""Persistent XLA compilation-cache location shared by every bench/script.

Remote compiles through the axon relay cost 5-30 minutes per program
shape, and /tmp is wiped between sessions on this host — a /tmp-homed
cache silently re-pays every compile each session. Default to a
repo-local (gitignored) directory that survives; override with
DTA_JAX_CACHE.
"""
import os
import sys


def cache_dir() -> str:
    override = os.environ.get("DTA_JAX_CACHE")
    if override:
        return override
    repo = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    # In an installed (site-packages) environment the derived path is not a
    # writable checkout — fall back to a per-user cache dir.
    if os.path.basename(repo) == "site-packages" or not os.path.isdir(
            os.path.join(repo, ".git")):
        return os.path.join(
            os.path.expanduser("~"), ".cache", "dta_jax_cache")
    return os.path.join(repo, "data", "cache", "jax_cache")


def enable_compile_cache() -> str:
    """Point jax at the persistent cache; safe to call more than once.

    Never raises: a broken cache dir only costs re-compiles, so we warn
    on stderr and continue rather than failing the caller.
    """
    import jax

    d = cache_dir()
    try:
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:
        print("warning: compilation cache disabled ({}: {})".format(
            type(e).__name__, e), file=sys.stderr)
    return d
