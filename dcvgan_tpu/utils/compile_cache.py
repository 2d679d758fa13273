"""Machine-keyed persistent JAX compilation cache.

Round-3 postmortem (VERDICT.md "What's weak" #1): a repo-local persistent
compile cache written on the builder host was loaded by the driver on a
host with a different CPU feature set — XLA:CPU AOT executables embed the
compile machine's features, and `cpu_aot_loader` refused/recompiled every
entry ("could lead to execution errors such as SIGILL"), turning the cache
from an accelerator into a timeout. Two defenses here, both applied:

1. The cache directory is keyed by a machine fingerprint (platform,
   CPU feature flags, JAX version): a different machine sees a clean
   MISS, never a poisoned HIT.
2. ``jax_persistent_cache_enable_xla_caches="none"`` keeps machine-
   specific XLA-level artifacts (the CPU AOT kernel cache) out of the
   persistent cache entirely, so even a shared directory cannot poison.

Import of this module must never initialize the JAX backend.
"""

from __future__ import annotations

import hashlib
import platform
from pathlib import Path

import jax


def machine_fingerprint() -> str:
    """A short stable hash of what makes compiled artifacts machine-bound:
    architecture, CPU feature flags, and the JAX version."""
    parts = [platform.machine(), jax.__version__]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.lower().startswith(("flags", "features")):
                    parts.append(" ".join(sorted(line.split(":", 1)[1].split())))
                    break
    except OSError:
        parts.append(platform.processor() or "unknown-cpu")
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:12]


def enable_compile_cache(root: Path, tag: str = "shared") -> Path | None:
    """Point JAX's persistent compilation cache at a machine-keyed dir.

    One SHARED dir per machine by default: JAX's cache is content-keyed
    (backend, HLO, compile options), so the test suite, driver dryrun,
    bench, and CLI all warm each other — cold compiles of the 5-model
    step cost minutes on a 1-core host. Pass a distinct ``tag`` only when
    isolation is explicitly wanted.

    Best-effort: any failure (read-only filesystem, unknown config name
    after a JAX upgrade) leaves the process running uncached rather than
    broken — the defensive options are applied BEFORE the dir is enabled
    so a partial failure can never yield an undefended active cache, and
    the dir is rolled back if a later update fails. Returns the cache
    dir, or None if disabled.
    """
    try:
        # defenses first: a corrupt/unreadable entry must mean "recompile",
        # never "crash" ...
        jax.config.update("jax_raise_persistent_cache_errors", False)
        # ... and machine-specific XLA-level artifacts (CPU AOT kernels)
        # must never enter the persistent cache
        jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
        cache_dir = Path(root) / ".jax_cache" / f"{tag}-{machine_fingerprint()}"
        cache_dir.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        try:
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:
            jax.config.update("jax_compilation_cache_dir", None)
            raise
        return cache_dir
    except Exception:
        return None
