"""AOT executable disk cache: skip XLA recompiles across PROCESSES.

The platform's persistent compilation cache keys do not transfer across
processes here (byte-identical programs produced distinct keys — see
docs/PERF.md "Known bounded gaps"), so every fresh process pays the full
step compile (~90-215 s measured). This module sidesteps the cache-key
problem entirely: the first process serialises the COMPILED PJRT
executable (``jax.experimental.serialize_executable``) to disk keyed by a
digest of the program's own StableHLO text (plus jax version and device
kind), and later processes deserialise and load it — paying lowering
(sub-second tracing) instead of compilation.

Scope and honesty:
- The digest covers exactly what determines the executable: the lowered
  module text, the jit's resolved ``compiler_options`` (verified to flow
  through ``lower().compile()``, but NOT present in the StableHLO text —
  factories in ``parallel/train_step.py`` tag the jitted callable with
  ``_sde_compiler_options`` and the digest folds them in), the backend
  version, and the device kind/count.
- Executable portability is backend-dependent; every load is wrapped, and
  any failure falls back to a normal ``lower().compile()`` and re-saves.
- Donation/sharding metadata rides inside the serialised executable; the
  call signature of the returned object matches the jitted function's.
- SECURITY: blobs are unpickled on load (both our wrapper tuple and, via
  ``jax.experimental.serialize_executable``, the payload itself — pickle
  is that API's own format), so loading a blob another user could have
  written is arbitrary code execution. The cache dir is therefore created
  ``0o700``, and loads REFUSE any dir/blob not owned by the current uid
  or writable by group/other — such entries are recompiled instead.
"""

from __future__ import annotations

import hashlib
import os
import pickle
import sys
import tempfile
from pathlib import Path
from typing import Any, Callable


def _say(msg: str) -> None:
    """Verbose diagnostics go to stderr: callers (bench.py, the CLIs)
    reserve stdout for machine-parsed results."""
    print(msg, file=sys.stderr, flush=True)


def resolve_aot_dir(arg: str, auto_base: str | Path) -> Path | None:
    """Resolve a CLI ``--aot-cache`` value: ``"off"`` -> None (disabled),
    ``"auto"`` -> ``<auto_base>/.aot_cache``, anything else -> that path.
    One definition for the trainer, eval, predict, and live-viewer CLIs,
    which all expose the same flag."""
    if arg == "off":
        return None
    if arg == "auto":
        return Path(auto_base).expanduser().resolve() / ".aot_cache"
    return Path(arg).expanduser().resolve()


def _safe_to_load(path: Path) -> bool:
    """True when ``path`` and its directory are owned by the current uid
    and not group/other-writable — the pickle-load precondition (module
    docstring, SECURITY). Non-POSIX platforms (no getuid) pass."""
    getuid = getattr(os, "getuid", None)
    if getuid is None:
        return True
    try:
        stats = (path.parent.stat(), path.stat())
    except OSError:
        return False
    uid = getuid()
    return all(s.st_uid == uid and not (s.st_mode & 0o022) for s in stats)


def _digest(lowered: Any, extra: str = "") -> str:
    import jax

    devices = jax.devices()
    key = "\x00".join(
        (
            lowered.as_text(),
            jax.__version__,
            devices[0].device_kind,
            str(len(devices)),
            extra,
        )
    )
    if jax.process_count() > 1:
        # A multihost executable is one per-process SLICE of a global
        # program: blobs are keyed per (topology, process_id) so a process
        # can only ever load the slice compiled for its own position.
        # Measured safe on the gloo/CPU farm — byte-identical training
        # metrics after reload, 18.0 s compile -> 0.41 s load
        # (scripts/multihost_aot_probe.py, docs/multihost_aot_probe.json).
        # Appended only when multi-process so single-process digests keep
        # their existing keys.
        key += f"\x00proc={jax.process_index()}/{jax.process_count()}"
    return hashlib.blake2s(key.encode()).hexdigest()


def compile_with_disk_cache(
    jitted: Callable[..., Any],
    cache_dir: str | Path,
    *args: Any,
    verbose: bool = False,
    **kwargs: Any,
) -> tuple[Callable[..., Any], str]:
    """Lower ``jitted`` for ``args``/``kwargs`` and return
    ``(compiled_callable, source)`` where source is one of:

    - ``"aot-cache"``  — deserialised a previously saved executable,
    - ``"compiled"``   — compiled now and saved for future processes,
    - ``"compiled-unsaved"`` — compiled now; this backend would not
      serialise (the executable still works, nothing is cached).
    """
    import jax
    from jax.experimental import serialize_executable

    cache_dir = Path(cache_dir)
    cache_dir.mkdir(parents=True, exist_ok=True)
    try:  # private by construction; loads verify below (SECURITY note)
        os.chmod(cache_dir, 0o700)
    except OSError:
        pass
    # Lower with tracebacks stripped from MLIR locations: Pallas custom-call
    # payloads otherwise embed the CALLER's source lines (measured: editing
    # unrelated bench.py lines changed the serialized kernel bytes), which
    # made the digest miss after any refactor of the calling file. With the
    # flag off the lowered text is byte-identical across call sites, so the
    # key depends only on the program itself. Set-and-restore keeps normal
    # debuggability everywhere else.
    saved_flag = jax.config.jax_include_full_tracebacks_in_locations
    jax.config.update("jax_include_full_tracebacks_in_locations", False)
    try:
        lowered = jitted.lower(*args, **kwargs)
    finally:
        jax.config.update(
            "jax_include_full_tracebacks_in_locations", saved_flag
        )
    # The digest must ALSO cover the input pytree structure: jit prunes
    # unused args from the lowered module, so two functions can lower to
    # byte-identical StableHLO while expecting different call pytrees
    # (measured: the eval step never reads opt_state, so constant-lr
    # EmptyState and cosine ScaleByScheduleState collided and the loaded
    # executable rejected the call with a pytree mismatch).
    in_tree_repr = str(jax.tree.structure((args, kwargs)))
    # Compiler options change the produced executable but leave the
    # StableHLO text untouched, so they must be digested explicitly (our
    # jit factories tag the callable; see module docstring). Appended only
    # when present so option-less programs keep their existing digests.
    options = getattr(jitted, "_sde_compiler_options", None)
    if options:
        in_tree_repr += "\x00options=" + repr(sorted(options.items()))
    digest = _digest(lowered, extra=in_tree_repr)
    path = cache_dir / f"aot_{digest}.bin"
    if os.environ.get("SDE_AOT_DEBUG"):
        # Key-stability debugging: persist the digested text so two
        # processes' keys can be diffed when a supposed repeat run misses.
        (cache_dir / f"aot_{digest}.hlo.txt").write_text(lowered.as_text())

    if path.exists() and not _safe_to_load(path):
        if verbose:
            _say(
                f"[aot_cache] refusing to load {path.name}: cache dir/blob "
                "not private to this uid (see module SECURITY note); "
                "recompiling"
            )
    elif path.exists():
        try:
            payload, in_tree, out_tree, device_ids = pickle.loads(
                path.read_bytes()
            )
            # deserialize_and_load defaults execution_devices to ALL local
            # devices; the executable must run on the same device set it was
            # compiled for (e.g. 1 of an 8-device farm).
            execution_devices = None
            if device_ids is not None:
                import jax

                by_id = {d.id: d for d in jax.devices()}
                execution_devices = [by_id[i] for i in device_ids]
            compiled = serialize_executable.deserialize_and_load(
                payload, in_tree, out_tree,
                execution_devices=execution_devices,
            )
            if verbose:
                _say(f"[aot_cache] loaded executable from {path.name}")
            try:  # mark as recently used so LRU pruning keeps it
                os.utime(path)
            except OSError:
                pass
            return compiled, "aot-cache"
        except Exception as exc:  # corrupt / incompatible: recompile below
            if verbose:
                _say(f"[aot_cache] load failed ({exc!r}); recompiling")
            try:
                path.unlink()
            except OSError:
                pass

    compiled = lowered.compile()
    try:
        device_ids = _device_assignment_ids(compiled)
        blob = pickle.dumps(
            (*serialize_executable.serialize(compiled), device_ids)
        )
    except Exception as exc:
        if verbose:
            _say(f"[aot_cache] backend would not serialize ({exc!r})")
        return compiled, "compiled-unsaved"
    # Atomic publish: a concurrent process never reads a half-written blob.
    fd, tmp = tempfile.mkstemp(dir=cache_dir, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as fh:
            fh.write(blob)
        os.replace(tmp, path)
    except OSError:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return compiled, "compiled-unsaved"
    if verbose:
        _say(
            f"[aot_cache] saved executable ({len(blob) / 1e6:.1f} MB) "
            f"to {path.name}"
        )
    _prune_lru(cache_dir, keep=path)
    return compiled, "compiled"


def _prune_lru(cache_dir: Path, keep: Path) -> None:
    """Bound the cache: executables are O(100 MB) each and every digest
    change (source edit that alters the program, jax upgrade, new input
    structure) orphans the previous blob forever. After a save, keep the
    ``SDE_AOT_CACHE_KEEP`` (default 16) most recently USED blobs — loads
    touch mtime above, so active entries never age out — and delete the
    rest. Deleting a blob another process is mid-reading is safe on POSIX
    (the open handle stays valid); a concurrent miss just recompiles."""
    try:
        limit = int(os.environ.get("SDE_AOT_CACHE_KEEP", "16"))
    except ValueError:
        limit = 16
    if limit <= 0:  # 0 disables pruning entirely
        return
    try:
        blobs = sorted(
            cache_dir.glob("aot_*.bin"),
            key=lambda p: p.stat().st_mtime,
            reverse=True,
        )
    except OSError:
        return
    for stale in blobs[limit:]:
        if stale == keep:
            continue
        try:
            stale.unlink()
            stale.with_suffix(".hlo.txt").unlink(missing_ok=True)
        except OSError:
            pass


def lazy_aot_wrap(
    jitted: Callable[..., Any],
    cache_dir: str | Path,
    label: str = "step",
    verbose: bool = False,
) -> Callable[..., Any]:
    """Wrap a jitted function with the executable disk cache, lazily.

    Each distinct argument signature (shapes/dtypes of the leaves) lowers
    against its ACTUAL runtime arguments (so shapes, dtypes, and mesh
    shardings are exactly the production ones) and loads or
    compiles-and-saves that executable; later calls with a seen signature
    go straight to it. A validation tail batch therefore gets its OWN
    cached executable instead of recompiling in every fresh process. Any
    cache failure falls back to the original jitted function permanently —
    the wrapper can only ever save time, never change behaviour.
    """
    import time

    import jax

    compiled_by_sig: dict[tuple, Callable[..., Any]] = {}
    state: dict[str, Any] = {"failed": False}

    def _sig(args: tuple, kwargs: dict) -> tuple:
        # Leaf avals AND the pytree structure: two calls can carry identical
        # leaves in different containers (e.g. constant-lr EmptyState vs
        # schedule state in opt_state) and must not share an executable —
        # same reason the disk digest covers the input treedef.
        leaves, treedef = jax.tree.flatten((args, kwargs))
        return (
            str(treedef),
            tuple(
                (x.shape, str(x.dtype))
                if hasattr(x, "shape") and hasattr(x, "dtype")
                else type(x).__name__
                for x in leaves
            ),
        )

    def call(*args: Any, **kwargs: Any) -> Any:
        if state["failed"]:
            return jitted(*args, **kwargs)
        sig = _sig(args, kwargs)
        if sig not in compiled_by_sig:
            try:
                t0 = time.perf_counter()
                compiled, source = compile_with_disk_cache(
                    jitted, cache_dir, *args, verbose=verbose, **kwargs
                )
                compiled_by_sig[sig] = compiled
                if verbose:
                    _say(
                        f"[aot_cache] {label} ready in "
                        f"{time.perf_counter() - t0:.1f}s ({source})"
                    )
            except Exception as exc:
                state["failed"] = True
                if verbose:
                    _say(f"[aot_cache] {label}: disabled ({exc!r})")
                return jitted(*args, **kwargs)
        return compiled_by_sig[sig](*args, **kwargs)

    return call


def _device_assignment_ids(compiled: Any) -> list[int] | None:
    """Device ids the executable was compiled for (best effort).

    Multihost returns None: a per-process slice must load onto
    ``deserialize_and_load``'s default device set (this process's
    addressable devices) — the executable's recorded assignment mixes
    global and local id spaces across processes (observed: process 0 of
    the gloo farm failed its own reload with ``KeyError(2048)`` while the
    id-free path reproduces fresh-compile metrics byte-for-byte,
    scripts/multihost_aot_probe.py)."""
    import jax

    if jax.process_count() > 1:
        return None
    try:
        return [d.id for d in compiled._executable.xla_executable.local_devices()]
    except Exception:
        return None


__all__ = ["compile_with_disk_cache", "lazy_aot_wrap"]
