"""Persistent AOT cache for big jitted step programs (jax.export).

Why: the persistent XLA compilation cache (config.compilation_cache_dir)
only removes the BACKEND compile. Python tracing + StableHLO lowering
re-run on every process start, and on a 1-core host they dominate the
stage-2/3 CLI restart cost (~10 min measured for the DFNet/DM step
programs; CLAUDE.md round-4 note). jax.export serializes the lowered
module, so a restart deserializes instead of retracing, and its backend
compile then hits the XLA cache. The reference (a torch eager loop,
run_feature.py / train.py) has no analog — this is a TPU/XLA-native
capability.

Correctness: an exported artifact is only valid for the exact program.
The cache key therefore folds in (a) a content hash of every .py file
in the dfnet_tpu package (any source edit invalidates), (b) a
caller-supplied key (config repr), (c) a hash of any constants the
traced function CLOSES OVER (`consts=` — e.g. the frozen NeRF weights
baked into the stage-3 step; omitting them would replay stale weights),
(d) the jax version and backend platform, and (e) the abstract
signature (pytree structure + shapes/dtypes) of the actual call
arguments. Everything is best-effort: any failure to load, export, or
save falls back to plain jax.jit.
"""

from __future__ import annotations

import hashlib
import os
import os.path as osp
import sys
from typing import Optional

import jax
import numpy as np

_SRC_HASH: Optional[str] = None


def _package_source_hash() -> str:
    """Content hash of the dfnet_tpu package sources (computed once)."""
    global _SRC_HASH
    if _SRC_HASH is None:
        import dfnet_tpu

        root = osp.dirname(dfnet_tpu.__file__)
        h = hashlib.sha256()
        for dirpath, _, files in sorted(os.walk(root)):
            for name in sorted(files):
                if name.endswith(".py"):
                    with open(osp.join(dirpath, name), "rb") as fh:
                        h.update(name.encode())
                        h.update(fh.read())
        _SRC_HASH = h.hexdigest()[:16]
    return _SRC_HASH


def _arg_signature(args) -> str:
    leaves, treedef = jax.tree.flatten(args)
    parts = [str(treedef)]
    for x in leaves:
        a = jax.api_util.shaped_abstractify(x)
        parts.append(f"{a.shape}{a.dtype}")
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:16]


def _consts_hash(consts) -> str:
    """Value hash of closed-over constants (device arrays pulled once)."""
    if consts is None:
        return "noconsts"
    h = hashlib.sha256()
    leaves, treedef = jax.tree.flatten(consts)
    h.update(str(treedef).encode())
    for x in leaves:
        arr = np.asarray(x)
        h.update(str(arr.shape).encode())
        h.update(str(arr.dtype).encode())
        h.update(arr.tobytes())
    return h.hexdigest()[:16]


_REGISTERED = False


def _register_pytrees(jexport):
    """jax.export only serializes pytrees whose node types it knows.
    Step functions carry optax optimizer states (NamedTuple subclasses
    like ScaleByAdamState) — register them all, best-effort."""
    global _REGISTERED
    if _REGISTERED:
        return
    _REGISTERED = True
    import optax

    seen = set()

    def reg(cls):
        if not isinstance(cls, type) or cls in seen:
            return
        seen.add(cls)
        if issubclass(cls, tuple) and hasattr(cls, "_fields"):
            try:
                jexport.register_namedtuple_serialization(
                    cls, serialized_name=f"optax.{cls.__name__}")
            except Exception:
                pass  # already registered / unsupported — fine

    for mod in (optax, getattr(optax, "_src", None)):
        for name in dir(mod or ()):
            reg(getattr(mod, name, None))
    # inject_hyperparams' state lives in optax._src.inject
    try:
        from optax._src import inject  # noqa: F401

        for name in dir(inject):
            reg(getattr(inject, name, None))
    except Exception:
        pass


def _export_mod():
    from jax import export as jexport

    _register_pytrees(jexport)
    # Our own key already hashes package sources + jax version, which is
    # strictly stronger than jax.export's custom-call compatibility
    # window — so Mosaic (Pallas) custom calls are safe to admit.
    checks = []
    try:
        checks = [jexport.DisabledSafetyCheck.custom_call("tpu_custom_call"),
                  jexport.DisabledSafetyCheck.custom_call("Sharding")]
    except Exception:
        pass
    return jexport, checks


def aot_jit(fn, *, key: str, cache_dir: str = "", donate_argnums=(),
            label: str = "step", consts=None):
    """jax.jit with a persistent on-disk trace/lower cache.

    Returns a callable with jit semantics. cache_dir == "" (or any
    failure) degrades to exactly jax.jit(fn, donate_argnums=...).
    consts: pytree of arrays the function closes over — their VALUES are
    hashed into the cache key (they are baked into the exported module).
    """
    jitted = jax.jit(fn, donate_argnums=donate_argnums)
    if not cache_dir or os.environ.get("DFNET_TPU_NO_AOT"):
        return jitted
    cache_dir = osp.expanduser(cache_dir)

    base = hashlib.sha256(
        f"{key}|{jax.__version__}|{jax.default_backend()}|"
        f"{_package_source_hash()}|{_consts_hash(consts)}".encode()
    ).hexdigest()[:16]
    compiled = {}            # arg-signature -> callable

    def wrapper(*args):
        cached = compiled.get(_arg_signature(args))
        if cached is not None:
            return cached(*args)
        sig = _arg_signature(args)
        path = osp.join(cache_dir, f"{label}-{base}-{sig}.jaxexport")
        call = None
        if osp.exists(path):
            try:
                jexport, _ = _export_mod()
                with open(path, "rb") as fh:
                    exp = jexport.deserialize(bytearray(fh.read()))
                call = jax.jit(exp.call, donate_argnums=donate_argnums)
                print(f"[aot] {label}: loaded serialized program "
                      f"({osp.basename(path)}) — skipping retrace",
                      file=sys.stderr)
            except Exception as e:  # stale/corrupt/unsupported — retrace
                print(f"[aot] {label}: load failed ({e!r}); retracing",
                      file=sys.stderr)
                call = None
        if call is None:
            try:
                jexport, checks = _export_mod()
                exp = jexport.export(jitted, disabled_checks=checks)(*args)
                data = exp.serialize()
                os.makedirs(cache_dir, exist_ok=True)
                tmp = f"{path}.tmp.{os.getpid()}"
                with open(tmp, "wb") as fh:
                    fh.write(data)
                os.replace(tmp, path)
                # run through the exported module too (same numerics as a
                # warm start; avoids tracing the function a SECOND time
                # for the plain-jit path — the trace is the expensive part)
                call = jax.jit(exp.call, donate_argnums=donate_argnums)
            except Exception as e:  # best-effort: jit still works
                print(f"[aot] {label}: export skipped ({e!r})",
                      file=sys.stderr)
                call = jitted
        compiled[sig] = call
        return call(*args)

    return wrapper
