"""AOT executable serialization: skip the multi-minute TPU compile on warm
starts (VERDICT r3 item 7).

Round-3 measured that JAX's persistent *compilation cache* does NOT help
the axon remote-compile path (entries are written, a fresh process
recompiles anyway — PERF_NOTES). This module attacks the same tax one
level lower: serialize the compiled PJRT *executable* itself
(``jax.experimental.serialize_executable``) keyed on everything that can
invalidate it — jax version, device kind, the runtime's platform_version
(which carries the libtpu build), and a fingerprint of the lowered HLO.
On a key hit the executable is deserialized and loaded, skipping
compilation entirely; any failure (key miss, deserialize error after a
libtpu upgrade, an unsupported backend) falls back to a normal compile
and refreshes the cache entry.

Reference basis: none (the reference is eager torch); this is TPU
framework infrastructure, same motivation as utils/compilecache.py.
"""

from __future__ import annotations

import hashlib
import os
import pickle
import sys

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))),
    ".jax_aot",
)


def aot_cache_dir() -> str:
    """$ST3D_AOT_CACHE > <repo>/.jax_aot; empty env value disables."""
    env = os.environ.get("ST3D_AOT_CACHE")
    if env is not None:
        return env  # '' = disabled
    return _DEFAULT_DIR


def _environment_key() -> str:
    import jax

    dev = jax.devices()[0]
    client = getattr(dev, "client", None)
    platver = getattr(client, "platform_version", "?")
    key = f"jax={jax.__version__};kind={dev.device_kind};rt={platver}"
    if getattr(dev, "platform", None) == "cpu":
        # XLA:CPU codegen is host-microarchitecture-dependent; a blob from
        # a different host could SIGILL (VERDICT r4 item 2). TPU blobs are
        # backend-side and must NOT key on the local host (warm caches
        # survive host changes).
        from st3d.utils.compilecache import host_cpu_fingerprint

        key += f";host={host_cpu_fingerprint()}"
    return key


def _n_exec_devices(compiled) -> "int | None":
    """Device count a compiled/loaded executable actually spans (None when
    the private introspection path is unavailable — fail open)."""
    try:
        return len(compiled._executable.xla_executable.local_devices())
    except Exception:
        return None


_LAST_LOADED_BLOB = None

# The serialized Mosaic kernel payloads inside `tpu_custom_call` ops embed
# the FULL Python call stack of the pallas_call invocation, so the same
# graph lowered from two different call sites (or after any line shift in
# a caller) hashes differently — measured round 5: one bench process
# minted three distinct keys for the identical create executable, one per
# calling loop. The payloads are therefore MASKED out of the hashed text;
# what they semantically depend on is restored to the key explicitly:
# the kernel sources digest (_kernel_sources_digest) and the ST3D_* env
# flags that steer kernel lowering/banding (_st3d_lowering_env). Operand
# shapes/dtypes remain visible in the custom_call signature outside the
# payload.
_PAYLOAD_RE = None
_KERNEL_DIGEST = None


def _normalized_module_text(text: str) -> str:
    global _PAYLOAD_RE
    if _PAYLOAD_RE is None:
        import re

        _PAYLOAD_RE = re.compile(r'backend_config\s*=\s*"[^"]*"')
    return _PAYLOAD_RE.sub('backend_config = "<masked>"', text)


def _kernel_sources_digest() -> str:
    """sha256 over every st3d kernel/render source file (sorted): a kernel
    edit must invalidate cached executables whose visible HLO only changed
    inside the masked Mosaic payload."""
    global _KERNEL_DIGEST
    if _KERNEL_DIGEST is None:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        h = hashlib.sha256()
        for sub in ("kernels", "render"):
            d = os.path.join(root, sub)
            if not os.path.isdir(d):
                continue
            for name in sorted(os.listdir(d)):
                if name.endswith(".py"):
                    with open(os.path.join(d, name), "rb") as f:
                        h.update(name.encode() + b"\x00" + f.read())
        _KERNEL_DIGEST = h.hexdigest()[:16]
    return _KERNEL_DIGEST


def _st3d_lowering_env() -> str:
    """Sorted ST3D_* env flags (minus the cache-location ones): the A/B
    reverts and banding overrides change kernel lowering inside the masked
    payload, so they must key the cache."""
    skip = {"ST3D_AOT_CACHE", "ST3D_NO_AOT", "ST3D_COMPILE_CACHE"}
    return ";".join(f"{k}={v}" for k, v in sorted(os.environ.items())
                    if k.startswith("ST3D_") and k not in skip)


def invalidate_last_loaded_blob() -> "str | None":
    """Delete the most recently LOADED cache blob and return its path
    (None if nothing was loaded or it is already gone). For callers whose
    AOT-loaded executable deserialized fine but failed at EXECUTION time
    (e.g. libtpu skew the environment key cannot see): deleting the blob
    makes the caller's next attempt compile fresh instead of reproducing
    the failure."""
    global _LAST_LOADED_BLOB
    path, _LAST_LOADED_BLOB = _LAST_LOADED_BLOB, None
    if path and os.path.isfile(path):
        try:
            os.remove(path)
            return path
        except OSError:
            return None
    return None


def load_or_compile(jitted, example_args, tag: str, verbose: bool = True):
    """Return a compiled executable for ``jitted`` at ``example_args``'
    shapes/dtypes, loading it from the AOT cache when the environment+HLO
    key matches and compiling (then caching) otherwise.

    ``example_args``: the positional args tuple (arrays or
    ShapeDtypeStructs). The returned object is the ``.compile()``d
    executable — call it with the real arrays. Returns ``(compiled,
    from_cache, meta_path)`` where ``meta_path`` is a stable sidecar path
    (same key) callers can use for compile-time byproducts (e.g. the
    cost_analysis FLOP count, which is unavailable on a deserialized
    executable); '' when caching is disabled.
    """
    import jax

    cache_dir = aot_cache_dir()
    lowered = jitted.lower(*example_args)
    if not cache_dir:
        return lowered.compile(), False, ""

    # Key: environment + the lowered module. as_text() of a big graph is a
    # few MB — hashing it costs ms against a 450s compile.
    try:
        hlo = _normalized_module_text(lowered.as_text())
    except Exception as e:
        # NEVER hash repr(lowered): it contains the object's memory
        # address, i.e. a fresh random key per call that poisons the
        # cache dir with duplicate blobs (measured round 5). Compile
        # without caching instead.
        print(f"aot: {tag} lowered.as_text() failed ({e!r}); compiling "
              "without cache", file=sys.stderr)
        return lowered.compile(), False, ""
    key = hashlib.sha256(
        (_environment_key() + "\x00" + tag + "\x00"
         + _st3d_lowering_env() + "\x00" + _kernel_sources_digest()
         + "\x00" + hlo).encode()
    ).hexdigest()[:32]
    path = os.path.join(cache_dir, f"{tag}_{key}.aot")
    meta_path = os.path.join(cache_dir, f"{tag}_{key}.meta.json")

    if os.path.isfile(path):
        try:
            from jax.experimental.serialize_executable import (
                deserialize_and_load,
            )

            with open(path, "rb") as f:
                payload, in_tree, out_tree, n_dev = pickle.load(f)
            compiled = deserialize_and_load(payload, in_tree, out_tree)
            # deserialize_and_load can silently map a single-device
            # executable onto ALL local devices (seen on the 8-virtual-
            # device CPU host: input_shardings still say device 0 but the
            # loaded executable demands 8 input shards and execution
            # fails). Reject any blob whose loaded device count differs
            # from the count recorded at serialize time.
            got = _n_exec_devices(compiled)
            if n_dev is not None and got is not None and got != n_dev:
                raise RuntimeError(
                    f"deserialized onto {got} devices, expected {n_dev}")
            if verbose:
                print(f"aot: loaded {tag} executable from {path} "
                      "(compile skipped)", file=sys.stderr)
            global _LAST_LOADED_BLOB
            _LAST_LOADED_BLOB = path
            return compiled, True, meta_path
        except Exception as e:  # stale/incompatible blob: recompile
            if verbose:
                print(f"aot: cached {tag} executable unusable ({e!r}); "
                      "recompiling", file=sys.stderr)

    compiled = lowered.compile()
    try:
        from jax.experimental.serialize_executable import serialize

        payload, in_tree, out_tree = serialize(compiled)
        os.makedirs(cache_dir, exist_ok=True)
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            pickle.dump((payload, in_tree, out_tree,
                         _n_exec_devices(compiled)), f)
        os.replace(tmp, path)
        if verbose:
            print(f"aot: serialized {tag} executable to {path} "
                  f"({os.path.getsize(path) / 1e6:.1f} MB)",
                  file=sys.stderr)
    except Exception as e:  # serialization unsupported: documented fallback
        if verbose:
            print(f"aot: executable serialization unavailable ({e!r})",
                  file=sys.stderr)
    return compiled, False, meta_path


def load_or_compile_guarded(jitted, call_specs, tag: str, static_tail=(),
                            verbose: bool = True):
    """``load_or_compile`` + a throwaway-execution probe of CACHE-LOADED
    executables, for callers that cannot retry at a higher level (the
    pipelines — a poisoned blob that deserializes fine but fails at
    execution time, e.g. invisible libtpu skew, would otherwise crash a
    user run; bench.py self-heals the same failure at its retry boundary).

    ``call_specs``: the runtime (non-static) positional args as pytrees of
    ShapeDtypeStructs — exactly what the compiled executable is called
    with. ``static_tail``: trailing static argument VALUES (baked into the
    executable). When the blob came from the cache, the executable is run
    once on freshly-created zeros (donation-safe: they are throwaway) and
    any failure invalidates the blob and compiles fresh. Returns the
    compiled executable only."""
    import jax
    import jax.numpy as jnp

    example = tuple(call_specs) + tuple(static_tail)
    compiled, from_cache, _ = load_or_compile(jitted, example, tag, verbose)
    if not from_cache:
        return compiled
    try:
        zeros = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), tuple(call_specs))
        jax.block_until_ready(compiled(*zeros))
    except Exception as e:  # noqa: BLE001 — any guard failure = poisoned
        path = invalidate_last_loaded_blob()
        if verbose:
            print(f"aot: {tag} guard execution failed ({e!r}); "
                  f"invalidated {path}; compiling fresh", file=sys.stderr)
        compiled, _, _ = load_or_compile(jitted, example, tag, verbose)
    return compiled


def aot_jit(jitted, tag: str, gate=None):
    """Wrap a jitted callable so each distinct input-aval signature routes
    through ``load_or_compile_guarded`` lazily (per-shape executables,
    keyed ``{tag}_{aval hash}``). ``gate``: zero-arg predicate evaluated
    per call; when false the plain jit runs (keeps CPU paths off the
    cache). For prep-class graphs whose axon compiles re-tax every
    process (content render, visibility precompute, save renders)."""
    cache = {}

    def call(*args):
        if gate is not None and not gate():
            return jitted(*args)
        import jax
        import jax.numpy as jnp

        specs = jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(jnp.shape(a),
                                           jnp.result_type(a)), args)
        sig = hashlib.sha256(str(jax.tree_util.tree_map(
            lambda s: (s.shape, str(s.dtype)), specs)).encode()
        ).hexdigest()[:8]
        fn = cache.get(sig)
        if fn is None:
            fn = cache[sig] = load_or_compile_guarded(
                jitted, specs, f"{tag}_{sig}")
        return fn(*args)

    return call
