"""AOT executable cache (st3d/utils/aot.py — the bench warm-start path):
round trip, cache-hit equivalence, disable switch, corrupt-blob fallback.

Runs on the CPU backend (conftest); jax.experimental.serialize_executable
works for CPU executables, so the full serialize → deserialize → execute
path is exercised for real.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from st3d.utils.aot import aot_cache_dir, load_or_compile


@jax.jit
def _fn(x, y):
    return jnp.tanh(x @ y) * 2.0


def _args():
    rs = np.random.RandomState(0)
    return (jnp.asarray(rs.rand(16, 8), jnp.float32),
            jnp.asarray(rs.rand(8, 4), jnp.float32))


def test_roundtrip_guard_multidevice(tmp_path, monkeypatch):
    """On this 8-virtual-device host, jax's deserialize_and_load maps a
    single-device executable onto all 8 local devices (execution would
    fail with 'expected 8 shards'); load_or_compile must detect the
    mismatch, reject the blob, and fall back to a working compile."""
    monkeypatch.setenv("ST3D_AOT_CACHE", str(tmp_path))
    x, y = _args()

    c1, hit1, meta1 = load_or_compile(_fn, (x, y), tag="t", verbose=False)
    assert hit1 is False and meta1.startswith(str(tmp_path))
    out1 = np.asarray(c1(x, y))

    blobs = [p for p in os.listdir(tmp_path) if p.endswith(".aot")]
    if not blobs:
        pytest.skip("executable serialization unsupported on this backend")

    c2, hit2, meta2 = load_or_compile(_fn, (x, y), tag="t", verbose=False)
    assert meta2 == meta1
    if jax.local_device_count() == 1:
        assert hit2 is True           # clean round trip on 1 device
    # Either way the returned executable must WORK:
    np.testing.assert_allclose(np.asarray(c2(x, y)), out1, rtol=1e-6)


def test_cache_hit_single_device(tmp_path):
    """The true warm-start path (what bench.py uses on the single TPU
    chip): in a 1-device process, run 2 must load from the cache and
    execute. Subprocess because conftest forces 8 virtual devices here."""
    import subprocess
    import sys as _sys
    import textwrap

    code = textwrap.dedent("""
        import sys; sys.path.insert(0, %r)
        import jax; jax.config.update("jax_platforms", "cpu")
        import jax.numpy as jnp, numpy as np
        from st3d.utils.aot import load_or_compile

        @jax.jit
        def f(x, y): return jnp.tanh(x @ y) * 2.0
        x = jnp.ones((16, 8)); y = jnp.ones((8, 4))
        c1, hit1, _ = load_or_compile(f, (x, y), tag="t", verbose=False)
        out1 = np.asarray(c1(x, y))
        c2, hit2, _ = load_or_compile(f, (x, y), tag="t", verbose=False)
        assert hit1 is False, hit1
        assert hit2 is True, "no cache hit on run 2 (single device)"
        np.testing.assert_allclose(np.asarray(c2(x, y)), out1, rtol=1e-6)
        print("SINGLE_DEVICE_HIT_OK")
    """) % os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, ST3D_AOT_CACHE=str(tmp_path))
    env.pop("XLA_FLAGS", None)        # no forced 8-device host
    proc = subprocess.run([_sys.executable, "-c", code], env=env,
                          capture_output=True, text=True, timeout=240)
    if "serialization unsupported" in proc.stderr:
        pytest.skip("executable serialization unsupported on this backend")
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "SINGLE_DEVICE_HIT_OK" in proc.stdout


def test_key_separates_shapes(tmp_path, monkeypatch):
    monkeypatch.setenv("ST3D_AOT_CACHE", str(tmp_path))
    x, y = _args()
    load_or_compile(_fn, (x, y), tag="t", verbose=False)
    # Different shapes -> different HLO -> different key -> a fresh compile
    # (NOT a bogus cache hit executing wrong shapes).
    x2 = jnp.concatenate([x, x], axis=0)
    c, hit, _ = load_or_compile(_fn, (x2, y), tag="t", verbose=False)
    assert hit is False
    assert c(x2, y).shape == (32, 4)


def test_disabled_by_empty_env(tmp_path, monkeypatch):
    monkeypatch.setenv("ST3D_AOT_CACHE", "")
    assert aot_cache_dir() == ""
    x, y = _args()
    c, hit, meta = load_or_compile(_fn, (x, y), tag="t", verbose=False)
    assert hit is False and meta == ""
    assert c(x, y).shape == (16, 4)


def test_corrupt_blob_falls_back(tmp_path, monkeypatch):
    monkeypatch.setenv("ST3D_AOT_CACHE", str(tmp_path))
    x, y = _args()
    _, _, meta = load_or_compile(_fn, (x, y), tag="t", verbose=False)
    blobs = [p for p in os.listdir(tmp_path) if p.endswith(".aot")]
    if not blobs:
        pytest.skip("executable serialization unsupported on this backend")
    with open(os.path.join(tmp_path, blobs[0]), "wb") as f:
        f.write(b"not a pickle")
    c, hit, _ = load_or_compile(_fn, (x, y), tag="t", verbose=False)
    assert hit is False                      # fell back to a fresh compile
    assert c(x, y).shape == (16, 4)


def test_foreign_host_blob_is_clean_miss(tmp_path, monkeypatch):
    """A CPU blob cached under a DIFFERENT host-CPU fingerprint must be a
    clean cache MISS (fresh compile), never a feature-mismatched load —
    the MULTICHIP_r04 'could lead to SIGILL' hazard (VERDICT r4 item 2)."""
    from st3d.utils import aot, compilecache

    monkeypatch.setenv("ST3D_AOT_CACHE", str(tmp_path))
    x, y = _args()
    key_here = aot._environment_key()
    assert f";host={compilecache.host_cpu_fingerprint()}" in key_here

    load_or_compile(_fn, (x, y), tag="t", verbose=False)
    blobs = [p for p in os.listdir(tmp_path) if p.endswith(".aot")]
    if not blobs:
        pytest.skip("executable serialization unsupported on this backend")

    # Simulate arriving on a host with a different ISA feature set.
    monkeypatch.setattr(compilecache, "host_cpu_fingerprint",
                        lambda: "deadbeef0000")
    assert aot._environment_key() != key_here
    c, hit, _ = load_or_compile(_fn, (x, y), tag="t", verbose=False)
    assert hit is False                   # miss, not a mismatched load
    assert c(x, y).shape == (16, 4)


def test_compilation_cache_dir_is_host_scoped(tmp_path, monkeypatch):
    """enable_compilation_cache must scope the XLA persistent cache under
    host-<cpu fingerprint> so heterogeneous hosts never share CPU entries."""
    from st3d.utils.compilecache import (enable_compilation_cache,
                                         host_cpu_fingerprint)

    fp = host_cpu_fingerprint()
    assert len(fp) == 12 and fp == host_cpu_fingerprint()  # stable
    used = enable_compilation_cache(str(tmp_path))
    try:
        assert used == os.path.join(str(tmp_path), f"host-{fp}")
        assert os.path.isdir(used)
        monkeypatch.setenv("ST3D_COMPILE_CACHE", "")
        assert enable_compilation_cache() == ""       # disable still works
    finally:
        # Restore the suite's shared cache dir (conftest set it once).
        monkeypatch.delenv("ST3D_COMPILE_CACHE", raising=False)
        enable_compilation_cache()


def test_invalidate_last_loaded_blob(tmp_path, monkeypatch):
    """After a cache LOAD, invalidate_last_loaded_blob deletes the blob
    (the poisoned-executable self-heal bench.py's child uses) and is a
    no-op when nothing was loaded."""
    import subprocess
    import sys as _sys
    import textwrap

    # Single-device subprocess: the load path only engages cleanly there
    # (this host's 8 virtual devices trip the device-count guard).
    code = textwrap.dedent("""
        import os, sys; sys.path.insert(0, %r)
        import jax; jax.config.update("jax_platforms", "cpu")
        import jax.numpy as jnp
        from st3d.utils import aot

        @jax.jit
        def f(x, y): return jnp.tanh(x @ y) * 2.0
        x = jnp.ones((16, 8)); y = jnp.ones((8, 4))
        assert aot.invalidate_last_loaded_blob() is None  # nothing loaded
        c1, hit1, _ = aot.load_or_compile(f, (x, y), tag="t", verbose=False)
        blobs = [p for p in os.listdir(%r) if p.endswith(".aot")]
        if not blobs:
            print("SKIP: serialization unsupported"); raise SystemExit(0)
        assert aot.invalidate_last_loaded_blob() is None  # compile, no load
        c2, hit2, _ = aot.load_or_compile(f, (x, y), tag="t", verbose=False)
        assert hit2 is True, hit2
        dropped = aot.invalidate_last_loaded_blob()
        assert dropped and not os.path.isfile(dropped), dropped
        assert aot.invalidate_last_loaded_blob() is None  # idempotent
        c3, hit3, _ = aot.load_or_compile(f, (x, y), tag="t", verbose=False)
        assert hit3 is False, "blob was deleted; must compile fresh"
        print("OK")
    """) % (os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            str(tmp_path))
    env = dict(os.environ, ST3D_AOT_CACHE=str(tmp_path))
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run([_sys.executable, "-c", code], env=env,
                          capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr[-2000:]
    if "SKIP" in proc.stdout:
        pytest.skip("executable serialization unsupported on this backend")
    assert "OK" in proc.stdout
