"""Utility parity tests (reference: lie_vae/utils.py, experiments/utils.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import scipy.special as sps

from lie_vae_tpu.utils import cycle, expand_dim, logsumexp


def test_logsumexp(key):
    x = jax.random.normal(key, (5, 7), dtype=jnp.float64) * 10
    np.testing.assert_allclose(logsumexp(x, axis=1),
                               sps.logsumexp(np.asarray(x), axis=1),
                               rtol=1e-12)
    np.testing.assert_allclose(logsumexp(x),
                               sps.logsumexp(np.asarray(x)), rtol=1e-12)
    np.testing.assert_allclose(
        logsumexp(x, axis=0, keepdims=True),
        sps.logsumexp(np.asarray(x), axis=0, keepdims=True), rtol=1e-12)


def test_expand_dim():
    x = jnp.arange(6.0).reshape(2, 3)
    y = expand_dim(x, 4, axis=0)
    assert y.shape == (4, 2, 3)
    np.testing.assert_allclose(y[2], x)
    y = expand_dim(x, 5, axis=1)
    assert y.shape == (2, 5, 3)
    np.testing.assert_allclose(y[:, 3], x)


def test_cycle():
    it = cycle([1, 2, 3])
    assert [next(it) for _ in range(7)] == [1, 2, 3, 1, 2, 3, 1]


def test_enable_compilation_cache(tmp_path, monkeypatch):
    import os

    from lie_vae_tpu.utils import enable_compilation_cache

    old = jax.config.jax_compilation_cache_dir
    try:
        # a pre-existing unbounded-era entry must gain an -atime sentinel
        # (missing ones abort every new write once LRU eviction is on)
        os.makedirs(tmp_path / "c", exist_ok=True)
        (tmp_path / "c" / "jit_f-abc-cache").write_bytes(b"x")
        p = enable_compilation_cache(str(tmp_path / "c"))
        assert os.path.isdir(p)
        assert jax.config.jax_compilation_cache_dir == p
        assert os.path.exists(tmp_path / "c" / "jit_f-abc-atime")
        # opt-out env var disables without touching the config
        monkeypatch.setenv("LIE_VAE_TPU_NO_COMPILE_CACHE", "1")
        assert enable_compilation_cache(str(tmp_path / "d")) is None
        assert jax.config.jax_compilation_cache_dir == p
    finally:
        jax.config.update("jax_compilation_cache_dir", old)


def test_serve_client_importable_without_jax():
    """ADVICE r2: the serving client must work from a numpy-only host —
    importing lie_vae_tpu.serve_client (which runs the package __init__)
    must not require jax. Verified in a subprocess with jax blocked."""
    import subprocess
    import sys

    code = (
        "import sys\n"
        "class B:\n"
        "    def find_module(self, n, p=None):\n"
        "        return self if n == 'jax' or n.startswith('jax.') else None\n"
        "    def load_module(self, n):\n"
        "        raise ImportError('blocked: ' + n)\n"
        "sys.meta_path.insert(0, B())\n"
        "from lie_vae_tpu.serve_client import ServingClient\n"
        "print(ServingClient('http://h:1').base_url)\n")
    out = subprocess.run([sys.executable, "-c", code],
                         capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    assert out.stdout.strip() == "http://h:1"
