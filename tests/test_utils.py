"""utils/: platform resolution + persistent compile cache."""

import jax

from tcresnet_tpu.utils.cache import enable_persistent_cache
from tcresnet_tpu.utils.platform import default_platform


def test_enable_persistent_cache(tmp_path, monkeypatch):
    prev = jax.config.jax_compilation_cache_dir
    target = tmp_path / "jaxcache"
    try:
        used = enable_persistent_cache(str(target))
        assert used == str(target)
        assert target.is_dir()
        assert jax.config.jax_compilation_cache_dir == str(target)
        # env var fallback
        monkeypatch.setenv("TCRESNET_JAX_CACHE", str(tmp_path / "envcache"))
        assert enable_persistent_cache() == str(tmp_path / "envcache")
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def test_default_platform_honors_string_pin():
    prev = jax.config.jax_default_device
    try:
        jax.config.update("jax_default_device", "cpu")
        assert default_platform() == "cpu"
        dev = jax.devices("cpu")[0]
        jax.config.update("jax_default_device", dev)
        assert default_platform() == "cpu"
    finally:
        jax.config.update("jax_default_device", prev)
