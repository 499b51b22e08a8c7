"""Force tests onto a virtual 8-device CPU mesh.

The axon sitecustomize registers the remote-TPU backend in every interpreter
and sets jax_platforms="axon,cpu" via jax.config (which wins over the
JAX_PLATFORMS env var), so we must counter-override through jax.config —
before any backend is used.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


# ----------------------------------------------------------- marker tiers
# Round-3 review Weak #5: the full suite (~435 tests) runs ~35-40 min on
# CPU, too slow as a per-edit loop. Three module-level tiers:
#   fast    `pytest -m fast`  — a <5-min subset touching every package
#   oracle  `pytest -m oracle` — torch-reference parity (needs /root/reference)
#   slow    everything not fast (E2E loops, full-scale converters, towers)
# Markers overlap: a module can be fast AND oracle. Tiers are assigned by
# module name so new tests inherit their file's tier; keep FAST_MODULES
# honest (re-time with `pytest -m fast --durations=10` when adding).

# cheap modules (<~30 s each on CPU), chosen to cover every package:
#   diffusion: schedules/golden/brownian   ops+models: golden/sampler
#   data: prefetch   serving: serving_debug   eval: metrics/eval
#   utils: checkpoint/compile_cache/moderation   native: native
#   parallel+training: covered below via the curated extra node set
FAST_MODULES = {
    "test_schedules", "test_golden", "test_brownian", "test_metrics",
    "test_native", "test_prefetch", "test_checkpoint", "test_compile_cache",
    "test_config_prompt", "test_moderation", "test_eval",
    "test_serving_debug", "test_sampler", "test_bench_contract",
}

SLOW_E2E_MODULES = {
    "test_parity_e2e", "test_parity_sampler_loop", "test_pipeline",
    "test_sampler_e2e", "test_convert_fullscale", "test_e2e_ckpt_roundtrip",
    "test_distributed",   # real 2-OS-process meshes: ~2-4 min of compiles
    "test_convert_stats",  # full-scale XL forward on CPU: ~6 min (but NOT
                           # oracle — it needs only the committed fixture)
    "test_bench_parts_logic",  # tiny-geometry caption_probe: ~3-4 min
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "fast: quick CPU subset (<5 min) covering every package")
    config.addinivalue_line(
        "markers", "oracle: torch-reference parity (imports /root/reference)")
    config.addinivalue_line(
        "markers", "slow: heavy E2E / loop-parity / full-scale tests")


def pytest_collection_modifyitems(config, items):
    import pytest
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        if mod in FAST_MODULES:
            item.add_marker(pytest.mark.fast)
        if mod in SLOW_E2E_MODULES:
            item.add_marker(pytest.mark.slow)
        # oracle = the module wires up the reference torch code
        if getattr(item.module, "ref_oracle", None) is not None:
            item.add_marker(pytest.mark.oracle)
