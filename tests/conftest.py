"""Test config: force an 8-device virtual CPU mesh.

This mirrors how the reference's multi-GPU behaviour would be tested without
hardware (SURVEY.md section 4): all sharding/collective tests run against
XLA's host platform with 8 fake devices.

The axon TPU plugin (when present) force-registers itself at interpreter
boot and overwrites ``jax_platforms``; re-overriding via jax.config after
import reliably selects the CPU backend either way.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compile cache: the suite's wall-clock on 1 CPU is
# dominated by jit compiles (VERDICT r4 weak #6); cache them on disk so
# every run after the first seeding pays only execution.  A dedicated dir
# (not the relay's .jax_cache) so entries here are always local-CPU
# compiles — relay-process CPU entries carry foreign machine-feature
# strings that XLA's AOT loader warns may SIGILL.
try:
    from dmhomo_tpu.utils.platform import enable_persistent_compile_cache

    enable_persistent_compile_cache(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache_tests"))
except Exception:  # pragma: no cover - cache is an optimization only
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: minutes-long full-config tests")
    config.addinivalue_line(
        "markers",
        "heavy: torch-oracle / chain-parity tests that dominate suite "
        'wall-clock; run by default, deselect with -m "not heavy" for the '
        "fast dev loop",
    )


@pytest.fixture
def rng():
    return np.random.default_rng(0)


# Fast-tier wall-clock budget (r5, 1 CPU, warm .jax_cache_tests):
# ~15 min for 170 tests.  The remaining top costs are EXECUTION, not
# compiles (the cache absorbs those after the first seeding run):
#   ~60 s  test_cli::test_hem_eval_cli_ragged_tail   (CLI subprocess: own
#          interpreter + cache-load + eval at two batch geometries)
#   ~60 s  test_train::test_hem_grad_accum_matches_single_batch (two full
#          train-step variants executed on CPU)
#   ~45 s  test_data::test_hem_trainer_accepts_device_pipeline_batches
#   ~44 s  test_train::test_hem_fused_steps_match_sequential
# Shipped-off flag-equivalence tests (fold_ln, remat_policy, mask 'split')
# are heavy-tier: they run by default but not in -m "not heavy".
